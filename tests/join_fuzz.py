"""Seeded differential fuzz for the JOIN/LOOKUP topology (r13 brief #2).

The join subsystem (stream-table joins, worker-side lookup probes,
driver-probe fallback, chained probe keys) had never been fuzzed — the
r12 crash-class bug (depth-≥3 chained driver probes) was found by
review.  This sweep GENERATES random dim-table graphs:

- 1-4 joined tables per statement, each independently one of
  {snapshot register_table, worker-routable lookup source (picklable +
  schema()), driver-probe lookup source (unpicklable)};
- INNER / LEFT per join;
- key modes: single stream key, COMPOSITE (deviceId, grp), stream-side
  EXPRESSION key (upper(deviceId)), and CHAINED keys (table i probes a
  column ENRICHED by an earlier table, incl. depth ≥3 chains);
- residual non-equi conjuncts on the ON clause (v >= t.w);
- random registration order; NULL-key stream rows; snapshot fan-out
  (duplicate dim keys); optional WHERE;
- genuine probe-key CYCLES (~8%), which must fail TYPED.

Each case runs on up to three engine paths — relational batch
(StreamSQL.query), the streaming path (run_streaming_collect over
random micro-batch splits; skipped when a driver-probe source is
present, which that path refuses typed), and the per-event emit_sync
path (skipped on fan-out: emit_sync returns one row per event by
contract) — and every path must match a DuckDB oracle running the
equivalent ANSI join (reference semantics: stream/join.go:35-67 key
probe, table_store.go:87-153 key encode).  The bar is ZERO
divergences.

    python3 tests/join_fuzz.py [seed [count]]

r13 baseline: 40 statements/seed, 0 divergences on FIVE seeds
(20260816, 7, 99, 1234, 424242).  CI subset:
tests/test_streaming.py::test_join_fuzz_ci_subset.

r13 engine finds from this sweep (all fixed): (a) a worker source
chained on a SNAPSHOT table's column crashed unresolved on batch AND
streaming — apply_lookup_joins now pre-joins needed dims before the
probe stage; (b) seed 1234: a driver source whose snapshot DEP reads
a pre-joined flat probed the pre-enrichment frame — dep_needs_worker
now counts pre-joined tables; (c) probe-key cycles fail typed on
every routing.  Harness lesson: the lookup-source class MUST
initialize its data store in __init__ — a raised AttributeError in
lookup() reads as a J2-recovered MISS, masking the injected bug.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from window_fuzz import _rows_canon, _tuples_close  # noqa: E402

DEV_DOM = ["d%d" % i for i in range(6)]
X_DOM = ["x%d" % i for i in range(6)]


def _stream_rows(rng: random.Random, n: int = 28) -> list[dict]:
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.08:
            dev = None              # NULL key: never matches, any path
        elif r < 0.16:
            dev = "dZ"              # guaranteed miss
        else:
            dev = rng.choice(DEV_DOM)
        rows.append({"deviceId": dev, "grp": rng.randint(0, 2),
                     "v": round(rng.uniform(0.0, 500.0), 2),
                     "ts": 1000 + i})
    return rows


def _stream_schema():
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)
    return StructType([StructField("deviceId", StringType()),
                       StructField("grp", LongType()),
                       StructField("v", DoubleType()),
                       StructField("ts", LongType())])


def _mk_worker_source(tname, schema_ddl, data):
    """Function-local class: cloudpickle ships it BY VALUE (a module-
    level class pickles by reference and executors have no test
    module)."""

    class WorkerSource:
        def __init__(self):
            self._data = dict(data)

        def name(self):
            return tname

        def schema(self):
            return schema_ddl

        def lookup(self, key):
            k = tuple(key) if isinstance(key, list) else key
            row = self._data.get(k)
            return row, row is not None

    return WorkerSource()


def _mk_driver_source(tname, schema_ddl, data):
    class DriverSource:
        def __init__(self):
            self._fh = open(__file__, "rb")  # defeats cloudpickle
            self._data = dict(data)

        def name(self):
            return tname

        def schema(self):
            return schema_ddl

        def lookup(self, key):
            k = tuple(key) if isinstance(key, list) else key
            row = self._data.get(k)
            return row, row is not None

    return DriverSource()


def gen_case(rng: random.Random) -> dict:
    """One random join topology: table specs + dim data + engine SQL +
    oracle SQL.  Chained keys only reference EARLIER tables, so a
    topological statement order always exists — except in the
    deliberate cycle cases, where two driver sources reference each
    other and the engine must fail typed."""
    n = rng.randint(1, 4)
    cycle = n >= 2 and rng.random() < 0.08
    tables = []
    for i in range(n):
        kind = rng.choice(["snapshot", "worker", "driver"])
        spec = {"name": "t%d" % i, "kind": kind,
                "alias": ("j%d" % i) if rng.random() < 0.5 else None,
                "join": rng.choice(["INNER", "LEFT"]),
                "residual": rng.random() < 0.2,
                "fanout": kind == "snapshot" and rng.random() < 0.2}
        if i > 0 and not cycle and rng.random() < 0.45:
            spec["keymode"] = ("chain", rng.randrange(i))
        else:
            r = rng.random()
            if r < 0.25:
                spec["keymode"] = ("composite", None)
            elif r < 0.45:
                spec["keymode"] = ("expr", None)
            else:
                spec["keymode"] = ("single", None)
        tables.append(spec)
    if cycle:
        # the LAST two tables probe each other's enriched column; the
        # engine must report the cycle TYPED, not hang or crash raw —
        # driver pairs via the rounds' readiness check
        # (facade._lookup_tables_chained), worker pairs / mixed via
        # apply_lookup_joins' forward-reference check (a cycle always
        # contains a forward ref in statement order)
        a, b = n - 2, n - 1
        tables[a]["kind"] = rng.choice(["driver", "worker"])
        tables[b]["kind"] = rng.choice(["driver", "worker"])
        tables[a]["keymode"] = ("cycle", b)
        tables[b]["keymode"] = ("cycle", a)
        tables[a]["fanout"] = tables[b]["fanout"] = False

    # dim data per table
    for i, t in enumerate(tables):
        mode = t["keymode"][0]
        val_of = lambda: {"r%d" % i: rng.choice(X_DOM),
                          "w%d" % i: round(rng.uniform(0.0, 500.0), 2)}
        rows, data = [], {}
        if mode == "composite":
            pool = [(d, g) for d in DEV_DOM + ["d6", "d7"]
                    for g in range(3)]
            for d, g in rng.sample(pool, rng.randint(8, 16)):
                v = val_of()
                rows.append({"k%d" % i: d, "g%d" % i: g, **v})
                data[(d, g)] = v
        else:
            if mode == "expr":
                dom = [d.upper() for d in DEV_DOM + ["d6", "d7"]]
            elif mode in ("chain", "cycle"):
                dom = X_DOM
            else:
                dom = DEV_DOM + ["d6", "d7"]
            for k in rng.sample(dom, rng.randint(3, len(dom))):
                v = val_of()
                rows.append({"k%d" % i: k, **v})
                data[k] = v
        if t["fanout"] and rows:
            dup = dict(rows[0])
            dup["r%d" % i] = rng.choice(X_DOM)
            dup["w%d" % i] = round(rng.uniform(0.0, 500.0), 2)
            rows.append(dup)
        t["rows"], t["data"] = rows, data
        t["schema_ddl"] = "r%d STRING, w%d DOUBLE" % (i, i)

    # SQL assembly (engine + oracle share condition structure; the
    # oracle qualifies stream columns with s.)
    sel_e = ["deviceId AS did", "grp AS g", "v AS v", "ts AS tsx"]
    sel_o = ["s.deviceId AS did", "s.grp AS g", "s.v AS v", "s.ts AS tsx"]
    joins_e, joins_o = [], []
    for i, t in enumerate(tables):
        ref = t["alias"] or t["name"]
        mode, dep = t["keymode"]
        if mode == "single":
            cond_e = "deviceId = %s.k%d" % (ref, i)
            cond_o = "s.deviceId = %s.k%d" % (ref, i)
        elif mode == "composite":
            cond_e = ("deviceId = %s.k%d AND grp = %s.g%d"
                      % (ref, i, ref, i))
            cond_o = ("s.deviceId = %s.k%d AND s.grp = %s.g%d"
                      % (ref, i, ref, i))
        elif mode == "expr":
            cond_e = "upper(deviceId) = %s.k%d" % (ref, i)
            cond_o = "upper(s.deviceId) = %s.k%d" % (ref, i)
        else:  # chain / cycle
            dref = tables[dep]["alias"] or tables[dep]["name"]
            cond_e = cond_o = "%s.r%d = %s.k%d" % (dref, dep, ref, i)
        if t["residual"]:
            cond_e += " AND v >= %s.w%d" % (ref, i)
            cond_o += " AND s.v >= %s.w%d" % (ref, i)
        kw = "JOIN" if t["join"] == "INNER" else "LEFT JOIN"
        al = (" " + t["alias"]) if t["alias"] else ""
        joins_e.append("%s %s%s ON %s" % (kw, t["name"], al, cond_e))
        joins_o.append("%s %s%s ON %s" % (kw, t["name"], al, cond_o))
        sel_e.append("%s.r%d AS r%d" % (ref, i, i))
        sel_o.append("%s.r%d AS r%d" % (ref, i, i))
        sel_e.append("%s.w%d AS w%d" % (ref, i, i))
        sel_o.append("%s.w%d AS w%d" % (ref, i, i))
    where = rng.random() < 0.25
    engine_sql = ("SELECT %s FROM stream %s%s"
                  % (", ".join(sel_e), " ".join(joins_e),
                     " WHERE v > 150" if where else ""))
    oracle_sql = ("SELECT %s FROM stream s %s%s"
                  % (", ".join(sel_o), " ".join(joins_o),
                     " WHERE s.v > 150" if where else ""))
    return {"tables": tables, "cycle": cycle, "engine_sql": engine_sql,
            "oracle_sql": oracle_sql,
            "stream": _stream_rows(rng),
            "fanout": any(t["fanout"] for t in tables),
            "has_driver": any(t["kind"] == "driver" for t in tables)}


def _register(rng: random.Random, s, case) -> None:
    """Register the case's tables in RANDOM order (an axis: the engine
    must not depend on registration order for chained resolution)."""
    order = list(case["tables"])
    rng.shuffle(order)
    for t in order:
        if t["kind"] == "snapshot":
            s.register_table(t["name"], [dict(r) for r in t["rows"]])
        elif t["kind"] == "worker":
            s.register_table_source(
                _mk_worker_source(t["name"], t["schema_ddl"], t["data"]))
        else:
            s.register_table_source(
                _mk_driver_source(t["name"], t["schema_ddl"], t["data"]))


def _oracle_rows(con, case):
    import pandas as pd
    con.register("stream", pd.DataFrame(case["stream"]))
    for t in case["tables"]:
        con.register(t["name"], pd.DataFrame(t["rows"]))
    out = con.sql(case["oracle_sql"])
    cols = [d[0] for d in out.description]
    return cols, out.fetchall()


def _diff(cols_a, rows_a, cols_b, rows_b) -> str | None:
    if len(rows_a) != len(rows_b):
        return "row count %d != %d" % (len(rows_a), len(rows_b))
    if sorted(cols_a) != sorted(cols_b):
        return "columns %s != %s" % (sorted(cols_a), sorted(cols_b))
    ca = _rows_canon(cols_a, rows_a)
    cb = _rows_canon(cols_b, rows_b)
    bad = [(x, y) for x, y in zip(ca, cb) if not _tuples_close(x, y)]
    if bad:
        return "values differ; first pairs engine-vs-oracle=%s" % (bad[:2],)
    return None


def run_fuzz(spark, con, seed: int, count: int,
             verbose: bool = True,
             max_stream_legs: int | None = None,
             max_emit_legs: int | None = None,
             emit_rows: int | None = None) -> list:
    from streamsql_spark.api.facade import StreamSQL
    from streamsql_spark.engine.batch import ExecError
    from streamsql_spark.streaming.harness import run_streaming_collect

    rng = random.Random(seed)
    divergences = []
    stats = {"cases": 0, "cycle": 0, "stream_legs": 0, "emit_legs": 0}
    for i in range(count):
        case = gen_case(rng)
        stats["cases"] += 1
        label = "+".join(t["kind"][0] for t in case["tables"])
        if case["cycle"]:
            stats["cycle"] += 1
            try:
                s = StreamSQL(spark).execute(case["engine_sql"])
                _register(rng, s, case)
                s.query(spark.createDataFrame(
                    case["stream"], _stream_schema())).collect()
                divergences.append((i, label, case["engine_sql"],
                                    "CYCLE accepted (no typed error)"))
            except ExecError as e:
                if "cycle" not in str(e):
                    divergences.append((i, label, case["engine_sql"],
                                        "cycle error untyped: %s"
                                        % str(e)[:200]))
            except Exception as e:  # noqa: BLE001
                divergences.append((i, label, case["engine_sql"],
                                    "cycle raised %s: %s"
                                    % (type(e).__name__, str(e)[:200])))
            continue
        try:
            o_cols, o_rows = _oracle_rows(con, case)

            # batch path
            s = StreamSQL(spark).execute(case["engine_sql"])
            _register(rng, s, case)
            bdf = s.query(spark.createDataFrame(
                case["stream"], _stream_schema()))
            b_cols = bdf.columns
            b_rows = [[r[c] for c in b_cols] for r in bdf.collect()]
            prob = _diff(b_cols, b_rows, o_cols, o_rows)
            if prob:
                divergences.append((i, label + "/batch",
                                    case["engine_sql"], prob))

            # streaming path (no driver-probe fallback there);
            # max_stream_legs caps the expensive query-per-case legs
            # for the CI subset (the wide sweep runs them all)
            if not case["has_driver"] and (
                    max_stream_legs is None
                    or stats["stream_legs"] < max_stream_legs):
                stats["stream_legs"] += 1
                ss = StreamSQL(spark).execute(case["engine_sql"])
                _register(rng, ss, case)
                rows = list(case["stream"])
                cut1 = rng.randint(1, len(rows) - 2)
                cut2 = rng.randint(cut1 + 1, len(rows) - 1)
                batches = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]
                got = run_streaming_collect(spark, ss, batches,
                                            _stream_schema())
                g_rows = [[r.get(c) for c in o_cols] for r in got]
                prob = _diff(o_cols, g_rows, o_cols, o_rows)
                if prob:
                    divergences.append((i, label + "/stream",
                                        case["engine_sql"], prob))

            # per-event emit_sync path (one row out per event: skip
            # fan-out cases by contract; max_emit_legs caps the
            # spark-roundtrip-per-event legs for the CI subset)
            if not case["fanout"] and (
                    max_emit_legs is None
                    or stats["emit_legs"] < max_emit_legs):
                stats["emit_legs"] += 1
                se = StreamSQL(spark).execute(case["engine_sql"])
                _register(rng, se, case)
                # emit_rows bounds the spark-roundtrip-per-event cost
                # (CI subset); the oracle filters to the same prefix
                # by tsx — per-row join results are independent
                feed = case["stream"] if emit_rows is None \
                    else case["stream"][:emit_rows]
                cutoff = feed[-1]["ts"] if feed else -1
                ti = o_cols.index("tsx")
                o_sub = [r for r in o_rows if r[ti] <= cutoff]
                outs = [se.emit_sync(dict(r)) for r in feed]
                e_rows = [[r.get(c) for c in o_cols]
                          for r in outs if r is not None]
                prob = _diff(o_cols, e_rows, o_cols, o_sub)
                if prob:
                    divergences.append((i, label + "/emit",
                                        case["engine_sql"], prob))
        except Exception as e:  # noqa: BLE001 — a crash IS a divergence
            divergences.append((i, label, case["engine_sql"],
                                "EXCEPTION %s: %s"
                                % (type(e).__name__, str(e)[:300])))
        if verbose and divergences and divergences[-1][0] == i:
            d = divergences[-1]
            print("DIVERGE [%d] %s: %s\n  %s" % (d[0], d[1], d[3], d[2]))
    if verbose:
        print("join_fuzz(seed=%d): %d cases (%d cycle, %d stream legs, "
              "%d emit legs), %d diverged"
              % (seed, stats["cases"], stats["cycle"],
                 stats["stream_legs"], stats["emit_legs"],
                 len(divergences)))
    return divergences


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 20260816
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    import duckdb

    from streamsql_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    div = run_fuzz(spark, con, seed, count)
    return 1 if div else 0


if __name__ == "__main__":
    sys.exit(main())
