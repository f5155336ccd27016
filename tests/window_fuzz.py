"""Seeded differential fuzz for the WINDOW path (r11 brief #5).

The pyeval fuzz covers direct-shaped statements and the cross-path
grid is hand-enumerated; this sweep GENERATES random windowed
statements — window kind × group-key set (incl. EXPRESSION keys, r12)
× aggregate menu (incl. post-aggregation expressions: first/last
delta and round-of-avg via a Spark-mirroring duckdb UDF, r12) ×
WHERE × HAVING × per-fire ORDER BY/LIMIT × DISTINCT-per-fire
(tumbling/sliding, r12) × session top-K (r12) — runs each through
the batch engine over the events fixture, and checks the result
against a DuckDB oracle assembled from the same per-kind templates
the catalog entries use (catalog.py `_TUMBLING_ORACLE` family,
generalized over keys/aggregates/filters).  The bar is ZERO divergences: every
generated statement must match the oracle on row count, column names,
and order-insensitive values.

    python3 tests/window_fuzz.py [seed [count [sf_dir]]]

r12 baseline (all axes active): 60 statements/seed, 0 divergences
on FIVE seeds (20260816, 7, 99, 1234, 424242).  The CI subset (tests/test_engine.py::test_window_fuzz_ci_subset)
runs a fixed seed at count=12 per run.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# aggregate menu: (alias, engine SQL, duckdb SQL).  Floats are left
# UNROUNDED and compared with a tolerance instead: round(x, 4) in the
# statements themselves turned out to be a divergence GENERATOR, not a
# suppressor — at a .xxxx5 boundary DuckDB's float-multiply HALF_UP
# and Spark's BigDecimal rounding split (measured: both engines
# compute avg = 61.138749999999995 exactly, duckdb round(.,4) says
# 61.1388, Spark says 61.1387)
AGGS = [
    ("cnt", "count(*)", "count(*)"),
    ("cv", "count(value)", "count(value)"),
    ("total", "sum(value)", "sum(value)"),
    ("avg_v", "avg(value)", "avg(value)"),
    ("mn", "min(value)", "min(value)"),
    ("mx", "max(value)", "max(value)"),
    ("expr_t", "sum(value * 2 + 1)", "sum(value * 2 + 1)"),
]

# WHERE predicates compare STORED doubles (no arithmetic) — identical
# bits in both engines, boundary-safe
WHERES = [
    None,
    ("value > 100", "value > 100"),
    ("value <= 400", "value <= 400"),
    ("event_type != 'click'", "event_type != 'click'"),
    ("user_id % 2 = 0", "user_id % 2 = 0"),
]

KEYSETS = [[], ["event_type"], ["user_id"], ["event_type", "user_id"]]


def _session_oracle(keys, where, sel_keys, aggs_sql, having, gap_s,
                    src="events"):
    part = f"PARTITION BY {', '.join(keys)} " if keys else ""
    wf = f"WHERE {where} " if where else ""
    keycols = (", ".join(keys) + ", ") if keys else ""
    sid_keys = (", ".join(keys) + ", sid") if keys else "sid"
    hv = f" HAVING {having}" if having else ""
    return f"""
    WITH filtered AS (SELECT * FROM {src} {wf}),
    marked AS (
      SELECT {keycols}value, ts, event_id,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER ({part}ORDER BY ts, event_id))
                       > {gap_s} OR
                       lag(ts) OVER ({part}ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM filtered),
    sessions AS (
      SELECT {keycols}value, ts, event_id,
             sum(new_session) OVER ({part}ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT {sel_keys}{aggs_sql}
    FROM sessions GROUP BY {sid_keys}{hv}
    """


def _chunk_oracle(keys, where, sel_keys, aggs_sql, having, n, exact,
                  src="events"):
    part = f"PARTITION BY {', '.join(keys)} " if keys else ""
    wf = f"WHERE {where} " if where else ""
    grp = (", ".join(keys) + ", win") if keys else "win"
    conds = [f"count(*) = {n}"] if exact else []
    if having:
        conds.append(having)
    hv = f" HAVING {' AND '.join(conds)}" if conds else ""
    cols = {"value", "event_type", "user_id", "ts", "event_id"} | set(keys)
    return f"""
    WITH numbered AS (
      SELECT {', '.join(sorted(cols))},
             floor((row_number() OVER ({part}ORDER BY ts, event_id) - 1)
                   / {n}) AS win
      FROM {src} {wf})
    SELECT {sel_keys}{aggs_sql}
    FROM numbered GROUP BY {grp}{hv}
    """


def gen_case(rng: random.Random):
    """One random windowed statement + its DuckDB oracle.  r12 axes:
    expression group keys, post-aggregation expressions (first/last
    delta + round-of-avg through a Spark-mirroring duckdb UDF), DISTINCT
    per fire (tumbling/sliding), session top-K."""
    kind = rng.choice(["tumbling", "sliding", "session", "counting",
                       "global"])
    keys = list(rng.choice(KEYSETS))
    # expression group key (~20%, non-session kinds — the session
    # oracle threads plain columns through three CTEs): the engine
    # groups by the raw expression and selects it aliased; the oracle
    # materializes the alias in a derived source
    expr_key = kind != "session" and rng.random() < 0.2
    src = "events"
    key_sel_engine = None
    if expr_key:
        keys = ["ug"]
        key_sel_engine = "user_id % 3 AS ug"
        src = "(SELECT *, user_id % 3 AS ug FROM events)"
    aggs = rng.sample(AGGS, rng.randint(1, 3))
    # post-aggregation expressions (~30%): last-first delta (exact —
    # the same two doubles subtract bit-identically in both engines)
    # and round(avg/1.037, 1) — the 1.037 divisor pushes the result
    # off the .05 rounding grid that 2-decimal prices can land on
    # (r11 lesson: round() at a representable boundary is a divergence
    # GENERATOR); jround1 mirrors Spark's BigDecimal.valueOf HALF_UP
    if rng.random() < 0.3:
        # duckdb's arg_min/arg_max take no struct key — compose the
        # (ts, event_id) arrival order into one exact HUGEINT
        ok = ("CAST(epoch_ns(ts) AS HUGEINT) * 10000000 + event_id")
        aggs = aggs + [
            ("delta",
             "last_value(value) - first_value(value)",
             f"arg_max(value, {ok}) - arg_min(value, {ok})"),
            ("ra1", "round(avg(value) / 1.037, 1)",
             "jround1(avg(value) / 1.037)"),
        ]
    wh = rng.choice(WHERES)
    having = None
    if rng.random() < 0.4:
        # the float threshold is deliberately NOT representable by a
        # sum of 2-decimal prices (xx.xx5): a computed sum can never
        # equal it, so summation-order noise cannot flip the predicate
        having = rng.choice([("count(*) > 2", "count(*) > 2"),
                             ("sum(value) > 500.005",
                              "sum(value) > 500.005")])
    sel_keys = (", ".join(keys) + ", ") if keys else ""
    sel_keys_engine = sel_keys if not expr_key else f"{key_sel_engine}, "
    aggs_engine = ", ".join(f"{e} AS {a}" for a, e, _ in aggs)
    aggs_oracle = ", ".join(f"{o} AS {a}" for a, _, o in aggs)
    wf_e = f" WHERE {wh[0]}" if wh else ""
    wf_o = wh[1] if wh else None
    hv_e = f" HAVING {having[0]}" if having else ""
    hv_o = having[1] if having else None
    grp_prefix = (", ".join(keys) + ", ") if keys else ""
    grp_prefix_engine = grp_prefix if not expr_key else "user_id % 3, "

    if kind in ("tumbling", "sliding"):
        slide = rng.choice([3600, 21600])
        m = rng.choice([2, 3]) if kind == "sliding" else 1
        size = slide * m
        spec = (f"TumblingWindow('{size}s')" if kind == "tumbling"
                else f"SlidingWindow('{size}s', '{slide}s')")
        offs = ", ".join(str(i) for i in range(m))
        wf = f"WHERE {wf_o} " if wf_o else ""
        hv = f" HAVING {hv_o}" if hv_o else ""
        ws = (f"CAST(floor(epoch(ts)/{slide})*{slide} - k.off*{slide} "
              f"AS BIGINT)" if kind == "sliding"
              else f"CAST(floor(epoch(ts)/{size})*{size} AS BIGINT)")
        src2 = (f"{src} AS e, LATERAL (SELECT unnest([{offs}]) AS off) k"
                if kind == "sliding" else src)
        # DISTINCT per fire (~20%, r12): group keys are NOT selected,
        # so equal counts across keys collapse WITHIN one window close
        # and survive ACROSS closes — the oracle dedups per ws then
        # drops it.  Integer aggregate only (float sums would dedup
        # differently on summation-order noise).
        if rng.random() < 0.2:
            engine = (f"SELECT DISTINCT count(*) AS cnt FROM stream"
                      f"{wf_e} GROUP BY {grp_prefix_engine}{spec}{hv_e}")
            inner = (f"SELECT {grp_prefix}count(*) AS cnt, ws FROM ("
                     f"SELECT *, {ws} AS ws FROM {src2} {wf}) "
                     f"GROUP BY {grp_prefix}ws{hv}")
            oracle = (f"SELECT cnt FROM (SELECT DISTINCT cnt, ws "
                      f"FROM ({inner}))")
            return kind + "_distinct", engine, oracle
        engine = (f"SELECT {sel_keys_engine}{aggs_engine}, "
                  f"unix_timestamp(window_start()) AS ws FROM stream"
                  f"{wf_e} GROUP BY {grp_prefix_engine}{spec}{hv_e}")
        oracle = (f"SELECT {sel_keys}{aggs_oracle}, ws FROM ("
                  f"SELECT *, {ws} AS ws FROM {src2} {wf}) "
                  f"GROUP BY {grp_prefix}ws{hv}")
        # per-fire ORDER BY/LIMIT: one fire per window close across
        # all keys -> top-K per ws partition.  Order on an INTEGER
        # aggregate (cnt) with the group keys as tiebreak — ordering
        # by a float sum would let summation-order noise break true
        # ties differently per engine at the top-K boundary
        if keys and rng.random() < 0.4 and \
                any(a == "cnt" for a, _, _ in aggs):
            k = rng.randint(1, 3)
            tb = ", ".join(keys)
            engine += f" ORDER BY cnt DESC, {tb} LIMIT {k}"
            oracle = (f"SELECT * FROM ({oracle}) QUALIFY "
                      f"row_number() OVER (PARTITION BY ws ORDER BY "
                      f"cnt DESC, {tb}) <= {k}")
        return kind, engine, oracle

    if kind == "session":
        gap_h = rng.choice([1, 2, 4, 8])
        engine = (f"SELECT {sel_keys}{aggs_engine} FROM stream{wf_e} "
                  f"GROUP BY {grp_prefix}SessionWindow('{gap_h}h'){hv_e}")
        # session top-K (~30%, r12): each (keys, session) close is its
        # OWN fire emitting one row, so ORDER BY/LIMIT per fire keeps
        # every session's row — the oracle is unchanged; a fire-identity
        # bug that batched sessions together would drop rows here
        if rng.random() < 0.3 and any(a == "cnt" for a, _, _ in aggs):
            engine += " ORDER BY cnt DESC LIMIT 2"
            kind = "session_topk"
        oracle = _session_oracle(keys, wf_o, sel_keys, aggs_oracle,
                                 hv_o, gap_h * 3600)
        return kind, engine, oracle

    n = rng.choice([5, 10, 25])
    if kind == "counting":
        engine = (f"SELECT {sel_keys_engine}{aggs_engine} FROM stream"
                  f"{wf_e} GROUP BY {grp_prefix_engine}"
                  f"CountingWindow({n}){hv_e}")
        # engine semantics: only FULL chunks fire on the batch path
        oracle = _chunk_oracle(keys, wf_o, sel_keys, aggs_oracle,
                               hv_o, n, exact=True, src=src)
        return kind, engine, oracle

    if keys:
        engine = (f"SELECT {sel_keys_engine}{aggs_engine} FROM stream"
                  f"{wf_e} GROUP BY "
                  f"{grp_prefix_engine.rstrip(', ') or ''} GLOBAL WINDOW "
                  f"TRIGGER WHEN count(*) >= {n}{hv_e}")
    else:
        engine = (f"SELECT {aggs_engine} FROM stream{wf_e} "
                  f"GROUP BY GLOBAL WINDOW TRIGGER WHEN "
                  f"count(*) >= {n}{hv_e}")
    oracle = _chunk_oracle(keys, wf_o, sel_keys, aggs_oracle,
                           hv_o, n, exact=True, src=src)
    return "global", engine, oracle


def _register_jround(con) -> None:
    """duckdb UDF mirroring Spark's round(x, 1) on DOUBLE exactly:
    BigDecimal.valueOf(double) parses Double.toString's SHORTEST
    decimal repr, then setScale(1, HALF_UP) — Python's repr() is the
    same shortest round-trip form, so Decimal(repr(x)) reproduces the
    JVM result (duckdb's own round() is float-multiply HALF_UP and
    disagrees at representable .x5 boundaries, the r11 lesson)."""
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    def jround1(x):
        if x is None:
            return None
        return float(Decimal(repr(float(x))).quantize(
            Decimal("0.1"), rounding=ROUND_HALF_UP))

    try:
        con.create_function("jround1", jround1,
                            [duckdb.typing.DOUBLE], duckdb.typing.DOUBLE,
                            null_handling="special")
    except Exception:
        pass  # already registered on this connection


def _cell_key(v):
    if v is None:
        return (0, "")
    if isinstance(v, bool):
        return (3, str(v))
    if isinstance(v, (int, float)):
        return (1, round(float(v), 6))
    return (2, str(v))


def _rows_canon(cols, rows):
    """Rows as tuples in sorted-column order, sorted by a float-
    quantized key — pairwise tolerant comparison then lines equal
    rows up even when summation-order noise perturbs the last bits."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(_cell_key(v) for v in t))


def _tuples_close(a, b) -> bool:
    import math
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        fx, fy = isinstance(x, float), isinstance(y, float)
        if fx or fy:
            if x is None or y is None:
                if not (x is None and y is None):
                    return False
            elif not math.isclose(float(x), float(y),
                                  rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True


def run_fuzz(spark, con, events_df, seed: int, count: int,
             verbose: bool = True) -> list:
    """Returns the list of divergences (empty = pass)."""
    from streamsql_spark.api.facade import StreamSQL

    _register_jround(con)
    rng = random.Random(seed)
    divergences = []
    kinds = {}
    for i in range(count):
        kind, engine_sql, oracle_sql = gen_case(rng)
        kinds[kind] = kinds.get(kind, 0) + 1
        try:
            q = StreamSQL(spark).execute(engine_sql)
            sdf = q.query(events_df)
            s_cols = sdf.columns
            s_rows = [[r[c] for c in s_cols] for r in sdf.collect()]
            odf = con.sql(oracle_sql)
            o_cols = [d[0] for d in odf.description]
            o_rows = odf.fetchall()
        except Exception as e:  # noqa: BLE001 — a crash IS a divergence
            divergences.append((i, kind, engine_sql,
                                f"EXCEPTION {type(e).__name__}: "
                                f"{str(e)[:300]}"))
            if verbose:
                print(f"DIVERGE-EXC [{i}] {kind}: {type(e).__name__}: "
                      f"{str(e)[:300]}\n  {engine_sql}")
            continue
        prob = None
        if len(s_rows) != len(o_rows):
            prob = f"row count {len(s_rows)} != {len(o_rows)}"
        elif sorted(s_cols) != sorted(o_cols):
            prob = f"columns {sorted(s_cols)} != {sorted(o_cols)}"
        else:
            sc = _rows_canon(s_cols, s_rows)
            oc = _rows_canon(o_cols, o_rows)
            bad = [(a, b) for a, b in zip(sc, oc)
                   if not _tuples_close(a, b)]
            if bad:
                prob = (f"values differ; first pairs "
                        f"spark-vs-oracle={bad[:2]}")
        if prob:
            divergences.append((i, kind, engine_sql, prob))
        if verbose and prob:
            print(f"DIVERGE [{i}] {kind}: {prob}\n  {engine_sql}")
    if verbose:
        print(f"fuzz(seed={seed}): {count} statements "
              f"({', '.join(f'{k}={v}' for k, v in sorted(kinds.items()))}), "
              f"{len(divergences)} diverged")
    return divergences


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 20260816
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

    import duckdb

    from streamsql_spark.session import get_spark, load_tables

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(spark, sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE OR REPLACE VIEW events AS "
            f"SELECT * FROM '{sf_dir}/events.parquet'")
    div = run_fuzz(spark, con, tables["events"], seed, count)
    return 1 if div else 0


if __name__ == "__main__":
    sys.exit(main())
