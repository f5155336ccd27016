"""Worker-side lookup-join enrichment for streaming queries.

The reference enriches each event by calling a user TableSource's
``Lookup(key)`` inline on the ingest path (stream/join.go:35-67 over
stream/table_store.go:18-23).  A long-running Spark stream cannot probe
a driver-side object per micro-batch without a collect round-trip, so
the streaming realization ships the source TO THE WORKERS: a
``mapInPandas`` stage probes ``lookup`` once per DISTINCT key per Arrow
batch and merges the found columns — the scalable lookup-join shape (no
driver involvement, parallel across partitions, per-batch key dedup).

Contract (on top of the batch-path TableSource protocol):
- the source must be PICKLABLE (it is serialized into the stage); open
  connections LAZILY/IDEMPOTENTLY — ``init()`` is re-invoked once per
  worker process (module-level memo), and there is no worker-side
  ``close()`` hook (Spark tears workers down opaquely; driver-side
  ``close()`` still runs on ``stop()``);
- it must declare ``schema()`` (StructType or DDL string) for its row
  columns: Spark needs the enriched column types up front, where the
  reference's open maps don't;
- ``lookup`` must be concurrency-safe (the reference documents the same,
  streamsql.go:517-519).

Only equality ON conditions are supported (exactly the Lookup-key
contract); a raising ``lookup`` resolves that key as not-found (J2
ingest recovery).

Known delta: star-watched change detection (``had_changed(true, *)`` /
``changed_cols(..., "*")``) does not see lookup-ENRICHED columns on
this path — they live under hidden ``__q_*__`` names the star
expansion excludes; list watched table columns explicitly.  Snapshot
joins (register_table) keep plain table column names and are watched.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..dialect import nodes as N
from ..dialect.render import render
from ..engine.batch import ExecError
from .stateful import make_qref_rewriter


def source_schema(src) -> StructType:
    sch = getattr(src, "schema", None)
    sch = sch() if callable(sch) else sch
    if isinstance(sch, str):
        sch = StructType.fromDDL(sch)
    if not isinstance(sch, StructType):
        raise ExecError(
            "a streaming lookup table source must declare schema() "
            "(StructType or DDL string) — enriched column types cannot "
            "be inferred from an unbounded stream")
    return sch


def equi_pairs(j, allow_residual: bool = False):
    """Extract the Lookup probe keys from a join's ON tree.

    ON must be a CONJUNCTION; each key-defining conjunct is an equality
    with exactly one table-qualified side → (stream-side sql, table key
    field) pairs.  Other conjuncts (literal filters, non-key
    comparisons) either raise (streaming — they cannot be evaluated
    after a LEFT enrichment) or pass through as ``residual`` for the
    batch path, whose real join re-applies the FULL ON afterwards.
    An OR / NOT anywhere raises on BOTH paths: probing only one arm
    would silently drop the other arm's matches.
    """
    pairs: list[tuple[str, str]] = []
    residual: list = []

    def walk_and(e):
        if isinstance(e, N.Bin) and e.op == "AND":
            walk_and(e.left)
            walk_and(e.right)
            return
        if isinstance(e, N.Bin) and e.op == "=":
            def table_side(n):
                return isinstance(n, N.Col) and len(n.parts) == 2 \
                    and str(n.parts[0]) in (j.alias, j.table)

            for side, opp in ((e.left, e.right), (e.right, e.left)):
                # exactly ONE table-qualified side makes a probe key;
                # table-col = table-col (o.lo = o.hi) is a row filter —
                # it falls through to residual/raise below
                if table_side(side) and not any(
                        table_side(n) for n in N.walk(opp)):
                    pairs.append((render(opp), str(side.parts[1])))
                    return
        if allow_residual and not any(
                isinstance(n, N.Bin) and n.op in ("OR",)
                or isinstance(n, N.Un) and n.op == "NOT"
                for n in N.walk(e)):
            residual.append(e)
            return
        raise ExecError(
            "lookup-source joins support conjunctions of equality ON "
            f"conditions (the Lookup-key contract); got: {render(e)}")

    walk_and(j.on)
    if not pairs:
        raise ExecError("a lookup-source join needs at least one "
                        "equality ON condition against the table's "
                        "key fields")
    return (pairs, residual) if allow_residual else pairs


def apply_lookup_joins(df: DataFrame, plan, sources: dict):
    """Replace every join against a registered lookup source with a
    worker-side mapInPandas enrichment stage; qualified refs to those
    tables rewrite to flat hidden columns.  Returns (df, plan2)."""
    lookups = [j for j in plan.joins if j.table in sources]
    rest = [j for j in plan.joins if j.table not in sources]
    if not lookups:
        return df, plan
    if rest:
        raise ExecError(
            "streaming queries cannot mix lookup table sources with "
            "snapshot-table joins yet — register both as snapshots or "
            "both as lookup sources")
    if any(o.star for o in plan.outputs):
        raise ExecError(
            "SELECT * with a streaming lookup join is not supported — "
            "list the columns explicitly")
    if plan.mode == "cep":
        raise ExecError(
            "streaming MATCH_RECOGNIZE with a lookup table source is "
            "not supported — register the dimension as a snapshot "
            "table (register_table) instead")

    src_name = plan.source_alias or plan.source
    quals = {j.table for j in lookups} | {j.alias for j in lookups
                                          if j.alias}
    mapping: dict[str, str] = {}
    rw = make_qref_rewriter(src_name, quals, mapping)

    # ---- pass 1: extract every join's probe pairs FIRST, so chained
    # lookups (JOIN a ... JOIN b ON a.region = b.region) register their
    # cross-table refs in `mapping` before the plan/want snapshots --
    # table a's enrichment then materializes __q_a_region__ for b's
    # probe, and the __qref_map__ is complete.  (plan.joins carry
    # rendered SQL; the equality structure lives in the statement's
    # AST join specs, matched by table+alias.)
    ast_joins = {(aj.table, aj.alias): aj for aj in plan.stmt.joins}
    pairs_by_join = []
    for j in lookups:
        ast_j = ast_joins.get((j.table, j.alias))
        if ast_j is None or ast_j.on is None:
            raise ExecError("streaming lookup join needs an ON clause")
        # the stream-side probe expressions carry planner-qualified
        # refs (stream.deviceId, a.region) -- rewrite to the flat frame
        pairs_by_join.append([(rw(s), k) for s, k in equi_pairs(ast_j)])

    # analytic ARGUMENTS render inside the kernels via apply_qref_map
    # over plan.options["__qref_map__"]: register their qualified refs
    # now so the columns they read get enriched and mapped (a
    # lookup-table column referenced ONLY as an analytic arg would
    # otherwise never materialize)
    for a_spec in plan.analytics:
        for arg in a_spec.func.args:
            if not isinstance(arg, (N.Lit, N.Star)):
                rw(render(arg))
    analytics2 = [replace(a, partition_by=[rw(p) for p in a.partition_by],
                          when_sql=rw(a.when_sql))
                  for a in plan.analytics]
    plan2 = replace(
        plan,
        joins=[],
        where_sql=rw(plan.where_sql),
        having_sql=rw(plan.having_sql),
        group_sqls=[rw(g) for g in plan.group_sqls],
        order_by=[(rw(s), asc) for s, asc in plan.order_by],
        outputs=[replace(o, sql=rw(o.sql)) for o in plan.outputs],
        agg_specs=[replace(s, sql=rw(s.sql)) for s in plan.agg_specs],
        analytics=analytics2,
        options={**plan.options,
                 "__qref_map__": {**mapping, "__src__": src_name}},
    )

    # ---- pass 2: enrich in join order; each table's `want` comes
    # from the now-complete mapping
    for j, pairs in zip(lookups, pairs_by_join):
        src = sources[j.table]
        sch = source_schema(src)
        by_name = {f.name: f for f in sch.fields}
        alias = j.alias or j.table
        want = [(flat, tok.split(".", 1)[1])
                for tok, flat in mapping.items()
                if tok.split(".", 1)[0] in (alias, j.table)]
        for _, col in want:
            if col not in by_name:
                raise ExecError(
                    f"lookup source {j.table!r} schema() does not "
                    f"declare referenced column {col!r}")
        df = _enrich(df, src, pairs, want, by_name, j.kind)
    return df, plan2


# per-WORKER-PROCESS init memo: mapInPandas unpickles a fresh copy of
# the stage closure for every task, so an instance attribute cannot
# dedupe init() calls — this module-level set (keyed by source name)
# lives in the Python worker process and survives across tasks.
# Worker-side close() has no hook at all (Spark tears workers down
# opaquely): sources must open connections lazily/idempotently.
_WORKER_INITED: set[str] = set()


def _enrich(df: DataFrame, src, pairs, want, by_name, how) -> DataFrame:
    if how not in ("inner", "left"):
        raise ExecError(f"streaming lookup joins support INNER/LEFT, "
                        f"got {how!r}")
    key_cols = [f"__lkkey_{i}__" for i in range(len(pairs))]
    probe = df
    for (sql, _), kc in zip(pairs, key_cols):
        probe = probe.withColumn(kc, F.expr(sql))
    out_fields = list(probe.schema.fields) + \
        [StructField(flat, by_name[col].dataType) for flat, col in want]
    out_schema = StructType(out_fields)
    inner = how == "inner"
    want_cols = [col for _, col in want]
    flat_names = [flat for flat, _ in want]
    nkeys = len(key_cols)
    import uuid
    src_name = src.name() if callable(getattr(src, "name", None)) \
        else getattr(src, "name", "")
    # unique per enrichment STAGE: a restarted stream shipping a NEW
    # source instance under the same table name must re-init on warm
    # workers (init is idempotent-by-contract, so a fresh token per
    # build only costs one extra call per worker)
    init_token = f"{src_name}#{uuid.uuid4().hex}"
    # dtype-restoring cleaners: a nullable int64 key column arrives
    # float64-coerced from Arrow (5 -> 5.0, NULL -> NaN) chunk-
    # dependently — the probe must see the EXACT key values the batch
    # path's Row collect sees, or str(key)/typed backends miss
    from .stateful import _cleaners
    clean_by = _cleaners(probe, key_cols)
    cleaners = [clean_by[c] for c in key_cols]
    _MISS = object()

    def gen(batches):
        import pandas as pd

        init = getattr(src, "init", None)
        if callable(init) and init_token not in _WORKER_INITED:
            _WORKER_INITED.add(init_token)
            init()  # once per worker process per stage
        cache: dict[tuple, object] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            # one Python step per DISTINCT key; the per-ROW fan-out is
            # a vectorized pandas merge (the row loop was the stage's
            # bottleneck at scale — 1.6M rows / 24k keys)
            recs = []
            for raw in pdf[key_cols].drop_duplicates() \
                    .itertuples(index=False, name=None):
                hit = cache.get(raw, _MISS)
                if hit is _MISS:
                    # exact Spark-typed key values: Arrow float64-
                    # coerces nullable int columns (42 -> 42.0)
                    kt = tuple(cl(v) for cl, v in zip(cleaners, raw))
                    arg = kt[0] if nkeys == 1 else list(kt)
                    try:
                        got = src.lookup(arg)
                    except Exception:
                        got = None  # J2 recovery: resolves not-found
                    row, found = got if isinstance(got, tuple) \
                        else (got, got is not None)
                    # ({}, True) IS a hit — an existence-only source
                    # returns found with no extra columns
                    hit = dict(row or {}) if found else None
                    cache[raw] = hit
                recs.append(
                    dict(zip(key_cols, raw), __hit__=hit is not None,
                         **{f: (hit.get(c) if hit is not None else None)
                            for f, c in zip(flat_names, want_cols)}))
            lk = pd.DataFrame(recs,
                              columns=key_cols + ["__hit__"] + flat_names)
            out = pdf.merge(lk, on=key_cols, how="left")
            if inner:
                out = out[out["__hit__"]]
            out = out.drop(columns="__hit__")
            if len(out):
                yield out

    enriched = probe.mapInPandas(gen, out_schema)
    return enriched.drop(*key_cols)
