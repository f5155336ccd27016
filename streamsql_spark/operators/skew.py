"""Skew-resilient aggregation: explicit two-phase salting.

AQE's skew-join splitting (enabled in ``session.SCALE_CONFS``) handles
skewed JOINs at runtime, but a skewed GROUP BY key still funnels every
row of the hot key through one reducer in the final exchange.  The
classic fix is salting: shard each key into ``n_salts`` sub-keys,
aggregate partials per (key, salt), then combine the partials in a
second, tiny aggregation — the hot key's rows now spread over
``n_salts`` reducers and the second pass touches only
``n_keys x n_salts`` rows.

Only aggregates with a partial/final decomposition qualify:
    sum   → sum of partial sums        count → sum of partial counts
    min   → min of partial mins        max   → max of partial maxes
    avg   → sum(partial sum)/sum(partial count)

Spark's own HashAggregate already does a partial pass per *input
partition* (map-side combine), which usually suffices; salting matters
when the per-key *state* — not the row stream — is the bottleneck
(e.g. collect_list/distinct-heavy aggregates) or when a downstream
stage keys by the same skewed column.  The operator exists so the
100 TB recipe is concrete and testable, not guesswork.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate name → (partial expr over rows, final expr over partials)
_DECOMP = {
    "sum": ("sum({a})", "sum({p})"),
    "count": ("count({a})", "sum({p})"),
    "min": ("min({a})", "min({p})"),
    "max": ("max({a})", "max({p})"),
}


def salted_aggregate(df: DataFrame, key_cols: list[str],
                     aggs: dict[str, tuple[str, str]],
                     n_salts: int = 16) -> DataFrame:
    """Two-phase salted GROUP BY.

    ``aggs``: out_name → (agg_fn, arg_expr); agg_fn in sum / count /
    min / max / avg.  Returns one row per key with the same values a
    plain ``groupBy(key).agg(...)`` would produce (the oracle).
    """
    salt = (F.abs(F.hash(*[F.col(c) for c in key_cols],
                         F.spark_partition_id())) % n_salts).alias("__salt__")
    partial_exprs = []
    final_exprs = []
    for out, (fn, arg) in aggs.items():
        if fn == "avg":
            partial_exprs.append(F.expr(f"sum({arg})").alias(f"__{out}_s__"))
            partial_exprs.append(F.expr(f"count({arg})").alias(f"__{out}_c__"))
            final_exprs.append(
                (F.expr(f"sum(__{out}_s__)") / F.expr(f"sum(__{out}_c__)"))
                .alias(out))
            continue
        if fn not in _DECOMP:
            raise ValueError(
                f"{fn} has no partial/final decomposition — salting does "
                f"not apply (use plain groupBy, or a sketch)")
        p, f_ = _DECOMP[fn]
        partial_exprs.append(F.expr(p.format(a=arg)).alias(f"__{out}__"))
        final_exprs.append(F.expr(f_.format(p=f"__{out}__")).alias(out))
    partial = (df.withColumn("__salt__", salt)
                 .groupBy(*key_cols, "__salt__")
                 .agg(*partial_exprs))
    return partial.groupBy(*key_cols).agg(*final_exprs)
