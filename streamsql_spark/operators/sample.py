"""Deterministic sampling operators for training-data pipelines.

Data mixing — "take 10% of web, 100% of books, 2% of logs" — must be
REPRODUCIBLE across runs, engines, and re-partitions, or every
downstream ablation is invalidated.  Spark's ``df.sample()`` is seeded
per-partition and changes with the physical split layout, so these
operators derive the keep/drop decision from a content hash of a
stable key instead: the decision is a pure function of the row, not of
the cluster that happened to run it.

Both operators are single-expression Catalyst filters / window ranks —
embarrassingly parallel (rate sampling adds ZERO shuffle; quota
sampling shuffles once on the stratum key, which any exact-quota
formulation must).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 28-bit md5 prefix → uniform bucket in [0, 1e6); the same expression is
# reproducible in any engine with md5 (DuckDB oracle parity), and at
# production scale swaps for xxhash64(key, salt) without changing the plan
_BUCKET = ("CAST(conv(substring(md5(CAST({key} AS STRING)), 1, 7), 16, 10)"
           " AS BIGINT) % 1000000")


def hash_stratified_sample(df: DataFrame, stratum_col: str, key_col: str,
                           rates: dict[str, float],
                           default_rate: float = 0.0) -> DataFrame:
    """Per-stratum Bernoulli sampling keyed on ``hash(key_col)``.

    ``rates`` maps stratum value → keep fraction.  A row is kept iff
    its hash bucket falls below the stratum's rate — deterministic,
    layout-independent, and disjoint rates nest: the 1% sample is a
    subset of the 10% sample (the property that lets a pipeline build
    dev subsets of its own training mix).

    Pure filter: no shuffle, no UDF; predicate pushes down past column
    pruning to the scan.
    """
    # thresholds resolved to INTEGER parts-per-million at plan time:
    # comparing the integer bucket against float(rate)*1e6 would make
    # the boundary row engine-dependent (0.2 * 1e6 is not exactly 200000
    # in IEEE doubles)
    bucket = F.expr(_BUCKET.format(key=key_col))
    thr = F.lit(int(round(float(default_rate) * 1_000_000)))
    for value, r in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == value,
                     int(round(float(r) * 1_000_000))).otherwise(thr)
    return (df.withColumn("__bucket__", bucket)
            .where(F.col("__bucket__") < thr)
            .drop("__bucket__"))


def hash_quota_sample(df: DataFrame, stratum_col: str, key_col: str,
                      quota: int) -> DataFrame:
    """Exact per-stratum quota: the ``quota`` rows with the smallest
    key hashes per stratum (deterministic "reservoir" — the winner set
    is a pure function of the keys, independent of arrival order).

    One shuffle on the stratum key; at scale, skewed strata ride AQE's
    skew handling, and because rank only needs the top-``quota`` the
    sort is a bounded-heap top-K per partition, not a full sort.
    """
    from pyspark.sql import Window
    w = (Window.partitionBy(stratum_col)
         .orderBy(F.expr(_BUCKET.format(key=key_col)), F.col(key_col)))
    return (df.withColumn("__rk__", F.row_number().over(w))
            .where(F.col("__rk__") <= quota)
            .drop("__rk__"))
