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


def temperature_mixture_rates(df: DataFrame, stratum_col: str,
                              weight_col: str, alpha: float = 0.5,
                              budget: float | None = None) -> dict[str, float]:
    """Temperature-scaled mixture rates per stratum (the multilingual /
    multi-source re-balancing rule of mBERT/XLM-R-style sampling,
    Conneau & Lample 2019): stratum ``s`` with weight share ``p_s``
    (sum of ``weight_col``, e.g. token counts) is sampled with
    probability ∝ ``p_s^alpha`` — ``alpha=1`` keeps natural
    proportions, ``alpha→0`` flattens toward uniform, lifting
    low-resource strata.

    Returns ``{stratum: keep_rate}`` scaled so the expected kept
    weight equals ``budget`` (a fraction of the corpus total; default
    = the largest rate hitting 1.0, i.e. the biggest upweighted
    stratum is taken whole).  Feed the result straight into
    :func:`hash_stratified_sample` — the rates stay deterministic and
    the selection layout-independent.

    One tiny aggregation (stratum cardinality « corpus) is collected
    to the driver — the same "broadcast the mixture table" shape any
    weighted-mixture trainer uses.

    Rows with a NULL stratum are excluded (they fall to the sampler's
    ``default_rate``); zero-weight strata get rate 0.0.  When an
    explicit ``budget`` would push a stratum past rate 1.0, the
    surplus is water-filled into the remaining strata (clipped strata
    are taken whole, the rest re-normalized toward the ``p^alpha``
    target) so the expected kept weight still hits the budget whenever
    it is feasible.
    """
    rows = (df.where(F.col(stratum_col).isNotNull())
            .groupBy(stratum_col)
            .agg(F.sum(weight_col).alias("__w__")).collect())
    weights = {r[stratum_col]: float(r["__w__"] or 0.0) for r in rows}
    total = sum(weights.values())
    if total <= 0:
        return {s: 0.0 for s in weights}
    pos = {s: w for s, w in weights.items() if w > 0}
    q = {s: (w / total) ** alpha for s, w in pos.items()}

    if budget is None:
        # scale so the most-upweighted stratum is taken whole
        z = sum(q.values())
        raw = {s: (q[s] / z) / (pos[s] / total) for s in pos}
        target = 1.0 / max(raw.values())
        rates = {s: min(1.0, r * target) for s, r in raw.items()}
    else:
        # water-filling: kept_s tracks q proportions; a stratum whose
        # share exceeds its size is clipped to 1.0 and the remaining
        # kept-weight target is redistributed over the rest
        remaining_T = min(budget, 1.0) * total
        open_set = dict(q)
        rates = {}
        while open_set:
            qz = sum(open_set.values())
            clipped = False
            for s in list(open_set):
                if open_set[s] / qz * remaining_T >= pos[s]:
                    rates[s] = 1.0
                    remaining_T -= pos[s]
                    del open_set[s]
                    clipped = True
            if not clipped:
                for s in open_set:
                    rates[s] = max(0.0, open_set[s] / qz * remaining_T
                                   / pos[s])
                break
    rates.update({s: 0.0 for s in weights if s not in rates})
    return rates


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
