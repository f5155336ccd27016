"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries are broadcast (small side); similarities are computed with
  JVM-side higher-order functions (zip_with/aggregate — no Python in
  the loop); top-k per query via window rank, which Catalyst executes
  as a partial top-k per partition at scale.
- ``ivf_topk``: IVF-style approximate path — K deterministic centroids,
  vectors assigned to their nearest centroid once (one narrow pass),
  queries probe the ``nprobe`` nearest clusters only.  At 100 TB this
  turns an O(N·Q) scan into O(N/K·nprobe·Q) with the cluster id as the
  shuffle/prune key (partition pruning by cluster when the table is
  written bucketed/partitioned by cluster_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import ensure_parallelism

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"


def cosine_sim_expr(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _NORM.format(a=a)
    nb = _NORM.format(a=b)
    return f"({dot}) / (({na}) * ({nb}))"


def cosine_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, neighbor_id, rank, sim)."""
    v = ensure_parallelism(vectors).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_emb"))
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("q_emb")))
    sims = (v.crossJoin(q)
             .where(F.col("neighbor_id") != F.col("query_id"))
             .withColumn("sim", F.expr(cosine_sim_expr("v_emb", "q_emb"))))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("sim"), 6).desc(), F.col("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank",
                        F.round("sim", 6).alias("sim")))


def assign_clusters(vectors: DataFrame, centroids: DataFrame,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (cosine).

    Centroids broadcast; one narrow pass over the corpus.  Determinism:
    ties broken by centroid id.
    """
    c = F.broadcast(centroids.select(F.col(id_col).alias("centroid_id"),
                                     F.col(vec_col).alias("c_emb")))
    scored = (ensure_parallelism(vectors)
              .select(F.col(id_col).alias("vid"), F.col(vec_col).alias("emb"))
              .crossJoin(c)
              .withColumn("c_sim", F.expr(cosine_sim_expr("emb", "c_emb"))))
    w = Window.partitionBy("vid").orderBy(
        F.round(F.col("c_sim"), 6).desc(), F.col("centroid_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("vid").alias("vec_id"), F.col("emb").alias("embedding"),
                    "centroid_id"))


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 8, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF approximate top-k.

    Centroids are the vectors with the ``n_centroids`` smallest ids —
    deterministic and engine-reproducible (a KMeans fit would drop in
    here unchanged; the search topology is what matters).
    """
    centroids = vectors.where(F.col(id_col) < n_centroids)
    assigned = assign_clusters(vectors, centroids, id_col, vec_col)

    # probe lists: nprobe nearest centroids per query
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb"))
    c = F.broadcast(centroids.select(F.col(id_col).alias("centroid_id"),
                                     F.col(vec_col).alias("c_emb")))
    qprobe = (q.crossJoin(c)
              .withColumn("c_sim", F.expr(cosine_sim_expr("q_emb", "c_emb"))))
    wq = Window.partitionBy("query_id").orderBy(
        F.round(F.col("c_sim"), 6).desc(), F.col("centroid_id"))
    probes = (qprobe.withColumn("rn", F.row_number().over(wq))
              .where(F.col("rn") <= nprobe)
              .select("query_id", "q_emb", "centroid_id"))

    # search only probed clusters: join on cluster id (the prune key)
    cand = (assigned.join(probes, on="centroid_id", how="inner")
            .where(F.col("vec_id") != F.col("query_id"))
            .withColumn("sim", F.expr(cosine_sim_expr("embedding", "q_emb"))))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("sim"), 6).desc(), F.col("vec_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank",
                    F.round("sim", 6).alias("sim")))
