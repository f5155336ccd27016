"""Deduplication operators for large-scale training-data pipelines.

Four families, all designed for the 100 TB shape (shuffle by key/bucket,
never O(n²) across the corpus):

- exact:     hash-groupBy on content digest — one shuffle.
- MinHash:   word-shingle → K minhashes → B bands → bucket join.
             Candidate pairs only within equal band buckets, the classic
             LSH bound (Broder '97; cf. Spark MinHashLSH, which we don't
             use so the hash family stays reproducible in any engine).
- SimHash:   60-bit sign-of-weighted-sums fingerprint (Charikar '02;
             60 = the md5-prefix token hash width); near-dups = small
             hamming distance, banded by four 15-bit chunks.
- n-gram Jaccard: exact set overlap verification via token-postings
             self-join (shared-token candidates only).

All hashing is md5-derived (first 15 hex chars → 60-bit int) so results
are engine-independent and verifiable against a SQL oracle — at
production scale you'd swap in xxhash64 (JVM-side, faster) without
changing the topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import ensure_parallelism

# 60-bit md5 prefix as BIGINT — portable across Spark/DuckDB
_H = "CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def _h(expr: str) -> str:
    return _H.format(expr=expr)


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the min-id representative per content digest.

    Single hash-partitioned aggregate; at 100 TB the digest groupBy is
    the optimal plan (no sort, map-side partial aggregation).  No
    parallelism guard here: one md5 per row is cheaper than the extra
    round-robin shuffle it would add — the groupBy exchange already
    spreads the aggregation.
    """
    digest = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]))
    return (df.withColumn("__digest__", digest)
              .groupBy("__digest__")
              .agg(F.min(id_col).alias("keep_id"),
                   F.count(F.lit(1)).alias("n_copies"))
              .withColumnRenamed("__digest__", "digest"))


def incremental_dedup(new_df: DataFrame, seen_df: DataFrame,
                      content_cols: list[str],
                      id_col: str = "doc_id") -> DataFrame:
    """Cross-run incremental exact dedup: keep only the ``new_df`` rows
    whose content digest does not appear in ``seen_df`` (the already-
    ingested corpus) NOR earlier within the new batch itself — the
    "dedup tonight's crawl against everything we ever ingested" step of
    a continuously-fed training corpus.

    Plan: digest both sides (one md5 per row), LEFT ANTI join on the
    digest (Spark's exact set-difference — hash-partitioned on the
    digest, map-side semi-pruned, never materializing the match), then
    one groupBy for intra-batch copies.  At 100 TB the seen side is a
    digest-only column (store the digests, not the documents); with
    both sides bucketed by digest the anti join is shuffle-free.

    NULL content contract (same as :func:`exact_dedup`): ``concat_ws``
    skips NULLs, so a NULL content column digests identically to the
    empty string — NULL-text and empty-text rows dedup together.
    Pre-filter NULL content upstream if they must be kept distinct.
    """
    def dig(df):
        return df.withColumn("__digest__", F.md5(F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in content_cols])))

    seen = dig(seen_df).select("__digest__")
    return (dig(new_df)
            .join(seen, "__digest__", "left_anti")
            .groupBy("__digest__")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies"))
            .withColumnRenamed("__digest__", "digest"))


def shingles(text_col: str, k: int = 3) -> str:
    """SQL fragment: array of word k-shingles of ``text_col``."""
    toks = f"split({text_col}, ' ')"
    return (f"transform(sequence(0, greatest(size({toks}) - {k}, 0)), "
            f"i -> array_join(slice({toks}, i + 1, {k}), ' '))")


# Affine MinHash family over a 28-bit md5 base hash:
#   h_i(s) = (A_i * base(s) + B_i) mod P,  P = 2^31 - 1 (prime)
# base < 2^28 and A_i,B_i < 2^30 keep every product within 2^59 — no
# 64-bit overflow, so Spark and DuckDB (which errors on overflow)
# compute bit-identical values.  One md5 per shingle total, instead of
# one per shingle per hash function.
_MH_P = 2_147_483_647
_MH_BASE = "CAST(conv(substring(md5({expr}), 1, 7), 16, 10) AS BIGINT)"


def _mh_consts(num_hashes: int) -> tuple[list[int], list[int]]:
    a = [((0x9E3779B1 * (i + 1)) % (1 << 30)) | 1 for i in range(num_hashes)]
    b = [(0x85EBCA77 * (i + 1)) % (1 << 30) for i in range(num_hashes)]
    return a, b


def minhash_signature_cols(text_col: str, num_hashes: int, k: int = 3) -> list[str]:
    """SQL fragments: (base-hash array, K-wide signature array).

    Stays entirely JVM-side and makes ONE pass over the shingle array:
    the fold accumulator is the whole K-wide minimum vector, updated per
    shingle with a zip against the constant (A_i, B_i) coefficient array
    — a single compact expression instead of K separate folds (K
    re-walks of the array and a K× larger plan to analyze and codegen).
    """
    sh = shingles(text_col, k)
    base = f"transform({sh}, s -> {_MH_BASE.format(expr='s')})"
    av, bv = _mh_consts(num_hashes)
    ab = ", ".join(f"named_struct('a', {a}L, 'b', {b}L)"
                   for a, b in zip(av, bv))
    sig = (f"aggregate(__mh_base__, "
           f"array_repeat(CAST(9223372036854775807 AS BIGINT), {num_hashes}), "
           f"(acc, h) -> zip_with(acc, array({ab}), "
           f"(m, c) -> least(m, (c.a * h + c.b) % {_MH_P})))")
    return [base, sig]


def minhash_dedup_pairs(df: DataFrame, text_col: str, id_col: str,
                        num_hashes: int = 12, bands: int = 4,
                        shingle_k: int = 3,
                        threshold: float = 0.5,
                        max_bucket: int = 100_000) -> DataFrame:
    """MinHash-LSH near-duplicate pairs.

    Plan shape (scale-critical):
      1. one narrow pass computes the K-wide signature per doc (no shuffle);
      2. explode to B band-bucket keys (B rows/doc);
      3. ONE shuffle by bucket, collect bucket members, in-bucket pair
         combinations as a JVM array expression (no self-join — a join
         would recompute the dominant signature pass once per side);
      4. estimated Jaccard = fraction of equal minhashes, filter ≥
         threshold, then cross-band pair dedup.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, deduped across
    buckets.  Buckets larger than ``max_bucket`` are degenerate content
    (e.g. the all-empty-text bucket) whose pair count is quadratic —
    dropped, the standard LSH-dedup guard.
    """
    df = ensure_parallelism(df)
    rows_per_band = num_hashes // bands
    base, sig_expr = minhash_signature_cols(text_col, num_hashes, shingle_k)
    sig = (df.select(F.col(id_col).alias("doc_id"),
                     F.expr(base).alias("__mh_base__"))
             .select("doc_id", F.expr(sig_expr).alias("sig")))
    band_exprs = []
    for b in range(bands):
        lo = b * rows_per_band
        parts = ", ".join(f"CAST(sig[{lo + j}] AS STRING)" for j in range(rows_per_band))
        band_exprs.append(f"named_struct('band', {b}, 'bucket', md5(concat_ws(',', {parts})))")
    banded = sig.select(
        "doc_id", "sig",
        F.explode(F.expr(f"array({', '.join(band_exprs)})")).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # groupBy bucket + in-bucket combinations instead of a self-join:
    # the signature pass over the corpus runs exactly ONCE (a self-join
    # computes it per side — at 100 TB that doubles the dominant cost),
    # and pair generation is a JVM array expression, no second shuffle.
    # Oversized buckets (degenerate content, e.g. empty text) would blow
    # the pair budget quadratically — capped and dropped, the standard
    # LSH-dedup guard; the cap never triggers on honest near-dup buckets.
    members = (banded.groupBy("band", "bucket")
               .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sig"))).alias("m"))
               .where((F.size("m") > 1) & (F.size("m") <= max_bucket)))
    pairs = members.select(F.explode(F.expr(
        "flatten(transform(m, (a, i) -> transform(slice(m, i + 2, size(m)), "
        "b -> struct(a.doc_id AS id_a, b.doc_id AS id_b, "
        "CAST(size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v)) AS DOUBLE)"
        " / size(a.sig) AS est_jaccard))))")).alias("p")).select("p.*")
    return (pairs.where(F.col("est_jaccard") >= threshold)
                 .dropDuplicates(["id_a", "id_b"]))


def simhash_expr(text_col: str, bits: int = 60) -> str:
    """SQL fragment: SimHash fingerprint of whitespace tokens.

    sign-of-sum per bit over token hashes; emitted as BIGINT.  Pure
    Catalyst expressions (aggregate over the token array).  The token
    hash is a 60-bit md5 prefix, so the fingerprint is 60 BITS wide —
    computing sign-sums for the four permanently-zero top bits would
    waste 1/16 of the per-token work (and produce the identical
    BIGINT, since an all-zero hash bit sums negative and never sets
    its output bit).
    """
    toks = f"array_distinct(split({text_col}, ' '))"
    # hash each token ONCE, outside the per-bit lambda — an inlined md5
    # inside `b -> ...` would be re-evaluated per bit (64x per token):
    # Catalyst does not CSE across interpreted higher-order-function
    # lambda invocations
    hashes = f"transform({toks}, t -> {_h('t')})"
    # accumulate per-bit counters as an array<int>, then collapse to
    # bits.  Single fused zip_with against a constant bit-index array —
    # materializing a per-token transform(sequence(...)) array and then
    # zipping it is two interpreted 64-iteration passes per token where
    # one suffices.  shiftright(), not `>>`: the SQL parser rejects `>>`
    # inside a two-parameter lambda.
    bit_arr = "array(" + ", ".join(str(b) for b in range(bits)) + ")"
    acc = (f"aggregate({hashes}, array_repeat(0L, {bits}), "
           f"(acc, h) -> zip_with(acc, {bit_arr}, "
           f"(x, b) -> x + CASE WHEN shiftright(h, b) % 2 != 0 THEN 1L ELSE -1L END))")
    return (f"aggregate(zip_with({acc}, sequence(0, {bits - 1}), "
            f"(v, b) -> CASE WHEN v > 0 THEN shiftleft(1L, b) ELSE 0L END), "
            f"0L, (acc, x) -> acc | x)")


def simhash_dedup_pairs(df: DataFrame, text_col: str, id_col: str,
                        max_hamming: int = 8,
                        max_bucket: int = 100_000) -> DataFrame:
    """SimHash near-duplicate pairs: fingerprint, band by FOUR 15-bit
    chunks covering the full 60-bit fingerprint (a pair within hamming
    distance ≤ 3 shares at least one exact chunk — pigeonhole; wider
    distances need more chunks/tables), verify with bit_count.  15-bit
    chunks, not 16: a 16-bit banding of a 60-bit hash leaves the top
    chunk with only 12 varying bits — 8× fewer distinct buckets in
    that band, inflating candidate-pair counts on large corpora.

    Like :func:`minhash_dedup_pairs`, candidates come from ONE shuffle
    (groupBy chunk bucket → in-bucket pair combinations as a JVM array
    expression), not a self-join — the fingerprint aggregate is the
    dominant pass over the corpus and must run exactly once.  Degenerate
    buckets (> ``max_bucket`` members, e.g. all-empty text) are dropped.
    """
    df = ensure_parallelism(df)
    fp = df.select(F.col(id_col).alias("doc_id"),
                   F.expr(simhash_expr(text_col)).alias("simhash"))
    chunks = fp.select(
        "doc_id", "simhash",
        F.explode(F.expr(
            "transform(sequence(0, 3), c -> named_struct("
            "'chunk', c, 'val', (simhash >> (c * 15)) & 32767))")).alias("cc"),
    ).select("doc_id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"))
    members = (chunks.groupBy("chunk", "val")
               .agg(F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("m"))
               .where((F.size("m") > 1) & (F.size("m") <= max_bucket)))
    pairs = members.select(F.explode(F.expr(
        "flatten(transform(m, (a, i) -> transform(slice(m, i + 2, size(m)), "
        "b -> struct(a.doc_id AS id_a, b.doc_id AS id_b, "
        "bit_count(a.simhash ^ b.simhash) AS hamming))))")).alias("p")).select("p.*")
    return (pairs.where(F.col("hamming") <= max_hamming)
                 .dropDuplicates(["id_a", "id_b"]))


def jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                  threshold: float = 0.4,
                  max_token_df: int | None = None) -> DataFrame:
    """Exact n-gram (word) Jaccard via token postings self-join.

    Candidates = pairs sharing ≥1 token (postings join — shuffle by
    token), then exact |A∩B| / |A∪B|.

    ``max_token_df`` is the scale lever: tokens appearing in more than
    that many documents are dropped from the POSTINGS (the standard
    stop-token/df-cut bound), so per-token join fan-out is at most
    max_token_df² instead of corpus².  Candidate pairs then join back
    to the full token sets and the Jaccard is exact — the cut only
    bounds recall (pairs sharing nothing but ultra-common tokens are
    not near-duplicates at any useful threshold).  Without the cut the
    single-pass postings aggregation computes the intersection directly.
    """
    df = ensure_parallelism(df)
    # NOT checkpointed (measured r13, interleaved A/B): materializing
    # the token arrays / pruned postings as stats-less LogicalRDDs
    # demotes the re-verify joins from broadcast and cost ~12% on the
    # entry; the apparent self-join duplication self-heals at scale —
    # both sides of an SMJ candidate join are identical subtrees and
    # share ONE exchange via ReusedExchange.
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      F.expr(f"array_distinct(split({text_col}, ' '))").alias("toks"))
              .withColumn("n_toks", F.size("toks")))
    postings = toks.select("doc_id", "n_toks", F.explode("toks").alias("tok"))
    if max_token_df is not None:
        # df-cut: one extra aggregation on the same shuffle key as the
        # candidate join; the surviving postings bound the fan-out
        rare = (postings.groupBy("tok")
                .agg(F.count(F.lit(1)).alias("df"))
                .where(F.col("df") <= max_token_df)
                .select("tok"))
        pruned = postings.join(rare, "tok", "left_semi")
        a, b = pruned.alias("a"), pruned.alias("b")
        cand = (a.join(b, on="tok", how="inner")
                .where(F.col("a.doc_id") < F.col("b.doc_id"))
                .select(F.col("a.doc_id").alias("id_a"),
                        F.col("b.doc_id").alias("id_b"))
                .distinct())
        ta = toks.select(F.col("doc_id").alias("id_a"),
                         F.col("toks").alias("toks_a"),
                         F.col("n_toks").alias("na"))
        tb = toks.select(F.col("doc_id").alias("id_b"),
                         F.col("toks").alias("toks_b"),
                         F.col("n_toks").alias("nb"))
        shared = (cand.join(ta, "id_a").join(tb, "id_b")
                  .withColumn("inter",
                              F.size(F.array_intersect("toks_a", "toks_b"))))
    else:
        a, b = postings.alias("a"), postings.alias("b")
        shared = (a.join(b, on="tok", how="inner")
                  .where(F.col("a.doc_id") < F.col("b.doc_id"))
                  .groupBy(F.col("a.doc_id").alias("id_a"),
                           F.col("b.doc_id").alias("id_b"),
                           F.col("a.n_toks").alias("na"),
                           F.col("b.n_toks").alias("nb"))
                  .agg(F.count(F.lit(1)).alias("inter")))
    return (shared
            .withColumn("jaccard", F.expr(
                "round(CAST(inter AS DOUBLE) / (na + nb - inter), 6)"))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def stream_dedup(stream: DataFrame, keys: list[str],
                 event_time_col: str = "ts",
                 within: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: keep the FIRST arrival per key, with
    per-key state evicted once the event-time watermark passes
    ``within`` — bounded state on an unbounded stream (the streaming
    face of :func:`exact_dedup`; cf. the reference's ``deduplicate``
    aggregate, functions_aggregation.go:900-931, which buffers within
    a window instead).

    Built directly on Spark's watermarked
    ``dropDuplicatesWithinWatermark``: state lives in the store keyed
    by ``keys``, scales horizontally with key partitioning, and a
    duplicate arriving later than ``within`` after the first is
    (by contract) no longer guaranteed to be dropped — the documented
    trade that makes memory bounded.
    """
    return (stream.withWatermark(event_time_col, within)
            .dropDuplicatesWithinWatermark(keys))


def semantic_dedup(df: DataFrame, quality_col: str,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   threshold: float = 0.4, n_centroids: int = 8,
                   pairs: DataFrame | None = None) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): embeddings are cluster-blocked into near-dup PAIRS
    (:func:`embedding_neardup_pairs`), pairs resolve into transitive
    duplicate GROUPS (distributed connected components), and each group
    keeps its highest-``quality_col`` member (ties: min id) — unlike
    exact/MinHash dedup, the keeper is chosen by VALUE, not by id,
    which is what an LLM corpus pipeline wants (drop the low-quality
    copy, not an arbitrary one).

    Output: one row per input vector — (id, cluster_id, keep).

    Scale shape: the pair stage is K·O((n/K)²) BLAS per cluster block;
    components are O(log n) hash-shuffle star rounds; the election is
    one window over groups (group cardinality « corpus).  Every stage
    is keyed — nothing driver-side.
    """
    from .graph import connected_components

    if pairs is None:
        pairs = embedding_neardup_pairs(df, id_col, vec_col,
                                        threshold, n_centroids)
    comp = connected_components(pairs, nodes=df.select(id_col),
                                node_col=id_col)
    q = df.select(F.col(id_col).cast("long").alias("node"),
                  F.col(quality_col).alias("__q__"))
    w = Window.partitionBy("component_id").orderBy(
        F.col("__q__").desc(), F.col("node"))
    return (comp.join(q, "node")
            .withColumn("__rk__", F.row_number().over(w))
            .select(F.col("node").alias(id_col),
                    F.col("component_id").alias("cluster_id"),
                    (F.col("__rk__") == 1).alias("keep")))


def embedding_neardup_pairs(df: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.4,
                            n_centroids: int = 8,
                            centroids: DataFrame | None = None) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine(emb_a, emb_b) ≥ t.

    Cluster blocking bounds the quadratic self-join: each vector is
    assigned to its nearest centroid (a zero-exchange row-local argmin,
    same topology as IVF assignment) and only within-cluster pairs are
    compared — the
    shuffle key is the cluster id, so at 100 TB the O(n²) becomes
    K · O((n/K)²) with K tunable to the cluster's pair budget.  Default
    blocking centroids are the deterministic min-id vectors; pass
    ``centroids=similarity.kmeans_fit(df, K)`` for trained blocks
    (balanced cells → balanced pair budgets) — the plan shape is
    identical either way.
    """
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    from .similarity import assign_clusters
    if centroids is None:
        # min-id selection, not an id-range filter (sparse/hash ids
        # would yield an empty blocking set -> zero pairs, silently)
        centroids = df.orderBy(id_col).limit(n_centroids)
    else:
        centroids = centroids.select(
            F.col("centroid_id").alias(id_col), F.col(vec_col))
    assigned = assign_clusters(df, centroids, id_col, vec_col)

    # id columns keep the INPUT id type — hardcoding LongType breaks
    # string/UUID ids at the Arrow conversion boundary
    id_type = df.schema[id_col].dataType
    out_schema = StructType([StructField("id_a", id_type),
                             StructField("id_b", id_type),
                             StructField("sim", DoubleType())])

    def cluster_pairs(pdf):
        """All in-cluster pairs ≥ threshold via one BLAS similarity
        matrix — per-pair SQL aggregates would interpret the dot product
        element-by-element; a matmul is the vectorized form of exactly
        the same comparisons.  Chunked over rows so memory stays
        O(chunk · cluster), not O(cluster²)."""
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        M = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in pdf["embedding"]])
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0  # zero vector: sim 0, never ≥ threshold
        Mn = M / norms[:, None]
        n = len(ids)
        cols = np.arange(n)
        out_a, out_b, out_s = [], [], []
        chunk = 2048
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            sims = np.round(Mn[s:e] @ Mn.T, 6)
            keep = (sims >= threshold) & (cols[None, :] > np.arange(s, e)[:, None])
            ri, ci = np.nonzero(keep)
            ia, ib = ids[ri + s], ids[ci]
            lo = np.minimum(ia, ib)
            hi = np.maximum(ia, ib)
            out_a.append(lo)
            out_b.append(hi)
            out_s.append(sims[ri, ci])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "sim": np.concatenate(out_s)})

    return (assigned.groupBy("centroid_id")
            .applyInPandas(cluster_pairs, schema=out_schema)
            .select("id_a", "id_b", "sim"))
