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
- ``pq_topk``: product-quantization path — vectors encoded to M small
  codes against per-subspace codebooks; per query a (M × K) distance
  lookup table makes each vector's approximate distance M table reads
  instead of d multiplies, computed in a vectorized Arrow kernel
  (mapInPandas, numpy gather — the one step Spark has no built-in
  for); the k·refine best candidates are exactly re-ranked JVM-side.
  At 100 TB the codes are the stored index (d·4 bytes → M bytes per
  vector, a 32× scan-volume cut at the defaults) and the scan
  parallelizes per partition with no shuffle before the top-k.
"""

from __future__ import annotations

import pandas as pd
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


def _topk_rank(scored: DataFrame, k: int) -> DataFrame:
    """Shared top-k contract: rank by rounded sim desc, tie-break by
    neighbor id — every ANN path must match cosine_topk's ordering."""
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("sim"), 6).desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim", 6).alias("sim")))


def _exact_rerank(cand: DataFrame, vectors: DataFrame, queries: DataFrame,
                  k: int, id_col: str, vec_col: str) -> DataFrame:
    """Re-rank a (query_id, neighbor_id) candidate shortlist with the
    exact cosine, joining vectors back and broadcasting the queries —
    the shared tail of every approximate path."""
    v = vectors.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("v_emb"))
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("q_emb")))
    exact = (cand.join(v, "neighbor_id").join(q, "query_id")
             .withColumn("sim", F.expr(cosine_sim_expr("v_emb", "q_emb"))))
    return _topk_rank(exact, k)


def _collect_queries(queries: DataFrame, id_col: str, vec_col: str):
    """Driver-side (ids, L2-normalized matrix) of the query set; the
    query side of an ANN search is small by contract."""
    import numpy as np

    rows = (queries.select(F.col(id_col).alias("qid"),
                           F.col(vec_col).alias("emb")).collect())
    q_ids = np.array([r["qid"] for r in rows])
    if not rows:
        return q_ids, np.zeros((0, 0))
    q_mat = np.array([list(r["emb"]) for r in rows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    return q_ids, q_mat


def _empty_topk(vectors: DataFrame, id_col: str) -> DataFrame:
    id_t = vectors.schema[id_col].dataType.simpleString()
    return vectors.sparkSession.createDataFrame(
        [], f"query_id {id_t}, neighbor_id {id_t}, rank int, sim double")


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
    return _topk_rank(sims, k)


# trained codebooks memoized on a content digest of the training
# matrix + params: training is a deterministic function of its inputs,
# so the memo is semantics-free — it is the in-process analog of the
# persisted index artifact a production deployment trains once and
# ships to every query job.  Bounded FIFO (a long-lived driver touching
# many corpora must not grow the cache monotonically).
_PQ_CODEBOOK_CACHE: dict[tuple, object] = {}
_PQ_CODEBOOK_CACHE_MAX = 8


def _train_pq_codebook(train, m_subspaces: int, n_codes: int,
                       iters: int = 15):
    """Per-subspace Lloyd k-means on a bounded driver-side sample.

    Deterministic: init = the first ``n_codes`` sub-vectors, fixed
    iteration count.  O(sample · K · M · iters · sub) numpy ops — a few
    tens of millions at the defaults, negligible next to one Spark job.
    """
    import numpy as np

    n, d = train.shape
    sub = d // m_subspaces
    k = min(n_codes, n)
    parts = train.reshape(n, m_subspaces, sub)
    books = []
    for m in range(m_subspaces):
        pts = parts[:, m, :]
        cent = pts[:k].copy()
        for _ in range(iters):
            assign = ((pts[:, None, :] - cent[None]) ** 2).sum(-1).argmin(1)
            for c in range(k):
                sel = pts[assign == c]
                if len(sel):
                    cent[c] = sel.mean(0)
        books.append(cent)
    return np.stack(books)  # (M, K, sub)


def pq_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
            m_subspaces: int = 16, n_codes: int = 32, refine: int = 12,
            train_rows: int = 2048,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Product-quantization ANN with exact re-ranking.

    Codebooks: per-subspace k-means over a bounded, deterministic
    training sample (the ``train_rows`` smallest-id vectors,
    L2-normalized — at production scale substitute a uniform sample;
    the index/scan topology is what matters).  Vectors are normalized,
    encoded to their nearest codeword per subspace, and scored against
    each query through a precomputed (M × K) lookup table —
    squared-L2 on unit vectors, which orders identically to cosine
    (||a−b||² = 2 − 2·cos).  The ``k·refine`` best candidates per query
    are re-ranked with the exact cosine JVM-side, so output
    ordering/tie-breaks match :func:`cosine_topk` whenever the
    candidate set contains the true top-k.
    """
    import numpy as np
    import pandas as pd

    # empty query set: nothing to search — skip the (driver-side)
    # codebook training entirely
    q_ids, q_mat = _collect_queries(queries, id_col, vec_col)
    if not len(q_ids):
        return _empty_topk(vectors, id_col)

    # ---- codebook training + query LUTs (driver-side, bounded sample)
    # the train_rows SMALLEST-ID vectors (per the docstring) — an
    # id-range filter would be empty for hash/UUID-style ids
    cb_rows = (vectors.orderBy(id_col).limit(train_rows)
               .select(vec_col).collect())
    train = np.array([list(r[0]) for r in cb_rows], dtype=np.float64)
    train /= np.maximum(np.linalg.norm(train, axis=1, keepdims=True), 1e-12)
    d = train.shape[1]
    if d % m_subspaces:
        raise ValueError(f"dim {d} not divisible by {m_subspaces} subspaces")
    sub = d // m_subspaces
    import hashlib
    cb_key = (m_subspaces, n_codes, train.shape,
              hashlib.md5(train.tobytes()).hexdigest())
    codebook = _PQ_CODEBOOK_CACHE.get(cb_key)
    if codebook is None:
        codebook = _train_pq_codebook(train, m_subspaces, n_codes)
        while len(_PQ_CODEBOOK_CACHE) >= _PQ_CODEBOOK_CACHE_MAX:
            _PQ_CODEBOOK_CACHE.pop(next(iter(_PQ_CODEBOOK_CACHE)))
        _PQ_CODEBOOK_CACHE[cb_key] = codebook

    # LUT[q, m, c] = ||q_sub − codeword||² ; per-pair cost becomes M reads
    lut = ((q_mat.reshape(len(q_ids), m_subspaces, 1, sub)
            - codebook[None]) ** 2).sum(-1)

    nq, m_ix = len(q_ids), np.arange(m_subspaces)

    def adc_kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            emb = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                              1e-12)
            parts = emb.reshape(len(emb), m_subspaces, 1, sub)
            # encode: nearest codeword per subspace → (B, M) small ints
            codes = ((parts - codebook[None]) ** 2).sum(-1).argmin(-1)
            # ADC gather: dist[q, b] = Σ_m LUT[q, m, codes[b, m]]
            approx = lut[:, m_ix[None, :], codes].sum(-1)  # (Q, B)
            vids = pdf[id_col].to_numpy()
            yield pd.DataFrame({
                "query_id": np.repeat(q_ids, len(vids)),
                "neighbor_id": np.tile(vids, nq),
                "approx": approx.reshape(-1),
            })

    id_t = vectors.schema[id_col].dataType.simpleString()
    scored = ensure_parallelism(vectors).select(id_col, vec_col).mapInPandas(
        adc_kernel,
        f"query_id {id_t}, neighbor_id {id_t}, approx double")

    wc = Window.partitionBy("query_id").orderBy(
        F.col("approx").asc(), F.col("neighbor_id"))
    cand = (scored.where(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("crn", F.row_number().over(wc))
            .where(F.col("crn") <= k * refine)
            .drop("crn", "approx"))
    # exact re-rank of the candidate shortlist (broadcast-size join back)
    return _exact_rerank(cand, vectors, queries, k, id_col, vec_col)


def graph_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
               m_edges: int = 8, ef_search: int = 32, refine: int = 4,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Navigable-small-world graph ANN (the HNSW family, Malkov &
    Yashunin 2016), sharded per partition — the production pattern for
    graph indexes at cluster scale: graph construction is inherently
    sequential, so each partition builds its OWN small-world graph and
    answers every query locally; the per-shard candidate lists are
    merged by an exact JVM-side re-rank.  Adding executors adds shards,
    not coordination — index build is embarrassingly parallel and no
    shard ever sees another's vectors.

    Per shard (one Arrow kernel pass, numpy only):

    - build: exact kNN adjacency over the shard (O(n²·d) BLAS — bounded
      by ``spark.sql.files.maxPartitionBytes``, NOT corpus size; a
      production build swaps incremental HNSW insertion here behind the
      same (ids, edges) contract),
    - search: best-first beam from a fixed entry point with an
      ``ef_search``-bounded frontier — the NSW search loop, visiting
      O(ef·M) nodes instead of n.

    Output schema/tie-breaks match :func:`cosine_topk`; whenever the
    union of shard candidates contains the true top-k the result is
    exactly the brute-force answer (pytest pins recall ≥ 0.9).

    Shard layout is DETERMINISTIC (ADVICE r3): vectors are hash-
    partitioned by id and sorted within each shard, and each partition
    builds exactly ONE graph (Arrow batches are concatenated), so the
    candidate union — and with it the merged result — is a pure
    function of the vector set, not of scan order, round-robin
    placement, or arrow batch sizing.
    """
    import heapq

    import numpy as np
    import pandas as pd

    q_ids, q_mat = _collect_queries(queries, id_col, vec_col)
    if not len(q_ids):
        return _empty_topk(vectors, id_col)
    n_cand = k * refine

    def shard_kernel(batches):
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        for pdf in (pd.concat(chunks, ignore_index=True),):
            emb = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                              1e-12)
            vids = pdf[id_col].to_numpy()
            n = len(emb)
            # ---- build: kNN adjacency (bidirectional, so the graph is
            # navigable from the fixed entry point)
            sims = emb @ emb.T
            np.fill_diagonal(sims, -np.inf)
            m = min(m_edges, n - 1) if n > 1 else 0
            nbrs = np.argpartition(-sims, range(m), axis=1)[:, :m] \
                if m else np.zeros((n, 0), dtype=int)
            adj = [set() for _ in range(n)]
            for i in range(n):
                for j in nbrs[i]:
                    adj[i].add(int(j))
                    adj[int(j)].add(i)
            # ---- search: best-first beam per query, entry = node 0
            out_q, out_v, out_s = [], [], []
            for qi in range(len(q_ids)):
                qv = q_mat[qi]
                entry = 0
                d0 = float(emb[entry] @ qv)
                visited = {entry}
                # max-heap frontier by sim; min-heap result beam of ef
                frontier = [(-d0, entry)]
                beam: list[tuple[float, int]] = [(d0, entry)]
                while frontier:
                    neg, u = heapq.heappop(frontier)
                    if -neg < beam[0][0] and len(beam) >= ef_search:
                        break  # frontier can't improve the beam
                    for v in adj[u]:
                        if v in visited:
                            continue
                        visited.add(v)
                        dv = float(emb[v] @ qv)
                        if len(beam) < ef_search or dv > beam[0][0]:
                            heapq.heappush(frontier, (-dv, v))
                            heapq.heappush(beam, (dv, v))
                            if len(beam) > ef_search:
                                heapq.heappop(beam)
                top = sorted(beam, key=lambda t: (-t[0], vids[t[1]]))[:n_cand]
                for s, i in top:
                    out_q.append(q_ids[qi])
                    out_v.append(vids[i])
                    out_s.append(s)
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_v,
                                "approx": out_s})

    id_t = vectors.schema[id_col].dataType.simpleString()
    # deterministic shard layout: hash-partition by id (stable for a
    # given vector set + partition count), id-sorted within the shard
    # so the entry node and build order never depend on scan order
    spark = vectors.sparkSession
    n_shards = max(int(spark.sparkContext.defaultParallelism), 1)
    sharded = (vectors.select(id_col, vec_col)
               .repartition(n_shards, F.col(id_col))
               .sortWithinPartitions(id_col))
    cand = (sharded
            .mapInPandas(shard_kernel,
                         f"query_id {id_t}, neighbor_id {id_t}, approx double")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .drop("approx"))
    # global merge: exact re-rank of the union of shard candidates
    return _exact_rerank(cand, vectors, queries, k, id_col, vec_col)


def _cos_col(a, b):
    """Column-level cosine between two array columns, zero-norm-guarded
    (a zero vector scores 0.0 against everything instead of NaN) — the
    row-local twin of :func:`cosine_sim_expr` for higher-order lambdas."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    norm = lambda v: F.sqrt(F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return dot / F.greatest(norm(a) * norm(b), F.lit(1e-300))


def _collect_centroids(centroids: DataFrame, id_col: str, vec_col: str):
    """Driver-side ((cid, vector) list cid-ascending, id-type string).
    A centroid set is a MODEL (k·d values), not data — by contract it
    fits the driver, exactly like the k-means init/means round-trips.
    Ids keep their input type (string/UUID blocking keys work too)."""
    local = getattr(centroids, "_streamsql_local_centroids", None)
    if local is not None and id_col in centroids.columns \
            and vec_col in centroids.columns:
        # model trained this session (kmeans_fit): already driver-side.
        # The column check keeps a caller's WRONG id_col/vec_col loud
        # (falls through to schema[id_col] below) instead of silently
        # returning the pinned model.
        return local
    id_t = centroids.schema[id_col].dataType.simpleString()
    # driver-side sort, NOT .orderBy: a k-row frame doesn't need the
    # range-partitioning sampling job Spark schedules for a sort
    rows = (centroids.select(F.col(id_col).alias("cid"),
                             F.col(vec_col).alias("ce"))
            .collect())
    rows.sort(key=lambda r: r["cid"])
    return ([(r["cid"], [float(x) for x in r["ce"]]) for r in rows], id_t)


def _nearest_centroids_col(emb, cents, n: int = 1,
                           max_expr_cells: int = 20000,
                           bc_registry: list | None = None,
                           id_type: str = "bigint"):
    """Array of the ``n`` nearest centroid ids for embedding column
    ``emb`` — cosine, 6dp rounding, min-cid tie-break (the shared ANN
    ordering contract) — computed ROW-LOCALLY, so the corpus never
    enters an Exchange.  That invariant is what makes Lloyd iterations
    and IVF assignment linear passes at 100 TB instead of corpus×k
    shuffles.

    Two zero-exchange physical forms:

    - k·d <= ``max_expr_cells``: the centroids fold into the plan as a
      literal array<struct<cid, ce>>; argmin via JVM higher-order
      transform → array_sort → slice.  No Python in the loop.
    - larger models: an Arrow-batched pandas UDF over a
      TorrentBroadcast of the (k, d) matrix — one numpy matmul per
      batch.  A 1024×768 codebook as a plan literal would blow up
      codegen and re-ship with every task binary; the broadcast ships
      once per executor.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    import math

    k = len(cents)
    d = len(cents[0][1]) if k else 0
    if k * d <= max_expr_cells:
        # ONE SQL-text expression, not k·d F.lit() Column calls: every
        # lit/struct/array builder is a py4j round trip, and an 8×64
        # model costs 500+ of them (~1 s of pure driver latency per
        # assign) — the JVM parses the single string in one call.
        # repr() of a finite double round-trips bit-exactly through
        # Java's correctly-rounded parseDouble, so the folded literal
        # is identical to the F.lit form; non-finite values (never
        # produced by the trainers) fall back to the Column builders.
        def _cid_sql(cid) -> str | None:
            if isinstance(cid, bool):
                return None
            if isinstance(cid, int):
                return f"CAST({cid} AS {id_type})"
            if isinstance(cid, str) and "\\" not in cid:
                return "'" + cid.replace("'", "''") + "'"
            return None
        vals = [x for _, ce in cents for x in ce]
        cid_sqls = [_cid_sql(cid) for cid, _ in cents]
        if all(s is not None for s in cid_sqls) \
                and all(math.isfinite(float(x)) for x in vals):
            parts = ", ".join(
                f"named_struct('cid', {cs}, 'ce', array("
                + ", ".join(f"{float(x)!r}D" for x in ce) + "))"
                for cs, (_, ce) in zip(cid_sqls, cents))
            lit = F.expr(f"array({parts})")
        else:
            lit = F.array(*[
                F.struct(F.lit(cid).cast(id_type).alias("cid"),
                         F.array(*[F.lit(float(x)) for x in ce]).alias("ce"))
                for cid, ce in cents])
        scored = F.transform(lit, lambda c: F.struct(
            (-F.round(_cos_col(emb, c["ce"]), 6)).alias("ns"),
            c["cid"].alias("cid")))
        top = F.slice(F.array_sort(scored), 1, n)
        return F.transform(top, lambda s: s["cid"])

    import numpy as np
    from pyspark.sql import SparkSession

    cids = np.array([cid for cid, _ in cents],
                    dtype=(np.int64 if id_type in
                           ("bigint", "int", "smallint", "tinyint")
                           else object))
    M = np.array([ce for _, ce in cents], dtype=np.float64)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    bc = SparkSession.getActiveSession().sparkContext.broadcast((cids, Mn))
    if bc_registry is not None:
        # hand the broadcast's lifetime to the caller: an iterative
        # trainer creates one per Lloyd round and must unpersist after
        # its action, or a long session leaks a centroid matrix per
        # iteration
        bc_registry.append(bc)

    @F.pandas_udf(f"array<{id_type}>")
    def nearest(col: pd.Series) -> pd.Series:
        ids, Cn = bc.value
        X = np.array([np.asarray(v, dtype=np.float64) for v in col])
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        raw = Xn @ Cn.T
        # HALF_UP (away from zero) to 6dp, matching the expression
        # path's Spark round() — np.round is HALF_EVEN and would flip
        # ties exactly on a .5e-6 boundary.  (Residual delta vs Spark:
        # round() quantizes the Double.toString decimal form; this
        # quantizes the scaled value — they differ only when the two
        # representations disagree in the 7th decimal's half-ulp,
        # measure-zero for real cosines.)
        sims = np.copysign(np.floor(np.abs(raw) * 1e6 + 0.5), raw) / 1e6
        # stable sort on -sim: ties keep ascending-cid order (cents
        # arrive cid-sorted) — same tie-break as the expression path
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n]
        return pd.Series([ids[row].tolist() for row in order])

    return nearest(emb)


def assign_clusters(vectors: DataFrame, centroids: DataFrame,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    widen: bool = True) -> DataFrame:
    """Assign each vector to its nearest centroid (cosine) — the argmin
    itself is a ZERO-EXCHANGE narrow map.

    The k centroids are collected to the driver (a model — k·d values)
    and the argmin is evaluated row-locally per vector via
    :func:`_nearest_centroids_col`; the corpus is never joined,
    windowed, or key-shuffled.  ``widen`` (default) keeps the shared
    narrow-scan guard: a one-split local scan round-robins to cluster
    width so the CPU-bound argmin parallelizes (a no-op at real scale
    — thousands of splits already); callers that pre-widen (the Lloyd
    loop, ivf_topk) pass ``widen=False`` for a literally exchange-free
    plan.  Determinism: sims rounded to 6dp, ties broken by smallest
    centroid id.
    """
    cents, id_t = _collect_centroids(centroids, id_col, vec_col)
    src = ensure_parallelism(vectors) if widen else vectors
    return _assign_with(src, cents, id_col, vec_col, id_t)


def _assign_with(vectors: DataFrame, cents, id_col: str, vec_col: str,
                 id_type: str = "bigint") -> DataFrame:
    """assign_clusters against an already-collected centroid list —
    lets one driver collect feed both the assign stage and the probe
    stage (ivf_topk) or the whole Lloyd loop (kmeans_fit)."""
    base = vectors.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("embedding"))
    if not cents:
        return (base.withColumn("centroid_id", F.lit(None).cast(id_type))
                .where(F.lit(False)))
    near = _nearest_centroids_col(F.col("embedding"), cents, 1,
                                  id_type=id_type)
    return base.withColumn("centroid_id", F.element_at(near, 1))


def kmeans_fit(vectors: DataFrame, k: int, max_iter: int = 10,
               tol: float = 1e-4, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column — the
    centroid trainer for IVF probing and SemDeDup-style cluster
    blocking at corpus scale (the driver-side numpy codebook trainers
    cover model-sized inputs; THIS is the path when the training set is
    the corpus itself).

    Per iteration (driver-orchestrated, each a single Spark job):

    - assign: nearest-by-cosine argmin per vector, evaluated
      ROW-LOCALLY against the driver-held centroids
      (:func:`_nearest_centroids_col` — zero exchanges: no join, no
      window, no shuffle of the corpus, verified by
      ``test_plans.py::test_kmeans_assign_is_zero_exchange``);
    - update: ``posexplode`` the assigned embeddings and hash-aggregate
      elementwise means per (cluster, dim).  The shuffle carries only
      k·d rows after map-side partial aggregation — the corpus itself
      never reshuffles;
    - the k·d mean values (a few KB) come back to the driver to form
      the next broadcast — the standard scalable k-means topology.

    DETERMINISTIC: init = the k smallest-id vectors; centroids are
    rounded to 6 dp each iteration so float summation order across
    partitions cannot leak into the result; fixed ``max_iter`` with an
    early stop when no centroid moves more than ``tol`` (L∞ on the
    rounded coordinates).  Empty clusters keep their previous centroid.

    Returns a ``(centroid_id BIGINT, <vec_col>)`` DataFrame accepted by
    :func:`assign_clusters` / :func:`ivf_topk` / ``semantic_dedup``.
    """
    spark = vectors.sparkSession
    d = None
    init = (vectors.select(F.col(id_col).alias("cid"),
                           F.col(vec_col).alias("emb"))
            .orderBy("cid").limit(k).collect())
    if not init:
        raise ValueError("kmeans_fit: empty input")
    cents = [[round(float(x), 6) for x in r["emb"]] for r in init]
    d = len(cents[0])
    # widen ONCE before the loop (local small-file fixtures plan as one
    # split); at scale the scan already has thousands — no-op
    corpus = (ensure_parallelism(vectors)
              .select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("embedding")))

    def centroid_df(cs):
        return spark.createDataFrame(
            [(i, c) for i, c in enumerate(cs)],
            f"{id_col} bigint, {vec_col} array<double>")

    for _ in range(max_iter):
        bcs: list = []
        near = _nearest_centroids_col(
            F.col("embedding"), list(enumerate(cents)), 1,
            bc_registry=bcs)
        assigned = corpus.withColumn("centroid_id", F.element_at(near, 1))
        means = (assigned
                 .select("centroid_id",
                         F.posexplode(F.col("embedding")).alias("pos", "x"))
                 .groupBy("centroid_id", "pos")
                 .agg(F.avg(F.col("x").cast("double")).alias("m"))
                 .collect())
        for bc in bcs:
            # the assign job is fully consumed by the means collect —
            # release this round's centroid broadcast (executor+driver)
            bc.unpersist()
        nxt = [list(c) for c in cents]
        by_c: dict[int, list] = {}
        for r in means:
            by_c.setdefault(int(r["centroid_id"]), [None] * d)[
                int(r["pos"])] = round(float(r["m"]), 6)
        for cid, vec in by_c.items():
            if all(v is not None for v in vec):
                nxt[cid] = vec
        shift = max((abs(a - b) for c0, c1 in zip(cents, nxt)
                     for a, b in zip(c0, c1)), default=0.0)
        cents = nxt
        if shift <= tol:
            break
    out = centroid_df(cents).withColumnRenamed(id_col, "centroid_id")
    # the trained model already lives on the driver — pin it on the
    # returned frame so _collect_centroids consumers (ivf_topk,
    # semantic_dedup) skip the createDataFrame->collect round-trip
    # (~0.7 s of pure job overhead for a k·d-value model)
    out._streamsql_local_centroids = (
        [(i, list(c)) for i, c in enumerate(cents)], "bigint")
    return out


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 8, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF approximate top-k.

    Default centroids are the vectors with the ``n_centroids`` smallest
    ids — deterministic and engine-reproducible; pass
    ``centroids=kmeans_fit(vectors, k)`` for trained cells (the search
    topology is identical — only the cell quality changes).
    """
    if centroids is None:
        # min-id selection, not an id-range filter: sparse/hash ids
        # would otherwise yield an EMPTY centroid set and silently
        # empty results
        centroids = vectors.orderBy(id_col).limit(n_centroids)
    else:
        local = getattr(centroids, "_streamsql_local_centroids", None)
        centroids = centroids.select(
            F.col("centroid_id").alias(id_col), F.col(vec_col))
        if local is not None:  # survive the rename projection
            centroids._streamsql_local_centroids = local
    # ONE driver collect of the centroid model feeds both the corpus
    # assign and the query probe lists
    cents, id_t = _collect_centroids(centroids, id_col, vec_col)
    assigned = _assign_with(ensure_parallelism(vectors), cents,
                            id_col, vec_col, id_t)

    # probe lists: nprobe nearest centroids per query, row-local (the
    # same zero-exchange argmin the assign stage uses — no query×k
    # window shuffle)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_emb"))
    probes = (q.withColumn(
        "centroid_id",
        F.explode(_nearest_centroids_col(F.col("q_emb"), cents, nprobe,
                                         id_type=id_t)))
        .select("query_id", "q_emb", "centroid_id"))

    # search only probed clusters: join on cluster id (the prune key);
    # the probe side is queries×nprobe — broadcast it so the corpus
    # side never shuffles
    cand = (assigned.join(F.broadcast(probes), on="centroid_id", how="inner")
            .where(F.col("vec_id") != F.col("query_id"))
            .withColumnRenamed("vec_id", "neighbor_id")
            .withColumn("sim", F.expr(cosine_sim_expr("embedding", "q_emb"))))
    return _topk_rank(cand, k)
