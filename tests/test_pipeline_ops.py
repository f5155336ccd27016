"""Unit tests for the round-3 training-pipeline operators: connected
components (duplicate clustering), test-set decontamination, and
deterministic sampling — correctness properties plus the plan-shape
facts that matter at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------ connected components


def _cc(spark, edges, nodes=None):
    from streamsql_spark.operators.graph import connected_components
    e = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    if not edges:
        e = e.where("id_a != id_a")
    n = (spark.createDataFrame([(x,) for x in nodes], "doc_id long")
         if nodes is not None else None)
    out = connected_components(e, nodes=n, node_col="doc_id")
    return {r["node"]: r["component_id"] for r in out.collect()}


def test_cc_chain_collapses_to_min(spark):
    # a path graph is the worst case for naive propagation; star rounds
    # must still converge and label every node with the chain head
    chain = [(i, i + 1) for i in range(30)]
    got = _cc(spark, chain)
    assert got == {i: 0 for i in range(31)}


def test_cc_separate_components_and_isolated_nodes(spark):
    got = _cc(spark, [(5, 3), (3, 9), (20, 21)], nodes=[3, 5, 9, 20, 21, 99])
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 99: 99}


def test_cc_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 1), (7, 7)])
    assert got == {1: 1, 2: 1}  # self-loops dropped, direction ignored


def test_cc_matches_bruteforce_on_random_graph(spark):
    import random
    rnd = random.Random(7)
    n, m = 60, 45
    edges = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(m)]
    # brute force union-find
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for x in range(n):
        r = find(x)
        want[x] = min(y for y in range(n) if find(y) == find(r))
    got = _cc(spark, edges, nodes=list(range(n)))
    assert got == want


def test_cc_converged_skips_relabel_aggregate_but_cut_does_not(spark):
    """r13: after a sig-stable exit the star forest has exactly one row
    per node, so the defensive groupBy(node).min relabel is skipped —
    the converged output must carry no duplicate nodes WITHOUT it.  A
    max_iter-cut run (chains may survive) must still relabel: one row
    per node with a valid upper-bound label."""
    from streamsql_spark.operators.graph import connected_components

    chain = [(i, i + 1) for i in range(12)]
    e = spark.createDataFrame(chain, "id_a long, id_b long")

    out = connected_components(e).collect()
    assert sorted((r["node"], r["component_id"]) for r in out) == \
        [(i, 0) for i in range(13)]
    # converged path: exactly one Aggregate (the roots distinct);
    # the cut path adds the defensive relabel aggregate on top
    def n_aggs(df):
        return df._jdf.queryExecution().optimizedPlan() \
            .toString().count("Aggregate ")
    conv_aggs = n_aggs(connected_components(e))
    cut_aggs = n_aggs(connected_components(e, max_iter=1))
    assert cut_aggs == conv_aggs + 1

    cut = connected_components(e, max_iter=1).collect()
    nodes = [r["node"] for r in cut]
    assert sorted(nodes) == sorted(set(nodes))  # relabel kept: unique
    by = {r["node"]: r["component_id"] for r in cut}
    assert all(by[nd] <= nd for nd in by)  # labels are min-directed


def test_dedup_clusters_marks_min_id_representative(spark):
    from streamsql_spark.operators.graph import dedup_clusters
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(4, 2), (2, 0)], "id_a long, id_b long")
    out = {r["doc_id"]: (r["cluster_id"], r["is_rep"])
           for r in dedup_clusters(docs, pairs).collect()}
    assert out == {0: (0, True), 1: (1, True), 2: (0, False),
                   3: (3, True), 4: (0, False), 5: (5, True)}


# ------------------------------------------------ decontamination


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_ngram_overlap(spark):
    from streamsql_spark.operators.text import decontaminate
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    train = _docs(spark, [
        (1, "the quick brown fox went home"),       # 2 shared 3-grams
        (2, "a completely different sentence here"),  # 0
        (3, "quick brown fox jumps over everything"),  # ≥2
    ])
    out = {r["doc_id"]: (r["n_overlap"], r["contaminated"])
           for r in decontaminate(train, bench, ngram_n=3, min_overlap=2).collect()}
    assert out[1] == (2, True)
    assert out[2] == (0, False)
    assert out[3][0] >= 2 and out[3][1]
    assert len(out) == 3  # every training doc gets a row


def test_decontaminate_counts_repeated_phrase_once(spark):
    from streamsql_spark.operators.text import decontaminate
    bench = _docs(spark, [(100, "alpha beta gamma")])
    # the contaminated 3-gram appears twice in one doc → counts once
    train = _docs(spark, [(1, "alpha beta gamma and alpha beta gamma")])
    row = decontaminate(train, bench, ngram_n=3, min_overlap=2).collect()[0]
    assert row["n_overlap"] == 1
    assert not row["contaminated"]


def test_decontaminate_broadcasts_benchmark_side(spark):
    from streamsql_spark.operators.text import decontaminate
    bench = _docs(spark, [(100, "a b c d")])
    train = _docs(spark, [(1, "a b c e")])
    p = _plan(decontaminate(train, bench))
    # the corpus-side join must be broadcast (benchmark is the small side)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


# ------------------------------------------------ deterministic sampling


def _events(spark, n=400):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(n)]
    return spark.createDataFrame(rows, "event_id long, event_type string")


def test_rate_sample_deterministic_and_layout_independent(spark):
    from streamsql_spark.operators.sample import hash_stratified_sample
    df = _events(spark)
    rates = {"a": 0.5, "b": 0.1}
    pick = lambda d: sorted(  # noqa: E731
        r["event_id"] for r in
        hash_stratified_sample(d, "event_type", "event_id", rates,
                               default_rate=0.0).collect())
    first = pick(df)
    # same rows regardless of physical layout
    assert pick(df.repartition(7)) == first
    assert pick(df.coalesce(1)) == first
    # stratum with rate 0 (default) is empty
    types = {r % 3 for r in first}
    assert 2 not in types


def test_rate_samples_nest_across_rates(spark):
    from streamsql_spark.operators.sample import hash_stratified_sample
    df = _events(spark)
    small = {r["event_id"] for r in hash_stratified_sample(
        df, "event_type", "event_id", {"a": 0.1}).collect()}
    big = {r["event_id"] for r in hash_stratified_sample(
        df, "event_type", "event_id", {"a": 0.4}).collect()}
    assert small <= big  # the 10% sample is inside the 40% sample
    assert len(small) < len(big)


def test_rate_sample_adds_no_shuffle(spark):
    from streamsql_spark.operators.sample import hash_stratified_sample
    df = _events(spark)
    p = _plan(hash_stratified_sample(df, "event_type", "event_id", {"a": 0.5}))
    assert "Exchange" not in p  # pure filter: embarrassingly parallel


def test_quota_sample_exact_counts_and_determinism(spark):
    from streamsql_spark.operators.sample import hash_quota_sample
    df = _events(spark, n=300)
    out = hash_quota_sample(df, "event_type", "event_id", quota=17)
    got = out.groupBy("event_type").count().collect()
    assert {r["event_type"]: r["count"] for r in got} == \
        {"a": 17, "b": 17, "c": 17}
    ids1 = sorted(r["event_id"] for r in out.collect())
    ids2 = sorted(r["event_id"] for r in
                  hash_quota_sample(df.repartition(5), "event_type",
                                    "event_id", quota=17).collect())
    assert ids1 == ids2


def test_quota_sample_takes_all_when_stratum_small(spark):
    from streamsql_spark.operators.sample import hash_quota_sample
    df = _events(spark, n=9)  # 3 per type
    out = hash_quota_sample(df, "event_type", "event_id", quota=17)
    assert out.count() == 9


# --------------------------- repetition / quality-gate features


def _textdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_repetition_top2gram_and_dup3gram(spark):
    from streamsql_spark.operators.text import repetition_features
    # "x y x y x y": 2-grams = [x y, y x, x y, y x, x y] -> top frac 3/5;
    # 3-grams = [x y x, y x y, x y x, y x y] -> all duplicated -> 1.0
    out = repetition_features(_textdocs(spark, ["x y x y x y",
                                            "a b c d e f g"]))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["top_2gram_frac"] == 0.6
    assert rows[0]["dup_3gram_frac"] == 1.0
    # all-distinct text: top 2-gram occurs once, no duplicate 3-grams
    assert rows[1]["top_2gram_frac"] == round(1 / 6, 6)
    assert rows[1]["dup_3gram_frac"] == 0.0


def test_repetition_gopher_gate(spark):
    from streamsql_spark.operators.text import repetition_features
    long_ok = " ".join(f"tok{i % 97}" for i in range(60))
    too_short = "just five little words here"
    loopy = " ".join(["spam ham"] * 40)  # top-2-gram dominated
    numeric = " ".join(["1234 5678"] * 30)  # no alpha words
    out = repetition_features(
        _textdocs(spark, [long_ok, too_short, loopy, numeric]))
    got = {r["doc_id"]: r["gopher_pass"] for r in out.collect()}
    assert got == {0: True, 1: False, 2: False, 3: False}


def test_line_repetition_features(spark):
    from streamsql_spark.operators.text import line_repetition_features
    text = "\n".join(["alpha beta", "alpha beta", "- item one",
                      "gamma delta epsilon", "to be continued..."])
    out = line_repetition_features(_textdocs(spark, [text])).collect()[0]
    assert out["line_count"] == 5
    assert out["dup_line_frac"] == round(1 / 5, 6)
    # duplicate line chars: one "alpha beta" (10 chars) of 58 total
    total = sum(len(l) for l in text.split("\n"))
    assert out["dup_line_char_frac"] == round(10 / total, 6)
    assert out["bullet_line_frac"] == round(1 / 5, 6)
    assert out["ellipsis_line_frac"] == round(1 / 5, 6)


def test_repetition_exchange_reused_and_hash_aggregated(spark):
    # the gram-count branch and the document branch fork from the SAME
    # up-front repartition on the doc id: at runtime one side must be a
    # ReusedExchange (the postings shuffle is paid once), and the
    # frequency stats must run in codegen hash aggregation, not
    # interpreted per-distinct-gram lambda scans
    from streamsql_spark.operators.text import repetition_features
    out = repetition_features(_textdocs(spark, ["a b c"] * 4))
    out.collect()
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in p, p
    assert "HashAggregate" in p, p


# ----------------------------------------------------- PII scrub


def test_pii_scrub_redacts_and_counts(spark):
    from streamsql_spark.operators.text import pii_scrub
    out = pii_scrub(_textdocs(spark, [
        "mail a.user+tag@sub.example.co.uk or b@x.io now",
        "host 192.168.0.1 and 10.0.255.254 up",
        "call +1-555-0100 or +44 (20) 7946 0958 today",
        "clean text with no identifiers at all",
    ])).collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[0]["n_email"] == 2
    assert rows[0]["clean_text"] == "mail <EMAIL> or <EMAIL> now"
    assert rows[1]["n_ipv4"] == 2
    assert rows[1]["clean_text"] == "host <IP> and <IP> up"
    assert rows[2]["n_phone"] == 2
    assert rows[2]["clean_text"] == "call <PHONE> or <PHONE> today"
    assert rows[3]["clean_text"] == "clean text with no identifiers at all"
    assert (rows[3]["n_email"], rows[3]["n_ipv4"], rows[3]["n_phone"]) \
        == (0, 0, 0)


def test_pii_scrub_email_before_phone_ordering(spark):
    from streamsql_spark.operators.text import pii_scrub
    # the digits inside an email local part must not be half-eaten by
    # the phone pattern after partial redaction
    out = pii_scrub(_textdocs(spark, ["reach +15550100123 via n123@d.com"]))
    assert out.collect()[0]["clean_text"] == "reach <PHONE> via <EMAIL>"


# ----------------------------------------------- sequence packing


def test_budget_shard_pack_matches_prefix_rule(spark):
    from streamsql_spark.operators.pack import budget_shard_pack
    rows = [(i, "s", 30 + (i * 17) % 50) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, src string, tokens long")
    out = budget_shard_pack(df, "src", "doc_id", "tokens", budget=100)
    got = {r["doc_id"]: (r["pack_id"], r["pack_offset"])
           for r in out.collect()}
    prefix = 0
    for i, _, tok in rows:
        assert got[i] == (prefix // 100, prefix % 100), i
        prefix += tok


def test_budget_shard_pack_layout_independent(spark):
    from streamsql_spark.operators.pack import budget_shard_pack
    rows = [(i, f"s{i % 3}", 10 + i % 7) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, src string, tokens long")
    a = sorted(map(tuple, budget_shard_pack(
        df, "src", "doc_id", "tokens", 64).collect()))
    b = sorted(map(tuple, budget_shard_pack(
        df.repartition(7), "src", "doc_id", "tokens", 64).collect()))
    assert a == b


def test_greedy_bin_pack_matches_python_reference(spark):
    from streamsql_spark.operators.pack import greedy_bin_pack
    rows = [(i, "g", 5 + (i * 13) % 90) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, src string, tokens long")
    out = greedy_bin_pack(df, "src", "tokens", "doc_id", budget=128)
    got = {r["doc_id"]: r["pack_id"] for r in out.collect()}

    # pure-python FFD with the same (desc tokens, asc id) order
    fills, ref = [], {}
    for i, _, t in sorted(rows, key=lambda r: (-r[2], r[0])):
        for b, fill in enumerate(fills):
            if fill + t <= 128:
                ref[i] = b
                fills[b] = fill + t
                break
        else:
            ref[i] = len(fills)
            fills.append(t)
    assert got == ref


def test_greedy_bin_pack_never_overflows_budget(spark):
    from streamsql_spark.operators.pack import greedy_bin_pack
    rows = [(i, f"g{i % 2}", 1 + (i * 37) % 120) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, src string, tokens long")
    out = greedy_bin_pack(df, "src", "tokens", "doc_id", budget=120)
    agg = out.groupBy("src", "pack_id").sum("tokens").collect()
    assert all(r["sum(tokens)"] <= 120 for r in agg)
    # reported pack_tokens equals the pack's actual fill
    for r in out.collect():
        assert r["pack_tokens"] <= 120


def test_greedy_bin_pack_oversized_doc_gets_singleton(spark):
    from streamsql_spark.operators.pack import greedy_bin_pack
    rows = [(0, "g", 500), (1, "g", 40), (2, "g", 50)]
    df = spark.createDataFrame(rows, "doc_id long, src string, tokens long")
    out = {r["doc_id"]: (r["pack_id"], r["pack_tokens"])
           for r in greedy_bin_pack(df, "src", "tokens", "doc_id",
                                    budget=100).collect()}
    assert out[0] == (0, 500)          # oversize -> its own pack
    assert out[1][0] == out[2][0] == 1  # the small two share the next


# ----------------------------------------------- semantic dedup


def test_semantic_dedup_keeps_highest_quality_per_group(spark):
    from streamsql_spark.operators.dedup import semantic_dedup
    # vec_ids 0..7 are the deterministic centroids; 8/9/10 are copies
    # of centroid 0's direction (one semantic group with the centroid),
    # 11 is orthogonal (its own group)
    base = [0.0] * 8
    rows = []
    for i in range(8):
        v = base.copy()
        v[i] = 1.0
        rows.append((i, v, 5))
    for i, q in ((8, 9), (9, 7), (10, 9)):
        v = base.copy()
        v[0] = 1.0
        rows.append((i, v, q))
    v = base.copy()
    v[7] = -1.0
    rows.append((11, v, 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = {r["vec_id"]: (r["cluster_id"], r["keep"])
           for r in semantic_dedup(df, "label", threshold=0.9,
                                   n_centroids=8).collect()}
    # group {0, 8, 9, 10}: highest label is 9, shared by 8 and 10 ->
    # min id 8 wins; the centroid (label 5) and 9 (label 7) are dropped
    assert out[8] == (0, True)
    assert out[0] == (0, False)
    assert out[9] == (0, False)
    assert out[10] == (0, False)
    # singleton groups keep themselves
    assert out[11][1] is True
    assert sum(1 for c, k in out.values() if k and c == 0) == 1


def test_semantic_dedup_every_input_gets_a_row(spark):
    from streamsql_spark.operators.dedup import semantic_dedup
    from streamsql_spark.session import load_tables
    emb = load_tables(spark, SF_DIR)["embeddings"]
    out = semantic_dedup(emb, "label", threshold=0.4, n_centroids=8)
    assert out.count() == emb.count()
    # exactly one keeper per cluster
    per = out.groupBy("cluster_id").agg(
        F.sum(F.col("keep").cast("int")).alias("n_keep")).collect()
    assert all(r["n_keep"] == 1 for r in per)


# ----------------------------------------------- distributed k-means


def _np_kmeans_replica(X, ids, k, max_iter=10, tol=1e-4):
    """Driver-side replica of kmeans_fit's exact contract: min-id init,
    cosine argmin with 6dp rounding + min-centroid-id tie-break,
    elementwise means rounded to 6dp, L∞ early stop."""
    import numpy as np

    order = np.argsort(ids)
    cents = np.round(X[order[:k]].astype(float), 6)
    for _ in range(max_iter):
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        Cn = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-300)
        sim = np.round(Xn @ Cn.T, 6)
        assign = sim.argmax(1)  # argmax takes the first (min id) on ties
        nxt = cents.copy()
        for c in range(k):
            sel = X[assign == c]
            if len(sel):
                nxt[c] = np.round(sel.mean(0), 6)
        shift = float(np.abs(nxt - cents).max())
        cents = nxt
        if shift <= tol:
            break
    return cents


def test_kmeans_fit_matches_driver_replica(spark):
    """The distributed Lloyd loop (broadcast assign → posexplode
    hash-agg means) must be bit-equal (at the 6dp rounding contract) to
    a sequential numpy replica — determinism across partitionings is
    the point of the rounding."""
    import numpy as np

    from streamsql_spark.operators.similarity import kmeans_fit

    rng = np.random.default_rng(7)
    X = np.round(rng.normal(size=(60, 8)), 3)
    ids = np.arange(60)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in ids],
        "vec_id long, embedding array<double>").repartition(5)
    got = {r["centroid_id"]: list(r["embedding"])
           for r in kmeans_fit(df, k=4, max_iter=5).collect()}
    want = _np_kmeans_replica(X, ids, k=4, max_iter=5)
    assert sorted(got) == [0, 1, 2, 3]
    for c in range(4):
        assert got[c] == [round(float(v), 6) for v in want[c]], c


def test_kmeans_fit_separates_obvious_clusters(spark):
    from streamsql_spark.operators.similarity import (assign_clusters,
                                                      kmeans_fit)
    rows = []
    for i in range(30):
        axis = i % 3
        v = [0.01 * (i % 7)] * 6
        v[axis] += 10.0
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, k=3, max_iter=8)
    assigned = assign_clusters(df, cents.withColumnRenamed(
        "centroid_id", "vec_id"))
    out = assigned.groupBy("centroid_id").count().collect()
    assert sorted(r["count"] for r in out) == [10, 10, 10]
    # every member of an axis group lands in the same cell
    got = {r["vec_id"]: r["centroid_id"]
           for r in assigned.select("vec_id", "centroid_id").collect()}
    for i in range(30):
        assert got[i] == got[i % 3], i


def test_kmeans_fit_edge_cases(spark):
    """k > n yields n centroids (no crash, no padding); all-identical
    vectors leave every cluster at the shared point (empty clusters
    keep their previous centroid); empty input raises typed."""
    from streamsql_spark.operators.similarity import kmeans_fit

    df = spark.createDataFrame([(0, [1.0, 0.0]), (1, [0.0, 1.0])],
                               "vec_id long, embedding array<double>")
    got = sorted((r["centroid_id"], list(r["embedding"]))
                 for r in kmeans_fit(df, k=5, max_iter=2).collect())
    assert got == [(0, [1.0, 0.0]), (1, [0.0, 1.0])]

    same = spark.createDataFrame([(i, [1.0, 1.0]) for i in range(6)],
                                 "vec_id long, embedding array<double>")
    got = [list(r["embedding"])
           for r in kmeans_fit(same, k=3, max_iter=3).collect()]
    assert got == [[1.0, 1.0]] * 3

    with pytest.raises(ValueError, match="empty"):
        kmeans_fit(df.where("vec_id < 0"), k=2)


def test_nearest_centroids_expr_and_arrow_paths_agree(spark):
    """Above max_expr_cells the row-local argmin switches from a
    plan-literal higher-order expression to an Arrow kernel over a
    broadcast (k, d) matrix; both physical forms must produce identical
    (rounded, tie-broken) neighbor lists."""
    import numpy as np

    from streamsql_spark.operators.similarity import _nearest_centroids_col

    rng = np.random.default_rng(11)
    X = np.round(rng.normal(size=(50, 6)), 3)
    cents = [(i, [float(v) for v in np.round(rng.normal(size=6), 3)])
             for i in range(5)]
    # a duplicated centroid forces a genuine tie -> min-cid break;
    # a zero centroid pins the zero-norm guard (sim 0.0, not NaN) on
    # both physical paths
    cents.append((5, list(cents[2][1])))
    cents.append((6, [0.0] * 6))
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(50)]
    rows.append((50, [0.0] * 6))  # zero VECTOR: all sims 0 -> cid 0
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")

    def run(cells):
        col = _nearest_centroids_col(F.col("embedding"), cents, 3,
                                     max_expr_cells=cells)
        return {r["vec_id"]: list(r["n"])
                for r in df.select("vec_id", col.alias("n")).collect()}

    expr, arrow = run(10**9), run(0)
    assert expr == arrow
    assert all(len(v) == 3 for v in expr.values())


def test_kmeans_centroids_feed_ivf_and_blocking(spark):
    """kmeans_fit output plugs into ivf_topk and
    embedding_neardup_pairs unchanged (the trained-cells path)."""
    from streamsql_spark.operators.dedup import embedding_neardup_pairs
    from streamsql_spark.operators.similarity import (cosine_topk,
                                                      ivf_topk, kmeans_fit)
    from streamsql_spark.session import load_tables
    emb = load_tables(spark, SF_DIR)["embeddings"]
    cents = kmeans_fit(emb, k=4, max_iter=3)
    q = emb.where(F.col("vec_id") < 3)
    out = ivf_topk(emb, q, k=3, nprobe=4, centroids=cents)
    exact = cosine_topk(emb, q, k=3)
    # probing ALL 4 cells ≡ exhaustive search ⇒ must equal brute force
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, exact.collect()))
    pairs = embedding_neardup_pairs(emb, threshold=0.5, centroids=cents)
    assert pairs.count() >= 0 and pairs.columns == ["id_a", "id_b", "sim"]


def test_materialize_packs_boundaries_and_order(spark):
    """Pack materialization: concatenation follows PACKING order under
    any physical layout; doc_ids/doc_offsets line up for loss masking."""
    from streamsql_spark.operators.pack import (budget_shard_pack,
                                                materialize_packs)
    rows = [(i, "s", f"doc{i}", 10) for i in range(5)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n long") \
        .repartition(4)  # scramble layout: order must come from order_col
    packed = budget_shard_pack(df, "source", "doc_id", "n", budget=25)
    out = {(r["source"], r["pack_id"]): r
           for r in materialize_packs(packed, "source", "doc_id").collect()}
    # docs 0,1,2 start at offsets 0,10,20 < 25 -> pack 0; 3,4 -> pack 1
    p0, p1 = out[("s", 0)], out[("s", 1)]
    assert p0["pack_text"] == "doc0\n\ndoc1\n\ndoc2"
    assert p0["doc_ids"] == [0, 1, 2] and p0["doc_offsets"] == [0, 10, 20]
    assert p1["pack_text"] == "doc3\n\ndoc4"
    assert p1["doc_ids"] == [3, 4] and p1["doc_offsets"] == [5, 15]
    assert p0["n_docs"] == 3 and p1["n_docs"] == 2


def test_hash_split_deterministic_and_stable_under_growth(spark):
    """hash_split: assignment is a pure function of the key — identical
    across runs AND unchanged when the corpus grows (eval-set
    stability); proportions approximate the weights; zero shuffle."""
    from streamsql_spark.operators.pack import hash_split
    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", w).collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df.limit(1000), "doc_id", w).collect()}
    assert all(a[k] == v for k, v in b.items())  # growth-stable
    from collections import Counter
    frac = Counter(a.values())
    assert 0.76 < frac["train"] / 4000 < 0.84
    assert 0.07 < frac["val"] / 4000 < 0.13
    assert 0.07 < frac["test"] / 4000 < 0.13
    p = _plan(hash_split(df, "doc_id", w))
    assert "Exchange" not in p
    import pytest as _pytest
    with _pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "doc_id", {"train": 0.5})


# --------------------------------------------- document chunking


def test_chunk_documents_stride_and_tail(spark):
    from streamsql_spark.operators.pack import chunk_documents
    words = " ".join(f"w{i}" for i in range(10))
    out = chunk_documents(_textdocs(spark, [words]),
                          chunk_tokens=5, overlap_tokens=2).collect()
    got = sorted((r["chunk_id"], r["chunk_start"], r["chunk_n_tokens"])
                 for r in out)
    # stride 3, starts 1/4/7: full, full, 4-token tail
    assert got == [(0, 1, 5), (1, 4, 5), (2, 7, 4)]


def test_chunk_documents_short_doc_single_chunk(spark):
    from streamsql_spark.operators.pack import chunk_documents
    out = chunk_documents(_textdocs(spark, ["only three words"]),
                          chunk_tokens=64, overlap_tokens=16).collect()
    assert len(out) == 1
    assert out[0]["chunk_n_tokens"] == 3


def test_chunk_documents_overlap_covers_every_token(spark):
    from streamsql_spark.operators.pack import chunk_documents
    words = " ".join(f"w{i}" for i in range(137))
    rows = chunk_documents(_textdocs(spark, [words]),
                           chunk_tokens=16, overlap_tokens=4).collect()
    covered = set()
    for r in rows:
        covered.update(range(r["chunk_start"],
                             r["chunk_start"] + r["chunk_n_tokens"]))
    assert covered == set(range(1, 138))


def test_chunk_documents_rejects_bad_overlap(spark):
    from streamsql_spark.operators.pack import chunk_documents
    with pytest.raises(ValueError):
        chunk_documents(_textdocs(spark, ["a b"]), chunk_tokens=8,
                        overlap_tokens=8)


def test_chunk_documents_is_shuffle_free(spark):
    from streamsql_spark.operators.pack import chunk_documents
    p = _plan(chunk_documents(_textdocs(spark, ["a b c d e"] * 3)))
    assert "Exchange" not in p


# ------------------------------------------- temperature mixture


def _weighted(spark):
    # strata: a = 700 tokens, b = 200, c = 100
    rows = ([("a", 7.0)] * 100 + [("b", 2.0)] * 100 + [("c", 1.0)] * 100)
    return spark.createDataFrame(
        [(i, s, w) for i, (s, w) in enumerate(rows)],
        "doc_id long, src string, tokens double")


def test_mixture_alpha_one_is_natural(spark):
    from streamsql_spark.operators.sample import temperature_mixture_rates
    rates = temperature_mixture_rates(_weighted(spark), "src", "tokens",
                                      alpha=1.0, budget=0.5)
    # natural proportions: every stratum sampled at the budget rate
    assert all(abs(r - 0.5) < 1e-9 for r in rates.values()), rates


def test_mixture_low_alpha_lifts_small_strata(spark):
    from streamsql_spark.operators.sample import temperature_mixture_rates
    rates = temperature_mixture_rates(_weighted(spark), "src", "tokens",
                                      alpha=0.3)
    # default budget: the most-upweighted stratum (the smallest) is
    # taken whole; bigger strata get strictly smaller rates
    assert abs(rates["c"] - 1.0) < 1e-9
    assert rates["c"] > rates["b"] > rates["a"] > 0


def test_mixture_rates_hit_target_distribution(spark):
    from streamsql_spark.operators.sample import temperature_mixture_rates
    df = _weighted(spark)
    alpha = 0.5
    rates = temperature_mixture_rates(df, "src", "tokens", alpha=alpha)
    w = {"a": 700.0, "b": 200.0, "c": 100.0}
    total = sum(w.values())
    kept = {s: rates[s] * w[s] for s in w}
    z = sum(kept.values())
    q = {s: (w[s] / total) ** alpha for s in w}
    qz = sum(q.values())
    for s in w:
        assert abs(kept[s] / z - q[s] / qz) < 1e-9


def test_mixture_feeds_stratified_sampler(spark):
    from streamsql_spark.operators.sample import (hash_stratified_sample,
                                                  temperature_mixture_rates)
    df = _weighted(spark)
    rates = temperature_mixture_rates(df, "src", "tokens", alpha=0.3)
    out = hash_stratified_sample(df, "src", "doc_id", rates=rates)
    got = {r["src"]: r["count"]
           for r in out.groupBy("src").count().collect()}
    assert got.get("c") == 100          # rate 1.0 stratum kept whole
    assert 0 < got.get("a", 0) < 100    # downweighted stratum thinned


# --------------------- randomized differential checks (vs Python refs)


def test_repetition_features_match_python_reference_on_random_corpus(spark):
    """150 seeded random word-soup docs through the Catalyst plan vs a
    collections.Counter reference — one Spark job, many documents (the
    repo's differential-fuzz pattern for vectorized kernels)."""
    import random
    from collections import Counter

    from streamsql_spark.operators.text import repetition_features

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(12)] + ["42", "#!"]
    texts = [" ".join(rng.choice(vocab)
                      for _ in range(rng.randint(1, 80)))
             for _ in range(150)]
    got = {r["doc_id"]: r
           for r in repetition_features(_textdocs(spark, texts)).collect()}
    assert len(got) == 150
    for i, text in enumerate(texts):
        w = text.split(" ")
        g2 = [" ".join(w[j:j + 2]) for j in range(len(w) - 1)] \
            or [" ".join(w)]
        g3 = [" ".join(w[j:j + 3]) for j in range(len(w) - 2)] \
            or [" ".join(w)]
        c2, c3 = Counter(g2), Counter(g3)
        r = got[i]
        assert r["word_count"] == len(w), i
        assert r["mean_word_len"] == round(
            sum(map(len, w)) / len(w), 6), i
        assert r["frac_alpha_words"] == round(
            sum(1 for t in w if any(ch.isalpha() and ch.isascii()
                                    for ch in t)) / len(w), 6), i
        assert r["top_2gram_frac"] == round(
            max(c2.values()) / len(g2), 6), i
        assert r["dup_3gram_frac"] == round(
            1 - sum(1 for v in c3.values() if v == 1) / len(g3), 6), i


def test_pii_scrub_matches_python_re_on_random_corpus(spark):
    import random
    import re

    from streamsql_spark.operators.text import PII_PATTERNS, pii_scrub

    rng = random.Random(99)
    bits = ["plain", "words", "a.b@x.io", "no@where.org", "1.2.3.4",
            "10.0.0.255", "+1-555-0000", "+44 20 7946 0958", "not@an",
            "300.300.300.300", "w+1x", "@", "dot.", "5551234"]
    texts = [" ".join(rng.choice(bits) for _ in range(rng.randint(1, 25)))
             for _ in range(120)]
    got = {r["doc_id"]: r for r in pii_scrub(_textdocs(spark, texts)).collect()}
    for i, text in enumerate(texts):
        clean = text
        for name, pat, token in PII_PATTERNS:
            assert got[i][f"n_{name}"] == len(re.findall(pat, clean)), \
                (i, name, clean)
            clean = re.sub(pat, token, clean)
        assert got[i]["clean_text"] == clean, i


# ------------------------------------ linear quality classifier


def test_linear_quality_score_matches_python(spark):
    import math

    from streamsql_spark.operators.text import linear_quality_score
    weights = {"good": 1.5, "the": 0.5, "bad": -2.0}
    texts = ["good good the", "bad bad bad", "unseen tokens only",
             "good bad"]
    out = {r["doc_id"]: r["clf_score"]
           for r in linear_quality_score(
               _textdocs(spark, texts), weights, bias=-0.25).collect()}
    for i, text in enumerate(texts):
        toks = text.split(" ")
        logit = sum(weights.get(t, 0.0) for t in toks) / len(toks) - 0.25
        assert out[i] == round(1 / (1 + math.exp(-logit)), 6), i


def test_linear_quality_score_rejects_empty_weights(spark):
    from streamsql_spark.operators.text import linear_quality_score
    with pytest.raises(ValueError):
        linear_quality_score(_textdocs(spark, ["x"]), {})


def test_linear_quality_score_is_shuffle_free(spark):
    from streamsql_spark.operators.text import linear_quality_score
    p = _plan(linear_quality_score(_textdocs(spark, ["a b"] * 4),
                                   {"a": 1.0}))
    assert "Exchange" not in p


def test_linear_quality_score_handles_quote_and_backslash_tokens(spark):
    """Vocabulary tokens come from raw corpus text: quotes and
    backslashes must be data, not SQL syntax (ADVICE r3 — the old
    f-string map literal was injectable via "don't")."""
    import math

    from streamsql_spark.operators.text import linear_quality_score
    weights = {"don't": 2.0, "C:\\tmp": -1.0, "a'); --": 0.5, "ok": 1.0}
    texts = ["don't stop", "C:\\tmp path", "a'); -- ok", "plain text"]
    out = {r["doc_id"]: r["clf_score"]
           for r in linear_quality_score(
               _textdocs(spark, texts), weights, bias=0.1).collect()}
    for i, text in enumerate(texts):
        toks = text.split(" ")
        logit = sum(weights.get(t, 0.0) for t in toks) / len(toks) + 0.1
        assert out[i] == round(1 / (1 + math.exp(-logit)), 6), i


def test_train_quality_classifier_row_cap_enforced(spark):
    """The trainer collects the labeled sample to the driver; a
    mistakenly-passed full corpus must fail typed before the collect
    (VERDICT r3 #7), and a quoted token must survive train-then-score."""
    from streamsql_spark.operators.text import (linear_quality_score,
                                                train_quality_classifier)
    df = _textdocs(spark, ["don't bad text", "good clean text"] * 3) \
        .withColumn("label", (F.col("doc_id") % 2 == 1).cast("int"))
    with pytest.raises(ValueError, match="max_rows"):
        train_quality_classifier(df, "label", max_rows=5)
    w, b = train_quality_classifier(df, "label", max_rows=6, epochs=50)
    assert any("'" in t for t in w), "quoted corpus token missing from vocab"
    scored = linear_quality_score(df, w, bias=b).collect()
    assert len(scored) == 6 and all(0 <= r["clf_score"] <= 1 for r in scored)


# ------------------------------------ bigram LM / perplexity filtering


def test_perplexity_score_matches_hand_computation(spark):
    """Add-k smoothed bigram perplexity — checked against a from-scratch
    python computation of the same model on a 3-doc corpus (CCNet-style
    perplexity filtering)."""
    import math
    from collections import Counter

    from streamsql_spark.operators.text import ngram_lm_fit, perplexity_score

    texts = ["the cat sat", "the cat ran", "dog"]
    df = _textdocs(spark, texts)
    uni, big, vocab = ngram_lm_fit(df)
    out = {r["doc_id"]: r["ppl"]
           for r in perplexity_score(df, uni, big, vocab).collect()}

    toks = [t.split(" ") for t in texts]
    c1 = Counter(w for ts in toks for w in ts)
    c12 = Counter((ts[i], ts[i + 1]) for ts in toks
                  for i in range(len(ts) - 1))
    v = vocab.collect()[0]["vs"]
    assert v == len(c1)
    k = 0.1
    for i, ts in enumerate(toks):
        pairs = [(ts[j], ts[j + 1]) for j in range(len(ts) - 1)]
        if not pairs:
            assert out[i] is None, i
            continue
        lps = [math.log((c12[p] + k) / (c1[p[0]] + k * v)) for p in pairs]
        assert out[i] == round(math.exp(-sum(lps) / len(lps)), 4), i
    # single-token doc gets NULL, and every input row survives
    assert len(out) == 3 and out[2] is None


def test_perplexity_score_oov_is_smoothing_floor(spark):
    """Scoring UNSEEN text against a fitted LM: unknown grams coalesce
    to the add-k floor (c12=0; c1=0 for an unknown left word) — low-ppl
    in-domain text separates from gibberish."""
    import math

    from streamsql_spark.operators.text import ngram_lm_fit, perplexity_score

    train = _textdocs(spark, ["a b a b a b", "a b a b"])
    uni, big, vocab = ngram_lm_fit(train)
    v = vocab.collect()[0]["vs"]
    test = _textdocs(spark, ["a b a b", "zz qq zz"])
    # int vocab_size accepted too (scoring against a shipped model)
    out = {r["doc_id"]: r["ppl"]
           for r in perplexity_score(test, uni, big, int(v)).collect()}
    k = 0.1
    # all-unknown bigrams: every pair scores k/(0 + k*V) = 1/V
    assert out[1] == round(math.exp(-math.log(k / (k * v))), 4) == float(v)
    assert out[0] < out[1]  # in-domain text is lower-perplexity


def test_perplexity_lm_fit_is_distributed(spark):
    """The LM fit must be two exploded hash-aggregations — no window
    over the whole corpus, no driver collect of counts (only the vocab
    SIZE scalar)."""
    from streamsql_spark.operators.text import ngram_lm_fit
    uni, big, vocab = ngram_lm_fit(_textdocs(spark, ["a b c"] * 8))
    for df in (uni, big):
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in p and "Window" not in p
    assert vocab.collect()[0]["vs"] == 3


def test_ppl_buckets_head_middle_tail(spark):
    """CCNet head/middle/tail: exact-percentile thresholds, NULL ppl →
    tail, and the thresholds computed in-plan (no collect)."""
    from streamsql_spark.operators.text import ppl_buckets

    rows = [(i, float(p)) for i, p in enumerate([10, 20, 30, 40, 50, 60])]
    df = spark.createDataFrame(rows + [(6, None)],
                               "doc_id long, ppl double")
    out = {r["doc_id"]: r["ppl_bucket"] for r in ppl_buckets(df).collect()}
    # exact percentile over [10..60]: p(1/3)≈26.67, p(2/3)≈43.33
    assert out[0] == out[1] == "head"          # 10, 20
    assert out[2] == out[3] == "middle"        # 30, 40
    assert out[4] == out[5] == "tail"          # 50, 60
    assert out[6] == "tail"                    # NULL ppl


def test_incremental_dedup_vs_seen_corpus(spark):
    """Only digests unseen by the historical corpus survive; copies
    within the new batch collapse to the min-id representative."""
    from streamsql_spark.operators.dedup import incremental_dedup

    seen = spark.createDataFrame(
        [(100, "old doc"), (101, "shared doc")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "shared doc"),        # already ingested -> dropped
         (2, "fresh doc"), (5, "fresh doc"),  # intra-batch copies
         (3, "another fresh")], "doc_id long, text string")
    out = {r["keep_id"]: r["n_copies"]
           for r in incremental_dedup(new, seen, ["text"]).collect()}
    assert out == {2: 2, 3: 1}
    # anti join must stay a broadcast/hash join, never a sort-merge
    p = _plan(incremental_dedup(new, seen, ["text"]))
    assert "LeftAnti" in p


@pytest.mark.slow
def test_perplexity_differential_vs_python_replica(spark):
    """Hypothesis sweep: the distributed fit+score must equal a
    from-scratch python replica on arbitrary small corpora (token
    multiplicities, repeated docs, singleton docs)."""
    import math
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from streamsql_spark.operators.text import ngram_lm_fit, perplexity_score

    word = st.sampled_from(["a", "b", "cc", "d"])

    @settings(max_examples=12, deadline=None)
    @given(docs=st.lists(st.lists(word, min_size=1, max_size=6),
                         min_size=1, max_size=5))
    def run(docs):
        texts = [" ".join(d) for d in docs]
        df = _textdocs(spark, texts)
        uni, big, vocab = ngram_lm_fit(df)
        got = {r["doc_id"]: r["ppl"]
               for r in perplexity_score(df, uni, big, vocab).collect()}
        c1 = Counter(w for d in docs for w in d)
        c12 = Counter((d[i], d[i + 1]) for d in docs
                      for i in range(len(d) - 1))
        v, k = len(c1), 0.1
        for i, d in enumerate(docs):
            pairs = [(d[j], d[j + 1]) for j in range(len(d) - 1)]
            if not pairs:
                assert got[i] is None, (i, docs)
                continue
            lps = [math.log((c12[p] + k) / (c1[p[0]] + k * v))
                   for p in pairs]
            want = round(math.exp(-sum(lps) / len(lps)), 4)
            assert got[i] == pytest.approx(want, abs=2e-4), (i, docs)

    run()


# --------------------------------------------- URL canonicalization


def _urls(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string")


def test_canonicalize_url_collapses_surface_forms(spark):
    from streamsql_spark.operators.text import canonicalize_url
    out = {r["doc_id"]: r["canon_url"] for r in canonicalize_url(_urls(spark, [
        "HTTP://Example.COM:80/path/?utm_source=x&q=1#frag",
        "http://example.com/path?q=1",
        "https://Sub.Example.org:443/a/",
        "https://sub.example.org/a",
        "http://example.com/p?utm_campaign=a&fbclid=z",
        "http://example.com/p",
    ])).collect()}
    assert out[0] == out[1] == "http://example.com/path?q=1"
    assert out[2] == out[3] == "https://sub.example.org/a"
    assert out[4] == out[5] == "http://example.com/p"


def test_canonicalize_url_keeps_meaningful_parts(spark):
    from streamsql_spark.operators.text import canonicalize_url
    rows = {r["doc_id"]: r for r in canonicalize_url(_urls(spark, [
        "http://example.com:8080/x",        # non-default port stays
        "http://example.com/a/b/c?keep=1&ref=h&also=2",
        "http://a.b.example.co/x",
    ])).collect()}
    assert rows[0]["canon_url"] == "http://example.com:8080/x"
    assert rows[1]["canon_url"] == "http://example.com/a/b/c?keep=1&also=2"
    assert rows[0]["domain"] == "example.com"
    assert rows[2]["domain"] == "example.co"


def test_url_dedup_counts_canonical_groups(spark):
    from streamsql_spark.operators.text import url_dedup
    out = url_dedup(_urls(spark, [
        "HTTP://A.com/x?utm_source=1",
        "http://a.com/x",
        "http://a.com/x#top",
        "http://b.com/y",
    ])).collect()
    got = {r["keep_id"]: r["n_copies"] for r in out}
    assert got == {0: 3, 3: 1}


# ----------------------------------------------- sharded output


def test_write_shards_caps_rows_per_file(spark, tmp_path):
    import glob

    from streamsql_spark.operators.bucketing import write_shards
    df = spark.range(1000).selectExpr("id", "id % 4 AS src").coalesce(2)
    out = str(tmp_path / "shards")
    write_shards(df, out, rows_per_shard=100)
    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 10
    for f in files:
        n = spark.read.parquet(f).count()
        assert n <= 100, f
    assert spark.read.parquet(out).count() == 1000


def test_write_shards_partitioned_layout(spark, tmp_path):
    import glob

    from streamsql_spark.operators.bucketing import write_shards
    df = spark.range(400).selectExpr("id", "CAST(id % 2 AS STRING) AS src")
    out = str(tmp_path / "pshards")
    write_shards(df, out, rows_per_shard=50, partition_by=["src"])
    assert glob.glob(out + "/src=0/*.parquet")
    assert glob.glob(out + "/src=1/*.parquet")
    back = spark.read.parquet(out)
    assert back.count() == 400
    assert back.where("src = '1'").count() == 200


def test_repetition_features_total_over_null_text(spark):
    from streamsql_spark.operators.text import repetition_features
    df = spark.createDataFrame([(0, "real words here now"), (1, None)],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert set(rows) == {0, 1}          # NULL-text doc is NOT dropped
    assert rows[1]["word_count"] == 1   # the empty token
    assert rows[1]["gopher_pass"] is False


def test_mixture_budget_waterfills_past_clipped_strata(spark):
    from streamsql_spark.operators.sample import temperature_mixture_rates
    df = _weighted(spark)
    rates = temperature_mixture_rates(df, "src", "tokens", alpha=0.3,
                                      budget=0.9)
    w = {"a": 700.0, "b": 200.0, "c": 100.0}
    kept = sum(rates[s] * w[s] for s in w)
    # clipped strata are taken whole and the surplus is redistributed,
    # so the expected kept weight still hits the (feasible) budget
    assert abs(kept - 0.9 * 1000.0) < 1e-6, rates
    assert rates["c"] == 1.0
    assert all(0.0 <= r <= 1.0 for r in rates.values())


def test_mixture_ignores_null_stratum_and_keeps_zero_weight(spark):
    from streamsql_spark.operators.sample import (hash_stratified_sample,
                                                  temperature_mixture_rates)
    df = spark.createDataFrame(
        [(0, "a", 5.0), (1, "a", 5.0), (2, None, 9.0), (3, "z", 0.0)],
        "doc_id long, src string, tokens double")
    rates = temperature_mixture_rates(df, "src", "tokens", alpha=0.5)
    assert None not in rates            # NULL stratum -> sampler default
    assert rates["z"] == 0.0            # zero weight -> rate 0, present
    # the advertised consumer must accept the dict without crashing
    hash_stratified_sample(df, "src", "doc_id", rates=rates).collect()


# --------------------------------------- global duplicate-span removal


def test_segment_dedup_first_occurrence_wins_globally(spark):
    from streamsql_spark.operators.text import segment_dedup
    docs = spark.createDataFrame([
        (0, "a b c d e f"),
        (1, "a b c x y z"),   # 'a b c' already seen in doc 0
        (2, "x y z q r s"),   # 'x y z' already seen in doc 1
    ], "doc_id long, text string")
    got = {r["doc_id"]: r
           for r in segment_dedup(docs, seg_tokens=3).collect()}
    assert got[0]["clean_text"] == "a b c d e f"
    assert got[1]["clean_text"] == "x y z"
    assert got[2]["clean_text"] == "q r s"
    assert (got[1]["n_segs"], got[1]["n_kept"]) == (2, 1)


def test_segment_dedup_within_doc_repeat_kept_once(spark):
    from streamsql_spark.operators.text import segment_dedup
    docs = spark.createDataFrame([(5, "p q p q")],
                                 "doc_id long, text string")
    row = segment_dedup(docs, seg_tokens=2).collect()[0]
    assert row["clean_text"] == "p q"
    assert (row["n_segs"], row["n_kept"]) == (2, 1)


def test_segment_dedup_total_over_null_and_all_dup_docs(spark):
    from streamsql_spark.operators.text import segment_dedup
    docs = spark.createDataFrame([
        (0, "dup dup"), (1, "dup dup"), (2, None),
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           segment_dedup(docs, seg_tokens=2).collect()}
    assert set(got) == {0, 1, 2}
    assert got[1]["n_kept"] == 0 and got[1]["clean_text"] == ""


# -------------------------------------- quality classifier training


def test_train_quality_classifier_separates_and_scores(spark):
    """Train on a synthetic good-vs-spam labeled set, then score a held
    -out corpus with linear_quality_score: good docs must score above
    spam docs, and training must be deterministic."""
    import random

    from streamsql_spark.operators.text import (linear_quality_score,
                                                train_quality_classifier)
    rng = random.Random(3)
    good_vocab = ["data", "query", "table", "join", "window", "spark"]
    spam_vocab = ["click", "winner", "free", "prize", "now", "claim"]

    def doc(vocab):
        return " ".join(rng.choice(vocab) for _ in range(20))

    labeled = [(i, doc(good_vocab), 1) for i in range(40)] + \
              [(100 + i, doc(spam_vocab), 0) for i in range(40)]
    train_df = spark.createDataFrame(
        labeled, "doc_id long, text string, label int")
    w, b = train_quality_classifier(train_df, "label")
    w2, b2 = train_quality_classifier(train_df, "label")
    assert (w, b) == (w2, b2)           # deterministic fit

    held = [(0, doc(good_vocab)), (1, doc(spam_vocab)),
            (2, doc(good_vocab)), (3, doc(spam_vocab))]
    held_df = spark.createDataFrame(held, "doc_id long, text string")
    scores = {r["doc_id"]: r["clf_score"]
              for r in linear_quality_score(held_df, w, bias=b).collect()}
    assert scores[0] > 0.75 and scores[2] > 0.75
    assert scores[1] < 0.25 and scores[3] < 0.25


def test_train_quality_classifier_rejects_empty(spark):
    from streamsql_spark.operators.text import train_quality_classifier
    df = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError):
        train_quality_classifier(df, "label")


def test_ppl_buckets_exact_guard_and_probe_df(spark):
    """exact=True refuses corpora above max_exact_rows (bounded probe),
    honors a caller-supplied cheaper probe frame, and produces the same
    buckets either way."""
    from streamsql_spark.operators.text import ppl_buckets

    rows = [(i, float(p)) for i, p in enumerate([10, 20, 30, 40, 50, 60])]
    df = spark.createDataFrame(rows, "doc_id long, ppl double")

    def buckets(out):
        return {r["doc_id"]: r["ppl_bucket"] for r in out.collect()}

    exact = buckets(ppl_buckets(df, exact=True))
    assert exact == {0: "head", 1: "head", 2: "middle", 3: "middle",
                     4: "tail", 5: "tail"}
    via_probe = buckets(ppl_buckets(df, exact=True,
                                    probe_df=spark.range(6)))
    assert via_probe == exact

    with pytest.raises(ValueError, match="max_exact_rows"):
        ppl_buckets(df, exact=True, max_exact_rows=3)
    with pytest.raises(ValueError, match="max_exact_rows"):
        # the guard must count the PROBE frame when given
        ppl_buckets(df, exact=True, max_exact_rows=3,
                    probe_df=spark.range(100))


def test_incremental_dedup_null_content_contract(spark):
    """Documented concat_ws digest contract: NULL content digests as
    the empty string, so NULL-text dedups against empty-text history —
    callers pre-filter NULLs if they must stay distinct."""
    from streamsql_spark.operators.dedup import incremental_dedup

    new = spark.createDataFrame([(1, None), (2, ""), (3, "x")],
                                "doc_id long, text string")
    seen = spark.createDataFrame([(0, "")], "doc_id long, text string")
    out = {r["keep_id"] for r in
           incremental_dedup(new, seen, ["text"]).collect()}
    assert out == {3}


def test_ann_default_centroids_work_with_sparse_ids(spark):
    """Default centroids/codebooks are the N SMALLEST-ID vectors — an
    id-range filter would be silently EMPTY for hash/UUID-style ids
    (ivf: zero rows for every query; pq: a crash on an empty training
    matrix)."""
    import numpy as np

    from streamsql_spark.operators.dedup import embedding_neardup_pairs
    from streamsql_spark.operators.similarity import (cosine_topk,
                                                      ivf_topk, pq_topk)

    rng = np.random.default_rng(3)
    X = np.round(rng.normal(size=(40, 8)), 3)
    base = 10_000_000_000  # every id far above any n_centroids cutoff
    df = spark.createDataFrame(
        [(base + i * 7, [float(x) for x in X[i]]) for i in range(40)],
        "vec_id long, embedding array<double>")
    q = df.where(f"vec_id <= {base + 14}")
    exact = sorted(map(tuple, cosine_topk(df, q, k=3).collect()))
    ivf = ivf_topk(df, q, k=3, n_centroids=4, nprobe=4)
    # probing all cells ≡ exhaustive: must equal brute force
    assert sorted(map(tuple, ivf.collect())) == exact
    pq = pq_topk(df, q, k=3, m_subspaces=4)
    assert pq.count() > 0  # no empty-training crash
    pairs = embedding_neardup_pairs(df, threshold=0.99)
    assert pairs.columns == ["id_a", "id_b", "sim"]  # no silent empty path


def test_embedding_neardup_keeps_input_id_type(spark):
    """id_a/id_b carry the INPUT id type (string ids must not hit a
    hardcoded LongType at the Arrow boundary)."""
    from streamsql_spark.operators.dedup import embedding_neardup_pairs

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.001]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<double>")
    out = embedding_neardup_pairs(df, threshold=0.9, n_centroids=1)
    rows = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert rows == {("a", "b")}
    assert dict(out.dtypes)["id_a"] == "string"


def test_decontaminate_keeps_null_text_docs(spark):
    """A NULL-text training doc still gets its (0, False) verdict row —
    split(NULL) must not silently drop it from the output."""
    from streamsql_spark.operators.text import decontaminate

    bench = spark.createDataFrame([(100, "a b c d")],
                                  "doc_id long, text string")
    train = spark.createDataFrame([(1, "a b c e"), (2, None)],
                                  "doc_id long, text string")
    out = {r["doc_id"]: (r["n_overlap"], r["contaminated"])
           for r in decontaminate(train, bench).collect()}
    assert set(out) == {1, 2}
    assert out[2] == (0, False)


def test_resize_zero_dimension_ppm_is_passthrough(spark):
    """'P6\\n0 5\\n255\\n' is parseable but degenerate — it must take the
    undecodable-passthrough path, never crash the task."""
    from streamsql_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      resize_images)

    bad = b"P6\n0 5\n255\n"
    media = spark.createDataFrame(
        [(1, "image", bytearray(bad),
          ("image/x-portable-pixmap", len(bad), "t"))], MEDIA_SCHEMA)
    row = resize_images(media, 2, 2).collect()[0]
    assert row["resized"] is False
    assert bytes(row["payload"]) == bad


def test_connected_components_refuses_string_ids(spark):
    """Non-integral node ids must refuse LOUDLY: a blind long cast
    raises under ANSI or NULLs every id otherwise, silently emptying
    the component output (review r6 pass 4 #6)."""
    from streamsql_spark.operators.graph import connected_components
    edges = spark.createDataFrame(
        [("a", "b")], "id_a string, id_b string")
    with pytest.raises(ValueError, match="integral node ids"):
        connected_components(edges)
