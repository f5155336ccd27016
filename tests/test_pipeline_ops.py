"""Unit tests for the round-3 training-pipeline operators: connected
components (duplicate clustering), test-set decontamination, and
deterministic sampling — correctness properties plus the plan-shape
facts that matter at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

import pytest


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
