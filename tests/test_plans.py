"""Physical-plan regression tests — the scale contract as assertions.

Each test pins a plan property that matters at 100 TB and that a
refactor could silently lose: predicate pushdown into the parquet scan,
column pruning, broadcast of the dimension side of stream-table joins,
partial→final hash aggregation, and top-K compiling to
TakeOrderedAndProject.  `.explain("formatted")` text is the oracle.
"""

from __future__ import annotations

import contextlib
import io

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def catalog_plan(spark):
    from streamsql_spark.catalog import CATALOG

    def plan_text(name: str) -> str:
        df = CATALOG[name].run(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    return plan_text


def test_filter_pushdown_and_pruning(catalog_plan):
    p = catalog_plan("filter_project")
    # WHERE reaches the parquet scan …
    assert "PushedFilters:" in p
    assert "GreaterThan(value,10.0)" in p
    assert "IsNotNull(props)" in p
    # … and the scan reads only the referenced columns (no ts)
    schema_line = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "ts" not in schema_line


def test_stream_table_join_broadcasts(catalog_plan):
    # stream-table enrichment must not shuffle the stream side
    p = catalog_plan("join_inner")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_aggregation_is_partial_then_final(catalog_plan):
    p = catalog_plan("agg_tpch_q1")
    # two HashAggregate operators around one exchange = map-side combine
    assert p.count("(2) HashAggregate") + p.count("HashAggregate") >= 2
    assert "SortAggregate" not in p


def test_orderby_limit_is_topk(catalog_plan):
    p = catalog_plan("distinct_orderby_limit")
    assert "TakeOrderedAndProject" in p


def test_minhash_has_no_join_on_signature_side(catalog_plan):
    # candidate pairing is groupBy bucket + in-bucket combination —
    # a self-join would recompute the signature pass per side
    p = catalog_plan("dedup_minhash_lsh")
    assert "Join" not in p or "BroadcastHashJoin" in p


def test_ansi_multiway_join_pushdown_topk(catalog_plan):
    # the 3-way Q3 shape: every scan filter pushed down, no cartesian
    # product, top-K as TakeOrderedAndProject (per-partition top-K +
    # driver merge, not a global sort)
    p = catalog_plan("ansi_tpch_q3_union")
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_counting_window_single_exchange(catalog_plan):
    # chunk assignment (row_number) and fullness (count) share one
    # partitioning: exactly one shuffle before the final aggregation
    # exchange — a regression here doubles the shuffled bytes at scale
    p = catalog_plan("window_counting")
    n_exchanges = sum(1 for l in p.splitlines()
                      if l.strip().startswith("(") and "Exchange" in l
                      and "Reused" not in l)
    assert n_exchanges <= 2, p
    assert "SortAggregate" not in p
