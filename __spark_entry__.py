"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style hash
aggregation through the full StreamSQL-dialect stack) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the operator catalog
(streamsql_spark/catalog.py) — one entry per implemented operator from
SURVEY.md §2, each with a DuckDB oracle for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from streamsql_spark.catalog import CATALOG

    return CATALOG["agg_tpch_q1"].run(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from streamsql_spark.catalog import CATALOG

    return {name: e.run for name, e in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from streamsql_spark.catalog import CATALOG

    return {name: e.oracle for name, e in CATALOG.items() if e.oracle is not None}
