"""Bucketed tables for shuffle-free big-big joins.

At 100 TB the expensive join is fact-to-fact (lineitem ⋈ orders —
neither side broadcasts).  Spark's answer is bucketing: both tables
written bucketed-and-sorted by the join key land co-partitioned on
disk, and a later join plans as a SortMergeJoin with NO Exchange on
either side — the shuffle is paid once at write time and amortized
over every subsequent join, the same trade a Hive/Iceberg warehouse
makes.

``write_bucketed`` registers the table in the session catalog (bucket
metadata only lives there — plain parquet paths can't carry it);
``bucketed_join`` joins two registered tables and is asserted
exchange-free in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 64, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed+sorted managed table.

    ``n_buckets`` sizes per-bucket data to executor memory at the
    target scale (64 buckets × ~2 GB works for mid-size facts; at
    100 TB use thousands).  Sorting within buckets makes the later
    SortMergeJoin skip its sort as well.
    """
    writer = (df.write.mode(mode)
              .bucketBy(n_buckets, *bucket_cols)
              .sortBy(*(sort_cols or bucket_cols)))
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left: str, right: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket specs Catalyst plans this without a shuffle
    on either side; AQE leaves the bucketed distribution alone.
    """
    return spark.table(left).join(spark.table(right), on=on, how=how)


def write_shards(df: DataFrame, path: str, rows_per_shard: int,
                 fmt: str = "parquet",
                 partition_by: list[str] | None = None,
                 mode: str = "overwrite") -> None:
    """Write ``df`` as size-bounded output shards — the fixed-row-count
    files a training dataloader wants (predictable shard sizes, stable
    worker assignment).

    Uses the writer's ``maxRecordsPerFile`` to cap rows per file —
    enforced task-locally during the write with NO extra shuffle or
    global sort, so every task splits its partition into ≤ cap files
    (a global exact-row-count sharding would need a total ordering —
    one full sort of the corpus — for no dataloader benefit).
    ``partition_by`` adds Hive-style directory partitioning on top
    (e.g. by source/language) for pushdown-friendly layout.
    """
    w = (df.write.mode(mode).format(fmt)
         .option("maxRecordsPerFile", rows_per_shard))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
