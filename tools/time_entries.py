"""Time individual catalog entries with the bench methodology
(best-of-N warm, noop sink) without running the whole bench.

Usage: python3 tools/time_entries.py <entry> [entry ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]

    from streamsql_spark.catalog import CATALOG
    from streamsql_spark.session import get_spark, load_tables

    spark = get_spark("time-entries")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    _force(spark.range(10000).selectExpr("id % 7 AS k", "id * 1.0 AS v")
           .groupBy("k").sum("v"))
    _force(spark.range(1000).toDF("x").mapInPandas(
        lambda it: it, schema="x long"))

    for name in names:
        entry = CATALOG[name]
        dt, n = float("inf"), 0
        while n < 3 or (dt < 0.5 and n < 7) or (dt > 1.5 and n < 5):
            t0 = time.perf_counter()
            _force(entry.run(spark, sf_dir))
            dt = min(dt, time.perf_counter() - t0)
            n += 1
        print(f"{name}: {dt:.3f} s (best of {n})", flush=True)


if __name__ == "__main__":
    main()
