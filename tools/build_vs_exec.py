"""Split an entry's wall time into BUILD (entry.run: dialect parse,
plan, DataFrame construction — driver-side) and EXEC (noop write of the
returned frame), best-of-N warm each.

Usage: python3 tools/build_vs_exec.py <entry> [entry ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.

Streaming entries execute inside run(); for them EXEC is ~0 and BUILD
is the whole entry — this tool is for batch entries.
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

    spark = get_spark("build-vs-exec")
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
        build = execu = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            df = entry.run(spark, sf_dir)
            t1 = time.perf_counter()
            _force(df)
            t2 = time.perf_counter()
            build = min(build, t1 - t0)
            execu = min(execu, t2 - t1)
        print(f"{name}: build={build:.3f}s exec={execu:.3f}s", flush=True)


if __name__ == "__main__":
    main()
