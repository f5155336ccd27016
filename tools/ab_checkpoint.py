"""Interleaved in-process A/B of the r13 subtree-reuse checkpoints.

Patches DataFrame.localCheckpoint to a no-op ("off" arm) vs the real
call ("on" arm), alternating arms per repetition in ONE Spark session
so machine drift hits both arms equally.  Entries resolve operators at
call time, so the patch takes effect per run.

Usage: python3 tools/ab_checkpoint.py <reps> <entry> [entry ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from streamsql_spark.catalog import CATALOG
    from streamsql_spark.session import get_spark, load_tables

    spark = get_spark("ab-checkpoint")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    _force(spark.range(10000).selectExpr("id % 7 AS k", "id * 1.0 AS v")
           .groupBy("k").sum("v"))

    real_ckpt = DataFrame.localCheckpoint

    def no_ckpt(self, eager=True):
        return self

    for name in names:
        entry = CATALOG[name]
        best = {"on": float("inf"), "off": float("inf")}
        for i in range(2 * reps):
            arm = "on" if i % 2 == 0 else "off"
            DataFrame.localCheckpoint = real_ckpt if arm == "on" else no_ckpt
            t0 = time.perf_counter()
            _force(entry.run(spark, sf_dir))
            best[arm] = min(best[arm], time.perf_counter() - t0)
        DataFrame.localCheckpoint = real_ckpt
        print(f"{name}: ckpt_on={best['on']:.3f}  ckpt_off={best['off']:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
