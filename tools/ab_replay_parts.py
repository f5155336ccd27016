"""Interleaved A/B/C of _replay_partitions sizing for a streaming entry.

Usage: python3 tools/ab_replay_parts.py <reps> <entry> <n1> <n2> [n3...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1])
    name = sys.argv[2]
    sizes = [int(x) for x in sys.argv[3:]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import streamsql_spark.catalog as cat
    from streamsql_spark.session import get_spark, load_tables

    spark = get_spark("ab-replay-parts")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    _force(spark.range(1000).toDF("x").mapInPandas(
        lambda it: it, schema="x long"))

    orig = cat._replay_partitions
    current = {"n": sizes[0]}

    class Patched(orig):
        def __init__(self, spark, n=8):
            super().__init__(spark, current["n"])

    cat._replay_partitions = Patched
    entry = cat.CATALOG[name]
    best = {n: float("inf") for n in sizes}
    for i in range(len(sizes) * reps):
        n = sizes[i % len(sizes)]
        current["n"] = n
        t0 = time.perf_counter()
        _force(entry.run(spark, sf_dir))
        best[n] = min(best[n], time.perf_counter() - t0)
    cat._replay_partitions = orig
    print(name, {n: round(v, 3) for n, v in best.items()}, flush=True)


if __name__ == "__main__":
    main()
