"""Capture the RUNTIME (post-execution, AQE-final) plan of catalog
entries — the form that shows ReusedExchange / AQEShuffleRead nodes the
static explain cannot (AQE applies stage reuse during execution).

Usage: python3 tools/plan_runtime.py <out_dir> [suffix] [entry ...]

Executes each entry via .collect() (the Dataset's OWN QueryExecution —
a noop write would execute a different one and leave the Dataset's
AdaptiveSparkPlan unfinalized), then re-explains the same DataFrame:
with AQE the plan prints isFinalPlan=true including reuse nodes.
"""

from __future__ import annotations

import io
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "runtime"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from streamsql_spark.catalog import CATALOG
    from streamsql_spark.session import get_spark

    spark = get_spark("plan-runtime")
    spark.sparkContext.setLogLevel("ERROR")

    for name, entry in CATALOG.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = entry.run(spark, sf_dir)
            n = len(df.collect())
            buf = io.StringIO()
            old = sys.stdout
            sys.stdout = buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = old
            plan = buf.getvalue()
            header = (f"# entry: {name}  sf_dir: {sf_dir}  rows: {n}  "
                      f"(post-execution AQE-final plan)\n")
        except Exception:
            plan = "CAPTURE FAILED:\n" + traceback.format_exc()
            header = f"# entry: {name}  sf_dir: {sf_dir}\n"
        with open(path, "w") as f:
            f.write(header)
            f.write(plan)
        print(f"{name}: final={'isFinalPlan=true' in plan} "
              f"reused_exchange={plan.count('ReusedExchange')} "
              f"scans={plan.count('Scan parquet')} "
              f"inmem={plan.count('InMemoryTableScan')} -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
