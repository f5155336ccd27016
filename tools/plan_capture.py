"""Capture .explain("formatted") for every catalog entry.

Usage: python3 tools/plan_capture.py <out_dir> [suffix] [entry ...]

Writes <out_dir>/<entry>_<suffix>.txt (suffix defaults to "before").
Streaming-replay entries execute their pipelines when run() is called,
so for those we capture the plan of the RESULT DataFrame plus a note;
the interesting kernels there are pinned by tests, not plans.
"""

from __future__ import annotations

import io
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from streamsql_spark.catalog import CATALOG
    from streamsql_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    for name, entry in CATALOG.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = entry.run(spark, sf_dir)
            buf = io.StringIO()
            old = sys.stdout
            sys.stdout = buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = old
            plan = buf.getvalue()
        except Exception:
            plan = "CAPTURE FAILED:\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(f"# entry: {name}  sf_dir: {sf_dir}\n")
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_py = (plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
                + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"))
        print(f"{name}: exchanges={n_ex} python_nodes={n_py} -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
