"""Benchmark harness (driver contract).

Runs the operator catalog at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced to full execution with a noop write (no driver
collect — measures the distributed pipeline, not result transfer).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> int:
    # noop datasource: full execution, zero sink cost
    df.write.format("noop").mode("overwrite").save()
    return 0


def _wait_for_idle(max_wait_s: float = 180.0) -> None:
    """Bench hygiene (r7: a snapshot taken right after a pytest/Spark
    suite inflated every entry ~20% and faked a regression).  Wait,
    bounded, for the 1-minute load average to fall below ~35% of the
    benchmark's CPU budget before timing anything; if the machine stays
    busy, run anyway but leave a machine-state marker on stderr (the
    stdout JSON line is driver-parsed from a bounded tail buffer and
    must stay compact)."""
    try:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count()
        target = max(2.0, 0.35 * cpus)
        t0 = time.time()
        while os.getloadavg()[0] > target:
            if time.time() - t0 >= max_wait_s:
                print(json.dumps({
                    "warning": "bench started on a busy machine — "
                               "timings may be inflated",
                    "load1": round(os.getloadavg()[0], 1),
                    "target": round(target, 1)}), file=sys.stderr)
                return
            time.sleep(5)
        waited = time.time() - t0
        if waited > 1:
            print(json.dumps({"idle_wait_s": round(waited, 1)}),
                  file=sys.stderr)
    except OSError:
        pass  # no loadavg on this platform — run as before


def main() -> None:
    _wait_for_idle()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from streamsql_spark.catalog import CATALOG
    from streamsql_spark.session import get_spark, load_tables

    spark = get_spark("streamsql-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the session + parquet footers so query timings measure the
    # pipelines, not JVM startup
    load_tables(spark, sf_dir)
    # ... and the execution machinery itself (whole-stage codegen, the
    # shuffle subsystem, the noop writer, the Arrow/Python worker pool) —
    # otherwise the first catalog entry pays one-time JIT cost
    _force(spark.range(10000)
           .selectExpr("id % 7 AS k", "id * 1.0 AS v")
           .groupBy("k").sum("v"))
    _force(spark.range(1000).toDF("x").mapInPandas(
        lambda it: it, schema="x long"))

    # Machine-state calibration (r9: untouched entries drifted a
    # uniform ~1.2× on byte-identical code round-to-round, costing
    # real effort to separate real regressions from machine state).
    # Two FIXED-WORK jobs — data-independent, same process, same JVM —
    # timed best-of-3 right before the catalog: a Catalyst hash-agg
    # (JVM/codegen path) and an Arrow mapInPandas identity (Python
    # worker path).  Cross-round entry ratios divide by the matching
    # calibration ratio to normalize machine state; details on stderr,
    # one compact "cal" field on the stdout line (tail-buffer budget).
    def _best_of(k, job):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            _force(job())
            best = min(best, time.perf_counter() - t0)
        return best

    cal_jvm = _best_of(3, lambda: spark.range(30_000_000).selectExpr(
        "id % 97 AS k", "(id * 2654435761) % 1000003 AS v")
        .groupBy("k").agg({"v": "sum", "*": "count"}))
    cal_py = _best_of(3, lambda: spark.range(2_000_000)
                      .selectExpr("id AS x", "id * 1.0 AS y")
                      .mapInPandas(lambda it: it, schema="x long, y double"))
    print(json.dumps({"calibration": {"jvm": round(cal_jvm, 3),
                                      "py": round(cal_py, 3)}}),
          file=sys.stderr)

    # Each entry runs three times; the best WARM run is reported.  The
    # first run pays one-time Catalyst analysis + codegen JIT (~1-4 s
    # per query shape) — constant cost, irrelevant at scale where a
    # query runs for minutes; the warm minimum measures pipeline
    # throughput (what scales with data volume) with GC noise damped.
    # Sub-half-second entries are startup-jitter-bound at sf0.1 (best-
    # of-3 has shown phantom 2× cross-round swings on unchanged code),
    # so they get extra repeats until the floor stabilizes.  Long
    # (>1.5 s) pipeline-bound entries get best-of-5: their best-of-3
    # floor still swung 20-31% round-to-round on byte-identical code
    # (r8 text_quality_pii/dedup_minhash_lsh) — two more samples tighten
    # the min-statistic at a bounded wall cost.
    timings: dict[str, float] = {}
    repeats: dict[str, int] = {}
    total = 0.0
    for name, entry in CATALOG.items():
        try:
            dt, n = float("inf"), 0
            while n < 3 or (dt < 0.5 and n < 7) or (dt > 1.5 and n < 5):
                t0 = time.perf_counter()
                _force(entry.run(spark, sf_dir))
                dt = min(dt, time.perf_counter() - t0)
                n += 1
        except Exception:  # noqa: BLE001 — a failing query counts as missing
            dt, n = -1.0, 0
        timings[name] = round(dt, 3)
        repeats[name] = n
        if dt > 0:
            total += dt

    # Repeat counts go to stderr: the driver parses the single stdout
    # JSON line from a bounded tail buffer, so that line must stay
    # compact (r5's repeats_per_entry map pushed it past the buffer and
    # the round's bench went unparsed).
    print(json.dumps({"repeats_per_entry": repeats}), file=sys.stderr)
    payload = {
        "metric": "catalog_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # fixed-work machine-state constants (see calibration above):
        # divide a cross-round entry ratio by the matching cal ratio
        "cal": round(cal_jvm, 3),
        "cal_py": round(cal_py, 3),
    }
    print(json.dumps(payload))
    # normalized cross-round comparison vs the newest BENCH_r*.json
    # (stderr; r11 brief #4): entries are flagged only when NEITHER
    # calibration ratio explains their slowdown — the phantom-
    # regression adjudication becomes a one-line read
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from bench_compare import emit_comparison
        emit_comparison(payload)
    except Exception as e:  # noqa: BLE001 — advisory output only
        print(json.dumps({"bench_compare_skipped": str(e)}),
              file=sys.stderr)


if __name__ == "__main__":
    main()
