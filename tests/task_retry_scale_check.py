"""Task-retry fault injection AT SCALE (r13 brief #6): the 64x RocksDB
rig from streaming_scale_check.py crossed with test_task_retry.py's
injection — an executor task dies mid-replay AFTER the kernel wrote
its state updates, Spark retries it, and the run must finish with
output identical to an uninjected replay (the aborted attempt's store
version never commits) at a measured recovery cost.

Per-leg report: wall, rows/s, output digest (rows + sum(cnt) +
sum(total)), and the final progress's stateOperators metrics
(state rows, memory) — "state before/after" evidence that the retry
neither lost nor double-applied per-key accumulators.

Injection shape (test_task_retry.py): ``applyInPandasWithState`` is
patched process-wide; the wrapped kernel drains the REAL kernel first
(its state.update calls land in the store), then raises exactly once
(O_CREAT|O_EXCL marker).  Local-mode gotcha: retries need the
``local[N, F]`` master form — ``spark.task.maxFailures`` is ignored by
the local scheduler.

Not a pytest (filename intentionally not test_*): run manually and
record the row in BASELINE.md §C.

    python3 tests/task_retry_scale_check.py [sf_dir] [copies] [kernel]

kernel: counting (default) | cep
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_KERNELS = {
    "counting": """
        SELECT user_id, count(*) AS cnt, round(sum(value), 4) AS total
        FROM stream GROUP BY user_id, CountingWindow(25)
    """,
    "cep": """
        SELECT user_id, a_ts, b_ts FROM stream
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS a_ts, B.ts AS b_ts
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            DEFINE A AS value > 80, B AS value < 20
            WITHIN '4h'
        )
    """,
}


def _patch_apply():
    """Wrap applyInPandasWithState: drain the real kernel (state
    written), then raise ONCE process-wide when armed."""
    from pyspark.sql.pandas import group_ops

    orig = group_ops.PandasGroupedOpsMixin.applyInPandasWithState
    fail_dir = tempfile.mkdtemp(prefix="task_retry_scale_")
    armed = {"path": None}

    def _wrapping(self, func, *a, **kw):
        marker = armed["path"]
        if marker is None:
            return orig(self, func, *a, **kw)

        def wrapper(key, it, state, _f=func, _m=marker):
            out = list(_f(key, it, state))
            import os as _os
            try:
                fd = _os.open(_m, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
                _os.close(fd)
                raise RuntimeError("injected task failure (scale rig)")
            except FileExistsError:
                pass
            for pdf in out:
                yield pdf

        return orig(self, wrapper, *a, **kw)

    group_ops.PandasGroupedOpsMixin.applyInPandasWithState = _wrapping
    return lambda case: armed.__setitem__(
        "path", os.path.join(fail_dir, case) if case else None)


def _run_leg(spark, StreamSQL, raw, in_dir, sql, ckpt, name):
    from pyspark.sql import functions as F
    got = {"rows": 0}
    q = StreamSQL(spark).execute(sql)
    stream = (spark.readStream.schema(raw.schema)
              .option("maxFilesPerTrigger", 8).parquet(in_dir))
    sink_dir = ckpt + "_out"
    t0 = time.time()
    sq = q.start_stream(stream, sink_path=sink_dir, sink_format="parquet",
                        checkpoint=ckpt, query_name=name)
    sq.awaitTermination(1800)
    if sq.isActive:
        sq.stop()
    wall = time.time() - t0
    last = sq.lastProgress or (sq.recentProgress[-1]
                               if sq.recentProgress else {})
    ops = (last.get("stateOperators") or [{}])[0]
    out = spark.read.parquet(sink_dir)
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        *( [F.sum("cnt").alias("sc"), F.round(F.sum("total"), 2).alias("st")]
           if "cnt" in out.columns else
           [F.count("a_ts").alias("sc"), F.lit(0.0).alias("st")] )).first()
    got["rows"] = agg["rows"]
    return {"wall": wall, "rows": agg["rows"], "sum_cnt": agg["sc"],
            "sum_total": float(agg["st"] or 0.0),
            "state_rows": ops.get("numRowsTotal"),
            "state_mem": ops.get("memoryUsedBytes")}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    kernel = sys.argv[3] if len(sys.argv) > 3 else "counting"
    sql = _KERNELS[kernel]

    os.environ["SPARK_GRAFT_ROCKSDB_STATE"] = "1"
    from pyspark.sql import SparkSession

    from streamsql_spark.session import ROCKSDB_STATE_CONFS, SCALE_CONFS
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    b = (SparkSession.builder.appName("task-retry-scale")
         .master(f"local[{cpus}, 2]")   # second slot = task maxFailures
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.driver.memory",
                 os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false"))
    for k, v in {**SCALE_CONFS, **ROCKSDB_STATE_CONFS}.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    arm = _patch_apply()

    from pyspark.sql import functions as F

    from streamsql_spark.api.facade import StreamSQL

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = raw.agg(F.max("user_id")).first()[0] + 1
    root = tempfile.mkdtemp(prefix="ssql_retry_scale_")
    in_dir = f"{root}/in"
    t0 = time.time()
    for i in range(copies):
        (raw.withColumn("user_id", F.col("user_id") + F.lit(i * n_users))
         .coalesce(1).write.mode("append").parquet(in_dir))
    n_rows = spark.read.parquet(in_dir).count()
    print(f"staged {n_rows} rows x {copies} copies in "
          f"{time.time() - t0:.1f}s")

    arm(None)
    base = _run_leg(spark, StreamSQL, raw, in_dir, sql,
                    f"{root}/ckpt_base", f"retry_scale_{kernel}_base")
    print(f"[{kernel} {copies}x base   ] wall {base['wall']:.1f}s "
          f"({n_rows / base['wall']:,.0f} rows/s), out {base['rows']} "
          f"rows, sum_cnt {base['sum_cnt']}, sum_total "
          f"{base['sum_total']}, state {base['state_rows']} rows / "
          f"{base['state_mem']} B")

    arm(f"{kernel}_injected")
    inj = _run_leg(spark, StreamSQL, raw, in_dir, sql,
                   f"{root}/ckpt_inj", f"retry_scale_{kernel}_inj")
    print(f"[{kernel} {copies}x inject ] wall {inj['wall']:.1f}s "
          f"({n_rows / inj['wall']:,.0f} rows/s), out {inj['rows']} "
          f"rows, sum_cnt {inj['sum_cnt']}, sum_total "
          f"{inj['sum_total']}, state {inj['state_rows']} rows / "
          f"{inj['state_mem']} B")
    ok = (base["rows"] == inj["rows"]
          and base["sum_cnt"] == inj["sum_cnt"]
          and abs(base["sum_total"] - inj["sum_total"]) < 1e-6
          and base["state_rows"] == inj["state_rows"])
    print(f"retry overhead {inj['wall'] - base['wall']:+.1f}s; "
          f"output+state {'IDENTICAL' if ok else 'DIVERGED'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
