"""Streaming-kernel scale spot-check: one stateful kernel at 16x sf0.1
under the RocksDB state store (r8, BASELINE.md §C).

The batch spot-check (tests/scale_spot_check.py) anchors the
shape-dependent pipeline operators; the streaming replays in the
catalog are STARTUP-bound at sf0.1 (BASELINE.md §C), so their sf0.1
numbers say nothing about kernel throughput.  This script replays a
16x union of events.parquet (user_id remapped per copy -> 16x the key
cardinality, 24k keys) through the counting-window kernel
(applyInPandasWithState, streaming/stateful.py::counting_window_stream)
on RocksDB and reports:

- end-to-end wall time and rows/s over the 1.6M-row replay
- state rows and RocksDB memory/SST size from the final progress
  (stateOperators metrics) -- the executor-heap-ceiling question

Not a pytest (filename intentionally not test_*): run manually and
record the table in BASELINE.md §C.

    python3 tests/streaming_scale_check.py [sf_dir] [copies] [kernel ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_ROCKSDB_STATE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _restart_leg(spark, StreamSQL, raw, in_dir, n_rows, copies, sql,
                 ckpt_root) -> None:
    """Stop the counting kernel mid-replay (processingTime trigger,
    unprocessed files queued), restart from the same RocksDB
    checkpoint, report the recovery gap (restart -> first batch
    committed: offset log read + state store reload)."""
    import time
    seen = {"n": 0}
    q1 = StreamSQL(spark).execute(sql)
    stream = (spark.readStream.schema(raw.schema)
              .option("maxFilesPerTrigger", 2).parquet(in_dir))
    t0 = time.time()
    sq = q1.start_stream(
        stream, sink=lambda rows: seen.__setitem__(
            "n", seen["n"] + len(rows)),
        trigger={"processingTime": "0 seconds"},
        checkpoint=f"{ckpt_root}/ckpt",
        query_name="scale16x_counting_restart_p1")
    while not (sq.recentProgress and len(sq.recentProgress) >= 3) \
            and time.time() - t0 < 600:
        time.sleep(0.2)
    sq.stop()
    sq.awaitTermination(120)
    t_stop = time.time()
    q2 = StreamSQL(spark).execute(sql)
    stream2 = (spark.readStream.schema(raw.schema)
               .option("maxFilesPerTrigger", 4).parquet(in_dir))
    sq2 = q2.start_stream(
        stream2, sink=lambda rows: seen.__setitem__(
            "n", seen["n"] + len(rows)),
        checkpoint=f"{ckpt_root}/ckpt",
        query_name="scale16x_counting_restart_p2")
    first_commit = None
    while first_commit is None and time.time() - t_stop < 600:
        if sq2.recentProgress:
            first_commit = time.time()
        time.sleep(0.05)
    if first_commit is None:
        sq2.stop()
        raise RuntimeError(
            "restarted query made no progress within 600s — "
            "checkpoint recovery stalled")
    sq2.awaitTermination(1800)
    wall = time.time() - t0
    print(f"kernel=counting_restart copies={copies} rows={n_rows} "
          f"wall={wall:.1f}s (incl. stop+restart) "
          f"recovery_gap={first_commit - t_stop:.1f}s "
          f"out_rows={seen['n']}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    only = set(sys.argv[3:])  # optional kernel-name filter

    from pyspark.sql import functions as F

    from streamsql_spark.api.facade import StreamSQL
    from streamsql_spark.session import get_spark

    spark = get_spark("streaming-scale", rocksdb_state=True)
    spark.sparkContext.setLogLevel("ERROR")
    prov = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    assert "RocksDB" in prov, f"RocksDB provider not active: {prov}"

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = raw.agg(F.max("user_id")).first()[0] + 1
    root = tempfile.mkdtemp(prefix="ssql_stream_scale_")
    in_dir = f"{root}/in"
    # one file per copy -> maxFilesPerTrigger=4 gives a multi-batch
    # replay (state must survive micro-batch boundaries, like prod)
    t0 = time.time()
    for i in range(copies):
        (raw.withColumn("user_id", F.col("user_id") + F.lit(i * n_users))
         .coalesce(1).write.mode("append").parquet(in_dir))
    n_rows = spark.read.parquet(in_dir).count()
    print(f"staged {n_rows} rows x {copies} copies in "
          f"{time.time() - t0:.1f}s -> {in_dir}")

    _CEP_BODY = """
        SELECT user_id, a_ts, b_ts, a_val, b_val FROM stream
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS a_ts, B.ts AS b_ts,
                     A.value AS a_val, B.value AS b_val
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            DEFINE A AS value > 80, B AS value < 20
            WITHIN '4h'
        )
    """
    kernels = {
        "counting_window": """
            SELECT user_id, count(*) AS cnt, round(sum(value), 4) AS total
            FROM stream GROUP BY user_id, CountingWindow(25)
        """,
        "analytic": """
            SELECT event_id, user_id,
                   lag(value) OVER (PARTITION BY user_id) AS prev_v,
                   round(acc_sum(value) OVER (PARTITION BY user_id), 4)
                       AS run_sum,
                   acc_count(value) OVER (PARTITION BY user_id) AS run_cnt
            FROM stream
        """,
        # r9: the CEP kernel was the one class with no scale row; its
        # per-key state is O(buffered rows) (capped at _CEP_MAX_BUFFER
        # = the reference's maxRunRows), unlike the O(100B) kernels
        # above -- measure both the bare matcher and the
        # MAXOUTOFORDERNESS reorder-horizon config (the horizon holds a
        # per-key tail until the watermark passes, so state high-water
        # is the interesting number)
        "cep": _CEP_BODY,
        "cep_ooo_horizon": _CEP_BODY
        + " WITH (TIMESTAMP='ts', MAXOUTOFORDERNESS='5m')",
        # r10: adversarial NON-draining buffer — the r9 rows used A B
        # under SKIP PAST LAST ROW, where the buffer drains on every
        # match.  Here B* keeps extending until a RARE closer
        # (p(value<1) ~1.9% -> ~52-row average open run) and ALL ROWS
        # PER MATCH re-emits the whole buffered run; WITHIN spans the
        # fixture's full 30-day range (events run ~2.5 rows/user/day,
        # so a short WITHIN would expire runs instead of holding them)
        # — held-buffer high-water vs _CEP_MAX_BUFFER is the number to
        # watch (streaming/stateful.py::_CEP_MAX_BUFFER).
        "cep_nondraining": """
            SELECT user_id, cls, ts, value FROM stream
            MATCH_RECOGNIZE (
                PARTITION BY user_id
                ORDER BY ts, event_id
                MEASURES CLASSIFIER() AS cls
                ALL ROWS PER MATCH
                AFTER MATCH SKIP PAST LAST ROW
                PATTERN (A B* C)
                DEFINE A AS value > 99,
                       B AS value >= 1 AND value <= 99,
                       C AS value < 1
                WITHIN '30d'
            )
        """,
        # r11: the two kernel classes with no scale row yet.
        # GLOBAL WINDOW TRIGGER WHEN: per-key running aggregates +
        # trigger predicate + FIRE_AND_PURGE (streaming/stateful.py:810)
        "global_trigger": """
            SELECT user_id, count(*) AS cnt, round(sum(value), 4) AS total
            FROM stream GROUP BY user_id
            GLOBAL WINDOW TRIGGER WHEN count(*) >= 20
        """,
        # ALLOWEDLATENESS re-emission under a LATE-HEAVY replay: the
        # per-copy user_id remap means every row after the first file
        # belongs to a FRESH key whose windows are already behind the
        # global watermark -> it takes the late path (immediate fire +
        # update), and the '30d' lateness horizon holds EVERY fired
        # window's partials for the whole replay — held-state
        # high-water vs executor heap is the number to watch
        # (streaming/stateful.py:604).
        "lateness": """
            SELECT user_id, count(*) AS cnt, round(sum(value), 4) AS total
            FROM stream GROUP BY user_id, TumblingWindow('1d')
            WITH (TIMESTAMP='ts', MAXOUTOFORDERNESS='1h',
                  ALLOWEDLATENESS='30d')
        """,
    }
    class _UserDimSource:
        """Synthetic lookup dim: answers every user_id (r9 — measures
        the worker-side mapInPandas probe stage at scale)."""

        def name(self):
            return "meta"

        def schema(self):
            return "segment STRING, weight BIGINT"

        def lookup(self, key):
            return {"segment": "s" + str(int(key) % 7),
                    "weight": int(key) % 100}, True

    kernels["lookup_join"] = """
        SELECT event_id, user_id, m.segment AS segment,
               value * m.weight AS wv
        FROM stream JOIN meta m ON user_id = m.user_id
    """

    # r11: restart-recovery AT SCALE — stop the counting kernel
    # mid-replay (processingTime trigger, unprocessed files queued),
    # restart from the same RocksDB checkpoint, and report the
    # recovery gap (restart -> first batch committed: checkpoint
    # offset read + state store reload) alongside total wall.
    if not only or "counting_restart" in only:
        ckpt_root = tempfile.mkdtemp(prefix="ssql_restart_scale_")
        try:
            _restart_leg(spark, StreamSQL, raw, in_dir, n_rows, copies,
                         kernels["counting_window"], ckpt_root)
        finally:
            import shutil as _sh
            _sh.rmtree(ckpt_root, ignore_errors=True)

    for kernel_name, sql in kernels.items():
        if only and kernel_name not in only:
            continue
        q = StreamSQL(spark).execute(sql)
        if kernel_name == "lookup_join":
            q.register_table_source(_UserDimSource())
        stream = (spark.readStream.schema(raw.schema)
                  .option("maxFilesPerTrigger", 4).parquet(in_dir))
        got = {"n": 0}
        t0 = time.time()
        sq = q.start_stream(stream,
                            sink=lambda rows: got.__setitem__(
                                "n", got["n"] + len(rows)),
                            query_name=f"scale16x_{kernel_name}")
        if not sq.awaitTermination(1800):
            sq.stop()
            raise RuntimeError("16x replay did not finish in 30min")
        wall = time.time() - t0
        prog = sq.lastProgress or {}
        ops = (prog.get("stateOperators") or [{}])[0]
        custom = ops.get("customMetrics", {})
        # HIGH-WATER across the replay, not just the final batch: a
        # WITHIN-expiring buffer (cep_nondraining) can drain by the
        # last progress while holding far more mid-stream
        hw_mem = hw_rows = 0
        for p in (sq.recentProgress or []):
            for op in (p.get("stateOperators") or []):
                hw_mem = max(hw_mem, op.get("memoryUsedBytes") or 0)
                hw_rows = max(hw_rows, op.get("numRowsTotal") or 0)
        print(f"kernel={kernel_name} copies={copies} rows={n_rows} "
              f"wall={wall:.1f}s rows_per_s={n_rows / wall:,.0f} "
              f"out_rows={got['n']}")
        print(f"state: numRowsTotal={ops.get('numRowsTotal')} "
              f"memoryUsedBytes={ops.get('memoryUsedBytes')} "
              f"highwater: mem={hw_mem} rows={hw_rows} "
              f"rocksdbTotalMemory="
              f"{custom.get('rocksdbTotalMemoryUsageBytes')} "
              f"rocksdbSstFiles={custom.get('rocksdbSstFileSize')} "
              f"rocksdbPinnedMem="
              f"{custom.get('rocksdbPinnedBlocksMemoryUsage')}")

    import shutil
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
