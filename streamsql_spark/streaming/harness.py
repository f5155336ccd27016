"""Deterministic streaming test harness.

Replays row batches as a file-source stream (one JSON file per
micro-batch, ``maxFilesPerTrigger=1``, ascending mtimes) and runs the
query with ``Trigger.AvailableNow`` — the Spark analog of the
reference's deterministic Emit + TriggerWindow test pattern (SURVEY §5).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession


def _fast_tmp_root() -> str | None:
    """Prefer a RAM-backed tmpfs for replay inputs + checkpoints: the
    streaming metadata log fsyncs offsets/commits every micro-batch, so
    on spinning/virtual disks the replay is I/O-latency-bound, not
    compute-bound.  Purely a harness concern — production checkpoints
    belong on durable storage."""
    p = "/dev/shm"
    return p if os.path.isdir(p) and os.access(p, os.W_OK) else None


class StreamReplay:
    """Write batches to a temp dir and expose them as a readStream."""

    def __init__(self, spark: SparkSession, schema, subdir: str = "input"):
        self.spark = spark
        self.root = tempfile.mkdtemp(prefix="streamsql_replay_",
                                     dir=_fast_tmp_root())
        self.input_dir = os.path.join(self.root, subdir)
        os.makedirs(self.input_dir)
        self.checkpoint = os.path.join(self.root, "ckpt")
        self.schema = schema
        self._n = 0

    def add_batch(self, rows: list[dict]) -> None:
        path = os.path.join(self.input_dir, f"batch-{self._n:05d}.json")

        def _default(o):
            # datetime → ISO-8601 'T' form, which Spark's default JSON
            # timestampFormat (yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]) parses
            if hasattr(o, "isoformat"):
                return o.isoformat()
            raise TypeError(f"not JSON serializable: {type(o)}")

        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r, default=_default) + "\n")
        # file source orders by modification time — force strict ascent
        mtime = time.time() + self._n
        os.utime(path, (mtime, mtime))
        self._n += 1

    def stream(self, max_files_per_trigger: int = 1):
        return (self.spark.readStream.schema(self.schema)
                .option("maxFilesPerTrigger", max_files_per_trigger)
                .json(self.input_dir))

    def cleanup(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)


def run_streaming_collect(spark, plan_holder, batches: list[list[dict]],
                          schema, tables=None, timeout: int = 120,
                          stop_after_rows: int | None = None) -> list[dict]:
    """Replay ``batches``, run the compiled query to completion
    (AvailableNow), return all sunk rows in arrival order.

    ``stop_after_rows``: stop the query as soon as the sink has
    received this many rows instead of waiting for self-termination —
    for queries that register processing-time timeouts (STATETTL),
    AvailableNow keeps the trigger loop alive until the timeouts fire,
    so a test that only asserts the data rows would otherwise burn the
    full ``timeout``."""
    from .executor import StreamingExecutor

    replay = StreamReplay(spark, schema)
    try:
        for b in batches:
            replay.add_batch(b)
        got: list[dict] = []
        split = getattr(plan_holder, "_stream_lookup_sources", None)
        ex = StreamingExecutor(
            spark,
            {**(getattr(plan_holder, "_tables", None) or {}),
             **(tables or {})},
            lookup_sources=(split() if callable(split)
                            else dict(getattr(plan_holder,
                                              "_table_sources",
                                              None) or {})))
        q = ex.start(plan_holder.plan, replay.stream(),
                     sink=lambda rows: got.extend(rows),
                     checkpoint=replay.checkpoint)
        if stop_after_rows is None:
            q.awaitTermination(timeout)
        else:
            import time as _time
            deadline = _time.time() + timeout
            while _time.time() < deadline:
                if q.awaitTermination(1):
                    break
                if len(got) >= stop_after_rows:
                    break
        if q.isActive:  # timed out / early stop — before ckpt vanishes
            q.stop()
        return got
    finally:
        replay.cleanup()
