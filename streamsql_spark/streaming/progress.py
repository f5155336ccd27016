"""Session-wide streaming progress accumulator.

GetStats (streamsql.go:345-351) needs monotone input/output totals for
the life of a stream, but Spark retains only the last
``spark.sql.streaming.numRecentProgressUpdates`` (default 100) progress
entries — re-summing ``recentProgress`` silently undercounts any
long-running query.  This module accumulates observedMetrics
incrementally instead: a single session-wide StreamingQueryListener
ingests every progress event as it happens, and GetStats additionally
drains ``recentProgress`` synchronously (listener callbacks are async)
— both paths feed one idempotent accumulator deduplicated by
(runId, batchId) high-water mark, so nothing is counted twice and
nothing is lost when more than 100 micro-batches elapse between calls.
"""

from __future__ import annotations

import json
import threading

_LOCK = threading.Lock()
# query id -> {"in": total, "out": total, "hwm": {runId: last batchId}}
_TOTALS: dict[str, dict] = {}
# ids of SparkSessions that already carry the listener
_SESSIONS: set[int] = set()


def ingest(progress: dict) -> None:
    """Fold one StreamingQueryProgress dict into the totals (idempotent
    per (runId, batchId): replays and double-drains are no-ops)."""
    qid = progress.get("id")
    rid = progress.get("runId")
    bid = progress.get("batchId")
    if qid is None or rid is None or bid is None:
        return
    # recentProgress dicts carry uuid.UUID objects, the listener's JSON
    # path carries strings — normalize so both feed the same totals
    qid, rid = str(qid), str(rid)
    with _LOCK:
        t = _TOTALS.setdefault(qid, {"in": 0, "out": 0, "hwm": {}})
        if bid <= t["hwm"].get(rid, -1):
            return
        t["hwm"][rid] = bid
        for name, vals in (progress.get("observedMetrics") or {}).items():
            try:
                rows = int(vals["rows"])
            except (TypeError, KeyError, ValueError):
                continue
            if name.startswith("streamsql_source"):
                t["in"] += rows
            elif name.startswith("streamsql_output"):
                t["out"] += rows


def totals(query_id: str) -> dict[str, int]:
    with _LOCK:
        t = _TOTALS.get(str(query_id))
        return {"in": t["in"], "out": t["out"]} if t else {"in": 0, "out": 0}


def ensure_listener(spark) -> None:
    """Attach the accumulator listener to this session (once)."""
    key = id(spark)
    with _LOCK:
        if key in _SESSIONS:
            return
        _SESSIONS.add(key)
    from pyspark.sql.streaming import StreamingQueryListener

    class _Accumulator(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            try:
                ingest(json.loads(event.progress.json))
            except Exception:
                pass  # metrics must never break the stream

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(_Accumulator())
