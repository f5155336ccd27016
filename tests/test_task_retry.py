"""Task-retry fault injection for the custom stateful kernels (r12
brief #4).

``test_restart_recovery.py`` restarts whole QUERIES; Spark also
retries individual TASKS within a micro-batch (executor crash,
preemption, speculative kill).  The state-store contract under a task
retry: the failed attempt's store updates must ABORT (never commit),
and the retried task re-applies the batch from the previous committed
state version — no double-applied accumulators and no double-emitted
fires.  Nothing exercised that before.

Injection shape — the sharpest one: ``applyInPandasWithState`` is
patched subprocess-wide so every kernel function is wrapped; the
wrapper first drains the real kernel for a group (forcing its
``state.update`` calls to the store), THEN raises exactly once
process-wide (``O_CREAT|O_EXCL`` marker file).  The failed attempt has
therefore already written state before dying; output equality with an
uninjected run proves the aborted attempt leaked nothing.

Local-mode gotcha this file encodes: ``spark.task.maxFailures`` is
IGNORED by the local scheduler — retries need the ``local[N, F]``
master form (LocalSchedulerBackend takes maxFailures from the master
string).  Runs in a SUBPROCESS because master + RocksDB provider are
session-construction settings.

Covers the five custom kernel classes: counting window, global
TRIGGER WHEN, ALLOWEDLATENESS, analytic accumulators, CEP.
"""

import os
import subprocess
import sys

import pytest

from test_restart_recovery import _COMMON

# slow tier (r14): subprocess fault-injection rig — opt-in (`-m slow`)
# after any stateful-kernel/state-store change
pytestmark = pytest.mark.slow

_PREFIX = r"""
import os
os.environ["SPARK_GRAFT_ROCKSDB_STATE"] = "1"
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
from pyspark.sql import SparkSession
from streamsql_spark.session import ROCKSDB_STATE_CONFS, SCALE_CONFS
_b = (SparkSession.builder.appName("task-retry")
      .master("local[4, 2]")  # second slot = task maxFailures
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.ui.showConsoleProgress", "false"))
for _k, _v in {**SCALE_CONFS, **ROCKSDB_STATE_CONFS}.items():
    _b = _b.config(_k, _v)
_b.getOrCreate()
"""

_PATCH = r"""
import tempfile
from pyspark.sql.pandas import group_ops

_ORIG_APPLY = group_ops.PandasGroupedOpsMixin.applyInPandasWithState
_FAIL_DIR = tempfile.mkdtemp(prefix="task_retry_markers_")
_ARMED = {"path": None}  # per-case marker file; None = injection off


def arm(case):
    _ARMED["path"] = os.path.join(_FAIL_DIR, case)


def disarm():
    _ARMED["path"] = None


def _wrapping_apply(self, func, *a, **kw):
    marker = _ARMED["path"]
    if marker is None:
        return _ORIG_APPLY(self, func, *a, **kw)

    def wrapper(key, it, state, _f=func, _m=marker):
        # drain the REAL kernel first: its state.update calls land in
        # the store before the injected failure, so the abort path is
        # what keeps them out of the committed version
        out = list(_f(key, it, state))
        import os as _os
        try:
            fd = _os.open(_m, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
            _os.close(fd)
            raise RuntimeError("injected task failure (task-retry test)")
        except FileExistsError:
            pass
        for pdf in out:
            yield pdf

    return _ORIG_APPLY(self, wrapper, *a, **kw)


group_ops.PandasGroupedOpsMixin.applyInPandasWithState = _wrapping_apply


def check_retry(name, sql, batches, **kw):
    disarm()
    base = uninterrupted(sql, batches, **kw)
    arm(name)
    try:
        got = uninterrupted(sql, batches, **kw)
    finally:
        marker = _ARMED["path"]
        disarm()
    assert os.path.exists(marker), (name, "injection never fired")
    assert norm(got) == norm(base), (
        name, "task retry changed the output", norm(got), norm(base))
    print("CASE_OK\t" + name + "\t" + str(len(base)))
"""

_WINDOW_BODY = r"""
check_retry(
    "counting",
    "SELECT k, count(*) AS n, round(sum(v), 4) AS s FROM stream "
    "GROUP BY k, CountingWindow(3) WITH (TIMESTAMP='ts')",
    [
        [{"k": "a", "v": 1.0, "ts": 1}, {"k": "b", "v": 10.0, "ts": 2}],
        [{"k": "a", "v": 2.0, "ts": 3}, {"k": "b", "v": 20.0, "ts": 4},
         {"k": "a", "v": 4.0, "ts": 5}, {"k": "b", "v": 40.0, "ts": 6}],
        [{"k": "a", "v": 8.0, "ts": 7}],
    ],
)

check_retry(
    "global_trigger",
    "SELECT k, count(*) AS cnt, round(sum(v), 4) AS total FROM stream "
    "GROUP BY k GLOBAL WINDOW TRIGGER WHEN count(*) >= 3 "
    "WITH (TIMESTAMP='ts')",
    [
        [{"k": "a", "v": 1.0, "ts": 1}, {"k": "b", "v": 10.0, "ts": 2}],
        [{"k": "a", "v": 2.0, "ts": 3}, {"k": "b", "v": 20.0, "ts": 4},
         {"k": "a", "v": 4.0, "ts": 5}, {"k": "b", "v": 40.0, "ts": 6}],
        [{"k": "a", "v": 8.0, "ts": 7}, {"k": "a", "v": 16.0, "ts": 8},
         {"k": "a", "v": 32.0, "ts": 9}],
    ],
)

check_retry(
    "lateness",
    "SELECT k, round(sum(v), 4) AS s, count(*) AS n FROM stream "
    "GROUP BY k, TumblingWindow('10s') "
    "WITH (TIMESTAMP='ts', TIMEUNIT='ms', "
    "MAXOUTOFORDERNESS='2s', ALLOWEDLATENESS='20s')",
    [
        [{"k": "d1", "v": 1.0, "ts": 1000},
         {"k": "d1", "v": 2.0, "ts": 5000}],
        [{"k": "d1", "v": 4.0, "ts": 13000},
         {"k": "d1", "v": 0.25, "ts": 24000}],
        [{"k": "d1", "v": 8.0, "ts": 9000},   # late re-emission
         {"k": "d1", "v": 0.5, "ts": 55000}],
    ],
)
print("ALL_OK")
"""

_ROW_BODY = r"""
check_retry(
    "analytic",
    "SELECT k, v, lag(v) OVER (PARTITION BY k) AS prev, "
    "round(acc_sum(v) OVER (PARTITION BY k), 4) AS rs, "
    "acc_count(v) OVER (PARTITION BY k) AS rc FROM stream "
    "WITH (TIMESTAMP='ts')",
    [
        [{"k": "a", "v": 1.0, "ts": 1}, {"k": "b", "v": 10.0, "ts": 2}],
        [{"k": "a", "v": 2.0, "ts": 3},
         {"k": "a", "v": 4.0, "ts": 5}, {"k": "b", "v": 20.0, "ts": 6}],
        [{"k": "b", "v": 40.0, "ts": 7}],
    ],
)

check_retry(
    "cep",
    "SELECT k, a_ts, b_ts FROM stream MATCH_RECOGNIZE ("
    " PARTITION BY k ORDER BY ts"
    " MEASURES A.ts AS a_ts, B.ts AS b_ts"
    " ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW"
    " PATTERN (A B) DEFINE A AS v > 80, B AS v < 20"
    " WITHIN '1h'"
    ") WITH (TIMESTAMP='ts', TIMEUNIT='ms')",
    [
        [{"k": "p", "v": 90.0, "ts": 1000},
         {"k": "p", "v": 5.0, "ts": 2000},
         {"k": "q", "v": 85.0, "ts": 1500}],
        [{"k": "p", "v": 50.0, "ts": 2200},
         {"k": "q", "v": 3.0, "ts": 3500},
         {"k": "p", "v": 95.0, "ts": 4000}],
        [{"k": "p", "v": 6.0, "ts": 5000}],
    ],
)
print("ALL_OK")
"""


def _run(script: str, timeout: int = 900):
    env = dict(os.environ)
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=timeout,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert "ALL_OK" in r.stdout, (r.stdout[-3000:], r.stderr[-3000:])
    return r.stdout


# one subprocess for all five kernel classes (r13 suite-runtime work:
# the two per-group subprocesses each paid ~17 s of JVM+session
# startup for identical coverage)
import pytest


@pytest.fixture(scope="module")
def retry_out():
    return _run(_PREFIX + _COMMON + _PATCH + _WINDOW_BODY + _ROW_BODY,
                timeout=1800)


def test_task_retry_window_kernels(retry_out):
    for case in ("counting", "global_trigger", "lateness"):
        assert f"CASE_OK\t{case}" in retry_out, retry_out


def test_task_retry_row_kernels(retry_out):
    for case in ("analytic", "cep"):
        assert f"CASE_OK\t{case}" in retry_out, retry_out
