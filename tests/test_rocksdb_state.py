"""RocksDB state store scale knob (session.ROCKSDB_STATE_CONFS).

The stateful streaming kernels (windows / CEP / analytics via
applyInPandasWithState) run on whatever provider the session
configures; the default HDFS-backed store keeps all state on-heap, and
the RocksDB provider is the disk-backed path a large deployment runs.
This test proves the kernels work END-TO-END on RocksDB — provider
wiring errors (bad class name, missing configs) surface as query
failures, not silent fallbacks.

Runs in a SUBPROCESS: the provider is a session-construction conf, and
the suite's shared session must not be stopped/rebuilt mid-run.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os
os.environ["SPARK_GRAFT_CPUS"] = "4"
os.environ["SPARK_GRAFT_ROCKSDB_STATE"] = "1"
import streamsql_spark as ss
from streamsql_spark.session import get_spark
from streamsql_spark.streaming.harness import run_streaming_collect
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType)

spark = get_spark("rocksdb-e2e", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
prov = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
assert "RocksDB" in prov, prov

schema = StructType([StructField("k", StringType()),
                     StructField("v", DoubleType()),
                     StructField("ts", LongType())])
q = ss.StreamSQL(spark).execute(
    "SELECT k, count(*) AS n, sum(v) AS s FROM stream "
    "GROUP BY k, CountingWindow(2) WITH (TIMESTAMP='ts')")
batches = [
    [{"k": "a", "v": 1.0, "ts": 1}, {"k": "b", "v": 5.0, "ts": 2}],
    [{"k": "a", "v": 2.0, "ts": 3}, {"k": "b", "v": 6.0, "ts": 4}],
]
got = run_streaming_collect(spark, q, batches, schema)
got = sorted(got, key=lambda r: r["k"])
assert got == [{"k": "a", "n": 2, "s": 3.0},
               {"k": "b", "n": 2, "s": 11.0}], got
print("ROCKSDB_OK")
"""


def test_stateful_kernels_run_on_rocksdb_state_store():
    env = dict(os.environ)
    r = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                       capture_output=True, text=True, timeout=300,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert "ROCKSDB_OK" in r.stdout, (r.stdout[-1500:], r.stderr[-1500:])


# ---------------- r7: full replay-catalog parity on RocksDB state
_NORM_SRC = r"""
import datetime, json

def _norm_v(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, dict):
        return {k: _norm_v(x) for k, x in sorted(v.items())}
    if isinstance(v, (list, tuple)):
        return [_norm_v(x) for x in v]
    return v

def norm_rows(rows):
    out = [json.dumps({k: _norm_v(v) for k, v in sorted(r.items())},
                      sort_keys=True) for r in rows]
    return sorted(out)
"""

_REPLAY_ENTRIES = [
    "streaming_tumbling_replay", "streaming_counting_global_replay",
    "streaming_analytic_replay", "streaming_cep_replay",
    "streaming_session_replay", "streaming_lateness_replay",
]

_PARITY_SCRIPT = _NORM_SRC + r"""
import os, sys
os.environ["SPARK_GRAFT_ROCKSDB_STATE"] = "1"
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
from streamsql_spark.session import get_spark
from streamsql_spark.catalog import CATALOG
spark = get_spark("rocksdb-replay-parity", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
assert "RocksDB" in spark.conf.get(
    "spark.sql.streaming.stateStore.providerClass")
sf = sys.argv[1]
for name in sys.argv[2:]:
    df = CATALOG[name].run(spark, sf)
    rows = norm_rows([r.asDict(recursive=True) for r in df.collect()])
    print("RESULT\t" + name + "\t" + json.dumps(rows))
print("PARITY_DONE")
"""


def test_replay_catalog_value_parity_on_rocksdb(spark):
    """Every streaming replay entry must produce value-identical output
    under the RocksDB state-store provider (the 100-TB deployment
    path) and the default HDFS-backed provider.  The RocksDB side runs
    in a subprocess (provider is a session-construction conf); the
    default side runs on the shared test session.  ~90s: six replay
    pipelines twice at sf0.001."""
    import json

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("testdata not available")
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-c", _PARITY_SCRIPT, sf] + _REPLAY_ENTRIES,
        env=env, capture_output=True, text=True, timeout=540,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert "PARITY_DONE" in r.stdout, (r.stdout[-2000:], r.stderr[-2000:])
    rocksdb = {}
    for line in r.stdout.splitlines():
        if line.startswith("RESULT\t"):
            _, name, payload = line.split("\t", 2)
            rocksdb[name] = json.loads(payload)
    assert set(rocksdb) == set(_REPLAY_ENTRIES)

    ns: dict = {}
    exec(_NORM_SRC, ns)
    from streamsql_spark.catalog import CATALOG
    for name in _REPLAY_ENTRIES:
        df = CATALOG[name].run(spark, sf)
        got = ns["norm_rows"]([row.asDict(recursive=True)
                               for row in df.collect()])
        assert got == rocksdb[name], f"{name}: provider outputs differ"
