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
