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


@pytest.mark.slow
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


# ---------------- r9: CEP bounded state under adversarial key cardinality

_CEP_MANYKEYS_SCRIPT = r"""
import os, tempfile
os.environ["SPARK_GRAFT_ROCKSDB_STATE"] = "1"
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
from pyspark.sql import functions as F
import streamsql_spark as ss
from streamsql_spark.session import get_spark

spark = get_spark("rocksdb-cep-manykeys", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
assert "RocksDB" in spark.conf.get(
    "spark.sql.streaming.stateStore.providerClass")

N = 20000
root = tempfile.mkdtemp(prefix="cep_many_")
key = F.concat(F.lit("k"), F.col("id").cast("string")).alias("k")
# trigger 1: an A row per key (partial match held in state across the
# micro-batch boundary); trigger 2: the B row that completes it
(spark.range(N).select(key, F.lit(90.0).alias("v"),
                       F.lit(1000).cast("long").alias("ts"))
 .coalesce(1).write.mode("append").parquet(root + "/in"))
(spark.range(N).select(key, F.lit(10.0).alias("v"),
                       F.lit(2000).cast("long").alias("ts"))
 .coalesce(1).write.mode("append").parquet(root + "/in"))

q = ss.StreamSQL(spark).execute('''
    SELECT k, av FROM stream MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts
        MEASURES A.v AS av
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B) DEFINE A AS v > 80, B AS v < 20)
''')
schema = spark.read.parquet(root + "/in").schema
stream = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(root + "/in"))
got = {"n": 0}
sq = q.start_stream(stream,
                    sink=lambda rows: got.__setitem__("n",
                                                      got["n"] + len(rows)),
                    query_name="cep_manykeys")
assert sq.awaitTermination(480), "20k-key CEP replay did not finish"
ops = (sq.lastProgress.get("stateOperators") or [{}])[0]
n_state = ops.get("numRowsTotal")
mem = ops.get("memoryUsedBytes")
assert got["n"] == N, f"matches {got['n']} != {N}"
# state grows with KEY COUNT, never with stream length: one state row
# per live key, small per-key footprint (the partial-match buffer
# drains at each match; row buffer capped at _CEP_MAX_BUFFER)
assert n_state is not None and n_state <= N, n_state
assert mem is not None and mem / N < 2048, f"per-key state {mem/N:.0f}B"
print(f"CEP_MANYKEYS_OK state_rows={n_state} mem_per_key={mem/N:.0f}B")
"""


@pytest.mark.slow
def test_cep_many_keys_bounded_state():
    """Reference parity for the CEP memory guard (cep/engine.go:17-23
    caps live partitions at 10k with LRU eviction; cep_stress_test.go
    asserts survival): this engine keeps per-key NFA state in the
    disk-backed state store instead — 20k concurrent partial matches
    must complete across a micro-batch boundary with state bounded by
    KEY COUNT (one state row per key, small per-key footprint), and
    idle keys are reaped by STATETTL rather than LRU (documented
    eviction contract, README + BASELINE.md §C)."""
    env = dict(os.environ)
    r = subprocess.run([sys.executable, "-c", _CEP_MANYKEYS_SCRIPT],
                       env=env, capture_output=True, text=True,
                       timeout=580,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert "CEP_MANYKEYS_OK" in r.stdout, \
        (r.stdout[-1500:], r.stderr[-1500:])
