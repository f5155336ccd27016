"""Scale spot-check for the shape-dependent pipeline operators.

The plan pins in tests/test_plans.py assert SHAPES (band-bucket join,
CC rounds, single pack window); this script anchors them with NUMBERS
at 16x sf0.1 — the BASELINE.md §C rig — for the three operators whose
cost is most data-shape-dependent:

- MinHash-LSH near-dup   (band fan-out)
- SimHash pairs → connected components (CC round count)
- token counting → budget packing → pack materialization (window shuffle)

Each 16x copy remaps doc_id and salts the text with a copy tag so the
near-dup density stays organic instead of exploding into 16-way exact
duplicate groups (pair count is quadratic in copies per bucket).

Not a pytest (filename intentionally not test_*): run manually and
record the table in BASELINE.md §C.

    python3 tests/scale_spot_check.py [sf_dir] [copies]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def _stage_writes(spark) -> dict[int, int]:
    """{stageId: shuffleWriteBytes} for completed stages, via the UI
    REST API."""
    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}"
                                    f"/stages?status=complete") as r:
            stages = json.load(r)
        return {s["stageId"]: s.get("shuffleWriteBytes", 0)
                for s in stages}
    except Exception as e:  # noqa: BLE001 — metrics are best-effort
        print(f"(shuffle metrics unavailable: {e})", file=sys.stderr)
        return {}


def _scaled_docs(spark, sf_dir: str, copies: int,
                 id_cap: int | None = None) -> DataFrame:
    from streamsql_spark.session import load_tables
    docs = load_tables(spark, sf_dir)["documents"]
    if id_cap is not None:
        docs = docs.where(f"doc_id < {id_cap}")
    n = docs.count()
    parts = []
    for i in range(copies):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
        if i:
            # salt so cross-copy texts are near- not exact-duplicates
            d = d.withColumn("text", F.concat(F.col("text"),
                                              F.lit(f" c{i}")))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(32).cache()


def _bench(name: str, spark, make_df, rows_in: int, repeats: int = 3):
    best = None
    for _ in range(repeats):
        pre = _stage_writes(spark)
        t0 = time.monotonic()
        make_df().write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        post = _stage_writes(spark)
        new = {sid: w for sid, w in post.items() if sid not in pre}
        rec = {"name": name, "wall_s": round(wall, 2),
               "rows_in": rows_in,
               "rows_per_s": round(rows_in / wall),
               "shuffle_write_bytes": sum(new.values()) if post else -1,
               "max_stage_shuffle_bytes": max(new.values(), default=0)}
        if best is None or rec["wall_s"] < best["wall_s"]:
            best = rec
    print(json.dumps(best))
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import SparkSession

    from streamsql_spark.operators.dedup import (minhash_dedup_pairs,
                                                 simhash_dedup_pairs)
    from streamsql_spark.operators.graph import dedup_clusters
    from streamsql_spark.operators.pack import (budget_shard_pack,
                                                materialize_packs)
    from streamsql_spark.operators.text import token_counts
    from streamsql_spark.session import SCALE_CONFS

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (SparkSession.builder.appName("scale-spot-check")
         .master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.driver.memory",
                 os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
         # UI ON (unlike get_spark): the REST API is the shuffle-bytes
         # metrics source
         .config("spark.ui.enabled", "true")
         .config("spark.ui.showConsoleProgress", "false"))
    for k, v in SCALE_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    docs = _scaled_docs(spark, sf_dir, copies)
    n_docs = docs.count()  # materialize the cache
    print(f"# corpus: {n_docs} docs ({copies}x {sf_dir})", file=sys.stderr)

    _bench(f"minhash_lsh_{copies}x", spark,
           lambda: minhash_dedup_pairs(docs, "text", "doc_id",
                                       num_hashes=12, bands=4,
                                       shingle_k=3, threshold=0.5),
           n_docs)

    cc_docs = _scaled_docs(spark, sf_dir, copies, id_cap=1000)
    n_cc = cc_docs.count()
    _bench(f"simhash_cc_{copies}x", spark,
           lambda: dedup_clusters(
               cc_docs, simhash_dedup_pairs(cc_docs, "text", "doc_id",
                                            max_hamming=4), "doc_id"),
           n_cc)

    toks = token_counts(docs.select("doc_id", "source", "text")) \
        .select("doc_id", "source", "text", "est_bpe_tokens")
    _bench(f"pack_materialize_{copies}x", spark,
           lambda: materialize_packs(
               budget_shard_pack(toks, "source", "doc_id",
                                 "est_bpe_tokens", 2048),
               "source", "doc_id"),
           n_docs)

    # r10: the BATCH lookup-source join (register_table_source routed
    # through the worker-side probe: distinct keys -> mapInPandas probe
    # of only the keys -> JVM join back).  16x events = 1.6M rows over
    # 24k distinct keys; the number anchors the claim that batch lookup
    # cost is per-distinct-key and parallel, not a serial driver loop.
    from streamsql_spark.api.facade import StreamSQL
    from streamsql_spark.session import load_tables

    class _UserDimSource:
        def name(self):
            return "meta"

        def schema(self):
            return "segment STRING, weight BIGINT"

        def lookup(self, key):
            return {"segment": "s" + str(int(key) % 7),
                    "weight": int(key) % 100}, True

    events = load_tables(spark, sf_dir)["events"]
    n_users = events.agg(F.max("user_id")).first()[0] + 1
    ev = None
    for i in range(copies):
        d = events.withColumn("user_id",
                              F.col("user_id") + F.lit(i * n_users))
        ev = d if ev is None else ev.unionByName(d)
    ev = ev.cache()
    n_ev = ev.count()

    def _batch_lookup():
        q = StreamSQL(spark).execute(
            "SELECT event_id, user_id, m.segment AS segment, "
            "value * m.weight AS wv "
            "FROM stream JOIN meta m ON user_id = m.user_id")
        q.register_table_source(_UserDimSource())
        return q.query(ev)

    _bench("batch_lookup_join_16x", spark, _batch_lookup, n_ev)


if __name__ == "__main__":
    main()
