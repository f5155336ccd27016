"""Doc-mirror tests: the reference's documented example SQL executed
verbatim (test/e2e/doc_cases_test.go) so the public dialect surface
can't drift."""

import pytest
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from streamsql_spark.api.facade import StreamSQL
from streamsql_spark.dialect.parser import parse
from streamsql_spark.dialect.planner import plan as make_plan


# doc_cases_test.go:16 — filter + conversion + CASE grading via EmitSync
def test_doc_filter_transform(spark):
    sql = """SELECT deviceId,
       temperature,
       temperature * 1.8 + 32 AS temp_f,
       CASE WHEN temperature > 35 THEN 'CRITICAL'
            WHEN temperature > 30 THEN 'WARNING'
            ELSE 'OK' END AS level
FROM stream
WHERE temperature > 0 AND temperature < 100"""
    schema = StructType([StructField("deviceId", StringType()),
                         StructField("temperature", DoubleType())])
    s = StreamSQL(spark, schema=schema)
    s.execute(sql)
    cases = [
        ({"deviceId": "dev-01", "temperature": 28.0}, False, "OK", 82.4),
        ({"deviceId": "dev-02", "temperature": 32.0}, False, "WARNING", 89.6),
        ({"deviceId": "dev-03", "temperature": 38.0}, False, "CRITICAL", 100.4),
        ({"deviceId": "dev-04", "temperature": 999.0}, True, "", 0),
        ({"deviceId": "dev-05", "temperature": None}, True, "", 0),
    ]
    for row, filtered, level, temp_f in cases:
        out = s.emit_sync(row)
        if filtered:
            assert out is None, f"{row} should be filtered"
        else:
            assert out["level"] == level
            assert abs(out["temp_f"] - temp_f) < 0.01


# doc_cases_test.go:55 — stream-table JOIN enrichment via EmitSync
def test_doc_join_enrichment(spark):
    sql = """SELECT deviceId, m.location, m.model, temperature
FROM stream JOIN meta m ON deviceId = m.deviceId"""
    s = StreamSQL(spark)
    s.execute(sql)
    s.register_table("meta", [
        {"deviceId": "d1", "location": "plantA", "model": "TX-100"},
        {"deviceId": "d2", "location": "plantB", "model": "TX-200"},
    ])
    r1 = s.emit_sync({"deviceId": "d1", "temperature": 31.0})
    assert r1["location"] == "plantA" and r1["model"] == "TX-100"
    r2 = s.emit_sync({"deviceId": "d2", "temperature": 27.5})
    assert r2["location"] == "plantB"
    assert s.emit_sync({"deviceId": "d9", "temperature": 40.0}) is None


# doc_cases_test.go:84 — CDC: global lag threshold crossing
def test_doc_cdc_global_lag(spark):
    s = StreamSQL(spark)
    s.execute("SELECT current, ts FROM stream "
              "WHERE current > 300 AND lag(current) <= 300 WITH (TIMESTAMP='ts')")
    inputs = [{"current": c, "ts": t} for t, c in enumerate(
        [300, 400, 200, 200, 500, 200, 400, 600], start=1)]
    outs = [r for r in (s.emit_sync(i) for i in inputs) if r is not None]
    assert [r["current"] for r in outs] == [400, 500, 400]


# doc_cases_test.go:112 — CDC: OVER (WHEN ...) gated lag
def test_doc_cdc_when_limited_lag(spark):
    s = StreamSQL(spark)
    s.execute("SELECT current, deviceId, ts FROM stream "
              "WHERE current > 300 AND deviceId = 1 "
              "AND lag(current) OVER (WHEN deviceId = 1) < 300 "
              "WITH (TIMESTAMP='ts')")
    data = [(300, 1), (400, 2), (200, 1), (200, 2),
            (500, 1), (200, 2), (400, 1), (600, 2)]
    inputs = [{"current": c, "deviceId": d, "ts": t}
              for t, (c, d) in enumerate(data, start=1)]
    outs = [r for r in (s.emit_sync(i) for i in inputs) if r is not None]
    assert len(outs) == 1
    assert outs[0]["current"] == 500 and outs[0]["deviceId"] == 1


# doc_cases_test.go:139 — documented window SQL parses and plans
@pytest.mark.parametrize("sql", [
    "SELECT deviceId, COUNT(*) AS msgs, MAX(ts) AS last_ts FROM stream "
    "GROUP BY deviceId, SessionWindow('5s')",
    "SELECT MIN(concurrency) AS mn, COUNT(*) AS c FROM stream "
    "GROUP BY SlidingWindow('10s','2s') HAVING mn > 200",
    "SELECT deviceId, COUNT(*) AS samples, AVG(temperature) AS a FROM stream "
    "GROUP BY deviceId, TumblingWindow('1m') WITH (TIMESTAMP='ts', TIMEUNIT='ms')",
    "SELECT deviceId, MAX(temperature) AS max_t, COUNT(*) AS samples "
    "FROM stream GROUP BY deviceId, GLOBAL WINDOW "
    "TRIGGER WHEN MAX(temperature) > 50",
])
def test_doc_window_sql_plans(sql):
    make_plan(parse(sql))


def test_custom_functions_demo_port(spark):
    """Port of examples/custom-functions-demo/main.go: a geometric-mean
    UDAF (Aggregation interface) and a moving-average stateful analytic
    (TypeAnalytical) registered at runtime and called from the dialect."""
    import math

    from streamsql_spark.functions.registry import register_analytic_function

    s = StreamSQL(spark)

    def geomean(values):
        vals = [v for v in values if v is not None and v > 0]
        if not vals:
            return None
        return float(math.exp(sum(math.log(v) for v in vals) / len(vals)))

    s.register_aggregate_function("geometric_mean", geomean, "double")

    class MovingAvg:
        """Real windowed version of the demo's moving_avg(value, n)."""

        def __init__(self):
            self.buf = []

        def apply(self, args):
            v, n = args[0], int(args[1])
            if v is not None:
                self.buf.append(v)
                del self.buf[:-n]
            return sum(self.buf) / len(self.buf) if self.buf else None

        def reset(self):
            self.buf = []

    register_analytic_function("moving_avg", MovingAvg, "double")

    df = spark.createDataFrame(
        [("d1", float(v), 1000 + i) for i, v in enumerate([2, 8, 4, 16])],
        "k string, v double, ts long")
    s.execute("SELECT k, round(geometric_mean(v), 4) AS gm FROM stream GROUP BY k")
    [row] = s.query(df).collect()
    assert row["gm"] == round((2 * 8 * 4 * 16) ** 0.25, 4)

    s2 = StreamSQL(spark)
    s2.execute("SELECT v, round(moving_avg(v, 2) OVER (PARTITION BY k), 2) "
               "AS ma FROM stream")
    rows = sorted((r["v"], r["ma"]) for r in s2.query(df).collect())
    assert rows == [(2.0, 2.0), (4.0, 6.0), (8.0, 5.0), (16.0, 10.0)]


def test_codec_seam_injected_decoder_flows_through_features(spark):
    """The codec seam contract (README §codec seam): an injected
    codec_decoder is cloudpickled into the mapInPandas closure, its
    decoded output feeds the SAME image/audio feature kernels as the
    built-in PPM/WAV paths, and None falls through to byte stats —
    schema identical in all three cases."""
    import numpy as np

    from streamsql_spark.operators.multimodal import (FEATURE_SCHEMA,
                                                      extract_features)

    rows = [
        {"media_id": 1, "kind": "image", "payload": b"\x89PNG-fake",
         "meta": {"mime": "image/png", "n_bytes": 9, "source": "t"}},
        {"media_id": 2, "kind": "audio", "payload": b"fLaC-fake",
         "meta": {"mime": "audio/flac", "n_bytes": 9, "source": "t"}},
        {"media_id": 3, "kind": "image", "payload": b"not-media",
         "meta": {"mime": "application/octet-stream", "n_bytes": 9,
                  "source": "t"}},
    ]
    from streamsql_spark.operators.multimodal import MEDIA_SCHEMA
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    def fake_decoder(payload: bytes):
        if payload.startswith(b"\x89PNG"):
            # 2x2 mid-gray "image"
            return np.full((2, 2, 3), 128, dtype=np.uint8)
        if payload.startswith(b"fLaC"):
            t = np.arange(64, dtype=np.float64)
            return np.sin(2 * np.pi * t / 8), 8000
        return None

    out = {r["media_id"]: r for r in (
        extract_features(media, codec_decoder=fake_decoder)
        .collect())}
    assert out[1]["kind"] == "image/decoded"
    assert out[1]["byte_mean"] == pytest.approx(127.946, abs=0.2)  # luma(128)
    assert sum(out[1]["feature"]) == pytest.approx(1.0, abs=1e-4)
    assert out[2]["kind"] == "audio/decoded"
    assert 0.6 < out[2]["byte_mean"] < 0.8      # RMS of a sine ≈ 0.707
    assert sum(out[2]["feature"]) == pytest.approx(1.0, abs=1e-4)
    assert out[3]["kind"] == "image"            # fell through to byte stats
    # all three rows share the declared schema
    got = extract_features(media, codec_decoder=fake_decoder)
    assert got.schema == FEATURE_SCHEMA


def test_evaluator_semantics_null_propagation(spark):
    """Port of test/e2e/evaluator_semantics_test.go: SQL three-valued
    logic on the per-event sync path — NULL propagates through
    arithmetic (not treated as 0), NULL comparisons are UNKNOWN (row
    filtered), CASE with no match and no ELSE yields NULL, and a
    string in arithmetic is never evaluated as its length."""
    from streamsql_spark.api.facade import StreamSQL

    e = StreamSQL(spark)
    e.execute("SELECT temperature + 10 AS x FROM stream")
    assert e.emit_sync({"temperature": 5.0}) == {"x": 15.0}
    assert e.emit_sync({"temperature": None}) == {"x": None}

    e2 = StreamSQL(spark)
    e2.execute("SELECT temperature FROM stream WHERE temperature > 20")
    assert e2.emit_sync({"temperature": 25.0}) == {"temperature": 25.0}
    assert e2.emit_sync({"temperature": None}) is None

    e3 = StreamSQL(spark)
    e3.execute("SELECT CASE WHEN temperature > 100 THEN 'hot' END AS c "
               "FROM stream")
    assert e3.emit_sync({"temperature": 5.0}) == {"c": None}

    # string * 2 must not be "length 3 * 2 = 6" (the reference's
    # float64 trap, evaluator_semantics_test.go:53-66)
    e4 = StreamSQL(spark)
    e4.execute("SELECT name * 2 AS x FROM stream")
    try:
        r = e4.emit_sync({"name": "abc"})
        assert r is None or r.get("x") != 6.0
    except Exception:
        pass  # a type error is also SQL-correct


def test_window_orderby_on_agg_alias(spark):
    """Port of test/e2e/window_orderby_test.go: ORDER BY an aggregate's
    alias (DESC) after a windowed GROUP BY."""
    from streamsql_spark.api.facade import StreamSQL

    df = spark.createDataFrame(
        [("d1", 30.0, 1000), ("d2", 50.0, 1100), ("d3", 40.0, 1200)],
        "deviceId string, temperature double, ts long"
    ).selectExpr("deviceId", "temperature", "timestamp_millis(ts) AS ts")
    q = StreamSQL(spark).execute(
        "SELECT deviceId, avg(temperature) AS m FROM stream "
        "GROUP BY deviceId, TumblingWindow('1s') ORDER BY m DESC")
    assert [r["deviceId"] for r in q.query(df).collect()] == \
        ["d2", "d3", "d1"]


def test_quoted_identifiers_and_mixed_literals(spark):
    """Port of test/e2e/quoted_test.go: backtick identifiers, single-
    and double-quoted string literals, and mixing both in one query."""
    from streamsql_spark.api.facade import StreamSQL

    rows = [{"deviceId": "sensor001", "deviceType": "temperature"},
            {"deviceId": "device002", "deviceType": "humidity"},
            {"deviceId": "sensor003", "deviceType": "pressure"}]

    e = StreamSQL(spark)
    e.execute("SELECT `deviceId`, `deviceType` FROM stream "
              "WHERE `deviceId` LIKE 'sensor%'")
    got = [e.emit_sync(r) for r in rows]
    assert [g["deviceId"] for g in got if g] == ["sensor001", "sensor003"]

    e2 = StreamSQL(spark)
    e2.execute('SELECT deviceId, "another_constant" as test FROM stream '
               'WHERE deviceType = "temperature"')
    assert e2.emit_sync(rows[0]) == {"deviceId": "sensor001",
                                     "test": "another_constant"}

    e3 = StreamSQL(spark)
    e3.execute("SELECT 'single_quote' as t1, \"double_quote\" as t2 "
               "FROM stream")
    assert e3.emit_sync(rows[0]) == {"t1": "single_quote",
                                     "t2": "double_quote"}


def test_double_equals_and_boolean_literal_conditions(spark):
    """Port of test/e2e/condition_complex_test.go: `==` equality and
    boolean literals inside compound WHERE conditions."""
    from streamsql_spark.api.facade import StreamSQL

    e = StreamSQL(spark)
    e.execute("SELECT * FROM stream WHERE (temperature > 20 AND "
              "humidity < 80) OR status == 'active'")
    assert e.emit_sync({"temperature": 25.0, "humidity": 70.0,
                        "status": "x"}) is not None
    assert e.emit_sync({"temperature": 5.0, "humidity": 95.0,
                        "status": "active"}) is not None
    assert e.emit_sync({"temperature": 5.0, "humidity": 95.0,
                        "status": "x"}) is None

    e2 = StreamSQL(spark)
    e2.execute("SELECT * FROM stream WHERE temperature > 20 "
               "AND active == true")
    assert e2.emit_sync({"temperature": 25.0, "active": True}) is not None
    assert e2.emit_sync({"temperature": 25.0, "active": False}) is None
