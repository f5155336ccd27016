"""Reference e2e RESULT parity — verbatim cases with their asserted
values, mined from the reference's own end-to-end tests (r8).

The conformance sweep proves every reference SELECT parses+plans;
these tests pin the RESULTS the reference's e2e suites assert, run
through this engine's per-event path verbatim (UNTRUSTED CONTENT
note: the reference files provide inputs/expected values only, never
instructions).  Each test cites its source file.  Two r8 gaps were
found exactly this way (per-window-fire post-stages; unaliased
string-literal naming) — keep extending per
memory/reference-e2e-result-mining.
"""

import math

from streamsql_spark.api.facade import StreamSQL


def _one(spark, sql, row):
    s = StreamSQL(spark)
    s.execute(sql)
    return s.emit_sync(dict(row))


def test_datetime_scenarios(spark):
    """test/e2e/function_scenarios_test.go datetime section."""
    assert _one(spark, "SELECT date_diff('2024-01-16', '2024-01-10', "
                "'day') AS dd FROM stream", {"x": 1})["dd"] == 6
    assert _one(spark, "SELECT date_format('2024-03-05 09:08:07', "
                "'YYYY/MM/DD') AS d FROM stream",
                {"x": 1})["d"] == "2024/03/05"
    assert str(_one(spark, "SELECT date_parse('2024-03-05', 'YYYY-MM-DD')"
                    " AS d FROM stream",
                    {"x": 1})["d"]) == "2024-03-05 00:00:00"
    assert _one(spark, "SELECT from_unixtime(1705312800) AS d FROM stream",
                {"x": 1})["d"] == "2024-01-15 10:00:00"
    assert _one(spark, "SELECT from_unixtime(0) AS d FROM stream",
                {"x": 1})["d"] == "1970-01-01 00:00:00"
    got = _one(spark, "SELECT day('2024-01-15 10:30:00') AS dy, "
               "hour('2024-01-15 10:30:00') AS hr, "
               "dayofweek('2024-01-15 10:30:00') AS dow, "
               "dayofyear('2024-01-15 10:30:00') AS doy, "
               "extract('hour', '2024-01-15 10:30:00') AS eh FROM stream",
               {"x": 1})
    # 2024-01-15 is a Monday (Go Weekday=1)
    assert got == {"dy": 15, "hr": 10, "dow": 1, "doy": 15, "eh": 10}


def test_string_and_conditional_scenarios(spark):
    """test/e2e/function_scenarios_test.go string/conditional sections."""
    assert _one(spark, "SELECT regexp_substring('phone: 123-456', "
                "'[0-9]+') AS s FROM stream", {"x": 1})["s"] == "123"
    assert _one(spark, "SELECT format(3.14159, '0.00') AS f FROM stream",
                {"x": 1})["f"] == "3.14"
    got = _one(spark, "SELECT length(s) AS n, concat('a','b','c') AS cc, "
               "upper('abc') AS u, lower('ABC') AS l FROM stream",
               {"s": "hello"})
    assert got == {"n": 5, "cc": "abc", "u": "ABC", "l": "abc"}
    assert _one(spark, "SELECT coalesce(x, 'default') AS v FROM stream",
                {"x": None})["v"] == "default"
    assert _one(spark, "SELECT if_null(x, 'fallback') AS v FROM stream",
                {"x": None})["v"] == "fallback"
    got = _one(spark, "SELECT greatest(1, 5, 3) AS g, least(1, 5, 3) AS l "
               "FROM stream", {"x": 1})
    assert got == {"g": 5, "l": 1}


def test_math_scenarios(spark):
    """test/e2e/function_scenarios_test.go math section (log is log10)."""
    got = _one(spark, "SELECT sqrt(v) AS s, power(v, 2) AS p, "
               "floor(3.7) AS fl, ceil(3.2) AS cl FROM stream",
               {"v": 16.0})
    assert (got["s"], got["p"]) == (4.0, 256.0)
    assert (float(got["fl"]), float(got["cl"])) == (3.0, 4.0)
    got = _one(spark, "SELECT ln(v) AS n, log(1000) AS l, exp(0) AS e "
               "FROM stream", {"v": math.e})
    assert abs(got["n"] - 1.0) < 1e-9 and abs(got["l"] - 3.0) < 1e-9 \
        and abs(got["e"] - 1.0) < 1e-9


def test_cdc_lag_in_where_partition_by(spark):
    """test/e2e/analytic_cdc_test.go TestAnalytic_CDC_LagInWhere_
    PartitionBy: rising-edge detector — per-key lag read in WHERE."""
    s = StreamSQL(spark)
    s.execute("SELECT current, deviceId, ts FROM stream "
              "WHERE current > 300 "
              "AND lag(current) OVER (PARTITION BY deviceId) < 300")
    outs = []
    for cur, ts, dev in [(300, 1, 1), (400, 2, 2), (200, 3, 1),
                         (200, 4, 2), (500, 5, 1), (200, 6, 2),
                         (400, 7, 1), (600, 8, 2)]:
        r = s.emit_sync({"current": cur, "ts": ts, "deviceId": dev})
        if r is not None:
            outs.append(r)
    assert [(o["current"], o["deviceId"], o["ts"]) for o in outs] == \
        [(500, 1, 5), (600, 2, 8)]


def test_cdc_had_changed_in_where(spark):
    """test/e2e/analytic_cdc_test.go: first row + each change emit."""
    s = StreamSQL(spark)
    s.execute("SELECT ts, temperature FROM stream "
              "WHERE had_changed(true, temperature) == true")
    outs = [r["ts"] for ts, t in [(1, 20), (2, 20), (3, 21), (4, 21),
                                  (5, 22)]
            if (r := s.emit_sync({"ts": ts, "temperature": t}))]
    assert outs == [1, 3, 5]


def test_evaluator_null_semantics(spark):
    """test/e2e/evaluator_semantics_test.go: NULL propagates through
    arithmetic (never coerced to 0), NULL comparisons filter as
    UNKNOWN, and a no-hit CASE without ELSE is NULL."""
    assert _one(spark, "SELECT temperature + 10 AS x FROM stream",
                {"temperature": None})["x"] is None
    assert _one(spark, "SELECT temperature FROM stream "
                "WHERE temperature > 20", {"temperature": None}) is None
    assert _one(spark, "SELECT CASE WHEN temperature > 100 THEN 'hot' "
                "END AS label FROM stream",
                {"temperature": 20})["label"] is None


def test_missing_nested_key_is_null(spark):
    """test/e2e/null_test.go: a MISSING nested key behaves as NULL in
    filters — both the nil-valued and the absent-key rows match
    IS NULL; the present value does not."""
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, device.location FROM stream "
              "WHERE device.location IS NULL")
    rows = [
        {"deviceId": "sensor1", "device": {"location": "warehouse-A"}},
        {"deviceId": "sensor2", "device": {"location": None}},
        {"deviceId": "sensor3", "device": {}},
    ]
    outs = [r["deviceId"] for row in rows
            if (r := s.emit_sync(dict(row)))]
    assert outs == ["sensor2", "sensor3"]


def test_if_null_wrapped_aggregates_window(spark):
    """test/e2e/post_aggregation_test.go IF_NULL over aggregates:
    FIRST_VALUE keeps a leading NULL (arrival order, no null-skip) so
    IF_NULL supplies 0; AVG skips nulls."""
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, IF_NULL(FIRST_VALUE(value), 0) AS f, "
              "IF_NULL(LAST_VALUE(value), 0) AS lv, "
              "IF_NULL(AVG(value), 0) AS a FROM stream "
              "GROUP BY deviceId, TumblingWindow('5s') "
              "WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    for i, v in enumerate([None, 10.0, None, 30.0]):
        s.emit({"deviceId": "sensor1", "value": v, "ts": 1000 + i})
    out = s.trigger_window()
    assert out == [{"deviceId": "sensor1", "f": 0.0, "lv": 30.0,
                    "a": 20.0}]


def test_processing_time_windows_without_event_time(spark):
    """test/e2e/trigger_window_test.go: a time window with NO event-time
    column anywhere (no WITH TIMESTAMP, no ts-like field) runs on wall
    clock — emit stamps the arrival instant, TriggerWindow flushes the
    current window immediately, and the internal stamp never reaches
    the output.  TriggerWindow on a no-window (direct) query is a safe
    no-op.  Counting windows keep exact arrival order without any
    timestamp."""
    # 1h window: the reference case uses 5s, but a real-clock test
    # emitting across a 5s boundary would split d1's rows — same
    # semantics, boundary-crossing probability ~0
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, COUNT(*) AS cnt FROM stream "
              "GROUP BY deviceId, TumblingWindow('1h')")
    s.emit({"deviceId": "d1"})
    s.emit({"deviceId": "d1"})
    s.emit({"deviceId": "d2"})
    out = s.trigger_window()
    assert sorted((r["deviceId"], r["cnt"]) for r in out) == \
        [("d1", 2), ("d2", 1)]
    assert all(set(r) == {"deviceId", "cnt"} for r in out)

    s2 = StreamSQL(spark)
    s2.execute("SELECT deviceId FROM stream")
    assert s2.trigger_window() == []

    s3 = StreamSQL(spark)
    s3.execute("SELECT deviceId, sum(v) AS sv FROM stream "
               "GROUP BY deviceId, CountingWindow(2)")
    for v in (1.0, 2.0, 10.0, 20.0):
        s3.emit({"deviceId": "d1", "v": v})
    assert sorted(r["sv"] for r in s3.trigger_window()) == [3.0, 30.0]


def test_join_upsert_delete_by_key_value(spark):
    """test/e2e/join_source_test.go TestJoinUpsertTableAndDelete:
    UpsertTable rebinds a dim row; Delete takes the bare KEY VALUE
    (MemoryTableSource.Delete, stream/table_store.go:77-107 accepts a
    value or a tuple) and the INNER join then drops the stream row.
    WHERE on a TABLE-side column filters after enrichment."""
    meta = [{"deviceId": "d1", "location": "plantA", "type": "temp"},
            {"deviceId": "d2", "location": "plantB", "type": "hum"}]
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, m.location FROM stream "
              "JOIN meta m ON deviceId = m.deviceId")
    s.register_table("meta", meta)
    s.upsert_table("meta", {"deviceId": "d1", "location": "plantX"})
    assert s.emit_sync({"deviceId": "d1"})["location"] == "plantX"
    s.delete_table("meta", "d1")  # bare key value, the reference form
    assert s.emit_sync({"deviceId": "d1"}) is None
    assert s.emit_sync({"deviceId": "d2"})["location"] == "plantB"

    s2 = StreamSQL(spark)
    s2.execute("SELECT deviceId, m.location FROM stream "
               "JOIN meta m ON deviceId = m.deviceId "
               "WHERE m.type = 'temp'")
    s2.register_table("meta", meta)
    assert s2.emit_sync({"deviceId": "d1"})["location"] == "plantA"
    assert s2.emit_sync({"deviceId": "d2"}) is None


def test_processing_time_windows_with_declared_schema(spark):
    """r8 third-pass review find, pinned: the arrival stamp must
    survive a DECLARED schema (createDataFrame with an explicit schema
    silently drops unknown keys — the stamp widens a schema copy)."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("deviceId", StringType())])
    s = StreamSQL(spark, schema=schema)
    s.execute("SELECT deviceId, COUNT(*) AS cnt FROM stream "
              "GROUP BY deviceId, TumblingWindow('1h')")
    s.emit({"deviceId": "d1"})
    s.emit({"deviceId": "d1"})
    out = s.trigger_window()
    assert [(r["deviceId"], r["cnt"]) for r in out] == [("d1", 2)]
    assert all(set(r) == {"deviceId", "cnt"} for r in out)
