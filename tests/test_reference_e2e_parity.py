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


def test_processing_time_windows_with_ddl_string_schema(spark):
    """The DDL-string schema form ("a INT, b STRING") is the second
    documented way to declare a schema — it must behave like the
    StructType form: normalize to StructType up front so the arrival
    stamp widening (and the validation gate) see .fields, instead of
    createDataFrame silently dropping the stamp and the
    processing-time window failing with 'requires an event-time
    column'."""
    s = StreamSQL(spark, schema="deviceId STRING")
    s.execute("SELECT deviceId, COUNT(*) AS cnt FROM stream "
              "GROUP BY deviceId, TumblingWindow('1h')")
    s.emit({"deviceId": "d1"})
    s.emit({"deviceId": "d1"})
    out = s.trigger_window()
    assert [(r["deviceId"], r["cnt"]) for r in out] == [("d1", 2)]
    assert all(set(r) == {"deviceId", "cnt"} for r in out)


# ------------------------------------------------------------------
# window_sliding_test.go / window_session_test.go mining (r9) — the
# two largest reference e2e files.  Their wall-clock orchestration is
# not portable, but each pins deterministic event-time semantics:
# slot alignment, window sizing, retention/fan-out, session extent.
# ------------------------------------------------------------------

from datetime import datetime

_EPOCH = datetime(1970, 1, 1)


def _ms(dt) -> int:
    # session timezone is UTC in the test harness; naive datetimes
    # are UTC wall time
    return round((dt - _EPOCH).total_seconds() * 1000)


def test_sliding_window_alignment_size_and_retention(spark):
    """window_sliding_test.go TestSQLSlidingWindow_EventTimeWindowAlignment
    (:1387): every fired slot start is epoch-aligned to the SLIDE
    (startMs % 500 == 0), every slot spans exactly the window SIZE
    (end-start == 2000ms), and consecutive slots differ by exactly the
    slide.  TestSQLSlidingWindow_DataRetention (:666) / _DataOverlap
    (:529): a datum is retained in EVERY overlapping slot (size/slide
    = 4 of them), never cleaned early."""
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, count(*) AS cnt, window_start() AS ws, "
              "window_end() AS we FROM stream "
              "GROUP BY deviceId, SlidingWindow('2s', '500ms') "
              "WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    events = [1000 + i * 200 for i in range(10)]  # 1000..2800
    for ts in events:
        s.emit({"deviceId": "sensor001", "ts": ts})
    out = s.trigger_window()
    rows = sorted(((_ms(r["ws"]), _ms(r["we"]), r["cnt"]) for r in out))
    # expected: python-side slot assignment, start aligned to 500ms
    exp = {}
    for t in events:
        first = (t // 500) * 500 - 1500  # earliest aligned start covering t
        for st in range(first, t + 1, 500):
            exp[st] = exp.get(st, 0) + 1
    assert rows == sorted((st, st + 2000, c) for st, c in exp.items())
    for st, en, _ in rows:
        assert st % 500 == 0          # epoch-aligned to the slide
        assert en - st == 2000        # exact window size
    starts = [st for st, _, _ in rows]
    assert all(b - a == 500 for a, b in zip(starts, starts[1:]))
    # retention: each of the 10 events appears in exactly 4 slots
    assert sum(c for _, _, c in rows) == 40


def test_sliding_window_multikey_grouped(spark):
    """window_sliding_test.go TestSQLSlidingWindow_MultiKeyGrouped
    (:314): per-device slots aggregate independently under the same
    slide alignment."""
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, count(*) AS cnt, "
              "round(avg(temperature), 4) AS avg_temp FROM stream "
              "GROUP BY deviceId, SlidingWindow('1s', '500ms') "
              "WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    for dev, temp, ts in [("a", 10.0, 1000), ("a", 20.0, 1400),
                          ("b", 5.0, 1200)]:
        s.emit({"deviceId": dev, "temperature": temp, "ts": ts})
    out = s.trigger_window()
    got = sorted((r["deviceId"], r["cnt"], r["avg_temp"]) for r in out)
    # slots (1s size, 500ms slide): a@1000 and a@1400 both fall in
    # [500,1500) and [1000,2000); b@1200 likewise — per-device slots
    # aggregate independently
    assert got == [("a", 2, 15.0), ("a", 2, 15.0),
                   ("b", 1, 5.0), ("b", 1, 5.0)]


def test_session_window_extent_is_first_to_last_plus_gap(spark):
    """window_session_test.go TestSQLSessionWindow_EventTimeWindowAlignment
    (:323): a session's START is the first event's actual timestamp
    (no alignment), its END is the LAST event's timestamp + gap, so
    duration >= gap always; an event-time gap > timeout splits
    sessions."""
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, count(*) AS cnt, window_start() AS ws, "
              "window_end() AS we FROM stream "
              "GROUP BY deviceId, SessionWindow('500ms') "
              "WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    base = 7_300  # deliberately NOT aligned to anything
    for off in (0, 100, 200, 300, 400):     # one session
        s.emit({"deviceId": "sensor001", "ts": base + off})
    for off in (2000, 2100):                # gap 1600ms > 500ms: new one
        s.emit({"deviceId": "sensor001", "ts": base + off})
    out = s.trigger_window()
    rows = sorted((_ms(r["ws"]), _ms(r["we"]), r["cnt"]) for r in out)
    assert rows == [(base, base + 400 + 500, 5),
                    (base + 2000, base + 2100 + 500, 2)]
    for st, en, _ in rows:
        assert en - st >= 500  # duration >= session timeout


def test_session_window_composite_key_sessions(spark):
    """window_session_test.go TestSQLSessionWindow_MultiKeyGroupedSession
    (:119): sessions are tracked per COMPOSITE group key — the same
    deviceId in two locations holds two independent sessions, and
    each expires as its own fire."""
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, location, count(*) AS cnt FROM stream "
              "GROUP BY deviceId, location, SessionWindow('500ms') "
              "WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    rows = [("d1", "room1", 1000), ("d1", "room1", 1200),
            ("d1", "room2", 1100),
            ("d2", "room1", 1050), ("d2", "room1", 2500)]
    for dev, loc, ts in rows:
        s.emit({"deviceId": dev, "location": loc, "ts": ts})
    out = s.trigger_window()
    got = sorted((r["deviceId"], r["location"], r["cnt"]) for r in out)
    assert got == [("d1", "room1", 2), ("d1", "room2", 1),
                   ("d2", "room1", 1), ("d2", "room1", 1)]


# ------------------------------------------------------------------
# schema_test.go / select_test.go / sink_test.go mining (r9)
# ------------------------------------------------------------------


def test_schema_validation_optin_async_drop(spark):
    """test/e2e/schema_test.go TestSchemaValidation_OptIn: with a
    declared schema, Emit drops invalid rows BEFORE the stream (wrong
    type, missing required field) and counts them in SchemaDropped;
    the valid row flows through."""
    from pyspark.sql.types import (DoubleType, StringType, StructField,
                                   StructType)

    schema = StructType([StructField("deviceId", StringType()),
                         StructField("temperature", DoubleType())])
    s = StreamSQL(spark, schema=schema)
    s.execute("SELECT deviceId, temperature FROM stream "
              "WHERE temperature > 0")
    got = []
    s.add_sink(lambda rows: got.extend(rows))
    s.emit({"deviceId": "d1", "temperature": 25.0})    # valid
    s.emit({"deviceId": "d2", "temperature": "hot"})   # wrong type
    s.emit({"temperature": 30.0})                      # missing required
    s.trigger_window()
    assert [r["deviceId"] for r in got] == ["d1"]
    assert s.schema_dropped() == 2


def test_schema_validation_sync_error_counts_and_zero_overhead(spark):
    """test/e2e/schema_test.go TestSchemaValidation_EmitSync +
    _ZeroOverheadWhenNotSet: the sync path ERRORS on an invalid row
    (and still counts it in SchemaDropped, streamsql.go:275-280);
    without a schema nothing validates and SchemaDropped stays 0."""
    import pytest
    from pyspark.sql.types import LongType, StructField, StructType

    s = StreamSQL(spark, schema=StructType([StructField("v", LongType())]))
    s.execute("SELECT v FROM stream")
    assert s.emit_sync({"v": 5}) == {"v": 5}
    with pytest.raises(ValueError, match="schema validation failed"):
        s.emit_sync({"v": "x"})
    assert s.schema_dropped() == 1

    s2 = StreamSQL(spark)
    s2.execute("SELECT v FROM stream")
    assert s2.emit_sync({"v": 5}) is not None
    assert s2.schema_dropped() == 0


def test_schema_strict_rejects_unknown_fields(spark):
    """schema/schema.go:123-124,221-226 Strict mode: unknown keys in
    the input are a validation error; the default (non-strict) lets
    them ride through."""
    import pytest
    from pyspark.sql.types import LongType, StructField, StructType

    sch = StructType([StructField("v", LongType())])
    strict = StreamSQL(spark, schema=sch, strict_schema=True)
    strict.execute("SELECT v FROM stream")
    assert strict.emit_sync({"v": 1}) == {"v": 1}
    with pytest.raises(ValueError, match="unknown field"):
        strict.emit_sync({"v": 1, "x": 2})
    assert strict.schema_dropped() == 1

    loose = StreamSQL(spark, schema=sch)
    loose.execute("SELECT v FROM stream")
    assert loose.emit_sync({"v": 1, "x": 2}) == {"v": 1}


def test_select_star_all_fields_and_with_where(spark):
    """test/e2e/select_test.go TestSelectAllAsterisk +
    TestSelectAllWithWhere: SELECT * returns ALL input fields
    unchanged; with WHERE it filters first, then outputs every
    field."""
    s = StreamSQL(spark)
    s.execute("SELECT * FROM stream")
    row = {"deviceId": "d1", "temperature": 35.5, "humidity": 60}
    assert s.emit_sync(dict(row)) == row

    s2 = StreamSQL(spark)
    s2.execute("SELECT * FROM stream WHERE temperature > 30")
    keep = {"deviceId": "d1", "temperature": 35, "humidity": 60}
    assert s2.emit_sync(dict(keep)) == keep
    assert s2.emit_sync({"deviceId": "d2", "temperature": 20}) is None


def test_emit_sync_also_delivers_to_sinks(spark):
    """test/e2e/sink_test.go TestEmitSyncWithAddSink: EmitSync on a
    non-aggregation query BOTH returns the row synchronously AND
    triggers each AddSink callback once per passing row; filtered
    rows trigger nothing."""
    s = StreamSQL(spark)
    s.execute("SELECT `temperature`, humidity, "
              "`temperature` * 1.8 + 32 AS temp_fahrenheit, "
              "'normal' AS status, 'sensor_data' AS data_type "
              "FROM stream WHERE temperature > 20")
    calls = []
    s.add_sink(lambda rows: calls.append(list(rows)))
    sync_results = []
    for data in [{"temperature": 25.0, "humidity": 60.0},
                 {"temperature": 15.0, "humidity": 70.0},
                 {"temperature": 30.0, "humidity": 80.0}]:
        r = s.emit_sync(data)
        if r is not None:
            sync_results.append(r)
    assert len(sync_results) == 2
    assert len(calls) == 2
    assert [c[0] for c in calls] == sync_results
    assert sync_results[0]["temp_fahrenheit"] == 25.0 * 1.8 + 32
    assert sync_results[0]["status"] == "normal"
    assert sync_results[0]["data_type"] == "sensor_data"


def test_direct_path_filter_unchanged(spark):
    """test/e2e/condition_direct_filter_test.go: direct-path WHERE —
    sync match projects / non-match returns None; async delivers only
    matching rows to sinks; no WHERE passes everything; compound
    AND/OR with parentheses honors precedence."""
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, temperature FROM stream "
              "WHERE temperature > 30")
    assert s.emit_sync({"deviceId": "d1", "temperature": 35}) == \
        {"deviceId": "d1", "temperature": 35}
    assert s.emit_sync({"deviceId": "d2", "temperature": 20}) is None

    s2 = StreamSQL(spark)
    s2.execute("SELECT deviceId FROM stream WHERE temperature > 30")
    ids = []
    s2.add_sink(lambda rows: ids.extend(r["deviceId"] for r in rows))
    s2.emit({"deviceId": "d1", "temperature": 35})
    s2.emit({"deviceId": "d2", "temperature": 20})
    s2.emit({"deviceId": "d3", "temperature": 40})
    s2.trigger_window()
    assert sorted(ids) == ["d1", "d3"]

    s3 = StreamSQL(spark)
    s3.execute("SELECT deviceId FROM stream")
    for dev in ("a", "b", "c"):
        assert s3.emit_sync({"deviceId": dev}) == {"deviceId": dev}

    s4 = StreamSQL(spark)
    s4.execute("SELECT deviceId FROM stream WHERE "
               "(temperature > 30 AND humidity < 80) OR deviceId = 'd9'")
    assert s4.emit_sync({"deviceId": "d1", "temperature": 35,
                         "humidity": 60}) is not None
    assert s4.emit_sync({"deviceId": "d9", "temperature": 10,
                         "humidity": 99}) is not None
    assert s4.emit_sync({"deviceId": "d2", "temperature": 20,
                         "humidity": 90}) is None


def test_counting_window_per_chunk_fires(spark):
    """test/e2e/window_counting_test.go: each full chunk is its own
    1-row fire (GroupByDevice: 30 rows / CountingWindow(10) = 3 fires
    of cnt=10); interleaved devices keep independent chunk sequences
    (GroupedCounting_MixedDevices: A and B each fire once at 10)."""
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, COUNT(*) AS cnt FROM stream "
              "GROUP BY deviceId, CountingWindow(10)")
    fires = []
    s.add_sink(lambda rows: fires.append(list(rows)))
    for i in range(30):
        s.emit({"deviceId": "sensor001", "temperature": i})
    s.trigger_window()
    flat = [r for b in fires for r in b]
    assert [(r["deviceId"], r["cnt"]) for r in flat] == \
        [("sensor001", 10)] * 3

    s2 = StreamSQL(spark)
    s2.execute("SELECT deviceId, AVG(temperature) AS avg_temp "
               "FROM stream GROUP BY deviceId, CountingWindow(10)")
    for i in range(10):
        s2.emit({"deviceId": "A", "temperature": float(i)})
        s2.emit({"deviceId": "B", "temperature": float(i)})
    out = s2.trigger_window()
    assert sorted((r["deviceId"], r["avg_temp"]) for r in out) == \
        [("A", 4.5), ("B", 4.5)]


def test_global_window_trigger_semantics(spark):
    """test/e2e/global_window_test.go: COUNT-driven trigger fires and
    PURGES (6 rows / >=3 = two fires of cnt=3); a field-driven
    MAX(temp) > 50 predicate fires the instant the running max crosses
    (max=55 over the accumulated 3 rows); no GROUP BY aggregates the
    whole stream as one implicit group; groups fire independently."""
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, COUNT(*) AS cnt FROM stream "
              "GROUP BY deviceId, GLOBAL WINDOW TRIGGER WHEN COUNT(*) >= 3")
    for i in range(6):
        s.emit({"deviceId": "sensorA", "value": i})
    out = s.trigger_window()
    assert [(r["deviceId"], r["cnt"]) for r in out] == \
        [("sensorA", 3), ("sensorA", 3)]

    s2 = StreamSQL(spark)
    s2.execute("SELECT deviceId, MAX(temp) AS max_temp FROM stream "
               "GROUP BY deviceId, GLOBAL WINDOW TRIGGER WHEN MAX(temp) > 50")
    for temp in (40, 45, 55):
        s2.emit({"deviceId": "dev1", "temp": temp})
    out = s2.trigger_window()
    assert [(r["deviceId"], r["max_temp"]) for r in out] == [("dev1", 55)]

    s3 = StreamSQL(spark)
    s3.execute("SELECT COUNT(*) AS total FROM stream "
               "GLOBAL WINDOW TRIGGER WHEN COUNT(*) >= 4")
    for i in range(4):
        s3.emit({"v": i})
    assert [r["total"] for r in s3.trigger_window()] == [4]

    s4 = StreamSQL(spark)
    s4.execute("SELECT deviceId, COUNT(*) AS cnt FROM stream "
               "GROUP BY deviceId, GLOBAL WINDOW TRIGGER WHEN COUNT(*) >= 2")
    for dev in ("a", "b", "a", "a", "b"):  # a fires at rows 1,3; b at 5
        s4.emit({"deviceId": dev, "value": 1})
    out = s4.trigger_window()
    assert sorted((r["deviceId"], r["cnt"]) for r in out) == \
        [("a", 2), ("b", 2)]


class _PanicLookupSource:
    """Port of j2_panic_recover_test.go panicLookupSource: raises on a
    poisoned key, answers one good key, misses the rest."""

    def __init__(self, name, boom_key, good):
        self._name, self._boom, self._good = name, boom_key, good

    def name(self):
        return self._name

    def init(self):
        self.inited = True

    def close(self):
        self.closed = True

    def lookup(self, key):
        k = key[0] if isinstance(key, list) else key
        if k == self._boom:
            raise RuntimeError("boom: simulated user Lookup panic")
        if k == "ok":
            return self._good, True
        return None, False


def test_register_table_source_lookup_join_and_panic_recovery(spark):
    """test/e2e/j2_panic_recover_test.go TestJ2_PanicInLookupRecovered
    + streamsql.go:517-525 RegisterTableSource: a custom lookup-backed
    table source joins by probing the stream side's keys; a Lookup
    that RAISES is recovered (the poisoned row resolves as not-found
    and is dropped by the INNER join) and later rows still flow;
    stop() invokes the source's close()."""
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, m.location FROM stream "
              "JOIN meta m ON deviceId = m.deviceId")
    src = _PanicLookupSource("meta", "boom", {"location": "plantA"})
    s.register_table_source(src)
    assert src.inited

    got = []
    s.add_sink(lambda rows: got.extend(rows))
    s.emit({"deviceId": "boom"})
    s.emit({"deviceId": "ok"})
    s.trigger_window()
    assert [(r["deviceId"], r["location"]) for r in got] == \
        [("ok", "plantA")]
    # sync path too: panic key drops, good key enriches, miss drops
    assert s.emit_sync({"deviceId": "boom"}) is None
    assert s.emit_sync({"deviceId": "ok"}) == \
        {"deviceId": "ok", "location": "plantA"}
    assert s.emit_sync({"deviceId": "nope"}) is None
    s.stop()
    assert src.closed


def test_register_table_source_requires_execute_and_blocks_streaming(spark):
    """RegisterTableSource must be called after Execute
    (streamsql.go:520-523); the streaming path refuses lookup sources
    with a typed error (snapshot tables broadcast, lookups don't)."""
    import pytest

    s = StreamSQL(spark)
    with pytest.raises(RuntimeError, match="execute"):
        s.register_table_source(
            _PanicLookupSource("meta", "x", {"a": 1}))


def test_window_aggregate_combos(spark):
    """test/e2e/window_aggregate_combo_test.go, all four verbatim:
    HAVING referencing an aggregate NOT in the SELECT list; post-agg
    arithmetic over two aggregates; five aggregates in one window; and
    SQL NULL semantics in aggregates (count(*) counts rows,
    count(v)/avg/sum ignore NULL)."""
    base = 10_000

    s = StreamSQL(spark)
    s.execute("SELECT count(*) AS c FROM stream "
              "GROUP BY TumblingWindow('1s') "
              "WITH (TIMESTAMP='ts', TIMEUNIT='ms') HAVING max(v) > 50")
    for v in (10.0, 60.0):
        s.emit({"ts": base, "v": v})
    assert [r["c"] for r in s.trigger_window()] == [2]

    s2 = StreamSQL(spark)
    s2.execute("SELECT max(v) - min(v) AS rng, sum(v) AS s FROM stream "
               "GROUP BY TumblingWindow('1s') "
               "WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    for v in (10.0, 40.0, 25.0):
        s2.emit({"ts": base, "v": v})
    assert [(r["rng"], r["s"]) for r in s2.trigger_window()] == \
        [(30.0, 75.0)]

    s3 = StreamSQL(spark)
    s3.execute("SELECT count(*) AS c, sum(v) AS s, avg(v) AS a, "
               "min(v) AS mn, max(v) AS mx FROM stream "
               "GROUP BY TumblingWindow('1s') "
               "WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    for v in (10.0, 20.0, 30.0):
        s3.emit({"ts": base, "v": v})
    out = s3.trigger_window()
    assert [(r["c"], r["s"], r["a"], r["mn"], r["mx"])
            for r in out] == [(3, 60.0, 20.0, 10.0, 30.0)]

    s4 = StreamSQL(spark)
    s4.execute("SELECT count(*) AS c, count(v) AS cv, avg(v) AS a, "
               "sum(v) AS s FROM stream GROUP BY TumblingWindow('1s') "
               "WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    for v in (10.0, None, 30.0):
        s4.emit({"ts": base, "v": v})
    out = s4.trigger_window()
    assert [(r["c"], r["cv"], r["a"], r["s"]) for r in out] == \
        [(3, 2, 20.0, 40.0)]


def test_join_analytic_lag_by_table_column(spark):
    """test/e2e/analytic_combo_test.go TestScenario_JoinAnalytic_
    LagByLocation, verbatim: lag partitioned by a JOINED table's
    column — the per-event sync path enriches first, then the lag
    state keys on m.location (plantA and plantB interleave)."""
    s = StreamSQL(spark)
    s.execute("SELECT deviceId, m.location AS loc, "
              "lag(temp) OVER (PARTITION BY m.location) AS prev "
              "FROM stream JOIN meta m ON deviceId = m.deviceId")
    s.register_table("meta", [
        {"deviceId": "d1", "location": "plantA"},
        {"deviceId": "d2", "location": "plantB"},
        {"deviceId": "d3", "location": "plantA"},
    ])
    events = [("d1", 10.0), ("d2", 20.0), ("d3", 30.0),
              ("d1", 40.0), ("d2", 50.0)]
    got = [s.emit_sync({"deviceId": d, "temp": t}) for d, t in events]
    assert [(r["loc"], r["prev"]) for r in got] == [
        ("plantA", None), ("plantB", None), ("plantA", 10.0),
        ("plantA", 30.0), ("plantB", 20.0)]


def test_acc_functions_skip_non_numeric_values(spark):
    """test/e2e/analytic_combo_test.go TestCombo_D5_AccAvgEmptyNil +
    functions/analytic_state.go:80-92 toFloat64Generic: acc_sum/avg/
    max/min accumulate NUMERIC-typed values only — a string value is
    skipped (never crashes the step, never converts), so an acc_avg
    that has seen only non-numeric input returns nil; acc_count counts
    any non-nil value, strings included."""
    s = StreamSQL(spark)
    s.execute("SELECT acc_avg(s) AS a, acc_sum(s) AS t, "
              "acc_count(s) AS c FROM stream")
    r1 = s.emit_sync({"s": "not-a-number"})
    assert (r1["a"], r1["t"], r1["c"]) == (None, None, 1)
    r2 = s.emit_sync({"s": 10.0})
    assert (r2["a"], r2["t"], r2["c"]) == (10.0, 10.0, 2)
    r3 = s.emit_sync({"s": "12.5"})  # numeric STRING still skips
    assert (r3["a"], r3["t"], r3["c"]) == (10.0, 10.0, 3)
    r4 = s.emit_sync({"s": None})    # nil: not even counted
    assert (r4["a"], r4["t"], r4["c"]) == (10.0, 10.0, 3)

    # batch path agreement: a uniformly STRING column (Spark types are
    # per-column) never accumulates — whole-column NULL, same as the
    # kernels' per-value skip; acc_count still counts non-nil strings
    s2 = StreamSQL(spark)
    s2.execute("SELECT acc_sum(s) AS t, acc_count(s) AS c FROM stream "
               "WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    df = spark.createDataFrame([("x", 1000), ("12.5", 2000)],
                               "s string, ts long")
    got = [r.asDict() for r in s2.query(df).collect()]
    assert [(r["t"], r["c"]) for r in got] == [(None, 1), (None, 2)]


def test_where_vs_analytic_ordering(spark):
    """test/e2e/analytic_combo_test.go TestScenario_WhereVsAnalytic_
    Ordering, verbatim (stream.go:659-671 applyWhereAndAnalytic):
    standard SQL — WHERE filters FIRST and the analytic state sees
    only surviving rows (temp 10,20,15,30 with temp>12 keeps 20,15,30;
    lag over the FILTERED stream → d = [nil,-5,15]); CDC mode (WHERE
    referencing the analytic) keeps analytics-first, state advancing
    even on rejected rows."""
    s = StreamSQL(spark)
    s.execute("SELECT temp, temp - lag(temp) AS d FROM stream "
              "WHERE temp > 12")
    got = [s.emit_sync({"temp": float(t)}) for t in (10, 20, 15, 30)]
    got = [r for r in got if r is not None]
    assert [(r["temp"], r["d"]) for r in got] == \
        [(20.0, None), (15.0, -5.0), (30.0, 15.0)]

    # CDC contrast (analytic_cdc_test.go): lag read IN the WHERE —
    # state advances on every row, including rejected ones
    s2 = StreamSQL(spark)
    s2.execute("SELECT temp FROM stream "
               "WHERE temp > 12 AND lag(temp) < 18")
    got2 = [s2.emit_sync({"temp": float(t)}) for t in (10, 20, 15, 30)]
    # lag state over ALL rows: [nil,10,20,15]; keep temp>12 & lag<18
    assert [r["temp"] for r in got2 if r] == [20.0, 30.0]

    # the BATCH executor path must order identically (independent
    # implementation of the same fork)
    from streamsql_spark.session import get_spark  # session exists
    sb = StreamSQL(spark)
    sb.execute("SELECT temp, temp - lag(temp) AS d FROM stream "
               "WHERE temp > 12 WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    df = spark.createDataFrame(
        [(float(t), 1000 * (i + 1)) for i, t in enumerate((10, 20, 15, 30))],
        "temp double, ts long")
    got3 = sorted((r["temp"], r["d"]) for r in
                  (x.asDict() for x in sb.query(df).collect()))
    assert got3 == [(15.0, -5.0), (20.0, None), (30.0, 15.0)]

    # ... and the STREAMING kernel path
    from streamsql_spark.streaming.harness import run_streaming_collect
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType
    schema = StructType([StructField("temp", DoubleType()),
                         StructField("ts", LongType())])
    rows = [{"temp": float(t), "ts": 1000 * (i + 1)}
            for i, t in enumerate((10, 20, 15, 30))]
    ss = StreamSQL(spark)
    ss.execute("SELECT temp, temp - lag(temp) AS d FROM stream "
               "WHERE temp > 12 WITH (TIMESTAMP='ts', TIMEUNIT='ms')")
    got4 = sorted((r["temp"], r["d"]) for r in
                  run_streaming_collect(spark, ss, [rows[:2], rows[2:]],
                                        schema))
    assert got4 == got3


def test_analytic_combo_scalar_wrapping_and_multi_over(spark):
    """test/e2e/analytic_combo_test.go scalar-wrapping + multi-OVER
    cases, verbatim: CASE over lag(); coalesce(lag(), -1) fills the
    first row's nil (the wrapper must not short-circuit on nil);
    running acc_max - acc_min arithmetic; two lag() calls with
    DIFFERENT PARTITION BY keys keep independent state."""
    s = StreamSQL(spark)
    s.execute("SELECT CASE WHEN lag(temp) > 20 THEN 'up' ELSE 'down' "
              "END AS trend FROM stream")
    got = [s.emit_sync({"temp": t}) for t in (10, 25, 15, 30)]
    assert [r["trend"] for r in got] == ["down", "down", "up", "down"]

    s2 = StreamSQL(spark)
    s2.execute("SELECT coalesce(lag(temp), -1) AS p FROM stream")
    assert [s2.emit_sync({"temp": t})["p"] for t in (10, 20, 30)] == \
        [-1, 10, 20]

    s3 = StreamSQL(spark)
    s3.execute("SELECT acc_max(t) - acc_min(t) AS rng FROM stream")
    assert [s3.emit_sync({"t": float(t)})["rng"]
            for t in (10, 25, 5, 30)] == [0.0, 15.0, 20.0, 25.0]

    s4 = StreamSQL(spark)
    s4.execute("SELECT lag(v) OVER (PARTITION BY a) AS pa, "
               "lag(v) OVER (PARTITION BY b) AS pb FROM stream")
    rows = [{"a": 1, "b": 9, "v": 1.0}, {"a": 1, "b": 8, "v": 2.0},
            {"a": 2, "b": 9, "v": 3.0}, {"a": 2, "b": 8, "v": 4.0}]
    got = [s4.emit_sync(dict(r)) for r in rows]
    assert [(r["pa"], r["pb"]) for r in got] == \
        [(None, None), (1.0, None), (None, 1.0), (3.0, 2.0)]


def test_group_by_function_expression_counting(spark):
    """test/e2e/analytic_combo_test.go TestScenario_GroupBy_
    FunctionExpression + _HourExpression, verbatim: a counting window
    keyed by a FUNCTION expression — upper(device) merges case
    variants into one chunk sequence; hour(timestamp) groups by the
    numeric hour and keeps the key's type in the output."""
    s = StreamSQL(spark)
    s.execute("SELECT upper(device) AS d, count(*) AS c FROM stream "
              "GROUP BY upper(device), CountingWindow(2)")
    for dev in ("aa", "AA", "bb", "BB"):
        s.emit({"device": dev})
    assert sorted((r["d"], r["c"]) for r in s.trigger_window()) == \
        [("AA", 2), ("BB", 2)]

    s2 = StreamSQL(spark)
    s2.execute("SELECT hour(timestamp) AS h, count(*) AS c FROM stream "
               "GROUP BY hour(timestamp), CountingWindow(2)")
    for t in ("2026-07-12 10:00:00", "2026-07-12 10:30:00",
              "2026-07-12 11:00:00", "2026-07-12 11:30:00"):
        s2.emit({"timestamp": t})
    assert sorted((r["h"], r["c"]) for r in s2.trigger_window()) == \
        [(10, 2), (11, 2)]
