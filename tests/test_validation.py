"""Parse/plan-time validation matrix (sql_check_test.go port):
must-reject and must-accept SQL, locking the validation boundary.
No Spark session needed — pure front-end tests.
"""

import pytest

from streamsql_spark.dialect.lexer import LexError
from streamsql_spark.dialect.parser import ParseError, parse
from streamsql_spark.dialect.planner import PlanError, plan as make_plan


def accept(sql):
    make_plan(parse(sql))


def reject(sql):
    with pytest.raises((ParseError, PlanError, LexError)):
        make_plan(parse(sql))


# --- analytic functions wrapped in scalar functions: accepted
@pytest.mark.parametrize("sql", [
    "SELECT UPPER(changed_col(true, temperature)) AS c FROM stream",
    "SELECT ROUND(lag(temperature), 2) AS c FROM stream",
    "SELECT ABS(acc_sum(v)) AS a FROM stream",
    "SELECT CONCAT('prefix', changed_col(true, temperature)) AS s FROM stream",
    "SELECT coalesce(lag(temp), -1) AS s FROM stream",
    "SELECT CASE WHEN lag(temp) > 20 THEN 'up' ELSE 'down' END AS s FROM stream",
])
def test_analytic_in_scalar_accept(sql):
    accept(sql)


# --- valid analytic placements
@pytest.mark.parametrize("sql", [
    "SELECT changed_col(true, temperature) AS c FROM stream",
    "SELECT lag(temperature) OVER (PARTITION BY deviceId) AS p FROM stream",
    "SELECT lag(temp, 1) OVER () AS p FROM stream",
    "SELECT lag(temp, 1, 0) OVER (PARTITION BY deviceId) AS p FROM stream",
    "SELECT acc_sum(v) OVER (PARTITION BY deviceId) AS s FROM stream",
    "SELECT lag(temp) OVER (PARTITION BY deviceId WHEN temp > 0) AS p FROM stream",
    "SELECT ts - lag(ts) OVER (PARTITION BY k) AS d FROM stream",
    "SELECT lag(a) OVER (PARTITION BY k) AS p, name AS n FROM stream",
    # analytic-name text inside string literals must not be misparsed
    "SELECT CONCAT('see lag(', name) AS s FROM stream",
    "SELECT UPPER('changed_col(x)') AS s FROM stream",
    "SELECT UPPER('it''s lag(x)') AS s FROM stream",
])
def test_analytic_placement_accept(sql):
    accept(sql)


# --- nested analytic / aggregate-over-analytic: rejected (D9)
@pytest.mark.parametrize("sql", [
    "SELECT lag(lag(a)) AS p FROM stream",
    "SELECT had_changed(true, changed_col(true, a)) AS h FROM stream",
    "SELECT changed_col(true, lag(a)) AS c FROM stream",
    "SELECT sum(lag(a)) AS s FROM stream GROUP BY CountingWindow(2)",
    "SELECT max(acc_sum(v)) AS m FROM stream GROUP BY CountingWindow(2)",
])
def test_nested_analytic_reject(sql):
    reject(sql)


# --- nested aggregates: rejected
@pytest.mark.parametrize("sql", [
    "SELECT sum(count(x)) AS s FROM stream GROUP BY CountingWindow(2)",
    "SELECT max(sum(x)) AS m FROM stream GROUP BY CountingWindow(2)",
])
def test_nested_aggregate_reject(sql):
    reject(sql)


# --- analytic over aggregate output (window-output analytic): accepted
@pytest.mark.parametrize("sql", [
    'SELECT lag(avg(temperature)) AS p FROM stream GROUP BY CountingWindow(2)',
    'SELECT acc_sum(avg(temperature)) AS total FROM stream GROUP BY CountingWindow(2)',
    'SELECT had_changed(true, avg(temp)) AS h FROM stream GROUP BY CountingWindow(2)',
])
def test_analytic_over_aggregate_accept(sql):
    accept(sql)


# --- duplicate output columns: rejected (D3)
@pytest.mark.parametrize("sql", [
    "SELECT temperature, lag(temperature) AS temperature FROM stream",
    "SELECT lag(a) AS x, changed_col(true, a) AS x FROM stream",
])
def test_alias_collision_reject(sql):
    reject(sql)


@pytest.mark.parametrize("sql", [
    "SELECT temperature, lag(temperature) AS temp_lag FROM stream",
    "SELECT lag(a) AS la, changed_col(true, a) AS ca FROM stream",
])
def test_alias_distinct_accept(sql):
    accept(sql)


# --- global window without TRIGGER WHEN: rejected (rsql/ast.go:73-79)
def test_global_window_without_trigger_reject():
    reject("SELECT k, sum(v) AS s FROM stream GROUP BY k GLOBAL WINDOW")


# --- window params must be durations / counts
@pytest.mark.parametrize("sql", [
    "SELECT count(*) AS n FROM stream GROUP BY TumblingWindow('xyz')",
    "SELECT count(*) AS n FROM stream GROUP BY CountingWindow('5s')",
])
def test_bad_window_params_reject(sql):
    reject(sql)


# --- typo suggestions: unknown function names fail at plan time
def test_unknown_statement_reject():
    reject("SELCT deviceId FROM stream")


def test_keyword_typo_suggestions():
    """rsql/lexer.go:464-480 misspelling table, covered via edit
    distance instead of enumeration — every listed misspelling must
    yield its suggestion."""
    from streamsql_spark.dialect.parser import _suggest_keyword

    for bad in ("SELECCT", "SELET"):
        with pytest.raises(ParseError, match="did you mean SELECT"):
            parse(f"{bad} x FROM stream")
    # the reference's full misspelling list resolves via edit distance
    for bad, good in [("SELCT", "SELECT"), ("FORM", "FROM"),
                      ("FRON", "FROM"), ("FRMO", "FROM"),
                      ("WHER", "WHERE"), ("WHRE", "WHERE"),
                      ("WEHRE", "WHERE"), ("GROPU", "GROUP"),
                      ("GRUP", "GROUP"), ("GRPUP", "GROUP"),
                      ("ODER", "ORDER"), ("ORDR", "ORDER"),
                      ("OREDR", "ORDER"), ("DSITINCT", "DISTINCT"),
                      ("DISTINC", "DISTINCT"), ("DISTINT", "DISTINCT")]:
        assert _suggest_keyword(bad) == good, bad
    with pytest.raises(ParseError, match="did you mean FROM"):
        parse("SELECT x FRON stream WHERE x > 1 GROUP BY x")


def test_function_typo_suggestions():
    """rsql/function_validator.go behavior: a near-miss of a registered
    function fails at plan time with the suggestion; unknown names far
    from any registered function still pass through to Spark."""
    from streamsql_spark.dialect.planner import PlanError, plan

    with pytest.raises(PlanError, match="did you mean .*'latest'"):
        plan(parse("SELECT latets(v) OVER (PARTITION BY k) FROM stream"))
    with pytest.raises(PlanError, match="did you mean .*'acc_sum'"):
        plan(parse("SELECT acc_sun(v) OVER (PARTITION BY k) FROM stream"))
    # genuine Spark builtins and far-off names pass through
    plan(parse("SELECT log2(v) AS l FROM stream"))
    plan(parse("SELECT some_totally_unknown_fn(v) AS u FROM stream"))


def test_windowed_raw_column_analytic_rejected():
    """The reference (v1.2) rejects analytics over raw columns mixed
    with GROUP BY/windows — analytics are OVER-only on the direct path
    (test/e2e/function_advanced_test.go:762-766).  A raw-column analytic
    in a windowed query must fail typed at plan time, not as a Spark
    analysis error; aggregate-wrapped analytics (lag(avg(x))) stay
    valid (window-emission state)."""
    with pytest.raises(PlanError, match="raw column"):
        make_plan(parse(
            "SELECT device, had_changed(temperature) AS c FROM stream "
            "GROUP BY device, TumblingWindow('1s')"))
    with pytest.raises(PlanError, match="raw column"):
        make_plan(parse(
            "SELECT device, lag(temperature) AS p FROM stream "
            "GROUP BY device, TumblingWindow('1s')"))
    # aggregate-fed analytics over window emissions remain supported
    make_plan(parse(
        "SELECT device, lag(avg(temperature)) AS prev_avg FROM stream "
        "GROUP BY device, TumblingWindow('1s')"))
    # group-key arguments are visible post-aggregation and stay valid
    make_plan(parse(
        "SELECT device, had_changed(true, device) AS c FROM stream "
        "GROUP BY device, TumblingWindow('1s')"))


def test_arrival_order_aggregate_without_event_time_rejected(spark):
    """first_value/last_value (min_by/max_by over __arrival_order__) must
    refuse when no event-time column is in scope: the only fallback would
    be physical partition layout, which is deterministic on one parquet
    scan but arbitrary after any repartition — a silent-wrong-answer
    hazard at scale.  Counting windows don't require event time, so they
    are the path that used to hit the monotonically_increasing_id
    fallback (stream/window counting, group_aggregator.go first/last
    arrival-order semantics)."""
    from streamsql_spark.api.facade import StreamSQL
    from streamsql_spark.engine.batch import ExecError

    # the EMIT path stamps a monotone wall-clock arrival instant (r8
    # processing-time windows, reference trigger_window_test.go), so a
    # counting window without any timestamp now WORKS in arrival order
    s = StreamSQL(spark)
    s.execute("SELECT k, first_value(v) AS fv FROM stream "
              "GROUP BY k, CountingWindow(2)")
    for r in [{"k": "a", "v": 1.0}, {"k": "a", "v": 2.0}]:
        s.emit(r)
    assert [r["fv"] for r in s.trigger_window()] == [1.0]
    # the QUERY path over a raw DataFrame has no emit instant to stamp
    # — the typed refusal still guards the repartition hazard there
    sq = StreamSQL(spark)
    sq.execute("SELECT k, first_value(v) AS fv FROM stream "
               "GROUP BY k, CountingWindow(2)")
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "k string, v double")
    with pytest.raises(ExecError, match="needs an event-time"):
        sq.query(df).collect()
    # a non-counting shape reaches the arrival-order aggregate check
    s1 = StreamSQL(spark)
    s1.execute("SELECT k, first_value(v) AS fv FROM stream GROUP BY k")
    for r in [{"k": "a", "v": 1.0}, {"k": "a", "v": 2.0}]:
        s1.emit(r)
    with pytest.raises(ExecError, match="arrival-order aggregate"):
        s1.trigger_window()
    # with an event-time column declared, the same query is fine
    s2 = StreamSQL(spark)
    s2.execute("SELECT k, first_value(v) AS fv FROM stream "
               "GROUP BY k, CountingWindow(2) WITH (TIMESTAMP='ts')")
    for i, r in enumerate([{"k": "a", "v": 1.0, "ts": 1000},
                           {"k": "a", "v": 2.0, "ts": 2000}]):
        s2.emit(r)
    out = s2.trigger_window()
    assert out == [{"k": "a", "fv": 1.0}]


def test_qualified_refs_stripping_to_same_name_rejected(spark):
    """join_column_naming_test.go:48-87 — two joined columns that strip
    to the same output name cannot coexist in a map-shaped row; the
    plan must fail fast, and AS aliases must resolve it."""
    from streamsql_spark.api.facade import StreamSQL

    for sql in (
        "SELECT a.location, b.location FROM stream "
        "JOIN t1 a ON id = a.id JOIN t2 b ON id = b.id",
        "SELECT a.location, b.location, COUNT(*) AS cnt FROM stream "
        "JOIN t1 a ON id = a.id JOIN t2 b ON id = b.id "
        "GROUP BY a.location, b.location, CountingWindow(2)",
        "SELECT a.location, b.location, COUNT(*) AS cnt FROM stream "
        "JOIN t1 a ON id = a.id JOIN t2 b ON id = b.id "
        "GROUP BY a.location, b.location, "
        "GLOBAL WINDOW TRIGGER WHEN COUNT(*) >= 2",
    ):
        with pytest.raises(Exception, match="ambiguous output column"):
            StreamSQL(spark).execute(sql)

    # aliases let the two columns coexist (the resolved form)
    e = StreamSQL(spark)
    e.execute("SELECT a.location AS loc_a, b.location AS loc_b "
              "FROM stream JOIN t1 a ON id = a.id JOIN t2 b ON id = b.id")
    e.register_table("t1", [{"id": "1", "location": "AAA"}])
    e.register_table("t2", [{"id": "1", "location": "BBB"}])
    assert e.emit_sync({"id": "1"}) == {"loc_a": "AAA", "loc_b": "BBB"}


def test_per_row_window_functions_rejected_at_execute(spark):
    """window_func_support_test.go:74-97 — row_number()/lead() have no
    per-row OVER model; they must fail at execute with an error naming
    the function, never compile and crash the data path."""
    from streamsql_spark.api.facade import StreamSQL

    for fn, sql in [
        ("row_number", "SELECT row_number() AS rn FROM stream "
                       "GROUP BY TumblingWindow('1s')"),
        ("lead", "SELECT lead(temperature) AS ld FROM stream "
                 "GROUP BY TumblingWindow('1s')"),
        ("rank", "SELECT rank() AS r FROM stream"),
    ]:
        with pytest.raises(Exception, match=fn):
            StreamSQL(spark).execute(sql)


def test_per_row_window_rejected_in_where_and_orderby(spark):
    from streamsql_spark.api.facade import StreamSQL

    for fn, sql in [
        ("row_number", "SELECT temperature FROM stream "
                       "WHERE row_number() > 1"),
        ("rank", "SELECT user_id, count(*) AS c FROM stream "
                 "GROUP BY user_id, TumblingWindow('1s') ORDER BY rank()"),
    ]:
        with pytest.raises(Exception, match=fn):
            StreamSQL(spark).execute(sql)


def test_map_key_ref_collision_rejected(spark):
    """A map-key ref outputs its key name — `props['k'], k` collide."""
    from streamsql_spark.api.facade import StreamSQL

    with pytest.raises(Exception, match="ambiguous output column"):
        StreamSQL(spark).execute("SELECT props['k'], k FROM stream")
