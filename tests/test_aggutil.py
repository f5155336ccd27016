"""Property tests: the lateness/global kernels' mergeable partial
accumulators must agree with the buffered py_aggregate evaluation on
every algebraic aggregate, for any value sequence (None/NaN included).
"""

import math

from hypothesis import example, given, settings
from hypothesis import strategies as st

from streamsql_spark.streaming.aggutil import (ALGEBRAIC_AGGS, acc_new,
                                               acc_result, acc_update,
                                               py_aggregate)

values = st.lists(
    st.one_of(st.none(),
              st.floats(min_value=-1e6, max_value=1e6,
                        allow_nan=False, allow_infinity=False),
              st.integers(min_value=-10**6, max_value=10**6)),
    max_size=60)


@settings(max_examples=200, deadline=None)
@given(vals=values, name=st.sampled_from(sorted(ALGEBRAIC_AGGS)))
# pinned r3 counterexample: naive sum-of-squares partials cancelled
# catastrophically on large-magnitude low-variance data
@example(vals=[707721.27, None, 707706.0], name="stddevs")
@example(vals=[707721.27, None, 707706.0], name="stddev")
@example(vals=[1e6, 1e6 - 0.25, 1e6 - 0.5], name="vars")
def test_partials_match_buffered_evaluation(vals, name):
    acc = acc_new()
    for v in vals:
        acc_update(acc, v)
    got = acc_result(name, acc)
    want = py_aggregate(name, vals)
    if want is None or got is None:
        assert got == want, (name, vals)
    elif isinstance(want, float):
        assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-6), \
            (name, got, want)
    else:
        assert got == want, (name, got, want)


# ---------------------------------------------------------------- CEP NFA

def _parse_spec(sql):
    from streamsql_spark.dialect.parser import parse
    return parse(sql).match


@settings(max_examples=150, deadline=None)
@given(vals=st.lists(st.sampled_from("abx"), max_size=40))
def test_cep_adjacent_pair_matches_greedy_scan(vals):
    """PATTERN (A B) + SKIP PAST LAST ROW over any symbol sequence must
    equal a greedy left-to-right scan for adjacent (A,B) pairs — the
    NFA core checked against a 5-line brute-force oracle (no Spark)."""
    from streamsql_spark.cep.engine import run_partition

    spec = _parse_spec("""
        SELECT * FROM stream MATCH_RECOGNIZE (
            MEASURES A.i AS a_i, B.i AS b_i
            ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            DEFINE A AS s = 'a', B AS s = 'b')
    """)
    rows = [{"i": i, "s": s} for i, s in enumerate(vals)]
    got = [(m["a_i"], m["b_i"])
           for m in run_partition(spec, rows, [float(i) for i in range(len(rows))],
                                  None)]
    # brute force: greedy scan, consume both rows on match
    want, i = [], 0
    while i + 1 < len(vals):
        if vals[i] == "a" and vals[i + 1] == "b":
            want.append((i, i + 1))
            i += 2
        else:
            i += 1
    assert got == want, (vals, got, want)


@settings(max_examples=150, deadline=None)
@given(vals=st.lists(st.sampled_from("ax"), max_size=40))
def test_cep_greedy_runs_match_islands(vals):
    """PATTERN (A{2,}) + SKIP PAST LAST ROW ≡ maximal runs of 'a' with
    length ≥ 2 (gaps-and-islands oracle)."""
    from streamsql_spark.cep.engine import run_partition

    spec = _parse_spec("""
        SELECT * FROM stream MATCH_RECOGNIZE (
            MEASURES FIRST(A.i) AS lo, LAST(A.i) AS hi, COUNT(*) AS n
            ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A{2,})
            DEFINE A AS s = 'a')
    """)
    rows = [{"i": i, "s": s} for i, s in enumerate(vals)]
    got = [(m["lo"], m["hi"], m["n"])
           for m in run_partition(spec, rows, [float(i) for i in range(len(rows))],
                                  None)]
    want, run = [], []
    for i, s in enumerate(vals + ["x"]):
        if s == "a":
            run.append(i)
        else:
            if len(run) >= 2:
                want.append((run[0], run[-1], len(run)))
            run = []
    assert got == want, (vals, got, want)


@settings(max_examples=150, deadline=None)
@given(steps=st.lists(st.tuples(st.sampled_from("abx"),
                                st.integers(min_value=0, max_value=5)),
                      max_size=30))
def test_cep_within_bound_matches_scan(steps):
    """PATTERN (A B) WITHIN bound: a match requires the pair's time
    span ≤ bound — greedy scan oracle over random symbol/gap sequences
    (cep/engine.go:690-696 expiry)."""
    from streamsql_spark.cep.engine import run_partition

    spec = _parse_spec("""
        SELECT * FROM stream MATCH_RECOGNIZE (
            MEASURES A.i AS a_i, B.i AS b_i
            ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            DEFINE A AS s = 'a', B AS s = 'b'
            WITHIN '2s')
    """)
    ts, t = [], 0.0
    for _, gap in steps:
        t += gap
        ts.append(t)
    rows = [{"i": i, "s": s} for i, (s, _) in enumerate(steps)]
    # run_partition takes the bound explicitly (the executor parses the
    # spec's WITHIN into seconds and passes it through, cep/executor.py)
    got = [(m["a_i"], m["b_i"])
           for m in run_partition(spec, rows, ts, 2.0)]
    want, i = [], 0
    while i + 1 < len(steps):
        if steps[i][0] == "a" and steps[i + 1][0] == "b" \
                and ts[i + 1] - ts[i] <= 2.0:
            want.append((i, i + 1))
            i += 2
        else:
            i += 1
    assert got == want, (steps, got, want)


# ------------------------------------------------------- front-end fuzz

_cols = st.sampled_from(["deviceId", "temperature", "humidity", "ts", "k"])
_lits = st.sampled_from(["1", "2.5", "'x'", "true", "NULL"])
_scalars = st.sampled_from(["abs", "round", "upper", "lower", "length",
                            "sqrt", "floor", "md5", "trim"])
_aggs = st.sampled_from(["sum", "avg", "min", "max", "count", "median",
                         "first_value", "last_value", "collect"])
_cmp = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])


@st.composite
def _expr(draw, depth=0):
    choice = draw(st.integers(0, 3 if depth < 2 else 1))
    if choice == 0:
        return draw(_cols)
    if choice == 1:
        return draw(_lits)
    if choice == 2:
        return f"{draw(_scalars)}({draw(_expr(depth + 1))})"
    return f"({draw(_expr(depth + 1))} + {draw(_expr(depth + 1))})"


@st.composite
def _query(draw):
    n = draw(st.integers(1, 3))
    fields = ", ".join(f"{draw(_expr())} AS f{i}" for i in range(n))
    sql = f"SELECT {fields} FROM stream"
    if draw(st.booleans()):
        sql += f" WHERE {draw(_expr())} {draw(_cmp)} {draw(_expr())}"
    if draw(st.booleans()):
        gk = draw(_cols)
        sql = (f"SELECT {gk}, {draw(_aggs)}(temperature) AS a0 "
               f"FROM stream GROUP BY {gk}")
        if draw(st.booleans()):
            sql += ", TumblingWindow('5s')"
        if draw(st.booleans()):
            sql += " HAVING a0 > 1"
    if draw(st.booleans()):
        sql += " LIMIT 10"
    return sql


@settings(max_examples=300, deadline=None)
@given(sql=_query())
def test_frontend_never_crashes_untyped(sql):
    """Any grammatical composition of the dialect surface either
    compiles to a QueryPlan or raises a TYPED front-end error
    (ParseError/PlanError/LexError) — never an arbitrary exception."""
    from streamsql_spark.dialect.lexer import LexError
    from streamsql_spark.dialect.parser import ParseError, parse
    from streamsql_spark.dialect.planner import PlanError, plan

    try:
        plan(parse(sql))
    except (ParseError, PlanError, LexError):
        pass


@settings(max_examples=150, deadline=None)
@given(vals=st.lists(st.sampled_from("abcx"), max_size=40))
def test_cep_alternation_matches_scan(vals):
    """PATTERN (A (B | C)) + SKIP PAST LAST ROW: greedy scan oracle over
    disjoint symbol classes, including the branch CLASSIFIER."""
    from streamsql_spark.cep.engine import run_partition

    spec = _parse_spec("""
        SELECT * FROM stream MATCH_RECOGNIZE (
            MEASURES A.i AS a_i, LAST(i) AS b_i, CLASSIFIER() AS cls
            ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A (B | C))
            DEFINE A AS s = 'a', B AS s = 'b', C AS s = 'c')
    """)
    rows = [{"i": i, "s": s} for i, s in enumerate(vals)]
    got = [(m["a_i"], m["b_i"], m["cls"])
           for m in run_partition(spec, rows,
                                  [float(i) for i in range(len(rows))], None)]
    want, i = [], 0
    while i + 1 < len(vals):
        if vals[i] == "a" and vals[i + 1] in "bc":
            want.append((i, i + 1, vals[i + 1].upper()))
            i += 2
        else:
            i += 1
    assert got == want, (vals, got, want)


def test_acc_min_max_mixed_types_match_py_aggregate():
    """acc_update used to silently skip incomparable values on
    TypeError, so the algebraic and buffered paths disagreed on min/max
    over mixed-type columns — both must now fall back to numeric-only
    comparison the same way."""
    from streamsql_spark.streaming.aggutil import (acc_new, acc_result,
                                                   acc_update, py_aggregate)

    mixed = [3, "zebra", 1.5, None, "apple", 7]
    for name in ("min", "max"):
        acc = acc_new()
        for v in mixed:
            acc_update(acc, v)
        assert acc_result(name, acc) == py_aggregate(name, mixed), name
    # uniform types still compare directly (strings lexicographic)
    strs = ["pear", "apple", "fig"]
    for name, want in (("min", "apple"), ("max", "pear")):
        acc = acc_new()
        for v in strs:
            acc_update(acc, v)
        assert acc_result(name, acc) == want == py_aggregate(name, strs)


def test_acc_integer_sum_stays_integer():
    """Catalyst's native sum(BIGINT) is BIGINT; the kernel path must not
    flip the same query's output type to double when ALLOWEDLATENESS
    toggles (ADVICE r2)."""
    from streamsql_spark.streaming.aggutil import (acc_new, acc_result,
                                                   acc_update, py_aggregate)

    acc = acc_new()
    for v in [1, 2, 3]:
        acc_update(acc, v)
    r = acc_result("sum", acc)
    assert r == 6 and isinstance(r, int)
    r2 = py_aggregate("sum", [1, 2, 3])
    assert r2 == 6 and isinstance(r2, int)
    # a float anywhere in the fold makes the sum float on both paths
    acc2 = acc_new()
    for v in [1, 2.5]:
        acc_update(acc2, v)
    assert isinstance(acc_result("sum", acc2), float)
    assert isinstance(py_aggregate("sum", [1, 2.5]), float)


# ------------------------------------- FFD bin-packing core (pack.py)


@settings(max_examples=300, deadline=None)
@given(tokens=st.lists(st.integers(min_value=1, max_value=200),
                       min_size=1, max_size=60),
       budget=st.integers(min_value=50, max_value=150))
def test_ffd_no_bin_overflows_unless_singleton(tokens, budget):
    from streamsql_spark.operators.pack import ffd_assign
    assign, fills = ffd_assign(tokens, list(range(len(tokens))), budget)
    per_bin: dict[int, list[int]] = {}
    for i, b in enumerate(assign):
        per_bin.setdefault(b, []).append(tokens[i])
    for b, items in per_bin.items():
        assert sum(items) == fills[b]
        # a bin over budget is only legal as an oversize singleton
        if sum(items) > budget:
            assert len(items) == 1 and items[0] > budget


@settings(max_examples=300, deadline=None)
@given(tokens=st.lists(st.integers(min_value=1, max_value=100),
                       min_size=1, max_size=60))
def test_ffd_deterministic_under_permutation(tokens):
    from streamsql_spark.operators.pack import ffd_assign
    ids = list(range(len(tokens)))
    a1, f1 = ffd_assign(tokens, ids, 128)
    perm = list(reversed(range(len(tokens))))
    a2, f2 = ffd_assign([tokens[i] for i in perm],
                        [ids[i] for i in perm], 128)
    # same (id -> bin) mapping regardless of input arrival order: the
    # kernel re-sorts by (-tokens, id), so processing order — and with
    # it bin numbering — is a pure function of the item set
    m1 = {ids[i]: a1[i] for i in range(len(ids))}
    m2 = {ids[perm[j]]: a2[j] for j in range(len(ids))}
    assert m1 == m2
    assert f1 == f2


def _exact_opt_bins(tokens, budget):
    """Exact bin-packing optimum by branch-and-bound (small n only).

    Places items largest-first into existing bins or a new bin, pruning
    branches that cannot beat the incumbent; symmetric bins (equal
    remaining capacity) are tried once."""
    items = sorted(tokens, reverse=True)
    n = len(items)
    best = [n]  # n singleton bins is always feasible

    def rec(i, fills):
        if len(fills) >= best[0]:
            return
        if i == n:
            best[0] = len(fills)
            return
        t = items[i]
        tried = set()
        for b, f in enumerate(fills):
            if f + t <= budget and f not in tried:
                tried.add(f)
                fills[b] = f + t
                rec(i + 1, fills)
                fills[b] = f
        if len(fills) + 1 < best[0]:
            fills.append(t)
            rec(i + 1, fills)
            fills.pop()

    rec(0, [])
    return best[0]


@settings(max_examples=200, deadline=None)
@given(tokens=st.lists(st.integers(min_value=1, max_value=60),
                       min_size=1, max_size=50),
       budget=st.integers(min_value=60, max_value=120))
# pinned r3 counterexample: true OPT here IS 7 bins (no two items fit
# together), while the sum lower bound says 4 — the 11/9 guarantee only
# applies to true OPT, never to the lower bound
@example(tokens=[27, 34, 34, 34, 34, 34, 34], budget=60)
def test_ffd_bin_count_within_ffd_bound(tokens, budget):
    # FFD guarantees bins <= (11/9)·OPT + 1 against the TRUE optimum.
    # Check: (a) the no-two-bins-mergeable invariant of any first-fit
    # result, for every input; (b) the 11/9 bound against exact OPT by
    # branch-and-bound, for inputs small enough to solve exactly.
    import math

    from streamsql_spark.operators.pack import ffd_assign
    if any(t > budget for t in tokens):
        return
    _, fills = ffd_assign(tokens, list(range(len(tokens))), budget)
    fvals = sorted(fills.values() if isinstance(fills, dict) else fills)
    # (a) no two bins could be merged: the two emptiest together overflow
    if len(fvals) >= 2:
        assert fvals[0] + fvals[1] > budget, (tokens, budget, fvals)
    # (b) exact-OPT bound on small instances
    if len(tokens) <= 12:
        opt = _exact_opt_bins(tokens, budget)
        assert len(fvals) <= math.ceil(11 / 9 * opt) + 1, \
            (tokens, budget, len(fvals), opt)


@settings(max_examples=200, deadline=None)
@given(vals=values, name=st.sampled_from(sorted(ALGEBRAIC_AGGS)),
       cut=st.integers(min_value=0, max_value=60))
def test_acc_merge_matches_sequential(vals, name, cut):
    """Chan's parallel combine of two partials must agree with the
    single sequential fold at any split point."""
    from streamsql_spark.streaming.aggutil import acc_merge

    cut = min(cut, len(vals))
    a, b, seq = acc_new(), acc_new(), acc_new()
    for v in vals[:cut]:
        acc_update(a, v)
    for v in vals[cut:]:
        acc_update(b, v)
    for v in vals:
        acc_update(seq, v)
    merged = acc_merge(a, b)
    for agg in (name,):
        got, want = acc_result(agg, merged), acc_result(agg, seq)
        if isinstance(want, float) and want is not None and got is not None:
            assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-6), \
                (agg, got, want)
        else:
            assert got == want, (agg, got, want)
