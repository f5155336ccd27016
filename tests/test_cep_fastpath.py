"""Property tests: the vectorized CEP fast paths must agree with the
generic backtracking matcher on every input.

``Matcher._find_all_fast`` resolves single-symbol greedy quantifiers and
fixed symbol sequences in closed form (engine.py); these tests replay
random classification sequences through both drives and require
identical match sets — the SQL:2016 leftmost-greedy / SKIP PAST LAST ROW
semantics (cep/engine.go:492-625) are the shared contract.

No SparkSession needed: the matcher is a pure-Python kernel.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from streamsql_spark.cep.engine import Matcher
from streamsql_spark.dialect import nodes as N


def _spec(pattern: N.Pattern) -> N.MatchSpec:
    spec = N.MatchSpec()
    spec.pattern = pattern
    spec.defines = {}  # classification comes entirely from pre_cls
    spec.after_match_skip = ("past_last_row",)
    return spec


def _find_both(pattern, pre_cls, n):
    rows = [{"i": i} for i in range(n)]
    fast = Matcher(_spec(pattern), rows, None, None, pre_cls=pre_cls)
    got_fast = fast._find_all_fast(100000)
    assert got_fast is not None, "fast path unexpectedly not applicable"
    generic = Matcher(_spec(pattern), rows, None, None, pre_cls=pre_cls)
    got_generic = []
    start = 0
    while start < n:
        m = generic.first_match(start)
        if m is None:
            start += 1
            continue
        _, bindings = m
        got_generic.append(bindings)
        start = generic._skip_to(bindings)
    return got_fast, got_generic


@given(cls=st.lists(st.booleans(), min_size=0, max_size=60),
       qmin=st.integers(min_value=1, max_value=4),
       extra=st.integers(min_value=0, max_value=3),
       bounded=st.booleans())
@settings(max_examples=300, deadline=None)
def test_greedy_quantifier_runs_match_generic(cls, qmin, extra, bounded):
    qmax = qmin + extra if bounded else None
    pat = N.PQuant(N.PSym("A"), qmin, qmax)
    pat.greedy = True
    pre = {"A": np.array(cls, dtype=bool)}
    fast, generic = _find_both(pat, pre, len(cls))
    assert fast == generic


@given(data=st.data(),
       k=st.integers(min_value=1, max_value=4),
       n=st.integers(min_value=0, max_value=60))
@settings(max_examples=300, deadline=None)
def test_symbol_sequence_matches_generic(data, k, n):
    syms = [f"S{j}" for j in range(k)]
    pre = {s: np.array(data.draw(
        st.lists(st.booleans(), min_size=n, max_size=n)), dtype=bool)
        for s in syms}
    pat = N.PSeq([N.PSym(s) for s in syms])
    fast, generic = _find_both(pat, pre, n)
    assert fast == generic


@given(cls=st.lists(st.booleans(), min_size=0, max_size=40))
@settings(max_examples=100, deadline=None)
def test_repeated_symbol_sequence_matches_generic(cls):
    # (A A) — same symbol twice: overlap suppression must agree
    pre = {"A": np.array(cls, dtype=bool)}
    pat = N.PSeq([N.PSym("A"), N.PSym("A")])
    fast, generic = _find_both(pat, pre, len(cls))
    assert fast == generic


def test_cep_fuzz_ci_subset(spark):
    """CI slice of the CEP differential fuzz (r11; the wide sweep is
    tests/cep_fuzz.py — run it after NFA/matcher changes): random
    patterns (quantifiers, alternation, PERMUTE, SKIP modes, ONE/ALL
    ROWS) over random events, three paths (incremental flush,
    relational batch, streaming kernel) must agree.  Bar: ZERO
    divergences."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cep_fuzz import run_fuzz

    div = run_fuzz(spark, seed=20260816, count=4, verbose=False)
    assert not div, div
