"""Property tests: the lateness/global kernels' mergeable partial
accumulators must agree with the buffered py_aggregate evaluation on
every algebraic aggregate, for any value sequence (None/NaN included).
"""

import math

from hypothesis import given, settings
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
