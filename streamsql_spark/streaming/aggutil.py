"""Pandas-side aggregate evaluation for stateful streaming kernels.

The counting / global trigger windows cannot use Spark's native
streaming aggregation (their trigger semantics are row-count /
predicate-driven, not time-driven — window/counting_window.go,
window/global_window.go), so their kernels aggregate in Python over
Arrow batches.  Aggregate *arguments* are still evaluated JVM-side
(pre-projected columns), so the kernel only applies the aggregate
function itself.

Semantics mirror the reference accumulators
(functions/functions_aggregation.go): numeric aggregates skip
non-numeric/None values; percentile uses the lower value at
floor(p*(n-1)).
"""

from __future__ import annotations

import math


def _nums(values):
    out = []
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            out.append(int(v))
        elif isinstance(v, (int, float)):
            if isinstance(v, float) and math.isnan(v):
                continue
            out.append(v)
    return out


def _dedup_key(v) -> str:
    """Canonical ``deduplicate`` key.  The reference keys on
    ``fmt.Sprintf("%v", value)`` (functions_aggregation.go:1578) and
    Go prints MAP keys SORTED (since Go 1.12), so equal maps built in
    different insertion orders dedupe together — dicts canonicalize by
    sorted key here, recursively (dicts inside lists too).  Everything
    else keeps ``repr`` (the int-vs-float split is pinned kernel
    behavior, stateful.py map-cell note)."""
    if isinstance(v, dict):
        return "{" + ", ".join(
            f"{k!r}: {_dedup_key(v[k])}"
            for k in sorted(v, key=lambda x: (str(type(x)), str(x)))) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_dedup_key(x) for x in v) + "]"
    return repr(v)


def py_aggregate(name: str, values: list, extra=None):
    """Evaluate one reference aggregate over a window's buffered values.

    ``values``: the pre-evaluated argument column for the window's rows
    (arrival order).  ``extra``: second argument (percentile p, nth n).
    """
    name = name.lower()
    if name == "count":
        return sum(1 for v in values if v is not None)
    if name == "count_star":
        return len(values)
    if name == "collect":
        return list(values)
    if name == "deduplicate":
        seen, out = set(), []
        for v in values:
            k = _dedup_key(v)
            if k not in seen:
                seen.add(k)
                out.append(v)
        return out
    if name == "merge_agg":
        return ",".join(str(v) for v in values if v is not None)
    if name == "first_value":
        return values[0] if values else None
    if name == "last_value":
        return values[-1] if values else None
    if name == "nth_value":
        # `extra or 1` would coerce an EXPLICIT n=0 to 1 — n=0 must
        # read None, matching the batch rendering's >= 1 guard
        n = int(extra) if extra is not None else 1
        return values[n - 1] if 0 < n <= len(values) else None

    nums = _nums(values)
    if name in ("min", "max"):
        non_null = [v for v in values if v is not None]
        if not non_null:
            return None
        try:
            return min(non_null) if name == "min" else max(non_null)
        except TypeError:
            return (min(nums) if name == "min" else max(nums)) if nums else None
    if not nums:
        return None
    if name == "sum":
        r = sum(nums)
        return r if isinstance(r, int) else float(r)
    if name == "avg":
        return float(sum(nums)) / len(nums)
    if name in ("stddev", "var", "stddevs", "vars"):
        n = len(nums)
        mean = sum(nums) / n
        ss = sum((x - mean) ** 2 for x in nums)
        if name in ("stddevs", "vars"):
            if n < 2:
                return None
            var = ss / (n - 1)
        else:
            var = ss / n
        return math.sqrt(var) if name.startswith("stddev") else var
    if name == "median":
        s = sorted(nums)
        n = len(s)
        mid = n // 2
        return float(s[mid]) if n % 2 else (s[mid - 1] + s[mid]) / 2.0
    if name == "percentile":
        # floor(p*(n-1)) lower-value semantics
        # (functions_aggregation.go:518-555).  Out-of-range p mirrors
        # the batch rendering exactly (greatest(idx+1, 1) +
        # try_element_at): p < 0 clamps to the first element, p > 1
        # reads past the buffer -> None — never a Python negative-index
        # wraparound or an IndexError out of the streaming task
        p = float(extra if extra is not None else 0.5)
        s = sorted(nums)
        idx = max(int(math.floor(p * (len(s) - 1))), 0)
        return float(s[idx]) if idx < len(s) else None
    raise ValueError(f"unsupported streaming aggregate: {name}")


# ------------------------------------------------- mergeable partials

# Aggregates with O(1) mergeable state — windows that may re-fire under
# ALLOWEDLATENESS keep these partials instead of buffering raw rows, so
# per-window state is constant-size regardless of window row count.
ALGEBRAIC_AGGS = {"count", "count_star", "sum", "avg", "min", "max",
                  "stddev", "stddevs", "var", "vars",
                  "first_value", "last_value"}


def acc_new() -> list:
    # [n_rows, n_nonnull, n_num, sum, mean, M2, min, max, first, last,
    #  min_num, max_num, mixed_types]
    # sum starts as int 0 so integer inputs keep an integer sum
    # (matching Catalyst's sum(BIGINT) -> BIGINT on the native path).
    # Variance state is Welford's (n, mean, M2) — NOT sum-of-squares,
    # which catastrophically cancels on large-magnitude low-variance
    # data (unix-ms timestamps, money in cents); this matches Spark's
    # own CentralMomentAgg state.
    return [0, 0, 0, 0, 0.0, 0.0, None, None, None, None, None, None,
            False]


def acc_update(acc: list, v) -> None:
    """Fold one pre-evaluated argument value (arrival order) in.

    first/last keep the LITERAL first/last value including None — the
    reference's FirstValue/LastValue latch on the first Add regardless
    (functions_aggregation.go:650-662), and Spark's min_by/max_by over
    the arrival-order column behave identically."""
    if acc[0] == 0:
        acc[8] = v
    acc[9] = v
    acc[0] += 1
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return
    acc[1] += 1
    if isinstance(v, bool):
        v = int(v)
    if isinstance(v, (int, float)):
        acc[2] += 1
        acc[3] += v
        # Welford online update: numerically stable O(1) variance state
        d = v - acc[4]
        acc[4] += d / acc[2]
        acc[5] += d * (v - acc[4])
        # numeric-only extremes: the fallback used when the column turns
        # out to hold incomparable mixed types (py_aggregate parity)
        acc[10] = v if acc[10] is None else min(acc[10], v)
        acc[11] = v if acc[11] is None else max(acc[11], v)
    try:
        acc[6] = v if acc[6] is None else min(acc[6], v)
        acc[7] = v if acc[7] is None else max(acc[7], v)
    except TypeError:
        # incomparable mixed types: flag it so acc_result falls back to
        # the numeric-only extremes, exactly like py_aggregate's
        # holistic path — the algebraic and buffered kernels must agree
        acc[12] = True


def acc_merge(a: list, b: list) -> list:
    """Chan's parallel combine of two partials (a then b, arrival order).

    Not used by the sequential kernels today, but keeps the state
    mergeable for map-side partial aggregation at scale; same O(1)
    state, same numerical stability as the Welford update."""
    out = acc_new()
    out[0] = a[0] + b[0]
    out[1] = a[1] + b[1]
    out[2] = a[2] + b[2]
    out[3] = a[3] + b[3]
    na, nb = a[2], b[2]
    if out[2]:
        d = b[4] - a[4]
        out[4] = a[4] + d * nb / out[2]
        out[5] = a[5] + b[5] + d * d * na * nb / out[2]
    for i in (6, 10):  # mins
        xs = [x for x in (a[i], b[i]) if x is not None]
        if xs:
            try:
                out[i] = min(xs)
            except TypeError:
                out[12] = True
    for i in (7, 11):  # maxes
        xs = [x for x in (a[i], b[i]) if x is not None]
        if xs:
            try:
                out[i] = max(xs)
            except TypeError:
                out[12] = True
    out[8] = a[8] if a[0] else b[8]
    out[9] = b[9] if b[0] else a[9]
    out[12] = out[12] or a[12] or b[12]
    return out


def acc_result(name: str, acc: list):
    (n_rows, n, n_num, s, mean, m2, lo, hi, first, last,
     lo_num, hi_num, mixed) = acc
    name = name.lower()
    if name == "count_star":
        return n_rows
    if name == "count":
        return n
    if name == "first_value":
        return first
    if name == "last_value":
        return last
    if name == "min":
        return lo_num if mixed else lo
    if name == "max":
        return hi_num if mixed else hi
    if n_num == 0:
        return None
    if name == "sum":
        # int stays int (Catalyst sum(BIGINT) -> BIGINT parity); float in
        # the fold makes the whole sum float
        return s if isinstance(s, int) else float(s)
    if name == "avg":
        return float(s) / n_num
    if name in ("stddev", "var", "stddevs", "vars"):
        if name in ("stddevs", "vars"):
            if n_num < 2:
                return None
            var = max(0.0, m2 / (n_num - 1))
        else:
            var = max(0.0, m2 / n_num)
        return math.sqrt(var) if name.startswith("stddev") else var
    raise ValueError(f"not an algebraic aggregate: {name}")
