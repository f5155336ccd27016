"""GLOBAL WINDOW TRIGGER WHEN — general-predicate segmentation.

Reference: ``window/global_window.go:49-731`` — per group key, keep O(1)
running aggregates (no row buffer); when the TRIGGER WHEN predicate over
those running aggregates fires, emit the group's pending rows as one
window and purge (FIRE_AND_PURGE).  Rows after the last trigger stay
pending and are not emitted.

Spark realization: the segment boundary depends on running aggregates
that reset at each boundary — inherently sequential per key, so this is
an ``applyInPandas`` operator keyed by the group fields.  State stays
O(1) per key (running aggregates only); each pandas batch holds one
key's rows, ordered by event time.  At 100 TB this parallelizes across
keys exactly like the reference's per-partition state machine, with
Arrow-vectorized transfer; skew in a single key is the same bottleneck
the reference has (single-core per key, by semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..dialect import nodes as N
from ..dialect.render import render

# aggregates supported in running (O(1)) form — mirrors the reference's
# incremental trigger aggregates
_RUNNING_AGGS = {"count", "sum", "avg", "min", "max"}


def _compile_trigger(trig: N.Expr):
    """Compile the TRIGGER WHEN predicate into (py_source, agg_specs).

    agg_specs: list of (var_name, func_name, arg_col | None).
    The predicate becomes a Python expression over the running-agg vars.
    """
    aggs: list[tuple[str, str, str | None]] = []

    def py(e: N.Expr) -> str:
        if isinstance(e, N.Lit):
            return repr(e.value)
        if isinstance(e, N.Func) and e.name.lower() in _RUNNING_AGGS:
            fname = e.name.lower()
            arg_col = None
            if e.args and not isinstance(e.args[0], N.Star):
                if not isinstance(e.args[0], N.Col):
                    raise ValueError(
                        "TRIGGER WHEN aggregates support plain column args")
                arg_col = e.args[0].name
            var = f"_a{len(aggs)}"
            aggs.append((var, fname, arg_col))
            return var
        if isinstance(e, N.Col):
            raise ValueError(
                f"TRIGGER WHEN may only reference aggregates, got column {e.name}")
        if isinstance(e, N.Bin):
            op = {"AND": "and", "OR": "or", "=": "==", "<>": "!=",
                  "!=": "!=", "%": "%"}.get(e.op, e.op)
            if e.op == "^":
                return f"({py(e.left)} ** {py(e.right)})"
            return f"({py(e.left)} {op} {py(e.right)})"
        if isinstance(e, N.Un):
            return f"(not {py(e.operand)})" if e.op == "NOT" else f"(-{py(e.operand)})"
        raise ValueError(f"unsupported TRIGGER WHEN construct: {type(e).__name__}")

    return py(trig), aggs


def segment_by_trigger(df: DataFrame, plan, ts_col: str) -> DataFrame:
    """Add ``__win_id__`` per completed trigger segment; drop pending rows."""
    trig = plan.window.trigger_when
    if trig is None:
        raise ValueError("GLOBAL WINDOW without TRIGGER WHEN never emits "
                         "(rejected at parse time in the reference, rsql/ast.go:73-79)")
    src, agg_specs = _compile_trigger(trig)
    code = compile(src, "<trigger_when>", "eval")
    order_col = ts_col if ts_col in df.columns else None
    if order_col is None:
        # same typed refusal as the count-only fast path
        # (engine/batch.py _chunk_rows): without an event-time column
        # the running aggregates walk rows in physical/Arrow-batch
        # order, so window membership would change across repartitions
        raise ValueError(
            "global-trigger window needs an event-time column: declare "
            "one with TIMESTAMP(col) — without it trigger segmentation "
            "would depend on physical partition layout")
    key_sqls = list(plan.group_sqls)

    out_schema = StructType(df.schema.fields + [StructField("__win_id__", LongType())])

    def segment(pdf):
        import pandas as pd

        if order_col is not None:
            pdf = pdf.sort_values(order_col, kind="mergesort")
        win_ids = []
        win = 0
        state: dict[str, object] = {}
        counts: dict[str, int] = {}
        pending: list[int] = []
        assigned = [None] * len(pdf)
        cols = {c: pdf[c].tolist() for c in pdf.columns}
        for i in range(len(pdf)):
            env = {}
            for var, fname, argc in agg_specs:
                if fname == "count":
                    # SQL count(col) skips NULLs — which pandas delivers
                    # as float NaN for numeric columns, not None
                    cv = cols[argc][i] if argc is not None else None
                    counted = (argc is None
                               or (cv is not None and not pd.isna(cv)))
                    counts[var] = counts.get(var, 0) + (1 if counted else 0)
                    env[var] = counts[var]
                    continue
                v = cols[argc][i] if argc else None
                if v is not None and not pd.isna(v):
                    if fname == "sum":
                        state[var] = (state.get(var) or 0) + v
                    elif fname == "min":
                        state[var] = v if var not in state else min(state[var], v)
                    elif fname == "max":
                        state[var] = v if var not in state else max(state[var], v)
                    elif fname == "avg":
                        s, c = state.get(var, (0.0, 0))
                        state[var] = (s + v, c + 1)
                if fname == "avg":
                    s, c = state.get(var, (0.0, 0))
                    env[var] = (s / c) if c else None
                else:
                    env[var] = state.get(var)
            pending.append(i)
            try:
                fired = bool(eval(code, {"__builtins__": {}}, env))
            except (TypeError, ZeroDivisionError):
                # None in comparison / div-by-zero → not fired
                fired = False
            if fired:
                for j in pending:
                    assigned[j] = win
                win += 1
                pending.clear()
                state.clear()
                counts.clear()
        pdf = pdf.assign(__win_id__=assigned)
        pdf = pdf[pdf["__win_id__"].notna()]
        return pdf.assign(__win_id__=pdf["__win_id__"].astype("int64"))

    if key_sqls:
        keyed = df.groupBy(*[F.expr(s) for s in key_sqls])
    else:
        keyed = df.groupBy(F.lit(1).alias("__k__"))
    return keyed.applyInPandas(segment, schema=out_schema)
