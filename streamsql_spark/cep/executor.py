"""CEP batch executor: MATCH_RECOGNIZE plan → DataFrame.

Partitions shuffle by PARTITION BY keys (one ``applyInPandas`` group
per key — the Spark analog of the reference's per-partition NFA
instances, ``stream/cep.go:32-48``), rows sort by ORDER BY inside the
kernel, the matcher emits measure rows, and the outer SELECT projects
them (``stream/stream.go:400-409``).

Scale: state is bounded per key exactly like the reference (whole-key
row buffers); keys parallelize across executors.  A streaming variant
holds the tail buffer in ``transformWithStateInPandas`` state with the
same matcher core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, DataType, DoubleType, LongType,
                               StringType, StructField, StructType,
                               TimestampType)

from ..dialect import nodes as N
from ..dialect.render import render
from ..engine.batch import duration_to_seconds
from .engine import run_partition


def _measure_type(e: N.Expr, schema: dict[str, DataType]) -> DataType:
    if isinstance(e, N.Lit):
        if isinstance(e.value, bool):
            return BooleanType()
        if isinstance(e.value, int):
            return LongType()
        if isinstance(e.value, float):
            return DoubleType()
        return StringType()
    if isinstance(e, N.Col):
        parts = [p for p in e.parts if isinstance(p, str)]
        # symbol-qualified → the underlying column's type
        for cand in (parts[-1], parts[0]):
            if cand in schema:
                return schema[cand]
        return DoubleType()
    if isinstance(e, N.Func):
        name = e.name.lower()
        if name in ("__final__", "__running__"):
            return _measure_type(e.args[0], schema)
        if name in ("count", "match_number"):
            return LongType()
        if name == "classifier":
            return StringType()
        if name in ("avg", "sum", "round", "sqrt", "power", "pow"):
            return DoubleType()
        if name in ("min", "max", "first", "last", "prev", "next", "coalesce") and e.args:
            return _measure_type(e.args[0], schema)
        if name in ("upper", "lower", "concat"):
            return StringType()
        if name == "length":
            return LongType()
        return DoubleType()
    if isinstance(e, N.Bin):
        if e.op in ("=", "!=", "<", "<=", ">", ">=", "AND", "OR"):
            return BooleanType()
        if e.op == "||":
            return StringType()
        lt, rt = _measure_type(e.left, schema), _measure_type(e.right, schema)
        if e.op == "/" or isinstance(lt, DoubleType) or isinstance(rt, DoubleType):
            return DoubleType()
        return LongType()
    if isinstance(e, (N.IsNull, N.InList, N.Between)):
        return BooleanType()
    if isinstance(e, N.Un):
        return BooleanType() if e.op == "NOT" else _measure_type(e.operand, schema)
    if isinstance(e, N.Case) and e.whens:
        return _measure_type(e.whens[0][1], schema)
    return StringType()


def build_cep_parts(df: DataFrame, plan) -> dict:
    """Shared MATCH_RECOGNIZE prep for the batch and streaming executors:
    WHERE pushdown, partition-key materialization, output schema, event
    time resolution."""
    spec: N.MatchSpec = plan.stmt.match
    if plan.where_sql:
        df = df.filter(F.expr(plan.where_sql))

    part_sqls = [render(p) for p in spec.partition_by]
    order_sqls = [render(o) for o in spec.order_by]
    if not order_sqls:
        raise ValueError("MATCH_RECOGNIZE requires ORDER BY (event time first)")
    ts_col = order_sqls[0]

    in_schema = {f.name: f.dataType for f in df.schema.fields}
    if ts_col not in in_schema:
        raise ValueError(f"MATCH_RECOGNIZE ORDER BY column {ts_col!r} "
                         f"not found in input columns {sorted(in_schema)}")
    fields = []
    part_names = []
    for i, psql in enumerate(part_sqls):
        name = psql if psql in in_schema else f"__pk_{i}__"
        if psql not in in_schema:
            df = df.withColumn(name, F.expr(psql))
            in_schema[name] = df.schema[name].dataType
        part_names.append(name)
        fields.append(StructField(name, in_schema[name]))
    measure_aliases = {m.alias or f"m{j}" for j, m in enumerate(spec.measures)}
    if spec.rows_per_match == "all":
        # ALL ROWS PER MATCH: input columns + MEASURES (measures shadow)
        fields = [StructField(f.name, f.dataType) for f in df.schema.fields
                  if f.name not in measure_aliases]
    for j, m in enumerate(spec.measures):
        alias = m.alias or f"m{j}"
        fields.append(StructField(alias, _measure_type(m.expr, in_schema)))
    return {
        "spec": spec,
        "df": df,
        "out_schema": StructType(fields),
        "part_names": part_names,
        "ts_col": ts_col,
        "ts_is_time": isinstance(in_schema.get(ts_col), TimestampType),
        "within": duration_to_seconds(spec.within) if spec.within else None,
        "measure_names": [m.alias or f"m{j}"
                          for j, m in enumerate(spec.measures)],
        "order_cols": [c for c in order_sqls if c in in_schema],
    }


def execute_cep(spark: SparkSession, plan, source_df: DataFrame, executor) -> DataFrame:
    parts = build_cep_parts(source_df, plan)
    spec = parts["spec"]
    df = parts["df"]
    out_schema = parts["out_schema"]
    part_names = parts["part_names"]
    ts_col = parts["ts_col"]
    ts_is_time = parts["ts_is_time"]
    within_s = parts["within"]
    measure_names = parts["measure_names"]
    order_cols = parts["order_cols"]
    all_rows = spec.rows_per_match == "all"
    spec_ser = spec  # captured by closure (plain dataclasses — picklable)

    def kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols or [ts_col], kind="mergesort")
        rows = pdf.to_dict("records")
        if ts_is_time:
            ts_vals = [r[ts_col].timestamp() if pd.notna(r[ts_col]) else None
                       for r in rows]
            within = within_s
        else:
            ts_vals = [r.get(ts_col) for r in rows]
            # numeric event time: reference default unit is ms
            within = within_s * 1000 if within_s is not None else None
        out = run_partition(spec_ser, rows, ts_vals, within)
        names = [f.name for f in out_schema.fields]
        res = pd.DataFrame(out, columns=names if all_rows else measure_names)
        if not all_rows:
            for name in part_names:
                res.insert(0, name, rows[0][name] if rows else None)
        return res[names]

    if part_names:
        grouped = df.groupBy(*[F.col(c) for c in part_names])
    else:
        grouped = df.groupBy(F.lit(1).alias("__g__"))
    matched = grouped.applyInPandas(kernel, schema=out_schema)

    # outer SELECT over measure rows
    out_cols = []
    for out in plan.outputs:
        if out.star:
            out_cols.extend(F.col(c) for c in matched.columns)
        else:
            out_cols.append(F.expr(out.sql).alias(out.name))
    result = matched.select(*out_cols)
    if plan.order_by:
        exprs = [F.expr(s).asc() if asc else F.expr(s).desc()
                 for s, asc in plan.order_by]
        result = result.orderBy(*exprs)
    if plan.limit is not None:
        result = result.limit(plan.limit)
    return result
