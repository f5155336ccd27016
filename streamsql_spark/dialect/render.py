"""Expression AST → Spark SQL text.

The single rendering path replacing the reference's three expression
engines (hand-written evaluator / expr-lang VM / compiled fast paths,
SURVEY §4.3) — everything lands in Catalyst, which does the constant
folding, codegen and NULL handling the reference hand-rolled.
"""

from __future__ import annotations

import re

from ..functions import registry
from . import nodes as N

_PLAIN_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def quote_ident(name: str) -> str:
    if _PLAIN_IDENT.match(name):
        return name
    return "`" + name.replace("`", "``") + "`"


def sql_string(value: str) -> str:
    return "'" + str(value).replace("\\", "\\\\").replace("'", "\\'") + "'"


def render_col(c: N.Col) -> str:
    # Bracket access renders as try_element_at, not Spark's arr[i] /
    # map[k]: the reference's fieldpath returns nil for out-of-range
    # indices and missing keys (utils/fieldpath/fieldpath.go:236-276)
    # where ANSI-mode Spark raises, and negative indices count from the
    # end (fieldpath.go:242) which bracket syntax doesn't support.
    # Index mapping: reference is 0-based ([0] = first, [-1] = last);
    # try_element_at is 1-based from the front, -1-based from the end.
    out = ""
    for i, p in enumerate(c.parts):
        if isinstance(p, int):
            out = f"try_element_at({out}, {p + 1 if p >= 0 else p})"
        elif isinstance(p, N.MapKey):
            out = f"try_element_at({out}, {sql_string(p.key)})"
        else:
            out = out + ("." if i else "") + quote_ident(str(p))
    return out


class Renderer:
    """Renders expressions; aggregate handling is context-dependent.

    ``agg_mode``:
      - "forbid": aggregate call raises (direct path, WHERE clause —
        mirrors the reference rejecting aggregates outside windows).
      - "allow": aggregates render via the aggregate registry (used when
        rendering an isolated aggregate call for the .agg() list).
    """

    def __init__(self, agg_mode: str = "forbid"):
        self.agg_mode = agg_mode

    def render(self, e: N.Expr) -> str:
        if isinstance(e, N.Lit):
            if e.value is None:
                return "NULL"
            if e.value is True:
                return "true"
            if e.value is False:
                return "false"
            if e.is_string:
                return sql_string(e.value)
            return repr(e.value)
        if isinstance(e, N.Col):
            return render_col(e)
        if isinstance(e, N.Star):
            return f"{quote_ident(e.qualifier)}.*" if e.qualifier else "*"
        if isinstance(e, N.Func):
            return self.render_func(e)
        if isinstance(e, N.Bin):
            return self.render_bin(e)
        if isinstance(e, N.Un):
            inner = self.render(e.operand)
            return f"(NOT {inner})" if e.op == "NOT" else f"(-{inner})"
        if isinstance(e, N.Like):
            op = "NOT LIKE" if e.negated else "LIKE"
            return f"({self.render(e.operand)} {op} {self.render(e.pattern)})"
        if isinstance(e, N.IsNull):
            op = "IS NOT NULL" if e.negated else "IS NULL"
            return f"({self.render(e.operand)} {op})"
        if isinstance(e, N.InList):
            items = ", ".join(self.render(i) for i in e.items)
            op = "NOT IN" if e.negated else "IN"
            return f"({self.render(e.operand)} {op} ({items}))"
        if isinstance(e, N.Between):
            op = "NOT BETWEEN" if e.negated else "BETWEEN"
            return (f"({self.render(e.operand)} {op} {self.render(e.low)} "
                    f"AND {self.render(e.high)})")
        if isinstance(e, N.Case):
            parts = ["CASE"]
            if e.operand is not None:
                parts.append(self.render(e.operand))
            for c, v in e.whens:
                parts.append(f"WHEN {self.render(c)} THEN {self.render(v)}")
            if e.else_ is not None:
                parts.append(f"ELSE {self.render(e.else_)}")
            parts.append("END")
            return " ".join(parts)
        raise ValueError(f"cannot render {type(e).__name__}")

    def render_bin(self, e: N.Bin) -> str:
        # equality against a NULL/nil literal means IS [NOT] NULL in the
        # reference (null_test.go TestNullComparisons; the expr bridge
        # rewrites it, functions/expr_bridge.go) — not SQL UNKNOWN
        def _is_null_lit(n):
            return isinstance(n, N.Lit) and n.value is None
        if e.op in ("=", "==", "!=", "<>") and \
                (_is_null_lit(e.left) or _is_null_lit(e.right)):
            side = e.right if _is_null_lit(e.left) else e.left
            neg = "NOT " if e.op in ("!=", "<>") else ""
            return f"({self.render(side)} IS {neg}NULL)"
        l, r = self.render(e.left), self.render(e.right)
        op = e.op
        if op == "^":  # exponentiation in the reference dialect (expr/doc.go)
            return f"power({l}, {r})"
        if op == "||":
            return f"concat({l}, {r})"
        if op == "<>":
            op = "!="
        return f"({l} {op} {r})"

    def render_func(self, e: N.Func) -> str:
        name = e.name.lower()
        args_sql = [self.render(a) for a in e.args]
        if registry.is_aggregate(name) and name not in registry.SCALAR_RENDERERS:
            if self.agg_mode == "forbid":
                raise ValueError(
                    f"aggregate function {name}() not allowed here (no window/group context)")
            return registry.render_aggregate(name, args_sql, e.args)
        if registry.is_analytic(name):
            raise ValueError(
                f"analytic function {name}() must be extracted before rendering "
                "(planner bug or unsupported position)")
        return registry.render_scalar(name, args_sql, e.args)


def render(e: N.Expr, agg_mode: str = "forbid") -> str:
    return Renderer(agg_mode).render(e)
