"""Recursive-descent / Pratt parser for the StreamSQL dialect.

Grammar parity target: rulego/streamsql ``rsql/parser.go`` (SELECT /
FROM [JOIN|MATCH_RECOGNIZE] / WHERE / GROUP BY [window fn | GLOBAL
WINDOW TRIGGER WHEN] / WITH (...) / HAVING / ORDER BY / LIMIT), the
OVER (PARTITION BY ... WHEN ...) analytic clause
(``rsql/parser.go:671-757``), and the MATCH_RECOGNIZE sub-grammar
(``rsql/parser_match.go``, ``rsql/parser_match_pattern.go``).

Unlike the reference (string-rewriting into a flat config), this parser
produces a typed expression tree that the planner maps onto Catalyst.
"""

from __future__ import annotations

from . import nodes as N
from .lexer import EOF, IDENT, NUMBER, OP, QIDENT, STRING, Token, tokenize

_WINDOW_FUNCS = {
    "TUMBLINGWINDOW": "tumbling",
    "SLIDINGWINDOW": "sliding",
    "COUNTINGWINDOW": "counting",
    "SESSIONWINDOW": "session",
}


def _is_duration(text: str) -> bool:
    """Window-param duration check, mirroring the reference's
    convertToDuration + positivity validation (rsql/ast.go:1339,
    1383-1396): bare numbers are seconds, otherwise a unit-suffixed
    literal, and the value must be POSITIVE.  Delegates to the one
    duration grammar the engine renders with, so parse-time acceptance
    can't drift from execute-time rendering."""
    from ..engine.batch import ExecError, duration_to_seconds
    try:
        return duration_to_seconds(text) > 0
    except ExecError:
        return False

_CLAUSE_KWS = {
    "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "WITH",
    "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "ON", "UNION",
    # GLOBAL starts a bare "GLOBAL WINDOW" clause (a lexer keyword in the
    # reference, rsql/lexer.go TokenGlobal) — never a source alias
    "GLOBAL",
}

_CMP_OPS = {"=", "!=", "<>", "<", "<=", ">", ">="}


class ParseError(ValueError):
    pass


_SUGGESTIONS = {
    "SELCT": "SELECT", "SELEC": "SELECT", "FORM": "FROM", "WHER": "WHERE",
    "GRUOP": "GROUP", "HAVNG": "HAVING", "ODER": "ORDER", "LIMTI": "LIMIT",
}

_KEYWORDS = ("SELECT", "FROM", "WHERE", "GROUP", "HAVING", "ORDER",
             "LIMIT", "DISTINCT", "BETWEEN", "PARTITION")


def _suggest_keyword(word: str, want: str | None = None) -> str | None:
    """Typo suggestion for an unknown keyword (rsql/lexer.go:464-480):
    the curated table first, then OSA edit distance ≤ 2 (shared with
    the function-name validator) — which covers all the reference's
    enumerated misspellings (SELECCT/SELET/FRON/WEHRE/GROPU/ODER/
    DSITINCT/...) without listing them."""
    from ..functions.registry import _edit_distance

    hit = _SUGGESTIONS.get(word)
    if hit is not None:
        return hit
    pool = (want,) if want else _KEYWORDS
    best = None
    for kw in pool:
        d = _edit_distance(word, kw, cap=2)
        if d <= 2 and (best is None or d < best[0]):
            best = (d, kw)
    return best[1] if best else None


class Parser:
    def __init__(self, sql: str):
        self.toks = tokenize(sql)
        self.i = 0

    # ------------------------------------------------------------- helpers
    def peek(self, k: int = 0) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.kind != EOF:
            self.i += 1
        return t

    def accept_kw(self, *words: str) -> Token | None:
        if self.peek().is_kw(*words):
            return self.next()
        return None

    def expect_kw(self, word: str) -> Token:
        t = self.next()
        if not (t.kind == IDENT and t.upper == word):
            hint = _suggest_keyword(t.upper, want=word)
            extra = f" (did you mean {hint}?)" if hint == word else ""
            raise ParseError(f"expected {word}, got {t.text!r}{extra}")
        return t

    def accept_op(self, *ops: str) -> Token | None:
        t = self.peek()
        if t.kind == OP and t.text in ops:
            return self.next()
        return None

    def expect_op(self, op: str) -> Token:
        t = self.next()
        if not (t.kind == OP and t.text == op):
            raise ParseError(f"expected {op!r}, got {t.text!r}")
        return t

    def at_clause_boundary(self) -> bool:
        t = self.peek()
        return t.kind == EOF or (t.kind == IDENT and t.upper in _CLAUSE_KWS)

    # ----------------------------------------------------------- statement
    def parse(self) -> N.SelectStmt:
        stmt = self.parse_select()
        t = self.peek()
        if t.kind != EOF:
            hint = _suggest_keyword(t.upper) if t.kind == IDENT else None
            # a misspelled optional clause keyword (FROM/WHERE/...) shows
            # up here as trailing input — suggest the fix
            prev = self.toks[self.i - 1] if self.i else None
            if hint is None and prev is not None and prev.kind == IDENT:
                hint = _suggest_keyword(prev.upper)
                if hint:
                    raise ParseError(
                        f"unexpected trailing input at {t.text!r} "
                        f"(did you mean {hint} before it?)")
            extra = f" (did you mean {hint}?)" if hint else ""
            raise ParseError(f"unexpected trailing input at {t.text!r}{extra}")
        return stmt

    def parse_select(self) -> N.SelectStmt:
        t = self.next()
        if not t.is_kw("SELECT"):
            hint = _suggest_keyword(t.upper, want="SELECT")
            extra = f" (did you mean {hint}?)" if hint else ""
            raise ParseError(f"expected SELECT, got {t.text!r}{extra}")
        stmt = N.SelectStmt()
        if self.accept_kw("DISTINCT"):
            stmt.distinct = True
        stmt.fields = self.parse_select_fields()
        if self.accept_kw("FROM"):
            stmt.source = self.parse_identifier()
            if self.peek().is_kw("MATCH_RECOGNIZE"):
                self.next()
                stmt.match = self.parse_match_recognize()
            else:
                if self.accept_kw("AS"):
                    stmt.source_alias = self.parse_identifier()
                elif self.peek().kind in (IDENT, QIDENT) and not self.at_clause_boundary() \
                        and not self.peek().is_kw("MATCH_RECOGNIZE") \
                        and not self._at_window_func():
                    stmt.source_alias = self.parse_identifier()
                # postfix window: the window function may follow the
                # source directly, no GROUP BY — reference lexes the
                # window names as dedicated tokens and parseGroupBy
                # accepts them bare (rsql/parser.go:978, lexer.go:391;
                # parser_test.go "SELECT COUNT(*) FROM events
                # TUMBLINGWINDOW(5, 'mi')" expectError:false)
                if self._at_window_func():
                    stmt.window = self.parse_window_func(self.peek().upper)
            self.parse_joins(stmt)
            # MATCH_RECOGNIZE may follow stream-table JOINs — the CEP
            # engine sees enriched rows (rsql/parser.go:188-196,
            # stream/processor_data.go:112-141 processCEP)
            if stmt.match is None and self.peek().is_kw("MATCH_RECOGNIZE"):
                self.next()
                stmt.match = self.parse_match_recognize()
        if self.accept_kw("WHERE"):
            stmt.where = self.parse_expr()
        if self.peek().is_kw("GLOBAL"):
            # bare "GLOBAL WINDOW [TRIGGER WHEN ...]" with no GROUP BY:
            # the whole stream is one implicit group (rsql/parser.go:970-977,
            # test/e2e/global_window_test.go TestGlobalWindow_NoGroupBy)
            self.next()
            self.expect_kw("WINDOW")
            spec = N.WindowSpec(kind="global")
            if self.accept_kw("TRIGGER"):
                self.expect_kw("WHEN")
                spec.trigger_when = self.parse_expr()
            stmt.window = spec
        if self.accept_kw("GROUP"):
            self.expect_kw("BY")
            self.parse_group_by(stmt)
        if self.accept_kw("WITH"):
            self.parse_with(stmt)
        if self.accept_kw("HAVING"):
            stmt.having = self.parse_expr()
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            stmt.order_by = self.parse_order_list()
        if self.accept_kw("LIMIT"):
            t = self.next()
            if t.kind != NUMBER:
                raise ParseError(f"expected number after LIMIT, got {t.text!r}")
            stmt.limit = int(t.text)
        return stmt

    def parse_identifier(self) -> str:
        t = self.next()
        if t.kind not in (IDENT, QIDENT):
            raise ParseError(f"expected identifier, got {t.text!r}")
        return t.text

    def parse_select_fields(self) -> list[N.SelectField]:
        fields = []
        while True:
            if self.accept_op("*"):
                fields.append(N.SelectField(N.Star()))
            else:
                e = self.parse_expr()
                alias = None
                if self.accept_kw("AS"):
                    alias = self.parse_identifier()
                elif self.peek().kind in (IDENT, QIDENT) and not self.at_clause_boundary():
                    # bare alias: `expr name`
                    alias = self.parse_identifier()
                fields.append(N.SelectField(e, alias))
            if not self.accept_op(","):
                break
        return fields

    def parse_joins(self, stmt: N.SelectStmt) -> None:
        while True:
            kind = None
            if self.accept_kw("JOIN"):
                kind = "inner"
            elif self.peek().is_kw("INNER") and self.peek(1).is_kw("JOIN"):
                self.next(); self.next(); kind = "inner"
            elif self.peek().is_kw("LEFT"):
                self.next()
                self.accept_kw("OUTER")
                self.expect_kw("JOIN")
                kind = "left"
            elif self.peek().is_kw("RIGHT"):
                self.next()
                self.accept_kw("OUTER")
                self.expect_kw("JOIN")
                kind = "right"
            elif self.peek().is_kw("FULL"):
                self.next()
                self.accept_kw("OUTER")
                self.expect_kw("JOIN")
                kind = "full"
            elif self.peek().is_kw("CROSS") and self.peek(1).is_kw("JOIN"):
                self.next(); self.next(); kind = "cross"
            else:
                return
            table = self.parse_identifier()
            alias = None
            if self.accept_kw("AS"):
                alias = self.parse_identifier()
            elif self.peek().kind in (IDENT, QIDENT) and not self.peek().is_kw("ON") \
                    and not self.at_clause_boundary():
                alias = self.parse_identifier()
            on = None
            if kind != "cross":
                self.expect_kw("ON")
                on = self.parse_expr()
            stmt.joins.append(N.JoinSpec(kind, table, alias, on))

    def parse_group_by(self, stmt: N.SelectStmt) -> None:
        while True:
            t = self.peek()
            if t.kind == IDENT and t.upper in _WINDOW_FUNCS and self.peek(1).kind == OP \
                    and self.peek(1).text == "(":
                stmt.window = self.parse_window_func(t.upper)
                if self.peek().is_kw("OVER"):
                    # reference parses OVER on a GROUP BY window, then
                    # ToStreamConfig rejects it with a HAVING hint
                    # (test/e2e/sql_check_test.go:233-244)
                    raise ParseError(
                        "OVER(...) on a GROUP BY window is not supported — "
                        "use HAVING for threshold/duration detection")
            elif t.is_kw("GLOBAL"):
                self.next()
                self.expect_kw("WINDOW")
                spec = N.WindowSpec(kind="global")
                if self.accept_kw("TRIGGER"):
                    self.expect_kw("WHEN")
                    spec.trigger_when = self.parse_expr()
                stmt.window = spec
            else:
                stmt.group_by.append(self.parse_expr())
            if self.accept_op(","):
                continue
            # GLOBAL WINDOW follows the group fields with no comma
            # (rsql/parser.go:601-611 convention)
            if self.peek().is_kw("GLOBAL"):
                continue
            break

    def _at_window_func(self) -> bool:
        t = self.peek()
        return (t.kind == IDENT and t.upper in _WINDOW_FUNCS
                and self.peek(1).kind == OP and self.peek(1).text == "(")

    def parse_window_func(self, upper_name: str) -> N.WindowSpec:
        kind = _WINDOW_FUNCS[upper_name]
        self.next()  # name
        self.expect_op("(")
        params: list = []
        while not self.accept_op(")"):
            t = self.next()
            if t.kind == OP and t.text == ",":
                continue
            if t.kind == EOF:
                raise ParseError(f"unterminated {upper_name}(...)")
            params.append(t)
        spec = N.WindowSpec(kind=kind)
        if kind == "tumbling":
            # the reference accepts extra params but validates EVERY one
            # as a positive duration (rsql/ast.go:1383-1396, numeric =
            # seconds per convertToDuration ast.go:1339) — mirror the
            # same Execute-time error family for invalid units
            if len(params) < 1:
                raise ParseError("TumblingWindow expects 1 parameter, e.g. TumblingWindow('5s')")
            for p in params:
                if not _is_duration(p.text):
                    raise ParseError(
                        f"invalid duration parameter: {p.text!r}")
            spec.size = params[0].text
        elif kind == "sliding":
            if len(params) != 2:
                raise ParseError("SlidingWindow expects (size, slide), e.g. SlidingWindow('30s','10s')")
            for p in params:
                if not _is_duration(p.text):
                    raise ParseError(
                        f"invalid duration parameter: {p.text!r}")
            spec.size, spec.slide = params[0].text, params[1].text
        elif kind == "session":
            if len(params) != 1:
                raise ParseError("SessionWindow expects 1 parameter, e.g. SessionWindow('5m')")
            if not _is_duration(params[0].text):
                raise ParseError(
                    f"invalid duration parameter: {params[0].text!r}")
            spec.gap = params[0].text
        elif kind == "counting":
            if len(params) != 1 or params[0].kind != NUMBER:
                raise ParseError("CountingWindow expects a row count, e.g. CountingWindow(100)")
            spec.count = int(params[0].text)
        return spec

    def parse_with(self, stmt: N.SelectStmt) -> None:
        self.expect_op("(")
        while not self.accept_op(")"):
            key = self.parse_identifier().upper()
            self.expect_op("=")
            t = self.next()
            if t.kind not in (STRING, NUMBER, IDENT):
                raise ParseError(f"bad WITH option value {t.text!r}")
            stmt.with_opts[key] = t.text
            self.accept_op(",")

    def parse_order_list(self) -> list[tuple]:
        out = []
        while True:
            e = self.parse_expr()
            asc = True
            if self.accept_kw("DESC"):
                asc = False
            else:
                self.accept_kw("ASC")
            out.append((e, asc))
            if not self.accept_op(","):
                break
        return out

    # --------------------------------------------------------- expressions
    def parse_expr(self) -> N.Expr:
        return self.parse_or()

    def parse_or(self) -> N.Expr:
        left = self.parse_and()
        while self.accept_kw("OR"):
            left = N.Bin("OR", left, self.parse_and())
        return left

    def parse_and(self) -> N.Expr:
        left = self.parse_not()
        while self.accept_kw("AND"):
            left = N.Bin("AND", left, self.parse_not())
        return left

    def parse_not(self) -> N.Expr:
        if self.accept_kw("NOT"):
            return N.Un("NOT", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> N.Expr:
        left = self.parse_additive()
        t = self.peek()
        if t.kind == OP and (t.text in _CMP_OPS or t.text == "=="):
            self.next()
            op = "=" if t.text == "==" else t.text
            return N.Bin(op, left, self.parse_additive())
        negated = False
        if t.is_kw("NOT") and self.peek(1).is_kw("LIKE", "IN", "BETWEEN"):
            self.next()
            negated = True
            t = self.peek()
        if t.is_kw("LIKE"):
            self.next()
            return N.Like(left, self.parse_additive(), negated)
        if t.is_kw("BETWEEN"):
            self.next()
            low = self.parse_additive()
            self.expect_kw("AND")
            return N.Between(left, low, self.parse_additive(), negated)
        if t.is_kw("IN"):
            self.next()
            self.expect_op("(")
            items = [self.parse_expr()]
            while self.accept_op(","):
                items.append(self.parse_expr())
            self.expect_op(")")
            return N.InList(left, items, negated)
        if t.is_kw("IS"):
            self.next()
            neg = bool(self.accept_kw("NOT"))
            self.expect_kw("NULL")
            return N.IsNull(left, neg)
        return left

    def parse_additive(self) -> N.Expr:
        left = self.parse_multiplicative()
        while True:
            t = self.peek()
            if t.kind == OP and t.text in ("+", "-", "||"):
                self.next()
                left = N.Bin(t.text, left, self.parse_multiplicative())
            else:
                return left

    def parse_multiplicative(self) -> N.Expr:
        left = self.parse_power()
        while True:
            t = self.peek()
            if t.kind == OP and t.text in ("*", "/", "%"):
                self.next()
                left = N.Bin(t.text, left, self.parse_power())
            else:
                return left

    def parse_power(self) -> N.Expr:
        # right-associative `^` = exponentiation (reference expr/doc.go)
        left = self.parse_unary()
        if self.peek().kind == OP and self.peek().text == "^":
            self.next()
            return N.Bin("^", left, self.parse_power())
        return left

    def parse_unary(self) -> N.Expr:
        t = self.peek()
        if t.kind == OP and t.text == "-":
            self.next()
            inner = self.parse_unary()
            # fold negative numeric literals so they stay Lit nodes
            # (analytic defaults like lag(x, 1, -1.0) need literal extraction)
            if isinstance(inner, N.Lit) and isinstance(inner.value, (int, float)) \
                    and not isinstance(inner.value, bool):
                return N.Lit(-inner.value)
            return N.Un("-", inner)
        if t.kind == OP and t.text == "+":
            self.next()
            return self.parse_unary()
        return self.parse_primary()

    def parse_primary(self) -> N.Expr:
        t = self.next()
        if t.kind == NUMBER:
            txt = t.text
            if "." in txt or "e" in txt or "E" in txt:
                return N.Lit(float(txt))
            return N.Lit(int(txt))
        if t.kind == STRING:
            return N.Lit(t.text, is_string=True)
        if t.kind == OP and t.text == "(":
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if t.kind == OP and t.text == "*":
            return N.Star()
        if t.kind == IDENT and t.upper == "CASE":
            return self.parse_case()
        if t.kind == IDENT and t.upper == "TRUE":
            return N.Lit(True)
        if t.kind == IDENT and t.upper == "FALSE":
            return N.Lit(False)
        if t.kind == IDENT and t.upper in ("NULL", "NIL"):
            # nil is the reference's Go-flavored NULL literal
            # (test/e2e/null_test.go TestNullComparisons)
            return N.Lit(None)
        if t.kind in (IDENT, QIDENT):
            # function call?
            if t.kind == IDENT and self.peek().kind == OP and self.peek().text == "(":
                return self.parse_func_call(t.text)
            return self.parse_col_path(t)
        raise ParseError(f"unexpected token {t.text!r} in expression")

    def parse_col_path(self, first: Token) -> N.Expr:
        parts: list = [first.text]
        while True:
            if self.peek().kind == OP and self.peek().text == ".":
                # qualified / nested path: a.b.c  (also alias.*)
                if self.peek(1).kind in (IDENT, QIDENT):
                    self.next()
                    parts.append(self.next().text)
                    continue
                if self.peek(1).kind == OP and self.peek(1).text == "*":
                    self.next(); self.next()
                    return N.Star(qualifier=str(parts[0]))
                break
            if self.peek().kind == OP and self.peek().text == "[":
                self.next()
                neg = self.accept_op("-") is not None
                idx = self.next()
                if idx.kind == NUMBER:
                    # negative index counts from the end, reference
                    # fieldpath.go:242 (alerts[-1] = last element)
                    parts.append(-int(idx.text) if neg else int(idx.text))
                elif idx.kind == STRING and not neg:
                    parts.append(N.MapKey(idx.text))
                else:
                    raise ParseError(f"bad index {idx.text!r}")
                self.expect_op("]")
                continue
            break
        return N.Col(tuple(parts), quoted=(first.kind == QIDENT))

    def parse_func_call(self, name: str) -> N.Expr:
        self.expect_op("(")
        args: list[N.Expr] = []
        distinct = False
        if self.accept_kw("DISTINCT"):
            distinct = True
        if not (self.peek().kind == OP and self.peek().text == ")"):
            args.append(self.parse_expr())
            if name.lower() == "cast" and self.peek().is_kw("AS"):
                # ANSI sugar CAST(expr AS TYPE) — the reference parser
                # keeps `AS` inside parens in the raw field text
                # (rsql/parser.go:369 breaks on AS only at paren level
                # 0) and its runtime function is the two-arg
                # cast(value, type) (functions_conversion.go:22), so
                # the type name becomes a string-literal second arg
                self.next()
                args.append(N.Lit(self.parse_identifier().lower(),
                                  is_string=True))
            while self.accept_op(","):
                args.append(self.parse_expr())
        self.expect_op(")")
        over = None
        if self.peek().is_kw("OVER"):
            self.next()
            over = self.parse_over()
        return N.Func(name.lower(), args, distinct=distinct, over=over)

    def parse_over(self) -> N.OverSpec:
        """OVER ([PARTITION BY e, ...] [WHEN cond]) — reference semantics:
        no ORDER BY / ROWS frame (rsql/parser.go:671-757)."""
        self.expect_op("(")
        spec = N.OverSpec()
        if self.accept_kw("PARTITION"):
            self.expect_kw("BY")
            spec.partition_by.append(self.parse_expr())
            while self.accept_op(","):
                spec.partition_by.append(self.parse_expr())
        if self.accept_kw("WHEN"):
            spec.when = self.parse_expr()
        if self.peek().is_kw("ORDER", "ROWS", "RANGE"):
            raise ParseError("OVER supports only PARTITION BY and WHEN (no ORDER BY / frames)")
        self.expect_op(")")
        return spec

    def parse_case(self) -> N.Expr:
        case = N.Case()
        if not self.peek().is_kw("WHEN"):
            case.operand = self.parse_expr()
        whens = []
        while self.accept_kw("WHEN"):
            cond = self.parse_expr()
            self.expect_kw("THEN")
            whens.append((cond, self.parse_expr()))
        if not whens:
            raise ParseError("CASE requires at least one WHEN")
        case.whens = whens
        if self.accept_kw("ELSE"):
            case.else_ = self.parse_expr()
        self.expect_kw("END")
        return case

    # ------------------------------------------------------ MATCH_RECOGNIZE
    def parse_match_recognize(self) -> N.MatchSpec:
        self.expect_op("(")
        spec = N.MatchSpec()
        if self.accept_kw("PARTITION"):
            self.expect_kw("BY")
            spec.partition_by.append(self.parse_expr())
            while self.accept_op(","):
                spec.partition_by.append(self.parse_expr())
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            spec.order_by.append(self.parse_expr())
            while self.accept_op(","):
                spec.order_by.append(self.parse_expr())
            self.accept_kw("ASC")
            if self.peek().is_kw("DESC"):
                # arrival order is the only meaningful stream order
                # (rsql/ast.go:264-272 rejects DESC)
                raise ParseError("MATCH_RECOGNIZE ORDER BY DESC is not supported")
        if self.accept_kw("MEASURES"):
            while True:
                # optional FINAL / RUNNING semantics prefix (SQL:2016);
                # only a prefix when followed by an expression start
                sem = None
                t = self.peek()
                if t.kind == IDENT and t.upper in ("FINAL", "RUNNING") \
                        and self.peek(1).kind == IDENT:
                    sem = t.upper.lower()
                    self.next()
                e = self.parse_expr()
                if sem is not None:
                    e = N.Func(name=f"__{sem}__", args=[e])
                alias = None
                if self.accept_kw("AS"):
                    alias = self.parse_identifier()
                spec.measures.append(N.SelectField(e, alias))
                if not self.accept_op(","):
                    break
        if self.accept_kw("ONE"):
            self.expect_kw("ROW"); self.expect_kw("PER"); self.expect_kw("MATCH")
            spec.rows_per_match = "one"
        elif self.peek().is_kw("ALL") and self.peek(1).is_kw("ROWS"):
            self.next(); self.next()
            self.expect_kw("PER"); self.expect_kw("MATCH")
            spec.rows_per_match = "all"
        if self.accept_kw("AFTER"):
            self.expect_kw("MATCH"); self.expect_kw("SKIP")
            if self.accept_kw("PAST"):
                self.expect_kw("LAST"); self.expect_kw("ROW")
                spec.after_match_skip = ("past_last_row",)
            elif self.accept_kw("TO"):
                if self.accept_kw("NEXT"):
                    self.expect_kw("ROW")
                    spec.after_match_skip = ("to_next_row",)
                elif self.accept_kw("FIRST"):
                    spec.after_match_skip = ("to_first", self.parse_identifier())
                elif self.accept_kw("LAST"):
                    spec.after_match_skip = ("to_last", self.parse_identifier())
                else:
                    raise ParseError("expected NEXT ROW / FIRST sym / LAST sym after SKIP TO")
            else:
                raise ParseError("expected PAST LAST ROW or TO ... after AFTER MATCH SKIP")
        # PATTERN / SUBSET / WITHIN / DEFINE accept any clause order
        # (the reference's tests interleave them freely)
        while True:
            if self.accept_kw("PATTERN"):
                self.expect_op("(")
                spec.pattern = self.parse_pattern_alt()
                self.expect_op(")")
            elif self.accept_kw("WITHIN"):
                t = self.next()
                if t.kind == STRING:
                    spec.within = t.text
                elif t.kind == NUMBER and self.peek().kind == IDENT:
                    # `WITHIN 1 MINUTES` numeric-unit form
                    spec.within = f"{t.text} {self.next().text}"
                else:
                    raise ParseError(
                        "WITHIN expects a duration ('1h' or 1 MINUTES)")
            elif self.accept_kw("SUBSET"):
                name = self.parse_identifier()
                self.expect_op("=")
                self.expect_op("(")
                members = [self.parse_identifier()]
                while self.accept_op(","):
                    members.append(self.parse_identifier())
                self.expect_op(")")
                spec.subsets[name] = members
                self.accept_op(",")
            elif self.accept_kw("DEFINE"):
                while True:
                    sym = self.parse_identifier()
                    self.expect_kw("AS")
                    spec.defines[sym] = self.parse_expr()
                    if not self.accept_op(","):
                        break
            else:
                break
        self.expect_op(")")
        return spec

    def parse_pattern_alt(self) -> N.Pattern:
        items = [self.parse_pattern_seq()]
        while self.accept_op("|"):
            items.append(self.parse_pattern_seq())
        return items[0] if len(items) == 1 else N.PAlt(items)

    def parse_pattern_seq(self) -> N.Pattern:
        items = []
        while True:
            t = self.peek()
            if t.kind == OP and t.text in (")", "|", ",", "-"):
                # "-" only occurs as the {- ... -} exclusion closer
                break
            if t.kind == EOF:
                raise ParseError("unterminated PATTERN")
            items.append(self.parse_pattern_quant())
        if not items:
            raise ParseError("empty pattern sequence")
        return items[0] if len(items) == 1 else N.PSeq(items)

    def parse_pattern_quant(self) -> N.Pattern:
        base = self.parse_pattern_atom()
        t = self.peek()
        quant = None
        if t.kind == OP and t.text in ("*", "+"):
            self.next()
            quant = N.PQuant(base, 0 if t.text == "*" else 1, None)
        elif t.kind == OP and t.text == "{":
            self.next()
            lo_t = self.next()
            if lo_t.kind != NUMBER:
                raise ParseError("bad pattern quantifier")
            lo = int(lo_t.text)
            hi: int | None = lo
            if self.accept_op(","):
                if self.peek().kind == NUMBER:
                    hi = int(self.next().text)
                else:
                    hi = None
            self.expect_op("}")
            quant = N.PQuant(base, lo, hi)
        if quant is None and self.peek().kind == OP and self.peek().text == "?":
            # bare `?` optional
            self.next()
            quant = N.PQuant(base, 0, 1)
        if quant is not None:
            # reluctant marker `?` after ANY quantifier, `?` included:
            # the reference consumes it uniformly after every
            # quantifier form (rsql/parser_match_pattern.go:164-189
            # tryMRQuantifier → consumeReluctant), so `B??` is a
            # reluctant optional, not a parse error (r12 CEP fuzz find)
            if self.peek().kind == OP and self.peek().text == "?":
                self.next()
                quant.greedy = False
            return quant
        return base

    def parse_pattern_atom(self) -> N.Pattern:
        t = self.next()
        if t.kind == OP and t.text == "(":
            p = self.parse_pattern_alt()
            self.expect_op(")")
            return p
        if t.kind == OP and t.text == "{":
            # {- ... -} exclusion: parsed, rejected at compile like the
            # reference (rsql/parser_match_pattern.go:98-113 parses the
            # Exclusion node; cep/pattern.go:78-79 rejects it)
            if not self.accept_op("-"):
                raise ParseError("expected '-' after '{' in exclusion pattern")
            self.parse_pattern_alt()
            if not self.accept_op("-"):
                raise ParseError("expected '-}' to close exclusion pattern")
            self.expect_op("}")
            raise ParseError(
                "pattern exclusion {- -} is not supported yet "
                "(cep/pattern.go:78-79 parity)")
        if t.kind == IDENT and t.upper == "PERMUTE":
            self.expect_op("(")
            items = [self.parse_pattern_alt()]
            while self.accept_op(","):
                items.append(self.parse_pattern_alt())
            self.expect_op(")")
            return N.PPermute(items)
        if t.kind == IDENT:
            return N.PSym(t.text)
        raise ParseError(f"unexpected token {t.text!r} in PATTERN")


def parse(sql: str) -> N.SelectStmt:
    return Parser(sql).parse()
