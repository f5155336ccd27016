"""Tokenizer for the StreamSQL dialect.

Covers the reference grammar's lexical surface (rulego/streamsql
``rsql/lexer.go:375-460``): identifiers (incl. backtick-quoted),
single-quoted strings, numbers, operators (``= != <> < <= > >= + - * /
% ^ || . , ( ) [ ]``), and case-insensitive keywords.  Keywords are not
reserved at the lexer level — the parser decides contextually, which is
how the reference allows e.g. a column literally named ``window``.
"""

from __future__ import annotations

from dataclasses import dataclass

# Token kinds
IDENT = "IDENT"
QIDENT = "QIDENT"  # `backtick quoted`
NUMBER = "NUMBER"
STRING = "STRING"
OP = "OP"
EOF = "EOF"

_TWO_CHAR_OPS = {"!=", "<>", "<=", ">=", "||", "->", "=="}
_ONE_CHAR_OPS = set("=<>+-*/%^.,()[]{}?|&~")


class LexError(ValueError):
    def __init__(self, msg: str, pos: int):
        super().__init__(f"{msg} at position {pos}")
        self.pos = pos


@dataclass(frozen=True)
class Token:
    kind: str
    text: str
    pos: int

    @property
    def upper(self) -> str:
        return self.text.upper()

    def is_kw(self, *words: str) -> bool:
        return self.kind == IDENT and self.text.upper() in words


def tokenize(sql: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c.isspace():
            i += 1
            continue
        # -- line comments
        if c == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "/" and i + 1 < n and sql[i + 1] == "*":
            j = sql.find("*/", i + 2)
            if j < 0:
                raise LexError("unterminated block comment", i)
            i = j + 2
            continue
        if c == "'":
            j = i + 1
            buf = []
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":  # escaped ''
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            if j >= n:
                raise LexError("unterminated string literal", i)
            toks.append(Token(STRING, "".join(buf), i))
            i = j + 1
            continue
        if c == '"':
            # expr-lang style: double quotes are STRING literals in this
            # dialect (DEFINE A AS type == "vib"); backticks quote idents
            j = sql.find('"', i + 1)
            if j < 0:
                raise LexError("unterminated double-quoted string", i)
            toks.append(Token(STRING, sql[i + 1 : j], i))
            i = j + 1
            continue
        if c == "`":
            j = sql.find("`", i + 1)
            if j < 0:
                raise LexError("unterminated backtick identifier", i)
            toks.append(Token(QIDENT, sql[i + 1 : j], i))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and sql[i + 1].isdigit()):
            j = i
            seen_dot = False
            seen_exp = False
            while j < n:
                ch = sql[j]
                if ch.isdigit():
                    j += 1
                elif ch == "." and not seen_dot and not seen_exp:
                    # don't eat `1..2` or method-ish; fine for SQL numbers
                    seen_dot = True
                    j += 1
                elif ch in "eE" and not seen_exp and (
                        (j + 1 < n and sql[j + 1].isdigit())
                        or (j + 2 < n and sql[j + 1] in "+-"
                            and sql[j + 2].isdigit())):
                    # a sign must be FOLLOWED by a digit: '1e+' / '1E-'
                    # (and a second exponent '1e2e3') would otherwise
                    # tokenize as one NUMBER whose float() conversion
                    # crashes with a contextless ValueError downstream
                    seen_exp = True
                    j += 2 if sql[j + 1] in "+-" else 1
                else:
                    break
            toks.append(Token(NUMBER, sql[i:j], i))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            toks.append(Token(IDENT, sql[i:j], i))
            i = j
            continue
        two = sql[i : i + 2]
        if two in _TWO_CHAR_OPS:
            toks.append(Token(OP, two, i))
            i += 2
            continue
        if c in _ONE_CHAR_OPS or c == "!":
            toks.append(Token(OP, c, i))
            i += 1
            continue
        raise LexError(f"unexpected character {c!r}", i)
    toks.append(Token(EOF, "", n))
    return toks
