"""Textual query DSL — translation of the reference's macro DSL
(core/src/macros.rs:2-110), which is codd's only query language:

    create relation "r":<n LONG>
    insert into (r) values [1, 2, 3]
    select [n] from (r) where [n % 2 = 0]
    (l) join (r) on [k; k] with [l.v AS v, r.w AS w]
    (l) cross (r) on [l.n + r.n AS s]
    (a) union (b) / (a) intersect (b) / (a) minus (b)

Differences from the reference: where codd brackets hold Rust closures,
ours hold SQL expression fragments (parsed by Spark — a strictly larger
surface). ``Database.sql`` additionally exposes full Spark SQL over the
registered relations, which subsumes this DSL; the translation exists for
API-parity with the reference's macro tests (core/src/macros.rs:112-382).
"""

from __future__ import annotations

import ast as python_ast
import re

from pyspark.sql import functions as F

from codd_spark.errors import UnsupportedExpressionError
from codd_spark.plans import ast


class _Tok:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def skip_ws(self):
        while self.pos < len(self.text) and self.text[self.pos].isspace():
            self.pos += 1

    def peek_word(self) -> str | None:
        self.skip_ws()
        m = re.match(r"[A-Za-z_][A-Za-z_0-9]*", self.text[self.pos:])
        return m.group(0) if m else None

    def take_word(self, expect: str | None = None) -> str:
        w = self.peek_word()
        if w is None or (expect is not None and w != expect):
            raise UnsupportedExpressionError(
                f"DSL parse error at {self.pos}: expected {expect or 'identifier'}, "
                f"got {self.text[self.pos:self.pos + 20]!r}"
            )
        self.pos += len(w)
        return w

    def take_char(self, c: str) -> None:
        self.skip_ws()
        if self.pos >= len(self.text) or self.text[self.pos] != c:
            raise UnsupportedExpressionError(
                f"DSL parse error at {self.pos}: expected {c!r}, "
                f"got {self.text[self.pos:self.pos + 20]!r}"
            )
        self.pos += 1

    def try_char(self, c: str) -> bool:
        self.skip_ws()
        if self.pos < len(self.text) and self.text[self.pos] == c:
            self.pos += 1
            return True
        return False

    def balanced(self, open_c: str, close_c: str) -> str:
        """Consume a balanced bracketed region, return its inner text."""
        self.take_char(open_c)
        depth, start = 1, self.pos
        while self.pos < len(self.text):
            ch = self.text[self.pos]
            if ch == open_c:
                depth += 1
            elif ch == close_c:
                depth -= 1
                if depth == 0:
                    inner = self.text[start:self.pos]
                    self.pos += 1
                    return inner
            elif ch in "'\"":
                q = ch
                self.pos += 1
                while self.pos < len(self.text) and self.text[self.pos] != q:
                    self.pos += 1
            self.pos += 1
        raise UnsupportedExpressionError(f"DSL parse error: unbalanced {open_c}")

    def at_end(self) -> bool:
        self.skip_ws()
        return self.pos >= len(self.text)


def _split_top(s: str, sep: str) -> list[str]:
    """Split on sep at bracket depth 0 (commas inside parens stay intact)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _mapper_from_specs(specs: list[str]):
    """Column specs that may reference the join sides as l.col / r.col."""
    return lambda l, r: [F.expr(s) for s in specs]


def parse_expr(text: str) -> ast.Expression:
    tok = _Tok(text)
    expr = _parse_expr(tok)
    if not tok.at_end():
        raise UnsupportedExpressionError(
            f"DSL parse error: trailing input {tok.text[tok.pos:]!r}"
        )
    return expr


def _parse_expr(tok: _Tok) -> ast.Expression:
    left = _parse_term(tok)
    while True:
        w = tok.peek_word()
        if w == "union":
            tok.take_word()
            left = ast.Union(left, _parse_term(tok))
        elif w == "intersect":
            tok.take_word()
            left = ast.Intersect(left, _parse_term(tok))
        elif w == "minus":
            tok.take_word()
            left = ast.Difference(left, _parse_term(tok))
        else:
            return left


def _parse_term(tok: _Tok) -> ast.Expression:
    w = tok.peek_word()
    if w == "select":
        # select [cols] from (expr) [where [pred]]
        tok.take_word()
        cols = _split_top(tok.balanced("[", "]"), ",")
        tok.take_word("from")
        child = _parse_paren_expr(tok)
        if tok.peek_word() == "where":
            tok.take_word()
            pred = tok.balanced("[", "]").strip()
            child = ast.Select(child, pred)
        if cols == ["*"]:
            return child
        return ast.Project(child, cols)
    if w == "empty":
        tok.take_word()
        schema = tok.balanced("<", ">").strip()
        return ast.Empty(schema)
    if w == "singleton":
        # singleton [python-literal-dict]
        tok.take_word()
        row = python_ast.literal_eval(tok.balanced("[", "]").strip())
        return ast.Singleton(row)
    return _parse_postfix(tok)


def _parse_paren_expr(tok: _Tok) -> ast.Expression:
    tok.skip_ws()
    if tok.text[tok.pos] == "(":
        inner = tok.balanced("(", ")")
        return parse_expr(inner)
    name = tok.take_word()
    return ast.Relation(name)


def _parse_postfix(tok: _Tok) -> ast.Expression:
    left = _parse_paren_expr(tok)
    w = tok.peek_word()
    if w == "join":
        # (l) join (r) on [lk; rk] with [cols]
        tok.take_word()
        right = _parse_paren_expr(tok)
        tok.take_word("on")
        keys = _split_top(tok.balanced("[", "]"), ";")
        lk = _split_top(keys[0], ",")
        rk = _split_top(keys[1], ",") if len(keys) > 1 else lk
        mapper = None
        if tok.peek_word() == "with":
            tok.take_word()
            mapper = _mapper_from_specs(_split_top(tok.balanced("[", "]"), ","))
        return ast.Join(left, right, lk, rk, mapper)
    if w == "cross":
        # (l) cross (r) [on [cols]]
        tok.take_word()
        right = _parse_paren_expr(tok)
        mapper = None
        if tok.peek_word() == "on":
            tok.take_word()
            mapper = _mapper_from_specs(_split_top(tok.balanced("[", "]"), ","))
        return ast.Product(left, right, mapper)
    return left


_CREATE = re.compile(r'^\s*create\s+relation\s+"?([A-Za-z_][A-Za-z_0-9]*)"?\s*:\s*<(.+)>\s*$', re.S)
_INSERT = re.compile(r"^\s*insert\s+into\s+\(([A-Za-z_][A-Za-z_0-9]*)\)\s+values\s+\[(.*)\]\s*$", re.S)


def execute(db, command: str):
    """Execute one DSL command against a Database (or IncrementalDatabase).

    - ``create relation name:<ddl>`` -> None
    - ``insert into (name) values [..python literals..]`` -> None
    - anything else: parsed as a query expression -> sorted rows
      (reference: query! evaluates to Tuples, core/src/macros.rs:45-77)
    """
    m = _CREATE.match(command)
    if m:
        db.add_relation(m.group(1), m.group(2).strip())
        return None
    m = _INSERT.match(command)
    if m:
        values = python_ast.literal_eval(f"[{m.group(2)}]")
        rows = [v if isinstance(v, tuple) else (v,) for v in values]
        db.insert(m.group(1), rows)
        return None
    return db.evaluate(parse_expr(command))
