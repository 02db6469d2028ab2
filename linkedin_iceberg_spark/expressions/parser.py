"""Predicate string parser: SQL-ish strings -> Expression algebra (P13).

ref: python/iceberg/api/expressions/expression_parser.py:96-152 — the
reference's pure-Python read path accepts predicate strings; ours supports
the same surface plus IN/NOT IN lists, IS [NOT] NULL, LIKE-prefix, BETWEEN.

Grammar (case-insensitive keywords):
    expr     := term (OR term)*
    term     := factor (AND factor)*
    factor   := NOT factor | '(' expr ')' | predicate
    predicate:= ident op literal
              | ident IN '(' literal, ... ')' | ident NOT IN '(...)'
              | ident IS NULL | ident IS NOT NULL
              | ident LIKE 'prefix%'
              | ident BETWEEN literal AND literal
    op       := = | == | != | <> | < | <= | > | >=
Literals: single/double-quoted strings, integers, floats, true/false.
"""

from __future__ import annotations

import re

from linkedin_iceberg_spark.expressions.expressions import (
    Expression,
    and_,
    eq,
    gt,
    gt_eq,
    in_,
    is_null,
    lt,
    lt_eq,
    not_,
    not_eq,
    not_in,
    not_null,
    or_,
    starts_with,
)

_TOKEN = re.compile(r"""
    \s*(
        (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<op><=|>=|!=|<>|==|=|<|>)
      | (?P<punct>[(),])
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""", re.VERBOSE)

_KEYWORDS = {"and", "or", "not", "in", "is", "null", "like", "between",
             "true", "false"}


class _Tokens:
    def __init__(self, s: str):
        self.toks = []
        pos = 0
        while pos < len(s):
            m = _TOKEN.match(s, pos)
            if not m:
                if s[pos:].strip():
                    raise ValueError(f"cannot tokenize at: {s[pos:]!r}")
                break
            pos = m.end()
            if m.group("str") is not None:
                raw = m.group("str")
                self.toks.append(("lit", raw[1:-1].replace("\\'", "'")
                                  .replace('\\"', '"')))
            elif m.group("num") is not None:
                raw = m.group("num")
                self.toks.append(("lit", float(raw) if "." in raw
                                  else int(raw)))
            elif m.group("op") is not None:
                self.toks.append(("op", m.group("op")))
            elif m.group("punct") is not None:
                self.toks.append(("punct", m.group("punct")))
            else:
                w = m.group("word")
                if w.lower() in _KEYWORDS:
                    self.toks.append(("kw", w.lower()))
                else:
                    self.toks.append(("ident", w))
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def accept(self, kind, value=None) -> bool:
        k, v = self.peek()
        if k == kind and (value is None or v == value):
            self.i += 1
            return True
        return False

    def expect(self, kind, value=None):
        k, v = self.next()
        if k != kind or (value is not None and v != value):
            raise ValueError(f"expected {value or kind}, got {v!r}")
        return v


def parse_expr(s: str) -> Expression:
    """Parse a predicate string into an (unbound) Expression."""
    t = _Tokens(s)
    e = _or(t)
    if t.peek() != (None, None):
        raise ValueError(f"trailing tokens: {t.toks[t.i:]}")
    return e


def _or(t: _Tokens) -> Expression:
    left = _and(t)
    while t.accept("kw", "or"):
        left = or_(left, _and(t))
    return left


def _and(t: _Tokens) -> Expression:
    left = _factor(t)
    while t.accept("kw", "and"):
        left = and_(left, _factor(t))
    return left


def _factor(t: _Tokens) -> Expression:
    if t.accept("kw", "not"):
        return not_(_factor(t))
    if t.accept("punct", "("):
        e = _or(t)
        t.expect("punct", ")")
        return e
    return _predicate(t)


_OPS = {"=": eq, "==": eq, "!=": not_eq, "<>": not_eq,
        "<": lt, "<=": lt_eq, ">": gt, ">=": gt_eq}


def _literal(t: _Tokens):
    k, v = t.next()
    if k == "lit":
        return v
    if k == "kw" and v in ("true", "false"):
        return v == "true"
    raise ValueError(f"expected literal, got {v!r}")


def _predicate(t: _Tokens) -> Expression:
    name = t.expect("ident")
    k, v = t.peek()
    if k == "op":
        t.next()
        return _OPS[v](name, _literal(t))
    if t.accept("kw", "is"):
        if t.accept("kw", "not"):
            t.expect("kw", "null")
            return not_null(name)
        t.expect("kw", "null")
        return is_null(name)
    negate = False
    if t.accept("kw", "not"):
        negate = True
    if t.accept("kw", "in"):
        t.expect("punct", "(")
        vals = [_literal(t)]
        while t.accept("punct", ","):
            vals.append(_literal(t))
        t.expect("punct", ")")
        return not_in(name, vals) if negate else in_(name, vals)
    if negate:
        raise ValueError("NOT must be followed by IN")
    if t.accept("kw", "like"):
        pat = _literal(t)
        if not isinstance(pat, str) or "%" in pat[:-1] or "_" in pat:
            raise ValueError(
                "only prefix LIKE 'abc%' is supported (STARTS_WITH)")
        return starts_with(name, pat[:-1] if pat.endswith("%") else pat)
    if t.accept("kw", "between"):
        lo = _literal(t)
        t.expect("kw", "and")
        hi = _literal(t)
        return and_(gt_eq(name, lo), lt_eq(name, hi))
    raise ValueError(f"expected predicate after {name!r}")
