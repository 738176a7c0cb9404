"""Query-string grammar parser (the reference's `query` RPC path).

Implements the subset of the tantivy-0.18 QueryParser grammar the
reference exercises (SURVEY.md §8.4): bare terms, ``field:term``,
``"quoted phrases"``, ``+must`` / ``-must_not`` prefixes, ``AND`` /
``OR`` (AND binds tighter), parenthesized groups, and ranges
``field:[a TO b]`` / ``field:{a TO b}``.

Semantics:
- Bare terms are analyzed with each default field's analyzer and
  OR-combined across fields and terms (default disjunction — the
  reference never enables conjunction, ``index.rs:246-284``).
- Default fields reproduce the reference's collection loop, which
  ``break``s at the first non-indexed schema field, so defaults are the
  schema-order *prefix* of indexed fields (``index.rs:230-239``; pass
  ``compat_break=False`` for the all-indexed-fields behavior).
- A single word that analyzes to multiple tokens (``foo-bar``) becomes a
  phrase query on position-recording fields, else a Should-group.
"""

from __future__ import annotations

import re

from rayfts.analysis.analyzer import Analyzer
from rayfts.index.schema import IndexSchema, TEXT
from rayfts.query.ast import All, Bool, Phrase, Query, Range, Term


from rayfts.query.ast import QueryParseError  # noqa: F401 (canonical home)


_TOKEN_SPEC = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lparen>\() | (?P<rparen>\))
  | (?P<and>AND\b) | (?P<or>OR\b)
  | (?P<plus>\+) | (?P<minus>-)
  | (?P<phrase>"(?P<phrase_body>[^"]*)")
  | (?P<range>(?P<lb>[\[{])(?P<lo>[^\s\]}]*|\*)\s+TO\s+(?P<hi>[^\s\]}]*|\*)(?P<rb>[\]}]))
  | (?P<fieldname>[\w.]+):
  | (?P<word>[^\s()"+\-][^\s()"]*)
    """,
    re.VERBOSE,
)


class QueryParser:
    def __init__(self, schema: IndexSchema, compat_break: bool = True):
        self.schema = schema
        self.default_fields = schema.default_query_fields(compat_break)
        self._analyzers: dict[str, Analyzer] = {}

    def _analyzer_for(self, field: str) -> Analyzer:
        fdef = self.schema.field(field)
        name = fdef.tokenizer if fdef.type == TEXT else "raw"
        a = self._analyzers.get(name)
        if a is None:
            a = self._analyzers[name] = Analyzer(name)
        return a

    # -- lexing --------------------------------------------------------
    def _lex(self, s: str) -> list[dict]:
        out, i = [], 0
        while i < len(s):
            m = _TOKEN_SPEC.match(s, i)
            if m is None:
                raise QueryParseError(f"cannot lex query at {s[i:]!r}")
            i = m.end()
            kind = m.lastgroup if m.lastgroup not in (None,) else "word"
            for k in ("ws", "lparen", "rparen", "and", "or", "plus", "minus",
                      "phrase", "range", "fieldname", "word"):
                if m.group(k):
                    kind = k
                    break
            if kind == "ws":
                continue
            out.append({"kind": kind, "m": m, "text": m.group(0)})
        return out

    # -- parsing (recursive descent; OR < AND < unary < primary) -------
    def parse(self, s: str) -> Query:
        toks = self._lex(s)
        self._toks, self._pos = toks, 0
        if not toks:
            return Bool()  # matches nothing, like an empty tantivy query
        q = self._parse_or()
        if self._pos != len(self._toks):
            raise QueryParseError(f"trailing tokens at {self._toks[self._pos]['text']!r}")
        return q

    def _peek(self):
        return self._toks[self._pos] if self._pos < len(self._toks) else None

    def _next(self):
        if self._pos >= len(self._toks):
            # e.g. 'field:' with no value, or a dangling operator at EOF —
            # must surface as the typed parse error (serving's bad-query
            # policy swallows only QueryParseError/QueryError)
            raise QueryParseError("unexpected end of query")
        t = self._toks[self._pos]
        self._pos += 1
        return t

    def _parse_or(self) -> Query:
        left = self._parse_and()
        shoulds = [left]
        explicit = False
        while True:
            t = self._peek()
            if t and t["kind"] == "or":
                self._next()
                shoulds.append(self._parse_and())
                explicit = True
            elif t and t["kind"] not in ("rparen",):
                # implicit disjunction of sequential clauses
                shoulds.append(self._parse_and())
            else:
                break
        if len(shoulds) == 1 and not explicit:
            only = shoulds[0]
            if isinstance(only, _Must):
                return Bool(must=[only.q])
            if isinstance(only, _MustNot):
                return Bool(must=[All()], must_not=[only.q])
            return only
        # fold unary occur markers into one Bool
        out = Bool()
        for c in shoulds:
            if isinstance(c, _Must):
                out.must.append(c.q)
            elif isinstance(c, _MustNot):
                out.must_not.append(c.q)
            else:
                out.should.append(c)
        if out.must_not and not out.must and not out.should:
            out.must.append(All())
        return out

    def _parse_and(self) -> Query:
        left = self._parse_unary()
        musts = [left]
        while True:
            t = self._peek()
            if t and t["kind"] == "and":
                self._next()
                musts.append(self._parse_unary())
            else:
                break
        if len(musts) == 1:
            return musts[0]
        out = Bool()
        for c in musts:
            if isinstance(c, _MustNot):
                out.must_not.append(c.q)
            else:
                out.must.append(c.q if isinstance(c, _Must) else c)
        return out

    def _parse_unary(self) -> Query:
        t = self._peek()
        if t and t["kind"] == "plus":
            self._next()
            return _Must(self._parse_primary())
        if t and t["kind"] == "minus":
            self._next()
            return _MustNot(self._parse_primary())
        return self._parse_primary()

    def _parse_primary(self) -> Query:
        t = self._peek()
        if t is None:
            raise QueryParseError("unexpected end of query")
        if t["kind"] == "lparen":
            self._next()
            q = self._parse_or()
            t2 = self._peek()
            if not t2 or t2["kind"] != "rparen":
                raise QueryParseError("unbalanced parenthesis")
            self._next()
            return q
        if t["kind"] == "fieldname":
            self._next()
            field = t["text"][:-1]
            if not self.schema.has_field(field):
                raise QueryParseError(f"unknown field {field!r}")
            return self._parse_value_for([field])
        if t["kind"] in ("word", "phrase", "range"):
            if not self.default_fields:
                raise QueryParseError("no default fields for bare term")
            return self._parse_value_for(self.default_fields)
        raise QueryParseError(f"unexpected token {t['text']!r}")

    def _parse_value_for(self, fields: list[str]) -> Query:
        t = self._next()
        if t["kind"] == "word":
            return self._text_query(fields, t["text"])
        if t["kind"] == "phrase":
            return self._phrase_query(fields, t["m"].group("phrase_body"))
        if t["kind"] == "range":
            m = t["m"]
            lo = None if m.group("lo") in ("*", "") else m.group("lo")
            hi = None if m.group("hi") in ("*", "") else m.group("hi")
            clauses = []
            for f in fields:
                kw = {}
                if lo is not None:
                    kw["gte" if m.group("lb") == "[" else "gt"] = lo
                if hi is not None:
                    kw["lte" if m.group("rb") == "]" else "lt"] = hi
                clauses.append(Range(f, **kw))
            return clauses[0] if len(clauses) == 1 else Bool(should=clauses)
        raise QueryParseError(f"expected a value, got {t['text']!r}")

    @staticmethod
    def _make_phrase(field: str, toks: list[str], poss: list[int]) -> Phrase:
        """Carry analyzer ordinals into the phrase: a RemoveLong-dropped
        token leaves a position gap the match must respect — the index
        side preserves ordinals, so the query side must too (tantivy's
        position-carrying PhraseQuery)."""
        base = poss[0]
        offsets = tuple(p - base for p in poss)
        if offsets == tuple(range(len(toks))):
            offsets = None  # consecutive: the common case, no payload
        return Phrase(field, tuple(toks), offsets=offsets)

    def _text_query(self, fields: list[str], text: str) -> Query:
        clauses: list[Query] = []
        for f in fields:
            toks, poss = self._analyzer_for(f).tokens_positions(text)
            if not toks:
                continue
            if len(toks) == 1:
                clauses.append(Term(f, toks[0]))
            elif self.schema.field(f).has_positions:
                clauses.append(self._make_phrase(f, toks, poss))
            else:
                clauses.append(Bool(should=[Term(f, t) for t in toks]))
        if not clauses:
            return Bool()  # analyzed to nothing -> matches nothing
        return clauses[0] if len(clauses) == 1 else Bool(should=clauses)

    def _phrase_query(self, fields: list[str], text: str) -> Query:
        clauses: list[Query] = []
        for f in fields:
            toks, poss = self._analyzer_for(f).tokens_positions(text)
            if not toks:
                continue
            if len(toks) == 1:
                clauses.append(Term(f, toks[0]))
            else:
                clauses.append(self._make_phrase(f, toks, poss))
        if not clauses:
            return Bool()
        return clauses[0] if len(clauses) == 1 else Bool(should=clauses)


class _Must(Query):
    def __init__(self, q: Query):
        self.q = q


class _MustNot(Query):
    def __init__(self, q: Query):
        self.q = q
