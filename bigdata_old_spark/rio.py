"""RIO — RDF I/O: a pure-Python Turtle / N-Triples subset parser.

Covers what the reference's test fixtures use (reference rio/ package:
ntriples/turtle loaders, BasicRioLoader.java): @prefix/@base, PNAME and
IRIREF terms, 'a', object/predicate lists (',' ';'), anonymous and
labeled bnodes, string literals ('...' "..." with \\-escapes, long
quotes), @lang tags, ^^datatypes, numeric/boolean shorthand.
Collections '( … )' expand to rdf:first/rdf:rest chains.

For bulk N-Triples at scale use ``load_ntriples`` — a mapPartitions
line parser (each line independent → embarrassingly parallel).
"""

from __future__ import annotations

import itertools
import re

from bigdata_old_spark.model import (
    RDF,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    Term,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<COMMENT>\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
  | (?P<STRING_LONG>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<STRING>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<PREFIX_DECL>@prefix\b|@base\b|\bPREFIX\b|\bBASE\b)
  | (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<DOUBLE>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
  | (?P<DECIMAL>[+-]?\d*\.\d+)
  | (?P<INTEGER>[+-]?\d+)
  | (?P<BNODE>_:[A-Za-z0-9][A-Za-z0-9_.-]*)
  | (?P<PNAME>[A-Za-z0-9_][A-Za-z0-9_.-]*?:[A-Za-z0-9_][A-Za-z0-9_.%-]*|[A-Za-z0-9_][A-Za-z0-9_.-]*?:|:[A-Za-z0-9_][A-Za-z0-9_.%-]*|:)
  | (?P<KEYWORD>\b(?:a|true|false)\b)
  | (?P<DTSEP>\^\^)
  | (?P<PUNCT>[;,.\[\]()])
  | (?P<WS>\s+)
    """,
    re.VERBOSE,
)

_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f", '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "u":
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U":
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


class _TurtleParser:
    def __init__(self, text: str):
        self.tokens = []
        for m in _TOKEN_RE.finditer(text):
            kind = m.lastgroup
            if kind in ("WS", "COMMENT"):
                continue
            self.tokens.append((kind, m.group()))
        self.pos = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.triples: list[tuple] = []
        self._bnode_ids = itertools.count()

    def peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else (None, None)

    def next(self):
        t = self.peek()
        self.pos += 1
        return t

    def expect(self, value: str):
        kind, v = self.next()
        if v != value:
            raise ValueError(f"expected {value!r}, got {v!r} at token {self.pos}")

    def fresh_bnode(self) -> Term:
        return Term.bnode(f"genid{next(self._bnode_ids)}")

    def parse(self) -> list[tuple]:
        while self.peek()[0] is not None:
            kind, v = self.peek()
            if kind == "PREFIX_DECL":
                self.next()
                if v.lower().endswith("prefix"):
                    _, pname = self.next()
                    _, iri = self.next()
                    self.prefixes[pname[:-1] if pname.endswith(":") else pname.split(":")[0]] = iri[1:-1]
                else:
                    _, iri = self.next()
                    self.base = iri[1:-1]
                if self.peek()[1] == ".":
                    self.next()
                continue
            self.parse_statement()
        return self.triples

    def parse_statement(self):
        subj = self.parse_subject()
        self.parse_predicate_object_list(subj)
        self.expect(".")

    def parse_subject(self) -> Term:
        kind, v = self.peek()
        if v == "[":
            return self.parse_bnode_props()
        if v == "(":
            return self.parse_collection()
        t = self.parse_term()
        return t

    def parse_predicate_object_list(self, subj: Term):
        while True:
            kind, v = self.peek()
            if v in (".", "]", None):
                return
            pred = self.parse_verb()
            while True:
                obj = self.parse_object()
                self._emit(subj, pred, obj)
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
            if self.peek()[1] == ";":
                self.next()
                continue
            return

    def parse_verb(self) -> Term:
        kind, v = self.peek()
        if kind == "KEYWORD" and v == "a":
            self.next()
            return Term.iri(RDF + "type")
        return self.parse_term()

    def parse_object(self) -> Term:
        kind, v = self.peek()
        if v == "[":
            return self.parse_bnode_props()
        if v == "(":
            return self.parse_collection()
        return self.parse_term()

    def parse_bnode_props(self) -> Term:
        self.expect("[")
        node = self.fresh_bnode()
        if self.peek()[1] != "]":
            self.parse_predicate_object_list(node)
        self.expect("]")
        return node

    def parse_collection(self) -> Term:
        self.expect("(")
        items = []
        while self.peek()[1] != ")":
            items.append(self.parse_object())
        self.expect(")")
        if not items:
            return Term.iri(RDF + "nil")
        head = self.fresh_bnode()
        cur = head
        for i, item in enumerate(items):
            self._emit(cur, Term.iri(RDF + "first"), item)
            nxt = self.fresh_bnode() if i + 1 < len(items) else Term.iri(RDF + "nil")
            self._emit(cur, Term.iri(RDF + "rest"), nxt)
            cur = nxt
        return head

    def parse_term(self) -> Term:
        kind, v = self.next()
        if kind == "IRIREF":
            iri = v[1:-1]
            if self.base and not re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", iri):
                iri = self.base + iri
            return Term.iri(iri)
        if kind == "PNAME":
            pfx, _, local = v.partition(":")
            if pfx not in self.prefixes:
                raise ValueError(f"undefined prefix {pfx!r}:")
            return Term.iri(self.prefixes[pfx] + local)
        if kind == "BNODE":
            return Term.bnode(v[2:])
        if kind in ("STRING", "STRING_LONG"):
            lex = _unescape(v[3:-3] if kind == "STRING_LONG" else v[1:-1])
            nk, nv = self.peek()
            if nk == "LANGTAG":
                self.next()
                return Term.literal(lex, lang=nv[1:])
            if nk == "DTSEP":
                self.next()
                dt = self.parse_term()
                return Term.literal(lex, dt=dt.lex)
            return Term.literal(lex)
        if kind == "INTEGER":
            return Term.literal(v, dt=XSD_INTEGER)
        if kind == "DECIMAL":
            return Term.literal(v, dt=XSD_DECIMAL)
        if kind == "DOUBLE":
            return Term.literal(v, dt=XSD_DOUBLE)
        if kind == "KEYWORD" and v in ("true", "false"):
            return Term.literal(v, dt=XSD_BOOLEAN)
        raise ValueError(f"unexpected token {kind} {v!r}")

    def _emit(self, s: Term, p: Term, o: Term):
        self.triples.append((s, p, o))


def parse_turtle(text: str) -> list[tuple[str, str, "Term"]]:
    """Turtle → [(s_flat, p_iri, o_term)] where s_flat is the IRI string
    or '_:label'."""
    out = []
    for s, p, o in _TurtleParser(text).parse():
        s_flat = f"_:{s.lex}" if s.kind == 1 else s.lex
        out.append((s_flat, p.lex, o))
    return out


def parse_ntriples_line(line: str):
    """One N-Triples line → (s, p, o Term) or None (blank/comment)."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    trips = _TurtleParser(line).parse()
    if not trips:
        return None
    s, p, o = trips[0]
    return (f"_:{s.lex}" if s.kind == 1 else s.lex, p.lex, o)


def load_ntriples(spark, path: str, graph: str | None = None):
    """Distributed N-Triples load: text lines → statements DataFrame.
    Line-at-a-time (no cross-line state) → scales linearly with input
    splits (the Spark analog of the reference's parallel
    StatementBuffer pipeline, rio/StatementBuffer.java:87)."""
    from bigdata_old_spark.model import STATEMENTS_SCHEMA, STYPE_EXPLICIT

    def part(lines):
        for row in lines:
            parsed = parse_ntriples_line(row.value)
            if parsed is None:
                continue
            s, p, o = parsed
            kind, lex, dt, lang, num, dbl, dtm, b = o.as_row()
            yield (graph, s, p, kind, lex, dt, lang, num, dbl, dtm, b, STYPE_EXPLICIT)

    lines = spark.read.text(path)
    return spark.createDataFrame(lines.rdd.mapPartitions(part), STATEMENTS_SCHEMA)
