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
  | (?P<RDR><<|>>)
  | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
  | (?P<STRING_LONG>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<STRING>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<PREFIX_DECL>@prefix\b|@base\b|\bPREFIX\b|\bBASE\b)
  | (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<DOUBLE>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
  | (?P<DECIMAL>[+-]?\d*\.\d+)
  | (?P<INTEGER>[+-]?\d+)
  | (?P<BNODE>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
  | (?P<PNAME>[A-Za-z0-9_][A-Za-z0-9_.-]*?:[A-Za-z0-9_](?:[A-Za-z0-9_.%-]*[A-Za-z0-9_%-])?|[A-Za-z0-9_][A-Za-z0-9_.-]*?:|:[A-Za-z0-9_](?:[A-Za-z0-9_.%-]*[A-Za-z0-9_%-])?|:)
  | (?P<KEYWORD>\b(?:a|true|false|GRAPH|graph)\b)
  | (?P<DTSEP>\^\^)
  | (?P<PUNCT>[;,.\[\](){}])
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

    def _parse_directive(self) -> bool:
        kind, v = self.peek()
        if kind != "PREFIX_DECL":
            return False
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
        return True

    def parse(self) -> list[tuple]:
        while self.peek()[0] is not None:
            if self._parse_directive():
                continue
            self.parse_statement()
        return self.triples

    def parse_statement(self):
        subj = self.parse_subject()
        self.parse_predicate_object_list(subj)
        self.expect(".")

    def parse_subject(self) -> Term:
        kind, v = self.peek()
        if kind == "RDR" and v == "<<":
            return self.parse_rdr()
        if v == "[":
            return self.parse_bnode_props()
        if v == "(":
            return self.parse_collection()
        t = self.parse_term()
        return t

    def parse_rdr(self) -> Term:
        """Terse RDR / RDF-star quoted triple ``<<s p o>>`` in data —
        desugars to the reification bundle the reference's RDR
        interchange unifies into a SID (StatementBuffer SIDs
        processing; the quoted triple is NOT asserted, per
        reif/rdr-03a semantics)."""
        self.expect("<<")
        s = self.parse_subject()
        p = self.parse_verb()
        o = self.parse_object()
        self.expect(">>")
        node = self.fresh_bnode()
        self._emit(node, Term.iri(RDF + "subject"), s)
        self._emit(node, Term.iri(RDF + "predicate"), p)
        self._emit(node, Term.iri(RDF + "object"), o)
        self._emit(node, Term.iri(RDF + "type"), Term.iri(RDF + "Statement"))
        return node

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
        if kind == "RDR" and v == "<<":
            return self.parse_rdr()
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


class _TrigParser(_TurtleParser):
    """TriG = Turtle + graph blocks (reference rio/ TriG support via
    Sesame RDFParser registry; quad fixtures in TestTriG-style tests).
    Grammar per W3C TriG: `GRAPH? (iri|bnode)? { triples }` blocks plus
    plain Turtle statements in the default graph."""

    def __init__(self, text: str):
        super().__init__(text)
        self.quads: list[tuple] = []
        self.current_graph: Term | None = None

    def _emit(self, s: Term, p: Term, o: Term):
        self.quads.append((self.current_graph, s, p, o))

    def parse(self) -> list[tuple]:
        while self.peek()[0] is not None:
            if self._parse_directive():
                continue
            self._parse_block_or_statement()
        return self.quads

    def _parse_block_or_statement(self):
        kind, v = self.peek()
        if v == "{":
            self._graph_block(None)
            return
        if kind == "KEYWORD" and v.lower() == "graph":
            self.next()
            self._graph_block(self.parse_term())
            return
        if kind in ("IRIREF", "PNAME", "BNODE"):
            save = self.pos
            g = self.parse_term()
            if self.peek()[1] == "{":
                self._graph_block(g)
                return
            self.pos = save  # plain triple in the default graph
        self.parse_statement()

    def _graph_block(self, g: Term | None):
        self.current_graph = g
        self.expect("{")
        while self.peek()[1] not in ("}", None):
            subj = self.parse_subject()
            self.parse_predicate_object_list(subj)
            if self.peek()[1] == ".":
                self.next()
        self.expect("}")
        self.current_graph = None


def parse_trig(text: str) -> list[tuple]:
    """TriG → [(g_flat | None, s_flat, p_iri, o_term)]."""

    def flat(t: Term | None):
        if t is None:
            return None
        return f"_:{t.lex}" if t.kind == 1 else t.lex

    return [
        (flat(g), flat(s), p.lex, o) for g, s, p, o in _TrigParser(text).parse()
    ]


def parse_trix(text: str) -> list[tuple]:
    """TriX → [(g_flat | None, s_flat, p_iri, o_term)] — same shape as
    ``parse_trig`` (W3C TriX note; the reference parses it through
    Sesame's TriXParser, registered in ConnegUtil.java:122-144)."""
    import xml.etree.ElementTree as ET

    NS = "{http://www.w3.org/2004/03/trix/trix-1/}"
    XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"

    def term(el) -> Term:
        tag = el.tag.removeprefix(NS)
        txt = el.text or ""
        if tag == "uri":
            return Term.iri(txt)
        if tag == "id":
            return Term.bnode(txt)
        if tag == "plainLiteral":
            return Term.literal(txt, lang=el.attrib.get(XML_LANG))
        if tag == "typedLiteral":
            return Term.literal(txt, dt=el.attrib.get("datatype"))
        raise ValueError(f"unknown TriX term element: {tag}")

    def flat(t: Term) -> str:
        return f"_:{t.lex}" if t.kind == 1 else t.lex

    root = ET.fromstring(text)
    if root.tag != NS + "TriX":
        raise ValueError(f"not a TriX document: root {root.tag}")
    out: list[tuple] = []
    for graph in root:
        if graph.tag != NS + "graph":
            raise ValueError(f"unexpected TriX element: {graph.tag}")
        g = None
        for ch in graph:
            tag = ch.tag.removeprefix(NS)
            if tag == "uri":
                g = ch.text  # graph name precedes the triples
            elif tag == "triple":
                kids = list(ch)
                if len(kids) != 3:
                    raise ValueError("TriX triple needs exactly 3 terms")
                s, p, o = (term(k) for k in kids)
                if p.kind != 0:
                    raise ValueError("TriX predicate must be a uri")
                out.append((g, flat(s), p.lex, o))
            else:
                raise ValueError(f"unexpected TriX element: {tag}")
    return out


def parse_rdfjson(text: str) -> list[tuple[str, str, "Term"]]:
    """RDF/JSON → [(s_flat, p_iri, o_term)] — same shape as
    ``parse_turtle`` (W3C Note "RDF 1.1 JSON Alternate Serialization";
    the reference parses it via Sesame's sesame-rio-rdfjson)."""
    import json

    doc = json.loads(text)
    if not isinstance(doc, dict):
        raise ValueError("RDF/JSON document must be a JSON object")
    out: list[tuple] = []
    for s, preds in doc.items():
        for p, vals in preds.items():
            for v in vals:
                t = v.get("type")
                if t == "uri":
                    o = Term.iri(v["value"])
                elif t == "bnode":
                    o = Term.bnode(v["value"].removeprefix("_:"))
                elif t == "literal":
                    o = Term.literal(v["value"], dt=v.get("datatype"),
                                     lang=v.get("lang"))
                else:
                    raise ValueError(f"unknown RDF/JSON value type: {t}")
                out.append((s, p, o))
    return out


def parse_jsonld(text: str) -> list[tuple]:
    """JSON-LD (EXPANDED form) → [(g_flat | None, s_flat, p_iri,
    o_term)] — same shape as ``parse_trig``.  Accepts a top-level node
    array, a single node object, or a {"@graph": [...]} wrapper; nodes
    may nest {"@id": g, "@graph": [...]} named-graph objects, @type
    (string or array), value objects ({"@value"/@language/@type}), node
    references ({"@id"}), and embedded node objects (parsed in place,
    @id-less ones mint fresh bnodes).  JSON native values coerce per
    the JSON-LD data model (number → xsd:integer/xsd:double, boolean →
    xsd:boolean).  Compacted documents are rejected up front: there is
    no @context processor here (the reference runs Sesame's full
    JSONLDParser; expanded form is its lossless interchange profile and
    round-trips this engine's own writer exactly)."""
    import json

    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    XSD = "http://www.w3.org/2001/XMLSchema#"
    doc = json.loads(text)
    out: list[tuple] = []
    bn = iter(range(1, 1 << 30))

    def flat(t: Term) -> str:
        return f"_:{t.lex}" if t.kind == 1 else t.lex

    def as_list(v):
        return v if isinstance(v, list) else [v]

    def subj_of(obj) -> Term:
        sid = obj.get("@id")
        if sid is None:
            return Term.bnode(f"jld{next(bn)}")
        return Term.bnode(sid[2:]) if sid.startswith("_:") else Term.iri(sid)

    def value_term(v, g):
        if isinstance(v, dict):
            if "@value" in v:
                val, dt, lang = v["@value"], v.get("@type"), v.get("@language")
                if isinstance(val, bool):
                    return Term.literal("true" if val else "false",
                                        dt=dt or XSD + "boolean")
                if isinstance(val, int):
                    return Term.literal(str(val), dt=dt or XSD + "integer")
                if isinstance(val, float):
                    return Term.literal(repr(val), dt=dt or XSD + "double")
                return Term.literal(val, dt=dt, lang=lang)
            if "@list" in v:
                raise ValueError("JSON-LD @list is not supported")
            if "@id" in v and len([k for k in v if k != "@id"]) == 0:
                sid = v["@id"]
                return (Term.bnode(sid[2:]) if sid.startswith("_:")
                        else Term.iri(sid))
            # embedded node object: emit its triples, reference its id
            return node(v, g)
        if isinstance(v, str):
            # expanded form always wraps values; tolerate a bare IRI
            return Term.iri(v)
        raise ValueError(f"unsupported JSON-LD value: {v!r}")

    def node(obj: dict, g: str | None) -> Term:
        if "@context" in obj:
            raise ValueError(
                "compacted JSON-LD (@context) is not supported — "
                "expand the document first")
        s = subj_of(obj)
        sf = flat(s)
        for k, vals in obj.items():
            if k == "@id":
                continue
            if k == "@graph":
                gname = obj.get("@id")
                for child in as_list(vals):
                    node(child, gname)
                continue
            if k == "@type":
                for tv in as_list(vals):
                    out.append((g, sf, RDF_TYPE, Term.iri(tv)))
                continue
            if k.startswith("@"):
                raise ValueError(f"unsupported JSON-LD keyword: {k}")
            for v in as_list(vals):
                out.append((g, sf, k, value_term(v, g)))
        return s

    if isinstance(doc, dict):
        doc = [doc]
    if not isinstance(doc, list):
        raise ValueError("JSON-LD document must be an array or object")
    for obj in doc:
        node(obj, None)
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


def parse_nquads_line(line: str):
    """One N-Quads line → (g|None, s, p, o Term) or None (blank/comment).
    N-Quads = the N-Triples grammar + an optional graph label before the
    terminating '.' (W3C N-Quads; reference rio/nquads/NQuadsParser)."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    p = _TurtleParser(line)
    s_t = p.parse_subject()
    p_t = p.parse_verb()
    o_t = p.parse_object()
    g_flat = None
    if p.peek()[1] not in (".", None):
        g_t = p.parse_term()
        g_flat = f"_:{g_t.lex}" if g_t.kind == 1 else g_t.lex
    if p.peek()[1] == ".":
        p.next()
    s_flat = f"_:{s_t.lex}" if s_t.kind == 1 else s_t.lex
    return (g_flat, s_flat, p_t.lex, o_t)


def load_nquads(spark, path: str):
    """Distributed N-Quads load: text lines → statements DataFrame with
    the graph column populated from the quad's graph label (NULL =
    default graph).  Line-at-a-time like load_ntriples, so input splits
    parse in parallel (reference rio/nquads/ + StatementBuffer.java:87)."""
    from bigdata_old_spark.model import STATEMENTS_SCHEMA, STYPE_EXPLICIT

    def part(lines):
        for row in lines:
            parsed = parse_nquads_line(row.value)
            if parsed is None:
                continue
            g, s, p, o = parsed
            kind, lex, dt, lang, num, dbl, dtm, b = o.as_row()
            yield (g, s, p, kind, lex, dt, lang, num, dbl, dtm, b, STYPE_EXPLICIT)

    lines = spark.read.text(path)
    return spark.createDataFrame(lines.rdd.mapPartitions(part), STATEMENTS_SCHEMA)


def parse_nquads(text: str) -> list[tuple]:
    """N-Quads text → [(g_flat | None, s_flat, p_iri, o_term)] — the
    same shape parse_trig returns, for round-trip checks."""
    out = []
    for line in text.splitlines():
        parsed = parse_nquads_line(line)
        if parsed is not None:
            out.append(parsed)
    return out


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


def load_rdf(spark, path: str, graph: str | None = None):
    """Format-dispatching document load for SPARQL LOAD (reference
    DataLoader + RDFFormat.forFileName: the format comes from the file
    extension, with ``.gz`` unwrapped first).  N-Triples streams
    distributed through :func:`load_ntriples` (Spark's text reader
    decompresses .gz transparently); Turtle / TriG / RDF-XML / N-Quads
    parse driver-side — document-scoped syntax (prefixes, bnode labels)
    needs the whole file; LOAD sources are documents, not corpora (bulk
    corpus ingest goes through the parquet mapping layer instead).
    ``graph`` (LOAD ... INTO GRAPH g) overrides every context."""
    import gzip as _gzip

    from bigdata_old_spark.model import statements_df_from_terms

    base = path[:-3] if path.endswith(".gz") else path
    ext = base.rsplit(".", 1)[-1].lower() if "." in base.rsplit("/", 1)[-1] else ""
    if ext in ("nt", "ntriples", ""):
        # distributed; spark.read.text handles .gz itself
        return load_ntriples(spark, path, graph=graph)
    if path.endswith(".gz"):
        with _gzip.open(path, "rt", encoding="utf-8") as f:
            text = f.read()
    else:
        with open(path, encoding="utf-8") as f:
            text = f.read()
    if ext in ("ttl", "turtle"):
        quads = [(graph, s, p, o) for s, p, o in parse_turtle(text)]
    elif ext == "trig":
        quads = [(graph if graph is not None else g, s, p, o)
                 for g, s, p, o in parse_trig(text)]
    elif ext == "nq":
        quads = [(graph if graph is not None else g, s, p, o)
                 for g, s, p, o in parse_nquads(text)]
    elif ext in ("rdf", "rdfs", "owl", "xml"):
        quads = [(graph, s, p, o) for s, p, o in parse_rdfxml(text)]
    else:
        raise ValueError(f"LOAD: unknown RDF format for {path!r}")
    return statements_df_from_terms(quads, spark)


# ---------------------------------------------------------------- RDF/XML

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XML_NS = "http://www.w3.org/XML/1998/namespace"
_XML_LANG = "{%s}lang" % _XML_NS
_XML_BASE = "{%s}base" % _XML_NS
# syntax-only attributes: never emitted as property triples
_SYNTAX_ATTRS = {
    "{%s}%s" % (_RDF_NS, n)
    for n in ("about", "ID", "nodeID", "resource", "datatype", "parseType",
              "aboutEach", "aboutEachPrefix", "bagID")
}


class _RdfXmlParser:
    """RDF/XML → triples (W3C RDF/XML syntax spec; reference parser:
    rio/rdfxml/ — we re-implement from the public grammar, not the
    reference code).  Covers node elements (typed + rdf:Description),
    rdf:about/ID/nodeID, property elements with rdf:resource/nodeID/
    datatype, xml:lang inheritance, xml:base resolution, property
    attributes, rdf:li containers, parseType Resource/Collection/
    Literal, and rdf:ID property reification."""

    def __init__(self, text: str, base: str = ""):
        import xml.etree.ElementTree as ET

        self._ET = ET
        self.root = ET.fromstring(text)
        self.base = base
        self.triples: list[tuple] = []
        self._bnode_ids = itertools.count()

    def fresh_bnode(self) -> Term:
        return Term.bnode(f"genid{next(self._bnode_ids)}")

    def _emit(self, s: Term, p: Term, o: Term):
        self.triples.append((s, p, o))

    def _resolve(self, ref: str, base: str) -> str:
        from urllib.parse import urljoin

        if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", ref):
            return ref
        if not base:
            return ref
        if ref == "":
            return base.split("#")[0]
        return urljoin(base, ref)

    def parse(self) -> list[tuple]:
        root = self.root
        base = root.get(_XML_BASE, self.base)
        lang = root.get(_XML_LANG, "")
        if root.tag == "{%s}RDF" % _RDF_NS:
            for child in root:
                self.node_element(child, base, lang)
        else:
            self.node_element(root, base, lang)
        return self.triples

    def node_element(self, el, base, lang) -> Term:
        base = el.get(_XML_BASE, base)
        lang = el.get(_XML_LANG, lang)
        about = el.get("{%s}about" % _RDF_NS)
        rid = el.get("{%s}ID" % _RDF_NS)
        node_id = el.get("{%s}nodeID" % _RDF_NS)
        if about is not None:
            subj = Term.iri(self._resolve(about, base))
        elif rid is not None:
            subj = Term.iri(self._resolve("#" + rid, base))
        elif node_id is not None:
            subj = Term.bnode(node_id)
        else:
            subj = self.fresh_bnode()

        # typed node element → rdf:type triple
        if el.tag != "{%s}Description" % _RDF_NS:
            self._emit(subj, Term.iri(RDF + "type"), Term.iri(self._qname_iri(el.tag)))

        # property attributes on the node element
        for attr, val in el.attrib.items():
            if attr in _SYNTAX_ATTRS or attr.startswith("{%s}" % _XML_NS):
                continue
            if attr == "{%s}type" % _RDF_NS:
                self._emit(subj, Term.iri(RDF + "type"), Term.iri(self._resolve(val, base)))
            elif attr.startswith("{"):
                self._emit(subj, Term.iri(self._qname_iri(attr)), Term.literal(val, lang=lang or None))

        li = itertools.count(1)
        for prop in el:
            self.property_element(prop, subj, base, lang, li)
        return subj

    def _qname_iri(self, tag: str) -> str:
        # ElementTree tags/attrs arrive as {namespace}local
        if tag.startswith("{"):
            ns, local = tag[1:].split("}", 1)
            return ns + local
        return tag

    def property_element(self, el, subj, base, lang, li):
        base = el.get(_XML_BASE, base)
        lang = el.get(_XML_LANG, lang)
        tag = el.tag
        if tag == "{%s}li" % _RDF_NS:
            pred = Term.iri(RDF + "_%d" % next(li))
        else:
            pred = Term.iri(self._qname_iri(tag))

        parse_type = el.get("{%s}parseType" % _RDF_NS)
        resource = el.get("{%s}resource" % _RDF_NS)
        node_id = el.get("{%s}nodeID" % _RDF_NS)
        datatype = el.get("{%s}datatype" % _RDF_NS)
        rid = el.get("{%s}ID" % _RDF_NS)

        prop_attrs = [
            (a, v) for a, v in el.attrib.items()
            if a not in _SYNTAX_ATTRS and not a.startswith("{%s}" % _XML_NS)
            and a.startswith("{")
        ]

        obj: Term
        if parse_type == "Resource":
            obj = self.fresh_bnode()
            li2 = itertools.count(1)
            for sub in el:
                self.property_element(sub, obj, base, lang, li2)
        elif parse_type == "Collection":
            items = [self.node_element(c, base, lang) for c in el]
            obj = Term.iri(RDF + "nil")
            prev = None
            chain = []
            for it in items:
                cell = self.fresh_bnode()
                chain.append((cell, it))
            for i, (cell, it) in enumerate(chain):
                self._emit(cell, Term.iri(RDF + "first"), it)
                nxt = chain[i + 1][0] if i + 1 < len(chain) else Term.iri(RDF + "nil")
                self._emit(cell, Term.iri(RDF + "rest"), nxt)
            if chain:
                obj = chain[0][0]
        elif parse_type == "Literal":
            inner = (el.text or "") + "".join(
                self._ET.tostring(c, encoding="unicode") for c in el
            )
            obj = Term.literal(inner, dt=RDF + "XMLLiteral")
        elif resource is not None:
            obj = Term.iri(self._resolve(resource, base))
        elif node_id is not None:
            obj = Term.bnode(node_id)
        elif len(el) > 0:
            obj = self.node_element(el[0], base, lang)
        elif prop_attrs:
            # property attributes with no resource → bnode object
            obj = self.fresh_bnode()
        else:
            text = el.text or ""
            if datatype:
                obj = Term.literal(text, dt=self._resolve(datatype, base))
            else:
                obj = Term.literal(text, lang=lang or None)

        self._emit(subj, pred, obj)

        for a, v in prop_attrs:
            if a == "{%s}type" % _RDF_NS:
                self._emit(obj, Term.iri(RDF + "type"), Term.iri(self._resolve(v, base)))
            else:
                self._emit(obj, Term.iri(self._qname_iri(a)), Term.literal(v, lang=lang or None))

        if rid is not None:
            # rdf:ID on a property element reifies the statement
            stmt = Term.iri(self._resolve("#" + rid, base))
            self._emit(stmt, Term.iri(RDF + "type"), Term.iri(RDF + "Statement"))
            self._emit(stmt, Term.iri(RDF + "subject"), subj)
            self._emit(stmt, Term.iri(RDF + "predicate"), pred)
            self._emit(stmt, Term.iri(RDF + "object"), obj)


def parse_rdfxml(text: str, base: str = "") -> list[tuple[str, str, "Term"]]:
    """RDF/XML → [(s_flat, p_iri, o_term)] — same shape as
    ``parse_turtle``."""
    out = []
    for s, p, o in _RdfXmlParser(text, base).parse():
        s_flat = f"_:{s.lex}" if s.kind == 1 else s.lex
        out.append((s_flat, p.lex, o))
    return out
