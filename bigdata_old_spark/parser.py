"""SPARQL 1.1 query parser — pure-Python recursive descent.

Replaces the reference's JavaCC SyntaxTreeBuilder + BigdataExprBuilder
visitor (bigdata-sails/.../sail/sparql/Bigdata2ASTSPARQLParser.java:85)
with a single tokenizer + recursive-descent pass that builds the
algebra of algebra.py directly (parse tree and AST collapse into one —
our ASTContainer equivalent is (query string, algebra, DataFrame plan)).

Covers: SELECT/ASK/CONSTRUCT/DESCRIBE, prologue, BGPs with ';'/','/'a'
and bnode/collection sugar, property paths (| / ^ ! * + ? and braces),
FILTER (incl. EXISTS/NOT EXISTS), OPTIONAL, MINUS, UNION, BIND, VALUES
(inline + trailing), GRAPH, sub-SELECT, GROUP BY/HAVING/ORDER BY/
LIMIT/OFFSET, DISTINCT/REDUCED, aggregates with DISTINCT + SEPARATOR,
all builtin functions of functions.py, xsd casts, IN/NOT IN.

Blank nodes in query patterns are non-distinguished variables per the
spec (we name them _bnode_*).
"""

from __future__ import annotations

import itertools
import re

from bigdata_old_spark import algebra as A
from bigdata_old_spark.model import (
    RDF,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    Term,
)
from bigdata_old_spark.rio import _unescape

_TOKEN_RE = re.compile(
    r"""
    (?P<COMMENT>\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
  | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<SOLSET>%[A-Za-z_][A-Za-z0-9_]*)
  | (?P<STRING_LONG>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<STRING>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<DOUBLE>(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
  | (?P<DECIMAL>\d*\.\d+)
  | (?P<INTEGER>\d+)
  | (?P<BNODE>_:[A-Za-z0-9][A-Za-z0-9_.-]*)
  | (?P<ASSIGN>:=)
  | (?P<PNAME>[A-Za-z][A-Za-z0-9_-]*:[A-Za-z0-9_](?:[A-Za-z0-9_.%-]*[A-Za-z0-9_%-])?|[A-Za-z][A-Za-z0-9_-]*:|:[A-Za-z0-9_](?:[A-Za-z0-9_.%-]*[A-Za-z0-9_%-])?|:)
  | (?P<WORD>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<OP>\^\^|&&|\|\||!=|<=|>=|:=|[{}()\[\].,;*+/|^?!<>=-])
  | (?P<WS>\s+)
    """,
    re.VERBOSE,
)

_bnode_ids = itertools.count()


class ParseError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks: list[tuple[str, str]] = []
        pos = 0
        for m in _TOKEN_RE.finditer(text):
            if m.start() != pos:
                raise ParseError(f"cannot tokenize at …{text[pos:pos+30]!r}")
            pos = m.end()
            if m.lastgroup in ("WS", "COMMENT"):
                continue
            kind = "OP" if m.lastgroup == "ASSIGN" else m.lastgroup
            self.toks.append((kind, m.group()))
        if pos != len(text):
            raise ParseError(f"cannot tokenize at …{text[pos:pos+30]!r}")
        self.i = 0
        #: pending RDR desugarings: (sid_var, s, p, o) recorded while
        #: parsing ``<<…>>`` terms, drained into the enclosing group
        self._sid_pending: list[tuple] = []
        self.prefixes: dict[str, str] = {}
        self.base = ""

    # -- token helpers -------------------------------------------------------
    def peek(self, ahead: int = 0):
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def at_word(self, *words: str) -> bool:
        k, v = self.peek()
        return k == "WORD" and v.upper() in words

    def take_word(self, *words: str) -> bool:
        if self.at_word(*words):
            self.next()
            return True
        return False

    def expect_word(self, word: str):
        if not self.take_word(word):
            raise ParseError(f"expected {word} at {self.peek()}")

    def at_op(self, op: str) -> bool:
        k, v = self.peek()
        return k == "OP" and v == op

    def take_op(self, op: str) -> bool:
        if self.at_op(op):
            self.next()
            return True
        return False

    def expect_op(self, op: str):
        if not self.take_op(op):
            raise ParseError(f"expected {op!r} at {self.peek()} (token {self.i})")

    # -- prologue --------------------------------------------------------------
    def parse_prologue(self):
        while True:
            if self.take_word("PREFIX"):
                k, v = self.next()
                if k != "PNAME":
                    raise ParseError("bad PREFIX")
                pfx = v[:-1] if v.endswith(":") else v.split(":")[0]
                k2, v2 = self.next()
                if k2 != "IRIREF":
                    raise ParseError("bad PREFIX IRI")
                self.prefixes[pfx] = v2[1:-1]
            elif self.take_word("BASE"):
                k2, v2 = self.next()
                self.base = v2[1:-1]
            else:
                return

    #: silently-declared well-known prefixes (reference
    #: PrefixDeclProcessor.java:193 checkForWellKnownNamespacePrefix —
    #: queries may use hint:/bds:/bd:/… without a PREFIX decl)
    WELL_KNOWN_PREFIXES = {
        "bd": "http://www.bigdata.com/rdf#",
        "bds": "http://www.bigdata.com/rdf/search#",
        "hint": "http://www.bigdata.com/queryHints#",
        "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
        "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
        "xsd": "http://www.w3.org/2001/XMLSchema#",
        "foaf": "http://xmlns.com/foaf/0.1/",
        "fn": "http://www.w3.org/2005/xpath-functions#",
        "owl": "http://www.w3.org/2002/07/owl#",
        "sesame": "http://www.openrdf.org/schema/sesame#",
        "gas": "http://www.bigdata.com/rdf/gas#",
    }

    # -- terms -------------------------------------------------------------------
    def resolve_pname(self, v: str) -> str:
        pfx, _, local = v.partition(":")
        if pfx not in self.prefixes:
            wk = self.WELL_KNOWN_PREFIXES.get(pfx)
            if wk is None:
                raise ParseError(f"undefined prefix '{pfx}:'")
            self.prefixes[pfx] = wk
        return self.prefixes[pfx] + local

    def parse_iri(self) -> Term:
        k, v = self.next()
        if k == "IRIREF":
            iri = v[1:-1]
            if self.base and not re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", iri):
                iri = self.base + iri
            return Term.iri(iri)
        if k == "PNAME":
            return Term.iri(self.resolve_pname(v))
        raise ParseError(f"expected IRI, got {v!r}")

    def parse_var(self) -> A.Var:
        k, v = self.next()
        if k != "VAR":
            raise ParseError(f"expected variable, got {v!r}")
        return A.Var(v[1:])

    def parse_literal(self) -> Term:
        k, v = self.next()
        if k in ("STRING", "STRING_LONG"):
            lex = _unescape(v[3:-3] if k == "STRING_LONG" else v[1:-1])
            nk, nv = self.peek()
            if nk == "LANGTAG":
                self.next()
                return Term.literal(lex, lang=nv[1:])
            if nk == "OP" and nv == "^^":
                self.next()
                dt = self.parse_iri()
                return Term.literal(lex, dt=dt.lex)
            return Term.literal(lex)
        if k == "INTEGER":
            return Term.literal(v, dt=XSD_INTEGER)
        if k == "DECIMAL":
            return Term.literal(v, dt=XSD_DECIMAL)
        if k == "DOUBLE":
            return Term.literal(v, dt=XSD_DOUBLE)
        if k == "WORD" and v.lower() in ("true", "false"):
            return Term.literal(v.lower(), dt=XSD_BOOLEAN)
        raise ParseError(f"expected literal, got {v!r}")

    def at_literal_start(self) -> bool:
        k, v = self.peek()
        return k in ("STRING", "STRING_LONG", "INTEGER", "DECIMAL", "DOUBLE") or (
            k == "WORD" and v.lower() in ("true", "false")
        )

    def parse_signed_literal(self) -> Term:
        """For VALUES blocks and object positions: optional sign."""
        sign = ""
        if self.at_op("-"):
            self.next()
            sign = "-"
        elif self.at_op("+"):
            self.next()
        t = self.parse_literal()
        if sign:
            t = Term(t.kind, sign + t.lex, t.dt, t.lang)
        return t

    # -- query entry -----------------------------------------------------------
    def parse_query(self):
        self.parse_prologue()
        if self.at_word("SELECT"):
            q = self.parse_select(top=True)
        elif self.at_word("ASK"):
            q = self.parse_ask()
        elif self.at_word("CONSTRUCT"):
            q = self.parse_construct()
        elif self.at_word("DESCRIBE"):
            q = self.parse_describe()
        else:
            raise ParseError(f"expected query form at {self.peek()}")
        if self.peek()[0] is not None:
            raise ParseError(f"trailing tokens at {self.peek()}")
        return q

    def parse_dataset_clauses(self):
        """FROM <g> / FROM NAMED <g> → Dataset (DataSetJoin analog)."""
        default: list = []
        named: list = []
        vdefault: list = []
        vnamed: list = []
        while self.take_word("FROM"):
            is_named = bool(self.take_word("NAMED"))
            if self.take_word("VIRTUAL"):
                self.expect_word("GRAPH")
                (vnamed if is_named else vdefault).append(self.parse_iri().lex)
            elif is_named:
                named.append(self.parse_iri().lex)
            else:
                default.append(self.parse_iri().lex)
        if not (default or named or vdefault or vnamed):
            return None
        return A.Dataset(default or None, named or None, vdefault or None, vnamed or None)

    def parse_select(self, top: bool = False) -> A.SelectQuery:
        self.expect_word("SELECT")
        q = A.SelectQuery(pattern=None)
        if self.take_word("DISTINCT"):
            q.distinct = True
        elif self.take_word("REDUCED"):
            q.reduced = True
        if self.take_op("*"):
            q.wildcard = True
        else:
            while True:
                k, v = self.peek()
                if k == "VAR":
                    q.projection.append((self.parse_var().name, None))
                elif self.at_op("("):
                    self.next()
                    e = self.parse_expr()
                    self.expect_word("AS")
                    var = self.parse_var()
                    self.expect_op(")")
                    q.projection.append((var.name, e))
                else:
                    break
        q.dataset = self.parse_dataset_clauses()
        # named subqueries: WITH { SELECT … } AS %name (reference grammar,
        # sparql/ast/NamedSubqueryRoot — evaluated once, joined at INCLUDE)
        while self.take_word("WITH"):
            grp = self.parse_group()
            self.expect_word("AS")
            q.named.append((self.parse_solset(), grp))
        self.take_word("WHERE")
        q.pattern = self.parse_group()
        self.parse_solution_modifiers(q)
        if self.take_word("VALUES"):
            q.values = self.parse_values_body()
        elif self.take_word("BINDINGS"):
            # SPARQL 1.1 draft BINDINGS clause (pre-VALUES syntax, kept
            # by the reference grammar: bare var list, parenthesized rows)
            names: list[str] = []
            while self.peek()[0] == "VAR":
                names.append(self.parse_var().name)
            self.expect_op("{")
            rows: list[list] = []
            while self.at_op("("):
                self.next()
                row = []
                while not self.at_op(")"):
                    row.append(self.parse_values_term())
                self.expect_op(")")
                rows.append(row)
            self.expect_op("}")
            q.values = A.ValuesPat(names, rows)
        return q

    def parse_ask(self) -> A.AskQuery:
        self.expect_word("ASK")
        ds = self.parse_dataset_clauses()
        self.take_word("WHERE")
        pattern = self.parse_group()
        values = self.parse_values_body() if self.take_word("VALUES") else None
        return A.AskQuery(pattern, values, ds)

    def parse_construct(self) -> A.ConstructQuery:
        self.expect_word("CONSTRUCT")
        ds = None
        if self.at_op("{"):
            template = self.parse_construct_template()
            ds = self.parse_dataset_clauses()
            self.take_word("WHERE")
            pattern = self.parse_group()
        else:  # CONSTRUCT WHERE { triples } shorthand
            ds = self.parse_dataset_clauses()
            self.expect_word("WHERE")
            template_pat = self.parse_group()
            pattern = template_pat
            template = _collect_triples(template_pat)
        q = A.ConstructQuery(template, pattern, dataset=ds)
        mods = A.SelectQuery(pattern=None)
        self.parse_solution_modifiers(mods)
        q.limit, q.offset = mods.limit, mods.offset
        return q

    def parse_describe(self) -> A.DescribeQuery:
        self.expect_word("DESCRIBE")
        terms: list = []
        if self.take_op("*"):
            pass
        else:
            while True:
                k, v = self.peek()
                if k == "VAR":
                    terms.append(self.parse_var())
                elif k in ("IRIREF", "PNAME"):
                    terms.append(self.parse_iri())
                else:
                    break
        ds = self.parse_dataset_clauses()
        pattern = None
        if self.take_word("WHERE") or self.at_op("{"):
            pattern = self.parse_group()
        mods = A.SelectQuery(pattern=None)
        self.parse_solution_modifiers(mods)
        return A.DescribeQuery(terms, pattern, dataset=ds)

    def parse_construct_template(self) -> list:
        self.expect_op("{")
        acc = A.BGP()
        while not self.at_op("}"):
            self.parse_triples_same_subject(acc)
            if not self.take_op("."):
                break
        self.expect_op("}")
        return acc.triples

    def parse_solution_modifiers(self, q: A.SelectQuery):
        if self.take_word("GROUP"):
            self.expect_word("BY")
            q.group_by = []
            while True:
                k, v = self.peek()
                if k == "VAR":
                    q.group_by.append((None, self.parse_var()))
                elif self.at_op("("):
                    self.next()
                    e = self.parse_expr()
                    alias = None
                    if self.take_word("AS"):
                        alias = self.parse_var().name
                    self.expect_op(")")
                    q.group_by.append((alias, e))
                elif k == "WORD" and v.upper() in _BUILTIN_WORDS:
                    q.group_by.append((None, self.parse_primary_expr()))
                else:
                    break
        if self.take_word("HAVING"):
            while self.at_op("(") or (self.peek()[0] == "WORD" and self.peek()[1].upper() in _BUILTIN_WORDS):
                q.having.append(self.parse_constraint())
        if self.take_word("ORDER"):
            self.expect_word("BY")
            while True:
                if self.take_word("ASC"):
                    self.expect_op("(")
                    e = self.parse_expr()
                    self.expect_op(")")
                    q.order_by.append((e, True))
                elif self.take_word("DESC"):
                    self.expect_op("(")
                    e = self.parse_expr()
                    self.expect_op(")")
                    q.order_by.append((e, False))
                elif self.peek()[0] == "VAR":
                    q.order_by.append((self.parse_var(), True))
                elif self.at_op("("):
                    self.next()
                    e = self.parse_expr()
                    self.expect_op(")")
                    q.order_by.append((e, True))
                elif self.peek()[0] == "WORD" and self.peek()[1].upper() in _BUILTIN_WORDS:
                    q.order_by.append((self.parse_primary_expr(), True))
                else:
                    break
        # LIMIT/OFFSET in either order
        for _ in range(2):
            if self.take_word("LIMIT"):
                q.limit = int(self.next()[1])
            elif self.take_word("OFFSET"):
                q.offset = int(self.next()[1])

    def parse_solset(self) -> str:
        k, v = self.next()
        if k != "SOLSET":
            raise ParseError(f"expected %name at ({k}, {v})")
        return v[1:]

    # -- group graph patterns -----------------------------------------------------
    def parse_group(self):
        self.expect_op("{")
        if self.at_word("SELECT"):
            sub = self.parse_select()
            self.expect_op("}")
            return A.SubSelect(sub)
        acc = None  # current algebra
        bgp = A.BGP()
        filters: list = []

        def flush_bgp():
            nonlocal acc, bgp
            if bgp.triples:
                acc = bgp if acc is None else A.Join(acc, bgp)
                bgp = A.BGP()

        def add(node):
            nonlocal acc
            flush_bgp()
            acc = node if acc is None else A.Join(acc, node)

        while not self.at_op("}"):
            if self.take_word("FILTER"):
                filters.append(self.parse_constraint())
            elif self.take_word("OPTIONAL"):
                inner = self.parse_group()
                # all top-level filters of the OPTIONAL group become the
                # LeftJoin condition (they may reference left-side vars)
                cond = None
                while isinstance(inner, A.FilterPat):
                    cond = inner.expr if cond is None else A.FuncCall("&&", (cond, inner.expr))
                    inner = inner.child
                flush_bgp()
                left = acc if acc is not None else A.BGP()
                acc = A.LeftJoin(left, inner, cond)
            elif self.take_word("MINUS"):
                inner = self.parse_group()
                flush_bgp()
                left = acc if acc is not None else A.BGP()
                acc = A.MinusPat(left, inner)
            elif self.take_word("BIND"):
                self.expect_op("(")
                if self.at_rdr_open():
                    # BIND(<<s p o>> AS ?sid) — RDR in expression position
                    s_, p_, o_ = self.parse_rdr_triple(bgp)
                    self.expect_word("AS")
                    var = self.parse_var()
                    self.expect_op(")")
                    add(A.Extend(
                        A.BGP([A.TriplePattern(s_, p_, o_)]),
                        var.name,
                        self._sid_expr(self.SID_OF, s_, p_, o_),
                    ))
                    self.take_op(".")
                    continue
                e = self.parse_expr()
                self.expect_word("AS")
                var = self.parse_var()
                self.expect_op(")")
                flush_bgp()
                base = acc if acc is not None else A.BGP()
                acc = A.Extend(base, var.name, e)
            elif self.take_word("LET"):
                # bigdata extension: LET (?v := expr) ≡ BIND(expr AS ?v)
                # (reference BigdataExprBuilder LET support)
                self.expect_op("(")
                var = self.parse_var()
                self.expect_op(":=")
                e = self.parse_expr()
                self.expect_op(")")
                flush_bgp()
                base = acc if acc is not None else A.BGP()
                acc = A.Extend(base, var.name, e)
            elif self.at_word("INCLUDE") and self.peek(1)[0] == "SOLSET":
                self.next()
                add(A.IncludePat(self.parse_solset()))
            elif self.take_word("VALUES"):
                add(self.parse_values_body())
            elif self.take_word("GRAPH"):
                k, v = self.peek()
                g = self.parse_var() if k == "VAR" else self.parse_iri()
                inner = self.parse_group()
                add(A.GraphPat(g, inner))
            elif self.take_word("SERVICE"):
                silent = self.take_word("SILENT")
                # SPARQL 1.1 Federated Query: ServiceGraphPattern ::=
                # 'SERVICE' 'SILENT'? VarOrIri GroupGraphPattern — a
                # variable endpoint is resolved per outer binding at
                # evaluation (ServiceCallJoin with a Var serviceRef)
                k, _ = self.peek()
                iri = self.parse_var() if k == "VAR" else self.parse_iri()
                start = self.i
                inner = self.parse_group()
                raw = _detokenize(self.toks[start:self.i])
                add(A.ServicePat(iri, inner, silent, raw, tuple(self.prefixes.items())))
            elif self.at_op("{"):
                # GroupOrUnionGraphPattern
                node = self.parse_group()
                while self.take_word("UNION"):
                    node = A.UnionPat(node, self.parse_group())
                add(node)
            else:
                self.parse_triples_same_subject(bgp)
                while self._sid_pending:
                    name, s_, p_, o_ = self._sid_pending.pop(0)
                    add(A.Extend(
                        A.BGP([A.TriplePattern(s_, p_, o_)]),
                        name,
                        self._sid_expr(self.SID_OF, s_, p_, o_),
                    ))
                self.take_op(".")
                continue
            self.take_op(".")
        self.expect_op("}")
        flush_bgp()
        if acc is None:
            acc = A.BGP()
        for f in filters:
            acc = A.FilterPat(f, acc)
        return acc

    def parse_constraint(self):
        k, v = self.peek()
        if self.at_op("("):
            self.next()
            e = self.parse_expr()
            self.expect_op(")")
            return e
        return self.parse_primary_expr()

    def parse_values_body(self) -> A.ValuesPat:
        names: list[str] = []
        rows: list[list] = []
        if self.peek()[0] == "VAR":
            names = [self.parse_var().name]
            self.expect_op("{")
            while not self.at_op("}"):
                rows.append([self.parse_values_term()])
            self.expect_op("}")
        else:
            self.expect_op("(")
            while not self.at_op(")"):
                names.append(self.parse_var().name)
            self.expect_op(")")
            self.expect_op("{")
            while self.at_op("("):
                self.next()
                row = []
                while not self.at_op(")"):
                    row.append(self.parse_values_term())
                self.expect_op(")")
                rows.append(row)
            self.expect_op("}")
        return A.ValuesPat(names, rows)

    def parse_values_term(self):
        if self.take_word("UNDEF"):
            return None
        k, v = self.peek()
        if k in ("IRIREF", "PNAME"):
            return self.parse_iri()
        return self.parse_signed_literal()

    # -- triples ------------------------------------------------------------------
    def parse_triples_same_subject(self, bgp: A.BGP):
        k, v = self.peek()
        if self.at_op("["):
            s = self.parse_bnode_props(bgp)
            if not (self.at_op(".") or self.at_op("}") or self.peek()[0] is None):
                self.parse_property_list(s, bgp)
        elif self.at_op("("):
            s = self.parse_collection_node(bgp)
            self.parse_property_list(s, bgp)
        else:
            s = self.parse_var_or_term(bgp)
            self.parse_property_list(s, bgp)

    # RDR / reification-done-right: ``<<s p o>>`` in a triple or BIND
    # position (reference TestReificationDoneRightEval; SIDs mode,
    # AbstractTripleStore.java:787).  Desugars to (a) the statement
    # pattern itself — the triple must be asserted — joined with (b) a
    # BIND of the deterministic SID (provenance.sid_col encoding) to the
    # variable standing in for the embedded triple.
    SID_OF = "urn:x-bdos:sidOf"

    def at_rdr_open(self) -> bool:
        return self.at_op("<") and self.peek(1) == ("OP", "<")

    def parse_rdr_triple(self, bgp: A.BGP):
        """Consume ``<<s p o>>`` and return its (s, p, o)."""
        self.next()
        self.next()
        s = self.parse_var_or_term(bgp)
        p = self.parse_verb()
        o = self.parse_var_or_term(bgp)
        self.expect_op(">")
        self.expect_op(">")
        return s, p, o

    @staticmethod
    def _sid_expr(name: str, s, p, o) -> A.FuncCall:
        """sidOf(s, p, o) with pattern terms lifted to expression nodes."""
        args = tuple(a if isinstance(a, A.Var) else A.Const(a) for a in (s, p, o))
        return A.FuncCall(name, args)

    def parse_var_or_term(self, bgp: A.BGP):
        k, v = self.peek()
        if self.at_rdr_open():
            s, p, o = self.parse_rdr_triple(bgp)
            var = A.Var(f"_sid_anon{next(_bnode_ids)}")
            self._sid_pending.append((var.name, s, p, o))
            return var
        if k == "OP" and v in ("}", ".", ";", ",", ")"):
            raise ParseError(
                f"incomplete triple pattern: expected a term before {v!r} "
                "(subject predicate object required)"
            )
        if k == "VAR":
            return self.parse_var()
        if k == "BNODE":
            self.next()
            return A.Var(f"_bnode_{v[2:]}")
        if k in ("IRIREF", "PNAME"):
            return self.parse_iri()
        if self.at_op("["):
            return self.parse_bnode_props(bgp)
        if self.at_op("("):
            return self.parse_collection_node(bgp)
        return self.parse_signed_literal()

    def parse_bnode_props(self, bgp: A.BGP):
        self.expect_op("[")
        node = A.Var(f"_bnode_anon{next(_bnode_ids)}")
        if not self.at_op("]"):
            self.parse_property_list(node, bgp)
        self.expect_op("]")
        return node

    def parse_collection_node(self, bgp: A.BGP):
        self.expect_op("(")
        items = []
        while not self.at_op(")"):
            items.append(self.parse_var_or_term(bgp))
        self.expect_op(")")
        if not items:
            return Term.iri(RDF + "nil")
        head = A.Var(f"_bnode_coll{next(_bnode_ids)}")
        cur = head
        for i, item in enumerate(items):
            bgp.triples.append(A.TriplePattern(cur, Term.iri(RDF + "first"), item))
            nxt = A.Var(f"_bnode_coll{next(_bnode_ids)}") if i + 1 < len(items) else Term.iri(RDF + "nil")
            bgp.triples.append(A.TriplePattern(cur, Term.iri(RDF + "rest"), nxt))
            cur = nxt
        return head

    def parse_property_list(self, s, bgp: A.BGP):
        while True:
            p = self.parse_verb()
            while True:
                o = self.parse_var_or_term(bgp)
                bgp.triples.append(A.TriplePattern(s, p, o))
                if self.take_op(","):
                    continue
                break
            if self.take_op(";"):
                if self.at_op(".") or self.at_op("}") or self.at_op("]") or self.peek()[0] is None:
                    return
                continue
            return

    def parse_verb(self):
        k, v = self.peek()
        if k == "VAR":
            return self.parse_var()
        if k == "WORD" and v == "a":
            self.next()
            return Term.iri(RDF + "type")
        return self.parse_path()

    # -- property paths -------------------------------------------------------------
    def parse_path(self):
        p = self.parse_path_sequence()
        while self.take_op("|"):
            q = self.parse_path_sequence()
            p = A.PathAlt(_alts(p) + _alts(q))
        return _simplify_path(p)

    def parse_path_sequence(self):
        steps = [self.parse_path_elt_or_inverse()]
        while self.take_op("/"):
            steps.append(self.parse_path_elt_or_inverse())
        if len(steps) == 1:
            return steps[0]
        return A.PathSeq(tuple(steps))

    def parse_path_elt_or_inverse(self):
        if self.take_op("^"):
            return A.PathInv(self.parse_path_elt())
        return self.parse_path_elt()

    def parse_path_elt(self):
        prim = self.parse_path_primary()
        if self.take_op("*"):
            return A.PathStar(prim, 0, None)
        if self.take_op("+"):
            return A.PathStar(prim, 1, None)
        if self.take_op("?"):
            return A.PathStar(prim, 0, 1)
        return prim

    def parse_path_primary(self):
        k, v = self.peek()
        if self.at_op("("):
            self.next()
            p = self.parse_path()
            self.expect_op(")")
            return p
        if self.at_op("!"):
            self.next()
            return self.parse_path_negated()
        if k == "WORD" and v == "a":
            self.next()
            return A.PathLink(RDF + "type")
        return A.PathLink(self.parse_iri().lex)

    def parse_path_negated(self):
        fwd: list[str] = []
        inv: list[str] = []

        def one():
            if self.take_op("^"):
                if self.at_word("A"):
                    pass
                k, v = self.peek()
                if k == "WORD" and v == "a":
                    self.next()
                    inv.append(RDF + "type")
                else:
                    inv.append(self.parse_iri().lex)
            else:
                k, v = self.peek()
                if k == "WORD" and v == "a":
                    self.next()
                    fwd.append(RDF + "type")
                else:
                    fwd.append(self.parse_iri().lex)

        if self.take_op("("):
            one()
            while self.take_op("|"):
                one()
            self.expect_op(")")
        else:
            one()
        return A.PathNeg(tuple(fwd), tuple(inv))

    # -- expressions -------------------------------------------------------------------
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        e = self.parse_and()
        while self.take_op("||"):
            e = A.FuncCall("||", (e, self.parse_and()))
        return e

    def parse_and(self):
        e = self.parse_relational()
        while self.take_op("&&"):
            e = A.FuncCall("&&", (e, self.parse_relational()))
        return e

    def parse_relational(self):
        e = self.parse_additive()
        for op in ("<=", ">=", "!=", "=", "<", ">"):
            if self.at_op(op):
                self.next()
                return A.FuncCall(op, (e, self.parse_additive()))
        if self.at_word("IN"):
            self.next()
            return A.FuncCall("IN", (e, *self.parse_expr_list()))
        if self.at_word("NOT"):
            self.next()
            self.expect_word("IN")
            return A.FuncCall("NOT IN", (e, *self.parse_expr_list()))
        return e

    def parse_expr_list(self) -> tuple:
        self.expect_op("(")
        args = []
        if not self.at_op(")"):
            args.append(self.parse_expr())
            while self.take_op(","):
                args.append(self.parse_expr())
        self.expect_op(")")
        return tuple(args)

    def parse_additive(self):
        e = self.parse_multiplicative()
        while True:
            if self.take_op("+"):
                e = A.FuncCall("+", (e, self.parse_multiplicative()))
            elif self.take_op("-"):
                e = A.FuncCall("-", (e, self.parse_multiplicative()))
            else:
                return e

    def parse_multiplicative(self):
        e = self.parse_unary()
        while True:
            if self.take_op("*"):
                e = A.FuncCall("*", (e, self.parse_unary()))
            elif self.take_op("/"):
                e = A.FuncCall("/", (e, self.parse_unary()))
            else:
                return e

    def parse_unary(self):
        if self.take_op("!"):
            return A.FuncCall("!", (self.parse_unary(),))
        if self.take_op("-"):
            return A.FuncCall("-", (self.parse_unary(),))
        if self.take_op("+"):
            return self.parse_unary()
        return self.parse_primary_expr()

    def parse_primary_expr(self):
        k, v = self.peek()
        if self.at_op("("):
            self.next()
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if k == "VAR":
            return self.parse_var()
        if k in ("IRIREF", "PNAME"):
            iri = self.parse_iri()
            if self.at_op("("):  # xsd cast / extension function / custom agg
                from bigdata_old_spark.registry import lookup_aggregate

                if lookup_aggregate(iri.lex) is not None:
                    self.expect_op("(")
                    distinct = self.take_word("DISTINCT")
                    e = self.parse_expr()
                    self.expect_op(")")
                    return A.Aggregate(iri.lex, e, distinct)
                args = self.parse_expr_list()
                return A.FuncCall(iri.lex, args)
            return A.Const(iri)
        if self.at_literal_start():
            return A.Const(self.parse_literal())
        if k == "WORD":
            W = v.upper()
            if W in ("EXISTS", "NOT"):
                negated = False
                if W == "NOT":
                    self.next()
                    self.expect_word("EXISTS")
                    negated = True
                else:
                    self.next()
                pattern = self.parse_group()
                return A.ExistsExpr(pattern, negated)
            if W in _AGG_WORDS:
                return self.parse_aggregate()
            if W in _BUILTIN_WORDS:
                self.next()
                args = self.parse_expr_list() if self.at_op("(") else ()
                return A.FuncCall(W, args)
        raise ParseError(f"unexpected token in expression: {v!r}")

    def parse_aggregate(self):
        _, v = self.next()
        name = v.upper()
        self.expect_op("(")
        distinct = self.take_word("DISTINCT")
        if name == "COUNT" and self.take_op("*"):
            self.expect_op(")")
            return A.Aggregate("COUNT", None, distinct)
        e = self.parse_expr()
        sep = " "
        if name == "GROUP_CONCAT" and self.take_op(";"):
            self.expect_word("SEPARATOR")
            self.expect_op("=")
            sep = self.parse_literal().lex
        self.expect_op(")")
        return A.Aggregate(name, e, distinct, sep)


_AGG_WORDS = {"COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT"}
_BUILTIN_WORDS = {
    "STR", "LANG", "LANGMATCHES", "DATATYPE", "BOUND", "IRI", "URI", "BNODE",
    "RAND", "ABS", "CEIL", "FLOOR", "ROUND", "CONCAT", "STRLEN", "UCASE",
    "LCASE", "ENCODE_FOR_URI", "CONTAINS", "STRSTARTS", "STRENDS", "STRBEFORE",
    "STRAFTER", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS",
    "TIMEZONE", "TZ", "NOW", "UUID", "STRUUID", "MD5", "SHA1", "SHA256",
    "SHA384", "SHA512", "COALESCE", "IF", "STRLANG", "STRDT", "SAMETERM",
    "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC", "REGEX", "SUBSTR",
    "REPLACE",
} | _AGG_WORDS


def _detokenize(toks: list[tuple[str, str]]) -> str:
    """Tokens → SPARQL text.  Space-joined except where the grammar
    forbids whitespace (string@lang, string^^dt)."""
    out: list[str] = []
    for j, (k, v) in enumerate(toks):
        if out and not (k == "LANGTAG" or v == "^^" or (j > 0 and toks[j - 1][1] == "^^")):
            out.append(" ")
        out.append(v)
    return "".join(out)


def _alts(p) -> tuple:
    return p.alts if isinstance(p, A.PathAlt) else (p,)


def _simplify_path(p):
    """A path that is just an IRI link compiles as a plain predicate."""
    if isinstance(p, A.PathLink):
        return Term.iri(p.iri)
    return p


def _collect_triples(node) -> list:
    if isinstance(node, A.BGP):
        return list(node.triples)
    if isinstance(node, A.Join):
        return _collect_triples(node.left) + _collect_triples(node.right)
    raise ParseError("CONSTRUCT WHERE shorthand requires a plain BGP")


def parse_query(text: str):
    """SPARQL query string → algebra Query."""
    return _Parser(text).parse_query()
