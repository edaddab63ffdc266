"""RDF term + statement data model on Spark.

The reference encodes RDF terms as ``IV``s — inline values carry the
typed value in the B+Tree key itself so comparisons never touch the
lexicon (reference: bigdata-rdf/.../internal/IV.java:53,
LexiconConfiguration.java).  We take that idea to its conclusion: every
term is stored *fully inline* as a typed struct, so there is no lexicon
at all.  Parquet dictionary-encodes repeated strings, which recovers
most of the space the term-id indirection would have bought.

A term struct has 8 fields (order matters — Spark struct equality is
positional):

    kind  TINYINT   0 = IRI, 1 = blank node, 2 = literal
    lex   STRING    lexical form / IRI string / bnode label
    dt    STRING    datatype IRI (literals only; xsd:string for plain)
    lang  STRING    language tag (lowercased) or NULL
    num   DECIMAL(38,18)  numeric key for exact-numeric datatypes
    dbl   DOUBLE    numeric key for ALL numeric datatypes (lossy >2^53)
    dtm   TIMESTAMP xsd:dateTime/date key
    bool  BOOLEAN   xsd:boolean key

``num/dbl/dtm/bool`` are deterministic functions of (lex, dt), so term
identity (SPARQL ``sameTerm`` / join compatibility) is plain struct
equality.  RDF term identity = (kind, lex, dt, lang) — reference
semantics per SPO.java:62 and IVComparator.java:66.

The statements table is the flat-column form of the same data
(reference: SPORelation.java:128 — one logical relation; we keep ONE
copy and let Parquet column stats + Catalyst pushdown replace the
redundant SPO/POS/OSP key orders, SPOKeyOrder.java:89).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Namespaces
# ---------------------------------------------------------------------------

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
FOAF = "http://xmlns.com/foaf/0.1/"
BDS = "http://www.bigdata.com/rdf/search#"  # full-text search magic predicates
#: the unnamed (null-context) graph, addressable in FROM clauses —
#: reference BD.java:126 NULL_GRAPH / RemoteRepository.java:486 (the
#: client sends FROM <bd:nullGraph> to scope a null context)
BD_NULL_GRAPH = "http://www.bigdata.com/rdf#nullGraph"

XSD_STRING = XSD + "string"
XSD_BOOLEAN = XSD + "boolean"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_FLOAT = XSD + "float"
XSD_DOUBLE = XSD + "double"
XSD_DATETIME = XSD + "dateTime"
XSD_DATE = XSD + "date"
RDF_LANGSTRING = RDF + "langString"
RDF_TYPE = RDF + "type"

# Exact-numeric datatypes keep a DECIMAL key (reference DTE.java:100-240
# inlines these in the key); float/double only get the DOUBLE key.
EXACT_NUMERIC_DTS = frozenset(
    XSD + n
    for n in (
        "integer", "decimal", "int", "long", "short", "byte",
        "nonNegativeInteger", "nonPositiveInteger", "negativeInteger",
        "positiveInteger", "unsignedLong", "unsignedInt",
        "unsignedShort", "unsignedByte",
    )
)
FLOAT_DTS = frozenset((XSD_FLOAT, XSD_DOUBLE))
NUMERIC_DTS = EXACT_NUMERIC_DTS | FLOAT_DTS
INTEGER_DTS = EXACT_NUMERIC_DTS - {XSD_DECIMAL}
DATETIME_DTS = frozenset((XSD_DATETIME, XSD_DATE))

# Term kinds (reference VTE.java:42-54; the 4th kind — statement ids /
# SIDs — is reification plumbing we do not carry).
KIND_IRI = 0
KIND_BNODE = 1
KIND_LITERAL = 2
# statement identifiers / SIDs (reference VTE.java:42-54 STATEMENT —
# provenance mode, AbstractTripleStore.Options.STATEMENT_IDENTIFIERS).
# A SID rides the s/o positions as a flat "sid:<hash>" resource string.
KIND_SID = 3

# Statement types (reference StatementEnum.java:42-51).
STYPE_EXPLICIT = 0
STYPE_AXIOM = 1
STYPE_INFERRED = 2

DECIMAL_T = T.DecimalType(38, 18)

TERM_FIELDS = [
    T.StructField("kind", T.ByteType()),
    T.StructField("lex", T.StringType()),
    T.StructField("dt", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("num", DECIMAL_T),
    T.StructField("dbl", T.DoubleType()),
    T.StructField("dtm", T.TimestampType()),
    T.StructField("bool", T.BooleanType()),
]
TERM_TYPE = T.StructType(TERM_FIELDS)
TERM_FIELD_NAMES = [f.name for f in TERM_FIELDS]

# Flat statements schema (FIXTURES.md §1; reference SPO.java:62 s,p,o,c
# + StatementEnum).  g is NULL for the default graph / triples mode.
STATEMENTS_FIELDS = [
    T.StructField("g", T.StringType()),
    T.StructField("s", T.StringType()),
    T.StructField("p", T.StringType()),
    T.StructField("o_kind", T.ByteType()),
    T.StructField("o_lex", T.StringType()),
    T.StructField("o_dt", T.StringType()),
    T.StructField("o_lang", T.StringType()),
    T.StructField("o_num", DECIMAL_T),
    T.StructField("o_dbl", T.DoubleType()),
    T.StructField("o_dtm", T.TimestampType()),
    T.StructField("o_bool", T.BooleanType()),
    T.StructField("stype", T.ByteType()),
]
STATEMENTS_SCHEMA = T.StructType(STATEMENTS_FIELDS)


# ---------------------------------------------------------------------------
# Python-side term values (parser constants, test fixtures)
# ---------------------------------------------------------------------------

_INT_RE = re.compile(r"^[+-]?\d+$")
_DEC_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)$")
_DBL_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$|^[+-]?INF$|^NaN$")


@dataclass(frozen=True)
class Term:
    """A concrete RDF term (driver-side).  Variables never appear here."""

    kind: int
    lex: str
    dt: str | None = None
    lang: str | None = None

    # -- constructors ------------------------------------------------------
    @staticmethod
    def iri(value: str) -> "Term":
        return Term(KIND_IRI, value)

    @staticmethod
    def bnode(label: str) -> "Term":
        return Term(KIND_BNODE, label)

    @staticmethod
    def literal(lex: str, dt: str | None = None, lang: str | None = None) -> "Term":
        if lang:
            return Term(KIND_LITERAL, lex, RDF_LANGSTRING, lang.lower())
        return Term(KIND_LITERAL, lex, dt or XSD_STRING, None)

    @staticmethod
    def integer(v: int) -> "Term":
        return Term(KIND_LITERAL, str(v), XSD_INTEGER)

    @staticmethod
    def decimal(v: Decimal | str) -> "Term":
        return Term(KIND_LITERAL, str(v), XSD_DECIMAL)

    @staticmethod
    def double(v: float) -> "Term":
        return Term(KIND_LITERAL, repr(v), XSD_DOUBLE)

    @staticmethod
    def boolean(v: bool) -> "Term":
        return Term(KIND_LITERAL, "true" if v else "false", XSD_BOOLEAN)

    @staticmethod
    def from_python(v: object) -> "Term":
        if isinstance(v, Term):
            return v
        if isinstance(v, bool):
            return Term.boolean(v)
        if isinstance(v, int):
            return Term.integer(v)
        if isinstance(v, float):
            return Term.double(v)
        if isinstance(v, Decimal):
            return Term.decimal(v)
        if isinstance(v, str):
            return Term.literal(v)
        if isinstance(v, datetime):
            return Term(KIND_LITERAL, v.isoformat(), XSD_DATETIME)
        if isinstance(v, date):
            return Term(KIND_LITERAL, v.isoformat(), XSD_DATE)
        raise TypeError(f"cannot make an RDF term from {type(v)}")

    # -- typed value keys (the deterministic derived fields) ---------------
    def num_key(self) -> Decimal | None:
        if self.dt in EXACT_NUMERIC_DTS and _DEC_RE.match(self.lex or ""):
            try:
                return Decimal(self.lex)
            except ArithmeticError:
                return None
        return None

    def dbl_key(self) -> float | None:
        if self.dt in NUMERIC_DTS:
            try:
                lex = self.lex
                if lex in ("INF", "+INF"):
                    return math.inf
                if lex == "-INF":
                    return -math.inf
                return float(lex)
            except ValueError:
                return None
        return None

    def dtm_key(self) -> datetime | None:
        if self.dt in DATETIME_DTS:
            return parse_xsd_datetime(self.lex)
        return None

    def bool_key(self) -> bool | None:
        if self.dt == XSD_BOOLEAN:
            if self.lex in ("true", "1"):
                return True
            if self.lex in ("false", "0"):
                return False
        return None

    def as_row(self) -> tuple:
        """(kind, lex, dt, lang, num, dbl, dtm, bool) — TERM_FIELD order."""
        return (
            self.kind, self.lex,
            self.dt if self.kind == KIND_LITERAL else None,
            self.lang, self.num_key(), self.dbl_key(),
            self.dtm_key(), self.bool_key(),
        )

    def n3(self) -> str:
        """N-Triples-style serialization (for output/CONSTRUCT sinks)."""
        if self.kind == KIND_IRI:
            return f"<{self.lex}>"
        if self.kind == KIND_BNODE:
            return f"_:{self.lex}"
        esc = self.lex.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
        if self.lang:
            return f'"{esc}"@{self.lang}'
        if self.dt and self.dt != XSD_STRING:
            return f'"{esc}"^^<{self.dt}>'
        return f'"{esc}"'


def parse_xsd_datetime(lex: str) -> datetime | None:
    """Parse xsd:dateTime / xsd:date lexical forms (naive UTC key)."""
    if lex is None:
        return None
    s = lex.strip()
    try:
        if "T" not in s:
            return datetime.fromisoformat(s + "T00:00:00")
        s = s.replace("Z", "+00:00")
        d = datetime.fromisoformat(s)
        if d.tzinfo is not None:
            # normalize to UTC and store naive (one global timeline key)
            d = (d - d.utcoffset()).replace(tzinfo=None)
        return d
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# Column-side term construction
# ---------------------------------------------------------------------------

# Every F.lit/cast/alias is a py4j round trip, and query compilation
# builds the same constant sub-expressions thousands of times per plan
# (measured ~2s of driver time on a 5-pattern query).  Column objects
# are immutable expression handles, so constant fragments are safe to
# memoize; the key includes the active SparkContext so a restarted JVM
# never sees stale handles.
_COL_CACHE: dict = {}


_COL_CACHE_CTX: list = [None]


def cached_col(key, build) -> Column:
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    # identity that can't be recycled across stop/restart (id() can):
    # applicationId + startTime are unique per context.  On a context
    # change the whole cache is dropped — stale Columns hold dead JVM
    # gateway references and must never be served.
    ctx = (sc.applicationId, sc.startTime) if sc is not None else None
    if ctx != _COL_CACHE_CTX[0]:
        _COL_CACHE.clear()
        _COL_CACHE_CTX[0] = ctx
    c = _COL_CACHE.get(key)
    if c is None:
        c = build()
        _COL_CACHE[key] = c
    return c


def lit_c(v) -> Column:
    """Cached literal column for hashable constants.  The value's type
    is part of the key: True == 1 == 1.0 in Python, and a bool-typed
    literal must not be served where an int was asked for."""
    return cached_col(("lit", type(v).__name__, v), lambda: F.lit(v))


def mk_term_col(
    kind,
    lex,
    dt=None,
    lang=None,
    num=None,
    dbl=None,
    dtm=None,
    bool_=None,
) -> Column:
    """Assemble a term struct column in canonical field order.  Fields
    may be Columns, None (NULL of the field type), or plain str/int/
    float constants — constant fields resolve to cached, pre-aliased
    fragments (zero py4j traffic on reuse)."""

    def fld(val, name, dtype):
        if val is None:
            return cached_col(("nullf", name), lambda: F.lit(None).cast(dtype).alias(name))
        if isinstance(val, (str, int, float, bool)):
            return cached_col(
                ("constf", name, type(val).__name__, val),
                lambda: F.lit(val).cast(dtype).alias(name),
            )
        return val.cast(dtype).alias(name)

    return F.struct(
        fld(kind, "kind", T.ByteType()),
        fld(lex, "lex", T.StringType()),
        fld(dt, "dt", T.StringType()),
        fld(lang, "lang", T.StringType()),
        fld(num, "num", DECIMAL_T),
        fld(dbl, "dbl", T.DoubleType()),
        fld(dtm, "dtm", T.TimestampType()),
        fld(bool_, "bool", T.BooleanType()),
    )


def term_lit(t: Term) -> Column:
    """A constant term as a struct literal column (cached per value)."""
    row = t.as_row()

    def build():
        cols = []
        for field, v in zip(TERM_FIELDS, row):
            cols.append(F.lit(v).cast(field.dataType).alias(field.name))
        return F.struct(*cols)

    return cached_col(("term_lit", row), build)


def iri_col_to_term(c: Column) -> Column:
    """s/p/g position (plain string: IRI or '_:label') → term struct.
    NULL input (an unbound flat variable) yields a NULL struct — not a
    struct of NULL fields — so BOUND/coalesce/equality see unbound."""
    is_bnode = c.startswith("_:")
    struct = mk_term_col(
        kind=F.when(is_bnode, lit_c(KIND_BNODE)).otherwise(lit_c(KIND_IRI)),
        lex=F.when(is_bnode, c.substr(lit_c(3), F.length(c))).otherwise(c),
    )
    return F.when(c.isNotNull(), struct)


def obj_cols_to_term(prefix: str = "o_") -> Column:
    """Statements-table object columns → term struct (cached: the
    column names are fixed per prefix)."""
    return cached_col(("obj_term", prefix), lambda: F.struct(
        F.col(prefix + "kind").alias("kind"),
        F.col(prefix + "lex").alias("lex"),
        F.col(prefix + "dt").alias("dt"),
        F.col(prefix + "lang").alias("lang"),
        F.col(prefix + "num").alias("num"),
        F.col(prefix + "dbl").alias("dbl"),
        F.col(prefix + "dtm").alias("dtm"),
        F.col(prefix + "bool").alias("bool"),
    ))


def iri_name_to_term(name: str) -> Column:
    """`iri_col_to_term` for a NAMED column — the whole expression is
    parsed JVM-side from one SQL string and cached per name, replacing
    ~30 py4j round trips with zero on reuse.  Only safe where the bare
    name is unambiguous (single-relation scope)."""
    q = f"`{name}`"
    sql = (
        f"CASE WHEN {q} IS NOT NULL THEN named_struct("
        f"'kind', CAST(CASE WHEN substring({q}, 1, 2) = '_:' THEN {KIND_BNODE} ELSE {KIND_IRI} END AS TINYINT), "
        f"'lex', CASE WHEN substring({q}, 1, 2) = '_:' THEN substring({q}, 3) ELSE {q} END, "
        f"'dt', CAST(NULL AS STRING), 'lang', CAST(NULL AS STRING), "
        f"'num', CAST(NULL AS DECIMAL(38,18)), 'dbl', CAST(NULL AS DOUBLE), "
        f"'dtm', CAST(NULL AS TIMESTAMP), 'bool', CAST(NULL AS BOOLEAN)) END"
    )
    return cached_col(("iri_name", name), lambda: F.expr(sql))


def term_to_iri_string(c: Column) -> Column:
    """Term struct (IRI/bnode) → the flat string used in s/p/g positions."""
    return (
        F.when(c.isNull(), F.lit(None))
        .when(c["kind"] == KIND_BNODE, F.concat(F.lit("_:"), c["lex"]))
        .otherwise(c["lex"])
    )


def term_to_resource_key(c: Column) -> Column:
    """Term struct → flat resource string usable as a JOIN KEY against a
    flat s/p/g column.  Literals map to NULL (a literal never equals a
    resource, and NULL keys never match in an equi-join) — unlike
    term_to_iri_string, whose lex fallback could collide a string
    literal with an identical IRI."""
    return (
        F.when(c.isNull() | (c["kind"] == KIND_LITERAL), F.lit(None).cast("string"))
        .when(c["kind"] == KIND_BNODE, F.concat(F.lit("_:"), c["lex"]))
        .otherwise(c["lex"])
    )


def statements_df_from_terms(rows: list[tuple], spark) -> DataFrame:
    """Build a statements DataFrame from (g, s, p, o: Term[, stype]) tuples
    where g/s/p are strings (or None) and o is a Term.  Test helper + RIO
    loader sink (reference: rio/StatementBuffer.java:87)."""
    data = []
    for r in rows:
        g, s, p, o = r[0], r[1], r[2], r[3]
        stype = r[4] if len(r) > 4 else STYPE_EXPLICIT
        o = Term.from_python(o)
        kind, lex, dt, lang, num, dbl, dtm, b = o.as_row()
        data.append((g, s, p, kind, lex, dt, lang, num, dbl, dtm, b, stype))
    return spark.createDataFrame(data, STATEMENTS_SCHEMA)
