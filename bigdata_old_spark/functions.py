"""SPARQL value expressions as Spark Column expressions over term structs.

This is the port surface of the reference's
``bigdata-rdf/.../internal/constraints/*BOp.java`` evaluators
(FunctionRegistry.java:116-830 lists them all).  Every function takes /
returns a *term struct* Column (model.TERM_TYPE); SPARQL type errors
are represented as a NULL struct, which the FILTER wrapper then treats
as false (reference SPARQLConstraint.java — error → solution dropped)
while COALESCE/BOUND/IF see the null and recover, matching the spec.

Everything here is a pure Catalyst expression (whole-stage-codegen
friendly) — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_old_spark.model import (
    DECIMAL_T,
    INTEGER_DTS,
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_LANGSTRING,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_FLOAT,
    XSD_INTEGER,
    XSD_STRING,
    lit_c,
    mk_term_col,
    term_lit,
)

def null_term() -> Column:
    """A NULL term struct (= unbound / type error)."""
    from bigdata_old_spark.model import TERM_TYPE, cached_col

    return cached_col("null_term", lambda: F.lit(None).cast(TERM_TYPE))


# ---------------------------------------------------------------------------
# Term constructors from plain Spark values
# ---------------------------------------------------------------------------

def boolean_term(b: Column) -> Column:
    """bool Column → xsd:boolean term; NULL in → NULL term (error)."""
    t = mk_term_col(
        kind=KIND_LITERAL,
        lex=F.when(b, lit_c("true")).otherwise(lit_c("false")),
        dt=XSD_BOOLEAN,
        bool_=b,
    )
    return F.when(b.isNotNull(), t)


def string_term(s: Column, lang: Column | None = None) -> Column:
    dt = F.when(lang.isNotNull(), lit_c(RDF_LANGSTRING)).otherwise(lit_c(XSD_STRING)) if lang is not None else XSD_STRING
    t = mk_term_col(kind=KIND_LITERAL, lex=s, dt=dt, lang=lang)
    return F.when(s.isNotNull(), t)


def iri_term(s: Column) -> Column:
    return F.when(s.isNotNull(), mk_term_col(kind=KIND_IRI, lex=s))


def integer_term(v: Column) -> Column:
    v = v.cast(DECIMAL_T)
    t = mk_term_col(
        kind=KIND_LITERAL,
        lex=v.cast(T.DecimalType(38, 0)).cast("string"),
        dt=XSD_INTEGER,
        num=v,
        dbl=v.cast("double"),
    )
    return F.when(v.isNotNull(), t)


def _trim_decimal_lex(s: Column) -> Column:
    # "5.000000000000000000" → "5";  "3.140000…" → "3.14"
    trimmed = F.regexp_replace(s, r"0+$", "")
    return F.regexp_replace(trimmed, r"\.$", "")


def decimal_term(v: Column) -> Column:
    v = v.cast(DECIMAL_T)
    t = mk_term_col(
        kind=KIND_LITERAL,
        lex=_trim_decimal_lex(v.cast("string")),
        dt=XSD_DECIMAL,
        num=v,
        dbl=v.cast("double"),
    )
    return F.when(v.isNotNull(), t)


def double_term(v: Column) -> Column:
    v = v.cast("double")
    t = mk_term_col(kind=KIND_LITERAL, lex=v.cast("string"), dt=XSD_DOUBLE, dbl=v)
    return F.when(v.isNotNull(), t)


def datetime_term(v: Column, dt_iri: str = XSD_DATETIME) -> Column:
    t = mk_term_col(
        kind=KIND_LITERAL,
        lex=F.date_format(v, "yyyy-MM-dd'T'HH:mm:ss"),
        dt=dt_iri,
        dtm=v,
    )
    return F.when(v.isNotNull(), t)


# ---------------------------------------------------------------------------
# Core semantics: EBV, comparison, sameTerm, ordering
# ---------------------------------------------------------------------------

def ebv(t: Column) -> Column:
    """Effective boolean value (reference EBVBOp.java).  NULL = error."""
    is_lit = t["kind"] == KIND_LITERAL
    return (
        F.when(t.isNull(), F.lit(None).cast("boolean"))
        .when(is_lit & t["bool"].isNotNull(), t["bool"])
        .when(is_lit & t["dbl"].isNotNull(), (t["dbl"] != 0.0) & ~F.isnan(t["dbl"]))
        # numeric datatype but unparseable lexical form → EBV false per spec
        .when(is_lit & t["dt"].isin(XSD_INTEGER, XSD_DECIMAL, XSD_FLOAT, XSD_DOUBLE) & t["dbl"].isNull(), F.lit(False))
        .when(is_lit & ((t["dt"] == XSD_STRING) | (t["dt"] == RDF_LANGSTRING)), F.length(t["lex"]) > 0)
        .otherwise(F.lit(None).cast("boolean"))
    )


def same_term(l: Column, r: Column) -> Column:
    """sameTerm(a,b) — struct equality IS term identity (SameTermBOp)."""
    return (
        (l["kind"] == r["kind"])
        & (l["lex"] == r["lex"])
        & (l["dt"].eqNullSafe(r["dt"]))
        & (l["lang"].eqNullSafe(r["lang"]))
    )


def _cmp3(a: Column, b: Column) -> Column:
    return F.when(a < b, F.lit(-1)).when(a > b, F.lit(1)).otherwise(F.lit(0))


def compare(l: Column, r: Column) -> Column:
    """SPARQL operator-mapping comparison → -1/0/1, NULL = type error.

    Numeric promotion across datatypes per the reference's
    CompareBOp.java:55 / IVComparator.java:66: exact numerics compare
    on the DECIMAL key when both present (no float rounding), else on
    the DOUBLE key.
    """
    both_num = l["dbl"].isNotNull() & r["dbl"].isNotNull()
    both_exact = l["num"].isNotNull() & r["num"].isNotNull()
    both_dtm = l["dtm"].isNotNull() & r["dtm"].isNotNull()
    both_bool = l["bool"].isNotNull() & r["bool"].isNotNull()
    both_str = (l["dt"] == XSD_STRING) & (r["dt"] == XSD_STRING)
    both_lang = (l["dt"] == RDF_LANGSTRING) & (r["dt"] == RDF_LANGSTRING)
    both_iri = (l["kind"] == KIND_IRI) & (r["kind"] == KIND_IRI)

    return (
        F.when(l.isNull() | r.isNull(), F.lit(None).cast("int"))
        .when(both_num & both_exact, _cmp3(l["num"], r["num"]))
        .when(both_num, _cmp3(l["dbl"], r["dbl"]))
        .when(both_dtm, _cmp3(l["dtm"], r["dtm"]))
        .when(both_bool, _cmp3(l["bool"].cast("int"), r["bool"].cast("int")))
        .when(both_str, _cmp3(l["lex"], r["lex"]))
        .when(both_lang & (l["lang"] == r["lang"]), _cmp3(l["lex"], r["lex"]))
        .when(both_iri, _cmp3(l["lex"], r["lex"]))
        .otherwise(F.lit(None).cast("int"))
    )


def _either_lang_lit(l: Column, r: Column) -> Column:
    """Both literals and at least one carries a language tag — Sesame's
    QueryEvaluationUtil then uses plain term equality, never a type
    error (open-eq-12: "xyz"@en = "xyz"^^xsd:integer is FALSE, not an
    error, while plain "xyz" = "xyz"^^xsd:integer errors)."""
    return (
        (l["kind"] == KIND_LITERAL)
        & (r["kind"] == KIND_LITERAL)
        & (l["lang"].isNotNull() | r["lang"].isNotNull())
    )


def eq_term(l: Column, r: Column) -> Column:
    """'=' — value equality with sameTerm fallback for unknown types."""
    c = compare(l, r)
    return (
        F.when(c.isNotNull(), c == 0)
        .when(l.isNull() | r.isNull(), F.lit(None).cast("boolean"))
        .when(_either_lang_lit(l, r), same_term(l, r))
        .when(same_term(l, r), F.lit(True))
        .otherwise(F.lit(None).cast("boolean"))
    )


def ne_term(l: Column, r: Column) -> Column:
    c = compare(l, r)
    return (
        F.when(c.isNotNull(), c != 0)
        .when(l.isNull() | r.isNull(), F.lit(None).cast("boolean"))
        .when(_either_lang_lit(l, r), ~same_term(l, r))
        .when(same_term(l, r), F.lit(False))
        # distinct kinds / bnodes: RDFterm-equal says not-equal
        .when((l["kind"] != r["kind"]) | (l["kind"] != KIND_LITERAL), F.lit(True))
        .otherwise(F.lit(None).cast("boolean"))
    )


def order_key(t: Column) -> Column:
    """Total-order sort key implementing the reference's IVComparator
    (solutions/IVComparator.java:66): unbound < bnode < IRI < literal;
    literals grouped numeric < dateTime < boolean < other, numerics
    compared cross-datatype.  Structs are orderable in Spark, so ORDER
    BY emits orderBy(order_key(col)) and Tungsten external sort does
    the rest (strictly better than the reference's at-once
    MemorySortOp.java:68)."""
    from bigdata_old_spark.model import RDF_LANGSTRING, XSD_STRING

    krank = (
        F.when(t.isNull(), F.lit(0))
        .when(t["kind"] == KIND_BNODE, F.lit(1))
        .when(t["kind"] == KIND_IRI, F.lit(2))
        .otherwise(F.lit(3))
    )
    # literal classes per Sesame ValueComparator (compareLiterals, the
    # exact code IVComparator delegates to): plain/xsd:string/lang-tagged
    # first (dt-null class in Sesame), then numerics by value, then
    # calendar by value, then other datatypes ordered by datatype IRI
    is_stringy = (t["dt"] == XSD_STRING) | (t["dt"] == RDF_LANGSTRING) | t["dt"].isNull()
    catrank = (
        F.when(is_stringy, F.lit(0))
        .when(t["num"].isNotNull() | t["dbl"].isNotNull(), F.lit(1))
        .when(t["dtm"].isNotNull(), F.lit(2))
        .otherwise(F.lit(3))
    )
    # dt participates for the non-stringy classes (numeric ties, other-
    # datatype ordering); NULL for the stringy class so lang/lex decide
    dt2 = F.when(~is_stringy, t["dt"])
    return F.struct(
        krank.alias("k"),
        catrank.alias("c"),
        # dbl first (populated for every numeric, incl. decimal-overflow
        # doubles), exact decimal as the precision tie-break
        t["dbl"].alias("d"),
        t["num"].alias("n"),
        t["dtm"].alias("t"),
        dt2.alias("dt"),
        t["lang"].alias("l"),
        t["lex"].alias("x"),
    )


# ---------------------------------------------------------------------------
# Arithmetic with XPath numeric promotion (MathBOp.java:58, MathUtility)
# ---------------------------------------------------------------------------

def _num_rank(t: Column) -> Column:
    dt = t["dt"]
    return (
        F.when(t["dbl"].isNull(), F.lit(None).cast("int"))
        .when(dt.isin(*INTEGER_DTS), F.lit(0))
        .when(dt == XSD_DECIMAL, F.lit(1))
        .when(dt == XSD_FLOAT, F.lit(2))
        .when(dt == XSD_DOUBLE, F.lit(3))
        .otherwise(F.lit(None).cast("int"))
    )


def _exact_result(op: str, l: Column, r: Column) -> Column:
    a, b = l["num"], r["num"]
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return (a * b).cast(DECIMAL_T)
    if op == "/":
        return F.when(b != 0, (a / b).cast(DECIMAL_T))
    raise ValueError(op)


def _dbl_result(op: str, l: Column, r: Column) -> Column:
    a, b = l["dbl"], r["dbl"]
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return a / b  # IEEE semantics: x/0 = ±Inf — matches xsd:double
    raise ValueError(op)


def arith(op: str, l: Column, r: Column) -> Column:
    lr, rr = _num_rank(l), _num_rank(r)
    rank = F.greatest(lr, rr)
    if op == "/":
        # SPARQL/XPath: integer ÷ integer → decimal
        rank = F.when(rank == 0, F.lit(1)).otherwise(rank)
    valid = lr.isNotNull() & rr.isNotNull()
    exact = _exact_result(op, l, r)
    dbl = _dbl_result(op, l, r)
    int_t = mk_term_col(
        kind=F.lit(KIND_LITERAL),
        lex=exact.cast(T.DecimalType(38, 0)).cast("string"),
        dt=F.lit(XSD_INTEGER), num=exact, dbl=exact.cast("double"),
    )
    dec_t = mk_term_col(
        kind=F.lit(KIND_LITERAL),
        lex=_trim_decimal_lex(exact.cast("string")),
        dt=F.lit(XSD_DECIMAL), num=exact, dbl=exact.cast("double"),
    )
    flt_t = mk_term_col(
        kind=F.lit(KIND_LITERAL), lex=dbl.cast("string"),
        dt=F.when(rank == 2, F.lit(XSD_FLOAT)).otherwise(F.lit(XSD_DOUBLE)),
        dbl=dbl,
    )
    return (
        F.when(valid & (rank == 0) & exact.isNotNull(), int_t)
        .when(valid & (rank == 1) & exact.isNotNull(), dec_t)
        .when(valid & (rank >= 2) & dbl.isNotNull(), flt_t)
    )


def neg(t: Column) -> Column:
    from bigdata_old_spark.model import Term

    return arith("-", term_lit(Term.integer(0)), t)


# ---------------------------------------------------------------------------
# Builtin function dispatch
# ---------------------------------------------------------------------------

def _is_string_lit(t: Column) -> Column:
    return (t["kind"] == KIND_LITERAL) & ((t["dt"] == XSD_STRING) | (t["dt"] == RDF_LANGSTRING))


def _str_result_like(model: Column, s: Column) -> Column:
    """Result carries the lang/dt of the model arg (SUBSTR/UCASE/…)."""
    return F.when(
        s.isNotNull(),
        mk_term_col(kind=F.lit(KIND_LITERAL), lex=s, dt=model["dt"], lang=model["lang"]),
    )


def _regex_pattern(pat: Column, flags: Column | None) -> Column:
    """Translate SPARQL/XPath flags (i,s,m,x) to inline Java regex flags
    (reference RegexBOp.java:46 does the same via Pattern.compile).
    The "i" flag also turns on UNICODE_CASE ("u") — Java's CASE_
    INSENSITIVE alone folds ASCII only, so `regex(?o, "ä", "i")` would
    miss "Ä" (the reference fixed the same way for trac 655)."""
    if flags is None:
        return pat
    jflags = F.when(flags.contains("i"), F.concat(flags, F.lit("u"))).otherwise(flags)
    return F.when(F.length(flags) > 0,
                  F.concat(F.lit("(?"), jflags, F.lit(")"), pat)).otherwise(pat)


def apply_builtin(name: str, args: list[Column], raw_args: list | None = None) -> Column:
    """Dispatch a SPARQL builtin to a Column expression.

    ``args`` are term-struct Columns.  Boolean-valued builtins return
    BOOLEAN-term structs so they compose; FILTER unwraps via ebv().
    """
    if name.startswith("http://www.w3.org/2001/XMLSchema#"):
        return xsd_cast(name, args[0])
    n = name.upper()

    # --- logical (3-valued with error propagation per AndBOp/OrBOp) ---
    if n == "&&":
        a, b = ebv(args[0]), ebv(args[1])
        # error && false = false; error && true = error
        v = F.when(a & b, F.lit(True)).when(~a | ~b, F.lit(False))
        return boolean_term(v)
    if n == "||":
        a, b = ebv(args[0]), ebv(args[1])
        v = F.when(a | b, F.lit(True)).when(~a & ~b, F.lit(False))
        return boolean_term(v)
    if n == "!":
        return boolean_term(~ebv(args[0]))

    # --- comparison ---
    if n in ("=", "!=", "<", "<=", ">", ">="):
        l, r = args
        if n == "=":
            return boolean_term(eq_term(l, r))
        if n == "!=":
            return boolean_term(ne_term(l, r))
        c = compare(l, r)
        op = {"<": c < 0, "<=": c <= 0, ">": c > 0, ">=": c >= 0}[n]
        return boolean_term(F.when(c.isNotNull(), op))
    if n in ("IN", "NOT IN"):
        probe, rest = args[0], args[1:]
        hit = F.lit(False)
        for a in rest:
            hit = hit | F.coalesce(eq_term(probe, a), F.lit(False))
        return boolean_term(F.when(probe.isNotNull(), hit if n == "IN" else ~hit))

    # --- arithmetic ---
    if n in ("+", "-", "*", "/"):
        if n == "-" and len(args) == 1:
            return neg(args[0])
        if n == "+" and len(args) == 1:
            return args[0]
        return arith(n, args[0], args[1])

    # --- type tests (IsBoundBOp, IsURIBOp, …) ---
    if n == "BOUND":
        return boolean_term(args[0].isNotNull())
    if n in ("ISIRI", "ISURI"):
        return F.when(args[0].isNotNull(), boolean_term(args[0]["kind"] == KIND_IRI))
    if n == "ISBLANK":
        return F.when(args[0].isNotNull(), boolean_term(args[0]["kind"] == KIND_BNODE))
    if n == "ISLITERAL":
        return F.when(args[0].isNotNull(), boolean_term(args[0]["kind"] == KIND_LITERAL))
    if n == "ISNUMERIC":
        return F.when(args[0].isNotNull(), boolean_term(args[0]["dbl"].isNotNull()))

    # --- accessors ---
    if n == "STR":
        t = args[0]
        # xsd:dateTime: the reference inlines dateTimes as UTC-normalized
        # IVs, so STR() materializes the normalized form
        # ("…T12:53:25.000Z"), not the source lexical form
        # (LiteralExtensionIV/DateTimeExtension; TestAST
        # materialization-extensions fixture)
        lex = F.when(
            (t["dt"] == XSD_DATETIME) & t["dtm"].isNotNull(),
            F.date_format(t["dtm"], "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
        ).otherwise(t["lex"])
        return F.when(t.isNotNull() & (t["kind"] != KIND_BNODE), string_term(lex))
    if n == "LANG":
        t = args[0]
        return F.when(t["kind"] == KIND_LITERAL, string_term(F.coalesce(t["lang"], F.lit(""))))
    if n == "DATATYPE":
        t = args[0]
        return F.when(t["kind"] == KIND_LITERAL, iri_term(F.coalesce(t["dt"], F.lit(XSD_STRING))))
    if n in ("IRI", "URI"):
        t = args[0]
        return F.when(t["kind"].isin(KIND_IRI, KIND_LITERAL), iri_term(t["lex"]))
    if n == "BNODE":
        if not args:
            return mk_term_col(kind=F.lit(KIND_BNODE), lex=F.concat(F.lit("gen-"), F.expr("uuid()")))
        return F.when(args[0].isNotNull(), mk_term_col(kind=F.lit(KIND_BNODE), lex=args[0]["lex"]))
    if n == "STRDT":
        t, dt = args
        return F.when(
            _is_string_lit(t) & (dt["kind"] == KIND_IRI),
            _retyped_literal(t["lex"], dt["lex"]),
        )
    if n == "STRLANG":
        t, lg = args
        return F.when(
            (t["dt"] == XSD_STRING) & lg["lex"].isNotNull(),
            string_term(t["lex"], F.lower(lg["lex"])),
        )
    if n == "SAMETERM":
        return boolean_term(
            F.when(args[0].isNull() | args[1].isNull(), F.lit(None).cast("boolean"))
            .otherwise(same_term(args[0], args[1]))
        )
    if n == "LANGMATCHES":
        tag, rng = F.lower(args[0]["lex"]), F.lower(args[1]["lex"])
        v = (
            F.when(rng == "*", F.length(tag) > 0)
            .otherwise((tag == rng) | tag.startswith(F.concat(rng, F.lit("-"))))
        )
        return boolean_term(F.when(args[0].isNotNull() & args[1].isNotNull(), v))

    # --- strings (StrlenBOp … ReplaceBOp) ---
    if n == "STRLEN":
        return F.when(_is_string_lit(args[0]), integer_term(F.length(args[0]["lex"])))
    if n == "SUBSTR":
        t = args[0]
        start = args[1]["num"].cast("int")
        if len(args) > 2:
            ln = args[2]["num"].cast("int")
            s = F.substring(t["lex"], start, ln)
        else:
            s = F.substring(t["lex"], start, F.lit(2147483647))
        return F.when(_is_string_lit(t), _str_result_like(t, s))
    if n == "UCASE":
        return F.when(_is_string_lit(args[0]), _str_result_like(args[0], F.upper(args[0]["lex"])))
    if n == "LCASE":
        return F.when(_is_string_lit(args[0]), _str_result_like(args[0], F.lower(args[0]["lex"])))
    if n == "STRSTARTS":
        return boolean_term(F.when(_is_string_lit(args[0]) & _is_string_lit(args[1]), args[0]["lex"].startswith(args[1]["lex"])))
    if n == "STRENDS":
        return boolean_term(F.when(_is_string_lit(args[0]) & _is_string_lit(args[1]), args[0]["lex"].endswith(args[1]["lex"])))
    if n == "CONTAINS":
        return boolean_term(F.when(_is_string_lit(args[0]) & _is_string_lit(args[1]), args[0]["lex"].contains(args[1]["lex"])))
    if n == "STRBEFORE":
        t, pat = args
        pos = F.instr(t["lex"], pat["lex"])
        s = F.when(pat["lex"] == "", F.lit("")).when(pos > 0, F.substring(t["lex"], F.lit(1), pos - 1)).otherwise(F.lit(""))
        return F.when(_is_string_lit(t), _str_result_like(t, s))
    if n == "STRAFTER":
        t, pat = args
        pos = F.instr(t["lex"], pat["lex"])
        s = (
            F.when(pat["lex"] == "", t["lex"])
            .when(pos > 0, F.substring(t["lex"], pos + F.length(pat["lex"]), F.lit(2147483647)))
            .otherwise(F.lit(""))
        )
        return F.when(_is_string_lit(t), _str_result_like(t, s))
    if n == "CONCAT":
        s = F.concat(*[a["lex"] for a in args]) if args else F.lit("")
        return string_term(s)
    if n == "ENCODE_FOR_URI":
        return string_term(F.url_encode(args[0]["lex"]))
    if n == "REGEX":
        t = args[0]
        pat = _regex_pattern(args[1]["lex"], args[2]["lex"] if len(args) > 2 else None)
        return boolean_term(F.when(_is_string_lit(t), F.regexp_like(t["lex"], pat)))
    if n == "REPLACE":
        t = args[0]
        pat = _regex_pattern(args[1]["lex"], args[3]["lex"] if len(args) > 3 else None)
        s = F.regexp_replace(t["lex"], pat, args[2]["lex"])
        return F.when(_is_string_lit(t), _str_result_like(t, s))

    # --- numeric (NumericBOp, RandBOp) ---
    if n in ("ABS", "CEIL", "FLOOR", "ROUND"):
        t = args[0]
        fn = {"ABS": F.abs, "CEIL": F.ceil, "FLOOR": F.floor, "ROUND": F.round}[n]
        exact = fn(t["num"]).cast(DECIMAL_T) if n != "ROUND" else F.round(t["num"]).cast(DECIMAL_T)
        dbl = fn(t["dbl"]).cast("double") if n != "ROUND" else F.round(t["dbl"]).cast("double")
        is_int = t["dt"].isin(*INTEGER_DTS)
        int_t = mk_term_col(kind=F.lit(KIND_LITERAL), lex=exact.cast(T.DecimalType(38, 0)).cast("string"), dt=F.lit(XSD_INTEGER), num=exact, dbl=exact.cast("double"))
        dec_t = mk_term_col(kind=F.lit(KIND_LITERAL), lex=_trim_decimal_lex(exact.cast("string")), dt=F.lit(XSD_DECIMAL), num=exact, dbl=exact.cast("double"))
        dbl_t = mk_term_col(kind=F.lit(KIND_LITERAL), lex=dbl.cast("string"), dt=t["dt"], dbl=dbl)
        return (
            F.when(is_int & exact.isNotNull(), int_t)
            .when((t["dt"] == XSD_DECIMAL) & exact.isNotNull(), dec_t)
            .when(t["dbl"].isNotNull() & t["dt"].isin(XSD_FLOAT, XSD_DOUBLE), dbl_t)
        )
    if n == "RAND":
        return double_term(F.rand())

    # --- hashes (DigestBOp) ---
    if n in ("MD5", "SHA1", "SHA256", "SHA384", "SHA512"):
        lex = args[0]["lex"]
        h = {
            "MD5": F.md5(lex),
            "SHA1": F.sha1(lex),
            "SHA256": F.sha2(lex, 256),
            "SHA384": F.sha2(lex, 384),
            "SHA512": F.sha2(lex, 512),
        }[n]
        return F.when(_is_string_lit(args[0]), string_term(h))

    # --- date/time (DateBOp, NOW) ---
    if n in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES"):
        t = args[0]
        fn = {"YEAR": F.year, "MONTH": F.month, "DAY": F.dayofmonth, "HOURS": F.hour, "MINUTES": F.minute}[n]
        return F.when(t["dtm"].isNotNull(), integer_term(fn(t["dtm"])))
    if n == "SECONDS":
        t = args[0]
        return F.when(t["dtm"].isNotNull(), decimal_term(F.second(t["dtm"])))
    if n == "TZ":
        t = args[0]
        m = F.regexp_extract(t["lex"], r"(Z|[+-]\d\d:\d\d)$", 1)
        return F.when(t["dtm"].isNotNull(), string_term(m))
    if n == "TIMEZONE":
        t = args[0]
        m = F.regexp_extract(t["lex"], r"(Z|[+-]\d\d:\d\d)$", 1)
        dur = (
            F.when(m == "Z", F.lit("PT0S"))
            .when(m == "", F.lit(None).cast("string"))
            .otherwise(
                F.concat(
                    F.when(m.startswith("-"), F.lit("-PT")).otherwise(F.lit("PT")),
                    F.substring(m, 2, 2).cast("int").cast("string"),
                    F.lit("H"),
                )
            )
        )
        t_out = mk_term_col(kind=F.lit(KIND_LITERAL), lex=dur, dt=F.lit("http://www.w3.org/2001/XMLSchema#dayTimeDuration"))
        return F.when(t["dtm"].isNotNull() & dur.isNotNull(), t_out)
    if n == "NOW":
        return datetime_term(F.current_timestamp())

    # --- conditionals ---
    if n == "IF":
        c = ebv(args[0])
        return F.when(c, args[1]).when(~c, args[2])
    if n == "COALESCE":
        return F.coalesce(*args)

    # --- identifiers ---
    if n == "UUID":
        return iri_term(F.concat(F.lit("urn:uuid:"), F.expr("uuid()")))
    if n == "STRUUID":
        return string_term(F.expr("uuid()"))

    # --- casts (xsd constructor functions) ---
    if n.startswith("http://www.w3.org/2001/XMLSchema#"):
        return xsd_cast(n, args[0])

    # --- user-registered extension functions (FunctionRegistry analog) ---
    from bigdata_old_spark.registry import lookup_function

    builder = lookup_function(name)
    if builder is not None:
        return builder(args)

    raise NotImplementedError(f"SPARQL builtin {name}")


def term_from_flat(kind: Column, lex: Column, dt: Column, lang: Column, dtm: Column) -> Column:
    """Rebuild a full term struct from its identifying flat subfields.

    (kind, lex, dt, lang, dtm) determine a term: num/dbl/bool are always
    parsed from lex per dt (every constructor derives them that way), and
    dtm is carried explicitly because datetime lexical forms truncate to
    seconds (mapping.py keeps the exact timestamp only in the dtm field).
    Inverse of the flat-key projection used by the group-by, so shuffle
    keys and aggregation buffers stay primitive (HashAggregate-able)
    instead of hashing 8-field structs.  NULL kind ⇒ unbound ⇒ NULL.
    """
    is_lit = kind == KIND_LITERAL
    num = F.when(
        is_lit & (dt.isin(*INTEGER_DTS) | (dt == XSD_DECIMAL)),
        F.when(lex.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)$"), lex.cast(DECIMAL_T)),
    )
    dbl = F.when(
        is_lit & (dt.isin(XSD_FLOAT, XSD_DOUBLE) | num.isNotNull()),
        F.coalesce(num.cast("double"), lex.cast("double")),
    )
    b = F.when(is_lit & (dt == XSD_BOOLEAN), F.when(lex.isin("true", "1"), True).when(lex.isin("false", "0"), False))
    t = mk_term_col(kind=kind, lex=lex, dt=dt, lang=lang, num=num, dbl=dbl, dtm=dtm, bool_=b)
    return F.when(kind.isNotNull(), t)


def _retyped_literal(lex: Column, dt: Column) -> Column:
    """Literal with runtime datatype IRI — derive typed keys."""
    num = F.when(
        dt.isin(*INTEGER_DTS) | (dt == XSD_DECIMAL),
        F.when(lex.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)$"), lex.cast(DECIMAL_T)),
    )
    dbl = F.when(
        dt.isin(XSD_FLOAT, XSD_DOUBLE) | num.isNotNull(),
        F.coalesce(num.cast("double"), lex.cast("double")),
    )
    dtm = F.when(dt.isin(XSD_DATETIME, XSD_DATE), F.to_timestamp(F.regexp_replace(lex, "Z$", "")))
    b = F.when(dt == XSD_BOOLEAN, F.when(lex.isin("true", "1"), True).when(lex.isin("false", "0"), False))
    return mk_term_col(kind=F.lit(KIND_LITERAL), lex=lex, dt=dt, num=num, dbl=dbl, dtm=dtm, bool_=b)


def xsd_cast(dt_iri: str, t: Column) -> Column:
    """xsd:integer(?x) style constructor casts."""
    local = dt_iri.rsplit("#", 1)[-1]
    lex = t["lex"]
    if local in ("integer", "int", "long", "short", "byte"):
        v = F.coalesce(t["num"], t["dbl"].cast(DECIMAL_T), F.when(t["bool"], 1).otherwise(F.when(~t["bool"], 0)).cast(DECIMAL_T), F.when(lex.rlike(r"^[+-]?\d+$"), lex.cast(DECIMAL_T)))
        # XPath casting truncates toward zero (xsd:integer(3.7) = 3,
        # xsd:integer(-3.7) = -3); a bare decimal cast would round
        # HALF_UP.  floor/ceil by sign implements the truncation.
        v = F.when(v < 0, F.ceil(v)).otherwise(F.floor(v))
        return F.when(t["kind"] == KIND_LITERAL, integer_term(v.cast(T.DecimalType(38, 0))))
    if local == "decimal":
        v = F.coalesce(t["num"], t["dbl"].cast(DECIMAL_T), F.when(lex.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)$"), lex.cast(DECIMAL_T)))
        return F.when(t["kind"] == KIND_LITERAL, decimal_term(v))
    if local in ("double", "float"):
        v = F.coalesce(t["dbl"], lex.cast("double"))
        return F.when(t["kind"] == KIND_LITERAL, double_term(v))
    if local == "boolean":
        v = F.coalesce(t["bool"], F.when(lex.isin("true", "1"), True).when(lex.isin("false", "0"), False), F.when(t["dbl"].isNotNull(), t["dbl"] != 0.0))
        return F.when(t["kind"] == KIND_LITERAL, boolean_term(v))
    if local == "string":
        return F.when(t.isNotNull() & (t["kind"] != KIND_BNODE), string_term(lex))
    if local in ("dateTime", "date"):
        v = F.coalesce(t["dtm"], F.to_timestamp(F.regexp_replace(lex, "Z$", "")))
        return F.when(t["kind"] == KIND_LITERAL, datetime_term(v, dt_iri))
    raise NotImplementedError(f"cast to {dt_iri}")
