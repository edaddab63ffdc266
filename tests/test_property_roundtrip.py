"""Property-based round-trip tests (hypothesis) — beyond the
reference's test strategy (SURVEY §5.7 notes it has none): random RDF
terms and triples must survive serialize → parse unchanged, and the
flat term-key encoding must stay injective.  All driver-side (no Spark
session), so the suite stays fast."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_old_spark.model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_LANGSTRING,
    XSD_STRING,
    Term,
)
from bigdata_old_spark.rio import parse_ntriples_line, parse_turtle

# -- strategies ---------------------------------------------------------------

_iri_chars = st.text(
    alphabet=string.ascii_letters + string.digits + "/._-#:~?&=%",
    min_size=1,
    max_size=40,
)
iris = _iri_chars.map(lambda s: "http://example.org/" + s)

bnode_labels = st.text(
    alphabet=string.ascii_letters + string.digits, min_size=1, max_size=20
)

# lexical forms incl. the escape-relevant characters
lex_texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=60,
)

langs = st.sampled_from(["en", "de", "en-us", "fr", "ja"])

datatypes = st.sampled_from(
    [
        None,
        "http://www.w3.org/2001/XMLSchema#integer",
        "http://www.w3.org/2001/XMLSchema#decimal",
        "http://www.w3.org/2001/XMLSchema#dateTime",
        "http://example.org/customDT",
    ]
)


@st.composite
def terms(draw):
    kind = draw(st.sampled_from([KIND_IRI, KIND_BNODE, KIND_LITERAL]))
    if kind == KIND_IRI:
        return Term.iri(draw(iris))
    if kind == KIND_BNODE:
        return Term.bnode(draw(bnode_labels))
    if draw(st.booleans()):
        return Term.literal(draw(lex_texts), lang=draw(langs))
    return Term.literal(draw(lex_texts), dt=draw(datatypes))


# -- properties ---------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(s=iris, p=iris, o=terms())
def test_ntriples_line_roundtrip(s, p, o):
    line = f"<{s}> <{p}> {o.n3()} ."
    parsed = parse_ntriples_line(line)
    assert parsed is not None
    ps, pp, po = parsed
    assert ps == s and pp == p
    assert po.kind == o.kind
    assert po.lex == o.lex
    # plain literal normalizes to xsd:string — identical term semantics
    assert (po.dt or XSD_STRING) == (o.dt or XSD_STRING)
    assert (po.lang or None) == (o.lang or None)


@settings(max_examples=200, deadline=None)
@given(s=iris, p=iris, o=terms())
def test_turtle_statement_roundtrip(s, p, o):
    text = f"<{s}> <{p}> {o.n3()} ."
    triples = parse_turtle(text)
    assert len(triples) == 1
    ts, tp, to = triples[0]
    assert ts == s and tp == p and to.lex == o.lex and to.kind == o.kind


@settings(max_examples=300, deadline=None)
@given(a=terms(), b=terms())
def test_term_identity_key_injective(a, b):
    """The driver-side analog of the flat term key must separate any two
    distinct terms (same tuple ⇔ same term)."""

    def key(t: Term):
        if t.kind == KIND_BNODE:
            return ("b", t.lex)
        if t.kind == KIND_IRI:
            return ("i", t.lex)
        return ("l", t.lex, t.dt or XSD_STRING, t.lang)

    same_term = (
        a.kind == b.kind
        and a.lex == b.lex
        and (a.dt or XSD_STRING) == (b.dt or XSD_STRING)
        and (a.lang or None) == (b.lang or None)
    )
    assert (key(a) == key(b)) == same_term


@settings(max_examples=200, deadline=None)
@given(o=terms())
def test_n3_parse_n3_fixpoint(o):
    """serialize → parse → serialize is a fixpoint."""
    line = f"<http://e/s> <http://e/p> {o.n3()} ."
    _, _, po = parse_ntriples_line(line)
    assert po.n3() == o.n3() or (
        # plain vs explicit xsd:string collapse to the same term
        (o.dt in (None, XSD_STRING) and po.n3() == Term.literal(o.lex).n3())
    )
