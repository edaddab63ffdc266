"""Ports of the reference's Sail-level ticket regression tests
(bigdata-sails/src/test/com/bigdata/rdf/sail/TestTicket*.java and
TestNoExceptions.java) — inline queries the data-driven fixture corpus
does not cover.  Data files are read from the read-only reference tree
at runtime, like tests/test_reference_fixtures.py does.
"""

import pytest
from pyspark.sql import functions as F

from bigdata_old_spark.model import Term
from bigdata_old_spark.store import TripleStore

SAIL = "/root/reference/bigdata-sails/src/test/com/bigdata/rdf/sail"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _lex(df, var="x"):
    return sorted(r[var]["lex"] for r in df.collect())


def test_ticket_275_prebound_filter_optional(spark):
    """TestTicket275.java:132 — OPTIONAL + FILTER(STR(?majorType) =
    ?argMajorType) + FILTER(!bound) with a pre-bound variable
    (Query.setBinding)."""
    st = TripleStore.from_turtle(spark, open(f"{SAIL}/TestTicket275.ttl").read())
    q = (
        "SELECT ?lookup WHERE { "
        "?lookup <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <os:class/Lookup> . "
        "?lookup <os:prop/lookup/majorType> ?majorType . "
        "OPTIONAL{?lookup <os:prop/lookup/minorType> ?minorType}. "
        "FILTER(STR(?majorType) = ?argMajorType). FILTER(!bound(?minorType))}"
    )
    # the reference binds "majoor": no lookup matches (and the one
    # Lookup's minorType is bound anyway) — must run cleanly, 0 rows
    out = st.query(q, bindings={"argMajorType": Term.literal("majoor")})
    assert out.count() == 0
    # positive control: majorType matches but minorType is bound → still 0
    assert st.query(q, bindings={"argMajorType": Term.literal("major")}).count() == 0


def test_ticket_276_prebound_predicate_vars(spark):
    """TestTicket276.java:145 — variables in PREDICATE position
    pre-bound via setBinding."""
    st = TripleStore.from_turtle(spark, open(f"{SAIL}/TestTicket276.n3").read())
    out = st.query(
        "SELECT ?x { ?x ?a ?t . ?x ?lookup ?l }",
        bindings={
            "a": Term.iri(RDF_TYPE),
            "t": Term.iri("os:class/Location"),
            "lookup": Term.iri("os:prop/lookupName"),
            "l": Term.literal("amsterdam"),
        },
    )
    assert _lex(out) == ["os:elem/loc/Amsterdam", "os:elem/loc/Amsterdam_2"]


def test_ticket_353_empty_group_union(spark):
    """TestTicket353.java:135 — {} UNION { ?a ?b ?c }: the empty group
    contributes one empty solution."""
    st = TripleStore.from_rows(
        spark, [(None, "os:subject", "os:prop", Term.literal("value"))]
    )
    rows = st.query("SELECT ?b { {} union { ?a ?b ?c } }").collect()
    got = sorted("∅" if r["b"] is None else r["b"]["lex"] for r in rows)
    assert got == ["os:prop", "∅"]


def test_ticket_355_prebound_in_filter(spark):
    """TestTicket355.java:135 — pre-bound variable used only inside a
    FILTER expression."""
    st = TripleStore.from_rows(
        spark, [(None, "os:subject", "os:prop", Term.literal("value"))]
    )
    out = st.query(
        "SELECT ?subj WHERE { ?subj <os:prop> ?val . FILTER(STR(?val) != ?arg)}",
        bindings={"arg": Term.literal("notValue")},
    )
    assert _lex(out, "subj") == ["os:subject"]


def test_ticket_581_search_service_in_construct(spark):
    """TestTicket581.java:111 — CONSTRUCT whose WHERE drives a
    SERVICE bds:search block joined to regular patterns."""
    st = TripleStore.from_turtle(
        spark, open(f"{SAIL}/fulltextsearchwithsubselect.ttl").read()
    )
    out = st.query(
        "CONSTRUCT { ?object ?p ?o . } WHERE { "
        "  service <http://www.bigdata.com/rdf/search#search> { "
        "    ?so <http://www.bigdata.com/rdf/search#search> \"music\" . "
        "  } "
        "  ?object ?p ?so . ?object ?p ?o . }"
    )
    rows = out.collect()
    # the three rdfs:label literals containing "music"
    assert len(rows) == 3
    assert {r["s"]["lex"] for r in rows} == {
        "http://example/1", "http://example/2", "http://example/3"
    }
    assert all(r["p"]["lex"].endswith("label") for r in rows)


def test_ticket_610_subproperty_of_transitive_not_inferred(spark):
    """TestTicket610.java — (a type owl:TransitiveProperty),
    (b subPropertyOf a) must NOT infer (b type owl:TransitiveProperty)."""
    st = TripleStore.from_turtle(spark, """
        @prefix owl: <http://www.w3.org/2002/07/owl#> .
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        <u:a> a owl:TransitiveProperty .
        <u:b> rdfs:subPropertyOf <u:a> .
    """)
    closed = st.closure()
    bad = closed.statements.where(
        (F.col("s") == "u:b") & (F.col("p") == RDF_TYPE)
        & (F.col("o_lex") == "http://www.w3.org/2002/07/owl#TransitiveProperty")
    )
    assert bad.count() == 0


def test_ticket_647_669_nested_subselect_limit(spark):
    """TestTicket647/669 — SELECT wrapping sub-SELECT ... LIMIT 1 at
    one, two, and three nesting levels each returns exactly one row."""
    st = TripleStore.from_turtle(spark, """
        <http://example.com/book1> a <http://example.com/Book> .
        <http://example.com/book2> a <http://example.com/Book> .
        <http://example.com/book3> a <http://example.com/Book> .
    """)
    nested = "SELECT ?s WHERE { SELECT ?s WHERE { ?s ?p ?o} LIMIT 1 }"
    double = "SELECT ?s WHERE { SELECT ?s WHERE { SELECT ?s WHERE { ?s ?p ?o} LIMIT 1 } }"
    triple = ("SELECT ?s WHERE { SELECT ?s WHERE { SELECT ?s WHERE { "
              "SELECT ?s WHERE { ?s ?p ?o} LIMIT 1 } } }")
    for q in (nested, double, triple):
        rows = st.query(q).collect()
        assert len(rows) == 1 and rows[0]["s"]["lex"].startswith("http://example.com/book")


def test_ticket_693_property_path_modifiers(spark):
    """TestTicket693.java:169-260 — subClassOf / * / ? / + against the
    property_paths.owl chain E⊑D⊑C⊑B⊑A (RDF/XML load)."""
    st = TripleStore.from_rdfxml(spark, open(f"{SAIL}/property_paths.owl").read())
    E = "http://example.org/"
    pfx = "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> "

    def subs(q):
        return _lex(st.query(pfx + q), "sub")

    assert subs("SELECT * WHERE { ?sub rdfs:subClassOf <http://example.org/A> . }") == [E + "B"]
    assert subs("SELECT * WHERE { ?sub rdfs:subClassOf* <http://example.org/A> . }") == [
        E + "A", E + "B", E + "C", E + "D", E + "E"]
    assert subs("SELECT * WHERE { ?sub rdfs:subClassOf? <http://example.org/A> . }") == [
        E + "A", E + "B"]
    # ticket693.txt: the + variant
    assert subs("SELECT * WHERE { ?sub rdfs:subClassOf+ <http://example.org/A> }") == [
        E + "B", E + "C", E + "D", E + "E"]


def test_ticket_831_union_of_filtered_scans(spark):
    """TestTicket831.java + 831.rq — UNION of two all-triple scans each
    narrowed by an equality FILTER on ?s."""
    st = TripleStore.from_turtle(spark, open(f"{SAIL}/831.ttl").read())
    out = st.query(open(f"{SAIL}/831.rq").read())
    rows = out.collect()
    assert len(rows) == 6  # person1: type+age+name, person2: type+age+name
    assert {r["s"]["lex"] for r in rows} == {
        "http://example.org/data/person1", "http://example.org/data/person2"
    }


def test_ticket_874_boolean_literal_union(spark):
    """TestTicket874.java + 874.rq/874.ttl — boolean literal `true` in a
    BGP, strStarts FILTER, UNION with a disjoint branch."""
    st = TripleStore.from_turtle(spark, open(f"{SAIL}/874.ttl").read())
    rows = st.query(open(f"{SAIL}/874.rq").read()).collect()
    assert len(rows) == 1
    assert rows[0]["s"]["lex"] == "http://arvados.org/schema/modified_at"


# --- TestNoExceptions.java: queries that must optimize + run cleanly ----

@pytest.mark.parametrize("rq", ["ticket746", "filterSubselect737", "nestedSubselectsWithUnion737"])
def test_no_exceptions_rq(spark, rq):
    """TestNoExceptions.java:167-234 — parse/compile/evaluate on an
    empty store without raising."""
    st = TripleStore.from_rows(spark, [(None, "u:x", "u:p", Term.literal("seed"))])
    q = open(f"{SAIL}/{rq}.rq").read()
    st.query(q).collect()  # must not raise


def test_set_binding_pets(spark):
    """TestSetBinding.java:155 — the same query without and with a
    pre-bound ?name; the binding eliminates one solution."""
    st = TripleStore.from_turtle(spark, """
        @prefix ns: <http://localhost/pets#> .
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        <u:buffy> rdfs:label "Buffy" ; ns:weight "8" .
        <u:snowball> rdfs:label "Snowball" ; ns:weight "10" .
    """)
    q = ("PREFIX ns:<http://localhost/pets#> "
         "PREFIX rdfs:<http://www.w3.org/2000/01/rdf-schema#> "
         "SELECT ?name ?weight WHERE { ?uri rdfs:label ?name. ?uri ns:weight ?weight. }")
    free = {(r["name"]["lex"], r["weight"]["lex"]) for r in st.query(q).collect()}
    assert free == {("Buffy", "8"), ("Snowball", "10")}
    bound = {
        (r["name"]["lex"], r["weight"]["lex"])
        for r in st.query(q, bindings={"name": Term.literal("Snowball")}).collect()
    }
    assert bound == {("Snowball", "10")}


def _strbop_store(spark):
    # X rdfs:label over every literal form: xsd:string "foo", custom-dt
    # "foo", "foo"@EN, true, 1000 (TestStrBOp.java:104-110; the plain
    # "foo" add is commented out in the reference too)
    return TripleStore.from_turtle(spark, """
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        <u:x> rdf:type rdfs:Resource ;
              rdfs:label "foo"^^xsd:string ,
                         "foo"^^<http://www.bigdata.com/myDatatype> ,
                         "foo"@EN ,
                         true ,
                         "1000"^^xsd:long .
    """)


def test_strbop_str_filter_with_hint(spark):
    """TestStrBOp.java:135 — filter(str(?o) = "foo") over mixed literal
    forms, with the reference's hint:Query hint:optimizer "None" magic
    triple present (must be stripped, not matched as data)."""
    st = _strbop_store(spark)
    q = ("prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
         "prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> "
         "select ?p ?o where { "
         '  hint:Query hint:optimizer "None" . '
         "  ?s rdf:type rdfs:Resource . ?s ?p ?o . "
         '  filter(str(?o) = "foo") '
         '  filter(str(?p) = "http://www.w3.org/2000/01/rdf-schema#label") }')
    rows = st.query(q).collect()
    # the three "foo" lexical forms (string, custom datatype, @EN)
    assert len(rows) == 3
    assert all(r["o"]["lex"] == "foo" for r in rows)


def test_strbop_regex_ci(spark):
    """TestStrBOp.java testRegex — filter(regex(str(?o), "FOO", "i"))."""
    st = _strbop_store(spark)
    q = ("prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
         "prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> "
         "select ?p ?o where { "
         "  ?s rdf:type rdfs:Resource . ?s ?p ?o . "
         '  filter(regex(str(?o), "FOO", "i")) '
         '  filter(str(?p) = "http://www.w3.org/2000/01/rdf-schema#label") }')
    rows = st.query(q).collect()
    assert len(rows) == 3 and all(r["o"]["lex"] == "foo" for r in rows)


def test_optionals_left_joins(spark):
    """TestOptionals.java:115 — OPTIONAL price over three books, one
    without a price."""
    st = TripleStore.from_turtle(spark, """
        @prefix bd: <http://www.bigdata.com/rdf#> .
        @prefix dc: <http://purl.org/dc/elements/1.1/> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        bd:book1 dc:title "TITLE 1" ; bd:price "10"^^xsd:integer .
        bd:book2 dc:title "TITLE 2" ; bd:price "20"^^xsd:integer .
        bd:book3 dc:title "TITLE 3" .
    """)
    rows = st.query(
        "SELECT ?title ?price WHERE { "
        "?book <http://purl.org/dc/elements/1.1/title> ?title . "
        "OPTIONAL { ?book <http://www.bigdata.com/rdf#price> ?price . } . }"
    ).collect()
    got = {(r["title"]["lex"], None if r["price"] is None else r["price"]["lex"]) for r in rows}
    assert got == {("TITLE 1", "10"), ("TITLE 2", "20"), ("TITLE 3", None)}


def test_optionals_with_prebound_subject(spark):
    """TestOptionals.java:202 — REDUCED + OPTIONAL label with ?subj
    pre-bound."""
    st = TripleStore.from_turtle(spark, "<u:1> a <u:2> .")
    rows = st.query(
        "SELECT REDUCED ?subj ?subj_class ?subj_label WHERE { "
        "  ?subj a ?subj_class . "
        "  OPTIONAL { ?subj <http://www.w3.org/2000/01/rdf-schema#label> ?subj_label } }",
        bindings={"subj": Term.iri("u:1")},
    ).collect()
    assert len(rows) == 1
    assert rows[0]["subj_class"]["lex"] == "u:2" and rows[0]["subj_label"] is None


def _inline_values_store(spark):
    # the reference spells these URIs "_:A" etc. (Sesame's createURI is
    # lax); "_" is not a legal IRI scheme and our flat encoding reserves
    # the "_:" prefix for bnodes, so the port uses well-formed IRIs —
    # the test's substance (inline numeric value comparison) is the same
    return TripleStore.from_turtle(spark, """
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        <u:A> rdf:type <u:X> .  <u:B> rdf:type <u:X> .
        <u:A> <u:AGE> 25 .      <u:B> <u:AGE> 45 .
    """)


def test_inline_values_lt_gt_isliteral(spark):
    """TestInlineValues.java — numeric range filters and isLiteral over
    inline-value literals."""
    st = _inline_values_store(spark)
    base = ("select ?s ?age WHERE { "
            "?s <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <u:X> . "
            "?s <u:AGE> ?age . FILTER( %s ) . }")
    lt = st.query(base % "?age < 35").collect()
    assert [(r["s"]["lex"], r["age"]["lex"]) for r in lt] == [("u:A", "25")]
    gt = st.query(base % "?age > 35").collect()
    assert [(r["s"]["lex"], r["age"]["lex"]) for r in gt] == [("u:B", "45")]
    lit = {r["s"]["lex"] for r in st.query(base % "isLiteral(?age)").collect()}
    assert lit == {"u:A", "u:B"}


def test_multi_graphs_distinct_across_graphs(spark):
    """TestMultiGraphs.java:92 — the same triples asserted in TWO named
    graphs; SELECT DISTINCT over the union default graph dedups."""
    st = TripleStore.from_trig(spark, """
        @prefix ns: <http://www.bigdata.com/rdf#> .
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        ns:graph1 { ns:Mike a ns:Person ; ns:likes ns:RDF ; rdfs:label "Mike" . }
        ns:graph2 { ns:Mike a ns:Person ; ns:likes ns:RDF ; rdfs:label "Mike" . }
    """)
    rows = st.query(
        "PREFIX ns: <http://www.bigdata.com/rdf#> "
        "select distinct ?p ?o WHERE { ns:Mike ?p ?o . }"
    ).collect()
    assert len(rows) == 3  # type, likes, label — each once despite 2 graphs


def test_prune_binding_sets_chain(spark):
    """TestPruneBindingSets.java:82 — 4-hop chain with a constant
    endpoint; intermediate bindings prune to the single valid path."""
    st = TripleStore.from_turtle(spark, """
        <u:a> <u:x> <u:b> .  <u:b> <u:x> <u:c> .
        <u:c> <u:x> <u:d> .  <u:d> <u:x> <u:e> .
    """)
    rows = st.query(
        "select ?a WHERE { ?a <u:x> ?b . ?b <u:x> ?c . ?c <u:x> ?d . ?d <u:x> <u:e> . }"
    ).collect()
    assert [r["a"]["lex"] for r in rows] == ["u:a"]


def test_bops_or_equals_on_predicate(spark):
    """TestBOps.java:365 testOrEquals — FILTER(?p = rdfs:label || ?p =
    rdfs:comment) over an unbound-predicate scan."""
    st = TripleStore.from_turtle(spark, """
        @prefix ns: <http://www.bigdata.com/rdf#> .
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        ns:Mike a ns:Person ; rdfs:label "Mike" .
        ns:Bryan a ns:Person ; rdfs:comment "Bryan" .
    """)
    rows = st.query(
        "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> "
        "PREFIX ns: <http://www.bigdata.com/rdf#> "
        "select * WHERE { ?s a ns:Person . ?s ?p ?label . "
        "FILTER ( ?p = rdfs:label || ?p = rdfs:comment ) . }"
    ).collect()
    got = {(r["s"]["lex"].rsplit("#")[-1], r["p"]["lex"].rsplit("#")[-1], r["label"]["lex"]) for r in rows}
    assert got == {("Mike", "label", "Mike"), ("Bryan", "comment", "Bryan")}
