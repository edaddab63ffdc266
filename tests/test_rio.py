"""RDF/XML parser tests — pure-Python (no Spark) except the final
store round-trip.  Fixtures follow the W3C RDF/XML syntax spec
examples; the reference parses this format in rio/rdfxml/."""

from bigdata_old_spark.rio import parse_rdfxml

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
EX = "http://example.org/"


def _spo(trips):
    return {(s, p, o.lex) for s, p, o in trips}


def test_basic_description():
    trips = parse_rdfxml(f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">
  <rdf:Description rdf:about="{EX}a">
    <ex:name>Alice</ex:name>
    <ex:knows rdf:resource="{EX}b"/>
  </rdf:Description>
</rdf:RDF>""")
    got = _spo(trips)
    assert (EX + "a", EX + "name", "Alice") in got
    assert (EX + "a", EX + "knows", EX + "b") in got


def test_typed_node_and_property_attrs():
    trips = parse_rdfxml(f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">
  <ex:Person rdf:about="{EX}a" ex:age="42"/>
</rdf:RDF>""")
    got = _spo(trips)
    assert (EX + "a", RDF + "type", EX + "Person") in got
    assert (EX + "a", EX + "age", "42") in got


def test_datatype_and_lang():
    trips = parse_rdfxml(f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}" xml:lang="en">
  <rdf:Description rdf:about="{EX}a">
    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">42</ex:age>
    <ex:label>hello</ex:label>
    <ex:motto xml:lang="fr">bonjour</ex:motto>
  </rdf:Description>
</rdf:RDF>""")
    by_p = {p: o for _, p, o in trips}
    assert by_p[EX + "age"].dt == "http://www.w3.org/2001/XMLSchema#integer"
    assert by_p[EX + "age"].lex == "42"
    assert by_p[EX + "label"].lang == "en"  # inherited from rdf:RDF
    assert by_p[EX + "motto"].lang == "fr"  # overridden locally


def test_nested_node_and_nodeid():
    trips = parse_rdfxml(f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">
  <rdf:Description rdf:about="{EX}a">
    <ex:knows>
      <ex:Person rdf:nodeID="bob"><ex:name>Bob</ex:name></ex:Person>
    </ex:knows>
  </rdf:Description>
</rdf:RDF>""")
    got = _spo(trips)
    assert (EX + "a", EX + "knows", "bob") in got  # bnode object keeps label
    assert ("_:bob", RDF + "type", EX + "Person") in got
    assert ("_:bob", EX + "name", "Bob") in got


def test_parsetype_resource_and_collection_and_li():
    trips = parse_rdfxml(f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">
  <rdf:Description rdf:about="{EX}a">
    <ex:addr rdf:parseType="Resource"><ex:city>Springfield</ex:city></ex:addr>
    <ex:list rdf:parseType="Collection">
      <rdf:Description rdf:about="{EX}x"/>
      <rdf:Description rdf:about="{EX}y"/>
    </ex:list>
  </rdf:Description>
  <rdf:Seq rdf:about="{EX}seq">
    <rdf:li rdf:resource="{EX}one"/>
    <rdf:li rdf:resource="{EX}two"/>
  </rdf:Seq>
</rdf:RDF>""")
    got = _spo(trips)
    # parseType=Resource: bnode with nested property
    addr = [o for s, p, o in trips if p == EX + "addr"][0]
    assert addr.kind == 1
    assert ("_:" + addr.lex, EX + "city", "Springfield") in got
    # Collection: rdf:first/rest chain ending in nil
    firsts = {o.lex for s, p, o in trips if p == RDF + "first"}
    assert firsts == {EX + "x", EX + "y"}
    rests = [o.lex for s, p, o in trips if p == RDF + "rest"]
    assert RDF + "nil" in rests
    # rdf:li numbering
    assert (EX + "seq", RDF + "_1", EX + "one") in got
    assert (EX + "seq", RDF + "_2", EX + "two") in got


def test_xml_base_and_rdf_id():
    trips = parse_rdfxml(f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}" xml:base="http://base.org/doc">
  <rdf:Description rdf:ID="frag"><ex:p rdf:resource="rel"/></rdf:Description>
</rdf:RDF>""")
    got = _spo(trips)
    assert ("http://base.org/doc#frag", EX + "p", "http://base.org/rel") in got


def test_reification_via_property_id():
    trips = parse_rdfxml(f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}" xml:base="http://base.org/">
  <rdf:Description rdf:about="{EX}a">
    <ex:says rdf:ID="claim1">hi</ex:says>
  </rdf:Description>
</rdf:RDF>""")
    got = _spo(trips)
    stmt = "http://base.org/#claim1"
    assert (stmt, RDF + "type", RDF + "Statement") in got
    assert (stmt, RDF + "subject", EX + "a") in got
    assert (stmt, RDF + "predicate", EX + "says") in got
    assert (stmt, RDF + "object", "hi") in got


def test_store_roundtrip(spark):
    from bigdata_old_spark.store import TripleStore

    st = TripleStore.from_rdfxml(spark, f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">
  <ex:Person rdf:about="{EX}alice"><ex:name>Alice</ex:name></ex:Person>
  <ex:Person rdf:about="{EX}bob"><ex:name>Bob</ex:name></ex:Person>
</rdf:RDF>""")
    rows = st.query(
        f'PREFIX ex: <{EX}> SELECT ?n WHERE {{ ?x a ex:Person ; ex:name ?n }} ORDER BY ?n'
    ).collect()
    assert [r.n.lex for r in rows] == ["Alice", "Bob"]


# ---------------------------------------------------------------------------
# TriG (Turtle + graph blocks)
# ---------------------------------------------------------------------------

def test_trig_blocks_and_default_graph():
    from bigdata_old_spark.rio import parse_trig

    quads = parse_trig("""
    @prefix ex: <http://example.org/> .
    ex:a ex:p ex:b .                      # default graph, plain Turtle
    ex:g1 { ex:a ex:p ex:c . ex:a ex:q "v" }
    GRAPH ex:g2 { ex:d ex:p ex:e . }
    { ex:f ex:p ex:h }                    # explicit default-graph block
    """)
    got = {(g, s, p, o.lex) for g, s, p, o in quads}
    assert (None, EX + "a", EX + "p", EX + "b") in got
    assert (EX + "g1", EX + "a", EX + "p", EX + "c") in got
    assert (EX + "g1", EX + "a", EX + "q", "v") in got
    assert (EX + "g2", EX + "d", EX + "p", EX + "e") in got
    assert (None, EX + "f", EX + "p", EX + "h") in got


def test_trig_bnode_graph_label_and_nested_syntax():
    from bigdata_old_spark.rio import parse_trig

    quads = parse_trig("""
    @prefix ex: <http://example.org/> .
    _:g { ex:a ex:p [ ex:q 1, 2 ] . }
    """)
    graphs = {g for g, *_ in quads}
    assert graphs == {"_:g"}
    assert len(quads) == 3  # a-p-bnode + two bnode-q values


def test_trig_store_roundtrip(spark):
    from bigdata_old_spark.store import TripleStore

    st = TripleStore.from_trig(spark, """
    @prefix ex: <http://example.org/> .
    ex:a ex:p ex:default .
    ex:g1 { ex:a ex:p ex:b . }
    ex:g2 { ex:a ex:p ex:c . }
    """)
    rows = st.query("""
        PREFIX ex: <http://example.org/>
        SELECT ?g ?o WHERE { GRAPH ?g { ex:a ex:p ?o } }
    """).collect()
    got = {(r["g"]["lex"], r["o"]["lex"]) for r in rows}
    assert got == {(EX + "g1", EX + "b"), (EX + "g2", EX + "c")}
    # no dataset → union default graph (reference quads-mode semantics)
    default = st.query("""
        PREFIX ex: <http://example.org/>
        SELECT ?o WHERE { ex:a ex:p ?o }
    """).collect()
    assert {r["o"]["lex"] for r in default} == {EX + "default", EX + "b", EX + "c"}
    # strict dataset semantics behind the flag
    strict = st.with_statements(st.statements)
    strict.union_default_graph = False
    default2 = strict.query("""
        PREFIX ex: <http://example.org/>
        SELECT ?o WHERE { ex:a ex:p ?o }
    """).collect()
    assert {r["o"]["lex"] for r in default2} == {EX + "default"}


NQUADS = """\
# comment line
<http://example.org/a> <http://example.org/p> <http://example.org/b> <http://example.org/g1> .
<http://example.org/a> <http://example.org/p> "lit"@en <http://example.org/g2> .
<http://example.org/a> <http://example.org/n> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
_:b1 <http://example.org/p> "plain" _:g3 .
"""


def test_nquads_roundtrip_vs_trig():
    """The same quads through the N-Quads and TriG parsers agree."""
    from bigdata_old_spark.rio import parse_nquads, parse_trig

    nq = parse_nquads(NQUADS)
    trig = parse_trig("""
    @prefix ex: <http://example.org/> .
    ex:g1 { ex:a ex:p ex:b . }
    ex:g2 { ex:a ex:p "lit"@en . }
    ex:a ex:n 42 .
    _:g3 { _:b1 ex:p "plain" . }
    """)
    assert sorted(map(repr, nq)) == sorted(map(repr, trig))


def test_nquads_line_forms():
    from bigdata_old_spark.rio import parse_nquads_line

    assert parse_nquads_line("# c") is None and parse_nquads_line("") is None
    g, s, p, o = parse_nquads_line(
        '<http://e/s> <http://e/p> "3.5"^^<http://www.w3.org/2001/XMLSchema#decimal> <http://e/g> .')
    assert (g, s, p, o.lex) == ("http://e/g", "http://e/s", "http://e/p", "3.5")
    g, s, p, o = parse_nquads_line("<http://e/s> <http://e/p> <http://e/o> .")
    assert g is None and o.lex == "http://e/o"


def test_load_nquads(spark, tmp_path):
    from bigdata_old_spark.rio import load_nquads
    from bigdata_old_spark.store import TripleStore

    f = tmp_path / "data.nq"
    f.write_text(NQUADS)
    df = load_nquads(spark, str(f))
    st = TripleStore(spark, df)
    rows = st.query("""
        PREFIX ex: <http://example.org/>
        SELECT ?g ?o WHERE { GRAPH ?g { ex:a ex:p ?o } }
    """).collect()
    assert {(r["g"]["lex"], r["o"]["lex"]) for r in rows} == {
        ("http://example.org/g1", "http://example.org/b"),
        ("http://example.org/g2", "lit"),
    }
    default = st.query("""
        PREFIX ex: <http://example.org/>
        SELECT ?o WHERE { ex:a ex:n ?o }
    """).collect()
    assert [r["o"]["lex"] for r in default] == ["42"]
