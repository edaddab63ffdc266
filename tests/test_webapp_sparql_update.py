"""Port of the reference's NanoSparqlServer webapp SPARQL UPDATE suite
(bigdata-sails/src/test/com/bigdata/rdf/sail/webapp/TestSparqlUpdate.java)
— every enabled test method, same-shape updates POSTed through the live
endpoint and asserted with the same hasStatement calls through the
RemoteRepository client (getStatements → CONSTRUCT with FROM-per-context,
None = bd:nullGraph, RemoteRepository.java:445/486).

Skipped reference methods (documented):
  * the commented-out //@Test BINDINGS variants — disabled in the
    reference itself ("Requires BINDINGS support"), not ported.
  * testUnicodeCleanAndRegex is ported including the reference's REGEX
    "i"-flag Unicode case-folding expectation (trac 655).

The suite reads the reference's own dataset-update.trig /
dataset-update-example9.trig fixtures in place (not copied)."""

from __future__ import annotations

import pytest

from bigdata_old_spark.client import RemoteRepository
from bigdata_old_spark.server import serve_background
from bigdata_old_spark.store import TripleStore

REF_WEBAPP = "/root/reference/bigdata-sails/src/test/com/bigdata/rdf/sail/webapp"
REF_RIO = "/root/reference/bigdata-rdf/src/test/com/bigdata/rdf/rio"

EX = "http://example.org/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
DC = "http://purl.org/dc/elements/1.1/"
FOAF = "http://xmlns.com/foaf/0.1/"
XSD = "http://www.w3.org/2001/XMLSchema#"

BOB = f"<{EX}bob>"
ALICE = f"<{EX}alice>"
G1 = EX + "graph1"
G2 = EX + "graph2"
G3 = EX + "graph3"
LABEL = f"<{RDFS}label>"
NAME = f"<{FOAF}name>"
MBOX = f"<{FOAF}mbox>"
KNOWS = f"<{FOAF}knows>"
PUBLISHER = f"<{DC}publisher>"
AGE = f"<{EX}age>"

PREFIXES = (
    f"PREFIX rdf: <{RDF}> \n"
    f"PREFIX rdfs: <{RDFS}> \n"
    f"PREFIX dc: <{DC}> \n"
    f"PREFIX foaf: <{FOAF}> \n"
    f"PREFIX ex: <{EX}> \n"
    f"PREFIX xsd: <{XSD}> \n\n"
)


@pytest.fixture()
def repo(spark):
    """Fresh store per test, loaded from the reference's own
    dataset-update.trig (TestSparqlUpdate.setUp)."""
    with open(f"{REF_WEBAPP}/dataset-update.trig", encoding="utf-8") as f:
        trig = f.read()
    store = TripleStore.from_trig(spark, trig)
    srv, _ = serve_background(store)
    r = RemoteRepository(f"http://127.0.0.1:{srv.server_address[1]}/sparql")
    yield r
    srv.shutdown()


def has(repo, s=None, p=None, o=None, *contexts):
    return repo.has_statement_in(s, p, o, *contexts)


# -- INSERT/DELETE ... WHERE -------------------------------------------------

def test_insert_where(repo):
    up = PREFIXES + "INSERT {?x rdfs:label ?y . } WHERE {?x foaf:name ?y }"
    assert not has(repo, BOB, LABEL, '"Bob"')
    assert not has(repo, ALICE, LABEL, '"Alice"')
    repo.update(up)
    assert has(repo, BOB, LABEL, '"Bob"')
    assert has(repo, ALICE, LABEL, '"Alice"')


def test_insert_empty_where(repo):
    up = PREFIXES + f'INSERT {{ {BOB} rdfs:label "Bob" . }} WHERE {{ }}'
    assert not has(repo, BOB, LABEL, '"Bob"')
    repo.update(up)
    assert has(repo, BOB, LABEL, '"Bob"')


def test_insert_non_matching_where(repo):
    up = PREFIXES + "INSERT { ?x rdfs:label ?y . } WHERE { ?x rdfs:comment ?y }"
    assert not has(repo, BOB, LABEL)
    repo.update(up)
    assert not has(repo, BOB, LABEL)


def test_insert_where_with_optional(repo):
    up = PREFIXES + (
        " INSERT { ?s ex:age ?incAge } "
        " WHERE { ?s foaf:name ?name . "
        " OPTIONAL {?s ex:age ?age . BIND ((?age + 1) as ?incAge)  } } ")
    assert not has(repo, ALICE, AGE)
    assert has(repo, BOB, AGE)
    repo.update(up)
    assert has(repo, BOB, AGE, f'"43"^^<{XSD}integer>')
    assert not has(repo, ALICE, AGE)


def test_delete_insert_where(repo):
    up = PREFIXES + ("DELETE { ?x foaf:name ?y } INSERT {?x rdfs:label ?y . } "
                     "WHERE {?x foaf:name ?y }")
    assert not has(repo, BOB, LABEL, '"Bob"')
    repo.update(up)
    assert has(repo, BOB, LABEL, '"Bob"')
    assert has(repo, ALICE, LABEL, '"Alice"')
    assert not has(repo, BOB, NAME, '"Bob"')
    assert not has(repo, ALICE, NAME, '"Alice"')


def test_delete_insert_where_looping_behavior(repo):
    """openrdf 2.6.3: WHERE evaluates ONCE against the pre-update state
    — the inserted ?z must not feed a second round."""
    up = PREFIXES + (
        " DELETE { ?x ex:age ?y } INSERT {?x ex:age ?z }"
        " WHERE { ?x ex:age ?y . BIND((?y + 1) as ?z) FILTER( ?y < 46 ) } ")
    i42, i43, i46 = (f'"{n}"^^<{XSD}integer>' for n in (42, 43, 46))
    assert has(repo, BOB, AGE, i42)
    repo.update(up)
    assert not has(repo, BOB, AGE, i42)
    assert has(repo, BOB, AGE, i43)
    assert not has(repo, BOB, AGE, i46)


def test_insert_transformed_where(repo):
    up = PREFIXES + "INSERT {?x rdfs:label [] . } WHERE {?y ex:containsPerson ?x. }"
    assert not has(repo, BOB, LABEL)
    repo.update(up)
    assert has(repo, BOB, LABEL)
    assert has(repo, ALICE, LABEL)


def test_insert_where_graph(repo):
    up = PREFIXES + ("INSERT {GRAPH ?g {?x rdfs:label ?y . }} "
                     "WHERE {GRAPH ?g {?x foaf:name ?y }}")
    repo.update(up)
    assert has(repo, BOB, LABEL, '"Bob"', G1)
    assert not has(repo, BOB, LABEL, '"Bob"', G2)
    assert has(repo, ALICE, LABEL, '"Alice"', G2)
    assert not has(repo, ALICE, LABEL, '"Alice"', G1)


def test_insert_where_using(repo):
    up = PREFIXES + "INSERT {?x rdfs:label ?y . } USING ex:graph1 WHERE {?x foaf:name ?y }"
    repo.update(up)
    assert has(repo, BOB, LABEL, '"Bob"', None)
    assert not has(repo, BOB, LABEL, '"Bob"', G1)
    assert not has(repo, BOB, LABEL, '"Bob"', G2)
    assert not has(repo, ALICE, LABEL, '"Alice"', None)
    assert not has(repo, ALICE, LABEL, '"Alice"', G2)
    assert not has(repo, ALICE, LABEL, '"Alice"', G1)


def test_insert_where_with(repo):
    up = PREFIXES + "WITH ex:graph1 INSERT {?x rdfs:label ?y . } WHERE {?x foaf:name ?y }"
    repo.update(up)
    assert has(repo, BOB, LABEL, '"Bob"', G1)
    assert not has(repo, BOB, LABEL, '"Bob"', G2)
    assert not has(repo, ALICE, LABEL, '"Alice"', G2)
    assert not has(repo, ALICE, LABEL, '"Alice"', G1)


def test_delete_where_shortcut(repo):
    up = PREFIXES + "DELETE WHERE {?x foaf:name ?y }"
    assert has(repo, BOB, NAME, '"Bob"')
    assert has(repo, ALICE, NAME, '"Alice"')
    repo.update(up)
    assert not has(repo, BOB, NAME, '"Bob"')
    assert not has(repo, ALICE, NAME, '"Alice"')
    assert has(repo, BOB, KNOWS)
    assert has(repo, ALICE, KNOWS)


def test_delete_where_shortcut2(repo):
    """trac 568: DELETE WHERE { GRAPH ?g {...} }."""
    up = PREFIXES + "DELETE WHERE { GRAPH ?g {?x foaf:name ?y } }"
    assert has(repo, BOB, NAME, '"Bob"')
    repo.update(up)
    assert not has(repo, BOB, NAME, '"Bob"')
    assert not has(repo, ALICE, NAME, '"Alice"')
    assert has(repo, BOB, KNOWS)
    assert has(repo, ALICE, KNOWS)


def test_delete_where(repo):
    up = PREFIXES + "DELETE {?x foaf:name ?y } WHERE {?x foaf:name ?y }"
    assert has(repo, BOB, NAME, '"Bob"')
    repo.update(up)
    assert not has(repo, BOB, NAME, '"Bob"')
    assert not has(repo, ALICE, NAME, '"Alice"')


# -- INSERT/DELETE DATA -------------------------------------------------------

def test_insert_data(repo):
    up = PREFIXES + 'INSERT DATA { ex:book1 dc:title "book 1" ; dc:creator "Ringo" . } '
    book1 = f"<{EX}book1>"
    assert not has(repo, book1, f"<{DC}title>", '"book 1"')
    repo.update(up)
    assert has(repo, book1, f"<{DC}title>", '"book 1"')
    assert has(repo, book1, f"<{DC}creator>", '"Ringo"')


def test_insert_data_multiple_patterns(repo):
    up = PREFIXES + ('INSERT DATA { ex:book1 dc:title "book 1". '
                     'ex:book1 dc:creator "Ringo" . ex:book2 dc:creator "George". } ')
    book1, book2 = f"<{EX}book1>", f"<{EX}book2>"
    repo.update(up)
    assert has(repo, book1, f"<{DC}title>", '"book 1"')
    assert has(repo, book1, f"<{DC}creator>", '"Ringo"')
    assert has(repo, book2, f"<{DC}creator>", '"George"')


def test_insert_data_in_graph(repo):
    up = PREFIXES + ('INSERT DATA { GRAPH ex:graph1 { ex:book1 dc:title "book 1" ; '
                     'dc:creator "Ringo" . } } ')
    book1 = f"<{EX}book1>"
    assert not has(repo, book1, f"<{DC}title>", '"book 1"', G1)
    repo.update(up)
    assert has(repo, book1, f"<{DC}title>", '"book 1"', G1)
    assert has(repo, book1, f"<{DC}creator>", '"Ringo"', G1)


def test_insert_data_in_graph2(repo):
    up = PREFIXES + ("INSERT DATA { GRAPH ex:graph1 { ex:Human rdfs:subClassOf ex:Mammal. "
                     "ex:Mammal rdfs:subClassOf ex:Animal. ex:george a ex:Human. "
                     "ex:ringo a ex:Human. } } ")
    repo.update(up)
    assert has(repo, f"<{EX}Human>", f"<{RDFS}subClassOf>", f"<{EX}Mammal>", G1)
    assert has(repo, f"<{EX}Mammal>", f"<{RDFS}subClassOf>", None, G1)
    assert has(repo, f"<{EX}george>", f"<{RDF}type>", f"<{EX}Human>", G1)


def test_delete_data(repo):
    up = PREFIXES + "DELETE DATA { ex:alice foaf:knows ex:bob. } "
    assert has(repo, ALICE, KNOWS, BOB)
    repo.update(up)
    assert not has(repo, ALICE, KNOWS, BOB)


def test_delete_data_multiple_patterns(repo):
    up = PREFIXES + ('DELETE DATA { ex:alice foaf:knows ex:bob. '
                     'ex:alice foaf:mbox "alice@example.org" .} ')
    assert has(repo, ALICE, KNOWS, BOB)
    assert has(repo, ALICE, MBOX, '"alice@example.org"')
    repo.update(up)
    assert not has(repo, ALICE, KNOWS, BOB)
    assert not has(repo, ALICE, MBOX, '"alice@example.org"')


def test_delete_data_from_graph(repo):
    up = PREFIXES + "DELETE DATA { GRAPH ex:graph1 {ex:alice foaf:knows ex:bob. } } "
    assert has(repo, ALICE, KNOWS, BOB, G1)
    repo.update(up)
    assert not has(repo, ALICE, KNOWS, BOB, G1)


def test_delete_data_from_wrong_graph(repo):
    up = PREFIXES + "DELETE DATA { GRAPH ex:graph2 {ex:alice foaf:knows ex:bob. } } "
    assert has(repo, ALICE, KNOWS, BOB, G1)
    assert not has(repo, ALICE, KNOWS, BOB, G2)
    repo.update(up)
    assert has(repo, ALICE, KNOWS, BOB, G1)


# -- CREATE -------------------------------------------------------------------

def test_create_new_graph(repo):
    repo.update(PREFIXES + f"CREATE GRAPH <{EX}new-graph> ")
    assert has(repo, None, None, None, G1)
    assert has(repo, None, None, None, G2)
    assert not has(repo, None, None, None, EX + "new-graph")
    assert has(repo)


def test_create_existing_graph(repo):
    """Creating an existing graph errors without SILENT
    (TestSparqlUpdate.testCreateExistingGraph)."""
    with pytest.raises(Exception):
        repo.update(PREFIXES + f"CREATE GRAPH <{G1}> ")
    # and succeeds with SILENT
    repo.update(PREFIXES + f"CREATE SILENT GRAPH <{G1}> ")


# -- COPY / ADD / MOVE ---------------------------------------------------------

def test_copy_to_default(repo):
    assert has(repo, f"<{G1}>", PUBLISHER, None, None)
    assert has(repo, f"<{G2}>", PUBLISHER, None, None)
    repo.update(PREFIXES + f"COPY GRAPH <{G1}> TO DEFAULT")
    assert not has(repo, f"<{G1}>", PUBLISHER, None, None)
    assert not has(repo, f"<{G2}>", PUBLISHER, None, None)
    assert has(repo, BOB, NAME, None, None)
    assert has(repo, BOB, NAME, None, G1)


def test_copy_to_existing_named(repo):
    repo.update(PREFIXES + "COPY GRAPH ex:graph1 TO ex:graph2")
    assert has(repo, BOB, NAME, None, G2)
    assert not has(repo, ALICE, NAME, None, G2)
    assert has(repo, BOB, NAME, None, G1)


def test_copy_to_new_named(repo):
    repo.update(PREFIXES + "COPY GRAPH ex:graph1 TO ex:graph3")
    assert has(repo, BOB, NAME, None, G3)
    assert has(repo, BOB, NAME, None, G1)


def test_copy_from_default(repo):
    assert has(repo, f"<{G1}>", PUBLISHER, None, None)
    assert has(repo, f"<{G2}>", PUBLISHER, None, None)
    repo.update(PREFIXES + "COPY DEFAULT TO ex:graph3")
    assert has(repo, f"<{G1}>", PUBLISHER, None, None)
    assert has(repo, f"<{G2}>", PUBLISHER, None, None)
    assert has(repo, f"<{G1}>", PUBLISHER, None, G3)
    assert has(repo, f"<{G2}>", PUBLISHER, None, G3)


def test_copy_from_default_to_default(repo):
    repo.update(PREFIXES + "COPY DEFAULT TO DEFAULT")
    assert has(repo, f"<{G1}>", PUBLISHER, None, None)
    assert has(repo, f"<{G2}>", PUBLISHER, None, None)


def test_add_to_default(repo):
    repo.update(PREFIXES + f"ADD GRAPH <{G1}> TO DEFAULT")
    assert has(repo, f"<{G1}>", PUBLISHER, None, None)
    assert has(repo, f"<{G2}>", PUBLISHER, None, None)
    assert has(repo, BOB, NAME, None, None)
    assert has(repo, BOB, NAME, None, G1)


def test_add_to_existing_named(repo):
    repo.update(PREFIXES + "ADD GRAPH ex:graph1 TO ex:graph2")
    assert has(repo, BOB, NAME, None, G2)
    assert has(repo, ALICE, NAME, None, G2)
    assert has(repo, BOB, NAME, None, G1)


def test_add_to_new_named(repo):
    repo.update(PREFIXES + "ADD GRAPH ex:graph1 TO ex:graph3")
    assert has(repo, BOB, NAME, None, G3)
    assert has(repo, BOB, NAME, None, G1)


def test_add_from_default(repo):
    repo.update(PREFIXES + "ADD DEFAULT TO ex:graph3")
    assert has(repo, f"<{G1}>", PUBLISHER, None, None)
    assert has(repo, f"<{G2}>", PUBLISHER, None, None)
    assert has(repo, f"<{G1}>", PUBLISHER, None, G3)
    assert has(repo, f"<{G2}>", PUBLISHER, None, G3)


def test_add_from_default_to_default(repo):
    repo.update(PREFIXES + "ADD DEFAULT TO DEFAULT")
    assert has(repo, f"<{G1}>", PUBLISHER, None, None)
    assert has(repo, f"<{G2}>", PUBLISHER, None, None)


def test_move_to_default(repo):
    repo.update(PREFIXES + f"MOVE GRAPH <{G1}> TO DEFAULT")
    assert not has(repo, f"<{G1}>", PUBLISHER, None, None)
    assert not has(repo, f"<{G2}>", PUBLISHER, None, None)
    assert has(repo, BOB, NAME, None, None)
    assert not has(repo, None, None, None, G1)


def test_move_to_new_named(repo):
    repo.update(PREFIXES + "MOVE GRAPH ex:graph1 TO ex:graph3")
    assert has(repo, BOB, NAME, None, G3)
    assert not has(repo, None, None, None, G1)


def test_move_from_default(repo):
    repo.update(PREFIXES + "MOVE DEFAULT TO ex:graph3")
    assert not has(repo, f"<{G1}>", PUBLISHER, None, None)
    assert not has(repo, f"<{G2}>", PUBLISHER, None, None)
    assert has(repo, f"<{G1}>", PUBLISHER, None, G3)
    assert has(repo, f"<{G2}>", PUBLISHER, None, G3)


def test_move_from_default_to_default(repo):
    repo.update(PREFIXES + "MOVE DEFAULT TO DEFAULT")
    assert has(repo, f"<{G1}>", PUBLISHER, None, None)
    assert has(repo, f"<{G2}>", PUBLISHER, None, None)


# -- CLEAR / DROP --------------------------------------------------------------

def test_clear_all(repo):
    repo.update("CLEAR ALL")
    assert not has(repo)


def test_clear_graph(repo):
    repo.update(PREFIXES + f"CLEAR GRAPH <{G1}> ")
    assert not has(repo, None, None, None, G1)
    assert has(repo, None, None, None, G2)
    assert has(repo)


def test_clear_named(repo):
    repo.update("CLEAR NAMED")
    assert not has(repo, None, None, None, G1)
    assert not has(repo, None, None, None, G2)
    assert has(repo)


def test_clear_default(repo):
    assert has(repo, None, None, None, G1)
    assert has(repo, None, None, None, G2)
    assert has(repo, None, None, None, None)
    repo.update("CLEAR DEFAULT")
    assert has(repo, None, None, None, G1)
    assert has(repo, None, None, None, G2)
    assert not has(repo, None, None, None, None)


def test_drop_all(repo):
    repo.update("DROP ALL")
    assert not has(repo)


def test_drop_graph(repo):
    repo.update(PREFIXES + f"DROP GRAPH <{G1}> ")
    assert not has(repo, None, None, None, G1)
    assert has(repo, None, None, None, G2)
    assert has(repo)


def test_drop_named(repo):
    repo.update("DROP NAMED")
    assert not has(repo, None, None, None, G1)
    assert not has(repo, None, None, None, G2)
    assert has(repo)


def test_drop_default(repo):
    assert has(repo, None, None, None, None)
    repo.update("DROP DEFAULT")
    assert has(repo, None, None, None, G1)
    assert has(repo, None, None, None, G2)
    assert not has(repo, None, None, None, None)


# -- sequences / tickets --------------------------------------------------------

def test_update_sequence_insert_delete2(repo):
    up = PREFIXES + (
        "INSERT { GRAPH ex:graph2 { ?s ?p ?o } } WHERE "
        "{ GRAPH ex:graph1 { ?s ?p ?o . FILTER (?s = ex:bob) } }; "
        "WITH ex:graph1 DELETE { ?s ?p ?o } WHERE {?s ?p ?o . FILTER (?s = ex:bob) } ")
    assert has(repo, BOB, NAME, '"Bob"', G1)
    assert has(repo, ALICE, NAME, '"Alice"', G2)
    repo.update(up)
    assert not has(repo, BOB, None, None, G1)
    assert has(repo, BOB, NAME, '"Bob"', G2)
    assert has(repo, BOB, MBOX, None, G2)
    assert has(repo, BOB, KNOWS, ALICE, G2)


def test_update_sequence_insert_delete_example9(repo):
    """SPARQL 1.1 Update example 9 over the reference's own
    dataset-update-example9.trig, loaded via LOAD <file:...>."""
    repo.update("DROP ALL")
    repo.update(f"LOAD <file:{REF_WEBAPP}/dataset-update-example9.trig>")
    book1 = "<http://example/book1>"
    store1, store2 = "http://example/bookStore", "http://example/bookStore2"
    up = (
        "prefix dc: <http://purl.org/dc/elements/1.1/> "
        "prefix dcmitype: <http://purl.org/dc/dcmitype/> "
        "prefix xsd: <http://www.w3.org/2001/XMLSchema#> "
        "INSERT { GRAPH <http://example/bookStore2> { ?book ?p ?v } } WHERE "
        "{ GRAPH <http://example/bookStore> { ?book dc:date ?date . "
        '  FILTER ( ?date < "2000-01-01T00:00:00-02:00"^^xsd:dateTime ) ?book ?p ?v } } ;'
        "WITH <http://example/bookStore> DELETE { ?book ?p ?v } WHERE "
        "{ ?book dc:date ?date ; a dcmitype:PhysicalObject . "
        '  FILTER ( ?date < "2000-01-01T00:00:00-02:00"^^xsd:dateTime ) ?book ?p ?v } ')
    repo.update(up)
    assert not has(repo, book1, None, None, store1)
    assert has(repo, book1, f"<{RDF}type>", None, store2)
    assert has(repo, book1, f"<{DC}date>", None, store2)
    assert has(repo, book1, f"<{DC}title>", None, store2)


def test_ticket_567(repo):
    """trac 567: DROP ALL; INSERT DATA; ADD SILENT; DROP SILENT in one
    request (IV-cache propagation bug in the reference)."""
    repo.update("DROP ALL")
    up = (
        "DROP ALL;\n"
        "INSERT DATA {\n"
        " GRAPH <http://example.org/one> {\n"
        "   <http://example.org/a> <http://example.org/b> <http://example.org/c> .\n"
        "   <http://example.org/d> <http://example.org/e> <http://example.org/f> .\n"
        "}};\n"
        "ADD SILENT GRAPH <http://example.org/one> TO GRAPH <http://example.org/two> ;\n"
        "DROP SILENT GRAPH <http://example.org/one>  ;\n")
    repo.update(up)
    assert not has(repo, None, None, None, "http://example.org/one")
    assert has(repo, None, None, None, "http://example.org/two")


def test_unicode_clean_and_regex(repo):
    """trac 655: REGEX "i" flag must case-fold Unicode (Ä ~ ä)."""
    repo.update('PREFIX ns: <http://example.org/ns#>\n'
                'INSERT DATA { GRAPH ns:graph { ns:auml ns:label "Ä", "ä" } }\n')
    rows = repo.tuple_query(
        'PREFIX ns: <http://example.org/ns#>\n'
        'SELECT * { GRAPH ns:graph { ?s ?p ?o FILTER(regex(?o, "ä", "i")) } }')
    assert len(rows) == 2


# -- LOAD -----------------------------------------------------------------------

def test_load(repo):
    repo.update(f"LOAD <file:{REF_RIO}/small.rdf>")
    ns = "http://bigdata.com/test/data#"
    assert has(repo, f"<{ns}mike>", LABEL, '"Michael Personick"')


def test_load_silent(repo):
    repo.update(f"LOAD SILENT <file:{REF_RIO}/NOT-FOUND.rdf>")
    ns = "http://bigdata.com/test/data#"
    assert not has(repo, f"<{ns}mike>", LABEL, '"Michael Personick"')


def test_load_not_silent_errors(repo):
    with pytest.raises(Exception):
        repo.update(f"LOAD <file:{REF_RIO}/NOT-FOUND.rdf>")


def test_load_into_graph(repo):
    g1 = "http://www.bigdata.com/g1"
    repo.update(f"LOAD <file:{REF_RIO}/small.rdf> INTO GRAPH <{g1}>")
    ns = "http://bigdata.com/test/data#"
    assert not has(repo, f"<{ns}mike>", LABEL, '"Michael Personick"', None)
    assert has(repo, f"<{ns}mike>", LABEL, '"Michael Personick"', g1)


def test_load_gzip(repo):
    repo.update(f"LOAD <file:{REF_RIO}/small.rdf.gz>")
    ns = "http://bigdata.com/test/data#"
    assert has(repo, f"<{ns}mike>", LABEL, '"Michael Personick"')


def test_really_long_query_string(repo):
    lit = '"' + "a" * 1000 + '"'
    up = PREFIXES + f"INSERT {{ {BOB} rdfs:label {lit} . }} WHERE {{ }}"
    assert not has(repo, BOB, LABEL, lit)
    repo.update(up)
    assert has(repo, BOB, LABEL, lit)
