"""Port of the reference's TestNanoSparqlClient webapp suite
(bigdata-sails/src/test/com/bigdata/rdf/sail/webapp/TestNanoSparqlClient.java)
— the RemoteRepository client API driven against a live endpoint:
startup/service description, ASK/SELECT conneg, bulk INSERT by body per
RDF format, context-uri defaults, very large literals, the ESTCARD
family (incl. quads contexts), CONTEXTS, DELETE by query / by access
path / by body, DESCRIBE/CONSTRUCT conneg, and the atomic PUT
update-with-query.

Fixtures (test_estcard.ttl/.trig, test_delete_by_access_path.ttl,
insert_triples_with_defaultContext.ttl) are the reference's own files,
read in place.

Documented skips: the BINARY/CSV-parse result formats the reference
itself disables (trac 714) and multi-part MIME update (disabled in the
reference).  N3 and TriX interchange is covered since round 9
(serializers.trix/n3 + rio.parse_trix)."""

from __future__ import annotations

import pytest

from bigdata_old_spark.client import HttpError, RemoteRepository
from bigdata_old_spark.server import serve_background
from bigdata_old_spark.store import TripleStore

REF_WEBAPP = "/root/reference/bigdata-sails/src/test/com/bigdata/rdf/sail/webapp"

BD = "http://www.bigdata.com/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
FOAF = "http://xmlns.com/foaf/0.1/"


@pytest.fixture()
def repo(spark):
    """Empty quads store per test (the reference suite starts empty)."""
    store = TripleStore.from_rows(spark, [])
    srv, _ = serve_background(store)
    r = RemoteRepository(f"http://127.0.0.1:{srv.server_address[1]}/sparql")
    yield r
    srv.shutdown()


def _load_fixture(repo, name):
    with open(f"{REF_WEBAPP}/{name}", encoding="utf-8") as f:
        text = f.read()
    ctype = "application/trig" if name.endswith(".trig") else "text/turtle"
    return repo.add(text, content_type=ctype)


def _gen_ntriples(n=23):
    """genNTRIPLES2: <bd:b> rdf:type <bd:c#i> for i in 0..n-1."""
    return "".join(
        f"<http://www.bigdata.org/b> <{RDF}type> <http://www.bigdata.org/c#{i}> .\n"
        for i in range(n))


def _gen_rdfxml(n=23):
    descs = "".join(
        f'<rdf:Description rdf:about="http://www.bigdata.org/b">'
        f'<rdf:type rdf:resource="http://www.bigdata.org/c#{i}"/>'
        f"</rdf:Description>" for i in range(n))
    return ('<?xml version="1.0"?>'
            f'<rdf:RDF xmlns:rdf="{RDF}">{descs}</rdf:RDF>')


def _gen_trig(n=23):
    return "{\n" + _gen_ntriples(n) + "}\n"


def count_all(repo):
    return repo.size()


# -- startup / service description / basic queries ------------------------------

def test_startup(repo):
    assert repo.get_service_description()


def test_service_description(repo):
    _load_fixture(repo, "test_estcard.ttl")
    sd = repo.get_service_description()
    assert "Service" in sd and "endpoint" in sd


def test_ask(repo):
    assert repo.boolean_query("ASK WHERE { ?s ?p ?o }") is False
    repo.add(_gen_ntriples(1), content_type="application/n-triples")
    assert repo.boolean_query("ASK WHERE { ?s ?p ?o }") is True


def test_select_all(repo):
    assert len(repo.tuple_query("select * where {?s ?p ?o}")) == 0


def test_get_select_error(repo):
    with pytest.raises(HttpError):
        repo.tuple_query("select * where {?s ?p ?o} X {}")


# -- INSERT with body per format --------------------------------------------------

def test_post_insert_with_body_ntriples(repo):
    assert repo.add(_gen_ntriples(), content_type="application/n-triples") == 23
    assert count_all(repo) == 23


def test_post_insert_with_body_turtle(repo):
    assert repo.add(_gen_ntriples(), content_type="text/turtle") == 23
    assert count_all(repo) == 23


def test_post_insert_with_body_rdfxml(repo):
    assert repo.add(_gen_rdfxml(), content_type="application/rdf+xml") == 23
    assert count_all(repo) == 23


def test_post_insert_with_body_trig(repo):
    assert repo.add(_gen_trig(), content_type="application/trig") == 23
    assert count_all(repo) == 23


def test_post_insert_triples_with_body_and_default_context(repo):
    with open(f"{REF_WEBAPP}/insert_triples_with_defaultContext.ttl",
              encoding="utf-8") as f:
        ttl = f.read()
    assert repo.add(ttl, content_type="text/turtle",
                    context_uri="http://example.org") == 7
    rows = repo.tuple_query(
        "select * { GRAPH <http://example.org> {?s ?p ?o} }")
    assert len(rows) == 7


def test_post_insert_triples_with_uri_and_default_context(repo):
    import urllib.parse

    url = (f"{repo.endpoint}?uri=file://{REF_WEBAPP}/"
           "insert_triples_with_defaultContext.ttl&context-uri="
           + urllib.parse.quote("<http://example.org>"))
    _, _, body = repo._request(url, b"", {"Content-Type": "text/plain"})
    rows = repo.tuple_query(
        "select * { GRAPH <http://example.org> {?s ?p ?o} }")
    assert len(rows) == 7


def test_insert_very_large_literal(repo):
    big = "x" * 1_000_000
    nt = f'<{BD}> <{RDFS}label> "{big}" .\n'
    assert repo.add(nt, content_type="application/n-triples") == 1
    g2 = repo.graph_query(f"DESCRIBE <{BD}>")
    assert len(g2) == 1
    assert g2[0][2].lex == big


# -- ESTCARD family ----------------------------------------------------------------

def test_estcard(repo):
    _load_fixture(repo, "test_estcard.ttl")
    assert repo.size() == 7


def test_estcard_s(repo):
    _load_fixture(repo, "test_estcard.ttl")
    assert repo.range_count(s=f"<{BD}Mike>") == 3


def test_estcard_p(repo):
    _load_fixture(repo, "test_estcard.ttl")
    assert repo.range_count(p=f"<{RDF}type>") == 3


def test_estcard_p2(repo):
    _load_fixture(repo, "test_estcard.ttl")
    assert repo.range_count(p=f"<{RDFS}label>") == 2


def test_estcard_o(repo):
    _load_fixture(repo, "test_estcard.ttl")
    assert repo.range_count(o=f"<{BD}Bryan>") == 1


def test_estcard_so(repo):
    _load_fixture(repo, "test_estcard.ttl")
    assert repo.range_count(s=f"<{BD}Mike>", p=f"<{RDF}type>") == 1


def test_estcard_quads_01(repo):
    _load_fixture(repo, "test_estcard.trig")
    assert repo.range_count() == 7


def test_estcard_quads_02(repo):
    _load_fixture(repo, "test_estcard.trig")
    assert repo.range_count(c=f"<{BD}>") == 3


def test_estcard_quads_03(repo):
    _load_fixture(repo, "test_estcard.trig")
    assert repo.range_count(c=f"<{BD}c1>") == 2


def test_estcard_quads_04(repo):
    _load_fixture(repo, "test_estcard.trig")
    assert repo.range_count(s=f"<{BD}Mike>", c=f"<{BD}c1>") == 1


def test_contexts(repo):
    _load_fixture(repo, "test_estcard.trig")
    assert set(repo.contexts()) == {BD, BD + "c1", BD + "c2"}


# -- DELETE: by query / by access path / by body -----------------------------------

def test_delete_with_query(repo):
    repo.add(_gen_ntriples(), content_type="application/n-triples")
    assert count_all(repo) == 23
    repo.remove_with_query("construct {?s ?p ?o} where {?s ?p ?o}")
    assert count_all(repo) == 0


def test_delete_access_path_delete_all(repo):
    _load_fixture(repo, "test_delete_by_access_path.ttl")
    assert repo.remove() == 7


def test_delete_access_path_delete_s(repo):
    _load_fixture(repo, "test_delete_by_access_path.ttl")
    assert repo.remove(s=f"<{BD}Mike>") == 3


def test_delete_access_path_delete_p(repo):
    _load_fixture(repo, "test_delete_by_access_path.ttl")
    assert repo.remove(p=f"<{RDFS}label>") == 2


def test_delete_access_path_delete_o_uri(repo):
    _load_fixture(repo, "test_delete_by_access_path.ttl")
    assert repo.remove(o=f"<{FOAF}Person>") == 3


def test_delete_access_path_delete_o_uri2(repo):
    _load_fixture(repo, "test_delete_by_access_path.ttl")
    assert repo.remove(o=f"<{BD}Bryan>") == 1


def test_delete_access_path_delete_p_o_uri(repo):
    _load_fixture(repo, "test_delete_by_access_path.ttl")
    assert repo.remove(p=f"<{RDF}type>", o=f"<{FOAF}Person>") == 3


def test_delete_access_path_delete_p_o_literal(repo):
    _load_fixture(repo, "test_delete_by_access_path.ttl")
    assert repo.remove(p=f"<{RDFS}label>", o='"Bryan"') == 1


def test_delete_access_path_nothing_matched(repo):
    _load_fixture(repo, "test_delete_by_access_path.ttl")
    assert repo.remove(o=f"<{FOAF}XXX>") == 0


def test_delete_access_path_delete_c(repo):
    _load_fixture(repo, "test_delete_by_access_path.trig")
    assert repo.remove(c=f"<{BD}>") == 3


def test_delete_access_path_delete_c1(repo):
    _load_fixture(repo, "test_delete_by_access_path.trig")
    assert repo.remove(c=f"<{BD}c1>") == 2


def test_delete_access_path_c_nothing_matched(repo):
    _load_fixture(repo, "test_delete_by_access_path.trig")
    assert repo.remove(c=f"<{FOAF}XXX>") == 0


def test_delete_with_post_body_ntriples(repo):
    repo.add(_gen_ntriples(), content_type="application/n-triples")
    assert count_all(repo) == 23
    assert repo.remove_with_body(_gen_ntriples(),
                                 content_type="application/n-triples") == 23
    assert count_all(repo) == 0


def test_delete_with_post_body_turtle(repo):
    repo.add(_gen_ntriples(), content_type="text/turtle")
    assert repo.remove_with_body(_gen_ntriples(), content_type="text/turtle") == 23
    assert count_all(repo) == 0


# -- DESCRIBE / CONSTRUCT conneg ----------------------------------------------------

_SETUP_NT = (
    f"<{BD}Mike> <{RDF}type> <{BD}Person> .\n"
    f"<{BD}Mike> <{BD}likes> <{BD}RDF> .\n"
    f'<{BD}Mike> <{RDFS}label> "Mike" .\n'
    f"<{BD}Bryan> <{RDF}type> <{BD}Person> .\n"
    f"<{BD}Bryan> <{BD}likes> <{BD}RDFS> .\n"
    f'<{BD}Bryan> <{RDFS}label> "Bryan" .\n'
)

DESCRIBE_Q = (
    f"prefix bd: <{BD}> prefix rdf: <{RDF}> prefix rdfs: <{RDFS}> "
    "DESCRIBE ?x WHERE { ?x rdf:type bd:Person . ?x bd:likes bd:RDF }")

CONSTRUCT_Q = (
    f"prefix bd: <{BD}> prefix rdf: <{RDF}> prefix rdfs: <{RDFS}> "
    "CONSTRUCT { ?x rdf:type bd:Person } "
    "WHERE { ?x rdf:type bd:Person . ?x bd:likes bd:RDF }")


def _graph_via(repo, q, accept):
    import urllib.parse
    import urllib.request

    req = urllib.request.Request(
        f"{repo.endpoint}?query={urllib.parse.quote(q)}",
        headers={"Accept": accept})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.headers.get_content_type(), r.read().decode()


def _parse_graph(accept, body):
    import bigdata_old_spark.rio as rio

    if accept == "application/rdf+xml":
        return rio.parse_rdfxml(body)
    if accept in ("text/turtle", "text/rdf+n3"):
        return rio.parse_turtle(body)
    if accept == "application/trix":
        return rio.parse_trix(body)
    if accept == "application/ld+json":
        return rio.parse_jsonld(body)
    return [ln for ln in body.splitlines() if ln.strip()]  # N-Triples


@pytest.mark.parametrize("accept", [
    "application/rdf+xml", "application/n-triples", "text/turtle",
    "application/trix", "text/rdf+n3", "application/ld+json"])
@pytest.mark.parametrize("query,nexpected", [(DESCRIBE_Q, 3), (CONSTRUCT_Q, 1)])
def test_describe_construct_conneg(repo, accept, query, nexpected):
    """GET DESCRIBE/CONSTRUCT in each served RDF interchange format
    (test_GET_DESCRIBE_* / test_GET_CONSTRUCT_* incl. the TRIX and NB/N3
    variants served since round 9, JSON-LD since round 10)."""
    repo.add(_SETUP_NT, content_type="application/n-triples")
    ctype, body = _graph_via(repo, query, accept)
    assert ctype == accept
    assert len(_parse_graph(accept, body)) == nexpected


def test_insert_jsonld_body(repo):
    """POST-with-body bulk insert accepts application/ld+json
    (InsertServlet.doPostWithBody through the RIO registry)."""
    doc = ('[{"@id": "%sMike", "%slikes": [{"@id": "%sJSONLD"}],'
           ' "@type": ["%sPerson"]}]') % (BD, BD, BD, BD)
    n = repo.add(doc, content_type="application/ld+json")
    assert n == 2
    assert repo.boolean_query(
        f"ASK {{ <{BD}Mike> <{BD}likes> <{BD}JSONLD> }}") is True


# -- atomic PUT update-with-query ----------------------------------------------------

def test_put_update_with_query(repo):
    repo.add(_SETUP_NT, content_type="application/n-triples")
    delete_q = (f"prefix bd: <{BD}> "
                "CONSTRUCT { ?x bd:likes bd:RDFS } WHERE { ?x bd:likes bd:RDFS }")
    # cross-check the doomed set
    assert {(s, p, o.lex) for s, p, o in repo.graph_query(delete_q)} == {
        (BD + "Bryan", BD + "likes", BD + "RDFS")}
    add_body = f"<{BD}Bryan> <{BD}likes> <{BD}RDF> .\n"
    n = repo.update_with_query(delete_q, add_body,
                               content_type="application/n-triples")
    assert n == 2  # 1 removed + 1 added
    assert repo.boolean_query(
        f"ASK {{ <{BD}Bryan> <{BD}likes> <{BD}RDF> }}") is True
    assert repo.boolean_query(
        f"ASK {{ <{BD}Bryan> <{BD}likes> <{BD}RDFS> }}") is False
