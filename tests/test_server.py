"""SPARQL 1.1 Protocol endpoint (reference NanoSparqlServer/QueryServlet
parity) — exercised over real localhost HTTP."""

import json
import urllib.parse
import urllib.request

import pytest

from bigdata_old_spark.server import serve_background
from bigdata_old_spark.store import TripleStore

TTL = """
@prefix : <http://example.org/> .
:a :p "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
:a :p "2"^^<http://www.w3.org/2001/XMLSchema#integer> .
:b :q :a .
"""


@pytest.fixture(scope="module")
def endpoint(spark):
    store = TripleStore.from_turtle(spark, TTL).persist()
    srv, _ = serve_background(store)
    base = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    yield base, srv
    srv.shutdown()


def _get(url, accept=None):
    req = urllib.request.Request(url, headers={"Accept": accept} if accept else {})
    with urllib.request.urlopen(req) as r:
        return r.status, r.headers.get_content_type(), r.read().decode()


def _post(url, data, ctype):
    req = urllib.request.Request(url, data=data.encode(), headers={"Content-Type": ctype})
    with urllib.request.urlopen(req) as r:
        return r.status, r.headers.get_content_type(), r.read().decode()


def test_get_select_json(endpoint):
    base, _ = endpoint
    q = "PREFIX : <http://example.org/> SELECT ?o WHERE { :a :p ?o } ORDER BY ?o"
    code, ctype, body = _get(f"{base}?query={urllib.parse.quote(q)}")
    assert code == 200 and ctype == "application/sparql-results+json"
    doc = json.loads(body)
    assert doc["head"]["vars"] == ["o"]
    assert [b["o"]["value"] for b in doc["results"]["bindings"]] == ["1", "2"]


def test_conneg_csv_and_xml(endpoint):
    base, _ = endpoint
    q = "PREFIX : <http://example.org/> SELECT ?o WHERE { :a :p ?o } ORDER BY ?o"
    url = f"{base}?query={urllib.parse.quote(q)}"
    code, ctype, body = _get(url, accept="text/csv")
    assert code == 200 and ctype == "text/csv" and body.splitlines()[0] == "o"
    code, ctype, body = _get(url, accept="application/sparql-results+xml")
    assert code == 200 and ctype == "application/sparql-results+xml"
    assert "<sparql" in body and "<literal" in body


def test_post_construct_turtle(endpoint):
    base, _ = endpoint
    q = """PREFIX : <http://example.org/>
           CONSTRUCT { ?s :copy ?o } WHERE { ?s :p ?o }"""
    code, ctype, body = _post(base, q, "application/sparql-query")
    assert code == 200 and ctype == "text/turtle"
    assert "copy" in body


def test_ask(endpoint):
    base, _ = endpoint
    q = "PREFIX : <http://example.org/> ASK { :b :q :a }"
    code, _, body = _get(f"{base}?query={urllib.parse.quote(q)}")
    assert code == 200 and json.loads(body)["boolean"] is True


def test_explain(endpoint):
    base, _ = endpoint
    q = "PREFIX : <http://example.org/> SELECT ?o WHERE { :a :p ?o }"
    code, ctype, body = _get(f"{base}?query={urllib.parse.quote(q)}&explain")
    assert code == 200 and ctype == "text/plain"
    assert "Physical Plan" in body


def test_update_roundtrip(endpoint):
    base, _ = endpoint
    upd = 'PREFIX : <http://example.org/> INSERT DATA { :c :p "9"^^<http://www.w3.org/2001/XMLSchema#integer> }'
    code, _, _ = _post(base, f"update={urllib.parse.quote(upd)}", "application/x-www-form-urlencoded")
    assert code == 200
    q = "PREFIX : <http://example.org/> SELECT ?o WHERE { :c :p ?o }"
    code, _, body = _get(f"{base}?query={urllib.parse.quote(q)}")
    assert [b["o"]["value"] for b in json.loads(body)["results"]["bindings"]] == ["9"]


def test_bad_query_400(endpoint):
    base, _ = endpoint
    try:
        _get(f"{base}?query=NOT%20SPARQL")
        raise AssertionError("expected HTTPError")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_real_service_federation(spark, endpoint):
    """SERVICE <…> against OUR OWN protocol endpoint over real HTTP —
    the full ServiceCallJoin loop (compile → POST → results-JSON →
    vectored join) with no fake transport."""
    from bigdata_old_spark import service
    from bigdata_old_spark.store import TripleStore

    base, _ = endpoint
    service.set_transport(None)  # ensure the real urllib transport
    local = TripleStore.from_turtle(spark, """
        @prefix : <http://example.org/> .
        :a :tag "local-a" . :zzz :tag "local-z" .
    """)
    df = local.query(f"""
        PREFIX : <http://example.org/>
        SELECT ?s ?tag ?o WHERE {{
          ?s :tag ?tag .
          SERVICE <{base}> {{ ?s :p ?o }}
        }} ORDER BY ?o""")
    rows = df.collect()
    # remote store binds :a :p 1/2 — the join keeps only :a
    assert [r["o"]["lex"] for r in rows] == ["1", "2"]
    assert all(r["s"]["lex"] == "http://example.org/a" for r in rows)
    assert all(r["tag"]["lex"] == "local-a" for r in rows)


def test_conneg_rdfxml_construct(endpoint):
    base, _ = endpoint
    q = "PREFIX : <http://example.org/> CONSTRUCT { :a :p ?o } WHERE { :a :p ?o }"
    url = f"{base}?query={urllib.parse.quote(q)}"
    code, ctype, body = _get(url, accept="application/rdf+xml")
    assert code == 200 and ctype == "application/rdf+xml"
    assert "<rdf:RDF" in body and "rdf:Description" in body


def test_describe_cache_endpoint(spark):
    """DescribeServlet + DescribeCache analog: repeated constant
    DESCRIBEs serve from the cache; UPDATEs invalidate through the
    changeset hook; non-describe queries are unaffected."""
    import urllib.parse

    store = TripleStore.from_turtle(spark, TTL).persist()
    srv, _ = serve_background(store, describe_cache=True)
    base = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    try:
        q = urllib.parse.quote("DESCRIBE <http://example.org/a>")
        _, _, body1 = _get(f"{base}?query={q}", accept="text/turtle")
        assert (srv.describe_cache.misses, srv.describe_cache.hits) == (1, 0)
        _, _, body2 = _get(f"{base}?query={q}", accept="text/turtle")
        assert (srv.describe_cache.misses, srv.describe_cache.hits) == (1, 1)
        assert body1 == body2 and '"1"' in body1

        # update touching :a (object position) invalidates
        _post(base, "INSERT DATA { <http://example.org/z> <http://example.org/r> <http://example.org/a> }",
              "application/sparql-update")
        assert srv.describe_cache.invalidations == 1
        _, _, body3 = _get(f"{base}?query={q}", accept="text/turtle")
        assert "http://example.org/z" in body3  # recomputed, sees the insert
        assert srv.describe_cache.misses == 2

        # a DESCRIBE with a WHERE pattern bypasses the cache
        q2 = urllib.parse.quote("DESCRIBE ?s WHERE { ?s <http://example.org/q> ?o }")
        status, _, _ = _get(f"{base}?query={q2}")
        assert status == 200
        assert srv.describe_cache.misses == 2  # untouched
    finally:
        srv.shutdown()
