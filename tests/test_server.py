"""SPARQL 1.1 Protocol endpoint (reference NanoSparqlServer/QueryServlet
parity) — exercised over real localhost HTTP."""

import json
import re
import urllib.error
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


# -- NanoSparqlServer REST API extensions ------------------------------------

def _delete(url):
    req = urllib.request.Request(url, method="DELETE")
    with urllib.request.urlopen(req) as r:
        return r.status, r.read().decode()


def test_estcard_access_path(endpoint):
    """GET ?ESTCARD&s/p/o — QueryServlet.doEstCard / reportRangeCount."""
    base, _ = endpoint
    code, ctype, body = _get(f"{base}?ESTCARD")
    assert code == 200 and ctype == "application/xml"
    m = re.search(r'rangeCount="(\d+)"', body)
    total = int(m.group(1))
    assert total >= 3
    s = urllib.parse.quote("<http://example.org/a>")
    _, _, body = _get(f"{base}?ESTCARD&s={s}")
    assert 'rangeCount="2"' in body
    o = urllib.parse.quote('"1"^^<http://www.w3.org/2001/XMLSchema#integer>')
    _, _, body = _get(f"{base}?ESTCARD&s={s}&o={o}")
    assert 'rangeCount="1"' in body
    # bad value encoding → 400
    req = urllib.request.Request(f"{base}?ESTCARD&s=notaterm")
    try:
        urllib.request.urlopen(req)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_contexts_uuid(endpoint):
    base, _ = endpoint
    code, ctype, body = _get(f"{base}?CONTEXTS")
    assert code == 200 and ctype == "application/xml"
    assert body.startswith("<contexts>")  # triples-only store: no contexts
    code, ctype, body = _get(f"{base}?uuid")
    assert code == 200 and re.fullmatch(r"[0-9a-f-]{36}", body)


def test_insert_body_and_access_path_delete(spark):
    """POST an RDF body (InsertServlet), count it (ESTCARD), then
    DELETE by access path (DeleteServlet) — full REST mutation loop."""
    from bigdata_old_spark.server import serve_background
    from bigdata_old_spark.store import TripleStore

    store = TripleStore.from_turtle(spark, "@prefix : <http://example.org/> . :seed :p :o .")
    srv, _ = serve_background(store)
    base = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    try:
        ttl = "@prefix : <http://example.org/> . :n1 :tag \"x\" . :n2 :tag \"y\" ."
        code, ctype, body = _post(base, ttl, "text/turtle")
        assert code == 200 and 'modified="2"' in body
        p = urllib.parse.quote("<http://example.org/tag>")
        _, _, body = _get(f"{base}?ESTCARD&p={p}")
        assert 'rangeCount="2"' in body
        # insert into a named graph via context-uri
        g = urllib.parse.quote("<http://example.org/g1>")
        code, _, body = _post(f"{base}?context-uri={g}", ttl, "text/turtle")
        assert code == 200 and 'modified="2"' in body
        _, _, body = _get(f"{base}?CONTEXTS")
        assert '<context uri="http://example.org/g1"/>' in body
        # delete the default-graph :tag statements only
        code, body = _delete(f"{base}?p={p}&o={urllib.parse.quote(chr(34) + 'x' + chr(34))}")
        assert code == 200 and 'modified="2"' in body  # default + g1 copy
        _, _, body = _get(f"{base}?ESTCARD&p={p}")
        assert 'rangeCount="2"' in body  # the two "y" rows survive
        # access-path delete with a context restriction (g1 now holds
        # only its "y" row — its "x" went with the o-filtered delete)
        code, body = _delete(f"{base}?c={g}")
        assert code == 200 and 'modified="1"' in body
        _, _, body = _get(f"{base}?CONTEXTS")
        assert "g1" not in body
    finally:
        srv.shutdown()


def test_service_description_at_bare_endpoint(endpoint):
    """GET with no parameters → SPARQL 1.1 Service Description
    (QueryServlet.doServiceDescription / SD.java), round-trippable
    through our own Turtle parser."""
    from bigdata_old_spark.rio import parse_turtle

    base, _ = endpoint
    code, ctype, body = _get(base)
    assert code == 200 and ctype == "text/turtle"
    triples = parse_turtle(body)
    sd = "http://www.w3.org/ns/sparql-service-description#"
    preds = {p for _, p, _ in triples}
    assert sd + "endpoint" in preds and sd + "supportedLanguage" in preds
    void_triples = [o for _, p, o in triples if p == "http://rdfs.org/ns/void#triples"]
    assert len(void_triples) == 1 and int(void_triples[0].lex) >= 3


def test_multitenancy_lifecycle(spark):
    """MultiTenancyServlet analog: create a namespace, use its own
    /namespace/NS/sparql endpoint (isolated from the default KB),
    list all namespaces, destroy it."""
    store = TripleStore.from_turtle(spark, TTL).persist()
    srv, _ = serve_background(store)
    root = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # create
        props = "com.bigdata.rdf.sail.namespace=tenant1\n"
        req = urllib.request.Request(
            f"{root}/namespace", data=props.encode(),
            headers={"Content-Type": "text/plain"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 201
            assert r.headers["Location"].endswith("/namespace/tenant1/sparql")
        # duplicate create → 400 (the reference's TestMultiTenancyAPI
        # doTestCreate expects HTTP_BADREQUEST)
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"{root}/namespace", data=props.encode(),
                headers={"Content-Type": "text/plain"}))
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # the new KB is empty and isolated from the default
        t1 = f"{root}/namespace/tenant1/sparql"
        _, _, body = _get(f"{t1}?ESTCARD")
        assert 'rangeCount="0"' in body
        ttl = '@prefix : <http://example.org/> . :t :only "tenant" .'
        code, _, body = _post(t1, ttl, "text/turtle")
        assert code == 200 and 'modified="1"' in body
        _, _, body = _get(f"{t1}?ESTCARD")
        assert 'rangeCount="1"' in body
        _, _, body = _get(f"{root}/sparql?ESTCARD")
        assert 'rangeCount="3"' in body  # default KB untouched
        # SPARQL against the tenant endpoint
        q = urllib.parse.quote("SELECT ?o WHERE { ?s ?p ?o }")
        _, _, body = _get(f"{t1}?query={q}")
        assert json.loads(body)["results"]["bindings"][0]["o"]["value"] == "tenant"
        # list
        _, ctype, body = _get(f"{root}/namespace")
        assert ctype == "text/turtle"
        assert "/namespace/kb/sparql" in body and "/namespace/tenant1/sparql" in body
        # unknown namespace → 404
        try:
            _get(f"{root}/namespace/ghost/sparql?ESTCARD")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # destroy
        req = urllib.request.Request(f"{root}/namespace/tenant1", method="DELETE")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        try:
            _get(f"{t1}?ESTCARD")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # the default namespace is protected
        req = urllib.request.Request(f"{root}/namespace/kb", method="DELETE")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 409")
        except urllib.error.HTTPError as e:
            assert e.code == 409
    finally:
        srv.shutdown()


def test_insert_from_file_uris(spark, tmp_path):
    """InsertServlet.doPostWithURIs analog: POST ?uri=file://… loads
    each document (format sniffed from extension)."""
    f1 = tmp_path / "d1.ttl"
    f1.write_text('@prefix : <http://example.org/> . :u1 :src "file1" .')
    f2 = tmp_path / "d2.nt"
    f2.write_text('<http://example.org/u2> <http://example.org/src> "file2" .\n')
    store = TripleStore.from_turtle(spark, TTL).persist()
    srv, _ = serve_background(store)
    base = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    try:
        u1 = urllib.parse.quote(f"file://{f1}", safe="")
        u2 = urllib.parse.quote(f"file://{f2}", safe="")
        req = urllib.request.Request(f"{base}?uri={u1}&uri={u2}", data=b"", method="POST")
        with urllib.request.urlopen(req) as r:
            body = r.read().decode()
            assert r.status == 200 and 'modified="2"' in body
        p = urllib.parse.quote("<http://example.org/src>")
        _, _, body = _get(f"{base}?ESTCARD&p={p}")
        assert 'rangeCount="2"' in body
        # non-file URI refused
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"{base}?uri=http%3A%2F%2Fexample.org%2Fx.ttl", data=b"", method="POST"))
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


# -- cancellation tests run ISOLATED -----------------------------------------
# Job-group cancellation is routine on a cluster, but in a shared
# single-JVM local session a cancel can wedge the scheduler for every
# later collect (Spark local-mode artifact, observed as cascading
# [INTERNAL_ERROR] collectToPython).  The status-cancel and
# query-deadline tests therefore run in their OWN interpreter + Spark
# session, so the suite's shared session is never exposed to a cancel.

_ISOLATED_PRELUDE = """
import json, re, sys, threading, time, urllib.error, urllib.parse, urllib.request
sys.path.insert(0, "/root/repo")
from bigdata_old_spark.session import get_spark
from bigdata_old_spark.server import serve_background
from bigdata_old_spark.store import TripleStore
spark = get_spark("isolated-cancel-test", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
TTL = \'\'\'%s\'\'\'
store = TripleStore.from_turtle(spark, TTL).persist()
def GET(url):
    with urllib.request.urlopen(url) as r:
        return r.status, r.read().decode()
""" % TTL


_STATUS_SCRIPT = _ISOLATED_PRELUDE + """
srv, _ = serve_background(store)
root = "http://127.0.0.1:%d" % srv.server_address[1]
code, body = GET(root + "/status")
assert code == 200 and "uptime_sec:" in body and "namespaces: kb" in body
assert "running_queries:" in body
code, body = GET(root + "/status?cancelQuery&queryId=no-such-id")
assert code == 200 and body.strip() == "cancelled: 0"
q = urllib.parse.quote("SELECT * WHERE { ?a ?b ?c . ?d ?e ?f . ?g ?h ?i . ?j ?k ?l }")
def run():
    try:
        GET(root + "/sparql?query=" + q)
    except urllib.error.HTTPError:
        pass
t = threading.Thread(target=run); t.start()
qid = None
for _ in range(100):
    _, body = GET(root + "/status")
    m = re.search(r"^  (\\S+)  elapsed=", body, re.M)
    if m:
        qid = m.group(1); break
    time.sleep(0.05)
if qid is not None:
    code, body = GET(root + "/status?cancelQuery&queryId=" + qid)
    assert body.strip() in ("cancelled: 1", "cancelled: 0")
t.join(timeout=120)
assert not t.is_alive()
_, body = GET(root + "/status")
assert "elapsed=" not in body
print("ALL_OK")
"""


_DEADLINE_SCRIPT = _ISOLATED_PRELUDE + """
srv, _ = serve_background(store, query_timeout=0.05)
base = "http://127.0.0.1:%d/sparql" % srv.server_address[1]
heavy = urllib.parse.quote(
    "SELECT * WHERE { ?a ?b ?c . ?d ?e ?f . ?g ?h ?i . ?j ?k ?l }")
try:
    GET(base + "?query=" + heavy)
    raise AssertionError("expected deadline error")
except urllib.error.HTTPError as e:
    body = e.read().decode()
    assert e.code == 500 and "deadline" in body, (e.code, body[:200])
srv.shutdown()
srv2, _ = serve_background(store, query_timeout=300)
base2 = "http://127.0.0.1:%d/sparql" % srv2.server_address[1]
q = urllib.parse.quote("PREFIX : <http://example.org/> ASK { :b :q :a }")
last = None
for _ in range(5):
    try:
        code, body = GET(base2 + "?query=" + q)
        break
    except urllib.error.HTTPError as e:
        last = "%d %s" % (e.code, e.read().decode()[:300])
        time.sleep(2)
else:
    raise AssertionError("fast query kept failing: " + str(last))
assert code == 200 and json.loads(body)["boolean"] is True
print("ALL_OK")
"""


def _run_isolated(script: str):
    import os
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, "-c", script],
        capture_output=True, text=True, timeout=900, env=dict(os.environ),
    )
    assert r.returncode == 0 and "ALL_OK" in r.stdout, (
        f"isolated test failed\nstdout: {r.stdout[-1500:]}\n"
        f"stderr: {r.stderr[-1500:]}"
    )


def test_status_page_and_cancel():
    """StatusServlet analog: /status reports uptime, namespaces and
    running queries; cancelQuery cancels a live query's job group.
    Runs isolated — see the comment above."""
    _run_isolated(_STATUS_SCRIPT)


def test_query_timeout_deadline():
    """ConfigParams.QUERY_TIMEOUT analog: a query exceeding the
    server's deadline is cancelled and reported as an error; fast
    queries are untouched.  Runs isolated — see the comment above."""
    _run_isolated(_DEADLINE_SCRIPT)


def test_counters_endpoint(endpoint):
    """CountersServlet analog: /counters renders the reference's
    counter-set XML (cs path / c name-type-time-value attributes,
    XMLUtility.java:326-382) and counts executed queries/updates;
    ?filter= prunes by counter-path regex."""
    import xml.etree.ElementTree as ET

    base, srv = endpoint
    root_url = base.rsplit("/sparql", 1)[0]

    def snap():
        status, ctype, body = _get(f"{root_url}/counters")
        assert status == 200 and ctype == "application/xml"
        tree = ET.fromstring(body)
        assert tree.tag == "counters"
        return {cs.get("path"): {c.get("name"): c for c in cs} for cs in tree}

    # deltas, not absolutes — the module-scoped endpoint is shared and
    # earlier tests have already queried/mutated it
    before = snap()
    q0 = int(before["/Query Engine"]["queriesExecuted"].get("value"))
    u0 = int(before["/Query Engine"]["updatesExecuted"].get("value"))
    n0 = int(before["/Journal/kb"]["statementCount"].get("value"))
    q = urllib.parse.quote("SELECT ?s WHERE { ?s ?p ?o } LIMIT 1")
    _get(f"{base}?query={q}")
    _post(base, "update=" + urllib.parse.quote(
        "INSERT DATA { <http://example.org/counters-probe> "
        "<http://example.org/y> 1 }"),
        "application/x-www-form-urlencoded")
    after = snap()
    qe = after["/Query Engine"]
    assert int(qe["queriesExecuted"].get("value")) == q0 + 1
    assert qe["queriesExecuted"].get("type") == "xs:long"
    assert qe["queriesExecuted"].get("time") is not None
    assert int(qe["updatesExecuted"].get("value")) == u0 + 1
    assert int(after["/Journal/kb"]["statementCount"].get("value")) == n0 + 1
    # filter: only Journal counters survive
    _, _, fbody = _get(f"{root_url}/counters?filter=" + urllib.parse.quote("^/Journal"))
    ft = ET.fromstring(fbody)
    assert {cs.get("path") for cs in ft} == {"/Journal/kb"}
    # bad regex → 400
    try:
        _get(f"{root_url}/counters?filter=" + urllib.parse.quote("(unclosed"))
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_graph_store_protocol_lifecycle(spark):
    """SPARQL 1.1 Graph Store HTTP Protocol (indirect identification):
    PUT creates (201) / replaces (200), GET serializes, POST merges,
    DELETE drops, absent named graphs 404; ?default addresses the
    default graph."""
    from bigdata_old_spark.store import TripleStore
    from bigdata_old_spark.server import serve_background

    store = TripleStore.from_turtle(
        spark, "@prefix : <http://example.org/> . :seed :p :o .")
    srv, _ = serve_background(store)
    base = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    g = urllib.parse.quote("http://example.org/g1")
    try:
        def req(method, url, data=None, ctype=None, accept=None):
            headers = {}
            if ctype:
                headers["Content-Type"] = ctype
            if accept:
                headers["Accept"] = accept
            r = urllib.request.Request(
                url, data=data.encode() if data else None,
                headers=headers, method=method)
            try:
                with urllib.request.urlopen(r) as resp:
                    return resp.status, resp.read().decode()
            except urllib.error.HTTPError as e:
                return e.code, e.read().decode()

        # GET / DELETE of an absent named graph → 404
        assert req("GET", f"{base}?graph={g}")[0] == 404
        assert req("DELETE", f"{base}?graph={g}")[0] == 404
        # PUT creates → 201
        ttl = '@prefix : <http://example.org/> . :a :tag "x" .'
        assert req("PUT", f"{base}?graph={g}", ttl, "text/turtle")[0] == 201
        code, body = req("GET", f"{base}?graph={g}",
                         accept="application/n-triples")
        assert code == 200 and '<http://example.org/a>' in body and '"x"' in body
        # POST merges → graph now has 2 triples
        assert req("POST", f"{base}?graph={g}",
                   '@prefix : <http://example.org/> . :b :tag "y" .',
                   "text/turtle")[0] == 200
        _, body = req("GET", f"{base}?graph={g}", accept="application/n-triples")
        assert '"x"' in body and '"y"' in body
        # PUT replaces → 200, only the new content remains
        assert req("PUT", f"{base}?graph={g}",
                   '@prefix : <http://example.org/> . :c :tag "z" .',
                   "text/turtle")[0] == 200
        _, body = req("GET", f"{base}?graph={g}", accept="application/n-triples")
        assert '"z"' in body and '"x"' not in body
        # the default graph is addressable and unaffected
        _, body = req("GET", f"{base}?default", accept="application/n-triples")
        assert "seed" in body and '"z"' not in body
        # DELETE drops the graph
        assert req("DELETE", f"{base}?graph={g}")[0] == 200
        assert req("GET", f"{base}?graph={g}")[0] == 404
        # PUT on ?default replaces the default graph (always 200)
        assert req("PUT", f"{base}?default",
                   '@prefix : <http://example.org/> . :new :p :q .',
                   "text/turtle")[0] == 200
        _, body = req("GET", f"{base}?default", accept="application/n-triples")
        assert "new" in body and "seed" not in body
        # PUT without a GSP target → 400
        assert req("PUT", base, ttl, "text/turtle")[0] == 400
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# SPARQL 1.1 Protocol dataset parameters (BigdataRDFContext.java:183-201)
# ---------------------------------------------------------------------------

QUADS_TTL = """
@prefix : <http://example.org/> .
:a :lbl "default" .
"""


@pytest.fixture(scope="module")
def quads_endpoint(spark):
    store = TripleStore.from_turtle(spark, QUADS_TTL).update("""
        PREFIX : <http://example.org/>
        INSERT DATA {
          GRAPH :g1 { :a :lbl "one" }
          GRAPH :g2 { :a :lbl "two" . :b :lbl "two-b" }
        }""").persist()
    srv, _ = serve_background(store)
    base = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    yield base, srv
    srv.shutdown()


EX = "http://example.org/"
QLBL = "PREFIX : <http://example.org/> SELECT ?o WHERE { ?s :lbl ?o } ORDER BY ?o"


def _vals(body):
    return [b["o"]["value"] for b in json.loads(body)["results"]["bindings"]]


def test_protocol_default_graph_uri_get(quads_endpoint):
    base, _ = quads_endpoint
    url = (f"{base}?query={urllib.parse.quote(QLBL)}"
           f"&default-graph-uri={urllib.parse.quote(EX + 'g1')}")
    code, _, body = _get(url)
    assert code == 200 and _vals(body) == ["one"]
    # two default graphs merge
    url += f"&default-graph-uri={urllib.parse.quote(EX + 'g2')}"
    code, _, body = _get(url)
    assert code == 200 and _vals(body) == ["one", "two", "two-b"]


def test_protocol_overrides_query_from(quads_endpoint):
    """Protocol dataset takes precedence over the query's own FROM."""
    base, _ = quads_endpoint
    q = ("PREFIX : <http://example.org/> SELECT ?o "
         "FROM :g2 WHERE { ?s :lbl ?o } ORDER BY ?o")
    url = (f"{base}?query={urllib.parse.quote(q)}"
           f"&default-graph-uri={urllib.parse.quote(EX + 'g1')}")
    code, _, body = _get(url)
    assert code == 200 and _vals(body) == ["one"]


def test_protocol_named_graph_uri_form_post(quads_endpoint):
    base, _ = quads_endpoint
    q = ("PREFIX : <http://example.org/> SELECT ?o "
         "WHERE { GRAPH ?g { ?s :lbl ?o } } ORDER BY ?o")
    data = urllib.parse.urlencode(
        {"query": q, "named-graph-uri": EX + "g2"})
    code, _, body = _post(base, data, "application/x-www-form-urlencoded")
    assert code == 200 and _vals(body) == ["two", "two-b"]
    # named-graph-uri alone also empties the default graph
    data = urllib.parse.urlencode({"query": QLBL, "named-graph-uri": EX + "g2"})
    code, _, body = _post(base, data, "application/x-www-form-urlencoded")
    assert code == 200 and _vals(body) == []


def test_protocol_using_graph_uri_update(spark):
    store = TripleStore.from_turtle(spark, QUADS_TTL).update("""
        PREFIX : <http://example.org/>
        INSERT DATA { GRAPH :g1 { :a :lbl "one" } GRAPH :g2 { :b :lbl "two" } }
        """).persist()
    srv, _ = serve_background(store)
    base = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    try:
        upd = ("PREFIX : <http://example.org/> "
               "INSERT { GRAPH :out { ?s ?p ?o } } WHERE { ?s ?p ?o }")
        data = urllib.parse.urlencode({"update": upd, "using-graph-uri": EX + "g1"})
        code, _, _ = _post(base, data, "application/x-www-form-urlencoded")
        assert code == 200
        q = ("PREFIX : <http://example.org/> SELECT ?o "
             "WHERE { GRAPH :out { ?s ?p ?o } }")
        _, _, body = _get(f"{base}?query={urllib.parse.quote(q)}")
        assert _vals(body) == ["one"]
        # Protocol 2.2.3: using-graph-uri + USING in the text → 400
        bad = ("PREFIX : <http://example.org/> "
               "INSERT { GRAPH :out2 { ?s ?p ?o } } USING :g2 WHERE { ?s ?p ?o }")
        data = urllib.parse.urlencode({"update": bad, "using-graph-uri": EX + "g1"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, data, "application/x-www-form-urlencoded")
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_client_dataset_params(quads_endpoint):
    base, _ = quads_endpoint
    from bigdata_old_spark.client import RemoteRepository

    repo = RemoteRepository(base)
    rows = repo.tuple_query(QLBL, default_graphs=[EX + "g1"])
    assert [r["o"].lex for r in rows] == ["one"]
    rows = repo.tuple_query(
        "PREFIX : <http://example.org/> SELECT ?o "
        "WHERE { GRAPH ?g { ?s :lbl ?o } } ORDER BY ?o",
        named_graphs=[EX + "g1"])
    assert [r["o"].lex for r in rows] == ["one"]


def test_client_update_using_params(spark):
    store = TripleStore.from_turtle(spark, QUADS_TTL).update("""
        PREFIX : <http://example.org/>
        INSERT DATA { GRAPH :g1 { :a :lbl "one" } }""").persist()
    srv, _ = serve_background(store)
    base = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    try:
        from bigdata_old_spark.client import RemoteRepository

        repo = RemoteRepository(base)
        repo.update(
            "PREFIX : <http://example.org/> "
            "INSERT { GRAPH :out { ?s ?p ?o } } WHERE { ?s ?p ?o }",
            using_graphs=[EX + "g1"])
        rows = repo.tuple_query(
            "PREFIX : <http://example.org/> SELECT ?o "
            "WHERE { GRAPH :out { ?s ?p ?o } }")
        assert [r["o"].lex for r in rows] == ["one"]
    finally:
        srv.shutdown()


def test_conneg_q_zero_and_case(endpoint):
    """RFC 7231 §5.3.1: q=0 = not acceptable (fall through to the
    default), and the q parameter name is case-insensitive."""
    base, _ = endpoint
    q = urllib.parse.quote("SELECT ?s WHERE { ?s ?p ?o } LIMIT 1")
    # the only supported type carries q=0 → default json, not csv
    _, ctype, _ = _get(f"{base}?query={q}", accept="text/csv;q=0")
    assert ctype == "application/sparql-results+json"
    # uppercase Q= must still be parsed as the quality parameter
    _, ctype, _ = _get(f"{base}?query={q}",
                       accept="text/csv;Q=0.9, application/sparql-results+xml;q=0.1")
    assert ctype == "text/csv"


TRIG_SCOPED_FIXTURE = """
PREFIX : <http://example.org/>
INSERT DATA {
  :x :v "shared" .
  GRAPH :g1 { :x :v "shared" . :x :v "only-g1" }
  GRAPH :g2 { :x :v "shared" }
}"""


def _scoped_store(spark):
    return TripleStore.from_turtle(spark, "").update(TRIG_SCOPED_FIXTURE)


def test_delete_body_trig_keeps_context(spark):
    """ADVICE r8 (medium): a TriG delete body scoping a triple to ONE
    graph must delete only that quad (DeleteServlet's
    RemoveStatementHandler uses stmt.getContext()); a context-less
    statement still deletes from every graph (wildcard)."""
    store = _scoped_store(spark).persist()
    srv, _ = serve_background(store)
    base = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    try:
        trig = ('@prefix : <http://example.org/> . '
                ':g1 { :x :v "shared" . }')
        code, _, body = _post(f"{base}?delete", trig, "application/trig")
        assert code == 200 and 'modified="1"' in body
        left = store_rows(srv)
        # g1 lost exactly its "shared"; default graph + g2 copies remain
        assert (EX2 + "g1", "shared") not in left
        assert (None, "shared") in left and (EX2 + "g2", "shared") in left
        assert (EX2 + "g1", "only-g1") in left
        # context-less body row → wildcard: remaining copies all go
        code, _, body = _post(f"{base}?delete",
                              '@prefix : <http://example.org/> . { :x :v "shared" . }',
                              "application/trig")
        assert code == 200 and 'modified="2"' in body
        left = store_rows(srv)
        assert all(v != "shared" for _, v in left)
    finally:
        srv.shutdown()


def test_delete_body_context_uri_default(spark):
    """context-uri gives context-less delete-body statements a default
    graph instead of the wildcard."""
    store = _scoped_store(spark).persist()
    srv, _ = serve_background(store)
    base = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    try:
        nt = f'<{EX2}x> <{EX2}v> "shared" .'
        g1 = urllib.parse.quote(f"<{EX2}g1>")
        code, _, body = _post(f"{base}?delete&context-uri={g1}", nt,
                              "application/n-triples")
        assert code == 200 and 'modified="1"' in body
        left = store_rows(srv)
        assert (EX2 + "g1", "shared") not in left
        assert (None, "shared") in left and (EX2 + "g2", "shared") in left
    finally:
        srv.shutdown()


def test_update_with_query_body_keeps_context(spark):
    """PUT ?query=CONSTRUCT with a TriG body: inserted statements keep
    their own graph (UpdateServlet parity — the old path forced them
    all into the default graph)."""
    store = _scoped_store(spark).persist()
    srv, _ = serve_background(store)
    base = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    try:
        construct = urllib.parse.quote(
            'PREFIX : <http://example.org/> '
            'CONSTRUCT { :x :v "only-g1" } WHERE {}')
        trig = ('@prefix : <http://example.org/> . '
                ':g9 { :x :v "fresh" . } :x :v "plain" .')
        req = urllib.request.Request(
            f"{base}?query={construct}", data=trig.encode(), method="PUT",
            headers={"Content-Type": "application/trig"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        left = store_rows(srv)
        assert (EX2 + "g9", "fresh") in left     # scoped insert kept g9
        assert (None, "plain") in left           # context-less → default
        assert all(v != "only-g1" for _, v in left)  # query victims gone
    finally:
        srv.shutdown()


EX2 = "http://example.org/"


def store_rows(srv):
    return {(r["g"], r["o_lex"]) for r in srv.store.statements.collect()}


def test_conneg_trix_and_n3_construct(endpoint):
    """Live conneg for the round-9 writers: Accept application/trix and
    text/rdf+n3 on a CONSTRUCT (ConnegUtil registry parity), and a TriX
    body POST inserts (TriXParser analog)."""
    base, srv = endpoint
    q = urllib.parse.quote(
        "CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o } LIMIT 2")
    code, ctype, body = _get(f"{base}?query={q}", accept="application/trix")
    assert code == 200 and ctype == "application/trix"
    assert "<TriX xmlns=" in body and "<triple>" in body
    code, ctype, body = _get(f"{base}?query={q}", accept="text/rdf+n3")
    assert code == 200 and ctype == "text/rdf+n3"
    assert " ." in body
