"""Vectored remote SERVICE join (VERDICT r6 #1) — the outer solutions'
bindings ride to the endpoint as chunked VALUES blocks, the
ServiceCallJoin.java:85-88,378 / RemoteSparql11QueryBuilder analog.

The fake endpoint here genuinely EVALUATES the VALUES constraint (it
filters its dataset by the literals/IRIs in the block), so the tests
prove both that the pushdown reaches the wire and that the constrained
results joined locally equal the unconstrained run."""

import json
import re

import pytest

from bigdata_old_spark import service as svc

P = """
PREFIX : <http://example.org/>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
"""
EX = "http://example.org/"


def _mk_endpoint(data, calls):
    """data: list of {var: term-dict} solution rows.  Applies any
    VALUES (?v…) {…} block found in the request; records each call."""

    def transport(endpoint, query):
        calls.append(query)
        rows = data
        m = re.search(r"VALUES \(([^)]*)\) \{(.*?)\} \{", query, re.S)
        if m:
            vars_ = [v.lstrip("?") for v in m.group(1).split()]
            tuples = {
                tuple(t.strip() for t in re.findall(r'<[^>]*>|"[^"]*"(?:@\S+|\^\^<[^>]*>)?|UNDEF', grp))
                for grp in re.findall(r"\(([^)]*)\)", m.group(2))
            }

            def tok(term):
                if term["type"] == "uri":
                    return f"<{term['value']}>"
                if "datatype" in term:
                    return f'"{term["value"]}"^^<{term["datatype"]}>'
                return f'"{term["value"]}"'

            rows = [
                r for r in rows
                if tuple(tok(r[v]) if v in r else "UNDEF" for v in vars_) in tuples
            ]
        names = sorted({k for r in data for k in r})
        return json.dumps(
            {"head": {"vars": names}, "results": {"bindings": rows}}
        )

    return transport


def _lit(v):
    return {"type": "literal", "value": v}


def _iri(v):
    return {"type": "uri", "value": v}


REMOTE = [  # ?who ?name rows the endpoint holds
    {"who": _iri(EX + "Mike"), "name": _lit("Mike")},
    {"who": _iri(EX + "Bryan"), "name": _lit("Bryan")},
    {"who": _iri(EX + "Elsewhere"), "name": _lit("Nobody")},
]

Q = P + """
    SELECT ?x ?who WHERE {
      ?x rdfs:label ?name .
      SERVICE <http://remote.example.org/sparql> { ?who foaf:name ?name . }
    }"""


def _run(store, query):
    return sorted(
        (r["x"]["lex"], r["who"]["lex"]) for r in store.query(query).collect()
    )


def test_values_block_reaches_endpoint_and_results_match(small_store):
    small_store._plan_cache.clear()
    calls = []
    svc.set_transport(_mk_endpoint(REMOTE, calls))
    try:
        got = _run(small_store, Q)
    finally:
        svc.set_transport(None)
    assert len(calls) == 1
    # the outer certain bindings of ?name were pushed down
    assert "VALUES (?name)" in calls[0]
    assert '"Mike"' in calls[0] and '"Bryan"' in calls[0] and '"DC"' in calls[0]
    assert '"Nobody"' not in calls[0]
    assert got == [(EX + "Bryan", EX + "Bryan"), (EX + "Mike", EX + "Mike")]

    # ≡ the unconstrained run (force fallback via a zero cap)
    calls2 = []
    small_store._plan_cache.clear()  # same text would replay the cached plan
    svc.set_transport(_mk_endpoint(REMOTE, calls2))
    old = svc.MAX_VECTOR
    svc.MAX_VECTOR = 0
    try:
        unconstrained = _run(small_store, Q)
    finally:
        svc.MAX_VECTOR = old
        svc.set_transport(None)
    assert "VALUES" not in calls2[0]
    assert got == unconstrained


def test_iri_bindings_vector_as_iris(small_store):
    small_store._plan_cache.clear()
    calls = []
    svc.set_transport(_mk_endpoint(REMOTE, calls))
    try:
        df = small_store.query(P + """
            SELECT ?who ?name WHERE {
              ?who foaf:knows :Bryan .
              SERVICE <http://remote.example.org/sparql> { ?who foaf:name ?name . }
            }""")
        got = sorted(r["who"]["lex"] for r in df.collect())
    finally:
        svc.set_transport(None)
    assert "VALUES (?who)" in calls[0]
    assert f"<{EX}Mike>" in calls[0] and f"<{EX}Martyn>" in calls[0]
    assert got == [EX + "Mike"]  # Martyn has no remote name row


def test_chunking_unions_without_duplicates(small_store, monkeypatch):
    monkeypatch.setattr(svc, "VECTOR_CHUNK", 1)
    small_store._plan_cache.clear()
    calls = []
    svc.set_transport(_mk_endpoint(REMOTE, calls))
    try:
        got = _run(small_store, Q)
    finally:
        svc.set_transport(None)
    assert len(calls) == 3  # one request per binding (chunk size 1)
    assert all("VALUES (?name)" in c for c in calls)
    assert got == [(EX + "Bryan", EX + "Bryan"), (EX + "Mike", EX + "Mike")]


def test_optional_only_service_var_not_vectored(small_store):
    """A var the service binds only inside OPTIONAL is not certainly
    bound remotely — vectoring it could duplicate solutions across
    chunks, so it must not be pushed."""
    small_store._plan_cache.clear()
    calls = []
    svc.set_transport(_mk_endpoint(REMOTE, calls))
    try:
        small_store.query(P + """
            SELECT * WHERE {
              ?x rdfs:label ?name .
              SERVICE <http://remote.example.org/sparql> {
                ?who a foaf:Agent . OPTIONAL { ?who foaf:name ?name }
              }
            }""").collect()
    finally:
        svc.set_transport(None)
    assert "VALUES" not in calls[0]


def test_bnode_bindings_fall_back(spark):
    from bigdata_old_spark.store import TripleStore

    st = TripleStore.from_turtle(spark, """
        @prefix : <http://example.org/> .
        _:b1 :p "one" . _:b2 :p "two" .
    """)
    calls = []
    svc.set_transport(_mk_endpoint(REMOTE, calls))
    try:
        st.query(P + """
            SELECT * WHERE {
              ?s :p ?v .
              SERVICE <http://remote.example.org/sparql> { ?s foaf:name ?n . }
            }""").collect()
    finally:
        svc.set_transport(None)
    # ?s binds blank nodes — labels have no cross-endpoint identity
    assert "VALUES" not in calls[0]


def test_correlated_filter_inside_service(small_store):
    """The service group's own FILTER still rides along with the
    VALUES block and the joined results equal the unconstrained run."""
    q = P + """
        SELECT ?x ?who WHERE {
          ?x rdfs:label ?name .
          SERVICE <http://remote.example.org/sparql> {
            ?who foaf:name ?name . FILTER(?name != "Nobody")
          }
        }"""
    small_store._plan_cache.clear()
    calls = []
    svc.set_transport(_mk_endpoint(REMOTE, calls))
    try:
        got = _run(small_store, q)
    finally:
        svc.set_transport(None)
    assert "VALUES (?name)" in calls[0] and "FILTER" in calls[0]

    calls2 = []
    small_store._plan_cache.clear()  # same text would replay the cached plan
    svc.set_transport(_mk_endpoint(REMOTE, calls2))
    old = svc.MAX_VECTOR
    svc.MAX_VECTOR = 0
    try:
        unconstrained = _run(small_store, q)
    finally:
        svc.MAX_VECTOR = old
        svc.set_transport(None)
    assert got == unconstrained == [
        (EX + "Bryan", EX + "Bryan"), (EX + "Mike", EX + "Mike")
    ]


def test_silent_failure_still_unit(small_store):
    def boom(endpoint, query):
        raise OSError("no route to host")

    svc.set_transport(boom)
    try:
        df = small_store.query(P + """
            SELECT ?x WHERE {
              ?x rdfs:label ?name .
              SERVICE SILENT <http://unreachable.example.org/sparql> {
                ?who foaf:name ?name .
              }
            }""")
        # unit solution: the outer side survives untouched
        assert df.count() == 3
    finally:
        svc.set_transport(None)


def test_cap_overflow_falls_back(small_store, monkeypatch):
    monkeypatch.setattr(svc, "MAX_VECTOR", 2)  # 3 distinct names > cap
    small_store._plan_cache.clear()
    calls = []
    svc.set_transport(_mk_endpoint(REMOTE, calls))
    try:
        got = _run(small_store, Q)
    finally:
        svc.set_transport(None)
    assert len(calls) == 1 and "VALUES" not in calls[0]
    assert got == [(EX + "Bryan", EX + "Bryan"), (EX + "Mike", EX + "Mike")]


def test_optional_service_vectors_and_null_pads(small_store):
    """OPTIONAL { SERVICE … } vectors the left side's bindings and
    still null-pads non-matching outer rows (left-join semantics)."""
    small_store._plan_cache.clear()
    calls = []
    svc.set_transport(_mk_endpoint(REMOTE, calls))
    try:
        df = small_store.query(P + """
            SELECT ?x ?name ?who WHERE {
              ?x rdfs:label ?name .
              OPTIONAL {
                SERVICE <http://remote.example.org/sparql> { ?who foaf:name ?name . }
              }
            }""")
        rows = {(r["x"]["lex"], r["who"]["lex"] if r["who"] else None) for r in df.collect()}
    finally:
        svc.set_transport(None)
    assert "VALUES (?name)" in calls[0]
    assert rows == {
        (EX + "Mike", EX + "Mike"),
        (EX + "Bryan", EX + "Bryan"),
        (EX + "DC", None),  # no remote match → null-padded, not dropped
    }


def test_two_services_chain_vectoring(small_store):
    """Two SERVICE groups in one pattern: the second vectors over the
    accumulated solutions of the BGP ⋈ first-service join."""
    small_store._plan_cache.clear()
    remote2 = [
        {"who": _iri(EX + "Mike"), "dept": _lit("eng")},
        {"who": _iri(EX + "Elsewhere"), "dept": _lit("ops")},
    ]
    calls1, calls2 = [], []
    ep1 = _mk_endpoint(REMOTE, calls1)
    ep2 = _mk_endpoint(remote2, calls2)

    def route(endpoint, query):
        return (ep1 if "one" in endpoint else ep2)(endpoint, query)

    svc.set_transport(route)
    try:
        df = small_store.query(P + """
            SELECT ?x ?who ?dept WHERE {
              ?x rdfs:label ?name .
              SERVICE <http://one.example.org/sparql> { ?who foaf:name ?name . }
              SERVICE <http://two.example.org/sparql> { ?who foaf:dept ?dept . }
            }""")
        got = {(r["x"]["lex"], r["dept"]["lex"]) for r in df.collect()}
    finally:
        svc.set_transport(None)
    assert "VALUES (?name)" in calls1[0]
    # the second service vectors ?who from the accumulated join
    assert "VALUES (?who)" in calls2[0] and f"<{EX}Mike>" in calls2[0]
    assert f"<{EX}Elsewhere>" not in calls2[0]  # never bound upstream
    assert got == {(EX + "Mike", "eng")}


def test_values_serialization_matrix(spark):
    """RemoteSparql11QueryBuilder test_service_003 analog: vectored
    bindings cover IRI, plain literal, lang-tagged literal, typed int
    and boolean — each serialized in its SPARQL VALUES form."""
    from bigdata_old_spark.store import TripleStore

    st = TripleStore.from_turtle(spark, """
        @prefix : <http://example.org/> .
        :book1 :title "Semantic Web Primer" .
        :book2 :title "Semantic Web Primer"@de .
        :book3 :title "12"^^<http://www.w3.org/2001/XMLSchema#int> .
        :book4 :title true .
    """)
    calls = []
    svc.set_transport(_mk_endpoint([], calls))
    try:
        st.query(P + """
            SELECT * WHERE {
              ?b :title ?t .
              SERVICE <http://remote.example.org/sparql> { ?x foaf:comment ?t . ?x foaf:about ?b . }
            }""").collect()
    finally:
        svc.set_transport(None)
    q = calls[0]
    assert "VALUES (?b ?t)" in q
    assert '"Semantic Web Primer"' in q
    assert '"Semantic Web Primer"@de' in q
    assert '"12"^^<http://www.w3.org/2001/XMLSchema#int>' in q
    assert '^^<http://www.w3.org/2001/XMLSchema#boolean>' in q
    assert f"<{EX}book1>" in q


def test_variable_endpoint_routes_per_binding(spark):
    """SERVICE ?svc — one call per DISTINCT endpoint URI bound by the
    outer side, results tagged with the producing endpoint
    (ServiceCallJoin.java:401-414 getServiceURI grouping)."""
    from bigdata_old_spark.store import TripleStore

    store = TripleStore.from_turtle(spark, P + """
        :p1 :ep <http://epA.example.org/sparql> .
        :p2 :ep <http://epB.example.org/sparql> .
        :p3 :ep <http://epA.example.org/sparql> .
    """)
    data = {
        "http://epA.example.org/sparql": [{"w": _iri(EX + "a"), "name": _lit("from-A")}],
        "http://epB.example.org/sparql": [{"w": _iri(EX + "b"), "name": _lit("from-B")}],
    }
    calls = []

    def transport(endpoint, query):
        calls.append(endpoint)
        rows = data[endpoint]
        return json.dumps(
            {"head": {"vars": ["w", "name"]}, "results": {"bindings": rows}}
        )

    svc.set_transport(transport)
    try:
        got = sorted(
            (r["p"]["lex"], r["name"]["lex"])
            for r in store.query(P + """
                SELECT ?p ?name WHERE {
                  ?p :ep ?svc .
                  SERVICE ?svc { ?w foaf:name ?name }
                }""").collect()
        )
    finally:
        svc.set_transport(None)
    # one call per DISTINCT endpoint (p1 and p3 share epA)
    assert sorted(calls) == sorted(data)
    assert got == [
        (EX + "p1", "from-A"),
        (EX + "p2", "from-B"),
        (EX + "p3", "from-A"),
    ]


def test_variable_endpoint_unbound_raises_and_silent_unit(spark):
    from bigdata_old_spark.store import TripleStore

    store = TripleStore.from_turtle(spark, P + ":p1 :ep :x .")
    q = P + "SELECT ?w WHERE { SERVICE ?svc { ?w foaf:name ?n } }"
    with pytest.raises(Exception, match="endpoint variable"):
        store.query(q).collect()
    # SILENT: failure → unit solution (empty result here, ?w unbound)
    rows = store.query(
        P + "SELECT ?w WHERE { SERVICE SILENT ?svc { ?w foaf:name ?n } }"
    ).collect()
    assert len(rows) == 1 and rows[0]["w"] is None


def test_service_alias_routes_remote_request(small_store):
    """ServiceRegistry.addAlias analog: SERVICE <alias> sends the
    request to the aliased endpoint (TestFederatedQuery.java:459-479
    registers 18080 aliases for live repository URLs the same way)."""
    from bigdata_old_spark import registry

    small_store._plan_cache.clear()
    endpoints = []

    def transport(endpoint, query):
        endpoints.append(endpoint)
        return json.dumps(
            {"head": {"vars": ["who", "name"]},
             "results": {"bindings": REMOTE}}
        )

    registry.add_service_alias(
        "http://real.example.org/sparql", "http://remote.example.org/sparql"
    )
    svc.set_transport(transport)
    try:
        got = _run(small_store, Q)
    finally:
        svc.set_transport(None)
        registry.remove_service("http://remote.example.org/sparql")
    assert endpoints == ["http://real.example.org/sparql"]
    assert got == [(EX + "Bryan", EX + "Bryan"), (EX + "Mike", EX + "Mike")]


def test_service_alias_resolves_registered_handler(small_store):
    """An alias of a REGISTERED service URI dispatches the handler
    (ServiceRegistry.java:310 consults aliases before services)."""
    from bigdata_old_spark import registry
    from bigdata_old_spark.compiler import Compiled
    from bigdata_old_spark.model import Term

    small_store._plan_cache.clear()
    spark = small_store.spark

    def handler(store, pattern, compiler):
        from pyspark.sql import types as T

        from bigdata_old_spark.model import TERM_TYPE

        schema = T.StructType([T.StructField("who", TERM_TYPE)])
        df = spark.createDataFrame([(Term.iri(EX + "handled").as_row(),)], schema)
        return Compiled(df, frozenset({"who"}))

    registry.register_service("urn:x-test:svc", handler)
    registry.add_service_alias("urn:x-test:svc", "urn:x-test:svc-alias")
    try:
        rows = small_store.query(
            P + "SELECT ?who WHERE { SERVICE <urn:x-test:svc-alias> { ?who ?p ?o } }"
        ).collect()
    finally:
        registry.remove_service("urn:x-test:svc-alias")
        registry.remove_service("urn:x-test:svc")
    assert [r["who"]["lex"] for r in rows] == [EX + "handled"]


def test_service_alias_guards(small_store):
    from bigdata_old_spark import registry

    registry.register_service("urn:x-test:taken", lambda *a: None)
    try:
        with pytest.raises(ValueError, match="already registered"):
            registry.add_service_alias("urn:x-test:other", "urn:x-test:taken")
    finally:
        registry.remove_service("urn:x-test:taken")
    registry.add_service_alias("urn:x-test:a", "urn:x-test:b")
    try:
        with pytest.raises(ValueError, match="chain"):
            registry.add_service_alias("urn:x-test:b", "urn:x-test:c")
    finally:
        registry.remove_service("urn:x-test:b")


def test_sparql10_endpoint_skips_values_pushdown(small_store):
    """RemoteServiceOptions(isSparql11=false) analog: a pre-1.1
    endpoint receives the UNCONSTRAINED group — no VALUES block — and
    the local vectored join still produces identical results."""
    from bigdata_old_spark import registry

    small_store._plan_cache.clear()
    calls = []
    svc.set_transport(_mk_endpoint(REMOTE, calls))
    registry.set_service_options("http://remote.example.org/sparql", sparql11=False)
    try:
        got = _run(small_store, Q)
    finally:
        svc.set_transport(None)
        registry.remove_service("http://remote.example.org/sparql")
    assert len(calls) == 1 and "VALUES" not in calls[0]
    assert got == [(EX + "Bryan", EX + "Bryan"), (EX + "Mike", EX + "Mike")]


def test_service_alias_reverse_chain_rejected():
    from bigdata_old_spark import registry

    registry.add_service_alias("urn:x-test:S", "urn:x-test:X")  # X -> S
    try:
        with pytest.raises(ValueError, match="chain"):
            # S -> T would leave X resolving to the stale S
            registry.add_service_alias("urn:x-test:T", "urn:x-test:S")
    finally:
        registry.remove_service("urn:x-test:X")
