"""RemoteRepository / RemoteRepositoryManager client tests — the Java
client API analog (webapp/client/RemoteRepository.java) exercised over
REAL HTTP against our own endpoint."""

import pytest

from bigdata_old_spark.client import HttpError, RemoteRepository, RemoteRepositoryManager
from bigdata_old_spark.server import serve_background
from bigdata_old_spark.store import TripleStore

TTL = """
@prefix : <http://example.org/> .
:a :p "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
:a :p "2"^^<http://www.w3.org/2001/XMLSchema#integer> .
:b :q :a .
"""

EX = "http://example.org/"


@pytest.fixture()
def mgr(spark):
    store = TripleStore.from_turtle(spark, TTL)
    srv, _ = serve_background(store)
    yield RemoteRepositoryManager(f"http://127.0.0.1:{srv.server_address[1]}")
    srv.shutdown()


def test_client_queries(mgr):
    rows = mgr.tuple_query(f"SELECT ?o WHERE {{ <{EX}a> <{EX}p> ?o }} ORDER BY ?o")
    assert [r["o"].lex for r in rows] == ["1", "2"]
    assert mgr.boolean_query(f"ASK {{ <{EX}b> <{EX}q> <{EX}a> }}") is True
    triples = mgr.graph_query(
        f"CONSTRUCT {{ ?s <{EX}copy> ?o }} WHERE {{ ?s <{EX}p> ?o }}")
    assert len(triples) == 2 and all(p == EX + "copy" for _, p, _ in triples)


def test_client_update_and_range_count(mgr):
    n0 = mgr.size()
    mgr.update(f"INSERT DATA {{ <{EX}x> <{EX}p> 7 }}")
    assert mgr.size() == n0 + 1
    assert mgr.range_count(s=f"<{EX}x>") == 1
    assert mgr.has_statement(s=f"<{EX}x>", p=f"<{EX}p>")
    assert not mgr.has_statement(s=f"<{EX}nothere>")


def test_client_add_remove_contexts(mgr):
    n = mgr.add('@prefix : <http://example.org/> . :n1 :tag "x" . :n2 :tag "y" .')
    assert n == 2
    assert mgr.range_count(p=f"<{EX}tag>") == 2
    # into a named graph
    n = mgr.add('@prefix : <http://example.org/> . :n3 :tag "z" .',
                context_uri=EX + "g1")
    assert n == 1 and mgr.contexts() == [EX + "g1"]
    # access-path delete
    assert mgr.remove(p=f"<{EX}tag>", o='"x"') == 1
    assert mgr.range_count(p=f"<{EX}tag>") == 2  # y + z survive
    assert mgr.remove(c=f"<{EX}g1>") == 1
    assert mgr.contexts() == []


def test_client_service_description_and_errors(mgr):
    sd = mgr.get_service_description()
    assert "sparql-service-description" in sd
    with pytest.raises(HttpError) as ei:
        mgr.tuple_query("SELECT broken !!")
    assert ei.value.code == 400


def test_client_namespaces(mgr):
    repo = mgr.create_namespace("tenant1")
    repo.update(f"INSERT DATA {{ <{EX}t> <{EX}p> 1 }}")
    assert repo.size() == 1
    # isolated from the default KB
    assert mgr.range_count(s=f"<{EX}t>") == 0
    assert "tenant1" in mgr.list_namespaces()
    mgr.delete_namespace("tenant1")
    assert "tenant1" not in mgr.list_namespaces()
    with pytest.raises(HttpError):
        repo.tuple_query("SELECT * WHERE { ?s ?p ?o }")


def test_client_graph_store_protocol(mgr):
    # PUT creates, GET reads, POST merges, DELETE drops — over the
    # client's GSP methods
    created = mgr.put_graph(
        '@prefix : <http://example.org/> . :a :tag "x" .', graph=EX + "g9")
    assert created is True
    body = mgr.get_graph(EX + "g9")
    assert '"x"' in body
    assert mgr.post_graph(
        '@prefix : <http://example.org/> . :b :tag "y" .', graph=EX + "g9") == 1
    assert '"y"' in mgr.get_graph(EX + "g9")
    # replace → not created
    assert mgr.put_graph(
        '@prefix : <http://example.org/> . :c :tag "z" .', graph=EX + "g9") is False
    body = mgr.get_graph(EX + "g9")
    assert '"z"' in body and '"x"' not in body
    mgr.delete_graph(EX + "g9")
    with pytest.raises(HttpError) as ei:
        mgr.get_graph(EX + "g9")
    assert ei.value.code == 404
    # the default graph reads through GSP too
    assert "example.org/a" in mgr.get_graph()
