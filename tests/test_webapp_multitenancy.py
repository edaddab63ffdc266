"""Port of the reference's TestMultiTenancyAPI webapp suite
(bigdata-sails/src/test/com/bigdata/rdf/sail/webapp/TestMultiTenancyAPI.java):
describe-all-datasets, effective repository properties, and the
create/exercise/delete lifecycle including URL-hostile namespace names
(test_create02's "&/<>" characters)."""

from __future__ import annotations

import pytest

from bigdata_old_spark.client import HttpError, RemoteRepositoryManager
from bigdata_old_spark.server import serve_background
from bigdata_old_spark.store import TripleStore


@pytest.fixture()
def mgr(spark):
    store = TripleStore.from_rows(spark, [])
    srv, _ = serve_background(store)
    m = RemoteRepositoryManager(f"http://127.0.0.1:{srv.server_address[1]}")
    yield m
    srv.shutdown()


def test_describe_datasets01(mgr):
    """The default KB is described with a SPARQL endpoint per dataset."""
    nss = mgr.list_namespaces()
    assert "kb" in nss
    # the description carries a sparqlEndpoint per dataset
    _, _, body = mgr._request(f"{mgr.base_url}/namespace")
    assert "sparqlEndpoint" in body


def test_get_repository_properties01(mgr):
    p = mgr.get_repository_properties("kb")
    assert p["com.bigdata.relation.namespace"] == "kb"


def test_get_repository_properties_404(mgr):
    with pytest.raises(HttpError) as exc:
        mgr.get_repository_properties("no-such-kb")
    assert exc.value.code == 404


def _do_test_create(mgr, ns2):
    """doTestCreate: not-exists → create → exists → re-create 400 →
    both datasets described → query/update each → delete each."""
    with pytest.raises(HttpError) as exc:
        mgr.get_repository_properties(ns2)
    assert exc.value.code == 404

    repo2 = mgr.create_namespace(ns2)

    assert mgr.get_repository_properties(ns2)[
        "com.bigdata.relation.namespace"] == ns2

    # re-creating an existing namespace is a 400 (BigdataServlet
    # HTTP_BADREQUEST, doTestCreate)
    with pytest.raises(HttpError) as exc:
        mgr.create_namespace(ns2)
    assert exc.value.code == 400

    nss = mgr.list_namespaces()
    assert "kb" in nss and ns2 in nss

    for ns in ("kb", ns2):
        repo = mgr.repository(ns)
        # service description
        assert repo.get_service_description()
        # query (empty) then update then query (non-empty)
        assert repo.boolean_query("ASK { ?s ?p ?o }") is False
        repo.update("INSERT DATA { <http://e/x> <http://e/y> 1 }")
        assert repo.boolean_query("ASK { ?s ?p ?o }") is True

    # isolation: kb's triple is not visible from ns2 and vice versa
    assert len(repo2.tuple_query("SELECT * { ?s ?p ?o }")) == 1

    mgr.delete_namespace(ns2)
    with pytest.raises(HttpError) as exc:
        mgr.get_repository_properties(ns2)
    assert exc.value.code == 404
    assert ns2 not in mgr.list_namespaces()


def test_create01(mgr):
    _do_test_create(mgr, "kb2-roundtrip")


def test_create02(mgr):
    """URL-hostile namespace names must round-trip through every
    admin/endpoint URL (test_create02)."""
    _do_test_create(mgr, "kb2-x-&/<>-foo")
