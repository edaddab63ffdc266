"""W3C SPARQL 1.1 Federated Query test suite, as vendored and run by
the reference (bigdata-sails/src/test/com/bigdata/rdf/sail/webapp/
openrdf-service/manifest.ttl; runner TestFederatedQuery.java:411-623).

Each ``qt:serviceData`` store is served over REAL local HTTP by this
engine's OWN SPARQL protocol endpoint (server.serve_background), and
the ``http://localhost:18080/openrdf/repositories/endpointN`` alias
URLs in the query / data / expected files are rewritten to the live
ports (the reference registers ServiceRegistry aliases the same way,
TestFederatedQuery.java:459-479).  The suite therefore exercises the
CLIENT side (vectored ServiceCallJoin, SILENT, variable endpoints) and
the SERVER side at once — and server-to-server federation for the
nested-SERVICE cases (service03/06), where endpoint1 must itself call
endpoint2 while answering our request.

Parity notes:
* test4 (BINDINGS join under OPTIONAL SERVICE) is skipped exactly as
  in the reference — "disabled until we have resolution for the
  question of whether or not the test is in error"
  (TestFederatedQuery.java:437).
* testEmptyServiceBlock (service14) references service14.srx, which
  does not exist in the reference tree; skipped there by crash, here
  explicitly.
* service05 drives ``SERVICE ?var`` bound from data; service09 drives
  ``SERVICE ?var`` bound via BIND.
"""

import urllib.request

import pytest

from fixture_utils import canon_model_term, canon_row_value, rows_equal

DIR = (
    "/root/reference/bigdata-sails/src/test/com/bigdata/rdf/sail/"
    "webapp/openrdf-service"
)
ALIAS = "http://localhost:18080/openrdf/repositories/endpoint"

#: name -> (main data | None, [endpoint data files], expected srx)
#: (manifest.ttl entries + the extra cases TestFederatedQuery runs)
CASES = {
    "service01": ("data01.ttl", ["data01endpoint.ttl"], "service01.srx"),
    "service02": (None, ["data02endpoint1.ttl", "data02endpoint2.ttl"], "service02.srx"),
    "service03": (None, ["data03endpoint1.ttl", "data03endpoint2.ttl"], "service03.srx"),
    "service05": ("data05.ttl", ["data05endpoint1.ttl", "data05endpoint2.ttl"], "service05.srx"),
    "service06": (None, ["data06endpoint1.ttl"], "service06.srx"),
    "service07": ("data07.ttl", [], "service07.srx"),
    "service08": ("data08.ttl", ["data08endpoint.ttl"], "service08.srx"),
    "service09": (None, ["data09endpoint.ttl"], "service09.srx"),
    "service10": ("data10.ttl", ["data10endpoint.ttl"], "service10.srx"),
    "service10b": ("data10.ttl", ["data10endpoint.ttl"], "service10.srx"),
    "service11": ("data11.ttl", ["data11endpoint.ttl"], "service11.srx"),
    "service13b": (None, ["data13.ttl"], "service13.srx"),
}


def _read(name: str) -> str:
    with open(f"{DIR}/{name}") as f:
        return f.read()


def _rewrite(text: str, urls: list[str]) -> str:
    # longest alias first so endpoint1 never clobbers endpoint11 (none
    # exists today, but cheap insurance)
    for i, u in sorted(enumerate(urls, start=1), key=lambda x: -x[0]):
        text = text.replace(f"{ALIAS}{i}", u)
    return text


@pytest.mark.parametrize("name", sorted(CASES))
def test_federated_query(spark, name):
    from bigdata_old_spark import service
    from bigdata_old_spark.serializers import parse_sparql_xml
    from bigdata_old_spark.server import serve_background
    from bigdata_old_spark.store import TripleStore

    service.set_transport(None)  # the real urllib transport
    main_data, ep_files, result = CASES[name]
    servers = []
    urls: list[str] = []
    try:
        for f in ep_files:
            st = TripleStore.from_turtle(spark, _read(f)).persist()
            srv, _ = serve_background(st)
            servers.append(srv)
            urls.append(f"http://127.0.0.1:{srv.server_address[1]}/sparql")
        main_ttl = _rewrite(_read(main_data), urls) if main_data else ""
        store = TripleStore.from_turtle(spark, main_ttl)
        query = _rewrite(_read(f"{name}.rq"), urls)
        got = store.query(query)
        actual = [
            {c: canon_row_value(r[c]) for c in got.columns if r[c] is not None}
            for r in got.collect()
        ]
        _, exp_rows = parse_sparql_xml(_rewrite(_read(result), urls))
        expected = [
            {k: canon_model_term(v) for k, v in row.items()} for row in exp_rows
        ]
        assert rows_equal(actual, expected), (
            f"{name}: got {sorted(map(sorted, (r.items() for r in actual)))} "
            f"!= expected {sorted(map(sorted, (r.items() for r in expected)))}"
        )
    finally:
        for srv in servers:
            srv.shutdown()
