"""Remote SPARQL SERVICE execution — the ServiceCallJoin analog.

The reference's ServiceCallJoin (bigdata/.../controller/
ServiceCallJoin.java:103) ships the service group to a remote SPARQL
endpoint over the SPARQL protocol and vector-joins the returned
bindings.  Here the service group's reconstructed source text is sent
as ``SELECT * WHERE {…}`` (Accept: sparql-results+json), the JSON
bindings become a term-struct DataFrame, and the ordinary compiler
join machinery does the vectored join.

The HTTP call is driver-side and the result is a local DataFrame —
correct for the protocol (a remote endpoint is a single server; there
is nothing to distribute) and identical to the reference, which also
funnels the service call through one client.  Inject a transport with
``set_transport`` for tests or custom auth; the default uses urllib.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import types as T

from bigdata_old_spark.model import TERM_TYPE, Term

Transport = Callable[[str, str], str]  # (endpoint, query) -> response body

_transport: Transport | None = None


def set_transport(fn: Transport | None) -> None:
    """Override how SERVICE queries reach an endpoint (None → urllib)."""
    global _transport
    _transport = fn


def default_transport(endpoint: str, query: str) -> str:
    from urllib.parse import urlencode
    from urllib.request import Request, urlopen

    req = Request(
        endpoint,
        data=urlencode({"query": query}).encode(),
        headers={
            "Accept": "application/sparql-results+json",
            "Content-Type": "application/x-www-form-urlencoded",
        },
    )
    with urlopen(req, timeout=30) as resp:
        return resp.read().decode("utf-8")


def _json_term(d: dict) -> Term:
    t = d.get("type")
    if t == "uri":
        return Term.iri(d["value"])
    if t == "bnode":
        return Term.bnode(d["value"])
    # "literal" + legacy "typed-literal"
    return Term.literal(d["value"], dt=d.get("datatype"), lang=d.get("xml:lang"))


def results_json_to_df(spark, payload: str):
    """SPARQL 1.1 Query Results JSON → (DataFrame of term structs,
    vars list).  Unbound = NULL struct, matching engine convention."""
    doc = json.loads(payload)
    names = doc["head"]["vars"]
    rows = []
    for b in doc["results"]["bindings"]:
        rows.append(tuple(_json_term(b[n]).as_row() if n in b else None for n in names))
    schema = T.StructType([T.StructField(n, TERM_TYPE) for n in names])
    return spark.createDataFrame(rows, schema), names


def remote_service(store, node, compiler):
    """Execute SERVICE <endpoint> {…} remotely; returns Compiled."""
    from bigdata_old_spark.compiler import Compiled

    decls = "".join(f"PREFIX {p}: <{iri}>\n" for p, iri in node.prefixes)
    query = f"{decls}SELECT * WHERE {node.raw}"
    body = (_transport or default_transport)(node.iri.lex, query)
    df, names = results_json_to_df(store.spark, body)
    # vars bound in every row are certain (join keys); others stay
    # optional, same as the reference's service-var analysis
    certain = frozenset(
        n for i, n in enumerate(names)
        if not df.where(df[n].isNull()).take(1)
    ) if names else frozenset()
    return Compiled(df, certain)
