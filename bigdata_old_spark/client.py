"""Remote-repository client — the reference's Java client API over the
SPARQL 1.1 Protocol + NanoSparqlServer REST extensions
(bigdata-sails/.../webapp/client/RemoteRepository.java,
RemoteRepositoryManager.java): prepared tuple/graph/boolean queries and
updates, access-path range counts (ESTCARD), contexts, RDF-body bulk
insert with optional context-uri, access-path DELETE, service
description, query cancellation, and multi-tenant namespace admin.

Pure-stdlib HTTP (urllib) and driver-side results — this is the
application-client surface, not the bulk analytics path; results parse
into the same ``model.Term`` values the embedded API uses.
"""

from __future__ import annotations

import json
import re
import urllib.error
import urllib.parse
import urllib.request

from bigdata_old_spark.model import Term


class HttpError(Exception):
    """Non-2xx response (client/HttpException.java analog)."""

    def __init__(self, code: int, body: str) -> None:
        super().__init__(f"HTTP {code}: {body[:200]}")
        self.code = code
        self.body = body


def _term_token(v) -> str:
    """Python value / Term / '<iri>' string → the REST access-path
    token the server's _decode_term parses (EncodeDecodeValue.java)."""
    if isinstance(v, str):
        return v  # caller passes '<iri>', '_:b', or '"lit"...' verbatim
    if isinstance(v, Term):
        from bigdata_old_spark.gom import _nt_term

        t = _nt_term(v)
        return t
    from bigdata_old_spark.model import KIND_IRI

    t = Term.from_python(v)
    return f"<{t.lex}>" if t.kind == KIND_IRI else _term_token(t)


class RemoteRepository:
    """One KB endpoint (RemoteRepository.java)."""

    def __init__(self, sparql_endpoint: str) -> None:
        self.endpoint = sparql_endpoint

    def __repr__(self) -> str:  # pragma: no cover
        return f"RemoteRepository({self.endpoint})"

    # -- low-level -----------------------------------------------------------
    def _request(self, url: str, data: bytes | None = None,
                 headers: dict | None = None, method: str | None = None) -> tuple[int, str, str]:
        req = urllib.request.Request(url, data=data, headers=headers or {}, method=method)
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status, r.headers.get_content_type(), r.read().decode()
        except urllib.error.HTTPError as e:
            raise HttpError(e.code, e.read().decode(errors="replace")) from e

    def _post_form(self, params: dict, accept: str | None = None) -> tuple[int, str, str]:
        headers = {"Content-Type": "application/x-www-form-urlencoded"}
        if accept:
            headers["Accept"] = accept
        # urlencode(doseq=True) expands list values into repeated
        # parameters — the Protocol's multi-valued dataset params
        return self._request(
            self.endpoint, urllib.parse.urlencode(params, doseq=True).encode(), headers
        )

    @staticmethod
    def _dataset_params(params: dict, default_graphs, named_graphs, update: bool) -> dict:
        """SPARQL 1.1 Protocol dataset parameters
        (BigdataRDFContext.java:183-201): default-graph-uri/
        named-graph-uri on queries, using-graph-uri/using-named-graph-uri
        on updates; each may repeat."""
        dk, nk = (
            ("using-graph-uri", "using-named-graph-uri")
            if update
            else ("default-graph-uri", "named-graph-uri")
        )
        if default_graphs:
            params[dk] = list(default_graphs)
        if named_graphs:
            params[nk] = list(named_graphs)
        return params

    # -- queries (prepareTupleQuery/GraphQuery/BooleanQuery + evaluate) ------
    def tuple_query(self, sparql: str, default_graphs=None, named_graphs=None) -> list[dict[str, Term]]:
        """SELECT → list of {var: Term} rows."""
        from bigdata_old_spark.service import _json_term

        _, _, body = self._post_form(
            self._dataset_params({"query": sparql}, default_graphs, named_graphs, False),
            accept="application/sparql-results+json")
        doc = json.loads(body)
        return [
            {n: _json_term(b[n]) for n in b} for b in doc["results"]["bindings"]
        ]

    def boolean_query(self, sparql: str, default_graphs=None, named_graphs=None) -> bool:
        """ASK → bool."""
        _, _, body = self._post_form(
            self._dataset_params({"query": sparql}, default_graphs, named_graphs, False),
            accept="application/sparql-results+json")
        return bool(json.loads(body)["boolean"])

    def graph_query(self, sparql: str, default_graphs=None, named_graphs=None) -> list[tuple]:
        """CONSTRUCT/DESCRIBE → list of (s, p, o) Term triples (parsed
        from the endpoint's Turtle serialization)."""
        from bigdata_old_spark.rio import parse_turtle

        _, _, body = self._post_form(
            self._dataset_params({"query": sparql}, default_graphs, named_graphs, False),
            accept="text/turtle")
        return [(s, p, o) for s, p, o in parse_turtle(body)]

    def update(self, sparql_update: str, using_graphs=None, using_named_graphs=None) -> None:
        """SPARQL UPDATE (prepareUpdate + evaluate); using_graphs/
        using_named_graphs emit the Protocol's using-graph-uri/
        using-named-graph-uri dataset override."""
        self._post_form(
            self._dataset_params(
                {"update": sparql_update}, using_graphs, using_named_graphs, True
            )
        )

    # -- REST extensions ------------------------------------------------------
    def _access_path_qs(self, s=None, p=None, o=None, c=None) -> str:
        parts = []
        for name, v in (("s", s), ("p", p), ("o", o), ("c", c)):
            if v is not None:
                parts.append(f"{name}={urllib.parse.quote(_term_token(v))}")
        return "&".join(parts)

    def range_count(self, s=None, p=None, o=None, c=None) -> int:
        """Exact access-path cardinality (GET ?ESTCARD —
        RemoteRepository.rangeCount)."""
        qs = self._access_path_qs(s, p, o, c)
        url = f"{self.endpoint}?ESTCARD" + (f"&{qs}" if qs else "")
        _, _, body = self._request(url)
        m = re.search(r'rangeCount="(\d+)"', body)
        if m is None:
            raise HttpError(200, f"no rangeCount in ESTCARD response: {body[:200]}")
        return int(m.group(1))

    def size(self) -> int:
        """Total statements (RemoteRepository.size)."""
        return self.range_count()

    def has_statement(self, s=None, p=None, o=None, c=None) -> bool:
        return self.range_count(s, p, o, c) > 0

    #: the unnamed (null-context) graph in get_statements contexts —
    #: reference RemoteRepository.java:136 BD_NULL_GRAPH
    NULL_GRAPH = "http://www.bigdata.com/rdf#nullGraph"

    def get_statements(self, s=None, p=None, o=None, *contexts) -> list[tuple]:
        """Matching (s, p, o) Term triples (RemoteRepository.java:445
        getStatements): a CONSTRUCT whose dataset is one FROM clause per
        context, with a ``None`` context standing for the unnamed graph
        (sent as FROM <bd:nullGraph>, RemoteRepository.java:486); no
        contexts = the whole store."""
        def tok(v, var):
            return var if v is None else _term_token(v)

        tpl = f"{tok(s, '?s')} {tok(p, '?p')} {tok(o, '?o')}"
        if contexts:
            froms = "\n".join(
                f"FROM <{self.NULL_GRAPH if c is None else c}>" for c in contexts)
            q = f"CONSTRUCT {{ {tpl} }}\n{froms}\nWHERE {{ {tpl} }}"
        else:
            q = f"CONSTRUCT WHERE {{ {tpl} }}"
        return self.graph_query(q)

    def has_statement_in(self, s=None, p=None, o=None, *contexts) -> bool:
        """hasStatement with openrdf context semantics: no contexts =
        any graph; ``None`` in contexts = the unnamed graph."""
        return bool(self.get_statements(s, p, o, *contexts))

    def contexts(self) -> list[str]:
        """Named-graph URIs (GET ?CONTEXTS)."""
        _, _, body = self._request(f"{self.endpoint}?CONTEXTS")
        return re.findall(r'<context uri="([^"]+)"/>', body)

    def add(self, rdf_body: str, content_type: str = "text/turtle",
            context_uri: str | None = None) -> int:
        """Bulk-insert an RDF document body (RemoteRepository.add /
        InsertServlet); returns the mutation count."""
        url = self.endpoint
        if context_uri:
            url += "?context-uri=" + urllib.parse.quote(f"<{context_uri}>")
        _, _, body = self._request(
            url, rdf_body.encode(), {"Content-Type": content_type})
        m = re.search(r'modified="(\d+)"', body)
        return int(m.group(1)) if m else 0

    def update_with_query(self, query: str, rdf_body: str,
                          content_type: str = "text/turtle") -> int:
        """PUT ?query=<CONSTRUCT> + RDF body — atomically remove the
        query's statements and insert the body's (RemoteRepository
        update(RemoveOp(query), AddOp) / UpdateServlet.doUpdateWithQuery).
        Returns the combined mutation count."""
        url = f"{self.endpoint}?query={urllib.parse.quote(query)}"
        _, _, body = self._request(url, rdf_body.encode(),
                                   {"Content-Type": content_type}, method="PUT")
        m = re.search(r'modified="(\d+)"', body)
        return int(m.group(1)) if m else 0

    def remove_with_query(self, query: str) -> int:
        """DELETE ?query=<CONSTRUCT/DESCRIBE> — remove the statements
        the query produces (RemoteRepository RemoveOp(query) /
        DeleteServlet.doDeleteWithQuery)."""
        url = f"{self.endpoint}?query={urllib.parse.quote(query)}"
        _, _, body = self._request(url, method="DELETE")
        m = re.search(r'modified="(\d+)"', body)
        return int(m.group(1)) if m else 0

    def remove_with_body(self, rdf_body: str, content_type: str = "text/turtle") -> int:
        """POST ?delete with an RDF document — remove the body's
        statements (RemoveOp(statements) / DeleteServlet.doDeleteWithBody)."""
        _, _, body = self._request(
            f"{self.endpoint}?delete", rdf_body.encode(),
            {"Content-Type": content_type})
        m = re.search(r'modified="(\d+)"', body)
        return int(m.group(1)) if m else 0

    def remove(self, s=None, p=None, o=None, c=None) -> int:
        """Access-path DELETE (RemoteRepository.remove / DeleteServlet);
        returns the mutation count."""
        qs = self._access_path_qs(s, p, o, c)
        _, _, body = self._request(
            f"{self.endpoint}?{qs}" if qs else self.endpoint, method="DELETE")
        m = re.search(r'modified="(\d+)"', body)
        return int(m.group(1)) if m else 0

    def get_service_description(self) -> str:
        """Bare-endpoint GET → SPARQL 1.1 Service Description turtle."""
        _, _, body = self._request(self.endpoint)
        return body

    # -- Graph Store HTTP Protocol (indirect identification) -----------------
    def _gsp_url(self, graph: str | None) -> str:
        if graph is None:
            return f"{self.endpoint}?default"
        return f"{self.endpoint}?graph={urllib.parse.quote(graph)}"

    def get_graph(self, graph: str | None = None) -> str:
        """GSP GET: the graph's N-Triples serialization (None = the
        default graph)."""
        _, _, body = self._request(
            self._gsp_url(graph), headers={"Accept": "application/n-triples"})
        return body

    def put_graph(self, rdf_body: str, graph: str | None = None,
                  content_type: str = "text/turtle") -> bool:
        """GSP PUT (replace); returns True when the graph was CREATED
        (HTTP 201)."""
        code, _, _ = self._request(
            self._gsp_url(graph), rdf_body.encode(),
            {"Content-Type": content_type}, method="PUT")
        return code == 201

    def post_graph(self, rdf_body: str, graph: str | None = None,
                   content_type: str = "text/turtle") -> int:
        """GSP POST (merge); returns the mutation count."""
        _, _, body = self._request(
            self._gsp_url(graph), rdf_body.encode(),
            {"Content-Type": content_type})
        m = re.search(r'modified="(\d+)"', body)
        return int(m.group(1)) if m else 0

    def delete_graph(self, graph: str | None = None) -> None:
        """GSP DELETE (drop; 404 → HttpError for absent named graphs)."""
        self._request(self._gsp_url(graph), method="DELETE")

    def cancel(self, query_id: str) -> None:
        """Cancel a running query by id (StatusServlet CANCEL_QUERY).
        /status is server-global, so the namespace segment of a
        tenant endpoint must be stripped too — `…/namespace/NS/sparql`
        and `…/sparql` both cancel at `…/status`."""
        root = self.endpoint.rsplit("/sparql", 1)[0]
        root = re.sub(r"/namespace/[^/]+$", "", root)
        self._request(f"{root}/status?cancelQuery&queryId={urllib.parse.quote(query_id)}")


class RemoteRepositoryManager(RemoteRepository):
    """Multi-tenant admin + per-namespace repositories
    (RemoteRepositoryManager.java / MultiTenancyServlet)."""

    def __init__(self, base_url: str, default_namespace: str = "kb") -> None:
        self.base_url = base_url.rstrip("/")
        super().__init__(f"{self.base_url}/sparql")
        self.default_namespace = default_namespace

    @staticmethod
    def _enc(namespace: str) -> str:
        # namespaces may carry URL-hostile characters ("&/<>" — the
        # reference's TestMultiTenancyAPI.test_create02); path-encode
        return urllib.parse.quote(namespace, safe="")

    def repository(self, namespace: str) -> RemoteRepository:
        """The RemoteRepository bound to one namespace's endpoint
        (getRepositoryForNamespace)."""
        return RemoteRepository(
            f"{self.base_url}/namespace/{self._enc(namespace)}/sparql")

    def create_namespace(self, namespace: str) -> RemoteRepository:
        """createRepository: POST Java-properties body → 201."""
        props = f"com.bigdata.rdf.sail.namespace={namespace}\n"
        self._request(
            f"{self.base_url}/namespace", props.encode(),
            {"Content-Type": "text/plain"})
        return self.repository(namespace)

    def delete_namespace(self, namespace: str) -> None:
        self._request(f"{self.base_url}/namespace/{self._enc(namespace)}",
                      method="DELETE")

    def get_repository_properties(self, namespace: str) -> dict[str, str]:
        """GET /namespace/NS/properties → effective configuration
        (RemoteRepositoryManager.getRepositoryProperties); raises
        HttpError(404) for an unknown namespace."""
        _, _, body = self._request(
            f"{self.base_url}/namespace/{self._enc(namespace)}/properties")
        out: dict[str, str] = {}
        for line in body.splitlines():
            if "=" in line and not line.lstrip().startswith("#"):
                k, _, v = line.partition("=")
                out[k.strip()] = v.strip()
        return out

    def list_namespaces(self) -> list[str]:
        """GET /namespace → namespaces (parsed from the VoID/SD
        description's endpoint URLs)."""
        _, _, body = self._request(f"{self.base_url}/namespace")
        return sorted(
            urllib.parse.unquote(ns)
            for ns in set(re.findall(r"/namespace/([^/]+)/sparql", body)))
