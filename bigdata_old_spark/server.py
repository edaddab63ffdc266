"""SPARQL 1.1 Protocol endpoint — the reference's REST surface
re-expressed as a thin stdlib HTTP layer over :class:`TripleStore`.

Reference parity (bigdata-sails/src/java/com/bigdata/rdf/sail/webapp/):
  * `NanoSparqlServer.java:79` — embedded HTTP server bootstrap
    (Jetty there; `http.server.ThreadingHTTPServer` here — the service
    layer is not the scale path, query execution stays in Spark).
  * `RESTServlet.java:43` / `QueryServlet.java:88` — GET/POST dispatch,
    `?explain` surface.
  * `ConnegUtil.java` — Accept-header content negotiation, mapped via
    `serializers.MIME_FORMATS`.
  * `UpdateServlet` — SPARQL UPDATE via POST (`update=` form field or
    `application/sparql-update` body).

Protocol forms implemented (SPARQL 1.1 Protocol §2):
  * GET  /sparql?query=…               (query via URL)
  * POST /sparql  application/x-www-form-urlencoded  query=… | update=…
  * POST /sparql  application/sparql-query   (raw query body)
  * POST /sparql  application/sparql-update  (raw update body)
  * any of the above with ?explain — returns the formatted Spark
    physical plan as text/plain (QueryServlet ?explain analog).

NanoSparqlServer REST API extensions beyond the W3C protocol
(the reference's workbench/client surface):
  * GET/POST ?ESTCARD&s=&p=&o=&c=  — access-path statement count
    (`QueryServlet.doEstCard`, response `reportRangeCount` XML)
  * GET/POST ?CONTEXTS             — named graphs in use
    (`QueryServlet.doContexts`)
  * GET ?uuid                      — server-minted UUID
    (`QueryServlet.doUUID`)
  * POST with an RDF document body (+ optional `context-uri`) — bulk
    insert (`InsertServlet.doPostWithBody`)
  * DELETE ?s=&p=&o=&c=            — access-path delete
    (`DeleteServlet.doDeleteWithAccessPath`)

UPDATE swaps the handler's store atomically (the engine's UPDATE is a
batch statements-DF rewrite returning a new TripleStore).
"""

from __future__ import annotations

import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from bigdata_old_spark.serializers import MIME_FORMATS

_FORMAT_MIME = {
    "json": "application/sparql-results+json",
    "xml": "application/sparql-results+xml",
    "csv": "text/csv",
    "tsv": "text/tab-separated-values",
    "ntriples": "application/n-triples",
    "nquads": "application/n-quads",
    "turtle": "text/turtle",
    "rdfxml": "application/rdf+xml",
    "trix": "application/trix",
    "trig": "application/trig",
    "rdfjson": "application/rdf+json",
    "jsonld": "application/ld+json",
    "n3": "text/rdf+n3",
}

_GRAPH_FORMS = ("CONSTRUCT", "DESCRIBE")

#: RDF document content types accepted by POST-with-body bulk insert
#: (InsertServlet.doPostWithBody)
_RDF_INSERT_TYPES = frozenset(
    {
        "text/turtle",
        "application/x-turtle",
        "application/n-triples",
        "text/plain",
        "application/n-quads",
        "application/trig",
        "application/rdf+xml",
        "application/trix",
        "application/rdf+json",
        "application/ld+json",
    }
)

_QUERY_FORM_RE = re.compile(
    r"(?:\s|#[^\n]*\n?|(?:PREFIX\s+[^\s:]*:\s*<[^>]*>)|(?:BASE\s*<[^>]*>))*"
    r"([A-Za-z]+)",
    re.IGNORECASE,
)


def _query_form(sparql: str) -> str:
    """First query-form keyword after comments and the PREFIX/BASE
    prologue — NOT a substring search (a SELECT whose IRIs mention
    'construct' must still negotiate a bindings format)."""
    m = _QUERY_FORM_RE.match(sparql)
    return m.group(1).upper() if m else ""


def _negotiate(accept: str | None, sparql: str) -> str:
    """Accept header → serializer format key (ConnegUtil analog):
    q-values are SCORED — the highest-q supported media type wins, ties
    break in header order (ConnegUtil.getTupleQueryResultFormat over
    ConnegScore, pinned by TestConneg's result_set_03: ``text/xhtml,
    a;q=.3, b;q=.5`` must pick b).  Defaults: graphs → turtle,
    solutions → json."""
    best, best_q = None, -1.0
    if accept:
        for part in accept.split(","):
            fields = part.split(";")
            mime = fields[0].strip().lower()
            q = 1.0
            for f in fields[1:]:
                f = f.strip()
                if f.lower().startswith("q="):
                    try:
                        q = float(f[2:])
                    except ValueError:
                        q = 0.0
            if q <= 0.0:
                # RFC 7231 §5.3.1: q=0 means "not acceptable" — never
                # select it (stricter than the reference ConnegUtil,
                # which scores it; divergence noted in COVERAGE.md)
                continue
            if mime in MIME_FORMATS and q > best_q:
                best, best_q = MIME_FORMATS[mime], q
    if best is not None:
        return best
    return "turtle" if _query_form(sparql) in _GRAPH_FORMS else "json"


class _NoSuchNamespace(KeyError):
    pass


class SparqlHandler(BaseHTTPRequestHandler):
    """One request = one query/update against ``server.store``."""

    protocol_version = "HTTP/1.1"

    # -- helpers ------------------------------------------------------------
    def _reply(self, code: int, body: str, ctype: str) -> None:
        data = body.encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", f"{ctype}; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, fmt: str, *args) -> None:  # quiet by default
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    def _params(self) -> dict[str, list[str]]:
        # keep_blank_values: `?explain` (no value) must survive parsing
        return parse_qs(urlparse(self.path).query, keep_blank_values=True)


    # -- multi-tenancy routing (MultiTenancyServlet analog) -------------------
    def _route_ns(self) -> str | None:
        """Path → namespace: ``/namespace/NS/sparql`` selects KB ``NS``;
        any other path is the default namespace (the reference's
        ``.../namespace/NAMESPACE/sparql`` effective-namespace rule,
        MultiTenancyServlet.java:79)."""
        m = re.fullmatch(r"/namespace/([^/]+)/sparql/?",
                         urlparse(self.path).path)
        return unquote(m.group(1)) if m else None

    def _is_namespace_admin(self) -> bool:
        return urlparse(self.path).path.rstrip("/") == "/namespace"

    def _tag_scheduler_pool(self) -> None:
        """Tag this request thread's Spark jobs with a per-request pool
        so that, under ``spark.scheduler.mode=FAIR``
        (``SPARK_GRAFT_SCHEDULER_MODE`` in session.py), concurrent
        requests share executor cores instead of head-of-line queueing
        behind one request's stage burst.  Under the default FIFO
        scheduler the property is ignored — a no-op tag."""
        import threading

        try:
            self.server.store.spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"req-{threading.get_ident()}")
        except Exception:
            pass  # tagging must never fail a request

    def _get_store(self):
        ns = getattr(self, "_ns", None)
        if ns is None or ns == self.server.default_namespace:
            return self.server.store
        store = self.server.namespaces.get(ns)
        if store is None:
            raise _NoSuchNamespace(ns)
        return store

    def _set_store(self, store) -> None:
        ns = getattr(self, "_ns", None)
        if ns is None or ns == self.server.default_namespace:
            self.server.store = store
            self.server.namespaces[self.server.default_namespace] = store
        else:
            self.server.namespaces[ns] = store

    def _run_query(self, sparql: str, explain: bool, dataset=None) -> None:
        store = self._get_store()
        if explain:
            self._reply(200, store.explain(sparql), "text/plain")
            return
        fmt = _negotiate(self.headers.get("Accept"), sparql)
        # protocol-scoped requests bypass the describe cache (its rows
        # are computed over the full store)
        df = None if dataset is not None else self._describe_via_cache(sparql)
        if df is not None:
            from bigdata_old_spark.serializers import serialize

            self._reply(200, serialize(df, fmt), _FORMAT_MIME[fmt])
            return
        # register as a running query in a Spark job group so /status
        # can show AND cancel it (StatusServlet showQueries/cancelQuery;
        # the job group is thread-local, i.e. per request thread)
        import time as _time
        import uuid as _uuid

        qid = str(_uuid.uuid4())
        sc = store.spark.sparkContext
        # interruptOnCancel stays False: cooperative task kill.  A real
        # Thread.interrupt can poison a shared executor JVM (Spark's own
        # docs warn about HDFS-client deadlocks; in local mode it can
        # wedge the scheduler for EVERY later query) — the kill flag is
        # checked at the next record boundary, which is prompt enough.
        sc.setJobGroup(qid, sparql[:200])
        self.server.running_queries[qid] = (sparql, _time.time())
        # server-level query deadline (ConfigParams.QUERY_TIMEOUT /
        # BigdataRDFContext.java:1023-1029 setTimeout analog).  One
        # cancelJobGroup is NOT enough: it only kills jobs running at
        # that instant, and a query spends driver time planning between
        # jobs — so once the deadline passes, keep cancelling until the
        # request thread finishes.
        expired = threading.Event()
        timer = None
        if self.server.query_timeout:

            def _expire():
                expired.set()
                # NB: a politely-spaced cancel loop — job cancellation
                # is routine on a real cluster, but in a shared
                # single-JVM local session a cancel storm can
                # transiently destabilize the next collect (Spark
                # local-mode artifact); 0.5 s spacing is prompt enough
                while qid in self.server.running_queries:
                    sc.cancelJobGroup(qid)
                    _time.sleep(0.5)

            timer = threading.Timer(self.server.query_timeout, _expire)
            timer.daemon = True
            timer.start()
        try:
            body = store.serialize(sparql, fmt, dataset=dataset)
            if expired.is_set():
                raise TimeoutError(
                    f"query deadline expired ({self.server.query_timeout}s)"
                )
        except TimeoutError:
            raise
        except Exception as e:
            if expired.is_set():
                raise TimeoutError(
                    f"query deadline expired ({self.server.query_timeout}s)"
                ) from e
            raise
        finally:
            if timer is not None:
                timer.cancel()
            self.server.running_queries.pop(qid, None)
            sc.setJobGroup(None, None)
        self._reply(200, body, _FORMAT_MIME[fmt])

    def _describe_via_cache(self, sparql: str):
        """Single-constant DESCRIBE with no WHERE → served from the
        server's DescribeCache when one is enabled (the reference's
        DescribeServlet + DescribeCache fast path,
        bigdata-rdf/.../ast/cache/DescribeServiceFactory.java); every
        other query falls through to normal evaluation."""
        cache = getattr(self.server, "describe_cache", None)
        if cache is None or getattr(self, "_ns", None) not in (
            None, self.server.default_namespace
        ):
            return None  # the cache is bound to the default KB
        import re as _re

        # cheap pre-filter: don't pay a second parse_query on every
        # SELECT/ASK/CONSTRUCT that comes through the endpoint's hot
        # path — only texts that can possibly be a DESCRIBE qualify
        if not _re.search(r"(?i)\bDESCRIBE\b", sparql):
            return None
        from bigdata_old_spark import algebra as A
        from bigdata_old_spark.model import Term
        from bigdata_old_spark.parser import parse_query

        q = parse_query(sparql)
        if (
            isinstance(q, A.DescribeQuery)
            and q.pattern is None
            and getattr(q, "dataset", None) is None
            and len(q.terms) == 1
            and isinstance(q.terms[0], Term)
        ):
            with self.server.store_lock:
                return cache.describe(q.terms[0].lex)
        return None

    def _run_update(self, sparql_update: str, dataset=None) -> None:
        with self.server.store_lock:
            cache = getattr(self.server, "describe_cache", None)
            if getattr(self, "_ns", None) not in (None, self.server.default_namespace):
                cache = None  # the cache is bound to the default KB
            new_store = self._get_store().update(
                sparql_update, change_log=cache, dataset=dataset
            )
            self._warm_mutated(new_store)
            self._set_store(new_store)
            if cache is not None:
                cache.rebind(new_store)
        self._reply(200, "", "text/plain")

    @staticmethod
    def _warm_mutated(store) -> None:
        """Pay the new store's one-time per-swap costs in the WRITER
        request (stats dirty-predicate recompute, named-graph probe)
        instead of taxing the first reader of every swap — the OLTP
        half of the r10 writer-mix fix (the library update path stays
        lazy; only the server pre-warms)."""
        try:
            if store._stats is not None or store._stats_dirty:
                store.stats()
            _ = store.has_named_graphs
        except Exception:
            pass  # warming must never fail the mutation

    # -- NanoSparqlServer REST extensions ------------------------------------
    # (QueryServlet ESTCARD/CONTEXTS/uuid, InsertServlet POST-with-body,
    #  DeleteServlet DELETE-with-access-path)

    def _decode_term(self, txt: str):
        """EncodeDecodeValue.decodeValue analog (webapp/client/
        EncodeDecodeValue.java): ``<iri>`` | ``_:label`` |
        ``"lex"[@lang|^^<dt>]`` → a matcher tag."""
        if txt.startswith("<") and txt.endswith(">"):
            return ("resource", txt[1:-1])
        if txt.startswith("_:"):
            return ("resource", txt)
        m = re.fullmatch(r'"(.*)"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?', txt, re.S)
        if m is None:
            raise ValueError(f"cannot decode RDF value: {txt!r}")
        return ("literal", m.group(1), m.group(3), m.group(2))

    def _access_path(self, p: dict):
        """s/p/o/c request params → statements-DF filter (the REST API's
        access-path selector, QueryServlet.doEstCard /
        DeleteServlet.doDeleteWithAccessPath)."""
        from pyspark.sql import functions as F

        df = self._get_store().statements
        s = p.get("s", [None])[0]
        pred = p.get("p", [None])[0]
        o = p.get("o", [None])[0]
        ctxs = p.get("c", [])
        if s is not None:
            kind, val = self._decode_term(s)
            if kind != "resource":
                raise ValueError("s must be a resource")
            df = df.where(F.col("s") == val)
        if pred is not None:
            kind, val = self._decode_term(pred)
            if kind != "resource" or val.startswith("_:"):
                raise ValueError("p must be a URI")
            df = df.where(F.col("p") == val)
        if o is not None:
            t = self._decode_term(o)
            if t[0] == "resource":
                if t[1].startswith("_:"):
                    cond = (F.col("o_kind") == 1) & (F.col("o_lex") == t[1][2:])
                else:
                    cond = (F.col("o_kind") == 0) & (F.col("o_lex") == t[1])
            else:
                _, lex, dt, lang = t
                if dt is None and lang is None:
                    # RDF 1.1: a simple literal IS an xsd:string literal
                    from bigdata_old_spark.model import XSD

                    dt = XSD + "string"
                cond = (
                    (F.col("o_kind") == 2)
                    & (F.col("o_lex") == lex)
                    & F.col("o_dt").eqNullSafe(F.lit(dt))
                    & F.col("o_lang").eqNullSafe(F.lit(lang))
                )
            df = df.where(cond)
        if ctxs:
            vals = []
            for c in ctxs:
                kind, val = self._decode_term(c)
                if kind != "resource":
                    raise ValueError("c must be a resource")
                vals.append(val)
            df = df.where(F.col("g").isin(vals))
        return df

    def _do_estcard(self, p: dict) -> None:
        """GET/POST ?ESTCARD&s=&p=&o=&c= — statement count of an access
        path (QueryServlet.doEstCard; response shape
        BigdataRDFServlet.reportRangeCount).  The reference reports a
        fast rangeCount estimate off its B+Tree; the parquet layout's
        pruned-scan count is exact at comparable cost."""
        import time as _time

        t0 = _time.time()
        try:
            n = self._access_path(p).count()
        except ValueError as e:
            self._reply(400, str(e), "text/plain")
            return
        ms = int((_time.time() - t0) * 1000)
        self._reply(
            200,
            f'<data rangeCount="{n}" milliseconds="{ms}"/>',
            "application/xml",
        )

    def _do_contexts(self) -> None:
        """GET/POST ?CONTEXTS — the named graphs in use
        (QueryServlet.doContexts / reportContexts)."""
        from pyspark.sql import functions as F

        rows = (
            self._get_store().statements.where(F.col("g").isNotNull())
            .select("g").distinct().collect()
        )
        body = "".join(f'<context uri="{r["g"]}"/>' for r in rows)
        self._reply(200, f"<contexts>{body}</contexts>", "application/xml")

    def _mutate_rest(self, added=None, removed=None) -> int:
        """Apply a REST-API statements delta (swap the store, feed the
        describe cache's change listener) and return nmodified."""
        from bigdata_old_spark.changesets import ChangeSet

        with self.server.store_lock:
            store = self._get_store()
            n = 0
            if removed is not None:
                removed = removed.localCheckpoint(eager=True)
                n += removed.count()
                store = store.remove(removed)
            if added is not None:
                added = added.localCheckpoint(eager=True)
                n += added.count()
                store = store.add(added)
            cache = getattr(self.server, "describe_cache", None)
            if getattr(self, "_ns", None) in (None, self.server.default_namespace) \
                    and cache is not None:
                cache.change_event(ChangeSet("rest", added=added, removed=removed))
                cache.rebind(store)
            self._warm_mutated(store)
            self._set_store(store)
        return n

    @staticmethod
    def _parse_rdf(ctype: str, body: str) -> list[tuple]:
        from bigdata_old_spark import rio

        if ctype in ("text/turtle", "application/x-turtle"):
            return [(None, s, pp, o) for s, pp, o in rio.parse_turtle(body)]
        if ctype in ("application/n-triples", "text/plain", "application/n-quads"):
            return rio.parse_nquads(body)
        if ctype == "application/trig":
            return rio.parse_trig(body)
        if ctype == "application/rdf+xml":
            return [(None, s, pp, o) for s, pp, o in rio.parse_rdfxml(body)]
        if ctype == "application/trix":
            return rio.parse_trix(body)
        if ctype == "application/rdf+json":
            return [(None, s, pp, o) for s, pp, o in rio.parse_rdfjson(body)]
        if ctype == "application/ld+json":
            return rio.parse_jsonld(body)
        raise LookupError(ctype)

    def _do_insert_body(self, p: dict, ctype: str, body: str) -> None:
        """POST with an RDF document body — bulk load into the store
        (InsertServlet.doPostWithBody; ``context-uri`` targets named
        graphs, InsertServlet.java:204)."""
        import time as _time

        from bigdata_old_spark.model import statements_df_from_terms

        t0 = _time.time()
        try:
            rows = self._parse_rdf(ctype, body)
        except LookupError:
            self._reply(415, f"unsupported RDF content type: {ctype}", "text/plain")
            return
        except Exception as e:
            self._reply(400, f"{type(e).__name__}: {e}", "text/plain")
            return
        graphs = p.get("context-uri", [])
        if graphs:
            # default context(s) for statements that don't carry their
            # own (InsertServlet.java:204 — quads keep their context)
            gs = [self._decode_term(g)[1] if g.startswith("<") else g for g in graphs]
            rows = [
                (g2, s, pp, o)
                for (g, s, pp, o) in rows
                for g2 in ([g] if g is not None else gs)
            ]
        df = statements_df_from_terms(rows, self._get_store().spark)
        n = self._mutate_rest(added=df)
        ms = int((_time.time() - t0) * 1000)
        self._reply(200, f'<data modified="{n}" milliseconds="{ms}"/>', "application/xml")

    _URI_EXT_TYPES = {
        ".ttl": "text/turtle",
        ".nt": "application/n-triples",
        ".nq": "application/n-quads",
        ".trig": "application/trig",
        ".rdf": "application/rdf+xml",
        ".xml": "application/rdf+xml",
    }

    def _do_insert_uris(self, p: dict) -> None:
        """POST ?uri=… — fetch each document and bulk load it
        (InsertServlet.doPostWithURIs).  Only ``file://`` URLs are
        dereferenced here (this engine ships without an outbound-HTTP
        fetcher for data; the reference uses its HTTP client); format
        sniffs from the file extension."""
        import time as _time
        from urllib.parse import unquote
        from urllib.request import url2pathname

        from bigdata_old_spark.model import statements_df_from_terms

        t0 = _time.time()
        rows: list[tuple] = []
        for uri in p.get("uri", []):
            if not uri.startswith("file://"):
                self._reply(400, f"only file:// URIs are dereferenced: {uri}", "text/plain")
                return
            path = url2pathname(unquote(uri[len("file://"):]))
            ext = "." + path.rsplit(".", 1)[-1].lower() if "." in path else ""
            ctype = self._URI_EXT_TYPES.get(ext)
            if ctype is None:
                self._reply(415, f"cannot infer RDF format from {uri}", "text/plain")
                return
            try:
                with open(path, encoding="utf-8") as fh:
                    rows.extend(self._parse_rdf(ctype, fh.read()))
            except OSError as e:
                self._reply(400, f"cannot read {uri}: {e}", "text/plain")
                return
            except Exception as e:
                self._reply(400, f"{type(e).__name__}: {e}", "text/plain")
                return
        graphs = p.get("context-uri", [])
        if graphs:
            gs = [self._decode_term(g)[1] if g.startswith("<") else g for g in graphs]
            rows = [
                (g2, s, pp, o)
                for (g, s, pp, o) in rows
                for g2 in ([g] if g is not None else gs)
            ]
        df = statements_df_from_terms(rows, self._get_store().spark)
        n = self._mutate_rest(added=df)
        ms = int((_time.time() - t0) * 1000)
        self._reply(200, f'<data modified="{n}" milliseconds="{ms}"/>', "application/xml")

    def do_DELETE(self) -> None:  # noqa: N802
        """DELETE with an access path — remove every matching statement
        (DeleteServlet.doDeleteWithAccessPath; response shape
        reportModifiedCount) — or destroy a namespace
        (/namespace/NS)."""
        self._tag_scheduler_pool()
        import time as _time

        path = urlparse(self.path).path
        m = re.fullmatch(r"/namespace/([^/]+)/?", path)
        if m:
            self._do_namespace_delete(unquote(m.group(1)))
            return
        self._ns = self._route_ns()
        try:
            self._get_store()
        except _NoSuchNamespace as e:
            self._reply(404, f"no such namespace: {e.args[0]}", "text/plain")
            return
        p = self._params()
        is_gsp, g = self._gsp_target(p)
        if is_gsp:
            self._do_gsp_delete(g)
            return
        if "query" in p:
            # DELETE ?query=<CONSTRUCT/DESCRIBE> removes the query's
            # resulting statements from every graph
            # (DeleteServlet.doDeleteWithQuery)
            self._do_delete_with_query(p["query"][0])
            return
        t0 = _time.time()
        try:
            doomed = self._access_path(p)
        except ValueError as e:
            self._reply(400, str(e), "text/plain")
            return
        n = self._mutate_rest(removed=doomed)
        ms = int((_time.time() - t0) * 1000)
        self._reply(200, f'<data modified="{n}" milliseconds="{ms}"/>', "application/xml")

    def _delete_matching(self, victims) -> None:
        """Remove every statement matching a victim triple in ANY graph
        (the DeleteServlet removeStatements null-context semantics) and
        report the modified count."""
        import time as _time

        from bigdata_old_spark.update import _semi_match

        t0 = _time.time()
        # snapshot + swap under the (reentrant) store lock so a write
        # landing between the semi-match and the swap isn't reverted
        with self.server.store_lock:
            doomed = _semi_match(self._get_store().statements, victims,
                                 wild_g=True)
            n = self._mutate_rest(removed=doomed)
        ms = int((_time.time() - t0) * 1000)
        self._reply(200, f'<data modified="{n}" milliseconds="{ms}"/>', "application/xml")

    def _do_delete_with_query(self, q: str) -> None:
        victims = self._query_victims(q)
        if victims is not None:
            self._delete_matching(victims)

    def _query_victims(self, q: str):
        """CONSTRUCT/DESCRIBE text → victims statements-DF (g NULL =
        any-graph wildcard), or None after replying with the error."""
        from pyspark.sql import functions as F

        store = self._get_store()
        try:
            res = store.query(q)
        except Exception as e:
            self._reply(400, f"{type(e).__name__}: {e}", "text/plain")
            return None
        if set(res.columns) != {"s", "p", "o"}:
            self._reply(400, "DELETE with query requires CONSTRUCT/DESCRIBE",
                        "text/plain")
            return None
        return res.select(
            F.lit(None).cast("string").alias("g"),
            F.when(res["s"]["kind"] == 1,
                   F.concat(F.lit("_:"), res["s"]["lex"]))
            .otherwise(res["s"]["lex"]).alias("s"),
            res["p"]["lex"].alias("p"),
            res["o"]["kind"].cast("tinyint").alias("o_kind"),
            res["o"]["lex"].alias("o_lex"),
            res["o"]["dt"].alias("o_dt"),
            res["o"]["lang"].alias("o_lang"),
            res["o"]["num"].alias("o_num"),
            res["o"]["dbl"].alias("o_dbl"),
            res["o"]["dtm"].alias("o_dtm"),
            res["o"]["bool"].alias("o_bool"),
            F.lit(0).cast("tinyint").alias("stype"),
        )

    def _do_delete_body(self, p: dict, ctype: str, body: str) -> None:
        """DELETE with an RDF body: quads keep their own context (a TriG
        body scoping a triple to one graph deletes ONLY that quad —
        DeleteServlet.RemoveStatementHandler uses stmt.getContext());
        context-less statements fall back to ``context-uri`` when given,
        else the any-graph wildcard (Sesame removeStatements
        null-context)."""
        from bigdata_old_spark.model import statements_df_from_terms

        try:
            rows = self._parse_rdf(ctype, body)
        except LookupError:
            self._reply(415, f"unsupported RDF content type: {ctype}", "text/plain")
            return
        except Exception as e:
            self._reply(400, f"{type(e).__name__}: {e}", "text/plain")
            return
        graphs = p.get("context-uri", [])
        if graphs:
            gs = [self._decode_term(g)[1] if g.startswith("<") else g for g in graphs]
            rows = [
                (g2, s, pp, o)
                for (g, s, pp, o) in rows
                for g2 in ([g] if g is not None else gs)
            ]
        victims = statements_df_from_terms(rows, self._get_store().spark)
        self._delete_matching(victims)


    # -- SPARQL 1.1 Graph Store HTTP Protocol (indirect identification) ------
    # GET/PUT/POST/DELETE at the endpoint with ?graph=<uri>|?default —
    # the W3C standard REST surface for whole-graph management,
    # complementing the NanoSparqlServer access-path REST extensions.

    def _gsp_target(self, p: dict) -> tuple[bool, str | None]:
        """(is_gsp_request, graph-uri-or-None-for-default)."""
        if "default" in p:
            return True, None
        if "graph" in p:
            g = p["graph"][0]
            if g.startswith("<") and g.endswith(">"):
                g = g[1:-1]
            return True, g
        return False, None

    def _gsp_rows(self, g: str | None):
        from pyspark.sql import functions as F

        sts = self._get_store().statements
        return sts.where(F.col("g").isNull() if g is None else (F.col("g") == g))

    def _do_gsp_get(self, g: str | None) -> None:
        from pyspark.sql import functions as F

        from bigdata_old_spark import serializers
        from bigdata_old_spark.model import iri_col_to_term, obj_cols_to_term

        rows = self._gsp_rows(g)
        if g is not None and rows.isEmpty():
            self._reply(404, f"no such graph: {g}", "text/plain")
            return
        trip = rows.select(
            iri_col_to_term(F.col("s")).alias("s"),
            iri_col_to_term(F.col("p")).alias("p"),
            obj_cols_to_term("o_").alias("o"),
        )
        accept = (self.headers.get("Accept") or "").lower()
        if "n-triples" in accept:
            self._reply(200, serializers.ntriples(trip), "application/n-triples")
        else:
            self._reply(200, serializers.turtle(trip), "text/turtle")

    def _do_gsp_put(self, g: str | None, ctype: str, body: str) -> None:
        """PUT = REPLACE the graph with the payload (201 when a named
        graph springs into existence, 200 when replacing)."""
        from bigdata_old_spark.model import statements_df_from_terms

        try:
            rows = self._parse_rdf(ctype, body)
        except LookupError:
            self._reply(415, f"unsupported RDF content type: {ctype}", "text/plain")
            return
        except Exception as e:
            self._reply(400, f"{type(e).__name__}: {e}", "text/plain")
            return
        # snapshot + replace under the (reentrant) store lock so a
        # concurrent mutation between the existed-check and the swap can
        # neither survive the "replace" nor flip the 200/201 answer
        with self.server.store_lock:
            existed = g is None or not self._gsp_rows(g).isEmpty()
            old = self._gsp_rows(g)
            new = statements_df_from_terms(
                [(g, s, pp, o) for (_, s, pp, o) in rows],
                self._get_store().spark,
            )
            self._mutate_rest(removed=old, added=new)
        self._reply(200 if existed else 201, "", "text/plain")

    def _do_gsp_delete(self, g: str | None) -> None:
        """DELETE = drop the graph (404 for an absent named graph; the
        default graph always exists and empties to 200)."""
        rows = self._gsp_rows(g)
        if g is not None and rows.isEmpty():
            self._reply(404, f"no such graph: {g}", "text/plain")
            return
        n = self._mutate_rest(removed=rows)
        self._reply(200, f'<data modified="{n}"/>', "application/xml")

    def do_PUT(self) -> None:  # noqa: N802
        self._tag_scheduler_pool()
        self._ns = self._route_ns()
        try:
            self._get_store()
        except _NoSuchNamespace as e:
            self._reply(404, f"no such namespace: {e.args[0]}", "text/plain")
            return
        p = self._params()
        is_gsp, g = self._gsp_target(p)
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip().lower()
        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length).decode("utf-8") if length else ""
        if not is_gsp and "query" in p:
            # PUT ?query=<CONSTRUCT> + RDF body = atomic UPDATE: remove
            # the query's statements, insert the body's
            # (UpdateServlet.doUpdateWithQuery; RemoteRepository.update
            # with RemoveOp(query) + AddOp)
            self._do_update_with_query(p["query"][0], ctype, body)
            return
        if not is_gsp:
            self._reply(400, "PUT requires ?graph= or ?default (Graph Store Protocol)",
                        "text/plain")
            return
        self._do_gsp_put(g, ctype, body)

    def _do_update_with_query(self, q: str, ctype: str, body: str) -> None:
        import time as _time

        from bigdata_old_spark.model import statements_df_from_terms
        from bigdata_old_spark.update import _semi_match

        try:
            rows = self._parse_rdf(ctype, body)
        except LookupError:
            self._reply(415, f"unsupported RDF content type: {ctype}", "text/plain")
            return
        except Exception as e:
            self._reply(400, f"{type(e).__name__}: {e}", "text/plain")
            return
        victims = self._query_victims(q)
        if victims is None:
            return  # error already replied
        t0 = _time.time()
        with self.server.store_lock:
            store = self._get_store()
            doomed = _semi_match(store.statements, victims, wild_g=True)
            # quads bodies keep their own context (UpdateServlet honors
            # defaultContextInsert only for context-less statements)
            added = statements_df_from_terms(rows, store.spark)
            n = self._mutate_rest(removed=doomed, added=added)
        ms = int((_time.time() - t0) * 1000)
        self._reply(200, f'<data modified="{n}" milliseconds="{ms}"/>', "application/xml")

    # -- status page (StatusServlet analog) ----------------------------------
    def _do_status(self, p: dict) -> None:
        """GET /status — uptime, namespaces, running queries
        (StatusServlet showQueries surface); POST/GET
        /status?cancelQuery&queryId=<id> cancels the query's Spark job
        group (StatusServlet.java:156 CANCEL_QUERY)."""
        import time as _time

        if "cancelQuery" in p:
            ids = p.get("queryId", [])
            sc = self.server.store.spark.sparkContext
            n = 0
            for qid in ids:
                if qid in self.server.running_queries:
                    sc.cancelJobGroup(qid)
                    n += 1
            self._reply(200, f"cancelled: {n}", "text/plain")
            return
        lines = [
            f"uptime_sec: {int(_time.time() - self.server.started_at)}",
            f"namespaces: {', '.join(sorted(self.server.namespaces))}",
            "running_queries:",
        ]
        now = _time.time()
        for qid, (sparql, t0) in list(self.server.running_queries.items()):
            one = " ".join(sparql.split())[:120]
            lines.append(f"  {qid}  elapsed={now - t0:.1f}s  {one}")
        cache = getattr(self.server, "describe_cache", None)
        if cache is not None:
            lines.append(
                f"describe_cache: hits={cache.hits} misses={cache.misses} "
                f"invalidations={cache.invalidations}"
            )
        self._reply(200, "\n".join(lines) + "\n", "text/plain")

    # -- namespace administration (MultiTenancyServlet) ----------------------
    def _do_namespace_properties(self, ns: str) -> None:
        """GET /namespace/NS/properties — the KB's effective
        configuration as Java-properties text
        (MultiTenancyServlet.doGet 'Describe a namespace' /
        RemoteRepositoryManager.getRepositoryProperties)."""
        with self.server.store_lock:
            store = self.server.namespaces.get(ns)
        if store is None:
            self._reply(404, f"no such namespace: {ns}", "text/plain")
            return
        props = {
            "com.bigdata.relation.namespace": ns,
            "com.bigdata.rdf.sail.namespace": ns,
            "com.bigdata.rdf.store.AbstractTripleStore.quads":
                str(store.has_named_graphs).lower(),
            "com.bigdata.rdf.sail.truthMaintenance":
                "true" if store.load_closure == "incremental" else "false",
            "com.bigdata.rdf.store.AbstractTripleStore.statementIdentifiers":
                str(store.sid_map is not None).lower(),
        }
        body = "".join(f"{k}={v}\n" for k, v in sorted(props.items()))
        self._reply(200, body, "text/plain")

    def _do_namespace_list(self) -> None:
        """GET /namespace — describe all KBs (VoID per namespace with its
        sparqlEndpoint; MultiTenancyServlet.doGet 'Describe all
        namespaces')."""
        host = self.headers.get("Host") or "localhost"
        out = [
            "@prefix void: <http://rdfs.org/ns/void#> .",
            "@prefix sd: <http://www.w3.org/ns/sparql-service-description#> .",
            "",
        ]
        with self.server.store_lock:
            for ns, store in sorted(self.server.namespaces.items()):
                from urllib.parse import quote

                url = f"http://{host}/namespace/{quote(ns, safe='')}/sparql"
                out.append(
                    f'<{url}> a sd:Service, void:Dataset ;\n'
                    f'  void:sparqlEndpoint <{url}> ;\n'
                    f'  void:triples {store.statements.count()} .'
                )
        self._reply(200, "\n".join(out) + "\n", "text/turtle")

    def _do_namespace_create(self, body: str) -> None:
        """POST /namespace — create a KB.  Body is Java-properties text
        carrying ``com.bigdata.rdf.sail.namespace=NAME``
        (MultiTenancyServlet.doPost → createTenant; 201 + Location)."""
        ns = None
        for line in body.splitlines():
            line = line.strip()
            if line.startswith("com.bigdata.rdf.sail.namespace"):
                ns = line.split("=", 1)[1].strip()
        if not ns:
            self._reply(400, "missing com.bigdata.rdf.sail.namespace", "text/plain")
            return
        from bigdata_old_spark.model import STATEMENTS_SCHEMA
        from bigdata_old_spark.store import TripleStore

        with self.server.store_lock:
            if ns in self.server.namespaces:
                # the reference replies 400 to CREATE of an existing KB
                # (TestMultiTenancyAPI.doTestCreate expects BADREQUEST)
                self._reply(400, f"EXISTS: {ns}", "text/plain")
                return
            spark = self.server.store.spark
            self.server.namespaces[ns] = TripleStore(
                spark, spark.createDataFrame([], STATEMENTS_SCHEMA),
                has_named_graphs=False,
            )
        from urllib.parse import quote

        host = self.headers.get("Host") or "localhost"
        loc = f"http://{host}/namespace/{quote(ns, safe='')}/sparql"
        data = f"CREATED: {ns}".encode()
        self.send_response(201)
        self.send_header("Content-Type", "text/plain; charset=utf-8")
        self.send_header("Location", loc)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _do_namespace_delete(self, ns: str) -> None:
        """DELETE /namespace/NS — destroy that KB
        (MultiTenancyServlet.doDeleteNamespace).  The default namespace
        is the server's primary store and cannot be destroyed."""
        with self.server.store_lock:
            if ns == self.server.default_namespace:
                self._reply(409, "cannot delete the default namespace", "text/plain")
                return
            if self.server.namespaces.pop(ns, None) is None:
                self._reply(404, f"no such namespace: {ns}", "text/plain")
                return
        self._reply(200, f"DELETED: {ns}", "text/plain")

    # -- verbs --------------------------------------------------------------
    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        self._tag_scheduler_pool()
        if urlparse(self.path).path.rstrip("/") == "/status":
            self._do_status(self._params())
            return
        if urlparse(self.path).path.rstrip("/") == "/counters":
            self._do_counters(self._params())
            return
        if self._is_namespace_admin():
            self._do_namespace_list()
            return
        mprop = re.fullmatch(r"/namespace/([^/]+)/properties/?",
                             urlparse(self.path).path)
        if mprop:
            self._do_namespace_properties(unquote(mprop.group(1)))
            return
        self._ns = self._route_ns()
        try:
            self._get_store()
        except _NoSuchNamespace as e:
            self._reply(404, f"no such namespace: {e.args[0]}", "text/plain")
            return
        p = self._params()
        is_gsp, g = self._gsp_target(p)
        if is_gsp and "query" not in p:
            self._do_gsp_get(g)
            return
        if "ESTCARD" in p:
            self._do_estcard(p)
            return
        if "CONTEXTS" in p:
            self._do_contexts()
            return
        if "uuid" in p:
            # QueryServlet.doUUID — server-minted UUID for JS clients
            import uuid as _uuid

            self._reply(200, str(_uuid.uuid4()), "text/plain")
            return
        q = p.get("query", [None])[0]
        if q is None:
            # SPARQL 1.1 Service Description at the bare endpoint URL
            # (QueryServlet.doServiceDescription / SD.java:460-531)
            self._do_service_description()
            return
        self._dispatch(q, None, "explain" in p, p)

    def _do_service_description(self) -> None:
        from pyspark.sql import functions as F

        store = self._get_store()
        host = self.headers.get("Host") or "localhost"
        uri = f"http://{host}{urlparse(self.path).path}"
        ntriples = store.statements.count()
        graphs = (
            store.statements.where(F.col("g").isNotNull()).select("g").distinct().count()
            if store.has_named_graphs else 0
        )
        langs = "".join(
            f"  sd:supportedLanguage sd:{l} ;\n"
            for l in ("SPARQL10Query", "SPARQL11Query", "SPARQL11Update")
        )
        fmts = "".join(
            f"  sd:inputFormat <http://www.w3.org/ns/formats/{f}> ;\n"
            for f in ("RDF_XML", "N-Triples", "N-Quads", "Turtle", "TriG")
        )
        body = (
            "@prefix sd: <http://www.w3.org/ns/sparql-service-description#> .\n"
            "@prefix void: <http://rdfs.org/ns/void#> .\n\n"
            "[] a sd:Service ;\n"
            f"  sd:endpoint <{uri}> ;\n"
            f"{langs}{fmts}"
            "  sd:defaultDataset [\n"
            "    a sd:Dataset, void:Dataset ;\n"
            f"    void:triples {ntriples}"
            + (f" ;\n    void:graphs {graphs}" if graphs else "")
            + "\n  ] .\n"
        )
        self._reply(200, body, "text/turtle")

    def do_POST(self) -> None:  # noqa: N802
        self._tag_scheduler_pool()
        p = self._params()
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip().lower()
        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length).decode("utf-8") if length else ""
        if urlparse(self.path).path.rstrip("/") == "/status":
            self._do_status(self._params())
            return
        if self._is_namespace_admin():
            self._do_namespace_create(body)
            return
        self._ns = self._route_ns()
        try:
            self._get_store()
        except _NoSuchNamespace as e:
            self._reply(404, f"no such namespace: {e.args[0]}", "text/plain")
            return

        if "ESTCARD" in p:
            self._do_estcard(p)
            return
        if "CONTEXTS" in p:
            self._do_contexts()
            return
        if "uri" in p and not body:
            # InsertServlet.doPostWithURIs (dispatch rule
            # InsertServlet.java:106-118: uri param wins over body)
            self._do_insert_uris(p)
            return
        if "delete" in p and ctype in _RDF_INSERT_TYPES:
            # POST ?delete with an RDF body removes the body's
            # statements from EVERY graph (DeleteServlet.doDeleteWithBody)
            self._do_delete_body(p, ctype, body)
            return
        if ctype in _RDF_INSERT_TYPES:
            # Graph Store Protocol POST = merge into the target graph:
            # ?graph= behaves as the insert's default context;
            # ?default is a plain default-graph insert
            is_gsp, g = self._gsp_target(p)
            if is_gsp and g is not None:
                p = dict(p)
                p["context-uri"] = [f"<{g}>"]
            self._do_insert_body(p, ctype, body)
            return
        query = p.get("query", [None])[0]
        update = p.get("update", [None])[0]
        if ctype == "application/x-www-form-urlencoded":
            form = parse_qs(body, keep_blank_values=True)
            query = form.get("query", [query])[0]
            update = form.get("update", [update])[0]
            # dataset params may travel in the form body (Protocol §2.1)
            p = {**form, **{k: v for k, v in p.items() if k not in form}}
        elif ctype == "application/sparql-query":
            query = body
        elif ctype == "application/sparql-update":
            update = body
        if query is not None and update is not None:
            # SPARQL 1.1 Protocol: exactly one operation per request
            self._reply(400, "exactly one of query/update allowed", "text/plain")
            return
        if query is None and update is None:
            self._reply(400, "missing query/update", "text/plain")
            return
        self._dispatch(query, update, "explain" in p, p)

    @staticmethod
    def _protocol_dataset(p: dict, update: bool):
        """SPARQL 1.1 Protocol dataset parameters → A.Dataset or None
        (default-graph-uri/named-graph-uri on queries,
        using-graph-uri/using-named-graph-uri on updates — reference
        BigdataRDFContext.java:183-201)."""
        from bigdata_old_spark import algebra as A

        dk, nk = (
            ("using-graph-uri", "using-named-graph-uri")
            if update
            else ("default-graph-uri", "named-graph-uri")
        )
        defaults, named = p.get(dk), p.get(nk)
        if not defaults and not named:
            return None
        return A.Dataset(defaults or None, named or None)

    def _dispatch(self, query, update, explain: bool, p: dict | None = None) -> None:
        """Parse errors → 400 (client fault); failures after a
        successful parse → 500 (server fault) — not everything is 400."""
        from bigdata_old_spark.parser import parse_query
        from bigdata_old_spark.update import parse_update

        p = p or {}
        try:
            dataset = self._protocol_dataset(p, update is not None)
            if update is not None:
                parse_update(update)
            else:
                parse_query(query)
        except Exception as e:
            self._count("queryErrorCount")
            self._reply(400, f"{type(e).__name__}: {e}", "text/plain")
            return
        try:
            if update is not None:
                self._run_update(update, dataset=dataset)
                self._count("updatesExecuted")
            else:
                self._run_query(query, explain, dataset=dataset)
                self._count("queriesExecuted")
        except _NoSuchNamespace as e:
            self._reply(404, f"no such namespace: {e.args[0]}", "text/plain")
        except Exception as e:
            from bigdata_old_spark.update import ProtocolDatasetError

            # Protocol 2.2.3: using-graph-uri with USING/WITH in the
            # update text is a client error, not a server fault
            code = 400 if isinstance(e, ProtocolDatasetError) else 500
            self._count("queryErrorCount")
            self._reply(code, f"{type(e).__name__}: {e}", "text/plain")

    def _count(self, name: str) -> None:
        # += on a plain Counter is a read-modify-write; concurrent
        # request threads (ThreadingHTTPServer) would lose increments
        with self.server.counters_lock:
            self.server.counters[name] += 1

    def _do_counters(self, p: dict) -> None:
        """GET /counters — performance counters as the reference's
        counter-set XML: ``<counters><cs path="..."><c name=".."
        type=".." time=".." value=".."/></cs></counters>``
        (CountersServlet.java:64; element/attribute names per
        counters/XMLUtility.java:326-382).  ``?filter=`` applies the
        reference's regex filter against the full counter path."""
        import re as _re
        import time as _time
        from xml.sax.saxutils import quoteattr

        now_ms = int(_time.time() * 1000)
        c = self.server.counters
        sets: dict[str, list[tuple[str, object, str]]] = {
            "/Query Engine": [
                ("queriesExecuted", c.get("queriesExecuted", 0), "xs:long"),
                ("updatesExecuted", c.get("updatesExecuted", 0), "xs:long"),
                ("queryErrorCount", c.get("queryErrorCount", 0), "xs:long"),
                ("runningQueriesCount", len(self.server.running_queries), "xs:long"),
                ("elapsedSec", int(_time.time() - self.server.started_at), "xs:long"),
            ],
        }
        with self.server.store_lock:
            for ns, store in sorted(self.server.namespaces.items()):
                sets[f"/Journal/{ns}"] = [
                    ("statementCount", store.statements.count(), "xs:long"),
                ]
        cache = getattr(self.server, "describe_cache", None)
        if cache is not None:
            sets["/DescribeCache"] = [
                ("hits", cache.hits, "xs:long"),
                ("misses", cache.misses, "xs:long"),
                ("invalidations", cache.invalidations, "xs:long"),
            ]
        filt = None
        if p.get("filter"):
            try:
                filt = _re.compile(p["filter"][0])
            except _re.error as e:
                self._reply(400, f"bad filter: {e}", "text/plain")
                return
        out = ['<?xml version="1.0" encoding="UTF-8"?>', "<counters>"]
        for path, items in sets.items():
            kept = [
                (n, v, t) for n, v, t in items
                if filt is None or filt.search(f"{path}/{n}")
            ]
            if not kept:
                continue
            out.append(f"<cs path={quoteattr(path)}>")
            for name, value, typ in kept:
                # reference XMLUtility writes XSD type tokens (getXSDType →
                # xs:long) and non-self-closing <c> elements
                out.append(
                    f"<c name={quoteattr(name)} type={quoteattr(typ)} "
                    f'time="{now_ms}" value={quoteattr(str(value))}></c>'
                )
            out.append("</cs>")
        out.append("</counters>")
        self._reply(200, "\n".join(out) + "\n", "application/xml")


def make_server(
    store,
    host: str = "127.0.0.1",
    port: int = 0,
    describe_cache: bool = False,
    query_timeout: float | None = None,
) -> ThreadingHTTPServer:
    """Create (not start) the endpoint; ``port=0`` picks a free port.
    ``server.store`` is the live store (replaced by UPDATEs).
    ``describe_cache=True`` enables the materialized DESCRIBE cache
    (QueryHints.CACHE_ENABLED analog — the reference ships it off by
    default too, QueryHints.java:478): single-constant DESCRIBEs serve
    from the cache and UPDATEs invalidate through the changeset hook."""
    srv = ThreadingHTTPServer((host, port), SparqlHandler)
    srv.store = store
    srv.default_namespace = "kb"  # the reference's default KB namespace
    srv.namespaces = {"kb": store}
    srv.running_queries = {}
    srv.query_timeout = query_timeout  # seconds; None/0 = unlimited
    from collections import Counter as _Counter

    srv.counters = _Counter()  # /counters performance counters
    srv.counters_lock = threading.Lock()
    import time as _time

    srv.started_at = _time.time()
    # reentrant: GSP PUT holds it across its snapshot+replace while the
    # nested _mutate_rest re-acquires it
    srv.store_lock = threading.RLock()
    srv.verbose = False
    srv.describe_cache = None
    if describe_cache:
        from bigdata_old_spark.describe_cache import DescribeCache

        srv.describe_cache = DescribeCache(store)
    return srv


def serve_background(
    store,
    host: str = "127.0.0.1",
    port: int = 0,
    describe_cache: bool = False,
    query_timeout: float | None = None,
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start the endpoint on a daemon thread; returns (server, thread).
    Shut down with ``server.shutdown()``."""
    srv = make_server(store, host, port, describe_cache=describe_cache,
                      query_timeout=query_timeout)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t
