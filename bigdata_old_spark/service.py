"""Remote SPARQL SERVICE execution — the ServiceCallJoin analog.

The reference's ServiceCallJoin (bigdata/.../controller/
ServiceCallJoin.java:103) ships the service group to a remote SPARQL
endpoint over the SPARQL protocol and VECTORS the outer solutions into
the request: chunks of already-computed bindings ride along as a
BINDINGS/VALUES block so the endpoint evaluates the group
pre-constrained (ServiceCallJoin.java:85-88,378; the remote query text
is synthesized by RemoteSparql11QueryBuilder, chosen by
RemoteSparqlBuilderFactory.java:109).  Here, when the service group
shares certainly-bound variables with the outer solutions, the
DISTINCT outer bindings of those variables are collected (capped),
chunked ``VECTOR_CHUNK`` per request, and each request is

    SELECT * WHERE { VALUES (?v …) { (…) … } <service group> }

The chunk results are unioned and the ordinary compiler join machinery
does the final vectored join.  Cross-chunk duplicate solutions cannot
arise because vectored variables are restricted to those CERTAINLY
bound inside the service group — every remote solution binds them to
exactly one VALUES tuple, which lives in exactly one chunk.  The
unconstrained ``SELECT * WHERE {…}`` form is kept when there are no
shared certain variables, a binding is a blank node (label has no
cross-endpoint identity), or the binding count exceeds ``MAX_VECTOR``.

The HTTP call is driver-side and the result is a local DataFrame —
correct for the protocol (a remote endpoint is a single server; there
is nothing to distribute) and identical to the reference, which also
funnels the service call through one client.  Inject a transport with
``set_transport`` for tests or custom auth; the default uses urllib.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_old_spark import algebra as A
from bigdata_old_spark.model import (
    KIND_BNODE,
    KIND_IRI,
    TERM_TYPE,
    XSD,
    Term,
)

Transport = Callable[[str, str], str]  # (endpoint, query) -> response body

#: outer bindings per remote request (the reference vectors chunks too,
#: ServiceCallJoin.java:378)
VECTOR_CHUNK = 512
#: above this many distinct outer bindings the VALUES block would bloat
#: the request — fall back to the unconstrained form
MAX_VECTOR = 4096

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


def _parse_results(payload: str):
    """SPARQL 1.1 Query Results JSON → (vars list, list of row tuples)."""
    doc = json.loads(payload)
    names = doc["head"]["vars"]
    rows = [
        tuple(_json_term(b[n]).as_row() if n in b else None for n in names)
        for b in doc["results"]["bindings"]
    ]
    return names, rows


def results_json_to_df(spark, payload: str):
    """SPARQL 1.1 Query Results JSON → (DataFrame of term structs,
    vars list).  Unbound = NULL struct, matching engine convention."""
    names, rows = _parse_results(payload)
    return _rows_to_df(spark, names, rows), names


def _rows_to_df(spark, names, rows):
    schema = T.StructType([T.StructField(n, TERM_TYPE) for n in names])
    return spark.createDataFrame(rows, schema)


def certainly_bound_vars(node) -> set[str]:
    """Variables a pattern binds in EVERY solution — the syntactic
    certainly-bound analysis the reference's service-var computation
    performs on the service group (conservative: anything unknown
    contributes nothing)."""
    if isinstance(node, A.BGP):
        out: set[str] = set()
        for t in node.triples:
            for pos in (t.s, t.p, t.o):
                if isinstance(pos, A.Var):
                    out.add(pos.name)
        return out
    if isinstance(node, A.Join):
        return certainly_bound_vars(node.left) | certainly_bound_vars(node.right)
    if isinstance(node, A.LeftJoin):
        return certainly_bound_vars(node.left)
    if isinstance(node, A.UnionPat):
        return certainly_bound_vars(node.left) & certainly_bound_vars(node.right)
    if isinstance(node, A.FilterPat):
        return certainly_bound_vars(node.child)
    if isinstance(node, A.Extend):
        # BIND exprs can evaluate to error → unbound; don't count n.var
        return certainly_bound_vars(node.child)
    if isinstance(node, A.GraphPat):
        out = certainly_bound_vars(node.child)
        if isinstance(node.graph, A.Var):
            out.add(node.graph.name)
        return out
    if isinstance(node, A.ServicePat):
        return certainly_bound_vars(node.child)
    if isinstance(node, A.SubSelect):
        # a plain-var projection is certainly bound iff the subquery
        # body certainly binds it (expression projections can evaluate
        # to error → unbound, so they contribute nothing)
        q = node.query
        inner = certainly_bound_vars(q.pattern)
        if q.wildcard:
            return inner
        return {name for name, expr in (q.projection or [])
                if expr is None and name in inner}
    return set()  # ValuesPat (UNDEF rows), … — conservative


def _escape_lex(lex: str) -> str:
    return (
        lex.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _sparql_value(v) -> str | None:
    """One outer binding → SPARQL VALUES token.  None = not shippable
    (blank node: its label has no identity at the remote endpoint)."""
    if isinstance(v, str):  # flat resource string
        if v.startswith("_:"):
            return None
        return f"<{v}>"
    kind = v["kind"]
    if kind == KIND_IRI:
        return f"<{v['lex']}>"
    if kind == KIND_BNODE:
        return None
    lex = f'"{_escape_lex(v["lex"])}"'
    if v["lang"]:
        return f"{lex}@{v['lang']}"
    if v["dt"] and v["dt"] != XSD + "string":
        return f"{lex}^^<{v['dt']}>"
    return lex


def _vector_queries(decls: str, node, outer) -> list[str] | None:
    """Synthesize the chunked VALUES-constrained request texts, or None
    when the unconstrained form must be used."""
    if outer is None:
        return None
    # vector every outer var the service group certainly binds — not
    # just certainly-bound OUTER vars: a maybe-unbound outer var (expr
    # projection, OPTIONAL) ships as UNDEF in its VALUES row, exactly
    # the reference's getDistinctVars/UNDEF convention
    # (RemoteSparql11QueryBuilder.java:289)
    jvars = sorted(
        set(outer.df.columns)
        & A.pattern_vars(node.child)
        & certainly_bound_vars(node.child)
    )
    if not jvars:
        return None
    # the same outer plan is re-executed by the local join after the
    # service returns — materialize so the (possibly expensive) subtree
    # is computed once, not twice.  localCheckpoint (not persist): a
    # persisted plan stays pinned in the CacheManager until an explicit
    # unpersist nobody here can schedule (the join consuming it runs
    # later, lazily), which leaks cached blocks for the session's
    # lifetime on a long-running endpoint; checkpointed RDDs are
    # reference-tracked and reclaimed by the ContextCleaner when this
    # frame is garbage collected.  Mutating outer.df in place hands the
    # materialized frame to the caller's final join too.
    outer.df = outer.df.localCheckpoint(eager=True)
    rows = (
        outer.df.select(*[F.col(v) for v in jvars])
        .dropDuplicates()
        .limit(MAX_VECTOR + 1)
        .collect()
    )
    if not rows or len(rows) > MAX_VECTOR:
        return None
    # serialize; a NULL (unbound) outer value ships as UNDEF, a var
    # with any non-shippable value (bnode) drops out entirely
    def _tok(x):
        if x is None or (not isinstance(x, str) and x["kind"] is None):
            return "UNDEF"
        return _sparql_value(x)

    ser = {v: [_tok(r[v]) for r in rows] for v in jvars}
    jvars = [v for v in jvars if all(x is not None for x in ser[v])]
    if not jvars:
        return None
    tuples = sorted({tuple(ser[v][i] for v in jvars) for i in range(len(rows))})
    var_list = " ".join("?" + v for v in jvars)
    out = []
    for i in range(0, len(tuples), VECTOR_CHUNK):
        chunk = tuples[i : i + VECTOR_CHUNK]
        rows_txt = " ".join("(" + " ".join(t) + ")" for t in chunk)
        out.append(
            f"{decls}SELECT * WHERE {{ VALUES ({var_list}) "
            f"{{ {rows_txt} }} {node.raw} }}"
        )
    return out


def remote_service(store, node, compiler, outer=None):
    """Execute SERVICE <endpoint> {…} remotely; returns Compiled.

    ``outer``: the already-compiled solutions the service result will
    join with — when it shares certainly-bound variables with the
    service group, their distinct bindings are pushed to the endpoint
    as chunked VALUES blocks (the vectored ServiceCallJoin)."""
    from bigdata_old_spark.compiler import Compiled
    from bigdata_old_spark.registry import get_service_options, resolve_service_alias

    # SERVICE <alias> sends to the aliased endpoint
    # (ServiceRegistry.java:349 dealiasedServiceURI)
    endpoint = resolve_service_alias(node.iri.lex)
    decls = "".join(f"PREFIX {p}: <{iri}>\n" for p, iri in node.prefixes)
    send = _transport or default_transport
    # an endpoint marked sparql11=False cannot evaluate VALUES — send
    # the unconstrained group (RemoteSparqlBuilderFactory.java:136
    # picks the pre-1.1 builder off RemoteServiceOptions the same way)
    sparql11 = (
        get_service_options(endpoint)["sparql11"]
        and get_service_options(node.iri.lex)["sparql11"]
    )
    queries = _vector_queries(decls, node, outer) if sparql11 else None
    if queries is None:
        queries = [f"{decls}SELECT * WHERE {node.raw}"]
    names: list | None = None
    rows: list = []
    for q in queries:
        ns, rs = _parse_results(send(endpoint, q))
        if names is None:
            names = ns
        elif ns != names:
            # nothing fixes head.vars ORDER across responses — re-map
            # positionally-different chunks instead of appending
            # bindings under the wrong variables
            rs = [tuple(r[ns.index(n)] if n in ns else None for n in names) for r in rs]
        rows.extend(rs)
    df = _rows_to_df(store.spark, names or [], rows)
    # vars bound in every row are certain (join keys); others stay
    # optional, same as the reference's service-var analysis — one
    # aggregation for all vars, not a take(1) probe per var
    if names and rows:
        counts = df.agg(
            *[F.count(F.col(n)).alias(n) for n in names],
            F.count(F.lit(1)).alias("__n"),
        ).collect()[0]
        certain = frozenset(n for n in names if counts[n] == counts["__n"])
    else:
        certain = frozenset()
    return Compiled(df, certain)


def remote_service_var(store, node, compiler, outer=None):
    """SERVICE ?var {…} — a VARIABLE endpoint, resolved against the
    outer solutions: one remote call per DISTINCT endpoint URI the
    outer side binds to ``?var`` (the reference groups its source
    solutions by ``ServiceCallUtility.getServiceURI`` and runs one
    ServiceCall per distinct service URI, ServiceCallJoin.java:401-414;
    an unbound or non-URI serviceRef is an error, ibid:316-318).

    Each per-endpoint result is tagged with ``?var = <endpoint>`` so
    the ordinary join machinery correlates solutions back to the
    endpoint that produced them; per-endpoint requests vector ONLY that
    endpoint's own outer bindings as VALUES chunks (the reference's
    per-service-URI solution grouping), via :func:`remote_service`.
    The distinct-endpoint collect is model-state (a handful of service
    URIs), not data."""
    import dataclasses

    from bigdata_old_spark.compiler import Compiled
    from bigdata_old_spark.model import term_lit

    vname = node.iri.name
    if outer is None or vname not in set(outer.vars):
        raise ValueError(
            f"SERVICE ?{vname}: the endpoint variable is not bound by "
            "the preceding patterns (the reference requires a bound "
            "serviceRef, ServiceCallJoin.java:316)"
        )
    vals = [r[vname] for r in outer.df.select(vname).dropDuplicates().collect()]
    endpoints = []
    for v in vals:
        if v is None:
            # an outer solution with the serviceRef unbound is an error,
            # same as the reference (ServiceCallJoin.java:316-318) —
            # NOT a silent drop of those solutions
            raise ValueError(f"SERVICE ?{vname}: unbound in an outer solution")
        if isinstance(v, str):  # flat resource string
            if v.startswith("_:"):
                raise ValueError(f"SERVICE ?{vname}: bound to a blank node")
            endpoints.append(v)
        elif v["kind"] == KIND_IRI:
            endpoints.append(v["lex"])
        else:
            raise ValueError(f"SERVICE ?{vname}: bound to a non-URI term")
    if not endpoints:
        # no endpoint to call — no solutions (empty frame, no vars)
        return Compiled(
            store.spark.range(0).select(F.lit(1).alias("__unit")), frozenset()
        )

    def _eq_endpoint(col, ep):
        if vname in outer.flat:
            return col == F.lit(ep)
        return (col["kind"] == KIND_IRI) & (col["lex"] == ep)

    parts = []
    names: set[str] = set()
    for ep in sorted(endpoints):
        fixed = dataclasses.replace(node, iri=Term.iri(ep))
        # group the outer solutions by service URI: this endpoint only
        # receives ITS rows' bindings (ServiceCallJoin.java:401-414) —
        # N endpoints don't each get the full VALUES set, and one
        # endpoint's share fitting under MAX_VECTOR is what matters
        mine = Compiled(
            outer.df.where(_eq_endpoint(outer.df[vname], ep)),
            outer.certain,
            outer.flat,
        )
        res = remote_service(store, fixed, compiler, outer=mine)
        if vname in res.df.columns:
            # the service group itself binds the endpoint variable —
            # keep only remote solutions consistent with ?var = <ep>
            # (unbound in the remote row unifies with the endpoint)
            c = res.df[vname]
            tagged = res.df.where(
                c.isNull() | ((c["kind"] == KIND_IRI) & (c["lex"] == ep))
            ).withColumn(vname, term_lit(Term.iri(ep)))
        else:
            tagged = res.df.withColumn(vname, term_lit(Term.iri(ep)))
        parts.append(Compiled(tagged, res.certain | {vname}))
        names.update(tagged.columns)
    df = parts[0].df
    for p in parts[1:]:
        df = df.unionByName(p.df, allowMissingColumns=True)
    # a var is certain only if certain in EVERY endpoint's result AND
    # present in every response head (absent column = null-padded)
    certain = frozenset.intersection(
        *[p.certain & frozenset(p.df.columns) for p in parts]
    ) | {vname}
    return Compiled(df, frozenset(c for c in certain if c in names))
