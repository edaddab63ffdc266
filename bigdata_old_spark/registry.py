"""Extension registries: custom functions and custom services.

The reference exposes two user-extension points (SURVEY §2.10):
  * FunctionRegistry.add(uri, factory) — custom FILTER/BIND functions
    (ast/FunctionRegistry.java:116; openrdf bridge constraints/FuncBOp)
  * ServiceRegistry.add(uri, ServiceFactory) — SERVICE <uri> {…} calls
    answered by registered code instead of remote SPARQL
    (sparql/ast/service/ServiceRegistry.java:34; built-ins like
    eval/SearchServiceFactory.java:90)

Here both are module-level dicts:
  * register_function(iri, builder) — builder(args: list[Column]) →
    term-struct Column; the compiler consults this before failing an
    unknown-IRI FuncCall.
  * register_service(iri, handler) — handler(store, inner_pattern,
    compiler) → Compiled; the compiler dispatches ServicePat here.
"""

from __future__ import annotations

from collections.abc import Callable

_FUNCTIONS: dict[str, Callable] = {}
_SERVICES: dict[str, Callable] = {}
_AGGREGATES: dict[str, Callable] = {}


def register_function(iri: str, builder: Callable) -> None:
    """builder([Column,...]) -> Column (term struct)."""
    _FUNCTIONS[iri] = builder


def lookup_function(iri: str) -> Callable | None:
    return _FUNCTIONS.get(iri)


def register_aggregate(iri: str, builder: Callable) -> None:
    """Custom aggregate (IAggregate/AggregateFactory parity —
    bigdata/.../aggregate/IAggregate.java, FunctionRegistry.java:236):
    builder(col: Column, distinct: bool) -> aggregate Column returning a
    term struct.  ``col`` is the compiled term-struct column of the
    single argument.  The parser recognizes a registered IRI called in
    expression position as an aggregate (``iri(DISTINCT? expr)``), so
    registration must precede parsing.  Spark evaluates the returned
    expression with partial (map-side) aggregation where the underlying
    functions allow — use built-ins or a pandas_udf grouped-agg."""
    _AGGREGATES[iri] = builder


def lookup_aggregate(iri: str) -> Callable | None:
    return _AGGREGATES.get(iri)


def register_service(iri: str, handler: Callable) -> None:
    """handler(store, pattern, compiler) -> Compiled."""
    _SERVICES[iri] = handler


def lookup_service(iri: str) -> Callable | None:
    return _SERVICES.get(iri)


_SERVICE_ALIASES: dict[str, str] = {}
_SERVICE_OPTIONS: dict[str, dict] = {}


def add_service_alias(service_iri: str, alias_iri: str) -> None:
    """``ServiceRegistry.addAlias(serviceURI, aliasURI)`` analog
    (ServiceRegistry.java:232-272): ``SERVICE <alias>`` thereafter
    resolves to ``service_iri`` — both for registered handlers and for
    the remote SPARQL client's request URL.  Like the reference, an
    IRI that is already registered as a service may not become an
    alias, and aliases may not chain."""
    if alias_iri in _SERVICES:
        raise ValueError(f"already registered as a service: {alias_iri}")
    if service_iri in _SERVICE_ALIASES:
        raise ValueError(f"aliases may not chain: {service_iri} is an alias")
    if alias_iri in _SERVICE_ALIASES.values():
        # the reverse order would also build a chain (X→S exists, then
        # S→T makes X resolve to the stale S): reject it too —
        # resolution is deliberately single-hop
        raise ValueError(
            f"aliases may not chain: {alias_iri} is already an alias target"
        )
    _SERVICE_ALIASES[alias_iri] = service_iri


def remove_service(iri: str) -> None:
    """De-register a service, alias, or per-endpoint options
    (ServiceRegistry.remove, ServiceRegistry.java:172-196)."""
    _SERVICES.pop(iri, None)
    _SERVICE_ALIASES.pop(iri, None)
    _SERVICE_OPTIONS.pop(iri, None)


def resolve_service_alias(iri: str) -> str:
    return _SERVICE_ALIASES.get(iri, iri)


def set_service_options(iri: str, *, sparql11: bool = True) -> None:
    """Per-endpoint remote options — the RemoteServiceOptions analog
    (RemoteServiceOptions.java:73-103).  ``sparql11=False`` marks an
    endpoint that cannot evaluate a VALUES block, so the remote client
    sends the UNCONSTRAINED service group instead of vectoring outer
    bindings (RemoteSparqlBuilderFactory.java:136 picks the pre-1.1
    query builder the same way)."""
    _SERVICE_OPTIONS[iri] = {"sparql11": sparql11}


def get_service_options(iri: str) -> dict:
    return _SERVICE_OPTIONS.get(iri, {"sparql11": True})


# ---------------------------------------------------------------------------
# Built-in extension aggregates (additive, registered at import):
# sketch-backed aggregates under the engine's own namespace.  These are
# the single-pass, partial-aggregatable summaries a 100 TB pipeline
# needs where exact DISTINCT/median would shuffle the world:
# approx_count_distinct is an HLL++ sketch (map-side partials merge),
# percentile_approx is a Greenwald-Khanna quantile sketch.
# ---------------------------------------------------------------------------

AGG_NS = "urn:x-bdos:agg#"


def _term_identity(col):
    """Term → identity string for distinct-counting (kind/dt/lang/lex)."""
    from pyspark.sql import functions as F

    return F.concat_ws(
        "\x1f",
        col["kind"].cast("string"),
        F.coalesce(col["dt"], F.lit("")),
        F.coalesce(col["lang"], F.lit("")),
        col["lex"],
    )


def _builtin_extension_aggregates() -> dict[str, Callable]:
    def count_distinct_approx(col, distinct):
        from pyspark.sql import functions as F

        from bigdata_old_spark import functions as SF

        return SF.integer_term(F.approx_count_distinct(_term_identity(col)))

    def _numeric(fn):
        def build(col, distinct):
            from bigdata_old_spark import functions as SF

            return SF.double_term(fn(col["dbl"]))

        return build

    from pyspark.sql import functions as F

    return {
        AGG_NS + "countDistinctApprox": count_distinct_approx,
        AGG_NS + "median": _numeric(lambda c: F.percentile_approx(c, 0.5)),
        AGG_NS + "p90": _numeric(lambda c: F.percentile_approx(c, 0.9)),
        AGG_NS + "p99": _numeric(lambda c: F.percentile_approx(c, 0.99)),
        AGG_NS + "stddev": _numeric(F.stddev_samp),
        AGG_NS + "variance": _numeric(F.var_samp),
    }


_AGGREGATES.update(_builtin_extension_aggregates())


# ---------------------------------------------------------------------------
# Built-in internal functions
# ---------------------------------------------------------------------------

#: RDR ``<<s p o>>`` support: the parser desugars an embedded triple to
#: the statement pattern plus BIND(sidOf(s,p,o) AS ?sid).  The encoding
#: MUST match provenance.sid_col (xxhash64 over the flat s/p/o keys) so
#: the computed SID joins against SIDs minted by TripleStore.to_sids.
SID_OF_IRI = "urn:x-bdos:sidOf"


def _sid_of(args):
    from pyspark.sql import functions as F

    from bigdata_old_spark import functions as SF
    from bigdata_old_spark.compiler import _key_from_term
    from bigdata_old_spark.model import term_to_resource_key

    s, p, o = args
    return SF.iri_term(
        F.concat(
            F.lit("sid:"),
            F.conv(
                F.xxhash64(
                    term_to_resource_key(s), term_to_resource_key(p), _key_from_term(o)
                ).cast("string"),
                10,
                16,
            ),
        )
    )


_FUNCTIONS[SID_OF_IRI] = _sid_of


# ---------------------------------------------------------------------------
# Built-in bd: services (the reference ServiceRegistry's default
# registrations, ServiceRegistry.java:87-93): bd:values / bd:slice /
# bd:sample — see bd_services.py.
# ---------------------------------------------------------------------------

from bigdata_old_spark import bd_services as _bd_services  # noqa: E402

_bd_services.register_defaults(register_service)
