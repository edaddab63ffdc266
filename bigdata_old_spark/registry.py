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
