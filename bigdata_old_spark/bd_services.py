"""Built-in bd: service URIs — the reference ServiceRegistry's three
default-registered internal services (ServiceRegistry.java:87-93):

* ``bd:values``  (ValuesServiceFactory.java:93) — simulates single-var
  VALUES: ``bd:serviceParam bd:values.var ?v`` names the variable,
  each ``bd:serviceParam bd:values.val <x>`` contributes one solution.
* ``bd:slice``   (SliceServiceFactory.java:112) — a single triple
  pattern sliced by ``bd:slice.offset`` / ``bd:slice.limit`` (defaults
  0 / 1000) in deterministic key order, or ``bd:slice.range ?r`` to
  bind the pattern's range count instead.
* ``bd:sample``  (SampleServiceFactory.java:101) — a seeded sample of
  a single triple pattern: ``bd:sample.limit`` (default 100),
  ``bd:sample.seed`` (default 0), ``bd:sample.sampleType``
  (RANDOM/EVEN/DENSE accepted).  The Spark re-expression is a
  deterministic hash-ordered top-N (xxhash64 over the solution key and
  seed) — reproducible across runs for a fixed seed, which is the
  property the reference's SampleIndex seed exists to provide.

All three evaluate store-side (no HTTP).  Slice and sample order by
the SOLUTION key, so at 100 TB they are a pruned pattern scan plus a
TakeOrderedAndProject — no global sort materialization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

BD = "http://www.bigdata.com/rdf#"
SERVICE_PARAM = BD + "serviceParam"

VALUES_KEY = BD + "values"
SLICE_KEY = BD + "slice"
SAMPLE_KEY = BD + "sample"


def _split_group(pattern):
    """Service group → (param dict {param-iri: [object nodes]}, other
    triples).  Only a BGP group is meaningful for these services (the
    reference's AbstractServiceFactory.getServiceParams contract)."""
    from bigdata_old_spark import algebra as A
    from bigdata_old_spark.model import Term

    if not isinstance(pattern, A.BGP):
        raise ValueError("bd: service group must be a plain triple block")
    params: dict[str, list] = {}
    triples = []
    for t in pattern.triples:
        if isinstance(t.s, Term) and t.s.lex == SERVICE_PARAM:
            if not isinstance(t.p, Term):
                raise ValueError("bd:serviceParam requires a constant key")
            params.setdefault(t.p.lex, []).append(t.o)
        else:
            triples.append(t)
    return params, triples


def _int_param(params, key, default):
    vals = params.get(key)
    if not vals:
        return default
    return int(vals[0].lex)


def _solution_key(c):
    """Deterministic per-solution sort key over the pattern's bound
    variables (flat strings sort as-is; term structs by identity)."""
    parts = []
    for v in sorted(c.vars):
        if v in c.flat:
            parts.append(F.coalesce(F.col(v), F.lit("")))
        else:
            parts.append(
                F.concat_ws(
                    "\x1f",
                    F.col(v)["kind"].cast("string"),
                    F.coalesce(F.col(v)["lex"], F.lit("")),
                    F.coalesce(F.col(v)["dt"], F.lit("")),
                    F.coalesce(F.col(v)["lang"], F.lit("")),
                )
            )
    return F.concat_ws("\x02", *parts) if parts else F.lit("")


def values_service(store, pattern, compiler):
    """SERVICE bd:values {…} (ValuesServiceFactory)."""
    from bigdata_old_spark import algebra as A
    from bigdata_old_spark.compiler import Compiled
    from bigdata_old_spark.model import TERM_TYPE

    from pyspark.sql import types as T

    params, triples = _split_group(pattern)
    if triples:
        raise ValueError("bd:values takes only bd:serviceParam triples")
    var_nodes = params.get(VALUES_KEY + ".var") or []
    if len(var_nodes) != 1 or not isinstance(var_nodes[0], A.Var):
        raise ValueError("bd:values requires exactly one bd:values.var ?v")
    name = var_nodes[0].name
    vals = params.get(VALUES_KEY + ".val") or []
    rows = [(t.as_row(),) for t in vals]
    df = store.spark.createDataFrame(
        rows, T.StructType([T.StructField(name, TERM_TYPE)])
    )
    return Compiled(df, frozenset([name]))


def _single_pattern(compiler, triples, svc):
    from bigdata_old_spark import algebra as A

    if len(triples) != 1:
        raise ValueError(f"{svc} requires exactly one triple pattern")
    return compiler.compile_bgp(A.BGP(triples), None)


def slice_service(store, pattern, compiler):
    """SERVICE bd:slice {…} (SliceServiceFactory)."""
    from bigdata_old_spark import algebra as A
    from bigdata_old_spark.compiler import Compiled
    from bigdata_old_spark.functions import integer_term

    params, triples = _split_group(pattern)
    c = _single_pattern(compiler, triples, "bd:slice")
    range_nodes = params.get(SLICE_KEY + ".range")
    if range_nodes:
        if not isinstance(range_nodes[0], A.Var):
            raise ValueError("bd:slice.range takes a variable")
        n = c.df.count()  # the access path rangeCount
        rv = range_nodes[0].name
        df = store.spark.range(1).select(integer_term(F.lit(n)).alias(rv))
        return Compiled(df, frozenset([rv]))
    offset = _int_param(params, SLICE_KEY + ".offset", 0)
    limit = _int_param(params, SLICE_KEY + ".limit", 1000)
    df = (
        c.df.orderBy(_solution_key(c))
        .offset(offset)
        .limit(limit)
    )
    return Compiled(df, c.certain, c.flat)


def sample_service(store, pattern, compiler):
    """SERVICE bd:sample {…} (SampleServiceFactory / SampleIndex)."""
    params, triples = _split_group(pattern)
    c = _single_pattern(compiler, triples, "bd:sample")
    limit = _int_param(params, SAMPLE_KEY + ".limit", 100)
    seed = _int_param(params, SAMPLE_KEY + ".seed", 0)
    st_nodes = params.get(SAMPLE_KEY + ".sampleType")
    if st_nodes and st_nodes[0].lex.upper() not in ("RANDOM", "EVEN", "DENSE"):
        raise ValueError(f"bd:sample.sampleType: unknown type {st_nodes[0].lex}")
    from bigdata_old_spark.compiler import Compiled

    df = c.df.orderBy(
        F.xxhash64(_solution_key(c), F.lit(seed))
    ).limit(limit)
    return Compiled(df, c.certain, c.flat)


def register_defaults(register_service) -> None:
    register_service(VALUES_KEY, values_service)
    register_service(SLICE_KEY, slice_service)
    register_service(SAMPLE_KEY, sample_service)
