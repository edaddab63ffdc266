"""Custom function + service registries (FunctionRegistry /
ServiceRegistry parity, SURVEY §2.10)."""

from pyspark.sql import functions as F

from bigdata_old_spark.compiler import Compiled
from bigdata_old_spark.functions import string_term
from bigdata_old_spark.registry import register_function, register_service

P = """
PREFIX : <http://example.org/>
PREFIX fn: <http://example.org/fn#>
PREFIX svc: <http://example.org/svc#>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
"""
EX = "http://example.org/"


def test_custom_function(small_store):
    register_function(
        "http://example.org/fn#shout",
        lambda args: string_term(F.concat(F.upper(args[0]["lex"]), F.lit("!"))),
    )
    df = small_store.query(P + """
        SELECT ?x (fn:shout(?l) AS ?s) WHERE { ?x rdfs:label ?l . FILTER(?l = "Mike") }""")
    rows = df.collect()
    assert rows[0]["s"]["lex"] == "MIKE!"


def test_custom_service(small_store):
    def handler(store, pattern, compiler):
        df = store.spark.createDataFrame(
            [("Mike",), ("Zed",)], "name string"
        ).select(string_term(F.col("name")).alias("name"))
        return Compiled(df, frozenset(["name"]))

    register_service("http://example.org/svc#names", handler)
    df = small_store.query(P + """
        SELECT ?x WHERE {
          SERVICE svc:names { }
          ?x rdfs:label ?name .
        }""")
    assert [r["x"]["lex"] for r in df.collect()] == [EX + "Mike"]


def test_custom_aggregate(small_store):
    from bigdata_old_spark.functions import double_term
    from bigdata_old_spark.registry import register_aggregate

    register_aggregate(
        "http://example.org/fn#stddev",
        lambda col, distinct: double_term(F.stddev_pop(col["num"].cast("double"))),
    )
    df = small_store.query(P + """
        SELECT (fn:stddev(STRLEN(?l)) AS ?sd) WHERE { ?x rdfs:label ?l }""")
    rows = df.collect()
    assert rows[0]["sd"]["dbl"] is not None and rows[0]["sd"]["dbl"] >= 0


def test_custom_aggregate_grouped(small_store):
    from bigdata_old_spark.functions import integer_term
    from bigdata_old_spark.registry import register_aggregate

    register_aggregate(
        "http://example.org/fn#countd",
        lambda col, distinct: integer_term(
            F.count_distinct(col) if distinct else F.count(col)
        ),
    )
    df = small_store.query(P + """
        PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        SELECT ?x (fn:countd(DISTINCT ?o) AS ?n)
        WHERE { ?x foaf:knows ?o } GROUP BY ?x ORDER BY ?x""")
    rows = df.collect()
    assert len(rows) == 3 and all(r["n"]["num"] >= 1 for r in rows)
    by_x = {r["x"]["lex"]: int(r["n"]["num"]) for r in rows}
    assert by_x[EX + "Bryan"] == 2


def test_remote_service_via_transport(small_store):
    """SERVICE against a SPARQL-protocol endpoint, transport injected
    (ServiceCallJoin parity without a network)."""
    import json

    from bigdata_old_spark import service as svc

    seen = {}

    def fake_transport(endpoint, query):
        seen["endpoint"], seen["query"] = endpoint, query
        return json.dumps({
            "head": {"vars": ["name", "age"]},
            "results": {"bindings": [
                {"name": {"type": "literal", "value": "Mike"},
                 "age": {"type": "literal", "value": "44",
                         "datatype": "http://www.w3.org/2001/XMLSchema#integer"}},
                {"name": {"type": "literal", "value": "Nobody"}},
            ]},
        })

    svc.set_transport(fake_transport)
    try:
        df = small_store.query(P + """
            SELECT ?x ?age WHERE {
              SERVICE <http://remote.example.org/sparql> { ?s ?p ?name . }
              ?x rdfs:label ?name .
            }""")
        rows = df.collect()
    finally:
        svc.set_transport(None)
    assert seen["endpoint"] == "http://remote.example.org/sparql"
    assert "SELECT * WHERE" in seen["query"] and "?name" in seen["query"]
    # Mike joins (age bound), Nobody doesn't match any label
    assert [r["x"]["lex"] for r in rows] == [EX + "Mike"]
    assert rows[0]["age"]["num"] == 44


def test_remote_service_silent_failure(small_store):
    from bigdata_old_spark import service as svc

    def boom(endpoint, query):
        raise OSError("no route to host")

    svc.set_transport(boom)
    try:
        df = small_store.query(P + """
            SELECT ?x WHERE {
              SERVICE SILENT <http://unreachable.example.org/sparql> { ?s ?p ?o }
              ?x rdfs:label "DC" .
            }""")
        assert [r["x"]["lex"] for r in df.collect()] == [EX + "DC"]
    finally:
        svc.set_transport(None)


def test_service_silent_unregistered(small_store):
    df = small_store.query(P + """
        SELECT ?x WHERE {
          SERVICE SILENT svc:nope { }
          ?x rdfs:label ?name . FILTER(?name = "DC")
        }""")
    assert [r["x"]["lex"] for r in df.collect()] == [EX + "DC"]


def test_builtin_sketch_aggregates(spark):
    """Pre-registered sketch aggregates (urn:x-bdos:agg#): HLL distinct
    count, quantile sketch, stddev — exact at tiny cardinality."""
    from bigdata_old_spark.store import TripleStore

    rows = [(f"http://ex/s{i}", "http://ex/p", i % 7) for i in range(50)]
    ttl = "\n".join(
        f'<{s}> <{p}> "{o}"^^<http://www.w3.org/2001/XMLSchema#integer> .'
        for s, p, o in rows
    )
    st = TripleStore.from_turtle(spark, ttl)
    df = st.query("""
        PREFIX agg: <urn:x-bdos:agg#>
        SELECT (agg:countDistinctApprox(?o) AS ?ndv)
               (agg:median(?o) AS ?med)
               (agg:stddev(?o) AS ?sd)
        WHERE { ?s <http://ex/p> ?o }""")
    r = df.collect()[0]
    assert int(r["ndv"]["num"]) == 7          # HLL exact at this cardinality
    assert r["med"]["dbl"] == 3.0
    assert r["sd"]["dbl"] > 0


# ---------------------------------------------------------------------------
# Built-in bd: services (ServiceRegistry.java:87-93 default registrations)
# ---------------------------------------------------------------------------

BDP = P + "PREFIX bd: <http://www.bigdata.com/rdf#>\n"


def test_bd_values_service(small_store):
    """SERVICE bd:values — ValuesServiceFactory.java:93."""
    df = small_store.query(BDP + """
        SELECT ?x ?name WHERE {
          SERVICE bd:values {
            bd:serviceParam bd:values.var ?name .
            bd:serviceParam bd:values.val "Mike" .
            bd:serviceParam bd:values.val "DC" .
          }
          ?x rdfs:label ?name .
        }""")
    assert sorted(r["x"]["lex"] for r in df.collect()) == [EX + "DC", EX + "Mike"]


def test_bd_slice_service(small_store):
    """SERVICE bd:slice — SliceServiceFactory.java:112: offset/limit
    slice of one triple pattern in deterministic order."""
    q = BDP + """
        SELECT ?x ?l WHERE {
          SERVICE bd:slice {
            ?x rdfs:label ?l .
            bd:serviceParam <http://www.bigdata.com/rdf#slice.offset> 1 .
            bd:serviceParam <http://www.bigdata.com/rdf#slice.limit> 2 .
          }
        }"""
    rows = small_store.query(q).collect()
    assert len(rows) == 2
    # all three labels, minus the first in deterministic solution order
    all_rows = small_store.query(BDP + """
        SELECT ?x ?l WHERE {
          SERVICE bd:slice { ?x rdfs:label ?l . }
        }""").collect()
    assert len(all_rows) == 3  # default offset 0 / limit 1000 covers all
    assert {r["x"]["lex"] for r in rows} <= {r["x"]["lex"] for r in all_rows}


def test_bd_slice_range_count(small_store):
    """bd:slice.range ?r binds the pattern's range count instead."""
    df = small_store.query(BDP + """
        SELECT ?r WHERE {
          SERVICE bd:slice {
            ?x rdfs:label ?l .
            bd:serviceParam <http://www.bigdata.com/rdf#slice.range> ?r .
          }
        }""")
    rows = df.collect()
    assert len(rows) == 1 and int(rows[0]["r"]["num"]) == 3


def test_bd_sample_service(small_store):
    """SERVICE bd:sample — SampleServiceFactory.java:101: seeded,
    reproducible sample of one triple pattern."""
    q = BDP + """
        SELECT ?x ?o WHERE {
          SERVICE bd:sample {
            ?x foaf:knows ?o .
            bd:serviceParam <http://www.bigdata.com/rdf#sample.limit> 2 .
            bd:serviceParam <http://www.bigdata.com/rdf#sample.seed> 7 .
            bd:serviceParam <http://www.bigdata.com/rdf#sample.sampleType> "RANDOM" .
          }
        }"""
    small_store._plan_cache.clear()
    got1 = sorted((r["x"]["lex"], r["o"]["lex"]) for r in small_store.query(q).collect())
    small_store._plan_cache.clear()
    got2 = sorted((r["x"]["lex"], r["o"]["lex"]) for r in small_store.query(q).collect())
    assert len(got1) == 2 and got1 == got2  # seeded → reproducible
    # a different seed is a (potentially) different sample, same size
    q2 = q.replace("sample.seed> 7", "sample.seed> 8")
    got3 = small_store.query(q2).collect()
    assert len(got3) == 2
