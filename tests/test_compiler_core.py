"""Core algebra→DataFrame compilation, hand-built ASTs (no parser)."""

from bigdata_old_spark import algebra as A
from bigdata_old_spark.model import FOAF, RDF_TYPE, RDFS, Term

FOAF_PERSON = Term.iri(FOAF + "Person")
KNOWS = Term.iri(FOAF + "knows")
LABEL = Term.iri(RDFS + "label")
EX = "http://example.org/"


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def lexes(df, col):
    return sorted(r[col]["lex"] for r in df.collect() if r[col] is not None)


def test_bgp_join(small_store):
    q = A.SelectQuery(
        pattern=A.BGP([
            A.TriplePattern(A.Var("x"), KNOWS, A.Var("y")),
            A.TriplePattern(A.Var("y"), LABEL, A.Var("name")),
        ]),
        projection=[("name", None)],
    )
    df = small_store.query_algebra(q)
    assert lexes(df, "name") == ["Bryan", "Bryan", "Mike"]


def test_filter_ne(small_store):
    q = A.SelectQuery(
        pattern=A.FilterPat(
            A.FuncCall("!=", (A.Var("name"), A.Const(Term.literal("Bryan")))),
            A.BGP([
                A.TriplePattern(A.Var("x"), KNOWS, A.Var("y")),
                A.TriplePattern(A.Var("y"), LABEL, A.Var("name")),
            ]),
        ),
        projection=[("name", None)],
    )
    df = small_store.query_algebra(q)
    assert lexes(df, "name") == ["Mike"]


def test_optional_unbound(small_store):
    # Martyn has no label → label unbound
    q = A.SelectQuery(
        pattern=A.LeftJoin(
            A.BGP([A.TriplePattern(A.Var("p"), Term.iri(RDF_TYPE), FOAF_PERSON)]),
            A.BGP([A.TriplePattern(A.Var("p"), LABEL, A.Var("label"))]),
        ),
        projection=[("p", None), ("label", None)],
    )
    out = {r["p"]["lex"]: (r["label"]["lex"] if r["label"] else None) for r in small_store.query_algebra(q).collect()}
    assert out == {EX + "Mike": "Mike", EX + "Bryan": "Bryan", EX + "Martyn": None}


def test_optional_unbound_flat_subject(small_store):
    """An unbound OPTIONAL var in a *resource position* (flat string
    representation) must behave as unbound for BOUND() and project as
    a NULL struct — regression test for the late-materialization
    refactor."""
    q = """
    PREFIX foaf: <http://xmlns.com/foaf/0.1/>
    PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?x ?fan WHERE {
      ?x a foaf:Person .
      OPTIONAL { ?fan foaf:knows ?x . ?fan rdfs:label "Mike" }
      FILTER(!BOUND(?fan) || ?fan != ?x)
    }"""
    rows = small_store.query(q).collect()
    got = {(r["x"]["lex"], r["fan"]["lex"] if r["fan"] is not None else None) for r in rows}
    # Mike labels exist: Mike knows Bryan → fan of Bryan = Mike;
    # Mike and Martyn have no Mike-labelled fan → unbound (NULL struct)
    assert got == {
        (EX + "Bryan", EX + "Mike"),
        (EX + "Mike", None),
        (EX + "Martyn", None),
    }


def test_union(small_store):
    q = A.SelectQuery(
        pattern=A.UnionPat(
            A.BGP([A.TriplePattern(A.Var("x"), LABEL, A.Var("v"))]),
            A.BGP([A.TriplePattern(A.Var("x"), Term.iri(RDF_TYPE), A.Var("v"))]),
        ),
        projection=[("x", None), ("v", None)],
    )
    df = small_store.query_algebra(q)
    # labels: Mike, Bryan, DC = 3; rdf:type: 3 persons
    assert df.count() == 6


def test_minus(small_store):
    # persons MINUS labeled things → Martyn
    q = A.SelectQuery(
        pattern=A.MinusPat(
            A.BGP([A.TriplePattern(A.Var("p"), Term.iri(RDF_TYPE), FOAF_PERSON)]),
            A.BGP([A.TriplePattern(A.Var("p"), LABEL, A.Var("l"))]),
        ),
        projection=[("p", None)],
    )
    assert lexes(small_store.query_algebra(q), "p") == [EX + "Martyn"]


def test_distinct_orderby_limit(small_store):
    q = A.SelectQuery(
        pattern=A.BGP([A.TriplePattern(A.Var("x"), KNOWS, A.Var("y"))]),
        projection=[("x", None)],
        distinct=True,
        order_by=[(A.Var("x"), True)],
        limit=2,
    )
    df = small_store.query_algebra(q)
    got = [r["x"]["lex"] for r in df.collect()]
    assert got == [EX + "Bryan", EX + "Martyn"]


def test_bind_and_exists(small_store):
    # BIND(STRLEN(?name) AS ?n) FILTER EXISTS { ?x foaf:knows ?z }
    q = A.SelectQuery(
        pattern=A.FilterPat(
            A.ExistsExpr(A.BGP([A.TriplePattern(A.Var("x"), KNOWS, A.Var("z"))])),
            A.Extend(
                A.BGP([A.TriplePattern(A.Var("x"), LABEL, A.Var("name"))]),
                "n",
                A.FuncCall("STRLEN", (A.Var("name"),)),
            ),
        ),
        projection=[("x", None), ("n", None)],
    )
    out = {r["x"]["lex"]: r["n"]["lex"] for r in small_store.query_algebra(q).collect()}
    assert out == {EX + "Mike": "4", EX + "Bryan": "5"}


def test_aggregate_count_group(small_store):
    # how many people does each person know?
    q = A.SelectQuery(
        pattern=A.BGP([A.TriplePattern(A.Var("x"), KNOWS, A.Var("y"))]),
        projection=[("x", None), ("cnt", A.Aggregate("COUNT", A.Var("y")))],
        group_by=[(None, A.Var("x"))],
    )
    out = {r["x"]["lex"]: int(r["cnt"]["lex"]) for r in small_store.query_algebra(q).collect()}
    assert out == {EX + "Mike": 1, EX + "Bryan": 2, EX + "Martyn": 1}


def test_property_path_plus(small_store):
    # :Martyn foaf:knows+ ?y → Bryan, Mike, Martyn (cycle)
    q = A.SelectQuery(
        pattern=A.BGP([
            A.TriplePattern(Term.iri(EX + "Martyn"), A.PathStar(A.PathLink(FOAF + "knows"), 1, None), A.Var("y")),
        ]),
        projection=[("y", None)],
    )
    assert lexes(small_store.query_algebra(q), "y") == [EX + "Bryan", EX + "Martyn", EX + "Mike"]


def test_values(small_store):
    q = A.SelectQuery(
        pattern=A.Join(
            A.BGP([A.TriplePattern(A.Var("x"), LABEL, A.Var("name"))]),
            A.ValuesPat(["name"], [[Term.literal("Mike")], [Term.literal("DC")]]),
        ),
        projection=[("x", None)],
    )
    assert lexes(small_store.query_algebra(q), "x") == [EX + "DC", EX + "Mike"]


def test_query_hints_stripped_and_applied(small_store):
    """hint: triples are stripped from the pattern (never matched as
    data) and hint:optimizer "None" pins syntactic join order."""
    q = """
        PREFIX hint: <http://www.bigdata.com/queryHints#>
        PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        SELECT ?name WHERE {
          hint:Query hint:optimizer "None" .
          ?x foaf:knows ?y .
          ?y rdfs:label ?name .
        }"""
    got = lexes(small_store.query(q), "name")
    assert got == ["Bryan", "Bryan", "Mike"]


def test_query_hint_describe_mode(small_store):
    from bigdata_old_spark.store import TripleStore

    df = small_store.query("""
        PREFIX hint: <http://www.bigdata.com/queryHints#>
        PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        DESCRIBE ?x WHERE {
          hint:Query hint:describeMode "SymmetricOneStep" .
          ?x foaf:knows <http://example.org/Martyn> .
        }""")
    # symmetric: includes reverse arcs pointing at Bryan
    objs = {(r["s"]["lex"], r["o"]["lex"]) for r in df.collect()}
    assert ("http://example.org/Mike", "http://example.org/Bryan") in objs


def test_exists_no_shared_vars_lazy(spark, small_store):
    # EXISTS with no shared variables: nonempty and empty subpatterns,
    # evaluated lazily in-plan (no compile-time job; VERDICT r02 item 4)
    P = "PREFIX foaf: <http://xmlns.com/foaf/0.1/>\nPREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>\n"
    df = small_store.query(P + "SELECT ?s WHERE { ?s foaf:knows ?o . FILTER EXISTS { ?x rdfs:label ?l } }")
    assert df.count() == 4
    df2 = small_store.query(P + "SELECT ?s WHERE { ?s foaf:knows ?o . FILTER EXISTS { ?x foaf:nope ?l } }")
    assert df2.count() == 0
    df3 = small_store.query(P + "SELECT ?s WHERE { ?s foaf:knows ?o . FILTER NOT EXISTS { ?x foaf:nope ?l } }")
    assert df3.count() == 4


def test_exists_one_pass_plan(spark, small_store):
    # the certain-key EXISTS compiles to ONE scan of the left input:
    # no Union of semi+anti joins in the plan
    P = "PREFIX foaf: <http://xmlns.com/foaf/0.1/>\nPREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>\n"
    df = small_store.query(P + "SELECT ?s WHERE { ?s foaf:knows ?o . FILTER EXISTS { ?s rdfs:label ?l } }")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan
    assert sorted(r["s"]["lex"] for r in df.collect()) == [
        "http://example.org/Bryan", "http://example.org/Bryan",
        "http://example.org/Mike",
    ]


def test_plan_cache_reuse_and_invalidation(spark, small_store):
    # same query text → the cached DataFrame handle (no recompile);
    # mutation returns a NEW store with an empty cache
    P2 = "PREFIX foaf: <http://xmlns.com/foaf/0.1/>\n"
    q = P2 + "SELECT ?s WHERE { ?s foaf:knows ?o }"
    d1 = small_store.query(q)
    d2 = small_store.query(q)
    assert d1 is d2
    st2 = small_store.update(
        P2 + "INSERT DATA { <urn:x:a> foaf:knows <urn:x:b> }")
    d3 = st2.query(q)
    assert d3 is not d1
    assert d3.count() == d1.count() + 1


def test_star_join_multivalued_predicate_cross_product(spark):
    # the functional-predicate star fast path must NOT engage for
    # multi-valued predicates: cross-product semantics preserved
    from bigdata_old_spark.store import TripleStore

    st = TripleStore.from_turtle(spark, """
    @prefix : <http://e/> .
    :x :a 1 ; :b 2 ; :c 3 , 4 .
    :y :a 5 ; :b 6 ; :c 7 .
    """)
    df = st.query("PREFIX : <http://e/> SELECT ?s ?va ?vc WHERE { ?s :a ?va ; :b ?vb ; :c ?vc }")
    rows = sorted((r["s"]["lex"], r["va"]["lex"], r["vc"]["lex"]) for r in df.collect())
    assert rows == [
        ("http://e/x", "1", "3"),
        ("http://e/x", "1", "4"),
        ("http://e/y", "5", "7"),
    ]


def test_describe_cutoff_limits(spark):
    """CBD cutoff (CBD.java:299-312): expansion aborts iff BOTH the
    iteration limit AND the statement limit are exceeded; 0 = no limit
    (QueryHints.DESCRIBE_ITERATION_LIMIT/DESCRIBE_STATEMENT_LIMIT)."""
    import pytest as _pytest

    from bigdata_old_spark.store import TripleStore

    # :r -> _:b1 -> _:b2 -> ... -> _:b8 (deep bnode chain; CBD needs 8
    # expansion rounds beyond the root)
    ttl = "@prefix : <http://ex/> .\n:r :p _:b1 .\n" + "\n".join(
        f"_:b{i} :p _:b{i + 1} ." for i in range(1, 8)
    ) + "\n_:b8 :p :leaf ."
    st = TripleStore.from_turtle(spark, ttl)
    P = "PREFIX hint: <http://www.bigdata.com/queryHints#>\nPREFIX : <http://ex/>\n"

    # both limits exceeded -> cutoff error (reference throws QueryEvaluationException)
    with _pytest.raises(RuntimeError, match="CBD cutoff"):
        st.query(P + """DESCRIBE :r WHERE {
            hint:Query hint:describeMode "CBD" .
            hint:Query hint:describeIterationLimit 2 .
            hint:Query hint:describeStatementLimit 1 .
            :r :p ?o . }""").collect()

    # rounds exceeded but statements under the limit -> completes fully
    full = st.query(P + """DESCRIBE :r WHERE {
        hint:Query hint:describeMode "CBD" .
        hint:Query hint:describeIterationLimit 2 .
        hint:Query hint:describeStatementLimit 5000 .
        :r :p ?o . }""")
    assert full.count() == 9  # whole chain

    # 0 disables a limit (ZERO implies MAX_INT, CBD.java:302-306)
    unl = st.query(P + """DESCRIBE :r WHERE {
        hint:Query hint:describeMode "CBD" .
        hint:Query hint:describeIterationLimit 0 .
        hint:Query hint:describeStatementLimit 1 .
        :r :p ?o . }""")
    assert unl.count() == 9


def test_rto_runtime_optimizer(spark, small_store):
    """hint:optimizer "Runtime" routes ≥3-pattern BGPs through the
    cutoff-sampling RTO (JGraph/SampleIndex analog) and returns the
    same solutions as the static optimizer."""
    from bigdata_old_spark.compiler import QueryCompiler

    P = ("PREFIX hint: <http://www.bigdata.com/queryHints#>\n"
         "PREFIX foaf: <http://xmlns.com/foaf/0.1/>\n"
         "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>\n")
    # a CHAIN (distinct subjects) so the BGP reaches the join orderer
    # rather than the SPOStarJoin fast path
    body = """SELECT ?x ?name WHERE {
        %s
        ?x foaf:knows ?y .
        ?y foaf:knows ?z .
        ?z rdfs:label ?name . }"""
    static = {tuple(r) for r in small_store.query(P + body % "").collect()}

    calls = []
    orig = QueryCompiler._join_units_rto

    def spy(self, units, triples):
        calls.append(len(units))
        return orig(self, units, triples)

    QueryCompiler._join_units_rto = spy
    try:
        rto_q = P + body % (
            'hint:Group hint:optimizer "Runtime" . '
            'hint:Group hint:RTO-limit "2" . '  # saturated samples too
            'hint:Group hint:RTO-sampleType "DENSE" .'
        )
        got = {tuple(r) for r in small_store.query(rto_q).collect()}
    finally:
        QueryCompiler._join_units_rto = orig
    assert calls == [3]
    assert got == static and len(got) > 0
