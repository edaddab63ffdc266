"""SPARQL semantics corner cases, mirroring the reference's data-driven
fixture corpus (aggregate-*.rq mixed-type groups, TestUnionMinus,
TestOptionals — AbstractDataDrivenSPARQLTestCase style)."""

import pytest

from bigdata_old_spark.store import TripleStore

P = """
PREFIX : <http://example.org/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
"""
EX = "http://example.org/"

# FIXTURES.md §3: mixed numeric datatypes + strings + dateTime under :p
AGG_TTL = """
@prefix : <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
:s1 :p "1"^^xsd:int , "2"^^xsd:integer , "3.5"^^xsd:decimal .
:s2 :p "2.0"^^xsd:double , "x" .
:s3 :p "2024-01-01T00:00:00"^^xsd:dateTime .
:s1 :q 5 . :s2 :q 7 .
"""


@pytest.fixture(scope="module")
def agg_store(spark):
    return TripleStore.from_turtle(spark, AGG_TTL).persist()


def one(df, col):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0][col]


def test_max_numeric_promotion(agg_store):
    # aggregate-max fixture: MAX over mixed numerics picks 3.5 (decimal)
    v = one(agg_store.query(P + "SELECT (MAX(?o) AS ?m) WHERE { :s1 :p ?o }"), "m")
    assert v["lex"] == "3.5" and float(v["dbl"]) == 3.5


def test_min_cross_datatype(agg_store):
    v = one(agg_store.query(P + "SELECT (MIN(?o) AS ?m) WHERE { :s1 :p ?o }"), "m")
    assert float(v["dbl"]) == 1.0


def test_sum_sticky_type_error(agg_store):
    # SUM.java:53 — a non-numeric in the group poisons the aggregate
    v = one(agg_store.query(P + "SELECT (SUM(?o) AS ?m) WHERE { :s2 :p ?o }"), "m")
    assert v is None
    # …but the clean subject sums fine, promoted to decimal
    v2 = one(agg_store.query(P + "SELECT (SUM(?o) AS ?m) WHERE { :s1 :p ?o }"), "m")
    assert float(v2["num"]) == 6.5 and v2["dt"].endswith("decimal")


def test_avg_and_integer_division(agg_store):
    v = one(agg_store.query(P + "SELECT (AVG(?o) AS ?m) WHERE { ?s :q ?o }"), "m")
    assert float(v["num"]) == 6.0
    # SPARQL: integer / integer → decimal
    v2 = one(agg_store.query(P + "SELECT (?a / ?b AS ?r) WHERE { :s1 :q ?a . :s2 :q ?b }"), "r")
    assert v2["dt"].endswith("decimal")
    assert abs(float(v2["dbl"]) - 5 / 7) < 1e-6


def test_count_distinct_terms(agg_store):
    # 1^^int, 2^^integer, 3.5^^decimal → 3 distinct terms for :s1
    v = one(agg_store.query(P + "SELECT (COUNT(DISTINCT ?o) AS ?n) WHERE { :s1 :p ?o }"), "n")
    assert v["lex"] == "3"


def test_value_equality_across_datatypes(agg_store):
    # FILTER(?o = 2.0) matches 2^^xsd:integer AND 2.0^^xsd:double
    df = agg_store.query(P + "SELECT ?s WHERE { ?s :p ?o . FILTER(?o = 2.0) }")
    assert sorted(r["s"]["lex"] for r in df.collect()) == [EX + "s1", EX + "s2"]
    # …but a pattern constant is TERM match: "2.0"^^xsd:double only matches :s2
    df2 = agg_store.query(P + 'SELECT ?s WHERE { ?s :p "2.0"^^xsd:double }')
    assert [r["s"]["lex"] for r in df2.collect()] == [EX + "s2"]


def test_type_error_filter_drops_row(agg_store):
    # ?o < 3 over a group containing a string: error rows are dropped,
    # not errored-out (SPARQLConstraint error→false)
    df = agg_store.query(P + "SELECT ?o WHERE { :s2 :p ?o . FILTER(?o < 3) }")
    assert [r["o"]["lex"] for r in df.collect()] == ["2.0"]


def test_minus_disjoint_domains(agg_store):
    # MINUS with no shared variables removes nothing (spec §8.3.3)
    df = agg_store.query(P + "SELECT ?s WHERE { ?s :q ?o MINUS { ?x :p ?y } }")
    assert df.count() == 2
    # NOT EXISTS with the same (uncorrelated) pattern removes everything
    df2 = agg_store.query(P + "SELECT ?s WHERE { ?s :q ?o FILTER NOT EXISTS { ?x :p ?y } }")
    assert df2.count() == 0


def test_optional_filter_references_outer_var(agg_store):
    # the LeftJoin(condition) case — filter uses vars from both sides
    df = agg_store.query(P + """
        SELECT ?s ?o2 WHERE {
          ?s :q ?o .
          OPTIONAL { ?s :p ?o2 . FILTER(?o2 > ?o) }
        }""")
    got = {(r["s"]["lex"], r["o2"]["lex"] if r["o2"] else None) for r in df.collect()}
    # :s1 q 5 — no p value > 5 → unbound; :s2 q 7 — none → unbound
    assert got == {(EX + "s1", None), (EX + "s2", None)}


def test_order_by_type_groups(agg_store):
    # Sesame ValueComparator (IVComparator delegate): plain/lang-tagged
    # strings sort FIRST, then numerics by value, then dateTimes
    df = agg_store.query(P + "SELECT ?o WHERE { ?s :p ?o } ORDER BY ?o")
    kinds = [r["o"]["dt"].rsplit("#", 1)[-1] for r in df.collect()]
    num_idx = [i for i, k in enumerate(kinds) if k in ("int", "integer", "decimal", "double")]
    assert kinds.index("string") < min(num_idx)
    assert kinds.index("dateTime") > max(num_idx)


def test_coalesce_and_if_error_recovery(agg_store):
    # COALESCE recovers from the type error that IF/comparison produce
    df = agg_store.query(P + """
        SELECT ?o (COALESCE(?o + 1, "err") AS ?r) WHERE { :s2 :p ?o } ORDER BY ?o""")
    got = [(r["o"]["lex"], r["r"]["lex"]) for r in df.collect()]
    assert ("x", "err") in got and ("2.0", "3.0") in got


def test_langmatches_and_lang(spark):
    st = TripleStore.from_turtle(spark, """
        @prefix : <http://example.org/> .
        :a :label "colour"@en-GB . :b :label "color"@en . :c :label "couleur"@fr . :d :label "plain" .
    """)
    df = st.query(P + 'SELECT ?s WHERE { ?s :label ?l . FILTER(LANGMATCHES(LANG(?l), "en")) }')
    assert sorted(r["s"]["lex"] for r in df.collect()) == [EX + "a", EX + "b"]
    df2 = st.query(P + 'SELECT ?s WHERE { ?s :label ?l . FILTER(LANG(?l) = "") }')
    assert [r["s"]["lex"] for r in df2.collect()] == [EX + "d"]


def test_union_unbound_columns(agg_store):
    df = agg_store.query(P + """
        SELECT ?a ?b WHERE { { :s1 :q ?a } UNION { :s2 :q ?b } }""")
    got = {(r["a"]["lex"] if r["a"] else None, r["b"]["lex"] if r["b"] else None) for r in df.collect()}
    assert got == {("5", None), (None, "7")}


def test_bottom_up_nested_optional(spark):
    """The ASTBottomUpOptimizer poster child (badly-designed left join):
    nested OPTIONAL sharing ?v with the outer pattern but not with its
    own group.  Bottom-up: inner LeftJoin yields {w=3, v=2}; outer ?v=1
    is incompatible → keep left-only {v=1, w unbound}.  The certain-var
    tracking (maybe-unbound compat join) gives this without a rewrite."""
    st = TripleStore.from_turtle(spark, """
        @prefix : <http://example.org/> .
        :x1 :p 1 . :x2 :p 2 . :x3 :q 3 .
    """)
    df = st.query(P + """
        SELECT ?v ?w WHERE {
          :x1 :p ?v .
          OPTIONAL { :x3 :q ?w . OPTIONAL { :x2 :p ?v } }
        }""")
    rows = [(r["v"]["lex"] if r["v"] else None, r["w"]["lex"] if r["w"] else None) for r in df.collect()]
    assert rows == [("1", None)]


def test_aggregate_inside_expression(agg_store):
    # aggregates composed in projection expressions (GroupByRewriter case)
    v = one(agg_store.query(P + """
        SELECT (SUM(?o) / COUNT(?o) AS ?mean) WHERE { ?s :q ?o }"""), "mean")
    assert float(v["dbl"]) == 6.0


def test_parse_error_message(agg_store):
    from bigdata_old_spark.parser import ParseError

    try:
        agg_store.query("SELECT ?x WHERE { ?x ?y }")
        assert False, "should have raised"
    except ParseError as e:
        assert "incomplete triple pattern" in str(e)


def test_sameterm_vs_equals(agg_store):
    # 2^^integer = 2.0^^double (value) but not sameTerm
    df = agg_store.query(P + """
        SELECT ?x ?y WHERE { :s1 :p ?x . :s2 :p ?y .
          FILTER(?x = ?y) FILTER(!SAMETERM(?x, ?y)) }""")
    rows = [(r["x"]["lex"], r["y"]["lex"]) for r in df.collect()]
    assert rows == [("2", "2.0")]


def test_xsd_integer_truncates_toward_zero(spark):
    """XPath casting rule: xsd:integer(3.7) = 3, xsd:integer(-3.7) = -3
    (not HALF_UP rounding)."""
    from bigdata_old_spark.store import TripleStore

    st = TripleStore.from_turtle(spark, """
        @prefix : <http://ex/> .
        :a :v 3.7 . :b :v -3.7 . :c :v 2.5 .
    """)
    df = st.query("""
        PREFIX : <http://ex/>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?s (xsd:integer(?v) AS ?i) WHERE { ?s :v ?v }""")
    got = {r["s"]["lex"]: r["i"]["lex"] for r in df.collect()}
    assert got == {"http://ex/a": "3", "http://ex/b": "-3", "http://ex/c": "2"}


def test_sum_poisons_on_non_numeric(spark):
    """SUM over a group containing a bound non-numeric literal goes
    unbound (sticky error, SUM.java:53) — on both the dynamic path
    (plain var) and the static fast path (typed constructor whose
    input rides through).  A failed CAST yields an expression error
    (NULL term), which this engine treats as an absent value in
    aggregates — consistently on both paths."""
    from bigdata_old_spark.store import TripleStore

    st = TripleStore.from_turtle(spark, """
        @prefix : <http://ex/> .
        :g1 :v 1.0 . :g1x :v 2.0 .
        :bad :w 1.0 . :badx :w "oops" .
    """)
    ok = st.query("""
        PREFIX : <http://ex/>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT (SUM(xsd:decimal(?v)) AS ?t) WHERE { ?s :v ?v }""").collect()
    assert ok[0]["t"] is not None and float(ok[0]["t"]["lex"]) == 3.0
    # dynamic path: bound non-numeric poisons
    bad = st.query("""
        PREFIX : <http://ex/>
        SELECT (SUM(?w) AS ?t) WHERE { ?s :w ?w }""").collect()
    assert bad[0]["t"] is None
    # static path: cast failure = expression error = NULL term → the row
    # is absent from the aggregate, same as the dynamic path would do
    skipped = st.query("""
        PREFIX : <http://ex/>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT (SUM(xsd:decimal(?w)) AS ?t) WHERE { ?s :w ?w }""").collect()
    assert skipped[0]["t"] is not None and float(skipped[0]["t"]["lex"]) == 1.0


# -- DISTINCT aggregates dedup on TERM identity (VERDICT r02 item 2) ---------

DISTINCT_TTL = """
@prefix : <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
:s1 :v "1"^^xsd:integer , "01"^^xsd:integer , "1.0"^^xsd:decimal .
:s2 :w "a"@en , "a"@fr , "a" .
"""


@pytest.fixture(scope="module")
def distinct_store(spark):
    return TripleStore.from_turtle(spark, DISTINCT_TTL).persist()


def test_sum_distinct_term_identity(distinct_store):
    # three DISTINCT terms with values 1, 1, 1.0 → SUM = 3 (not 1)
    v = one(distinct_store.query(P + "SELECT (SUM(DISTINCT ?o) AS ?m) WHERE { :s1 :v ?o }"), "m")
    assert float(v["num"]) == 3.0


def test_avg_distinct_term_identity(distinct_store):
    v = one(distinct_store.query(P + "SELECT (AVG(DISTINCT ?o) AS ?m) WHERE { :s1 :v ?o }"), "m")
    assert float(v["num"]) == 1.0


def test_group_concat_distinct_term_identity(distinct_store):
    # "a"@en, "a"@fr, "a" are three distinct terms → three concat items
    v = one(
        distinct_store.query(
            P + 'SELECT (GROUP_CONCAT(DISTINCT ?o; SEPARATOR="|") AS ?m) WHERE { :s2 :w ?o }'
        ),
        "m",
    )
    assert v["lex"] == "a|a|a"


def test_sum_distinct_dedups_true_duplicates(distinct_store):
    # the same term twice in different rows still counts once
    st = TripleStore.from_turtle(
        distinct_store.spark,
        "@prefix : <http://example.org/> . :a :p 5 . :b :p 5 . :c :p 7 .",
    )
    v = one(st.query(P + "SELECT (SUM(DISTINCT ?o) AS ?m) WHERE { ?s :p ?o }"), "m")
    assert float(v["num"]) == 12.0


def test_exists_correlated_filter_under_noncorrelated(spark):
    # advisor r3: a correlated filter nested BENEATH a non-correlated
    # one must still fold into the join condition (peel the whole
    # FilterPat chain, then partition) — sparql11-exists-06 variant
    st = TripleStore.from_turtle(
        spark,
        """@prefix : <http://example.org/> .
           :a :m 1 . :b :m 2 .
           :x :n 1 . :x :k 5 . :y :n 9 . :y :k 5 .""",
    )
    df = st.query(P + """
        SELECT ?s WHERE {
          ?s :m ?m
          FILTER EXISTS { ?t :n ?n ; :k ?k FILTER(?k > 1) FILTER(?n = ?m) }
        }""")
    assert sorted(r["s"]["lex"] for r in df.collect()) == ["http://example.org/a"]


def test_datetime_offset_literal_utc_normalized(spark):
    # advisor r3: session TZ pinned to UTC → an offset literal is the
    # right instant and STR/comparison are timezone-independent
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    st = TripleStore.from_turtle(
        spark,
        """@prefix : <http://example.org/> .
           @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
           :e :at "2020-01-01T05:00:00+05:00"^^xsd:dateTime .
           :f :at "2020-01-01T00:00:00Z"^^xsd:dateTime .""",
    )
    # both literals denote the same instant → equality holds
    df = st.query(P + "SELECT ?a ?b WHERE { :e :at ?a . :f :at ?b FILTER(?a = ?b) }")
    assert df.count() == 1
