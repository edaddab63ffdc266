"""FROM / FROM NAMED dataset clauses (DataSetJoin analog)."""

import pytest

from bigdata_old_spark.store import TripleStore

P = "PREFIX : <http://example.org/>\n"
EX = "http://example.org/"


@pytest.fixture(scope="module")
def quad_store(spark):
    st = TripleStore.from_turtle(spark, "@prefix : <http://example.org/> . :d :p :v0 .")
    return st.update(P + """
        INSERT DATA {
          GRAPH :g1 { :a :p :v1 }
          GRAPH :g2 { :b :p :v2 }
          GRAPH :g3 { :c :p :v3 }
        }""")


def lex(df, col):
    return sorted(r[col]["lex"] for r in df.collect())


def test_from_merges_named_into_default(quad_store):
    df = quad_store.query(P + "SELECT ?s FROM :g1 FROM :g2 WHERE { ?s :p ?o }")
    assert lex(df, "s") == [EX + "a", EX + "b"]


def test_default_graph_without_from_union(quad_store):
    # reference quads-mode default: no dataset → RDF merge of ALL graphs
    df = quad_store.query(P + "SELECT ?s WHERE { ?s :p ?o }")
    assert lex(df, "s") == [EX + "a", EX + "b", EX + "c", EX + "d"]


def test_default_graph_without_from_strict(quad_store):
    # strict SPARQL dataset semantics behind the flag
    strict = quad_store.with_statements(quad_store.statements)
    strict.union_default_graph = False
    df = strict.query(P + "SELECT ?s WHERE { ?s :p ?o }")
    assert lex(df, "s") == [EX + "d"]


def test_union_default_graph_merge_dedups(spark):
    # the same triple in two graphs binds once (RDF merge = set union)
    st = TripleStore.from_turtle(spark, "@prefix : <http://example.org/> . :x :p :v .")
    st = st.update(P + "INSERT DATA { GRAPH :g1 { :x :p :v } GRAPH :g2 { :x :p :v } }")
    df = st.query(P + "SELECT ?s WHERE { ?s :p :v }")
    assert lex(df, "s") == [EX + "x"]


def test_from_named_restricts_graph_var(quad_store):
    df = quad_store.query(P + """
        SELECT ?g FROM NAMED :g1 FROM NAMED :g3 WHERE { GRAPH ?g { ?s :p ?o } }""")
    assert lex(df, "g") == [EX + "g1", EX + "g3"]


def test_from_named_excludes_unlisted_constant(quad_store):
    df = quad_store.query(P + """
        SELECT ?s FROM NAMED :g1 WHERE { GRAPH :g2 { ?s :p ?o } }""")
    assert df.count() == 0


# ---------------------------------------------------------------------------
# Bucketed serving layout (cluster-scale subject joins)
# ---------------------------------------------------------------------------

def test_bucketed_store_subject_join_no_exchange(spark):
    """write_bucketed (partition by p, bucket+sort by s) must let a
    two-pattern subject join plan WITHOUT any shuffle exchange."""
    import contextlib
    import io

    from bigdata_old_spark.store import TripleStore

    rows = (
        [(None, f"http://ex/s{i}", "http://ex/p1", i) for i in range(50)]
        + [(None, f"http://ex/s{i}", "http://ex/p2", f"n{i}") for i in range(50)]
    )
    st = TripleStore.from_rows(spark, rows)
    st.write_bucketed("bdos_test_bucketed", buckets=4)
    try:
        st2 = TripleStore.from_table(spark, "bdos_test_bucketed")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = st2.query(
                "SELECT ?a ?b WHERE { ?s <http://ex/p1> ?a ; <http://ex/p2> ?b }"
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            assert "Exchange" not in plan, plan
            assert df.count() == 50
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bdos_test_bucketed")


# -- GRAPH {} empty-BGP fast path honors dataset rules (advisor r3) ------

def test_graph_var_empty_bgp_from_only(quad_store):
    # FROM without FROM NAMED: the named-graph set is EMPTY, so
    # GRAPH ?g {} binds nothing (mirrors _scan's rule)
    df = quad_store.query(P + "SELECT ?g FROM :g1 WHERE { GRAPH ?g {} }")
    assert df.count() == 0


def test_graph_var_empty_bgp_from_named(quad_store):
    df = quad_store.query(P + "SELECT ?g FROM NAMED :g1 FROM NAMED :g2 WHERE { GRAPH ?g {} }")
    assert lex(df, "g") == [EX + "g1", EX + "g2"]


def test_graph_const_empty_bgp_from_only(quad_store):
    # nonempty-graph test for a graph outside the (empty) named set
    df = quad_store.query(P + "SELECT * FROM :g1 WHERE { GRAPH :g2 {} }")
    assert df.count() == 0


@pytest.fixture(scope="module")
def vg_store(quad_store):
    # virtual graph :vg with members :g1 and :g3
    return quad_store.update(P + """
        PREFIX bd: <http://www.bigdata.com/rdf#>
        INSERT DATA { :vg bd:virtualGraph :g1 . :vg bd:virtualGraph :g3 }""")


def test_graph_var_empty_bgp_virtual_named(vg_store):
    df = vg_store.query(P + "SELECT ?g FROM NAMED VIRTUAL GRAPH :vg WHERE { GRAPH ?g {} }")
    assert lex(df, "g") == [EX + "g1", EX + "g3"]


def test_graph_const_empty_bgp_virtual_named(vg_store):
    hit = vg_store.query(P + "SELECT * FROM NAMED VIRTUAL GRAPH :vg WHERE { GRAPH :g1 {} }")
    assert hit.count() == 1
    miss = vg_store.query(P + "SELECT * FROM NAMED VIRTUAL GRAPH :vg WHERE { GRAPH :g2 {} }")
    assert miss.count() == 0
