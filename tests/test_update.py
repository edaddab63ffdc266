"""SPARQL UPDATE ops (AST2BOpUpdate analog)."""

from pyspark.sql import functions as F

from bigdata_old_spark.store import TripleStore

P = """
PREFIX : <http://example.org/>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
"""
EX = "http://example.org/"


def fresh(spark):
    return TripleStore.from_turtle(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :a rdfs:label "A" . :b rdfs:label "B" . :a :linked :b .""",
    )


def test_insert_data(spark):
    st = fresh(spark).update(P + 'INSERT DATA { :c rdfs:label "C" . :c :linked :a }')
    assert st.statements.count() == 5
    assert st.query(P + 'ASK { :c rdfs:label "C" }').collect()[0]["ask"]


def test_delete_data(spark):
    st = fresh(spark).update(P + 'DELETE DATA { :a rdfs:label "A" }')
    assert st.statements.count() == 2
    assert not st.query(P + 'ASK { :a rdfs:label "A" }').collect()[0]["ask"]


def test_delete_insert_where(spark):
    st = fresh(spark).update(P + """
        DELETE { ?x rdfs:label ?l }
        INSERT { ?x rdfs:label "renamed" }
        WHERE { ?x rdfs:label ?l . FILTER(?l = "A") }""")
    labels = sorted(
        r["o_lex"] for r in st.statements.where(F.col("p") == "http://www.w3.org/2000/01/rdf-schema#label").collect()
    )
    assert labels == ["B", "renamed"]


def test_delete_where_shorthand(spark):
    st = fresh(spark).update(P + "DELETE WHERE { ?x rdfs:label ?l }")
    assert st.statements.count() == 1  # only :a :linked :b survives


def test_insert_into_graph_and_clear(spark):
    st = fresh(spark).update(P + "INSERT DATA { GRAPH :g1 { :x :p :y } }")
    assert st.statements.where(F.col("g") == EX + "g1").count() == 1
    st2 = st.update(P + "CLEAR GRAPH :g1")
    assert st2.statements.where(F.col("g").isNotNull()).count() == 0
    st3 = st.update("CLEAR DEFAULT")
    assert st3.statements.count() == 1  # only the named-graph triple


def test_graph_query_after_insert(spark):
    st = fresh(spark).update(P + "INSERT DATA { GRAPH :g1 { :x :p :y } GRAPH :g2 { :x :p :z } }")
    df = st.query(P + "SELECT ?g ?o WHERE { GRAPH ?g { :x :p ?o } }")
    got = sorted((r["g"]["lex"], r["o"]["lex"]) for r in df.collect())
    assert got == [(EX + "g1", EX + "y"), (EX + "g2", EX + "z")]


def test_copy_move_add(spark):
    st = fresh(spark).update(P + "INSERT DATA { GRAPH :g1 { :x :p :y } }")
    st2 = st.update(P + "COPY :g1 TO :g2")
    assert st2.statements.where(F.col("g") == EX + "g2").count() == 1
    assert st2.statements.where(F.col("g") == EX + "g1").count() == 1
    st3 = st.update(P + "MOVE :g1 TO :g3")
    assert st3.statements.where(F.col("g") == EX + "g1").count() == 0
    assert st3.statements.where(F.col("g") == EX + "g3").count() == 1


def test_update_preserves_session_state(spark):
    # advisor r3: UPDATE ops must not drop named solution sets /
    # union_default_graph / the SID map (store.with_statements carry)
    st = fresh(spark)
    st.put_solution_set("pre", st.query(P + "SELECT ?s WHERE { ?s :linked :b }"))
    st.union_default_graph = False
    st2 = st.update(P + 'INSERT DATA { :c rdfs:label "C" } ; DELETE DATA { :b rdfs:label "B" }')
    assert st2.union_default_graph is False
    df = st2.query(P + "SELECT ?s WHERE { INCLUDE %pre }")
    assert [r["s"]["lex"] for r in df.collect()] == ["http://example.org/a"]


def test_update_preserves_sid_map(spark):
    st = fresh(spark).to_sids()
    assert st.sid_map is not None
    st2 = st.update(P + 'INSERT DATA { :c rdfs:label "C" }')
    assert st2.sid_map is not None
