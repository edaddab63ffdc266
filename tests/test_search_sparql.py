"""bds: magic-predicate full-text search inside SPARQL queries
(ASTSearchOptimizer → SearchServiceFactory parity)."""

import pytest

from bigdata_old_spark.store import TripleStore

P = """
PREFIX : <http://example.org/>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
PREFIX bds: <http://www.bigdata.com/rdf/search#>
"""
EX = "http://example.org/"


@pytest.fixture(scope="module")
def doc_store(spark):
    return TripleStore.from_turtle(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :d1 rdfs:label "the quick brown fox" .
           :d2 rdfs:label "the lazy dog sleeps" .
           :d3 rdfs:label "quick quick dog" .
           :d4 rdfs:comment "nothing to see" .""",
    ).persist()


def test_bds_search_join(doc_store):
    df = doc_store.query(P + """
        SELECT ?s ?lit ?score WHERE {
          ?lit bds:search "quick dog" .
          ?lit bds:relevance ?score .
          ?s rdfs:label ?lit .
        }""")
    rows = {r["s"]["lex"]: r["score"]["dbl"] for r in df.collect()}
    assert set(rows) == {EX + "d1", EX + "d2", EX + "d3"}
    # reference-parity cosine (see test_inference_search_gas): 0.92807765
    assert abs(rows[EX + "d3"] - 0.9280776503073411) < 1e-9


def test_bds_match_all_and_rank(doc_store):
    df = doc_store.query(P + """
        SELECT ?s WHERE {
          ?lit bds:search "quick dog" .
          ?lit bds:matchAllTerms "true" .
          ?s rdfs:label ?lit .
        }""")
    assert [r["s"]["lex"] for r in df.collect()] == [EX + "d3"]
    df2 = doc_store.query(P + """
        SELECT ?lit ?r WHERE {
          ?lit bds:search "quick dog" .
          ?lit bds:rank ?r .
          ?lit bds:maxRank "1" .
        }""")
    rows = df2.collect()
    assert len(rows) == 1 and rows[0]["r"]["lex"] == "1"


def test_bds_min_rank_paging(doc_store):
    """minRank+maxRank page through ranked results (BDS.java:161)."""
    all_lits = [r["lit"]["lex"] for r in doc_store.query(P + """
        SELECT ?lit ?r WHERE {
          ?lit bds:search "quick dog" . ?lit bds:rank ?r .
        } ORDER BY ?r""").collect()]
    page2 = [r["lit"]["lex"] for r in doc_store.query(P + """
        SELECT ?lit ?r WHERE {
          ?lit bds:search "quick dog" .
          ?lit bds:rank ?r .
          ?lit bds:minRank "2" . ?lit bds:maxRank "3" .
        } ORDER BY ?r""").collect()]
    assert page2 == all_lits[1:3]


def test_bds_max_relevance(doc_store):
    df = doc_store.query(P + """
        SELECT ?lit ?score WHERE {
          ?lit bds:search "quick dog" .
          ?lit bds:relevance ?score .
          ?lit bds:maxRelevance "0.9" .
        }""")
    assert all(r["score"]["dbl"] <= 0.9 for r in df.collect())
    assert len(df.collect()) >= 1


def test_bds_match_exact(doc_store):
    """matchExact: the literal must contain the query string verbatim."""
    df = doc_store.query(P + """
        SELECT ?lit WHERE {
          ?lit bds:search "quick dog" .
          ?lit bds:matchExact "true" .
        }""")
    assert [r["lit"]["lex"] for r in df.collect()] == ["quick quick dog"]


def test_bds_match_regex(doc_store):
    df = doc_store.query(P + """
        SELECT ?lit WHERE {
          ?lit bds:search "quick dog" .
          ?lit bds:matchRegex "^the .*(fox|dog)" .
        }""")
    assert sorted(r["lit"]["lex"] for r in df.collect()) == [
        "the lazy dog sleeps", "the quick brown fox"]


def test_bds_subject_search(doc_store):
    """subjectSearch binds matching SUBJECTS (subject-centric index)."""
    df = doc_store.query(P + """
        SELECT ?s ?score ?r WHERE {
          ?s bds:search "quick dog" .
          ?s bds:subjectSearch "true" .
          ?s bds:relevance ?score .
          ?s bds:rank ?r .
        }""")
    rows = {r["s"]["lex"]: (r["score"]["dbl"], int(r["r"]["lex"])) for r in df.collect()}
    assert set(rows) == {EX + "d1", EX + "d2", EX + "d3"}
    # reference-parity cosine (see test_inference_search_gas): 0.92807765
    assert abs(rows[EX + "d3"][0] - 0.9280776503073411) < 1e-9 and rows[EX + "d3"][1] == 1


def test_bds_search_in_search(doc_store):
    """searchInSearch restricts ?s to subjects linking a matched literal."""
    df = doc_store.query(P + """
        SELECT ?s ?lit WHERE {
          ?s bds:searchInSearch "lazy" .
          ?s rdfs:label ?lit .
        }""")
    rows = [(r["s"]["lex"], r["lit"]["lex"]) for r in df.collect()]
    assert rows == [(EX + "d2", "the lazy dog sleeps")]


def test_bds_range_count(doc_store):
    """rangeCount binds the number of hits instead of the hits."""
    df = doc_store.query(P + """
        SELECT ?c WHERE {
          ?lit bds:search "quick dog" .
          ?lit bds:rangeCount ?c .
        }""")
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["c"]["lex"] == "3"


def test_bds_wildcard_prefix(doc_store):
    """A trailing wildcard turns on prefix matching (BDS.java:324)."""
    df = doc_store.query(P + """
        SELECT ?lit WHERE { ?lit bds:search "qui*" . }""")
    assert sorted(r["lit"]["lex"] for r in df.collect()) == [
        "quick quick dog", "the quick brown fox"]


def test_bds_search_timeout_accepted(doc_store):
    df = doc_store.query(P + """
        SELECT ?lit WHERE {
          ?lit bds:search "lazy" .
          ?lit bds:searchTimeout "5000" .
        }""")
    assert [r["lit"]["lex"] for r in df.collect()] == ["the lazy dog sleeps"]


def test_incremental_text_index_matches_rebuild(spark):
    """InsertData/DeleteData delta-maintain a built index; the result
    must equal a from-scratch build (VERDICT r02 item 7)."""
    from bigdata_old_spark.search import build_text_index
    from bigdata_old_spark.store import TripleStore

    P = "PREFIX : <http://example.org/>\n"
    st = TripleStore.from_turtle(spark, """
    @prefix : <http://example.org/> .
    :d1 :text "alpha beta gamma" .
    :d2 :text "beta delta" .
    :d3 :label "gamma gamma epsilon" .
    """)
    st.text_index()  # build eagerly so updates must delta-maintain

    st2 = st.update(P + 'INSERT DATA { :d4 :text "zeta beta" . :d1 :note "alpha" }')
    st3 = st2.update(P + 'DELETE DATA { :d2 :text "beta delta" }')

    # the maintained index was carried (not rebuilt lazily)
    assert st3._text_index is not None
    maintained = {
        tuple(r) for r in st3._text_index.df.select(
            "token", "s", "p", "o_lex", "tf").collect()
    }
    scratch_ti = build_text_index(st3.statements)
    scratch = {
        tuple(r) for r in scratch_ti.df.select(
            "token", "s", "p", "o_lex", "tf").collect()
    }
    assert maintained == scratch
    assert st3._text_index.n_docs == scratch_ti.n_docs
    assert st3._text_index.n_subjects == scratch_ti.n_subjects

    # and search works over the maintained index
    hits = st3.query(P + """
        PREFIX bds: <http://www.bigdata.com/rdf/search#>
        SELECT ?o WHERE { ?o bds:search "beta" }
    """).collect()
    assert {r["o"]["lex"] for r in hits} == {"alpha beta gamma", "zeta beta"}


def test_incremental_text_index_unpersists_old_generation(spark):
    # advisor r3: superseded index generations must not pin executor
    # storage across a long UPDATE sequence
    from pyspark.storagelevel import StorageLevel
    from bigdata_old_spark.store import TripleStore

    P = "PREFIX : <http://example.org/>\n"
    st = TripleStore.from_turtle(
        spark, '@prefix : <http://example.org/> . :d1 :text "alpha beta" .'
    )
    st.text_index()
    old_df = st._text_index.df
    assert old_df.storageLevel != StorageLevel.NONE
    st2 = st.update(P + 'INSERT DATA { :d2 :text "gamma" }')
    assert st2._text_index.df.storageLevel != StorageLevel.NONE
    assert old_df.storageLevel == StorageLevel.NONE


def test_search_respects_virtual_graph_dataset(spark):
    """FROM VIRTUAL GRAPH scoping reaches the text index: literals in
    non-member graphs are invisible to bds:search."""
    from bigdata_old_spark.store import TripleStore

    from bigdata_old_spark.model import Term

    BD = "http://www.bigdata.com/rdf#"
    rows = [
        (None, EX + "vg", BD + "virtualGraph", Term.iri(EX + "gA")),
        (EX + "gA", EX + "d1", "http://www.w3.org/2000/01/rdf-schema#label", "quick fox"),
        (EX + "gB", EX + "d2", "http://www.w3.org/2000/01/rdf-schema#label", "quick dog"),
    ]
    st = TripleStore.from_rows(spark, rows)
    df = st.query(P + f"""
        SELECT ?lit FROM VIRTUAL GRAPH <{EX}vg> WHERE {{
          ?lit bds:search "quick" .
        }}""")
    assert [r["lit"]["lex"] for r in df.collect()] == ["quick fox"]
