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
    assert rows[EX + "d3"] == 1.0


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
