import pytest

from bigdata_old_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bigdata-old-spark-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


SMALL_GRAPH_TTL = """
@prefix : <http://example.org/> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .

:Mike a foaf:Person ; rdfs:label "Mike" ; foaf:knows :Bryan .
:Bryan a foaf:Person ; rdfs:label "Bryan" ; foaf:knows :Mike, :Martyn .
:Martyn a foaf:Person ; foaf:knows :Bryan .
:DC rdfs:label "DC" .
"""


@pytest.fixture(scope="session")
def small_store(spark):
    from bigdata_old_spark.store import TripleStore

    return TripleStore.from_turtle(spark, SMALL_GRAPH_TTL).persist()
