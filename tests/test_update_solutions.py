"""Named-solution-set UPDATE extension — the reference's
INSERT INTO %set / DELETE FROM %set SELECT and CREATE/DROP/CLEAR
SOLUTIONS ops (BigdataSPARQLUpdateTest2.java, ISolutionSetManager).

Ports the data-driven tests verbatim: same dataset-01.trig, same update
requests, same vendored .srx expected results
(bigdata-sails/src/test/com/bigdata/rdf/sail/tck/data/)."""

from __future__ import annotations

import os

import pytest

from tests.fixture_utils import canon_model_term, canon_row_value, rows_equal

DATA = "/root/reference/bigdata-sails/src/test/com/bigdata/rdf/sail/tck/data"

P = """
PREFIX rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
"""

INSERT_PERSONS = P + """
INSERT INTO %namedSet1
SELECT ?x ?name
WHERE { SELECT ?x ?name
WHERE {
  ?x rdf:type foaf:Person .
  ?x rdfs:label ?name .
}
ORDER BY ?name
}
"""


def _store(spark):
    from bigdata_old_spark.store import TripleStore

    with open(os.path.join(DATA, "dataset-01.trig")) as f:
        st = TripleStore.from_trig(spark, f.read())
    st.union_default_graph = True
    return st


def _rows(df):
    return [
        {c: canon_row_value(r[c]) for c in df.columns if r[c] is not None}
        for r in df.collect()
    ]


def _expected(srx_name):
    from bigdata_old_spark.serializers import parse_sparql_xml

    with open(os.path.join(DATA, srx_name)) as f:
        _, rows = parse_sparql_xml(f.read())
    return [{k: canon_model_term(v) for k, v in r.items()} for r in rows]


def _assert_matches(df, srx_name):
    assert rows_equal(_rows(df), _expected(srx_name)), srx_name


def test_insert_into_solutions_01(spark):
    st = _store(spark).update(INSERT_PERSONS)
    df = st.query(P + """
        SELECT ?x ?name WHERE { INCLUDE %namedSet1 . ?x rdfs:label "Mike" . }""")
    _assert_matches(df, "test_insertIntoSolutions_01.srx")


def test_delete_from_solutions_01(spark):
    st = _store(spark).update(INSERT_PERSONS)
    st = st.update(P + """
        DELETE FROM %namedSet1
        SELECT *
        WHERE {
           BIND(<http://www.bigdata.com/Mike> as ?x)
           BIND("Mike" as ?name)
        }""")
    df = st.query(P + "SELECT ?x ?name WHERE { INCLUDE %namedSet1 . }")
    _assert_matches(df, "test_deleteFromSolutions_01.srx")


def test_delete_from_solutions_02(spark):
    st = _store(spark).update(INSERT_PERSONS)
    st = st.update(P + """
        DELETE FROM %namedSet1
        SELECT ?x ?name
        WHERE {
          ?x rdfs:label ?name .
          FILTER (?x = <http://www.bigdata.com/Mike> ) .
        }""")
    df = st.query(P + "SELECT ?x ?name WHERE { INCLUDE %namedSet1 . }")
    _assert_matches(df, "test_deleteFromSolutions_02.srx")


def test_delete_from_solutions_03(spark):
    st = _store(spark).update(INSERT_PERSONS)
    st = st.update(P + """
        DELETE FROM %namedSet1
        SELECT ?x ?name
        WHERE {
          ?x rdfs:label ?name .
          FILTER (?x = <http://www.bigdata.com/Bryan> ) .
        }""")
    df = st.query(P + "SELECT ?x ?name WHERE { INCLUDE %namedSet1 . }")
    _assert_matches(df, "test_deleteFromSolutions_03.srx")


def test_delete_insert_solutions_01(spark):
    st = _store(spark).update(INSERT_PERSONS)
    st = st.update(P + """
        DELETE FROM %namedSet1
          SELECT ?x ?name
        INSERT INTO %namedSet2
          SELECT ?x ?name
        WHERE {
          ?x rdfs:label ?name .
          FILTER (?x = <http://www.bigdata.com/Bryan> ) .
        }""")
    df1 = st.query(P + "SELECT ?x ?name WHERE { INCLUDE %namedSet1 . }")
    _assert_matches(df1, "test_deleteInsertSolutions_01a.srx")
    df2 = st.query(P + "SELECT ?x ?name WHERE { INCLUDE %namedSet2 . }")
    _assert_matches(df2, "test_deleteInsertSolutions_01b.srx")


def test_create_drop_clear_solution_set(spark):
    # mirrors test_createSolutionSet_01/02, test_dropSolutionSet_01/02,
    # test_clearSolutionSet_01/02 error semantics
    st = _store(spark)
    with pytest.raises(ValueError):
        st.update("drop solutions %namedSet1")
    st = st.update("create solutions %namedSet1")
    with pytest.raises(ValueError):
        st.update("create solutions %namedSet1")
    st = st.update("create silent solutions %namedSet1")  # no error
    st = st.update("drop solutions %namedSet1")
    with pytest.raises(ValueError):
        st.update("drop solutions %namedSet1")
    st = st.update("drop silent solutions %namedSet1")  # no error
    with pytest.raises(ValueError):
        st.update("clear solutions %namedSet1")
    st = st.update("clear silent solutions %namedSet1")  # no error
    # clear keeps the (emptied) set queryable
    st = st.update(INSERT_PERSONS)
    assert st.query(P + "SELECT * WHERE { INCLUDE %namedSet1 }").count() == 2
    st = st.update("clear solutions %namedSet1")
    assert st.query(P + "SELECT * WHERE { INCLUDE %namedSet1 }").count() == 0
