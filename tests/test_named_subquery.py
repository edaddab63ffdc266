"""Named subqueries: WITH {…} AS %set + INCLUDE %set.

Mirrors the reference's TestInclude fixtures
(bigdata-rdf/.../sparql/ast/eval/TestInclude.java) on the same
Mike/Bryan/Martyn/DC graph.
"""

from bigdata_old_spark.parser import parse_query

PFX = """
PREFIX : <http://example.org/>
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
"""


def lex(df, col):
    return sorted(r[col]["lex"] for r in df.collect() if r[col] is not None)


def test_parse_named_subquery():
    q = parse_query(PFX + """
        SELECT ?x
        WITH { SELECT ?x WHERE { ?x a foaf:Person } } AS %people
        WHERE { INCLUDE %people }""")
    assert len(q.named) == 1 and q.named[0][0] == "people"


def test_include_basic(small_store):
    """The TestInclude pattern: named set of persons, joined with labels."""
    df = small_store.query(PFX + """
        SELECT ?x ?o
        WITH { SELECT ?x WHERE { ?x a foaf:Person } } AS %namedSet1
        WHERE { INCLUDE %namedSet1 . OPTIONAL { ?x rdfs:label ?o } }""")
    out = {(r["x"]["lex"], r["o"]["lex"] if r["o"] else None) for r in df.collect()}
    assert out == {
        ("http://example.org/Mike", "Mike"),
        ("http://example.org/Bryan", "Bryan"),
        ("http://example.org/Martyn", None),
    }


def test_include_joins_with_outer_pattern(small_store):
    df = small_store.query(PFX + """
        SELECT ?x ?y
        WITH { SELECT ?x WHERE { ?x a foaf:Person } } AS %p
        WHERE { INCLUDE %p . ?x foaf:knows ?y }""")
    assert len(df.collect()) == 4  # Mike→Bryan, Bryan→Mike, Bryan→Martyn, Martyn→Bryan


def test_include_twice_self_join(small_store):
    """Two INCLUDEs of one set — re-aliased, not an ambiguous self-join."""
    df = small_store.query(PFX + """
        SELECT ?a ?b
        WITH { SELECT ?x WHERE { ?x a foaf:Person } } AS %p
        WHERE {
          { SELECT (?x AS ?a) WHERE { INCLUDE %p } }
          { SELECT (?x AS ?b) WHERE { INCLUDE %p } }
          FILTER(?a != ?b)
        }""")
    assert len(df.collect()) == 6  # 3 persons, ordered pairs, a != b


def test_include_chained_named_sets(small_store):
    """A later WITH may INCLUDE an earlier one (declaration order)."""
    df = small_store.query(PFX + """
        SELECT ?x
        WITH { SELECT ?x WHERE { ?x a foaf:Person } } AS %p
        WITH { SELECT ?x WHERE { INCLUDE %p . ?x rdfs:label ?l } } AS %labeled
        WHERE { INCLUDE %labeled }""")
    assert lex(df, "x") == ["http://example.org/Bryan", "http://example.org/Mike"]


def test_include_unknown_set_errors(small_store):
    import pytest

    with pytest.raises(Exception, match="nosuch"):
        small_store.query(PFX + "SELECT ?x WHERE { INCLUDE %nosuch }").collect()
