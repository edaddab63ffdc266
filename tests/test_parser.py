"""End-to-end SPARQL string → result tests on the small graph."""

PREFIXES = """
PREFIX : <http://example.org/>
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
"""

EX = "http://example.org/"


def lexes(df, col):
    return sorted(r[col]["lex"] for r in df.collect() if r[col] is not None)


def test_select_basic(small_store):
    df = small_store.query(PREFIXES + """
        SELECT ?name WHERE {
          ?x foaf:knows ?y . ?y rdfs:label ?name .
          FILTER(?name != "Bryan")
        }""")
    assert lexes(df, "name") == ["Mike"]


def test_optional_bound_filter(small_store):
    df = small_store.query(PREFIXES + """
        SELECT ?p ?label WHERE {
          ?p a foaf:Person .
          OPTIONAL { ?p rdfs:label ?label }
          FILTER(!BOUND(?label))
        }""")
    assert lexes(df, "p") == [EX + "Martyn"]


def test_union_distinct_order(small_store):
    df = small_store.query(PREFIXES + """
        SELECT DISTINCT ?x WHERE {
          { ?x rdfs:label ?l } UNION { ?x a foaf:Person }
        } ORDER BY ?x""")
    got = [r["x"]["lex"] for r in df.collect()]
    assert got == [EX + "Bryan", EX + "DC", EX + "Martyn", EX + "Mike"]


def test_aggregate_group_concat_having(small_store):
    df = small_store.query(PREFIXES + """
        SELECT ?x (COUNT(?y) AS ?n) (GROUP_CONCAT(STR(?y); SEPARATOR=",") AS ?ys)
        WHERE { ?x foaf:knows ?y }
        GROUP BY ?x
        HAVING (COUNT(?y) > 1)""")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["x"]["lex"] == EX + "Bryan"
    assert rows[0]["n"]["lex"] == "2"
    assert set(rows[0]["ys"]["lex"].split(",")) == {EX + "Mike", EX + "Martyn"}


def test_property_path_star(small_store):
    df = small_store.query(PREFIXES + """
        SELECT ?y WHERE { :Mike foaf:knows+ ?y }""")
    assert lexes(df, "y") == [EX + "Bryan", EX + "Martyn", EX + "Mike"]


def test_path_alternative_and_inverse(small_store):
    df = small_store.query(PREFIXES + """
        SELECT ?who WHERE { :Martyn ^foaf:knows ?who }""")
    assert lexes(df, "who") == [EX + "Bryan"]
    df2 = small_store.query(PREFIXES + """
        SELECT ?v WHERE { :Mike rdfs:label|foaf:knows ?v }""")
    assert lexes(df2, "v") == ["Mike", EX + "Bryan"]


def test_not_exists_and_minus(small_store):
    q1 = small_store.query(PREFIXES + """
        SELECT ?p WHERE { ?p a foaf:Person
          FILTER NOT EXISTS { ?p rdfs:label ?l } }""")
    assert lexes(q1, "p") == [EX + "Martyn"]


def test_values_inline(small_store):
    df = small_store.query(PREFIXES + """
        SELECT ?x WHERE {
          VALUES ?name { "Mike" "DC" }
          ?x rdfs:label ?name .
        }""")
    assert lexes(df, "x") == [EX + "DC", EX + "Mike"]


def test_bind_arith(small_store):
    df = small_store.query(PREFIXES + """
        SELECT ?n2 WHERE {
          :Bryan rdfs:label ?l . BIND(STRLEN(?l) * 2 + 1 AS ?n2)
        }""")
    assert lexes(df, "n2") == ["11"]


def test_subselect(small_store):
    df = small_store.query(PREFIXES + """
        SELECT ?x ?c WHERE {
          ?x a foaf:Person .
          { SELECT ?x (COUNT(?y) AS ?c) WHERE { ?x foaf:knows ?y } GROUP BY ?x }
        } ORDER BY DESC(?c) LIMIT 1""")
    rows = df.collect()
    assert rows[0]["x"]["lex"] == EX + "Bryan" and rows[0]["c"]["lex"] == "2"


def test_ask(small_store):
    assert small_store.query(PREFIXES + "ASK { :Mike foaf:knows :Bryan }").collect()[0]["ask"] is True
    assert small_store.query(PREFIXES + "ASK { :DC foaf:knows :Bryan }").collect()[0]["ask"] is False


def test_construct(small_store):
    df = small_store.query(PREFIXES + """
        CONSTRUCT { ?y :knownBy ?x } WHERE { ?x foaf:knows ?y }""")
    rows = {(r["s"]["lex"], r["p"]["lex"], r["o"]["lex"]) for r in df.collect()}
    assert (EX + "Bryan", EX + "knownBy", EX + "Mike") in rows
    assert len(rows) == 4


def test_describe(small_store):
    # default mode = SymmetricOneStep (reference QueryHints default):
    # type, label, knows + the reverse link Bryan-knows-Mike
    df = small_store.query(PREFIXES + "DESCRIBE :Mike")
    assert df.count() == 4
    # CBD mode: forward only
    df2 = small_store.query(PREFIXES + "DESCRIBE :Mike", describe_mode="CBD")
    assert df2.count() == 3


def test_blank_node_pattern(small_store):
    df = small_store.query(PREFIXES + """
        SELECT ?x WHERE { ?x foaf:knows [ rdfs:label "Bryan" ] }""")
    assert lexes(df, "x") == [EX + "Martyn", EX + "Mike"]


def test_construct_where_shorthand(small_store):
    df = small_store.query(PREFIXES + "CONSTRUCT WHERE { ?x foaf:knows ?y }")
    assert df.count() == 4
    preds = {r["p"]["lex"] for r in df.collect()}
    assert preds == {"http://xmlns.com/foaf/0.1/knows"}


def test_describe_with_pattern(small_store):
    df = small_store.query(PREFIXES + """
        DESCRIBE ?x WHERE { ?x rdfs:label "DC" }""")
    rows = {(r["s"]["lex"], r["p"]["lex"]) for r in df.collect()}
    assert rows == {(EX + "DC", "http://www.w3.org/2000/01/rdf-schema#label")}


def test_if_coalesce_in(small_store):
    df = small_store.query(PREFIXES + """
        SELECT ?x (IF(?x IN (:Mike, :DC), "yes", "no") AS ?flag)
        WHERE { ?x rdfs:label ?l } ORDER BY ?x""")
    got = [(r["x"]["lex"], r["flag"]["lex"]) for r in df.collect()]
    assert got == [(EX + "Bryan", "no"), (EX + "DC", "yes"), (EX + "Mike", "yes")]
