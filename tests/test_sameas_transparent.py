"""Query-transparent canonical owl:sameAs mode.

Proves query-over-canonical-store ≡ query-over-materialized-store (set
semantics) for queries that put ALIAS IRIs in subject/object constants,
FILTER expressions, and VALUES blocks — the access-path backchain of
bigdata-rdf inf/BackchainAccessPath.java: every triple-pattern scan
canonicalizes its alias constants through the stored mapping and fans
its variable bindings back out across the cliques, so downstream
FILTERs/joins/aggregates see materialized-equivalent bindings.
"""

import pytest

from bigdata_old_spark.store import TripleStore

TTL = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
:alice1 owl:sameAs :alice2 .
:alice2 owl:sameAs :alice3 .
:alice1 :name "Alice" .
:alice3 :age 30 .
:alice2 :knows :bob1 .
:bob1 owl:sameAs :bob2 .
:bob2 :name "Bob" .
:carol :knows :alice3 .
:carol :name "Carol" .
"""

P = "PREFIX : <http://example.org/> PREFIX owl: <http://www.w3.org/2002/07/owl#> "


@pytest.fixture(scope="module")
def stores(spark):
    base = TripleStore.from_turtle(spark, TTL)
    canon = base.closure(sameas="canonical").persist()
    mat = base.closure().persist()
    assert canon.sameas_mode == "canonical"
    assert mat.sameas_mode is None
    return canon, mat


def _rows(df):
    def flat(v):
        if v is None or not hasattr(v, "kind"):
            return v
        return (v["kind"], v["lex"], v["dt"], v["lang"])

    return {tuple(flat(r[c]) for c in sorted(df.columns)) for r in df.collect()}


EQUIV_QUERIES = [
    # alias in SUBJECT constant (:alice2 never holds :name explicitly)
    "SELECT ?n WHERE { :alice2 :name ?n }",
    # alias in OBJECT constant (:carol knows :alice3; ask via :alice1)
    "SELECT ?x WHERE { ?x :knows :alice1 }",
    # alias inside a FILTER equality
    "SELECT ?x ?y WHERE { ?x :knows ?y . FILTER(?y = :bob2) }",
    # alias arriving through VALUES
    "SELECT ?n WHERE { VALUES ?p { :alice3 } ?p :name ?n }",
    # variable answers must fan back out across the clique
    'SELECT ?x WHERE { ?x :name "Alice" }',
    # multi-pattern join crossing two cliques through alias constants
    "SELECT ?n WHERE { :alice1 :knows ?b . ?b :name ?n }",
    # alias on both sides of an OPTIONAL
    "SELECT ?n ?a WHERE { :alice2 :name ?n OPTIONAL { :alice2 :age ?a } }",
    # property path from an alias constant; the variable endpoint fans
    # out at the path boundary (zero-length-capable paths over a
    # canonical store are the one documented divergence — p+ avoids it)
    "SELECT ?x WHERE { :alice2 :knows+ ?x }",
]


@pytest.mark.parametrize("q", EQUIV_QUERIES)
def test_canonical_equals_materialized(stores, q):
    canon, mat = stores
    assert _rows(canon.query(P + q)) == _rows(mat.query(P + q))
    assert _rows(canon.query(P + q))  # non-vacuous: every fixture matches


def test_ask_through_alias(stores):
    canon, mat = stores
    q = P + 'ASK { :alice3 :name "Alice" }'
    assert canon.query(q).collect()[0][0] is True
    assert mat.query(q).collect()[0][0] is True


def test_construct_through_alias(stores):
    canon, mat = stores
    q = P + "CONSTRUCT { ?x :label ?n } WHERE { :alice2 :name ?n . ?x :knows :bob1 }"
    assert _rows(canon.query(q)) == _rows(mat.query(q))


def test_expand_optout_returns_canonical_bindings(stores):
    canon, _ = stores
    df = canon.query(P + 'SELECT ?x WHERE { ?x :name "Alice" }',
                     expand_sameas=False)
    rows = [r["x"]["lex"] for r in df.collect()]
    assert len(rows) == 1  # one canonical representative, no fan-out
    ex = "http://example.org/"
    assert rows[0] == min(ex + "alice1", ex + "alice2", ex + "alice3")


def test_predicate_constants_never_rewritten(spark):
    """A clique member used as a PREDICATE makes its clique unsafe —
    the closure materializes it exactly and queries must not rewrite
    the predicate constant."""
    ttl = """
    @prefix : <http://example.org/> .
    @prefix owl: <http://www.w3.org/2002/07/owl#> .
    :p1 owl:sameAs :p2 .
    :a :p1 :b .
    """
    canon = TripleStore.from_turtle(spark, ttl).closure(sameas="canonical")
    mat = TripleStore.from_turtle(spark, ttl).closure()
    q = "PREFIX : <http://example.org/> SELECT ?x WHERE { :a :p1 ?x }"
    assert _rows(canon.query(q)) == _rows(mat.query(q))


def test_mutation_keeps_transparency(stores, spark):
    """with_statements-derived stores (UPDATE results) keep the mode."""
    canon, _ = stores
    st = canon.update(P + "INSERT DATA { :dave :knows :alice1 }")
    assert st.sameas_mode == "canonical"
    # the new triple was inserted with the raw alias id, but the alias
    # resolves via the retained mapping triples for EXPANSION; constant
    # rewrite still works for pre-closure data
    assert _rows(st.query(P + "SELECT ?n WHERE { :alice2 :name ?n }"))


def test_canonical_mode_survives_parquet_roundtrip(stores, spark, tmp_path):
    """write_parquet stores a flags sidecar (underscore dir, invisible
    to the parquet reader) so from_parquet reopens a canonical store as
    canonical — alias-constant queries keep working in a new session."""
    canon, mat = stores
    path = str(tmp_path / "canon_store")
    canon.write_parquet(path)
    reopened = TripleStore.from_parquet(spark, path)
    assert reopened.sameas_mode == "canonical"
    q = P + "SELECT ?n WHERE { :alice2 :name ?n }"
    assert _rows(reopened.query(q)) == _rows(mat.query(q))
    # plain (non-canonical) stores round-trip with mode None
    path2 = str(tmp_path / "mat_store")
    mat.write_parquet(path2)
    assert TripleStore.from_parquet(spark, path2).sameas_mode is None


def test_backchain_expansion_joins_broadcast(stores):
    """The per-pattern clique fan-out joins must BROADCAST the (small)
    membership map, never shuffle the matched rows — a shuffle per
    triple pattern would be a 100 TB scale-killer."""
    import re

    canon, _ = stores
    df = canon.query(P + "SELECT ?x ?y WHERE { ?x :knows ?y }")
    plan = df._jdf.queryExecution().explainString(
        canon.spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "BroadcastHashJoin" in plan
    assert not re.search(r"\(\d+\) Exchange\b", plan), plan
