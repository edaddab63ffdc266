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
    # out at the path boundary
    "SELECT ?x WHERE { :alice2 :knows+ ?x }",
    # zero-length-capable paths (r10): the ≥1-length part runs in
    # canonical space and fans out; the ZERO-length solution binds the
    # ORIGINAL alias, un-expanded (ZeroLengthPathOp semantics — zero
    # length is not a statement, so sameAs replication can't apply)
    "SELECT ?x WHERE { :alice2 :knows* ?x }",
    "SELECT ?x WHERE { :alice2 :knows? ?x }",
    "SELECT ?x WHERE { ?x :knows* :alice3 }",
    "SELECT ?x WHERE { ?x :knows? :alice1 }",
    # var-var zeroable paths (r10): the zero-length rows are a DIAGONAL
    # — per-column fan-out of a canonical (c, c) row would invent
    # (alias_i, alias_j) pairs; the diagonal is rebuilt at alias level
    "SELECT ?x ?y WHERE { ?x :knows* ?y }",
    "SELECT ?x ?y WHERE { ?x :knows? ?y }",
    # same-var zeroable path: single output column, plain fan-out
    "SELECT ?x WHERE { ?x :knows* ?x }",
    # sibling-pipelined bindings widen the zero domain (ticket739) —
    # :nosuchprop has no edges, so the domain is exactly the ?x bindings
    'SELECT ?x ?y WHERE { ?x :name "Alice" . ?x :nosuchprop* ?y }',
]


def test_varvar_zero_diagonal_no_cross_pairs(stores):
    """`?x :p* ?y` must NOT pair two different aliases of one clique:
    there is no :knows path between the alice aliases, and zero-length
    binds both ends to the SAME term."""
    canon, mat = stores
    q = P + "SELECT ?x ?y WHERE { ?x :knows* ?y }"
    got = _rows(canon.query(q))
    assert got == _rows(mat.query(q))
    a1 = (0, "http://example.org/alice1", None, None)
    a2 = (0, "http://example.org/alice2", None, None)
    assert (a1, a2) not in got and (a2, a1) not in got
    assert (a1, a1) in got and (a2, a2) in got


def test_zero_length_path_binds_alias_not_canonical(stores):
    """`<alias> :p* ?x` must include ?x = <alias> itself (the
    zero-length solution) — not the canonical id, not the clique."""
    canon, mat = stores
    q = P + "SELECT ?x WHERE { :alice2 :nosuchprop* ?x }"
    got = _rows(canon.query(q))
    assert got == _rows(mat.query(q))
    assert got == {((0, "http://example.org/alice2", None, None),)}


def test_zero_length_path_both_constants(stores):
    canon, mat = stores
    # same alias on both ends: one zero-length solution
    q1 = P + "ASK { :alice2 :knows* :alice2 }"
    # DIFFERENT aliases of the same clique: NO zero-length solution and
    # no :knows edge between them — materialized says false
    q2 = P + "ASK { :alice2 :knows* :alice3 }"
    for q in (q1, q2):
        assert (canon.query(q).collect()[0][0]
                == mat.query(q).collect()[0][0]), q
    assert canon.query(q1).collect()[0][0] is True
    assert canon.query(q2).collect()[0][0] is False


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
    # the alias-object insert canonicalizes into the stored fact space
    # (r10 _canonize_delta); constant rewrite still works for
    # pre-closure data
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


UNSAFE_MIX_TTL = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
:a1 owl:sameAs :a2 .
:a1 :name "X" .
:p1 owl:sameAs :p2 .
:a :p1 :b .
:p1 :q :b .
"""


@pytest.fixture(scope="module")
def mixed_stores(spark):
    """One SAFE clique (:a1/:a2) + one UNSAFE clique (:p1/:p2 — p1 is
    used as a predicate), the ADVICE r9 repro shape."""
    base = TripleStore.from_turtle(spark, UNSAFE_MIX_TTL)
    return base.closure(sameas="canonical").persist(), base.closure().persist()


def test_unsafe_clique_rows_not_fanned_out_again(mixed_stores):
    """BAG-semantics regression (ADVICE r9, high): the unsafe clique's
    rows were materialized EXACTLY by the canonical closure — fanning
    them out again through the backchain membership map duplicated
    every row (COUNT 4 vs 2).  The map must cover SAFE cliques only."""
    canon, mat = mixed_stores
    q = P + "SELECT (COUNT(*) AS ?c) WHERE { ?x :q :b }"
    c = canon.query(q).collect()[0]["c"]["lex"]
    m = mat.query(q).collect()[0]["c"]["lex"]
    assert (c, m) == ("2", "2")


def test_safe_clique_exact_bag_count(mixed_stores):
    """The safe clique's fan-out must still multiply exactly like the
    materialized replication: one stored :name row × 2 members."""
    canon, mat = mixed_stores
    q = P + "SELECT (COUNT(*) AS ?c) WHERE { ?x :name ?n }"
    c = canon.query(q).collect()[0]["c"]["lex"]
    m = mat.query(q).collect()[0]["c"]["lex"]
    assert c == m == "2"


def test_mixed_store_select_equivalence(mixed_stores):
    canon, mat = mixed_stores
    for q in ("SELECT ?x WHERE { ?x :q :b }",
              "SELECT ?s ?p ?o WHERE { ?s ?p ?o }"):
        assert _rows(canon.query(P + q)) == _rows(mat.query(P + q))


def test_canon_of_lex_driver_dict_single_job(stores, monkeypatch):
    """Below SAMEAS_MEM_BROADCAST_ROWS the member→canon map collects
    ONCE into a driver dict — N distinct alias constants must not pay N
    filtered take(1) jobs (VERDICT r9 #3)."""
    import pyspark.sql

    canon, _ = stores
    canon._canon_lex_cache = {}
    canon._canon_dict_cache = None

    def _no_take(self, n):
        raise AssertionError("canon_of_lex fell back to per-constant take(1)")

    monkeypatch.setattr(pyspark.sql.DataFrame, "take", _no_take)
    ex = "http://example.org/"
    canon_id = min(ex + "alice1", ex + "alice2", ex + "alice3")
    for alias in ("alice1", "alice2", "alice3", "bob1", "bob2"):
        got = canon.canon_of_lex(ex + alias)
        if alias.startswith("alice"):
            assert got == canon_id or ex + alias == canon_id
    assert canon.canon_of_lex(ex + "carol") is None  # not in any clique


def test_canonical_mode_survives_managed_table_roundtrip(stores, spark):
    """ADVICE r9 (medium): a canonical store saved as a MANAGED table
    (write_bucketed with no path — nowhere to drop a sidecar) must
    round-trip sameas_mode through TBLPROPERTIES + from_table."""
    canon, mat = stores
    tbl = "canon_managed_rt"
    spark.sql(f"DROP TABLE IF EXISTS `{tbl}`")
    canon.write_bucketed(tbl, buckets=4)
    reopened = TripleStore.from_table(spark, tbl)
    assert reopened.sameas_mode == "canonical"
    q = P + "SELECT ?n WHERE { :alice2 :name ?n }"
    assert _rows(reopened.query(q)) == _rows(mat.query(q))
    spark.sql(f"DROP TABLE `{tbl}`")
    # plain stores round-trip with mode None
    tbl2 = "mat_managed_rt"
    spark.sql(f"DROP TABLE IF EXISTS `{tbl2}`")
    mat.write_bucketed(tbl2, buckets=4)
    assert TripleStore.from_table(spark, tbl2).sameas_mode is None
    spark.sql(f"DROP TABLE `{tbl2}`")


# -- canonical mode × QUADS composition (VERDICT r9 #5) ----------------------

QUADS_UPDATE = P + """
INSERT DATA {
  :alice1 owl:sameAs :alice2 .
  :alice2 owl:sameAs :alice3 .
  GRAPH :g1 { :alice1 :name "Alice" . :carol :knows :alice2 }
  GRAPH :g2 { :alice3 :age 30 }
}"""


@pytest.fixture(scope="module")
def quad_stores(spark):
    base = TripleStore.from_turtle(spark, "").update(QUADS_UPDATE)
    canon = base.closure(sameas="canonical").persist()
    mat = base.closure().persist()
    assert canon.sameas_mode == "canonical"
    return canon, mat


QUADS_EQUIV = [
    # alias constant inside GRAPH <const>
    'SELECT ?n WHERE { GRAPH :g1 { :alice3 :name ?n } }',
    'SELECT ?x WHERE { GRAPH :g1 { ?x :knows :alice1 } }',
    # alias constant inside GRAPH ?g — and ?g must bind the GRAPH NAME,
    # never a clique member (graphs are not renamed)
    'SELECT ?g ?n WHERE { GRAPH ?g { :alice2 :name ?n } }',
    'SELECT ?g ?x WHERE { GRAPH ?g { ?x :age 30 } }',
    # cross-graph join through the clique
    'SELECT ?n ?a WHERE { GRAPH ?g1x { :alice2 :name ?n } '
    'GRAPH ?g2x { :alice2 :age ?a } }',
]


@pytest.mark.parametrize("q", QUADS_EQUIV)
def test_canonical_quads_equivalence(quad_stores, q):
    canon, mat = quad_stores
    assert _rows(canon.query(P + q)) == _rows(mat.query(P + q)), q
    assert _rows(canon.query(P + q)), q  # non-vacuous


def test_canonical_quads_graph_never_expands(quad_stores):
    """Variable graph bindings stay graph names even when a graph IRI
    coincides with nothing in any clique — and fan-out of s/o inside
    GRAPH ?g never touches ?g."""
    canon, _ = quad_stores
    rows = canon.query(
        P + "SELECT ?g WHERE { GRAPH ?g { ?x :name ?n } }").collect()
    assert {r["g"]["lex"] for r in rows} == {"http://example.org/g1"}


def _plan(store, df):
    return df._jdf.queryExecution().explainString(
        store.spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


STAR_Q = ("SELECT ?x ?n ?a ?k WHERE "
          "{ ?x :name ?n . ?x :age ?a . ?x :knows ?k }")


def test_star_join_enabled_under_canonical_backchain(stores):
    """VERDICT r9 #1: subject-star BGPs over a canonical store keep the
    one-pass star scan (expansion happens ONCE at the star output seam)
    — and the result equals the materialized store's."""
    canon, mat = stores
    q = P + STAR_Q
    assert _rows(canon.query(q)) == _rows(mat.query(q))
    assert _rows(canon.query(q))  # non-vacuous (6 rows: 3 aliases × 2 bobs)
    # the star compiles as one scan + groupBy (an Aggregate node —
    # Hash/ObjectHash/Sort depending on input), not as per-triple joins
    # of three statement scans
    plan = _plan(canon, canon.query(q))
    assert "Aggregate" in plan, plan


def test_star_join_canonical_exact_bag_count(stores):
    canon, mat = stores
    q = P + ("SELECT (COUNT(*) AS ?c) WHERE "
             "{ ?x :name ?n . ?x :age ?a . ?x :knows ?k }")
    c = canon.query(q).collect()[0]["c"]["lex"]
    m = mat.query(q).collect()[0]["c"]["lex"]
    assert c == m == "6"


def test_star_join_canonical_constant_object(stores):
    """Alias constants inside star patterns canonicalize up front."""
    canon, mat = stores
    q = P + ("SELECT ?x ?n ?a WHERE "
             "{ ?x :name ?n . ?x :age ?a . ?x :knows :bob2 }")
    assert _rows(canon.query(q)) == _rows(mat.query(q))
    assert _rows(canon.query(q))


def test_sameas_self_query_virtual_pairs(stores):
    """Scanning owl:sameAs itself over a canonical store serves the
    VIRTUAL full pair relation — non-reflexive, each pair once, exactly
    the materialized RuleOwlSameAs1 output (the reference's
    OwlSameAsPropertiesExpandingIterator)."""
    canon, mat = stores
    for q in (
        "SELECT ?a ?b WHERE { ?a owl:sameAs ?b }",
        "SELECT ?b WHERE { :alice2 owl:sameAs ?b }",
        "SELECT ?a WHERE { ?a owl:sameAs :bob1 }",
        "SELECT (COUNT(*) AS ?c) WHERE { ?a owl:sameAs ?b }",
        "SELECT ?s ?p ?o WHERE { ?s ?p ?o }",
        "SELECT (COUNT(*) AS ?c) WHERE { ?s ?p ?o }",
    ):
        assert _rows(canon.query(P + q)) == _rows(mat.query(P + q)), q


def test_sameas_ask_between_aliases(stores):
    canon, mat = stores
    q1 = P + "ASK { :alice1 owl:sameAs :alice3 }"  # same clique → true
    q2 = P + "ASK { :alice1 owl:sameAs :alice1 }"  # reflexive → false
    q3 = P + "ASK { :alice1 owl:sameAs :bob1 }"    # cross-clique → false
    for q in (q1, q2, q3):
        assert (canon.query(q).collect()[0][0]
                == mat.query(q).collect()[0][0]), q
    assert canon.query(q1).collect()[0][0] is True
    assert canon.query(q2).collect()[0][0] is False
    assert canon.query(q3).collect()[0][0] is False


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


# -- round 10: mutations over a canonical store -------------------------------

def test_canonical_insert_through_alias(stores, spark):
    """INSERT DATA through an ALIAS subject must land on the canonical
    FACT (the backchain serves replicas from it — BackchainAccessPath
    semantics): every alias form of the query sees the new triple, and
    results equal a full re-closure of the materialized store with the
    same assertion."""
    canon, _ = stores
    st2 = canon.update(P + "INSERT DATA { :alice3 :hobby :chess }")
    for a in ("alice1", "alice2", "alice3"):
        assert st2.query(
            P + f"ASK {{ :{a} :hobby :chess }}").collect()[0][0] is True, a
    mat2 = TripleStore.from_turtle(
        spark, TTL + ":alice3 :hobby :chess .").closure()
    q = "SELECT ?x WHERE { ?x :hobby :chess }"
    assert _rows(st2.query(P + q)) == _rows(mat2.query(P + q))


def test_canonical_insert_alias_object(stores, spark):
    """Alias in OBJECT position canonicalizes too: asking through any
    other member of the clique finds the fact."""
    canon, _ = stores
    st2 = canon.update(P + "INSERT DATA { :dave :likes :alice2 }")
    assert st2.query(
        P + "ASK { :dave :likes :alice1 }").collect()[0][0] is True
    mat2 = TripleStore.from_turtle(
        spark, TTL + ":dave :likes :alice2 .").closure()
    q = "SELECT ?x WHERE { :dave :likes ?x }"
    assert _rows(st2.query(P + q)) == _rows(mat2.query(P + q))


def test_canonical_delete_through_other_alias(stores):
    """DELETE DATA through a DIFFERENT alias retracts the fact for the
    whole clique — the stored row is the fact the replicas derive from,
    so removing any alias form removes them all (the reference's
    backchain behaves identically: replicas are read-time expansions of
    the one explicit row)."""
    canon, _ = stores
    st2 = canon.update(P + "INSERT DATA { :alice1 :hobby :go }")
    assert st2.query(P + "ASK { :alice2 :hobby :go }").collect()[0][0] is True
    st3 = st2.update(P + "DELETE DATA { :alice3 :hobby :go }")
    for a in ("alice1", "alice2", "alice3"):
        assert st3.query(
            P + f"ASK {{ :{a} :hobby :go }}").collect()[0][0] is False, a


def test_canonical_delete_insert_where(stores):
    """DELETE/INSERT WHERE over a canonical store: the WHERE binds at
    alias level (backchain fan-out), and the instantiated templates
    canonicalize — the rewrite stays in canonical space."""
    canon, _ = stores
    # copy every :knows edge of alice (bound via an alias) to :met
    st2 = canon.update(
        P + "INSERT { ?x :met ?y } WHERE { ?x :knows ?y . "
        'FILTER(?x = :alice1) }')
    assert st2.query(P + "ASK { :alice2 :met :bob2 }").collect()[0][0] is True
