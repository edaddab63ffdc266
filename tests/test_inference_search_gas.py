"""RDFS closure, full-text search, GAS analytics — golden answers
mirroring the reference's tiny-graph test style (TestBFS/TestCC/TestPR,
rules/* closure tests)."""

import pytest
from pyspark.sql import functions as F

from bigdata_old_spark.analytics import bfs, connected_components, edges_of, pagerank, sssp
from bigdata_old_spark.inference import rdfs_closure
from bigdata_old_spark.model import FOAF, RDF_TYPE, RDFS, STYPE_INFERRED, Term
from bigdata_old_spark.search import build_text_index, search
from bigdata_old_spark.store import TripleStore

EX = "http://example.org/"


def test_rdfs_closure(spark):
    rows = [
        (None, EX + "Fido", RDF_TYPE, Term.iri(EX + "Dog")),
        (None, EX + "Dog", RDFS + "subClassOf", Term.iri(EX + "Mammal")),
        (None, EX + "Mammal", RDFS + "subClassOf", Term.iri(EX + "Animal")),
        (None, EX + "Fido", EX + "hasOwner", Term.iri(EX + "Alice")),
        (None, EX + "hasOwner", RDFS + "subPropertyOf", Term.iri(EX + "knows")),
        (None, EX + "hasOwner", RDFS + "domain", Term.iri(EX + "Pet")),
        (None, EX + "hasOwner", RDFS + "range", Term.iri(EX + "Person")),
    ]
    st = TripleStore.from_rows(spark, rows)
    closed = rdfs_closure(st.statements)
    inferred = {
        (r["s"], r["p"], r["o_lex"])
        for r in closed.where(F.col("stype") == STYPE_INFERRED).collect()
    }
    assert (EX + "Fido", RDF_TYPE, EX + "Mammal") in inferred      # rdfs9
    assert (EX + "Fido", RDF_TYPE, EX + "Animal") in inferred      # rdfs9 via rdfs11
    assert (EX + "Dog", RDFS + "subClassOf", EX + "Animal") in inferred  # rdfs11
    assert (EX + "Fido", EX + "knows", EX + "Alice") in inferred   # rdfs7
    assert (EX + "Fido", RDF_TYPE, EX + "Pet") in inferred         # rdfs2
    assert (EX + "Alice", RDF_TYPE, EX + "Person") in inferred     # rdfs3
    # idempotent: closing the closure adds nothing
    assert rdfs_closure(closed).count() == closed.count()


def test_owl_rules(spark):
    OWL = "http://www.w3.org/2002/07/owl#"
    rows = [
        (None, EX + "hasPart", OWL + "inverseOf", Term.iri(EX + "partOf")),
        (None, EX + "car", EX + "hasPart", Term.iri(EX + "wheel")),
        (None, EX + "near", RDF_TYPE, Term.iri(OWL + "SymmetricProperty")),
        (None, EX + "a", EX + "near", Term.iri(EX + "b")),
        (None, EX + "anc", RDF_TYPE, Term.iri(OWL + "TransitiveProperty")),
        (None, EX + "x", EX + "anc", Term.iri(EX + "y")),
        (None, EX + "y", EX + "anc", Term.iri(EX + "z")),
        (None, EX + "z", EX + "anc", Term.iri(EX + "w")),
    ]
    st = TripleStore.from_rows(spark, rows)
    closed = rdfs_closure(st.statements)
    got = {(r["s"], r["p"], r["o_lex"]) for r in closed.collect()}
    assert (EX + "wheel", EX + "partOf", EX + "car") in got       # inverseOf
    assert (EX + "b", EX + "near", EX + "a") in got               # symmetric
    assert (EX + "x", EX + "anc", EX + "z") in got                # transitive 1 hop
    assert (EX + "x", EX + "anc", EX + "w") in got                # transitive closure


def test_owl_sameas(spark):
    """RuleOwlSameAs1/1b (symmetric-transitive sameAs) + SameAs2/3
    (statement propagation across the equivalence class)."""
    OWL = "http://www.w3.org/2002/07/owl#"
    rows = [
        (None, EX + "clark", OWL + "sameAs", Term.iri(EX + "superman")),
        (None, EX + "superman", OWL + "sameAs", Term.iri(EX + "kal-el")),
        (None, EX + "clark", EX + "worksAt", Term.iri(EX + "DailyPlanet")),
        (None, EX + "clark", RDFS + "label", "Clark Kent"),
        (None, EX + "lois", EX + "loves", Term.iri(EX + "superman")),
    ]
    st = TripleStore.from_rows(spark, rows)
    closed = rdfs_closure(st.statements)
    got = {(r["s"], r["p"], r["o_lex"]) for r in closed.collect()}
    # sameAs1: symmetry + transitivity
    assert (EX + "superman", OWL + "sameAs", EX + "clark") in got
    assert (EX + "clark", OWL + "sameAs", EX + "kal-el") in got
    assert (EX + "kal-el", OWL + "sameAs", EX + "clark") in got
    # sameAs2: subject substitution (object struct preserved, incl. literals)
    assert (EX + "superman", EX + "worksAt", EX + "DailyPlanet") in got
    assert (EX + "kal-el", RDFS + "label", "Clark Kent") in got
    # sameAs3: object substitution
    assert (EX + "lois", EX + "loves", EX + "clark") in got
    assert (EX + "lois", EX + "loves", EX + "kal-el") in got
    # no self-pairs materialized
    assert (EX + "clark", OWL + "sameAs", EX + "clark") not in got
    # idempotent
    assert rdfs_closure(closed).count() == closed.count()


def test_fulltext_search(spark):
    rows = [
        (None, EX + "d1", RDFS + "label", "the quick brown fox"),
        (None, EX + "d2", RDFS + "label", "the lazy dog sleeps"),
        (None, EX + "d3", RDFS + "label", "quick quick dog"),
        (None, EX + "d4", RDFS + "comment", "nothing relevant here"),
    ]
    st = TripleStore.from_rows(spark, rows)
    idx = build_text_index(st.statements)
    hits = search(idx, "quick dog").collect()
    by_s = {r["s"]: r for r in hits}
    assert set(by_s) == {EX + "d1", EX + "d2", EX + "d3"}
    # d3 matches both tokens (one twice) → top rank.  Reference-parity
    # cosine (local-weight, Lucene-8-bit-quantized): d3 = (quick 2/√5,
    # dog 1/√5) → quantized (0.875, 0.4375); query (1/√2, 1/√2) →
    # (0.875+0.4375)/√2 = 0.92807765
    assert min(hits, key=lambda r: r["rank"])["s"] == EX + "d3"
    assert abs(by_s[EX + "d3"]["relevance"] - 0.9280776503073411) < 1e-9
    # match-all-terms keeps only d3
    all_hits = search(idx, "quick dog", match_all_terms=True).collect()
    assert {r["s"] for r in all_hits} == {EX + "d3"}
    # rank cutoff
    top1 = search(idx, "quick dog", max_rank=1).collect()
    assert len(top1) == 1


def test_bfs_sssp(small_store):
    edges = edges_of(small_store.statements, FOAF + "knows")
    out = {r["v"]: (r["depth"], r["pred"]) for r in bfs(edges, EX + "Mike").collect()}
    assert out[EX + "Mike"] == (0, None)
    assert out[EX + "Bryan"] == (1, EX + "Mike")
    assert out[EX + "Martyn"] == (2, EX + "Bryan")
    d = {r["v"]: r["dist"] for r in sssp(edges, EX + "Martyn").collect()}
    assert d == {EX + "Martyn": 0, EX + "Bryan": 1, EX + "Mike": 2}


def test_connected_components(spark, small_store):
    edges = edges_of(small_store.statements, FOAF + "knows")
    cc = {r["v"]: r["component"] for r in connected_components(edges).collect()}
    assert len(set(cc.values())) == 1  # one knows-component
    # add an isolated pair → second component
    extra = TripleStore.from_rows(spark, [(None, EX + "x1", EX + "e", Term.iri(EX + "x2"))])
    both = small_store.statements.unionByName(extra.statements)
    cc2 = {r["v"]: r["component"] for r in connected_components(edges_of(both)).collect()}
    comps = set(cc2.values())
    assert len(comps) == 2
    assert cc2[EX + "x1"] == cc2[EX + "x2"]


def test_pagerank(small_store):
    edges = edges_of(small_store.statements, FOAF + "knows")
    pr = {r["v"]: r["rank"] for r in pagerank(edges, max_iter=30).collect()}
    # Bryan is pointed at by both others → highest rank
    assert max(pr, key=pr.get) == EX + "Bryan"
    assert abs(sum(pr.values()) - 3.0) < 0.2


def _closure_triples(spark, ttl, **kw):
    st = TripleStore.from_turtle(spark, ttl)
    closed = rdfs_closure(st.statements, **kw)
    return {(r["s"], r["p"], r["o_lex"]) for r in closed.collect()}


_RDFS = "http://www.w3.org/2000/01/rdf-schema#"
_OWL = "http://www.w3.org/2002/07/owl#"
_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_rdfs6_8_10_12_13(spark):
    got = _closure_triples(spark, """
        @prefix : <http://example.org/> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        :p a rdf:Property .
        :C a rdfs:Class .
        :m a rdfs:ContainerMembershipProperty .
        :D a rdfs:Datatype .
    """)
    E = "http://example.org/"
    assert (E + "p", _RDFS + "subPropertyOf", E + "p") in got          # rdfs6
    assert (E + "C", _RDFS + "subClassOf", _RDFS + "Resource") in got  # rdfs8
    assert (E + "C", _RDFS + "subClassOf", E + "C") in got             # rdfs10
    assert (E + "m", _RDFS + "subPropertyOf", _RDFS + "member") in got  # rdfs12
    assert (E + "D", _RDFS + "subClassOf", _RDFS + "Literal") in got   # rdfs13


def test_rdf1_property_typing(spark):
    got = _closure_triples(spark, """
        @prefix : <http://example.org/> .
        :a :p :b .
    """)
    assert ("http://example.org/p", RDF_TYPE, _RDF + "Property") in got


def test_rdfs4_off_by_default_and_flag(spark):
    ttl = "@prefix : <http://example.org/> .  :a :p :b ."
    E = "http://example.org/"
    base = _closure_triples(spark, ttl)
    assert (E + "a", RDF_TYPE, _RDFS + "Resource") not in base  # reference default
    on = _closure_triples(spark, ttl, forward_chain_rdfs4=True)
    assert (E + "a", RDF_TYPE, _RDFS + "Resource") in on   # rdfs4a
    assert (E + "b", RDF_TYPE, _RDFS + "Resource") in on   # rdfs4b


def test_owl_equivalent_class_property(spark):
    got = _closure_triples(spark, """
        @prefix : <http://example.org/> .
        @prefix owl: <http://www.w3.org/2002/07/owl#> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        :A owl:equivalentClass :B .
        :x a :A .  :y a :B .
        :p owl:equivalentProperty :q .
        :m :p :n .
    """)
    E = "http://example.org/"
    assert (E + "x", RDF_TYPE, E + "B") in got   # via A ⊑ B
    assert (E + "y", RDF_TYPE, E + "A") in got   # via B ⊑ A
    assert (E + "B", _OWL + "equivalentClass", E + "A") in got  # symmetric
    assert (E + "m", E + "q", E + "n") in got    # via p ⊑p q
    assert (E + "A", _RDFS + "subClassOf", E + "B") in got


def test_owl_functional_property(spark):
    got = _closure_triples(spark, """
        @prefix : <http://example.org/> .
        @prefix owl: <http://www.w3.org/2002/07/owl#> .
        :hasMother a owl:FunctionalProperty .
        :child :hasMother :m1 .
        :child :hasMother :m2 .
    """)
    E = "http://example.org/"
    assert (E + "m1", _OWL + "sameAs", E + "m2") in got
    assert (E + "m2", _OWL + "sameAs", E + "m1") in got


def test_owl_has_value(spark):
    """RuleOwlHasValue.java:36 — (x type a), (a type owl:Restriction),
    (a owl:onProperty p), (a owl:hasValue v) → (x p v); the restriction
    node is a bnode and v may be a literal."""
    st = TripleStore.from_turtle(spark, """
        @prefix : <http://example.org/> .
        @prefix owl: <http://www.w3.org/2002/07/owl#> .
        :Adult a owl:Restriction ;
               owl:onProperty :status ;
               owl:hasValue "adult" .
        :alice a :Adult .
        :HasPet a owl:Restriction ;
                owl:onProperty :keeps ;
                owl:hasValue :cat .
        :bob a :HasPet .
        :carol a :Unrelated .
    """)
    closed = rdfs_closure(st.statements)
    got = {(r["s"], r["p"], r["o_lex"]) for r in closed.collect()}
    E = "http://example.org/"
    assert (E + "alice", E + "status", "adult") in got   # literal value
    assert (E + "bob", E + "keeps", E + "cat") in got    # IRI value
    assert not any(s == E + "carol" and p == E + "status" for s, p, _ in got)
    # bnode restriction node: the usual OWL serialization shape
    st2 = TripleStore.from_turtle(spark, """
        @prefix : <http://example.org/> .
        @prefix owl: <http://www.w3.org/2002/07/owl#> .
        :x a [ a owl:Restriction ; owl:onProperty :p ; owl:hasValue 42 ] .
    """)
    c2 = rdfs_closure(st2.statements)
    row = c2.where((F.col("s") == E + "x") & (F.col("p") == E + "p")).collect()
    assert len(row) == 1 and row[0]["o_lex"] == "42"  # numeric struct carried


def test_owl_inverse_functional_property(spark):
    got = _closure_triples(spark, """
        @prefix : <http://example.org/> .
        @prefix owl: <http://www.w3.org/2002/07/owl#> .
        :email a owl:InverseFunctionalProperty .
        :alice :email "a@x.org" .
        :al :email "a@x.org" .
        :bob :email "b@x.org" .
    """)
    E = "http://example.org/"
    assert (E + "alice", _OWL + "sameAs", E + "al") in got
    assert not any(s == E + "bob" and p == _OWL + "sameAs" for s, p, _ in got)


def test_connected_components_probe_reads_checkpoint(spark, monkeypatch):
    """VERDICT r6 #8: each CC round pays ONE computation job — the
    convergence probe (isEmpty) must run on the round's CHECKPOINTED
    frame, not the un-materialized join lineage (which would recompute
    the round).  Pinned by spying every isEmpty call inside
    connected_components and asserting the probed plan is a filter over
    a LogicalRDD (localCheckpoint output), never a Join tree."""
    from pyspark.sql.classic.dataframe import DataFrame  # the concrete class

    probed = []
    orig = DataFrame.isEmpty

    def spy(self):
        probed.append(self._jdf.queryExecution().optimizedPlan().toString())
        return orig(self)

    monkeypatch.setattr(DataFrame, "isEmpty", spy)
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(8)], "src string, dst string"
    )
    rows = connected_components(edges).collect()
    assert {r["component"] for r in rows} == {"n0"} and len(rows) == 9
    assert probed  # one probe per round
    for plan in probed:
        assert "Join" not in plan and "LogicalRDD" in plan


def test_weighted_sssp_picks_lighter_path(spark):
    from bigdata_old_spark.analytics import weighted_sssp

    # a→b→d costs 1+1=2; direct a→d costs 5; parallel a→b edges take min
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "b", 3.0), ("b", "d", 1.0), ("a", "d", 5.0),
         ("d", "e", 2.0)],
        ["src", "dst", "weight"],
    )
    out = {r["v"]: r["dist"] for r in weighted_sssp(edges, "a").collect()}
    assert out == {"a": 0.0, "b": 1.0, "d": 2.0, "e": 4.0}


def test_weighted_sssp_relaxation_crosses_rounds(spark):
    from bigdata_old_spark.analytics import weighted_sssp

    # the cheap route to d arrives a round LATER than the direct edge:
    # round 1 sets d=10 via a→d; the a→b→c→d chain must still improve it
    edges = spark.createDataFrame(
        [("a", "d", 10.0), ("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)],
        ["src", "dst", "weight"],
    )
    out = {r["v"]: r["dist"] for r in weighted_sssp(edges, "a").collect()}
    assert out["d"] == 3.0


def test_weighted_sssp_undirected(spark):
    from bigdata_old_spark.analytics import weighted_sssp

    edges = spark.createDataFrame([("b", "a", 2.0)], ["src", "dst", "weight"])
    out = {r["v"]: r["dist"] for r in weighted_sssp(edges, "a", directed=False).collect()}
    assert out == {"a": 0.0, "b": 2.0}


def test_weighted_sssp_rejects_negative_weights(spark):
    from bigdata_old_spark.analytics import weighted_sssp

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", -2.0)], ["src", "dst", "weight"])
    with pytest.raises(ValueError, match="non-negative"):
        weighted_sssp(edges, "a")


def test_weighted_sssp_max_iter_truncation_raises(spark):
    from bigdata_old_spark.analytics import weighted_sssp

    # a 4-hop chain cannot drain its frontier in 2 rounds — truncated
    # distances must raise, not silently return wrong answers
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0), ("d", "e", 1.0)],
        ["src", "dst", "weight"])
    with pytest.raises(RuntimeError, match="max_iter"):
        weighted_sssp(edges, "a", max_iter=2)


# ---------------------------------------------------------------------------
# Canonical-representative owl:sameAs (VERDICT r7 #4) — the scale path:
# linear member↔canonical mapping instead of the O(Σ clique²) pair
# closure; expand_sameas recovers the materialized form for answers.
# ---------------------------------------------------------------------------

def _spo(df):
    return {(r["s"], r["p"], r["o_lex"]) for r in df.collect()}


def test_canonical_sameas_equivalence(spark):
    """expand_sameas(rdfs_closure(S, sameas='canonical')) reproduces the
    materialized closure exactly at the (s, p, o) level."""
    from bigdata_old_spark.inference import expand_sameas

    OWL = "http://www.w3.org/2002/07/owl#"
    rows = [
        (None, EX + "clark", OWL + "sameAs", Term.iri(EX + "superman")),
        (None, EX + "superman", OWL + "sameAs", Term.iri(EX + "kal-el")),
        (None, EX + "clark", EX + "worksAt", Term.iri(EX + "DailyPlanet")),
        (None, EX + "clark", RDFS + "label", "Clark Kent"),
        (None, EX + "lois", EX + "loves", Term.iri(EX + "superman")),
    ]
    st = TripleStore.from_rows(spark, rows)
    full = rdfs_closure(st.statements)
    canon = rdfs_closure(st.statements, sameas="canonical")
    # canonical store: one worksAt statement (on the canonical id), a
    # linear mapping, NOT the replicated triples
    canon_set = _spo(canon)
    assert sum(1 for s, p, o in canon_set if p == EX + "worksAt") == 1
    assert _spo(expand_sameas(canon)) == _spo(full)


def test_canonical_sameas_linear_clique(spark):
    """A 1000-member sameAs clique: canonical closure output is LINEAR
    in clique size (the materialized pair closure alone would be ~10⁶
    rows).  Star topology (min-label CC converges in O(diameter))."""
    OWL = "http://www.w3.org/2002/07/owl#"
    n = 1000
    rows = [
        (None, EX + "m0", OWL + "sameAs", Term.iri(EX + f"m{i}"))
        for i in range(1, n)
    ]
    rows.append((None, EX + "m7", EX + "worksAt", Term.iri(EX + "W")))
    st = TripleStore.from_rows(spark, rows)
    closed = rdfs_closure(st.statements, sameas="canonical")
    total = closed.count()
    # 2·(n−1) mapping triples + a handful of statements/rdf1 rows
    assert total < 12 * n
    # the mapping is total: every member reaches the canonical
    sa = closed.where(F.col("p") == OWL + "sameAs").count()
    assert sa == 2 * (n - 1)


def test_canonical_sameas_unsafe_schema_clique(spark):
    """A clique containing a term used as a PREDICATE is unsafe — it
    keeps the exact materialized RuleOwlSameAs semantics (rewriting a
    predicate-positioned term would desynchronize the rule joins)."""
    OWL = "http://www.w3.org/2002/07/owl#"
    rows = [
        (None, EX + "p1", OWL + "sameAs", Term.iri(EX + "p2")),
        (None, EX + "x", EX + "p1", Term.iri(EX + "y")),
        (None, EX + "p1", RDFS + "domain", Term.iri(EX + "C")),
    ]
    st = TripleStore.from_rows(spark, rows)
    full = _spo(rdfs_closure(st.statements))
    canon = _spo(rdfs_closure(st.statements, sameas="canonical"))
    assert canon == full
    assert (EX + "p2", RDFS + "domain", EX + "C") in canon  # sameAs2 fired
    assert (EX + "x", RDF_TYPE, EX + "C") in canon          # rdfs2 fired


def test_canonical_sameas_derived_mid_closure(spark):
    """FunctionalProperty mints sameAs pairs MID-closure; canonical mode
    folds them into the mapping on the next outer round."""
    from bigdata_old_spark.inference import expand_sameas

    OWL = "http://www.w3.org/2002/07/owl#"
    rows = [
        (None, EX + "hasMother", RDF_TYPE, Term.iri(OWL + "FunctionalProperty")),
        (None, EX + "child", EX + "hasMother", Term.iri(EX + "m1")),
        (None, EX + "child", EX + "hasMother", Term.iri(EX + "m2")),
        (None, EX + "m1", EX + "age", Term.iri(EX + "old")),
    ]
    st = TripleStore.from_rows(spark, rows)
    canon = rdfs_closure(st.statements, sameas="canonical")
    got = _spo(canon)
    assert (EX + "m1", OWL + "sameAs", EX + "m2") in got
    assert (EX + "m2", OWL + "sameAs", EX + "m1") in got
    expanded = _spo(expand_sameas(canon))
    assert (EX + "child", EX + "hasMother", EX + "m1") in expanded
    assert (EX + "child", EX + "hasMother", EX + "m2") in expanded
    assert (EX + "m2", EX + "age", EX + "old") in expanded


def test_expand_sameas_bindings(spark):
    """SELECT answers over a canonical-mode closure expand to every
    clique member; literals and un-cliqued resources pass through."""
    from bigdata_old_spark.inference import expand_sameas_bindings, rdfs_closure
    from bigdata_old_spark.store import TripleStore

    OWL = "http://www.w3.org/2002/07/owl#"
    rows = [
        (None, EX + "clark", OWL + "sameAs", Term.iri(EX + "superman")),
        (None, EX + "clark", EX + "worksAt", Term.iri(EX + "DailyPlanet")),
        (None, EX + "clark", RDFS + "label", "Clark Kent"),
    ]
    st = TripleStore.from_rows(spark, rows)
    canonical = st.with_statements(
        rdfs_closure(st.statements, sameas="canonical"))
    res = canonical.query(
        f"SELECT ?who ?org WHERE {{ ?who <{EX}worksAt> ?org }}")
    # canonical store: one row, canonical id only
    assert res.count() == 1
    got = expand_sameas_bindings(res, canonical.statements).collect()
    whos = {r["who"]["lex"] for r in got}
    assert whos == {EX + "clark", EX + "superman"}
    assert all(r["org"]["lex"] == EX + "DailyPlanet" for r in got)
    # literal bindings pass through untouched
    res2 = canonical.query(
        f"SELECT ?who ?l WHERE {{ ?who <{RDFS}label> ?l }}")
    got2 = expand_sameas_bindings(res2, canonical.statements).collect()
    assert {r["who"]["lex"] for r in got2} == {EX + "clark", EX + "superman"}
    assert all(r["l"]["lex"] == "Clark Kent" for r in got2)


def test_materialize_guard_raises_on_clique_mass(spark):
    """rdfs_closure's materialize default guards against the crawl-
    scale O(Σ clique²) blow-up: above sameas_pair_limit it raises with
    an actionable pointer to sameas='canonical' instead of launching
    the replication (r8 VERDICT: the silent 10¹⁰-pair footgun)."""
    OWL = "http://www.w3.org/2002/07/owl#"
    rows = [
        (None, EX + "m0", OWL + "sameAs", Term.iri(EX + f"m{i}"))
        for i in range(1, 50)
    ]
    st = TripleStore.from_rows(spark, rows)
    with pytest.raises(ValueError, match="canonical"):
        rdfs_closure(st.statements, sameas_pair_limit=100)
    # under the limit (50² = 2500) the materialization proceeds
    closed = rdfs_closure(st.statements, sameas_pair_limit=10_000)
    assert closed.where(F.col("p") == OWL + "sameAs").count() == 50 * 49


def test_canonical_closure_rejects_nonpositive_rounds(spark):
    """max_rounds < 1 must raise up front, not AttributeError later
    (r8 ADVICE)."""
    OWL = "http://www.w3.org/2002/07/owl#"
    st = TripleStore.from_rows(
        spark, [(None, EX + "a", OWL + "sameAs", Term.iri(EX + "b"))])
    with pytest.raises(ValueError, match="max_rounds"):
        rdfs_closure(st.statements, max_rounds=0, sameas="canonical")


def test_gas_pinned_edges_unpersisted_after_return(spark):
    """The fixpoint loops pin a src-partitioned edge cache for the
    round joins (r10) — it must be freed before the algorithm returns,
    and the returned frame must stay computable afterwards (it is
    checkpointed, so nothing re-reads the cache)."""
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")

    def pinned(df):
        # exact-plan probe: is THIS loop's pinned edge frame still in
        # the cache manager?  (isEmpty() would be session-global and
        # trip on unrelated caches from earlier tests)
        return not cache_mgr.lookupCachedData(
            df.repartition(F.col("src"))._jdf).isEmpty()

    out = bfs(e, "a")
    # localCheckpoint RDDs remain (they ARE the results); the
    # DataFrame-level edge cache must not
    assert not pinned(e), "edge cache leaked from bfs"
    assert out.count() == 4  # still computable post-unpersist
    cc = connected_components(e)
    assert cc.where(F.col("component") == "a").count() == 4
