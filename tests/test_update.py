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


# ---------------------------------------------------------------------------
# Changesets — the IChangeLog analog (changesets/IChangeLog.java:39)
# ---------------------------------------------------------------------------

def _stmt_keys(df):
    return {
        (r["g"], r["s"], r["p"], r["o_kind"], r["o_lex"], r["o_dt"], r["o_lang"])
        for r in df.collect()
    }


def _assert_delta_matches_store_diff(before, after, changes):
    """Union of per-op added minus removed must equal the store diff."""
    b, a = _stmt_keys(before.statements), _stmt_keys(after.statements)
    added = set()
    removed = set()
    for ch in changes:
        if ch.added is not None:
            added |= _stmt_keys(ch.added)
        if ch.removed is not None:
            removed |= _stmt_keys(ch.removed)
    assert a - b == added - removed  # net inserts
    assert b - a == removed - added  # net deletes


def test_changelog_insert_delete_data(spark):
    from bigdata_old_spark.changesets import InMemChangeLog

    st = fresh(spark)
    log = InMemChangeLog()
    # the :a label insert is a no-op (already present) → empty delta;
    # the :zz delete is absent → empty delta
    st2 = st.update(
        P + 'INSERT DATA { :c rdfs:label "C" . :a rdfs:label "A" } ; '
            'DELETE DATA { :b rdfs:label "B" . :zz rdfs:label "ZZ" }',
        change_log=log,
    )
    assert log.committed and not log.aborted
    assert [c.op for c in log.changes] == ["InsertData", "DeleteData"]
    ins, dele = log.changes
    assert _stmt_keys(ins.added) == {
        (None, EX + "c", "http://www.w3.org/2000/01/rdf-schema#label", 2, "C",
         "http://www.w3.org/2001/XMLSchema#string", None)
    }
    assert {k[1] for k in _stmt_keys(dele.removed)} == {EX + "b"}
    _assert_delta_matches_store_diff(st, st2, log.changes)


def test_changelog_delete_insert_where(spark):
    from bigdata_old_spark.changesets import InMemChangeLog

    st = fresh(spark)
    log = InMemChangeLog()
    st2 = st.update(
        P + 'DELETE { ?x rdfs:label ?l } INSERT { ?x rdfs:label "renamed" } '
            'WHERE { ?x rdfs:label ?l }',
        change_log=log,
    )
    assert [c.op for c in log.changes] == ["DeleteInsert"]
    ch = log.changes[0]
    assert {k[4] for k in _stmt_keys(ch.removed)} == {"A", "B"}
    assert {k[4] for k in _stmt_keys(ch.added)} == {"renamed"}
    _assert_delta_matches_store_diff(st, st2, log.changes)


def test_changelog_clear_and_abort(spark):
    from bigdata_old_spark.changesets import InMemChangeLog

    st = fresh(spark).update(P + "INSERT DATA { GRAPH :g1 { :x :p :y } }")
    log = InMemChangeLog()
    st.update(P + "CLEAR GRAPH :g1", change_log=log)
    assert [c.op for c in log.changes] == ["Clear"]
    assert _stmt_keys(log.changes[0].removed) == {
        (EX + "g1", EX + "x", EX + "p", 0, EX + "y", None, None)
    }
    # abort path: a bad op raises AFTER begin → aborted, not committed
    log2 = InMemChangeLog()
    import pytest as _pytest
    with _pytest.raises(Exception):
        st.update("LOAD <file:///nonexistent-file.nt>", change_log=log2)
    assert log2.aborted and not log2.committed


def test_changelog_feeds_text_index(spark):
    """The incremental text-index maintenance consumes the SAME deltas
    the changelog reports (no separate diff computation)."""
    from bigdata_old_spark.changesets import InMemChangeLog
    from bigdata_old_spark.search import build_text_index

    st = fresh(spark)
    st._text_index = build_text_index(st.statements)
    log = InMemChangeLog()
    st2 = st.update(P + 'INSERT DATA { :d rdfs:label "delta indexed words" }', change_log=log)
    assert st2._text_index is not None
    hits = st2.query(
        P + 'PREFIX bds: <http://www.bigdata.com/rdf/search#> '
            'SELECT ?s WHERE { ?o bds:search "delta" . ?s rdfs:label ?o }'
    ).collect()
    assert [r["s"]["lex"] for r in hits] == [EX + "d"]
    _assert_delta_matches_store_diff(st, st2, log.changes)


def test_load_closure_batch(spark, tmp_path):
    """DataLoader ClosureEnum analog (store/DataLoader.java:76):
    LOAD with load_closure='batch' ≡ plain LOAD + manual closure."""
    nt = tmp_path / "data.nt"
    nt.write_text(
        '<http://example.org/sub> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <http://example.org/Sup> .\n'
        '<http://example.org/i> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example.org/sub> .\n'
    )
    base = fresh(spark)

    manual = base.update(f"LOAD <file://{nt}>").closure()

    st = fresh(spark)
    st.load_closure = "batch"
    auto = st.update(f"LOAD <file://{nt}>")

    assert _stmt_keys(auto.statements) == _stmt_keys(manual.statements)
    # the inferred type triple is present and stype-tagged
    inf = auto.statements.where(
        (F.col("s") == EX + "i") & (F.col("o_lex") == EX + "Sup")
    ).collect()
    assert len(inf) == 1 and inf[0]["stype"] != 0


def test_from_turtle_closure_option(spark):
    ttl = """@prefix : <http://example.org/> .
             @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
             :A rdfs:subClassOf :B .  :x a :A ."""
    auto = TripleStore.from_turtle(spark, ttl, closure="batch")
    manual = TripleStore.from_turtle(spark, ttl).closure()
    assert _stmt_keys(auto.statements) == _stmt_keys(manual.statements)
    assert auto.query(
        P + "ASK { :x a :B }"
    ).collect()[0]["ask"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        TripleStore.from_turtle(spark, ttl, closure="bogus")


# ---------------------------------------------------------------------------
# Truth maintenance — TestChangeSets.java testTMAdd/testTMRetract/
# testTMUpdate semantics via batch re-derivation (axiom triples are not
# modeled — the documented closure deviation — so the inferred sets are
# membership-checked rather than compared verbatim)
# ---------------------------------------------------------------------------

_SUBC = "http://www.w3.org/2000/01/rdf-schema#subClassOf"


def _tm_store(spark):
    st = TripleStore.from_turtle(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :z :unrelated :w .""",
    )
    st.truth_maintenance = True
    return st


def _key(df_rows, s, o):
    return [r for r in df_rows if r["s"] == s and r["o_lex"] == o and r["p"] == _SUBC]


def test_tm_add_infers_and_readd_is_noop(spark):
    """testTMAdd: adding premises records explicit AND inferred
    insertions; re-adding the same data records nothing."""
    from bigdata_old_spark.changesets import InMemChangeLog

    ins = P + "INSERT DATA { :A rdfs:subClassOf :B . :B rdfs:subClassOf :C }"
    log = InMemChangeLog()
    st1 = _tm_store(spark).update(ins, change_log=log)
    ch = log.changes[0]
    rows = ch.added.collect()
    assert _key(rows, EX + "A", EX + "B")[0]["stype"] == 0   # explicit premise
    assert _key(rows, EX + "B", EX + "C")[0]["stype"] == 0
    assert _key(rows, EX + "A", EX + "C")[0]["stype"] == 2   # inferred A⊑C
    assert ch.removed.count() == 0 and ch.updated.count() == 0
    # the store IS the closure
    assert len(_key(st1.statements.collect(), EX + "A", EX + "C")) == 1
    # re-add: no change records at all (reference: empty commit log)
    log2 = InMemChangeLog()
    st2 = st1.update(ins, change_log=log2)
    ch2 = log2.changes[0]
    assert ch2.added.count() == 0 and ch2.removed.count() == 0 and ch2.updated.count() == 0
    assert st2.statements.count() == st1.statements.count()


def test_tm_retract_removes_unprovable_inferences(spark):
    """testTMRetract: retracting a premise also removes the inferences
    that are no longer provable."""
    from bigdata_old_spark.changesets import InMemChangeLog

    st = _tm_store(spark).update(
        P + "INSERT DATA { :A rdfs:subClassOf :B . :B rdfs:subClassOf :C }"
    )
    log = InMemChangeLog()
    st2 = st.update(P + "DELETE DATA { :B rdfs:subClassOf :C }", change_log=log)
    ch = log.changes[0]
    removed = ch.removed.collect()
    assert _key(removed, EX + "B", EX + "C")[0]["stype"] == 0  # the premise
    assert _key(removed, EX + "A", EX + "C")[0]["stype"] == 2  # its inference
    stmts = st2.statements.collect()
    assert not _key(stmts, EX + "A", EX + "C")
    assert _key(stmts, EX + "A", EX + "B")  # untouched premise survives


def test_tm_upgrade_and_downgrade(spark):
    """testTMUpdate: adding an already-provable inference explicitly is
    an UPDATED (inferred→explicit) flip; removing it while still
    provable is an UPDATED (explicit→inferred) flip, not a removal."""
    from bigdata_old_spark.changesets import InMemChangeLog

    st = _tm_store(spark).update(
        P + "INSERT DATA { :A rdfs:subClassOf :B . :B rdfs:subClassOf :C }"
    )
    log = InMemChangeLog()
    st2 = st.update(P + "INSERT DATA { :A rdfs:subClassOf :C }", change_log=log)
    ch = log.changes[0]
    assert ch.added.count() == 0 and ch.removed.count() == 0
    up = ch.updated.collect()
    assert len(up) == 1 and _key(up, EX + "A", EX + "C")[0]["stype"] == 0
    assert _key(st2.statements.collect(), EX + "A", EX + "C")[0]["stype"] == 0

    log2 = InMemChangeLog()
    st3 = st2.update(P + "DELETE DATA { :A rdfs:subClassOf :C }", change_log=log2)
    ch2 = log2.changes[0]
    assert ch2.added.count() == 0 and ch2.removed.count() == 0
    down = ch2.updated.collect()
    assert len(down) == 1 and _key(down, EX + "A", EX + "C")[0]["stype"] == 2
    assert _key(st3.statements.collect(), EX + "A", EX + "C")[0]["stype"] == 2


def test_tm_where_sees_inferences(spark):
    """ADVICE r5: under truth maintenance, a DELETE/INSERT WHERE pattern
    that only matches via an INFERRED triple must still bind — the
    reference evaluates UPDATE WHERE clauses with includeInferred
    (BigdataSail TM); the templates still mutate the explicit subset."""
    st = _tm_store(spark).update(
        P + "INSERT DATA { :A rdfs:subClassOf :B . :B rdfs:subClassOf :C }"
    )
    # (:A ⊑ :C) exists only as an inference
    st2 = st.update(P + "INSERT { :A :provably :C } WHERE { :A rdfs:subClassOf :C }")
    assert st2.query(P + "ASK { :A :provably :C }").collect()[0]["ask"]
    # DELETE whose WHERE binds through the inferred triple
    st3 = st2.update(
        P + "DELETE { :A :provably ?o } WHERE { :A rdfs:subClassOf ?o . :A :provably ?o }"
    )
    assert not st3.query(P + "ASK { :A :provably :C }").collect()[0]["ask"]


def test_tm_clear_graph_rederives(spark):
    """ADVICE r5: CLEAR GRAPH routes through truth maintenance —
    inferences whose premises were cleared disappear."""
    st = _tm_store(spark).update(
        P + "INSERT DATA { GRAPH :g1 { :A rdfs:subClassOf :B . :B rdfs:subClassOf :C } }"
    )
    assert st.query(P + "ASK { :A rdfs:subClassOf :C }").collect()[0]["ask"]
    st2 = st.update(P + "CLEAR GRAPH :g1")
    assert not st2.query(P + "ASK { :A rdfs:subClassOf :C }").collect()[0]["ask"]
    # the unrelated base triple survives
    assert st2.query(P + "ASK { :z :unrelated :w }").collect()[0]["ask"]


# ---------------------------------------------------------------------------
# Incremental truth maintenance (VERDICT r5 #1 — TruthMaintenance.java:110
# assertion path: close the DELTA against the database, not the world)
# ---------------------------------------------------------------------------


def _closed_tm_store(spark, ttl):
    st = TripleStore.from_turtle(spark, ttl, closure="batch")
    st.truth_maintenance = True
    return st


def test_tm_incremental_add_is_delta_driven(spark):
    """A pure instance-level addition on a closed TM store derives its
    consequences from the DELTA (incremental_closure) — the full
    rdfs_closure is NOT invoked — and the result equals the full
    re-derivation."""
    from bigdata_old_spark import inference

    st = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :A rdfs:subClassOf :B . :B rdfs:subClassOf :C .
           :p rdfs:domain :A .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    inc_before = inference.INCREMENTAL_RUNS
    st2 = st.update(P + "INSERT DATA { :x :p :y }")
    assert inference.FULL_CLOSURE_RUNS == full_before  # no full re-closure
    assert inference.INCREMENTAL_RUNS == inc_before + 1
    # rdfs2 (domain) + rdfs9 (subclass chain) fire off the delta
    for cls in (":A", ":B", ":C"):
        assert st2.query(P + "ASK { :x a %s }" % cls).collect()[0]["ask"]
    # byte-identical to the batch re-derivation
    full = inference.rdfs_closure(st2.statements.where("stype != 2"))
    assert {tuple(r) for r in st2.statements.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_tm_incremental_owl_instance_rules(spark):
    """Transitive / sameAs instance rules fire semi-naively off the
    delta (Δ⋈closure both directions; replication across static
    equivalence classes)."""
    from bigdata_old_spark import inference

    st = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix owl: <http://www.w3.org/2002/07/owl#> .
           :knows a owl:TransitiveProperty .
           :a :knows :b .
           :m owl:sameAs :n .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    st2 = st.update(P + "INSERT DATA { :b :knows :c . :m :likes :v }")
    st3 = st2.update(P + "INSERT DATA { :c :knows :d }")
    assert inference.FULL_CLOSURE_RUNS == full_before
    assert st2.query(P + "ASK { :a :knows :c }").collect()[0]["ask"]
    assert st2.query(P + "ASK { :n :likes :v }").collect()[0]["ask"]
    assert st3.query(P + "ASK { :a :knows :d }").collect()[0]["ask"]
    full = inference.rdfs_closure(st3.statements.where("stype != 2"))
    assert {tuple(r) for r in st3.statements.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_tm_incremental_flip_and_noop(spark):
    """Explicit re-add of an already-inferred fact flips stype via the
    incremental path; re-adding existing explicit data is a no-op."""
    from bigdata_old_spark import inference
    from bigdata_old_spark.changesets import InMemChangeLog

    st = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :p rdfs:domain :A .
           :x :p :y .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    log = InMemChangeLog()
    st2 = st.update(P + "INSERT DATA { :x a :A }", change_log=log)
    assert inference.FULL_CLOSURE_RUNS == full_before
    ch = log.changes[0]
    assert ch.added.count() == 0 and ch.removed.count() == 0
    up = ch.updated.collect()
    assert len(up) == 1 and up[0]["stype"] == 0  # inferred → explicit
    assert [
        r["stype"]
        for r in st2.statements.collect()
        if r["s"].endswith("x") and r["p"].endswith("type")
    ] == [0]


def test_tm_incremental_schema_or_fp_delta_falls_back(spark):
    """Deltas that touch schema vocabulary — or fire a sameAs-GENERATING
    rule (FunctionalProperty) — re-close in full, and the results are
    still right."""
    from bigdata_old_spark import inference

    st = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :A rdfs:subClassOf :B .
           :x a :A .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    st2 = st.update(P + "INSERT DATA { :B rdfs:subClassOf :C }")
    assert inference.FULL_CLOSURE_RUNS == full_before + 1  # schema → full path
    assert st2.query(P + "ASK { :x a :C }").collect()[0]["ask"]

    st3 = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix owl: <http://www.w3.org/2002/07/owl#> .
           :ssn a owl:FunctionalProperty .
           :a :ssn :s1 .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    st4 = st3.update(P + "INSERT DATA { :a :ssn :s2 }")
    assert inference.FULL_CLOSURE_RUNS == full_before + 1  # FP delta → full path
    assert st4.query(
        P + "PREFIX owl: <http://www.w3.org/2002/07/owl#> ASK { :s1 owl:sameAs :s2 }"
    ).collect()[0]["ask"]


def test_tm_incremental_derived_schema_fact_falls_back(spark):
    """ADVICE r6 (inference.py:660): a pure-instance raw delta can still
    DERIVE a schema fact when the base makes an instance predicate a
    sub-property of schema vocabulary (:myP ⊑p rdfs:subClassOf + delta
    ':D :myP :E' derives ':D rdfs:subClassOf :E' via rdfs7).  The frozen
    schema snapshot cannot absorb that — the frontier check must punt to
    full closure so ':x a :E' (x typed :D) is derived, not silently
    dropped as a non-fixpoint."""
    from bigdata_old_spark import inference

    st = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :myP rdfs:subPropertyOf rdfs:subClassOf .
           :x a :D .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    st2 = st.update(P + "INSERT DATA { :D :myP :E }")
    assert inference.FULL_CLOSURE_RUNS == full_before + 1  # punted to full
    assert st2.query(P + "ASK { :D rdfs:subClassOf :E }").collect()[0]["ask"]
    assert st2.query(P + "ASK { :x a :E }").collect()[0]["ask"]
    # result is a true fixpoint ≡ batch re-derivation
    full = inference.rdfs_closure(st2.statements.where("stype != 2"))
    assert {tuple(r) for r in st2.statements.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_tm_retraction_is_cone_scoped(spark):
    """VERDICT r6 #3 (TruthMaintenance.java:110 retraction path): a
    pure instance-level DELETE removes and re-derives only the
    retracted delta's affected cone — FULL_CLOSURE_RUNS must not move —
    and the result is byte-identical to the batch re-derivation.
    Covers: lost-only-derivation (x∈A gone), alternate-support survival
    (x∈C still provable through the explicit x∈B), and untouched
    subjects (z)."""
    from bigdata_old_spark import inference

    st = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :A rdfs:subClassOf :B . :B rdfs:subClassOf :C .
           :p rdfs:domain :A .
           :x :p :y .
           :x a :B .
           :z a :A .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    retr_before = inference.RETRACTION_RUNS
    st2 = st.update(P + "DELETE DATA { :x :p :y }")
    assert inference.FULL_CLOSURE_RUNS == full_before  # no full re-closure
    assert inference.RETRACTION_RUNS == retr_before + 1
    assert not st2.query(P + "ASK { :x :p :y }").collect()[0]["ask"]
    assert not st2.query(P + "ASK { :x a :A }").collect()[0]["ask"]  # only via :p
    assert st2.query(P + "ASK { :x a :B }").collect()[0]["ask"]  # explicit
    assert st2.query(P + "ASK { :x a :C }").collect()[0]["ask"]  # via B⊑C
    assert st2.query(P + "ASK { :z a :B }").collect()[0]["ask"]  # untouched
    full = inference.rdfs_closure(st2.statements.where("stype != 2"))
    assert {tuple(r) for r in st2.statements.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_tm_retraction_transitive_chain(spark):
    """Cone over a transitive predicate: retracting the middle link
    kills every closure fact that rode through it, keeps the rest."""
    from bigdata_old_spark import inference

    st = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix owl: <http://www.w3.org/2002/07/owl#> .
           :knows a owl:TransitiveProperty .
           :a :knows :b . :b :knows :c . :c :knows :d .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    st2 = st.update(P + "DELETE DATA { :a :knows :b }")
    assert inference.FULL_CLOSURE_RUNS == full_before
    for pair, want in [
        (":a :knows :b", False), (":a :knows :c", False), (":a :knows :d", False),
        (":b :knows :c", True), (":b :knows :d", True), (":c :knows :d", True),
    ]:
        assert st2.query(P + f"ASK {{ {pair} }}").collect()[0]["ask"] is want, pair
    full = inference.rdfs_closure(st2.statements.where("stype != 2"))
    assert {tuple(r) for r in st2.statements.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_tm_retract_still_provable_flips_incrementally(spark):
    """The explicit→inferred downgrade flip (testTMUpdate) through the
    INCREMENTAL retraction path: the retracted explicit fact is
    re-derived into the closure as inferred and reported in updated."""
    from bigdata_old_spark import inference
    from bigdata_old_spark.changesets import InMemChangeLog

    st = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :p rdfs:domain :A .
           :x :p :y .
           :x a :A .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    log = InMemChangeLog()
    st2 = st.update(P + "DELETE DATA { :x a :A }", change_log=log)
    assert inference.FULL_CLOSURE_RUNS == full_before
    ch = log.changes[0]
    assert ch.added.count() == 0 and ch.removed.count() == 0
    up = ch.updated.collect()
    assert len(up) == 1 and up[0]["stype"] == 2  # explicit → inferred
    assert st2.query(P + "ASK { :x a :A }").collect()[0]["ask"]


def test_tm_retraction_schema_or_fp_falls_back(spark):
    """Schema-touching retractions (and retractions over a
    sameAs-generating FunctionalProperty) still re-close in full."""
    from bigdata_old_spark import inference

    st = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :A rdfs:subClassOf :B . :B rdfs:subClassOf :C .
           :x a :A .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    st2 = st.update(P + "DELETE DATA { :B rdfs:subClassOf :C }")
    assert inference.FULL_CLOSURE_RUNS == full_before + 1  # schema → full
    assert not st2.query(P + "ASK { :x a :C }").collect()[0]["ask"]

    st3 = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix owl: <http://www.w3.org/2002/07/owl#> .
           :ssn a owl:FunctionalProperty .
           :a :ssn :s1 . :a :ssn :s2 . :s1 :tag :t .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    st4 = st3.update(P + "DELETE DATA { :a :ssn :s2 }")
    assert inference.FULL_CLOSURE_RUNS == full_before + 1  # FP → full
    assert not st4.query(
        P + "PREFIX owl: <http://www.w3.org/2002/07/owl#> ASK { :s1 owl:sameAs :s2 }"
    ).collect()[0]["ask"]


def test_tm_delete_insert_combines_both_incremental_paths(spark):
    """A DELETE/INSERT WHERE under TM applies retraction_closure then
    incremental_closure — no full re-closure — and matches batch."""
    from bigdata_old_spark import inference

    st = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :p rdfs:domain :A . :q rdfs:domain :B .
           :x :p :y .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    st2 = st.update(P + "DELETE { :x :p ?o } INSERT { :x :q ?o } WHERE { :x :p ?o }")
    assert inference.FULL_CLOSURE_RUNS == full_before
    assert not st2.query(P + "ASK { :x a :A }").collect()[0]["ask"]
    assert st2.query(P + "ASK { :x a :B }").collect()[0]["ask"]
    assert st2.query(P + "ASK { :x :q :y }").collect()[0]["ask"]
    full = inference.rdfs_closure(st2.statements.where("stype != 2"))
    assert {tuple(r) for r in st2.statements.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_tm_incremental_plain_add_stays_incremental(spark):
    """Counter-assert for the frontier schema check: an ordinary
    instance delta (whose frontier contains only the harmless reflexive
    P ⊑p P facts) must NOT punt to full closure."""
    from bigdata_old_spark import inference

    st = _closed_tm_store(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :A rdfs:subClassOf :B .""",
    )
    full_before = inference.FULL_CLOSURE_RUNS
    inc_before = inference.INCREMENTAL_RUNS
    # :brandNewP has never been seen → rdf1/rdfs6 emit reflexive ⊑p
    st2 = st.update(P + "INSERT DATA { :u :brandNewP :v . :u a :A }")
    assert inference.FULL_CLOSURE_RUNS == full_before
    assert inference.INCREMENTAL_RUNS == inc_before + 1
    assert st2.query(P + "ASK { :u a :B }").collect()[0]["ask"]


# ---------------------------------------------------------------------------
# USING / USING NAMED dataset scoping (AST2BOpUpdate.java:378-416 —
# the WHERE clause of DELETE/INSERT evaluates against the update's
# dataset exactly as FROM/FROM NAMED scopes a query)
# ---------------------------------------------------------------------------


def _using_store(spark):
    """default: a/A b/B; g1: a/A; g2: a/A b/B."""
    return TripleStore.from_turtle(
        spark,
        """@prefix : <http://example.org/> .
           @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           :a rdfs:label "A" . :b rdfs:label "B" .""",
    ).update(
        P
        + 'INSERT DATA { GRAPH :g1 { :a rdfs:label "A" } '
        + 'GRAPH :g2 { :a rdfs:label "A" . :b rdfs:label "B" } }'
    )


LBL = "http://www.w3.org/2000/01/rdf-schema#label"


def test_using_scopes_where(spark):
    """USING :g1 → WHERE sees only g1 (binds only :a), so only :a's
    default-graph label is deleted; unscoped would delete both."""
    st = _using_store(spark).update(
        P + "DELETE { ?x rdfs:label ?l } USING :g1 WHERE { ?x rdfs:label ?l }"
    )
    left = st.statements.where(F.col("g").isNull() & (F.col("p") == LBL))
    assert [r["o_lex"] for r in left.collect()] == ["B"]
    # unscoped delete template in union-default-graph mode removes the
    # matched (s,p,o) from EVERY graph (reference removeStatements with
    # null context; TestSparqlUpdate.testDeleteInsertWhere parity):
    # :a/"A" disappears from g1 and g2; :b/"B" in g2 survives because
    # USING :g1 kept :b out of the WHERE solutions
    assert st.statements.where(F.col("g").isNotNull()).count() == 1
    assert st.statements.where(
        (F.col("g") == EX + "g2") & (F.col("o_lex") == "B")).count() == 1


def test_unscoped_differs_from_using(spark):
    """Control: the same update WITHOUT USING deletes both labels
    (quads-mode union default graph) — proving USING changed behavior."""
    st = _using_store(spark).update(
        P + "DELETE { ?x rdfs:label ?l } WHERE { ?x rdfs:label ?l }"
    )
    assert st.statements.where(F.col("g").isNull() & (F.col("p") == LBL)).count() == 0


def test_using_named_graph_var(spark):
    """USING NAMED :g1 + GRAPH ?g → ?g ranges over {g1} only."""
    st = _using_store(spark).update(
        P
        + "DELETE { GRAPH ?g { ?x rdfs:label ?l } } USING NAMED :g1 "
        + "WHERE { GRAPH ?g { ?x rdfs:label ?l } }"
    )
    assert st.statements.where(F.col("g") == EX + "g1").count() == 0
    assert st.statements.where(F.col("g") == EX + "g2").count() == 2
    assert st.statements.where(F.col("g").isNull()).count() == 2


def test_using_without_named_empties_graph_pattern(spark):
    """USING alone → the named-graph set is EMPTY, so GRAPH ?g matches
    nothing and the update is a no-op."""
    before = _using_store(spark)
    st = before.update(
        P
        + "DELETE { GRAPH ?g { ?x rdfs:label ?l } } USING :g1 "
        + "WHERE { GRAPH ?g { ?x rdfs:label ?l } }"
    )
    assert st.statements.count() == before.statements.count()


def test_using_named_alone_empties_default(spark):
    """USING NAMED alone → WHERE's default graph is EMPTY."""
    before = _using_store(spark)
    st = before.update(
        P
        + "DELETE { ?x rdfs:label ?l } USING NAMED :g1 "
        + "WHERE { ?x rdfs:label ?l }"
    )
    assert st.statements.count() == before.statements.count()


def test_with_plus_using_precedence(spark):
    """WITH scopes only the templates when USING is present (SPARQL 1.1
    Update §3.1.3): WHERE over g1 binds only :a, template deletes from
    g2 → g2 keeps :b, default + g1 untouched."""
    st = _using_store(spark).update(
        P
        + "WITH :g2 DELETE { ?x rdfs:label ?l } USING :g1 "
        + "WHERE { ?x rdfs:label ?l }"
    )
    g2 = st.statements.where(F.col("g") == EX + "g2")
    assert [r["o_lex"] for r in g2.collect()] == ["B"]
    assert st.statements.where(F.col("g").isNull()).count() == 2
    assert st.statements.where(F.col("g") == EX + "g1").count() == 1


def test_using_insert(spark):
    """INSERT path: copy g1's labels into g3 via USING."""
    st = _using_store(spark).update(
        P
        + "INSERT { GRAPH :g3 { ?x rdfs:label ?l } } USING :g1 "
        + "WHERE { ?x rdfs:label ?l }"
    )
    g3 = st.statements.where(F.col("g") == EX + "g3")
    assert [(r["s"], r["o_lex"]) for r in g3.collect()] == [(EX + "a", "A")]


def test_template_bnode_minted_per_duplicate_solution(spark):
    """SPARQL 1.1 Update §3.1.3: a template [] mints ONE fresh bnode per
    WHERE solution under bag semantics — duplicate solutions (here the
    self-UNION) must NOT coincide on one node (ADVICE r8: the old
    content-hash label collapsed them)."""
    st = fresh(spark).update(P + """
        INSERT { ?x :tag [] }
        WHERE { { ?x :linked :b } UNION { ?x :linked :b } }""")
    tags = st.statements.where(F.col("p") == EX + "tag").collect()
    assert len(tags) == 2
    assert len({r["o_lex"] for r in tags}) == 2  # distinct bnodes
    # and distinct requests mint distinct nodes too
    st2 = st.update(P + "INSERT { ?x :tag [] } WHERE { ?x :linked :b }")
    assert st2.statements.where(F.col("p") == EX + "tag").count() == 3


def test_template_bnode_shared_within_solution(spark):
    """The SAME template bnode label appearing in two template triples
    of one solution is one node (ASTConstructIterator parity)."""
    st = fresh(spark).update(P + """
        INSERT { ?x :tag _:n . _:n rdfs:label "t" }
        WHERE { ?x :linked :b }""")
    tag = st.statements.where(F.col("p") == EX + "tag").collect()
    lbl = st.statements.where(
        (F.col("p") == "http://www.w3.org/2000/01/rdf-schema#label")
        & (F.col("o_lex") == "t")).collect()
    assert len(tag) == 1 and len(lbl) == 1
    assert tag[0]["o_lex"] == lbl[0]["s"].removeprefix("_:")


# -- round 10: OLTP mutation-path scale fixes ---------------------------------

def test_insert_updates_functional_stats(spark):
    """Stats carry across mutations with a DIRTY-predicate recompute —
    and the recompute must be EXACT: an insert that makes a previously
    functional predicate multi-valued must flip the star-join planner
    off the first(when) scalar path, or the second value silently
    drops."""
    st = TripleStore.from_turtle(spark, """
        @prefix : <http://example.org/> .
        :a :v 1 . :a :w 2 . :a :u 3 .
        :b :v 9 . :b :w 8 . :b :u 7 .
    """)
    st.stats()  # prime the cache: :v is functional here
    assert st.stats()["by_p"][EX + "v"][3] == 1
    st2 = st.update(P + "INSERT DATA { :a :v 99 }")
    rows = st2.query(
        P + "SELECT ?x ?v ?w ?u WHERE { ?x :v ?v . ?x :w ?w . ?x :u ?u }"
    ).collect()
    vals = {(r["x"]["lex"], r["v"]["lex"]) for r in rows}
    assert (EX + "a", "1") in vals and (EX + "a", "99") in vals
    assert st2.stats()["by_p"][EX + "v"][3] == 2  # recomputed, exact


def test_mutation_chain_compacts(spark):
    """Chained small updates must not grow the read plan without bound:
    the statements plan compacts every MUTATION_COMPACT_DEPTH ops (the
    journal-compaction analog) and the data stays exact."""
    st = fresh(spark)
    n0 = st.statements.count()
    for i in range(TripleStore.MUTATION_COMPACT_DEPTH + 2):
        st = st.update(P + f"INSERT DATA {{ :x{i} :linked :b }}")
    assert st._mut_depth < TripleStore.MUTATION_COMPACT_DEPTH
    assert st.statements.count() == n0 + TripleStore.MUTATION_COMPACT_DEPTH + 2


def test_wildcard_delete_plans_hash_join(spark):
    """The unioned-default-graph wildcard delete must compile to HASH
    anti-joins (graph-bound and null-graph victim sets split), never a
    BroadcastNestedLoopJoin — a corpus × victims nested loop per
    mutation layer wedged the r10 writer-mix benchmark."""
    st = fresh(spark).update(P + 'INSERT DATA { GRAPH :g1 { :q :linked :b } }')
    assert st.union_default_graph
    st2 = st.update(P + "DELETE DATA { :q :linked :b }")  # wildcard ctx
    assert st2.query(P + "ASK { :q :linked :b }").collect()[0]["ask"] is False
    plan = st2.statements._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_reader_store_unaffected_by_lazy_victims(spark):
    """DELETE DATA of an absent triple leaves results exact (the lazy
    victim anti-join matches nothing) and repeated inserts of the SAME
    triple stay idempotent through the pruned dedup probe."""
    st = fresh(spark)
    st = st.update(P + "DELETE DATA { :nosuch :linked :b }")
    st = st.update(P + "INSERT DATA { :a :linked :b }")  # already present
    st = st.update(P + "INSERT DATA { :a :linked :b }")
    assert st.statements.where(
        (F.col("s") == EX + "a") & (F.col("p") == EX + "linked")).count() == 1
