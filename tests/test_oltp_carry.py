"""OLTP base-plan serving and plan-cache carry across mutations.

A mutation chain layers checkpointed deltas onto the statements plan.
Without care, that costs readers twice per writer swap: the union layer
breaks the bucketed store's zero-Exchange plan shape, and the fresh
store's empty plan cache forces every query back to a cold execution.
The r10 fix tracks the chain's BASE plan plus the touched-predicate
set: constant-predicate scans of untouched predicates compile against
the base (identical rows, pristine plan shape), and compiled plans
whose predicate footprint is disjoint from a mutation's touched set
carry to the new store as the SAME DataFrame (reusable shuffle stages
— measured: an 11-query mix after a swap dropped from ~18 s back to
the ~3.5 s warm latency on the sf0.1 bench store)."""

import pytest
from pyspark.sql import functions as F

from bigdata_old_spark.store import TripleStore

EX = "http://ex/"
P = f"PREFIX : <{EX}> "

TTL = f"""
@prefix : <{EX}> .
:a :p :b . :b :p :c .
:a :q 1 . :b :q 2 .
"""


@pytest.fixture()
def store(spark):
    return TripleStore.from_turtle(spark, TTL)


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_clean_pred_scan_serves_base_plan(store):
    """After a mutation touching only :marker, a :p-only query's plan
    must NOT contain the delta union — it reads the base plan."""
    st2 = store.update(P + "INSERT DATA { :m :marker :x }")
    assert st2._oltp_base is not None
    assert st2._oltp_dirty == {EX + "marker"}
    clean = st2.query(P + "SELECT ?s ?o WHERE { ?s :p ?o }")
    assert "Union" not in _plan(clean)
    assert clean.count() == 2
    # the dirty predicate reads the layered plan and sees the insert
    dirty = st2.query(P + "SELECT ?o WHERE { :m :marker ?o }")
    assert "Union" in _plan(dirty)
    assert dirty.count() == 1


def test_plan_cache_carries_disjoint_entries(store):
    """A compiled plan whose predicates are untouched by a mutation is
    carried as the SAME DataFrame; a touching one is dropped."""
    qp = P + "SELECT ?s ?o WHERE { ?s :p ?o }"
    qq = P + "SELECT ?s ?o WHERE { ?s :q ?o }"
    d_p, d_q = store.query(qp), store.query(qq)
    st2 = store.update(P + "INSERT DATA { :z :q 9 }")
    assert st2.query(qp) is d_p          # carried: :p untouched
    d_q2 = st2.query(qq)
    assert d_q2 is not d_q               # dropped: :q touched
    assert d_q2.count() == d_q.count() + 1


def test_variable_predicate_plans_never_carry(store):
    """?s ?p ?o scans every predicate — its cached plan must die on ANY
    mutation (a carried one would miss the new row)."""
    q = "SELECT ?s ?p ?o WHERE { ?s ?p ?o }"
    d1 = store.query(q)
    st2 = store.update(P + "INSERT DATA { :z :r 9 }")
    d2 = st2.query(q)
    assert d2 is not d1
    assert d2.count() == d1.count() + 1


def test_unknown_touch_set_drops_base_and_cache(store):
    """CLEAR's touched predicates are unknown driver-side: the base and
    every cached plan must be dropped, and results stay exact."""
    qp = P + "SELECT ?s ?o WHERE { ?s :p ?o }"
    store.query(qp)
    st2 = store.update(P + "INSERT DATA { GRAPH :g { :x :p :y } }")
    assert st2._oltp_base is not None
    st3 = st2.update("CLEAR ALL")
    assert st3._oltp_base is None
    assert st3._plan_cache == {}
    assert st3.query(qp).count() == 0


def test_compaction_with_base_stays_exact(store):
    """Crossing MUTATION_COMPACT_DEPTH with a live base compacts only
    the dirty predicates' rows; data and clean-plan serving survive."""
    st = store
    st.stats()
    n0 = st.statements.count()
    for i in range(TripleStore.MUTATION_COMPACT_DEPTH + 2):
        st = st.update(P + f"INSERT DATA {{ :w :marker {i} }}")
    assert st.statements.count() == n0 + TripleStore.MUTATION_COMPACT_DEPTH + 2
    assert st._oltp_base is not None
    clean = st.query(P + "SELECT ?s ?o WHERE { ?s :p ?o }")
    assert "Union" not in _plan(clean)
    assert clean.count() == 2
    got = {r["o"]["lex"] for r in
           st.query(P + "SELECT ?o WHERE { :w :marker ?o }").collect()}
    assert got == {str(i) for i in range(TripleStore.MUTATION_COMPACT_DEPTH + 2)}


def test_merged_view_rebuilds_from_base(spark):
    """A union-default-graph QUADS store's merged view must rebuild per
    swap as clean-from-base ∪ dedup(dirty rows) — exact (the (s,p,o)
    dedup groups by p, so it distributes over the predicate
    partitioning) and anchored on the pristine store's persisted merged
    blocks instead of a corpus-wide re-merge."""
    st = TripleStore.from_turtle(spark, TTL).update(
        P + "INSERT DATA { GRAPH :g { :a :p :b . :a :r :c } }")
    st._oltp_base = None  # treat this as the pristine chain start
    st._oltp_dirty = None
    assert st.union_default_graph and st.has_named_graphs
    base_merged = st.merged_default_graph()  # prime + persist

    st2 = st.update(P + "INSERT DATA { :n :r :m }")
    assert st2._oltp_base_merged is base_merged
    keys = ["s", "p", "o_kind", "o_lex", "o_dt", "o_lang"]

    def rows(df):
        return {tuple(r[k] for k in keys) for r in df.select(*keys).collect()}

    assert rows(st2.merged_default_graph()) == rows(
        st2.statements.dropDuplicates(keys))
    # union-default-graph query sees the duplicate-collapsed rows plus
    # the new dirty-predicate row
    got = {(r["s"]["lex"], r["o"]["lex"]) for r in st2.query(
        P + "SELECT ?s ?o WHERE { ?s :r ?o }").collect()}
    assert got == {(EX + "a", EX + "c"), (EX + "n", EX + "m")}
    # the clean predicate still collapses the cross-graph duplicate
    assert st2.query(
        P + "SELECT ?o WHERE { :a :p ?o }").count() == 1


def test_gsp_add_remove_carry(spark, store):
    """The Graph Store Protocol path (store.add/remove) tracks the same
    base/dirty bookkeeping as SPARQL UPDATE."""
    from bigdata_old_spark.model import Term, statements_df_from_terms

    qp = P + "SELECT ?s ?o WHERE { ?s :p ?o }"
    d1 = store.query(qp)
    add = statements_df_from_terms(
        [(None, EX + "n1", EX + "marker", Term.iri(EX + "n2"))], spark)
    st2 = store.add(add)
    assert st2._oltp_dirty == {EX + "marker"}
    assert st2.query(qp) is d1
    st3 = st2.remove(add)
    assert st3._oltp_dirty == {EX + "marker"}
    assert st3.query(qp) is d1
    assert st3.statements.where(F.col("p") == EX + "marker").count() == 0
