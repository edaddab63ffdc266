"""Property-based check (hypothesis): a random chain of small SPARQL
UPDATE operations (INSERT DATA / DELETE DATA, default-graph and
GRAPH-scoped) over the r10 OLTP mutation path — eager checkpointed
insert deltas, predicate-pruned dedup probes, split hash anti-joins for
the unioned-default-graph wildcard delete, stats carry with
dirty-predicate recompute, and plan compaction every
MUTATION_COMPACT_DEPTH ops — always equals a driver-side model set
applying the reference's semantics (BigdataSail quads mode: an
unscoped DELETE DATA removes the (s,p,o) from EVERY graph when
``union_default_graph`` is on; a GRAPH-scoped one removes exactly its
quad; inserts are set-semantics).  Chains are long enough to cross the
compaction threshold, so the localCheckpoint swap is exercised too.

Also pins the stats carry EXACTNESS: after the chain, per-predicate
row counts and the max-per-(p,s) functionality bit must equal a
fresh store's full recompute — a stale carry here silently drops
star-join solutions (first(when) on a multi-valued predicate)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_old_spark.store import TripleStore

EX = "http://ex/"
PREDS = [EX + "p", EX + "q"]
SUBJ = [f"{EX}s{i}" for i in range(3)]
OBJ = [f"{EX}o{i}" for i in range(2)]
GRAPHS = [None, EX + "g1", EX + "g2"]

op_strategy = st.tuples(
    st.sampled_from(["ins", "del"]),
    st.sampled_from(SUBJ),
    st.sampled_from(PREDS),
    st.sampled_from(OBJ),
    st.sampled_from(GRAPHS),
)


def _sparql(kind, s, p, o, g):
    verb = "INSERT DATA" if kind == "ins" else "DELETE DATA"
    triple = f"<{s}> <{p}> <{o}>"
    body = triple if g is None else f"GRAPH <{g}> {{ {triple} }}"
    return f"{verb} {{ {body} }}"


def _apply_model(model: set, kind, s, p, o, g, union_flag: bool):
    quad = (s, p, o, g)
    if kind == "ins":
        model.add(quad)
    elif g is None and union_flag:
        # unioned-default-graph wildcard: remove the (s,p,o) from
        # EVERY graph (BigdataSail quads mode / Sesame null-context
        # removeStatements)
        model.difference_update(
            {q for q in model if (q[0], q[1], q[2]) == (s, p, o)})
    else:
        model.discard(quad)


def _store_quads(store) -> set:
    return {
        (r["s"], r["p"], r["o_lex"], r["g"])
        for r in store.statements.select("s", "p", "o_lex", "g").collect()
    }


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_strategy, min_size=1,
                    max_size=TripleStore.MUTATION_COMPACT_DEPTH + 4))
def test_mutation_chain_equals_model(spark, ops):
    st_ = TripleStore.from_turtle(spark, f"@prefix : <{EX}> . :seed :p :o0 .")
    st_.stats()  # prime the cache so every op exercises the carry path
    model = {(EX + "seed", EX + "p", EX + "o0", None)}
    for kind, s, p, o, g in ops:
        union_flag = st_.union_default_graph
        st_ = st_.update(_sparql(kind, s, p, o, g))
        _apply_model(model, kind, s, p, o, g, union_flag)
        assert _store_quads(st_) == model

    # stats carry exactness: exact counts and the functionality bit
    # must match a from-scratch recompute over the same statements
    carried = st_.stats()["by_p"]
    fresh = TripleStore(spark, st_.statements.localCheckpoint(eager=True))
    recomputed = fresh.stats()["by_p"]
    for p in set(carried) | set(recomputed):
        assert carried[p][0] == recomputed[p][0], p   # exact row count
        assert carried[p][3] == recomputed[p][3], p   # max per (p, s)
