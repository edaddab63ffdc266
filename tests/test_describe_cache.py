"""DescribeCache — the reference DESCRIBE-cache subsystem analog
(bigdata-rdf/.../ast/cache/DescribeServiceFactory.java: changeset-driven
invalidation of materialized resource descriptions)."""

import pytest

from bigdata_old_spark.changesets import ChangeSet
from bigdata_old_spark.describe_cache import DescribeCache
from bigdata_old_spark.store import TripleStore

TTL = """
@prefix : <http://ex/> .
:a :p :b ; :q "lit" .
:b :p :c .
:c :p :a .
:d :p _:x .
_:x :p :e .
"""


def _rows(df):
    return sorted(
        (
            ("_:" + r["s"]["lex"]) if r["s"]["kind"] == 1 else r["s"]["lex"],
            r["p"]["lex"],
            r["o"]["kind"],
            r["o"]["lex"],
        )
        for r in df.collect()
    )


@pytest.fixture()
def store(spark):
    return TripleStore.from_turtle(spark, TTL)


def test_describe_cache_hit_serves_same_result(store):
    cache = DescribeCache(store)
    first = _rows(cache.describe("http://ex/a"))
    assert (cache.misses, cache.hits) == (1, 0)
    again = _rows(cache.describe("http://ex/a"))
    assert (cache.misses, cache.hits) == (1, 1)
    assert again == first == _rows(store.query("DESCRIBE <http://ex/a>"))


def test_update_touching_resource_invalidates(store):
    cache = DescribeCache(store)
    before = _rows(cache.describe("http://ex/a"))
    # :a appears in OBJECT position of the new statement — the reference
    # listener vectors s() AND o() (DescribeServiceFactory.java:186-191)
    cache.update("PREFIX : <http://ex/> INSERT DATA { :z :p :a }")
    assert cache.invalidations == 1
    after = _rows(cache.describe("http://ex/a"))
    assert cache.misses == 2  # recomputed, not served stale
    assert ("http://ex/z", "http://ex/p", 0, "http://ex/a") in after
    assert set(before) < set(after)


def test_update_elsewhere_keeps_entry_valid(store):
    cache = DescribeCache(store)
    before = _rows(cache.describe("http://ex/a"))
    cache.update("PREFIX : <http://ex/> INSERT DATA { :d :q :e }")
    assert cache.invalidations == 0
    assert _rows(cache.describe("http://ex/a")) == before
    assert cache.hits == 1  # served from cache after the unrelated update


def test_delete_invalidates_via_subject(store):
    cache = DescribeCache(store)
    cache.describe("http://ex/a")
    cache.update("PREFIX : <http://ex/> DELETE DATA { :a :q \"lit\" }")
    assert cache.invalidations == 1
    after = _rows(cache.describe("http://ex/a"))
    assert ("http://ex/a", "http://ex/q", 2, "lit") not in after


def test_bnode_interior_change_invalidates_cbd_entry(store):
    # CBD of :d closes through the bnode object _:x; a statement whose
    # subject is that interior bnode must invalidate :d's cached entry
    cache = DescribeCache(store, mode="CBD")
    before = _rows(cache.describe("http://ex/d"))
    assert any(s.startswith("_:") for s, _, _, _ in before)
    bnode = next(s for s, _, _, _ in before if s.startswith("_:"))
    new = cache.store.statements.sparkSession.createDataFrame(
        [(None, bnode, "http://ex/p", 0, "http://ex/f",
          None, None, None, None, None, None, 0)],
        cache.store.statements.schema,
    )
    from bigdata_old_spark.store import TripleStore as TS

    cache.change_event(ChangeSet("insertData", added=new))
    cache.rebind(TS(cache.store.spark, cache.store.statements.unionByName(new)))
    assert cache.invalidations == 1
    after = _rows(cache.describe("http://ex/d"))
    assert (bnode, "http://ex/p", 0, "http://ex/f") in after


def test_updated_stype_flips_ignored(store):
    # ChangeAction.UPDATED records do not invalidate
    # (DescribeServiceFactory.java:159-170)
    cache = DescribeCache(store)
    cache.describe("http://ex/a")
    flip = store.statements.limit(1)
    cache.change_event(ChangeSet("deleteData", updated=flip))
    assert cache.invalidations == 0
    cache.describe("http://ex/a")
    assert cache.hits == 1


def test_lru_eviction(store):
    cache = DescribeCache(store, max_entries=2)
    for iri in ("http://ex/a", "http://ex/b", "http://ex/c"):
        cache.describe(iri)
    assert len(cache._entries) == 2
    cache.describe("http://ex/a")  # evicted → recomputed
    assert cache.misses == 4
    cache.describe("http://ex/c")  # still resident
    assert cache.hits == 1
    # node back-references stay consistent after eviction
    assert all(cache._node_to_keys[n] for n in cache._node_to_keys)


def test_uncacheable_hot_entry_served_uncached(store):
    cache = DescribeCache(store, max_nodes=1)
    df = cache.describe("http://ex/a")
    assert df.count() > 0
    assert not cache._entries  # too many nodes to track — not cached
