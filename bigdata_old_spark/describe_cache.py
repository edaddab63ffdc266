"""Materialized DESCRIBE cache — the reference's DESCRIBE-cache
subsystem re-expressed over DataFrames.

Reference shape (bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/cache/):
  * ``DescribeServiceFactory.java:134-209`` registers a changeset
    listener (``DescribeCacheChangeLogListener``) that vectors the
    SUBJECT and OBJECT of every added/removed statement and invalidates
    those resources' cached descriptions — the "invalidation only"
    maintenance strategy documented at :110-127.
  * ``ChangeAction.UPDATED`` records (explicit/inferred stype flips)
    are ignored (:159-170) — they do not change the described triples.
  * ``DescribeCache.java`` / ``IDescribeCache.java`` hold the
    materialized description per resource IV.

Spark re-expression: each cached entry is a small persisted DataFrame
(the s/p/o term-struct rows DESCRIBE returns) plus the entry's node set
(every IRI/bnode appearing in subject or object position of the cached
description).  Invalidation joins an update's slim delta against the
cached node set — the delta never collects to the driver; only the
MATCHING nodes do, bounded by the cache's own size.  Descriptions are
single-resource neighborhoods, so per-entry materialization is small by
construction; an entry whose node set exceeds ``max_nodes`` is deemed
too hot to invalidate precisely and is served uncached instead (the
reference bounds its vectored invalidation set the same way —
``threshold = 10000``, DescribeServiceFactory.java:137).
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_old_spark.changesets import ChangeLog, ChangeSet


@dataclass
class _Entry:
    df: DataFrame
    nodes: set = field(default_factory=set)


class DescribeCache(ChangeLog):
    """LRU cache of materialized DESCRIBE results with changeset-driven
    invalidation (DescribeServiceFactory analog).

    Usage::

        cache = DescribeCache(store)
        cache.describe("urn:x")            # computes + materializes
        cache.describe("urn:x")            # serves from the cache
        cache.update("INSERT DATA {...}")  # mutates + invalidates +
                                           # rebinds cache.store

    When driving updates yourself, pass the cache as the change log and
    rebind: ``store = store.update(upd, change_log=cache);
    cache.rebind(store)`` — the IChangeLog contract has no commit-time
    store handle, so rebinding is the caller's job (the ``update``
    facade does both).
    """

    def __init__(self, store, mode: str | None = None, max_entries: int = 256,
                 max_nodes: int = 10000):
        self.store = store
        self.mode = mode
        self.max_entries = max_entries
        self.max_nodes = max_nodes  # reference listener threshold analog
        self._entries: OrderedDict[tuple[str, str | None], _Entry] = OrderedDict()
        self._node_to_keys: dict[str, set] = {}
        self.hits = 0
        self.misses = 0
        self.invalidations = 0

    # -- serving -------------------------------------------------------------
    def describe(self, iri: str, mode: str | None = None) -> DataFrame:
        """DESCRIBE <iri>, served from the cache when the description is
        still valid (no update has touched any node of the cached
        subgraph since it was materialized)."""
        key = (iri, mode or self.mode)
        ent = self._entries.get(key)
        if ent is not None:
            self._entries.move_to_end(key)
            self.hits += 1
            return ent.df
        self.misses += 1
        df = self.store.query(f"DESCRIBE <{iri}>", describe_mode=key[1])
        nodes = self._collect_nodes(df, iri)
        if nodes is None:
            return df  # too hot to invalidate precisely — serve uncached
        mat = df.persist()
        mat.count()  # materialize now: later hits are a cached-block scan
        ent = _Entry(mat, nodes)
        self._entries[key] = ent
        for n in nodes:
            self._node_to_keys.setdefault(n, set()).add(key)
        while len(self._entries) > self.max_entries:
            old_key, old = self._entries.popitem(last=False)
            self._drop(old_key, old)
        return mat

    def _collect_nodes(self, df: DataFrame, iri: str) -> set | None:
        # count DISTINCT NODES (what max_nodes bounds — the reference's
        # DescribeServiceFactory threshold is over described resources),
        # not distinct statement rows: a wide description with few
        # nodes must stay cacheable, and an accepted entry must never
        # exceed max_nodes nodes
        sn = df.select(
            F.when(F.col("s.kind") == 1, F.concat(F.lit("_:"), F.col("s.lex")))
            .otherwise(F.col("s.lex")).alias("n")
        )
        on = df.where(F.col("o.kind") != 2).select(
            F.when(F.col("o.kind") == 1, F.concat(F.lit("_:"), F.col("o.lex")))
            .otherwise(F.col("o.lex")).alias("n")
        )
        rows = (
            sn.unionByName(on).distinct().limit(self.max_nodes + 1).collect()
        )
        if len(rows) > self.max_nodes:
            return None
        return {iri} | {r["n"] for r in rows}

    # -- maintenance ---------------------------------------------------------
    def rebind(self, store) -> None:
        """Point the cache at the post-update store (valid entries keep
        serving — invalidation already removed every touched one)."""
        self.store = store

    def update(self, sparql_update: str):
        """Run a SPARQL UPDATE with this cache as the change log and
        rebind to the resulting store.  Returns the new store."""
        new_store = self.store.update(sparql_update, change_log=self)
        self.rebind(new_store)
        return new_store

    def invalidate(self, node: str) -> None:
        """Drop every cached description whose subgraph contains
        ``node`` (IRI verbatim; bnodes '_:'-prefixed)."""
        for key in list(self._node_to_keys.get(node, ())):
            ent = self._entries.pop(key, None)
            if ent is not None:
                self._drop(key, ent)
                self.invalidations += 1

    def _drop(self, key, ent: _Entry) -> None:
        ent.df.unpersist()
        for n in ent.nodes:
            keys = self._node_to_keys.get(n)
            if keys is not None:
                keys.discard(key)
                if not keys:
                    del self._node_to_keys[n]

    # -- IChangeLog hooks ------------------------------------------------
    def change_event(self, change: ChangeSet) -> None:
        """Vector the delta's subjects and objects against the cached
        node set (DescribeCacheChangeLogListener.changeEvent analog;
        ``updated`` stype flips are ignored per the reference)."""
        if not self._entries:
            return
        deltas = [d for d in (change.added, change.removed) if d is not None]
        if not deltas:
            return
        touched = None
        for d in deltas:
            t = d.select(F.col("s").alias("node")).unionByName(
                d.where(F.col("o_kind") != 2).select(
                    F.when(F.col("o_kind") == 1,
                           F.concat(F.lit("_:"), F.col("o_lex")))
                    .otherwise(F.col("o_lex")).alias("node")
                )
            )
            touched = t if touched is None else touched.unionByName(t)
        known = self.store.spark.createDataFrame(
            [(n,) for n in self._node_to_keys], "node string"
        )
        # only nodes that are BOTH in the delta and in the cache reach the
        # driver — bounded by the cache, not the update
        hits = touched.join(F.broadcast(known), "node", "left_semi").distinct().collect()
        for r in hits:
            self.invalidate(r["node"])

    def clear(self) -> None:
        for key, ent in list(self._entries.items()):
            self._drop(key, ent)
        self._entries.clear()
