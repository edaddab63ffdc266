"""History index — an ordered, queryable log of KB changes.

The reference's History Service (bigdata-rdf/.../service/history/
HistoryServiceFactory.java:30 — "tracks KB updates via an IChangeLog
and maintains an ordered index over the assertions that have been
added to or removed from a KB instance"; HistoryChangeRecord carries a
revisionTime) re-expressed on changesets: a HistoryLog is a ChangeLog
that stamps every committed transaction with a monotone revision
number and accumulates the per-op deltas as slim DataFrames.  ``scan``
is the service's range query: revision bounds (from inclusive, to
exclusive — the reference's fromTime/toTime contract) plus optional
predicate / action filters.

Scale shape: each commit's deltas are already checkpointed by the
update path, so ``history()`` is a union of materialized slices — at
production scale, append each commit's slice to a parquet table
partitioned by revision and scan that instead; the schema here is
exactly that table's schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_old_spark.changesets import ChangeLog, ChangeSet

ACTION_INSERTED = "INSERTED"
ACTION_REMOVED = "REMOVED"
ACTION_UPDATED = "UPDATED"


class HistoryLog(ChangeLog):
    """Collects committed change deltas as (revision, action, statement)
    rows (HistoryServiceFactory analog)."""

    def __init__(self) -> None:
        #: committed slices: list of (revision, action, statements DF)
        self._slices: list[tuple[int, str, DataFrame]] = []
        self._staged: list[ChangeSet] = []
        self.revision = 0  # last committed revision

    def transaction_begin(self) -> None:
        self._staged = []

    def change_event(self, change: ChangeSet) -> None:
        self._staged.append(change)

    def transaction_aborted(self) -> None:
        self._staged = []

    def transaction_committed(self) -> None:
        self.revision += 1
        for ch in self._staged:
            for action, df in (
                (ACTION_INSERTED, ch.added),
                (ACTION_REMOVED, ch.removed),
                (ACTION_UPDATED, ch.updated),
            ):
                if df is not None:
                    self._slices.append((self.revision, action, df))
        self._staged = []

    def history(self) -> DataFrame | None:
        """All recorded changes: revision | action | <statement cols>.
        None when nothing has been committed yet."""
        out = None
        for rev, action, df in self._slices:
            part = df.select(
                F.lit(rev).alias("revision"), F.lit(action).alias("action"), "*"
            )
            out = part if out is None else out.unionByName(part)
        return out

    def scan(
        self,
        from_rev: int | None = None,
        to_rev: int | None = None,
        p: str | None = None,
        action: str | None = None,
    ) -> DataFrame | None:
        """Range scan (HistoryServiceFactory.java:72 restrictions):
        ``from_rev`` inclusive, ``to_rev`` exclusive, optional predicate
        and action filters.  Revision bounds prune whole slices before
        any Spark work — the analog of the ordered index's key-range
        scan."""
        out = None
        for rev, act, df in self._slices:
            if from_rev is not None and rev < from_rev:
                continue
            if to_rev is not None and rev >= to_rev:
                continue
            if action is not None and act != action:
                continue
            part = df.select(
                F.lit(rev).alias("revision"), F.lit(act).alias("action"), "*"
            )
            if p is not None:
                part = part.where(F.col("p") == p)
            out = part if out is None else out.unionByName(part)
        return out
