"""History index — a durable, ordered, queryable log of KB changes.

The reference's History Service (bigdata-rdf/.../service/history/
HistoryServiceFactory.java:30 — "tracks KB updates via an IChangeLog
and maintains an ordered index over the assertions that have been
added to or removed from a KB instance"; HistoryChangeRecord carries a
revisionTime) re-expressed on changesets: a HistoryLog is a ChangeLog
that stamps every committed transaction with a monotone revision
number and APPENDS the per-op deltas to a parquet table partitioned by
(revision, action) — the Spark analog of the service's persistent
ordered B+Tree index.  ``scan`` is the service's range query: revision
bounds (from inclusive, to exclusive — the reference's fromTime/toTime
contract) plus optional predicate / action filters; the revision and
action predicates prune whole partition directories before any row is
read (the ordered index's key-range scan), and the predicate filter
pushes down to the parquet scan.

Scale shape: the driver holds only the path and the revision counter —
never the slices — so plan size and driver memory stay FLAT in the
number of commits (a thousand commits is a thousand partition
directories, one partition-pruned read), unlike a unionByName chain
whose analysis cost grows with every commit.  Each commit's deltas are
already checkpointed by the update path, so the append writes
materialized rows.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_old_spark.changesets import ChangeLog, ChangeSet

ACTION_INSERTED = "INSERTED"
ACTION_REMOVED = "REMOVED"
ACTION_UPDATED = "UPDATED"


class HistoryLog(ChangeLog):
    """Durable history index over committed change deltas
    (HistoryServiceFactory analog).

    ``path``: directory of the revision-partitioned parquet table; a
    fresh temp directory when omitted.  Re-opening a path with existing
    history resumes the revision counter from the recorded maximum, so
    the log survives process restarts (the reference's index lives in
    the journal the same way).
    """

    def __init__(self, path: str | None = None) -> None:
        self._path = path or tempfile.mkdtemp(prefix="bdos_history_")
        self._staged: list[ChangeSet] = []
        # resolved lazily: resuming from partition dirs needs a
        # SparkSession, which may not exist yet at construction time
        self._revision: int | None = None

    @property
    def revision(self) -> int:
        if self._revision is None:
            self._revision = self._resume_revision()
        return self._revision

    @revision.setter
    def revision(self, value: int) -> None:
        self._revision = value

    # -- write side ---------------------------------------------------------

    def _marker(self) -> str:
        # leading "_" keeps the file invisible to spark.read.parquet
        return os.path.join(self._path, "_revision")

    def _resume_revision(self) -> int:
        # the marker persists the counter across restarts even for
        # commits whose deltas were all empty (which write no partition)
        # and needs no SparkSession to read; it is written BEFORE the
        # partition append (the revision is claimed first), but resume
        # still takes max(marker, partition max) so neither a stale
        # marker nor missing partitions can reuse a revision number
        marker = None
        try:
            with open(self._marker()) as fh:
                marker = int(fh.read().strip() or 0)
        except FileNotFoundError:
            pass
        if not self._has_data():
            return marker or 0
        spark = SparkSession.getActiveSession()
        if spark is None:
            if marker is not None:
                return marker
            # returning 0 here would silently restart the counter and
            # merge new commits into existing revision partitions
            raise RuntimeError(
                f"HistoryLog at {self._path} has recorded revisions but no "
                "active SparkSession is available to resume the counter"
            )
        pmax = (
            spark.read.parquet(self._path)
            .agg(F.max(F.col("revision").cast("int")))
            .collect()[0][0]
            or 0
        )
        return max(marker or 0, pmax)

    def _has_data(self) -> bool:
        try:
            return any(e.startswith("revision=") for e in os.listdir(self._path))
        except FileNotFoundError:
            return False

    def transaction_begin(self) -> None:
        self._staged = []

    def change_event(self, change: ChangeSet) -> None:
        self._staged.append(change)

    def transaction_aborted(self) -> None:
        self._staged = []

    def transaction_committed(self) -> None:
        self.revision += 1
        # claim the revision BEFORE the partition append: a crash
        # mid-commit then resumes PAST the partial revision instead of
        # reusing its number and merging two commits into one partition
        os.makedirs(self._path, exist_ok=True)
        with open(self._marker(), "w") as fh:
            fh.write(str(self.revision))
        out = None
        for ch in self._staged:
            for action, df in (
                (ACTION_INSERTED, ch.added),
                (ACTION_REMOVED, ch.removed),
                (ACTION_UPDATED, ch.updated),
            ):
                if df is not None:
                    part = df.select(
                        F.lit(self.revision).alias("revision"),
                        F.lit(action).alias("action"),
                        "*",
                    )
                    out = part if out is None else out.unionByName(part)
        if out is not None:
            out.write.mode("append").partitionBy("revision", "action").parquet(
                self._path
            )
        self._staged = []

    # -- read side ----------------------------------------------------------

    def _read(self) -> DataFrame | None:
        if not self._has_data():
            return None
        spark = SparkSession.getActiveSession()
        df = spark.read.parquet(self._path)
        data_cols = [c for c in df.columns if c not in ("revision", "action")]
        return df.select(
            F.col("revision").cast("int").alias("revision"), "action", *data_cols
        )

    def history(self) -> DataFrame | None:
        """All recorded changes: revision | action | <statement cols>.
        None when nothing has been committed yet.  One partitioned
        table read — plan size independent of commit count."""
        return self._read()

    def scan(
        self,
        from_rev: int | None = None,
        to_rev: int | None = None,
        p: str | None = None,
        action: str | None = None,
    ) -> DataFrame | None:
        """Range scan (HistoryServiceFactory.java:72 restrictions):
        ``from_rev`` inclusive, ``to_rev`` exclusive, optional predicate
        and action filters.  Revision/action bounds hit the partition
        columns — Spark prunes the non-matching directories at planning
        time (PartitionFilters in the scan node), the analog of the
        ordered index's key-range scan; the ``p`` filter pushes down to
        the parquet row groups."""
        df = self._read()
        if df is None:
            return None
        if from_rev is not None:
            df = df.where(F.col("revision") >= from_rev)
        if to_rev is not None:
            df = df.where(F.col("revision") < to_rev)
        if action is not None:
            df = df.where(F.col("action") == action)
        if p is not None:
            df = df.where(F.col("p") == p)
        return df
