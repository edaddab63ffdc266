"""Commit-hook changeset API — the reference's IChangeLog analog.

The reference streams per-statement change records to an IChangeLog
(bigdata-rdf/src/java/com/bigdata/rdf/changesets/IChangeLog.java:39 —
changeEvent / transactionBegin / transactionCommited /
transactionAborted; InMemChangeLog.java collects them).  Here the unit
of change is a slim statements DataFrame per UPDATE op — the actual
delta the engine already computes via anti-joins (rows REALLY added,
i.e. not previously present; rows REALLY removed, i.e. present and
matched) — which is the batch-friendly shape a downstream incremental
pipeline wants (the engine's own incremental text-index maintenance
consumes exactly these deltas).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ChangeSet:
    """The delta of one UPDATE op: statements actually added/removed.

    ``added``/``removed`` are DataFrames in the statements schema
    (g s p o_kind o_lex … stype); either may be None when the op can
    only mutate in one direction.  A row deleted and re-inserted by the
    same DELETE/INSERT op appears in both (the reference's UPDATE
    change action collapses that pair; callers can anti-join if they
    need net deltas).

    ``updated`` is populated only under truth maintenance
    (``store.truth_maintenance = True``): statements whose TYPE flipped
    — an explicit add of an already-provable inference (inferred →
    explicit) or a retraction of a still-provable explicit statement
    (explicit → inferred) — carrying the NEW stype, the reference's
    ChangeAction.UPDATED (TestChangeSets.java testTMUpdate).
    """

    op: str
    added: DataFrame | None = None
    removed: DataFrame | None = None
    updated: DataFrame | None = None


class ChangeLog:
    """No-op base — override the hooks you need (IChangeLog analog)."""

    def transaction_begin(self) -> None:  # transactionBegin()
        pass

    def change_event(self, change: ChangeSet) -> None:  # changeEvent(record)
        pass

    def transaction_committed(self) -> None:  # transactionCommited(commitTime)
        pass

    def transaction_aborted(self) -> None:  # transactionAborted()
        pass


@dataclass
class InMemChangeLog(ChangeLog):
    """Collects every ChangeSet (InMemChangeLog.java analog)."""

    changes: list[ChangeSet] = field(default_factory=list)
    committed: bool = False
    aborted: bool = False

    def transaction_begin(self) -> None:
        self.changes = []
        self.committed = False
        self.aborted = False

    def change_event(self, change: ChangeSet) -> None:
        self.changes.append(change)

    def transaction_committed(self) -> None:
        self.committed = True

    def transaction_aborted(self) -> None:
        self.aborted = True
