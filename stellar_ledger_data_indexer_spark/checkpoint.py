"""Exactly-once epoch checkpointing + lineage + metrics tables.

The reference derives its resume position from the sink
(``SELECT MAX(ledger_sequence)``, reference: internal/db/utils.go:61-71)
and relies on idempotent conditional upserts for replay safety
(docs/devops.md:10-13). We keep that derivation (see
``IngestJob.max_seq_in_sink``) but make the commit explicit: a
``_checkpoints`` table gains one row per applied epoch, written strictly
AFTER the target table's merge snapshots commit. The sink-derived max is
used for resume ONLY while the checkpoint table is empty (bootstrap /
lost-control-tables recovery — see ``IngestJob.resume_watermark``); once
any marker exists, markers alone decide skipping, because a merge-
committed-but-marker-less epoch must be REPLAYED, not skipped. The crash
matrix:

- crash before target merge        → epoch absent → re-run, clean apply
- crash after merge, before marker → epoch absent → re-run replays it:
  the lexicographic ``(seq, pos)`` LWW condition makes the target
  re-application a no-op, and the replay re-lands the epoch's
  metrics/lineage rows (duplicates folded by ``_latest_by_key``)
- crash after marker               → epoch present → skipped entirely

``_lineage`` records per-bucket (per-partition) row counts for every
epoch, taken from the committed manifest's file statistics — zero extra
Spark jobs. ``_metrics`` is the Prometheus analog
(internal/utils/metrics.go:32-152) as an appendable table.

All three are tiny control tables: reads/writes go through the
LakeTable driver-side pyarrow path (append_rows/read_rows) so an epoch
spends its Spark jobs only on data, never on bookkeeping.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import SparkSession

from .lake.table import LakeTable
from .schema import CHECKPOINTS, LINEAGE, METRICS


class CheckpointLog:
    """``evolve=False`` opens read-only-safely (no auto-evolution
    commit) — the inspect verb must never write to the warehouse it
    observes. ``existed`` records whether the table was already on disk
    at open: the resume bootstrap uses it to distinguish "checkpoint
    table genuinely lost" (→ sink-max fallback) from "fresh table whose
    first marker hasn't landed yet" (→ replay from the start; falling
    back to sink max there would permanently skip a first epoch whose
    merges committed but whose marker didn't)."""

    def __init__(self, path: str, evolve: bool = True):
        self.table, self.existed = LakeTable.open_or_create(
            path, CHECKPOINTS, evolve=evolve)

    def committed_epochs(self, spark: SparkSession | None = None) -> set[int]:
        self.table.refresh()
        return {int(r["epoch_id"])
                for r in self.table.read_rows(columns=["epoch_id"])}

    def is_committed(self, spark: SparkSession | None, epoch_id: int) -> bool:
        return epoch_id in self.committed_epochs()

    def max_committed_hi(self, spark: SparkSession | None = None) -> int:
        """Resume watermark (≙ S3 — coalesce(max, 0) matches the
        reference's empty-table → 0 behavior, internal/main.go:170-174)."""
        self.table.refresh()
        rows = self.table.read_rows(columns=["hi_seq"])
        return max((int(r["hi_seq"]) for r in rows), default=0)

    def commit(self, spark: SparkSession | None, epoch_id: int, lo: int,
               hi: int, target_snapshot: int, rows_upserted: int,
               rows_enriched: int) -> None:
        self.table.append_rows([
            (epoch_id, lo, hi, target_snapshot, rows_upserted,
             rows_enriched, datetime.now(timezone.utc))])


def _latest_by_key(rows: list[dict], key_cols: tuple[str, ...]) -> list[dict]:
    """Keep the LAST appended row per key. Metrics/lineage are written
    before the checkpoint marker, so a crash between merge and marker
    re-appends them on replay — consumers read through these helpers and
    see exactly one row per (epoch, dataset)/(epoch, bucket). (Marker-
    last stays: moving bookkeeping after the marker would instead lose
    it entirely on a crash, which is strictly worse than a duplicate.)"""
    out: dict[tuple, dict] = {}
    for r in rows:  # read_rows preserves manifest (append) order
        out[tuple(r[c] for c in key_cols)] = r
    return list(out.values())


class LineageLog:
    def __init__(self, path: str, evolve: bool = True):
        self.table, self.existed = LakeTable.open_or_create(
            path, LINEAGE, evolve=evolve)

    def read_latest(self) -> list[dict]:
        """One row per (epoch_id, bucket) — crash-replay duplicates folded."""
        self.table.refresh()
        return _latest_by_key(self.table.read_rows(), ("epoch_id", "bucket"))

    def record_from_manifest(self, spark: SparkSession | None, epoch_id: int,
                             target: LakeTable, buckets: list[int],
                             rows_in_by_bucket: dict[int, int] | None = None,
                             commit_versions: set[int] | None = None) -> None:
        """Per-partition lineage from the freshly committed manifest:
        ``rows_out`` = rows the epoch's merge commits wrote per bucket —
        under copy-on-write that IS the bucket's logical row count (the
        commit rewrote it in full); under merge-on-read it is the epoch's
        resolved delta rows (counting ALL physical files would inflate
        the figure with rows shadowed by newer commits — ADVICE r2).
        ``commit_versions`` scopes the count to those snapshots' files —
        a SET because an unfused CoW epoch commits twice (base then
        enrich) and the enrich rewrite REPLACES the base commit's files
        in its buckets, so scoping to the base version alone would
        record 0 for enriched buckets. None keeps the legacy
        all-physical-files behavior."""
        if not buckets:
            return
        counts: dict[int, int] = {b: 0 for b in buckets}
        for f in target.refresh().files:
            if f.bucket in counts and (commit_versions is None
                                       or f.commit_seq in commit_versions):
                counts[f.bucket] += f.rows
        self.table.append_rows(
            [(epoch_id, b, (rows_in_by_bucket or {}).get(b), counts[b])
             for b in buckets])


class MetricsLog:
    def __init__(self, path: str, evolve: bool = True):
        self.table, self.existed = LakeTable.open_or_create(
            path, METRICS, evolve=evolve)

    def read_latest(self) -> list[dict]:
        """One row per (epoch_id, dataset) — crash-replay duplicates folded."""
        self.table.refresh()
        return _latest_by_key(self.table.read_rows(), ("epoch_id", "dataset"))

    def record(self, spark: SparkSession | None, epoch_id: int, dataset: str,
               rows_read: int | None, rows_deduped: int | None,
               rows_matched: int | None, rows_inserted: int | None,
               rows_updated: int | None, wall_secs: float,
               bytes_written: int | None = None) -> None:
        self.table.append_rows(
            [(epoch_id, dataset, rows_read, rows_deduped, rows_matched,
              rows_inserted, rows_updated, float(wall_secs),
              bytes_written)])


def now() -> float:
    return time.monotonic()
