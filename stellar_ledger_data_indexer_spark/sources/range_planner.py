"""Resume-or-backfill range planning — driver-side, pure Python.

Semantic port of the reference's ``GetLedgerBound``
(reference: internal/input/ledgerMetaDataReader.go:54-93), which decides
the sequence range an ingest run should process given:

- the requested ``[start, end]`` (``end <= 1`` means unbounded tail),
- the latest sequence available in the source lake,
- the max sequence already applied to the sink (resume watermark,
  ≙ SELECT MAX(ledger_sequence), internal/db/utils.go:61-71),
- ``backfill`` mode, which ignores the sink watermark
  (docs/devops.md:10-13 — re-applying is safe because the conditional
  upsert is idempotent; same property our MERGE provides).

The decision table is verified by the 14-case matrix ported from
internal/input/ledgerMetaDataReader_test.go:11-191 in
tests/test_range_planner.py.
"""

from __future__ import annotations

from dataclasses import dataclass

UNBOUNDED_SENTINEL = 1


@dataclass(frozen=True)
class SeqRange:
    start: int
    end: int | None  # None = unbounded tail

    @property
    def bounded(self) -> bool:
        return self.end is not None


def get_seq_bound(start: int, end: int, latest_in_source: int, backfill: bool,
                  max_in_sink: int) -> tuple[SeqRange | None, bool]:
    """Return (range, proceed). ``None, False`` means nothing to do or an
    invalid request (the reference logs and returns an empty range)."""
    if end > UNBOUNDED_SENTINEL and end < start:
        return None, False
    if end > UNBOUNDED_SENTINEL and end > latest_in_source:
        return None, False
    if start > UNBOUNDED_SENTINEL and start > latest_in_source:
        return None, False
    if end <= max_in_sink and end > UNBOUNDED_SENTINEL and not backfill:
        return None, False
    if not backfill and max_in_sink > 0 and start <= max_in_sink:
        start = max_in_sink
    unbounded = (end <= UNBOUNDED_SENTINEL or start <= UNBOUNDED_SENTINEL
                 or start == latest_in_source)
    if unbounded:
        if start <= UNBOUNDED_SENTINEL:
            start = latest_in_source
        return SeqRange(start, None), True
    return SeqRange(start, end), True


def plan_epochs(rng: SeqRange, latest_in_source: int,
                epoch_size: int) -> list[tuple[int, int]]:
    """Slice a range into contiguous (lo, hi) epochs of ``epoch_size``
    sequences each. An unbounded range is clamped to the source tip (the
    streaming path re-plans as the tip advances). Epochs are the unit of
    exactly-once commit — the analog of the reference's per-batch
    transaction (internal/utils/postgres.go:39-77) but coarser, because a
    lake snapshot commit is O(1) metadata regardless of row count."""
    end = rng.end if rng.end is not None else latest_in_source
    out = []
    lo = rng.start
    while lo <= end:
        hi = min(lo + epoch_size - 1, end)
        out.append((lo, hi))
        lo = hi + 1
    return out
