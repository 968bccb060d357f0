"""Range-planner decision matrix — full port of the reference's 14 cases
(reference: internal/input/ledgerMetaDataReader_test.go:11-191), plus
epoch-slicing unit tests. Pure Python, no Spark session needed."""

import pytest

from stellar_ledger_data_indexer_spark.sources.range_planner import (
    SeqRange, get_seq_bound, plan_epochs)

UNB = None  # unbounded end

CASES = [
    # name, start, end, latest, backfill, max_in_sink, expected, proceed
    ("db empty, start<=1, unbounded -> latest", 0, 1, 100, False, 0,
     SeqRange(100, UNB), True),
    ("db empty, start=1, unbounded -> latest", 1, 1, 100, False, 0,
     SeqRange(100, UNB), True),
    ("db empty, start<latest, unbounded -> requested start", 50, 0, 100,
     False, 0, SeqRange(50, UNB), True),
    ("db empty, start<latest, bounded -> requested", 50, 70, 100, False, 0,
     SeqRange(50, 70), True),
    ("db empty, start>latest -> error", 150, 200, 100, False, 0, None, False),
    ("db has data, start<maxDB, unbounded -> maxDB", 2, 1, 200, False, 100,
     SeqRange(100, UNB), True),
    ("db has data, start>=maxDB, unbounded -> requested", 100, 1, 200, False,
     50, SeqRange(100, UNB), True),
    ("db has data, bounded, max>=end -> nothing", 2, 50, 200, False, 100,
     None, False),
    ("db has data, bounded, max==end -> nothing", 2, 100, 200, False, 100,
     None, False),
    ("db has data, bounded, max<end -> resume from max", 2, 100, 200, False,
     50, SeqRange(50, 100), True),
    ("db has data, start>=maxDB, bounded -> requested", 100, 200, 300, False,
     50, SeqRange(100, 200), True),
    ("db has data, start==maxDB, bounded -> requested", 50, 100, 200, False,
     50, SeqRange(50, 100), True),
    ("backfill bounded -> exact range", 10, 100, 200, True, 50,
     SeqRange(10, 100), True),
    ("backfill unbounded -> exact start", 10, 1, 200, True, 50,
     SeqRange(10, UNB), True),
    ("backfill start<=1 unbounded -> latest", 0, 1, 200, True, 50,
     SeqRange(200, UNB), True),
]


@pytest.mark.parametrize("name,start,end,latest,backfill,max_db,expected,"
                         "proceed", CASES, ids=[c[0] for c in CASES])
def test_get_seq_bound_matrix(name, start, end, latest, backfill, max_db,
                              expected, proceed):
    rng, ok = get_seq_bound(start, end, latest, backfill, max_db)
    assert ok == proceed
    if proceed:
        assert rng == expected


def test_end_before_start_rejected():
    rng, ok = get_seq_bound(100, 50, 200, False, 0)
    assert not ok


def test_end_beyond_source_rejected():
    rng, ok = get_seq_bound(10, 300, 200, False, 0)
    assert not ok


def test_plan_epochs_bounded():
    assert plan_epochs(SeqRange(2, 10), 100, 4) == [(2, 5), (6, 9), (10, 10)]


def test_plan_epochs_unbounded_clamped_to_tip():
    assert plan_epochs(SeqRange(5, None), 8, 10) == [(5, 8)]


def test_plan_epochs_exact_multiple():
    assert plan_epochs(SeqRange(1, 8), 100, 4) == [(1, 4), (5, 8)]
