"""Operator micro-fixtures (FIXTURES.md §4): dedup LWW keep-latest,
projection golden row, nonce filter, op validation, enrichment candidate
dedup. Mirrors the reference unit tests
internal/utils/processor_test.go:10-93 (dedup keeps "20" not "10") and
internal/transform/contract_data_test.go:13-163 (projection golden)."""

from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from stellar_ledger_data_indexer_spark.operators.cdc import (
    project_base, project_enrich, validate_ops)
from stellar_ledger_data_indexer_spark.operators.dedup import (
    dedup_enrich_candidates, dedup_lww, dedup_lww_window)
from stellar_ledger_data_indexer_spark.schema import CHANGE_EVENTS

TS = datetime(2023, 11, 14, 22, 13, 20, tzinfo=timezone.utc)


def ev(seq, pos, op="insert", doc="docA", tokens=(1, 2, 3), source="src01",
       entry_type="tokens", live_until=None, tx_idx=None, topics_json=None,
       blob=None):
    return (seq, pos, op, doc, list(tokens) if tokens is not None else None,
            source, entry_type, TS, live_until, tx_idx, topics_json, blob)


def events_df(spark, rows):
    return spark.createDataFrame(rows, CHANGE_EVENTS)


# ---------------------------------------------------------------- dedup LWW
def test_dedup_keeps_latest_not_first(spark):
    """The '10 vs 20' regression: duplicate key keeps the LAST value in
    (seq, pos) order — dropDuplicates-style keep-first would be wrong."""
    df = events_df(spark, [
        ev(5, 1, tokens=[10]),
        ev(5, 2, tokens=[20]),          # same key+seq, later pos → wins
        ev(4, 9, doc="docB", tokens=[7]),
    ])
    for fn, kw in [(dedup_lww, {}), (dedup_lww, {"salt_buckets": 3}),
                   (dedup_lww_window, {}),
                   (dedup_lww_window, {"salt_buckets": 3})]:
        out = {r["doc_id"]: r["tokens"]
               for r in fn(df, ("doc_id",), ("seq", "pos"), **kw).collect()}
        assert out == {"docA": [20], "docB": [7]}, f"{fn.__name__} {kw}"


def test_dedup_higher_seq_beats_higher_pos(spark):
    df = events_df(spark, [ev(6, 1, tokens=[1]), ev(5, 99, tokens=[2])])
    out = dedup_lww(df).collect()
    assert len(out) == 1 and out[0]["tokens"] == [1]


def test_dedup_first_seq_emitted(spark):
    df = events_df(spark, [ev(5, 1, tokens=[10]), ev(9, 1, tokens=[20]),
                           ev(7, 1, doc="docB", tokens=[7])])
    out = {r["doc_id"]: (r["seq"], r["first_seq"])
           for r in dedup_lww(df, first_seq_col="seq").collect()}
    assert out == {"docA": (9, 5), "docB": (7, 7)}
    # salted variant agrees
    out2 = {r["doc_id"]: (r["seq"], r["first_seq"])
            for r in dedup_lww(df, first_seq_col="seq",
                               salt_buckets=4).collect()}
    assert out2 == out


# ------------------------------------------------------------- projection
def test_projection_golden_row(spark):
    """One hand-built change → exact output row, every column
    (≙ internal/transform/contract_data_test.go golden)."""
    df = events_df(spark, [ev(42, 7, op="insert", doc="docG",
                              tokens=[11, 22, 33], source="src03")])
    row = project_base(df).collect()[0].asDict()
    assert row == {"doc_id": "docG", "tokens": [11, 22, 33], "n_tok": 3,
                   "source": "src03", "seq": 42, "pos": 7, "op": "insert",
                   "deleted": False,
                   "closed_at": datetime(2023, 11, 14, 22, 13, 20)}


def test_projection_delete_nulls_payload(spark):
    df = events_df(spark, [ev(42, 7, op="delete", tokens=None)])
    row = project_base(df).collect()[0].asDict()
    assert row["tokens"] is None and row["n_tok"] is None
    assert row["deleted"] is True


def test_projection_delete_nulls_payload_even_if_producer_sent_one(spark):
    """Tombstone semantics are enforced, not assumed: a producer that
    attaches a payload to a delete event still yields a nulled row, so
    final state stays a pure function of the stream."""
    df = events_df(spark, [ev(42, 7, op="delete", tokens=[1, 2, 3])])
    row = project_base(df).collect()[0].asDict()
    assert row["tokens"] is None and row["n_tok"] is None
    assert row["deleted"] is True


def test_projection_filters_nonce_and_other_entry_types(spark):
    """F1 + F2: wrong entry_type skipped; empty doc_id skipped (a nonce is
    valid but not recorded, internal/transform/contract_data.go:31-34)."""
    df = events_df(spark, [
        ev(1, 0, doc=""),                       # nonce
        ev(1, 1, entry_type="ttl", tokens=None, live_until=9),
        ev(1, 2, doc="docK"),
    ])
    out = project_base(df).collect()
    assert [r["doc_id"] for r in out] == ["docK"]


def test_validate_ops_raises_on_unknown(spark):
    df = events_df(spark, [ev(1, 0, op="truncate")])
    with pytest.raises(Exception, match="unknown change op"):
        validate_ops(df).collect()


def test_validate_ops_passes_known(spark):
    df = events_df(spark, [ev(1, 0, op="insert"), ev(1, 1, op="delete",
                                                     tokens=None)])
    assert validate_ops(df).count() == 2


# ------------------------------------------------------------- enrichment
def test_equal_seq_straddling_batches_keeps_last_pos(spark, tmp_path):
    """ADVICE r1 (medium): a micro-batch/file boundary can split ONE seq
    across two merge applications. The persisted-pos lexicographic LWW
    must keep the stream's last occurrence even when the later-pos event
    arrives in the LATER batch (strict b.seq > t.seq would drop it)."""
    from stellar_ledger_data_indexer_spark.job import apply_change_batch
    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from stellar_ledger_data_indexer_spark.schema import TARGET

    t = LakeTable.create(str(tmp_path / "t"), TARGET, bucket_col="doc_id",
                         num_buckets=4)
    batch1 = events_df(spark, [ev(5, 0, tokens=[1])])
    batch2 = events_df(spark, [ev(5, 1, tokens=[2])])  # same seq, later pos
    apply_change_batch(spark, t, batch1)
    apply_change_batch(spark, t, batch2)
    row = t.read(spark).collect()[0]
    assert list(row["tokens"]) == [2] and row["pos"] == 1
    # and the reverse order: the earlier-pos event re-offered later loses
    apply_change_batch(spark, t, batch1)
    row = t.read(spark).collect()[0]
    assert list(row["tokens"]) == [2] and row["pos"] == 1


def test_enrich_candidates_keep_last_per_seq(spark):
    """Per (doc, seq) keep the LAST occurrence — an earlier-pos larger
    value in the same seq is discarded (≙ ttl dedup regression,
    internal/transform/ttl_test.go:113-243)."""
    df = project_enrich(events_df(spark, [
        ev(5, 1, entry_type="ttl", tokens=None, live_until=300),
        ev(5, 2, entry_type="ttl", tokens=None, live_until=100),  # wins seq 5
        ev(6, 0, entry_type="ttl", tokens=None, live_until=200),
        ev(6, 1, doc="docB", entry_type="ttl", tokens=None, live_until=50),
    ]))
    out = {(r["doc_id"], r["seq"]): r["live_until"]
           for r in dedup_enrich_candidates(df).collect()}
    assert out == {("docA", 5): 100, ("docA", 6): 200, ("docB", 6): 50}
