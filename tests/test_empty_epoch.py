"""Regression: an epoch whose merge resolves to ZERO rows at runtime.

Stream shape (the hypothesis-shrunk falsifying example from
test_property_replay): the epoch's only base event is a nonce (empty
doc_id — dropped by the F2 filter) and its only ttl event targets a key
the table does not hold (update-only semantics drop it). The affected-
bucket probe still sees the ttl key, so the fused merge runs — and every
row resolves away at runtime. AQE's empty-relation propagation then
collapses the plan and optimizes the CollectMetrics node out of the
executed write, which used to crash ``Observation.get`` with a JVM
AssertionError (schemaless empty row) AFTER the commit had landed.
``_obs_metrics`` maps the absent metrics to zeros — the true counts of
an empty merge.
"""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stellar_ledger_data_indexer_spark.job import IngestJob, JobConfig  # noqa: E402
from stellar_ledger_data_indexer_spark.schema import CHANGE_EVENTS  # noqa: E402

TS = dt.datetime(2024, 1, 1)


def test_nonce_only_epoch_with_unmatched_ttl(spark, tmp_path):
    rows = [
        (2, 0, "insert", "", [], "src", "tokens", TS, None, None, None,
         None),
        (2, 1, "update", "da", None, "src", "ttl", TS, 10, None, None,
         None),
    ]
    events_path = str(tmp_path / "events")
    spark.createDataFrame(rows, CHANGE_EVENTS).write.parquet(events_path)
    job = IngestJob(spark, JobConfig(
        events_path=events_path, warehouse=str(tmp_path / "wh"),
        num_buckets=4, epoch_size=1))
    reports = job.run(start=2, end=0, backfill=True)
    assert len(reports) == 1
    assert reports[0].rows_upserted == 0
    assert reports[0].rows_enriched == 0
    assert job.target.read(spark).count() == 0
    # the epoch is still committed (exactly-once marker) so a re-run
    # skips it
    assert all(r.skipped for r in job.run(start=2, end=0, backfill=True))


def test_empty_edge_connected_components(spark):
    # the same AQE collapse reaches connected_components' per-round
    # Observation when the edge set is empty: absent metrics must read
    # as "0 labels changed" and terminate with an empty labeling
    from stellar_ledger_data_indexer_spark.functions.graph import \
        connected_components
    edges = spark.createDataFrame([], "id_a long, id_b long")
    out = connected_components(edges)
    assert out.count() == 0
    out.unpersist()
