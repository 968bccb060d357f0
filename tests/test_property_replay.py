"""Property-based golden replay: for RANDOM small streams and RANDOM
epoch slicings, the engine's final table equals the single-threaded
oracle (tests/oracle.py). The seeded golden suite pins one stream; this
explores the space — equal-seq duplicate keys, deletes of unseen keys,
ttl before/after base within a seq, nonce rows, empty seqs — with
hypothesis shrinking any failure to a minimal stream.

Example count is small (Spark pays seconds per example); the generator
is biased toward collisions (3 doc ids, 4 seqs) so nearly every example
exercises LWW ties, tombstones, and monotonic enrichment together.
"""

import datetime as dt
import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stellar_ledger_data_indexer_spark.job import IngestJob, JobConfig  # noqa: E402
from stellar_ledger_data_indexer_spark.schema import CHANGE_EVENTS  # noqa: E402

from oracle import (assert_states_equal, replay_oracle, rows_to_events,  # noqa: E402
                    state_from_target)

TS = dt.datetime(2024, 1, 1)   # naive; session tz is UTC
DOCS = ["da", "db", "dc"]

base_event = st.tuples(
    st.integers(2, 5),                       # seq
    st.sampled_from(DOCS + [""]),            # doc_id ("" = nonce)
    st.sampled_from(["insert", "update", "delete"]),
    st.lists(st.integers(0, 9), min_size=0, max_size=3))

ttl_event = st.tuples(
    st.integers(2, 5),                       # seq
    st.sampled_from(DOCS),
    st.integers(10, 99))                     # live_until

streams = st.tuples(
    st.lists(base_event, min_size=1, max_size=12),
    st.lists(ttl_event, min_size=0, max_size=6),
    st.sampled_from([1, 2, 4]))              # epoch_size (seqs per epoch)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(streams)
def test_random_stream_any_slicing_matches_oracle(spark, tmp_path_factory,
                                                  stream):
    bases, ttls, epoch_size = stream
    rows, pos = [], {}
    for seq, doc, op, toks in bases:
        p = pos[seq] = pos.get(seq, -1) + 1
        rows.append((seq, p, op, doc,
                     None if op == "delete" else toks, "src", "tokens",
                     TS, None, None, None, None))
    for seq, doc, lu in ttls:
        p = pos[seq] = pos.get(seq, -1) + 1
        rows.append((seq, p, "update", doc, None, "src", "ttl", TS, lu,
                     None, None, None))

    work = tmp_path_factory.mktemp("prop")
    events_path = str(work / "events")
    df = spark.createDataFrame(rows, CHANGE_EVENTS)
    # two files split mid-stream: the BATCH job plans seq-aligned epochs,
    # so file boundaries may fall anywhere
    df.repartition(2).write.mode("overwrite").parquet(events_path)

    job = IngestJob(spark, JobConfig(
        events_path=events_path, warehouse=str(work / "wh"),
        num_buckets=4, epoch_size=epoch_size))
    # end=0 → unbounded tail clamped to the source tip (a bounded end
    # past the tip is refused by the planner, per the reference's
    # decision table — that refusal has its own matrix test)
    job.run(start=2, end=0, backfill=True)

    oracle = replay_oracle(rows_to_events(
        [dict(zip([f.name for f in CHANGE_EVENTS.fields], r))
         for r in rows]))
    engine = state_from_target(job.target.read(spark).collect())
    assert_states_equal(engine, oracle)
