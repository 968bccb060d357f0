"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps one piece of cross-batch state: the resume watermark
(max indexed sequence, surfaced as Prometheus gauges —
internal/utils/metrics.go:85-152). Its per-key analog here is a running
**per-document ingest ledger**: for every doc_id, the count of change
events seen, the max (seq, pos) observed, and whether the latest event
was a delete — maintained incrementally across micro-batches with
GroupState, i.e. without re-reading the target table. This is the shape
any custom stateful operator takes in this engine (sessionization,
per-key rate metering, dedup-with-memory): grouped Arrow batches in,
state object carried between triggers, timeout for eviction.

Scale notes: state lives in the state store partitioned by doc_id — the
same hash layout as the target table's buckets, so a 10^9-key state
spreads across executors; each trigger touches only the keys present in
the micro-batch. The update function is vectorized per key-group (numpy
over the group's Arrow batch), no per-row Python beyond the per-key
loop Spark itself imposes.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schema import OP_DELETE

STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType(), False),
    T.StructField("max_seq", T.LongType(), False),
    T.StructField("max_pos", T.LongType(), False),
    T.StructField("deleted", T.BooleanType(), False),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("max_seq", T.LongType(), False),
    T.StructField("deleted", T.BooleanType(), False),
])


def _update_doc_ledger(key: Tuple[str],
                       pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one doc into its running state.
    Emits the post-update state row (update-mode output)."""
    n_events, max_seq, max_pos, deleted = (
        state.get if state.exists else (0, -1, -1, False))
    import numpy as np
    for pdf in pdfs:
        n_events += len(pdf)
        # vectorized per group: winner = lexicographic max over (seq, pos)
        seqs = pdf["seq"].to_numpy()
        poss = pdf["pos"].to_numpy()
        w = int(np.lexsort((poss, seqs))[-1])
        if (int(seqs[w]), int(poss[w])) > (max_seq, max_pos):
            max_seq, max_pos = int(seqs[w]), int(poss[w])
            deleted = bool(pdf["op"].iloc[w] == OP_DELETE)
    state.update((n_events, max_seq, max_pos, deleted))
    yield pd.DataFrame({"doc_id": [key[0]], "n_events": [n_events],
                        "max_seq": [max_seq], "deleted": [deleted]})


def doc_ledger_stream(events: DataFrame) -> DataFrame:
    """events: a STREAMING DataFrame with (doc_id, seq, pos, op, ...).
    Returns the running per-doc ledger stream (update output mode)."""
    return (events
            .filter("entry_type = 'tokens' AND doc_id IS NOT NULL "
                    "AND doc_id != ''")
            .groupBy("doc_id")
            .applyInPandasWithState(
                _update_doc_ledger,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_doc_ledger(spark, events_path: str, checkpoint_dir: str,
                   out_path: str,
                   schema: T.StructType | None = None):
    """Wire the stateful operator to the file source; availableNow trigger
    (tests drive with awaitTermination; production would tail). The
    update-mode output lands via foreachBatch as batch-stamped parquet
    appends (the memory sink cannot recover from a checkpoint, and state
    carry-over across restarts is the point) — latest ``_batch`` per
    doc_id is the current ledger row."""
    import pyspark.sql.functions as F

    from ..schema import CHANGE_EVENTS
    events = (spark.readStream.schema(schema or CHANGE_EVENTS)
              .parquet(events_path))
    ledger = doc_ledger_stream(events)

    def sink(df: DataFrame, batch_id: int) -> None:
        (df.withColumn("_batch", F.lit(batch_id))
         .write.mode("append").parquet(out_path))

    return (ledger.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_doc_ledger(spark, out_path: str) -> DataFrame:
    """Current ledger: the latest emitted row per doc across all batch
    appends (update-mode fold)."""
    from pyspark.sql import Window
    import pyspark.sql.functions as F
    df = spark.read.parquet(out_path)
    w = Window.partitionBy("doc_id").orderBy(F.desc("_batch"))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1").drop("_rn", "_batch"))
