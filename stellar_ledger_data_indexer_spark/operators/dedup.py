"""In-batch last-writer-wins dedup — the load-bearing pre-MERGE step.

Semantic contract (≙ RemoveDuplicatesByFields,
reference: internal/utils/processor.go:79-116): among rows sharing a key,
keep the one the reference would have seen LAST in input order. Spark has
no input order after a shuffle, so the order is explicit data: the
``(seq, pos)`` total order carried by every change event. "Last occurrence"
becomes max-by-(seq, pos).

Without this step the MERGE is ill-defined — multiple source rows per
target key (the reference dedups for the same reason before its Postgres
upsert, internal/transform/contract_data.go:39-41).

Two physical strategies, same semantics:

- ``dedup_lww`` (default): groupBy + max_by(payload, (seq, pos)).
  Spark plans this as a partial (map-side) aggregation before the shuffle,
  so a hot key is combined within every task first — at 10^10 events a key
  holding 10% of the stream contributes at most one row per map task to
  the shuffle. An explicit two-phase salted variant (salt on pos) is
  provided for the window strategy and for when payload rows are too wide
  to combine map-side.
- ``dedup_lww_window``: row_number() OVER (PARTITION BY key ORDER BY seq
  DESC, pos DESC) = 1 — the form the SQL oracle checks; shuffles the full
  input, so prefer the agg form in the hot path. ``salt_buckets > 1``
  makes it two-phase: a salted local window prunes each (key, salt) group
  to one row before the global window — the explicit hot-key salting the
  north rule requires.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ord(order_cols: Sequence[str], prefix: str = ""):
    return F.struct(*[F.col(prefix + c) for c in order_cols])


def dedup_lww(df: DataFrame, key_cols: Sequence[str] = ("doc_id",),
              order_cols: Sequence[str] = ("seq", "pos"),
              salt_buckets: int = 0,
              first_seq_col: str | None = None) -> DataFrame:
    """Keep, per key, the row with the greatest (order_cols) tuple.

    ``salt_buckets > 1`` forces an explicit two-phase plan: phase 1
    aggregates per (key, salt) — spreading a hot key over ``salt_buckets``
    reducers — phase 2 reduces the ≤salt_buckets survivors per key.

    ``first_seq_col``: additionally emit ``first_seq = min(first_seq_col)``
    over the whole group (needed by the enrichment qualification — the
    LWW winner alone loses the information of when the key first
    appeared in the batch).
    """
    payload = F.struct(*[F.col(c) for c in df.columns])

    def flatten(grouped: DataFrame) -> DataFrame:
        # key columns come from the GROUP KEY attributes, not from the
        # winning payload struct (values are identical by definition):
        # `_row.*` would mint fresh attribute ids for the keys, hiding
        # the aggregation's hash partitioning from the downstream merge
        # join — which then re-exchanged the full deduped batch every
        # epoch (r7; observed as an extra Exchange in the fused plan)
        cols = [F.col(c) if c in key_cols else F.col(f"_row.{c}").alias(c)
                for c in df.columns]
        if first_seq_col:
            cols.append(F.col("first_seq"))
        return grouped.select(*cols)

    if salt_buckets > 1:
        salt = F.pmod(F.coalesce(F.col(order_cols[-1]), F.lit(0)),
                      F.lit(salt_buckets)).alias("_salt")
        aggs1 = [F.max_by(payload, _ord(order_cols)).alias("_row")]
        if first_seq_col:
            aggs1.append(F.min(first_seq_col).alias("first_seq"))
        phase1 = df.groupBy(salt, *key_cols).agg(*aggs1)
        aggs2 = [F.max_by(F.col("_row"),
                          _ord(order_cols, "_row.")).alias("_row")]
        if first_seq_col:
            aggs2.append(F.min("first_seq").alias("first_seq"))
        return flatten(phase1.groupBy(*key_cols).agg(*aggs2))
    aggs = [F.max_by(payload, _ord(order_cols)).alias("_row")]
    if first_seq_col:
        aggs.append(F.min(first_seq_col).alias("first_seq"))
    return flatten(df.groupBy(*key_cols).agg(*aggs))


def dedup_lww_window(df: DataFrame, key_cols: Sequence[str] = ("doc_id",),
                     order_cols: Sequence[str] = ("seq", "pos"),
                     salt_buckets: int = 0) -> DataFrame:
    """row_number-based LWW dedup (the SQL-oracle-checkable form).

    With ``salt_buckets``, a salted local window first reduces every
    (key, salt) group to one candidate, then the tiny survivor set goes
    through the global per-key window — two shuffles, but the second one
    moves ≤salt_buckets rows per key no matter how hot the key is.
    """
    order = [F.desc(c) for c in order_cols]
    if salt_buckets > 1:
        salt = F.pmod(F.coalesce(F.col(order_cols[-1]), F.lit(0)),
                      F.lit(salt_buckets)).alias("_salt")
        local = Window.partitionBy("_salt", *key_cols).orderBy(*order)
        df = (df.withColumn("_salt", salt)
                .withColumn("_rn", F.row_number().over(local))
                .filter(F.col("_rn") == 1).drop("_rn", "_salt"))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))


def dedup_enrich_candidates(df: DataFrame) -> DataFrame:
    """Enrichment-stream in-batch dedup: per (doc_id, seq) keep the last
    occurrence by pos (≙ ttl dedup on {KeyHash, LedgerSequence},
    reference: internal/transform/ttl.go:34-36). The cross-seq monotonic
    reduction happens inside merge_enrich, where the per-key ``first_seq``
    qualification is known."""
    return dedup_lww(df, key_cols=("doc_id", "seq"), order_cols=("pos",)) \
        .select("doc_id", "seq", "live_until")
