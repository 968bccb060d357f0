"""CDC-stream filters and projection — the narrow (no-shuffle) stage.

Re-expresses the reference's per-row Go loops as whole-column Catalyst
expressions, so they pipeline inside one WholeStageCodegen span and the
predicates push down to the parquet/lake scan:

- entry-type filter   ≙ internal/transform/contract_data.go:20-22 (F1)
- nonce filter        ≙ internal/transform/contract_data.go:31-34 (F2)
- CDC image selection ≙ internal/contract/utils.go:14-25 (F3): created/
  updated/restored take the Post image with deleted=false; removed takes
  the Pre image with deleted=true; unknown change types are an error.
- projection          ≙ TransformContractData,
  internal/contract/contract_data.go:72-160 (P1), reduced to the
  tokenized-sequence domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import ENTRY_TOKENS, ENTRY_TTL, OP_DELETE, OP_INSERT, OP_UPDATE

VALID_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)


def filter_entry_type(events: DataFrame, entry_type: str) -> DataFrame:
    """F1 — dataset discriminator; pushed down to the scan."""
    return events.filter(F.col("entry_type") == F.lit(entry_type))


def filter_nonce(events: DataFrame) -> DataFrame:
    """F2 — drop rows with an empty identity (valid but not recorded)."""
    return events.filter(F.col("doc_id").isNotNull() & (F.col("doc_id") != ""))


def validate_ops(events: DataFrame) -> DataFrame:
    """F3's error branch: an unknown change type aborts the pipeline
    (reference returns an error, internal/contract/utils.go:22-24).
    JVM-side raise_error — no Python in the hot path."""
    return events.withColumn(
        "op",
        F.when(F.col("op").isin(*VALID_OPS), F.col("op")).otherwise(
            F.raise_error(F.concat(F.lit("unknown change op: "), F.col("op")))))


def project_base(events: DataFrame) -> DataFrame:
    """P1/F3 — project token-stream change events into target-shaped rows.

    ``deleted`` is derived from the op (the reference flags removed rows
    rather than physically deleting, internal/contract/utils.go:20-21);
    ``n_tok`` is the derived column (≙ key_symbol extraction, P6 — here
    size(tokens), a JVM builtin rather than a UDF).
    """
    e = filter_nonce(filter_entry_type(events, ENTRY_TOKENS))
    # tombstone semantics are ENFORCED here, not assumed of the producer:
    # a delete event's payload is nulled even if the producer attached
    # one, keeping final state a pure function of the stream (the
    # documented contract in operators/merge.py and tests/oracle.py).
    is_del = F.col("op") == OP_DELETE
    tokens = F.when(~is_del, F.col("tokens"))
    return e.select(
        "doc_id",
        tokens.alias("tokens"),
        F.when(~is_del & F.col("tokens").isNotNull(),
               F.size("tokens")).cast("int").alias("n_tok"),
        "source",
        "seq",
        "pos",
        "op",
        is_del.alias("deleted"),
        "closed_at",
    )


def project_enrich(events: DataFrame) -> DataFrame:
    """TTL-analog enrichment stream: (doc_id, seq, pos, live_until).
    ≙ TransformTtl, internal/contract/ttl.go:23-60."""
    e = filter_nonce(filter_entry_type(events, ENTRY_TTL))
    return e.select("doc_id", "seq", "pos", "live_until")
