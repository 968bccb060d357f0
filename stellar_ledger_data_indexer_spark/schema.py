"""Canonical schemas for the CDC replay engine.

Mirrors the reference data model translated to the tokenized-sequence
domain (BASELINE.json input_hint):

- change_events  ≙ the ledger change stream (one row per ingest.Change,
  reference: internal/utils/processor.go:52-76). ``seq`` is the LWW version
  (≙ ledger_sequence), ``pos`` the intra-seq ordinal (the reference keeps
  the *last occurrence in input order* on duplicate keys,
  internal/utils/processor.go:100 — Spark has no input order after a
  shuffle, so the order is explicit in the data).
- documents (target) ≙ contract_data
  (internal/db/migrations/20250807-create-contract-data.sql:3-13 plus the
  schema-evolved live_until column,
  20260203-add-ttl-to-contract-data.sql:3-4).
- checkpoints / lineage / metrics ≙ the resume watermark
  (internal/db/utils.go:61-71) and Prometheus metrics
  (internal/utils/metrics.go:32-152), made durable as tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

# dataset discriminator values (≙ xdr.LedgerEntryType filter,
# reference: internal/transform/contract_data.go:20-22, ttl.go:20-22;
# ENTRY_EVENTS ≙ the contract-events dataset the reference carries but
# leaves unwired, internal/contract/contract_events.go:35)
ENTRY_TOKENS = "tokens"
ENTRY_TTL = "ttl"
ENTRY_EVENTS = "events"
ENTRY_CODE = "code"

OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"

# the nested topics payload of the events dataset
# (≙ map[string][]map[string]string, internal/contract/contract_events.go:25-26)
TOPICS_TYPE = T.MapType(
    T.StringType(),
    T.ArrayType(T.MapType(T.StringType(), T.StringType())))

CHANGE_EVENTS = T.StructType([
    T.StructField("seq", T.LongType(), False),
    T.StructField("pos", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("doc_id", T.StringType(), True),      # "" = nonce (filtered)
    T.StructField("tokens", T.ArrayType(T.IntegerType()), True),  # null for delete
    T.StructField("source", T.StringType(), True),
    T.StructField("entry_type", T.StringType(), False),
    T.StructField("closed_at", T.TimestampType(), False),
    T.StructField("live_until", T.LongType(), True),    # ttl events only
    # events entries only (≙ the serialized XDR topic blob the reference
    # decodes per event, contract_events.go:137-170; JSON here, decoded
    # JVM-side with from_json)
    T.StructField("tx_idx", T.LongType(), True),
    T.StructField("topics_json", T.StringType(), True),
    # code entries only (≙ the raw contract code blob,
    # internal/contract/contract_code.go:35 — the reference's other
    # present-but-unwired dataset)
    T.StructField("blob", T.BinaryType(), True),
])

# the contract-code-analog output table: binary payloads keyed by their
# OWN content hash (≙ contract_code keyed by code hash,
# internal/contract/contract_code.go:35) — the content-addressed shape a
# training pipeline uses for artifact/blob stores
DOC_BLOBS = T.StructType([
    T.StructField("code_hash", T.StringType(), False),  # hex(sha256(blob))
    T.StructField("blob", T.BinaryType(), True),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("doc_id", T.StringType(), True),      # owner/entity key
    T.StructField("seq", T.LongType(), False),
    T.StructField("pos", T.LongType(), True),
    T.StructField("closed_at", T.TimestampType(), True),
])

# the contract-events-analog output table: immutable per-event rows keyed
# by TOID (ledger<<32 | tx<<12, contract_events.go:42)
DOC_EVENTS = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("seq", T.LongType(), False),
    T.StructField("pos", T.LongType(), True),
    T.StructField("tx_idx", T.LongType(), True),
    T.StructField("topics", TOPICS_TYPE, True),
    T.StructField("closed_at", T.TimestampType(), True),
])

TARGET = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    T.StructField("n_tok", T.IntegerType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("seq", T.LongType(), False),
    # intra-seq ordinal of the winning event: persisting it makes the LWW
    # condition lexicographic on (seq, pos), so equal-seq events split
    # across epochs/micro-batches still resolve to the stream's last
    # occurrence (≙ internal/utils/processor.go:100 keep-last semantics)
    T.StructField("pos", T.LongType(), True),
    # earliest base-event seq ever seen for this key — the "row existed
    # since" watermark that lets per-epoch enrichment reproduce the
    # reference's per-ledger ordering (base stage before ttl stage within
    # each ledger, internal/main.go:127-144): a ttl event at seq s applies
    # iff first_seq <= s, i.e. iff the row existed when ledger s ran.
    T.StructField("first_seq", T.LongType(), True),
    T.StructField("deleted", T.BooleanType(), False),
    T.StructField("closed_at", T.TimestampType(), True),
    T.StructField("live_until", T.LongType(), True),
])

CHECKPOINTS = T.StructType([
    T.StructField("epoch_id", T.LongType(), False),
    T.StructField("lo_seq", T.LongType(), False),
    T.StructField("hi_seq", T.LongType(), False),
    T.StructField("target_snapshot", T.LongType(), False),
    T.StructField("rows_upserted", T.LongType(), True),
    T.StructField("rows_enriched", T.LongType(), True),
    T.StructField("committed_at", T.TimestampType(), False),
])

LINEAGE = T.StructType([
    T.StructField("epoch_id", T.LongType(), False),
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("rows_in", T.LongType(), True),
    T.StructField("rows_out", T.LongType(), True),
])

METRICS = T.StructType([
    T.StructField("epoch_id", T.LongType(), False),
    T.StructField("dataset", T.StringType(), False),
    T.StructField("rows_read", T.LongType(), True),
    T.StructField("rows_deduped", T.LongType(), True),
    T.StructField("rows_matched", T.LongType(), True),
    T.StructField("rows_inserted", T.LongType(), True),
    T.StructField("rows_updated", T.LongType(), True),
    T.StructField("wall_secs", T.DoubleType(), True),
    # per-epoch write amplification signal: bytes committed by the merge
    # (delta bytes under merge-on-read; full bucket rewrites under CoW)
    T.StructField("bytes_written", T.LongType(), True),
])
