"""stellar_ledger_data_indexer_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression (NOT a port) of the capabilities of
stellar/stellar-ledger-data-indexer (reference at /root/reference): replay an
ordered change stream of keyed records into a lake table with
last-writer-wins conditional upserts, update-only enrichment, exactly-once
epoch checkpointing, resume/backfill range planning, schema evolution,
per-partition lineage and metrics — built on the PySpark DataFrame API.

The reference tails Stellar ledger files from GCS and applies conditional
upserts into Postgres (reference: internal/main.go:105-215). Here the domain
is pre-tokenized training sequences (doc_id, tokens array<int>, n_tok,
source) and the sink is a snapshot-committed parquet lake table
(``lake.table.LakeTable``) providing the Iceberg semantics the design calls
for (atomic snapshot commit, MERGE, schema evolution, time travel) without
requiring external jars.
"""

__version__ = "0.1.0"
