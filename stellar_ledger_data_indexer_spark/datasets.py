"""Dataset registry — the engine's ordered-processor list.

The reference wires its datasets as an ORDERED list of (processor,
adapter) pairs consumed by one generic loop (reference:
internal/main.go:125-144 — ``datasets := []string{"contract_data",
"ttl"}``; adding a dataset there means registering a tuple, not editing
the pipeline body). It also ships two datasets that are present but
unwired — contract code and contract events
(internal/contract/contract_code.go:35, contract_events.go:35) — the
latter with a nested ``map[string][]map[string]string`` topics payload
and a TOID transaction id (contract_events.go:25-26,42).

This module is the Spark analog: a ``DatasetSpec`` names the entry-type
filter, the projector, the dedup keys, and the merge kind; ``IngestJob``
consumes the registered specs in order inside each epoch. ``tokens`` and
``ttl`` are the always-on pair (they share the fused merge into the main
target — the per-ledger base-before-ttl order of the reference);
``doc_events`` is the contract-events analog: an events dataset with the
nested topics MapType and a TOID key, merged LWW into its OWN keyed
table.

Scale note: each upsert dataset is an independent bucketed LakeTable;
its merge shuffles only that dataset's epoch slice on its own key and
rewrites/appends only its own buckets — datasets do not widen each
other's shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.dedup import dedup_lww
from .schema import (DOC_BLOBS, DOC_EVENTS, ENTRY_CODE, ENTRY_EVENTS,
                     TOPICS_TYPE)


def project_events(events: DataFrame) -> DataFrame:
    """Contract-events-analog projection (≙ TransformContractEvent,
    internal/contract/contract_events.go:60-135): entry-type + nonce
    filter, TOID id packing (ledger<<32 | tx<<12 | 0 —
    contract_events.go:42 via toid.New), and the nested topics payload
    decoded from its serialized wire form into
    ``map<string, array<map<string,string>>>``
    (contract_events.go:25-26; serializer :137-170). The decode is
    JVM-side ``from_json`` — no Python in the hot path."""
    from .operators.cdc import filter_entry_type, filter_nonce

    e = filter_nonce(filter_entry_type(events, ENTRY_EVENTS))
    toid = (F.shiftleft(F.col("seq"), 32)
            .bitwiseOR(F.shiftleft(F.coalesce(F.col("tx_idx"), F.lit(0)),
                                   12)))
    return e.select(
        toid.alias("event_id"),
        "doc_id",
        "seq",
        "pos",
        F.coalesce(F.col("tx_idx"), F.lit(0)).alias("tx_idx"),
        F.from_json(F.col("topics_json"), TOPICS_TYPE).alias("topics"),
        "closed_at",
    )


def dedup_events(batch: DataFrame) -> DataFrame:
    """In-batch LWW per event_id (re-delivered events collapse to the
    stream's last occurrence — same contract as D1)."""
    return dedup_lww(batch, key_cols=("event_id",), order_cols=("seq", "pos"))


def project_blobs(events: DataFrame) -> DataFrame:
    """Contract-code-analog projection (≙ the unwired contract_code
    dataset, internal/contract/contract_code.go:35): binary payloads
    keyed by their OWN content hash — the key is hex(sha256(blob)),
    computed JVM-side (≙ the reference hashing serialized entries for
    row identity, internal/contract/utils.go:37-43). Duplicate payloads
    across the stream collapse onto one content-addressed row."""
    from .operators.cdc import filter_entry_type, filter_nonce

    e = filter_nonce(filter_entry_type(events, ENTRY_CODE))
    return e.select(
        F.sha2(F.col("blob"), 256).alias("code_hash"),
        "blob",
        F.length(F.col("blob")).cast("int").alias("n_bytes"),
        "doc_id",
        "seq",
        "pos",
        "closed_at",
    )


def dedup_blobs(batch: DataFrame) -> DataFrame:
    return dedup_lww(batch, key_cols=("code_hash",),
                     order_cols=("seq", "pos"))


@dataclass(frozen=True)
class DatasetSpec:
    """One registered dataset (≙ a processor+adapter pair in the
    reference's ordered list, internal/main.go:127-144).

    kind:
      - "base":   the main token stream — fused LWW upsert into the main
                  target (handled by apply_change_batch's base stage)
      - "enrich": update-only monotonic enrichment of the main target
                  (the ttl stage; must come after its base dataset)
      - "upsert": an independent keyed table fed by a conditional LWW
                  upsert (≙ UpsertRows with a {seq, OpGT} condition,
                  internal/db/utils.go:74-130)
    """
    name: str
    entry_type: str
    kind: str
    table: str | None = None               # warehouse-relative table name
    key_col: str | None = None
    schema: T.StructType | None = None
    project: Callable[[DataFrame], DataFrame] | None = None
    dedup: Callable[[DataFrame], DataFrame] | None = None


TOKENS_SPEC = DatasetSpec(name="tokens", entry_type="tokens", kind="base")
TTL_SPEC = DatasetSpec(name="ttl", entry_type="ttl", kind="enrich")
DOC_EVENTS_SPEC = DatasetSpec(
    name="doc_events", entry_type=ENTRY_EVENTS, kind="upsert",
    table="doc_events", key_col="event_id", schema=DOC_EVENTS,
    project=project_events, dedup=dedup_events)
DOC_BLOBS_SPEC = DatasetSpec(
    name="doc_blobs", entry_type=ENTRY_CODE, kind="upsert",
    table="doc_blobs", key_col="code_hash", schema=DOC_BLOBS,
    project=project_blobs, dedup=dedup_blobs)

REGISTRY: dict[str, DatasetSpec] = {
    s.name: s for s in (TOKENS_SPEC, TTL_SPEC, DOC_EVENTS_SPEC,
                        DOC_BLOBS_SPEC)
}

# the reference's default wiring (order matters: base before enrich,
# internal/main.go:127-129)
DEFAULT_DATASETS: tuple[str, ...] = ("tokens", "ttl")


def resolve(names: tuple[str, ...] | list[str]) -> list[DatasetSpec]:
    """Validate + order-preserve a dataset selection. The base/enrich
    pair is structural: tokens must be present, and ttl (if present)
    must follow it — the reference's dependency order."""
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise ValueError(f"unknown datasets {unknown}; "
                         f"registered: {sorted(REGISTRY)}")
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate datasets in {list(names)} — each "
                         f"would merge (and pay a commit) twice per epoch")
    if "tokens" not in names:
        raise ValueError("the 'tokens' base dataset is mandatory")
    if "ttl" in names and list(names).index("ttl") < list(names).index("tokens"):
        raise ValueError("'ttl' enriches 'tokens' and must come after it "
                         "(internal/main.go:127-129)")
    return [REGISTRY[n] for n in names]
