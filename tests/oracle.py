"""Single-threaded reference-model replay — the golden-state oracle.

Replays the change stream exactly the way the reference indexer would
(reference: internal/main.go:127-144 + internal/db/utils.go:109-170),
translated to the tokenized-sequence domain:

- events are processed in ledger (seq) order; within one seq, ALL base
  (``tokens``) events apply before ALL ttl events — the reference runs
  the contract_data processor before the ttl processor for every ledger
  — and within each dataset, input (pos) order with last-writer-wins.
- base insert/update: applies when event.seq >= current.seq (in-order
  replay makes this the LWW rule); nonce rows (empty doc_id) skipped.
- base delete: tombstone — deleted=true, payload nulled (our change
  schema carries no pre-image), seq advances; a delete for an unseen key
  inserts the tombstone.
- ttl: applies only to existing keys (unmatched silently dropped) under
  the monotonic condition live_until IS NULL OR < new.
- first_seq: earliest base-event seq per key ("row existed since").

The engine must produce byte-identical final state for ANY epoch
slicing of the same stream — that is the exactly-once + determinism
contract (per-row invariant: token-array equality, BASELINE.json).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Iterable


def replay_oracle(events: Iterable[dict[str, Any]]) -> dict[str, dict[str, Any]]:
    """events: dicts with keys seq,pos,op,doc_id,tokens,source,entry_type,
    closed_at,live_until. Returns final state {doc_id: row}."""
    by_seq: dict[int, dict[str, list]] = defaultdict(lambda: {"tokens": [],
                                                              "ttl": []})
    for ev in events:
        by_seq[ev["seq"]][
            "ttl" if ev["entry_type"] == "ttl" else "tokens"].append(ev)

    state: dict[str, dict[str, Any]] = {}
    for seq in sorted(by_seq):
        for ev in sorted(by_seq[seq]["tokens"], key=lambda e: e["pos"]):
            doc = ev["doc_id"]
            if not doc:
                continue
            if ev["op"] not in ("insert", "update", "delete"):
                raise ValueError(f"unknown change op: {ev['op']}")
            cur = state.get(doc)
            if cur is not None and ev["seq"] < cur["seq"]:
                continue
            if ev["op"] == "delete":
                row = {"doc_id": doc, "tokens": None, "n_tok": None,
                       "source": ev["source"], "seq": ev["seq"],
                       "pos": ev["pos"],
                       "deleted": True, "closed_at": ev["closed_at"],
                       "live_until": cur["live_until"] if cur else None,
                       "first_seq": min(cur["first_seq"], ev["seq"])
                       if cur else ev["seq"]}
            else:
                toks = list(ev["tokens"]) if ev["tokens"] is not None else None
                row = {"doc_id": doc, "tokens": toks,
                       "n_tok": len(toks) if toks is not None else None,
                       "source": ev["source"], "seq": ev["seq"],
                       "pos": ev["pos"],
                       "deleted": False, "closed_at": ev["closed_at"],
                       "live_until": cur["live_until"] if cur else None,
                       "first_seq": min(cur["first_seq"], ev["seq"])
                       if cur else ev["seq"]}
            state[doc] = row
        # ttl batch of this ledger: dedup per key keep-LAST-occurrence
        # (≙ RemoveDuplicatesByFields on {KeyHash, LedgerSequence},
        # internal/transform/ttl.go:34-36 — an earlier-pos value in the
        # same ledger is discarded, not applied), then monotonic update
        last_by_doc: dict[str, dict] = {}
        for ev in sorted(by_seq[seq]["ttl"], key=lambda e: e["pos"]):
            if ev["doc_id"]:
                last_by_doc[ev["doc_id"]] = ev
        for doc, ev in last_by_doc.items():
            cur = state.get(doc)
            if cur is None:
                continue  # unmatched keys silently dropped
            lu = ev["live_until"]
            if lu is not None and (cur["live_until"] is None
                                   or cur["live_until"] < lu):
                cur["live_until"] = lu
    return state


def replay_events_oracle(events: Iterable[dict[str, Any]]) \
        -> dict[int, dict[str, Any]]:
    """Reference model for the doc_events dataset (contract-events
    analog): final state {event_id: row}, where event_id is the TOID
    (seq<<32 | tx<<12, internal/contract/contract_events.go:42), rows
    keyed LWW on (seq, pos) — re-delivered events collapse to the
    stream's last occurrence — and topics decoded from the serialized
    wire form."""
    import json

    state: dict[int, dict[str, Any]] = {}
    for ev in sorted((e for e in events if e["entry_type"] == "events"
                      and e["doc_id"]),
                     key=lambda e: (e["seq"], e["pos"])):
        tx = ev.get("tx_idx") or 0
        eid = (ev["seq"] << 32) | (tx << 12)
        state[eid] = {
            "event_id": eid, "doc_id": ev["doc_id"], "seq": ev["seq"],
            "pos": ev["pos"], "tx_idx": tx,
            "topics": (json.loads(ev["topics_json"])
                       if ev.get("topics_json") else None),
            "closed_at": ev["closed_at"]}
    return state


def replay_blobs_oracle(events: Iterable[dict[str, Any]]) \
        -> dict[str, dict[str, Any]]:
    """Reference model for the doc_blobs dataset (contract-code analog,
    internal/contract/contract_code.go:35): content-addressed rows keyed
    by hex(sha256(blob)), LWW on (seq, pos)."""
    import hashlib

    state: dict[str, dict[str, Any]] = {}
    for ev in sorted((e for e in events if e["entry_type"] == "code"
                      and e["doc_id"]),
                     key=lambda e: (e["seq"], e["pos"])):
        blob = ev["blob"]
        h = hashlib.sha256(blob).hexdigest()
        state[h] = {"code_hash": h, "blob": bytes(blob),
                    "n_bytes": len(blob), "doc_id": ev["doc_id"],
                    "seq": ev["seq"], "pos": ev["pos"],
                    "closed_at": ev["closed_at"]}
    return state


def rows_to_events(rows) -> list[dict[str, Any]]:
    """Spark Row / pyarrow dicts → plain event dicts."""
    out = []
    for r in rows:
        d = r.asDict(recursive=True) if hasattr(r, "asDict") else dict(r)
        out.append(d)
    return out


def decode_target_tokens(v, codec: str = "u16"):
    """Target ``tokens`` cell → list[int] | None. The engine's default
    codec resolution ("auto") packs eligible vocabularies as u16 binary
    (JobConfig.tokens_codec); the oracle compares logical token ids, so
    packed cells are decoded here. Array-codec cells pass through."""
    if v is None or isinstance(v, list):
        return v
    if isinstance(v, tuple):
        return list(v)
    if isinstance(v, (bytes, bytearray)):
        import numpy as np
        if codec == "u16":
            return np.frombuffer(bytes(v), dtype="<u2").astype(int).tolist()
        raise ValueError(f"unexpected packed codec {codec}")
    return v


def state_from_target(rows) -> dict[str, dict[str, Any]]:
    """Engine target-table rows → comparable {doc_id: row} dict
    (packed token payloads decoded — see decode_target_tokens)."""
    out = {}
    for r in rows:
        d = r.asDict(recursive=True) if hasattr(r, "asDict") else dict(r)
        d = {k: (list(v) if isinstance(v, (list, tuple)) else v)
             for k, v in d.items()}
        if "tokens" in d:
            d["tokens"] = decode_target_tokens(d["tokens"])
        out[d["doc_id"]] = d
    return out


def assert_states_equal(engine: dict[str, dict], oracle: dict[str, dict],
                        compare_cols=("tokens", "n_tok", "source", "seq",
                                      "pos", "first_seq", "deleted",
                                      "closed_at", "live_until")) -> None:
    assert set(engine) == set(oracle), (
        f"doc_id sets differ: only-engine={sorted(set(engine) - set(oracle))[:5]} "
        f"only-oracle={sorted(set(oracle) - set(engine))[:5]}")
    for doc in oracle:
        e, o = engine[doc], oracle[doc]
        for c in compare_cols:
            assert e.get(c) == o.get(c), (
                f"doc {doc} col {c}: engine={e.get(c)!r} oracle={o.get(c)!r}")
