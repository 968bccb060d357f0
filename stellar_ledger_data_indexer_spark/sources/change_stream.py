"""Deterministic distributed change-stream synthesis + bounded reads.

The reference's source is a GCS lake of ledger files consumed over a
sequence range with buffered prefetch (reference:
internal/input/ledgerMetaDataReader.go:95-124); ours is a parquet dataset
of change events, range-partitioned and sorted by ``seq`` so that an epoch
read ``seq BETWEEN lo AND hi`` prunes at the file and row-group level.

Synthesis is counter-based (splitmix64 over the event ordinal): every
column is a pure function of ``(seed, event_id)``, so the dataset is
byte-stable regardless of partitioning or cluster size — the property that
lets the pytest oracle recompute the same stream single-threaded. The
generator runs distributed via ``mapInArrow`` building Arrow ListArrays
directly: zero driver-side loops, zero per-row Python.

Stream shape (mirrors FIXTURES.md §1): ~5% deletes, ~15% ttl-enrichment
events, ~1% nonce rows (empty doc_id — filtered, ≙ F2), one hot key
(``doc00000000``) holding ~10% of events for skew tests, deliberate
duplicate-key-within-one-seq collisions (dedup regression, ≙
internal/transform/ttl_test.go:113-243).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import CHANGE_EVENTS

BASE_TS = 1_700_000_000  # fixed epoch base for closed_at (UTC)

_M = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _h(ids: np.ndarray, seed: int, stream: int) -> np.ndarray:
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        return _splitmix64(ids.astype(np.uint64)
                           + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
                           + np.uint64(stream) * np.uint64(0xD6E8FEB86659FD93))


@dataclass
class StreamSpec:
    n_events: int
    n_docs: int = 1000
    seed: int = 42
    events_per_seq: int = 100     # duplicate (doc, seq) pairs arise naturally
    hot_permille: int = 100       # ~10% of events hit the hot key
    ttl_permille: int = 150       # ~15% ttl enrichment events
    delete_pct: int = 5
    insert_pct: int = 40          # rest are updates
    nonce_permille: int = 10      # ~1% empty doc_id
    # opt-in third/fourth datasets (contract-events / contract-code
    # analogs): 0 keeps the stream byte-identical to the r1/r2 fixtures
    # (golden literals pinned on it)
    events_permille: int = 0
    code_permille: int = 0
    tok_len_min: int = 1
    tok_len_max: int = 64
    vocab: int = 50257
    n_sources: int = 10


def _gen_batch(ids: np.ndarray, s: StreamSpec) -> pa.RecordBatch:
    n = len(ids)
    u = ids.astype(np.uint64)
    h_doc = _h(u, s.seed, 1)
    h_hot = _h(u, s.seed, 2)
    h_type = _h(u, s.seed, 3)
    h_op = _h(u, s.seed, 4)
    h_len = _h(u, s.seed, 5)
    h_ttl = _h(u, s.seed, 6)
    h_nonce = _h(u, s.seed, 7)

    k = (np.uint64(1) + h_doc % np.uint64(max(s.n_docs - 1, 1))).astype(np.int64)
    hot = (h_hot % np.uint64(1000)) < np.uint64(s.hot_permille)
    k[hot] = 0
    nonce = (h_nonce % np.uint64(1000)) < np.uint64(s.nonce_permille)

    doc_id = np.char.mod("doc%08d", k)
    doc_id = np.where(nonce, "", doc_id)

    is_ttl = (h_type % np.uint64(1000)) < np.uint64(s.ttl_permille)
    # events entries (opt-in third dataset) are carved from an
    # independent hash stream and take precedence over the ttl draw
    h_evt = _h(u, s.seed, 9)
    is_evt = (h_evt % np.uint64(1000)) < np.uint64(s.events_permille)
    h_code = _h(u, s.seed, 10)
    is_code = ((h_code % np.uint64(1000)) < np.uint64(s.code_permille)) \
        & ~is_evt
    is_ttl = is_ttl & ~is_evt & ~is_code
    opd = (h_op % np.uint64(100)).astype(np.int64)
    op = np.where(opd < s.delete_pct, "delete",
                  np.where(opd < s.delete_pct + s.insert_pct, "insert",
                           "update"))
    op = np.where(is_ttl, "update", op)
    op = np.where(is_evt | is_code, "insert", op)  # immutable appends
    entry_type = np.where(is_ttl, "ttl", "tokens")
    entry_type = np.where(is_evt, "events", entry_type)
    entry_type = np.where(is_code, "code", entry_type)

    # seqs start at 2: seq<=1 is the planner's unbounded-tail sentinel
    # (≙ ledger 1 being the network genesis in the reference domain)
    seq = (np.uint64(2) + u // np.uint64(s.events_per_seq)).astype(np.int64)
    pos = (u % np.uint64(s.events_per_seq)).astype(np.int64)
    source = np.char.mod("src%02d", (h_doc % np.uint64(s.n_sources))
                         .astype(np.int64))

    # ttl bumps wander around seq (some go backwards → rejected by the
    # monotonic condition, FIXTURES.md §2)
    live_until = seq + (h_ttl % np.uint64(10000)).astype(np.int64) - 2000
    live_until = np.maximum(live_until, 1)
    live_mask = is_ttl  # null elsewhere

    # events payload: a small per-event nested topics object, serialized
    # (≙ the XDR topic blob, decoded engine-side with from_json —
    # contract_events.go:137-170). Deterministic pure function of the
    # event hash; duplicate TOIDs within a seq arise naturally from the
    # tx_idx draw (dedup regression surface for the events dataset).
    # Guarded: the default spec carries no events/code rows, and the
    # numpy object-string ops below are the slowest thing in this
    # function — don't pay them to build fully-masked arrays.
    if is_evt.any():
        tx_idx = (h_evt % np.uint64(4096)).astype(np.int64)
        t_name = np.char.mod("t%d", ((h_evt >> np.uint64(12)) % np.uint64(3))
                             .astype(np.int64))
        k_name = np.char.mod("k%d", ((h_evt >> np.uint64(14)) % np.uint64(5))
                             .astype(np.int64))
        v_str = np.char.mod("%d", ((h_evt >> np.uint64(17))
                                   % np.uint64(100000)).astype(np.int64))
        topics_json = ('{"' + t_name.astype(object) + '":[{"' +
                       k_name.astype(object) + '":"' + v_str.astype(object)
                       + '"}]}')
        tx_arr = pa.array(tx_idx, mask=~is_evt)
        tj_arr = pa.array(topics_json, mask=~is_evt)
    else:
        tx_arr = pa.nulls(n, pa.int64())
        tj_arr = pa.nulls(n, pa.string())

    # code payload: deterministic variable-length bytes. A small hash
    # pool makes duplicate blobs arise naturally across rows — the
    # content-addressed key (sha256) then collapses them in the
    # doc_blobs table, exercising LWW on a key that is a pure function
    # of the payload.
    if is_code.any():
        blob_seed = (h_code >> np.uint64(20)) % np.uint64(64)
        b0 = _h(blob_seed, s.seed, 11)
        b1 = _h(blob_seed, s.seed, 12)
        reps = (np.uint64(1) + (h_code >> np.uint64(26)) % np.uint64(3)) \
            .astype(np.int64)
        blob_strs = np.char.add(np.char.mod("%016x", b0.astype("uint64")),
                                np.char.mod("%016x", b1.astype("uint64")))
        blobs = np.char.encode(np.char.multiply(blob_strs, reps), "ascii")
        blob_arr = pa.array(blobs, type=pa.binary(), mask=~is_code)
    else:
        blob_arr = pa.nulls(n, pa.binary())

    # token arrays: null for deletes / ttl / events / code / nonce rows
    has_tokens = (~is_ttl) & (~is_evt) & (~is_code) & (op != "delete") \
        & (~nonce)
    span = max(s.tok_len_max - s.tok_len_min + 1, 1)
    lens = (np.uint64(s.tok_len_min) + h_len % np.uint64(span)).astype(np.int64)
    lens = np.where(has_tokens, lens, 0)
    offsets64 = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets64[1:])
    total = int(offsets64[-1])
    # value j of row i = splitmix64(doc_key, global token ordinal) % vocab —
    # depends only on (seed, id, j): byte-stable under any partitioning
    row_of_tok = np.repeat(np.arange(n), lens)
    tok_ordinal = np.arange(total, dtype=np.int64) - np.repeat(offsets64[:-1], lens)
    with np.errstate(over="ignore"):
        tok_key = u[row_of_tok] * np.uint64(131071) + tok_ordinal.astype(np.uint64)
    tok_vals = (_h(tok_key, s.seed, 8) % np.uint64(s.vocab)).astype(np.int32)
    # a null at offsets[i] makes list element i null (pyarrow from_arrays
    # convention); the final boundary offset stays valid
    offsets = pa.array(offsets64.astype(np.int32), type=pa.int32(),
                       mask=np.concatenate([~has_tokens, [False]]))
    tokens = pa.ListArray.from_arrays(offsets, pa.array(tok_vals,
                                                        type=pa.int32()))

    return pa.RecordBatch.from_arrays(
        [pa.array(seq), pa.array(pos), pa.array(op.astype(object)),
         pa.array(doc_id.astype(object)), tokens,
         pa.array(source.astype(object)),
         pa.array(entry_type.astype(object)),
         pa.array(BASE_TS + seq),
         pa.array(live_until, mask=~live_mask),
         tx_arr,
         tj_arr,
         blob_arr],
        names=["seq", "pos", "op", "doc_id", "tokens", "source",
               "entry_type", "closed_at_s", "live_until", "tx_idx",
               "topics_json", "blob"])


def synthesize_change_events(spark: SparkSession, spec: StreamSpec,
                             partitions: int | None = None) -> DataFrame:
    """Distributed deterministic synthesis of ``spec.n_events`` change rows."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, spec.n_events, numPartitions=parts)

    out_schema = ("seq long, pos long, op string, doc_id string, "
                  "tokens array<int>, source string, entry_type string, "
                  "closed_at_s long, live_until long, tx_idx long, "
                  "topics_json string, blob binary")

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            ids = rb.column(0).to_numpy()
            yield _gen_batch(ids, spec)

    df = base.mapInArrow(gen, out_schema)
    return (df.withColumn("closed_at", F.timestamp_seconds(F.col("closed_at_s")))
              .drop("closed_at_s")
              .select([f.name for f in CHANGE_EVENTS.fields]))


def write_change_events(spark: SparkSession, path: str, spec: StreamSpec,
                        partitions: int | None = None) -> None:
    """Materialize the stream range-partitioned + sorted on (seq, pos) so
    epoch reads prune files/row-groups via parquet min-max stats — the
    analog of the reference lake's ledgers-per-file layout
    (config-test.toml:7-9).

    Range boundaries are on ``seq`` ALONE (not (seq, pos)) so a file
    boundary never splits one seq's events across files — whole ledgers
    per file, like the reference. This matters for the streaming tail:
    a micro-batch (N whole files) must carry complete seqs, because the
    per-(doc_id, seq) keep-last-pos dedup of ttl candidates (ttl.go:34-36)
    is only correct when it sees all of a seq's events together — the
    update is monotonic-max, so an earlier-pos value applied in one
    micro-batch cannot be retracted when the seq's true last-pos event
    arrives in the next (observed as a golden-state divergence before
    this alignment)."""
    df = synthesize_change_events(spark, spec, partitions)
    parts = partitions or spark.sparkContext.defaultParallelism
    # 8 MB parquet row groups (r7, guide §6): the default 128 MB row
    # group makes every file a single unsplittable scan unit, capping an
    # epoch read's parallelism at its file count (measured: an 11-file
    # epoch scanned 11-wide on 32 cores). Small row groups keep files
    # splittable so scan parallelism follows bytes, and tighten per-row-
    # group seq stats for range pruning. File count/boundaries (and the
    # streaming whole-seqs-per-file contract) are unchanged.
    (df.repartitionByRange(parts, "seq")
       .sortWithinPartitions("seq", "pos")
       .write.mode("overwrite")
       .option("parquet.block.size", 8 << 20)
       .parquet(path))
    _seq_align_file_names(path)


def _seq_align_file_names(path: str) -> None:
    """Rename data files to seq-range-encoded names and stamp mtimes
    monotonically in that order.

    Spark's streaming file source processes files in modification-time
    order — with a same-job write all parts share one mtime, so the
    micro-batch order was only INCIDENTALLY the seq order (the r1 flake:
    a ttl seq split across micro-batches applied an earlier-pos value it
    could not retract). The writer owns the layout (≙ the reference
    lake's deterministic ledgers_per_file naming, config-test.toml:7-9),
    so it makes the contract structural: file names carry [min_seq,
    max_seq] and mtimes are strictly increasing in seq order — the
    mtime-ordered source now IS seq-ordered, under any
    maxFilesPerTrigger. Empty shuffle parts (range partitioner slack)
    are dropped."""
    import time as _time

    import pyarrow.parquet as pq

    infos: list[tuple[int, int, str]] = []
    for n in sorted(os.listdir(path)):
        if not n.endswith(".parquet"):
            continue
        full = os.path.join(path, n)
        md = pq.ParquetFile(full).metadata
        if md.num_rows == 0:
            os.unlink(full)
            continue
        sidx = {md.schema.column(i).name: i
                for i in range(md.num_columns)}["seq"]
        mns, mxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(sidx).statistics
            if st is not None and st.has_min_max:
                mns.append(st.min)
                mxs.append(st.max)
        infos.append((int(min(mns)), int(max(mxs)), n))
    infos.sort()
    base = int(_time.time()) - 2 * len(infos)
    for i, (mn, mx, n) in enumerate(infos):
        new = os.path.join(path, f"seq-{mn:012d}-{mx:012d}-{i:05d}.parquet")
        os.rename(os.path.join(path, n), new)
        ts = base + 2 * i
        os.utime(new, (ts, ts))


def read_change_events(spark: SparkSession, path: str, lo: int | None = None,
                       hi: int | None = None) -> DataFrame:
    """Bounded epoch read (≙ S1). The seq predicate reaches the parquet
    scan as PushedFilters — verify with .explain('formatted')."""
    df = spark.read.schema(CHANGE_EVENTS).parquet(path)
    if lo is not None:
        df = df.filter(F.col("seq") >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col("seq") <= F.lit(hi))
    return df


def max_seq_in_source(spark: SparkSession, path: str) -> int:
    """≙ datastore.FindLatestLedgerSequence (S2, internal/main.go:178-182)."""
    row = read_change_events(spark, path).agg(
        F.coalesce(F.max("seq"), F.lit(0)).alias("m")).collect()[0]
    return int(row["m"])
