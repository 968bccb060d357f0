"""Packed-binary token codecs — fewer bytes through the write path.

The round-5 per-stage scaling decomposition located the one non-scaling
replay stage in the merge WRITE (BENCH/scaling_r05_stages_lz4.json:
4.07 s @8 → 7.02 s @32 threads — a shared DRAM/write-bandwidth wall this
single-socket box cannot scale past). On a bandwidth-walled path the
remaining lever is payload size (VERDICT r5 next-step 4): store the
token sequence as ONE BinaryType value instead of array<int>.

Two codecs, both Arrow-batched and numpy-vectorized end to end (no
per-token Python):

- ``u16``: fixed 2 bytes/token little-endian. Valid when every token id
  fits 16 bits (GPT-2-class vocabularies, ≤ 65535); the encoder REJECTS
  out-of-range values loudly rather than truncating. Halves the raw
  payload vs 4-byte ints and beats parquet's dictionary path on
  shuffle/serialization size (UnsafeArrayData carries 4 B/element plus
  headers through every exchange regardless of what parquet later does).
- ``varint``: LEB128-style 7-bits-per-byte, any non-negative int32 —
  1 byte < 128, 2 bytes < 16384, 3 bytes < 2^21. No delta step: token
  sequences are not sorted, so deltas of adjacent ids are sign-mixed and
  full-width (deltas help sorted posting lists, not text). Average
  ≈ 2.7 B/token on a 50k vocabulary.

Null sequences (delete tombstones) stay null through both directions.
Decode returns array<int> — the existing Arrow surface for consumers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

CODECS = ("array", "u16", "varint")


def probe_u16_eligible(events_path: str, tokens_col: str = "tokens",
                       max_files: int = 512) -> bool:
    """Driver-side vocabulary probe for the ``auto`` codec default
    (VERDICT r6 next-step 6): True iff every token id in the parquet
    source provably fits u16, decided from FOOTER STATISTICS alone — the
    leaf min/max of the tokens column across every row group of every
    file. Parquet stats are exact bounds, so a True here can never meet
    an out-of-range id later in THIS source; ids appended afterwards are
    still guarded by the encoder's loud reject. Conservative everywhere
    else: no stats, a non-parquet layout, an absent column, or more than
    ``max_files`` files (the probe is O(files) driver work) → False →
    the always-valid array codec."""
    import os

    import pyarrow.parquet as pq
    files: list[str] = []
    if not os.path.isdir(events_path):
        return False
    for root, _dirs, names in os.walk(events_path):
        files += [os.path.join(root, n) for n in names
                  if n.endswith(".parquet")]
        if len(files) > max_files:
            return False
    if not files:
        return False
    prefix = tokens_col + "."
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = next((i for i in range(md.num_columns)
                    if md.schema.column(i).path in (tokens_col,)
                    or md.schema.column(i).path.startswith(prefix)), None)
        if idx is None:
            return False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None:
                return False
            if not st.has_min_max:
                if st.num_values == 0:   # all-null row group (tombstones)
                    continue
                return False
            if st.min < 0 or st.max > 0xFFFF:
                return False
    return True


def _flatten(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Object array of int lists → (flat int64, row offsets, null mask)."""
    isnull = np.fromiter((v is None for v in vals), dtype=bool,
                         count=len(vals))
    lens = np.fromiter((0 if n else len(v)
                        for v, n in zip(vals, isnull)),
                       dtype=np.int64, count=len(vals))
    offsets = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = (np.concatenate([np.asarray(v, dtype=np.int64)
                            for v, n in zip(vals, isnull)
                            if not n and len(v)])
            if offsets[-1] else np.empty(0, np.int64))
    return flat, offsets, isnull


# ------------------------------------------------------------------ u16
@pandas_udf(T.BinaryType())
def encode_tokens_u16(tokens: pd.Series) -> pd.Series:
    vals = tokens.to_numpy()
    flat, offsets, isnull = _flatten(vals)
    if flat.size and (flat.min() < 0 or flat.max() > 0xFFFF):
        raise ValueError("u16 token codec: token id outside [0, 65535]")
    buf = flat.astype("<u2").tobytes()
    out = np.empty(len(vals), dtype=object)
    for i in range(len(vals)):
        out[i] = None if isnull[i] else buf[offsets[i] * 2:offsets[i + 1] * 2]
    return pd.Series(out)


@pandas_udf(T.ArrayType(T.IntegerType()))
def decode_tokens_u16(blob: pd.Series) -> pd.Series:
    vals = blob.to_numpy()
    out = np.empty(len(vals), dtype=object)
    for i, b in enumerate(vals):
        out[i] = None if b is None else \
            np.frombuffer(b, dtype="<u2").astype("int32").tolist()
    return pd.Series(out)


# --------------------------------------------------------------- varint
_MAXB = 5   # int32 fits 5 × 7-bit groups


@pandas_udf(T.BinaryType())
def encode_tokens_varint(tokens: pd.Series) -> pd.Series:
    vals = tokens.to_numpy()
    flat, offsets, isnull = _flatten(vals)
    if flat.size and flat.min() < 0:
        raise ValueError("varint token codec: negative token id")
    if flat.size:
        u = flat.astype(np.uint64)
        # bytes per value, then one (total_bytes,) u8 buffer filled by
        # byte position — the inner loop is over the 5 byte slots, never
        # over tokens
        nbytes = np.ones(len(u), dtype=np.int64)
        for b in range(1, _MAXB):
            nbytes += (u >= (np.uint64(1) << np.uint64(7 * b))).astype(
                np.int64)
        starts = np.zeros(len(u) + 1, dtype=np.int64)
        np.cumsum(nbytes, out=starts[1:])
        buf = np.zeros(starts[-1], dtype=np.uint8)
        for b in range(_MAXB):
            has = nbytes > b
            if not has.any():
                break
            byte = ((u[has] >> np.uint64(7 * b))
                    & np.uint64(0x7F)).astype(np.uint8)
            cont = (nbytes[has] > b + 1)
            buf[starts[:-1][has] + b] = byte | (cont << 7).astype(np.uint8)
        row_b = starts[offsets]          # per-row byte offsets
        raw = buf.tobytes()
    else:
        row_b = np.zeros(len(offsets), dtype=np.int64)
        raw = b""
    out = np.empty(len(vals), dtype=object)
    for i in range(len(vals)):
        out[i] = None if isnull[i] else raw[row_b[i]:row_b[i + 1]]
    return pd.Series(out)


@pandas_udf(T.ArrayType(T.IntegerType()))
def decode_tokens_varint(blob: pd.Series) -> pd.Series:
    vals = blob.to_numpy()
    isnull = np.fromiter((v is None for v in vals), dtype=bool,
                         count=len(vals))
    blens = np.fromiter((0 if n else len(v)
                         for v, n in zip(vals, isnull)),
                        dtype=np.int64, count=len(vals))
    boff = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(blens, out=boff[1:])
    out = np.empty(len(vals), dtype=object)
    if boff[-1]:
        buf = np.frombuffer(
            b"".join(v for v, n in zip(vals, isnull) if not n), np.uint8)
        ends = (buf & 0x80) == 0          # last byte of each varint
        vstart = np.zeros(len(buf), dtype=bool)
        vstart[0] = True
        vstart[1:] = ends[:-1]
        vid = np.cumsum(vstart) - 1       # value index of every byte
        first_of = np.flatnonzero(vstart)  # start byte of every value
        pos = np.arange(len(buf), dtype=np.int64) - first_of[vid]
        contrib = (buf.astype(np.uint64) & np.uint64(0x7F)) \
            << (np.uint64(7) * pos.astype(np.uint64))
        nvals = int(vid[-1]) + 1
        values = np.zeros(nvals, dtype=np.uint64)
        np.add.at(values, vid, contrib)
        values = values.astype(np.int64)
        # per-row value counts: number of varint terminators in the slice
        ends_cum = np.concatenate(([0], np.cumsum(ends)))
        row_vals = ends_cum[boff[1:]] - ends_cum[boff[:-1]]
        voff = np.zeros(len(vals) + 1, dtype=np.int64)
        np.cumsum(row_vals, out=voff[1:])
        for i in range(len(vals)):
            out[i] = None if isnull[i] else \
                values[voff[i]:voff[i + 1]].astype("int32").tolist()
    else:
        for i in range(len(vals)):
            out[i] = None if isnull[i] else []
    return pd.Series(out)


def encode_tokens(col: Column, codec: str) -> Column:
    if codec == "u16":
        return encode_tokens_u16(col)
    if codec == "varint":
        return encode_tokens_varint(col)
    raise ValueError(f"unknown token codec {codec!r} (want u16|varint)")


def decode_tokens(col: Column, codec: str) -> Column:
    if codec == "u16":
        return decode_tokens_u16(col)
    if codec == "varint":
        return decode_tokens_varint(col)
    raise ValueError(f"unknown token codec {codec!r} (want u16|varint)")
