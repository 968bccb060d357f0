"""Vectorized token-array functions — the engine's UDF surface.

The reference's per-row decode/derive functions (TransformContractData
P1, AssetFromContractData P9, ContractBalanceFromContractData P10 —
reference: internal/contract/contract_data.go:72-381) are the model: all
payload-touching computation. Here every function is Arrow-vectorized
(pandas_udf / mapInArrow) with numpy segment ops (``np.*.reduceat`` over
the flattened values + offsets) — no per-row Python in any hot path
(BASELINE.json input_hint).

Where a builtin exists (``F.size``, ``F.element_at``) we prefer it; these
UDFs cover what builtins can't express efficiently (rolling fingerprints,
validated normalization, per-row segment stats in one pass).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xBF58476D1CE4E5B9)
_P3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + _P1)
        x = (x ^ (x >> np.uint64(30))) * _P2
        x = (x ^ (x >> np.uint64(27))) * _P3
        return x ^ (x >> np.uint64(31))


def _flatten(s: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Series of list/ndarray (+ None) → (values, offsets, isnull).
    One concatenate; everything after is segment arithmetic."""
    vals = s.to_numpy()
    isnull = np.array([v is None or (isinstance(v, float) and np.isnan(v))
                       for v in vals])
    lens = np.array([0 if n else len(v) for v, n in zip(vals, isnull)],
                    dtype=np.int64)
    offsets = np.zeros(len(s) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if offsets[-1] == 0:
        return np.empty(0, np.int64), offsets, isnull
    values = np.concatenate([np.asarray(v, dtype=np.int64)
                             for v, n in zip(vals, isnull)
                             if not n and len(v)])
    return values, offsets, isnull


def _segment_reduce(ufunc, values: np.ndarray, offsets: np.ndarray,
                    fill, dtype) -> np.ndarray:
    """out[i] = ufunc.reduce(values[offsets[i]:offsets[i+1]]), ``fill`` for
    empty segments. reduceat is called only at non-empty segment starts:
    consecutive non-empty starts bound each other exactly because empty
    segments have zero width."""
    n = len(offsets) - 1
    out = np.full(n, fill, dtype=dtype)
    empty = offsets[:-1] == offsets[1:]
    if values.size and (~empty).any():
        with np.errstate(over="ignore"):
            out[~empty] = ufunc.reduceat(values, offsets[:-1][~empty])
    return out


@pandas_udf(T.LongType())
def tokens_fingerprint(s: pd.Series) -> pd.Series:
    """Order-sensitive 64-bit fingerprint of the token array (position-
    mixed rolling hash; the document-fingerprint primitive). Null → null,
    empty → 0."""
    values, offsets, isnull = _flatten(s)
    pos = (np.arange(len(values), dtype=np.uint64)
           - np.repeat(offsets[:-1], np.diff(offsets)).astype(np.uint64))
    with np.errstate(over="ignore"):
        h = _mix(values.astype(np.uint64) ^ (pos * _P2))
    sums = _segment_reduce(np.add, h, offsets, np.uint64(0), np.uint64)
    out = _mix(sums).astype(np.int64).astype(object)
    empty = offsets[:-1] == offsets[1:]
    out[empty] = 0
    out[isnull] = None
    return pd.Series(out)


@pandas_udf(T.BooleanType())
def _validate_tokens_udf(s: pd.Series, vocab: pd.Series) -> pd.Series:
    """All tokens within [0, vocab)? (≙ the validate half of the
    reference's structural derivations, e.g. the negative-hi rejection in
    ContractBalanceFromContractData, contract_data.go:360-366).
    Empty → true, null → null."""
    v = int(vocab.iloc[0])
    values, offsets, isnull = _flatten(s)
    ok_elem = (values >= 0) & (values < v)
    ok = _segment_reduce(np.logical_and, ok_elem, offsets, True, bool)
    out = ok.astype(object)
    out[isnull] = None
    return pd.Series(out)


def validate_tokens(col, vocab: int):
    return _validate_tokens_udf(col, F.lit(vocab))


_STATS_T = T.StructType([T.StructField("n", T.IntegerType()), T.StructField("mn", T.IntegerType()), T.StructField("mx", T.IntegerType()), T.StructField("total", T.LongType())])


@pandas_udf(_STATS_T)
def token_stats(s: pd.Series) -> pd.DataFrame:
    """Per-row (count, min, max, sum) in one flattened pass — the derived-
    column family (≙ key_symbol / n_tok derivation, P6)."""
    values, offsets, isnull = _flatten(s)
    n = np.diff(offsets).astype("float64")
    mins = _segment_reduce(np.minimum, values, offsets, 0, np.int64) \
        .astype("float64")
    maxs = _segment_reduce(np.maximum, values, offsets, 0, np.int64) \
        .astype("float64")
    sums = _segment_reduce(np.add, values, offsets, 0, np.int64) \
        .astype("float64")
    empty = offsets[:-1] == offsets[1:]
    mins[empty] = np.nan
    maxs[empty] = np.nan
    df = pd.DataFrame({"n": n, "mn": mins, "mx": maxs, "total": sums})
    df.loc[isnull, :] = np.nan
    return df


def normalize_tokens_arrow(df, tokens_col: str = "tokens", vocab: int = 50257):
    """mapInArrow normalization: drop out-of-range tokens, rebuild the
    ListArray from filtered values + recomputed offsets — fully columnar
    (the shape of the reference's NUL-strip + validation,
    contract_data.go:95-99). Returns df with ``tokens`` replaced and
    ``n_dropped`` appended."""
    out_fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    schema_str = ", ".join(f"{n} {t}" for n, t in out_fields) + ", n_dropped int"
    names = [f.name for f in df.schema.fields]
    t_idx = names.index(tokens_col)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            la = rb.column(t_idx)
            if la.null_count == len(la):
                arrays = [rb.column(i) for i in range(rb.num_columns)]
                arrays.append(pa.nulls(len(la), pa.int32()))
                yield pa.RecordBatch.from_arrays(arrays,
                                                 names=names + ["n_dropped"])
                continue
            values_arr = la.flatten()
            values = values_arr.to_numpy(zero_copy_only=False).astype(np.int64)
            raw_off = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            offsets = raw_off - raw_off[0]
            keep = (values >= 0) & (values < vocab)
            lens = np.diff(offsets)
            kept = _segment_reduce(np.add, keep.astype(np.int64), offsets,
                                   0, np.int64)
            new_offsets = np.zeros(len(la) + 1, dtype=np.int32)
            np.cumsum(kept, out=new_offsets[1:])
            validity = np.asarray(la.is_valid())
            off_arr = pa.array(new_offsets, type=pa.int32(),
                               mask=np.concatenate([~validity, [False]]))
            new_list = pa.ListArray.from_arrays(
                off_arr, pa.array(values[keep].astype(np.int32),
                                  type=pa.int32()))
            dropped = (lens - kept).astype(np.int32)
            arrays = [rb.column(i) if i != t_idx else new_list
                      for i in range(rb.num_columns)]
            arrays.append(pa.array(dropped, mask=~validity))
            yield pa.RecordBatch.from_arrays(arrays, names=names + ["n_dropped"])

    return df.mapInArrow(fn, schema_str)


@pandas_udf(T.ArrayType(T.LongType()))
def _token_ngram_hashes_udf(s: pd.Series, n: pd.Series) -> pd.Series:
    """Per-row array of hashed n-gram shingles over the token array — the
    MinHash front-end for token-level near-dup detection. Fully segment-
    vectorized: rolling hash via shifted flattened values, row boundaries
    respected by masking shingle starts to len-n+1 per row; output rebuilt
    as an Arrow ListArray (no per-row loops)."""
    ng = int(n.iloc[0])
    values, offsets, isnull = _flatten(s)
    lens = np.diff(offsets)
    m = np.maximum(lens - ng + 1, 0)  # shingle count per row
    if len(values):
        with np.errstate(over="ignore"):
            acc = np.zeros(len(values), dtype=np.uint64)
            for j in range(ng):  # loop over n (a constant), not rows
                shifted = np.roll(values.astype(np.uint64), -j)
                acc = acc * _P1 + _mix(shifted)
        pos = np.arange(len(values), dtype=np.int64) - np.repeat(offsets[:-1],
                                                                 lens)
        mask = pos < np.repeat(m, lens)
        flat = acc[mask].astype(np.int64)
    else:
        flat = np.empty(0, dtype=np.int64)
    new_offsets = np.zeros(len(s) + 1, dtype=np.int32)
    np.cumsum(m, out=new_offsets[1:])
    off_arr = pa.array(new_offsets, type=pa.int32(),
                       mask=np.concatenate([isnull, [False]]))
    la = pa.ListArray.from_arrays(off_arr, pa.array(flat, type=pa.int64()))
    return la.to_pandas()


def token_ngram_hashes(col, n: int):
    return _token_ngram_hashes_udf(col, F.lit(n))
