"""Sequence packing — fixed-length training context blocks.

The downstream consumer of this engine's output table is an LLM training
job, and the operation between "table of variable-length token
sequences" and "training batches" is packing: concatenate documents
(each terminated by an EOS marker) in a deterministic order and slice
the stream into fixed-length blocks. This is the standard GPT-style
pre-training layout (one EOS-separated stream, no padding waste).

Spark shape: ``applyInPandas`` per pack group — packing is inherently
sequential WITHIN a stream, so the unit of parallelism is the stream,
not the row. ``group_col`` picks the stream key (e.g. ``lang`` so a
block never mixes languages); at 100 TB one group would be petabytes,
so ``shards`` sub-divides each group by ``xxhash64(order_col) % shards``
into independent streams packed in parallel — block counts then obey
the same conservation law per (group, shard). Inside a group the fold
is fully vectorized: EOS appended per document with one pandas string
op, the stream joined into one string (C-level str.cat) and split once,
then a single reshape — no per-document or per-token Python loop.

Conservation law (the oracle for correctness): with block size B, a
stream holding documents with token counts n_i packs into
``floor((Σn_i + D) / B)`` full blocks (each document contributes its
tokens plus one EOS) and a tail of ``(Σn_i + D) mod B`` tokens — the
driver's DuckDB oracle checks both per group against the engine's
actual packed output (plans/queries.py::sequence_pack_stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOS = "<eos>"


def pack_blocks(df: DataFrame, block_size: int = 256,
                text_col: str = "text", group_col: str = "lang",
                order_col: str = "doc_id", shards: int = 1) -> DataFrame:
    """Pack whitespace-tokenized ``text_col`` into fixed-length blocks.

    Returns (``group_col``, shard, block_id, is_full, tokens) — every
    ``is_full`` block has exactly ``block_size`` tokens; the single
    trailing partial block per (group, shard) carries the remainder
    (dropped by training readers, kept here so conservation is checkable).
    Deterministic: documents are packed in ``order_col`` order within
    their (group, shard) stream.
    """
    out_schema = T.StructType([
        T.StructField("group", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("is_full", T.BooleanType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
    ])

    def pack(pdf):
        import numpy as np
        import pandas as pd
        pdf = pdf.sort_values("_ord", kind="mergesort")
        grp = pdf["_grp"].iloc[0]
        shard = int(pdf["_shard"].iloc[0])
        # fully vectorized EOS interleave (VERDICT r3 item 6): append the
        # EOS marker to every document, join the whole stream into ONE
        # string (C-level str.cat), split once. An empty document
        # contributes exactly its EOS (strip → "" → " <eos>" token),
        # identical to the former per-document loop.
        docs = pdf["_txt"].fillna("").str.strip()
        joined = (docs + " " + EOS).str.cat(sep=" ")
        stream = np.array(joined.split(), dtype=object) if joined \
            else np.empty(0, object)
        n_full = len(stream) // block_size
        body = stream[:n_full * block_size].reshape(n_full, block_size)
        rows = {"group": [grp] * n_full, "shard": [shard] * n_full,
                "block_id": list(range(n_full)), "is_full": [True] * n_full,
                "tokens": [list(b) for b in body]}
        tail = stream[n_full * block_size:]
        if len(tail):
            rows["group"].append(grp)
            rows["shard"].append(shard)
            rows["block_id"].append(n_full)
            rows["is_full"].append(False)
            rows["tokens"].append(list(tail))
        return pd.DataFrame(rows)

    prepared = df.select(
        F.col(group_col).cast("string").alias("_grp"),
        (F.pmod(F.xxhash64(F.col(order_col).cast("string")),
                F.lit(shards)).cast("int")).alias("_shard"),
        F.col(order_col).alias("_ord"),
        F.col(text_col).alias("_txt"))
    return (prepared.groupBy("_grp", "_shard")
            .applyInPandas(pack, out_schema))
