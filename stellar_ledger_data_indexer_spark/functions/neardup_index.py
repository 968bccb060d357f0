"""Persisted incremental MinHash-LSH near-duplicate index.

``dedup_neardup`` (functions/dedup_text.py:60) is the from-scratch
pipeline: it re-signatures the WHOLE corpus on every call. That shape is
fine for a one-shot curation pass but can never run per-ingest-batch at
10^10 documents — the 100-TB ingest loop needs the same thing the
reference builds its index set for (internal/db/migrations/
20260211-add-additional-lab-backend-indexes-2.sql: repeat lookups must
not rescan): signatures computed ONCE, persisted, and each new batch
dedup'd by reading only the slivers of the index its own signatures
touch.

Design (VERDICT r5 next-step 1):

- The index is a bucketed :class:`LakeTable` of banded-signature rows
  ``(bucket long, band int, doc_id)`` — one row per (document, band).
  ``bucket`` (the 64-bit band hash from ``minhash_bands``) is the
  table's bucket key, so the driver-side xxhash64 twin (lake/xxh64.py)
  prunes a probe to exactly the physical buckets that can hold the
  probed band hashes — a point lookup touches hit-buckets/num_buckets
  of the index no matter how big the corpus gets.
- LSH parameters (shingle_n, num_perm, num_bands, seed) are pinned in
  the table properties at create time and every add/probe replays them
  from there — two calls with drifted parameters would bucket the same
  text differently and silently find nothing. ``sig_mode`` is pinned to
  ``"grouped"`` for the same reason: the arrow path uses a different
  permutation family (splitmix64 vs the xxhash64 chain), so auto-picking
  by input size would make the index's buckets depend on BATCH SIZE.
- ``dedup_batch`` = probe → exact n-gram-Jaccard verify of only the
  candidate pairs → connected components over the verified edges →
  survivors. Accepted corpus documents are IMMUTABLE: a batch document
  near-dup of an indexed one is dropped; an indexed document is never
  retroactively dropped (the from-scratch pipeline would re-canonicalize
  the union — on an append-only ingest history the accepted set is the
  canon). Batch-internal near-dups keep the min-id representative,
  matching ``dedup_neardup``.

Scale shape per batch of B docs against an N-doc corpus: signature cost
O(B) (the batch only), probe shuffle carries (bucket, id) for the batch's
B × num_bands band rows plus the hit corpus rows, the verify join touches
candidate texts only, and nothing ever rescans the N-doc corpus.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lake.table import LakeTable
from .dedup_text import minhash_banded, ngram_jaccard_pairs, token_shingles
from .graph import connected_components

_ID_TYPES = {"long": T.LongType(), "string": T.StringType()}


class NeardupIndex:
    """A persisted, incrementally-maintained LSH band-bucket index."""

    def __init__(self, path: str):
        self.table = LakeTable(path)
        props = self.table.properties
        if "ndx_params" not in props:
            raise ValueError(f"{path} is not a NeardupIndex table "
                             f"(missing ndx_params property)")
        self.params = json.loads(props["ndx_params"])
        # probe observability for tests / ops: filled by candidate_pairs
        self.last_probe: dict | None = None

    # ------------------------------------------------------------ create
    @staticmethod
    def create(path: str, *, id_type: str = "long", num_buckets: int = 32,
               shingle_n: int = 3, num_perm: int = 32, num_bands: int = 16,
               seed: int = 7, mode: str = "text") -> "NeardupIndex":
        """``mode="text"`` shingles a string column with word n-grams;
        ``mode="tokens"`` shingles an array<int> column with token-id
        n-grams (token_shingles) — the ingest-loop form where documents
        arrive already tokenized. The mode is pinned with the other LSH
        parameters."""
        if id_type not in _ID_TYPES:
            raise ValueError(f"id_type must be long|string, got {id_type}")
        if mode not in ("text", "tokens"):
            raise ValueError(f"mode must be text|tokens, got {mode}")
        schema = T.StructType([
            T.StructField("bucket", T.LongType(), False),
            T.StructField("band", T.IntegerType(), False),
            T.StructField("doc_id", _ID_TYPES[id_type], False),
        ])
        LakeTable.create(
            path, schema, bucket_col="bucket", num_buckets=num_buckets,
            properties={
                "ndx_params": json.dumps({
                    "shingle_n": shingle_n, "num_perm": num_perm,
                    "num_bands": num_bands, "seed": seed,
                    "id_type": id_type, "mode": mode}),
                # band-hash-ordered files → tight per-file min/max stats
                # on the probe column, stacking stats skipping on top of
                # the bucket arithmetic
                "write_order": "bucket",
            })
        return NeardupIndex(path)

    @staticmethod
    def exists(path: str) -> bool:
        return LakeTable.exists(path)

    # ------------------------------------------------------------- banding
    def banded(self, docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
        """(doc_id, band, bucket) banded-signature rows for ``docs`` under
        the index's pinned parameters. In ``mode="tokens"``,
        ``text_col`` names the array<int> column to shingle."""
        p = self.params
        sh = (token_shingles(F.col(text_col), p["shingle_n"])
              if p.get("mode", "text") == "tokens" else None)
        b = minhash_banded(docs, text_col=text_col, id_col=id_col,
                           shingle_n=p["shingle_n"], num_perm=p["num_perm"],
                           num_bands=p["num_bands"], seed=p["seed"],
                           sig_mode="grouped", shingles=sh)
        return b.select(F.col(id_col).alias("doc_id"),
                        F.col("b.band").alias("band"),
                        F.col("b.bucket").alias("bucket"))

    # ---------------------------------------------------------------- add
    def add(self, spark: SparkSession, docs: DataFrame,
            text_col: str = "text", id_col: str = "doc_id") -> int:
        """Signature ``docs`` and append their band rows; returns the new
        index snapshot version. O(docs), never touches existing rows —
        the per-epoch maintenance write of the ingest loop."""
        rows = self.banded(docs, text_col=text_col, id_col=id_col)
        t = self.table.refresh()
        return t.append(rows, summary={"op": "neardup-index-add"})

    # -------------------------------------------------------- maintenance
    def compact(self, spark: SparkSession,
                max_files_per_bucket: int = 8) -> dict:
        """Bucket-selective compaction for the ingest-loop index: every
        epoch's ``add`` appends one file per touched physical bucket, so
        a long run fragments the index (10^6 epochs → 10^6 files/bucket
        unchecked — the same accretion LakeTable.compact exists for, but
        a FULL index rewrite per sweep would be O(corpus) where the
        fragmentation is O(epochs)). Only buckets holding more than
        ``max_files_per_bucket`` files are folded, each into one file,
        and duplicate (bucket, band, doc_id) rows are dropped on the way
        — crash-replayed epochs re-append identical band rows, which are
        harmless for candidate pairs but dead weight on disk. Cost is
        O(rows in oversized buckets), not O(index)."""
        from ..lake.table import BUCKET_COL
        t = self.table.refresh()
        per_bucket: dict[int, int] = {}
        for f in t.files:
            per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
        bs = sorted(b for b, n in per_bucket.items()
                    if n > max_files_per_bucket)
        if not bs:
            return {"compacted_buckets": 0}
        df = (t.read(spark, buckets=bs)
              .dropDuplicates(["bucket", "band", "doc_id"])
              .withColumn(BUCKET_COL, t.bucket_expr()))
        t.overwrite_buckets(df, bs, summary={"op": "neardup-index-compact"})
        return {"compacted_buckets": len(bs),
                "files_before": sum(per_bucket[b] for b in bs)}

    # -------------------------------------------------------------- probe
    def candidate_pairs(self, spark: SparkSession,
                        batch: DataFrame | None = None,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_bucket: int | None = 200,
                        max_inlist: int = 8192,
                        batch_banded: DataFrame | None = None) -> DataFrame:
        """LSH candidate pairs touching the batch: (id_a, id_b,
        n_shared_bands, a_new, b_new) where *_new marks batch membership
        (corpus–corpus pairs are excluded — the corpus is already
        dedup'd). Reads ONLY the index band-buckets the batch's own
        signatures hit: the batch's distinct band hashes are harvested
        driver-side (≤ batch_docs × num_bands values, capped at
        ``max_inlist``) and pushed through the point-lookup pruner; past
        the cap it degrades to a distributed semi-join against the full
        index (correct, documented, and reported in ``last_probe``).

        Requirement: batch ids must be disjoint from indexed ids (ingest
        assigns monotone ids; a re-probe of an indexed id would pair a
        document with itself under two identities).

        ``batch_banded`` short-circuits the signature stage with
        precomputed (doc_id, band, bucket) rows — for callers that
        already hold the batch's banded signatures under THIS index's
        parameters (e.g. the catalog entry reusing the shared twin
        fixture, or an ingest loop that signatures once and both probes
        and adds). Parameter drift is on the caller."""
        from ..lake.xxh64 import bucket_of
        t = self.table.refresh()
        own = batch_banded is None
        if own:
            bb = self.banded(batch, text_col=text_col,
                             id_col=id_col).persist()
        else:
            bb = batch_banded
        hit = bb.select("bucket").distinct()
        vals = [r[0] for r in hit.limit(max_inlist + 1).collect()]
        if len(vals) <= max_inlist:
            # physical pruning via the driver-side hash twin. Only SMALL
            # probes also push the eq residual: read(eq=[...]) plants an
            # isin over the literal list, and a few thousand literals
            # cost Catalyst more than the per-file stats skipping saves
            # (measured 8.4 s → the band-bucket join below is the exact
            # residual either way). ≤256 hashes → eq path (tight file
            # skipping for the true point-lookup regime).
            if len(vals) <= 256:
                corpus = t.read(spark, eq={"bucket": vals})
            else:
                bs = {bucket_of(v, t.num_buckets) for v in vals}
                corpus = t.read(spark, buckets=bs)
            self.last_probe = {
                "mode": "point",
                "buckets_probed": len(vals),
                "files_scanned": len(corpus.inputFiles()),
                "files_total": len(t.files),
            }
        else:
            corpus = t.read(spark).join(hit, "bucket", "semi")
            self.last_probe = {
                "mode": "semi_join",
                "buckets_probed": len(vals),
                "files_scanned": len(t.files),
                "files_total": len(t.files),
            }
        # batch membership travels WITH the band rows (one union column)
        # instead of two post-hoc broadcast joins — the flag is free in
        # the pair shuffle and saves two whole stages per probe
        both = (corpus.select(
            "doc_id", F.struct("band", "bucket").alias("b"),
            F.lit(False).alias("_new"))
            .unionByName(bb.select(
                "doc_id", F.struct("band", "bucket").alias("b"),
                F.lit(True).alias("_new"))))
        if max_bucket is not None:
            oversized = (both.groupBy("b").agg(F.count("*").alias("_bw"))
                         .filter(F.col("_bw") > max_bucket).drop("_bw"))
            both = both.join(F.broadcast(oversized), "b", "left_anti")
        lhs = both.select(F.col("doc_id").alias("id_a"),
                          F.col("_new").alias("a_new"), "b")
        rhs = both.select(F.col("doc_id").alias("id_b"),
                          F.col("_new").alias("b_new"), "b")
        out = (lhs.join(rhs, "b")
               .filter((F.col("id_a") < F.col("id_b"))
                       & (F.col("a_new") | F.col("b_new")))
               .groupBy("id_a", "id_b", "a_new", "b_new")
               .agg(F.count("*").cast("long").alias("n_shared_bands"))
               .select("id_a", "id_b", "n_shared_bands", "a_new", "b_new"))
        if own:
            bb.unpersist()
        return out

    # -------------------------------------------------------------- dedup
    def dedup_batch(self, spark: SparkSession, batch: DataFrame,
                    corpus_docs: "DataFrame | LakeTable | None" = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    threshold: float = 0.5, verify_shingle_n: int = 2,
                    max_bucket: int | None = 200, max_inlist: int = 8192,
                    add_survivors: bool = False) -> dict:
        """Incremental near-dup dedup of one ingest batch against the
        indexed corpus (and itself). Returns ``{"survivors": DataFrame,
        "dropped": DataFrame, "n_batch", "n_dropped", "probe"}`` —
        ``dropped`` is the provenance map (doc_id, canonical_id): each
        dropped batch doc with the id it duplicated (the minimum id of
        its verified near-dup component — a corpus id when the cluster
        touches the accepted set, the surviving batch id otherwise),
        the record a curation pipeline keeps so drops are auditable.

        ``corpus_docs`` supplies text for candidate corpus documents at
        verify time: a DataFrame of (id, text), or a LakeTable bucketed
        by the id column — then candidate ids are point-read (bucket
        arithmetic again, never a corpus scan). Candidate pairs whose
        corpus text cannot be found verify as non-matches (join drops
        them) — pass the same corpus you indexed.

        Drop rule (accepted-set-immutable): a batch doc near-dup
        (verified exact Jaccard ≥ threshold, transitively) of ANY indexed
        doc is dropped; among batch-only clusters the min-id survives.
        Equals ``dedup_neardup`` run from scratch on corpus ∪ batch
        whenever corpus ids precede batch ids and no batch doc bridges
        two non-dup corpus docs (the from-scratch pass would then drop
        the larger corpus doc; incremental never unaccepts corpus rows).

        ``add_survivors=True`` appends the survivors' band rows to the
        index in the same call — the per-epoch ingest-loop shape."""
        pairs = self.candidate_pairs(
            spark, batch, text_col=text_col, id_col=id_col,
            max_bucket=max_bucket, max_inlist=max_inlist).persist()
        n_batch = batch.count()
        # texts for verification: the batch plus ONLY candidate corpus ids
        texts = batch.select(F.col(id_col).alias("doc_id"),
                             F.col(text_col).alias("_txt"))
        cand_old = (pairs.filter(~F.col("a_new")).select(
            F.col("id_a").alias("doc_id"))
            .unionByName(pairs.filter(~F.col("b_new"))
                         .select(F.col("id_b").alias("doc_id")))
            .distinct())
        if corpus_docs is not None:
            if isinstance(corpus_docs, LakeTable):
                ids = [r[0] for r in cand_old.limit(max_inlist + 1).collect()]
                if ids and len(ids) <= max_inlist:
                    old_txt = corpus_docs.read(
                        spark, eq={corpus_docs.bucket_col: ids})
                elif ids:
                    old_txt = corpus_docs.read(spark).join(
                        cand_old.withColumnRenamed(
                            "doc_id", corpus_docs.bucket_col),
                        corpus_docs.bucket_col, "semi")
                else:
                    old_txt = None
                if old_txt is not None:
                    texts = texts.unionByName(old_txt.select(
                        F.col(corpus_docs.bucket_col).alias("doc_id")
                        if corpus_docs.bucket_col != "doc_id"
                        else F.col("doc_id"),
                        F.col(text_col).alias("_txt")))
            else:
                old_txt = corpus_docs.join(
                    cand_old.withColumnRenamed("doc_id", id_col),
                    id_col, "semi")
                texts = texts.unionByName(old_txt.select(
                    F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("_txt")))
        vsh = (token_shingles(F.col("_txt"), verify_shingle_n)
               if self.params.get("mode", "text") == "tokens" else None)
        verified = ngram_jaccard_pairs(
            texts, text_col="_txt", id_col="doc_id",
            shingle_n=verify_shingle_n, threshold=threshold,
            candidates=pairs.select("id_a", "id_b"), shingles=vsh)
        new_ids = batch.select(F.col(id_col).alias("node")).distinct()
        dropped = self._dropped_nodes(verified, new_ids)
        survivors = batch.join(
            dropped.withColumnRenamed("node", id_col), id_col, "left_anti")
        n_dropped = dropped.count()
        pairs.unpersist()
        if add_survivors:
            self.add(spark, survivors, text_col=text_col, id_col=id_col)
        return {"survivors": survivors,
                "dropped": dropped.select(
                    F.col("node").alias(id_col),
                    F.col("canonical_id")),
                "n_batch": n_batch,
                "n_dropped": n_dropped, "probe": self.last_probe}

    @staticmethod
    def _dropped_nodes(verified: DataFrame, new_ids: DataFrame) -> DataFrame:
        """Batch nodes to drop given verified edges — members of any
        component containing a corpus node, plus non-min members of
        batch-only components — each with its ``canonical_id`` (the
        component's min id: the kept document this one duplicates;
        component labels ARE min ids by connected_components'
        convention, so no extra aggregation is needed)."""
        comp = connected_components(verified, max_iter=20)
        lab = comp.join(F.broadcast(
            new_ids.withColumn("_new", F.lit(True))), "node", "left") \
            .select("node", "component",
                    F.coalesce("_new", F.lit(False)).alias("_new"))
        per_comp = lab.groupBy("component").agg(
            F.max(F.when(~F.col("_new"), 1).otherwise(0)).alias("has_old"),
            F.min(F.when(F.col("_new"), F.col("node"))).alias("min_new"))
        out = (lab.filter(F.col("_new")).join(per_comp, "component")
               .filter((F.col("has_old") == 1)
                       | (F.col("node") != F.col("min_new")))
               .select("node", F.col("component").alias("canonical_id"))
               .persist())
        out.count()
        comp.unpersist()
        return out
