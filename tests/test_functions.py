"""Unit tests for the vectorized token/text/dedup/similarity/multimodal
function surface."""

import numpy as np
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from stellar_ledger_data_indexer_spark.functions.dedup_text import (
    exact_duplicates, hamming64, minhash_candidate_pairs, simhash,
    word_shingles)
from stellar_ledger_data_indexer_spark.functions.multimodal import (
    decode_image, extract_features, frame_sample_plan, resize_meta,
    synth_media)
from stellar_ledger_data_indexer_spark.functions.similarity import (
    cosine, cosine_topk, cosine_topk_ivf, cosine_topk_lsh,
    embedding_neardup_pairs)
from stellar_ledger_data_indexer_spark.functions.text import (
    lang_id, quality_score, token_count)
from stellar_ledger_data_indexer_spark.functions.tokens import (
    normalize_tokens_arrow, token_ngram_hashes, token_stats,
    tokens_fingerprint, validate_tokens)

TOK_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
])


def tok_df(spark, rows):
    return spark.createDataFrame(rows, TOK_SCHEMA)


# ----------------------------------------------------------------- tokens
def test_tokens_fingerprint_deterministic_order_sensitive(spark):
    df = tok_df(spark, [(1, [1, 2, 3]), (2, [3, 2, 1]), (3, [1, 2, 3]),
                        (4, None), (5, [])])
    out = {r["id"]: r["fp"] for r in
           df.select("id", tokens_fingerprint("tokens").alias("fp"))
           .collect()}
    assert out[1] == out[3]            # same content → same fp
    assert out[1] != out[2]            # order-sensitive
    assert out[4] is None and out[5] == 0


def test_validate_tokens(spark):
    df = tok_df(spark, [(1, [0, 49, 99]), (2, [5, 100]), (3, [-1]),
                        (4, None), (5, [])])
    out = {r["id"]: r["ok"] for r in
           df.select("id", validate_tokens(F.col("tokens"), 100).alias("ok"))
           .collect()}
    assert out == {1: True, 2: False, 3: False, 4: None, 5: True}


def test_token_stats(spark):
    df = tok_df(spark, [(1, [5, 1, 9]), (2, []), (3, None)])
    out = {r["id"]: r["s"] for r in
           df.select("id", token_stats("tokens").alias("s")).collect()}
    assert out[1].asDict() == {"n": 3, "mn": 1, "mx": 9, "total": 15}
    assert out[2]["n"] == 0 and out[2]["mn"] is None
    assert out[3] is None or out[3]["n"] is None


def test_normalize_tokens_arrow(spark):
    df = tok_df(spark, [(1, [1, -5, 2, 999]), (2, None), (3, [])])
    out = {r["id"]: (r["tokens"], r["n_dropped"]) for r in
           normalize_tokens_arrow(df, vocab=100).collect()}
    assert out[1] == ([1, 2], 2)
    assert out[2] == (None, None)
    assert out[3] == ([], 0)


def test_token_ngram_hashes(spark):
    df = tok_df(spark, [(1, [1, 2, 3, 4]), (2, [1, 2]), (3, [9]), (4, None)])
    out = {r["id"]: r["g"] for r in
           df.select("id", token_ngram_hashes(F.col("tokens"), 3).alias("g"))
           .collect()}
    assert len(out[1]) == 2 and len(out[2]) == 0 and len(out[3]) == 0
    assert out[4] is None
    # shingle hash depends only on content: [1,2,3] prefix shared
    df2 = tok_df(spark, [(9, [1, 2, 3])])
    h = df2.select(token_ngram_hashes(F.col("tokens"), 3).alias("g")) \
        .collect()[0]["g"]
    assert out[1][0] == h[0]


# ------------------------------------------------------------------- text
DOCS = [(1, "the cat and the hat", "src"),
        (2, "the cat and the hat", "src"),
        (3, "der hund und das brot", "src"),
        (4, "zzz qqq", "src"),
        (5, "  the   cat and  the hat ", "src")]
DOC_SCHEMA = "doc_id long, text string, source string"


def test_lang_id_and_token_count(spark):
    df = spark.createDataFrame(DOCS, DOC_SCHEMA)
    out = {r["doc_id"]: (r["lang"], r["n"]) for r in
           df.select("doc_id", lang_id(F.col("text")).alias("lang"),
                     token_count(F.col("text")).alias("n")).collect()}
    assert out[1] == ("en", 5)
    assert out[3] == ("de", 5)
    assert out[4][0] == "und"


def test_exact_duplicates_normalizes_whitespace(spark):
    df = spark.createDataFrame(DOCS, DOC_SCHEMA)
    groups = {r["fingerprint"]: r for r in exact_duplicates(df).collect()}
    sizes = sorted(r["n_dups"] for r in groups.values())
    assert sizes == [1, 1, 3]  # docs 1,2,5 collapse
    big = [r for r in groups.values() if r["n_dups"] == 3][0]
    assert big["canonical_id"] == 1


def test_minhash_pairs_find_near_dups(spark):
    base = "spark merge window agg filter join scan shuffle broadcast skew"
    docs = [(1, base, "s"), (2, base + " extra", "s"),
            (3, "completely different words entirely unrelated topic", "s")]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    pairs = {(r["id_a"], r["id_b"])
             for r in minhash_candidate_pairs(df, num_perm=16,
                                              num_bands=8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_pairs_arrow_mode(spark):
    """The Arrow signature path (no signature shuffle, PythonUDF
    evaluation barrier) finds the same near-dup structure as the grouped
    path — different permutation family, same LSH semantics — and
    max_bucket=None skips the cap stage without changing the bounded
    result."""
    base = "spark merge window agg filter join scan shuffle broadcast skew"
    docs = [(1, base, "s"), (2, base + " extra", "s"),
            (3, "completely different words entirely unrelated topic", "s"),
            (4, "", "s")]   # empty doc → null signature, dropped
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    pairs = {(r["id_a"], r["id_b"]): r["n_shared_bands"]
             for r in minhash_candidate_pairs(
                 df, num_perm=16, num_bands=8, sig_mode="arrow",
                 max_bucket=None).collect()}
    assert (1, 2) in pairs
    assert all(1 <= n <= 8 for n in pairs.values())
    assert (1, 3) not in pairs and (2, 3) not in pairs
    assert not any(4 in p for p in pairs)
    with pytest.raises(ValueError, match="sig_mode"):
        minhash_candidate_pairs(df, sig_mode="nope")


def test_minhash_sig_mode_auto_selects_by_input_size(spark, monkeypatch,
                                                     tmp_path):
    """sig_mode="auto" picks the physical strategy from Catalyst's input
    size estimate (driver-side, no job): below the threshold → grouped
    aggregation (no Python node in the plan), at/above → the Arrow
    signature path (exactly ONE ArrowEvalPython node — the double
    filter/projection extraction was a measured 2× signature cost). A
    plan with no real statistics (createDataFrame → LogicalRDD reports
    the Long.MaxValue sentinel) must mean "unknown", falling back to
    grouped — never "huge". Same pick-by-input-bytes pattern as the MoR
    resolve auto-select."""
    from stellar_ledger_data_indexer_spark.functions.dedup_text import \
        minhash_banded
    base = "spark merge window agg filter join scan shuffle broadcast skew"
    local = spark.createDataFrame(
        [(1, base, "s"), (2, base + " extra", "s")], DOC_SCHEMA)
    pq = str(tmp_path / "docs.parquet")
    local.write.parquet(pq)
    df = spark.read.parquet(pq)

    def plan(docs, threshold):
        monkeypatch.setenv("SLDI_MINHASH_ARROW_BYTES", str(threshold))
        banded = minhash_banded(docs, num_perm=16, num_bands=8)
        return banded._jdf.queryExecution().executedPlan().toString()
    # parquet scan has file-size stats: the tiny corpus sits below any
    # real threshold → grouped; threshold 1 forces the arrow branch
    assert "ArrowEvalPython" not in plan(df, 1 << 40)
    arrow_plan = plan(df, 1)
    assert arrow_plan.count("ArrowEvalPython") == 1
    # statless local relation: auto = grouped even at threshold 1
    assert "ArrowEvalPython" not in plan(local, 1)
    # boundary value 0 never errors and the pipeline still runs
    monkeypatch.setenv("SLDI_MINHASH_ARROW_BYTES", "0")
    assert minhash_candidate_pairs(df, num_perm=16, num_bands=8).count() >= 1


def test_dedup_neardup_end_to_end(spark):
    """Full near-dup removal: LSH candidates → exact verify → clusters →
    canonical survivors. Transitivity matters: A~B and B~C with A,C not
    direct candidates must still collapse to one survivor."""
    from stellar_ledger_data_indexer_spark.functions.dedup_text import \
        dedup_neardup
    base = ("spark merge window agg filter join scan shuffle broadcast "
            "skew epoch bucket manifest snapshot delta compact")
    docs = [(1, base, "s"),
            (2, base + " tailA", "s"),             # near-dup of 1
            (3, base + " tailA tailB", "s"),       # near-dup of 2 (and 1)
            (7, "completely different words entirely unrelated topic "
                "nothing shared at all here", "s"),
            (9, "", "s")]                          # empty doc survives
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    kept = sorted(r["doc_id"] for r in dedup_neardup(
        df, threshold=0.5, num_perm=16, num_bands=8).collect())
    assert kept == [1, 7, 9]


def test_connected_components_and_neardup_clusters(spark):
    """Min-label propagation: a diameter-4 chain needs multiple rounds,
    disjoint pairs converge fast, labels are the component-min id, and
    neardup_clusters maps isolated docs to themselves."""
    from stellar_ledger_data_indexer_spark.functions.graph import (
        connected_components, neardup_clusters)
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a long, id_b long")
    comp = {r["node"]: r["component"]
            for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 10, 11, 99)],
                                 "doc_id long")
    cl = {r["doc_id"]: r["component"]
          for r in neardup_clusters(docs, edges).collect()}
    assert cl[99] == 99 and cl[5] == 1 and cl[11] == 10
    # canonical-keep rule: one survivor per cluster
    keep = {d for d, c in cl.items() if d == c}
    assert keep == {1, 10, 99}


def test_simhash_hamming(spark):
    base = "spark merge window agg filter join scan shuffle broadcast skew"
    docs = [(1, base, "s"), (2, base + " extra", "s"),
            (3, "completely different words entirely unrelated topic", "s")]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    sh = simhash(df)
    j = (sh.alias("a").crossJoin(sh.alias("b"))
         .filter(F.col("a.doc_id") < F.col("b.doc_id"))
         .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"),
                 hamming64(F.col("a.simhash"), F.col("b.simhash"))
                 .alias("d")))
    d = {(r["x"], r["y"]): r["d"] for r in j.collect()}
    assert d[(1, 2)] < d[(1, 3)]


# ------------------------------------------------------------- similarity
def emb_df(spark):
    rows = [(0, [1.0, 0.0, 0.0], 0), (1, [0.9, 0.1, 0.0], 0),
            (2, [0.0, 1.0, 0.0], 1), (3, [-1.0, 0.0, 0.0], 1),
            (4, [0.8, 0.2, 0.0], 0)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_brute_force(spark):
    e = emb_df(spark)
    top = cosine_topk(e.filter("vec_id != 0"), [1.0, 0.0, 0.0], k=2)
    ids = [r["vec_id"] for r in top.collect()]
    assert ids == [1, 4]


def test_cosine_topk_lsh_and_ivf_recover_neighbors(spark):
    e = emb_df(spark)
    for fn in (cosine_topk_lsh, cosine_topk_ivf):
        got = fn(e.filter("vec_id != 0"), [1.0, 0.0, 0.0], k=2)
        ids = {r["vec_id"] for r in got.collect()}
        assert 1 in ids, fn.__name__


def test_embedding_neardup_pairs(spark):
    e = emb_df(spark)
    # n_planes=1 with the fixed seed keeps the near-dup pair co-bucketed;
    # more planes trade recall for smaller blocks (LSH semantics)
    pairs = {(r["id_a"], r["id_b"])
             for r in embedding_neardup_pairs(e, dim=3, threshold=0.97,
                                              n_planes=1).collect()}
    assert (1, 4) in pairs
    assert (0, 3) not in pairs  # opposite vectors


def test_lsh_ivf_assignment_at_dim_256(spark):
    """Recall gates at a realistic embedding width (dim 256): bucket/cell
    assignment is one Arrow-batched matmul per batch with the plane/
    centroid matrices shipped via the UDF closure — NOT per-row
    interpreted HOF cosines over inline literal arrays (VERDICT r3 items
    1a/8: that form is a 4× bench outlier at dim 32 and unshippable at
    real dims, where the plan would carry n_centroids × dim literals).
    Deterministic: fixed seeds for corpus, planes, and centroids."""
    rng = np.random.RandomState(3)
    dim = 256
    base = rng.randn(400, dim).astype("float32")
    q = rng.randn(dim).astype("float32")
    planted = (0.9 * q[None, :] + 0.1 * base[:25]).astype("float32")
    rows = ([(i, [float(x) for x in v]) for i, v in enumerate(base)]
            + [(10000 + i, [float(x) for x in v])
               for i, v in enumerate(planted)])
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qv = [float(x) for x in q]
    brute = {r["vec_id"] for r in cosine_topk(e, qv, k=10).collect()}
    assert brute == {10000 + i for i in range(25)} & brute  # all planted
    lsh_df = cosine_topk_lsh(e, qv, k=10, probe_hamming=2)
    ivf_df = cosine_topk_ivf(e, qv, k=10, n_probe=3)
    assert {r["vec_id"] for r in lsh_df.collect()} == brute
    assert {r["vec_id"] for r in ivf_df.collect()} == brute
    # structural: the assignment plan is O(1) in dim — inline literal
    # centroids/planes at dim 256 would blow the plan to megabytes
    for df in (lsh_df, ivf_df):
        plan = df._jdf.queryExecution().analyzed().toString()
        assert len(plan) < 60_000


def test_ivf_index_partition_pruned_search(spark, tmp_path):
    """The persisted IVF scale path: write_ivf_index partitions the
    corpus by coarse cell; search_ivf_index must (a) return exactly the
    brute-force top-k on a planted-neighbor corpus and (b) physically
    scan ONLY the probed cell directories — partition pruning, the
    storage-level form of the 'cell is a partition column at 100 TB'
    claim."""
    from stellar_ledger_data_indexer_spark.functions.similarity import (
        search_ivf_index, write_ivf_index)
    rng = np.random.RandomState(5)
    dim = 64
    base = rng.randn(300, dim).astype("float32")
    q = rng.randn(dim).astype("float32")
    planted = (0.9 * q[None, :] + 0.1 * base[:20]).astype("float32")
    rows = ([(i, [float(x) for x in v]) for i, v in enumerate(base)]
            + [(10000 + i, [float(x) for x in v])
               for i, v in enumerate(planted)])
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivf")
    write_ivf_index(e, path, dim=dim, n_centroids=8)
    qv = [float(x) for x in q]
    brute = [r["vec_id"] for r in cosine_topk(e, qv, k=10).collect()]
    res = search_ivf_index(spark, path, qv, k=10, n_centroids=8, n_probe=3)
    assert [r["vec_id"] for r in res.collect()] == brute
    # directory pruning: the scan's PartitionFilters restrict to the
    # n_probe cells (inputFiles() is plan-level and ignores partition
    # pruning, so assert on the executed plan's FileScan node)
    import os
    import re
    cells_on_disk = {d for d in os.listdir(path) if d.startswith("_cell=")}
    plan = res._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[_cell#\d+ IN \(([^)]*)\)", plan)
    assert m, plan[:2000]
    probed = {c.strip() for c in m.group(1).split(",")}
    assert len(probed) <= 3 < len(cells_on_disk)


def test_embedding_neardup_pairs_plans_without_jobs(spark):
    """Building the pair plan must not run a Spark job (the r2 version
    ran .first() per call just to size the hyperplanes)."""
    e = emb_df(spark)
    group = "neardup-plan-only"
    sc = spark.sparkContext
    sc.setJobGroup(group, "plan-only check", False)
    try:
        df = embedding_neardup_pairs(e, dim=3, threshold=0.97)
        _ = df.columns  # force analysis, not execution
    finally:
        sc.setJobGroup("", "", False)
    tracker = sc.statusTracker()
    assert tracker.getJobIdsForGroup(group) == []


def test_ngram_jaccard_requires_blocking(spark):
    """The unblocked crossJoin fallback is gone: no block_col and no
    candidate set is a ValueError, not a quadratic plan."""
    from stellar_ledger_data_indexer_spark.functions.dedup_text import (
        ngram_jaccard_pairs)
    df = spark.createDataFrame(DOCS, DOC_SCHEMA)
    with pytest.raises(ValueError, match="block_col or a candidates"):
        ngram_jaccard_pairs(df)
    # candidate-pair input is the sanctioned unblocked path
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    scored = ngram_jaccard_pairs(df, threshold=0.0, candidates=cands)
    rows = scored.collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(1, 2)}


# ------------------------------------------------------------- multimodal
def test_codecs_roundtrip():
    """Real decode on real bytes: every codec must invert its encoder."""
    import numpy as np
    from stellar_ledger_data_indexer_spark.functions.multimodal import (
        decode_ppm, decode_rvid, decode_wav, encode_ppm, encode_rvid,
        encode_wav_pcm16, resize_image)
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, size=(20, 30, 3)).astype(np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # PPM with a header comment still parses
    raw = encode_ppm(img)
    commented = b"P6\n# a comment\n" + raw[3:]
    assert (decode_ppm(commented) == img).all()
    samples = (rng.randn(800) * 0.2).astype(np.float32)
    dec, rate = decode_wav(encode_wav_pcm16(samples, 8000))
    assert rate == 8000 and np.abs(dec - samples).max() < 1e-4
    frames = rng.randint(0, 255, size=(6, 8, 10, 3)).astype(np.uint8)
    assert (decode_rvid(encode_rvid(frames)) == frames).all()
    # offset-seek decode of sampled frames only
    assert (decode_rvid(encode_rvid(frames), [0, 4])
            == frames[[0, 4]]).all()
    small = resize_image(img, max_side=8)
    assert max(small.shape[:2]) <= 8 and small.shape[2] == 3
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG....")


def test_multimodal_features_real_decode(spark):
    m = synth_media(spark, n=12)
    feats = extract_features(m, dim=8).collect()
    assert len(feats) == 12
    assert all(len(r["feature"]) == 8 for r in feats)
    # deterministic end-to-end (seeded payloads → fixed features)
    feats2 = extract_features(m, dim=8).collect()
    assert {r["media_id"]: r["feature"] for r in feats} == \
           {r["media_id"]: r["feature"] for r in feats2}
    # features reflect the decoded content, not hashes: the image
    # gradient makes channel means ≈ 0.5 and luma grid left < right
    img_feats = {r["media_id"]: r["feature"] for r in feats
                 if r["kind"] == "image"}
    for v in img_feats.values():
        assert 0.3 < v[0] < 0.7        # mean R of a 0..255 gradient
        assert v[6] < v[7]             # grid: left half darker than right
    frames = frame_sample_plan(m, every_n=8).collect()
    assert frames and all(r["frame_idx"] % 8 == 0 for r in frames)
    rm = {r["media_id"]: (r["target_w"], r["target_h"])
          for r in resize_meta(m, max_side=32).collect()}
    assert all(w <= 32 and h <= 32 for w, h in rm.values())


def test_sequence_packing_conservation_and_content(spark):
    """pack_blocks: EOS-separated stream in doc_id order, sliced into
    fixed blocks; conservation law holds; contents deterministic; shards
    partition the stream without losing tokens."""
    from stellar_ledger_data_indexer_spark.functions.packing import (
        EOS, pack_blocks)
    docs = [(i, "en", " ".join(f"w{i}_{j}" for j in range(n)))
            for i, n in enumerate([5, 0, 7, 3, 12, 9, 1])]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    B = 8
    blocks = pack_blocks(df, block_size=B).collect()
    total = sum(n for _, _, n in [(d[0], d[1], len(d[2].split()) if d[2] else 0)
                                  for d in docs]) + len(docs)
    full = [b for b in blocks if b["is_full"]]
    tail = [b for b in blocks if not b["is_full"]]
    assert len(full) == total // B
    assert all(len(b["tokens"]) == B for b in full)
    assert len(tail) <= 1
    if tail:
        assert len(tail[0]["tokens"]) == total % B
    # exact stream content: concatenating blocks in block_id order
    # reproduces docs in doc_id order, each followed by EOS
    stream = [t for b in sorted(blocks, key=lambda r: r["block_id"])
              for t in b["tokens"]]
    expect = []
    for _, _, text in docs:
        expect += text.split() + [EOS]
    assert stream == expect
    # sharded packing conserves every token, per-shard law holds
    sharded = pack_blocks(df, block_size=B, shards=3).collect()
    assert sum(len(b["tokens"]) for b in sharded) == total
    from collections import defaultdict
    per = defaultdict(int)
    for b in sharded:
        per[b["shard"]] += len(b["tokens"])
    for sh, n in per.items():
        n_full = sum(1 for b in sharded if b["shard"] == sh and b["is_full"])
        assert n_full == n // B


def test_token_count_bpe_pretokenizer(spark):
    """GPT-2-style regex pre-tokenizer: contractions split, punctuation
    runs and digit runs are their own tokens, space-prefixed words count
    once."""
    from stellar_ledger_data_indexer_spark.functions.text import \
        token_count_bpe
    cases = {
        "it's a test-case, 42 tokens!": 10,
        # it|'s| a| test|-|case|,| 42| tokens|!
        "": 0,
        "hello   world": 2,
        "don't stop... 3.14": 7,   # don|'t| stop|...| 3|.|14
    }
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = {r["text"]: r["n"] for r in
           df.select("text", token_count_bpe(F.col("text")).alias("n"))
           .collect()}
    assert got == cases


def test_asof_join_directions_strictness_and_nulls(spark):
    """asof_join semantics matrix on a hand-computable fixture:
    backward non-strict matches an equal-key right row, strict excludes
    it; forward takes the nearest later row; a group with no right rows
    yields null (left-join semantics); the plan contains NO join node
    (union + one keyed window is the whole physical shape)."""
    from stellar_ledger_data_indexer_spark.functions.asof import asof_join
    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u2", 5, "c")],
        "k string, t long, tag string")
    right = spark.createDataFrame(
        [("u1", 10, 100), ("u1", 15, 150)], "k string, t long, v long")

    def got(**kw):
        out = asof_join(left, right, on="t", by="k", values=["v"], **kw)
        return {(r["k"], r["t"]): r["v_asof"] for r in out.collect()}
    assert got(direction="backward") == {
        ("u1", 10): 100, ("u1", 20): 150, ("u2", 5): None}
    assert got(direction="backward", strict=True) == {
        ("u1", 10): None, ("u1", 20): 150, ("u2", 5): None}
    assert got(direction="forward") == {
        ("u1", 10): 100, ("u1", 20): None, ("u2", 5): None}
    assert got(direction="forward", strict=True) == {
        ("u1", 10): 150, ("u1", 20): None, ("u2", 5): None}
    plan = (asof_join(left, right, on="t", by="k", values=["v"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan and "Window" in plan
    import pytest as _pt
    with _pt.raises(ValueError, match="direction"):
        asof_join(left, right, on="t", by="k", values=["v"],
                  direction="sideways")
    with _pt.raises(ValueError, match="value column"):
        asof_join(left, right, on="t", by="k", values=["nope"])


def test_asof_join_null_ordering_keys_never_match(spark):
    """ADVICE r5: under asc ordering Spark sorts nulls FIRST, so a right
    row with a null ordering key used to sort before everything and
    propagate its values (via last ignorenulls) to every left row until
    a real right row overrode them. Null keys must never match: null-
    keyed right rows are dropped before the union, null-keyed left rows
    come out with null values — both directions."""
    from stellar_ledger_data_indexer_spark.functions.asof import asof_join
    left = spark.createDataFrame(
        [("u1", 5, "a"), ("u1", 20, "b"), ("u1", None, "c")],
        "k string, t long, tag string")
    right = spark.createDataFrame(
        [("u1", None, 999), ("u1", 10, 100)], "k string, t long, v long")

    def got(direction):
        out = asof_join(left, right, on="t", by="k", values=["v"],
                        direction=direction)
        return {(r["k"], r["tag"]): r["v_asof"] for r in out.collect()}
    assert got("backward") == {
        ("u1", "a"): None,   # t=5 precedes every real right row; 999
                             # from the null-key right row must not leak
        ("u1", "b"): 100,
        ("u1", "c"): None,   # null left key: no match
    }
    assert got("forward") == {
        ("u1", "a"): 100,
        ("u1", "b"): None,
        ("u1", "c"): None,
    }


def test_cosine_batch_ragged_leading_row_masks_only_itself(spark):
    """ADVICE r5: cosine_batch inferred the embedding dim from the FIRST
    non-null row of column a, so one ragged leading row failed the
    len==dim mask for every well-formed row and silently nulled the
    whole batch. The modal-length rule masks only the bad row."""
    from stellar_ledger_data_indexer_spark.functions.similarity import (
        cosine_batch)
    rows = [
        ("bad", [1.0, 2.0], [1.0, 0.0, 0.0]),   # ragged a-side row FIRST
        ("p1", [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),
        ("p2", [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]),
        ("p3", None, [1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "id string, a array<double>, b array<double>").coalesce(1)
    got = {r["id"]: r["c"] for r in
           df.select("id", F.round(cosine_batch(F.col("a"), F.col("b")), 6)
                     .alias("c")).collect()}
    assert got == {"bad": None, "p1": 1.0, "p2": 0.0, "p3": None}
