"""Persisted incremental LSH dedup index (VERDICT r5 next-step 1).

The from-scratch pipeline (dedup_neardup) re-signatures the whole corpus
per call; the index dedups a NEW batch by point-pruned reads of only the
band-buckets the batch's own signatures hit. These tests pin:

- batch dedup correctness (corpus dup dropped, in-batch dup collapsed to
  min id, novel docs kept);
- equality with the from-scratch result on corpus ∪ batch;
- that the probe physically reads ONLY hit band-buckets (file-count
  assert via last_probe / inputFiles);
- that parameters are pinned in the table and survive reopen;
- the grow-the-index loop (add_survivors) catching dups of earlier
  batches;
- the LakeTable corpus-text point-read path at verify time.
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from stellar_ledger_data_indexer_spark.functions.dedup_text import \
    dedup_neardup
from stellar_ledger_data_indexer_spark.functions.neardup_index import \
    NeardupIndex
from stellar_ledger_data_indexer_spark.lake.table import LakeTable

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), False),
])

# 12 distinct base sentences (pairwise bigram Jaccard ~0) — the corpus
_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
          "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
          "november", "oscar", "papa", "quebec", "romeo", "sierra",
          "tango", "uniform", "victor", "whiskey", "xray", "yankee",
          "zulu"]


def _sentence(i: int, n: int = 12) -> str:
    return " ".join(_WORDS[(i * 5 + j * (i + 1)) % len(_WORDS)]
                    + str((i * 7 + j) % 9) for j in range(n))


def _twin(text: str) -> str:
    return " ".join(text.split()[:-2])   # drop last 2 words: J >= 0.78


@pytest.fixture()
def corpus_rows():
    return [(i, _sentence(i)) for i in range(12)]


def _index_over(spark, path, rows, **kw):
    idx = NeardupIndex.create(str(path), num_buckets=8, shingle_n=2, **kw)
    idx.add(spark, spark.createDataFrame(rows, DOC_SCHEMA))
    return idx


def test_dedup_batch_drops_corpus_and_inbatch_dups(spark, tmp_path,
                                                   corpus_rows):
    idx = _index_over(spark, tmp_path / "ndx", corpus_rows)
    batch_rows = [
        (100, _twin(corpus_rows[3][1])),   # near-dup of corpus doc 3
        (101, _sentence(40)),              # novel
        (102, _sentence(41)),              # novel, has an in-batch twin:
        (103, _twin(_sentence(41))),       # -> 102 survives (min id)
    ]
    batch = spark.createDataFrame(batch_rows, DOC_SCHEMA)
    corpus = spark.createDataFrame(corpus_rows, DOC_SCHEMA)
    res = idx.dedup_batch(spark, batch, corpus_docs=corpus)
    got = sorted(r["doc_id"] for r in res["survivors"].collect())
    assert got == [101, 102]
    assert res["n_batch"] == 4 and res["n_dropped"] == 2
    # drop provenance: each dropped doc maps to the kept canonical
    prov = {r["doc_id"]: r["canonical_id"]
            for r in res["dropped"].collect()}
    assert prov == {100: 3, 103: 102}
    # the probe went through the point-lookup pruner (strict-subset file
    # asserts live in test_probe_reads_only_hit_band_buckets, where the
    # bucket count is sized to make subsetting deterministic — 4 docs ×
    # 16 bands = 64 uniform hashes cover all 8 buckets here w.h.p.)
    assert res["probe"]["mode"] == "point"
    assert res["probe"]["files_scanned"] > 0


def test_incremental_equals_from_scratch(spark, tmp_path, corpus_rows):
    """Corpus ids precede batch ids and no batch doc bridges two corpus
    docs — the documented regime where incremental == from-scratch."""
    idx = _index_over(spark, tmp_path / "ndx", corpus_rows)
    batch_rows = [(100 + i, _twin(corpus_rows[i][1])) for i in range(4)] \
        + [(200 + i, _sentence(50 + i)) for i in range(3)] \
        + [(300, _twin(_sentence(50)))]
    corpus = spark.createDataFrame(corpus_rows, DOC_SCHEMA)
    batch = spark.createDataFrame(batch_rows, DOC_SCHEMA)
    res = idx.dedup_batch(spark, batch, corpus_docs=corpus)
    inc = sorted(r["doc_id"] for r in res["survivors"].collect())
    scratch = dedup_neardup(corpus.unionByName(batch), shingle_n=2,
                            num_perm=32, num_bands=16)
    scratch_ids = sorted(r["doc_id"] for r in scratch.collect())
    assert inc == [i for i in scratch_ids if i >= 100]
    assert [i for i in scratch_ids if i < 100] == list(range(12))


def test_probe_reads_only_hit_band_buckets(spark, tmp_path, corpus_rows):
    """The 100-TB claim in file terms: a 1-doc batch's probe must scan
    only the physical buckets its own band hashes map to — every other
    index file stays untouched no matter how many docs are indexed."""
    from stellar_ledger_data_indexer_spark.lake.xxh64 import bucket_of
    # 64 physical buckets vs a 1-doc probe of ≤16 band hashes: the
    # point-read is a strict subset by pigeonhole, not by luck
    idx = NeardupIndex.create(str(tmp_path / "ndx"), num_buckets=64,
                              shingle_n=2)
    idx.add(spark, spark.createDataFrame(corpus_rows, DOC_SCHEMA))
    # several appends -> several files per physical bucket generation
    idx.add(spark, spark.createDataFrame(
        [(20 + i, _sentence(20 + i)) for i in range(8)], DOC_SCHEMA))
    batch = spark.createDataFrame([(500, _twin(corpus_rows[5][1]))],
                                  DOC_SCHEMA)
    pairs = idx.candidate_pairs(spark, batch).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} >= {(5, 500)}
    probe = idx.last_probe
    assert probe["mode"] == "point"
    assert probe["files_scanned"] < probe["files_total"]
    # and the scanned set is exactly the buckets the probed hashes map to
    t = idx.table.refresh()
    hit = idx.banded(batch).select("bucket").distinct().collect()
    want = {bucket_of(r["bucket"], t.num_buckets) for r in hit}
    read = t.read(spark, eq={"bucket": [r["bucket"] for r in hit]})
    got_buckets = {int(p.split("_bucket=")[1].split("/")[0])
                   for p in read.inputFiles()}
    assert got_buckets <= want


def test_params_pinned_and_reopen(spark, tmp_path, corpus_rows):
    idx = _index_over(spark, tmp_path / "ndx", corpus_rows,
                      num_perm=16, num_bands=8)
    re = NeardupIndex(str(tmp_path / "ndx"))
    assert re.params == {"shingle_n": 2, "num_perm": 16, "num_bands": 8,
                         "seed": 7, "id_type": "long", "mode": "text"}
    batch = spark.createDataFrame([(900, _twin(corpus_rows[7][1]))],
                                  DOC_SCHEMA)
    pairs = re.candidate_pairs(spark, batch).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} >= {(7, 900)}
    with pytest.raises(ValueError, match="not a NeardupIndex"):
        LakeTable.create(str(tmp_path / "plain"), DOC_SCHEMA)
        NeardupIndex(str(tmp_path / "plain"))


def test_add_survivors_grows_index_across_batches(spark, tmp_path,
                                                  corpus_rows):
    idx = _index_over(spark, tmp_path / "ndx", corpus_rows)
    corpus = spark.createDataFrame(corpus_rows, DOC_SCHEMA)
    b1 = spark.createDataFrame([(100, _sentence(60))], DOC_SCHEMA)
    r1 = idx.dedup_batch(spark, b1, corpus_docs=corpus, add_survivors=True)
    assert [r["doc_id"] for r in r1["survivors"].collect()] == [100]
    # batch 2 carries a near-dup OF BATCH 1's survivor: only the grown
    # index can catch it; corpus texts now include batch 1
    all_docs = corpus.unionByName(b1)
    b2 = spark.createDataFrame([(200, _twin(_sentence(60))),
                                (201, _sentence(61))], DOC_SCHEMA)
    r2 = idx.dedup_batch(spark, b2, corpus_docs=all_docs)
    assert sorted(r["doc_id"] for r in r2["survivors"].collect()) == [201]


def test_corpus_texts_from_laketable_point_read(spark, tmp_path,
                                                corpus_rows):
    """corpus_docs as a LakeTable bucketed by doc_id: candidate texts
    come from a point-pruned read, not a corpus scan."""
    idx = _index_over(spark, tmp_path / "ndx", corpus_rows)
    ct = LakeTable.create(str(tmp_path / "docs"), DOC_SCHEMA,
                          bucket_col="doc_id", num_buckets=8)
    ct.append(spark.createDataFrame(corpus_rows, DOC_SCHEMA))
    batch = spark.createDataFrame(
        [(100, _twin(corpus_rows[2][1])), (101, _sentence(70))], DOC_SCHEMA)
    res = idx.dedup_batch(spark, batch, corpus_docs=ct.refresh())
    assert sorted(r["doc_id"] for r in res["survivors"].collect()) == [101]


def test_token_mode_index(spark, tmp_path):
    """mode="tokens": shingles are token-id n-grams over array<int> —
    the ingest-loop form where documents arrive already tokenized. A
    batch sequence sharing a long prefix with an indexed one is caught;
    an unrelated sequence survives."""
    import numpy as np
    TSCH = "doc_id string, tokens array<int>"
    rng = np.random.RandomState(3)
    corpus = [(f"d{i}", rng.randint(0, 50257, 40).astype(int).tolist())
              for i in range(10)]
    idx = NeardupIndex.create(str(tmp_path / "tnd"), id_type="string",
                              mode="tokens", shingle_n=4, num_buckets=16)
    idx.add(spark, spark.createDataFrame(corpus, TSCH),
            text_col="tokens")
    assert idx.params["mode"] == "tokens"
    near = corpus[4][1][:-3]                      # prefix of d4: J >= 0.8
    novel = rng.randint(0, 50257, 40).astype(int).tolist()
    batch = spark.createDataFrame([("n1", near), ("n2", novel)], TSCH)
    res = idx.dedup_batch(
        spark, batch, text_col="tokens",
        corpus_docs=spark.createDataFrame(corpus, TSCH),
        verify_shingle_n=4)
    assert sorted(r["doc_id"] for r in res["survivors"].collect()) == ["n2"]
    assert res["probe"]["mode"] == "point"


def test_ingest_loop_maintains_index(spark, tmp_path):
    """JobConfig.neardup_index: the index advances with ingest (band
    rows appended per epoch after the commit marker), re-running the
    job adds nothing new in effect (same pair sets), and a probe after
    ingest catches a near-dup of an INGESTED document."""
    from stellar_ledger_data_indexer_spark.job import IngestJob, JobConfig
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, write_change_events)
    ev = str(tmp_path / "events")
    spec = StreamSpec(n_events=4000, n_docs=300, events_per_seq=100,
                      tok_len_min=16, tok_len_max=48)
    write_change_events(spark, ev, spec, partitions=4)
    cfg = JobConfig(events_path=ev, warehouse=str(tmp_path / "wh"),
                    num_buckets=8, epoch_size=20, neardup_index="ndx")
    job = IngestJob(spark, cfg)
    job.run(start=2, end=0, backfill=True)
    idx = job.ndx
    t = idx.table.refresh()
    n_rows = t.read(spark).count()
    live_docs = job.target.read(spark).filter("NOT deleted").count()
    # one row per (live doc, band) at least once; re-upserted docs may
    # carry extra generations — band count is the lower bound
    assert n_rows >= live_docs * idx.params["num_bands"]

    # probe: a prefix-twin of an ingested doc must surface as candidate
    victim = job.target.read(spark).filter(
        "NOT deleted AND n_tok >= 24").limit(1).collect()[0]
    from oracle import decode_target_tokens
    twin = decode_target_tokens(victim["tokens"])[:-2]
    batch = spark.createDataFrame([("probe1", list(twin))],
                                  "doc_id string, tokens array<int>")
    pairs = idx.candidate_pairs(spark, batch, text_col="tokens")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (victim["doc_id"], "probe1") in got \
        or ("probe1", victim["doc_id"]) in got


def test_index_compact_folds_fragments_and_duplicates(spark, tmp_path,
                                                      corpus_rows):
    """Bucket-selective compaction: per-epoch adds fragment the index
    (one file per touched bucket per add) and crash replays duplicate
    band rows; compact folds only over-fragmented buckets to one file
    each, drops exact duplicate rows, and leaves candidate pairs
    unchanged."""
    idx = NeardupIndex.create(str(tmp_path / "cnd"), num_buckets=4,
                              shingle_n=2)
    docs = spark.createDataFrame(corpus_rows, DOC_SCHEMA)
    for _ in range(3):
        idx.add(spark, docs)            # replayed adds -> duplicates
    for g in range(6):
        idx.add(spark, spark.createDataFrame(
            [(50 + g * 10 + i, _sentence(50 + g * 10 + i))
             for i in range(3)], DOC_SCHEMA))
    t = idx.table.refresh()
    rows_before = t.read(spark).count()
    files_before = len(t.files)
    batch = spark.createDataFrame([(900, _twin(corpus_rows[2][1]))],
                                  DOC_SCHEMA)
    pairs_before = {(r["id_a"], r["id_b"]) for r in
                    idx.candidate_pairs(spark, batch).collect()}
    res = idx.compact(spark, max_files_per_bucket=2)
    assert res["compacted_buckets"] > 0
    t2 = idx.table.refresh()
    assert len(t2.files) < files_before
    rows_after = t2.read(spark).count()
    assert rows_after < rows_before      # triplicate corpus rows folded
    dups = (t2.read(spark).groupBy("bucket", "band", "doc_id")
            .count().filter("count > 1").count())
    assert dups == 0
    pairs_after = {(r["id_a"], r["id_b"]) for r in
                   idx.candidate_pairs(spark, batch).collect()}
    assert pairs_after == pairs_before and (2, 900) in pairs_after
    # idempotent: a second sweep finds nothing over the bound
    assert idx.compact(spark, max_files_per_bucket=2) \
        == {"compacted_buckets": 0}


def test_neardup_cli_verbs_roundtrip(spark, tmp_path):
    """The CLI surface end-to-end in a subprocess: create -> add ->
    dedup (survivors parquet + --add-survivors) -> compact."""
    import json as _json
    import subprocess
    import sys as _sys
    corpus = [(i, _sentence(i)) for i in range(8)]
    batch = [(100, _twin(corpus[3][1])), (101, _sentence(77))]
    spark.createDataFrame(corpus, DOC_SCHEMA).write.mode("overwrite") \
        .parquet(str(tmp_path / "corpus"))
    spark.createDataFrame(batch, DOC_SCHEMA).write.mode("overwrite") \
        .parquet(str(tmp_path / "batch"))
    env = None
    repo = "/root/repo"

    def run(*args):
        out = subprocess.run(
            [_sys.executable, "main.py", *args], cwd=repo, env=env,
            capture_output=True, text=True, timeout=600)
        assert out.returncode == 0, out.stderr[-2000:]
        return _json.loads(out.stdout.strip().splitlines()[-1])
    idxp = str(tmp_path / "idx")
    r = run("neardup-create", "--index", idxp, "--shingle-n", "2",
            "--num-buckets", "8")
    assert r["status"] == "created" and r["mode"] == "text"
    r = run("neardup-add", "--index", idxp,
            "--docs", str(tmp_path / "corpus"), "--master", "local[4]")
    assert r["status"] == "added"
    r = run("neardup-dedup", "--index", idxp,
            "--batch", str(tmp_path / "batch"),
            "--corpus", str(tmp_path / "corpus"),
            "--out", str(tmp_path / "surv"),
            "--dropped-out", str(tmp_path / "dropped"),
            "--add-survivors", "--master", "local[4]")
    assert r["n_batch"] == 2 and r["n_dropped"] == 1 \
        and r["n_survivors"] == 1
    surv = spark.read.parquet(str(tmp_path / "surv"))
    assert [x["doc_id"] for x in surv.collect()] == [101]
    prov = spark.read.parquet(str(tmp_path / "dropped")).collect()
    assert [(x["doc_id"], x["canonical_id"]) for x in prov] == [(100, 3)]
    r = run("neardup-compact", "--index", idxp,
            "--max-files-per-bucket", "1", "--master", "local[4]")
    assert r["status"] == "done"


def test_stream_maintains_index(spark, tmp_path):
    """The streaming sink mirrors the batch loop: `stream
    --neardup-index` appends band rows per micro-batch."""
    import json as _json
    import subprocess
    import sys as _sys
    repo = "/root/repo"

    def run(*args):
        out = subprocess.run(
            [_sys.executable, "main.py", *args], cwd=repo,
            capture_output=True, text=True, timeout=900)
        assert out.returncode == 0, out.stderr[-2000:]
        return _json.loads(out.stdout.strip().splitlines()[-1])
    ev, wh = str(tmp_path / "events"), str(tmp_path / "wh")
    run("append", "--synthesize", "8000", "--events-path", ev,
        "--warehouse", str(tmp_path / "wh-seed"), "--start", "999999",
        "--end", "999999", "--master", "local[4]")
    r = run("stream", "--events-path", ev, "--warehouse", wh,
            "--neardup-index", "ndx", "--max-files-per-trigger", "4",
            "--master", "local[4]")
    assert r["status"] == "done" and r["target_rows"] > 0
    idx = NeardupIndex(str(tmp_path / "wh" / "ndx"))
    assert idx.params["mode"] == "tokens"
    t = idx.table.refresh()
    n = t.read(spark).count()
    assert n >= r["target_rows"] * idx.params["num_bands"] * 0.5
