"""Dataset registry + third dataset (contract-events analog) tests.

Mirrors the reference's ordered-processor wiring
(internal/main.go:125-144) and its contract-events shape — nested topics
``map[string][]map[string]string`` + TOID transaction id
(internal/contract/contract_events.go:25-26,42,137-170): registering
``doc_events`` replays an events-style dataset with a MapType column
through the LWW MERGE into its own keyed table, golden-checked against a
single-threaded dict oracle under arbitrary epoch slicing.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle import (replay_blobs_oracle, replay_events_oracle,  # noqa: E402
                    rows_to_events)

from stellar_ledger_data_indexer_spark.datasets import (  # noqa: E402
    DOC_EVENTS_SPEC, REGISTRY, resolve)
from stellar_ledger_data_indexer_spark.job import IngestJob, JobConfig  # noqa: E402
from stellar_ledger_data_indexer_spark.sources.change_stream import (  # noqa: E402
    StreamSpec, read_change_events, write_change_events)

SPEC = StreamSpec(n_events=12_000, n_docs=300, events_per_seq=100,
                  events_permille=150, code_permille=80)


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ds") / "events")
    write_change_events(spark, p, SPEC, partitions=4)
    return p


# ------------------------------------------------------------- registry
def test_registry_resolve_validates():
    assert [s.name for s in resolve(("tokens", "ttl", "doc_events"))] == \
        ["tokens", "ttl", "doc_events"]
    with pytest.raises(ValueError, match="unknown datasets"):
        resolve(("tokens", "nope"))
    with pytest.raises(ValueError, match="mandatory"):
        resolve(("ttl",))
    with pytest.raises(ValueError, match="must come after"):
        resolve(("ttl", "tokens"))
    with pytest.raises(ValueError, match="duplicate"):
        resolve(("tokens", "ttl", "doc_events", "doc_events"))
    assert set(REGISTRY) == {"tokens", "ttl", "doc_events", "doc_blobs"}


def test_generator_emits_events_entries(spark, events_path):
    df = read_change_events(spark, events_path)
    n = df.filter("entry_type = 'events'").count()
    assert 0 < n < SPEC.n_events  # ~15%
    row = (df.filter("entry_type = 'events' AND doc_id != ''")
           .select("tx_idx", "topics_json").first())
    assert row["tx_idx"] is not None
    assert row["topics_json"].startswith('{"t')
    # default spec carries none — the r1/r2 fixture stream is unchanged
    assert StreamSpec(n_events=1).events_permille == 0


# ------------------------------------------------------- golden replay
def _events_state(spark, job):
    rows = job.extra_tables["doc_events"].read(spark).collect()
    return {r["event_id"]: r.asDict(recursive=True) for r in rows}


def _assert_matches_oracle(spark, job, events_path):
    oracle = replay_events_oracle(rows_to_events(
        read_change_events(spark, events_path).collect()))
    engine = _events_state(spark, job)
    assert set(engine) == set(oracle)
    for eid, o in oracle.items():
        e = engine[eid]
        for c in ("doc_id", "seq", "pos", "tx_idx", "topics", "closed_at"):
            assert e[c] == o[c], (eid, c, e[c], o[c])


def test_doc_events_golden_replay(spark, events_path, tmp_path):
    job = IngestJob(spark, JobConfig(
        events_path=events_path, warehouse=str(tmp_path / "wh"),
        num_buckets=8, epoch_size=40,
        datasets=("tokens", "ttl", "doc_events")))
    reports = job.run(start=2, end=0, backfill=True)
    assert len(reports) > 1  # MapType MERGE exercised across epochs
    _assert_matches_oracle(spark, job, events_path)
    # re-run: every epoch skipped, state identical (exactly-once)
    before = job.extra_tables["doc_events"].version
    again = job.run(start=2, end=0, backfill=True)
    assert all(r.skipped for r in again)
    assert job.extra_tables["doc_events"].refresh().version == before
    # per-dataset metrics rows landed (≙ RecordUpsertCount by dataset)
    datasets = {m["dataset"] for m in job.metrics.read_latest()}
    assert "doc_events" in datasets


def test_doc_events_slicing_invariance(spark, events_path, tmp_path):
    """Different epoch slicing (and CoW vs MoR commits) must converge to
    the identical doc_events state — the exactly-once contract extended
    to registered datasets."""
    j1 = IngestJob(spark, JobConfig(
        events_path=events_path, warehouse=str(tmp_path / "wh1"),
        num_buckets=8, epoch_size=7,
        datasets=("tokens", "ttl", "doc_events")))
    j1.run(start=2, end=0, backfill=True)
    j2 = IngestJob(spark, JobConfig(
        events_path=events_path, warehouse=str(tmp_path / "wh2"),
        num_buckets=8, epoch_size=10_000, write_mode="cow",
        datasets=("tokens", "ttl", "doc_events")))
    j2.run(start=2, end=0, backfill=True)
    s1, s2 = _events_state(spark, j1), _events_state(spark, j2)
    assert s1 == s2
    _assert_matches_oracle(spark, j1, events_path)


def test_doc_events_table_independent_of_main_target(spark, events_path,
                                                     tmp_path):
    """The third dataset must not perturb the main target: replaying with
    and without doc_events registered yields byte-identical documents
    state."""
    wh_a, wh_b = str(tmp_path / "a"), str(tmp_path / "b")
    ja = IngestJob(spark, JobConfig(events_path=events_path, warehouse=wh_a,
                                    num_buckets=8, epoch_size=50))
    ja.run(start=2, end=0, backfill=True)
    jb = IngestJob(spark, JobConfig(events_path=events_path, warehouse=wh_b,
                                    num_buckets=8, epoch_size=50,
                                    datasets=("tokens", "ttl", "doc_events")))
    jb.run(start=2, end=0, backfill=True)
    cols = ["doc_id", "tokens", "n_tok", "seq", "pos", "deleted",
            "live_until"]
    a = {r["doc_id"]: r.asDict(recursive=True)
         for r in ja.target.read(spark).select(cols).collect()}
    b = {r["doc_id"]: r.asDict(recursive=True)
         for r in jb.target.read(spark).select(cols).collect()}
    assert a == b


def test_doc_events_schema_evolution_through_generic_merge(spark,
                                                           events_path,
                                                           tmp_path):
    """Evolve the doc_events table mid-replay: the generic merge must
    pass evolved columns through (they're absent from the projector's
    batch), old files stay readable null-filled, and a rename maps by
    field id."""
    from pyspark.sql import types as T
    wh = str(tmp_path / "wh")
    job = IngestJob(spark, JobConfig(
        events_path=events_path, warehouse=wh, num_buckets=8,
        epoch_size=40, datasets=("tokens", "ttl", "doc_events")))
    rng, epochs = job.plan(start=2, end=0, backfill=True)
    mid = len(epochs) // 2
    for lo, hi in epochs[:mid]:
        job.apply_epoch(lo, hi)
    t = job.extra_tables["doc_events"]
    t.alter_add_column("severity", T.LongType())
    for lo, hi in epochs[mid:]:
        job.apply_epoch(lo, hi)
    _assert_matches_oracle(spark, job, events_path)
    rows = t.read(spark).collect()
    assert all(r["severity"] is None for r in rows)  # never populated
    t.alter_rename_column("severity", "level")
    assert "level" in t.read(spark).columns


def test_doc_blobs_golden_replay(spark, events_path, tmp_path):
    """Fourth dataset (contract-code analog): binary payloads through
    the generic LWW merge, keyed by their own sha256 — duplicate blobs
    across the stream collapse onto one content-addressed row; final
    state byte-equal to the dict oracle."""
    job = IngestJob(spark, JobConfig(
        events_path=events_path, warehouse=str(tmp_path / "wh"),
        num_buckets=8, epoch_size=40,
        datasets=("tokens", "ttl", "doc_events", "doc_blobs")))
    job.run(start=2, end=0, backfill=True)
    oracle = replay_blobs_oracle(rows_to_events(
        read_change_events(spark, events_path).collect()))
    rows = job.extra_tables["doc_blobs"].read(spark).collect()
    engine = {r["code_hash"]: r.asDict() for r in rows}
    assert set(engine) == set(oracle) and len(oracle) > 0
    # content-addressing exercised: more code events than distinct blobs
    n_code = read_change_events(spark, events_path) \
        .filter("entry_type = 'code' AND doc_id != ''").count()
    assert n_code > len(oracle)
    for h, o in oracle.items():
        e = engine[h]
        assert bytes(e["blob"]) == o["blob"]
        assert e["n_bytes"] == o["n_bytes"]
        assert (e["doc_id"], e["seq"], e["pos"]) == \
            (o["doc_id"], o["seq"], o["pos"])
    # the key really is the content hash (engine-side sha2 == hashlib)
    import hashlib
    assert all(hashlib.sha256(bytes(e["blob"])).hexdigest() == h
               for h, e in engine.items())


def test_doc_events_streaming_replay(spark, events_path, tmp_path):
    """The streaming tail applies registered upsert datasets per
    micro-batch (same order contract as the batch epoch body) and
    converges to the same oracle state."""
    from stellar_ledger_data_indexer_spark.streaming.stream_job import (
        stream_replay)
    wh = str(tmp_path / "wh")
    job = IngestJob(spark, JobConfig(
        events_path=events_path, warehouse=wh, num_buckets=8,
        epoch_size=40, datasets=("tokens", "ttl", "doc_events")))
    q = stream_replay(
        spark, events_path, job.target,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        mor=True,
        extra_datasets=[(s, job.extra_tables[s.name])
                        for s in job.datasets if s.kind == "upsert"])
    q.awaitTermination()
    _assert_matches_oracle(spark, job, events_path)


def test_sigkill_resume_converges_all_datasets(spark, events_path,
                                               tmp_path):
    """SIGKILL a four-dataset replay mid-run through the real CLI, then
    resume: every table (documents + doc_events + doc_blobs) must
    converge to the clean-run state — the exactly-once contract extended
    to registered datasets (they share the epoch marker)."""
    import signal
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    main = os.path.join(repo, "main.py")
    base = ["append", "--events-path", events_path, "--start", "2",
            "--end", "0", "--epoch-size", "10", "--num-buckets", "8",
            "--datasets", "tokens,ttl,doc_events,doc_blobs",
            "--master", "local[4]"]
    wh_clean, wh_crash = str(tmp_path / "clean"), str(tmp_path / "crash")

    r = subprocess.run([sys.executable, main] + base
                       + ["--warehouse", wh_clean],
                       cwd=repo, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    p = subprocess.Popen([sys.executable, main] + base
                         + ["--warehouse", wh_crash],
                         cwd=repo, stdout=subprocess.PIPE, text=True)
    seen = 0
    for line in p.stdout:
        if line.startswith('{"epoch"'):
            seen += 1
            if seen == 2:
                os.kill(p.pid, signal.SIGKILL)
                break
    p.wait(timeout=120)
    assert p.returncode != 0
    r2 = subprocess.run([sys.executable, main] + base
                        + ["--warehouse", wh_crash],
                        cwd=repo, capture_output=True, text=True,
                        timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]

    from stellar_ledger_data_indexer_spark.lake.table import LakeTable

    def fp(wh, table, key):
        rows = LakeTable(os.path.join(wh, table)).read(spark).collect()
        return sorted((r[key], r["seq"], r["pos"]) for r in rows)

    for table, key in (("documents", "doc_id"), ("doc_events", "event_id"),
                       ("doc_blobs", "code_hash")):
        assert fp(wh_crash, table, key) == fp(wh_clean, table, key), table


def test_first_epoch_crash_before_marker_replays(spark, events_path,
                                                 tmp_path, monkeypatch):
    """The bootstrap resume hole (r3 review finding): FIRST epoch's base
    merge commits, then the process dies before the extra-dataset merges
    and the marker. The checkpoint table exists-but-empty — resume must
    treat that as 'replay from the start' (the sink-max fallback here
    would skip the epoch and permanently drop its doc_events rows);
    sink-max applies only when the checkpoint table was MISSING at open."""
    from stellar_ledger_data_indexer_spark.operators import merge as M
    wh = str(tmp_path / "wh")
    cfg = JobConfig(events_path=events_path, warehouse=wh, num_buckets=8,
                    epoch_size=40, datasets=("tokens", "ttl", "doc_events"))
    job = IngestJob(spark, cfg)
    rng, epochs = job.plan(start=2, end=0, backfill=True)
    lo, hi = epochs[0]

    def boom(*a, **k):
        raise RuntimeError("simulated crash before extra-dataset merge")

    monkeypatch.setattr(M, "merge_upsert_generic", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        job.apply_epoch(lo, hi)
    monkeypatch.undo()

    # base merge committed (sink max == hi), no marker, table exists+empty
    job2 = IngestJob(spark, cfg)
    assert job2.max_seq_in_sink() >= hi
    assert job2.checkpoints.existed
    assert job2.resume_watermark() == 0  # NOT the sink max
    job2.run(start=2, end=0, backfill=True)
    _assert_matches_oracle(spark, job2, events_path)

    # the genuine lost-control-tables case still falls back to sink max
    import shutil
    shutil.rmtree(os.path.join(wh, "_checkpoints"))
    job3 = IngestJob(spark, cfg)
    assert not job3.checkpoints.existed
    assert job3.resume_watermark() == job3.max_seq_in_sink() > 0


def test_property_random_slicing_all_datasets(spark, events_path,
                                              tmp_path):
    """Every epoch size must converge every dataset to the same oracle
    state (slicing invariance over the full registry) — the dict-oracle
    form of 'final state is a pure function of the stream'."""
    events = rows_to_events(read_change_events(spark, events_path).collect())
    ev_oracle = replay_events_oracle(events)
    blob_oracle = replay_blobs_oracle(events)
    for epoch_size in (13, 57):
        job = IngestJob(spark, JobConfig(
            events_path=events_path,
            warehouse=str(tmp_path / f"wh{epoch_size}"),
            num_buckets=8, epoch_size=epoch_size,
            datasets=("tokens", "ttl", "doc_events", "doc_blobs")))
        job.run(start=2, end=0, backfill=True)
        engine_ev = _events_state(spark, job)
        assert set(engine_ev) == set(ev_oracle)
        rows = job.extra_tables["doc_blobs"].read(spark).collect()
        engine_blob = {r["code_hash"]: r for r in rows}
        assert set(engine_blob) == set(blob_oracle)
        for h, o in blob_oracle.items():
            assert bytes(engine_blob[h]["blob"]) == o["blob"]


def test_generic_merge_concurrent_writers(spark, tmp_path):
    """Two writers merging disjoint event batches into the same
    doc_events table concurrently: the snapshot race resolves via the
    inherited commit retry and both land exactly once (≙ the per-batch
    transaction retry, internal/utils/postgres.go:39-77)."""
    from concurrent.futures import ThreadPoolExecutor
    from datetime import datetime, timezone

    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from stellar_ledger_data_indexer_spark.operators.merge import (
        merge_upsert_generic)
    from stellar_ledger_data_indexer_spark.schema import DOC_EVENTS

    path = str(tmp_path / "ev")
    LakeTable.create(path, DOC_EVENTS, bucket_col="event_id", num_buckets=4)
    ts = datetime(2024, 5, 1, tzinfo=timezone.utc)

    def writer(widx):
        tbl = LakeTable(path)
        rows = [((100 + widx) << 32 | i << 12, f"d{i}", 100 + widx, i, i,
                 {"t": [{"k": str(i)}]}, ts) for i in range(6)]
        df = spark.createDataFrame(rows, DOC_EVENTS)
        return merge_upsert_generic(spark, tbl, df, "event_id", mor=True)

    with ThreadPoolExecutor(2) as ex:
        res = list(ex.map(writer, [0, 1]))
    assert sum(r.inserted for r in res) == 12
    final = LakeTable(path).read(spark)
    assert final.count() == 12
    assert final.select("seq").distinct().count() == 2


def test_project_events_unit(spark):
    """TOID packing + topics decode golden row (≙ the transform golden
    tests, internal/transform/contract_data_test.go:13-163)."""
    from datetime import datetime, timezone

    from stellar_ledger_data_indexer_spark.schema import CHANGE_EVENTS
    ts = datetime(2024, 5, 1, tzinfo=timezone.utc)
    rows = [
        (7, 0, "insert", "docX", None, "src", "events", ts, None, 3,
         '{"t1":[{"k0":"42"}]}', None),
        (7, 1, "insert", "", None, "src", "events", ts, None, 4, "{}",
         None),
        (7, 2, "insert", "docY", [1], "src", "tokens", ts, None, None,
         None, None),
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENTS)
    out = {r["event_id"]: r.asDict(recursive=True)
           for r in DOC_EVENTS_SPEC.project(df).collect()}
    eid = (7 << 32) | (3 << 12)
    assert set(out) == {eid}  # nonce + non-events filtered
    row = out[eid]
    assert row["doc_id"] == "docX" and row["tx_idx"] == 3
    assert row["topics"] == {"t1": [{"k0": "42"}]}
