"""Round-3 CLI surface: `stream` verb (filename-ordered streaming tail),
live gauges polled WHILE a replay runs, graceful SIGINT drain, and the
maintenance verbs (compact / expire-snapshots / vacuum).

Reference parity targets:
- unbounded mode reachable from the CLI
  (internal/input/ledgerMetaDataReader.go:83-90)
- Prometheus gauges served while indexing
  (internal/main.go:109-116, internal/utils/metrics.go:85-152)
- SIGINT context-cancel + drain (internal/main.go:106-107,201-208)
- post-backfill REINDEX upkeep
  (internal/db/migrations/20260225-reindex-contract-data-live-until.sql)
"""

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle import (assert_states_equal, replay_oracle,  # noqa: E402
                    rows_to_events, state_from_target)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN = os.path.join(REPO, "main.py")


def _run(args, **kw):
    return subprocess.run([sys.executable, MAIN] + args, cwd=REPO,
                          capture_output=True, text=True, timeout=600, **kw)


# ----------------------------------------------------- seq-named source
def test_writer_emits_seq_named_files_in_mtime_order(spark, tmp_path):
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, write_change_events)
    p = str(tmp_path / "events")
    write_change_events(spark, p, StreamSpec(n_events=5000), partitions=4)
    names = sorted(n for n in os.listdir(p) if n.endswith(".parquet"))
    assert names and all(n.startswith("seq-") for n in names)
    # name order == seq order == strictly increasing mtime order
    mtimes = [os.path.getmtime(os.path.join(p, n)) for n in names]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    ranges = [(int(n.split("-")[1]), int(n.split("-")[2])) for n in names]
    assert ranges == sorted(ranges)
    # whole ledgers per file: ranges don't overlap (a boundary never
    # splits one seq across files)
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_cli_stream_converges_to_oracle(spark, tmp_path):
    """CLI-driven streaming replay under maxFilesPerTrigger=1 (one file
    per micro-batch — the strictest slicing) must converge to the dict
    oracle, byte-for-byte."""
    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, read_change_events, write_change_events)
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    write_change_events(spark, events, StreamSpec(n_events=6000, n_docs=150),
                        partitions=4)
    r = _run(["stream", "--events-path", events, "--warehouse", wh,
              "--max-files-per-trigger", "1", "--num-buckets", "8",
              "--master", "local[4]"])
    assert r.returncode == 0, r.stderr[-2000:]
    done = json.loads(r.stdout.splitlines()[-1])
    assert done["status"] == "done" and done["mode"] == "stream"
    oracle = replay_oracle(rows_to_events(
        read_change_events(spark, events).collect()))
    engine = state_from_target(
        LakeTable(os.path.join(wh, "documents")).read(spark).collect())
    assert_states_equal(engine, oracle)


def test_cli_stream_follow_tails_live_producer(spark, tmp_path):
    """Run-forever tail (VERDICT r3 item 3, ≙ UnboundedRange,
    internal/input/ledgerMetaDataReader.go:83-93): a processingTime
    trigger keeps consuming while a producer lands new seq-aligned files
    DURING the query; the target converges to the extended oracle, and
    the first SIGINT drains cleanly with exit 130."""
    import shutil

    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, read_change_events, write_change_events)
    staging = str(tmp_path / "staging")
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    os.makedirs(events)
    write_change_events(spark, staging,
                        StreamSpec(n_events=12000, n_docs=200),
                        partitions=6)
    names = sorted(n for n in os.listdir(staging) if n.endswith(".parquet"))
    assert len(names) >= 4
    half = len(names) // 2
    for n in names[:half]:          # initial backlog
        shutil.move(os.path.join(staging, n), os.path.join(events, n))

    def target_max_seq():
        tpath = os.path.join(wh, "documents")
        if not LakeTable.exists(tpath):
            return 0
        return max((f.max_seq or 0 for f in LakeTable(tpath).files),
                   default=0)

    first_hi = int(names[half - 1].split("-")[2])
    final_hi = int(names[-1].split("-")[2])
    p = subprocess.Popen(
        [sys.executable, MAIN, "stream", "--follow", "--poll-interval",
         "0.5", "--events-path", events, "--warehouse", wh,
         "--num-buckets", "8", "--master", "local[4]"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True)
    try:
        deadline = time.time() + 240
        while target_max_seq() < first_hi and time.time() < deadline:
            assert p.poll() is None, "stream exited during catch-up"
            time.sleep(0.5)
        assert target_max_seq() >= first_hi, "initial backlog not consumed"
        # land the rest of the stream WHILE the query runs
        for n in names[half:]:
            shutil.move(os.path.join(staging, n), os.path.join(events, n))
        while target_max_seq() < final_hi and time.time() < deadline:
            assert p.poll() is None, "stream exited while tailing"
            time.sleep(0.5)
        assert target_max_seq() >= final_hi, "live files not consumed"
        p.send_signal(signal.SIGINT)
        rc = p.wait(timeout=120)
    finally:
        if p.poll() is None:
            p.kill()
            p.wait(timeout=60)
    assert rc == 130
    out = [json.loads(ln) for ln in p.stdout.read().splitlines()
           if ln.startswith("{")]
    assert out and out[-1]["status"] == "interrupted" \
        and out[-1]["follow"] is True
    # final state equals the FULL oracle (both halves, exactly once)
    oracle = replay_oracle(rows_to_events(
        read_change_events(spark, events).collect()))
    engine = state_from_target(
        LakeTable(os.path.join(wh, "documents")).read(spark).collect())
    assert_states_equal(engine, oracle)


def test_cli_stream_follow_sigkill_restart_converges(spark, tmp_path):
    """Exactly-once under the run-forever tail: SIGKILL (no drain) while
    the follow query is consuming, restart in follow mode, land the rest
    of the stream during the second run — final state must equal the
    full oracle (streaming offsets + idempotent LWW merges replay any
    half-applied micro-batch as a no-op)."""
    import shutil

    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, read_change_events, write_change_events)
    staging = str(tmp_path / "staging")
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    os.makedirs(events)
    write_change_events(spark, staging,
                        StreamSpec(n_events=10000, n_docs=150),
                        partitions=6)
    names = sorted(n for n in os.listdir(staging) if n.endswith(".parquet"))
    half = len(names) // 2
    for n in names[:half]:
        shutil.move(os.path.join(staging, n), os.path.join(events, n))

    def follow_proc():
        return subprocess.Popen(
            [sys.executable, MAIN, "stream", "--follow", "--poll-interval",
             "0.5", "--events-path", events, "--warehouse", wh,
             "--num-buckets", "8", "--master", "local[4]"],
            cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    def target_max_seq():
        tpath = os.path.join(wh, "documents")
        if not LakeTable.exists(tpath):
            return 0
        return max((f.max_seq or 0 for f in LakeTable(tpath).files),
                   default=0)

    first_hi = int(names[half - 1].split("-")[2])
    final_hi = int(names[-1].split("-")[2])
    p = follow_proc()
    try:
        deadline = time.time() + 240
        # kill WITHOUT drain as soon as any merge has landed
        while target_max_seq() == 0 and time.time() < deadline:
            assert p.poll() is None
            time.sleep(0.2)
        assert target_max_seq() > 0
    finally:
        p.kill()
        p.wait(timeout=60)
    p2 = follow_proc()
    try:
        deadline = time.time() + 240
        while target_max_seq() < first_hi and time.time() < deadline:
            assert p2.poll() is None, "restarted follow died"
            time.sleep(0.5)
        for n in names[half:]:      # land the rest during the second run
            shutil.move(os.path.join(staging, n), os.path.join(events, n))
        while target_max_seq() < final_hi and time.time() < deadline:
            assert p2.poll() is None
            time.sleep(0.5)
        assert target_max_seq() >= final_hi
        p2.send_signal(signal.SIGINT)
        assert p2.wait(timeout=120) == 130
    finally:
        if p2.poll() is None:
            p2.kill()
            p2.wait(timeout=60)
    oracle = replay_oracle(rows_to_events(
        read_change_events(spark, events).collect()))
    engine = state_from_target(
        LakeTable(os.path.join(wh, "documents")).read(spark).collect())
    assert_states_equal(engine, oracle)


# ------------------------------------------------------------ live gauges
def test_gauges_advance_while_replay_runs(tmp_path):
    """Poll _gauges.json from OUTSIDE the job process while it replays:
    the gauge file must appear, advance monotonically, and end with the
    committed state of the final epoch."""
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    r = _run(["append", "--events-path", events, "--warehouse", wh,
              "--synthesize", "30000", "--start", "2", "--end", "0",
              "--epoch-size", "20", "--num-buckets", "8",
              "--master", "local[4]"])
    assert r.returncode == 0, r.stderr[-2000:]
    # second warehouse: watch gauges live during the replay
    wh2 = str(tmp_path / "wh2")
    p = subprocess.Popen(
        [sys.executable, MAIN, "append", "--events-path", events,
         "--warehouse", wh2, "--start", "2", "--end", "0",
         "--epoch-size", "20", "--num-buckets", "8",
         "--master", "local[4]"],
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    gpath = os.path.join(wh2, "_gauges.json")
    seen = []
    try:
        deadline = time.time() + 300
        while p.poll() is None and time.time() < deadline:
            if os.path.exists(gpath):
                try:
                    with open(gpath) as fh:
                        g = json.load(fh)
                except (json.JSONDecodeError, OSError):
                    continue  # unreachable with atomic replace; be safe
                if not seen or g["updated_at"] > seen[-1]["updated_at"]:
                    seen.append(g)
            time.sleep(0.05)
        assert p.wait(timeout=300) == 0
    finally:
        if p.poll() is None:
            p.kill()
    assert len(seen) >= 3, "gauges never advanced during the run"
    eps = [g["epochs_done"] for g in seen]
    assert eps == sorted(eps)
    assert any(g["phase"] == "applying" for g in seen)
    ups = [g["rows_upserted_total"] for g in seen]
    assert ups == sorted(ups) and ups[-1] > 0
    last = json.load(open(gpath))
    assert last["phase"] == "committed"
    assert last["max_seq_indexed"] == last["max_seq_in_source"]
    # inspect surfaces the same live gauges
    out = json.loads(_run(["inspect", "--warehouse", wh2]).stdout)
    assert out["live"]["epochs_done"] == last["epochs_done"]


def test_http_gauges_endpoint_during_replay(tmp_path):
    """--metrics-port serves the live gauges over HTTP WHILE a replay
    runs (VERDICT r3 item 7; ≙ the reference's admin server answering
    scrapes during indexing, internal/main.go:94-116): the endpoint
    responds during the run, gauges advance, and the port closes with
    the process."""
    import urllib.request

    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    p = subprocess.Popen(
        [sys.executable, MAIN, "append", "--events-path", events,
         "--warehouse", wh, "--synthesize", "30000", "--start", "2",
         "--end", "0", "--epoch-size", "20", "--num-buckets", "8",
         "--metrics-port", "0", "--master", "local[4]"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True)
    port = None
    seen = []
    try:
        first = json.loads(p.stdout.readline())
        assert first["status"] == "metrics-server"
        port = first["port"]
        url = f"http://127.0.0.1:{port}/metrics"
        deadline = time.time() + 300
        while p.poll() is None and time.time() < deadline:
            try:
                with urllib.request.urlopen(url, timeout=5) as resp:
                    g = json.loads(resp.read())
            except (OSError, json.JSONDecodeError):
                # URLError subclasses OSError; a mid-recv reset while the
                # JVM forks workers raises bare ConnectionResetError
                time.sleep(0.1)
                continue
            if g and (not seen or g["updated_at"] > seen[-1]["updated_at"]):
                seen.append(g)
            time.sleep(0.05)
        assert p.wait(timeout=300) == 0
    finally:
        if p.poll() is None:
            p.kill()
            p.wait(timeout=60)
    assert len(seen) >= 3, "HTTP gauges never advanced during the run"
    eps = [g["epochs_done"] for g in seen]
    assert eps == sorted(eps) and eps[-1] > 0
    assert {g["phase"] for g in seen} <= {"applying", "finalizing",
                                          "committed"}
    # server is torn down with the job (drain path)
    import urllib.request as _rq
    try:
        _rq.urlopen(f"http://127.0.0.1:{port}/", timeout=2)
        alive = True
    except OSError:
        alive = False
    assert not alive


# ---------------------------------------------------------------- SIGINT
def test_sigint_drains_current_epoch(tmp_path):
    """First SIGINT: the in-flight epoch finishes and commits, the
    process exits 130 with an 'interrupted' report, and the warehouse
    holds exactly the reported epochs — no debris beyond orphans."""
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    r = _run(["append", "--events-path", events, "--warehouse",
              str(tmp_path / "seed"), "--synthesize", "30000", "--start",
              "2", "--end", "1", "--master", "local[4]"])
    assert r.returncode == 0, r.stderr[-2000:]

    p = subprocess.Popen(
        [sys.executable, MAIN, "append", "--events-path", events,
         "--warehouse", wh, "--start", "2", "--end", "0",
         "--epoch-size", "20", "--num-buckets", "8",
         "--master", "local[4]"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True)
    lines = []
    for line in p.stdout:
        if line.startswith('{"epoch"'):
            lines.append(json.loads(line))
            if len(lines) == 1:
                p.send_signal(signal.SIGINT)
        elif line.startswith('{"status"'):
            lines.append(json.loads(line))
    rc = p.wait(timeout=300)
    assert rc == 130, (rc, lines)
    final = lines[-1]
    assert final["status"] == "interrupted"
    epoch_lines = [ln for ln in lines if "epoch" in ln]
    assert final["last_committed_hi"] == epoch_lines[-1]["hi"]
    # durable state == reported state, exactly
    out = json.loads(_run(["inspect", "--warehouse", wh,
                           "--events-path", events]).stdout)
    assert out["gauges"]["max_committed_hi"] == final["last_committed_hi"]
    # and the drained run resumes cleanly to completion
    r2 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "0", "--epoch-size", "20",
               "--num-buckets", "8", "--master", "local[4]"])
    assert r2.returncode == 0
    out2 = json.loads(_run(["inspect", "--warehouse", wh,
                            "--events-path", events]).stdout)
    assert out2["gauges"]["max_committed_hi"] \
        == out2["gauges"]["max_seq_in_source"]


def test_cli_read_verb_seq_range_and_projection(spark, tmp_path):
    """`read` exposes the downstream read path from the CLI: MoR
    resolution + seq-range file skipping + projection/filter/order/limit.
    Output must match an in-process LakeTable.read of the same range."""
    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    r = _run(["append", "--events-path", events, "--warehouse", wh,
              "--synthesize", "20000", "--start", "2", "--end", "0",
              "--epoch-size", "50", "--num-buckets", "8",
              "--master", "local[4]"])
    assert r.returncode == 0, r.stderr[-2000:]
    t = LakeTable(os.path.join(wh, "documents"))
    expect = sorted(
        (r2["doc_id"], r2["seq"]) for r2 in
        t.read(spark, seq_range=(50, 120)).select("doc_id", "seq").collect())
    out = _run(["read", "--warehouse", wh, "--seq-lo", "50", "--seq-hi",
                "120", "--columns", "doc_id,seq", "--order", "doc_id",
                "--master", "local[4]"])
    assert out.returncode == 0, out.stderr[-2000:]
    got = [json.loads(ln) for ln in out.stdout.splitlines() if ln.strip()]
    assert sorted((g["doc_id"], g["seq"]) for g in got) == expect
    assert [g["doc_id"] for g in got] == sorted(g["doc_id"] for g in got)
    summary = json.loads(out.stderr.splitlines()[-1])
    assert summary["rows"] == len(expect) > 0
    # --where + --limit compose; unknown table errors cleanly
    out2 = _run(["read", "--warehouse", wh, "--where", "deleted",
                 "--limit", "3", "--columns", "doc_id,deleted",
                 "--master", "local[4]"])
    assert out2.returncode == 0
    rows2 = [json.loads(ln) for ln in out2.stdout.splitlines() if ln.strip()]
    assert len(rows2) <= 3 and all(r3["deleted"] for r3 in rows2)
    assert _run(["read", "--warehouse", wh, "--table", "nope"]).returncode == 2


# ----------------------------------------------------- maintenance verbs
def _fingerprint(spark, wh):
    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from oracle import decode_target_tokens
    rows = LakeTable(os.path.join(wh, "documents")).read(spark).collect()
    return sorted((r["doc_id"], tuple(decode_target_tokens(r["tokens"]) or []),
                   r["seq"], r["deleted"], r["live_until"]) for r in rows)


def test_maintenance_verbs(spark, tmp_path):
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    r = _run(["append", "--events-path", events, "--warehouse", wh,
              "--synthesize", "20000", "--start", "2", "--end", "0",
              "--epoch-size", "25", "--num-buckets", "8",
              "--compact-every", "10000",  # leave deltas for compact to fold
              "--master", "local[4]"])
    assert r.returncode == 0, r.stderr[-2000:]
    before = _fingerprint(spark, wh)

    # vacuum: plant an orphan (≙ crash debris), backdate it, sweep it
    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    t = LakeTable(os.path.join(wh, "documents"))
    orphan = os.path.join(t.path, "data", "commit-deadbeef",
                          "part-00000.parquet")
    os.makedirs(os.path.dirname(orphan))
    ref = next(f.path for f in t.files)
    with open(os.path.join(t.path, ref), "rb") as src, \
            open(orphan, "wb") as dst:
        dst.write(src.read())
    os.utime(orphan, (0, 0))
    out = json.loads(_run(["vacuum", "--warehouse", wh]).stdout)
    assert out["before"]["orphans"] >= 1 and out["after"]["orphans"] == 0
    assert not os.path.exists(orphan)

    # compact: file count drops (stacked MoR deltas fold), content equal
    out = json.loads(_run(["compact", "--warehouse", wh,
                           "--master", "local[4]"]).stdout)
    assert out["after"]["files"] < out["before"]["files"]
    assert _fingerprint(spark, wh) == before

    # expire-snapshots: manifests drop to --keep, content equal
    out = json.loads(_run(["expire-snapshots", "--warehouse", wh,
                           "--keep", "2"]).stdout)
    assert out["before"]["snapshots"] > 2 and out["after"]["snapshots"] == 2
    assert _fingerprint(spark, wh) == before

    # rollback: restore the pre-expire surviving snapshot as a new head
    # (compaction preserved content, so the fingerprint is unchanged —
    # semantic rollback is pinned at the table level in
    # test_rollback_restores_prior_state)
    t.refresh()
    prev = t.snapshots()[-2]
    out = json.loads(_run(["rollback", "--warehouse", wh,
                           "--to-snapshot", str(prev)]).stdout)
    assert out["status"] == "done" and out["verb"] == "rollback"
    assert out["snapshot"] > prev
    assert _fingerprint(spark, wh) == before

    # unknown table → clean error
    r = _run(["vacuum", "--warehouse", wh, "--table", "nope"])
    assert r.returncode == 2


def test_cli_read_default_cap_as_of_and_eq(spark, tmp_path):
    """Driver-safe read verb (VERDICT r4 wrong #2) + timestamp travel +
    composite-index --eq: an uncapped read emits at most the default
    1000 rows and a truncation notice; --all streams everything;
    --as-of mid-history matches the contemporary snapshot; --eq prunes
    by manifest stats and returns exactly the matching rows."""
    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    r = _run(["append", "--events-path", events, "--warehouse", wh,
              "--synthesize", "60000", "--start", "2", "--end", "0",
              "--epoch-size", "100", "--num-buckets", "8",
              "--master", "local[4]"])
    assert r.returncode == 0, r.stderr[-2000:]
    t = LakeTable(os.path.join(wh, "documents"))
    total = t.read(spark).count()
    out = _run(["read", "--warehouse", wh, "--master", "local[4]"])
    assert out.returncode == 0
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == min(total, 1000)   # never more than the cap
    summary = json.loads(out.stderr.splitlines()[-1])
    assert summary.get("truncated", False) is (total > 1000)
    # a cap that provably bites emits the truncation notice
    out_cap = _run(["read", "--warehouse", wh, "--limit", "5",
                    "--columns", "doc_id", "--master", "local[4]"])
    assert out_cap.returncode == 0
    assert len([ln for ln in out_cap.stdout.splitlines()
                if ln.strip()]) == 5
    cap_summary = json.loads(out_cap.stderr.splitlines()[-1])
    assert cap_summary["truncated"] is True and "note" in cap_summary
    # --all streams every row (toLocalIterator, no driver materialize)
    out2 = _run(["read", "--warehouse", wh, "--all", "--columns", "doc_id",
                 "--master", "local[4]"])
    assert out2.returncode == 0
    assert len([ln for ln in out2.stdout.splitlines() if ln.strip()]) == total
    # --as-of now == head snapshot; --snapshot equivalent
    import time as _time
    out3 = _run(["read", "--warehouse", wh, "--as-of", str(_time.time()),
                 "--columns", "doc_id", "--all", "--master", "local[4]"])
    assert out3.returncode == 0
    assert json.loads(out3.stderr.splitlines()[-1])["snapshot"] == t.version
    # --eq on the stats column: equals a --where read of the same value
    src = json.loads(_run(["read", "--warehouse", wh, "--columns", "source",
                           "--limit", "1", "--master",
                           "local[4]"]).stdout.splitlines()[0])["source"]
    eq_out = _run(["read", "--warehouse", wh, "--eq", f"source={src}",
                   "--columns", "doc_id", "--all", "--master", "local[4]"])
    wh_out = _run(["read", "--warehouse", wh, "--where",
                   f"source = '{src}'", "--columns", "doc_id", "--all",
                   "--master", "local[4]"])
    a = sorted(ln for ln in eq_out.stdout.splitlines() if ln.strip())
    b = sorted(ln for ln in wh_out.stdout.splitlines() if ln.strip())
    assert a == b and len(a) > 0
    # bad --eq column errors cleanly
    assert _run(["read", "--warehouse", wh, "--eq", "nope=1"]).returncode == 2


# ------------------------------------------------------- changes (CDC-out)
def test_cli_changes_folds_mid_state_to_final(spark, tmp_path):
    """The changelog verb is a downstream consumer's poll loop: replay
    half the stream, remember the snapshot cursor, replay the rest, then
    `changes --from-snapshot <cursor>` + fold onto the mid-state must
    reproduce the final table exactly. Also: a cursor already at head is
    an empty poll (rc 0, zero rows, NO Spark session), not an error."""
    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, write_change_events)
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    write_change_events(spark, events, StreamSpec(n_events=6000, n_docs=150),
                        partitions=4)
    r1 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "120", "--epoch-size", "60",
               "--num-buckets", "8", "--master", "local[4]"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    t = LakeTable(os.path.join(wh, "documents"))
    cursor = t.version
    mid = {r["doc_id"]: r for r in t.read(spark).collect()}
    r2 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "0", "--epoch-size", "60",
               "--num-buckets", "8", "--master", "local[4]"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    r3 = _run(["changes", "--warehouse", wh, "--from-snapshot", str(cursor),
               "--all", "--master", "local[4]"])
    assert r3.returncode == 0, r3.stderr[-2000:]
    summary = json.loads(r3.stderr.strip().splitlines()[-1])
    t.refresh()
    assert summary["to_snapshot"] == t.version
    changes = [json.loads(ln) for ln in r3.stdout.splitlines()]
    assert len(changes) == summary["rows"] > 0
    assert all(c["_change_type"] == "upsert" for c in changes)
    # consumer-side fold: newest _commit_version per key wins
    state = dict(mid)
    for c in changes:                       # stdout is in commit order
        row = {k: v for k, v in c.items()
               if k not in ("_change_type", "_commit_version")}
        state[c["doc_id"]] = row

    def norm(d):
        # CLI rows cross JSON (timestamps as strings); str() both sides
        return {k: {c: str(v) for c, v in
                    (r.asDict() if hasattr(r, "asDict") else r).items()}
                for k, r in d.items()}
    final = {r["doc_id"]: r for r in t.read(spark).collect()}
    assert norm(state) == norm(final)
    # empty poll at head
    r4 = _run(["changes", "--warehouse", wh, "--from-snapshot",
               str(t.version)])
    assert r4.returncode == 0 and r4.stdout.strip() == ""
    assert json.loads(r4.stderr.strip().splitlines()[-1])["rows"] == 0


def test_cli_changes_follow_tails_new_commits(spark, tmp_path):
    """`changes --follow` is the consumer side of the CDC-out loop: a
    tailing process emits each new commit's rows as a writer lands them.
    Replay half the stream, start the tail from that head, replay the
    rest WHILE tailing; the tail must emit exactly the rows that fold
    the mid-state into the final state, then drain on SIGINT (rc 130)."""
    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, write_change_events)
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    write_change_events(spark, events, StreamSpec(n_events=6000, n_docs=150),
                        partitions=4)
    r1 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "120", "--epoch-size", "60",
               "--num-buckets", "8", "--master", "local[4]"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    t = LakeTable(os.path.join(wh, "documents"))
    cursor = t.version
    mid = {r["doc_id"]: r for r in t.read(spark).collect()}
    p = subprocess.Popen(
        [sys.executable, MAIN, "changes", "--warehouse", wh,
         "--from-snapshot", str(cursor), "--follow", "--poll-interval",
         "0.5", "--master", "local[4]"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    try:
        r2 = _run(["append", "--events-path", events, "--warehouse", wh,
                   "--start", "2", "--end", "0", "--epoch-size", "60",
                   "--num-buckets", "8", "--master", "local[4]"])
        assert r2.returncode == 0, r2.stderr[-2000:]
        t.refresh()
        deadline = time.time() + 240
        lines: list[str] = []
        os.set_blocking(p.stdout.fileno(), False)
        buf = b""

        def drain():
            nonlocal buf
            chunk = p.stdout.read()       # None when no data is ready
            if chunk:
                buf += chunk
                *full, buf = buf.split(b"\n")
                lines.extend(ln.decode() for ln in full
                             if ln.startswith(b"{"))
        # wait until the tail has emitted every changed key
        want_rows = t.changelog(spark, cursor).count()
        while len(lines) < want_rows and time.time() < deadline:
            assert p.poll() is None, "changes --follow exited early"
            drain()
            time.sleep(0.5)
        drain()
        p.send_signal(signal.SIGINT)
        rc = p.wait(timeout=120)
        drain()
    finally:
        if p.poll() is None:
            p.kill()
            p.wait(timeout=60)
    assert rc == 130
    changes = [json.loads(ln) for ln in lines]
    assert len(changes) == want_rows > 0
    state = dict(mid)
    for c in sorted(changes, key=lambda c: c["_commit_version"]):
        state[c["doc_id"]] = {k: v for k, v in c.items()
                              if k not in ("_change_type",
                                           "_commit_version")}

    def norm(d):
        return {k: {c: str(v) for c, v in
                    (r.asDict() if hasattr(r, "asDict") else r).items()}
                for k, r in d.items()}
    final = {r["doc_id"]: r for r in t.read(spark).collect()}
    assert norm(state) == norm(final)


def test_cli_view_create_and_incremental_refresh(spark, tmp_path):
    """The full consumer loop from the CLI: replay half the stream,
    define a per-source aggregate view (initial full build), replay the
    rest, view-refresh — the refresh must be INCREMENTAL (changelog-
    driven, touched buckets only) and land exactly the state a
    from-scratch GROUP BY over the final table computes."""
    from pyspark.sql import functions as F

    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, write_change_events)
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    write_change_events(spark, events, StreamSpec(n_events=6000, n_docs=150),
                        partitions=4)
    r1 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "120", "--epoch-size", "60",
               "--num-buckets", "8", "--master", "local[4]"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = _run(["view-create", "--warehouse", wh, "--view", "by_source",
               "--group-by", "source", "--agg", "n_docs=count(*)",
               "--agg", "tok=sum(n_tok)", "--agg", "max_seq=max(seq)",
               "--num-buckets", "4", "--refresh", "--master", "local[4]"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    created = json.loads(r2.stdout.strip().splitlines()[-1])
    assert created["refresh"]["mode"] == "full"
    r3 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "0", "--epoch-size", "60",
               "--num-buckets", "8", "--master", "local[4]"])
    assert r3.returncode == 0, r3.stderr[-2000:]
    r4 = _run(["view-refresh", "--warehouse", wh, "--view", "by_source",
               "--master", "local[4]"])
    assert r4.returncode == 0, r4.stderr[-2000:]
    ref = json.loads(r4.stdout.strip().splitlines()[-1])
    assert ref["refreshed"] and ref["mode"] == "incremental"
    t = LakeTable(os.path.join(wh, "documents"))
    exp = {r["source"]: (r["n"], r["tok"], r["mx"]) for r in
           t.read(spark).groupBy("source")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("tok"),
                F.max("seq").alias("mx")).collect()}
    v = LakeTable(os.path.join(wh, "by_source"))
    got = {r["source"]: (r["n_docs"], r["tok"], r["max_seq"])
           for r in v.read(spark).collect()}
    assert got == exp
    # a second refresh with no new base commits is a pure no-commit poll
    r5 = _run(["view-refresh", "--warehouse", wh, "--view", "by_source",
               "--master", "local[4]"])
    assert r5.returncode == 0
    assert not json.loads(r5.stdout.strip().splitlines()[-1])["refreshed"]
    # inspect (zero-JVM) surfaces the view's freshness gauge
    r6 = _run(["inspect", "--warehouse", wh])
    assert r6.returncode == 0
    vstate = json.loads(r6.stdout)["tables"]["by_source"]["view"]
    assert vstate["snapshots_behind"] == 0 and vstate["base"] == "documents"


def test_cli_append_refreshes_views_in_loop(spark, tmp_path):
    """`append --views` keeps a materialized view current as ingest
    advances — after the run the view equals a from-scratch GROUP BY
    and its cursor sits at the base's head (no trailing manual
    refresh needed), the reference's derived-tables-advance-with-
    ingest behavior."""
    from pyspark.sql import functions as F

    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, write_change_events)
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    write_change_events(spark, events, StreamSpec(n_events=4000, n_docs=120),
                        partitions=4)
    r1 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "80", "--epoch-size", "40",
               "--num-buckets", "8", "--master", "local[4]"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = _run(["view-create", "--warehouse", wh, "--view", "by_source",
               "--group-by", "source", "--agg", "n=count(*)",
               "--agg", "tok=sum(n_tok)", "--num-buckets", "4",
               "--master", "local[4]"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    r3 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "0", "--epoch-size", "40",
               "--num-buckets", "8", "--views", "by_source",
               "--master", "local[4]"])
    assert r3.returncode == 0, r3.stderr[-2000:]
    t = LakeTable(os.path.join(wh, "documents"))
    v = LakeTable(os.path.join(wh, "by_source"))
    assert v.properties["mv_cursor"] == str(t.version)
    exp = {r["source"]: (r["n"], r["tok"]) for r in
           t.read(spark).groupBy("source")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("n_tok").alias("tok")).collect()}
    got = {r["source"]: (r["n"], r["tok"])
           for r in v.read(spark).collect()}
    assert got == exp


def test_cli_stream_refreshes_views_per_microbatch(spark, tmp_path):
    """`stream --views` (availableNow catch-up) refreshes the view from
    the sink — after the query drains the view matches a from-scratch
    GROUP BY and its cursor is at the base head."""
    from pyspark.sql import functions as F

    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, write_change_events)
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    write_change_events(spark, events, StreamSpec(n_events=3000, n_docs=100),
                        partitions=3)
    r1 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "50", "--epoch-size", "50",
               "--num-buckets", "8", "--master", "local[4]"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = _run(["view-create", "--warehouse", wh, "--view", "by_source",
               "--group-by", "source", "--agg", "n=count(*)",
               "--num-buckets", "4", "--refresh", "--master", "local[4]"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    r3 = _run(["stream", "--events-path", events, "--warehouse", wh,
               "--num-buckets", "8", "--views", "by_source",
               "--master", "local[4]"])
    assert r3.returncode == 0, r3.stderr[-2000:]
    t = LakeTable(os.path.join(wh, "documents"))
    v = LakeTable(os.path.join(wh, "by_source"))
    assert v.properties["mv_cursor"] == str(t.version)
    exp = {r["source"]: r["n"] for r in t.read(spark).groupBy("source")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {r["source"]: r["n"] for r in v.read(spark).collect()} == exp


def test_cli_changes_tails_a_view_table(spark, tmp_path):
    """CDC-out composes with views: `changes --table <view>` reports a
    view's refresh commits as keyed net changes (the CoW rewrite diffs
    only the rewritten buckets), so downstream consumers can tail the
    AGGREGATED table instead of the raw one."""
    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, write_change_events)
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    write_change_events(spark, events, StreamSpec(n_events=3000, n_docs=100),
                        partitions=3)
    r1 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "50", "--epoch-size", "50",
               "--num-buckets", "8", "--master", "local[4]"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = _run(["view-create", "--warehouse", wh, "--view", "by_source",
               "--group-by", "source", "--agg", "n=count(*)",
               "--num-buckets", "4", "--refresh", "--master", "local[4]"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    v = LakeTable(os.path.join(wh, "by_source"))
    cursor = v.version
    r3 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "0", "--epoch-size", "50",
               "--num-buckets", "8", "--views", "by_source",
               "--master", "local[4]"])
    assert r3.returncode == 0, r3.stderr[-2000:]
    r4 = _run(["changes", "--warehouse", wh, "--table", "by_source",
               "--from-snapshot", str(cursor), "--net", "--all",
               "--master", "local[4]"])
    assert r4.returncode == 0, r4.stderr[-2000:]
    changes = [json.loads(ln) for ln in r4.stdout.splitlines()
               if ln.startswith("{")]
    assert changes, "view advanced but no net changes emitted"
    # applying the net changes onto the cursor-time state reproduces the
    # view's head state
    state = {r["source"]: r["n"]
             for r in v.read(spark, snapshot=cursor).collect()}
    for c in changes:
        if c["_change_type"] == "delete":
            state.pop(c["source"], None)
        else:
            state[c["source"]] = c["n"]
    head = {r["source"]: r["n"] for r in v.refresh().read(spark).collect()}
    assert state == head


def test_cli_view_refresh_all_orders_chains(spark, tmp_path):
    """`view-refresh --all` discovers every view and refreshes bases
    before dependents, so a docs -> by_source -> size-class chain lands
    current in ONE pass (a dependent refreshed before its base would
    stay one commit behind)."""
    from pyspark.sql import functions as F

    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, write_change_events)
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    write_change_events(spark, events, StreamSpec(n_events=3000, n_docs=100),
                        partitions=3)
    r1 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "50", "--epoch-size", "50",
               "--num-buckets", "8", "--master", "local[4]"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    for spec in (
            ["--view", "by_source", "--group-by", "source",
             "--agg", "n=count(*)", "--agg", "tok=sum(n_tok)"],
            ["--view", "size_class", "--base", "by_source",
             "--group-by",
             "CASE WHEN n >= 5 THEN 'big' ELSE 'small' END AS cls",
             "--agg", "n_groups=count(*)", "--agg", "tok=sum(tok)"]):
        r = _run(["view-create", "--warehouse", wh, "--num-buckets", "2",
                  "--refresh", "--master", "local[4]"] + spec)
        assert r.returncode == 0, r.stderr[-2000:]
    r2 = _run(["append", "--events-path", events, "--warehouse", wh,
               "--start", "2", "--end", "0", "--epoch-size", "50",
               "--num-buckets", "8", "--master", "local[4]"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    r3 = _run(["view-refresh", "--warehouse", wh, "--all",
               "--master", "local[4]"])
    assert r3.returncode == 0, r3.stderr[-2000:]
    res = json.loads(r3.stdout.strip().splitlines()[-1])["refreshed"]
    assert list(res) == ["by_source", "size_class"]   # base first
    assert all(v["refreshed"] for v in res.values())
    # both levels current and exact
    t = LakeTable(os.path.join(wh, "documents"))
    v1 = LakeTable(os.path.join(wh, "by_source"))
    v2 = LakeTable(os.path.join(wh, "size_class"))
    assert v1.properties["mv_cursor"] == str(t.version)
    assert v2.properties["mv_cursor"] == str(v1.version)
    exp1 = {r["source"]: (r["n"], r["tok"]) for r in
            t.read(spark).groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_tok").alias("tok")).collect()}
    assert {r["source"]: (r["n"], r["tok"])
            for r in v1.read(spark).collect()} == exp1
    exp2 = {}
    for n, tok in exp1.values():
        cls = "big" if n >= 5 else "small"
        g, tk = exp2.get(cls, (0, 0))
        exp2[cls] = (g + 1, tk + tok)
    assert {r["cls"]: (r["n_groups"], r["tok"])
            for r in v2.read(spark).collect()} == exp2
