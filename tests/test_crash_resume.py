"""Crash-and-resume through the real CLI: SIGKILL a replay mid-run, then
re-run the same command and require byte-identical final state vs a
never-crashed run. This is the end-to-end form of the exactly-once
crash matrix (checkpoint.py docstring): whatever the kill left behind —
committed epochs, data files without a manifest link, a manifest
without its checkpoint marker — the resume must converge, and the
debris must be visible only as orphan files (swept by remove_orphans),
never as table state.
"""

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN = os.path.join(REPO, "main.py")


def _run(args, **kw):
    return subprocess.run([sys.executable, MAIN] + args, cwd=REPO,
                          capture_output=True, text=True, timeout=600, **kw)


def _state(spark, wh):
    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    from oracle import decode_target_tokens
    rows = LakeTable(os.path.join(wh, "documents")).read(spark).collect()
    return sorted((r["doc_id"], tuple(decode_target_tokens(r["tokens"]) or []),
                   r["seq"], r["pos"],
                   r["deleted"], r["live_until"], r["first_seq"])
                  for r in rows)


def test_sigkill_mid_replay_then_resume_converges(tmp_path, spark):
    events = str(tmp_path / "events")
    wh_crash = str(tmp_path / "wh_crash")
    wh_clean = str(tmp_path / "wh_clean")
    base = ["append", "--events-path", events, "--start", "2", "--end", "0",
            "--epoch-size", "20", "--num-buckets", "8",
            "--master", "local[4]"]

    r = _run(base + ["--warehouse", wh_clean, "--synthesize", "30000"])
    assert r.returncode == 0, r.stderr[-2000:]
    clean_reports = [json.loads(ln) for ln in r.stdout.splitlines()
                     if ln.startswith('{"epoch"')]
    assert len(clean_reports) >= 3  # enough epochs for a mid-run kill

    # crash run: kill -9 as soon as the second epoch has committed
    p = subprocess.Popen([sys.executable, MAIN] + base
                         + ["--warehouse", wh_crash],
                         cwd=REPO, stdout=subprocess.PIPE, text=True)
    seen = 0
    for line in p.stdout:
        if line.startswith('{"epoch"'):
            seen += 1
            if seen == 2:
                os.kill(p.pid, signal.SIGKILL)
                break
    p.wait(timeout=120)
    assert p.returncode != 0

    # resume: same command, runs only the uncovered range
    r2 = _run(base + ["--warehouse", wh_crash])
    assert r2.returncode == 0, r2.stderr[-2000:]
    resumed = [json.loads(ln) for ln in r2.stdout.splitlines()
               if ln.startswith('{"epoch"')]
    assert any(not rep["skipped"] for rep in resumed)

    assert _state(spark, wh_crash) == _state(spark, wh_clean)

    # kill debris is at most unreferenced files; sweeping them changes
    # nothing and a final inspect agrees with the clean warehouse
    from stellar_ledger_data_indexer_spark.lake.table import LakeTable
    t = LakeTable(os.path.join(wh_crash, "documents"))
    for rel in t.orphan_files():
        os.utime(os.path.join(t.path, rel), (0, 0))
    t.remove_orphans(older_than_secs=3600)
    assert _state(spark, wh_crash) == _state(spark, wh_clean)

    gauges = _run(["inspect", "--warehouse", wh_crash,
                   "--events-path", events])
    out = json.loads(gauges.stdout)
    assert out["gauges"]["max_committed_hi"] \
        == out["gauges"]["max_seq_in_source"]
