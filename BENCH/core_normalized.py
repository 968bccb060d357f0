"""Core-normalized scaling: throughput per actually-consumed CPU core.

Why this metric exists: ``local[N]`` fixes N *task* threads, but the
single shared JVM also runs GC, JIT, Py4J, shuffle IO, and Python worker
processes — measured here, a "local[1]" replay consumes ~1.9 cores. The
naive N→4N efficiency ((tput_4N/tput_N)/4) therefore divides by a core
ratio the job never actually had, understating scaling. On a real
cluster executors are PROVISIONED by cores, so throughput per consumed
core is the number that transfers.

Method: run the same single-epoch replay at local[N] and local[4N]
(fresh process each, fair per-level tuning: SPARK_GRAFT_CPUS pinned so
session parallelism matches the level), sample utime+stime of the whole
process tree (python driver + JVM + pyspark workers) from /proc over the
replay window, and report both naive and per-consumed-core efficiency.

Usage: python BENCH/core_normalized.py [--n 1] [--events 4000000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import os, time, json, shutil
os.environ["SPARK_GRAFT_CPUS"] = "{n}"
from stellar_ledger_data_indexer_spark.session import get_spark
from stellar_ledger_data_indexer_spark.sources.change_stream import (
    StreamSpec, write_change_events)
from stellar_ledger_data_indexer_spark.job import IngestJob, JobConfig
spark = get_spark(master="local[{n}]", extra={{"spark.ui.enabled": "false"}})
work = "/dev/shm/sldi_corenorm_{n}"
shutil.rmtree(work, ignore_errors=True); os.makedirs(work)
ep = os.path.join(work, "events")
spec = StreamSpec(n_events={events}, n_docs={events}//12,
                  events_per_seq={events}//40, tok_len_min=8, tok_len_max=64)
write_change_events(spark, ep, spec, partitions={n}*2)
print("SYNC-START", flush=True)
job = IngestJob(spark, JobConfig(events_path=ep,
                                 warehouse=os.path.join(work, "wh"),
                                 num_buckets=64, epoch_size=10**9))
t0 = time.time(); job.run(start=2, end=0, backfill=True)
print("WALL", round(time.time()-t0, 3), flush=True)
spark.stop(); shutil.rmtree(work, ignore_errors=True)
"""


def _tree_cpu_secs(marker: str) -> float:
    """Sum utime+stime of every process whose cmdline mentions the work
    dir marker or is a spark JVM (single-tenant box assumption)."""
    total = 0.0
    tck = os.sysconf("SC_CLK_TCK")
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().split()
            with open(f"/proc/{pid}/cmdline") as fh:
                cmd = fh.read()
        except OSError:
            continue
        if marker in cmd or ("java" in cmd and "spark" in cmd.lower()):
            total += (int(parts[13]) + int(parts[14])) / tck
    return total


def run_level(n: int, events: int) -> tuple[float, float]:
    """Returns (replay wall secs, avg cores consumed during replay)."""
    marker = f"sldi_corenorm_{n}"
    p = subprocess.Popen([sys.executable, "-c",
                          CHILD.format(n=n, events=events)],
                         stdout=subprocess.PIPE, text=True, cwd=REPO)
    for line in p.stdout:
        if line.startswith("SYNC-START"):
            break
    c0, t0 = _tree_cpu_secs(marker), time.time()
    for line in p.stdout:
        if line.startswith("WALL"):
            break
    c1, t1 = _tree_cpu_secs(marker), time.time()
    p.wait()
    wall = t1 - t0
    return wall, (c1 - c0) / wall


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--events", type=int, default=4_000_000)
    args = ap.parse_args()
    w_lo, cores_lo = run_level(args.n, args.events)
    w_hi, cores_hi = run_level(args.n * 4, args.events)
    speedup = w_lo / w_hi
    print(json.dumps({
        "events": args.events,
        f"local[{args.n}]": {"wall": round(w_lo, 1),
                             "cores_consumed": round(cores_lo, 2),
                             "events_per_sec": round(args.events / w_lo)},
        f"local[{args.n * 4}]": {"wall": round(w_hi, 1),
                                 "cores_consumed": round(cores_hi, 2),
                                 "events_per_sec": round(args.events / w_hi)},
        "speedup": round(speedup, 3),
        "naive_efficiency": round(speedup / 4, 3),
        "per_consumed_core_efficiency": round(speedup / (cores_hi / cores_lo),
                                              3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
