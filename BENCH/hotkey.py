"""Hot-key stress: dedup-stage wall with a 40%-of-stream hot key,
salted vs unsalted, for BOTH physical dedup strategies (north rule:
explicit salted repartitioning for hot-key skew; DESIGN.md knob table).

What this is expected to show (and r3 measured — results table in
BENCH/BASELINE.md):

- the default agg strategy (groupBy + max_by) is skew-immune WITHOUT
  salting: Spark's partial aggregation combines the hot key map-side, so
  the shuffle carries <=1 row per key per map task; salting adds a
  second shuffle for nothing.
- the window strategy (row_number over the key partition) funnels the
  hot key's entire volume through ONE reducer task; salt_buckets=16
  splits it into a salted local window first, restoring parallelism.
  This is the case the explicit salting knob exists for — payloads too
  wide to combine map-side, or rank-style logic that can't partial-agg.

Usage: python BENCH/hotkey.py [--events 2000000] [--cpus 32]
                              [--hot-permille 400] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--hot-permille", type=int, default=400)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from stellar_ledger_data_indexer_spark.operators.cdc import project_base
    from stellar_ledger_data_indexer_spark.operators.dedup import (
        dedup_lww, dedup_lww_window)
    from stellar_ledger_data_indexer_spark.session import get_spark
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, read_change_events, write_change_events)

    work = os.environ.get("SLDI_BENCH_DIR", "/dev/shm/sldi_hotkey")
    os.makedirs(work, exist_ok=True)
    spark = get_spark(app="sldi-hotkey", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus * 2,
                      extra={"spark.ui.enabled": "false"})
    try:
        events_path = os.path.join(work, "events")
        spec = StreamSpec(n_events=args.events,
                          n_docs=max(args.events // 12, 1000),
                          events_per_seq=max(args.events // 40, 100),
                          hot_permille=args.hot_permille,
                          tok_len_min=8, tok_len_max=64)
        write_change_events(spark, events_path, spec,
                            partitions=args.cpus * 2)
        base = project_base(read_change_events(spark, events_path))
        hot_share = (base.filter(F.col("doc_id") == "doc00000000").count()
                     / base.count())

        strategies = {
            "agg_salt0": lambda df: dedup_lww(df, salt_buckets=0),
            "agg_salt16": lambda df: dedup_lww(df, salt_buckets=16),
            "window_salt0": lambda df: dedup_lww_window(df, salt_buckets=0),
            "window_salt16": lambda df: dedup_lww_window(df, salt_buckets=16),
        }
        results = {}
        for name, fn in strategies.items():
            fn(base.limit(1000)).count()  # warm the plan path
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.monotonic()
                n = fn(base).count()
                best = min(best, time.monotonic() - t0)
            results[name] = {"best_sec": round(best, 3), "rows_out": n}

        # reducer-side work distribution — the structural skew metric.
        # Wall-clock in ONE JVM understates the funnel: the "shuffle" is
        # a memory copy, so a 5M-row single-task sort costs ~1 s and the
        # salted plan's second exchange costs more than the skew saves.
        # On a real cluster the unsalted reducer pulls hot_share of EVERY
        # map output across one NIC; max-rows-per-reduce-task is the
        # quantity salting divides, and what decides the stage wall there.
        key_counts = base.groupBy("doc_id").count()
        hot_rows = key_counts.agg(F.max("count")).collect()[0][0]
        salted_max = (base
                      .groupBy("doc_id",
                               F.pmod(F.coalesce(F.col("pos"), F.lit(0)),
                                      F.lit(16)).alias("_salt"))
                      .count().agg(F.max("count")).collect()[0][0])
        print(json.dumps({
            "metric": "hotkey_dedup_stage_wall",
            "events": args.events,
            "hot_share": round(hot_share, 3),
            "cpus": args.cpus,
            "trials": args.trials,
            "strategies": results,
            "reduce_task_max_rows": {
                "unsalted": hot_rows,
                "salted_16": salted_max,
                "skew_reduction": round(hot_rows / max(salted_max, 1), 1)},
        }))
        return 0
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
