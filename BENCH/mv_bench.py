"""Materialized-view maintenance cost: incremental vs full recompute.

The claim under test is the one that matters at 100 TB: a changelog-
driven refresh does O(changed keys + touched groups) work, so its wall
should stay ~flat as the BASE grows, while a full recompute grows with
the base. This harness builds the same view over bases of increasing
size, applies an identically-sized delta (fixed number of changed docs
across a fixed number of touched groups), and times both paths.

Run: python BENCH/mv_bench.py [--rows 100000 400000] [--delta-docs 200]
Prints one JSON line per base size plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from stellar_ledger_data_indexer_spark.lake.table import (  # noqa: E402
    BUCKET_COL, LakeTable)
from stellar_ledger_data_indexer_spark.lake.view import (  # noqa: E402
    MaterializedView)
from stellar_ledger_data_indexer_spark.session import get_spark  # noqa: E402

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("seq", T.LongType(), False),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_tok", T.LongType(), True),
])
AGGS = [["n_docs", "count", "*"], ["tok", "sum", "n_tok"],
        ["max_seq", "max", "seq"]]


def build_base(spark, path, rows, groups, buckets):
    # production shape: IngestJob sets write_order=source,-seq on the
    # documents table, which harvests per-file min/max stats for source
    # — the view's recompute read prunes files with them
    t = LakeTable.create(path, SCHEMA, bucket_col="doc_id",
                         num_buckets=buckets,
                         properties={"write_order": "source,-seq"})
    df = (spark.range(rows)
          .select(F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
                  F.col("id").alias("seq"),
                  F.concat(F.lit("s"), (F.col("id") % groups))
                  .alias("source"),
                  (F.col("id") % 97 + 10).alias("n_tok")))
    t.append(df)
    return t


def apply_delta(spark, t, delta_docs, groups_touched, seq0):
    # delta_docs changed docs spread over groups_touched groups (both
    # fixed across base sizes — the refresh should see the same work)
    df = (spark.range(delta_docs)
          .select(F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
                  (F.lit(seq0) + F.col("id")).alias("seq"),
                  F.concat(F.lit("s"), (F.col("id") % groups_touched))
                  .alias("source"),
                  F.lit(999).alias("n_tok"))
          .withColumn(BUCKET_COL, t.bucket_expr()))
    bs = [r[0] for r in df.select(BUCKET_COL).distinct().collect()]
    t.append_delta(df, bs)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+",
                    default=[100_000, 400_000, 1_600_000])
    ap.add_argument("--groups", type=int, default=1000)
    ap.add_argument("--delta-docs", type=int, default=200)
    ap.add_argument("--groups-touched", type=int, default=50)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    spark = get_spark(app="mv-bench", master=args.master)
    results = []
    work = tempfile.mkdtemp(prefix=f"mvbench-{os.getpid()}-")
    try:
        # untimed warmup: spin up Python workers / codecs / first-job
        # overheads on a throwaway cycle so the first measured cell
        # isn't inflated (the walls below were warmup-distorted before:
        # full-build DECREASED with base size)
        wb = os.path.join(work, "warm")
        tw = build_base(spark, wb, 20_000, args.groups, args.buckets)
        mw = MaterializedView.create(spark, os.path.join(work, "warmv"),
                                     wb, "source", AGGS, num_buckets=8)
        mw.refresh(spark)
        apply_delta(spark, tw, 50, 10, seq0=30_000)
        mw.refresh(spark)
        for rows in args.rows:
            bp = os.path.join(work, f"base{rows}")
            vp = os.path.join(work, f"view{rows}")
            t = build_base(spark, bp, rows, args.groups, args.buckets)
            mv = MaterializedView.create(spark, vp, bp, "source", AGGS,
                                         num_buckets=8)
            t0 = time.monotonic()
            assert mv.refresh(spark)["mode"] == "full"
            full_wall = time.monotonic() - t0
            # best-of-2 successive deltas: single-shot walls on this box
            # swing several-x under hypervisor steal (see BASELINE.md)
            inc_wall, r = None, None
            for rep in range(2):
                apply_delta(spark, t, args.delta_docs,
                            args.groups_touched,
                            seq0=rows + 10 + rep * args.delta_docs)
                t0 = time.monotonic()
                r = mv.refresh(spark)
                w = time.monotonic() - t0
                inc_wall = w if inc_wall is None else min(inc_wall, w)
                assert r["refreshed"], r
            rec = {"base_rows": rows, "full_build_sec": round(full_wall, 3),
                   "refresh_sec": round(inc_wall, 3),
                   "refresh_mode": r["mode"],   # wide deltas auto-rebuild
                   "delta_docs": args.delta_docs,
                   "groups_touched": r.get("groups"),
                   "view_buckets_rewritten": r.get("view_buckets"),
                   "speedup_vs_full": round(full_wall / inc_wall, 2)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
        flat = (results[-1]["refresh_sec"]
                / results[0]["refresh_sec"])
        print(json.dumps({
            "summary": "incremental wall growth across "
                       f"{args.rows[0]}→{args.rows[-1]} base rows",
            "base_growth_x": round(args.rows[-1] / args.rows[0], 1),
            "full_build_growth_x": round(results[-1]["full_build_sec"]
                                         / results[0]["full_build_sec"], 2),
            "incremental_growth_x": round(flat, 2)}), flush=True)
        return 0
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
