"""CLI entry point — spark-submit / python runnable.

The analog of the reference's single Cobra verb
``stellar-ledger-data-indexer append --start S --end E [--backfill]``
(reference: cmd/root.go:16-45, flags bound with env-var overlay at
cmd/root.go:47-71). Env overrides mirror that pattern:
``SLDI_EVENTS_PATH``, ``SLDI_WAREHOUSE``.

Usage:
    python main.py append --events-path P --warehouse W \
        [--start S] [--end E] [--backfill] [--epoch-size N] \
        [--num-buckets N] [--salt-buckets N] [--synthesize N_EVENTS]

``--synthesize`` first materializes a deterministic change stream at
--events-path (seed fixed), letting a fresh checkout demo end-to-end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sldi-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    ap = sub.add_parser("append", help="replay a change-stream range into "
                                       "the warehouse (the reference's only "
                                       "verb)")
    ap.add_argument("--events-path",
                    default=os.environ.get("SLDI_EVENTS_PATH"))
    ap.add_argument("--warehouse", default=os.environ.get("SLDI_WAREHOUSE"))
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=0,
                    help="<=1 means unbounded tail (clamped to source tip)")
    ap.add_argument("--backfill", action="store_true")
    ap.add_argument("--epoch-size", type=int, default=1000)
    ap.add_argument("--num-buckets", type=int, default=32)
    ap.add_argument("--salt-buckets", type=int, default=0)
    ap.add_argument("--write-mode", choices=("mor", "cow"), default="mor",
                    help="merge commit mode: merge-on-read deltas (default) "
                         "or copy-on-write bucket rewrites")
    ap.add_argument("--compact-every", type=int, default=8,
                    help="delta depth that triggers compaction (mor mode)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--synthesize", type=int, default=0, metavar="N_EVENTS",
                    help="generate a deterministic stream at --events-path "
                         "first (seed=42)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.events_path or not args.warehouse:
        print("error: --events-path and --warehouse are required "
              "(or SLDI_EVENTS_PATH / SLDI_WAREHOUSE)", file=sys.stderr)
        return 2

    from stellar_ledger_data_indexer_spark.job import IngestJob, JobConfig
    from stellar_ledger_data_indexer_spark.session import get_spark
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, write_change_events)

    spark = get_spark(app="sldi-append", master=args.master)
    try:
        if args.synthesize:
            write_change_events(spark, args.events_path,
                                StreamSpec(n_events=args.synthesize))
            print(f"synthesized {args.synthesize} change events at "
                  f"{args.events_path}")
        job = IngestJob(spark, JobConfig(
            events_path=args.events_path, warehouse=args.warehouse,
            num_buckets=args.num_buckets, epoch_size=args.epoch_size,
            salt_buckets=args.salt_buckets, write_mode=args.write_mode,
            compact_every=args.compact_every))
        reports = job.run(start=args.start, end=args.end,
                          backfill=args.backfill)
        if not reports:
            print(json.dumps({"status": "nothing-to-do"}))
            return 0
        for r in reports:
            print(json.dumps({
                "epoch": r.epoch_id, "lo": r.lo, "hi": r.hi,
                "skipped": r.skipped, "rows_upserted": r.rows_upserted,
                "rows_enriched": r.rows_enriched,
                "target_snapshot": r.target_snapshot}))
        n = job.target.read(spark).count()
        print(json.dumps({"status": "done", "epochs": len(reports),
                          "target_rows": n,
                          "target_snapshot": job.target.version}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
