"""CLI entry point — spark-submit / python runnable.

The analog of the reference's single Cobra verb
``stellar-ledger-data-indexer append --start S --end E [--backfill]``
(reference: cmd/root.go:16-45). Config layering mirrors the reference's
viper binding (cmd/root.go:47-71 + internal/config.go:91-136): explicit
CLI flag > ``SLDI_<KEY>`` env var > ``--config`` TOML file > built-in
default.

Usage:
    python main.py append --events-path P --warehouse W \
        [--config cfg.toml] [--start S] [--end E] [--backfill] \
        [--epoch-size N] [--num-buckets N] [--salt-buckets N] \
        [--write-mode mor|cow] [--synthesize N_EVENTS]

``--synthesize`` first materializes a deterministic change stream at
--events-path (seed fixed), letting a fresh checkout demo end-to-end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# options that participate in the config/env/flag layering: name → (type,
# built-in default). Booleans accept 1/true/yes in env.
LAYERED = {
    "events_path": (str, None),
    "warehouse": (str, None),
    "start": (int, 0),
    "end": (int, 0),
    "backfill": (bool, False),
    "epoch_size": (int, 1000),
    "num_buckets": (int, 32),
    "salt_buckets": (int, 0),
    "write_mode": (str, "mor"),
    "compact_every": (int, 8),
    "master": (str, None),
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sldi-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    ap = sub.add_parser("append", help="replay a change-stream range into "
                                       "the warehouse (the reference's only "
                                       "verb)")
    # layered options default to None here; resolve_config applies the
    # env/TOML/default precedence for flags the user didn't pass
    ap.add_argument("--config", default=os.environ.get("SLDI_CONFIG"),
                    help="TOML config file (≙ config-test.toml + "
                         "processToml, internal/config.go:91-136)")
    ap.add_argument("--events-path", default=None)
    ap.add_argument("--warehouse", default=None)
    ap.add_argument("--start", type=int, default=None)
    ap.add_argument("--end", type=int, default=None,
                    help="<=1 means unbounded tail (clamped to source tip)")
    ap.add_argument("--backfill", action="store_const", const=True,
                    default=None)
    ap.add_argument("--epoch-size", type=int, default=None)
    ap.add_argument("--num-buckets", type=int, default=None)
    ap.add_argument("--salt-buckets", type=int, default=None)
    ap.add_argument("--write-mode", choices=("mor", "cow"), default=None,
                    help="merge commit mode: merge-on-read deltas (default) "
                         "or copy-on-write bucket rewrites")
    ap.add_argument("--compact-every", type=int, default=None,
                    help="delta depth that triggers compaction (mor mode)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--synthesize", type=int, default=0, metavar="N_EVENTS",
                    help="generate a deterministic stream at --events-path "
                         "first (seed=42)")
    return p


def resolve_config(args: argparse.Namespace) -> argparse.Namespace:
    """Apply the precedence: explicit flag > SLDI_ env > TOML > default.
    Unknown TOML keys are an error (the reference rejects malformed
    config at load, internal/config.go:103-133)."""
    toml_vals: dict = {}
    if args.config:
        import tomllib
        with open(args.config, "rb") as fh:
            toml_vals = tomllib.load(fh)
        unknown = set(toml_vals) - set(LAYERED)
        if unknown:
            raise SystemExit(f"error: unknown config keys {sorted(unknown)}; "
                             f"valid: {sorted(LAYERED)}")
    for key, (typ, default) in LAYERED.items():
        if getattr(args, key, None) is not None:
            continue                                   # explicit flag wins
        env = os.environ.get(f"SLDI_{key.upper()}")
        if env is not None:
            val = (env.lower() in ("1", "true", "yes")) if typ is bool \
                else typ(env)
        elif key in toml_vals:
            val = toml_vals[key]
            if not isinstance(val, typ) and val is not None:
                raise SystemExit(f"error: config key {key} expects "
                                 f"{typ.__name__}, got {val!r}")
        else:
            val = default
        setattr(args, key, val)
    return args


def main(argv: list[str] | None = None) -> int:
    args = resolve_config(build_parser().parse_args(argv))
    if not args.events_path or not args.warehouse:
        print("error: --events-path and --warehouse are required "
              "(or SLDI_EVENTS_PATH / SLDI_WAREHOUSE, or a --config file)",
              file=sys.stderr)
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
