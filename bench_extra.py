"""Extra (non-frozen) benchmarks: phase-level decomposition of the CDC
replay and per-catalog-query isolation — the guide §1 "measure first"
harness. bench.py stays the artifact of record; numbers from here are
cited in OPTIMIZATION_r07.md.

Modes:
  python bench_extra.py replay-phases   # per-epoch phase walls (noop-sink)
  python bench_extra.py explain-merge   # .explain("formatted") of the epoch merge
  python bench_extra.py queries [name...]  # per-entry wall + explain dump

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SLDI_BENCH_EVENTS as bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from stellar_ledger_data_indexer_spark.job import IngestJob, JobConfig
from stellar_ledger_data_indexer_spark.session import cores, get_spark
from stellar_ledger_data_indexer_spark.sources.change_stream import (
    StreamSpec, write_change_events)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def explain_str(df) -> str:
    """df.explain('formatted') as a string (Spark 4 JVM helper)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def _setup(spark, work: str, n_events: int, par: int):
    events_path = os.path.join(work, "change_events")
    spec = StreamSpec(n_events=n_events, n_docs=max(n_events // 12, 1000),
                      events_per_seq=max(n_events // 40, 100),
                      tok_len_min=8, tok_len_max=64)
    if not os.path.isdir(events_path):
        write_change_events(spark, events_path, spec, partitions=par * 2)
    return events_path, spec


def replay_phases(spark, work: str, n_events: int, par: int) -> dict:
    """One replay with per-epoch phase decomposition (mirrors the real
    apply_change_batch orchestration). Phases:
    dedup   = epoch scan -> project -> LWW dedup -> noop sink (isolated)
    tread   = resolved MoR read of all buckets -> noop sink (isolated)
    epoch   = the REAL epoch body (apply_change_batch: bucket discovery
              + fused merge read+joins+delta write+commit)
    post    = metrics/lineage/checkpoint + hygiene driver work
    (dedup/tread re-execute work the epoch also does — they are
    noop-sink isolation probes per guide §1.4, not additive costs)
    """
    from stellar_ledger_data_indexer_spark.job import apply_change_batch
    from stellar_ledger_data_indexer_spark.operators.cdc import project_base
    from stellar_ledger_data_indexer_spark.operators.dedup import dedup_lww
    from stellar_ledger_data_indexer_spark.sources.change_stream import \
        read_change_events

    events_path, spec = _setup(spark, work, n_events, par)
    wh = os.path.join(work, "warehouse_phases")
    shutil.rmtree(wh, ignore_errors=True)
    epoch_size = max((n_events // spec.events_per_seq) // 4 + 1, 1)
    job = IngestJob(spark, JobConfig(
        events_path=events_path, warehouse=wh, num_buckets=64,
        epoch_size=epoch_size))
    rng, epochs = job.plan(start=2, end=0, backfill=True)
    out = []
    for lo, hi in epochs:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(job._epoch_shuffle_partitions(lo, hi)))
        ph = {"lo": lo, "hi": hi,
              "shuffle_partitions":
                  int(spark.conf.get("spark.sql.shuffle.partitions"))}
        events = read_change_events(spark, events_path, lo, hi)

        spark.sparkContext.setJobDescription(f"dedup-probe {lo}-{hi}")
        base = project_base(events)
        if job.tokens_codec != "array":
            from stellar_ledger_data_indexer_spark.functions.token_codec \
                import encode_tokens
            base = base.withColumn(
                "tokens", encode_tokens(F.col("tokens"), job.tokens_codec))
        ph["dedup"] = noop(dedup_lww(base, key_cols=("doc_id",),
                                     order_cols=("seq", "pos"),
                                     first_seq_col="seq"))

        spark.sparkContext.setJobDescription(f"tread {lo}-{hi}")
        ph["tread"] = noop(job.target.read(spark)) \
            if job.target.files else 0.0

        spark.sparkContext.setJobDescription(f"epoch {lo}-{hi}")
        t0 = time.monotonic()
        res, eres, _walls = apply_change_batch(
            spark, job.target, events, strict_ops=True, mor=True)
        ph["epoch"] = round(time.monotonic() - t0, 3)
        ph["rows_upserted"] = res.rows_upserted
        ph["bytes_written"] = res.bytes_written
        spark.sparkContext.setJobDescription(None)

        t0 = time.monotonic()
        job.metrics.record(spark, lo, "tokens", None, None, res.matched,
                           res.inserted, res.updated, 0.0,
                           bytes_written=res.bytes_written)
        job.lineage.record_from_manifest(spark, lo, job.target, res.buckets,
                                         commit_versions={res.version})
        job.checkpoints.commit(spark, lo, lo, hi, job.target.version,
                               res.rows_upserted, eres.updated)
        for log in (job.checkpoints, job.lineage, job.metrics):
            log.table.fold_rows()
        ph["post"] = round(time.monotonic() - t0, 3)
        out.append(ph)
    return {"epochs": out,
            "totals": {k: round(sum(e[k] for e in out), 3)
                       for k in ("dedup", "tread", "epoch", "post")}}


def explain_merge(spark, work: str, n_events: int, par: int) -> str:
    """Build (without executing) the fused-merge plan of the LAST epoch
    against a warehouse holding the earlier epochs, and explain it."""
    from stellar_ledger_data_indexer_spark.operators.cdc import (
        project_base, project_enrich)
    from stellar_ledger_data_indexer_spark.operators.dedup import (
        dedup_enrich_candidates, dedup_lww)
    from stellar_ledger_data_indexer_spark.sources.change_stream import \
        read_change_events

    events_path, spec = _setup(spark, work, n_events, par)
    wh = os.path.join(work, "warehouse_phases")
    job = IngestJob(spark, JobConfig(
        events_path=events_path, warehouse=wh, num_buckets=64,
        epoch_size=max((n_events // spec.events_per_seq) // 4 + 1, 1)))
    latest = job.checkpoints.max_committed_hi(spark)
    lo, hi = max(latest - 1000, 2), latest
    events = read_change_events(spark, events_path, lo, hi)
    deduped = dedup_lww(project_base(events), key_cols=("doc_id",),
                        order_cols=("seq", "pos"), first_seq_col="seq")
    cand = dedup_enrich_candidates(project_enrich(events))
    # the REAL fused plan (operators/merge.fused_resolved_plan), no write
    from stellar_ledger_data_indexer_spark.operators.merge import (
        _affected_buckets, fused_resolved_plan)
    buckets = sorted(set(_affected_buckets(job.target, deduped))
                     | set(_affected_buckets(job.target, cand)))
    df, _obs = fused_resolved_plan(spark, job.target, deduped, cand, buckets)
    return explain_str(df)


def run_queries(spark, names: list[str], reps: int = 3,
                explain_dir: str | None = None) -> dict:
    from stellar_ledger_data_indexer_spark.plans.queries import QUERY_FNS
    # same warmup as bench.py's first-touch
    for t in ("events", "documents", "embeddings", "lineitem", "orders",
              "customer", "part", "nation", "region"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    out = {}
    for name in names or list(QUERY_FNS):
        fn = QUERY_FNS[name]
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            try:
                txt = explain_str(fn(spark, SF_DIR))
                with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                    fh.write(txt)
            except Exception as e:        # noqa: BLE001
                print(f"explain {name} failed: {e}", file=sys.stderr)
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"catalog:{name}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            walls.append(round(time.monotonic() - t0, 3))
        out[name] = walls
        spark.sparkContext.setJobDescription(None)
    return out


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "replay-phases"
    par = cores()
    sf = sf_of(SF_DIR)
    n_events = int(os.environ.get("SLDI_BENCH_EVENTS",
                                  max(int(20_000_000 * sf), 100_000)))
    shm = os.path.isdir("/dev/shm")
    if shm and not os.environ.get("SLDI_LOCAL_DIR"):
        os.environ["SLDI_LOCAL_DIR"] = "/dev/shm/sldi_extra_local"
        os.makedirs(os.environ["SLDI_LOCAL_DIR"], exist_ok=True)
    spark = get_spark(app="sldi-bench-extra", master=f"local[{par}]",
                      shuffle_partitions=par * 2,
                      extra={"spark.ui.enabled": "false"})
    work = os.environ.get("SLDI_BENCH_DIR") or \
        ("/dev/shm/sldi_extra" if shm else "/tmp/sldi_extra")
    os.makedirs(work, exist_ok=True)
    try:
        if mode == "replay-phases":
            print(json.dumps(replay_phases(spark, work, n_events, par)))
        elif mode == "explain-merge":
            print(explain_merge(spark, work, n_events, par))
        elif mode == "queries":
            names = sys.argv[2:]
            ed = os.environ.get("SLDI_EXPLAIN_DIR")
            print(json.dumps(run_queries(spark, names, explain_dir=ed)))
        else:
            raise SystemExit(f"unknown mode {mode}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
