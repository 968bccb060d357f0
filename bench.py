"""Bench harness — one JSON line to stdout.

Headline: CDC replay throughput (change-events/sec through the full
pipeline: pruned scan → projection → LWW dedup → bucket-pruned MERGE →
enrichment MERGE → checkpoint) on a deterministic synthetic stream sized
to the scale factor, plus per-query wall times for the operator catalog
on $SPARK_GRAFT_SF_DIR tables.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores),
     SLDI_BENCH_EVENTS (override event count).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stellar_ledger_data_indexer_spark.job import IngestJob, JobConfig
from stellar_ledger_data_indexer_spark.session import cores, get_spark
from stellar_ledger_data_indexer_spark.sources.change_stream import (
    StreamSpec, write_change_events)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERY_NAMES = [
    "cdc_filter_project", "cdc_image_select", "window_dedup_lww",
    "max_seq", "range_scan", "toid_pack", "sha256_key_hash",
    "enum_normalize", "ts_convert", "enrich_monotonic", "agg_counts",
    "b64_serialize", "topics_serialize", "i128_decimal_sum",
    "join_agg_shuffle", "broadcast_dim_join", "topn_orders",
    "rollup_pricing", "cube_returns_status", "pivot_returns_by_status",
    "ntile_customer_quartiles", "topk_per_group",
    "anti_join_unordered_parts",
    "semi_join_heavy_parts", "distinct_agg_supplier",
    "running_total_orders", "lag_gap_events", "sessionize_events",
    "asof_last_click_before_error", "asof_next_error_after_click",
    "except_urgent_custs", "intersect_urgent_heavy",
    "q3_shipping_priority",
    "exact_dedup", "token_count", "token_count_bpe", "text_stats", "lang_id",
    "ngram_jaccard_pairs", "embedding_neardup", "cosine_knn",
    "minhash_pairs", "simhash_signatures",
    "quantile_thresholds", "approx_distinct_customers",
    "freq_items_lang", "stratified_sample_docs", "training_mix_order",
    "minhash_lsh_verified", "incremental_neardup",
    "simhash_neardup_recall", "cosine_lsh_recall",
    "cosine_ivf_recall", "cosine_ivf_trained_recall",
    "neardup_clusters", "sequence_pack_stats",
    "curation_pipeline",
]


def _burn_worker(iters: int) -> int:
    # pure-Python LCG burn — same worker as BENCH/scaling.py's probe
    x = 0x2545F4914F6CDD1D
    m = (1 << 64) - 1
    for _ in range(iters):
        x = (x * 6364136223846793005 + 1442695040888963407) & m
    return x


def climate_probe(par: int, iters: int = 2_000_000,
                  trials: int = 3) -> dict:
    """Engine-independent steal gauge embedded in the artifact of record
    (VERDICT r5 item 2): pure-Python integer burn in OS processes — no
    Spark, no I/O. ``burn_ceiling`` is the most ANY software could scale
    N→par on this box in this window (hypervisor steal caps it below
    1.0 in bad windows); ``spread`` is the same-window wall variance of
    identical work. A ±25% swing between rounds is attributable INSIDE
    the bench file: compare the two rounds' ceilings/spreads before
    blaming the code. Uses spawn (JVM-safe) and costs ~15 s total."""
    import multiprocessing as mp
    ctx = mp.get_context("spawn")
    lo = max(par // 4, 1)
    walls: dict[int, list[float]] = {}
    for procs in (lo, par):
        w = []
        with ctx.Pool(procs) as pool:
            for _ in range(trials):
                t0 = time.monotonic()
                pool.map(_burn_worker, [iters] * procs)
                w.append(round(time.monotonic() - t0, 3))
        walls[procs] = w
    thr = {k: k * iters / min(v) for k, v in walls.items()}
    return {
        "iters": iters, "procs": [lo, par],
        "wall_sec": {str(k): v for k, v in walls.items()},
        "ops_per_sec": {str(k): round(v) for k, v in thr.items()},
        "burn_ceiling": round((thr[par] / thr[lo]) / (par / lo), 3),
        "spread": {str(k): round((max(v) - min(v)) / min(v), 3)
                   for k, v in walls.items()},
    }


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def bench_replay(spark, n_events: int, work_dir: str,
                 parallelism: int) -> dict:
    """Timed section: replay only (generation is setup). Best-of-N
    replays (SLDI_BENCH_REPLAY_REPS, default 3 per VERDICT r5 item 2,
    fresh warehouse each): the headline throughput is the engine's
    cost, not the steal window's — same-day single-shot replays swing
    2× on this box (67.3k vs 32.6k ev/s measured hours apart at
    identical config). Every rep's wall is recorded (``rep_walls``) so
    the record itself shows the in-window variance."""
    events_path = os.path.join(work_dir, "change_events")
    spec = StreamSpec(n_events=n_events, n_docs=max(n_events // 12, 1000),
                      events_per_seq=max(n_events // 40, 100),
                      tok_len_min=8, tok_len_max=64)
    write_change_events(spark, events_path, spec, partitions=parallelism * 2)
    reps = max(int(os.environ.get("SLDI_BENCH_REPLAY_REPS", "3")), 1)
    best = None
    rep_walls: list[float] = []
    for _ in range(reps):
        wh = os.path.join(work_dir, "warehouse")
        shutil.rmtree(wh, ignore_errors=True)
        # num_buckets fixed (not a function of parallelism) so scaling
        # runs compare identical workloads
        job = IngestJob(spark, JobConfig(
            events_path=events_path, warehouse=wh, num_buckets=64,
            epoch_size=max((n_events // spec.events_per_seq)
                           // int(os.environ.get("SLDI_BENCH_EPOCHS", "4"))
                           + 1, 1)))
        t0 = time.monotonic()
        reports = job.run(start=2, end=0, backfill=True)
        wall = time.monotonic() - t0
        rep_walls.append(round(wall, 3))
        if best is not None and wall >= best["replay_sec"]:
            best["rep_walls"] = rep_walls
            continue
        merge_bytes = sum((m["bytes_written"] or 0)
                          for m in job.metrics.read_latest())
        table_bytes = job.target.refresh().table_bytes()
        best = {"replay_sec": round(wall, 3),
                "events": n_events,
                "events_per_sec": round(n_events / wall, 1),
                "epochs": len(reports),
                "rows_upserted": sum(r.rows_upserted for r in reports),
                # merge-on-read write-amplification signal: bytes
                # committed by merges across the run vs final live table
                # size (CoW would commit ~epochs × table_bytes for
                # uniform-key epochs)
                "merge_bytes_written": merge_bytes,
                "table_bytes": table_bytes,
                "write_amplification": round(merge_bytes
                                             / max(table_bytes, 1), 2),
                "reps": reps,
                "rep_walls": rep_walls}
    return best


def bench_queries(spark) -> dict[str, float]:
    from pyspark.sql import functions as F

    from stellar_ledger_data_indexer_spark.plans.queries import QUERY_FNS

    # warmup: first-touch parquet footers and spin up the Python/Arrow
    # worker pool once, so per-query timings measure the query — not
    # one-time process startup (round-1's "exact_dedup 24 s" was exactly
    # this: the first documents-table pandas-udf query paid the pool)
    for t in ("events", "documents", "embeddings", "lineitem", "orders",
              "customer", "part", "nation", "region"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    from stellar_ledger_data_indexer_spark.functions.similarity import \
        cosine_batch
    (spark.range(64)
     .select(F.array(F.lit(1.0), F.lit(2.0)).alias("a"),
             F.array(F.lit(1.0), F.lit(2.0)).alias("b"))
     .select(cosine_batch(F.col("a"), F.col("b"))).count())
    # ... and the minhash/simhash workers at the REAL plan shape
    # (VERDICT r4 next-step 1a: the old warmup ran num_perm=4 over 32
    # docs — the measured entries run num_perm=32 grouped aggs over
    # ~600 docs with a candidate join on top, so the first heavy entry
    # still paid residual worker/codegen spin-up). Warm on a DIFFERENT
    # doc slice than the twin fixture so the measured entries' shared
    # gram cache is NOT pre-populated — the first rep pays it, best-of-N
    # keeps the cached cost, exactly the sharing the entries really do.
    from pyspark.sql import functions as FW

    from stellar_ledger_data_indexer_spark.functions.dedup_text import (
        minhash_candidate_pairs, simhash, word_shingles)
    warm = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter((FW.col("doc_id") >= 300) & (FW.col("doc_id") < 900))
            .select("doc_id", "text"))
    wcands = minhash_candidate_pairs(warm, num_perm=32, num_bands=16)
    wg = warm.select("doc_id", FW.array_distinct(
        word_shingles(FW.col("text"), 2)).alias("g"))
    (wcands.join(wg.select(FW.col("doc_id").alias("id_a"),
                           FW.col("g").alias("ga")), "id_a")
     .join(wg.select(FW.col("doc_id").alias("id_b"),
                     FW.col("g").alias("gb")), "id_b")
     .select(FW.size(FW.array_intersect("ga", "gb"))).count())
    simhash(warm.limit(64)).count()

    # drift guard: the curated timing order must cover the catalog exactly
    # (a plain assert is stripped under python -O — raise explicitly)
    missing = set(QUERY_FNS) - set(QUERY_NAMES)
    stale = set(QUERY_NAMES) - set(QUERY_FNS)
    if missing or stale:
        raise RuntimeError(
            f"bench QUERY_NAMES out of sync with the catalog: "
            f"missing={sorted(missing)} stale={sorted(stale)}")
    # best-of-N per query: a single hypervisor steal spike (this box
    # measures up to 2× wall variance at fixed config) must not define
    # the artifact of record — the best of N back-to-back runs is the
    # engine's cost, the others are the climate's
    reps = max(int(os.environ.get("SLDI_BENCH_QUERY_REPS", "3")), 1)
    out, out_reps = {}, {}
    for name in QUERY_NAMES:
        fn = QUERY_FNS[name]
        walls = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            walls.append(round(time.monotonic() - t0, 3))
        out[name] = min(walls)
        out_reps[name] = walls
    return out, out_reps


def bench_packing(spark) -> dict:
    """Sequence-packing throughput (VERDICT r3 item 6): pack the full
    documents table into 256-token EOS-separated blocks and report
    packed tokens/sec (conservation of the token count is the
    sequence_pack_stats oracle; this measures the fold)."""
    from pyspark.sql import functions as F

    from stellar_ledger_data_indexer_spark.functions.packing import \
        pack_blocks
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = max(int(os.environ.get("SLDI_BENCH_QUERY_REPS", "3")), 1)
    best, toks = None, 0
    for _ in range(reps):
        t0 = time.monotonic()
        toks = (pack_blocks(d, block_size=256)
                .agg(F.sum(F.size("tokens")).alias("n")).collect()[0]["n"])
        dt = time.monotonic() - t0
        best = dt if best is None or dt < best else best
    return {"packed_tokens": int(toks), "sec": round(best, 3),
            "tokens_per_sec": round(toks / best, 1)}


def main() -> int:
    par = cores()
    sf = sf_of(SF_DIR)
    n_events = int(os.environ.get("SLDI_BENCH_EVENTS",
                                  max(int(20_000_000 * sf), 100_000)))
    # scratch on tmpfs when available: this box's /tmp disk writes
    # ~500 MB/s and saturates long before 32 cores do — on /dev/shm the
    # replay measures the engine (CPU/shuffle), which is what a cluster
    # node with local NVMe would look like. SLDI_BENCH_DIR/SLDI_LOCAL_DIR
    # override both.
    shm = os.path.isdir("/dev/shm")
    # cleanup only deletes what THIS process created: a user-set
    # SLDI_LOCAL_DIR / SLDI_BENCH_DIR is theirs to manage, and the shared
    # default path may belong to a concurrent bench
    owned: list[str] = []
    if shm and not os.environ.get("SLDI_LOCAL_DIR"):
        os.environ["SLDI_LOCAL_DIR"] = f"/dev/shm/sldi_bench_local_{os.getpid()}"
        os.makedirs(os.environ["SLDI_LOCAL_DIR"], exist_ok=True)
        owned.append(os.environ["SLDI_LOCAL_DIR"])
    spark = get_spark(app="sldi-bench", master=f"local[{par}]",
                      shuffle_partitions=par * 2,
                      extra={"spark.ui.enabled": "false"})
    work = os.environ.get("SLDI_BENCH_DIR")
    if not work:
        work = (f"/dev/shm/sldi_bench_{os.getpid()}" if shm
                else f"/tmp/sldi_bench_{os.getpid()}")
        owned.append(work)
    os.makedirs(work, exist_ok=True)
    try:
        # same-window steal calibration bracketing the measurements:
        # start probe before the timed work, end probe after — the two
        # together date-stamp the climate the walls were taken in
        climate = {"start": climate_probe(par)}
        replay = bench_replay(spark, n_events, work, par)
        # the replay's volume-aware epochs mutate the session's
        # spark.sql.shuffle.partitions; restore the bench conf so the
        # catalog phase runs under the same plan shapes every round
        spark.conf.set("spark.sql.shuffle.partitions", str(par * 2))
        replay_only = os.environ.get("SLDI_BENCH_REPLAY_ONLY")
        queries, queries_reps = ({}, {}) if replay_only \
            else bench_queries(spark)
        packing = {} if replay_only else bench_packing(spark)
        climate["end"] = climate_probe(par)
        total = replay["replay_sec"] + sum(queries.values())
        print(json.dumps({
            "metric": "cdc_replay_plus_catalog_wall",
            "value": round(total, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "replay": replay,
            "packing": packing,
            "parallelism": par,
            "climate": climate,
            "queries_reps": queries_reps,
        }))
        return 0
    finally:
        spark.stop()
        for p in owned:
            shutil.rmtree(p, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
