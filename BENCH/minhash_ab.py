"""MinHash signature-strategy A/B: grouped aggregation vs Arrow batch.

Measures minhash_candidate_pairs end-to-end (signatures -> banding ->
bucket join) at several corpus scales with both ``sig_mode`` strategies,
against a parquet corpus (so Catalyst's input-size estimate — the signal
``sig_mode="auto"`` switches on — is the real file size). Emits one JSON
line per (scale, mode) and a summary with the measured crossover; the
result sets ARROW_SIG_BYTES in functions/dedup_text.py (VERDICT r4
next-step 7: pick the strategy by input size like _choose_resolve does
for MoR resolution).

Usage:
  python BENCH/minhash_ab.py [--scales 600x80,20000x120,200000x120]
                             [--reps 3] [--vocab 30000]

Corpus: deterministic synthetic (seeded xxhash64 word ids), ~6-char
words, production entry parameters (shingle_n=3, num_perm=32,
num_bands=16, seed=7, max_bucket=200).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stellar_ledger_data_indexer_spark.functions.dedup_text import (  # noqa: E402
    _plan_input_bytes, minhash_candidate_pairs)
from stellar_ledger_data_indexer_spark.session import cores, get_spark  # noqa: E402


def synth_corpus(spark, path: str, n_docs: int, n_words: int,
                 vocab: int) -> None:
    text = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(n_words)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id") * n_words + i, F.lit(11)),
                   F.lit(vocab)).cast("string"))))
    (spark.range(n_docs)
     .repartition(max(n_docs // 20_000, 64))
     .select(F.col("id").alias("doc_id"), text.alias("text"))
     .write.mode("overwrite").parquet(path))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="600x80,20000x120,200000x120")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--vocab", type=int, default=30000)
    args = ap.parse_args()

    par = cores()
    shm = os.path.isdir("/dev/shm")
    work = (f"/dev/shm/sldi_minhash_ab_{os.getpid()}" if shm
            else f"/tmp/sldi_minhash_ab_{os.getpid()}")
    if shm and not os.environ.get("SLDI_LOCAL_DIR"):
        os.environ["SLDI_LOCAL_DIR"] = os.path.join(work, "local")
        os.makedirs(os.environ["SLDI_LOCAL_DIR"], exist_ok=True)
    # one scan partition per corpus file: default bin-packing coalesces
    # the small local files into ~2 splits, which starves the
    # shuffle-free arrow path of parallelism in a way a real corpus
    # (files >> cores) cannot — the A/B must compare the at-scale regime
    spark = get_spark(app="sldi-minhash-ab", master=f"local[{par}]",
                      shuffle_partitions=par * 2,
                      extra={"spark.ui.enabled": "false",
                             "spark.sql.files.maxPartitionBytes": "1m"})
    results = []
    try:
        # warm the Python/Arrow worker pool once so the arrow mode's
        # first timing is not process startup
        from stellar_ledger_data_indexer_spark.functions.dedup_text import \
            minhash_sig_arrow
        (spark.range(256)
         .select(minhash_sig_arrow(4, 7)(
             F.array(F.col("id"), F.col("id") + 1)))
         .count())
        for scale in args.scales.split(","):
            n_docs, n_words = (int(x) for x in scale.split("x"))
            path = os.path.join(work, f"docs_{n_docs}x{n_words}")
            synth_corpus(spark, path, n_docs, n_words, args.vocab)
            docs = spark.read.parquet(path)
            est = _plan_input_bytes(docs)
            row = {"n_docs": n_docs, "n_words": n_words,
                   "plan_input_bytes": est}
            for mode in ("grouped", "arrow"):
                best = None
                for _ in range(args.reps):
                    t0 = time.monotonic()
                    minhash_candidate_pairs(docs, sig_mode=mode).count()
                    dt = time.monotonic() - t0
                    best = dt if best is None or dt < best else best
                row[mode + "_sec"] = round(best, 3)
            row["winner"] = ("arrow" if row["arrow_sec"] < row["grouped_sec"]
                             else "grouped")
            print(json.dumps(row), flush=True)
            results.append(row)
        # crossover: smallest input-bytes estimate where arrow won
        arrow_wins = [r["plan_input_bytes"] for r in results
                      if r["winner"] == "arrow"]
        print(json.dumps({
            "summary": "minhash sig_mode A/B",
            "reps": args.reps,
            "parallelism": par,
            "crossover_bytes": min(arrow_wins) if arrow_wins else None,
            "results": results,
        }), flush=True)
        return 0
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
