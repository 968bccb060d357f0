"""Conditional MERGE on a LakeTable — copy-on-write, bucket-pruned.

Two merge shapes, matching the reference's two sink operators:

- ``merge_upsert_lww`` ≙ the conditional upsert
  ``INSERT … ON CONFLICT (key) DO UPDATE SET … WHERE excluded.seq > t.seq``
  (reference: internal/db/utils.go:74-130, condition wired at
  internal/db/contract_data.go:89-92). Equivalent to Iceberg
  ``MERGE INTO t USING b ON t.doc_id=b.doc_id
  WHEN MATCHED AND b.seq > t.seq THEN UPDATE SET *
  WHEN NOT MATCHED THEN INSERT *`` — realized as a full-outer join plus a
  copy-on-write rewrite of only the buckets the batch touches.
- ``merge_enrich`` ≙ the update-only enrichment
  ``UPDATE t SET v = b.v FROM b WHERE t.key=b.key AND (t.v IS NULL OR
  t.v < b.v)`` (internal/db/utils.go:132-170, wired at
  internal/db/ttl.go:43-50): no insert branch, unmatched source keys are
  silently dropped.

Delete semantics: the reference keeps removed rows as flagged rows with
the Pre image the change record carries (Deleted column,
internal/contract/utils.go:14-25). Our change schema carries no pre-image
(delete events have ``tokens = null``), so "take what the removed change
carries" translates to a tombstone whose payload is the event's — i.e.
deletes null the payload and set ``deleted=true``. This keeps the final
state a pure function of the event stream, independent of how the stream
is sliced into epochs. A delete for an unseen key inserts a tombstone row
(the reference likewise upserts removed entries it never saw).

Scale notes (100 TB): the join shuffles both sides on doc_id (AQE may
broadcast a small batch); the rewrite is bounded by |affected buckets| ×
bucket size, not table size. In the standalone merges the batch is
persisted because it is used twice (bucket discovery + join); the fused
path takes caller-derived buckets and references each input exactly once,
so it persists nothing (r7). Cross-epoch idempotency comes from the
strict ``b.seq > t.seq`` condition: re-applying a committed epoch changes
nothing (equal seq loses), which is what makes crash-replay safe
(≙ docs/devops.md:12's backfill-is-idempotent property).

Key contract: merge keys are non-null (the nonce filter F2 drops empty
identities at projection; registered datasets key on derived non-null
ids). Join conditions are plain ``==`` — the null-safe form would wrap
the keys in (coalesce, isnull) tuples and discard the child
aggregations' hash partitioning, re-exchanging both full-width join
sides every epoch (r7; guide §2.4).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..lake.table import BUCKET_COL, CommitConflict, LakeTable
from ..schema import OP_DELETE

# columns the base-change batch provides; any further target columns
# (schema-evolved, e.g. live_until) pass through from the target side
BATCH_VALUE_COLS = ("tokens", "n_tok", "source", "seq", "pos", "first_seq",
                    "deleted", "closed_at")

# ≙ the reference's transactional write retry: 5 attempts, linear backoff,
# rollback between attempts (internal/utils/postgres.go:9-12,39-77). Here
# "rollback" is free — a failed snapshot commit leaves only unreferenced
# data files — and the retry recomputes the merge against the refreshed
# manifest so the LWW/monotonic conditions re-resolve against the state
# the competing writer committed.
MAX_COMMIT_ATTEMPTS = 5
COMMIT_BACKOFF_SECS = 0.2


@dataclass
class MergeResult:
    version: int
    matched: int = 0
    inserted: int = 0
    updated: int = 0
    bumped: int = 0  # enrichment updates (fused merge)
    buckets: list[int] = field(default_factory=list)
    bytes_written: int = 0
    attempts: int = 1

    @property
    def rows_upserted(self) -> int:
        # ≙ rowsAffected from the reference upsert (db/utils.go:121-129)
        return self.inserted + self.updated


def _affected_buckets(table: LakeTable, batch: DataFrame,
                      key_col: str = "doc_id") -> list[int]:
    rows = (batch.select(table.bucket_expr(F.col(key_col)).alias("b"))
            .distinct().collect())
    return sorted(r["b"] for r in rows)


def _with_commit_retry(table: LakeTable, attempt_fn) -> "MergeResult":
    """Run a merge attempt; on CommitConflict (another writer won the
    snapshot race) reload the manifest and re-run, bounded attempts."""
    for attempt in range(1, MAX_COMMIT_ATTEMPTS + 1):
        try:
            res = attempt_fn()
            res.attempts = attempt
            return res
        except CommitConflict:
            if attempt == MAX_COMMIT_ATTEMPTS:
                raise
            time.sleep(COMMIT_BACKOFF_SECS * attempt)
            table.refresh()


def _obs_metrics(obs) -> dict:
    """Observation metrics with an empty-merge fallback. When every row
    of a merge resolves away at runtime (e.g. an epoch whose base events
    are all nonces and whose enrichment candidates qualify nowhere), AQE
    empty-relation propagation collapses the runtime-empty stage and the
    CollectMetrics node is optimized out of the executed plan — the JVM
    then hands ``Observation.get`` a schemaless empty row that toPyRow
    rejects with an AssertionError. The metrics are only ever read AFTER
    the write action committed, so the failure is purely metric
    retrieval, and the true metrics of an empty merge ARE zero: absent
    metrics map to {} (callers default each counter to 0)."""
    try:
        return obs.get
    except Exception:      # noqa: BLE001 — Py4J error, node optimized away
        return {}


def _b_wins():
    """LWW condition, lexicographic on (seq, pos): strictly-newer seq wins;
    an equal seq falls back to intra-seq input order — the reference keeps
    the LAST occurrence in input order (internal/utils/processor.go:100),
    and persisting pos makes that tie-break hold even when one seq's
    events straddle two epochs/micro-batches (pre-pos, the second batch's
    later-pos event lost the strict b.seq > t.seq comparison). Rows
    predating the pos column read as null → coalesce(-1) loses ties,
    matching "already-applied event re-offered later loses"."""
    t_pos = F.coalesce(F.col("t.pos"), F.lit(-1))
    b_pos = F.coalesce(F.col("b.pos"), F.lit(-1))
    return (F.col("b.seq").isNotNull()
            & (F.col("t.seq").isNull()
               | (F.col("b.seq") > F.col("t.seq"))
               | ((F.col("b.seq") == F.col("t.seq")) & (b_pos > t_pos))))


def merge_upsert_lww(spark: SparkSession, table: LakeTable,
                     batch: DataFrame, mor: bool = False) -> MergeResult:
    """Apply a deduped change batch (one row per doc_id) with LWW upsert.

    ``batch`` columns: doc_id + BATCH_VALUE_COLS + op.

    ``mor=True`` switches the commit from copy-on-write bucket rewrite to
    a merge-on-read delta append: the join keeps only batch keys (right
    join) and writes O(|batch|) resolved rows instead of rewriting every
    touched bucket in full. At 10^10 keys this is the difference between
    a ~table-sized rewrite per epoch and one proportional to the epoch.
    """
    batch = batch.persist()
    try:
        buckets = _affected_buckets(table, batch)
        if not buckets:
            return MergeResult(version=table.version)

        def attempt() -> MergeResult:
            t = table.read(spark, buckets=buckets).alias("t")
            b = batch.alias("b")
            j = t.join(b, F.col("t.doc_id") == F.col("b.doc_id"),
                       "right" if mor else "full_outer")

            b_wins = _b_wins()
            is_del = F.col("b.op") == F.lit(OP_DELETE)

            def resolve(c: str):
                if c == "deleted":
                    return (F.when(b_wins, is_del)
                            .otherwise(F.col("t.deleted")).alias(c))
                if c == "first_seq":
                    # monotone-min merge: "existed since" never moves later
                    # (least() ignores nulls)
                    return F.least(F.col("t.first_seq"),
                                   F.col("b.first_seq")).alias(c)
                return (F.when(b_wins, F.col(f"b.{c}"))
                        .otherwise(F.col(f"t.{c}")).alias(c))

            target_cols = [f.name for f in table.schema().fields]
            out_cols = [F.coalesce(F.col("t.doc_id"),
                                   F.col("b.doc_id")).alias("doc_id")]
            for c in target_cols:
                if c == "doc_id":
                    continue
                if c in BATCH_VALUE_COLS:
                    out_cols.append(resolve(c))
                else:
                    out_cols.append(F.col(f"t.{c}").alias(c))  # evolved pass-through

            obs = Observation()
            resolved = j.select(
                *out_cols,
                (F.col("t.seq").isNotNull() & F.col("b.seq").isNotNull())
                .alias("_matched"),
                (F.col("t.seq").isNull() & b_wins).alias("_inserted"),
                (F.col("t.seq").isNotNull() & b_wins).alias("_updated"),
            ).observe(
                obs,
                F.sum(F.col("_matched").cast("long")).alias("matched"),
                F.sum(F.col("_inserted").cast("long")).alias("inserted"),
                F.sum(F.col("_updated").cast("long")).alias("updated"),
            )
            final = (resolved
                     .withColumn(BUCKET_COL, table.bucket_expr(F.col("doc_id")))
                     .drop("_matched", "_inserted", "_updated"))
            if mor:
                version = table.append_delta(
                    final, buckets, summary={"op": "merge_upsert_lww"})
            else:
                version = table.overwrite_buckets(
                    final, buckets, summary={"op": "merge_upsert_lww"})
            m = _obs_metrics(obs)
            return MergeResult(version=version,
                               matched=int(m.get("matched") or 0),
                               inserted=int(m.get("inserted") or 0),
                               updated=int(m.get("updated") or 0),
                               buckets=buckets,
                               bytes_written=table.manifest["summary"]
                               .get("bytes_written", 0))

        return _with_commit_retry(table, attempt)
    finally:
        batch.unpersist()


def merge_upsert_generic(spark: SparkSession, table: LakeTable,
                         batch: DataFrame, key_col: str,
                         mor: bool = False) -> MergeResult:
    """Conditional LWW upsert into ANY keyed LakeTable (the registry's
    "upsert" merge kind — ≙ UpsertRows with a {seq, OpGT}-style condition
    on an arbitrary table/conflict column, internal/db/utils.go:74-130,
    which the reference parameterizes exactly this way: table name,
    conflict field, column list).

    ``batch`` carries the full target schema, ≤1 row per ``key_col``
    (dedup first), with ``seq``/``pos`` columns for the lexicographic
    LWW condition. Unlike merge_upsert_lww there is no tombstone /
    first_seq bookkeeping — datasets that need those semantics (the main
    token stream) use the specialized path; immutable-event datasets
    (doc_events) only need insert-or-newer-wins, which makes re-delivery
    and crash-replay idempotent the same way.
    """
    batch = batch.persist()
    try:
        buckets = _affected_buckets(table, batch, key_col=key_col)
        if not buckets:
            return MergeResult(version=table.version)

        def attempt() -> MergeResult:
            t = table.read(spark, buckets=buckets).alias("t")
            b = batch.alias("b")
            j = t.join(b, F.col(f"t.{key_col}") == F.col(f"b.{key_col}"),
                       "right" if mor else "full_outer")
            b_wins = _b_wins()
            batch_cols = set(batch.columns)
            out_cols = [F.coalesce(F.col(f"t.{key_col}"),
                                   F.col(f"b.{key_col}")).alias(key_col)]
            for c in (f.name for f in table.schema().fields):
                if c == key_col:
                    continue
                if c in batch_cols:
                    out_cols.append(F.when(b_wins, F.col(f"b.{c}"))
                                    .otherwise(F.col(f"t.{c}")).alias(c))
                else:
                    # schema-evolved column the projector doesn't emit
                    # yet: pass through the target side (null for rows
                    # the batch inserts) — same contract as the main
                    # merge's evolved pass-through
                    out_cols.append(F.col(f"t.{c}").alias(c))
            obs = Observation()
            resolved = j.select(
                *out_cols,
                (F.col("t.seq").isNotNull() & F.col("b.seq").isNotNull())
                .alias("_matched"),
                (F.col("t.seq").isNull() & b_wins).alias("_inserted"),
                (F.col("t.seq").isNotNull() & b_wins).alias("_updated"),
            ).observe(
                obs,
                F.sum(F.col("_matched").cast("long")).alias("matched"),
                F.sum(F.col("_inserted").cast("long")).alias("inserted"),
                F.sum(F.col("_updated").cast("long")).alias("updated"),
            )
            final = (resolved
                     .withColumn(BUCKET_COL,
                                 table.bucket_expr(F.col(key_col)))
                     .drop("_matched", "_inserted", "_updated"))
            if mor:
                version = table.append_delta(
                    final, buckets, summary={"op": "merge_upsert_generic"})
            else:
                version = table.overwrite_buckets(
                    final, buckets, summary={"op": "merge_upsert_generic"})
            m = _obs_metrics(obs)
            return MergeResult(version=version,
                               matched=int(m.get("matched") or 0),
                               inserted=int(m.get("inserted") or 0),
                               updated=int(m.get("updated") or 0),
                               buckets=buckets,
                               bytes_written=table.manifest["summary"]
                               .get("bytes_written", 0))

        return _with_commit_retry(table, attempt)
    finally:
        batch.unpersist()


def fused_resolved_plan(spark: SparkSession, table: LakeTable,
                        batch: DataFrame, candidates: DataFrame,
                        buckets: list[int],
                        value_col: str = "live_until"):
    """Build the fused merge's pre-write relation + Observation (shared
    by merge_upsert_and_enrich and the bench's plan-explain harness).

    r7 shape (guide §2.4 "remove shuffles outright"): ONE resolved read
    of the target and TWO equi-joins where the r6 plan had a second
    (skinny) target resolution, a candidates join and a bump join-back:

    - candidates fold per key FIRST (map-side-combined collect_list of
      (seq, value) — the enrichment stream is a small fraction of the
      epoch, so the fold is cheap and the per-key array is tiny);
    - the fold full-outer-joins the BATCH (both sides already hash-
      partitioned on doc_id by their producing aggregations — zero new
      exchange), so the candidate array rides the batch side;
    - one full-outer join against the resolved target, then the bump is
      a higher-order expression over the riding array:
      ``array_max(filter(cand, c -> c.seq >= least(t.first_seq,
      b.first_seq)).value)`` — exactly the old bump aggregation
      (max over candidates whose seq ≥ post-merge first_seq; an empty
      or all-null fold yields null = no bump), evaluated per row with
      no join. Keys present only in the candidate stream qualify
      nowhere (update-only semantics): the bump flag requires a target
      or batch row, which is what the old inner qualification join
      enforced.

    Join keys are plain ``==`` (not eqNullSafe): null keys cannot reach
    a merge — the nonce filter (F2) drops them at projection, and every
    LakeTable merge key is a non-null identity upstream — and the
    null-safe form wraps the keys in (coalesce, isnull) tuples, which
    discards the child aggregations' hash partitioning and re-exchanges
    both full-width sides per epoch (measured plan: 2 extra Exchanges).
    """
    t = table.read(spark, buckets=buckets).alias("t")
    cand_agg = (candidates.groupBy("doc_id")
                .agg(F.collect_list(
                    F.struct(F.col("seq").alias("s"),
                             F.col(value_col).alias("v"))).alias("_cand")))
    b2 = (batch.alias("bb")
          .join(cand_agg.alias("cc"),
                F.col("bb.doc_id") == F.col("cc.doc_id"), "full_outer")
          .select(F.coalesce(F.col("bb.doc_id"), F.col("cc.doc_id"))
                  .alias("_bk"),
                  *[F.col(f"bb.{c}").alias(c) for c in batch.columns
                    if c != "doc_id"],
                  F.col("_cand"))
          .alias("b"))
    j = t.join(b2, F.col("t.doc_id") == F.col("b._bk"), "full_outer")

    b_wins = _b_wins()
    is_del = F.col("b.op") == F.lit(OP_DELETE)
    exists = F.col("t.seq").isNotNull() | F.col("b.seq").isNotNull()
    fs = F.least(F.col("t.first_seq"), F.col("b.first_seq"))
    bump = F.array_max(F.transform(
        F.filter(F.col("b._cand"), lambda c: c["s"] >= fs),
        lambda c: c["v"]))
    base_v = F.col(f"t.{value_col}")
    bumped_flag = (exists & bump.isNotNull()
                   & (base_v.isNull() | (base_v < bump)))

    def resolve(c: str):
        if c == "deleted":
            return (F.when(b_wins, is_del)
                    .otherwise(F.col("t.deleted")).alias(c))
        if c == "first_seq":
            return fs.alias(c)
        if c == value_col:
            # batch never carries it; monotonic bump over the base value
            return F.when(bumped_flag, bump).otherwise(base_v).alias(c)
        if c in BATCH_VALUE_COLS:
            return (F.when(b_wins, F.col(f"b.{c}"))
                    .otherwise(F.col(f"t.{c}")).alias(c))
        return F.col(f"t.{c}").alias(c)

    target_cols = [f.name for f in table.schema().fields]
    out_cols = [F.coalesce(F.col("t.doc_id"), F.col("b._bk")).alias("doc_id")]
    out_cols += [resolve(c) for c in target_cols if c != "doc_id"]

    obs = Observation()
    resolved = j.select(
        *out_cols,
        (F.col("t.seq").isNotNull() & F.col("b.seq").isNotNull())
        .alias("_matched"),
        (F.col("t.seq").isNull() & b_wins).alias("_inserted"),
        (F.col("t.seq").isNotNull() & b_wins).alias("_updated"),
        bumped_flag.alias("_bumped"),
        (F.col("b.seq").isNotNull() | bumped_flag).alias("_touched"),
    ).observe(
        obs,
        F.sum(F.col("_matched").cast("long")).alias("matched"),
        F.sum(F.col("_inserted").cast("long")).alias("inserted"),
        F.sum(F.col("_updated").cast("long")).alias("updated"),
        F.sum(F.col("_bumped").cast("long")).alias("bumped"),
    )
    return resolved, obs


def merge_upsert_and_enrich(spark: SparkSession, table: LakeTable,
                            batch: DataFrame, candidates: DataFrame,
                            value_col: str = "live_until",
                            mor: bool = False,
                            buckets: list[int] | None = None) -> MergeResult:
    """Fused epoch merge: base LWW upsert AND monotonic enrichment
    resolved in ONE plan with ONE copy-on-write rewrite of the affected
    buckets — semantically identical to merge_upsert_lww followed by
    merge_enrich (the golden suite checks both paths), but with half the
    target reads/writes per epoch. See fused_resolved_plan for the r7
    physical shape (one target resolve, two equi-joins, bump as a
    higher-order expression).

    ``buckets``: the affected-bucket superset when the caller already
    knows it (job.apply_change_batch derives it from a column-pruned
    scan of the raw epoch — far cheaper than materializing the deduped
    batch twice). When given, batch/candidates are NOT persisted: each
    is referenced exactly once in the fused plan, so caching them costs
    a full extra materialization + cache build for zero reuse (the r6
    plan referenced the batch twice and persisted both inputs). A
    commit-conflict retry recomputes them — the rare case pays, not
    every epoch."""
    own = buckets is None
    if own:
        batch = batch.persist()
        candidates = candidates.persist()
    try:
        if own:
            b_buckets = set(_affected_buckets(table, batch))
            c_buckets = set(_affected_buckets(table, candidates))
            buckets = sorted(b_buckets | c_buckets)
        if not buckets:
            return MergeResult(version=table.version)

        def attempt() -> MergeResult:
            resolved, obs = fused_resolved_plan(
                spark, table, batch, candidates, buckets, value_col)
            if mor:
                # delta carries only the keys this epoch changed (batch
                # keys + enrichment-bumped keys); untouched rows stay in
                # the base/previous-delta files
                resolved = resolved.filter(F.col("_touched"))
            final = (resolved
                     .withColumn(BUCKET_COL, table.bucket_expr(F.col("doc_id")))
                     .drop("_matched", "_inserted", "_updated", "_bumped",
                           "_touched"))
            if mor:
                version = table.append_delta(
                    final, buckets, summary={"op": "merge_upsert_and_enrich"})
            else:
                version = table.overwrite_buckets(
                    final, buckets, summary={"op": "merge_upsert_and_enrich"})
            m = _obs_metrics(obs)
            return MergeResult(version=version,
                               matched=int(m.get("matched") or 0),
                               inserted=int(m.get("inserted") or 0),
                               updated=int(m.get("updated") or 0),
                               bumped=int(m.get("bumped") or 0),
                               buckets=buckets,
                               bytes_written=table.manifest["summary"]
                               .get("bytes_written", 0))

        return _with_commit_retry(table, attempt)
    finally:
        if own:
            batch.unpersist()
            candidates.unpersist()


def merge_enrich(spark: SparkSession, table: LakeTable, candidates: DataFrame,
                 value_col: str = "live_until",
                 mor: bool = False) -> MergeResult:
    """Update-only monotonic enrichment (≙ TTL stage).

    ``candidates`` columns: (doc_id, seq, <value_col>) — the ttl events of
    the epoch deduped per (doc_id, seq) keep-latest-pos (the reference
    dedups ttl batches on {KeyHash, LedgerSequence},
    internal/transform/ttl.go:34-36).

    Per-ledger fidelity: the reference applies ttl ledger-by-ledger with
    the monotonic condition, AFTER the base dataset of that ledger
    (internal/main.go:127-144). Over a whole epoch that in-order replay
    reduces to: for each key, take max(value) over candidates whose
    ``seq >= first_seq`` (the row existed when that ledger ran), then
    apply once under the monotonic condition. Candidates for keys absent
    from the target are silently dropped (UPDATE…FROM semantics,
    internal/db/utils.go:150-158) — realized by the inner qualification
    join from the (bucket-pruned) target side.
    """
    candidates = candidates.persist()
    try:
        buckets = _affected_buckets(table, candidates)
        if not buckets:
            return MergeResult(version=table.version)

        def attempt() -> MergeResult:
            t = table.read(spark, buckets=buckets).alias("t")

            qual = (t.select("doc_id", "first_seq")
                    .join(candidates.alias("c"), "doc_id")
                    .filter(F.col("c.seq") >= F.col("first_seq"))
                    .groupBy("doc_id")
                    .agg(F.max(value_col).alias("_bump")))

            j = t.join(qual.alias("q"),
                       F.col("t.doc_id") == F.col("q.doc_id"), "left")
            bumps = (F.col("_bump").isNotNull()
                     & (F.col(f"t.{value_col}").isNull()
                        | (F.col(f"t.{value_col}") < F.col("_bump"))))
            target_cols = [f.name for f in table.schema().fields]
            out_cols = []
            for c in target_cols:
                if c == value_col:
                    out_cols.append(F.when(bumps, F.col("_bump"))
                                    .otherwise(F.col(f"t.{c}")).alias(c))
                else:
                    out_cols.append(F.col(f"t.{c}").alias(c))

            obs = Observation()
            resolved = (j.select(*out_cols, bumps.alias("_bumped"))
                        .observe(obs, F.sum(F.col("_bumped").cast("long"))
                                 .alias("bumped")))
            if mor:
                resolved = resolved.filter(F.col("_bumped"))
            final = (resolved
                     .withColumn(BUCKET_COL, table.bucket_expr(F.col("doc_id")))
                     .drop("_bumped"))
            if mor:
                version = table.append_delta(final, buckets,
                                             summary={"op": "merge_enrich"})
            else:
                version = table.overwrite_buckets(
                    final, buckets, summary={"op": "merge_enrich"})
            m = _obs_metrics(obs)
            return MergeResult(version=version,
                               updated=int(m.get("bumped") or 0),
                               buckets=buckets,
                               bytes_written=table.manifest["summary"]
                               .get("bytes_written", 0))

        return _with_commit_retry(table, attempt)
    finally:
        candidates.unpersist()
