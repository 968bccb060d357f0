"""Incrementally-maintained materialized views over a LakeTable.

A view is a persisted group-by aggregate of a base table, refreshed from
the base's incremental changelog instead of recomputed from scratch —
the engine-side analog of the reference's derived/indexed consumer
tables: its backend keeps query-shaped projections of the raw ledger
tables up to date as ingest advances (the composite/partial indexes of
/root/reference/internal/db/migrations/20260211-add-additional-lab-
backend-indexes-2.sql and the post-backfill reindex upkeep of
20260225-reindex-contract-data-live-until.sql serve exactly these
read shapes), and consumers poll them by cursor (internal/db/utils.go).
Here the view IS a LakeTable, the cursor IS a table property committed
atomically with the data, and the maintenance is O(changed groups).

Refresh algorithm (general — handles deletes, group moves, and
non-distributive aggregates like min/max/count_distinct, which
delta-additive maintenance cannot):

1. ``base.changelog(cursor, head, mode="raw")`` — reads ONLY the files
   the commits in range introduced (O(changed rows), no state join;
   raw over net is deliberate — net joins against the from-state of
   every touched bucket, ≈ the whole table for any non-trivial epoch).
2. Changed keys + their post-image groups come straight off the raw
   rows; pre-image groups from a point-read of the changed keys at the
   *cursor* snapshot (bucket-pruned by the driver-side hash arithmetic
   in lake/xxh64.py). Both sides are needed: a row moving from group A
   to B must decrement A and increment B. Raw may include groups whose
   net change is nil (transient hops, LWW no-op replays) — they
   recompute to their existing values, exact and bounded.
3. Recompute the aggregate ONLY for touched groups against the current
   base (``eq={group: [...]}`` stats-pruned read, or a semi-join when
   the touched set exceeds the driver in-list cap).
4. Copy-on-write ONLY the view buckets holding touched groups: kept
   rows of those buckets minus touched groups, plus the recomputed
   rows. Groups with no surviving base rows simply don't reappear —
   deletion falls out of the rewrite.
5. The new base snapshot commits as the ``mv_cursor`` property in the
   SAME atomic manifest link as the data, so a crash anywhere leaves
   either the old state+cursor or the new state+cursor — exactly-once
   refresh with no reconciliation step, same contract as the ingest
   checkpoints.

Scale shape: steps 1-4 touch O(changed keys + changed groups) rows and
O(touched buckets) files at any table size; nothing scans the full base
after the initial build. The definition (group column + aggregate spec
+ optional WHERE) is persisted in table properties as JSON, so any
process can refresh any view without out-of-band state.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table import BUCKET_COL, CommitConflict, LakeTable
from .xxh64 import bucket_of

# aggregate spec entries are [out_name, fn, col]; every fn is recomputed
# per-group from base rows (never incrementally folded), which is what
# makes min/max/avg/count_distinct exact under deletes and updates
_AGG_FNS = {
    "count": lambda c: F.count(F.lit(1) if c == "*" else F.col(c)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "avg": lambda c: F.avg(c),
    "count_distinct": lambda c: F.count_distinct(F.col(c)),
}


def resolve_base_path(view_path: str, mv_base: str) -> str:
    """``mv_base`` is stored warehouse-relative (just the base table's
    name for the usual sibling layout), so moving or renaming the whole
    warehouse directory keeps every view working (ADVICE r5 — absolute
    paths broke refresh/inspect after a move). Resolved against the view
    table's parent directory at open time; absolute values (legacy
    manifests written before round 6) pass through unchanged."""
    if os.path.isabs(mv_base):
        return mv_base
    return os.path.normpath(
        os.path.join(os.path.dirname(os.path.abspath(view_path)), mv_base))


def _agg_cols(aggs: list[list[str]]):
    cols = []
    for out, fn, col in aggs:
        if fn not in _AGG_FNS:
            raise ValueError(f"unsupported aggregate {fn!r} "
                             f"(have {sorted(_AGG_FNS)})")
        cols.append(_AGG_FNS[fn](col).alias(out))
    return cols


class MaterializedView:
    """A LakeTable holding ``SELECT group, aggs FROM base [WHERE ...]
    GROUP BY group``, refreshed incrementally from the base changelog."""

    def __init__(self, path: str):
        self.table = LakeTable(path)
        p = self.table.properties
        if "mv_base" not in p:
            raise ValueError(f"{path} is not a materialized view "
                             f"(no mv_base property)")

    # ------------------------------------------------------------ creation
    @staticmethod
    def create(spark: SparkSession, path: str, base_path: str,
               group_col: str, aggs: list[list[str]],
               where: str | None = None,
               num_buckets: int = 16) -> "MaterializedView":
        """Define a view; the first refresh() runs the full build. ``aggs``
        is ``[[out_name, fn, col], ...]`` with fn in count/sum/min/max/
        avg/count_distinct (col "*" for count). ``where`` is an optional
        SQL predicate over base columns, applied before grouping. The
        base must be a bucketed keyed table (the changelog requires it).

        ``group_col`` is a base column name, or a DERIVED group of the
        form ``"<sql expr> AS <alias>"`` (e.g. ``"date_trunc('day', ts)
        AS day"``) — the analog of the reference's partial index on a
        derived column (internal/db/migrations/20260210-add-additional-
        lab-backend-indexes.sql). Group values must be non-null strings
        or integers (so the driver-side bucket arithmetic that places
        view rows is exact — cast/format in the expression, e.g.
        date_format, when the natural type is a timestamp); null groups
        are excluded, as partial indexes exclude their WHERE-filtered
        rows."""
        import re

        base = LakeTable(base_path)
        if not base.bucket_col:
            raise ValueError("materialized views require a bucketed base "
                             "(changelog needs the key)")
        m = re.fullmatch(r"(?is)(.+?)\s+as\s+(\w+)", group_col.strip())
        base_names = [f.name for f in base.schema().fields]
        if m:
            gexpr, group = m.group(1), m.group(2)
            if group in base_names:
                raise ValueError(
                    f"derived-group alias {group!r} collides with a base "
                    f"column — pick a fresh name")
        else:
            gexpr, group = None, group_col
            if group not in base_names:
                raise ValueError(f"group column {group!r} not in base")
        proto = MaterializedView._aggregate(
            base.read(spark).limit(0), group, aggs, where, gexpr)
        gt = proto.schema[group].dataType.typeName()
        if gt not in ("string", "long", "integer", "short", "byte"):
            raise ValueError(
                f"group values are {gt}; views need string/integer "
                f"groups (cast or date_format in the expression)")
        LakeTable.create(
            path, proto.schema, bucket_col=group,
            num_buckets=num_buckets,
            properties={
                "mv_base": os.path.relpath(
                    os.path.abspath(base_path),
                    os.path.dirname(os.path.abspath(path))),
                "mv_group": group,
                **({"mv_group_expr": gexpr} if gexpr else {}),
                "mv_aggs": json.dumps(aggs),
                **({"mv_where": where} if where else {}),
                "mv_cursor": "0",
            })
        return MaterializedView(path)

    # ----------------------------------------------------------- refresh
    @staticmethod
    def _aggregate(df: DataFrame, group: str, aggs: list[list[str]],
                   where: str | None,
                   group_expr: str | None = None) -> DataFrame:
        if where:
            df = df.filter(F.expr(where))
        if group_expr:
            df = df.withColumn(group, F.expr(group_expr))
        return (df.filter(F.col(group).isNotNull())
                .groupBy(group).agg(*_agg_cols(aggs)))

    def refresh(self, spark: SparkSession, max_inlist: int = 8192,
                retries: int = 5) -> dict[str, Any]:
        """Advance the view to the base's current snapshot. Idempotent and
        crash-safe: rerunning after any interruption converges (the
        cursor and data share one atomic commit). ``max_inlist`` caps the
        driver-side key/group lists; past it the same algorithm runs with
        distributed semi-joins and bucket-set pruning instead of in-list
        point reads — the result is identical. A concurrent writer to the
        view (e.g. an in-loop refresh racing a manual ``view-refresh``)
        surfaces as CommitConflict; the whole refresh is recomputed
        against the new head up to ``retries`` times — the merge path's
        retry-×5 contract (operators/merge._with_commit_retry)."""
        last: CommitConflict | None = None
        for _ in range(max(1, retries)):
            try:
                return self._refresh_once(spark, max_inlist)
            except CommitConflict as e:
                last = e
        raise last

    def _refresh_once(self, spark: SparkSession,
                      max_inlist: int) -> dict[str, Any]:
        t = self.table.refresh()
        props = t.properties
        base = LakeTable(resolve_base_path(t.path, props["mv_base"]))
        group, aggs = props["mv_group"], json.loads(props["mv_aggs"])
        where = props.get("mv_where")
        gexpr = props.get("mv_group_expr")
        gcol = F.expr(gexpr) if gexpr else F.col(group)
        cursor, head = int(props["mv_cursor"]), base.version
        out = {"from_snapshot": cursor, "to_snapshot": head}
        if cursor >= head:
            return {**out, "refreshed": False, "mode": "current"}

        def rebuild(mode: str, reason: str | None = None):
            full = self._aggregate(base.read(spark), group, aggs, where,
                                   gexpr)
            v = t.overwrite_all(
                full, summary={"mv_refresh": mode,
                               **({"mv_reason": reason} if reason else {})},
                properties={"mv_cursor": str(head)})
            return {**out, "refreshed": True, "mode": mode,
                    **({"reason": reason} if reason else {}),
                    "view_snapshot": v}

        if cursor == 0:  # initial build — the expected full scan
            return rebuild("full")
        key = base.bucket_col
        try:
            # RAW mode on purpose: raw changes from append/merge-delta
            # commits read ONLY the files those commits introduced —
            # O(changed rows) with no state join — while net mode joins
            # the newest changes against the from-state of every touched
            # bucket (≈ the whole table once a batch touches all
            # buckets, which any non-trivial epoch does). Raw's keys and
            # post-image groups are a SUPERSET of net's (transient
            # groups a key passed through, LWW no-op replays), and
            # recomputing a group that didn't actually change is exact —
            # just redundant — so the refresh stays correct and the
            # per-epoch cost stays proportional to the epoch.
            chg = base.changelog(spark, cursor, head, mode="raw")
        except ValueError as e:
            if "expired" not in str(e):
                raise
            # the cursor fell behind the base's retained history (the
            # view wasn't refreshed within its expire window) — the
            # incremental path is gone, so rebuild from current state;
            # correctness is unaffected, only this refresh pays a scan
            return rebuild("rebuild", "expired")
        # one pass over the raw changes collects changed keys AND their
        # post-image groups together (upsert rows ARE post-image rows; a
        # delete's non-key columns are null, so its post group drops out
        # here and its pre group is picked up below)
        pairs = chg.select(key, gcol.alias("_g")).distinct() \
            .limit(max_inlist + 1).collect()
        if not pairs:   # only no-data commits in the range
            v = t.set_properties({"mv_cursor": str(head)},
                                 summary={"mv_refresh": "noop"})
            return {**out, "refreshed": True, "mode": "noop",
                    "view_snapshot": v}
        keys = sorted({r[0] for r in pairs})
        # wide-delta auto-select: when the touched set approaches the
        # whole view (live view rows are free from manifest stats — the
        # view is CoW-only), the targeted path's joins and point reads
        # cost more than the one clean scan they avoid. Post-image
        # groups alone are a sound EARLY trigger (they're a subset of
        # the touched set), so a wide delta rebuilds before paying for
        # the pre-image read. The ≥64 floor keeps trivially small views
        # on the targeted path, where either choice is sub-second.
        total = sum(f.rows for f in t.files)

        def wide(n_touched: int) -> bool:
            return total >= 64 and n_touched >= 0.5 * total

        n_groups: int | None = None
        if len(pairs) <= max_inlist:     # the pair list is complete
            post_gs = {r["_g"] for r in pairs if r["_g"] is not None}
            if wide(len(post_gs)):
                return rebuild("rebuild", "wide-delta")
            # pre-image groups: bucket-pruned point read of the changed
            # keys at the CURSOR snapshot (lake/xxh64.py arithmetic —
            # no stats needed for a hash-distributed key); needed
            # because a row moving from group A to B must shrink A even
            # though no post-image row mentions A
            pre = base.read(spark, snapshot=cursor, eq={key: keys}) \
                .select(gcol.alias(group)).distinct().collect()
            groups = sorted(post_gs
                            | {r[0] for r in pre if r[0] is not None})
            if not groups:  # every changed row had a null group
                v = t.set_properties({"mv_cursor": str(head)},
                                     summary={"mv_refresh": "noop"})
                return {**out, "refreshed": True, "mode": "noop",
                        "view_snapshot": v}
            if wide(len(groups)):
                return rebuild("rebuild", "wide-delta")
            n_groups = len(groups)
            # recompute: for a plain column the read prunes files via
            # the harvested min/max stats (write_order/stats_columns);
            # a derived group has no stored column to prune on, so the
            # isin filter applies post-resolution only (the reference's
            # partial index materializes the expression at write — our
            # analog of that is a plain-column view over an ingest-time
            # derived column)
            current = (base.read(spark).filter(gcol.isin(groups))
                       if gexpr else base.read(spark, eq={group: groups}))
            vb = sorted({bucket_of(g, t.num_buckets) for g in groups})
            old = (t.read(spark, buckets=vb)
                   .filter(~F.col(group).isin(groups)))
        else:
            # past the driver cap: same algorithm with distributed
            # joins; the raw changes are reused three times, so persist.
            # Every exit (early rebuilds, analysis errors, the commit)
            # releases the caches — the finally owns them.
            chg = chg.persist()
            groups_df = None
            try:
                if wide(chg.select(gcol.alias(group))
                        .filter(F.col(group).isNotNull())
                        .distinct().count()):    # early: post-only
                    return rebuild("rebuild", "wide-delta")
                keys_df = chg.select(key).distinct()
                bsel = sorted(r[0] for r in keys_df.select(
                    base.bucket_expr(F.col(key)).alias("b")).distinct()
                    .collect())
                pre_g = (base.read(spark, snapshot=cursor, buckets=bsel)
                         .join(keys_df, key, "left_semi")
                         .select(gcol.alias(group)))
                groups_df = (chg.select(gcol.alias(group)).union(pre_g)
                             .filter(F.col(group).isNotNull()).distinct()
                             .persist())
                if wide(groups_df.count()):
                    return rebuild("rebuild", "wide-delta")
                cur_base = base.read(spark)
                if gexpr:
                    cur_base = cur_base.withColumn(group, gcol)
                current = cur_base.join(groups_df, group, "left_semi")
                vb = sorted(r[0] for r in groups_df.select(
                    t.bucket_expr(F.col(group)).alias("b")).distinct()
                    .collect())
                old = (t.read(spark, buckets=vb)
                       .join(groups_df, group, "left_anti"))
                re_agg = self._aggregate(current, group, aggs, where,
                                         gexpr)
                new_state = (old.unionByName(re_agg)
                             .withColumn(BUCKET_COL, t.bucket_expr()))
                v = t.overwrite_buckets(
                    new_state, vb,
                    summary={"mv_refresh": "incremental",
                             "mv_buckets": len(vb)},
                    properties={"mv_cursor": str(head)})
            finally:
                if groups_df is not None:
                    groups_df.unpersist()
                chg.unpersist()
            return {**out, "refreshed": True, "mode": "incremental",
                    "groups": None, "view_buckets": len(vb),
                    "view_snapshot": v}
        re_agg = self._aggregate(current, group, aggs, where, gexpr)
        new_state = (old.unionByName(re_agg)
                     .withColumn(BUCKET_COL, t.bucket_expr()))
        v = t.overwrite_buckets(
            new_state, vb,
            summary={"mv_refresh": "incremental", "mv_groups": n_groups,
                     "mv_buckets": len(vb)},
            properties={"mv_cursor": str(head)})
        return {**out, "refreshed": True, "mode": "incremental",
                "groups": n_groups, "view_buckets": len(vb),
                "view_snapshot": v}
