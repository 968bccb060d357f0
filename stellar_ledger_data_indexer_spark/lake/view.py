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

1. ``net = base.changelog(cursor, head, mode="net")`` — O(changed rows).
2. Changed keys → touched GROUPS = pre-image groups (point-read of the
   changed keys at the *cursor* snapshot — bucket-pruned by the
   driver-side hash arithmetic in lake/xxh64.py) ∪ post-image groups
   (same point-read at head). Both sides are needed: a row moving from
   group A to B must decrement A and increment B.
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

from .table import BUCKET_COL, LakeTable
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
        base must be a bucketed keyed table (the changelog requires it)
        and ``group_col`` values must be non-null strings/ints (null
        groups are excluded, as the reference's partial indexes exclude
        their WHERE-filtered rows)."""
        base = LakeTable(base_path)
        if not base.bucket_col:
            raise ValueError("materialized views require a bucketed base "
                             "(changelog needs the key)")
        if group_col not in [f.name for f in base.schema().fields]:
            raise ValueError(f"group column {group_col!r} not in base")
        proto = MaterializedView._aggregate(
            base.read(spark).limit(0), group_col, aggs, where)
        LakeTable.create(
            path, proto.schema, bucket_col=group_col,
            num_buckets=num_buckets,
            properties={
                "mv_base": os.path.abspath(base_path),
                "mv_group": group_col,
                "mv_aggs": json.dumps(aggs),
                **({"mv_where": where} if where else {}),
                "mv_cursor": "0",
            })
        return MaterializedView(path)

    # ----------------------------------------------------------- refresh
    @staticmethod
    def _aggregate(df: DataFrame, group: str, aggs: list[list[str]],
                   where: str | None) -> DataFrame:
        if where:
            df = df.filter(F.expr(where))
        return (df.filter(F.col(group).isNotNull())
                .groupBy(group).agg(*_agg_cols(aggs)))

    def refresh(self, spark: SparkSession,
                max_inlist: int = 8192) -> dict[str, Any]:
        """Advance the view to the base's current snapshot. Idempotent and
        crash-safe: rerunning after any interruption converges (the
        cursor and data share one atomic commit). ``max_inlist`` caps the
        driver-side key/group lists; past it the same algorithm runs with
        distributed semi-joins and bucket-set pruning instead of in-list
        point reads — the result is identical."""
        t = self.table.refresh()
        props = t.properties
        base = LakeTable(props["mv_base"])
        group, aggs = props["mv_group"], json.loads(props["mv_aggs"])
        where = props.get("mv_where")
        cursor, head = int(props["mv_cursor"]), base.version
        out = {"from_snapshot": cursor, "to_snapshot": head}
        if cursor >= head:
            return {**out, "refreshed": False, "mode": "current"}
        if cursor == 0:  # initial build — the only full scan of the base
            full = self._aggregate(base.read(spark), group, aggs, where)
            v = t.overwrite_all(full, summary={"mv_refresh": "full"},
                                properties={"mv_cursor": str(head)})
            return {**out, "refreshed": True, "mode": "full",
                    "view_snapshot": v}

        key = base.bucket_col
        try:
            net = base.changelog(spark, cursor, head, mode="net")
        except ValueError as e:
            if "expired" not in str(e):
                raise
            # the cursor fell behind the base's retained history (the
            # view wasn't refreshed within its expire window) — the
            # incremental path is gone, so rebuild from current state;
            # correctness is unaffected, only this refresh pays a scan
            full = self._aggregate(base.read(spark), group, aggs, where)
            v = t.overwrite_all(full, summary={"mv_refresh": "rebuild",
                                               "mv_reason": "expired"},
                                properties={"mv_cursor": str(head)})
            return {**out, "refreshed": True, "mode": "rebuild",
                    "view_snapshot": v}
        keys = [r[0] for r in
                net.select(key).distinct().limit(max_inlist + 1).collect()]
        if not keys:
            v = t.set_properties({"mv_cursor": str(head)},
                                 summary={"mv_refresh": "noop"})
            return {**out, "refreshed": True, "mode": "noop",
                    "view_snapshot": v}
        if len(keys) <= max_inlist:
            # bucket-pruned point reads of just the changed keys, at
            # head (post-image groups) and at the cursor snapshot
            # (pre-image groups)
            post_g = base.read(spark, eq={key: keys}).select(group)
            pre_g = base.read(spark, snapshot=cursor,
                              eq={key: keys}).select(group)
        else:
            keys_df = net.select(key).distinct()
            bsel = sorted(r[0] for r in keys_df.select(
                base.bucket_expr(F.col(key)).alias("b")).distinct()
                .collect())
            post_g = (base.read(spark, buckets=bsel)
                      .join(keys_df, key, "left_semi").select(group))
            pre_g = (base.read(spark, snapshot=cursor, buckets=bsel)
                     .join(keys_df, key, "left_semi").select(group))
        groups_df = (post_g.union(pre_g)
                     .filter(F.col(group).isNotNull()).distinct())
        glist = [r[0] for r in groups_df.limit(max_inlist + 1).collect()]
        if not glist:  # every changed row had a null group — no-op view
            v = t.set_properties({"mv_cursor": str(head)},
                                 summary={"mv_refresh": "noop"})
            return {**out, "refreshed": True, "mode": "noop",
                    "view_snapshot": v}
        n_groups: int | None = len(glist)
        if len(glist) <= max_inlist:
            current = base.read(spark, eq={group: glist})
            vb = sorted({bucket_of(g, t.num_buckets) for g in glist})
            old = (t.read(spark, buckets=vb)
                   .filter(~F.col(group).isin(glist)))
        else:
            n_groups = None  # uncollected (past the driver cap)
            groups_df = groups_df.persist()
            current = base.read(spark).join(groups_df, group, "left_semi")
            vb = sorted(r[0] for r in groups_df.select(
                t.bucket_expr(F.col(group)).alias("b")).distinct()
                .collect())
            old = (t.read(spark, buckets=vb)
                   .join(groups_df, group, "left_anti"))
        re_agg = self._aggregate(current, group, aggs, where)
        new_state = (old.unionByName(re_agg)
                     .withColumn(BUCKET_COL, t.bucket_expr()))
        try:
            v = t.overwrite_buckets(
                new_state, vb,
                summary={"mv_refresh": "incremental",
                         **({"mv_groups": n_groups}
                            if n_groups is not None else {}),
                         "mv_buckets": len(vb)},
                properties={"mv_cursor": str(head)})
        finally:
            if n_groups is None:
                groups_df.unpersist()
        return {**out, "refreshed": True, "mode": "incremental",
                "groups": n_groups, "view_buckets": len(vb),
                "view_snapshot": v}
