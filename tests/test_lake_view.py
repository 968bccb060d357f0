"""Materialized-view maintenance tests: full build, incremental parity
against a from-scratch recompute under updates / group moves / group
disappearance, touched-bucket-only rewrites, noop cursor advances,
crash atomicity (cursor and data share one commit), and the
semi-join fallback path past the driver in-list cap."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from stellar_ledger_data_indexer_spark.lake.table import (
    BUCKET_COL, LakeTable)
from stellar_ledger_data_indexer_spark.lake.view import MaterializedView

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("seq", T.LongType(), False),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_tok", T.LongType(), True),
])

AGGS = [["n_docs", "count", "*"], ["tok", "sum", "n_tok"],
        ["max_seq", "max", "seq"], ["uniq_tok", "count_distinct", "n_tok"]]


def mk_base(spark, path, n=60, num_buckets=8):
    t = LakeTable.create(str(path), SCHEMA, bucket_col="doc_id",
                         num_buckets=num_buckets)
    rows = [(f"doc{i}", i, f"s{i % 5}", 10 + i % 7) for i in range(n)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def apply_delta(spark, t, rows):
    """The ingest path: fully-resolved replacement rows, merge-on-read."""
    df = spark.createDataFrame(rows, SCHEMA).withColumn(
        BUCKET_COL, t.bucket_expr())
    buckets = [r[0] for r in df.select(BUCKET_COL).distinct().collect()]
    t.append_delta(df, buckets)


def expect(spark, t, where=None):
    df = t.read(spark)
    if where:
        df = df.filter(where)
    rows = (df.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("tok"),
                 F.max("seq").alias("max_seq"),
                 F.count_distinct("n_tok").alias("uniq_tok"))
            .collect())
    return {r["source"]: (r["n_docs"], r["tok"], r["max_seq"],
                          r["uniq_tok"]) for r in rows}


def got(spark, mv):
    return {r["source"]: (r["n_docs"], r["tok"], r["max_seq"],
                          r["uniq_tok"])
            for r in mv.table.refresh().read(spark).collect()}


def test_view_full_build_then_incremental_parity(spark, tmp_path):
    t = mk_base(spark, tmp_path / "base")
    mv = MaterializedView.create(
        spark, str(tmp_path / "mv"), str(tmp_path / "base"),
        "source", AGGS, num_buckets=4)
    r = mv.refresh(spark)
    assert r["mode"] == "full" and r["refreshed"]
    assert got(spark, mv) == expect(spark, t)

    # batch 1: value updates + one group MOVE (doc3 s3 → s0) — the
    # pre-image group s3 must shrink even though no post-image row
    # mentions it
    apply_delta(spark, t, [("doc3", 100, "s0", 99),
                           ("doc7", 101, "s2", 50)])
    r = mv.refresh(spark)
    assert r["mode"] == "incremental"
    # only the touched view buckets were rewritten
    assert r["view_buckets"] < mv.table.num_buckets or r["groups"] >= 3
    assert got(spark, mv) == expect(spark, t)

    # batch 2: a whole group disappears (every s4 doc moves to s1) —
    # its view row must vanish, not linger at stale counts
    s4_docs = [r["doc_id"] for r in t.read(spark)
               .filter(F.col("source") == "s4").collect()]
    apply_delta(spark, t, [(d, 200 + i, "s1", 7)
                           for i, d in enumerate(s4_docs)])
    assert mv.refresh(spark)["mode"] == "incremental"
    exp = expect(spark, t)
    assert "s4" not in exp
    assert got(spark, mv) == exp

    # batch 3: refresh across SEVERAL base commits at once
    apply_delta(spark, t, [("doc1", 300, "s1", 1)])
    apply_delta(spark, t, [("doc2", 301, "s2", 2)])
    t.compact(spark)     # no-data op interleaved in the range
    apply_delta(spark, t, [("newdoc", 302, "s9", 3)])   # brand-new group
    assert mv.refresh(spark)["mode"] == "incremental"
    assert got(spark, mv) == expect(spark, t)


def test_view_where_clause_and_noop_and_current(spark, tmp_path):
    t = mk_base(spark, tmp_path / "base")
    mv = MaterializedView.create(
        spark, str(tmp_path / "mv"), str(tmp_path / "base"),
        "source", AGGS, where="n_tok >= 12", num_buckets=4)
    mv.refresh(spark)
    assert got(spark, mv) == expect(spark, t, "n_tok >= 12")
    # already at head → no commit at all
    v = mv.table.refresh().version
    r = mv.refresh(spark)
    assert not r["refreshed"] and r["mode"] == "current"
    assert mv.table.refresh().version == v
    # replaying IDENTICAL rows (the crash-resume shape): raw changelog
    # surfaces them, their groups recompute to the same values — exact
    rows = [tuple(r) for r in t.read(spark).limit(3).collect()]
    apply_delta(spark, t, rows)
    r = mv.refresh(spark)
    assert r["mode"] == "incremental"
    assert got(spark, mv) == expect(spark, t, "n_tok >= 12")
    # a range holding only no-data commits is a cursor-only advance
    t.compact(spark)
    assert mv.refresh(spark)["mode"] == "noop"
    # a doc dropping BELOW the where threshold leaves its group's row
    # recomputed without it
    vic = t.read(spark).filter("n_tok >= 12").limit(1).collect()[0]
    apply_delta(spark, t, [(vic["doc_id"], 400, vic["source"], 1)])
    assert mv.refresh(spark)["mode"] == "incremental"
    assert got(spark, mv) == expect(spark, t, "n_tok >= 12")


def test_view_crash_before_commit_is_invisible(spark, tmp_path,
                                               monkeypatch):
    """A refresh that dies after planning/writing but BEFORE the manifest
    link leaves the view exactly as it was (state AND cursor — they
    travel in one commit); the retry converges."""
    t = mk_base(spark, tmp_path / "base")
    mv = MaterializedView.create(
        spark, str(tmp_path / "mv"), str(tmp_path / "base"),
        "source", AGGS, num_buckets=4)
    mv.refresh(spark)
    before = got(spark, mv)
    head_at_build = t.refresh().version
    apply_delta(spark, t, [("doc5", 500, "s1", 42)])

    real = LakeTable._commit

    def boom(self, *a, **k):
        raise RuntimeError("crash before manifest link")
    monkeypatch.setattr(LakeTable, "_commit", boom)
    with pytest.raises(RuntimeError, match="crash"):
        mv.refresh(spark)
    monkeypatch.setattr(LakeTable, "_commit", real)
    assert got(spark, mv) == before            # nothing visible
    assert mv.table.refresh().properties["mv_cursor"] == str(head_at_build)
    r = mv.refresh(spark)                      # retry converges
    assert r["refreshed"] and r["mode"] == "incremental"
    assert got(spark, mv) == expect(spark, t)


def test_view_semi_join_fallback_parity(spark, tmp_path):
    """max_inlist=1 forces the distributed path (semi-join recompute,
    anti-join keep-set, bucket sets collected from DataFrames) on data
    small enough to check by hand — identical result to the point path."""
    t = mk_base(spark, tmp_path / "base")
    mv = MaterializedView.create(
        spark, str(tmp_path / "mv"), str(tmp_path / "base"),
        "source", AGGS, num_buckets=4)
    mv.refresh(spark)
    apply_delta(spark, t, [("doc3", 100, "s0", 99),
                           ("doc8", 101, "s9", 1),
                           ("doc11", 102, "s1", 3)])
    r = mv.refresh(spark, max_inlist=1)
    assert r["mode"] == "incremental" and r["groups"] is None
    assert got(spark, mv) == expect(spark, t)


def test_view_rejects_bad_definitions(spark, tmp_path):
    t = mk_base(spark, tmp_path / "base")
    with pytest.raises(ValueError, match="not in base"):
        MaterializedView.create(spark, str(tmp_path / "mv1"),
                                str(tmp_path / "base"), "nope", AGGS)
    with pytest.raises(ValueError, match="unsupported aggregate"):
        MaterializedView.create(spark, str(tmp_path / "mv2"),
                                str(tmp_path / "base"), "source",
                                [["x", "median", "n_tok"]])
    LakeTable.create(str(tmp_path / "flat"), SCHEMA)
    with pytest.raises(ValueError, match="bucketed base"):
        MaterializedView.create(spark, str(tmp_path / "mv3"),
                                str(tmp_path / "flat"), "source", AGGS)
    with pytest.raises(ValueError, match="not a materialized view"):
        MaterializedView(str(tmp_path / "base"))
    assert t.version >= 2


def test_view_rebuild_when_cursor_history_expired(spark, tmp_path):
    """A view left unrefreshed past the base's snapshot-expiry window
    loses its incremental path (the changelog needs the contiguous
    manifest chain) — refresh must fall back to a full rebuild, not
    raise, and land the exact current aggregate."""
    t = mk_base(spark, tmp_path / "base")
    mv = MaterializedView.create(
        spark, str(tmp_path / "mv"), str(tmp_path / "base"),
        "source", AGGS, num_buckets=4)
    mv.refresh(spark)
    for i in range(3):
        apply_delta(spark, t, [(f"doc{i}", 900 + i, "s1", 5)])
    t.expire_snapshots(keep_last=1)
    r = mv.refresh(spark)
    assert r["mode"] == "rebuild" and r["refreshed"]
    assert got(spark, mv) == expect(spark, t)
    # and the cursor is usable again afterwards: next change refreshes
    # incrementally
    apply_delta(spark, t, [("doc9", 950, "s2", 6)])
    assert mv.refresh(spark)["mode"] == "incremental"
    assert got(spark, mv) == expect(spark, t)


def test_view_wide_delta_switches_to_rebuild(spark, tmp_path):
    """A delta touching most of the view's groups makes the targeted
    path pure overhead — refresh auto-selects a clean rebuild (same
    pick-by-size pattern as the MoR resolve and minhash sig_mode
    auto-selects) and stays exact."""
    t = LakeTable.create(str(tmp_path / "base"), SCHEMA,
                         bucket_col="doc_id", num_buckets=8)
    rows = [(f"doc{i}", i, f"s{i % 100}", 10 + i % 7) for i in range(400)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    mv = MaterializedView.create(
        spark, str(tmp_path / "mv"), str(tmp_path / "base"),
        "source", AGGS, num_buckets=4)
    mv.refresh(spark)
    # touch 90 of the 100 groups in one batch
    apply_delta(spark, t, [(f"doc{i}", 1000 + i, f"s{i % 90}", 1)
                           for i in range(180)])
    r = mv.refresh(spark)
    assert r["mode"] == "rebuild" and r["reason"] == "wide-delta"
    assert got(spark, mv) == expect(spark, t)
    # a narrow follow-up goes back to the targeted path
    apply_delta(spark, t, [("doc0", 5000, "s0", 2)])
    assert mv.refresh(spark)["mode"] == "incremental"
    assert got(spark, mv) == expect(spark, t)


def test_view_derived_expression_group(spark, tmp_path):
    """Views can group by a SQL expression ("<expr> AS alias") — the
    analog of the reference's partial index on a derived column. Full
    build and incremental refresh (including a doc whose derived group
    MOVES) must match a from-scratch GROUP BY over the expression;
    collisions and unhashable group types are rejected at create."""
    t = mk_base(spark, tmp_path / "base")
    gx = "concat('g', CAST(n_tok % 4 AS STRING))"
    mv = MaterializedView.create(
        spark, str(tmp_path / "mv"), str(tmp_path / "base"),
        f"{gx} AS quad", [["n", "count", "*"], ["tok", "sum", "n_tok"]],
        num_buckets=4)

    def exp():
        return {r["quad"]: (r["n"], r["tok"]) for r in
                t.read(spark).groupBy(F.expr(gx).alias("quad"))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("n_tok").alias("tok")).collect()}

    def cur():
        return {r["quad"]: (r["n"], r["tok"]) for r in
                mv.table.refresh().read(spark).collect()}
    assert mv.refresh(spark)["mode"] == "full"
    assert cur() == exp()
    # doc10 had n_tok=13 (quad g1) → 16 (quad g0): both derived groups
    # must move; doc0 changes value within its group
    apply_delta(spark, t, [("doc10", 500, "s0", 16),
                           ("doc0", 501, "s0", 14)])
    r = mv.refresh(spark)
    assert r["mode"] == "incremental"
    assert cur() == exp()
    # distributed fallback path, same data
    apply_delta(spark, t, [("doc11", 600, "s1", 27)])
    assert mv.refresh(spark, max_inlist=1)["mode"] == "incremental"
    assert cur() == exp()
    with pytest.raises(ValueError, match="collides"):
        MaterializedView.create(spark, str(tmp_path / "mv2"),
                                str(tmp_path / "base"),
                                f"{gx} AS n_tok", [["n", "count", "*"]])
    with pytest.raises(ValueError, match="string/integer"):
        MaterializedView.create(spark, str(tmp_path / "mv3"),
                                str(tmp_path / "base"),
                                "CAST(n_tok AS DOUBLE) AS d",
                                [["n", "count", "*"]])


def test_view_refresh_retries_on_commit_conflict(spark, tmp_path,
                                                 monkeypatch):
    """A concurrent view writer surfaces as CommitConflict at the
    manifest link; refresh recomputes against the refreshed head and
    retries (merge-path retry-x5 contract). retries=1 propagates."""
    from stellar_ledger_data_indexer_spark.lake.table import CommitConflict
    t = mk_base(spark, tmp_path / "base")
    mv = MaterializedView.create(
        spark, str(tmp_path / "mv"), str(tmp_path / "base"),
        "source", AGGS, num_buckets=4)
    mv.refresh(spark)
    apply_delta(spark, t, [("doc5", 500, "s1", 42)])

    real = LakeTable._write_manifest
    calls = {"n": 0}

    def flaky(path, manifest):
        if calls["n"] <= 0:
            calls["n"] += 1
            raise CommitConflict("simulated concurrent commit")
        return real(path, manifest)
    monkeypatch.setattr(LakeTable, "_write_manifest", staticmethod(flaky))
    r = mv.refresh(spark)
    assert r["refreshed"] and calls["n"] == 1
    assert got(spark, mv) == expect(spark, t)

    apply_delta(spark, t, [("doc6", 501, "s2", 43)])
    calls["n"] = -10**9          # conflict on every attempt
    with pytest.raises(CommitConflict):
        mv.refresh(spark, retries=1)


def test_views_compose_view_over_view(spark, tmp_path):
    """A view IS a bucketed LakeTable, so a second-level view can use it
    as base: its CoW refresh commits changelog as keyed diffs of the
    rewritten buckets (including DELETE rows when a group vanishes), and
    the downstream view consumes them like any CDC feed. Chain: docs →
    per-source aggregates → size-class rollup; both stay exact through
    incremental refreshes."""
    t = mk_base(spark, tmp_path / "base", n=80)
    v1 = MaterializedView.create(
        spark, str(tmp_path / "v1"), str(tmp_path / "base"),
        "source", [["n_docs", "count", "*"], ["tok", "sum", "n_tok"]],
        num_buckets=4)
    v2 = MaterializedView.create(
        spark, str(tmp_path / "v2"), str(tmp_path / "v1"),
        "CASE WHEN n_docs >= 16 THEN 'big' ELSE 'small' END AS size_class",
        [["n_groups", "count", "*"], ["tok", "sum", "tok"]],
        num_buckets=2)
    v1.refresh(spark)
    v2.refresh(spark)

    def expect2():
        return {r["size_class"]: (r["n_groups"], r["tok"]) for r in
                v1.table.refresh().read(spark)
                .groupBy(F.expr("CASE WHEN n_docs >= 16 THEN 'big' ELSE "
                                "'small' END").alias("size_class"))
                .agg(F.count(F.lit(1)).alias("n_groups"),
                     F.sum("tok").alias("tok")).collect()}

    def got2():
        return {r["size_class"]: (r["n_groups"], r["tok"])
                for r in v2.table.refresh().read(spark).collect()}
    assert got2() == expect2()
    # move docs around: s4 shrinks (may cross the size boundary), s1
    # grows; refresh the chain and both levels stay exact
    apply_delta(spark, t, [(f"doc{i}", 900 + i, "s1", 5)
                           for i in (4, 9, 14, 19, 24)])
    assert v1.refresh(spark)["refreshed"]
    r2 = v2.refresh(spark)
    assert r2["refreshed"] and r2["mode"] in ("incremental", "rebuild")
    assert got2() == expect2()
    assert {r["source"]: (r["n_docs"], r["tok"])
            for r in v1.table.refresh().read(spark).collect()} == \
        {r["source"]: (r["n"], r["tok"]) for r in
         t.read(spark).groupBy("source")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("n_tok").alias("tok")).collect()}


def test_view_reflects_purged_rows(spark, tmp_path):
    """Retention purges (delete_where) surface to views through the
    changelog's delete rows: purged docs leave their groups' aggregates,
    and a fully-purged group's view row vanishes."""
    t = mk_base(spark, tmp_path / "base")
    mv = MaterializedView.create(
        spark, str(tmp_path / "mv"), str(tmp_path / "base"),
        "source", AGGS, num_buckets=4)
    mv.refresh(spark)
    res = t.delete_where(spark, "source = 's2' OR n_tok >= 15")
    assert res["deleted_rows"] > 0
    r = mv.refresh(spark)
    assert r["refreshed"]
    exp = expect(spark, t)
    assert "s2" not in exp
    assert got(spark, mv) == exp


def test_view_integer_group_and_warehouse_move(spark, tmp_path):
    """ADVICE r5 (high + low): (a) an INTEGER-typed group column used to
    compute wrong view buckets because the driver hash took the 8-byte
    path while the JVM took the 4-byte int path — with bucket_expr's
    narrow-int cast an int-group view now refreshes incrementally to
    exact parity; (b) mv_base is stored warehouse-relative, so moving /
    renaming the whole warehouse directory must keep refresh working."""
    import shutil

    ISCHEMA = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("grp", T.IntegerType(), True),
        T.StructField("n_tok", T.LongType(), True),
    ])
    wh = tmp_path / "wh1"
    wh.mkdir()
    t = LakeTable.create(str(wh / "base"), ISCHEMA, bucket_col="doc_id",
                         num_buckets=8)
    rows = [(f"doc{i}", i, i % 23, 10 + i % 7) for i in range(200)]
    t.append(spark.createDataFrame(rows, ISCHEMA))
    mv = MaterializedView.create(
        spark, str(wh / "v_grp"), str(wh / "base"), "grp",
        [["n", "count", "*"], ["tok", "sum", "n_tok"]])
    mv.refresh(spark)

    def expect_int(tbl):
        return {r["grp"]: (r["n"], r["tok"]) for r in
                tbl.read(spark).groupBy("grp")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("n_tok").alias("tok")).collect()}

    def got_int(view):
        return {r["grp"]: (r["n"], r["tok"]) for r in
                view.table.refresh().read(spark).collect()}
    assert got_int(mv) == expect_int(t)
    # group move through the incremental path (int pre+post groups both
    # need the driver bucket arithmetic to hit the right view buckets)
    df = spark.createDataFrame([("doc3", 1000, 7, 99)], ISCHEMA) \
        .withColumn(BUCKET_COL, t.bucket_expr())
    bs = [r[0] for r in df.select(BUCKET_COL).distinct().collect()]
    t.append_delta(df, bs)
    res = mv.refresh(spark)
    assert res["mode"] == "incremental"
    assert got_int(mv) == expect_int(t)

    # move the whole warehouse; the view must still resolve its base
    wh2 = tmp_path / "relocated"
    shutil.move(str(wh), str(wh2))
    t2 = LakeTable(str(wh2 / "base"))
    df2 = spark.createDataFrame([("doc4", 2000, 11, 42)], ISCHEMA) \
        .withColumn(BUCKET_COL, t2.bucket_expr())
    bs2 = [r[0] for r in df2.select(BUCKET_COL).distinct().collect()]
    t2.append_delta(df2, bs2)
    mv2 = MaterializedView(str(wh2 / "v_grp"))
    res2 = mv2.refresh(spark)
    assert res2["refreshed"] and res2["mode"] == "incremental"
    assert got_int(mv2) == expect_int(t2)
