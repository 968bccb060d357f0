"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01; compare
row count, column names, and order-insensitive values."""

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def catalog():
    import __spark_entry__ as e
    return e.queries(), e.oracle_sql()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    if isinstance(v, bool):
        return bool(v)
    return v


def _rows_to_set(cols, rows):
    return sorted(tuple(_norm(v) for _, v in sorted(zip(cols, r)))
                  for r in rows)


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 1


def test_all_queries_run(spark, catalog):
    qs, _ = catalog
    assert len(qs) >= 15
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


# every pair-producing / filtering catalog entry must return rows at the
# correctness sf — a 0 = 0 oracle comparison verifies nothing (VERDICT r1:
# ngram_jaccard_pairs passed vacuously at threshold 0.3)
NON_EMPTY = [
    "ngram_jaccard_pairs", "embedding_neardup", "minhash_pairs",
    "minhash_lsh_verified", "cosine_knn",
    "anti_join_unordered_parts", "q3_shipping_priority",
    "join_agg_shuffle", "broadcast_dim_join", "topn_orders",
    "rollup_pricing", "topk_per_group", "semi_join_heavy_parts",
    "distinct_agg_supplier", "running_total_orders",
    "sessionize_events", "asof_last_click_before_error",
    "asof_next_error_after_click",
]


def test_invariant_oracle_entries_pass(spark, catalog):
    """The r3 invariant-oracled approximate entries must report their
    invariants as True (the DuckDB side pins the count + TRUE constants;
    this guards the Spark side directly)."""
    qs, _ = catalog
    mp = qs["minhash_pairs"](spark, SF_DIR).collect()[0]
    assert mp["n_true"] > 0 and mp["covered_ok"] and mp["bands_ok"]
    ss = qs["simhash_signatures"](spark, SF_DIR).collect()[0]
    assert ss["n_fp_groups"] > 0 and ss["consistent_ok"]


def test_pair_queries_non_empty(spark, catalog):
    qs, _ = catalog
    empty = [n for n in NON_EMPTY if qs[n](spark, SF_DIR).count() == 0]
    assert not empty, f"vacuous catalog entries (0 rows at sf0.01): {empty}"


def test_recall_gates_pass(spark, catalog):
    """The self-oracled approximate entries must report recall_ok=True."""
    qs, _ = catalog
    for name in ["simhash_neardup_recall", "cosine_lsh_recall"]:
        row = qs[name](spark, SF_DIR).collect()[0]
        assert row["recall_ok"] is True, name


def test_broadcast_join_in_plan(spark, catalog):
    """broadcast_dim_join must actually broadcast the dims: the physical
    plan contains BroadcastHashJoin and no SortMergeJoin."""
    qs, _ = catalog
    plan = (qs["broadcast_dim_join"](spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filters_pushed_to_scan(spark, catalog):
    """Predicates must reach the parquet reader (PushedFilters), and
    top-N must plan as TakeOrderedAndProject, not a global sort."""
    qs, _ = catalog

    def plan_of(name):
        return (qs[name](spark, SF_DIR)
                ._jdf.queryExecution().executedPlan().toString())

    p = plan_of("range_scan")
    assert "PushedFilters" in p
    assert "GreaterThanOrEqual(event_id,1000" in p
    p = plan_of("q3_shipping_priority")
    assert "EqualTo(c_mktsegment,BUILDING)" in p
    assert "LessThan(o_orderdate" in p
    assert "GreaterThan(l_shipdate" in p
    p = plan_of("topn_orders")
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p  # no global sort stage


def test_oracle_parity(spark, ddb, catalog):
    qs, oracles = catalog
    failures = []
    for name, sql in oracles.items():
        sdf = qs[name](spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        ocur = ddb.execute(sql)
        ocols = [d[0] for d in ocur.description]
        orows = ocur.fetchall()
        if sorted(scols) != sorted(ocols):
            failures.append(f"{name}: columns {scols} vs {ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(f"{name}: rowcount {len(srows)} vs {len(orows)}")
            continue
        a = _rows_to_set(scols, srows)
        b = _rows_to_set(ocols, orows)
        if a != b:
            diff = [x for x, y in zip(a, b) if x != y][:3]
            failures.append(f"{name}: values differ, e.g. {diff}")
    assert not failures, "\n".join(failures)
