"""Relational operator suite over the TPC-H-ish test tables.

Each query is one operator family from SURVEY §2 expressed in its idiomatic
Spark shape; every computed column is aliased so the DuckDB oracle
(`hadith_vector_search_spark.oracles`) produces byte-identical column names.

Scale notes (100 TB design point):
- Aggregations are plain ``groupBy().agg()`` — Spark performs partial
  (map-side) aggregation automatically, so the shuffle carries one row per
  (partition, group), not per input row.
- Dimension joins (`nation`, `region`, `customer` at small SF) are explicit
  ``broadcast()`` hints; at real scale AQE would also auto-convert when the
  build side is under the threshold.
- Top-k is ``orderBy().limit(k)`` which Catalyst executes as
  TakeOrderedAndProject: per-partition heap of k rows, no global sort.
- Floating aggregates are rounded in BOTH engines so the value-hash compare
  is robust to summation-order differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the per-book ingestion roll-up A4/A5 generalized
    (SURVEY §2.4; ref /root/reference/mcp_server/apps/ingestion.py:129-158).

    Single shuffle on a 6-value grouping key; partial aggregation makes the
    shuffle payload O(groups), safe at any SF.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (SURVEY §2.5 T1-T3): TakeOrderedAndProject, deterministic
    tie-break on the unique key (SURVEY §5 determinism guard)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way dimension join (SURVEY §2.3 J3/J4 broadcast lookups).
    Broadcast hints are reserved for the FIXED-SIZE dims (nation/region —
    25/5 rows at any SF): orders and customer scale with the corpus, so
    forcing them broadcast would be wrong at 100 TB (and measurably slower
    than AQE's choice already at sf0.1 — AQE still converts them to
    broadcasts when their post-pruning size fits, and falls back to a
    shuffle join when it doesn't)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def big_spender_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (SURVEY §2.2 P2: doc_id IN (...) batch lookup).
    Semi-join never widens rows — at scale the orders side is pre-filtered
    before the shuffle, and no customer row is duplicated."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 400000.0).select("o_custkey")
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (SURVEY §2.2 P4: the checksum-skip incremental filter
    /root/reference/mcp_server/apps/fts.py:141-145 is exactly this shape).
    The price filter is applied to the right side BEFORE the join — pushed
    below the shuffle, so at scale the anti-join probe side shrinks first."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000.0).select("o_custkey")
    return (
        cust.join(big, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


def segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count aggregation (SURVEY §2.4 A2/A3: unique narrators per
    book). countDistinct is exact here; at 100 TB the drop-in scale path is
    approx_count_distinct (HLL sketch, no exact-distinct shuffle)."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.countDistinct("c_nationkey").alias("nation_count"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


def first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window dedup (SURVEY §2.6 D1: keep best-ranked row per key).
    row_number over (user) — single hash-partitioned window, deterministic
    tie-break by (ts, event_id)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


def salted_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof per-user event totals: two-phase salted aggregation whose
    result is IDENTICAL to the plain groupBy (the oracle is the plain SQL)
    while the hot user's rows spread over 8 reducers in phase 1."""
    from ..operators.skew import salted_aggregate

    events = load_table(spark, sf_dir, "events")
    out = salted_aggregate(
        events.select("user_id", "value"), ["user_id"],
        [("count", "value", "event_count"), ("sum", "value", "_sv"),
         ("min", "value", "min_value"), ("max", "value", "max_value")])
    return out.select("user_id", "event_count",
                      F.round(F.col("_sv"), 4).alias("sum_value"),
                      "min_value", "max_value")


def salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof orders↔customer join (salted probe, replicated build)
    feeding a per-segment rollup; row-identical to the plain join."""
    from ..operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment")
    joined = salted_join(orders, cust, "custkey", n_salts=8)
    return (joined.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("order_count"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


def event_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24: JSON field extraction from the semi-structured `props` column
    (get_json_object stays JVM-side; no schema inference pass over the
    corpus), bucketed aggregation over the extracted key."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select(F.pmod(k, F.lit(10)).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("event_count"),
             F.round(F.avg("value"), 4).alias("avg_value"))
    )


def daily_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation (tumbling-window batch analogue of the
    streaming rollup in SURVEY §2.11): date_trunc keeps the expression
    JVM-side and pushdown-friendly."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("day", F.to_date(F.col("ts")))
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
    )


def event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of attribution: each 'error' event joined to the LATEST preceding
    'click' of the same user (`operators.asof.asof_join` — union-tag +
    running window, one shuffle, no range-join row explosion).

    The click side is deduped to one row per (user, ts) first — with
    duplicate quote timestamps the "latest preceding quote" is otherwise
    ambiguous in ANY as-of implementation (DuckDB's native ASOF JOIN picks
    arbitrarily too). The gap is computed on integer microseconds
    (unix_micros), not timestamp→double casts, which lose sub-µs precision
    at epoch magnitudes."""
    from pyspark.sql import Window

    from ..operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    errors = (events.filter(F.col("event_type") == "error")
              .select("event_id", "user_id", "ts"))
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    clicks = (events.filter(F.col("event_type") == "click")
              .select("user_id", "ts", "event_id")
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))
    j = asof_join(errors, clicks, on="user_id")
    gap = (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof.ts"))) \
        / F.lit(1000000.0)
    return j.select(
        "event_id", "user_id", "ts",
        F.col("asof.event_id").alias("click_event_id"),
        F.col("asof.ts").alias("click_ts"),
        F.round(gap, 6).alias("seconds_since_click"))


CORR_TOLERANCE_US = 300_000_000  # ± 5 minutes


def event_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval correlation: every (error, click) pair of the same user
    within ±5 minutes, via `operators.rangejoin.range_join_buckets` — the
    band predicate joins as part of the key (3x replication), not as a
    post-join filter over the per-user cross product. The oracle runs the
    naive inequality join, checking the bucketed rewrite against the
    direct semantics."""
    from ..operators.rangejoin import range_join_buckets

    events = load_table(spark, sf_dir, "events")
    errors = (events.filter(F.col("event_type") == "error")
              .select("event_id", "user_id", "ts"))
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_event_id"),
                      "user_id", F.col("ts").alias("click_ts")))
    j = range_join_buckets(
        errors, clicks, on="user_id",
        left_ts=F.unix_micros(F.col("ts")),
        right_ts=F.unix_micros(F.col("click_ts")),
        tolerance_us=CORR_TOLERANCE_US)
    return j.select(
        "event_id", "user_id", "ts", "click_event_id",
        F.round(F.col("delta_us") / F.lit(1000000.0), 6).alias("delta_seconds"))


# ---------------------------------------------------------------------------
# OLAP surfaces: ROLLUP, PIVOT, NTILE (round 5)
# ---------------------------------------------------------------------------


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (segment → orderstatus → grand
    total): one Expand-based aggregate — Catalyst plans grouping sets as
    a single pass with map-side partials, not one scan per level.
    Subtotal rows are labelled 'ALL' via the GROUPING() indicator, not by
    coalescing NULL keys — a genuine NULL c_mktsegment/o_orderstatus value
    in the data would otherwise be conflated with the subtotal row."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (joined.rollup("c_mktsegment", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                 F.grouping("c_mktsegment").alias("_g_seg"),
                 F.grouping("o_orderstatus").alias("_g_st"))
            .select(F.when(F.col("_g_seg") == 1, F.lit("ALL"))
                    .otherwise(F.col("c_mktsegment")).alias("segment"),
                    F.when(F.col("_g_st") == 1, F.lit("ALL"))
                    .otherwise(F.col("o_orderstatus")).alias("status"),
                    "n_orders", "revenue"))


def revenue_rollup_oracle() -> str:
    return """
SELECT CASE WHEN GROUPING(c_mktsegment) = 1 THEN 'ALL'
            ELSE c_mktsegment END AS segment,
       CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
            ELSE o_orderstatus END AS status,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
"""


_PIVOT_TYPES = ("view", "click", "purchase", "signup", "error")


def daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide daily activity table: one row per day, one column per event
    type. The pivot values are DECLARED (`pivot(col, values)`), so Spark
    skips the extra distinct-scan job and plans a single aggregate whose
    shuffle carries days × types cells."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.to_date("ts").alias("day"))
            .pivot("event_type", list(_PIVOT_TYPES))
            .agg(F.count(F.lit(1)))
            .na.fill(0, list(_PIVOT_TYPES)))


def daily_event_pivot_oracle() -> str:
    cols = ",\n       ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS \"{t}\"" for t in _PIVOT_TYPES)
    return f"""
SELECT CAST(ts AS DATE) AS day,
       {cols}
FROM events
GROUP BY 1
"""


_N_DECILES = 10


def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value decile table: rank customers by lifetime spend with
    ntile(10) (deterministic tie-break on custkey), then per-decile
    count / bounds / share. The spend aggregate shuffles on custkey; the
    ntile is ONE global sort of the ~customer-count aggregate (not the
    orders fact), and the final roll-up is 10 groups."""
    orders = load_table(spark, sf_dir, "orders")
    spend = (orders.groupBy("o_custkey")
             .agg(F.round(F.sum("o_totalprice"), 2).alias("spend")))
    w = Window.orderBy(F.desc("spend"), F.asc("o_custkey"))
    tiled = spend.withColumn("decile", F.ntile(_N_DECILES).over(w))
    total = tiled.agg(F.sum("spend").alias("t")).select("t")
    return (tiled.crossJoin(F.broadcast(total))
            .groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.min("spend"), 2).alias("min_spend"),
                 F.round(F.max("spend"), 2).alias("max_spend"),
                 F.round(F.sum("spend") / F.max("t"), 6)
                 .alias("revenue_share")))


def customer_value_deciles_oracle() -> str:
    return f"""
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
  FROM orders GROUP BY 1
),
tiled AS (
  SELECT o_custkey, spend,
         ntile({_N_DECILES}) OVER (ORDER BY spend DESC, o_custkey ASC)
             AS decile
  FROM spend
),
total AS (SELECT sum(spend) AS t FROM spend)
SELECT decile,
       count(*) AS n_customers,
       round(min(spend), 2) AS min_spend,
       round(max(spend), 2) AS max_spend,
       round(sum(spend) / max(t.t), 6) AS revenue_share
FROM tiled CROSS JOIN total t
GROUP BY decile
"""


TOP_PER_SEGMENT_N = 3


def top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N-per-group, the other canonical window shape next to
    keep-first (`first_event_per_user`): the 3 largest orders per market
    segment. One hash exchange on the group key; rank + filter fuse into
    the window operator — never a global sort, never a per-group
    sub-query."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_PER_SEGMENT_N)
            .select("c_mktsegment", "rank", "o_orderkey",
                    F.round("o_totalprice", 2).alias("o_totalprice")))


def top_orders_per_segment_oracle() -> str:
    return f"""
SELECT c_mktsegment, CAST(rank AS INTEGER) AS rank, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey ASC)
             AS rank
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
WHERE rank <= {TOP_PER_SEGMENT_N}
"""


SLIDE_WINDOW = "2 hours"
SLIDE_STEP = "1 hour"


def sliding_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING event-time windows (2 h window, 1 h slide) — the window
    type tumbling rollups and RANGE frames don't cover: each event lands in
    window_size/slide overlapping windows, which `F.window` expands
    in-place (a 2-row generate per event here), then one partial agg on
    (window, event_type). The oracle replays the expansion with a
    generate_series range join."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", SLIDE_WINDOW, SLIDE_STEP).alias("w"),
                       "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def sliding_event_rate_oracle() -> str:
    return """
WITH expanded AS (
  SELECT e.event_type, e.value, w.window_start
  FROM events e,
       LATERAL (
         SELECT time_bucket(INTERVAL 1 HOUR, e.ts)
                  - INTERVAL 1 HOUR * g.x AS window_start
         FROM (SELECT unnest(range(0, 2)) AS x) g
       ) w
)
SELECT window_start, event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM expanded
GROUP BY 1, 2
"""
