"""Oracle-compared correctness for the relational operator suite (sf0.001)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadith_vector_search_spark.registry import get_oracles, get_queries
from hadith_vector_search_spark.testing import compare_query

RELATIONAL = [
    "pricing_summary",
    "top_orders",
    "revenue_by_region",
    "big_spender_customers",
    "customers_without_orders",
    "segment_stats",
    "first_event_per_user",
    "daily_event_rollup",
    "event_props_rollup",
    "salted_user_rollup",
    "salted_segment_revenue",
    "event_attribution",
    "event_correlation",
    "revenue_rollup",
    "daily_event_pivot",
    "customer_value_deciles",
    "top_orders_per_segment",
    "sliding_event_rate",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_matches_oracle(spark, duck, sf_dir, name):
    queries, oracles = get_queries(), get_oracles()
    assert name in queries, f"{name} not registered"
    assert name in oracles, f"{name} has no oracle"
    problems = compare_query(spark, duck, queries[name], oracles[name], sf_dir)
    assert not problems, problems


def test_every_query_has_oracle_or_is_marked():
    queries, oracles = get_queries(), get_oracles()
    missing = set(oracles) - set(queries)
    assert not missing, f"oracles without queries: {missing}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.columns
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from hadith_vector_search_spark.operators.skew import salted_join

    # one hot key (k=1 appears 50x) + cold keys
    probe = spark.createDataFrame(
        [(1, i) for i in range(50)] + [(2, 100), (3, 200)], "k int, v int")
    build = spark.createDataFrame([(1, "hot"), (2, "a"), (3, "b")], "k int, tag string")
    got = sorted((r.k, r.v, r.tag) for r in salted_join(probe, build, "k", 4).collect())
    want = sorted((r.k, r.v, r.tag) for r in probe.join(build, "k").collect())
    assert got == want


def test_salted_aggregate_equals_plain(spark):
    from pyspark.sql import functions as F

    from hadith_vector_search_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(
        [(1, float(i)) for i in range(100)] + [(2, 7.0)], "k int, v double")
    out = {r.k: (r.n, r.s, r.lo, r.hi) for r in salted_aggregate(
        df, ["k"],
        [("count", "v", "n"), ("sum", "v", "s"), ("min", "v", "lo"), ("max", "v", "hi")],
        n_salts=4).collect()}
    assert out[1] == (100, sum(float(i) for i in range(100)), 0.0, 99.0)
    assert out[2] == (1, 7.0, 7.0, 7.0)


def test_asof_join_semantics(spark):
    """Literal-frame checks: <= tie inclusion, latest-quote selection,
    inner vs left behavior for probes with no preceding quote."""
    from hadith_vector_search_spark.operators.asof import asof_join

    probes = spark.createDataFrame(
        [(1, 100, "p1"), (1, 5, "p0"), (2, 50, "p2")],
        "k long, ts long, tag string")
    quotes = spark.createDataFrame(
        [(1, 10, 1.0), (1, 100, 2.0), (1, 120, 3.0), (2, 60, 9.0)],
        "k long, ts long, v double")

    inner = {(r.tag): r.asof for r in
             asof_join(probes, quotes, on="k", how="inner").collect()}
    # tie at ts=100 matches the equal-time quote (<= semantics)
    assert inner["p1"].v == 2.0
    # p0 precedes every quote -> dropped; p2's only quote is later -> dropped
    assert set(inner) == {"p1"}

    left = {r.tag: r.asof for r in
            asof_join(probes, quotes, on="k", how="left").collect()}
    assert set(left) == {"p0", "p1", "p2"}
    assert left["p0"] is None and left["p2"] is None
    assert left["p1"].v == 2.0


def test_event_attribution_gap_is_nonnegative(spark, sf_dir):
    from hadith_vector_search_spark.plans.relational import event_attribution

    rows = event_attribution(spark, sf_dir).collect()
    assert rows, "no error events attributed"
    assert all(r.seconds_since_click >= 0 for r in rows)
    assert all(r.click_ts <= r.ts for r in rows)


def test_range_join_buckets_equals_naive(spark):
    """Bucketed rewrite == naive inequality join, including pairs exactly
    at the tolerance boundary and across bucket edges."""
    from hadith_vector_search_spark.operators.rangejoin import range_join_buckets

    tol = 100
    left = spark.createDataFrame(
        [(1, 1000, "a"), (1, 1100, "b"), (2, 500, "c")],
        "k long, t long, ltag string")
    right = spark.createDataFrame(
        [(1, 900, "x"), (1, 1100, "y"), (1, 1201, "z"), (2, 650, "w")],
        "k long, t long, rtag string")
    got = {(r.ltag, r.rtag, r.delta_us) for r in range_join_buckets(
        left.select("k", F.col("t").alias("lt"), "ltag"),
        right.select("k", F.col("t").alias("rt"), "rtag"),
        on="k", left_ts=F.col("lt"), right_ts=F.col("rt"),
        tolerance_us=tol).collect()}
    naive = {(lr.ltag, rr.rtag, rr.t - lr.t)
             for lr in left.collect() for rr in right.collect()
             if lr.k == rr.k and abs(rr.t - lr.t) <= tol}
    assert got == naive
    assert ("a", "x", -100) in got      # exactly at -tolerance
    assert ("b", "z", 101) not in got   # just outside


def test_event_correlation_window_bound(spark, sf_dir):
    from hadith_vector_search_spark.plans.relational import (
        CORR_TOLERANCE_US,
        event_correlation,
    )

    rows = event_correlation(spark, sf_dir).collect()
    assert rows, "no correlated pairs found"
    bound = CORR_TOLERANCE_US / 1_000_000.0
    assert all(abs(r.delta_seconds) <= bound for r in rows)


def test_sliding_windows_double_count_by_design(spark, sf_dir):
    """Every event appears in exactly window/slide = 2 sliding windows, so
    the sliding total is exactly 2x the event count."""
    from hadith_vector_search_spark.plans.relational import sliding_event_rate
    from hadith_vector_search_spark.sources import load_table

    total = sum(r.n_events for r in
                sliding_event_rate(spark, sf_dir).collect())
    n = load_table(spark, sf_dir, "events").count()
    assert total == 2 * n
