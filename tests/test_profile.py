"""Profiling / sketch-bound / sampling / window / packing family:
oracle-compared at sf0.001 plus unit tests on the operator invariants
(sketch bounds honestly checkable, sample determinism, session boundary
semantics, next-fit packing feasibility)."""

from __future__ import annotations

import datetime as dt

import pytest

from hadith_vector_search_spark.plans import profile
from hadith_vector_search_spark.registry import get_oracles, get_queries
from hadith_vector_search_spark.testing import compare_query

ORACLE_CHECKED = [
    "table_profile",
    "approx_distinct_bounds",
    "approx_quantile_bounds",
    "stratified_sample",
    "user_sessions_batch",
    "rolling_event_rate",
    "greedy_pack_assignments",
    "order_value_outliers",
    "adaptive_length_filter",
    "source_embedding_drift",
    "order_price_histogram",
    "frequent_terms_bound",
    "cumulative_users",
    "retention_cohorts",
    "event_funnel",
    "length_psi_drift",
    "decayed_user_value",
    "epoch_plan",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_matches_oracle(spark, duck, sf_dir, name):
    queries, oracles = get_queries(), get_oracles()
    assert name in queries and name in oracles
    problems = compare_query(spark, duck, queries[name], oracles[name], sf_dir)
    assert not problems, problems


def test_sketch_bounds_actually_hold(spark, sf_dir):
    """within_bounds must be computed, not hard-coded: every row TRUE on
    real data, and the exact counts are positive."""
    rows = profile.approx_distinct_bounds(spark, sf_dir).collect()
    assert len(rows) == 3
    assert all(r.within_bounds for r in rows)
    assert all(r.exact_distinct > 0 for r in rows)
    qrows = profile.approx_quantile_bounds(spark, sf_dir).collect()
    assert len(qrows) == 4
    assert all(r.within_bounds for r in qrows)


def test_stratified_sample_rate_and_determinism(spark, sf_dir):
    a = {r.c_mktsegment: r for r in
         profile.stratified_sample(spark, sf_dir).collect()}
    b = {r.c_mktsegment: r for r in
         profile.stratified_sample(spark, sf_dir).collect()}
    assert a.keys() == b.keys()
    for seg, r in a.items():
        assert r.n_sampled == b[seg].n_sampled          # rerun-stable
        assert r.sampled_acctbal == b[seg].sampled_acctbal
        assert 0 <= r.n_sampled <= r.n_total
    total = sum(r.n_total for r in a.values())
    sampled = sum(r.n_sampled for r in a.values())
    assert 0.02 < sampled / total < 0.25                # ~10% expected


def test_session_boundary_semantics(spark):
    """Events exactly 30 min apart start a new session; 29:59 does not."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 10, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=29, seconds=59), 10, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=59, seconds=59), 10, "click", 1.0, "{}"),
        (4, t0 + dt.timedelta(minutes=95), 10, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    orig = profile.load_table
    try:
        profile.load_table = lambda _s, _d, name: df  # noqa: ARG005
        out = sorted(profile.user_sessions_batch(spark, "ignored").collect(),
                     key=lambda r: r.session_idx)
    finally:
        profile.load_table = orig
    # events 1+2 share a session (gap 29:59 < 30m); 3 is 30:00 after 2 ->
    # new session; 4 is 35:01 after 3 -> new session.
    assert [r.n_events for r in out] == [2, 1, 1]


def test_rolling_window_is_trailing_inclusive(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0 - dt.timedelta(hours=2), 7, "click", 1.0, "{}"),
        (2, t0 - dt.timedelta(minutes=60), 7, "click", 2.0, "{}"),  # exactly 1h before
        (3, t0, 7, "click", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    orig = profile.load_table
    try:
        profile.load_table = lambda _s, _d, name: df  # noqa: ARG005
        out = {r.event_id: r for r in
               profile.rolling_event_rate(spark, "ignored").collect()}
    finally:
        profile.load_table = orig
    assert out[1].n_events_1h == 1
    assert out[2].n_events_1h == 2      # event 1 is exactly 1h back: inclusive
    assert out[3].n_events_1h == 2      # event 2 in range, event 1 (2h) out
    assert out[3].value_1h == 6.0


def test_next_fit_packing_is_feasible_and_exhaustive(spark, sf_dir):
    from hadith_vector_search_spark.sources import load_table

    bins = profile.greedy_pack_assignments(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars").collect()
    # every doc lands in exactly one bin; totals conserve chars
    assert sum(r.n_docs for r in bins) == len(docs)
    assert sum(r.bin_chars for r in bins) == sum(r.n_chars for r in docs)
    by_src = {}
    for r in bins:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        # bin ids are dense 0..n-1 within a source
        assert sorted(r.bin_id for r in rows) == list(range(len(rows)))
        for r in rows:
            # a bin only exceeds capacity when a single doc does
            assert r.bin_chars <= profile._PACK_CAPACITY or r.n_docs == 1


def test_outlier_zscores_exceed_threshold(spark, sf_dir):
    rows = profile.order_value_outliers(spark, sf_dir).collect()
    for r in rows:
        assert abs(r.zscore) > profile._Z_THRESHOLD


def test_adaptive_length_filter_partitions_counts(spark, sf_dir):
    rows = profile.adaptive_length_filter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.dropped_short + r.dropped_long + r.kept == r.n_docs
        assert r.lo_chars <= r.hi_chars
        # percentile gates keep the bulk of each language
        assert r.kept >= 0.8 * r.n_docs


def test_source_drift_cosine_in_range(spark, sf_dir):
    rows = profile.source_embedding_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.centroid_cosine <= 1.0
        assert r.n_dims > 0


def test_histogram_partitions_all_orders(spark, sf_dir):
    from hadith_vector_search_spark.sources import load_table

    rows = profile.order_price_histogram(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n
    for r in rows:
        assert 0 <= r.bucket < profile._HIST_BINS
        assert r.lo_price <= r.hi_price
        if r.bucket < profile._HIST_BINS - 1:
            assert r.hi_price < (r.bucket + 1) * profile._HIST_WIDTH
        assert r.lo_price >= r.bucket * profile._HIST_WIDTH


def test_frequent_terms_no_false_negatives(spark, sf_dir):
    rows = profile.frequent_terms_bound(spark, sf_dir).collect()
    assert rows, "stopword-like terms should exceed 2% support"
    assert all(r.found_in_sketch for r in rows)


def test_cumulative_users_monotone_and_complete(spark, sf_dir):
    from hadith_vector_search_spark.sources import load_table

    rows = sorted(profile.cumulative_users(spark, sf_dir).collect(),
                  key=lambda r: r.day)
    assert rows
    running = 0
    for r in rows:
        running += r.new_users
        assert r.cumulative_users == running
    n_users = (load_table(spark, sf_dir, "events")
               .select("user_id").distinct().count())
    assert rows[-1].cumulative_users == n_users


def test_retention_day0_is_full_cohort(spark, sf_dir):
    rows = profile.retention_cohorts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.day_offset <= profile._RETENTION_MAX_OFFSET
        assert 0 < r.active_users <= r.cohort_size
        if r.day_offset == 0:
            # every cohort member is active on their first-seen day
            assert r.active_users == r.cohort_size
            assert r.retention == 1.0


def test_funnel_is_monotone_nonincreasing(spark, sf_dir):
    rows = sorted(profile.event_funnel(spark, sf_dir).collect(),
                  key=lambda r: r.stage_idx)
    assert [r.stage for r in rows] == list(profile._FUNNEL_STAGES)
    ns = [r.n_users for r in rows]
    assert ns[0] >= ns[1] >= ns[2] >= 0
    assert rows[0].conversion == 1.0
    for r in rows[1:]:
        assert r.conversion is None or 0.0 <= r.conversion <= 1.0


def test_psi_zero_when_halves_identical(spark):
    """Identical reference and current distributions give PSI ~ 0."""
    rows = [(i, "en", 100 + (i // 2) % 5 * 64) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    orig = profile.load_table
    try:
        profile.load_table = lambda _s, _d, name: df  # noqa: ARG005
        out = profile.length_psi_drift(spark, "ignored").collect()
    finally:
        profile.load_table = orig
    assert len(out) == 1
    # consecutive ids pair one even + one odd doc of the same length:
    # the parity halves are identical distributions
    assert abs(out[0].psi) < 1e-9
    assert out[0].n_ref == out[0].n_cur == 100


def test_decay_bounds_and_epoch_consistency(spark, sf_dir):
    rows = profile.decayed_user_value(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # decay never amplifies, and never crosses zero for positive values
        assert 0 <= r.decayed_value <= r.raw_value + 1e-9

    from hadith_vector_search_spark.plans.pipeline import domain_mix_plan

    plan = {r.lang: r for r in domain_mix_plan(spark, sf_dir).collect()}
    ep = {r.lang: r for r in profile.epoch_plan(spark, sf_dir).collect()}
    assert set(ep) == set(plan)
    for lang, r in ep.items():
        assert r.full_epochs >= 0
        assert 0.0 <= r.final_epoch_rate < 1.0 + 1e-9
        if plan[lang].oversubscribed:
            assert r.full_epochs >= 1
        else:
            assert r.full_epochs == 0
            assert abs(r.final_epoch_rate - plan[lang].sampling_rate) < 1e-6
