"""Oracle-compared correctness for the relational operator suite (sf0.001)."""

from __future__ import annotations

import pytest

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
