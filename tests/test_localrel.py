"""`localrel.local_df` — Arrow-backed driver-local relations.

The optimization contract: same rows + same schema as the classic
`spark.createDataFrame(rows, ddl)` call it replaces, but planned as a
LocalTableScan (no pickled-RDD Python-worker evaluation at action time,
which cost ~0.2-0.5 s per action and ~6 s under a coalesce(1) write —
OPTIMIZATION_r13.md change 3)."""

from __future__ import annotations

from hadith_vector_search_spark.localrel import local_df

CASES = [
    ([(1, "a"), (2, None)], "query_id int, query_text string"),
    ([(1, [0.5, 1.25]), (2, [])], "cent_id int, cvec array<double>"),
    ([(5, ["x", "y"])], "query_id int, toks array<string>"),
    ([], "query_id long, nbr_id long, arank int"),
    ([(1, [1.0], [2], [3]), (2, [0.25], [7], [9])],
     "query_id long, qvec array<double>, probes array<int>, "
     "qwords array<bigint>"),
    ([(3, 384, True)], "n_vectors long, embedding_dim int, built boolean"),
]


def test_local_df_matches_classic_createdataframe(spark):
    for rows, ddl in CASES:
        fast = local_df(spark, rows, ddl)
        classic = spark.createDataFrame(rows, ddl)
        assert fast.schema == classic.schema, ddl
        assert sorted(map(tuple, fast.collect())) == \
            sorted(map(tuple, classic.collect())), ddl


def test_local_df_plans_as_local_table_scan(spark):
    df = local_df(spark, [(1, [0.5])], "cent_id int, cvec array<double>")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan
