"""Lake-layout management: partitioned and bucketed parquet sinks, plus
plan-inspection helpers that PROVE the layout pays off (partition pruning,
shuffle-free co-located joins).

This is the piece that makes every other operator's 100 TB story concrete:
- `write_partitioned` lays data out so selective queries prune whole
  directories (the scan's PartitionFilters) instead of reading and
  filtering — the raw-snapshot sinks (SURVEY S15/S16) with a layout.
- `write_bucketed` persists a table pre-shuffled on its join/agg key, so
  repeated joins on that key skip the exchange entirely (the lake-native
  equivalent of the pinned index frames used in-session by the lexical
  and dedup operators).
- `scan_exchanges` / `partition_filters` read the physical plan, so tests
  assert the layout's effect rather than trusting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, *partition_cols: str,
                      mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet snapshot. With
    `partitionOverwriteMode=dynamic` (set by callers that re-run batches —
    see streaming.stream_merge_jsonl) a rewrite touches only the
    partitions present in `df`."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(df: DataFrame, table: str, path: str,
                   bucket_col: str | list[str],
                   n_buckets: int, sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed external table: rows are hash-distributed into
    `n_buckets` files per partition on the bucket column(s) and recorded
    in the catalog, so joins/aggs keyed on those columns read co-located
    buckets and skip the exchange. `sort_col` additionally orders within
    buckets (lets sort-merge joins skip the sort too)."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = (df.write.mode(mode).option("path", path)
         .bucketBy(n_buckets, cols[0], *cols[1:]))
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def _formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def scan_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the physical plan
    (broadcast exchanges move only the small side and don't count —
    bucketing exists to eliminate hash-partitioning shuffles)."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple")
    plan = df._jdf.queryExecution().explainString(mode)
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "hashpartitioning" in line)


def partition_filters(df: DataFrame) -> list[str]:
    """The PartitionFilters entries of every file scan in the plan —
    non-empty entries mean directory-level pruning happens at planning
    time, before any file is opened."""
    out = []
    for line in _formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PartitionFilters:"):
            out.append(line)
    return out
