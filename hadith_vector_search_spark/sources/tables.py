"""Parquet scans over the driver-generated test tables.

Mirrors the reference's source surface (SURVEY §2.1 S1-S4): a scan is a
``spark.read`` with pushdown-friendly shape — no schema inference at query
time (parquet carries its schema), no collect, no RDDs.  Filters and
projections applied by callers reach the parquet reader via Catalyst
(PushedFilters / ReadSchema), which is the Spark-native analogue of the
reference pushing MATCH/doc_id predicates into SQLite
(/root/reference/mcp_server/apps/fts.py:95-116).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table. Dimension tables stay small at every SF
    (region=5, nation=25) — they are natural broadcast sides.

    ``events.parquet`` event time must land as TIMESTAMP whatever the
    writer encoded: TIMESTAMP(NANOS) is read nanos-as-long (runtime legacy
    conf) and converted JVM-side (`ts div 1000` is exact integer math — no
    double round-trip; DuckDB truncates NANOS→micros the same way), and
    TIMESTAMP_NTZ — how newer writers encode naive timestamps — is cast,
    value-preserving because the session timezone is pinned to UTC.
    Downstream time arithmetic (`unix_micros`, watermarks) requires plain
    TIMESTAMP.
    """
    if name != "events":
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    # nanosAsLong must stay set for the life of the session: the parquet
    # schema conversion consults it at scan time, not just at plan time.
    # It only affects TIMESTAMP(NANOS) columns, which nothing else reads.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ cast below and all downstream date math must be tz-stable
    # even under a plain SparkSession (the driver's smoke harness does not
    # use session.py, which also pins UTC). A timestamp cast captures the
    # session timezone when the plan is ANALYZED (ResolveTimeZone), so:
    # pin UTC, build the projection, force analysis (`df.schema`), then
    # restore the caller's timezone — no session-wide side effect leaks to
    # subsequent queries (tests/test_sources.py asserts both properties).
    prev_tz = spark.conf.get("spark.sql.session.timeZone", None)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df.schema  # noqa: B018 — forces analysis, binding UTC into the cast
    finally:
        if prev_tz is not None:
            spark.conf.set("spark.sql.session.timeZone", prev_tz)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
