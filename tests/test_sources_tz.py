"""load_table('events') timezone hygiene (round-4 advice item):

1. The NTZ→TIMESTAMP cast must be value-preserving under UTC semantics
   regardless of the session timezone active around the call — the cast
   binds its zone at plan ANALYSIS, which load_table forces while UTC is
   pinned.
2. load_table must NOT leak a session-wide timezone change: the caller's
   timezone is restored after the frame is built.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadith_vector_search_spark.sources import load_table

from conftest import SF_SMOKE

TZ_KEY = "spark.sql.session.timeZone"


def test_events_ts_stable_under_foreign_session_tz(spark):
    prev = spark.conf.get(TZ_KEY, None)
    try:
        spark.conf.set(TZ_KEY, "UTC")
        utc_rows = (load_table(spark, SF_SMOKE, "events")
                    .select(F.unix_micros("ts").alias("us"))
                    .orderBy("us").limit(5).collect())
        spark.conf.set(TZ_KEY, "America/New_York")
        ny_rows = (load_table(spark, SF_SMOKE, "events")
                   .select(F.unix_micros("ts").alias("us"))
                   .orderBy("us").limit(5).collect())
        assert [r.us for r in utc_rows] == [r.us for r in ny_rows], \
            "events.ts must mean the same instants whatever tz the caller runs"
    finally:
        if prev is not None:
            spark.conf.set(TZ_KEY, prev)


def test_load_table_restores_caller_timezone(spark):
    prev = spark.conf.get(TZ_KEY, None)
    try:
        spark.conf.set(TZ_KEY, "Asia/Tokyo")
        load_table(spark, SF_SMOKE, "events")
        assert spark.conf.get(TZ_KEY) == "Asia/Tokyo", \
            "load_table must not leak a session-wide timezone mutation"
    finally:
        if prev is not None:
            spark.conf.set(TZ_KEY, prev)
