"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
settings are what we would ship to a multi-executor cluster:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  auto broadcast conversion) — at 100 TB this is what keeps a static
  ``shuffle.partitions`` choice from being a footgun.
- Arrow on for every pandas-UDF / toPandas boundary.
- ``shuffle.partitions`` defaults to the core count locally; on a real
  cluster AQE's coalescing makes a high initial value (e.g. 2000) safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hadith-vector-search-spark",
              cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 16g: the session pins derived indexes (shingles, fingerprints,
        # LSH signatures, lexical postings) plus a 5000-entry codegen
        # cache; 8g was enough but ran closer to GC pressure on full
        # 75-query sessions. The container has 128 GiB.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # The default codegen cache (100 entries) thrashes once a session
        # runs the full 75-query registry — each query compiles several
        # whole-stage-codegen classes, so a warm-up pass evicts its own
        # entries and every later query recompiles (measured ~25% wall-time
        # tax on a 10-query subset after a full warm-up). 5000 entries keeps
        # the whole registry's generated classes resident; memory cost is a
        # few hundred MB of compiled classes, trivial against the heap.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
    )
    return builder.getOrCreate()
