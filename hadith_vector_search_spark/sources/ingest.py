"""Incremental ingestion: validated JSONL scan + checksum-gated merge.

Re-expresses the reference's ingestion lifecycle (SURVEY §3.3) Spark-first:

- Validated scan (S2): ``read.json`` PERMISSIVE with a ``_corrupt_record``
  column replaces the reference's per-line Pydantic loop with a
  fail-after-N-errors gate (/root/reference/mcp_server/apps/validation.py:27-58).
  The gate is ``filter(corrupt).limit(N).count()`` — it short-circuits, never
  scanning past the threshold.
- Change classification (P3/P4): the checksum probe + skip logic
  (/root/reference/mcp_server/apps/fts.py:139-145,292-302) becomes ONE left
  join producing an ``action`` column (insert/update/skip) — Spark's
  partial-agg then rolls the per-action counts up (A5) without a second scan.
- Merge (J5): plain-parquet MERGE = anti-join out the replaced rows, union
  the incoming ones (/root/reference/mcp_server/apps/fts.py:150-181). On a
  real deployment this is a Delta/Iceberg ``MERGE INTO`` keyed on doc_id;
  the join shape (and its shuffle) is identical. At 100 TB both sides are
  bucketed by the merge key so the anti-join is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


class ValidationError(RuntimeError):
    """Raised when a scan hits the corrupt-line threshold (reference halts
    after 10 errors: /root/reference/mcp_server/apps/validation.py:43-49)."""


def validated_scan(spark: SparkSession, path: str, schema: StructType,
                   max_errors: int = 10) -> DataFrame:
    """PERMISSIVE JSONL scan with an error-threshold gate. Returns only
    valid rows (corrupt column dropped).

    Spark refuses queries whose referenced set is ONLY the internal
    corrupt-record column of a raw JSON scan (SPARK-21610) — and that ban
    would also bite callers running `.count()` on a corrupt-filtered frame.
    So the scan uses DROPMALFORMED (no corrupt column anywhere) and the
    gate compares a cheap `read.text` non-blank line count against the
    valid-row count — both fully distributed, no caching of the corpus.
    Blank lines are excluded on both sides (the reference skips them too,
    S1/P8: /root/reference/mcp_server/apps/validation.py:21-23)."""
    valid = (spark.read.schema(schema)
             .option("mode", "DROPMALFORMED")
             .json(path))
    n_lines = (spark.read.text(path)
               .filter(F.length(F.trim(F.col("value"))) > 0).count())
    n_bad = n_lines - valid.count()
    if n_bad >= max_errors:
        raise ValidationError(f"{path}: >= {max_errors} corrupt lines")
    return valid


def classify_changes(incoming: DataFrame, existing: DataFrame,
                     key: str = "doc_id", checksum: str = "checksum") -> DataFrame:
    """One left join from incoming to existing on the key, classifying every
    incoming row: 'insert' (new key), 'update' (checksum differs), 'skip'
    (unchanged). Keeps all incoming columns plus ``action``."""
    ex = existing.select(F.col(key), F.col(checksum).alias("_existing_ck"))
    action = (F.when(F.col("_existing_ck").isNull(), "insert")
              .when(F.col(checksum) != F.col("_existing_ck"), "update")
              .otherwise("skip"))
    return (incoming.join(ex, key, "left")
            .withColumn("action", action)
            .drop("_existing_ck"))


def changed_rows(classified: DataFrame) -> DataFrame:
    """P4 as a filter over the classified frame: rows that need work
    (the anti-join semantics of the reference's checksum skip)."""
    return classified.filter(F.col("action") != "skip")


def ingest_stats(classified: DataFrame) -> DataFrame:
    """A5 roll-up: one row of per-action totals (partial->final agg)."""
    return classified.agg(
        F.count(F.lit(1)).alias("n_incoming"),
        F.sum(F.when(F.col("action") == "insert", 1).otherwise(0)).alias("n_insert"),
        F.sum(F.when(F.col("action") == "update", 1).otherwise(0)).alias("n_update"),
        F.sum(F.when(F.col("action") == "skip", 1).otherwise(0)).alias("n_skip"),
    )


def merge_upsert(existing: DataFrame, incoming: DataFrame,
                 key: str = "doc_id") -> DataFrame:
    """Plain-parquet MERGE: existing rows whose key is NOT being replaced
    (left_anti) unioned with all incoming rows. Column sets must match."""
    kept = existing.join(incoming.select(key), key, "left_anti")
    return kept.unionByName(incoming.select(*existing.columns))


def row_checksum(*cols: Column | str) -> Column:
    """F9 checksum over unit-separator-joined fields (null-safe: nulls
    serialize as empty, matching concat_ws semantics in both engines)."""
    cs = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
          for c in cols]
    return F.sha2(F.concat_ws("␟", *cs), 256)
