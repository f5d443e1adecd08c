"""Lifecycle queries (SURVEY §3.3, §2.9 Q7/Q8): incremental-ingest change
classification + merge stats over a deterministic synthetic "second arrival"
derived from `documents`, plus point lookup and corpus status.

The synthetic incoming batch (same derivation in Spark and the DuckDB
oracle):
- rows with doc_id % 3 == 0 do NOT re-arrive (untouched existing rows),
- re-arriving rows with doc_id % 5 == 0 carry revised text (-> update),
- rows with doc_id % 11 == 0 also arrive under doc_id + 10_000_000 (-> insert),
- everything else re-arrives unchanged (-> skip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..sources.ingest import classify_changes, ingest_stats, merge_upsert, row_checksum

NEW_ID_OFFSET = 10_000_000
LOOKUP_DOC_ID = 42
PREVIEW_LEN = 120


def _with_checksum(docs: DataFrame) -> DataFrame:
    return docs.withColumn("checksum", row_checksum("doc_id", "text"))


def _incoming(docs: DataFrame) -> DataFrame:
    rearrive = (
        docs.filter(F.col("doc_id") % 3 != 0)
        .withColumn("text", F.when(F.col("doc_id") % 5 == 0,
                                   F.concat(F.col("text"), F.lit(" [rev2]")))
                    .otherwise(F.col("text")))
    )
    fresh = (docs.filter(F.col("doc_id") % 11 == 0)
             .withColumn("doc_id", F.col("doc_id") + NEW_ID_OFFSET))
    return _with_checksum(rearrive.unionByName(fresh))


def _classified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return classify_changes(_incoming(docs), _with_checksum(docs))


def incremental_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: one-row insert/update/skip totals for the synthetic batch."""
    return ingest_stats(_classified(spark, sf_dir))


def incremental_changed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: the rows that need work (checksum anti-join semantics)."""
    return (_classified(spark, sf_dir)
            .filter(F.col("action") != "skip")
            .select("doc_id", "action"))


def incremental_merge_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 MERGE result, projected to (doc_id, text): replaced rows show the
    revision suffix, fresh rows appear above the id offset, untouched rows
    survive the anti-join."""
    docs = load_table(spark, sf_dir, "documents")
    merged = merge_upsert(_with_checksum(docs), _incoming(docs), key="doc_id")
    return merged.select("doc_id", "text")


def doc_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 point lookup by primary key — at scale this is a partition-pruned
    + pushed-down scan (PushedFilters: [EqualTo(doc_id, ...)])."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.filter(F.col("doc_id") == LOOKUP_DOC_ID)
            .select("doc_id", "lang", "source",
                    F.substring("text", 1, PREVIEW_LEN).alias("preview")))


def corpus_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 status aggregates (A1/A2/A3): one row of corpus-health stats."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

_INCOMING_CTE = f"""
incoming AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END AS text
  FROM documents WHERE doc_id % 3 <> 0
  UNION ALL
  SELECT doc_id + {NEW_ID_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id % 11 = 0
),
classified AS (
  SELECT i.doc_id,
         CASE WHEN e.doc_id IS NULL THEN 'insert'
              WHEN sha256(i.doc_id::VARCHAR || '␟' || i.text)
                   <> sha256(e.doc_id::VARCHAR || '␟' || e.text) THEN 'update'
              ELSE 'skip' END AS action
  FROM incoming i LEFT JOIN documents e ON i.doc_id = e.doc_id
)
"""


def incremental_merge_stats_oracle() -> str:
    return f"""
WITH {_INCOMING_CTE}
SELECT count(*)                                          AS n_incoming,
       CAST(sum(CASE WHEN action = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
       CAST(sum(CASE WHEN action = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
       CAST(sum(CASE WHEN action = 'skip'   THEN 1 ELSE 0 END) AS BIGINT) AS n_skip
FROM classified
"""


def incremental_changed_docs_oracle() -> str:
    return f"""
WITH {_INCOMING_CTE}
SELECT doc_id, action FROM classified WHERE action <> 'skip'
"""


def incremental_merge_preview_oracle() -> str:
    return f"""
WITH {_INCOMING_CTE}
SELECT e.doc_id, e.text FROM documents e
WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.doc_id = e.doc_id)
UNION ALL
SELECT doc_id, text FROM incoming
"""


def doc_lookup_oracle() -> str:
    return f"""
SELECT doc_id, lang, source, substr(text, 1, {PREVIEW_LEN}) AS preview
FROM documents WHERE doc_id = {LOOKUP_DOC_ID}
"""


CORPUS_STATUS_SQL = """
SELECT count(*)                 AS n_docs,
       count(DISTINCT lang)     AS n_langs,
       count(DISTINCT source)   AS n_sources,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 4)   AS avg_chars,
       min(doc_id)              AS min_doc_id,
       max(doc_id)              AS max_doc_id
FROM documents
"""


def streaming_embed_merge_oracle() -> str:
    """Oracle for the streaming embedding-cache MERGE: the batch MERGE's
    merged text, re-embedded from scratch with the hash-encoder replay
    (tok_hex sign sums, L2-normalize) — incremental must equal
    from-scratch at the vector level."""
    from .embedding import DIM, N_BLOCKS
    from ..functions.text import TOKEN_SPLIT_RE
    hx = " || ".join(f"md5('{b}|' || tok)" for b in range(N_BLOCKS))
    return f"""
WITH {_INCOMING_CTE},
merged AS (
  SELECT e.doc_id, e.text FROM documents e
  WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.doc_id = e.doc_id)
  UNION ALL
  SELECT doc_id, text FROM incoming
),
tok_rows AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                            x -> length(x) >= 2)) AS tok
  FROM merged
),
tok_hex AS (SELECT doc_id, {hx} AS hx FROM tok_rows),
comps AS (
  SELECT doc_id, g.j AS dim,
         SUM(CASE WHEN substr(hx, g.j + 1, 1) < '8' THEN 1 ELSE -1 END)::DOUBLE AS s
  FROM tok_hex CROSS JOIN generate_series(0, {DIM - 1}) AS g(j)
  GROUP BY doc_id, g.j
),
norms AS (SELECT doc_id, sqrt(SUM(s * s)) AS nrm FROM comps GROUP BY doc_id)
SELECT m.doc_id, g.j AS dim,
       round(CASE WHEN n.nrm > 0 THEN c.s / n.nrm ELSE 0.0 END, 6) AS value
FROM merged m
CROSS JOIN generate_series(0, {DIM - 1}) AS g(j)
LEFT JOIN comps c ON c.doc_id = m.doc_id AND c.dim = g.j
LEFT JOIN norms n ON n.doc_id = m.doc_id
"""
