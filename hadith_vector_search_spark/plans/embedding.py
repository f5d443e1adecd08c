"""Embedding-pipeline queries (SURVEY §2.8 V1/V2 + V3 composed): batch
document embedding through the Arrow pandas UDF, and the full
embed -> score -> top-k search path with a driver-side query embedding.

Both are oracle-checked end to end: the deterministic encoder
(operators/embedder.py) is reproducible in DuckDB SQL (md5-derived ±1
signs per (dim, token), summed over the doc's token multiset, then
L2-normalized), so the oracle replays the entire embedding pipeline —
not just the final ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import TOKEN_SPLIT_RE
from ..functions.vector import dot, vector_lit
from ..operators.embedder import embed_column, encode_query
from ..sources import load_table

DIM = 8
QUERY_TEXT = "quality filtering and near duplicate detection for training data"
TOPK = 10


def embed_documents_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1: every doc through the pandas-UDF encoder; components rounded for
    display/compare. One narrow projection — embedding at 100 TB is an
    embarrassingly parallel map over partitions.

    Emitted exploded as (doc_id, dim, value) rather than a raw
    array<double> column: the correctness harness canonicalizes results
    through pandas, which cannot sort/hash list cells."""
    docs = load_table(spark, sf_dir, "documents")
    emb = embed_column("text", DIM)
    return docs.select(
        "doc_id",
        F.posexplode(F.transform(emb, lambda x: F.round(x, 6))).alias("dim", "value"))


def embed_and_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2+V3: embed the corpus (executor-side UDF), embed the query once on
    the driver (constant-folded literal), exact cosine top-k with the
    reference's positive-similarity filter (P7,
    /root/reference/quran_mcp/search.py:168-169)."""
    docs = load_table(spark, sf_dir, "documents")
    qvec = vector_lit(encode_query(QUERY_TEXT, DIM))
    scored = docs.select(
        "doc_id",
        F.round(dot(embed_column("text", DIM), qvec), 6).alias("sim"))
    return (scored.filter(F.col("sim") > 0)
            .orderBy(F.desc("sim"), F.asc("doc_id"))
            .limit(TOPK))


# ---------------------------------------------------------------------------
# Oracles — replay the encoder in SQL.
# ---------------------------------------------------------------------------

def _sums_cte() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN substr(md5('{j}|' || tok), 1, 1) < '8' "
        f"THEN 1 ELSE -1 END)::DOUBLE AS s{j}"
        for j in range(DIM))
    sq = " + ".join(f"s{j} * s{j}" for j in range(DIM))
    return f"""
tok_rows AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                            x -> length(x) >= 2)) AS tok
  FROM documents
),
sums AS (SELECT doc_id, {sums} FROM tok_rows GROUP BY doc_id),
normed AS (SELECT doc_id, sqrt({sq}) AS nrm, * EXCLUDE (doc_id) FROM sums)
"""


def embed_documents_preview_oracle() -> str:
    comps = ", ".join(f"round(n.s{j} / n.nrm, 6)" for j in range(DIM))
    zeros = ", ".join("0.0" for _ in range(DIM))
    return f"""
WITH {_sums_cte()},
vecs AS (
  SELECT d.doc_id,
         CASE WHEN n.nrm > 0 THEN [{comps}] ELSE [{zeros}] END AS emb
  FROM documents d LEFT JOIN normed n ON d.doc_id = n.doc_id
)
SELECT doc_id,
       generate_subscripts(emb, 1) - 1 AS dim,
       CAST(unnest(emb) AS DOUBLE)     AS value
FROM vecs
"""


def embed_and_search_oracle() -> str:
    q = encode_query(QUERY_TEXT, DIM)
    dot_expr = " + ".join(f"(n.s{j} / n.nrm) * ({q[j]!r})" for j in range(DIM))
    return f"""
WITH {_sums_cte()}
SELECT n.doc_id, round({dot_expr}, 6) AS sim
FROM normed n
WHERE n.nrm > 0 AND round({dot_expr}, 6) > 0
ORDER BY sim DESC, doc_id ASC
LIMIT {TOPK}
"""
