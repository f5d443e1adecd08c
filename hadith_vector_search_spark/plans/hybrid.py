"""Flagship hybrid-search pipeline (SURVEY §3.1) over the test tables.

One DataFrame DAG replaces the reference's 8-stage driver function
(/root/reference/mcp_server/tools.py:39-175):

    route -> lexical leg (BM25 top-50, postings algebra)
          -> semantic leg (cosine top-50, broadcast probe)
          -> full-outer fusion -> backfill join -> weighted score -> top-n

`documents.doc_id` and `embeddings.vec_id` share the id space, standing in
for the reference's doc_id↔vector-id correspondence; the query embedding is
a deterministic pseudo-embedding (a row of the embeddings table), per
FIXTURES.md §3 — correctness is oracle-checkable without a real model.

Scale: each leg is top-k-limited BEFORE fusion (the reference's 5× over-fetch,
tools.py:87,93), so the fusion join and everything after it is O(k) no matter
the corpus size; the backfill join broadcasts the candidate list against the
documents table (J3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import py_tokenize, term_coverage
from ..operators import bm25 as bm25_ops
from ..operators import fusion, similarity
from ..plans.lexical import _sql_tokens_cte, get_index
from ..plans.semantic import _PAIR_DOT
from ..sources import load_table

HYBRID_QUERY = "data stream window"
HYBRID_VEC_ID = 0
HYBRID_N = 10
BATCH_N = 5
OVERFETCH = 50  # max(50, 5*n) per the reference


def _hybrid(spark: SparkSession, sf_dir: str, mode: str) -> DataFrame:
    w = fusion.resolve_weights(mode)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    fts = bm25_ops.bm25_topk(spark, docs, HYBRID_QUERY, k=OVERFETCH,
                             conjunctive=False,
                             index=get_index(spark, sf_dir)).select("doc_id", "bm25")
    vec = (similarity.topk_by_query_id(emb, HYBRID_VEC_ID, OVERFETCH)
           .withColumnRenamed("vec_id", "doc_id"))

    fused = fusion.fuse(fts, vec)
    # J3 backfill: candidates are tiny -> broadcast them INTO the documents
    # scan side (the big side streams; no shuffle of documents).
    with_text = fused.join(docs.select("doc_id", "text"), "doc_id", "left")

    toks = F.array(*[F.lit(t) for t in py_tokenize(HYBRID_QUERY)])
    cov = term_coverage(toks, F.lower(F.col("text")))
    scored = fusion.score(with_text, w, coverage_col=cov)
    return (
        scored.select("doc_id", "score", "vec_signal", "fts_sig", "coverage",
                      F.substring(F.col("text"), 1, 60).alias("preview"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(HYBRID_N)
    )


def hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced mode: vector 0.6 / fts 0.4 / coverage 0.2."""
    return _hybrid(spark, sf_dir, "balanced")


def hybrid_search_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-of-queries hybrid search: N queries routed through BOTH legs,
    fused, scored, and ranked per query in ONE DataFrame plan — the
    throughput shape SURVEY §3.1 calls the natural Spark unit. Lexical leg
    = batch BM25 (qterms table join); semantic leg = batch k-NN (broadcast
    query vectors); fusion keys on (query_id, doc_id); per-query top-n via
    window. Query q's pseudo-embedding is embeddings row vec_id == q."""
    from pyspark.sql.window import Window

    from .lexical import BATCH_QUERIES

    w = fusion.resolve_weights("balanced")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [qid for qid, _ in BATCH_QUERIES]

    fts = bm25_ops.bm25_topk_batch(spark, docs, BATCH_QUERIES, k=OVERFETCH,
                                   conjunctive=False,
                                   index=get_index(spark, sf_dir)
                                   ).select("query_id", "doc_id", "bm25")
    qvecs = (emb.filter(F.col("vec_id").isin(qids))
             .select(F.col("vec_id").alias("query_id"),
                     F.col("embedding").alias("qvec")))
    vec = (similarity.knn_join(emb, qvecs, k=OVERFETCH)
           .select("query_id", F.col("vec_id").alias("doc_id"), "sim"))

    fused = fusion.fuse(fts, vec, key=["query_id", "doc_id"])
    with_text = fused.join(docs.select("doc_id", "text"), "doc_id", "left")
    tok_rows = [(qid, sorted(set(py_tokenize(q)))) for qid, q in BATCH_QUERIES]
    tokens_df = spark.createDataFrame(tok_rows, "query_id int, toks array<string>")
    with_toks = with_text.join(F.broadcast(tokens_df), "query_id")
    cov = term_coverage(F.col("toks"), F.lower(F.col("text")))
    scored = fusion.score(with_toks, w, coverage_col=cov)
    rank_w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.select("query_id", "doc_id", "score", "vec_signal", "fts_sig",
                      "coverage")
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= BATCH_N)
    )


def hybrid_search_term_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-priority mode: vector 0.3 / fts 0.3 / coverage 0.6."""
    return _hybrid(spark, sf_dir, "term-priority")


def hybrid_search_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quran-engine 'semantic' preset (search.py:194-200): vector-only
    weights through the SAME fused pipeline — mode is a weight vector, not
    a different plan (SURVEY Q2)."""
    return _hybrid(spark, sf_dir, "semantic")


def hybrid_search_fts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quran-engine 'fts' preset: lexical-only weights, same pipeline."""
    return _hybrid(spark, sf_dir, "fts")


def hybrid_batch_oracle_sql(mode: str = "balanced") -> str:
    """DuckDB oracle for the batch hybrid — generated from the same
    BATCH_QUERIES constants, weight preset, and tie-breaks."""
    from .lexical import BATCH_QUERIES

    w = fusion.resolve_weights(mode)
    qids = ", ".join(str(qid) for qid, _ in BATCH_QUERIES)
    term_pairs = sorted({(qid, t) for qid, q in BATCH_QUERIES
                         for t in py_tokenize(q)})
    tvalues = ", ".join(f"({qid}, '{t}')" for qid, t in term_pairs)
    return f"""
WITH {_sql_tokens_cte()},
qterms AS (SELECT * FROM (VALUES {tvalues}) q(query_id, term)),
ntoks AS (SELECT query_id, count(*)::DOUBLE AS n_toks FROM qterms GROUP BY 1),
tdf AS (
  SELECT term, count(*)::DOUBLE AS df
  FROM postings WHERE term IN (SELECT DISTINCT term FROM qterms) GROUP BY 1
),
bm25_scored AS (
  SELECT q.query_id, p.doc_id,
         sum( ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * (p.tf * (1.2 + 1.0))
              / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl)) ) AS score
  FROM postings p
  JOIN tdf d USING (term)
  JOIN qterms q USING (term)
  JOIN doclen l USING (doc_id)
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
fts_leg AS (
  SELECT query_id, doc_id, fts_score FROM (
    SELECT query_id, doc_id, round(score, 6) AS fts_score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 6) DESC, doc_id ASC) AS rn
    FROM bm25_scored
  ) WHERE rn <= {OVERFETCH}
),
{_PAIR_DOT},
vec_leg AS (
  SELECT query_id, doc_id, vector_sim FROM (
    SELECT ia AS query_id, ib AS doc_id, round(d, 6) AS vector_sim,
           row_number() OVER (PARTITION BY ia
                              ORDER BY round(d, 6) DESC, ib ASC) AS rn
    FROM pair_dot WHERE ia IN ({qids}) AND ia <> ib
  ) WHERE rn <= {OVERFETCH}
),
fused AS (
  SELECT coalesce(f.query_id, v.query_id) AS query_id,
         coalesce(f.doc_id, v.doc_id)     AS doc_id,
         coalesce(f.fts_score, 0.0)       AS fts_score,
         coalesce(v.vector_sim, 0.0)      AS vector_sim
  FROM fts_leg f
  FULL OUTER JOIN vec_leg v ON f.query_id = v.query_id AND f.doc_id = v.doc_id
),
covs AS (
  SELECT u.query_id, u.doc_id,
         sum(CASE WHEN strpos(lower(d.text), t.term) > 0 THEN 1 ELSE 0 END)::DOUBLE
           / max(n.n_toks) AS cov
  FROM fused u
  JOIN documents d ON u.doc_id = d.doc_id
  JOIN qterms t ON t.query_id = u.query_id
  JOIN ntoks n ON n.query_id = u.query_id
  GROUP BY u.query_id, u.doc_id
),
scored AS (
  SELECT u.query_id, u.doc_id,
         least(1.0, greatest(0.0, u.vector_sim))                          AS vsig,
         greatest(0.0, u.fts_score) / (greatest(0.0, u.fts_score) + 1.0)  AS fsig,
         c.cov                                                            AS cov
  FROM fused u JOIN covs c ON u.query_id = c.query_id AND u.doc_id = c.doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         round({w.vector} * vsig + {w.fts} * fsig + {w.coverage} * cov, 6) AS score,
         round(vsig, 6) AS vec_signal,
         round(fsig, 6) AS fts_sig,
         round(cov, 6)  AS coverage,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round({w.vector} * vsig + {w.fts} * fsig + {w.coverage} * cov, 6) DESC,
                    doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, score, vec_signal, fts_sig, coverage,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {BATCH_N}
"""


def hybrid_oracle_sql(mode: str) -> str:
    """DuckDB oracle: the same two legs, fusion, and scoring in one SQL
    statement — generated from the same constants and weight presets."""
    w = fusion.resolve_weights(mode)
    terms = sorted(set(py_tokenize(HYBRID_QUERY)))
    values = ", ".join(f"('{t}')" for t in terms)
    cov_expr = " + ".join(
        f"(CASE WHEN strpos(lower(d.text), '{t}') > 0 THEN 1 ELSE 0 END)" for t in terms
    )
    return f"""
WITH {_sql_tokens_cte()},
qterms AS (SELECT * FROM (VALUES {values}) q(term)),
tdf AS (
  SELECT term, count(*)::DOUBLE AS df
  FROM postings WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
bm25_scored AS (
  SELECT p.doc_id,
         sum( ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * (p.tf * (1.2 + 1.0))
              / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl)) ) AS score
  FROM postings p
  JOIN tdf d USING (term) JOIN doclen l USING (doc_id) CROSS JOIN stats s
  GROUP BY p.doc_id
),
fts_leg AS (
  SELECT doc_id, round(score, 6) AS fts_score
  FROM bm25_scored ORDER BY round(score, 6) DESC, doc_id ASC LIMIT {OVERFETCH}
),
{_PAIR_DOT},
vec_leg AS (
  SELECT ib AS doc_id, round(d, 6) AS vector_sim
  FROM pair_dot WHERE ia = {HYBRID_VEC_ID}
  ORDER BY round(d, 6) DESC, ib ASC LIMIT {OVERFETCH}
),
fused AS (
  SELECT coalesce(f.doc_id, v.doc_id) AS doc_id,
         coalesce(f.fts_score, 0.0)   AS fts_score,
         coalesce(v.vector_sim, 0.0)  AS vector_sim
  FROM fts_leg f FULL OUTER JOIN vec_leg v ON f.doc_id = v.doc_id
),
scored AS (
  SELECT u.doc_id,
         least(1.0, greatest(0.0, u.vector_sim))                          AS vsig,
         greatest(0.0, u.fts_score) / (greatest(0.0, u.fts_score) + 1.0)  AS fsig,
         ({cov_expr})::DOUBLE / {len(terms)}                              AS cov,
         substr(d.text, 1, 60)                                            AS preview
  FROM fused u LEFT JOIN documents d ON u.doc_id = d.doc_id
)
SELECT doc_id,
       round({w.vector} * vsig + {w.fts} * fsig + {w.coverage} * cov, 6) AS score,
       round(vsig, 6) AS vec_signal,
       round(fsig, 6) AS fts_sig,
       round(cov, 6)  AS coverage,
       preview
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {HYBRID_N}
"""
