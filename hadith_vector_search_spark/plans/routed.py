"""Intent-conditioned batch retrieval (VERDICT r1 item 4): the router's
intent decides the PLAN each query takes, like the reference —
exact-reference queries go straight to point lookup
(/root/reference/quran_mcp/mcp_stdio.py:156-175), narrator queries get a
field-scoped conjunctive match (ref router.py:93-107 builds
`narrator:"X"`; the test corpus has no narrator column, so the honest
analogue is AND-semantics BM25 over the extracted narrator phrase),
Arabic-dominant queries take the semantic leg (spec'd contextual_arabic
path, HADITH_SEARCH_SPEC.md:256-268), and thematic/mixed queries run the
full hybrid pipeline.

All four paths execute as ONE DataFrame plan: the routed query table is
filtered per intent (each branch sees only its queries), each branch is a
batch operator keyed by query_id, and the union re-attaches intent. No
driver-side loop — routing a million queries is the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import term_coverage, tokenize
from ..operators import bm25 as bm25_ops
from ..operators import fusion, similarity
from ..operators.router import (
    INTENT_ARABIC,
    INTENT_EXACT,
    INTENT_MIXED,
    INTENT_NARRATOR,
    INTENT_THEMATIC,
    route,
)
from ..plans.lexical import _sql_tokens_cte, get_index
from ..plans.routing import intent_feat_cte
from ..plans.semantic import _PAIR_DOT
from ..sources import load_table
from ..localrel import local_df

# A routed batch whose queries are built from corpus vocabulary so every
# intent path produces rows (the golden-category batch in plans/routing.py
# exercises CLASSIFICATION; this batch exercises per-intent RETRIEVAL).
ROUTED_BATCH: list[tuple[int, str]] = [
    (1, "book 1:12"),                                # exact_reference -> doc 12
    (2, "210"),                                      # exact_reference -> doc 210
    (3, "narrated by customer merge"),               # narrator (AND: customer+merge)
    (4, "reported by stream window"),                # narrator (AND: stream+window)
    (5, "عن الصبر"),                                  # contextual_arabic -> vec leg
    (6, "hadith about data stream window order"),    # thematic -> hybrid
    (7, "vector merge"),                             # mixed -> hybrid
]
ROUTED_N = 5
ROUTED_OVERFETCH = 25
_LAST_NUM_RE = r"([0-9]+)[^0-9]*$"


def routed_search_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    index = get_index(spark, sf_dir)
    w = fusion.resolve_weights("balanced")

    queries = local_df(spark, ROUTED_BATCH, "query_id int, query_text string")
    # Pin the routed batch: eight downstream consumers would otherwise each
    # re-plan and re-run the routing subtree (7 rows, but the duplicated
    # subtrees inflate analysis and scheduling far beyond their data size).
    routed = route(queries).localCheckpoint(eager=False)

    # -- exact_reference: parse the trailing number, partition-prunable
    #    point lookup (semi-join against the corpus keeps only real ids).
    exact_ids = (routed.filter(F.col("intent") == INTENT_EXACT)
                 .select("query_id",
                         F.regexp_extract("query_text", _LAST_NUM_RE, 1)
                         .cast("long").alias("doc_id")))
    lookup_hits = (F.broadcast(exact_ids)
                   .join(docs.select("doc_id"), "doc_id")
                   .select("query_id", "doc_id",
                           F.lit(1.0).alias("score"),
                           F.lit(1).alias("rank")))

    # -- narrator: conjunctive BM25 over the extracted narrator phrase
    #    (field-scoped AND semantics; see module docstring).
    nar_terms = (routed.filter(F.col("intent") == INTENT_NARRATOR)
                 .select("query_id",
                         F.explode(tokenize(F.col("narrator_query"))).alias("term"))
                 .distinct())
    nar_w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    nar_hits = (
        bm25_ops.score_terms_batch(index, nar_terms, conjunctive=True)
        .select("query_id", "doc_id", F.round("score", 6).alias("score"))
        .withColumn("rank", F.row_number().over(nar_w))
        .filter(F.col("rank") <= ROUTED_N)
    )

    # -- contextual_arabic: semantic leg only (pseudo query embedding =
    #    embeddings row vec_id == query_id, per FIXTURES.md §3).
    ar_ids = routed.filter(F.col("intent") == INTENT_ARABIC).select("query_id")
    ar_qvecs = (emb.join(F.broadcast(ar_ids),
                         emb.vec_id == F.col("query_id"))
                .select("query_id", F.col("embedding").alias("qvec")))
    ar_hits = (similarity.knn_join(emb, ar_qvecs, k=ROUTED_N)
               .select("query_id", F.col("vec_id").alias("doc_id"),
                       F.col("sim").alias("score"), "rank"))

    # -- thematic / mixed: the full hybrid pipeline, batch-keyed.
    hm = routed.filter(F.col("intent").isin(INTENT_THEMATIC, INTENT_MIXED))
    hm_terms = (hm.select("query_id", F.explode("tokens").alias("term"))
                .distinct())
    fts_w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    fts = (bm25_ops.score_terms_batch(index, hm_terms, conjunctive=False)
           .select("query_id", "doc_id", F.round("score", 6).alias("bm25"))
           .withColumn("rn", F.row_number().over(fts_w))
           .filter(F.col("rn") <= ROUTED_OVERFETCH)
           .select("query_id", "doc_id", "bm25"))
    hm_qvecs = (emb.join(F.broadcast(hm.select("query_id")),
                         emb.vec_id == F.col("query_id"))
                .select("query_id", F.col("embedding").alias("qvec")))
    vec = (similarity.knn_join(emb, hm_qvecs, k=ROUTED_OVERFETCH)
           .select("query_id", F.col("vec_id").alias("doc_id"), "sim"))
    fused = fusion.fuse(fts, vec, key=["query_id", "doc_id"])
    # INNER backfill with the candidates broadcast (the reference's own
    # skip-missing semantics, quran_mcp/search.py:219-221; an outer join
    # could never broadcast its preserved side).
    with_text = F.broadcast(fused).join(docs.select("doc_id", "text"), "doc_id")
    with_toks = with_text.join(
        F.broadcast(routed.select(
            "query_id", F.array_distinct("tokens").alias("tokens"))),
        "query_id")
    cov = term_coverage(F.col("tokens"), F.lower(F.col("text")))
    scored = fusion.score(with_toks, w, coverage_col=cov)
    hyb_w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    hm_hits = (scored.select("query_id", "doc_id", "score")
               .withColumn("rank", F.row_number().over(hyb_w))
               .filter(F.col("rank") <= ROUTED_N))

    union = (lookup_hits.unionByName(nar_hits)
             .unionByName(ar_hits).unionByName(hm_hits))
    return (union.join(F.broadcast(routed.select("query_id", "intent")),
                       "query_id")
            .select("query_id", "intent", "doc_id", "score", "rank"))


def routed_search_batch_oracle() -> str:
    w = fusion.resolve_weights("balanced")
    tok_expr = ("list_filter(string_split_regex(lower({src}), "
                "'[^a-z0-9_؀-ۿ]+'), x -> length(x) >= 2)")
    return f"""
WITH {intent_feat_cte(ROUTED_BATCH)},
{_sql_tokens_cte()},
{_PAIR_DOT},
exact_ids AS (
  SELECT query_id,
         CAST(regexp_extract(query_text, '{_LAST_NUM_RE}', 1) AS BIGINT) AS doc_id
  FROM intents WHERE intent = 'exact_reference'
),
lookup_hits AS (
  SELECT e.query_id, d.doc_id, 1.0 AS score, 1 AS rank
  FROM exact_ids e JOIN documents d USING (doc_id)
),
nar_terms AS (
  SELECT DISTINCT query_id, t.term
  FROM intents, unnest({tok_expr.format(src='narrator_query')}) AS t(term)
  WHERE intent = 'narrator'
),
nar_n AS (SELECT query_id, count(*)::INT AS n_terms FROM nar_terms GROUP BY 1),
nar_tdf AS (
  SELECT term, count(*)::DOUBLE AS df
  FROM postings WHERE term IN (SELECT DISTINCT term FROM nar_terms) GROUP BY 1
),
nar_scored AS (
  SELECT q.query_id, p.doc_id,
         sum( ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * (p.tf * (1.2 + 1.0))
              / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl)) ) AS score,
         count(*)::INT AS matched
  FROM postings p
  JOIN nar_tdf d USING (term)
  JOIN nar_terms q USING (term)
  JOIN doclen l USING (doc_id)
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
nar_hits AS (
  SELECT query_id, doc_id, score, rank FROM (
    SELECT s.query_id, s.doc_id, round(s.score, 6) AS score,
           row_number() OVER (PARTITION BY s.query_id
                              ORDER BY round(s.score, 6) DESC, s.doc_id ASC) AS rank
    FROM nar_scored s JOIN nar_n n USING (query_id)
    WHERE s.matched = n.n_terms
  ) WHERE rank <= {ROUTED_N}
),
ar_ids AS (SELECT query_id FROM intents WHERE intent = 'contextual_arabic'),
ar_hits AS (
  SELECT query_id, doc_id, score, rank FROM (
    SELECT ia AS query_id, ib AS doc_id, round(d, 6) AS score,
           row_number() OVER (PARTITION BY ia
                              ORDER BY round(d, 6) DESC, ib ASC) AS rank
    FROM pair_dot
    WHERE ia IN (SELECT query_id FROM ar_ids) AND ia <> ib
  ) WHERE rank <= {ROUTED_N}
),
hm_ids AS (SELECT query_id FROM intents WHERE intent IN ('thematic', 'mixed')),
hm_terms AS (
  SELECT DISTINCT query_id, t.term
  FROM intents, unnest({tok_expr.format(src='query_text')}) AS t(term)
  WHERE intent IN ('thematic', 'mixed')
),
hm_tdf AS (
  SELECT term, count(*)::DOUBLE AS df
  FROM postings WHERE term IN (SELECT DISTINCT term FROM hm_terms) GROUP BY 1
),
hm_bm25 AS (
  SELECT q.query_id, p.doc_id,
         sum( ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
              * (p.tf * (1.2 + 1.0))
              / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl)) ) AS score
  FROM postings p
  JOIN hm_tdf d USING (term)
  JOIN hm_terms q USING (term)
  JOIN doclen l USING (doc_id)
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
hm_fts AS (
  SELECT query_id, doc_id, fts_score FROM (
    SELECT query_id, doc_id, round(score, 6) AS fts_score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 6) DESC, doc_id ASC) AS rn
    FROM hm_bm25
  ) WHERE rn <= {ROUTED_OVERFETCH}
),
hm_vec AS (
  SELECT query_id, doc_id, vector_sim FROM (
    SELECT ia AS query_id, ib AS doc_id, round(d, 6) AS vector_sim,
           row_number() OVER (PARTITION BY ia
                              ORDER BY round(d, 6) DESC, ib ASC) AS rn
    FROM pair_dot
    WHERE ia IN (SELECT query_id FROM hm_ids) AND ia <> ib
  ) WHERE rn <= {ROUTED_OVERFETCH}
),
hm_fused AS (
  SELECT coalesce(f.query_id, v.query_id) AS query_id,
         coalesce(f.doc_id, v.doc_id)     AS doc_id,
         coalesce(f.fts_score, 0.0)       AS fts_score,
         coalesce(v.vector_sim, 0.0)      AS vector_sim
  FROM hm_fts f
  FULL OUTER JOIN hm_vec v ON f.query_id = v.query_id AND f.doc_id = v.doc_id
),
hm_ntoks AS (SELECT query_id, count(*)::DOUBLE AS n_toks FROM hm_terms GROUP BY 1),
hm_covs AS (
  SELECT u.query_id, u.doc_id,
         sum(CASE WHEN strpos(lower(d.text), t.term) > 0 THEN 1 ELSE 0 END)::DOUBLE
           / max(n.n_toks) AS cov
  FROM hm_fused u
  JOIN documents d ON u.doc_id = d.doc_id
  JOIN hm_terms t ON t.query_id = u.query_id
  JOIN hm_ntoks n ON n.query_id = u.query_id
  GROUP BY u.query_id, u.doc_id
),
hm_hits AS (
  SELECT query_id, doc_id, score, rank FROM (
    SELECT u.query_id, u.doc_id,
           round(least(1.0, greatest(0.0,
             {w.vector} * least(1.0, greatest(0.0, u.vector_sim))
             + {w.fts} * (greatest(0.0, u.fts_score)
                          / (greatest(0.0, u.fts_score) + 1.0))
             + {w.coverage} * c.cov)), 6) AS score,
           row_number() OVER (PARTITION BY u.query_id ORDER BY
             round(least(1.0, greatest(0.0,
               {w.vector} * least(1.0, greatest(0.0, u.vector_sim))
               + {w.fts} * (greatest(0.0, u.fts_score)
                            / (greatest(0.0, u.fts_score) + 1.0))
               + {w.coverage} * c.cov)), 6) DESC, u.doc_id ASC) AS rank
    FROM hm_fused u
    JOIN hm_covs c ON u.query_id = c.query_id AND u.doc_id = c.doc_id
  ) WHERE rank <= {ROUTED_N}
)
SELECT u.query_id, i.intent, u.doc_id, u.score, CAST(u.rank AS INT) AS rank
FROM (SELECT * FROM lookup_hits UNION ALL
      SELECT * FROM nar_hits  UNION ALL
      SELECT * FROM ar_hits   UNION ALL
      SELECT * FROM hm_hits) u
JOIN intents i USING (query_id)
"""
