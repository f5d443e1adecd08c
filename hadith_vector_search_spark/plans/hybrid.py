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
from pyspark.sql.window import Window

from ..functions.text import contains_phrase, py_tokenize, term_coverage
from ..operators import bm25 as bm25_ops
from ..operators import dedup, fusion, proximity, similarity
from ..plans.lexical import _sql_tokens_cte, get_index
from ..plans.semantic import _PAIR_DOT
from ..sources import load_table
from ..localrel import local_df

# The fixed hybrid query carries a quoted phrase so the router-shaped
# phrase/proximity bonuses (ref scoring.py:52-54,72-93) are live paths:
# tokens = (window, data, stream); phrase = "window data"; the proximity
# groups are the first two tokens within the reference's near_window=5.
HYBRID_QUERY = '"window data" stream'
HYBRID_PHRASE = "window data"
HYBRID_PROX_A = ("window",)
HYBRID_PROX_B = ("data",)
HYBRID_PROX_WINDOW = 5  # ref near_window default, scoring.py:44
HYBRID_VEC_ID = 0
HYBRID_N = 10
BATCH_N = 5
OVERFETCH = 50  # max(50, 5*n) per the reference


def _hybrid(spark: SparkSession, sf_dir: str, mode: str,
            fts_available: bool = True) -> DataFrame:
    w = fusion.resolve_weights(mode, fts_available=fts_available)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    if fts_available:
        fts = bm25_ops.bm25_topk(spark, docs, HYBRID_QUERY, k=OVERFETCH,
                                 conjunctive=False,
                                 index=get_index(spark, sf_dir)).select("doc_id", "bm25")
    else:
        # Q4 degradation: the lexical leg is down — a zero-row leg with the
        # right schema keeps the fused pipeline shape identical.
        fts = (docs.select("doc_id").limit(0)
               .withColumn("bm25", F.lit(0.0)))
    vec = (similarity.topk_by_query_id(emb, HYBRID_VEC_ID, OVERFETCH)
           .withColumnRenamed("vec_id", "doc_id"))

    fused = fusion.fuse(fts, vec)
    # J3 backfill: INNER join with the O(k) candidate side broadcast — the
    # documents side streams, no shuffle. Inner is the reference's own
    # semantics (quran_mcp/search.py:219-221 skips hits with no corpus
    # entry), and it is also the only shape Spark can broadcast the
    # candidates into: an outer join can never build its preserved side.
    # Pin the O(k) candidate frame: it feeds BOTH the proximity probe and
    # the scoring path, and without the pin each consumer re-runs the whole
    # two-leg retrieval (measured ~2x on the hybrid query).
    with_text = (F.broadcast(fused)
                 .join(docs.select("doc_id", "text"), "doc_id")
                 .localCheckpoint())

    # Proximity over the CANDIDATE texts only (O(k) rows), not the corpus:
    # one posexplode + tiny window, joined back broadcast.
    prox = proximity.min_pair_distance(with_text, HYBRID_PROX_A, HYBRID_PROX_B)
    with_prox = with_text.join(F.broadcast(prox), "doc_id", "left")

    toks = F.array(*[F.lit(t) for t in py_tokenize(HYBRID_QUERY)])
    cov = term_coverage(toks, F.lower(F.col("text")))
    phr_hit = contains_phrase(F.col("text"), HYBRID_PHRASE)
    prox_hit = F.col("min_dist") <= HYBRID_PROX_WINDOW
    scored = fusion.score(with_prox, w, coverage_col=cov,
                          phrase_hit_col=phr_hit, proximity_hit_col=prox_hit)

    # D1 fused-result dedup (ref quran_mcp/search.py:262-278): candidates
    # sharing a text-preview block keep only the best-ranked row; the count
    # of dropped rows is reported as `duplicates_filtered`.
    preview = F.substring(F.col("text"), 1, 60)
    return (
        dedup.fused_result_dedup(scored, preview)
        .select("doc_id", "score", "vec_signal", "fts_sig", "coverage",
                "phrase_bonus", "proximity_bonus", "duplicates_filtered",
                preview.alias("preview"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(HYBRID_N)
    )


def hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced mode: vector 0.6 / fts 0.4 / coverage 0.2."""
    return _hybrid(spark, sf_dir, "balanced")


def hybrid_search_explained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced hybrid with the spec'd per-hit explanation emitted
    IN-PLAN (`fusion.explanation_col`, HADITH_SEARCH_SPEC.md:487-496 —
    the reference designed the string but never shipped the generator);
    the oracle replays the tier CASE over the same fused signals. The
    narrator/grading tiers are exercised by `graded_search`'s
    explanation and the engine/serving tests — this plan's corpus
    carries neither column."""
    base = _hybrid(spark, sf_dir, "balanced")
    return base.withColumn("explanation", fusion.explanation_col(
        coverage=F.col("coverage"), phrase_bonus=F.col("phrase_bonus")))


def hybrid_explained_oracle_sql() -> str:
    pct = "CAST(round(coverage * 100, 0) AS INT)::VARCHAR"
    return f"""
SELECT *, CASE
  WHEN phrase_bonus > 0 THEN '🎯 Perfect: Contains your exact phrase'
  WHEN coverage >= 0.8
    THEN concat('✅ Good: Contains ', {pct}, '% of your terms')
  ELSE '🔄 Semantic: Similar meaning, different wording'
END AS explanation
FROM ({hybrid_oracle_sql("balanced")})
"""


def hybrid_search_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-of-queries hybrid search: N queries routed through BOTH legs,
    fused, scored, and ranked per query in ONE DataFrame plan — the
    throughput shape SURVEY §3.1 calls the natural Spark unit. Lexical leg
    = batch BM25 (qterms table join); semantic leg = batch k-NN (broadcast
    query vectors); fusion keys on (query_id, doc_id); per-query top-n via
    window. Query q's pseudo-embedding is embeddings row vec_id == q."""
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
    # Candidates are O(queries * k) -> broadcast into the documents scan
    # (inner join = the reference's skip-missing semantics; see _hybrid).
    with_text = F.broadcast(fused).join(docs.select("doc_id", "text"), "doc_id")
    tok_rows = [(qid, sorted(set(py_tokenize(q)))) for qid, q in BATCH_QUERIES]
    tokens_df = local_df(spark, tok_rows, "query_id int, toks array<string>")
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


def hybrid_search_degraded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4/Q5 graceful degradation, oracle-checked: the FTS leg is
    unavailable, so resolve_weights re-routes all retrieval weight to the
    vector leg (tools.py:85-89, search.py:203-215) and the pipeline serves
    vector-only results through the unchanged fused shape."""
    return _hybrid(spark, sf_dir, "balanced", fts_available=False)


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
         round(least(1.0, greatest(0.0,
           {w.vector} * vsig + {w.fts} * fsig + {w.coverage} * cov)), 6) AS score,
         round(vsig, 6) AS vec_signal,
         round(fsig, 6) AS fts_sig,
         round(cov, 6)  AS coverage,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(least(1.0, greatest(0.0,
             {w.vector} * vsig + {w.fts} * fsig + {w.coverage} * cov)), 6) DESC,
                    doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, score, vec_signal, fts_sig, coverage,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {BATCH_N}
"""


def hybrid_oracle_sql(mode: str, fts_available: bool = True) -> str:
    """DuckDB oracle: the same two legs, fusion, phrase/proximity bonuses,
    scoring (clamped like ref scoring.py:96-97), and fused-result dedup in
    one SQL statement — generated from the same constants and presets.
    `fts_available=False` replays the Q4 degradation: an empty lexical leg
    and the re-routed weights."""
    w = fusion.resolve_weights(mode, fts_available=fts_available)
    terms = sorted(set(py_tokenize(HYBRID_QUERY)))
    values = ", ".join(f"('{t}')" for t in terms)
    cov_expr = " + ".join(
        f"(CASE WHEN strpos(lower(d.text), '{t}') > 0 THEN 1 ELSE 0 END)" for t in terms
    )
    ga = ", ".join(f"'{t}'" for t in HYBRID_PROX_A)
    gb = ", ".join(f"'{t}'" for t in HYBRID_PROX_B)
    score_expr = (f"round(least(1.0, greatest(0.0, {w.vector} * vsig "
                  f"+ {w.fts} * fsig + {w.coverage} * cov + phr + prx)), 6)")
    fts_leg_sql = f"""
  SELECT doc_id, round(score, 6) AS fts_score
  FROM bm25_scored ORDER BY round(score, 6) DESC, doc_id ASC LIMIT {OVERFETCH}
""" if fts_available else """
  SELECT doc_id, fts_score
  FROM (SELECT CAST(NULL AS BIGINT) AS doc_id, 0.0 AS fts_score) WHERE FALSE
"""
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
fts_leg AS ({fts_leg_sql}),
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
prox_toks AS (
  SELECT doc_id, generate_subscripts(ts, 1) AS pos, unnest(ts) AS term
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9_؀-ۿ]+'),
                           x -> length(x) >= 2) AS ts
        FROM documents)
),
prox_lagged AS (
  SELECT doc_id, pos, grp, lag(pos) OVER w AS prev_pos, lag(grp) OVER w AS prev_grp
  FROM (SELECT doc_id, pos,
               CASE WHEN term IN ({ga}) THEN 'a' ELSE 'b' END AS grp
        FROM prox_toks WHERE term IN ({ga}) OR term IN ({gb}))
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
prox AS (
  SELECT doc_id, min(pos - prev_pos) AS min_dist
  FROM prox_lagged
  WHERE prev_grp IS NOT NULL AND grp <> prev_grp
  GROUP BY doc_id
),
scored AS (
  SELECT u.doc_id,
         least(1.0, greatest(0.0, u.vector_sim))                          AS vsig,
         greatest(0.0, u.fts_score) / (greatest(0.0, u.fts_score) + 1.0)  AS fsig,
         ({cov_expr})::DOUBLE / {len(terms)}                              AS cov,
         CASE WHEN strpos(lower(d.text), '{HYBRID_PHRASE}') > 0
              THEN {w.phrase} ELSE 0.0 END                                AS phr,
         CASE WHEN px.min_dist <= {HYBRID_PROX_WINDOW}
              THEN {w.proximity} ELSE 0.0 END                             AS prx,
         substr(d.text, 1, 60)                                            AS preview
  FROM fused u
  JOIN documents d      ON u.doc_id = d.doc_id
  LEFT JOIN prox px     ON u.doc_id = px.doc_id
),
keyed AS (
  SELECT doc_id, {score_expr} AS score,
         round(vsig, 6) AS vec_signal, round(fsig, 6) AS fts_sig,
         round(cov, 6) AS coverage, round(phr, 6) AS phrase_bonus,
         round(prx, 6) AS proximity_bonus, preview,
         coalesce(NULLIF(trim(preview), ''), doc_id::VARCHAR) AS dkey
  FROM scored
),
deduped AS (
  SELECT *, row_number() OVER (PARTITION BY dkey
                               ORDER BY score DESC, doc_id ASC) AS rn
  FROM keyed
),
dups AS (SELECT count(*) AS duplicates_filtered FROM deduped WHERE rn > 1)
SELECT doc_id, score, vec_signal, fts_sig, coverage, phrase_bonus,
       proximity_bonus, dups.duplicates_filtered, preview
FROM deduped CROSS JOIN dups
WHERE rn = 1
ORDER BY score DESC, doc_id ASC
LIMIT {HYBRID_N}
"""


def ltr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning-to-rank training-data exporter: the per-(query, candidate)
    FEATURE TABLE an LTR model trains on — lexical score, vector
    similarity, term coverage, document length, and raw size for every
    candidate either retrieval leg surfaces. This is the hybrid batch
    pipeline stopped one step before fusion weights: instead of combining
    the signals with fixed weights, ship them so a ranker can learn the
    weights — the standard path from a hand-tuned scorer (the reference's
    scoring.py) to a trained one. Same legs, same O(queries·k) candidate
    frame broadcast into the corpus-side joins."""
    from .lexical import BATCH_QUERIES, get_index

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

    idx = get_index(spark, sf_dir)
    with_doc = (F.broadcast(fused)
                .join(docs.select("doc_id", "text", "n_chars"), "doc_id"))
    with_dl = F.broadcast(with_doc).join(idx.doc_len, "doc_id")
    tok_rows = [(qid, sorted(set(py_tokenize(q)))) for qid, q in BATCH_QUERIES]
    tokens_df = local_df(spark, tok_rows,
                         "query_id int, toks array<string>")
    cov = term_coverage(F.col("toks"), F.lower(F.col("text")))
    return (with_dl.join(F.broadcast(tokens_df), "query_id")
            .select("query_id", "doc_id",
                    F.col("fts_score").alias("bm25"),
                    "vector_sim",
                    F.round(cov, 6).alias("coverage"),
                    "dl", "n_chars"))


def ltr_features_oracle() -> str:
    from .lexical import BATCH_QUERIES

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
         coalesce(f.fts_score, 0.0)       AS bm25,
         coalesce(v.vector_sim, 0.0)      AS vector_sim
  FROM fts_leg f
  FULL OUTER JOIN vec_leg v ON f.query_id = v.query_id AND f.doc_id = v.doc_id
),
covs AS (
  SELECT u.query_id, u.doc_id,
         sum(CASE WHEN strpos(lower(d.text), t.term) > 0
                  THEN 1 ELSE 0 END)::DOUBLE / max(n.n_toks) AS cov
  FROM fused u
  JOIN documents d ON u.doc_id = d.doc_id
  JOIN qterms t ON t.query_id = u.query_id
  JOIN ntoks n ON n.query_id = u.query_id
  GROUP BY u.query_id, u.doc_id
)
SELECT u.query_id, u.doc_id, u.bm25, u.vector_sim,
       round(c.cov, 6) AS coverage, l.dl, d.n_chars
FROM fused u
JOIN covs c ON u.query_id = c.query_id AND u.doc_id = c.doc_id
JOIN doclen l ON l.doc_id = u.doc_id
JOIN documents d ON d.doc_id = u.doc_id
"""


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion — the rank-based alternative to weighted fusion
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard damping constant (Cormack et al. 2009)


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval fused by reciprocal rank instead of weighted
    scores: rrf = sum over legs of 1/(RRF_K + rank). Rank-based fusion
    needs no score calibration between legs (BM25 is unbounded, cosine is
    [-1,1]), which is why it is the other standard fusion in hybrid
    search engines; the reference's weighted fusion (scoring.py:96-97)
    stays the default, this is the alternative a user of any hybrid
    engine expects to find.

    Both legs are top-OVERFETCH limited before fusion, so ranking and
    everything after is O(k). Ranks order by (rounded score desc, doc_id
    asc) — rounding BEFORE ranking makes the rank, and therefore the
    fused score, reproducible across engines and FP summation orders."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    fts = (bm25_ops.bm25_topk(spark, docs, HYBRID_QUERY, k=OVERFETCH,
                              conjunctive=False,
                              index=get_index(spark, sf_dir))
           .select("doc_id", F.round("bm25", 6).alias("bm25")))
    vec = (similarity.topk_by_query_id(emb, HYBRID_VEC_ID, OVERFETCH)
           .select(F.col("vec_id").alias("doc_id"), "sim"))

    wf = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    wv = Window.orderBy(F.desc("sim"), F.asc("doc_id"))
    fts_r = fts.select("doc_id", F.row_number().over(wf).alias("fts_rank"))
    vec_r = vec.select("doc_id", F.row_number().over(wv).alias("vec_rank"))

    fused = (fts_r.join(vec_r, "doc_id", "full_outer")
             .select(
                 "doc_id", "fts_rank", "vec_rank",
                 F.round(
                     F.coalesce(1.0 / (F.lit(RRF_K) + F.col("fts_rank")),
                                F.lit(0.0))
                     + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("vec_rank")),
                                  F.lit(0.0)), 6).alias("rrf_score")))
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(HYBRID_N)


def hybrid_rrf_oracle_sql() -> str:
    """DuckDB oracle: the identical legs (postings BM25, pairwise-dot
    cosine), the identical rounded-score ranking, and the same
    1/(K+rank) fold."""
    terms = sorted(set(py_tokenize(HYBRID_QUERY)))
    values = ", ".join(f"('{t}')" for t in terms)
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
  SELECT doc_id, round(score, 6) AS bm25
  FROM bm25_scored ORDER BY round(score, 6) DESC, doc_id ASC LIMIT {OVERFETCH}
),
{_PAIR_DOT},
vec_leg AS (
  SELECT ib AS doc_id, round(d, 6) AS sim
  FROM pair_dot WHERE ia = {HYBRID_VEC_ID}
  ORDER BY round(d, 6) DESC, ib ASC LIMIT {OVERFETCH}
),
fts_ranked AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INTEGER)
             AS fts_rank
  FROM fts_leg
),
vec_ranked AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS INTEGER)
             AS vec_rank
  FROM vec_leg
)
SELECT coalesce(f.doc_id, v.doc_id) AS doc_id,
       f.fts_rank, v.vec_rank,
       round(coalesce(1.0 / ({RRF_K} + f.fts_rank), 0.0)
             + coalesce(1.0 / ({RRF_K} + v.vec_rank), 0.0), 6) AS rrf_score
FROM fts_ranked f FULL OUTER JOIN vec_ranked v ON f.doc_id = v.doc_id
ORDER BY rrf_score DESC, coalesce(f.doc_id, v.doc_id) ASC
LIMIT {HYBRID_N}
"""
