"""Embedding-pipeline queries (SURVEY §2.8 V1/V2 + V3 composed): batch
document embedding through the Arrow pandas UDF, and the full
embed -> score -> top-k search path with a driver-side query embedding.

These run at the reference model's real geometry — dim=384, the
all-MiniLM-L6-v2 shape (/root/reference/quran_mcp/embeddings.py:28-37) —
through the deterministic hash backend, so every query pays a realistic
per-vector cost AND stays oracle-checkable: the encoder (sign j of a token
= hex digit (j mod 32) of md5("{j//32}|token"), summed over the doc's
token multiset, L2-normalized) is replayed exactly in DuckDB SQL below.
The `backend="hash"` pin means correctness never depends on whether the
real sentence-transformer happens to be importable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import TOKEN_SPLIT_RE
from ..functions.vector import dot, norm, vector_lit
from ..operators.embedder import (_HEX_PER_DIGEST, embed_column,
                                  encode_query, spread_for_encode)
from ..sources import load_table

DIM = 384
N_BLOCKS = -(-DIM // _HEX_PER_DIGEST)
QUERY_TEXT = "quality filtering and near duplicate detection for training data"
TOPK = 10


def embed_documents_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1: every doc through the pandas-UDF encoder; components rounded for
    display/compare. One narrow projection — embedding at 100 TB is an
    embarrassingly parallel map over partitions.

    Emitted exploded as (doc_id, dim, value) rather than a raw
    array<double> column: the correctness harness canonicalizes results
    through pandas, which cannot sort/hash list cells."""
    docs = spread_for_encode(load_table(spark, sf_dir, "documents"))
    emb = embed_column("text", DIM, backend="hash")
    return docs.select(
        "doc_id",
        F.posexplode(F.transform(emb, lambda x: F.round(x, 6))).alias("dim", "value"))


def embed_and_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2+V3: embed the corpus (executor-side UDF), embed the query once on
    the driver (constant-folded literal), exact cosine top-k with the
    reference's positive-similarity filter (P7,
    /root/reference/quran_mcp/search.py:168-169).

    The cosine is computed from the RAW integer sign-sum vectors:
    dot(raw, q_raw) and ||raw||² are exact small-integer sums in double
    (order-insensitive), so the whole score is one sqrt + one multiply +
    one divide — bit-identical between Spark's fold and DuckDB's SUM at
    384 dims, where a normalized-vector dot would depend on summation
    order at the last ulp."""
    docs = spread_for_encode(load_table(spark, sf_dir, "documents"))
    q_raw = encode_query(QUERY_TEXT, DIM, backend="hash", normalize=False)
    qn = math.sqrt(sum(t * t for t in q_raw))
    raw = embed_column("text", DIM, backend="hash", normalize=False)
    # Pin the UDF output (lazy checkpoint) BEFORE fanning it into the norm
    # guard and the dot product: projection collapse would otherwise
    # substitute the pandas-UDF expression into every use site, and the
    # Python-UDF extraction pass does not dedupe the copies — measured as
    # the corpus being embedded twice (8.0s vs 2.7s at sf0.1). The norm
    # itself is also materialized once instead of per when()-branch.
    raw_emb = docs.select("doc_id", raw.alias("emb")).localCheckpoint(eager=False)
    scored = (raw_emb
              .select("doc_id", "emb", norm("emb").alias("emb_norm"))
              .select("doc_id",
                      F.when(F.col("emb_norm") > 0,
                             F.round(dot("emb", vector_lit(q_raw))
                                     / (F.col("emb_norm") * F.lit(qn)), 6))
                      .alias("sim")))
    return (scored.filter(F.col("sim") > 0)
            .orderBy(F.desc("sim"), F.asc("doc_id"))
            .limit(TOPK))


# ---------------------------------------------------------------------------
# Oracles — replay the encoder in SQL. One md5 digest covers 32 dims (hex
# digit j mod 32 of block j // 32), so a token's full sign vector is the
# concatenation of N_BLOCKS digests — `hx` below.
# ---------------------------------------------------------------------------

def _tok_hex_cte() -> str:
    hx = " || ".join(f"md5('{b}|' || tok)" for b in range(N_BLOCKS))
    return f"""
tok_rows AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                            x -> length(x) >= 2)) AS tok
  FROM documents
),
tok_hex AS (SELECT doc_id, {hx} AS hx FROM tok_rows)
"""


def embed_documents_preview_oracle() -> str:
    # Narrow replay: explode each token's hex signature over the dim axis,
    # sum the ±1 signs per (doc, dim) — integer-exact, so summation order
    # cannot matter — then normalize with the same single division Spark
    # performs. Docs whose every token is filtered get the zero vector.
    return f"""
WITH {_tok_hex_cte()},
comps AS (
  SELECT doc_id, g.j AS dim,
         SUM(CASE WHEN substr(hx, g.j + 1, 1) < '8' THEN 1 ELSE -1 END)::DOUBLE AS s
  FROM tok_hex CROSS JOIN generate_series(0, {DIM - 1}) AS g(j)
  GROUP BY doc_id, g.j
),
norms AS (SELECT doc_id, sqrt(SUM(s * s)) AS nrm FROM comps GROUP BY doc_id)
SELECT d.doc_id, g.j AS dim,
       round(CASE WHEN n.nrm > 0 THEN c.s / n.nrm ELSE 0.0 END, 6) AS value
FROM documents d
CROSS JOIN generate_series(0, {DIM - 1}) AS g(j)
LEFT JOIN comps c ON c.doc_id = d.doc_id AND c.dim = g.j
LEFT JOIN norms n ON n.doc_id = d.doc_id
"""


def embed_and_search_oracle() -> str:
    # Narrow replay of the raw-integer cosine: per-(doc, dim) sign sums,
    # joined against the query's raw vector, aggregated as exact integer
    # sums (num, ssq) — order cannot matter — then the same single
    # sqrt/multiply/divide Spark performs. qn is sqrt of an exact integer,
    # identical on both engines via repr round-trip.
    q_raw = encode_query(QUERY_TEXT, DIM, backend="hash", normalize=False)
    qn = math.sqrt(sum(t * t for t in q_raw))
    qvals = ", ".join(f"({j}, {q_raw[j]!r})" for j in range(DIM))
    return f"""
WITH {_tok_hex_cte()},
comps AS (
  SELECT doc_id, g.j AS dim,
         SUM(CASE WHEN substr(hx, g.j + 1, 1) < '8' THEN 1 ELSE -1 END)::DOUBLE AS s
  FROM tok_hex CROSS JOIN generate_series(0, {DIM - 1}) AS g(j)
  GROUP BY doc_id, g.j
),
qvec(j, t) AS (VALUES {qvals}),
stats AS (
  SELECT c.doc_id,
         SUM(c.s * q.t) AS num,
         SUM(c.s * c.s) AS ssq
  FROM comps c JOIN qvec q ON q.j = c.dim
  GROUP BY c.doc_id
)
SELECT doc_id, round(num / (sqrt(ssq) * {qn!r}), 6) AS sim
FROM stats
WHERE ssq > 0 AND round(num / (sqrt(ssq) * {qn!r}), 6) > 0
ORDER BY sim DESC, doc_id ASC
LIMIT {TOPK}
"""


CHUNK_EMBED_MAX_DOC = 50  # preview scope: bounded gate payload


def embed_chunks_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG ingestion unit end to end: token chunking (overlapping
    windows) -> per-CHUNK embedding through the same Arrow pandas-UDF
    encoder the document path uses. Chunk text re-tokenizes to exactly
    its token slice (chunks are tokens joined by single spaces), so the
    oracle replays the whole pipeline from raw text. Scoped to
    doc_id < CHUNK_EMBED_MAX_DOC to bound the exploded gate payload;
    the plan is the same map-only pass at any scope."""
    from ..operators.textstats import chunk_documents

    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < CHUNK_EMBED_MAX_DOC))
    chunks = spread_for_encode(chunk_documents(docs))
    emb = embed_column("chunk_text", DIM, backend="hash")
    return chunks.select(
        "doc_id", "chunk_id",
        F.posexplode(F.transform(emb, lambda x: F.round(x, 6)))
        .alias("dim", "value"))


def embed_chunks_preview_oracle() -> str:
    from ..operators.textstats import CHUNK_OVERLAP, CHUNK_TOKENS
    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    hx = " || ".join(f"md5('{b}|' || tok)" for b in range(N_BLOCKS))
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                     x -> length(x) >= 2) AS ts
  FROM documents
  WHERE doc_id < {CHUNK_EMBED_MAX_DOC}
),
chunks AS (
  SELECT doc_id,
         CAST((i - 1) // {stride} AS BIGINT) AS chunk_id,
         ts[i:i+{CHUNK_TOKENS}-1] AS ctoks
  FROM toks,
       unnest(range(1, greatest(len(ts) - {CHUNK_OVERLAP}, 1) + 1, {stride}))
         AS r(i)
  WHERE len(ts[i:i+{CHUNK_TOKENS}-1]) >= 1
),
tok_hex AS (
  SELECT doc_id, chunk_id, {hx} AS hx
  FROM (SELECT doc_id, chunk_id, unnest(ctoks) AS tok FROM chunks)
),
comps AS (
  SELECT doc_id, chunk_id, g.j AS dim,
         SUM(CASE WHEN substr(hx, g.j + 1, 1) < '8' THEN 1 ELSE -1 END)::DOUBLE AS s
  FROM tok_hex CROSS JOIN generate_series(0, {DIM - 1}) AS g(j)
  GROUP BY doc_id, chunk_id, g.j
),
norms AS (
  SELECT doc_id, chunk_id, sqrt(SUM(s * s)) AS nrm
  FROM comps GROUP BY doc_id, chunk_id
)
SELECT c.doc_id, c.chunk_id, c.dim,
       round(CASE WHEN n.nrm > 0 THEN c.s / n.nrm ELSE 0.0 END, 6) AS value
FROM comps c JOIN norms n USING (doc_id, chunk_id)
"""
