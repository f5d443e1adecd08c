"""Multimodal-pipeline queries: binary payload decode, frame sampling
(row fan-out), and per-frame feature extraction via mapInPandas
(operators/multimodal.py), each with a DuckDB oracle.

Oracle note: payloads are utf-8 bytes of `text`, and the test corpus is
verified pure ASCII at every SF, so the oracle's character slicing
(`substr`) equals the operator's byte slicing — DuckDB cannot slice BLOBs.
The Spark side always operates on real bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal
from ..sources import load_table

FRAME_EVERY = 2
N_FEATURES = 4


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.decode_metadata(multimodal.with_payload(docs))


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.sample_frames(multimodal.with_payload(docs), every=FRAME_EVERY)


def multimodal_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame features, exploded to (doc_id, frame_idx, dim, value) —
    the correctness harness canonicalizes through pandas, which cannot
    sort/hash raw array<double> cells."""
    docs = load_table(spark, sf_dir, "documents")
    frames = multimodal.sample_frames(multimodal.with_payload(docs), every=FRAME_EVERY)
    feats = multimodal.frame_features(frames, N_FEATURES)
    return feats.select(
        "doc_id", "frame_idx", F.posexplode("features").alias("dim", "value"))


# ---------------------------------------------------------------------------
# Oracles — replay fake_decode_meta / frame_bounds arithmetic in SQL.
# ---------------------------------------------------------------------------

_META_CTE = """
meta AS (
  SELECT doc_id,
         text,
         octet_length(encode(text))                       AS n_bytes,
         16 + octet_length(encode(text)) % 509            AS width,
         16 + (octet_length(encode(text)) * 31) % 509     AS height,
         1 + octet_length(encode(text)) % 24              AS n_frames,
         CASE octet_length(encode(text)) % 3
           WHEN 0 THEN 'img' WHEN 1 THEN 'vid' ELSE 'aud' END AS format
  FROM documents
)
"""

_FRAMES_CTE = f"""
{_META_CTE},
sized AS (
  SELECT *, greatest(1, CAST(ceil(n_bytes::DOUBLE / n_frames) AS BIGINT)) AS sz
  FROM meta
),
frames AS (
  SELECT doc_id,
         CAST(i AS INT)                                   AS frame_idx,
         CAST(least((i + 1) * sz, n_bytes) - i * sz AS INT) AS frame_bytes,
         sha256(substr(text, (i * sz)::BIGINT + 1,
                       (least((i + 1) * sz, n_bytes) - i * sz)::BIGINT)) AS frame_sha
  FROM sized, unnest(range(0, n_frames)) AS r(i)
  WHERE i * sz < n_bytes AND i % {FRAME_EVERY} = 0
)
"""


def multimodal_metadata_oracle() -> str:
    return f"""
WITH {_META_CTE}
SELECT doc_id, CAST(n_bytes AS INT) AS n_bytes, CAST(width AS INT) AS width,
       CAST(height AS INT) AS height, CAST(n_frames AS INT) AS n_frames, format
FROM meta
"""


def multimodal_frames_oracle() -> str:
    return f"""
WITH {_FRAMES_CTE}
SELECT doc_id, frame_idx, frame_bytes, frame_sha FROM frames
"""


def multimodal_frame_features_oracle() -> str:
    feats = ", ".join(
        f"(strpos('0123456789abcdef', substr(frame_sha, {j + 1}, 1)) - 1)::DOUBLE"
        for j in range(N_FEATURES))
    return f"""
WITH {_FRAMES_CTE}
SELECT doc_id, frame_idx,
       generate_subscripts(f, 1) - 1 AS dim,
       CAST(unnest(f) AS DOUBLE)     AS value
FROM (SELECT doc_id, frame_idx, [{feats}] AS f FROM frames)
"""
