"""Batch text embedding via Arrow-batched pandas UDFs (SURVEY §2.8 V1/V2).

The reference encodes with a SentenceTransformer loaded lazily once per
process (/root/reference/mcp_server/apps/embeddings.py:257-275,
/root/reference/quran_mcp/embeddings.py:28-37). The Spark-native shape is
identical in structure, distributed in execution:

- a **Series -> Series pandas UDF** so text batches cross the JVM/Python
  boundary as Arrow record batches (the reference's batch_size=64 loop
  becomes `spark.sql.execution.arrow.maxRecordsPerBatch`),
- a **lazy per-executor model singleton** — the module-level cache below is
  populated once per Python worker process, exactly how real model weights
  should be held resident (never broadcast per-row, never reloaded per
  batch).

The model here is a deterministic stand-in (the real sentence-transformer
is not in this container): a signed-random-projection bag-of-tokens encoder
whose "weights" are md5-derived ±1 signs per (dim, token), memoized like an
embedding table. It is L2-normalized float64, so dot == cosine downstream,
and it is exactly reproducible in SQL — which makes the whole
embed->index->search path oracle-checkable end to end. Swapping in a real
model changes ONLY `HashEmbedder.encode`; every Spark-side contract (UDF
signature, Arrow batching, lazy singleton, normalized output) is the
production shape.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from ..functions.text import py_tokenize

DEFAULT_DIM = 8

_MODEL_CACHE: dict[int, "HashEmbedder"] = {}


class HashEmbedder:
    """Deterministic bag-of-tokens encoder: dim j of a text is the sum over
    its tokens of ±1 (sign = first md5 hex digit of "j|token" < '8'),
    L2-normalized. The sign table is memoized per (dim, token) — the
    moral equivalent of resident model weights."""

    def __init__(self, dim: int = DEFAULT_DIM) -> None:
        self.dim = dim
        self._signs: dict[tuple[int, str], float] = {}

    def _sign(self, j: int, tok: str) -> float:
        key = (j, tok)
        s = self._signs.get(key)
        if s is None:
            h = hashlib.md5(f"{j}|{tok}".encode("utf-8")).hexdigest()
            s = 1.0 if h[0] < "8" else -1.0
            self._signs[key] = s
        return s

    def encode(self, text: str) -> list[float]:
        v = [0.0] * self.dim
        for tok in py_tokenize(text or ""):
            for j in range(self.dim):
                v[j] += self._sign(j, tok)
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0.0 else v


def get_model(dim: int = DEFAULT_DIM) -> HashEmbedder:
    """Lazy per-process singleton (V1's executor-cached model)."""
    model = _MODEL_CACHE.get(dim)
    if model is None:
        model = HashEmbedder(dim)
        _MODEL_CACHE[dim] = model
    return model


def make_embedder(dim: int = DEFAULT_DIM):
    """Returns a pandas UDF: text column -> array<double> embedding column.
    The UDF body runs in executor Python workers; `get_model` resolves the
    singleton there, not on the driver."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def embed(texts: pd.Series) -> pd.Series:
        model = get_model(dim)
        return texts.map(model.encode)

    return embed


def embed_column(text_col: Column | str, dim: int = DEFAULT_DIM) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return make_embedder(dim)(c)


def encode_query(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """V2: driver-side single-query embedding with the same model — becomes
    a constant-folded literal vector in the query plan."""
    return get_model(dim).encode(text)
