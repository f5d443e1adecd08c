"""Whole-index staleness gate (sources.manifest): the reference rebuilds
its embedding cache when model name, entry count, or the source manifest
drifts (/root/reference/quran_mcp/embeddings.py:48-57). These tests drive
`ensure_index` through every invalidation class over a real parquet
embedding cache built with the pandas-UDF encoder."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hadith_vector_search_spark.operators.embedder import embed_column
from hadith_vector_search_spark.sources import (
    IndexManifest,
    ensure_index,
    read_manifest,
    source_fingerprint,
)

DIM = 16


def _setup(spark, tmp_path):
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "emb_index")
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon zeta")],
        "doc_id long, text string")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    return src, idx


def _current(spark, src, idx, model="hash", dim=DIM):
    n = spark.read.parquet(src).count()
    return IndexManifest(model_name=model, dim=dim, n_rows=n,
                         source_files=source_fingerprint([src]))


def _builder(spark, src, idx, calls):
    def build():
        calls.append(1)
        (spark.read.parquet(src)
         .select("doc_id", embed_column("text", DIM, backend="hash").alias("emb"))
         .write.mode("overwrite").parquet(os.path.join(idx, "data")))
    return build


def test_build_reuse_and_invalidation_classes(spark, tmp_path):
    src, idx = _setup(spark, tmp_path)
    calls: list[int] = []
    build = _builder(spark, src, idx, calls)

    # 1. cold: builds and stamps
    reasons = ensure_index(idx, _current(spark, src, idx), build)
    assert reasons == ["no manifest"] and len(calls) == 1
    assert read_manifest(idx) is not None
    assert spark.read.parquet(os.path.join(idx, "data")).count() == 3

    # 2. warm: identical inputs reuse the cache — build NOT called
    assert ensure_index(idx, _current(spark, src, idx), build) == []
    assert len(calls) == 1

    # 3. model swap invalidates even with identical rows
    reasons = ensure_index(idx, _current(spark, src, idx, model="st"), build)
    assert any("model changed" in r for r in reasons) and len(calls) == 2

    # 4. dim swap invalidates
    reasons = ensure_index(idx, _current(spark, src, idx, model="st", dim=32),
                           build)
    assert any("dim changed" in r for r in reasons) and len(calls) == 3

    # 5. file replaced in place (same schema/rows, new mtime) invalidates —
    #    the drift row-level checksums cannot see
    part = next(os.path.join(src, f) for f in os.listdir(src)
                if f.endswith(".parquet"))
    os.utime(part, ns=(os.stat(part).st_mtime_ns + 10**9,) * 2)
    reasons = ensure_index(idx, _current(spark, src, idx, model="st", dim=32),
                           build)
    assert any("source files" in r for r in reasons) and len(calls) == 4

    # 6. row-count drift invalidates
    cur = _current(spark, src, idx, model="st", dim=32)
    cur.n_rows += 1
    reasons = ensure_index(idx, cur, build)
    assert any("row count" in r for r in reasons) and len(calls) == 5

    # 7. corrupted manifest file == stale
    mpath = os.path.join(idx, "_index_manifest.json")
    with open(mpath, "w") as fh:
        fh.write("{not json")
    assert read_manifest(idx) is None
    reasons = ensure_index(idx, cur, build)
    assert reasons == ["no manifest"] and len(calls) == 6
