"""Embedder backend selection, geometry, and the real-model branch
(SURVEY §2.8 V1/V2; ref /root/reference/quran_mcp/embeddings.py:28-37)."""

import math

import pytest

from hadith_vector_search_spark.operators import embedder


def test_default_dim_is_reference_geometry():
    assert embedder.DEFAULT_DIM == 384  # all-MiniLM-L6-v2


def test_hash_backend_block_scheme():
    m = embedder.get_model(384, backend="hash")
    assert isinstance(m, embedder.HashEmbedder)
    assert m.n_blocks == 12  # 384 dims / 32 hex digits per md5
    v = m.encode("alpha beta gamma")
    assert len(v) == 384
    assert abs(sum(x * x for x in v) - 1.0) < 1e-12
    # raw mode: exact small-integer components
    r = m.encode("alpha beta gamma", normalize=False)
    assert all(float(x).is_integer() for x in r)
    n = math.sqrt(sum(x * x for x in r))
    assert v == pytest.approx([x / n for x in r])


def test_auto_falls_back_to_hash_without_sentence_transformers():
    if embedder.real_model_available():
        pytest.skip("sentence-transformers installed; fallback not exercised")
    m = embedder.get_model(384, backend="auto")
    assert isinstance(m, embedder.HashEmbedder)


def test_singleton_cache_keyed_by_backend_and_dim():
    a = embedder.get_model(384, backend="hash")
    b = embedder.get_model(384, backend="hash")
    c = embedder.get_model(64, backend="hash")
    assert a is b and a is not c


def test_st_backend_rejects_wrong_dim():
    with pytest.raises(ValueError, match="384"):
        embedder.get_model(8, backend="st")


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="backend"):
        embedder.get_model(384, backend="bogus")


def test_real_model_branch_encodes():
    """Skipped unless sentence-transformers is importable (it is not in
    this container). Proves the production branch: model loads lazily,
    batch-encodes at 384 dims, L2-normalized."""
    pytest.importorskip("sentence_transformers")
    m = embedder.get_model(384, backend="st")
    assert isinstance(m, embedder.SentenceTransformerEmbedder)
    vecs = m.encode_batch(["the quick brown fox", "hello world"])
    assert len(vecs) == 2 and all(len(v) == 384 for v in vecs)
    for v in vecs:
        assert abs(sum(x * x for x in v) - 1.0) < 1e-6


def test_real_model_raw_mode_rejected():
    m = embedder.SentenceTransformerEmbedder()
    with pytest.raises(ValueError, match="normaliz"):
        m.encode_batch(["x"], normalize=False)
