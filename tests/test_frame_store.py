"""Published derived-frame stores (sources/frame_store.py): the durable
home for the dedup family's per-doc derivations (shingles, simhash,
winnow selection). Publish/reopen equivalence against the in-session
derivations, manifest reuse across sessions, parameter/geometry identity,
doc-bucket delta refresh with untouched buckets byte-invariant, and the
store-first getter wiring in plans.dedup."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hadith_vector_search_spark.operators import dedup
from hadith_vector_search_spark.sources import frame_store


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(spark, n=10):
    return _docs(spark, [
        (i, f"alpha beta gamma delta word{i} epsilon zeta eta theta "
            f"iota kappa tail{i} more body") for i in range(n)])


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _file_states(root):
    out = {}
    for d, _, files in os.walk(root):
        for f in files:
            if f.startswith((".", "_")):
                continue
            p = os.path.join(d, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_mtime_ns, st.st_size)
    return out


@pytest.mark.parametrize("deriver,params,build", [
    ("shingles", {"w": 3},
     lambda d: dedup._collapsed_shingles_lazy(d, "text", "doc_id", 3)),
    ("simhash", {"n_bits": 16},
     lambda d: dedup.simhash_long(d, n_bits=16)),
    ("winnow", {"w": 4, "guarantee": 4},
     lambda d: dedup._winnow_selected(d, 4, 4, "text", "doc_id")
     .select("doc_id", "n_windows", "_sel").distinct()),
])
def test_publish_then_open_matches_in_session(spark, tmp_path, deriver,
                                              params, build):
    idx_dir = str(tmp_path / f"fs_{deriver}")
    docs = _corpus(spark)
    frame_store.publish_frame_store(docs, idx_dir, deriver, params,
                                    n_buckets=4)
    fidx = frame_store.open_frame_store(spark, idx_dir)
    assert fidx.deriver == deriver and fidx.n_buckets == 4
    assert _rows(fidx.rows) == _rows(build(docs))


def test_ensure_reuses_across_sessions_and_gates_params(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    _corpus(spark).write.parquet(src)
    idx_dir = str(tmp_path / "fs_sh")
    docs = spark.read.parquet(src)

    _, reasons1 = frame_store.ensure_frame_store(
        spark, docs, src, idx_dir, "shingles", {"w": 3})
    assert reasons1  # first publish
    before = _file_states(os.path.join(idx_dir, "rows"))
    fidx2, reasons2 = frame_store.ensure_frame_store(
        spark, spark.read.parquet(src), src, idx_dir, "shingles",
        {"w": 3})
    assert reasons2 == []  # byte-for-byte reuse
    assert _file_states(os.path.join(idx_dir, "rows")) == before
    assert fidx2.rows.count() > 0
    # a parameter change is a DIFFERENT model identity -> rebuild
    _, reasons3 = frame_store.ensure_frame_store(
        spark, spark.read.parquet(src), src, idx_dir, "shingles",
        {"w": 5})
    assert any("model" in r for r in reasons3), reasons3


def test_refresh_equals_rebuild_and_untouched_buckets_invariant(
        spark, tmp_path):
    """Change one doc, drop another: the refreshed store equals a
    from-scratch publish of the merged corpus; bucket dirs not touched
    by the batch stay byte-invariant; the derivation comes from the
    layout stamp, not the caller."""
    idx_dir = str(tmp_path / "fs_sim")
    docs = _corpus(spark, 12)
    frame_store.publish_frame_store(docs, idx_dir, "simhash",
                                    {"n_bits": 16}, n_buckets=6)
    before = _file_states(os.path.join(idx_dir, "rows"))

    changed = _docs(spark, [(3, "a completely different document body "
                                "with new words entirely")])
    removed = spark.createDataFrame([(7,)], "doc_id long")
    src = str(tmp_path / "src.parquet")
    merged = (docs.filter(~F.col("doc_id").isin([3, 7]))
              .unionByName(changed))
    merged.write.parquet(src)
    fidx = frame_store.write_frame_refresh(
        spark, idx_dir, changed, removed_ids=removed,
        source_path=src, n_docs=11)

    scratch = str(tmp_path / "fs_scratch")
    frame_store.publish_frame_store(merged, scratch, "simhash",
                                    {"n_bits": 16}, n_buckets=6)
    fresh = frame_store.open_frame_store(spark, scratch)
    assert _rows(fidx.rows) == _rows(fresh.rows)

    after = _file_states(os.path.join(idx_dir, "rows"))
    untouched = [k for k in before if k in after and before[k] == after[k]]
    assert untouched, "no bucket survived byte-invariant"
    # manifest re-stamped against the merged corpus at stored geometry
    assert frame_store.frame_store_is_fresh(idx_dir, src, 11, "simhash",
                                            {"n_bits": 16}, n_buckets=6)


def test_getters_serve_from_store_and_reuse(spark, tmp_path, monkeypatch,
                                            sf_dir):
    """plans.dedup's getters publish into the index root on first touch
    and REUSE the artifact in a fresh cache epoch (no re-derivation —
    the manifest short-circuits), while results equal the in-session
    build."""
    from hadith_vector_search_spark.plans import dedup as dplans

    monkeypatch.setenv("SPARK_GRAFT_INDEX_ROOT", str(tmp_path / "root"))
    # fresh cache epoch so the getter actually runs
    monkeypatch.setattr(dplans, "_INDEX_CACHE", {})
    got = dplans.get_simhash_index(spark, sf_dir, 16)
    from hadith_vector_search_spark.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    want = dedup.simhash_long(docs, n_bits=16)
    assert _rows(got) == _rows(want)

    # second epoch: reuse (rows files untouched)
    token = sf_dir.strip("/").replace("/", "_")
    store_dir = os.path.join(str(tmp_path / "root"),
                             f"{token}_simhash_n_bits16")
    before = _file_states(os.path.join(store_dir, "rows"))
    monkeypatch.setattr(dplans, "_INDEX_CACHE", {})
    got2 = dplans.get_simhash_index(spark, sf_dir, 16)
    assert _file_states(os.path.join(store_dir, "rows")) == before
    assert _rows(got2) == _rows(want)

    # winnow getter still tags its params for the consumer guard
    monkeypatch.setattr(dplans, "_INDEX_CACHE", {})
    sel = dplans.get_winnow_selection(spark, sf_dir)
    assert sel._winnow_params == (dedup.DUPSPAN_W, dedup.WINNOW_GUARANTEE)


@pytest.mark.parametrize("deriver,params,build", [
    ("minhash", {"w": 3, "n_hashes": 8},
     lambda d: dedup.minhash_signatures(
         dedup._collapsed_shingles_lazy(d, "text", "doc_id", 3)
         .select("doc_id", "shingles"), 8)),
])
def test_minhash_store_matches_in_session(spark, tmp_path, deriver,
                                          params, build):
    idx_dir = str(tmp_path / "fs_mh")
    docs = _corpus(spark)
    frame_store.publish_frame_store(docs, idx_dir, deriver, params,
                                    n_buckets=4)
    fidx = frame_store.open_frame_store(spark, idx_dir)
    assert _rows(fidx.rows) == _rows(build(docs))
    # a delta refresh equals a from-scratch publish of the merged corpus
    changed = _docs(spark, [(2, "totally different replacement body "
                                "with many new tokens to shingle")])
    src = str(tmp_path / "mh_src.parquet")
    merged = docs.filter(F.col("doc_id") != 2).unionByName(changed)
    merged.write.parquet(src)
    fidx = frame_store.write_frame_refresh(spark, idx_dir, changed,
                                           source_path=src, n_docs=10)
    scratch = str(tmp_path / "fs_mh_scratch")
    frame_store.publish_frame_store(merged, scratch, deriver, params,
                                    n_buckets=4)
    assert _rows(fidx.rows) == _rows(
        frame_store.open_frame_store(spark, scratch).rows)


def test_textsignals_store_matches_in_session(spark, tmp_path):
    from hadith_vector_search_spark.operators import textstats

    idx_dir = str(tmp_path / "fs_ts")
    docs = spark.createDataFrame(
        [(i, f"alpha beta the and word{i} body text", "en", "s1")
         for i in range(6)] +
        [(10 + i, f"la el de palabra{i} cuerpo", "es", "s2")
         for i in range(4)],
        "doc_id long, text string, lang string, source string")
    frame_store.publish_frame_store(docs, idx_dir, "textsignals",
                                    {"v": 1}, n_buckets=4)
    fidx = frame_store.open_frame_store(spark, idx_dir)
    assert _rows(fidx.rows) == _rows(
        frame_store._derive_textsignals(docs, {}))
    # wide-frame columns present for every consumer
    cols = set(fidx.rows.columns)
    assert {"doc_id", "lang", "source", "predicted", "quality",
            "ws_tokens", "word_tokens", "bpe_est_tokens",
            "fingerprint"} <= cols
    # delta refresh == from-scratch publish of the merged corpus
    changed = spark.createDataFrame(
        [(1, "zzz qqq 1234 !!!", "en", "s1")],
        "doc_id long, text string, lang string, source string")
    src = str(tmp_path / "ts_src.parquet")
    merged = docs.filter(F.col("doc_id") != 1).unionByName(changed)
    merged.write.parquet(src)
    fidx = frame_store.write_frame_refresh(
        spark, idx_dir,
        changed.select("doc_id", "text", "lang", "source"),
        source_path=src, n_docs=10)
    scratch = str(tmp_path / "fs_ts_scratch")
    frame_store.publish_frame_store(merged, scratch, "textsignals",
                                    {"v": 1}, n_buckets=4)
    assert _rows(fidx.rows) == _rows(
        frame_store.open_frame_store(spark, scratch).rows)


def test_minhash_and_textsignal_getters_serve_from_store(
        spark, tmp_path, monkeypatch, sf_dir):
    from hadith_vector_search_spark.plans import dedup as dplans
    from hadith_vector_search_spark.plans import textstats as tplans
    from hadith_vector_search_spark.sources import load_table

    monkeypatch.setenv("SPARK_GRAFT_INDEX_ROOT", str(tmp_path / "root"))
    monkeypatch.setattr(dplans, "_INDEX_CACHE", {})
    docs = load_table(spark, sf_dir, "documents")
    got = dplans.get_minhash_index(spark, sf_dir)
    want = dedup.minhash_signatures(
        dedup._collapsed_shingles_lazy(docs, "text", "doc_id",
                                       dedup.SHINGLE_W)
        .select("doc_id", "shingles"), dplans.N_HASHES)
    assert _rows(got) == _rows(want)
    # reuse in a fresh cache epoch: rows files untouched
    token = sf_dir.strip("/").replace("/", "_")
    store_dir = os.path.join(
        str(tmp_path / "root"),
        f"{token}_minhash_n_hashes{dplans.N_HASHES}_w{dedup.SHINGLE_W}")
    before = _file_states(os.path.join(store_dir, "rows"))
    monkeypatch.setattr(dplans, "_INDEX_CACHE", {})
    assert _rows(dplans.get_minhash_index(spark, sf_dir)) == _rows(want)
    assert _file_states(os.path.join(store_dir, "rows")) == before

    monkeypatch.setattr(dplans, "_INDEX_CACHE", {})
    sig = tplans.get_textsignals_index(spark, sf_dir)
    assert _rows(sig) == _rows(frame_store._derive_textsignals(docs, {}))
