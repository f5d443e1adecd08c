"""Multimodal plumbing + proximity + compiled match: oracle comparisons at
the test SF plus behavioral unit tests on literal frames."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hadith_vector_search_spark.operators import multimodal, proximity
from hadith_vector_search_spark.registry import get_oracles, get_queries
from hadith_vector_search_spark.testing import compare_query

ORACLE_CHECKED = [
    "proximity_pairs",
    "fts_match_compiled",
    "multimodal_metadata",
    "multimodal_frames",
    "multimodal_frame_features",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_matches_oracle(spark, duck, sf_dir, name):
    queries, oracles = get_queries(), get_oracles()
    assert name in queries and name in oracles
    problems = compare_query(spark, duck, queries[name], oracles[name], sf_dir)
    assert not problems, problems


def test_min_pair_distance(spark):
    docs = spark.createDataFrame(
        [(1, "data flows into the join engine"),       # data@0, join@4 -> 4
         (2, "join the data"),                         # join@0, data@2 -> 2
         (3, "data only here"),                        # no group-b hit
         (4, "nothing relevant at all")],
        "doc_id long, text string")
    out = {r.doc_id: r.min_dist for r in
           proximity.min_pair_distance(docs, ("data",), ("join",)).collect()}
    assert out == {1: 4, 2: 2}


def test_frame_sampling_fanout_and_hashes(spark):
    text = "x" * 100  # n=100 -> width 116, 5 frames (100%24=4 -> 1+4=5), sz=20
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    blob = multimodal.with_payload(docs)

    meta = multimodal.decode_metadata(blob).first()
    assert (meta.n_bytes, meta.width, meta.n_frames) == (100, 116, 5)

    frames = multimodal.sample_frames(blob, every=2).collect()
    assert [f.frame_idx for f in frames] == [0, 2, 4]
    expect = hashlib.sha256(b"x" * 20).hexdigest()
    assert all(f.frame_sha == expect and f.frame_bytes == 20 for f in frames)

    feats = multimodal.frame_features(multimodal.sample_frames(blob, every=2)).first()
    assert feats.features == [float(int(c, 16)) for c in expect[:4]]


def test_resize_stub_gated(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    run = multimodal.resize_stub(multimodal.with_payload(docs), 64, 64)
    with pytest.raises(NotImplementedError):
        run()


def test_empty_payload_yields_no_frames(spark):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert multimodal.sample_frames(multimodal.with_payload(docs)).count() == 0
