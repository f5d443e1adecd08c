"""Router, fusion, and hybrid-pipeline semantics (SURVEY §2.9, §3.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadith_vector_search_spark.operators import fusion
from hadith_vector_search_spark.operators.router import route
from hadith_vector_search_spark.plans.routing import QUERY_BATCH

EXPECTED_INTENTS = {
    1: "exact_reference",
    2: "exact_reference",
    3: "exact_reference",
    4: "narrator",
    5: "narrator",
    6: "contextual_arabic",  # Arabic-dominant wins over narrator (F26, spec)
    7: "thematic",      # 4 tokens
    8: "thematic",      # quoted phrase
    9: "mixed",         # 1 token
    10: "mixed",        # 2 tokens
    11: "thematic",
    12: "mixed",
    13: "contextual_arabic",
    # golden-corpus exact-reference forms (TEST_QUERIES.md §1)
    14: "exact_reference",
    15: "exact_reference",
    16: "exact_reference",
    17: "exact_reference",
    18: "exact_reference",
    19: "thematic",  # incidental number, NOT a reference
}


def test_router_intents(spark):
    df = spark.createDataFrame(QUERY_BATCH, "query_id int, query_text string")
    out = {r.query_id: r.intent for r in route(df).collect()}
    assert out == EXPECTED_INTENTS


def test_router_extractions(spark):
    df = spark.createDataFrame(QUERY_BATCH, "query_id int, query_text string")
    rows = {r.query_id: r for r in route(df).collect()}
    assert rows[4].narrator_query == "abu hurairah"
    assert rows[6].narrator_query == "أبي هريرة"
    assert rows[8].phrase == "speak good or remain silent"
    assert rows[7].tokens == ["hadith", "about", "controlling", "your", "anger"]


def test_resolve_weights_presets():
    w = fusion.resolve_weights("balanced")
    assert (w.vector, w.fts, w.coverage) == (0.6, 0.4, 0.2)
    w = fusion.resolve_weights("term-priority")
    assert (w.vector, w.fts, w.coverage) == (0.3, 0.3, 0.6)


def test_resolve_weights_degradation():
    # dead vector leg -> all weight to fts (Q4)
    w = fusion.resolve_weights("balanced", vector_available=False)
    assert w.vector == 0.0 and w.fts == 1.0
    # dead fts leg -> all weight to vector
    w = fusion.resolve_weights("balanced", fts_available=False)
    assert w.vector == 1.0 and w.fts == 0.0
    with pytest.raises(ValueError):
        fusion.resolve_weights("balanced", False, False)


def test_fuse_full_outer_keeps_both_scores(spark):
    fts = spark.createDataFrame([(1, 2.0), (2, 1.0)], "doc_id long, bm25 double")
    vec = spark.createDataFrame([(2, 0.9), (3, 0.8)], "doc_id long, sim double")
    out = {r.doc_id: (r.fts_score, r.vector_sim)
           for r in fusion.fuse(fts, vec).collect()}
    assert out == {1: (2.0, 0.0), 2: (1.0, 0.9), 3: (0.0, 0.8)}


def test_score_breakdown_and_ordering(spark):
    fused = spark.createDataFrame(
        [(1, 3.0, 0.5), (2, 0.0, 1.0)],
        "doc_id long, fts_score double, vector_sim double")
    w = fusion.Weights(vector=0.6, fts=0.4, coverage=0.0)
    out = {r.doc_id: r for r in fusion.score(fused, w).collect()}
    # doc1: 0.6*0.5 + 0.4*(3/4) = 0.6 ; doc2: 0.6*1.0 = 0.6
    assert abs(out[1].score - 0.6) < 1e-9
    assert abs(out[2].score - 0.6) < 1e-9
    assert out[1].fts_sig == 0.75 and out[2].vec_signal == 1.0


def test_hybrid_end_to_end(spark, sf_dir):
    from hadith_vector_search_spark.plans.hybrid import hybrid_search

    rows = hybrid_search(spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # the query vector's own doc ranks at/near the top via the vector leg
    assert rows[0].vec_signal > 0 or rows[0].fts_sig > 0
    assert all(r.preview for r in rows)


def test_score_breakdown_struct_matches_flat_columns(spark):
    """Q6: fusion.score's nested breakdown struct (ref ScoreBreakdown)
    mirrors the flat oracle-compared columns exactly."""
    from pyspark.sql import functions as F

    fts = spark.createDataFrame([(1, 2.0), (2, 0.5)], "doc_id long, bm25 double")
    vec = spark.createDataFrame([(1, 0.9), (3, 0.4)], "doc_id long, sim double")
    fused = fusion.fuse(fts, vec)
    scored = fusion.score(fused, fusion.resolve_weights("balanced"),
                          coverage_col=F.lit(0.5),
                          phrase_hit_col=F.col("doc_id") == 1,
                          proximity_hit_col=F.col("doc_id") == 3).collect()
    for r in scored:
        b = r.breakdown
        assert (b.vector_similarity, b.fts_signal, b.phrase_bonus,
                b.proximity_bonus, b.term_coverage, b.total) == (
            r.vec_signal, r.fts_sig, r.phrase_bonus,
            r.proximity_bonus, r.coverage, r.score)
    by_id = {r.doc_id: r for r in scored}
    assert by_id[1].phrase_bonus == 0.05 and by_id[1].proximity_bonus == 0.0
    assert by_id[3].proximity_bonus == 0.10 and by_id[3].phrase_bonus == 0.0
    assert all(0.0 <= r.score <= 1.0 for r in scored)  # clamped like the ref


def test_route_one_matches_column_router(spark):
    """The driver-side serving router must agree with the column router on
    every field, across the tricky shapes (Java vs Python regex semantics:
    ASCII \\d/\\s/\\b, Unicode digits, Arabic word boundaries, enclosing
    quotes, newlines)."""
    from hadith_vector_search_spark.operators.router import route, route_one

    queries = [
        "patience and prayer",
        '"patience in adversity" reward',
        "'charity' said by abu hurairah",
        "narrated by aisha",
        "Reported By  Umar ibn al-Khattab",
        "said by",                    # verb with no narrator tail
        "book 1:12", " bk 3 ", "680", "kitab 5/7", "12-34",
        "٦٨٠",                        # Arabic-Indic digits: NOT \d in Java
        "عن أبي هريرة",
        "الصبر والصلاة مفتاح الفرج",
        "quranعن مريم",               # no ASCII boundary before عن
        "'q'",                        # quoted but under min phrase length
        "\"short\"",
        "  spaced   out   query  ",
        "one two three four five",
        "tiny", "", "   ",
        "mixed عربي and english words",
        "'enclosed entirely in quotes'",
        "line\nbreak query",
        "CASE Folding QUERY",
    ]
    df = spark.createDataFrame([(q,) for q in queries], "query_text string")
    col_rows = {r.query_text: r for r in route(df).collect()}
    for q in queries:
        got = route_one(q)
        exp = col_rows[q]
        assert got.normalized == exp.normalized, (q, got.normalized, exp.normalized)
        assert got.phrase == exp.phrase, (q, got.phrase, exp.phrase)
        assert got.narrator_query == exp.narrator_query, \
            (q, got.narrator_query, exp.narrator_query)
        assert got.tokens == list(exp.tokens), (q, got.tokens, exp.tokens)
        assert got.n_tokens == exp.n_tokens
        assert abs(got.arabic_ratio - exp.arabic_ratio) < 1e-9, \
            (q, got.arabic_ratio, exp.arabic_ratio)
        assert got.intent == exp.intent, (q, got.intent, exp.intent)


def test_rrf_fuses_both_legs(spark, sf_dir):
    """RRF output: scores decrease, every score is attainable from the
    1/(K+rank) fold, and a doc present in both legs outranks equal
    single-leg docs at the same ranks."""
    from hadith_vector_search_spark.plans.hybrid import (
        RRF_K,
        hybrid_search_rrf,
    )

    rows = hybrid_search_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        expect = 0.0
        if r.fts_rank is not None:
            expect += 1.0 / (RRF_K + r.fts_rank)
        if r.vec_rank is not None:
            expect += 1.0 / (RRF_K + r.vec_rank)
        assert abs(r.rrf_score - round(expect, 6)) < 1e-9
        assert r.fts_rank is not None or r.vec_rank is not None
