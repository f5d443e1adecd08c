"""Golden-query CATEGORY METRICS — the measured counterpart to
test_golden_queries.py's per-behavior assertions. The reference defines
per-category success criteria (TEST_QUERIES.md:394-411: narrator_accuracy
100%, narrator term_coverage >80%, thematic relevance >90%, phrase
exact_phrase_found 100%, cross_lingual success >85%) but never automated
them (benchmark milestone unchecked). Here each category runs a query
battery through the REAL pipeline (HybridEngine / router / BM25) over a
hadith-shaped fixture corpus and asserts the measured ratio against the
reference's target.

Cross-lingual note: the deterministic hash embedder is bag-of-tokens, so
AR→EN transfer exists only through shared surface tokens (the fixture's
bilingual doc). The battery therefore measures what the stand-in CAN
deliver — lexical+semantic retrieval of Arabic-token queries — and the
real-model path (sentence-transformers, skipped-unless-available) is the
semantic upgrade with the same pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadith_vector_search_spark.api import HybridEngine
from hadith_vector_search_spark.functions.text import (
    normalize_narrator,
    py_tokenize,
    term_coverage,
)
from hadith_vector_search_spark.operators import bm25
from hadith_vector_search_spark.operators.router import route

ROWS = [
    # doc_id, narrator, book, num, text
    ("riyad:1:1", "Umar bin Al-Khattab (May Allah be pleased with him)", 1, 1,
     "the reward of deeds depends upon the intentions and every person "
     "will get the reward according to what he has intended"),
    ("riyad:1:2", "Abu Huraira (May Allah be pleased with him)", 1, 2,
     "the strong is not the one who overcomes people by his strength "
     "but the strong is the one who controls himself while in anger "
     "and controlling anger is real strength"),
    ("riyad:2:5", "Aisha (May Allah be pleased with her)", 2, 5,
     "do good deeds properly sincerely and moderately and know that your "
     "deeds will not make you enter paradise"),
    ("riyad:2:6", "Abu Huraira (May Allah be pleased with him)", 2, 6,
     "charity does not decrease wealth and patience in anger brings "
     "forgiveness and reward عن أبي هريرة الصبر عند الغضب"),
    ("riyad:3:9", "Anas bin Malik (May Allah be pleased with him)", 3, 9,
     "none of you truly believes until he loves for his brother what he "
     "loves for himself"),
    ("riyad:4:12", "Abu Huraira (May Allah be pleased with him)", 4, 12,
     "whoever believes in allah and the last day should speak good or "
     "remain silent and honor his guest and honor his neighbour"),
    ("riyad:4:13", "Umar bin Al-Khattab (May Allah be pleased with him)", 4, 13,
     "actions are judged by motives and everyone shall have what he "
     "intended in his heart"),
    ("riyad:5:20", "Aisha (May Allah be pleased with her)", 5, 20,
     "the most beloved deeds to allah are those done regularly even if "
     "they are small and consistency in worship matters"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        ROWS, "doc_id string, narrator string, book int, num int, text string")


@pytest.fixture(scope="module")
def engine(spark, corpus):
    return HybridEngine(spark, corpus)


def _route_one(spark, q):
    return route(spark.createDataFrame(
        [(1, q)], "query_id int, query_text string")).collect()[0]


def test_narrator_accuracy_and_coverage(spark, corpus):
    """Targets: narrator_accuracy 100%, term_coverage > 80% on the
    narrator-restricted result set."""
    battery = {
        "narrated by Abu Huraira": "abu huraira",
        "narrated by Aisha": "aisha",
        "narrated by Anas bin Malik": "anas bin malik",
        "narrated by Umar bin Al-Khattab": "umar bin al-khattab",
    }
    expected = {
        "abu huraira": {"riyad:1:2", "riyad:2:6", "riyad:4:12"},
        "aisha": {"riyad:2:5", "riyad:5:20"},
        "anas bin malik": {"riyad:3:9"},
        "umar bin al-khattab": {"riyad:1:1", "riyad:4:13"},
    }
    canon = corpus.withColumn("canon",
                              F.lower(normalize_narrator(F.col("narrator"))))
    correct = 0
    coverages = []
    for q, want_narr in battery.items():
        r = _route_one(spark, q)
        assert r.intent == "narrator"
        got = {h.doc_id for h in
               canon.filter(F.col("canon").contains(want_narr)).collect()}
        if got == expected[want_narr]:
            correct += 1
        # term coverage of the narrator phrase over the result set
        toks = F.array(*[F.lit(t) for t in py_tokenize(r.narrator_query)])
        covs = (canon.filter(F.col("canon").contains(want_narr))
                .select(term_coverage(toks, F.lower(F.col("narrator")))
                        .alias("cov")).collect())
        coverages.extend(c.cov for c in covs)
    narrator_accuracy = correct / len(battery)
    avg_coverage = sum(coverages) / len(coverages)
    assert narrator_accuracy == 1.0          # target: 100%
    assert avg_coverage > 0.8                # target: >80%


def test_narrator_accuracy_end_to_end_engine(spark, corpus):
    """The same narrator batteries through the FULL engine path with a
    narrator column: the narrator-field lexical leg + the spec'd 0.4
    bonus must rank exactly the narrator's docs first — 100% narrator
    accuracy measured on hybrid_search output, not a manual filter."""
    from hadith_vector_search_spark.api import HybridEngine
    expected = {
        "narrated by Abu Huraira": {"riyad:1:2", "riyad:2:6", "riyad:4:12"},
        "narrated by Aisha": {"riyad:2:5", "riyad:5:20"},
        "narrated by Anas bin Malik": {"riyad:3:9"},
        "narrated by Umar bin Al-Khattab": {"riyad:1:1", "riyad:4:13"},
    }
    eng = HybridEngine(spark, corpus, narrator_col="narrator")
    correct = 0
    for q, want in expected.items():
        rows = eng.hybrid_search(q, n_results=len(want)).collect()
        got = {r.doc_id for r in rows}
        assert all(r.narrator_bonus == 0.4 for r in rows), q
        correct += got == want
    assert correct / len(expected) == 1.0    # target: 100%, end to end


def test_thematic_relevance(engine):
    """Target: relevance > 90% — the topical doc must appear in the top 2
    hybrid results for every thematic query."""
    battery = {
        "hadith about controlling your anger": "riyad:1:2",
        "deeds and intentions": "riyad:1:1",
        "charity and wealth": "riyad:2:6",
        "loving your brother": "riyad:3:9",
        "honoring guests and neighbours": "riyad:4:12",
        "consistent small deeds worship": "riyad:5:20",
    }
    hits = 0
    for q, want in battery.items():
        top2 = [r.doc_id for r in engine.hybrid_search(q, n_results=2).collect()]
        hits += want in top2
    relevance = hits / len(battery)
    assert relevance > 0.9                   # target: >90%


def test_phrase_found_rate_and_bonus_fires(engine):
    """Targets: exact_phrase_found 100%; the phrase bonus must actually
    fire (phrase_bonus > 0 in the breakdown) for every phrase query whose
    phrase exists verbatim."""
    battery = {
        '"controls himself while in anger"': "riyad:1:2",
        '"charity does not decrease wealth"': "riyad:2:6",
        '"loves for his brother"': "riyad:3:9",
        '"speak good or remain silent"': "riyad:4:12",
    }
    found = fired = 0
    for q, want in battery.items():
        rows = engine.hybrid_search(q, n_results=3).collect()
        ids = [r.doc_id for r in rows]
        if want in ids:
            found += 1
            hit = rows[ids.index(want)]
            fired += hit.phrase_bonus > 0
    assert found / len(battery) == 1.0       # target: 100%
    assert fired / len(battery) == 1.0       # the bonus fires every time


def test_cross_lingual_arabic_queries(spark, engine, corpus):
    """Target: success > 85% — Arabic-token queries retrieve the bilingual
    doc through the same pipeline (lexical leg + hash-embedder token
    overlap; see module docstring for the real-model upgrade path)."""
    battery = {
        "الصبر عند الغضب": "riyad:2:6",
        "الغضب": "riyad:2:6",
        "عن أبي هريرة الصبر": "riyad:2:6",
    }
    ok = 0
    for q, want in battery.items():
        r = _route_one(spark, q)
        assert r.arabic_ratio > 0.5
        ids = [h.doc_id for h in
               bm25.bm25_topk(spark, corpus, q, k=3, conjunctive=False).collect()]
        ok += want in ids
    assert ok / len(battery) > 0.85          # target: >85%


def test_determinism_across_runs(engine):
    """Category: determinism — identical hybrid runs return identical
    ranked ids and scores."""
    a = [(r.doc_id, r.score) for r in
         engine.hybrid_search("anger and patience", n_results=5).collect()]
    b = [(r.doc_id, r.score) for r in
         engine.hybrid_search("anger and patience", n_results=5).collect()]
    assert a == b
