"""Measure the reference's golden-query category targets and print the
markdown table for GOLDEN_METRICS.md.

Reuses the exact batteries from tests/test_golden_metrics.py (imported,
not duplicated) so the report and the CI assertions can never diverge.
Targets: TEST_QUERIES.md:394-411 / HADITH_SEARCH_SPEC.md:549-553 — the
reference specifies them but never automated measurement (benchmark
milestone unchecked in mcp_server/TODO.md)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import functions as F  # noqa: E402

from hadith_vector_search_spark.api import HybridEngine  # noqa: E402
from hadith_vector_search_spark.functions.text import (  # noqa: E402
    normalize_narrator,
    py_tokenize,
    term_coverage,
)
from hadith_vector_search_spark.operators import bm25  # noqa: E402
from hadith_vector_search_spark.operators.router import route  # noqa: E402
from hadith_vector_search_spark.session import get_spark  # noqa: E402
from test_golden_metrics import ROWS  # noqa: E402


def main() -> None:
    spark = get_spark("golden-metrics")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.createDataFrame(
        ROWS, "doc_id string, narrator string, book int, num int, text string")
    engine = HybridEngine(spark, corpus)

    def route_one(q):
        return route(spark.createDataFrame(
            [(1, q)], "query_id int, query_text string")).collect()[0]

    rows = []

    # --- narrator accuracy + coverage -----------------------------------
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
    canon = corpus.withColumn(
        "canon", F.lower(normalize_narrator(F.col("narrator"))))
    correct, covs, routed_ok = 0, [], 0
    for q, want in battery.items():
        r = route_one(q)
        routed_ok += r.intent == "narrator"
        got = {h.doc_id for h in
               canon.filter(F.col("canon").contains(want)).collect()}
        correct += got == expected[want]
        toks = F.array(*[F.lit(t) for t in py_tokenize(r.narrator_query)])
        covs.extend(c.cov for c in
                    canon.filter(F.col("canon").contains(want))
                    .select(term_coverage(toks, F.lower(F.col("narrator")))
                            .alias("cov")).collect())
    rows.append(("narrator accuracy", "100%", f"{100*correct/len(battery):.0f}%"))
    rows.append(("narrator term coverage", ">80%",
                 f"{100*sum(covs)/len(covs):.0f}%"))

    # --- thematic relevance ---------------------------------------------
    thematic = {
        "hadith about controlling your anger": "riyad:1:2",
        "deeds and intentions": "riyad:1:1",
        "charity and wealth": "riyad:2:6",
        "loving your brother": "riyad:3:9",
        "honoring guests and neighbours": "riyad:4:12",
        "consistent small deeds worship": "riyad:5:20",
    }
    hits = sum(want in [r.doc_id for r in
                        engine.hybrid_search(q, n_results=2).collect()]
               for q, want in thematic.items())
    rows.append(("thematic relevance (top-2)", ">90%",
                 f"{100*hits/len(thematic):.0f}%"))

    # --- phrase found + bonus -------------------------------------------
    phrases = {
        '"controls himself while in anger"': "riyad:1:2",
        '"charity does not decrease wealth"': "riyad:2:6",
        '"loves for his brother"': "riyad:3:9",
        '"speak good or remain silent"': "riyad:4:12",
    }
    found = fired = 0
    for q, want in phrases.items():
        res = engine.hybrid_search(q, n_results=3).collect()
        ids = [r.doc_id for r in res]
        if want in ids:
            found += 1
            fired += res[ids.index(want)].phrase_bonus > 0
        # a quoted phrase routes as thematic WITH the phrase extracted
        # (the reference has no separate phrase intent; the scorer applies
        # the phrase bonus from the extracted column)
        pr = route_one(q)
        routed_ok += pr.intent == "thematic" and bool(pr.phrase)
    rows.append(("exact-phrase found", "100%",
                 f"{100*found/len(phrases):.0f}%"))
    rows.append(("phrase bonus fires", "100%",
                 f"{100*fired/len(phrases):.0f}%"))

    # --- cross-lingual ---------------------------------------------------
    arabic = {
        "الصبر عند الغضب": "riyad:2:6",
        "الغضب": "riyad:2:6",
        "عن أبي هريرة الصبر": "riyad:2:6",
    }
    ok = 0
    for q, want in arabic.items():
        ok += want in [h.doc_id for h in
                       bm25.bm25_topk(spark, corpus, q, k=3,
                                      conjunctive=False).collect()]
    rows.append(("cross-lingual success", ">85%",
                 f"{100*ok/len(arabic):.0f}%"))

    # --- router accuracy over the full battery ---------------------------
    n_routed = len(battery) + len(phrases)
    rows.append(("router classification", ">95%",
                 f"{100*routed_ok/n_routed:.0f}%"))

    # --- FULL golden corpus (every TEST_QUERIES.md item) ------------------
    # Imported from tests/test_golden_corpus.py (same source as the CI
    # assertions): per-id pinned intents + per-category accepted sets.
    from test_golden_corpus import ACCEPTED, GOLDEN
    routed_all = {r.qid: r.intent for r in route(spark.createDataFrame(
        [(qid, q) for qid, q, _ in GOLDEN],
        "qid string, query_text string")).collect()}
    pinned_ok = corpus_ok = 0
    per_cat: dict[str, list[bool]] = {}
    for qid, q, expected in GOLDEN:
        intent = routed_all[qid]
        pinned_ok += intent == expected
        cat = qid.split(".", 1)[0]
        per_cat.setdefault(cat, []).append(intent in ACCEPTED[cat])
    corpus_ok = sum(ok for oks in per_cat.values() for ok in oks)
    rows.append((f"full-corpus pinned intents ({len(GOLDEN)} queries)",
                 "100%", f"{100*pinned_ok/len(GOLDEN):.0f}%"))
    rows.append(("full-corpus router classification", ">95%",
                 f"{100*corpus_ok/len(GOLDEN):.0f}%"))

    print("| category | reference target | measured |")
    print("|---|---|---|")
    for name, target, got in rows:
        print(f"| {name} | {target} | {got} |")

    print()
    print("Full-corpus per-category classification (accepted-intent sets,")
    print("see tests/test_golden_corpus.py docstring for the parity notes):")
    print()
    print("| category | queries | classified correctly |")
    print("|---|---|---|")
    names = {"1": "exact references", "2": "narrator-based",
             "3": "English thematic", "4": "Arabic thematic",
             "5": "keyword & phrase", "6": "mixed/cross-lingual",
             "7": "complex & compound", "8": "edge cases",
             "9": "story & narrative", "10": "question-based"}
    for cat in sorted(per_cat, key=lambda c: int(c)):
        oks = per_cat[cat]
        print(f"| {cat}. {names[cat]} | {len(oks)} | "
              f"{100*sum(oks)/len(oks):.0f}% |")


if __name__ == "__main__":
    main()
