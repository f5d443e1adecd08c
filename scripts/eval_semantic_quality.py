"""Real-model semantic-quality evaluation (env-gated).

Measures the two golden-corpus quality dimensions the deterministic hash
embedder cannot: CROSS-LINGUAL semantic recall (BASELINE.md's >85%
target, ref quran_mcp/embeddings.py:28-37 — all-MiniLM-L6-v2 retrieving
the bilingual doc for Arabic queries with NO token overlap) and
retrieve-then-rerank quality with the real CrossEncoder
(ms-marco-MiniLM-L-6-v2, operators/reranker.CrossEncoderScorer).

Runs ONLY when `sentence_transformers` (and its weights) are importable;
in this container it prints a visible SKIP notice and exits 0 — the code
path is still contract-tested through the faked package in
tests/test_embedder.py, so this script measures semantic QUALITY, the one
thing blocked on environment rather than code (VERDICT r6 "What's
missing" #2).

Usage: python scripts/eval_semantic_quality.py
Prints GOLDEN_METRICS-style markdown rows; append to GOLDEN_METRICS.md
when run in a weights-enabled environment.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    from hadith_vector_search_spark.operators.embedder import (
        SentenceTransformerEmbedder,
        real_model_available,
    )

    if not real_model_available():
        print("SKIP: sentence_transformers is not importable in this "
              "environment — real-model semantic quality cannot be "
              "measured here.\n"
              "The engine code path is still exercised (faked-package "
              "contract tests in tests/test_embedder.py); run this "
              "script where the all-MiniLM-L6-v2 weights are available "
              "to produce the GOLDEN_METRICS.md rows.")
        return 0

    from hadith_vector_search_spark.api import HybridEngine
    from hadith_vector_search_spark.operators.reranker import (
        resolve_pair_backend,
    )
    from hadith_vector_search_spark.session import get_spark
    from test_golden_metrics import ROWS

    spark = get_spark("semantic-quality")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.createDataFrame(
        ROWS, "doc_id string, narrator string, book int, num int, text string")
    # dim must match the real model's fixed geometry for auto->st.
    engine = HybridEngine(spark, corpus,
                          dim=SentenceTransformerEmbedder.dim)

    rows: list[tuple[str, str, str]] = []

    # --- cross-lingual semantic recall (>85% target) --------------------
    # Arabic queries for the bilingual anger/patience doc: the first two
    # overlap tokens with its Arabic text (lexical-reachable), the rest
    # are PARAPHRASES with no token overlap — only a real multilingual
    # encoder can bridge them. k=3 over a 20-doc corpus (same top-k
    # discipline as the golden tests).
    battery = {
        "الصبر عند الغضب": "riyad:2:6",
        "عن أبي هريرة الصبر": "riyad:2:6",
        "كظم الغيظ": "riyad:2:6",              # paraphrase: restraining rage
        "ضبط النفس عند الغضب": "riyad:2:6",    # paraphrase: self-control
        "التحكم في الغضب": "riyad:1:2",        # controlling anger
    }
    ok = 0
    for q, want in battery.items():
        ids = [r.doc_id for r in
               engine.semantic_search(q, n_results=3).collect()]
        hit = want in ids
        ok += hit
        print(f"  cross-lingual {'HIT ' if hit else 'MISS'} {q!r} -> {ids}")
    rows.append(("cross-lingual semantic recall (real model)", ">85%",
                 f"{100 * ok / len(battery):.0f}%"))

    # --- rerank quality (real CrossEncoder) -----------------------------
    backend = resolve_pair_backend("auto")
    if backend == "ce":
        # For content-matching queries the cross-encoder must keep (or
        # promote) the source doc at rank 1 after reranking the hybrid
        # over-fetch.
        rr_battery = {
            "controlling anger and strength": "riyad:1:2",
            "deeds are judged by intentions": "riyad:1:1",
            "charity does not decrease wealth": "riyad:2:6",
        }
        top1 = 0
        for q, want in rr_battery.items():
            hits = engine.rerank_search(q, n_results=3).collect()
            got = hits[0].doc_id if hits else None
            top1 += got == want
            print(f"  rerank {'HIT ' if got == want else 'MISS'} {q!r} "
                  f"-> top1={got}")
        rows.append(("rerank top-1 accuracy (real CrossEncoder)", ">90%",
                     f"{100 * top1 / len(rr_battery):.0f}%"))
    else:
        print("NOTE: CrossEncoder weights unavailable — rerank quality "
              "row skipped (hash stand-in would not measure model "
              "quality).")

    print("\n| category | reference target | measured |")
    print("|---|---|---|")
    for name, target, got in rows:
        print(f"| {name} | {target} | {got} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
