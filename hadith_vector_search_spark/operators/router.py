"""Query-intent router (SURVEY §2.9 Q1) as pure column expressions.

The reference classifies each query string with regex heuristics into
EXACT_REFERENCE / NARRATOR / THEMATIC / MIXED and extracts a normalized
form, narrator phrase, quoted phrase, and token list
(/root/reference/mcp_server/apps/router.py:47-90). Here a *batch of queries*
is a DataFrame and routing is one `select` — no per-query Python, so routing
a billion queries is the same plan as routing one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    arabic_ratio,
    extract_narrator_query,
    extract_quoted_phrase,
    is_exact_reference,
    normalize_whitespace,
    strip_quotes,
    tokenize,
)

INTENT_EXACT = "exact_reference"
INTENT_ARABIC = "contextual_arabic"
INTENT_NARRATOR = "narrator"
INTENT_THEMATIC = "thematic"
INTENT_MIXED = "mixed"

# Reference rule: thematic when the query has >= 4 tokens or carries a
# quoted phrase (router.py:57-90).
THEMATIC_MIN_TOKENS = 4
# Spec rule (HADITH_SEARCH_SPEC.md:282-287): a query whose characters are
# majority Arabic-script routes to the Arabic contextual path, checked
# after exact-reference and before narrator (spec classify() order,
# HADITH_SEARCH_SPEC.md:256-268).
ARABIC_DOMINANT = 0.5


def route(queries: DataFrame, text_col: str = "query_text") -> DataFrame:
    """Append intent columns: normalized, phrase, narrator_query, tokens,
    n_tokens, arabic_ratio, intent. Precedence mirrors the spec'd router:
    exact-reference, Arabic-dominant (F26), narrator, thematic, else mixed.
    (The shipped mcp router lacks the Arabic rule — router.py:47-90 — so an
    Arabic `عن X` query routes contextual_arabic here, per the spec.)"""
    q = F.col(text_col)
    normalized = normalize_whitespace(F.lower(strip_quotes(q)))
    phrase = extract_quoted_phrase(q)
    narrator = extract_narrator_query(q)
    toks = tokenize(q)
    ar = arabic_ratio(q)
    intent = (
        F.when(is_exact_reference(q), F.lit(INTENT_EXACT))
        .when(ar > ARABIC_DOMINANT, F.lit(INTENT_ARABIC))
        .when(narrator.isNotNull(), F.lit(INTENT_NARRATOR))
        .when(phrase.isNotNull() | (F.size(toks) >= THEMATIC_MIN_TOKENS), F.lit(INTENT_THEMATIC))
        .otherwise(F.lit(INTENT_MIXED))
    )
    return queries.select(
        "*",
        normalized.alias("normalized"),
        phrase.alias("phrase"),
        narrator.alias("narrator_query"),
        toks.alias("tokens"),
        F.size(toks).alias("n_tokens"),
        F.round(ar, 4).alias("arabic_ratio"),
        intent.alias("intent"),
    )
