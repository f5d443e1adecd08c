"""Query-intent router (SURVEY §2.9 Q1) as pure column expressions.

The reference classifies each query string with regex heuristics into
EXACT_REFERENCE / NARRATOR / THEMATIC / MIXED and extracts a normalized
form, narrator phrase, quoted phrase, and token list
(/root/reference/mcp_server/apps/router.py:47-90). Here a *batch of queries*
is a DataFrame and routing is one `select` — no per-query Python, so routing
a billion queries is the same plan as routing one.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    _REF_VOCAB,
    arabic_ratio,
    extract_narrator_query,
    extract_quoted_phrase,
    is_exact_reference,
    normalize_whitespace,
    py_tokenize,
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


@dataclass(frozen=True)
class RoutedQuery:
    """Driver-side routing result — same fields as `route`'s columns."""
    query_text: str
    normalized: str
    phrase: str | None
    narrator_query: str | None
    tokens: list[str]
    n_tokens: int
    arabic_ratio: float
    intent: str


# Python twins of the column expressions, for single-query serving calls.
# Java regex classes are ASCII-only (\s = [ \t\n\x0B\f\r], \d = [0-9],
# \w = [a-zA-Z0-9_]); Python's are Unicode-aware by default — every twin
# spells the ASCII classes out so both routers match byte-for-byte
# (equivalence is pinned by the twin-vs-column sweeps in
# tests/test_properties.py and tests/test_hybrid.py).
_PY_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_PY_ENCLOSING_QUOTES = re.compile("^[\"'](.*)[\"']$")
_PY_DQ_PHRASE = re.compile('"([^"]{3,})"')
_PY_SQ_PHRASE = re.compile("'([^']{3,})'")
_PY_NARRATOR_EN = re.compile(
    r"(?:^|(?<=[^a-z0-9_]))(?:narrated by|reported by|said by)"
    r"[ \t\n\x0b\f\r]+(.+)$")
_PY_NARRATOR_AR = re.compile("عن[ \\t\\n\\x0b\\f\\r]+(.+)$")
# Derived from the ONE vocabulary in functions/text.py (the column form
# and the DuckDB oracle spell the same pieces), with \s replaced by the
# explicit ASCII class so the twin matches Java byte-for-byte.
_PY_EXACT_REF = re.compile(
    r"^[ \t\n\x0b\f\r]*"
    r"(?:(?:" + _REF_VOCAB + r")[ \t\n\x0b\f\r,.:]*)*"
    r"[0-9]+(?:[ \t\n\x0b\f\r]*[:\-/,][ \t\n\x0b\f\r]*"
    r"(?:hadith[ \t\n\x0b\f\r]+)?[0-9]+)?[ \t\n\x0b\f\r.]*$")
_PY_ARABIC = re.compile("[؀-ۿ]")


def _py_normalize_ws(s: str) -> str:
    return _PY_WS.sub(" ", s).strip()


def route_one(query_text: str) -> RoutedQuery:
    """Single-query twin of `route` evaluated driver-side in pure Python —
    the serving path routes ONE string per call, and spinning a 1-row
    Spark job just to run five regexes costs ~400 ms of scheduler overhead
    per request. Batch routing (the registered `intent_router` query) stays
    on the column version; this twin is regex-for-regex identical and
    equivalence-tested against it."""
    q = query_text
    # Java's non-MULTILINE '$' matches before a FINAL line terminator
    # including '\r' / '\r\n'; Python's only before a final '\n'. Strip
    # one trailing CR(LF) for the $-anchored patterns so both agree on
    # Windows line endings (tokens/arabic_ratio still see the full
    # string, matching the column forms).
    anchored = (q[:-2] if q.endswith("\r\n")
                else q[:-1] if q.endswith("\r") else q)
    stripped = _PY_ENCLOSING_QUOTES.sub(r"\1", anchored)
    normalized = _py_normalize_ws(stripped.lower())
    dq = _PY_DQ_PHRASE.search(q)
    sq = _PY_SQ_PHRASE.search(q)
    phrase = dq.group(1) if dq else (sq.group(1) if sq else None)
    en = _PY_NARRATOR_EN.search(anchored.lower())
    ar_n = _PY_NARRATOR_AR.search(anchored)
    narrator = (en.group(1) if en and en.group(1) != "" else
                (ar_n.group(1) if ar_n and ar_n.group(1) != "" else None))
    tokens = py_tokenize(q)
    n_ar = len(_PY_ARABIC.findall(q))
    ar_ratio = (n_ar / len(q)) if len(q) > 0 else 0.0
    if _PY_EXACT_REF.match(anchored.lower()):
        intent = INTENT_EXACT
    elif ar_ratio > ARABIC_DOMINANT:
        intent = INTENT_ARABIC
    elif narrator is not None:
        intent = INTENT_NARRATOR
    elif phrase is not None or len(tokens) >= THEMATIC_MIN_TOKENS:
        intent = INTENT_THEMATIC
    else:
        intent = INTENT_MIXED
    return RoutedQuery(query_text=q, normalized=normalized, phrase=phrase,
                       narrator_query=narrator, tokens=tokens,
                       n_tokens=len(tokens),
                       arabic_ratio=round(ar_ratio, 4), intent=intent)


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
