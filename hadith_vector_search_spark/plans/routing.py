"""Intent-router query (SURVEY §2.9 Q1, §2.7 F3-F6) over a literal batch of
query strings — the batch-of-queries unit SURVEY §3.1 calls for.

The query corpus spans the reference's 10 golden categories
(/root/reference/data/riyadussalihin/TEST_QUERIES.md:20-29): exact refs,
narrator EN/AR, thematic, quoted phrase, mixed, edge cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.router import route
from ..localrel import local_df

# (query_id, query_text) — fixed corpus, embedded in the oracle too.
QUERY_BATCH: list[tuple[int, str]] = [
    (1, "book 1:12"),
    (2, "680"),
    (3, "bk 3-4"),
    (4, "narrated by Abu Hurairah"),
    (5, "reported by Aisha about prayer"),
    (6, "عن أبي هريرة"),
    (7, "hadith about controlling your anger"),
    (8, 'find "speak good or remain silent" now'),
    (9, "patience"),
    (10, "anger control"),
    (11, "the importance of sincerity in deeds"),
    (12, "xyzzy"),
    (13, "الصبر والصلاة"),  # Arabic-dominant thematic -> contextual_arabic (F26)
    # Golden-corpus exact-reference forms (TEST_QUERIES.md §1) + a
    # negative control a bare digit-SEARCH would misroute.
    (14, "Riyad as-Salihin 680"),
    (15, "Book 1, Hadith 10"),
    (16, "find hadith 1511"),
    (17, "reference: Introduction 8"),
    (18, "hadith number 682"),
    (19, "prohibition in Book 17"),  # thematic, NOT a reference
]


def intent_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    queries = local_df(spark, QUERY_BATCH, "query_id int, query_text string")
    routed = route(queries)
    return routed.select("query_id", "intent", "phrase", "narrator_query",
                         "n_tokens", "arabic_ratio")


def _esc(s: str) -> str:
    return s.replace("'", "''")


def intent_feat_cte(batch: list[tuple[int, str]]) -> str:
    """Shared oracle CTE fragment: the router's feature extraction + intent
    CASE over a literal query batch, ending with an `intents` relation
    (query_id, query_text, intent, phrase, narrator_query, n_tokens,
    ar_ratio). Same regexes, same precedence as `route()`, RE2 syntax;
    the exact-reference vocabulary interpolates from the ONE definition
    in functions/text.py so the three spellings cannot desync."""
    from ..functions.text import _REF_VOCAB as ref_vocab
    values = ", ".join(f"({i}, '{_esc(q)}')" for i, q in batch)
    return f"""
q(query_id, query_text) AS (VALUES {values}),
feat AS (
  SELECT query_id, query_text,
    regexp_matches(lower(query_text),
      '^\\s*(({ref_vocab})[\\s,.:]*)*\\d+(\\s*[:\\-/,]\\s*(hadith\\s+)?\\d+)?[\\s.]*$') AS is_ref,
    NULLIF(regexp_extract(query_text, '"([^"]{{3,}})"', 1), '') AS dq,
    NULLIF(regexp_extract(query_text, '''([^'']{{3,}})''', 1), '') AS sq,
    NULLIF(regexp_extract(lower(query_text),
      '\\b(?:narrated by|reported by|said by)\\s+(.+)$', 1), '') AS nar_en,
    NULLIF(regexp_extract(query_text, 'عن\\s+(.+)$', 1), '') AS nar_ar,
    len(list_filter(string_split_regex(lower(query_text), '[^a-z0-9_؀-ۿ]+'),
                    x -> length(x) >= 2)) AS n_tokens,
    CASE WHEN length(query_text) > 0
         THEN length(regexp_replace(query_text, '[^؀-ۿ]', '', 'g'))::DOUBLE
              / length(query_text)
         ELSE 0.0 END AS ar_ratio
  FROM q
),
intents AS (
  SELECT query_id, query_text,
    CASE
      WHEN is_ref THEN 'exact_reference'
      WHEN ar_ratio > 0.5 THEN 'contextual_arabic'
      WHEN coalesce(nar_en, nar_ar) IS NOT NULL THEN 'narrator'
      WHEN coalesce(dq, sq) IS NOT NULL OR n_tokens >= 4 THEN 'thematic'
      ELSE 'mixed'
    END AS intent,
    coalesce(dq, sq) AS phrase,
    coalesce(nar_en, nar_ar) AS narrator_query,
    n_tokens, ar_ratio
  FROM feat
)"""


def intent_router_oracle_sql() -> str:
    return f"""
WITH {intent_feat_cte(QUERY_BATCH)}
SELECT query_id, intent, phrase, narrator_query,
       CAST(n_tokens AS INT) AS n_tokens,
       round(ar_ratio, 4) AS arabic_ratio
FROM intents
"""


def golden_intent_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE golden corpus (all 118 enumerated TEST_QUERIES.md
    items, hadith_vector_search_spark/golden.py) through the column
    router, oracle-replayed by DuckDB feature-for-feature — the driver's
    gate thereby checks routing over every golden query, not a sample.
    (The per-id pinned-intent assertions and the end-to-end engine runs
    live in tests/test_golden_corpus.py.)"""
    from ..golden import GOLDEN
    queries = local_df(
        spark, [(i, q) for i, (_qid, q, _want) in enumerate(GOLDEN)],
        "query_id int, query_text string")
    return (route(queries)
            .select("query_id", "intent", "phrase", "narrator_query",
                    "n_tokens", "arabic_ratio"))


def golden_intent_router_oracle_sql() -> str:
    from ..golden import GOLDEN
    batch = [(i, q) for i, (_qid, q, _want) in enumerate(GOLDEN)]
    return f"""
WITH {intent_feat_cte(batch)}
SELECT query_id, intent, phrase, narrator_query,
       CAST(n_tokens AS INT) AS n_tokens,
       round(ar_ratio, 4) AS arabic_ratio
FROM intents
"""
