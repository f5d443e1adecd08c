"""Oracle-checked normalization sweep (VERDICT r1 item 10): the scalar text
functions that previously had only pytest coverage — narrator
canonicalization (F1), HTML strip (F8), render-for-embedding (F19),
doc-id/verse-key synthesis + parse (F20/F21), Arabic-digit cleanup (F22),
and whitespace normalization (F23) — applied over the documents table with
inputs synthesized deterministically from existing columns, and a DuckDB
oracle replaying every regex/concat step.

One narrow projection, no shuffle: at 100 TB this is a pure map stage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    make_doc_id,
    normalize_narrator,
    normalize_whitespace,
    parse_verse_key,
    render_for_embedding,
    strip_html,
    strip_trailing_arabic_digits,
    verse_key,
)
from ..sources import load_table

HEAD = 60
AR_SUFFIX = " ١٢٣45 "
AR_TEXT = "نص عربي"


def normalization_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    head = F.substring("text", 1, HEAD)
    head20 = F.substring("text", 1, 20)
    narr_raw = F.concat(F.lit("Abu "), F.col("source"),
                        F.lit(" (May Allah be pleased with him) reported:"))
    html_raw = F.concat(F.lit("<p>"), head, F.lit("</p> &amp; <b>tail</b>"))
    narr = normalize_narrator(narr_raw)
    vkey = verse_key(F.col("doc_id") % 10, F.col("doc_id") % 50)
    parsed = parse_verse_key(vkey)
    return docs.select(
        "doc_id",
        normalize_whitespace(
            F.concat(F.lit("  "), head, F.lit("   x  "))).alias("ws_norm"),
        narr.alias("narrator_norm"),
        strip_html(html_raw).alias("html_stripped"),
        render_for_embedding(narr, head, F.lit(AR_TEXT)).alias("rendered"),
        make_doc_id("source", "lang", "doc_id").alias("synth_id"),
        vkey.alias("vkey"),
        parsed.getField("surah").alias("surah"),
        parsed.getField("ayah").alias("ayah"),
        strip_trailing_arabic_digits(
            F.concat(head20, F.lit(AR_SUFFIX))).alias("no_ar_digits"),
    )


def normalization_preview_oracle() -> str:
    # Each CTE column replays the Spark regexp/concat chain step by step;
    # all regex replaces are GLOBAL ('g') to match Spark semantics.
    return f"""
WITH base AS (
  SELECT doc_id,
         substr(text, 1, {HEAD})  AS head,
         substr(text, 1, 20)      AS head20,
         'Abu ' || source || ' (May Allah be pleased with him) reported:' AS narr_raw,
         '<p>' || substr(text, 1, {HEAD}) || '</p> &amp; <b>tail</b>'     AS html_raw,
         source, lang
  FROM documents
),
narr1 AS (
  SELECT *, regexp_replace(narr_raw, '\\([^)]*\\)', ' ', 'g') AS n1 FROM base
),
narr2 AS (
  SELECT *, regexp_replace(n1, 'رضي الله عن(ه|ها|هم|هما)', ' ', 'g') AS n2 FROM narr1
),
narr3 AS (
  SELECT *, regexp_replace(n2, '(?i)\\b(reported|narrated|said)\\s*:?\\s*$', ' ', 'g') AS n3 FROM narr2
),
narr4 AS (
  SELECT *, regexp_replace(n3, '[\\s:،,.;''"-]+$', '', 'g') AS n4 FROM narr3
),
narr AS (
  SELECT *, lower(trim(regexp_replace(n4, '\\s+', ' ', 'g'))) AS narrator_norm
  FROM narr4
),
html AS (
  SELECT *, trim(regexp_replace(
           replace(replace(replace(replace(replace(replace(
             regexp_replace(html_raw, '<[^>]+>', ' ', 'g'),
             '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
             '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
           '\\s+', ' ', 'g')) AS html_stripped
  FROM narr
)
SELECT doc_id,
       trim(regexp_replace('  ' || head || '   x  ', '\\s+', ' ', 'g')) AS ws_norm,
       narrator_norm,
       html_stripped,
       'Narrator: ' || narrator_norm || chr(10) || head
         || chr(10) || chr(10) || '{AR_TEXT}'                           AS rendered,
       source || ':' || lang || ':' || doc_id::VARCHAR                  AS synth_id,
       (doc_id % 10)::VARCHAR || ':' || (doc_id % 50)::VARCHAR          AS vkey,
       CAST(doc_id % 10 AS INT)                                         AS surah,
       CAST(doc_id % 50 AS INT)                                         AS ayah,
       regexp_replace(head20 || '{AR_SUFFIX}',
                      '[\\s٠-٩۰-۹0-9]+$', '', 'g')                      AS no_ar_digits
FROM html
"""
