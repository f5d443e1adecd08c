"""Training-data pipeline queries: deterministic corpus splits, benchmark
contamination, and the quality-filter funnel — the operations that turn a
raw corpus into training data (complementing the dedup family in
`plans.dedup` and the per-doc stats in `plans.textstats`).

These generalize the reference's validation/reporting surface (its
DATA_QUALITY_REPORT.md pipeline: validate → clean → report) into the
corpus-preparation operators a 100 TB crawl needs. Every query is one scan
plus the minimum shuffles:

- `corpus_split_summary`: map-only split assignment (sha256-prefix
  thresholds — rerun-stable, seedless) + one partial-agg shuffle.
- `contamination_check`: broadcast the shingled benchmark suite into the
  corpus shingle stream; only MATCHED rows shuffle (cost ~ contamination
  rate, not corpus size).
- `quality_filter_funnel`: cumulative survivor counts through
  length → quality → lang-ID → exact-dedup gates in ONE pass over the
  corpus (one window shuffle for the dedup gate, one final agg) — not one
  pass per gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokenize
from ..operators import sampling, textstats
from ..operators.textstats import STOPWORDS
from ..plans.dedup import _SHINGLES_CTE, PREVIEW_LEN
from ..plans.textstats import _TOKS, _hits
from ..sources import load_table
from ..localrel import local_df

# ---------------------------------------------------------------------------
# corpus_split_summary
# ---------------------------------------------------------------------------


def corpus_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment + per-(split, lang) doc and
    token totals. The split label is a pure function of doc_id (sha256
    prefix vs hex thresholds): re-runs and backfills never move a row."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        sampling.split_label().alias("split"),
        "lang",
        F.size(tokenize(F.col("text"))).alias("_n_toks"))
    return (per_doc.groupBy("split", "lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("_n_toks").cast("long").alias("total_tokens")))


def _split_case_sql(id_expr: str = "doc_id") -> str:
    whens = " ".join(
        f"WHEN substr(sha256(CAST({id_expr} AS VARCHAR)), 1, 2) < '{bound}' "
        f"THEN '{name}'"
        for name, bound in sampling.SPLIT_BOUNDS)
    return f"CASE {whens} ELSE '{sampling.SPLIT_DEFAULT}' END"


def corpus_split_summary_oracle() -> str:
    return f"""
WITH t AS (
  SELECT {_split_case_sql()} AS split, lang, len({_TOKS}) AS n_toks
  FROM documents
)
SELECT split, lang, count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens
FROM t GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# contamination_check
# ---------------------------------------------------------------------------

# Benchmark suite: literal eval-set items. 1-3 are verbatim document
# prefixes from the synthetic corpus (guaranteed contamination); 4 uses
# out-of-vocabulary words (negative control — must match nothing).
CONTAM_BENCH: list[tuple[int, str]] = [
    (1, "key agg row scan slow fast"),
    (2, "batch window spark order data column agg"),
    (3, "the fast key order sort table scan"),
    (4, "quantum pasta recipe moonlight sonata"),
]
CONTAM_MIN = 0.25


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w-gram containment of each benchmark item in each corpus document
    (decontamination pass): pairs with containment >= CONTAM_MIN."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.contamination(docs, CONTAM_BENCH, CONTAM_MIN)


def contamination_check_oracle() -> str:
    rows = ", ".join(
        f"({bid}, '{s}')"
        for bid, btext in CONTAM_BENCH
        for s in sampling.py_shingles(btext))
    return f"""
WITH {_SHINGLES_CTE},
bench(bench_id, shingle) AS (VALUES {rows}),
bsize AS (SELECT bench_id, count(*)::INT AS bench_size FROM bench GROUP BY 1),
ov AS (
  SELECT b.bench_id, s.doc_id, count(*)::BIGINT AS overlap
  FROM sh s JOIN bench b USING (shingle)
  GROUP BY 1, 2
)
SELECT o.bench_id, o.doc_id, o.overlap,
       round(o.overlap / z.bench_size, 6) AS containment
FROM ov o JOIN bsize z USING (bench_id)
WHERE round(o.overlap / z.bench_size, 6) >= {CONTAM_MIN}
"""


# ---------------------------------------------------------------------------
# domain_mix_plan / sequence_packing_estimate
# ---------------------------------------------------------------------------

# Target language mix for a training run (weights sum to 1) and the token
# budget to allocate. Literal config, identical in the oracle.
MIX_TARGET: dict[str, float] = {
    "en": 0.5, "de": 0.15, "fr": 0.15, "es": 0.1, "zh": 0.1,
}
MIX_BUDGET_TOKENS = 20_000
PACK_SEQ_LEN = 128


def domain_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix allocation: per language, available tokens vs the
    budget share the target mix asks for, the resulting deterministic
    sampling rate (capped at 1.0 — oversubscribed domains need epochs,
    flagged), and the planned token count.

    One corpus scan + one tiny agg; the mix arithmetic runs on ~n_langs
    rows, so at 100 TB this is exactly one partial-agg shuffle. Languages
    outside the target get weight 0 (rate 0, planned 0)."""
    docs = load_table(spark, sf_dir, "documents")
    avail = (docs.select("lang", F.size(tokenize(F.col("text"))).alias("_t"))
             .groupBy("lang")
             .agg(F.sum("_t").cast("long").alias("available_tokens")))
    weight = F.lit(0.0)
    for lang, w in MIX_TARGET.items():
        weight = F.when(F.col("lang") == lang, F.lit(w)).otherwise(weight)
    need = F.round(weight * MIX_BUDGET_TOKENS, 6)
    rate = F.least(
        F.lit(1.0),
        F.round(need / F.greatest(F.col("available_tokens").cast("double"),
                                  F.lit(1.0)), 6))
    return avail.select(
        "lang",
        "available_tokens",
        need.alias("target_tokens"),
        rate.alias("sampling_rate"),
        F.round(rate * F.col("available_tokens"), 6).alias("planned_tokens"),
        (need > F.col("available_tokens").cast("double"))
        .alias("oversubscribed"),
    )


def domain_mix_plan_oracle() -> str:
    weight = ("CASE " + " ".join(
        f"WHEN lang = '{lang}' THEN {w}" for lang, w in MIX_TARGET.items())
        + " ELSE 0.0 END")
    return f"""
WITH avail AS (
  SELECT lang, CAST(sum(len({_TOKS})) AS BIGINT) AS available_tokens
  FROM documents GROUP BY lang
),
m AS (
  SELECT lang, available_tokens,
         round(({weight}) * {MIX_BUDGET_TOKENS}, 6) AS target_tokens
  FROM avail
),
r AS (
  SELECT *,
         least(1.0, round(target_tokens /
                          greatest(available_tokens::DOUBLE, 1.0), 6))
           AS sampling_rate
  FROM m
)
SELECT lang, available_tokens, target_tokens, sampling_rate,
       round(sampling_rate * available_tokens, 6) AS planned_tokens,
       target_tokens > available_tokens::DOUBLE AS oversubscribed
FROM r
"""


def sequence_packing_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste accounting for fixed-length training sequences: per
    source, documents/tokens, sequences needed when each doc pads to its
    own ceil(tokens/L) blocks (naive) vs dense packing (ceil(sum/L)), and
    the fraction of compute the naive layout wastes on padding.

    Everything is a per-row projection plus one partial-agg shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source", F.size(tokenize(F.col("text"))).alias("_t"))
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_t").cast("long").alias("total_tokens"),
        F.sum(F.ceil(F.col("_t") / F.lit(PACK_SEQ_LEN)))
        .cast("long").alias("naive_sequences"))
    packed = F.ceil(F.col("total_tokens") / F.lit(PACK_SEQ_LEN)).cast("long")
    return agg.select(
        "source", "n_docs", "total_tokens", "naive_sequences",
        packed.alias("packed_sequences"),
        F.round(1.0 - F.col("total_tokens")
                / (F.col("naive_sequences") * F.lit(PACK_SEQ_LEN)).cast("double"),
                6).alias("naive_pad_waste"),
    )


def sequence_packing_estimate_oracle() -> str:
    return f"""
WITH per_doc AS (
  SELECT source, len({_TOKS}) AS t FROM documents
),
agg AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(t) AS BIGINT) AS total_tokens,
         CAST(sum(CAST(ceil(t / {PACK_SEQ_LEN}.0) AS BIGINT)) AS BIGINT)
           AS naive_sequences
  FROM per_doc GROUP BY source
)
SELECT source, n_docs, total_tokens, naive_sequences,
       CAST(ceil(total_tokens / {PACK_SEQ_LEN}.0) AS BIGINT) AS packed_sequences,
       round(1.0 - total_tokens /
             (naive_sequences * {PACK_SEQ_LEN})::DOUBLE, 6) AS naive_pad_waste
FROM agg
"""


# ---------------------------------------------------------------------------
# quality_filter_funnel
# ---------------------------------------------------------------------------

FUNNEL_MIN_TOKENS = 30
FUNNEL_MIN_QUALITY = 0.78


def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative corpus-cleaning funnel per source: how many docs survive
    length → quality → lang-ID-agreement → exact-dedup gates, in one scan.

    The gates reuse the engine's own operators (quality_metrics,
    with_predicted_lang, the dedup_window_preview keep-best key), so the
    funnel IS the cleaning pipeline a training run would execute — the
    query just counts survivors instead of materializing them."""
    docs = load_table(spark, sf_dir, "documents")
    pred = textstats.with_predicted_lang(docs)
    qm = textstats.quality_metrics(
        pred, keep=("source", "lang", "predicted", "text", "n_chars"))
    w = Window.partitionBy(F.substring("text", 1, PREVIEW_LEN)).orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    flagged = qm.withColumn("rn", F.row_number().over(w))
    p_len = F.col("n_tokens") >= FUNNEL_MIN_TOKENS
    p_q = F.col("quality") >= FUNNEL_MIN_QUALITY
    p_lang = F.col("predicted") == F.col("lang")
    p_dd = F.col("rn") == 1

    def survivors(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        survivors(p_len).alias("after_length"),
        survivors(p_len & p_q).alias("after_quality"),
        survivors(p_len & p_q & p_lang).alias("after_langid"),
        survivors(p_len & p_q & p_lang & p_dd).alias("after_dedup"),
    )


def quality_filter_funnel_oracle() -> str:
    langs = list(STOPWORDS)
    score_cols = ", ".join(f"{_hits(lang)} AS s_{lang}" for lang in langs)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    cases = " ".join(
        f"WHEN s_{lang} = best AND best > 0 THEN '{lang}'" for lang in langs)
    return f"""
WITH base AS (
  SELECT doc_id, source, lang, text, n_chars,
         length(text) AS n_chars_txt,
         len(ts) AS n_tokens,
         length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
         length(regexp_replace(text, '[^\\s]', '', 'g')) AS n_space,
         {score_cols}
  FROM (SELECT *, {_TOKS} AS ts FROM documents)
),
m AS (
  SELECT *,
         CASE {cases} ELSE 'und' END AS predicted,
         round((least(1.0, n_tokens / 20.0)
                + (1.0 - least(1.0, (n_punct / greatest(n_chars_txt, 1)::DOUBLE) * 5.0))
                + (1.0 - least(1.0, (n_digit / greatest(n_chars_txt, 1)::DOUBLE) * 5.0))
                + least(1.0, (s_en / greatest(n_tokens, 1)::DOUBLE) * 4.0)) / 4.0,
               6) AS quality,
         row_number() OVER (PARTITION BY substr(text, 1, {PREVIEW_LEN})
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM (SELECT *, {best} AS best FROM base)
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN n_tokens >= {FUNNEL_MIN_TOKENS} THEN 1 ELSE 0 END) AS BIGINT)
         AS after_length,
       CAST(sum(CASE WHEN n_tokens >= {FUNNEL_MIN_TOKENS}
                      AND quality >= {FUNNEL_MIN_QUALITY} THEN 1 ELSE 0 END) AS BIGINT)
         AS after_quality,
       CAST(sum(CASE WHEN n_tokens >= {FUNNEL_MIN_TOKENS}
                      AND quality >= {FUNNEL_MIN_QUALITY}
                      AND predicted = lang THEN 1 ELSE 0 END) AS BIGINT)
         AS after_langid,
       CAST(sum(CASE WHEN n_tokens >= {FUNNEL_MIN_TOKENS}
                      AND quality >= {FUNNEL_MIN_QUALITY}
                      AND predicted = lang
                      AND rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS after_dedup
FROM m GROUP BY source
"""


# ---------------------------------------------------------------------------
# cleaning_decisions — the per-doc auditable keep/drop table
# ---------------------------------------------------------------------------

CLEAN_MIN_TOKENS = 5
CLEAN_MIN_QUALITY = 0.7
CLEAN_MAX_DUP_BIGRAM = 0.12
CLEAN_MAX_PPL = 30.0
CLEAN_MAX_DUPFRAC = 0.5
_CLEAN_GATES = (
    # (reason, passes-expression builder) — evaluated in order, first
    # failing gate names the drop reason. Thresholds sit at the tails of
    # the test corpus's signal distributions so every gate is live.
    ("too_short", lambda c: c["n_tokens"] >= CLEAN_MIN_TOKENS),
    ("low_quality", lambda c: c["quality"] >= CLEAN_MIN_QUALITY),
    ("repetitive", lambda c: c["dup_bigram_frac"] <= CLEAN_MAX_DUP_BIGRAM),
    ("high_perplexity", lambda c: c["perplexity"] <= CLEAN_MAX_PPL),
    ("boilerplate", lambda c: c["dup_fraction"] <= CLEAN_MAX_DUPFRAC),
)


def cleaning_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning pipeline's AUDITABLE output: one row per document with
    every quality signal the engine computes (token count, composite
    quality, Gopher dup-bigram fraction, bigram-LM perplexity, duplicated-
    window fraction) and the keep/drop decision with the FIRST failing
    gate as its reason — what `corpus MINUS drops` trains on, and what a
    data audit reads to answer 'why was this document removed?'.

    Every signal reuses an oracle-checked operator; the joins are per-doc
    left joins (missing signals — short docs with no bigrams/windows —
    coalesce to passing values so `too_short` is the reason short docs
    carry). One corpus scan per signal family, all map-side-combined."""
    docs = load_table(spark, sf_dir, "documents")
    from ..plans.dedup import doc_dup_fraction as _ddf
    from .textstats import get_textsignals_index

    # n_tokens/quality come from the published per-doc signal store (the
    # same quality_metrics arithmetic, paid once at publish) instead of a
    # fresh tokenize pass — the store-read discipline lang_id_counts et
    # al. already follow; the oracle still rebuilds from raw text.
    qm = get_textsignals_index(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality")
    rep = textstats.repetition_metrics(docs).select(
        "doc_id", "dup_bigram_frac")
    lm = textstats.bigram_lm_scores(docs).select("doc_id", "perplexity")
    dupf = _ddf(spark, sf_dir).select("doc_id", "dup_fraction")
    feat = (qm.join(rep, "doc_id", "left")
            .join(lm, "doc_id", "left")
            .join(dupf, "doc_id", "left")
            .select("doc_id", "n_tokens", "quality",
                    F.coalesce("dup_bigram_frac", F.lit(0.0)).alias("dup_bigram_frac"),
                    F.coalesce("perplexity", F.lit(0.0)).alias("perplexity"),
                    F.coalesce("dup_fraction", F.lit(0.0)).alias("dup_fraction")))
    cols = {c: F.col(c) for c in
            ("n_tokens", "quality", "dup_bigram_frac", "perplexity",
             "dup_fraction")}
    reason = F.lit("none")
    for name, passes in reversed(_CLEAN_GATES):
        reason = F.when(~passes(cols), F.lit(name)).otherwise(reason)
    return feat.select(
        "*", (reason == "none").alias("keep"), reason.alias("reason"))


def cleaning_decisions_oracle() -> str:
    from ..operators.dedup import DUPSPAN_W
    en_hits = _hits("en")
    w = DUPSPAN_W
    return f"""
WITH base AS (
  SELECT doc_id, len(ts) AS n_tokens,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
         length(regexp_replace(text, '[^\\s]', '', 'g')) AS n_space,
         {en_hits} AS sw, ts
  FROM (SELECT doc_id, text, {_TOKS} AS ts FROM documents)
),
qm AS (
  SELECT doc_id, n_tokens,
         round((least(1.0, n_tokens / 20.0)
                + (1.0 - least(1.0, n_punct / greatest(n_chars, 1)::DOUBLE * 5.0))
                + (1.0 - least(1.0, n_digit / greatest(n_chars, 1)::DOUBLE * 5.0))
                + least(1.0, sw / greatest(n_tokens, 1)::DOUBLE * 4.0)) / 4.0,
               6) AS quality
  FROM base
),
bg AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bigram, ts[i] AS w1
  FROM base, unnest(range(1, len(ts))) AS r(i)
  WHERE len(ts) >= 2
),
bcnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
rep AS (
  SELECT doc_id,
         round(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::DOUBLE / sum(c), 6)
           AS dup_bigram_frac
  FROM bcnt GROUP BY doc_id
),
c2 AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
v AS (SELECT count(DISTINCT x) AS v FROM (SELECT unnest(ts) AS x FROM base)),
lm AS (
  SELECT doc_id,
         round(pow(2.0, -round(avg(lp), 6)), 4) AS perplexity
  FROM (
    SELECT b.doc_id,
           log2(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v)) AS lp
    FROM bg b JOIN c2 USING (bigram) JOIN c1 USING (w1), v
  ) GROUP BY doc_id
),
win AS (
  SELECT doc_id, i AS pos,
         list_aggregate(ts[i:i+{w}-1], 'string_agg', ' ') AS wstr
  FROM base, unnest(range(1, len(ts) - {w} + 2)) AS r(i)
  WHERE len(ts) >= {w}
),
dup AS (SELECT wstr FROM win GROUP BY wstr HAVING count(DISTINCT doc_id) >= 2),
dc AS (
  SELECT w.doc_id, count(*) AS nd FROM win w JOIN dup USING (wstr)
  GROUP BY w.doc_id
),
tot AS (SELECT doc_id, count(*) AS nw FROM win GROUP BY doc_id),
dupf AS (
  SELECT t.doc_id,
         round(coalesce(dc.nd, 0) / CAST(t.nw AS DOUBLE), 6) AS dup_fraction
  FROM tot t LEFT JOIN dc ON t.doc_id = dc.doc_id
),
feat AS (
  SELECT q.doc_id, q.n_tokens, q.quality,
         coalesce(r.dup_bigram_frac, 0.0) AS dup_bigram_frac,
         coalesce(l.perplexity, 0.0) AS perplexity,
         coalesce(d.dup_fraction, 0.0) AS dup_fraction
  FROM qm q
  LEFT JOIN rep r USING (doc_id)
  LEFT JOIN lm l USING (doc_id)
  LEFT JOIN dupf d USING (doc_id)
)
SELECT doc_id, n_tokens, quality, dup_bigram_frac, perplexity,
       dup_fraction, (reason = 'none') AS keep, reason
FROM (
  SELECT doc_id, n_tokens, quality, dup_bigram_frac, perplexity,
         dup_fraction,
         CASE
           WHEN NOT (n_tokens >= {CLEAN_MIN_TOKENS}) THEN 'too_short'
           WHEN NOT (quality >= {CLEAN_MIN_QUALITY}) THEN 'low_quality'
           WHEN NOT (dup_bigram_frac <= {CLEAN_MAX_DUP_BIGRAM}) THEN 'repetitive'
           WHEN NOT (perplexity <= {CLEAN_MAX_PPL}) THEN 'high_perplexity'
           WHEN NOT (dup_fraction <= {CLEAN_MAX_DUPFRAC}) THEN 'boilerplate'
           ELSE 'none'
         END AS reason
  FROM feat
)
"""


# ---------------------------------------------------------------------------
# decontamination_spans — cut the contaminated span, not the document
# ---------------------------------------------------------------------------


def decontamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination: the maximal token spans where benchmark
    w-grams occur in corpus documents — what a pipeline CUTS when the
    document is otherwise fine (dropping whole docs for one leaked
    benchmark sentence wastes data; cutting the span is the standard
    remedy). Composition of the engine's own pieces: the positional
    window machinery at the shingle width, a broadcast semi join against
    the benchmark's w-gram hash keys, and the shared gaps-and-islands
    span merge. Only matching positions shuffle — cost tracks the
    contamination rate, not corpus size."""
    from ..operators import dedup as dedup_ops

    docs = load_table(spark, sf_dir, "documents")
    w = dedup_ops.SHINGLE_W
    wins = dedup_ops.window_index(docs, w=w)
    bench_grams = sorted({s for _, btext in CONTAM_BENCH
                          for s in sampling.py_shingles(btext, w)})
    bench_df = local_df(spark, [(g,) for g in bench_grams], "g string")
    bench_keys = bench_df.select(F.xxhash64("g").alias("_h1"),
                                 F.crc32("g").alias("_h2"))
    marked = wins.join(F.broadcast(bench_keys), ["_h1", "_h2"], "left_semi")
    return dedup_ops.positions_to_spans(marked, w)


def decontamination_spans_oracle() -> str:
    from ..operators import dedup as dedup_ops
    w = dedup_ops.SHINGLE_W
    grams = sorted({s for _, btext in CONTAM_BENCH
                    for s in sampling.py_shingles(btext, w)})
    rows = ", ".join(f"('{g}')" for g in grams)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_؀-ۿ]+'),
                     x -> length(x) >= 2) AS ts
  FROM documents
),
win AS (
  SELECT doc_id, i AS pos,
         list_aggregate(ts[i:i+{w}-1], 'string_agg', ' ') AS wstr
  FROM toks, unnest(range(1, len(ts) - {w} + 2)) AS r(i)
  WHERE len(ts) >= {w}
),
bench(g) AS (VALUES {rows}),
marked AS (SELECT w.doc_id, w.pos FROM win w JOIN bench b ON w.wstr = b.g),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos = lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 1
              THEN 0 ELSE 1 END AS b
  FROM marked
),
isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
  FROM brk
)
SELECT doc_id, min(pos) AS span_start,
       max(pos) - min(pos) + {w} AS span_len,
       count(*) AS n_windows
FROM isl GROUP BY doc_id, gid
"""


def materialize_clean_corpus(spark: SparkSession, sf_dir: str,
                             out_dir: str) -> dict:
    """The pipeline's terminal SINK: corpus MINUS cleaning drops MINUS
    near-dup removals, written as lang-partitioned parquet (the training
    corpus a run actually reads). Both drop sets are the engine's own
    auditable tables (`cleaning_decisions`, `dedup_removal_list`), so
    every absent doc has a recorded reason; anti-joins keep the write
    one pass over survivors. Returns the summary stats dict a pipeline
    logs (input/dropped/deduped/written counts)."""
    from ..plans.dedup import dedup_removal_list
    from ..sources.layout import write_partitioned

    docs = load_table(spark, sf_dir, "documents")
    drops = cleaning_decisions(spark, sf_dir).filter(~F.col("keep")) \
        .select("doc_id")
    dups = dedup_removal_list(spark, sf_dir).select("doc_id")
    clean = (docs.join(drops, "doc_id", "left_anti")
             .join(dups, "doc_id", "left_anti"))
    write_partitioned(clean, out_dir, "lang")
    n_in = docs.count()
    n_drop = drops.count()
    n_dup = dups.count()
    n_out = spark.read.parquet(out_dir).count()
    return {"n_input": n_in, "n_quality_dropped": n_drop,
            "n_dedup_removed": n_dup, "n_written": n_out}


# ---------------------------------------------------------------------------
# mix_sample_realization — execute the mix plan as a deterministic sample
# ---------------------------------------------------------------------------

_MIX_HEX_DIGITS = 6                      # sample on the first 6 hex chars
_MIX_HEX_SPACE = 16 ** _MIX_HEX_DIGITS   # = 16777216 outcomes


def mix_sample_realization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the loop on `domain_mix_plan`: apply each language's computed
    sampling rate as a deterministic content-addressed sample and report
    what the plan REALIZES — per language, the docs kept and the tokens
    they carry next to the planned rate. Membership compares the first 6
    hex chars of sha256(doc_id) against printf('%06x', floor(rate·16^6)):
    fixed-width lowercase hex compares lexicographically as numbers in
    both engines, so the sample is exact, seedless, and identical on
    rerun/backfill (the `sampling.split_label` invariance class). The
    rate table is ~n_langs rows joined broadcast; everything else is one
    scan + one partial agg."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokenize(F.col("text"))).alias("_t"))
    rates = domain_mix_plan(spark, sf_dir).select("lang", "sampling_rate")
    thr = F.format_string(
        "%06x",
        F.floor(F.col("sampling_rate") * _MIX_HEX_SPACE).cast("int"))
    prefix = F.substring(F.sha2(F.col("doc_id").cast("string"), 256),
                         1, _MIX_HEX_DIGITS)
    keep = (F.col("sampling_rate") >= 1.0) | (prefix < thr)
    return (docs.join(F.broadcast(rates), "lang")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(keep.cast("long")).alias("n_sampled"),
                 F.sum(F.when(keep, F.col("_t")).otherwise(F.lit(0)))
                 .cast("long").alias("realized_tokens"),
                 F.max("sampling_rate").alias("sampling_rate")))


def mix_sample_realization_oracle() -> str:
    weight = ("CASE " + " ".join(
        f"WHEN lang = '{lang}' THEN {w}" for lang, w in MIX_TARGET.items())
        + " ELSE 0.0 END")
    return f"""
WITH avail AS (
  SELECT lang, CAST(sum(len({_TOKS})) AS BIGINT) AS available_tokens
  FROM documents GROUP BY lang
),
r AS (
  SELECT lang,
         least(1.0, round(round(({weight}) * {MIX_BUDGET_TOKENS}, 6) /
                          greatest(available_tokens::DOUBLE, 1.0), 6))
           AS sampling_rate
  FROM avail
),
d AS (
  SELECT doc_id, lang, len({_TOKS}) AS _t,
         substr(sha256(CAST(doc_id AS VARCHAR)), 1, {_MIX_HEX_DIGITS}) AS pfx
  FROM documents
),
k AS (
  SELECT d.lang, d._t, r.sampling_rate,
         (r.sampling_rate >= 1.0 OR
          d.pfx < printf('%06x',
                         CAST(floor(r.sampling_rate * {_MIX_HEX_SPACE})
                              AS INTEGER))) AS keep
  FROM d JOIN r USING (lang)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN keep THEN _t ELSE 0 END) AS BIGINT)
           AS realized_tokens,
       max(sampling_rate) AS sampling_rate
FROM k
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# training_shard_manifest — deterministic shuffle + shard manifest
# ---------------------------------------------------------------------------

TRAIN_SHARDS = 8


def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'materialize the training order' step: every doc gets a
    content-addressed shuffle key (sha256(seed||id) —
    `sampling.shuffle_key`; rerun-stable, new epoch = new seed) and a
    shard from the key's hex range; the manifest reports per shard the
    doc/char totals and the order's endpoints (first/last key + the docs
    holding them), which is what a training loader checks before reading
    a shard sequentially in key order. One map pass + one 8-group agg;
    writing the shards themselves is one repartition+sortWithinPartitions
    regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sharded = sampling.with_shard(docs, TRAIN_SHARDS)
    return (sharded.groupBy("shard")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("n_chars"),
                 F.min("shuffle_key").alias("min_key"),
                 F.max("shuffle_key").alias("max_key"),
                 F.min_by("doc_id", F.col("shuffle_key")).alias("first_doc"),
                 F.max_by("doc_id", F.col("shuffle_key")).alias("last_doc"))
            .orderBy("shard"))


def training_shard_manifest_oracle() -> str:
    bounds = sampling.shard_bounds(TRAIN_SHARDS)
    cases = " ".join(
        f"WHEN substr(k, 1, 2) < '{b}' THEN {i}"
        for i, b in enumerate(bounds))
    return f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         sha256(concat('{sampling.SHARD_SEED}', CAST(doc_id AS VARCHAR))) AS k
  FROM documents
),
sharded AS (
  SELECT doc_id, n_chars,
         CASE {cases} ELSE {TRAIN_SHARDS - 1} END::INT AS shard, k
  FROM keyed
)
SELECT shard,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS n_chars,
       min(k) AS min_key,
       max(k) AS max_key,
       arg_min(doc_id, k) AS first_doc,
       arg_max(doc_id, k) AS last_doc
FROM sharded
GROUP BY shard
ORDER BY shard
"""


# ---------------------------------------------------------------------------
# curriculum_sample_plan — quality-tiered deterministic sampling
# ---------------------------------------------------------------------------

CURRICULUM_Q_HIGH = 0.79
CURRICULUM_Q_MID = 0.73
# tier -> deterministic sampling rate: high-quality text trains at full
# rate, mid-quality is thinned, low-quality kept at a trickle (the
# standard quality-classifier gating, e.g. GPT-3's CommonCrawl
# filtering). Thresholds sit inside the synthetic corpus's quality
# range (0.6-0.95, median ~0.78) so every tier is live at test scale.
CURRICULUM_RATES = {"high": 1.0, "mid": 0.5, "low": 0.1}


def curriculum_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum sampling: docs are tiered on the composite
    quality score (the same oracle-checked signal the cleaning funnel
    gates on) and each tier samples at its own deterministic rate via the
    content-addressed hex-threshold membership `mix_sample_realization`
    uses — rerun/backfill-stable, seedless, map-only. Because the rates
    are per-TIER constants, the thresholds fold into one CASE (no join,
    no hex->int arithmetic anywhere). Reports per tier what the
    curriculum realizes: docs kept and the tokens they carry."""
    from .textstats import get_textsignals_index

    # quality + n_tokens served from the published per-doc signal store
    # (same arithmetic, no per-query tokenize pass; oracle replays from
    # raw text)
    qm = get_textsignals_index(spark, sf_dir)
    q = F.col("quality")
    tier = (F.when(q >= CURRICULUM_Q_HIGH, F.lit("high"))
            .when(q >= CURRICULUM_Q_MID, F.lit("mid"))
            .otherwise(F.lit("low")))
    rate = (F.when(q >= CURRICULUM_Q_HIGH,
                   F.lit(CURRICULUM_RATES["high"]))
            .when(q >= CURRICULUM_Q_MID, F.lit(CURRICULUM_RATES["mid"]))
            .otherwise(F.lit(CURRICULUM_RATES["low"])))
    thr = (F.when(q >= CURRICULUM_Q_HIGH,
                  F.lit(_hex_rate(CURRICULUM_RATES["high"])))
           .when(q >= CURRICULUM_Q_MID,
                 F.lit(_hex_rate(CURRICULUM_RATES["mid"])))
           .otherwise(F.lit(_hex_rate(CURRICULUM_RATES["low"]))))
    prefix = F.substring(F.sha2(F.col("doc_id").cast("string"), 256),
                         1, _MIX_HEX_DIGITS)
    keep = (rate >= 1.0) | (prefix < thr)
    return (qm.select(tier.alias("tier"), rate.alias("sampling_rate"),
                      "n_tokens", keep.alias("_k"))
            .groupBy("tier")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(F.col("_k").cast("long")).alias("n_sampled"),
                 F.sum(F.when(F.col("_k"), F.col("n_tokens"))
                       .otherwise(F.lit(0))).cast("long")
                 .alias("realized_tokens"),
                 F.max("sampling_rate").alias("sampling_rate"))
            .orderBy("tier"))


def _hex_rate(rate: float) -> str:
    """printf('%06x', floor(rate * 16^6)) precomputed driver-side —
    fixed-width lowercase hex, the exact string both engines compare
    the sha prefix against."""
    return format(int(rate * _MIX_HEX_SPACE), "06x")


def curriculum_sample_plan_oracle() -> str:
    h, m = CURRICULUM_Q_HIGH, CURRICULUM_Q_MID
    rh, rm, rl = (CURRICULUM_RATES["high"], CURRICULUM_RATES["mid"],
                  CURRICULUM_RATES["low"])
    return f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars_txt,
         len(ts) AS n_tokens,
         length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
         {_hits('en')} AS s_en
  FROM (SELECT *, {_TOKS} AS ts FROM documents)
),
q AS (
  SELECT doc_id, n_tokens,
         round((least(1.0, n_tokens / 20.0)
                + (1.0 - least(1.0, (n_punct / greatest(n_chars_txt, 1)::DOUBLE) * 5.0))
                + (1.0 - least(1.0, (n_digit / greatest(n_chars_txt, 1)::DOUBLE) * 5.0))
                + least(1.0, (s_en / greatest(n_tokens, 1)::DOUBLE) * 4.0)) / 4.0,
               6) AS quality,
         substr(sha256(CAST(doc_id AS VARCHAR)), 1, {_MIX_HEX_DIGITS}) AS pfx
  FROM base
),
t AS (
  SELECT n_tokens, pfx,
         CASE WHEN quality >= {h} THEN 'high'
              WHEN quality >= {m} THEN 'mid' ELSE 'low' END AS tier,
         CASE WHEN quality >= {h} THEN {rh}
              WHEN quality >= {m} THEN {rm} ELSE {rl} END AS sampling_rate,
         CASE WHEN quality >= {h} THEN '{_hex_rate(rh)}'
              WHEN quality >= {m} THEN '{_hex_rate(rm)}'
              ELSE '{_hex_rate(rl)}' END AS thr
  FROM q
),
k AS (
  SELECT tier, sampling_rate, n_tokens,
         (sampling_rate >= 1.0 OR pfx < thr) AS keep
  FROM t
)
SELECT tier,
       count(*)::BIGINT AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
           AS realized_tokens,
       max(sampling_rate) AS sampling_rate
FROM k
GROUP BY tier
ORDER BY tier
"""
