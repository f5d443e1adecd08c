"""Candidate fusion + weighted re-ranking (SURVEY §2.3 J1/J2, §2.7 F13-F17,
§2.9 Q2/Q4/Q6).

The reference merges its two retrieval legs with a dict keyed by doc_id
(/root/reference/mcp_server/tools.py:95-127 and
/root/reference/quran_mcp/search.py:217-252). The faithful relational shape
is a FULL OUTER join on the candidate key, `coalesce` on the per-leg scores,
then one scoring expression — a plain `union` would lose per-side scores
(SURVEY D3).

Scale: both legs arrive pre-limited (over-fetch max(50, 5n) per the
reference, tools.py:87,93), so fusion always joins two small DataFrames —
broadcastable by construction regardless of corpus size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import clamp01


@dataclass(frozen=True)
class Weights:
    """Fusion weights (SURVEY Q2). Defaults = the reference's balanced
    preset (/root/reference/mcp_server/apps/scoring.py:21-34); `narrator`
    is the spec's narrator_match_bonus (HADITH_SEARCH_SPEC.md:330-332,
    0.4 when any query term appears in the narrator field — spec'd but
    never shipped in the reference's scorer), applied only by callers
    that pass a narrator hit column."""
    vector: float = 0.6
    fts: float = 0.4
    coverage: float = 0.2
    phrase: float = 0.05
    proximity: float = 0.10
    narrator: float = 0.40


BALANCED = Weights()
TERM_PRIORITY = Weights(vector=0.3, fts=0.3, coverage=0.6, phrase=0.20)
# Quran-engine presets (search.py:194-200)
SEMANTIC_ONLY = Weights(vector=1.0, fts=0.0, coverage=0.0, phrase=0.0, proximity=0.0)
FTS_ONLY = Weights(vector=0.0, fts=1.0, coverage=0.0, phrase=0.0, proximity=0.0)

MODES = {
    "balanced": BALANCED,
    "term-priority": TERM_PRIORITY,
    "semantic": SEMANTIC_ONLY,
    "fts": FTS_ONLY,
}


def resolve_weights(mode: str = "balanced", fts_available: bool = True,
                    vector_available: bool = True) -> Weights:
    """Q2 preset lookup + Q4/Q5 graceful degradation: a dead leg re-weights
    to the surviving one (tools.py:85-89, search.py:203-215)."""
    w = MODES[mode]
    if not vector_available and not fts_available:
        raise ValueError("both retrieval legs unavailable")
    if not vector_available:
        return Weights(vector=0.0, fts=1.0, coverage=w.coverage,
                       phrase=w.phrase, proximity=w.proximity)
    if not fts_available:
        return Weights(vector=1.0, fts=0.0, coverage=w.coverage,
                       phrase=w.phrase, proximity=w.proximity)
    if w.vector == 0.0 and w.fts == 0.0:
        return Weights(vector=1.0, fts=0.0, coverage=w.coverage,
                       phrase=w.phrase, proximity=w.proximity)
    return w


def fts_signal(score: Column) -> Column:
    """Map an unbounded higher-is-better BM25 score into [0,1):
    s/(s+1) — monotone, no corpus-dependent normalizer. (The reference's
    1/(1+bm25) assumed FTS5's lower-is-better rank; our relational BM25 is
    higher-is-better, so the bounded transform flips accordingly.)"""
    s = F.greatest(F.lit(0.0), score)
    return s / (s + 1.0)


def vec_signal(sim: Column) -> Column:
    """Cosine similarity clamped into [0,1] (negative = unrelated)."""
    return clamp01(sim)


def fuse(fts_hits: DataFrame, vec_hits: DataFrame,
         key: str | list[str] = "doc_id") -> DataFrame:
    """J1/J2: full-outer fusion of the two candidate lists, keeping both
    raw scores (missing side -> 0.0). fts_hits: (key, bm25); vec_hits:
    (key, sim). `key` may be composite — e.g. (query_id, doc_id) for
    batch-of-queries fusion, where the same shape fuses N queries in one
    pass.

    Planned as union + group-agg rather than a FULL OUTER join: both
    inputs are top-k candidate lists with AT MOST ONE row per key (the
    precondition), so `max` over the {value, NULL-filler} pair per side
    reproduces the outer join's coalesce exactly — including negative
    cosine scores, which a 0.0 filler under max would clobber — while
    costing ONE exchange instead of the join's two sorted exchanges."""
    keys = [key] if isinstance(key, str) else list(key)
    f = (fts_hits.withColumnRenamed("bm25", "fts_score")
         .withColumn("vector_sim", F.lit(None).cast("double")))
    v = (vec_hits.withColumnRenamed("sim", "vector_sim")
         .withColumn("fts_score", F.lit(None).cast("double")))
    cols = [*keys, "fts_score", "vector_sim"]
    return (
        f.select(*cols).unionByName(v.select(*cols))
        .groupBy(*keys)
        .agg(
            F.coalesce(F.max("fts_score"), F.lit(0.0)).alias("fts_score"),
            F.coalesce(F.max("vector_sim"), F.lit(0.0)).alias("vector_sim"),
        )
    )


def score(fused: DataFrame, w: Weights,
          coverage_col: Column | None = None,
          phrase_hit_col: Column | None = None,
          proximity_hit_col: Column | None = None,
          grading_col: Column | None = None,
          narrator_hit_col: Column | None = None) -> DataFrame:
    """F17 weighted linear fusion with a per-hit breakdown (Q6). Emits flat
    signal columns, a nested `breakdown` struct (the reference's
    ScoreBreakdown, /root/reference/mcp_server/apps/scoring.py:11-18), and
    `score`; callers sort/limit (T3). The total is clamped to [0,1] like the
    reference (scoring.py:96-97). Flat columns stay the oracle-comparable
    surface — the struct is the API parity item.

    `grading_col` (opt-in, for corpora that carry an authenticity grading
    string) adds the spec'd quality boost (functions.text.grading_boost,
    HADITH_SEARCH_SPEC.md:352-356) into the total and a flat
    `grading_bonus` column; `narrator_hit_col` (opt-in, boolean) adds the
    spec's narrator_match_bonus (w.narrator, spec:330-332) and a flat
    `narrator_bonus` column. When absent the output schema is unchanged
    (the shipped reference scorer has neither input)."""
    from ..functions.text import grading_boost
    cov = coverage_col if coverage_col is not None else F.lit(0.0)
    phr = (F.when(phrase_hit_col, w.phrase).otherwise(0.0)
           if phrase_hit_col is not None else F.lit(0.0))
    prox = (F.when(proximity_hit_col, w.proximity).otherwise(0.0)
            if proximity_hit_col is not None else F.lit(0.0))
    grad = grading_boost(grading_col) if grading_col is not None else None
    narr = (F.when(narrator_hit_col, w.narrator).otherwise(0.0)
            if narrator_hit_col is not None else None)
    fsig = fts_signal(F.col("fts_score"))
    vsig = vec_signal(F.col("vector_sim"))
    total = clamp01(w.vector * vsig + w.fts * fsig + w.coverage * cov + phr
                    + prox + (grad if grad is not None else F.lit(0.0))
                    + (narr if narr is not None else F.lit(0.0)))
    extra_cols = []
    if narr is not None:
        extra_cols.append(F.round(narr, 6).alias("narrator_bonus"))
    if grad is not None:
        extra_cols.append(F.round(grad, 6).alias("grading_bonus"))
    # the opt-in bonuses also join the breakdown struct, so
    # breakdown.total always equals the sum of the struct's components
    extra_struct = []
    if narr is not None:
        extra_struct.append(F.col("narrator_bonus").alias("narrator_bonus"))
    if grad is not None:
        extra_struct.append(F.col("grading_bonus").alias("grading_bonus"))
    return fused.select(
        "*",
        F.round(vsig, 6).alias("vec_signal"),
        F.round(fsig, 6).alias("fts_sig"),
        F.round(cov, 6).alias("coverage"),
        F.round(phr, 6).alias("phrase_bonus"),
        F.round(prox, 6).alias("proximity_bonus"),
        *extra_cols,
        F.round(total, 6).alias("score"),
    ).withColumn(
        "breakdown",
        F.struct(
            F.col("vec_signal").alias("vector_similarity"),
            F.col("fts_sig").alias("fts_signal"),
            F.col("phrase_bonus").alias("phrase_bonus"),
            F.col("proximity_bonus").alias("proximity_bonus"),
            F.col("coverage").alias("term_coverage"),
            *extra_struct,
            F.col("score").alias("total"),
        ),
    )


def explanation_col(coverage: Column | None = None,
                    phrase_bonus: Column | None = None,
                    narrator_bonus: Column | None = None,
                    grading_bonus: Column | None = None) -> Column:
    """Column twin of `explain_ranking` — the spec's 5-tier explanation
    (HADITH_SEARCH_SPEC.md:487-496) as one CASE expression, so batch
    plans emit the explanation in-plan and a SQL oracle can replay it.
    Absent signals read as 0 (their tier can never fire). The coverage
    percentage rounds HALF_UP on the shortest repr, matching the python
    twin's Decimal(repr(x)) discipline (equality is test-pinned)."""
    zero = F.lit(0.0)
    cov = coverage if coverage is not None else zero
    phr = phrase_bonus if phrase_bonus is not None else zero
    nar = narrator_bonus if narrator_bonus is not None else zero
    grd = grading_bonus if grading_bonus is not None else zero
    pct = F.round(cov * 100, 0).cast("int").cast("string")
    return (
        F.when(phr > 0, F.lit("🎯 Perfect: Contains your exact phrase"))
        .when(nar > 0, F.concat(
            F.lit("⭐ Excellent: Matches narrator and "), pct,
            F.lit("% of terms")))
        .when(cov >= 0.8, F.concat(
            F.lit("✅ Good: Contains "), pct, F.lit("% of your terms")))
        .when(grd > 0, F.lit(
            "📚 Relevant: High-quality hadith with semantic match"))
        .otherwise(F.lit("🔄 Semantic: Similar meaning, different wording")))


def explain_ranking(row: dict) -> str:
    """Human-readable ranking explanation — the reference's spec'd
    `_explain_ranking` (HADITH_SEARCH_SPEC.md:487-496), never shipped in
    its code. Tier order is the spec's: exact phrase > narrator match >
    high term coverage (>= 0.8) > grading quality > semantic fallback.
    Operates on a collected result row dict; bonus keys absent from the
    row (they are schema-opt-in) read as 0. The coverage percentage uses
    the same shortest-repr HALF_UP rounding discipline as the engine's
    displayed signals."""
    from decimal import ROUND_HALF_UP, Decimal

    def g(k: str) -> float:
        v = row.get(k)
        return float(v) if v is not None else 0.0

    cov = g("coverage")
    pct = int(Decimal(repr(cov * 100)).quantize(
        Decimal("1"), rounding=ROUND_HALF_UP))
    if g("phrase_bonus") > 0:
        return "🎯 Perfect: Contains your exact phrase"
    if g("narrator_bonus") > 0:
        return f"⭐ Excellent: Matches narrator and {pct}% of terms"
    if cov >= 0.8:
        return f"✅ Good: Contains {pct}% of your terms"
    if g("grading_bonus") > 0:
        return "📚 Relevant: High-quality hadith with semantic match"
    return "🔄 Semantic: Similar meaning, different wording"
