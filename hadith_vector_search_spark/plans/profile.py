"""Corpus/table profiling, sketch-bounded aggregates, deterministic
stratified sampling, batch sessionization, rolling time-range windows, and
greedy sequence packing.

These extend the engine's data-ops surface beyond the reference's
validation/reporting (its DATA_QUALITY_REPORT.md pipeline and
`mcp_server/apps/ingestion.py` stats roll-up) toward what a 100 TB
training-data pipeline operates on daily: one-pass column profiles for
data-quality dashboards, HLL/GK sketches with *verified* error bounds
(the sketch answer is checked in-plan against the exact answer, so the
oracle binds on a deterministic report — same pattern as
`ann_topk_ivf_kmeans`'s recall-bound oracle), hash-stratified sampling
that is rerun-stable with zero seed state, session/rolling windows over
the event stream, and the next-fit packing assignment that turns token
budgets into training batches.

Scale posture (SCALE.md "pipeline suite"):
- `table_profile`: ONE scan; the multi-count(distinct) agg expands rows
  (Spark's Expand operator, one row per distinct-aggregate per input row)
  but partial-aggregates map-side, so the shuffle carries ~distinct keys,
  not input rows. At extreme cardinality swap count(distinct) for
  approx_count_distinct — the bounded-sketch variant below is the template.
- `approx_distinct_bounds` / `approx_quantile_bounds`: sketches are the
  100 TB answer (fixed-size state, one pass, mergeable across partitions);
  the exact sides here are the *verifier*, kept because test SFs make them
  cheap. The quantile check broadcasts the 4-row quantile table into the
  rank-count pass — no shuffle of lineitem at all.
- `stratified_sample`: map-only predicate on sha256(key) — pushes to the
  scan, samples every stratum at the same rate without per-stratum state,
  and never moves a row between reruns or backfills (same property as
  `sampling.split_label`).
- `user_sessions_batch` / `rolling_event_rate`: one hash-partition shuffle
  on user_id each; the session id is a running sum over an already-sorted
  partition, the rolling frame is a RANGE window on unix_micros — both
  whole-stage-codegen window operators, no self-joins.
- `greedy_pack_assignments`: packing is inherently sequential WITHIN a
  shard (bin state folds left-to-right) and embarrassingly parallel ACROSS
  shards — exactly applyInPandas's contract (one Arrow batch per source
  group). At 100 TB the shard key is (source, date, hash-bucket) so each
  group stays executor-sized; the oracle replays the same fold as a
  recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from ..sources import load_table

# ---------------------------------------------------------------------------
# table_profile — one-pass per-column profile (data-quality dashboard row)
# ---------------------------------------------------------------------------

# (column, is_numeric) — numeric columns report rounded numeric min/max,
# string columns report lexicographic min/max; each side leaves the other
# representation NULL so no cross-engine number→string formatting is needed.
_PROFILE_COLS: tuple[tuple[str, bool], ...] = (
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_totalprice", True),
    ("o_orderstatus", False),
    ("o_orderpriority", False),
)


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of `orders`: row count, null count, exact
    distinct count, min/max — one independent single-column aggregation
    branch per profiled column, unioned.

    Why branches and not one wide agg (the round-5..13 form): a single
    agg carrying five count(DISTINCT)s PLUS string min/max plans as an
    interpreted SortAggregate over a 6-way Expand — (#cols+1) x row
    multiplication through a row-at-a-time, non-codegen operator with a
    ~31-function buffer (measured 3.4 s at sf0.1 vs 0.5 s for the
    branches; the string aggregates make the buffer non-mutable, which
    is what knocks the plan off the hash path). Each branch is a
    column-pruned scan of ONE column into a codegen'd two-phase hash
    aggregate (single distinct -> no Expand at all), and AQE runs the
    independent branches concurrently inside the one action. Total scan
    bytes are unchanged — five one-column scans read exactly the same
    columnar pages as one five-column scan."""
    orders = load_table(spark, sf_dir, "orders")
    outs = []
    for col, numeric in _PROFILE_COLS:
        if numeric:
            outs.append(orders.select(col).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(col).isNull().cast("long")).alias("n_nulls"),
                F.countDistinct(col).alias("n_distinct"),
                F.round(F.min(col).cast("double"), 2).alias("min_num"),
                F.round(F.max(col).cast("double"), 2).alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            ).select(
                F.lit(col).alias("column_name"), "n_rows", "n_nulls",
                "n_distinct", "min_num", "max_num", "min_str", "max_str"))
            continue
        # String columns take a further step: a STRING min/max inside a
        # global agg buffer is non-mutable, which knocks the whole branch
        # onto interpreted SortAggregate (a local sort of every row per
        # partition). Two-level instead: group by the value first (a
        # codegen'd hash agg — buffer is one long), then profile the
        # tiny (value, count) frame, where the object aggregate touches
        # ~n_distinct rows instead of the table.
        g = (orders.select(col).groupBy(col)
             .agg(F.count(F.lit(1)).alias("_c")))
        outs.append(g.agg(
            F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce(F.sum(F.when(F.col(col).isNull(), F.col("_c"))
                             .otherwise(F.lit(0))), F.lit(0))
            .cast("long").alias("n_nulls"),
            F.count(F.when(F.col(col).isNotNull(), F.lit(1)))
            .alias("n_distinct"),
            F.lit(None).cast("double").alias("min_num"),
            F.lit(None).cast("double").alias("max_num"),
            F.min(col).alias("min_str"),
            F.max(col).alias("max_str"),
        ).select(
            F.lit(col).alias("column_name"), "n_rows", "n_nulls",
            "n_distinct", "min_num", "max_num", "min_str", "max_str"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def table_profile_oracle() -> str:
    parts = []
    for col, numeric in _PROFILE_COLS:
        mn = f"round(CAST(min({col}) AS DOUBLE), 2)" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"round(CAST(max({col}) AS DOUBLE), 2)" if numeric else "CAST(NULL AS DOUBLE)"
        ms = "CAST(NULL AS VARCHAR)" if numeric else f"min({col})"
        xs = "CAST(NULL AS VARCHAR)" if numeric else f"max({col})"
        parts.append(f"""
SELECT '{col}' AS column_name,
       count(*) AS n_rows,
       count(*) - count({col}) AS n_nulls,
       count(DISTINCT {col}) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num,
       {ms} AS min_str, {xs} AS max_str
FROM orders""")
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# approx_distinct_bounds — HLL++ sketch checked against the exact answer
# ---------------------------------------------------------------------------

_HLL_RSD = 0.05          # relative standard deviation passed to the sketch
_HLL_TOLERANCE = 0.15    # accept |approx-exact|/exact <= 3*rsd

_DISTINCT_TARGETS: tuple[tuple[str, str], ...] = (
    ("events", "user_id"),
    ("orders", "o_custkey"),
    ("lineitem", "l_partkey"),
)


def approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch vs exact, per target column.

    The sketch is the 100 TB operator (constant memory, single pass,
    mergeable partial state — the exact count(distinct) shuffles every
    distinct key). This query *verifies* the sketch: it emits the exact
    count plus a boolean `within_bounds` asserting the sketch landed
    inside 3x its configured rsd, so the deterministic oracle can bind on
    the report even though the sketch value itself is
    implementation-defined."""
    outs = []
    for table, col in _DISTINCT_TARGETS:
        df = load_table(spark, sf_dir, table)
        outs.append(df.agg(
            F.lit(f"{table}.{col}").alias("entity"),
            F.countDistinct(col).alias("exact_distinct"),
            F.approx_count_distinct(col, rsd=_HLL_RSD).alias("_approx"),
        ).select(
            "entity", "exact_distinct",
            (F.abs(F.col("_approx") - F.col("exact_distinct"))
             <= F.lit(_HLL_TOLERANCE) * F.col("exact_distinct"))
            .alias("within_bounds")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def approx_distinct_bounds_oracle() -> str:
    parts = [
        f"""SELECT '{table}.{col}' AS entity,
       count(DISTINCT {col}) AS exact_distinct,
       TRUE AS within_bounds
FROM {table}"""
        for table, col in _DISTINCT_TARGETS
    ]
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# approx_quantile_bounds — GK quantile sketch checked against exact ranks
# ---------------------------------------------------------------------------

_QUANTILES: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)
_PA_ACCURACY = 10_000  # percentile_approx guarantees rank error <= N/accuracy


def approx_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx(l_extendedprice) at several quantiles, verified by
    rank: the true rank of the sketch's answer (count of rows <= value)
    must lie within q*N +- 2*N/accuracy + 1. The verification pass
    broadcasts the 4-row quantile table into one scan of lineitem — the
    fact table itself is never shuffled."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    qarr = F.percentile_approx(
        "l_extendedprice", list(_QUANTILES), _PA_ACCURACY)
    qrows = (li.agg(qarr.alias("qs"))
             .select(F.posexplode("qs").alias("qi", "qval"))
             .select(F.col("qi"), F.col("qval")))
    tol = 2.0 / _PA_ACCURACY
    joined = li.crossJoin(F.broadcast(qrows))
    return (joined.groupBy("qi")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum((F.col("l_extendedprice") <= F.col("qval"))
                       .cast("long")).alias("_rank"))
            .select(
                F.element_at(
                    F.array(*[F.lit(f"q{q}") for q in _QUANTILES]),
                    F.col("qi").cast("int") + 1).alias("quantile"),
                "n_rows",
                ((F.col("_rank")
                  >= F.floor((F.element_at(
                      F.array(*[F.lit(q) for q in _QUANTILES]),
                      F.col("qi").cast("int") + 1) - tol)
                      * F.col("n_rows")) - 1)
                 & (F.col("_rank")
                    <= F.ceil((F.element_at(
                        F.array(*[F.lit(q) for q in _QUANTILES]),
                        F.col("qi").cast("int") + 1) + tol)
                        * F.col("n_rows")) + 1))
                .alias("within_bounds")))


def approx_quantile_bounds_oracle() -> str:
    parts = [
        f"""SELECT 'q{q}' AS quantile, count(*) AS n_rows, TRUE AS within_bounds
FROM lineitem"""
        for q in _QUANTILES
    ]
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# stratified_sample — deterministic hash sampling, verified per stratum
# ---------------------------------------------------------------------------

_SAMPLE_BOUND = "1a"  # sha256 2-hex-char prefix < '1a' keeps 26/256 ~ 10.2%


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mktsegment summary of a deterministic ~10% customer sample.

    Membership is a pure function of c_custkey (sha256 2-hex prefix vs a
    hex bound — `sampling.hash_sample`'s idiom), so the sample needs no
    seed/state, is identical on rerun and backfill, and samples every
    stratum at the same expected rate. The predicate is map-only; the only
    shuffle is the final per-segment partial agg."""
    cust = load_table(spark, sf_dir, "customer")
    in_sample = (F.substring(F.sha2(F.col("c_custkey").cast("string"), 256),
                             1, 2) < F.lit(_SAMPLE_BOUND))
    return (cust.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.sum(in_sample.cast("long")).alias("n_sampled"),
                 F.round(F.sum(F.when(in_sample, F.col("c_acctbal"))
                               .otherwise(F.lit(0.0))), 2)
                 .alias("sampled_acctbal"),
                 F.min(F.when(in_sample, F.col("c_custkey")))
                 .alias("min_sampled_key"),
                 F.max(F.when(in_sample, F.col("c_custkey")))
                 .alias("max_sampled_key")))


def stratified_sample_oracle() -> str:
    return f"""
SELECT c_mktsegment,
       count(*) AS n_total,
       CAST(sum(CASE WHEN substr(sha256(CAST(c_custkey AS VARCHAR)), 1, 2)
                     < '{_SAMPLE_BOUND}' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sampled,
       round(sum(CASE WHEN substr(sha256(CAST(c_custkey AS VARCHAR)), 1, 2)
                     < '{_SAMPLE_BOUND}' THEN c_acctbal ELSE 0.0 END), 2)
           AS sampled_acctbal,
       min(CASE WHEN substr(sha256(CAST(c_custkey AS VARCHAR)), 1, 2)
                     < '{_SAMPLE_BOUND}' THEN c_custkey END)
           AS min_sampled_key,
       max(CASE WHEN substr(sha256(CAST(c_custkey AS VARCHAR)), 1, 2)
                     < '{_SAMPLE_BOUND}' THEN c_custkey END)
           AS max_sampled_key
FROM customer
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# user_sessions_batch — gap-based sessionization as pure window algebra
# ---------------------------------------------------------------------------

_SESSION_GAP_S = 1800  # 30 min, matches streaming_user_sessions


def user_sessions_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of `streaming_user_sessions`: a >=30-min silence starts a
    new session. Two stacked windows over ONE hash partitioning on
    user_id (lag -> boundary flag -> running sum = session index), then
    the per-session roll-up reuses the same partitioning — Catalyst plans
    a single Exchange for the whole query."""
    ev = load_table(spark, sf_dir, "events")
    order = [F.asc("ts"), F.asc("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts", 1).over(w))
    new_s = (gap.isNull() | (gap >= F.lit(_SESSION_GAP_S * 1_000_000))).cast("long")
    run = Window.partitionBy("user_id").orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (ev.withColumn("_new", new_s)
            .withColumn("session_idx", F.sum("_new").over(run))
            .groupBy("user_id", "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.round(F.sum("value"), 2).alias("session_value")))


def user_sessions_batch_oracle() -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   >= {_SESSION_GAP_S * 1_000_000} THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), numbered AS (
  SELECT user_id, ts, value,
         CAST(sum(_new) OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       round(sum(value), 2) AS session_value
FROM numbered
GROUP BY user_id, session_idx
"""


# ---------------------------------------------------------------------------
# rolling_event_rate — per-event trailing-1h RANGE window
# ---------------------------------------------------------------------------

_ROLL_WINDOW_US = 3_600_000_000  # 1 hour in microseconds


def rolling_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: how many events (and how much value) this user produced
    in the trailing hour, inclusive. A RANGE frame on unix_micros(ts) —
    microsecond-exact, so the DuckDB INTERVAL-frame oracle sees the
    identical row set. One shuffle on user_id; the frame is evaluated by
    the codegen'd sliding-window operator, not a self-join (a time-range
    self-join would shuffle events x events; the window carries each row
    once)."""
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros(F.col("ts")))
         .rangeBetween(-_ROLL_WINDOW_US, 0))
    return (ev.select(
        "event_id", "user_id", "ts",
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
        F.round(F.sum("value").over(w), 2).alias("value_1h")))


def rolling_event_rate_oracle() -> str:
    return """
SELECT event_id, user_id, ts,
       count(*) OVER w AS n_events_1h,
       round(sum(value) OVER w, 2) AS value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# greedy_pack_assignments — next-fit sequence packing into char budgets
# ---------------------------------------------------------------------------

_PACK_CAPACITY = 1024  # char budget per packed sequence (bin)

_PACK_SCHEMA = StructType([
    StructField("source", StringType()),
    StructField("bin_id", LongType()),
    StructField("n_docs", LongType()),
    StructField("bin_chars", LongType()),
])


def greedy_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit packing of documents (doc_id order) into fixed char-budget
    bins, per source shard: the assignment that turns a token-budgeted
    corpus into training sequences. The fold is inherently sequential
    within a shard and parallel across shards — applyInPandas gives each
    source group one Arrow batch and runs the O(n) fold in C-speed numpy
    indexing. At 100 TB the shard key is (source, date, hash-bucket) so a
    group never exceeds an executor's batch budget; the packing itself
    only ever holds ONE running (bin, fill) pair, not the group.

    Oracle: a DuckDB recursive CTE replays the identical fold row-by-row.
    Oversized docs (> capacity) occupy a bin alone, like every next-fit
    formulation."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    cap = _PACK_CAPACITY

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        bins, fills = [], []
        bin_id, fill = 0, 0
        for c in pdf["n_chars"].astype("int64"):
            if fill > 0 and fill + c > cap:
                bin_id += 1
                fill = 0
            fill += int(c)
            bins.append(bin_id)
        out = pd.DataFrame({"source": pdf["source"].iloc[0],
                            "bin_id": bins,
                            "n_chars": pdf["n_chars"].astype("int64")})
        return (out.groupby("bin_id", as_index=False)
                .agg(n_docs=("n_chars", "size"), bin_chars=("n_chars", "sum"))
                .assign(source=pdf["source"].iloc[0])
                [["source", "bin_id", "n_docs", "bin_chars"]])

    return docs.groupBy("source").applyInPandas(pack, _PACK_SCHEMA)


def greedy_pack_assignments_oracle() -> str:
    return f"""
WITH RECURSIVE ordered AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id ASC) AS rn
  FROM documents
), folded AS (
  SELECT source, rn, n_chars, 0::BIGINT AS bin_id, n_chars AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.source, o.rn, o.n_chars,
         CASE WHEN f.fill + o.n_chars > {_PACK_CAPACITY}
              THEN f.bin_id + 1 ELSE f.bin_id END AS bin_id,
         CASE WHEN f.fill + o.n_chars > {_PACK_CAPACITY}
              THEN o.n_chars ELSE f.fill + o.n_chars END AS fill
  FROM folded f
  JOIN ordered o ON o.source = f.source AND o.rn = f.rn + 1
)
SELECT source, bin_id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS bin_chars
FROM folded
GROUP BY source, bin_id
"""


# ---------------------------------------------------------------------------
# order_value_outliers — per-group z-score outlier detection
# ---------------------------------------------------------------------------

_Z_THRESHOLD = 2.5


def order_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment z-score outliers over order totals — the
    standard per-group anomaly screen. Two-phase: one partial-agg pass
    computes each segment's (avg, stddev_samp), the ~5-row stats table
    joins back (AQE broadcasts it), and the z filter is a map-only
    projection. No window over the fact table, so nothing resorts orders
    within segments. The filter tests the ROUNDED z so both engines make
    the identical boundary call."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    fact = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice")
    stats = fact.groupBy("c_mktsegment").agg(
        F.avg("o_totalprice").alias("_mu"),
        F.stddev_samp("o_totalprice").alias("_sd"))
    z = F.round((F.col("o_totalprice") - F.col("_mu")) / F.col("_sd"), 4)
    return (fact.join(stats, "c_mktsegment")
            .select("c_mktsegment", "o_orderkey",
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    z.alias("zscore"))
            .filter(F.abs(F.col("zscore")) > _Z_THRESHOLD))


def order_value_outliers_oracle() -> str:
    return f"""
WITH fact AS (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
stats AS (
  SELECT c_mktsegment, avg(o_totalprice) AS mu,
         stddev_samp(o_totalprice) AS sd
  FROM fact GROUP BY 1
)
SELECT f.c_mktsegment, f.o_orderkey,
       round(f.o_totalprice, 2) AS o_totalprice,
       round((f.o_totalprice - s.mu) / s.sd, 4) AS zscore
FROM fact f JOIN stats s USING (c_mktsegment)
WHERE abs(round((f.o_totalprice - s.mu) / s.sd, 4)) > {_Z_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# adaptive_length_filter — per-language percentile gates
# ---------------------------------------------------------------------------

_LEN_LO_Q = 0.05
_LEN_HI_Q = 0.95


def adaptive_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length gates that ADAPT per language instead of one global cutoff
    (Arabic chars ≠ English chars ≠ Chinese chars): drop below each
    language's p05 or above its p95. Exact interpolated percentiles here
    (byte-tight oracle); `percentile_approx` is the documented lake-scale
    swap, as in `length_quantile_profile`. One corpus pass for the
    thresholds (~n_langs rows, joined back via AQE broadcast), one
    map-only classification pass, one partial agg."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    thr = docs.groupBy("lang").agg(
        F.round(F.expr(f"percentile(n_chars, {_LEN_LO_Q})"), 6).alias("lo"),
        F.round(F.expr(f"percentile(n_chars, {_LEN_HI_Q})"), 6).alias("hi"))
    tagged = docs.join(thr, "lang")
    return (tagged.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("n_chars") < F.col("lo")).cast("long"))
                 .alias("dropped_short"),
                 F.sum((F.col("n_chars") > F.col("hi")).cast("long"))
                 .alias("dropped_long"),
                 F.sum(((F.col("n_chars") >= F.col("lo"))
                        & (F.col("n_chars") <= F.col("hi"))).cast("long"))
                 .alias("kept"),
                 F.max("lo").alias("lo_chars"),
                 F.max("hi").alias("hi_chars")))


def adaptive_length_filter_oracle() -> str:
    return f"""
WITH thr AS (
  SELECT lang,
         round(quantile_cont(n_chars, {_LEN_LO_Q}), 6) AS lo,
         round(quantile_cont(n_chars, {_LEN_HI_Q}), 6) AS hi
  FROM documents GROUP BY lang
)
SELECT d.lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN d.n_chars < t.lo THEN 1 ELSE 0 END) AS BIGINT)
           AS dropped_short,
       CAST(sum(CASE WHEN d.n_chars > t.hi THEN 1 ELSE 0 END) AS BIGINT)
           AS dropped_long,
       CAST(sum(CASE WHEN d.n_chars >= t.lo AND d.n_chars <= t.hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       max(t.lo) AS lo_chars,
       max(t.hi) AS hi_chars
FROM documents d JOIN thr t USING (lang)
GROUP BY d.lang
"""


# ---------------------------------------------------------------------------
# source_embedding_drift — per-source centroid vs corpus centroid
# ---------------------------------------------------------------------------


def source_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic drift monitor: cosine between each source's embedding
    centroid and the corpus centroid — low cosine flags a source whose
    CONTENT (not just token mix, cf. `domain_kl_divergence`) left the
    distribution. One posexplode pass feeds both the per-(source, dim)
    and per-dim averages (shuffle rows = sources × dims and dims — narrow
    and bounded, never row-count-shaped); the cosine fold joins on dim
    and aggs per source."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding")
    exploded = (docs.join(emb, "doc_id")
                .select("source", F.posexplode("embedding")
                        .alias("dim", "val")))
    src = exploded.groupBy("source", "dim").agg(F.avg("val").alias("a"))
    corpus = exploded.groupBy("dim").agg(F.avg("val").alias("b"))
    joined = src.join(corpus, "dim")
    return (joined.groupBy("source")
            .agg(F.round(
                F.sum(F.col("a") * F.col("b"))
                / (F.sqrt(F.sum(F.col("a") * F.col("a")))
                   * F.sqrt(F.sum(F.col("b") * F.col("b")))), 6)
                .alias("centroid_cosine"),
                 F.count(F.lit(1)).alias("n_dims")))


def source_embedding_drift_oracle() -> str:
    return """
WITH exploded AS (
  SELECT d.source,
         generate_subscripts(e.embedding, 1) AS dim,
         CAST(unnest(e.embedding) AS DOUBLE) AS val
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
src AS (SELECT source, dim, avg(val) AS a FROM exploded GROUP BY 1, 2),
corpus AS (SELECT dim, avg(val) AS b FROM exploded GROUP BY 1)
SELECT s.source,
       round(sum(s.a * c.b) /
             (sqrt(sum(s.a * s.a)) * sqrt(sum(c.b * c.b))), 6)
           AS centroid_cosine,
       count(*) AS n_dims
FROM src s JOIN corpus c USING (dim)
GROUP BY s.source
"""


# ---------------------------------------------------------------------------
# order_price_histogram — fixed-width binned distribution
# ---------------------------------------------------------------------------

_HIST_WIDTH = 50_000.0
_HIST_BINS = 10  # final bin absorbs the tail


def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals — the dashboard distribution
    primitive. Bucket = least(floor(x / width), n-1) (tail clamped into
    the last bin): identical double arithmetic in both engines, one
    map-side-combined agg, shuffle rows = bins. Empty bins are absent by
    construction (sparse histogram)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / _HIST_WIDTH),
                     F.lit(_HIST_BINS - 1)).cast("long")
    return (orders.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.min("o_totalprice"), 2).alias("lo_price"),
                 F.round(F.max("o_totalprice"), 2).alias("hi_price"))
            .select("bucket",
                    F.round(F.col("bucket") * _HIST_WIDTH, 2)
                    .alias("bucket_floor"),
                    "n_orders", "lo_price", "hi_price"))


def order_price_histogram_oracle() -> str:
    return f"""
SELECT bucket,
       round(bucket * {_HIST_WIDTH}, 2) AS bucket_floor,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo_price,
       round(max(o_totalprice), 2) AS hi_price
FROM (
  SELECT o_totalprice,
         CAST(least(floor(o_totalprice / {_HIST_WIDTH}),
                    {_HIST_BINS - 1}) AS BIGINT) AS bucket
  FROM orders
)
GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# frequent_terms_bound — freqItems sketch verified against exact counts
# ---------------------------------------------------------------------------

_FREQ_SUPPORT = 0.02  # report terms above 2% of token occurrences


def frequent_terms_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries-style frequent-items sketch (`DataFrame.stat.freqItems`)
    verified against exact counts — same deterministic-report pattern as
    the HLL/GK bound checks: the sketch may emit impl-defined false
    positives, so the report enumerates the EXACT frequent set (count >
    support·N) and asserts each member was found by the sketch (the
    algorithm's no-false-negative guarantee). The sketch side is one
    fixed-state pass; the exact side is the verifier the test SFs make
    cheap. The sketch's item list is O(1/support) and becomes a plan
    literal — the codebook/planes collect policy."""
    from ..functions.text import tokenize

    toks = (load_table(spark, sf_dir, "documents")
            .select(F.explode(tokenize(F.col("text"))).alias("term")))
    sketch_items = set(
        toks.stat.freqItems(["term"], _FREQ_SUPPORT).collect()[0][0])
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("n")).select("n")
    return (counts.crossJoin(F.broadcast(total))
            .filter(F.col("cnt") > F.lit(_FREQ_SUPPORT) * F.col("n"))
            .select("term", "cnt",
                    F.col("term").isin(sketch_items).alias("found_in_sketch")))


def frequent_terms_bound_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT unnest({{toks}}) AS term FROM documents
),
counts AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
total AS (SELECT count(*) AS n FROM toks)
SELECT c.term, c.cnt, TRUE AS found_in_sketch
FROM counts c CROSS JOIN total t
WHERE c.cnt > {_FREQ_SUPPORT} * t.n
""".replace("{toks}",
            "list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_؀-ۿ]+'), x -> length(x) >= 2)")


# ---------------------------------------------------------------------------
# cumulative_users — running distinct-user growth curve
# ---------------------------------------------------------------------------


def cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth curve: new users per day and the running distinct-user
    total. Cumulative DISTINCT over a growing window is re-expressed as
    first-seen-day (one agg) + per-day counts + a running sum over the
    tiny day series — no day x user state ever accumulates, which is what
    makes the curve computable in one pass at any scale."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = (ev.groupBy("user_id")
                  .agg(F.min(F.to_date("ts")).alias("day")))
    daily = (first_seen.groupBy("day")
             .agg(F.count(F.lit(1)).alias("new_users")))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    return daily.select(
        "day", "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"))


def cumulative_users_oracle() -> str:
    return """
WITH first_seen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
),
daily AS (SELECT day, count(*) AS new_users FROM first_seen GROUP BY 1)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT)
           AS cumulative_users
FROM daily
"""


# ---------------------------------------------------------------------------
# retention_cohorts — first-seen-day cohorts x days-since activity
# ---------------------------------------------------------------------------

_RETENTION_MAX_OFFSET = 7  # track the first week per cohort


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-seen day, then for
    each day-offset 0..7, how many of the cohort were active. The cohort
    label joins onto events by user_id (events shuffle once on user_id —
    the same partitioning the first-seen agg produced, so Catalyst reuses
    the exchange), activity dedupes to (cohort, offset, user) before
    counting. Output rows = cohorts x offsets, never user-shaped."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"))
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = ev.join(first_seen, "user_id").select(
        "user_id", "cohort_day",
        F.datediff("day", "cohort_day").alias("day_offset"))
    active = (joined.filter(F.col("day_offset") <= _RETENTION_MAX_OFFSET)
              .select("cohort_day", "day_offset", "user_id").distinct())
    sizes = first_seen.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    return (active.groupBy("cohort_day", "day_offset")
            .agg(F.count(F.lit(1)).alias("active_users"))
            .join(sizes, "cohort_day")
            .select("cohort_day", "day_offset", "cohort_size", "active_users",
                    F.round(F.col("active_users") / F.col("cohort_size"), 6)
                    .alias("retention")))


def retention_cohorts_oracle() -> str:
    return f"""
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
first_seen AS (
  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1
),
active AS (
  SELECT DISTINCT f.cohort_day, date_diff('day', f.cohort_day, e.day)
             AS day_offset, e.user_id
  FROM ev e JOIN first_seen f USING (user_id)
  WHERE date_diff('day', f.cohort_day, e.day) <= {_RETENTION_MAX_OFFSET}
),
sizes AS (SELECT cohort_day, count(*) AS cohort_size
          FROM first_seen GROUP BY 1)
SELECT a.cohort_day, CAST(a.day_offset AS INTEGER) AS day_offset,
       s.cohort_size, count(*) AS active_users,
       round(count(*) / s.cohort_size::DOUBLE, 6) AS retention
FROM active a JOIN sizes s USING (cohort_day)
GROUP BY a.cohort_day, a.day_offset, s.cohort_size
"""


# ---------------------------------------------------------------------------
# event_funnel — ordered multi-stage conversion
# ---------------------------------------------------------------------------

_FUNNEL_STAGES = ("view", "click", "purchase")


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: a user converts at stage k only with an
    event of that type STRICTLY AFTER their stage-(k-1) conversion time
    (first-touch semantics). Each stage is a filtered min-ts aggregate on
    user_id — the same hash partitioning throughout, so Catalyst chains
    the joins without new exchanges on the user side; the final count is
    one single-row agg unpivoted with `stack`. No per-user event
    sequences are ever materialized."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts")
    s1 = (ev.filter(F.col("event_type") == _FUNNEL_STAGES[0])
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = (ev.filter(F.col("event_type") == _FUNNEL_STAGES[1])
          .join(s1, "user_id").filter(F.col("ts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    s3 = (ev.filter(F.col("event_type") == _FUNNEL_STAGES[2])
          .join(s2, "user_id").filter(F.col("ts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))
    wide = (s1.join(s2.select("user_id", "t2"), "user_id", "left")
            .join(s3.select("user_id", "t3"), "user_id", "left")
            .agg(F.count("t1").alias("n1"),
                 F.count("t2").alias("n2"),
                 F.count("t3").alias("n3")))
    return wide.selectExpr(
        f"stack(3, 1, '{_FUNNEL_STAGES[0]}', n1, CAST(1.0 AS DOUBLE),"
        f" 2, '{_FUNNEL_STAGES[1]}', n2,"
        " round(n2 / CAST(nullif(n1, 0) AS DOUBLE), 6),"
        f" 3, '{_FUNNEL_STAGES[2]}', n3,"
        " round(n3 / CAST(nullif(n2, 0) AS DOUBLE), 6))"
        " AS (stage_idx, stage, n_users, conversion)")


def event_funnel_oracle() -> str:
    s1, s2, s3 = _FUNNEL_STAGES
    return f"""
WITH st1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{s1}' GROUP BY 1
),
st2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN st1 USING (user_id)
  WHERE e.event_type = '{s2}' AND e.ts > st1.t1
  GROUP BY 1
),
st3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN st2 USING (user_id)
  WHERE e.event_type = '{s3}' AND e.ts > st2.t2
  GROUP BY 1
),
wide AS (
  SELECT count(a.t1) AS n1, count(b.t2) AS n2, count(c.t3) AS n3
  FROM st1 a LEFT JOIN st2 b USING (user_id) LEFT JOIN st3 c USING (user_id)
)
SELECT 1 AS stage_idx, '{s1}' AS stage, n1 AS n_users,
       round(1.0, 6) AS conversion FROM wide
UNION ALL
SELECT 2, '{s2}', n2, round(n2 / CAST(nullif(n1, 0) AS DOUBLE), 6) FROM wide
UNION ALL
SELECT 3, '{s3}', n3, round(n3 / CAST(nullif(n2, 0) AS DOUBLE), 6) FROM wide
"""


# ---------------------------------------------------------------------------
# length_psi_drift — population stability index between corpus halves
# ---------------------------------------------------------------------------

_PSI_BIN_W = 64.0
_PSI_BINS = 10


def length_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per language over the doc-length
    distribution: the standard drift monitor between a REFERENCE slice and
    a CURRENT slice (here the deterministic doc_id parity halves stand in
    for consecutive snapshots). Fixed-width tail-clamped bins (as
    `order_price_histogram`), Laplace-smoothed shares so empty bins stay
    finite, PSI = Σ (p−q)·ln(p/q). One scan → per-(lang, half, bin)
    map-side counts → two tiny joins; nothing row-shaped survives the
    first aggregate. PSI < 0.1 is the conventional 'stable' reading."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id",
                                                         "n_chars")
    half = (F.col("doc_id") % 2 == 0)
    bucket = F.least(F.floor(F.col("n_chars") / _PSI_BIN_W),
                     F.lit(_PSI_BINS - 1)).cast("long")
    counts = (docs.groupBy("lang", half.alias("is_ref"),
                           bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("c")))
    totals = counts.groupBy("lang", "is_ref").agg(F.sum("c").alias("n"))
    # Laplace smoothing: share = (c + 1) / (n + bins); absent bins get
    # 1 / (n + bins) via the full outer bin frame below.
    ref = (counts.filter(F.col("is_ref")).drop("is_ref")
           .withColumnRenamed("c", "cr"))
    cur = (counts.filter(~F.col("is_ref")).drop("is_ref")
           .withColumnRenamed("c", "cc"))
    both = (ref.join(cur, ["lang", "bucket"], "full_outer")
            .na.fill(0, ["cr", "cc"]))
    nr = (totals.filter(F.col("is_ref"))
          .select("lang", F.col("n").alias("nr")))
    nc = (totals.filter(~F.col("is_ref"))
          .select("lang", F.col("n").alias("nc")))
    joined = both.join(nr, "lang").join(nc, "lang")
    p = (F.col("cr") + 1) / (F.col("nr") + _PSI_BINS)
    q = (F.col("cc") + 1) / (F.col("nc") + _PSI_BINS)
    return (joined.groupBy("lang")
            .agg(F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
                 F.count(F.lit(1)).alias("n_bins"),
                 F.max("nr").cast("long").alias("n_ref"),
                 F.max("nc").cast("long").alias("n_cur")))


def length_psi_drift_oracle() -> str:
    return f"""
WITH base AS (
  SELECT lang, doc_id % 2 = 0 AS is_ref,
         CAST(least(floor(n_chars / {_PSI_BIN_W}), {_PSI_BINS - 1}) AS BIGINT)
             AS bucket
  FROM documents
),
counts AS (
  SELECT lang, is_ref, bucket, count(*) AS c FROM base GROUP BY 1, 2, 3
),
totals AS (
  SELECT lang, is_ref, CAST(sum(c) AS BIGINT) AS n
  FROM counts GROUP BY 1, 2
),
ref AS (SELECT lang, bucket, c AS cr FROM counts WHERE is_ref),
cur AS (SELECT lang, bucket, c AS cc FROM counts WHERE NOT is_ref),
merged AS (
  SELECT coalesce(r.lang, u.lang) AS lang,
         coalesce(r.bucket, u.bucket) AS bucket,
         coalesce(r.cr, 0) AS cr, coalesce(u.cc, 0) AS cc
  FROM ref r FULL OUTER JOIN cur u
    ON r.lang = u.lang AND r.bucket = u.bucket
),
j AS (
  SELECT b.lang, b.cr, b.cc, tr.n AS nr, tc.n AS nc
  FROM merged b
  JOIN totals tr ON tr.lang = b.lang AND tr.is_ref
  JOIN totals tc ON tc.lang = b.lang AND NOT tc.is_ref
)
SELECT lang,
       round(sum(((cr + 1.0) / (nr + {_PSI_BINS})
                  - (cc + 1.0) / (nc + {_PSI_BINS}))
                 * ln(((cr + 1.0) / (nr + {_PSI_BINS}))
                      / ((cc + 1.0) / (nc + {_PSI_BINS})))), 6) AS psi,
       count(*) AS n_bins,
       CAST(max(nr) AS BIGINT) AS n_ref,
       CAST(max(nc) AS BIGINT) AS n_cur
FROM j
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# decayed_user_value — exponential time-decay aggregation
# ---------------------------------------------------------------------------

_DECAY_TAU_S = 86_400.0  # e-folding time: one day


def decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially decayed activity value at the corpus's last
    timestamp: Σ value·exp(−Δt/τ) — the standard recency-weighted feature
    (decay makes a week-old purchase worth ~e⁻⁷ of a fresh one). The
    anchor T = max(ts) comes from a one-row agg broadcast into the scan;
    the decay is a map-side expression feeding ONE partial agg on
    user_id. Microsecond Δt keeps both engines' exponents bit-identical
    before the exp; the sum rounds to 4."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("t_max")).select("t_max")
    dt_s = ((F.unix_micros(F.col("t_max")) - F.unix_micros(F.col("ts")))
            / 1_000_000.0)
    return (ev.crossJoin(F.broadcast(anchor))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value")
                               * F.exp(-dt_s / _DECAY_TAU_S)), 4)
                 .alias("decayed_value"),
                 F.round(F.sum("value"), 4).alias("raw_value")))


def decayed_user_value_oracle() -> str:
    return f"""
WITH anchor AS (SELECT max(ts) AS t_max FROM events)
SELECT user_id,
       count(*) AS n_events,
       round(sum(value * exp(-((epoch_us(t_max) - epoch_us(ts))
                               / 1000000.0) / {_DECAY_TAU_S})), 4)
           AS decayed_value,
       round(sum(value), 4) AS raw_value
FROM events CROSS JOIN anchor
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# epoch_plan — multi-epoch schedule for oversubscribed domains
# ---------------------------------------------------------------------------


def epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the other half of the mix-plan loop: a language whose target
    EXCEEDS its available tokens needs repetition — full epochs =
    floor(target/available), plus a fractional final epoch sampled at the
    remainder rate (the standard up-sampling schedule; >4 epochs is the
    conventional diminishing-returns warning, cf. the data-constrained
    scaling literature). Pure arithmetic on the ~n_langs mix rows."""
    from .pipeline import MIX_BUDGET_TOKENS, MIX_TARGET

    docs = load_table(spark, sf_dir, "documents")
    from ..functions.text import tokenize
    avail = (docs.select("lang", F.size(tokenize(F.col("text"))).alias("_t"))
             .groupBy("lang")
             .agg(F.sum("_t").cast("long").alias("available_tokens")))
    weight = F.lit(0.0)
    for lang, wt in MIX_TARGET.items():
        weight = F.when(F.col("lang") == lang, F.lit(wt)).otherwise(weight)
    target = F.round(weight * MIX_BUDGET_TOKENS, 6)
    av = F.greatest(F.col("available_tokens").cast("double"), F.lit(1.0))
    full = F.floor(target / av).cast("long")
    frac = F.round(target / av - full, 6)
    return avail.select(
        "lang", "available_tokens", target.alias("target_tokens"),
        full.alias("full_epochs"), frac.alias("final_epoch_rate"),
        (full >= 4).alias("repetition_warning"))


def epoch_plan_oracle() -> str:
    from .pipeline import MIX_BUDGET_TOKENS, MIX_TARGET
    weight = ("CASE " + " ".join(
        f"WHEN lang = '{lang}' THEN {w}" for lang, w in MIX_TARGET.items())
        + " ELSE 0.0 END")
    return f"""
WITH avail AS (
  SELECT lang,
         CAST(sum(len(list_filter(string_split_regex(lower(text),
              '[^a-z0-9_؀-ۿ]+'), x -> length(x) >= 2))) AS BIGINT)
             AS available_tokens
  FROM documents GROUP BY lang
),
m AS (
  SELECT lang, available_tokens,
         round(({weight}) * {MIX_BUDGET_TOKENS}, 6) AS target_tokens,
         greatest(available_tokens::DOUBLE, 1.0) AS av
  FROM avail
)
SELECT lang, available_tokens, target_tokens,
       CAST(floor(target_tokens / av) AS BIGINT) AS full_epochs,
       round(target_tokens / av - floor(target_tokens / av), 6)
           AS final_epoch_rate,
       floor(target_tokens / av) >= 4 AS repetition_warning
FROM m
"""
