"""Corpus sampling, splitting, and contamination operators — the
training-data pipeline surface that sits between a raw 100 TB crawl and a
training run (alongside the dedup family in `operators.dedup` and the
quality/lang-ID operators in `operators.textstats`).

Design:
- **Deterministic content-addressed splits.** Train/val/test assignment is
  a pure function of the row key (a sha256 prefix compared against hex
  thresholds), NOT a random sample: re-running the pipeline, backfilling a
  partition, or adding rows never moves an existing row between splits,
  and no seed state needs to be carried. This is map-only — no shuffle,
  no sort, embarrassingly parallel at any scale — and the same expression
  evaluates identically in Spark and the DuckDB oracle.
- **Benchmark contamination** is an n-gram containment join: the (tiny)
  benchmark suite is shingled DRIVER-side with the same rules as the
  corpus shingler, broadcast, and semi-joined into the corpus shingle
  stream. The corpus side never shuffles on the full shingle set — only
  rows that MATCH a benchmark shingle reach the (doc, benchmark)
  aggregation, so cost scales with the contamination rate, not corpus
  size. This is the standard decontamination pass (e.g. GPT-3 appendix C
  / PaLM-style 13-gram overlap, here parameterized to the engine's w-gram
  shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import py_tokenize
from .dedup import SHINGLE_W, shingles
from ..localrel import local_df

# Split-fraction thresholds on the first two hex chars of sha256(id):
# 0x00-0xcc -> train (205/256 ~ 80.1%), 0xcd-0xe6 -> val (26/256 ~ 10.2%),
# 0xe7-0xff -> test (38/256 ~ 9.8%). Lexicographic comparison on lowercase
# hex is identical in Spark, DuckDB, and Python.
SPLIT_BOUNDS: tuple[tuple[str, str], ...] = (("train", "cd"), ("val", "e7"))
SPLIT_DEFAULT = "test"


def split_label(id_col: str = "doc_id",
                bounds: tuple[tuple[str, str], ...] = SPLIT_BOUNDS,
                default: str = SPLIT_DEFAULT) -> F.Column:
    """Deterministic split assignment for the row keyed by `id_col`:
    compare the 2-hex-char prefix of sha256(CAST(id AS STRING)) against
    ascending hex thresholds. Pure column expression — composes into any
    projection, costs one hash per row, shuffles nothing."""
    prefix = F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 2)
    expr = F.lit(default)
    for name, bound in reversed(bounds):
        expr = F.when(prefix < F.lit(bound), F.lit(name)).otherwise(expr)
    return expr


def with_split(docs: DataFrame, id_col: str = "doc_id",
               out_col: str = "split") -> DataFrame:
    """Attach the deterministic split label to every row (map-only)."""
    return docs.select("*", split_label(id_col).alias(out_col))


def hash_sample(docs: DataFrame, fraction_bound: str,
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic subsample: keep rows whose sha256 2-hex prefix is
    lexicographically below `fraction_bound` (e.g. '1a' keeps 26/256 ~ 10%).
    Content-addressed like `split_label` — stable across reruns, and the
    predicate pushes into the scan's filter stage."""
    prefix = F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 2)
    return docs.filter(prefix < F.lit(fraction_bound))


def py_shingles(text: str, w: int = SHINGLE_W) -> list[str]:
    """Driver-side twin of `dedup.shingle_array` for literal benchmark
    texts: distinct space-joined w-grams of the engine's tokens, sorted.
    Mirrors the Spark/DuckDB shinglers exactly (same tokenizer, DISTINCT
    semantics), so a benchmark suite shingled here joins correctly against
    corpus shingles produced by either engine."""
    toks = py_tokenize(text)
    return sorted({" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)})


def contamination(docs: DataFrame, bench: list[tuple[int, str]],
                  min_containment: float = 0.0,
                  text_col: str = "text", id_col: str = "doc_id",
                  w: int = SHINGLE_W) -> DataFrame:
    """Benchmark-contamination check: for every (document, benchmark item)
    pair sharing at least one w-gram shingle, report the overlap count and
    the containment ratio overlap/|benchmark shingles|, keeping pairs at or
    above `min_containment`.

    Plan: the benchmark suite is shingled driver-side (`py_shingles` — it
    is a literal list, not data) and broadcast; corpus shingles stream
    through the broadcast hash join map-side, so the only shuffle carries
    MATCHED (doc_id, bench_id) rows into the overlap aggregation — cost
    scales with the contamination rate, not the corpus. Benchmark shingle
    sets are attached afterwards by a second broadcast join.
    Output: (bench_id, doc_id, overlap, containment)."""
    spark = docs.sparkSession
    bsh_rows = [(bid, s) for bid, btext in bench for s in py_shingles(btext, w)]
    if not bsh_rows:
        raise ValueError("benchmark suite produced no shingles")
    bsh = local_df(spark, bsh_rows, "bench_id int, shingle string")
    bsizes = local_df(
        spark, [(bid, len(py_shingles(btext, w))) for bid, btext in bench],
        "bench_id int, bench_size int")
    corpus_sh = shingles(docs, text_col, id_col, w)
    overlap = (
        corpus_sh.join(F.broadcast(bsh), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    return (
        overlap.join(F.broadcast(bsizes), "bench_id")
        .select("bench_id", "doc_id", "overlap",
                F.round(F.col("overlap") / F.col("bench_size"), 6)
                .alias("containment"))
        .filter(F.col("containment") >= min_containment)
    )


# Deterministic training-order shuffle + sharding -------------------------

SHARD_SEED = "epoch0"


def shuffle_key(id_col: str = "doc_id", seed: str = SHARD_SEED) -> F.Column:
    """Content-addressed shuffle key: sha256(seed || CAST(id AS STRING)).
    The training-order randomizer every LLM data pipeline needs, with the
    same properties as `split_label`: rerun- and backfill-stable (a row's
    position never moves unless the seed does), no RNG state, map-only,
    and a new epoch is just a new seed string. Identical hex in Spark,
    DuckDB, and Python."""
    return F.sha2(F.concat(F.lit(seed), F.col(id_col).cast("string")), 256)


def shard_bounds(n_shards: int) -> list[str]:
    """Equal hex-range boundaries over the first 2 hex chars (256
    buckets) — `n_shards` must divide 256 so every shard covers exactly
    256/n buckets. Returned bounds are the EXCLUSIVE upper edges of
    shards 0..n-2 (shard n-1 takes the rest); lexicographic comparison
    on lowercase hex is identical in Spark, DuckDB, and Python."""
    if 256 % n_shards:
        raise ValueError(f"n_shards must divide 256, got {n_shards}")
    step = 256 // n_shards
    return [format(k * step, "02x") for k in range(1, n_shards)]


def with_shard(docs: DataFrame, n_shards: int, id_col: str = "doc_id",
               seed: str = SHARD_SEED) -> DataFrame:
    """Attach (shuffle_key, shard) to every row: shard = the key prefix's
    hex range. Map-only; writing the shuffled corpus is then ONE exchange
    (repartition by shard, sortWithinPartitions by key) regardless of
    corpus size, and at lake scale shards number in the thousands so that
    exchange is balanced by construction."""
    key = shuffle_key(id_col, seed)
    prefix = F.substring(key, 1, 2)
    expr = F.lit(n_shards - 1)
    for i, b in reversed(list(enumerate(shard_bounds(n_shards)))):
        expr = F.when(prefix < F.lit(b), F.lit(i)).otherwise(expr)
    return docs.select("*", key.alias("shuffle_key"),
                       expr.cast("int").alias("shard"))
