"""Deduplication operators for large-scale training-data pipelines.

Generalizes the reference's result-dedup D1
(/root/reference/quran_mcp/search.py:262-278) into the full dedup family a
100 TB corpus needs: exact (hash groupBy), window-dedup (keep best per key),
MinHash+LSH near-dup, SimHash, and n-gram Jaccard verification.

Design notes:
- All hashing is sha256 over seeded strings, and a "minimum hash" is the
  lexicographic min of hex digests — deterministic, engine-portable (the
  DuckDB oracles produce identical strings), and a valid min-wise hash
  family. Production would swap in xxhash64 for speed; semantics identical.
- MinHash+LSH is the scale path: candidates come from band-bucket
  self-joins (shuffle on band key, each bucket small), and only candidates
  pay the exact-Jaccard verification join. Brute-force all-pairs exists
  only as the within-group verifier.
- SimHash bits use independent per-bit seeded hashes; near-dup docs agree
  on most bits (hamming distance), giving a fingerprint sortable into
  buckets — the classic Charikar scheme expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokenize

SHINGLE_W = 3


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             w: int = SHINGLE_W) -> DataFrame:
    """Distinct w-word shingles per doc: (doc_id, shingle). Docs shorter
    than w tokens produce no shingles."""
    toks = tokenize(F.col(text_col))
    idx = F.sequence(F.lit(1), F.size(toks) - (w - 1))
    sh = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + j) for j in range(w)]))
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(F.when(F.size(toks) >= w, sh)
                              .otherwise(F.array())).alias("shingle"))
        .distinct()
    )


def _seeded_hash(seed: int, col: Column) -> Column:
    return F.sha2(F.concat_ws("|", F.lit(str(seed)), col), 256)


def minhash_signatures(sh: DataFrame, n_hashes: int = 8) -> DataFrame:
    """One row per doc: h0..h{n-1} minhash columns (lexicographic min of
    seeded sha256 hex). Single partial-agg shuffle regardless of n_hashes."""
    aggs = [F.min(_seeded_hash(j, F.col("shingle"))).alias(f"h{j}")
            for j in range(n_hashes)]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_band_pairs(sigs: DataFrame, n_hashes: int = 8, band_size: int = 2) -> DataFrame:
    """Candidate pairs sharing at least one LSH band. Bands are contiguous
    signature slices; the self-join shuffles on (band_id, band_key) so each
    bucket joins locally. Output: distinct (id_a, id_b), id_a < id_b."""
    n_bands = n_hashes // band_size
    bands = F.array(*[
        F.struct(F.lit(b).alias("band_id"),
                 F.concat_ws("#", *[F.col(f"h{b * band_size + j}")
                                    for j in range(band_size)]).alias("band_key"))
        for b in range(n_bands)
    ])
    exploded = (
        sigs.select("doc_id", F.explode(bands).alias("band"))
        .select("doc_id", "band.band_id", "band.band_key")
    )
    a = exploded.select(F.col("doc_id").alias("id_a"), "band_id", "band_key")
    b = exploded.select(F.col("doc_id").alias("id_b"), "band_id", "band_key")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs only.
    |A∩B| via a shingle-equijoin restricted to candidates; |A∪B| from
    per-doc counts. Output: (id_a, id_b, jaccard) above threshold."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("sb_id"), F.col("shingle").alias("sb_shingle"))
    common = (
        pairs.join(sa, "id_a")
        .join(sb, (F.col("id_b") == F.col("sb_id")) & (F.col("shingle") == F.col("sb_shingle")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(na, "id_a").join(nb, "id_b")
        .select("id_a", "id_b",
                F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6)
                .alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def near_dup_minhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                     n_hashes: int = 8, band_size: int = 2,
                     threshold: float = 0.8) -> DataFrame:
    """Full MinHash→LSH→verify pipeline: shingle → signature → band
    candidates → exact-Jaccard filter."""
    sh = shingles(docs, text_col, id_col)
    sigs = minhash_signatures(sh, n_hashes)
    cands = lsh_band_pairs(sigs, n_hashes, band_size)
    return jaccard_verify(cands, sh, threshold)


def exact_dedup_groups(docs: DataFrame, key: Column, id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by an arbitrary key expression (checksum, normalized
    text, preview). Returns collision groups: (dup_key, rep_id, dup_count)
    with dup_count >= 2; rep = min id (deterministic)."""
    return (
        docs.select(key.alias("dup_key"), F.col(id_col))
        .groupBy("dup_key")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") >= 2)
    )


def window_dedup(docs: DataFrame, key: Column, order_cols: list[Column],
                 id_col: str = "doc_id") -> DataFrame:
    """D1: keep the best-ranked row per key, reporting how many were
    dropped. Output: kept id + duplicates_filtered (>0 groups only)."""
    w = Window.partitionBy("dup_key").orderBy(*order_cols)
    return (
        docs.select(key.alias("dup_key"), "*")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("grp_n", F.count(F.lit(1)).over(Window.partitionBy("dup_key")))
        .filter((F.col("rn") == 1) & (F.col("grp_n") >= 2))
        .select(F.col(id_col), (F.col("grp_n") - 1).alias("duplicates_filtered"))
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            n_bits: int = 16) -> DataFrame:
    """Charikar SimHash with per-bit seeded hashes: bit_i = sign of
    sum over tokens of ±1 (+1 when sha256(i|token) first hex digit < '8').
    Output: (doc_id, simhash) as a bit string; near-dup docs differ in few
    bits. One explode + one agg of n_bits sums."""
    toks = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(tokenize(F.col(text_col))).alias("tok"))
    )
    contribs = [
        F.sum(F.when(F.substring(_seeded_hash(i, F.col("tok")), 1, 1) < "8", 1)
              .otherwise(-1)).alias(f"b{i}")
        for i in range(n_bits)
    ]
    agg = toks.groupBy("doc_id").agg(*contribs)
    bits = F.concat(*[
        F.when(F.col(f"b{i}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ])
    return agg.select("doc_id", bits.alias("simhash"))


def hamming(a: Column, b: Column, n_bits: int) -> Column:
    """Hamming distance between equal-length bit strings — JVM-side."""
    return F.aggregate(
        F.zip_with(F.split(a, ""), F.split(b, ""),
                   lambda x, y: F.when(x != y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
