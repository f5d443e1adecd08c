"""Vector similarity operators (SURVEY §2.8 V3/V4, §2.5 T2) — DataFrame-first.

The reference does brute-force `np.dot(matrix, qvec)` + argsort
(/root/reference/quran_mcp/search.py:145-176) and HNSW via Chroma
(/root/reference/mcp_server/apps/embeddings.py:277-321). In Spark:

- Exact top-k = broadcast the query vector(s), fold the dot product JVM-side,
  TakeOrderedAndProject. For a batch of queries it is a broadcast
  nested-loop join — embarrassingly parallel over embedding partitions, no
  shuffle of the big side.
- The approximate scale path is sign-LSH: bucket every vector by the sign
  pattern of its dot products against a small set of hyperplanes, then only
  score within the query's bucket. Hyperplanes here are drawn from the data
  itself (first `n_planes` vectors) so the whole pipeline stays deterministic
  and oracle-checkable — swapping in random Gaussian planes is a one-line
  change at deployment.

At 100 TB: embeddings live in parquet partitioned by bucket; a query prunes
to one bucket partition (predicate pushdown on the bucket column), turning
brute force over N into brute force over N/2^planes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vector import dot


def cosine_scores(emb: DataFrame, query_vec, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Score every vector against one literal query vector. Inputs are
    assumed L2-normalized (dot == cosine), matching the reference's quran
    leg (normalized encode at /root/reference/quran_mcp/embeddings.py:28-37)."""
    from ..functions.vector import vector_lit

    q = vector_lit(query_vec) if isinstance(query_vec, (list, tuple)) else query_vec
    return emb.select(F.col(id_col), dot(F.col(vec_col), q).alias("sim"))


def topk_by_query_id(emb: DataFrame, query_id: int, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k where the query is a row of the same table — a
    broadcast self-probe: the 1-row query side is broadcast, the big side
    streams (no shuffle)."""
    q = emb.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("qvec"))
    return (
        emb.crossJoin(F.broadcast(q))
        .select(F.col(id_col),
                F.round(dot(F.col(vec_col), F.col("qvec")), 6).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def knn_join(emb: DataFrame, queries: DataFrame, k: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "query_id", qvec_col: str = "qvec") -> DataFrame:
    """Batch exact k-NN: every query row against every embedding row
    (broadcast the query side), ranked per query. SURVEY J6's implicit
    query↔doc similarity join, made an explicit relational operator.
    Excludes self-matches when ids collide."""
    w = Window.partitionBy(qid_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(qid_col))
        .select(F.col(qid_col), F.col(id_col),
                F.round(dot(F.col(vec_col), F.col(qvec_col)), 6).alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def label_centroids(emb: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-label mean embedding via posexplode → (label, dim) partial-agg
    shuffle. The columnar analogue of the reference's matrix mean; output is
    long-form (label, dim, value) which re-assembles with collect_list at
    the caller if a dense vector is needed."""
    return (
        emb.select(F.col(label_col), F.posexplode(F.col(vec_col)).alias("dim", "v"))
        .groupBy(label_col, "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid"))
    )


def sign_lsh_buckets(emb: DataFrame, planes: DataFrame, n_planes: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign every vector a bucket = concatenated sign bits of dot products
    with `n_planes` hyperplane vectors. planes: (plane_id int, pvec array).
    One broadcast join + pivot-free bit aggregation; output (id, bucket)."""
    signed = (
        emb.crossJoin(F.broadcast(planes))
        .select(F.col(id_col),
                F.col("plane_id"),
                F.when(dot(F.col(vec_col), F.col("pvec")) >= 0, F.lit("1"))
                 .otherwise(F.lit("0")).alias("bit"))
    )
    return (
        signed.groupBy(id_col)
        .agg(F.concat_ws("", F.array_sort(
            F.collect_list(F.struct("plane_id", "bit"))).bit).alias("bucket"))
    )


def data_planes(emb: DataFrame, n_planes: int,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic hyperplanes: the first n_planes vectors of the table."""
    return (
        emb.filter(F.col(id_col) < n_planes)
        .select(F.col(id_col).cast("int").alias("plane_id"),
                F.col(vec_col).alias("pvec"))
    )


def ann_topk_lsh(emb: DataFrame, query_id: int, n_planes: int = 6, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: restrict exact scoring to the query's LSH bucket.
    Recall < 1 by design; the scale win is pruning the scan to N/2^planes
    (with bucket-partitioned storage, Catalyst prunes at the file level)."""
    planes = data_planes(emb, n_planes, id_col, vec_col)
    buckets = sign_lsh_buckets(emb, planes, n_planes, id_col, vec_col)
    with_bucket = emb.join(buckets, id_col)
    qrow = with_bucket.filter(F.col(id_col) == query_id).select(
        F.col("bucket").alias("qbucket"), F.col(vec_col).alias("qvec"))
    return (
        with_bucket.join(F.broadcast(qrow), F.col("bucket") == F.col("qbucket"))
        .select(F.col(id_col),
                F.round(dot(F.col(vec_col), F.col("qvec")), 6).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def similar_pairs(emb: DataFrame, threshold: float,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All-pairs similarity above a threshold (embedding-cosine near-dup
    detection). Brute-force O(N^2) baseline kept honest for small N; the
    scale path buckets by LSH first (see ann_topk_lsh) so only same-bucket
    pairs are scored."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(dot(F.col("vec_a"), F.col("vec_b")), 6).alias("sim"))
        .filter(F.col("sim") > threshold)
    )
