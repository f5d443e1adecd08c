"""Proximity scoring (SURVEY F12): minimum token-index distance between two
term groups, fully relational.

The reference walks token lists in Python per candidate
(/root/reference/mcp_server/apps/scoring.py:72-93). At corpus scale that
shape is a posexplode + window: tag every kept token with its position,
keep only the two groups' hits, and take the minimum gap between ADJACENT
hits of different groups under a per-doc position ordering — which equals
the global min cross-group distance, because positions are sorted (any
closer cross pair would also be adjacent in the merged order).

One Generate (tokenize evaluated once per row) + one window shuffle on
doc_id; no per-row Python, no quadratic pair expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokenize


def token_positions(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, term) — 0-based kept-token positions."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"))


def min_pair_distance(docs: DataFrame, group_a: tuple[str, ...],
                      group_b: tuple[str, ...], text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-doc minimum distance between any token of group_a and any of
    group_b. Docs lacking hits in either group produce no row (no cross
    pair exists). Output: (doc_id, min_dist int)."""
    hits = (token_positions(docs, text_col, id_col)
            .withColumn("grp", F.when(F.col("term").isin(*group_a), "a")
                        .when(F.col("term").isin(*group_b), "b"))
            .filter(F.col("grp").isNotNull()))
    w = Window.partitionBy("doc_id").orderBy("pos")
    lagged = hits.select(
        "doc_id", "pos", "grp",
        F.lag("pos").over(w).alias("prev_pos"),
        F.lag("grp").over(w).alias("prev_grp"))
    return (lagged
            .filter(F.col("prev_grp").isNotNull() & (F.col("grp") != F.col("prev_grp")))
            .groupBy("doc_id")
            .agg(F.min(F.col("pos") - F.col("prev_pos")).cast("int").alias("min_dist")))


def proximity_hits(docs: DataFrame, group_a: tuple[str, ...],
                   group_b: tuple[str, ...], window: int,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """F12 as a predicate: docs where the groups co-occur within `window`
    tokens (reference default window=8, scoring.py:77)."""
    return (min_pair_distance(docs, group_a, group_b, text_col, id_col)
            .filter(F.col("min_dist") <= window))
