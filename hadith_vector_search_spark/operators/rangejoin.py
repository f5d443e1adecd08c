"""Bucketed range (interval) join — the second time-join operator Spark's
DataFrame API lacks natively (next to `operators.asof.asof_join`).

`left.k = right.k AND |left.t - right.t| <= tolerance` written directly
becomes a join on the equality key only, with the band predicate applied
POST-join — per key, that's the full |L_k| x |R_k| cross product before
filtering. The bucketed encoding quantizes time into `tolerance`-wide
buckets and replicates each left row into its bucket and the two
neighbors; matching pairs must then agree on (key, bucket), so the range
predicate becomes part of the JOIN KEY and the pre-filter pair count is
bounded by rows-per-(key, 3-bucket-window) instead of rows-per-key.
(Same idea as the range-join binning hint in Spark's SQL engine and the
"banding" trick in similarity joins; replication factor is exactly 3.)

Every candidate still passes the exact band predicate, so the result is
identical to the naive encoding — the DuckDB oracle runs the naive
inequality join, checking the rewrite against the direct semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_RESERVED = ("_lt", "_rt", "_bkt", "_delta", "delta_us")


def range_join_buckets(left: DataFrame, right: DataFrame, on: str,
                       left_ts: Column, right_ts: Column,
                       tolerance_us: int) -> DataFrame:
    """Join rows of `left` and `right` sharing `on` whose integer-µs
    timestamps differ by at most `tolerance_us`. `left_ts` / `right_ts`
    are integer-microsecond Columns (use `F.unix_micros` for timestamps —
    integer math, no double epoch rounding). Returns left columns +
    right columns (caller pre-aliases to avoid collisions) + `delta_us`
    (right - left, in [-tolerance_us, +tolerance_us])."""
    clash = [c for c in _RESERVED
             if c in left.columns or c in right.columns]
    if clash:
        raise ValueError(f"input columns collide with reserved names: {clash}")
    lb = F.floor(left_ts / F.lit(tolerance_us)).cast("long")
    rb = F.floor(right_ts / F.lit(tolerance_us)).cast("long")
    l_rep = (left
             .withColumn("_lt", left_ts)
             .withColumn("_bkt", F.explode(F.array(lb - 1, lb, lb + 1))))
    r_tag = right.withColumn("_rt", right_ts).withColumn("_bkt", rb)
    joined = (l_rep.join(r_tag, [on, "_bkt"])
              .withColumn("_delta", F.col("_rt") - F.col("_lt"))
              .filter(F.abs(F.col("_delta")) <= tolerance_us))
    return (joined.drop("_bkt", "_lt", "_rt")
            .withColumnRenamed("_delta", "delta_us"))
