"""Skew-mitigation operators: salted aggregation and salted broadcast-free
joins (SURVEY §4.1 'skew/shuffle management', relevant only at the 100 TB
design point — which is the design point).

AQE's skew-join splitting handles most cases at runtime; these operators are
the *declarative* fallback for the two patterns AQE cannot fix:

- a single hot GROUP BY key whose partial aggregate still funnels into one
  reducer: `salted_aggregate` shards the key across `n_salts` reducers and
  recombines — result is IDENTICAL to the plain aggregate (oracle-checked),
  only the shuffle layout changes.
- a shuffle join whose build side is too big to broadcast but whose probe
  side has hot keys: `salted_join` appends a salt to the probe key and
  explodes the build side once per salt, so a hot key's rows spread over
  `n_salts` tasks instead of one straggler.

Both take explicit aggregate lists so the recombine step is derived from
the same spec — sums re-sum, counts re-sum, min/max re-min/max.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_expr, final_expr) factories keyed by agg kind. Partial runs per
# (key, salt); final recombines per key. avg is decomposed sum/count.
_RECOMBINE = {
    "sum": F.sum,
    "count": F.sum,     # counts add up across salt shards
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(df: DataFrame, keys: list[str],
                     aggs: list[tuple[str, str, str]],
                     n_salts: int = 8, salt_on: str | None = None) -> DataFrame:
    """Two-phase skew-proof aggregation. `aggs` is a list of
    (kind, in_col, out_col) with kind in {sum, count, min, max}.
    Phase 1 groups by (keys..., salt) — the hot key's rows spread over
    n_salts reducers; phase 2 groups by keys and recombines. The result
    equals the single-phase aggregate exactly (integer/extrema ops and
    float sums in both plans; the oracle check rounds float sums the same
    way on both sides)."""
    base = (F.monotonically_increasing_id() if salt_on is None
            else F.xxhash64(F.col(salt_on)))
    salt = F.pmod(F.xxhash64(base), F.lit(n_salts))
    partial_exprs = []
    for kind, in_col, out_col in aggs:
        fn = F.count if kind == "count" else getattr(F, kind)
        arg = F.lit(1) if kind == "count" else F.col(in_col)
        partial_exprs.append(fn(arg).alias(f"_p_{out_col}"))
    partial = (df.withColumn("_salt", salt)
               .groupBy(*keys, "_salt").agg(*partial_exprs))
    final_exprs = [
        _RECOMBINE[kind](F.col(f"_p_{out_col}")).alias(out_col)
        for kind, _in, out_col in aggs
    ]
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                n_salts: int = 8) -> DataFrame:
    """Inner equi-join where `probe` has skewed keys and `build` is too big
    to broadcast whole: probe rows get a random-ish salt (derived from a
    row id, not the key — the point is to SPLIT identical keys), build rows
    are replicated once per salt value, and the join keys on (key, salt).
    Row multiset of the output equals the plain join; the hot key's work
    fans out over n_salts tasks. Cost: build side shuffles n_salts times —
    the classic trade; use AQE skew-split first, this when the plan must be
    fixed statically."""
    p = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = p.join(b, [key, "_salt"]).drop("_salt")
    return out
