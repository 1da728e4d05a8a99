"""Skew-mitigation operators.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
these utilities cover the two cases AQE can't:

- salted_aggregate: a groupBy whose hot key overwhelms one reducer.
  Two-phase: partial agg on (key, salt), final agg on key. Salt is
  deterministic (hash of a spread column mod buckets) so runs are
  reproducible.
- salted_join: a big-side hot key joining a small-but-not-broadcastable
  dim. Big side gets a deterministic salt; the dim is replicated once
  per salt bucket (explode), restoring an equi-join with fan-out
  bounded by ``buckets``.

Both preserve exact semantics — tests compare against the unsalted
plans row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate name -> (partial expr builder, final expr builder)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
    spread_col: str | None = None,
) -> DataFrame:
    """Two-phase aggregation over (keys + salt) then (keys).

    ``aggs``: output_name -> (op, column), op in sum/count/min/max
    (algebraic ops only — they re-combine exactly).
    ``spread_col``: column whose hash spreads the hot key's rows
    across buckets; defaults to the first non-key column.
    """
    spread = spread_col or next(c for c in df.columns if c not in keys)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(spread)), F.lit(buckets)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _ALGEBRAIC[op][0](col).alias(f"_p_{name}")
            for name, (op, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[op][1](f"_p_{name}").alias(name)
            for name, (op, col) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
    spread_col: str | None = None,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``buckets`` times, so a hot join key spreads over ``buckets`` tasks.
    """
    spread = spread_col or next(c for c in big.columns if c != on)
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(F.col(spread)), F.lit(buckets)))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<bigint>"))
    )
    out = big_s.join(small_s, on=[on, "_salt"], how=how)
    return out.drop("_salt")
