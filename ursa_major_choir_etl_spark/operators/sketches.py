"""Mergeable cardinality sketches (HLL, Apache DataSketches via
Spark's built-in ``hll_*`` functions — all JVM-side aggregates).

Why this exists at 100 TB: an exact COUNT(DISTINCT) re-shuffles the
raw data every time someone asks at a new grain. A persisted
per-partition HLL sketch (a few KB of binary per group) makes every
coarser rollup an O(groups) merge of sketches — daily sketches union
into weekly/monthly/global counts WITHOUT rescanning the fact table,
and an incremental load only sketches the new partition. ~1-2%
relative error at lg_k=12 (4 KB per sketch); raise lg_k for tighter
bounds.

Estimates are approximate, hence no DuckDB value-hash oracle; the
tests bound the relative error against exact counts and verify the
merge identity (union of per-day sketches == sketch of the whole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of ``value_col`` as a binary column —
    the persistable building block (write it next to the partition it
    summarizes). Columns: group_cols + ``sketch``."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch")
    )


def rollup_estimate(
    sketches: DataFrame,
    rollup_cols: list[str],
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Merge fine-grained sketches to a coarser grain and estimate:
    union per rollup group, no raw-data rescan. ``rollup_cols`` may be
    empty for a single global row."""
    grouped = (
        sketches.groupBy(*rollup_cols) if rollup_cols else sketches.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(out_col)
    )
