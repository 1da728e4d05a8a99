"""Presence-bitmap algebra: pack a bounded integer position domain
(days of an analysis month, weeks of a quarter) into one BIGINT per
entity with ``bit_or`` aggregation, then answer set questions with
bitwise AND/OR + popcount — the roaring-bitmap idea at its smallest
useful size, and the cheapest possible representation of "which days
was this user active" at 100 TB (8 bytes per entity instead of a row
per entity-day).

Spark-first: ``bit_or`` / ``bit_count`` / ``&`` / ``|`` are all JVM
built-ins inside whole-stage codegen; the pack is ONE data-sized
aggregate and every downstream set operation works on the packed
table (entity-cardinality, not event-cardinality). Positions are
capped to [0, 62] — bit 63 is the BIGINT sign bit and ``1 << 63``
overflows DuckDB's checked shift, so the contract excludes it
(callers with wider domains split into multiple words).

Determinism: everything is integer bit math — no floats anywhere —
so results value-hash across engines by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_POSITION = 62  # highest usable bit of a signed 64-bit word


def presence_bitmaps(
    df: DataFrame,
    entity_cols: list[str],
    position_col: str,
) -> DataFrame:
    """One row per entity key: ``bitmap`` = OR of ``1 << position``
    over the entity's rows, plus ``n_active`` = popcount. Rows whose
    position falls outside [0, 62] are excluded (documented domain
    cap, see module docstring)."""
    pos = F.col(position_col)
    return (
        df.filter((pos >= 0) & (pos <= MAX_POSITION))
        .groupBy(*entity_cols)
        .agg(
            F.expr(
                f"bit_or(shiftleft(CAST(1 AS BIGINT), {position_col}))"
            ).alias("bitmap")
        )
        .withColumn("n_active", F.bit_count("bitmap").cast("int"))
    )


def bitmap_pair_overlap(
    bitmaps: DataFrame,
    entity_col: str,
    side_col: str,
) -> DataFrame:
    """Pairwise presence overlap between sides (event types, sources)
    sharing an entity: for every unordered side pair (a < b), the
    per-entity intersection/union popcounts aggregated into

      n_entities_both   : entities holding a bitmap on both sides
      sum_inter         : total co-active positions
      sum_union         : total either-active positions
      micro_jaccard_ppm : 1e6 * sum_inter DIV sum_union
      macro_jaccard_ppm : mean of per-entity floor-ppm Jaccards
                          (each entity weighted equally)

    Shape: self-equi-join on the entity key over the PACKED table
    (entity x side cardinality, already reduced from events), then a
    side-pair aggregate whose output is |sides|^2 / 2 rows."""
    a = bitmaps.select(
        F.col(entity_col).alias("_e"),
        F.col(side_col).alias("side_a"),
        F.col("bitmap").alias("_ba"),
    )
    b = bitmaps.select(
        F.col(entity_col).alias("_e"),
        F.col(side_col).alias("side_b"),
        F.col("bitmap").alias("_bb"),
    )
    pairs = (
        a.join(b, "_e")
        .filter(F.col("side_a") < F.col("side_b"))
        .withColumn(
            "_inter", F.bit_count(F.col("_ba").bitwiseAND(F.col("_bb")))
        )
        .withColumn(
            "_union", F.bit_count(F.col("_ba").bitwiseOR(F.col("_bb")))
        )
    )
    return (
        pairs.groupBy("side_a", "side_b")
        .agg(
            F.count(F.lit(1)).alias("n_entities_both"),
            F.sum("_inter").alias("sum_inter"),
            F.sum("_union").alias("sum_union"),
            F.sum(
                F.expr("CAST(_inter AS BIGINT) * 1000000 DIV _union")
            ).alias("_sj"),
        )
        .select(
            "side_a",
            "side_b",
            "n_entities_both",
            "sum_inter",
            "sum_union",
            F.expr(
                "CASE WHEN sum_union > 0 THEN"
                " sum_inter * 1000000 DIV sum_union END"
            ).alias("micro_jaccard_ppm"),
            F.expr("_sj DIV n_entities_both").alias("macro_jaccard_ppm"),
        )
    )
