"""Z-order clustering for multi-column data skipping.

Parquet scans prune files/row-groups whose min/max column stats miss
the predicate. A single-column sort gives perfect skipping on that
column and none on others; Z-ordering (Morton interleave of
quantile-bucket ranks) spreads locality across SEVERAL columns, so a
conjunctive box predicate (``a BETWEEN .. AND b BETWEEN ..``) prunes
on every z-ordered column at once. This is the table-layout lever at
100 TB: the scan cost of a selective multi-column query is set by how
the writer clustered the files, not by the reader.

Scale notes: bucket boundaries come from ``approxQuantile`` (a
driver-sized array of at most ``2^bits`` doubles per column — never
data-sized), the bucket lookup and bit interleave are pure JVM column
expressions, and the final layout is ``repartitionByRange`` on the
z-key (range shuffle = one pass) + sort within partitions. No Python
row loop anywhere.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_bucket(df: DataFrame, col: str, bits: int = 8) -> Column:
    """Column expression mapping ``col`` to its quantile-bucket rank
    in [0, 2^bits): bucket = #boundaries <= value, via a higher-order
    filter over the (broadcast-literal) boundary array. Quantile
    buckets (not equi-width) so skewed columns still spread evenly
    across the z-curve."""
    n = 2**bits
    qs = [i / n for i in range(1, n)]
    boundaries = df.approxQuantile(col, qs, 0.001)
    # Dedup plateau boundaries (heavy hitters) so a constant run maps
    # to ONE bucket instead of eating the whole bucket space.
    uniq = sorted(set(boundaries))
    arr = F.array(*[F.lit(float(b)) for b in uniq])
    return F.size(
        F.filter(arr, lambda b: b <= F.col(col).cast("double"))
    ).cast("long")


def z_value(bucket_cols: list[Column], bits: int = 8) -> Column:
    """Morton code: interleave the low ``bits`` bits of each bucket
    rank, round-robin across columns (static JVM expression tree —
    ``bits * n_cols`` shift/or terms, no UDF)."""
    ncols = len(bucket_cols)
    terms: list[Column] = []
    for i in range(bits):  # bit i of every column
        for j, c in enumerate(bucket_cols):
            out_pos = i * ncols + j
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), out_pos)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 8,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of
    ``zorder_by``: range-partition by z-value (each output file owns a
    contiguous z-range => tight per-file min/max on every z-column),
    sort within partitions, drop the helper column on write."""
    buckets = [quantile_bucket(df, c, bits) for c in zorder_by]
    with_z = df.withColumn("_zval", z_value(buckets, bits))
    (
        with_z.repartitionByRange(num_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode("overwrite")
        .parquet(path)
    )
