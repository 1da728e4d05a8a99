"""Physical-layout operators: multi-dimensional clustering keys.

Z-ORDER (Morton) clustering is the write-time half of data skipping:
sort/partition a 100 TB table by the bit-interleaving of several
quantized dimensions and every output file covers a small RANGE of
EACH dimension, so file-level min/max statistics prune scans filtered
on ANY of the interleaved columns — not just the leading sort key.
(Same idea as Delta/Iceberg `OPTIMIZE ZORDER BY`; here it is a plain
column expression any writer can `repartitionByRange` on.)

Everything is exact integer bit arithmetic (shifts, masks, adds), so
a SQL oracle replays keys and bucket statistics bit-for-bit, and the
Spark side stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Morton (Z-order) key: bit i of ``x`` lands at key
    bit 2i, bit i of ``y`` at 2i+1. Built from shift/mask/sum column
    expressions — one codegen'd projection, no UDF.

    Callers quantize first (e.g. value ranges to 16-bit rank buckets);
    inputs outside [0, 2^bits) are masked, not errors — note that a
    NEGATIVE input therefore wraps to the TOP of its dimension's
    keyspace (two's-complement low bits are all ones-ish), silently
    interleaving it among the largest values. Quantize from the
    domain minimum so inputs are non-negative (see q109: epoch =
    min date).
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_bucket_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 10,
    bucket_shift: int = 14,
) -> DataFrame:
    """Z-order clustering quality report: bucket rows by the top bits
    of their Morton key (``zkey >> bucket_shift`` — the file an
    OPTIMIZE ZORDER write would place them in) and report each
    bucket's row count and min/max of BOTH dimensions.

    The point of the report: under Z-order, every bucket spans a
    narrow range of x AND of y simultaneously, so min/max file stats
    prune on either predicate — compare against a single-column sort,
    where the second dimension's per-file range is the full domain.
    This is the evidence artifact a table-layout job emits after
    clustering 100 TB; the pruning win is (sum of bucket ranges) /
    (n_buckets * domain).

    Shape: one projection (the key) + one map-side-combinable groupBy
    on the bucket id — no shuffle beyond the aggregate, no sort needed
    for the REPORT (the write itself would repartitionByRange on
    zkey). Output: (bucket, n_rows, x_min, x_max, y_min, y_max),
    one row per occupied bucket.
    """
    zkey = morton_key(x.cast("long"), y.cast("long"), bits=bits)
    return (
        df.select(
            F.shiftright(zkey, bucket_shift).alias("bucket"),
            x.cast("long").alias("_x"),
            y.cast("long").alias("_y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_x").alias("x_min"),
            F.max("_x").alias("x_max"),
            F.min("_y").alias("y_min"),
            F.max("_y").alias("y_max"),
        )
    )
