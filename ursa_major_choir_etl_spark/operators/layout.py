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


def adaptive_shard_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    target_per_shard: int = 20_000,
    seed: int = 0,
    nibbles: int = 8,
) -> DataFrame:
    """Write-side shard sizing + balance report: pick the shard count
    from the DATA (ceil(total_size / target)) and verify a
    deterministic hash placement actually balances — the calculation
    every large writer runs before `repartition(n).write` so output
    files land near a target size instead of inheriting whatever
    parallelism the last shuffle had (the classic
    10,000-tiny-files/3-giant-files failure at 100 TB).

    The shard count is a one-row aggregate broadcast back onto the
    corpus (never collected); placement is the md5-nibble uniform
    (dedup.bloom_position_sql) mod n_shards — engine-portable, id-pure
    (stable under re-partitioning and incremental growth, unlike
    xxhash/partition-id schemes), and replayable by the SQL oracle.

    Output: one row per shard — (shard, n_shards, n_docs, shard_size,
    dev_ppm = |shard_size - ideal| * 1e6 / ideal, integer-exact). The
    ideal size is not a column; reconstruct it as shard_size adjusted
    by dev_ppm, or total/n_shards. The report IS the test:
    max(dev_ppm) is the number a writer alerts on.
    """
    from ursa_major_choir_etl_spark.operators.dedup import bloom_position_sql

    sized = df.select(
        F.col(id_col), F.col(size_col).cast("bigint").alias("_sz")
    )
    # n_shards >= 1 always (an all-zero-size input would otherwise
    # produce pmod(pos, 0) — ANSI divide-by-zero); nibbles=8 gives a
    # 16^8 ≈ 4.3e9 hash space, so placement covers shard counts far
    # past the ~1e9 a 100 TB corpus needs (the old 5-nibble space
    # capped usable shards at ~1M — review finding).
    totals = sized.agg(
        F.sum("_sz").alias("_total"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(F.sum("_sz") / F.lit(float(target_per_shard)))
            .cast("bigint"),
        ).alias("n_shards"),
    )
    pos = F.expr(bloom_position_sql(seed, f"CAST({id_col} AS STRING)", nibbles))
    placed = sized.crossJoin(F.broadcast(totals)).select(
        F.pmod(pos, F.col("n_shards")).cast("bigint").alias("shard"),
        "_sz",
        "n_shards",
        "_total",
    )
    ideal = F.col("_total").cast("double") / F.col("n_shards").cast("double")
    return (
        placed.groupBy("shard", "n_shards", "_total")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_sz").alias("shard_size"),
        )
        .select(
            "shard",
            "n_shards",
            "n_docs",
            "shard_size",
            F.when(
                F.col("_total") > 0,
                F.round(
                    F.abs(F.col("shard_size").cast("double") - ideal)
                    * 1_000_000.0
                    / ideal,
                    0,
                ).cast("bigint"),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("dev_ppm"),
        )
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    nibbles: int = 8,
) -> DataFrame:
    """Content-addressed manifest for a sharded corpus release: one
    row per shard with doc/token counts, the id range, and an
    order-insensitive 61-bit content checksum — the loader-side
    contract that lets a trainer verify every shard it mounts is
    bit-for-bit the shard the curation run published (and lets an
    incremental publisher skip unchanged shards).

    Placement is the same md5-nibble uniform as
    :func:`adaptive_shard_plan` (engine-portable, id-pure); the
    checksum folds each doc's 60-bit md5 text fingerprint into a
    DECIMAL(38,0) sum reduced mod 2^61-1 — commutative, so shard
    content equality holds under ANY row order or partitioning, and
    the sum stays exact past 1e18 docs per shard.

    One corpus scan, one shard-cardinality aggregate, no windows.
    """
    from ursa_major_choir_etl_spark.operators.dedup import bloom_position_sql
    from ursa_major_choir_etl_spark.operators.text import token_count

    pos = F.expr(
        bloom_position_sql(seed, f"CAST({id_col} AS STRING)", nibbles)
    )
    fp = F.expr(bloom_position_sql(seed + 1, text_col, 15))
    mersenne61 = 2**61 - 1
    return (
        df.select(
            F.pmod(pos, F.lit(n_shards)).cast("bigint").alias("shard"),
            F.col(id_col).alias("_id"),
            token_count(text_col).cast("bigint").alias("_tok"),
            fp.alias("_fp"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            F.min("_id").alias("min_id"),
            F.max("_id").alias("max_id"),
            F.sum(F.col("_fp").cast("decimal(38,0)")).alias("_s"),
        )
        .withColumn(
            "checksum",
            F.expr(
                f"CAST(_s % CAST({mersenne61} AS DECIMAL(38,0)) AS BIGINT)"
            ),
        )
        .drop("_s")
    )
