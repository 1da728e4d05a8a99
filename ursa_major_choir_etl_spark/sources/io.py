"""Sources and sinks (SURVEY §2.1, S1-S12).

The reference's storage is a Google Sheet reached over HTTPS
(reference: etl/gsheets.py); ours is Parquet on a distributed
filesystem. The mapping:

- S2/S3 range/table scan            -> spark.read.csv / spark.read.parquet
- S4 catalog listing                -> filesystem / catalog listing
- S5 create-if-not-exists           -> implicit on first Parquet write
- S6/S7 idempotent overwrite sink   -> write.mode("overwrite")
- S8 append sink                    -> write.mode("append")
- S9 header-on-first-write          -> intrinsic to Parquet schema
- S11 connectivity probe            -> path existence / limit(0) read
- S12 existence validation          -> validate_tables_exist

Stable row ids: duplicate-name disambiguation (K1/K2) and the song
positional zip (U4) depend on source row order — Spark DataFrames are
unordered, so the ingest layer mints ``input_row_id`` (SURVEY §7.4
hard-part #1). Ids are assigned WITHOUT a global sort (no Exchange
SinglePartition): a tiny per-split statistics job computes each
split's row count and starting ``monotonically_increasing_id``, the
driver turns those into cumulative offsets (one row per split — KBs
even at 100k splits), and a broadcast join adds
``offset + (mid - split_min_mid)`` per row. Row order inside a text
split is file order and split index follows byte offset for a single
file, so ids reproduce file order exactly at any parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INPUT_ROW_ID = "input_row_id"

#: Fixed leading columns of the RAW wide sheet; date columns follow by
#: position (reference: etl/fact_attendance.py:16-17 DATE_COLUMNS_START_INDEX=4).
RAW_FIXED_COLUMNS = ["Tag", "Joined", "tgid", "Who"]
DATE_COLUMNS_START_INDEX = 4


def read_wide_sheet_csv(spark: SparkSession, path: str) -> DataFrame:
    """Ingest the RAW wide sheet (S2/S3) with a stable ``input_row_id``.

    All columns arrive as strings (the Sheets API shape); short rows pad
    with nulls (reference pads with ""/None, etl/gsheets.py:134).
    """
    df = spark.read.option("header", True).option("inferSchema", False).csv(path)
    return with_file_order_ids(df)


def with_file_order_ids(df: DataFrame, id_col: str = INPUT_ROW_ID) -> DataFrame:
    """Assign ``id_col`` = 0..n-1 in source order without a global sort.

    Scale-safe replacement for ``row_number() OVER (ORDER BY
    monotonically_increasing_id())`` (which funnels the whole scan
    through one task). Two jobs, both fully parallel:

    1. per-split aggregate of ``(count, min(mid))`` — output is one row
       per split, collected to the driver (KBs even at 100k splits);
    2. the main scan joined (broadcast) with the per-split cumulative
       offset: ``id = split_offset + (mid - split_min_mid)``.

    ``monotonically_increasing_id`` is consecutive within a partition
    (record counter in the low 33 bits), and for a single file the
    split index follows byte offset, so ids reproduce file order at any
    split count. The source must be deterministic across the two scans
    (a static file is). For multi-file inputs, order is per Spark's
    file packing; the wide-sheet contract is a single sheet/file.
    """
    pid_col, mid_col, off_col, min_col = "_fo_pid", "_fo_mid", "_fo_off", "_fo_min"
    tagged = df.withColumn(pid_col, F.spark_partition_id()).withColumn(
        mid_col, F.monotonically_increasing_id()
    )
    stats = (
        tagged.groupBy(pid_col)
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(mid_col).alias("mn"))
        .collect()
    )
    offsets, acc = [], 0
    for r in sorted(stats, key=lambda r: r[pid_col]):
        offsets.append((r[pid_col], acc, r["mn"]))
        acc += r["cnt"]
    if not offsets:
        return df.withColumn(id_col, F.lit(None).cast("long"))
    off_df = df.sparkSession.createDataFrame(
        offsets, f"{pid_col} int, {off_col} long, {min_col} long"
    )
    return (
        tagged.join(F.broadcast(off_df), pid_col)
        .withColumn(
            id_col, F.col(off_col) + (F.col(mid_col) - F.col(min_col))
        )
        .drop(pid_col, mid_col, off_col, min_col)
    )


#: Column-name prefix for unusable headers (None/empty/duplicate).
#: Positional semantics require the columns to EXIST (date columns are
#: index-based), but no name-based logic may match them; the date-column
#: helpers skip this prefix.
PLACEHOLDER_PREFIX = "__placeholder_"


def clean_header(raw: list) -> list[str]:
    """Header hygiene shared by the values/json ingest paths (mirrors
    the reference's dict-index semantics, etl/dim_chorister.py:18-20):
    empty/None and reserved names become positional placeholders;
    duplicate names keep only the LAST occurrence (dict last-wins)."""
    raw_header = ["" if h is None else str(h) for h in raw]
    last_index: dict[str, int] = {h: i for i, h in enumerate(raw_header)}
    header = []
    for i, h in enumerate(raw_header):
        if not h.strip() or h == INPUT_ROW_ID or last_index[h] != i:
            header.append(f"{PLACEHOLDER_PREFIX}{i}")
        else:
            header.append(h)
    return header


def read_wide_sheet_json(
    spark: SparkSession, path: str, num_partitions: int = 4
) -> DataFrame:
    """Ingest a saved Sheets ``values.get`` JSON payload through the
    custom ``sheet_values`` DataSource (sources/sheets_source.py) —
    the connector-native S2/S3 path: range-partitioned parallel reads
    with source-assigned stable ordinals, then the same header hygiene
    and null padding as ``read_wide_sheet_values``. Output is
    row-for-row identical to that in-memory path (tested)."""
    from ursa_major_choir_etl_spark.sources.sheets_source import register

    register(spark)
    raw = (
        spark.read.format("sheet_values")
        .option("path", path)
        .option("numPartitions", str(num_partitions))
        .load()
    )
    header_rows = raw.filter(F.col(INPUT_ROW_ID) == 0).collect()
    if not header_rows:
        from pyspark.sql.types import LongType, StructField, StructType

        return spark.createDataFrame(
            [], StructType([StructField(INPUT_ROW_ID, LongType())])
        )
    header = clean_header(header_rows[0]["cells"])
    # F.get is 0-based and returns null out-of-bounds even under ANSI
    # (element_at would raise) — short rows pad with nulls for free.
    return raw.filter(F.col(INPUT_ROW_ID) > 0).select(
        *[F.get("cells", i).alias(h) for i, h in enumerate(header)],
        (F.col(INPUT_ROW_ID) - 1).alias(INPUT_ROW_ID),
    )


def read_wide_sheet_values(spark: SparkSession, values: list[list]) -> DataFrame:
    """Ingest the reference's native in-memory shape (S2 get_values:
    first row header, rest data rows; short rows padded with nulls —
    etl/gsheets.py:97-136) with a stable ``input_row_id``.

    Header hygiene mirrors the reference's dict-index semantics
    (etl/dim_chorister.py:18-20 _index_by_name):
    - None/empty header cells -> positional placeholder (the column
      exists so index-based date rules stay aligned, but no name
      matches it — the reference skips such columns too);
    - duplicate names: the LAST occurrence keeps the name (dict
      last-wins), earlier ones become placeholders;
    - a header colliding with the reserved input_row_id is
      placeholdered.
    Schema is built as a StructType, so header text can contain any
    characters (backticks included).
    """
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    if not values:
        return spark.createDataFrame(
            [], StructType([StructField(INPUT_ROW_ID, LongType())])
        )
    header = clean_header(values[0])
    width = len(header)
    rows = []
    for i, row in enumerate(values[1:]):
        cells = [None if v is None else str(v) for v in row[:width]]
        cells += [None] * (width - len(cells))
        rows.append((*cells, i))
    schema = StructType(
        [StructField(h, StringType()) for h in header]
        + [StructField(INPUT_ROW_ID, LongType())]
    )
    return spark.createDataFrame(rows, schema)


def raw_date_columns(df: DataFrame) -> list[str]:
    """Positional projection F7: raw header names from column index >= 4
    (placeholders for unusable headers are skipped, like the reference
    skips empty header cells)."""
    return [
        c
        for c in df.columns[DATE_COLUMNS_START_INDEX:]
        if c != INPUT_ROW_ID and not c.startswith(PLACEHOLDER_PREFIX)
    ]


def has_required_columns(df: DataFrame, required: list[str]) -> bool:
    """Missing-column degradation check F8 (reference returns an empty
    table when Tag/Joined/Who are absent, e.g. etl/dim_chorister.py:77-78)."""
    return set(required) <= set(df.columns)


def read_parquet_table(
    spark: SparkSession, warehouse: str, name: str, merge_schema: bool = False
) -> DataFrame:
    """Read a warehouse table. ``merge_schema=True`` unions the
    schemas of all files (schema evolution: an appended batch that
    ADDED a column still reads as one table, old files null-filled).
    Off by default: merging footers costs a file-listing pass per
    read, and a table of homogeneous files shouldn't pay it."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(os.path.join(warehouse, name))


def overwrite_parquet(
    df: DataFrame,
    warehouse: str,
    name: str,
    partition_by: list[str] | None = None,
    dynamic: bool = False,
    sort_by: list[str] | None = None,
) -> None:
    """Idempotent overwrite sink (S6/S7).

    ``sort_by`` range-repartitions on the keys and sorts within each
    output file, so every file/row-group covers a NARROW key range and
    parquet min/max statistics become selective — point/range filters
    on the sort keys skip whole files at scan time. (A local sort
    alone cannot do this: round-robin partitions each span the full
    key range regardless of row order.)

    ``dynamic=False`` (default) is the reference's clear-then-write:
    the whole table is replaced — correct for full-recompute runs and
    it cleans up any prior layout. ``dynamic=True`` rewrites only the
    partitions present in ``df`` (partitionOverwriteMode=dynamic) —
    the incremental path; requires the table to already have the
    partitioned layout.

    Empty frames: a 0-partition/0-row frame under partitionBy would
    write no files at all, so the re-read could not infer a schema
    (the F8 degraded tables hit this). Empty data is written
    unpartitioned as one empty part file — the schema survives, and
    there are no partitions to preserve anyway.
    """
    if df.rdd.getNumPartitions() == 0:
        df = df.repartition(1)
    if partition_by and df.isEmpty():
        partition_by = None
        dynamic = False
    if sort_by:
        df = df.repartitionByRange(*sort_by).sortWithinPartitions(*sort_by)
    writer = df.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic" if dynamic else "static"
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(warehouse, name))


def compact_partitions(
    spark: SparkSession,
    warehouse: str,
    name: str,
    target_files_per_partition: int = 1,
    partition_by: list[str] | None = None,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a table so each partition holds
    ``target_files_per_partition`` files. Frequent incremental writes
    fragment partitions; scan cost at 100 TB is dominated by file
    count, so compaction is routine table maintenance.

    Returns (files_before, files_after).
    """
    import glob

    path = os.path.join(warehouse, name)

    def count_files() -> int:
        return len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))

    before = count_files()
    df = spark.read.parquet(path)
    cols = partition_by or []
    if cols:
        out = df.repartition(target_files_per_partition, *cols)
    else:
        out = df.repartition(target_files_per_partition)
    # Write to a temp location then swap — compaction must not lose
    # the table on failure.
    tmp = path + "__compacting"
    writer = out.write.mode("overwrite")
    if cols:
        writer = writer.partitionBy(*cols)
    writer.parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return before, count_files()


def merge_upsert(
    spark: SparkSession,
    warehouse: str,
    name: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
    extra_touched: list | None = None,
) -> tuple[int, int]:
    """CDC-style MERGE (upsert): rows in ``updates`` replace target
    rows with the same key; unmatched rows are inserted.

    Parquet has no row-level ACID, so merge = rewrite-touched-
    partitions: (1) collect the distinct ``partition_col`` values in
    the delta (small — one value per touched partition, never data-
    sized); (2) read ONLY those partitions of the target (partition-
    pruned scan); (3) left_anti old rows against delta keys; (4) union
    the delta; (5) atomically swap just those partition directories.
    Untouched partitions are neither read nor written — at 100 TB the
    cost scales with the delta, not the table. A table with no
    ``partition_col`` degrades to a full rewrite (documented cost).

    The reference has no incremental path at all (full recompute per
    run, `etl/main.py:190-285`); this is the scale-path extension the
    overwrite sink (S6/S7) needs for frequent small deltas.

    Touched partitions are derived from the DELTA's partition values,
    which is only complete when a key's partition value never changes
    between updates (partition_col derived from the key, the standard
    Hive-layout contract). A caller whose updates CAN move a key
    across partitions must pass the standing rows' partition values
    via ``extra_touched`` — those partitions then join the rewrite,
    so the key's old row is retired (and a partition left empty is
    removed) in the same atomic swap. ``streaming_upsert_sink``'s
    seq mode does exactly this.

    Returns (n_replaced, n_inserted).
    """
    import shutil

    path = os.path.join(warehouse, name)
    target = spark.read.parquet(path)

    if partition_col is not None:
        touched = sorted(
            {
                r[0]
                for r in updates.select(partition_col).distinct().collect()
            }
            | set(extra_touched or [])
        )
        pruned = target.filter(F.col(partition_col).isin(touched))
    else:
        touched = None
        pruned = target

    keys = updates.select(*key_cols).distinct()
    n_replaced = pruned.join(keys, key_cols, "left_semi").count()
    n_inserted = updates.count() - n_replaced

    merged = pruned.join(keys, key_cols, "left_anti").unionByName(
        updates.select(*target.columns)
    )

    tmp = path + "__merging"
    writer = merged.write.mode("overwrite")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(tmp)

    if touched is None:
        shutil.rmtree(path)
        os.rename(tmp, path)
    else:
        for v in touched:
            sub = f"{partition_col}={v}"
            dst = os.path.join(path, sub)
            src = os.path.join(tmp, sub)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            if os.path.exists(src):  # delta may be all-inserts elsewhere
                os.rename(src, dst)
        shutil.rmtree(tmp)
    return n_replaced, n_inserted


def append_parquet(df: DataFrame, warehouse: str, name: str) -> None:
    """Append sink (S8) — used by the etl_log audit table."""
    df.write.mode("append").parquet(os.path.join(warehouse, name))


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols) at
    WRITE time, so later equi-joins/aggregations on those columns read
    pre-partitioned data and skip the shuffle entirely — the standard
    100 TB pattern for fact-to-fact joins that repeat every run.

    Requires a catalog (saveAsTable); plain .parquet() paths cannot
    carry bucket metadata.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source — the lingua franca for document corpora.

    Pass ``schema`` in production: without it Spark runs a FULL
    inference scan before the real read (2x I/O at 100 TB, and a
    malformed row can silently widen a column to string). Corrupt
    records land in ``_corrupt_record`` (PERMISSIVE mode) instead of
    failing the scan — the quarantine-not-crash policy of E5.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """JSON-lines sink (overwrite). Gzip per-file compression by
    default — JSONL is an interchange format here, not the analytic
    store (Parquet is); this sink exists for handing corpora to
    tokenizer/training jobs that expect JSONL."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — same columnar guarantees as Parquet (predicate
    pushdown, column pruning, vectorized read); provided so the engine
    can sit on either lakehouse format."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def table_exists(spark: SparkSession, warehouse: str, name: str) -> bool:
    """Existence probe (S11): cheap schema-only read attempt."""
    try:
        spark.read.parquet(os.path.join(warehouse, name)).schema
        return True
    except Exception:
        return False


def validate_tables_exist(
    spark: SparkSession, warehouse: str, names: list[str]
) -> None:
    """S12: fail fast if any required upstream table is missing
    (reference: etl/main.py:79-85)."""
    missing = [n for n in names if not table_exists(spark, warehouse, n)]
    if missing:
        raise RuntimeError(
            f"Missing required tables in {warehouse!r}: {', '.join(sorted(missing))}"
        )
