"""Sources & sinks (SURVEY §2.1): parquet/CSV IO, wide-sheet ingest, catalog."""

from ursa_major_choir_etl_spark.sources.io import (
    append_parquet,
    overwrite_parquet,
    read_parquet_table,
    read_wide_sheet_csv,
    table_exists,
    validate_tables_exist,
)

__all__ = [
    "read_wide_sheet_csv",
    "read_parquet_table",
    "overwrite_parquet",
    "append_parquet",
    "table_exists",
    "validate_tables_exist",
]
