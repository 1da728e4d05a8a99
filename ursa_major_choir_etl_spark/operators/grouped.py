"""Grouped-map operators: per-group Pandas transforms via
``applyInPandas`` (Arrow-batched grouped map).

This is the batch sibling of the streaming
``applyInPandasWithState`` path in ``streaming/jobs.py`` — the escape
hatch for per-group logic the built-in SQL surface can't express
(model fitting, per-group resampling/interpolation, custom
normalizations). The contract at 100 TB: Spark shuffles by the group
key and hands each COMPLETE group to Python as one pandas DataFrame,
so a single group must fit in one executor's memory — use it for
bounded-cardinality groups (an entity's history, a partition-day),
never for "one giant group". Everything else (schema declaration,
Arrow transfer, shuffle partitioning) is ordinary Spark.

min-max normalization itself IS expressible with window functions —
it is used here precisely so the Pandas grouped-map plumbing can be
oracle-checked against window SQL (reference parity: the reference
computes per-group derived values row-at-a-time in native code, e.g.
etl/marts.py:56-80; Spark-first this is a grouped Arrow batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def minmax_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "norm",
) -> DataFrame:
    """Append ``out_col`` = (value - group_min) / (group_max -
    group_min) per group; a constant group maps to 0.5 (midpoint —
    avoids a null that would poison downstream feature math).

    Computed in Pandas inside ``applyInPandas`` deliberately (see
    module docstring); both engines do the same two IEEE-double ops,
    so results are bit-identical to the window-SQL formulation.
    """
    # A fresh StructType, NOT df.schema.add(...): add() mutates the
    # DataFrame's cached schema object in place, which corrupts the
    # input df (its .columns would grow the not-yet-existing column).
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = pdf[value_col].min()
        span = pdf[value_col].max() - lo
        if span == 0:
            pdf[out_col] = 0.5
        else:
            pdf[out_col] = (pdf[value_col] - lo) / span
        return pdf

    return df.groupBy(*group_cols).applyInPandas(_norm, schema=schema)
