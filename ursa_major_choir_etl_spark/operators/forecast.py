"""Forecasting operators: exponential-smoothing state models over
calendar-bounded series.

Reference parity: the reference's analytics surface stops at lookback
aggregates and trailing streaks (SURVEY §2 W1/W2); a pipeline feeding
capacity planning or anomaly gates needs the next step — a state
model with level and trend. Holt's linear method is the smallest such
model and the building block of Holt–Winters.

Execution model (the q90/q267 precedent): the SERIES ROLLUP is the
only data-sized work — one groupBy shuffle from the corpus to
(group × period) rows, bounded by the calendar at any corpus size.
The smoothing recurrence is inherently sequential, so it runs on the
collected rollup as driver-side model state (a few hundred integer
triples), never as per-step Spark jobs; the first draft of the
Bradley–Terry operator measured 20s for twelve 25-row shuffle jobs —
the same anti-pattern this module avoids by design.

Determinism: smoothing weights are exact integer fractions
(alpha = a_num/10, beta = b_num/10) and every step divides with
TRUNCATION toward zero (`_tdiv`), matching Spark DIV and DuckDB //
exactly — trend can be negative, where Python's floor `//` would
diverge from both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark DIV / DuckDB //
    semantics; Python // floors and differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def holt_linear_smoothing(
    spark: SparkSession,
    series: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    *,
    alpha_tenths: int = 2,
    beta_tenths: int = 1,
) -> DataFrame:
    """Holt's linear (double exponential) smoothing per group with
    exact integer arithmetic:

        l_0 = y_0,   b_0 = y_1 - y_0   (0 for single-point series)
        f_t = l_{t-1} + b_{t-1}                       (1-step forecast)
        l_t = tdiv(a·y_t + (10-a)·f_t, 10)
        b_t = tdiv(b·(l_t - l_{t-1}) + (10-b)·b_{t-1}, 10)

    ``x_col`` orders the series (gaps allowed — smoothing steps once
    per OBSERVED period, the standard discrete form); ``y_col`` must
    be integer (cents). Returns one row per input point:
    (group, x, y, level, trend, fitted, resid) — fitted/resid NULL at
    t = 0 where no forecast exists. Output is exact-integer and
    value-hashes against a recursive-CTE SQL replay.
    """
    rows = series.select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).collect()
    # driver-side sort of the calendar-bounded rollup — keeps even the
    # bounded global Sort out of the Spark plan entirely
    rows.sort(key=lambda r: (r["g"], r["x"]))
    a, b = alpha_tenths, beta_tenths
    out: list[tuple] = []
    cur = None
    l = t = None
    for r in rows:
        if r["g"] != cur:
            cur, l, t = r["g"], r["y"], None
            out.append((r["g"], r["x"], r["y"], l, 0, None, None))
            continue
        if t is None:
            # second point fixes the initial trend retroactively for
            # the recurrence (classic Holt init), then steps normally
            t = r["y"] - out[-1][3]
            # re-stamp the first row's trend now that it is known
            g0, x0, y0, l0, _, f0, rs0 = out[-1]
            out[-1] = (g0, x0, y0, l0, t, f0, rs0)
        f = l + t
        l_new = _tdiv(a * r["y"] + (10 - a) * f, 10)
        t = _tdiv(b * (l_new - l) + (10 - b) * t, 10)
        l = l_new
        out.append((r["g"], r["x"], r["y"], l, t, f, r["y"] - f))
    g_type = series.select(F.col(group_col).alias("g")).schema[0].dataType
    schema = StructType(
        [
            StructField("g", g_type),
            StructField("x", LongType()),
            StructField("y", LongType()),
            StructField("level", LongType()),
            StructField("trend", LongType()),
            StructField("fitted", LongType()),
            StructField("resid", LongType()),
        ]
    )
    return spark.createDataFrame(out, schema).select(
        F.col("g").alias(group_col),
        F.col("x").alias(x_col),
        F.col("y").alias(y_col),
        "level",
        "trend",
        "fitted",
        "resid",
    )
