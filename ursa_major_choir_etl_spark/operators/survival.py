"""Survival analysis over event histories: right-censored
time-to-event estimation (Nelson–Aalen), the proper churn/retention
estimator that q172's raw latency buckets cannot give — censored
subjects (no second event YET) still contribute to the at-risk
denominator until their censoring time instead of being dropped or
miscounted as non-converters.

Reference parity: the reference engine exposes last-attended /
streak-style recency operators (etl/analytics: the W2/J7 family);
this module is the LLM-pipeline generalization — the curve a growth
or data-freshness team actually reads ("of the corpora first crawled
in week w, what fraction has received a recrawl by +k weeks?").

Determinism contract (the registry's value-hash rule): the hazard at
each duration is quantized to integer ppm with floor division, and
the cumulative hazard is defined as the running sum of those
quantized terms — both engines floor identically, so the Nelson–Aalen
output value-hashes exactly. (True Kaplan–Meier survival needs a
sequential product, which floors differently depending on evaluation
order; the cumulative-hazard form is the counting-process estimator
with a well-defined quantization.)

100 TB shape: one subject-level aggregate (shuffle on the subject
key), then everything runs on the DURATION HISTOGRAM — bounded by
the calendar span, not the data. The at-risk cumulative and the
cumulative hazard both run as the two-level bucketed prefix scan
(operators/prefix.py), so no global window or single-partition sort
ever appears in the plan at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ursa_major_choir_etl_spark.operators.prefix import bucketed_cumsum


def nelson_aalen_risk_table(
    subjects: DataFrame,
    duration_col: str,
    event_col: str,
    n_buckets: int = 1,
) -> DataFrame:
    """Discrete-time risk table + Nelson–Aalen cumulative hazard.

    ``subjects``: one row per subject with a non-negative integer
    ``duration_col`` (time to event, or time to censoring) and
    ``event_col`` in {0, 1} (1 = event observed, 0 = right-censored
    at that duration).

    Returns one row per distinct duration t, ordered ascending:
      duration        : t
      n_risk          : subjects with duration >= t (at risk at t-)
      n_events        : events observed exactly at t
      n_censored      : censorings exactly at t
      hazard_ppm      : floor(1e6 * n_events / n_risk)
      cum_hazard_ppm  : running sum of hazard_ppm (quantized
                        Nelson–Aalen; see module docstring)

    Convention: censorings at t are still at risk at t (deaths before
    losses — the standard KM/NA tie rule).
    """
    dur = F.col(duration_col)
    ev = F.col(event_col).cast("long")
    hist = subjects.groupBy(dur.alias("duration")).agg(
        F.sum(ev).alias("n_events"),
        F.sum(F.lit(1) - ev).alias("n_censored"),
        F.count(F.lit(1)).alias("n_total"),
    )
    # n_buckets defaults to 1 (the zero-extra-stage single-bucket
    # scan): DURATION domains at calendar granularity are bounded by
    # the dataset's time span — a few thousand distinct day values
    # however many subjects exist — so the two cumulative scans here
    # don't need (or want) the boundary machinery. Callers with
    # genuinely data-sized duration domains (sub-second timestamps)
    # pass the 32-bucket ceiling instead.
    cum = bucketed_cumsum(
        hist,
        "duration",
        {"cum_total": F.col("n_total")},
        n_buckets=n_buckets,
    )
    # N (grand total) = the largest inclusive prefix — histogram-sized
    # aggregate, broadcast back as a single row.
    from ursa_major_choir_etl_spark.caching import stage

    cum = stage(cum)
    tot = cum.agg(F.max("cum_total").alias("_n"))
    risk = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("n_risk", F.col("_n") - (F.col("cum_total") - F.col("n_total")))
        .withColumn(
            "hazard_ppm",
            F.expr(
                "CAST(CAST(n_events AS DECIMAL(38,0)) * 1000000"
                " DIV n_risk AS BIGINT)"
            ),
        )
    )
    out = bucketed_cumsum(
        risk.select(
            "duration", "n_risk", "n_events", "n_censored", "hazard_ppm"
        ),
        "duration",
        {"cum_hazard_ppm": F.col("hazard_ppm")},
        n_buckets=n_buckets,
    )
    return out.select(
        "duration",
        "n_risk",
        "n_events",
        "n_censored",
        "hazard_ppm",
        "cum_hazard_ppm",
    )


def first_second_event(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per subject: timestamp of the first and (nullable) second event
    — the standard repeat-engagement subject table feeding a survival
    fit. One shuffle on the subject key; the window is partitioned by
    subject, never global."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    two = (
        df.select(key_col, ts_col, tiebreak_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 2)
    )
    return two.groupBy(key_col).agg(
        F.min(F.when(F.col("_rn") == 1, F.col(ts_col))).alias("first_ts"),
        F.min(F.when(F.col("_rn") == 2, F.col(ts_col))).alias("second_ts"),
    )
