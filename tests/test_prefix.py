"""operators/prefix.py — the two-level bucketed prefix scan must be
value-identical to the naive single-task global window it replaces,
for every (combine, direction, inclusivity) combination the registry
uses, including histograms smaller than the bucket count and heavy
value ties collapsing into few histogram rows."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ursa_major_choir_etl_spark.operators.prefix import (
    bucketed_cumsum,
    bucketed_prefix,
)


def _hist(spark, n_values: int):
    """Value histogram with deterministic, deliberately non-uniform
    counts and a second measure column."""
    rows = [
        (v * 7 % 1000, (v % 5) + 1, (v * 13) % 97)
        for v in range(n_values)
    ]
    return spark.createDataFrame(rows, "v long, cnt long, size int")


def _naive(df, order_col, expr, combine, desc, inclusive):
    key = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.orderBy(key).rowsBetween(
        Window.unboundedPreceding, 0 if inclusive else -1
    )
    agg = F.sum(expr) if combine == "sum" else F.max(expr)
    out = agg.over(w)
    if combine == "sum" and not inclusive:
        out = F.coalesce(out, F.lit(0))
    return df.withColumn("_expect", out)


@pytest.mark.parametrize("combine", ["sum", "max"])
@pytest.mark.parametrize("desc", [False, True])
@pytest.mark.parametrize("inclusive", [True, False])
@pytest.mark.parametrize("n_values", [3, 500])
def test_matches_global_window(spark, combine, desc, inclusive, n_values):
    h = _hist(spark, n_values)
    expr = F.col("cnt") if combine == "sum" else F.col("size")
    got = bucketed_prefix(
        h,
        "v",
        {"_got": expr},
        combine=combine,
        desc=desc,
        inclusive=inclusive,
    ).select("v", "_got")
    want = _naive(h, "v", expr, combine, desc, inclusive).select(
        "v", "_expect"
    )
    joined = got.join(want, "v", "full").collect()
    assert len(joined) == h.count()
    for r in joined:
        assert r["_got"] == r["_expect"], (r, combine, desc, inclusive)


def test_multi_measure_and_decimal(spark):
    """Two measures in one call, one of them a DECIMAL(38,0) product —
    the q204/q237 shape; the typed-zero coalesce must not degrade the
    decimal type to something lossy."""
    h = _hist(spark, 200)
    got = bucketed_cumsum(
        h,
        "v",
        {
            "cum_mass": F.expr("CAST(v AS DECIMAL(38,0)) * cnt"),
            "cum_n": F.col("cnt"),
        },
        desc=True,
    )
    w = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = h.withColumn(
        "e_mass", F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * cnt")).over(w)
    ).withColumn("e_n", F.sum("cnt").over(w))
    rows = got.join(want.select("v", "e_mass", "e_n"), "v").collect()
    assert len(rows) == h.count()
    for r in rows:
        assert int(r["cum_mass"]) == int(r["e_mass"])
        assert r["cum_n"] == r["e_n"]


def test_exclusive_max_null_sentinel(spark):
    """Exclusive prefix max: exactly one NULL, at the global first row
    in scan direction — the skyline 'no previous value' sentinel."""
    h = _hist(spark, 100)
    got = bucketed_prefix(
        h,
        "v",
        {"prev": F.col("size")},
        combine="max",
        inclusive=False,
    ).collect()
    nulls = [r["v"] for r in got if r["prev"] is None]
    assert nulls == [min(r["v"] for r in got)]


def test_no_global_window_in_plan(spark):
    """The point of the operator: no single-partition exchange feeding
    a Window anywhere in the physical plan."""
    h = _hist(spark, 500)
    df = bucketed_prefix(h, "v", {"c": F.col("cnt")})
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            above = " ".join(lines[max(0, i - 4):i])
            assert "Window" not in above, plan


def test_null_scan_key_raises(spark):
    """NULL order_col must fail loud at execution — not silently drop
    out of the bucket join (round-9 ADVICE) — in both the bucketed
    and the collapsed single-bucket path."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    for n in (3, 600):  # below / above the bucket threshold
        rows = [(float(v), 1) for v in range(n)] + [(None, 1)]
        h = spark.createDataFrame(rows, "v double, cnt long")
        with pytest.raises((Py4JJavaError, PySparkException)):
            bucketed_cumsum(h, "v", {"c": F.col("cnt")}).collect()


def test_small_histogram_values_unchanged(spark):
    """A histogram smaller than the bucket count needs no special
    path (the range exchange just leaves most partitions empty) —
    values unchanged vs the naive scan."""
    h = _hist(spark, 10)
    df = bucketed_cumsum(h, "v", {"c": F.col("cnt")})
    want = _naive(h, "v", F.col("cnt"), "sum", False, True)
    for r in df.join(want.select("v", "_expect"), "v").collect():
        assert r["c"] == r["_expect"], r


def test_plan_construction_triggers_no_job(spark):
    """Round-11 VERDICT: bucketing must be lazy — building AND
    explaining a bucketed_prefix plan (any size, grouped or not)
    executes no Spark job; the range exchange samples its split
    points only when an action runs."""
    # let any queued async cleanup settle, then snapshot job ids
    spark.sparkContext.setJobGroup("prefix-lazy-probe", "probe")
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup("prefix-lazy-probe"))
    try:
        for n, grouped in ((10, False), (600, False), (600, True)):
            rows = [("g%d" % (v % 3), v, 1) for v in range(n)]
            h = spark.createDataFrame(rows, "g string, v long, cnt long")
            df = bucketed_cumsum(
                h,
                "v",
                {"c": F.col("cnt")},
                group_cols=["g"] if grouped else None,
            )
            df._jdf.queryExecution().executedPlan().toString()
        after = set(tracker.getJobIdsForGroup("prefix-lazy-probe"))
        assert after == before, after - before
    finally:
        spark.sparkContext.setJobGroup(None, None)


def test_boundaries_come_from_the_range_exchange(spark):
    """Round 13: split points come from the range exchange's bounded
    reservoir sample — the plan carries a rangepartitioning exchange
    and NO percentile aggregate of any kind (the round-12
    percentile_approx boundary pass cost a constant ~1s of extra
    stage scheduling per consumer; the exact percentile would buffer
    the whole histogram in one final merge)."""
    h = _hist(spark, 600)
    df = bucketed_cumsum(h, "v", {"c": F.col("cnt")})
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" in plan, plan
    assert "percentile" not in plan, plan


@pytest.mark.parametrize("desc", [False, True])
def test_grouped_matches_per_group_window(spark, desc):
    """group_cols: one scan per group in the same pass — equal to the
    per-group partitioned window on every row, groups with fewer rows
    than buckets included."""
    rows = [
        (g, (v * 11 + ord(g)) % 500, (v % 4) + 1)
        for g in ("a", "b", "c")
        for v in range(120 if g != "c" else 2)
    ]
    h = spark.createDataFrame(rows, "g string, v long, cnt long")
    got = bucketed_cumsum(
        h, "v", {"c": F.col("cnt")}, desc=desc, group_cols=["g"]
    )
    key = F.col("v").desc() if desc else F.col("v").asc()
    w = Window.partitionBy("g").orderBy(key).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = h.withColumn("_e", F.sum("cnt").over(w))
    rows_ = got.join(want.select("g", "v", "_e"), ["g", "v"]).collect()
    assert len(rows_) == h.count()
    for r in rows_:
        assert r["c"] == r["_e"], r
