"""Bucketed co-located joins: writing both sides bucketed on the join
key removes the Exchange (shuffle) from the join plan entirely — the
repeat-join pattern for 100 TB fact tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ursa_major_choir_etl_spark.sources.io import write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from ursa_major_choir_etl_spark.plans.queries import T

    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    write_bucketed(
        T(spark, SF_DIR, "lineitem"), "b_lineitem", ["l_orderkey"], 8
    )
    write_bucketed(T(spark, SF_DIR, "orders"), "b_orders", ["o_orderkey"], 8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


class TestBucketedJoin:
    def test_join_has_no_shuffle(self, spark, bucketed_tables):
        li, orders = bucketed_tables
        # Disable broadcast so the join strategy decision is about
        # shuffling, not table size.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = (
                spark.table(li)
                .join(
                    spark.table(orders),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                )
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"))
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            join_section = plan[: plan.find("HashAggregate")] or plan
            assert "SortMergeJoin" in plan
            # the join inputs read bucketed data directly - no Exchange
            # between the scans and the join
            scans = plan[plan.find("SortMergeJoin") :]
            assert "Exchange hashpartitioning(l_orderkey" not in scans
            assert "Exchange hashpartitioning(o_orderkey" not in scans
            assert "SelectedBucketsCount" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    def test_join_result_correct(self, spark, bucketed_tables):
        from ursa_major_choir_etl_spark.plans.queries import T

        li, orders = bucketed_tables
        got = (
            spark.table(li)
            .join(spark.table(orders), F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        expected = (
            T(spark, SF_DIR, "lineitem")
            .join(
                T(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert got == expected
