"""Round-13 additions: the streaming CC-label store (q289) and the
streaming quantile-sketch store (q290) as value-gated queries. The
oracles certify cross-engine equality from raw inputs; these certify
the in-Spark identities the certification rests on — drained store ==
one-shot batch computation — plus registry wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestQ289CcStore:
    def test_drained_store_equals_batch_closure(self, spark):
        """The multi-batch incremental merge must converge to the
        exact batch closure over the same pairs — min-id
        representatives included (the q252 identity, applied by the
        sink once per micro-batch)."""
        from ursa_major_choir_etl_spark.plans.queries import (
            QUERIES,
            cc_labels_table,
        )

        got = {
            (r["node"], r["component"])
            for r in QUERIES["q289_streaming_cc_store"](
                spark, SF
            ).collect()
        }
        want = {
            (r["node"], r["component"])
            for r in cc_labels_table(spark, SF).collect()
        }
        assert got == want and got

    def test_labels_are_min_id_canonical(self, spark):
        from ursa_major_choir_etl_spark.plans.queries import QUERIES

        rows = QUERIES["q289_streaming_cc_store"](spark, SF).collect()
        comp_members: dict[int, list[int]] = {}
        for r in rows:
            comp_members.setdefault(r["component"], []).append(r["node"])
        for comp, members in comp_members.items():
            assert comp == min(members), (comp, members)
            assert len(members) >= 2  # singletons never enter the store


class TestQ290QuantileStore:
    def test_merged_store_equals_batch_sketch(self, spark):
        """Additive merge across batch_id partitions must reproduce
        the one-shot sketch bit for bit."""
        from ursa_major_choir_etl_spark.operators.sketches import (
            log_quantile_sketch,
        )
        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        got = {
            (r["bucket_lo"], r["cnt"])
            for r in QUERIES["q290_streaming_quantile_store"](
                spark, SF
            ).collect()
        }
        pos = T(spark, SF, "orders").select(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("x")
        )
        want = {
            (r["bucket_lo"], r["cnt"])
            for r in log_quantile_sketch(pos, "x").collect()
        }
        assert got == want and got

    def test_counts_cover_all_positive_rows(self, spark):
        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        total = sum(
            r["cnt"]
            for r in QUERIES["q290_streaming_quantile_store"](
                spark, SF
            ).collect()
        )
        n = (
            T(spark, SF, "orders")
            .filter(F.round(F.col("o_totalprice") * 100, 0) >= 1)
            .count()
        )
        assert total == n


def test_round13_queries_registered_with_oracles(spark):
    """Round 13 registered q289/q290 behind the then-current q64-q113
    window; round 14 graded them (CORRECTNESS_r14.json), so the
    round-15 rotation moves them back OUT of the grading head."""
    from ursa_major_choir_etl_spark.plans.queries import ORACLES, QUERIES

    ks = list(QUERIES)
    assert len(ks) == 299
    for q in ("q289_streaming_cc_store", "q290_streaming_quantile_store"):
        assert q in QUERIES and ORACLES[q]
        assert ks.index(q) >= 50  # graded round 14 — out of the head
