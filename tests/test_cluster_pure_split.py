"""Cluster-pure train/eval split: near-dup clusters must never
straddle the split, singletons key on their own id, and the split
stays deterministic and exhaustive."""

from __future__ import annotations

from pyspark.sql import functions as F


def _label_df(spark, rows):
    return spark.createDataFrame(rows, "node long, component long")


class TestClusterPureSplit:
    def test_no_cluster_straddles_the_split(self, spark, tmp_path, monkeypatch):
        from ursa_major_choir_etl_spark import artifacts
        from ursa_major_choir_etl_spark.operators.dedup import (
            connected_components,
        )
        from ursa_major_choir_etl_spark.operators.sampling import (
            split_train_eval_cluster_pure,
        )
        from ursa_major_choir_etl_spark.plans.queries import jaccard_pairs_table

        monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path))
        artifacts._VERIFIED.clear()
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        labels = connected_components(
            jaccard_pairs_table(spark, "/root/testdata/sf0.001")
        )
        # a fraction high enough that real clusters land in eval
        train, ev = split_train_eval_cluster_pure(
            docs, labels, eval_fraction=0.3
        )
        assert train.count() + ev.count() == docs.count()
        assert set(train.columns) == set(docs.columns)
        ev_ids = ev.select(F.col("doc_id").alias("node"))
        # every component is entirely inside exactly one side
        comp_sides = (
            labels.join(ev_ids, "node", "left_semi")
            .select("component")
            .distinct()
            .join(
                labels.join(
                    train.select(F.col("doc_id").alias("node")),
                    "node",
                    "left_semi",
                )
                .select("component")
                .distinct(),
                "component",
            )
        )
        assert comp_sides.count() == 0
        assert ev.count() > 0 and train.count() > 0

    def test_clustermates_move_together_and_singletons_match_id_hash(
        self, spark
    ):
        from ursa_major_choir_etl_spark.operators.sampling import (
            split_train_eval,
            split_train_eval_cluster_pure,
        )

        docs = spark.range(0, 400).select(F.col("id").alias("doc_id"))
        # pairs (2k, 2k+1) clustered together for k < 50; rest singletons
        labels = _label_df(
            spark,
            [(2 * k, 2 * k) for k in range(50)]
            + [(2 * k + 1, 2 * k) for k in range(50)],
        )
        train, ev = split_train_eval_cluster_pure(
            docs, labels, eval_fraction=0.25, seed=7
        )
        ev_ids = {r["doc_id"] for r in ev.collect()}
        for k in range(50):
            assert (2 * k in ev_ids) == (2 * k + 1 in ev_ids), k
        # unlabeled docs (id >= 100) fall back to the plain id-hash
        # split: their membership must equal split_train_eval's
        singles = docs.filter(F.col("doc_id") >= 100)
        _, ev_plain = split_train_eval(
            singles, eval_fraction=0.25, id_col="doc_id", seed=7
        )
        assert {r["doc_id"] for r in ev_plain.collect()} == {
            i for i in ev_ids if i >= 100
        }

    def test_deterministic_across_repartitioning(self, spark):
        from ursa_major_choir_etl_spark.operators.sampling import (
            split_train_eval_cluster_pure,
        )

        docs = spark.range(0, 300).select(F.col("id").alias("doc_id"))
        labels = _label_df(spark, [(i, i - i % 3) for i in range(90)])
        _, ev1 = split_train_eval_cluster_pure(docs, labels, 0.2, seed=3)
        _, ev2 = split_train_eval_cluster_pure(
            docs.repartition(13), labels.repartition(7), 0.2, seed=3
        )
        assert {r["doc_id"] for r in ev1.collect()} == {
            r["doc_id"] for r in ev2.collect()
        }

    def test_string_ids_split_both_ways(self, spark):
        """Non-numeric ids (supported by connected_components) must
        hash on their own value, not collapse into one NULL bucket
        that drops every singleton on a single side (round-9 ADVICE:
        the old long-cast nulled string keys)."""
        from ursa_major_choir_etl_spark.operators.sampling import (
            split_train_eval_cluster_pure,
        )

        docs = spark.createDataFrame(
            [(f"doc-{i:04d}", i) for i in range(400)], "doc_id string, x int"
        )
        labels = spark.createDataFrame(
            [], "node string, component string"
        )  # all singletons
        train, ev = split_train_eval_cluster_pure(
            docs, labels, eval_fraction=0.5, id_col="doc_id"
        )
        n_train, n_ev = train.count(), ev.count()
        assert n_train + n_ev == 400
        # a 50% id-keyed hash split cannot put everything on one side
        assert 100 < n_ev < 300, (n_train, n_ev)
        # clustered string ids still move together
        labels2 = spark.createDataFrame(
            [(f"doc-{i:04d}", "doc-0000") for i in range(50)],
            "node string, component string",
        )
        _, ev2 = split_train_eval_cluster_pure(
            docs, labels2, eval_fraction=0.5, id_col="doc_id"
        )
        in_cluster = ev2.filter(F.col("doc_id") < "doc-0050").count()
        assert in_cluster in (0, 50)  # never straddles
