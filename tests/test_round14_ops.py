"""Round-14 additions: the seq-mode streaming CDC upsert sink and its
value-gated store query (q291), the streaming count-min store (q292),
the hardened drain-to-artifact harness (timeout check + scratch
cleanup, round-13 ADVICE), and the artifact-determinism pin (round-13
VERDICT #6). The driver oracles certify cross-engine equality from
raw inputs; these certify the in-Spark identities that certification
rests on — drained store == one-shot batch computation under ANY
batch split — plus the failure paths the driver can't drive."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestSeqUpsertSink:
    def _drain(self, spark, tmp_path_factory, batches, seq_col="seq"):
        from ursa_major_choir_etl_spark.streaming import jobs

        src = str(tmp_path_factory.mktemp("sequp_src"))
        wh = str(tmp_path_factory.mktemp("sequp_wh"))
        ck = str(tmp_path_factory.mktemp("sequp_ck"))
        schema = "k long, seq long, v string"
        for rows in batches:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            time.sleep(1.1)  # distinct mtimes => deterministic order
        stream = jobs.read_event_stream(
            spark,
            src,
            spark.createDataFrame([], schema).schema,
            max_files_per_trigger=1,
        )
        q = jobs.streaming_upsert_sink(
            stream,
            wh,
            "state",
            key_cols=["k"],
            checkpoint_dir=ck,
            seq_col=seq_col,
        )
        assert q.awaitTermination(180)
        return {
            r["k"]: (r["seq"], r["v"])
            for r in spark.read.parquet(os.path.join(wh, "state")).collect()
        }

    def test_stale_update_cannot_clobber_newer_state(
        self, spark, tmp_path_factory
    ):
        """The CDC log-order contract: a late-arriving update with a
        SMALLER sequence number than the standing row must be
        rejected, not applied — the exact case arrival-order
        semantics gets wrong."""
        got = self._drain(
            spark,
            tmp_path_factory,
            [
                [(1, 5, "newer"), (2, 1, "a")],
                [(1, 3, "stale"), (2, 2, "b"), (3, 1, "insert")],
            ],
        )
        assert got == {1: (5, "newer"), 2: (2, "b"), 3: (1, "insert")}

    def test_in_batch_dedup_keeps_max_seq(self, spark, tmp_path_factory):
        got = self._drain(
            spark,
            tmp_path_factory,
            [[(1, 1, "x"), (1, 9, "max"), (1, 4, "y")]],
        )
        assert got == {1: (9, "max")}

    def _drain_partitioned(
        self, spark, tmp_path_factory, batches
    ):
        """Seq-mode drain with a MUTABLE partition column (region is
        carried data, not key-derived)."""
        from ursa_major_choir_etl_spark.streaming import jobs

        src = str(tmp_path_factory.mktemp("sequp_psrc"))
        wh = str(tmp_path_factory.mktemp("sequp_pwh"))
        ck = str(tmp_path_factory.mktemp("sequp_pck"))
        schema = "k long, seq long, region string, v string"
        for rows in batches:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            time.sleep(1.1)
        stream = jobs.read_event_stream(
            spark,
            src,
            spark.createDataFrame([], schema).schema,
            max_files_per_trigger=1,
        )
        q = jobs.streaming_upsert_sink(
            stream,
            wh,
            "state",
            key_cols=["k"],
            partition_col="region",
            checkpoint_dir=ck,
            seq_col="seq",
        )
        assert q.awaitTermination(180)
        store = spark.read.parquet(os.path.join(wh, "state"))
        return (
            sorted(
                (r["k"], r["seq"], r["region"], r["v"])
                for r in store.collect()
            ),
            os.path.join(wh, "state"),
        )

    def test_partition_move_retires_the_old_row(
        self, spark, tmp_path_factory
    ):
        """A newer update that MOVES a key to another partition must
        leave exactly one row for the key: the delta-derived touched
        set alone would rewrite only the new partition and strand
        the standing row in the old one forever (the latent
        duplicate a round-14 review found); the standing-partition
        extra_touched pass closes it. k=2 pins that an untouched
        sibling row in the vacated partition survives the rewrite."""
        rows, path = self._drain_partitioned(
            spark,
            tmp_path_factory,
            [
                [(1, 5, "A", "old"), (2, 1, "A", "stay")],
                [(1, 9, "B", "moved")],
            ],
        )
        assert rows == [(1, 9, "B", "moved"), (2, 1, "A", "stay")]

    def test_partition_move_that_empties_a_partition_removes_it(
        self, spark, tmp_path_factory
    ):
        rows, path = self._drain_partitioned(
            spark,
            tmp_path_factory,
            [[(1, 5, "A", "old")], [(1, 9, "B", "moved")]],
        )
        assert rows == [(1, 9, "B", "moved")]
        assert not os.path.exists(os.path.join(path, "region=A"))

    def test_stale_partition_move_is_rejected(
        self, spark, tmp_path_factory
    ):
        """A late-arriving STALE update carrying a different
        partition value must lose on seq and leave the standing row
        (and its partition) untouched."""
        rows, path = self._drain_partitioned(
            spark,
            tmp_path_factory,
            [[(1, 9, "B", "newer")], [(1, 5, "A", "stale-move")]],
        )
        assert rows == [(1, 9, "B", "newer")]
        assert not os.path.exists(os.path.join(path, "region=A"))

    def test_split_invariance(self, spark, tmp_path_factory):
        """max-by-seq is commutative and idempotent, so the final
        store must not depend on how the log is split into
        micro-batches — the identity the q291 oracle gate rests on."""
        rows = [
            (k, s, f"v{k}:{s}") for k in range(6) for s in (2, 7, 4)
        ]
        one = self._drain(spark, tmp_path_factory, [rows])
        three = self._drain(
            spark, tmp_path_factory, [rows[:6], rows[6:12], rows[12:]]
        )
        assert one == three == {k: (7, f"v{k}:7") for k in range(6)}


class TestQ291UpsertStore:
    def test_drained_store_equals_batch_lww(self, spark):
        """The drained CDC store must equal one-shot last-write-wins
        over the raw event log (computed in Spark; the driver oracle
        recomputes it in DuckDB)."""
        from pyspark.sql import Window

        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        got = {
            tuple(r)
            for r in QUERIES["q291_streaming_upsert_store"](
                spark, SF
            ).collect()
        }
        w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
        want = {
            tuple(r)
            for r in T(spark, SF, "events")
            .select(
                "user_id",
                "event_id",
                "event_type",
                F.round(F.col("value") * 100, 0)
                .cast("long")
                .alias("value_cents"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .drop("rn")
            .collect()
        }
        assert got == want and got

    def test_one_row_per_user(self, spark):
        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        out = QUERIES["q291_streaming_upsert_store"](spark, SF)
        n_users = (
            T(spark, SF, "events").select("user_id").distinct().count()
        )
        assert out.count() == n_users
        assert out.select("user_id").distinct().count() == n_users


class TestQ292CmsStore:
    def test_merged_store_equals_oneshot_sketch(self, spark):
        """Cell-wise additivity: per-batch grids summed over batch_id
        must reproduce the one-shot sketch cell for cell."""
        from ursa_major_choir_etl_spark.operators.sketches import cm_sketch
        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        got = {
            (r["d"], r["bucket"], r["cnt"])
            for r in QUERIES["q292_streaming_cms_store"](
                spark, SF
            ).collect()
        }
        want = {
            (r["d"], r["bucket"], r["cnt"])
            for r in cm_sketch(
                T(spark, SF, "events").select(
                    F.col("user_id").cast("string").alias("v")
                ),
                "v",
                depth=4,
                width=4096,
            ).collect()
        }
        assert got == want and got

    def test_grid_is_bounded_and_mass_conserves(self, spark):
        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        out = QUERIES["q292_streaming_cms_store"](spark, SF)
        assert out.count() <= 4 * 4096
        n_events = T(spark, SF, "events").count()
        per_row = {
            r["d"]: r["s"]
            for r in out.groupBy("d").agg(F.sum("cnt").alias("s")).collect()
        }
        assert per_row == {d: n_events for d in range(4)}


class TestQ293RollupStore:
    def test_merged_store_equals_batch_rollup(self, spark):
        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        got = {
            tuple(r)
            for r in QUERIES["q293_streaming_rollup_store"](
                spark, SF
            ).collect()
        }
        want = {
            tuple(r)
            for r in T(spark, SF, "events")
            .select(
                "event_type",
                F.date_trunc("day", F.col("ts"))
                .cast("date")
                .cast("string")
                .alias("day"),
                F.round(F.col("value") * 100, 0)
                .cast("long")
                .alias("cents"),
            )
            .groupBy("event_type", "day")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("cents").alias("sum_cents"),
                F.min("cents").alias("min_cents"),
                F.max("cents").alias("max_cents"),
            )
            .collect()
        }
        assert got == want and got


class TestQ294DecayedStore:
    def test_store_report_equals_week_bucketed_batch(self, spark):
        """The store decays WEEK SUMS (integer division of the bucket
        total), not per-event cents — the oracle and this mirror must
        both quantize the same way or integer floor-div diverges."""
        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        got = {
            tuple(r)
            for r in QUERIES["q294_streaming_decayed_store"](
                spark, SF
            ).collect()
        }
        weekly = (
            T(spark, SF, "events")
            .select(
                "event_type",
                F.expr("unix_micros(ts) DIV 604800000000").alias("w"),
                F.round(F.col("value") * 100, 0)
                .cast("long")
                .alias("cents"),
            )
            .groupBy("event_type", "w")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("s"),
            )
        )
        aw = weekly.agg(F.max("w")).first()[0]
        want = {
            tuple(r)
            for r in weekly.withColumn(
                "d",
                F.expr(
                    f"s DIV shiftleft(CAST(1 AS BIGINT),"
                    f" least(CAST({aw} - w AS INT), 40))"
                ),
            )
            .groupBy("event_type")
            .agg(
                F.sum("n").alias("n_events"),
                F.sum("s").alias("raw_cents"),
                F.sum("d").alias("decayed_cents"),
            )
            .withColumn(
                "retention_ppm",
                F.expr(
                    "CASE WHEN raw_cents > 0 THEN CAST("
                    " CAST(decayed_cents AS DECIMAL(38,0)) * 1000000"
                    " DIV raw_cents AS BIGINT) END"
                ),
            )
            .collect()
        }
        assert got == want and got


class TestQ295FuzzyProbeStore:
    def test_drained_verdicts_equal_oneshot_probe(self, spark):
        """Per-doc verdicts depend only on (doc, corpus), so the union
        of per-batch probe outputs must equal the one-shot batch probe
        — the no-silent-divergence contract with q138."""
        from ursa_major_choir_etl_spark.operators.dedup import (
            incremental_jaccard_probe,
        )
        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        got = {
            tuple(r)
            for r in QUERIES["q295_streaming_fuzzy_probe_store"](
                spark, SF
            ).collect()
        }
        docs = T(spark, SF, "documents")
        want = {
            tuple(r)
            for r in incremental_jaccard_probe(
                docs.filter(F.col("doc_id") % 10 == 7),
                docs.filter(F.col("doc_id") % 10 != 7),
                n=3,
                threshold=0.5,
                hot_shingle_cap=100,
            )
            .select("new_id", "corpus_id", "jaccard")
            .collect()
        }
        assert got == want and got


class TestQ296CardStore:
    def test_exact_metrics_equal_oneshot_card_row(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            card_batch_row,
        )
        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        got = QUERIES["q296_streaming_card_store"](spark, SF).first()
        want = card_batch_row(T(spark, SF, "documents")).first()
        for c in ("n_docs", "n_tokens", "n_en", "q_ppm_sum", "n_pii"):
            assert got[c] == want[c], c
        assert got["n_docs"] > 0


class TestQ297HllStore:
    def test_drained_registers_equal_oneshot_build(self, spark):
        """MAX-merge across generations must reproduce the one-shot
        register build byte for byte."""
        from ursa_major_choir_etl_spark.operators import text as text_ops
        from ursa_major_choir_etl_spark.operators.sketches import (
            portable_hll_registers,
        )
        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        got = {
            (r["grp"], r["bkt"], r["r"])
            for r in QUERIES["q297_streaming_hll_store"](
                spark, SF
            ).collect()
        }
        want = {
            (r["_g"], r["_bkt"], r["_r"])
            for r in portable_hll_registers(
                T(spark, SF, "documents").select(
                    "source",
                    F.explode(text_ops.tokens(F.col("text"))).alias(
                        "token"
                    ),
                ),
                "source",
                "token",
            ).collect()
        }
        assert got == want and got
        assert all(1 <= r <= 57 for (_, _, r) in got)


class _StuckQuery:
    """A streaming query whose availableNow drain never finishes."""

    def __init__(self) -> None:
        self.stopped = False

    def awaitTermination(self, timeout=None) -> bool:  # noqa: N802
        return False

    def stop(self) -> None:
        self.stopped = True


class TestDrainedStoreHarness:
    def test_timed_out_drain_raises_and_publishes_nothing(
        self, spark, tmp_path, monkeypatch
    ):
        """Round-13 ADVICE: a drain still running at the deadline must
        surface as a build error — materialize_once must NOT publish
        a partially-drained store under a current-generation key."""
        from ursa_major_choir_etl_spark import artifacts
        from ursa_major_choir_etl_spark.plans import queries as Q

        monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path))
        stuck = _StuckQuery()
        with pytest.raises(RuntimeError, match="partial store"):
            Q._drained_store_artifact(
                spark,
                "t14_timeout_store",
                SF,
                1,
                [os.path.join(SF, "events.parquet")],
                lambda: Q.T(spark, SF, "events").select("event_id"),
                "event_id bigint",
                lambda stream, wh, ckpt: stuck,
                lambda wh: spark.read.parquet(wh),
            )
        assert stuck.stopped
        assert not [
            e for e in os.listdir(tmp_path) if "t14_timeout_store" in e
        ]
        # the failed build's replay scratch is cleaned up too
        import tempfile

        assert not [
            e
            for e in os.listdir(tempfile.gettempdir())
            if e.startswith("t14_timeout_store_drain_")
        ]

    def test_successful_drain_cleans_scratch(self, spark):
        """The ten store artifacts exist by now (session-built);
        their replay scratch (source copy, warehouse, checkpoint)
        must not survive the build."""
        import tempfile

        leftovers = [
            e
            for e in os.listdir(tempfile.gettempdir())
            for p in (
                "presence_store_drain_",
                "cc_store_drain_",
                "qsketch_store_drain_",
                "upsert_store_drain_",
                "cms_store_drain_",
                "rollup_store_drain_",
                "decayed_store_drain_",
                "fuzzy_probe_store_drain_",
                "card_store_drain_",
                "hll_store_drain_",
            )
            if e.startswith(p)
        ]
        assert leftovers == []


class TestArtifactDeterminism:
    def test_cc_labels_rebuild_matches_committed_generation(
        self, spark, tmp_path, monkeypatch
    ):
        """Round-13 VERDICT #6: BENCH_NOTES measured that a fresh-
        warehouse rebuild oracle-matches, but only manually. Pin it:
        rebuild cc_labels (and transitively its jaccard-pair input)
        from scratch into a throwaway warehouse and assert row-for-row
        equality with the committed generation."""
        from ursa_major_choir_etl_spark.plans.queries import cc_labels_table

        committed = {
            (r["node"], r["component"])
            for r in cc_labels_table(spark, SF).collect()
        }
        # materialize_once's process-local verified/schema caches are
        # keyed by (storage root, key), so pointing the root at an
        # empty directory forces a genuine from-scratch rebuild —
        # including the jaccard-pair input artifact — with no cache
        # surgery.
        monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path))
        rebuilt = {
            (r["node"], r["component"])
            for r in cc_labels_table(spark, SF).collect()
        }
        assert os.listdir(tmp_path)  # the rebuild actually ran here
        assert rebuilt == committed and rebuilt

    def test_failed_build_leaves_no_tmp_and_publishes_nothing(
        self, spark, tmp_path, monkeypatch
    ):
        """A builder that dies mid-build must not leave its
        half-written .tmp-<pid> directory behind (same-key tmps are
        deliberately excluded from generation pruning, so an orphan
        would linger forever) and must not publish a generation —
        the next call rebuilds for real."""
        from ursa_major_choir_etl_spark import artifacts

        monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path))

        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] == 1:
                # Die AFTER the write started resolving the plan: a
                # frame whose evaluation raises, so parquet may have
                # created the tmp dir before the job fails.
                return spark.range(1).select(
                    F.assert_true(F.col("id") < 0).alias("boom")
                )
            return spark.range(3).select(F.col("id").alias("v"))

        with pytest.raises(Exception):
            artifacts.materialize_once(
                spark, "flaky_probe", SF, 1, [], flaky
            )
        assert not [
            e for e in os.listdir(tmp_path) if ".tmp-" in e
        ], "failed build left a tmp dir behind"
        assert not [
            e for e in os.listdir(tmp_path) if e.startswith("flaky_probe")
        ], "failed build published a generation"
        out = artifacts.materialize_once(
            spark, "flaky_probe", SF, 1, [], flaky
        )
        assert calls["n"] == 2 and out.count() == 3


class TestRound14Registry:
    def test_new_queries_lead_the_window_with_oracles(self):
        from ursa_major_choir_etl_spark.plans.queries import (
            ARTIFACT_BUILDERS,
            ORACLES,
            QUERIES,
        )

        # Graded in round 14 (CORRECTNESS_r14.json) — the round-15
        # rotation moves the streaming-store band OUT of the head.
        window = list(QUERIES)[:50]
        for k in (
            "q291_streaming_upsert_store",
            "q292_streaming_cms_store",
            "q293_streaming_rollup_store",
            "q294_streaming_decayed_store",
            "q295_streaming_fuzzy_probe_store",
            "q296_streaming_card_store",
            "q297_streaming_hll_store",
        ):
            assert k not in window
            assert ORACLES[k]  # full value oracle, not rows-only
        for a in (
            "upsert_store",
            "cms_store",
            "rollup_store",
            "decayed_store",
            "fuzzy_probe_store",
            "card_store",
            "hll_store",
        ):
            assert a in ARTIFACT_BUILDERS


class TestSplitOps:
    """q298/q299: deterministic corpus splitting. The driver oracle
    certifies cross-engine value equality; these certify the split
    SEMANTICS — partition/coverage invariants, family coherence, and
    the non-degeneracy of the leak metric's preconditions at the
    grading scales."""

    def test_q298_splits_partition_the_corpus(self, spark):
        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        rows = QUERIES["q298_hash_split_manifest"](spark, SF).collect()
        total = T(spark, SF, "documents").count()
        assert sum(r["docs"] for r in rows) == total
        assert {r["split"] for r in rows} <= {"train", "val", "test"}
        # per source the ppm shares must sum to <= 1e6 (floor DIV) and
        # miss it by at most (#splits - 1)
        by_src = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r["share_ppm"])
        for src, shares in by_src.items():
            assert 1_000_000 - len(shares) < sum(shares) <= 1_000_000, src
        # train must dominate every source that has all three splits
        for src in by_src:
            tr = [r for r in rows if r["source"] == src]
            train = next(
                (r["docs"] for r in tr if r["split"] == "train"), 0
            )
            assert train >= max(r["docs"] for r in tr), src

    def test_q298_is_deterministic_and_stable_under_growth(self, spark):
        """The whole point of a hash split: re-running never
        reshuffles, and restricting the corpus to a subset leaves
        every surviving doc's assignment unchanged."""
        from ursa_major_choir_etl_spark.operators.dedup import (
            bloom_position_sql,
        )
        from ursa_major_choir_etl_spark.plans.queries import (
            T,
            _split_expr,
        )

        docs = T(spark, SF, "documents")
        u = F.expr(bloom_position_sql(11, "CAST(doc_id AS STRING)", 5))
        full = {
            r["doc_id"]: r["s"]
            for r in docs.select(
                "doc_id", _split_expr(u).alias("s")
            ).collect()
        }
        sub = {
            r["doc_id"]: r["s"]
            for r in docs.filter(F.col("doc_id") % 3 == 0)
            .select("doc_id", _split_expr(u).alias("s"))
            .collect()
        }
        assert sub and all(full[k] == v for k, v in sub.items())

    def test_q299_families_are_split_coherent(self, spark):
        from ursa_major_choir_etl_spark.plans.queries import QUERIES, T

        rows = QUERIES["q299_leakage_free_split"](spark, SF).collect()
        total = T(spark, SF, "documents").count()
        assert sum(r["docs"] for r in rows) == total
        # multi-doc families exist at every test scale (q250's
        # non-degeneracy argument) — the op has something to protect
        assert sum(r["dup_docs"] for r in rows) > 0
        # every family contributes exactly one representative
        assert all(r["families"] >= 1 for r in rows)
        assert all(r["docs"] >= r["families"] for r in rows)
        # representatives agree with themselves by construction, so
        # the naive leak can only come from non-representative docs
        assert all(
            r["naive_leaked_docs"] <= r["dup_docs"] for r in rows
        )
