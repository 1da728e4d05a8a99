"""Partitioning-invariance sweep: a distributed engine's results
must be a pure function of the DATA, not of how it happens to be
partitioned. Every query here runs twice — shuffle.partitions 32 vs
3 — and must produce identical canonical value hashes. This catches
the whole class of order-dependence bugs (float accumulation order,
first/collect_list without explicit sort, partition-id leakage)
that single-setting oracles can miss when both runs happen to use
the same layout.

The subset is chosen adversarially: every query whose plan contains
an aggregation over doubles, a collect/sort reconstruction, an
iterative loop, or a hash-partitioned selection.
"""

from __future__ import annotations

import pytest

QUERIES_UNDER_TEST = [
    # float aggregations / ratios
    "q01_pricing_summary",
    "q59_stats_aggregates",
    "q115_unigram_surprisal",
    "q121_char_entropy",
    "q133_dataset_card",
    # ordered reconstruction from distributed pieces
    "q47_top_customer_roster",
    "q132_span_corruption",
    # bounded two-phase selections (salted -> exact)
    "q117_domain_quota",
    "q120_soft_dedup",
    "q129_vocab_drift",
    # iterative / model-state loops
    "q90_kmeans_lloyd",
    "q131_pq_recall",
    # candidate-pair pipelines
    "q20_ngram_jaccard",
    "q108_simhash_hamming",
    "q130_threshold_sweep",
    # round-9 additions: histogram-rank machinery (tie-aware ranks
    # must not depend on row order), order-insensitive checksums,
    # struct-max argmax ties, double-distance argmin ties
    "q150_rank_agreement",
    "q153_shard_manifest",
    "q155_join_key_skew_profile",
    "q159_rfm_segments",
    "q162_centroid_confusion",
    "q163_rrf_shortlist",
    # late round-8 additions: sweep-line island numbering must not
    # depend on row order (q181), percentile-boundary broadcasts
    # (q184/q191), iterative peel (q183), double-product floor before
    # sum (q189), window-carried IGNORE NULLS channels (q187)
    "q181_interval_coverage",
    "q183_kcore_families",
    "q184_equidepth_histogram",
    "q187_touch_attribution",
    "q189_order_reconciliation",
    "q191_decile_shift",
]

SF_DIR = "/root/testdata/sf0.001"


def _canon(df) -> list[str]:
    cols = sorted(df.columns)
    rows = [
        tuple(str(r[c]) for c in cols) for r in df.collect()
    ]
    return sorted(",".join(r) for r in rows)


class TestPartitionInvariance:
    @pytest.mark.parametrize("qname", QUERIES_UNDER_TEST)
    def test_result_independent_of_shuffle_partitions(self, spark, qname):
        from ursa_major_choir_etl_spark import caching
        from ursa_major_choir_etl_spark.plans.queries import QUERIES

        q = QUERIES[qname]
        orig = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = _canon(q(spark, SF_DIR))
            caching.release_staged()
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            b = _canon(q(spark, SF_DIR))
            caching.release_staged()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)
            caching.release_staged()
        assert a == b, f"{qname} result depends on shuffle partitioning"
