"""Property-based tests for the round-7-continuation curation
primitives: random inputs, pure-python mirrors.

The two-phase bounded top-N is the one primitive several graded
queries (q117/q120/q126/q129) stand on — fuzz it hardest: arbitrary
(key, score, id) multisets with heavy ties must match the naive
global ranking for every key, for any salt count.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

row = st.tuples(
    st.sampled_from(["a", "b", "hot"]),       # few keys -> collisions
    st.integers(min_value=0, max_value=9999), # id (deduped below)
    st.integers(min_value=0, max_value=4),    # score: heavy ties
)


class TestBoundedTopNProperties:
    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(row, min_size=1, max_size=60, unique_by=lambda r: r[1]),
        st.sampled_from([1, 3, 16]),
        st.sampled_from([1, 2, 5]),
    )
    def test_matches_naive_ranking(self, spark, rows, n_salts, cap):
        from ursa_major_choir_etl_spark.operators.curation import (
            bounded_topn_per_key,
        )

        df = spark.createDataFrame(
            rows, "k string, id long, score long"
        )
        got = {
            (r["k"], r["id"], r["rank"])
            for r in bounded_topn_per_key(
                df,
                ["k"],
                [F.col("score").desc(), F.col("id").asc()],
                cap=cap,
                salt_on=F.col("id"),
                n_salts=n_salts,
            ).collect()
        }
        expect = set()
        for k in {r[0] for r in rows}:
            members = sorted(
                (r for r in rows if r[0] == k), key=lambda r: (-r[2], r[1])
            )[:cap]
            expect |= {(k, r[1], i + 1) for i, r in enumerate(members)}
        assert got == expect


class TestSoftDedupProperties:
    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=6))
    def test_keep_rule_for_any_cluster_size_mix(self, spark, sizes):
        from ursa_major_choir_etl_spark.operators.curation import (
            soft_dedup_flags,
        )

        rows, did = [], 0
        for ci, n in enumerate(sizes):
            for _ in range(n):
                # Distinct body per cluster index; identical within.
                rows.append((did, f"cluster body {ci} " * 2))
                did += 1
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = soft_dedup_flags(df).collect()
        by_fp: dict[str, list] = {}
        for r in got:
            by_fp.setdefault(r["fingerprint"], []).append(r)
        # Same-size clusters may collide only if sizes list repeats a
        # cluster body — bodies are distinct by ci, so cluster count
        # matches the input mix exactly.
        assert sorted(len(v) for v in by_fp.values()) == sorted(sizes)
        for members in by_fp.values():
            n = members[0]["cluster_size"]
            kept = sorted(m["doc_id"] for m in members if m["kept"])
            assert len(kept) == min(n, n.bit_length())
            assert kept == sorted(m["doc_id"] for m in members)[: n.bit_length()]


class TestThresholdSweepProperties:
    pair = st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=31, max_value=60),
        st.floats(
            min_value=0.0, max_value=1.0,
            allow_nan=False, allow_infinity=False,
        ),
    )

    @settings(max_examples=10, deadline=None)
    @given(st.lists(pair, min_size=0, max_size=25, unique_by=lambda p: (p[0], p[1])))
    def test_counts_match_python(self, spark, pairs):
        from ursa_major_choir_etl_spark.operators.dedup import (
            threshold_sensitivity,
        )

        ts = [0.25, 0.5, 0.75]
        df = spark.createDataFrame(
            pairs, "id_a long, id_b long, jaccard double"
        )
        got = {
            r["threshold"]: (r["n_pairs"], r["n_docs"])
            for r in threshold_sensitivity(df, ts).collect()
        }
        for t in ts:
            sel = [(a, b) for a, b, j in pairs if j >= t]
            if sel:
                docs = {d for p in sel for d in p}
                assert got[t] == (len(sel), len(docs))
            else:
                assert t not in got


class TestCharEntropyProperties:
    word = st.sampled_from(["aa", "ab", "the", "zq", "x"])

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.lists(word, min_size=0, max_size=12).map(" ".join),
                    min_size=1, max_size=6))
    def test_matches_python_mirror(self, spark, texts):
        import re
        from collections import Counter

        from ursa_major_choir_etl_spark.operators.text import (
            char_bigram_entropy,
        )

        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in char_bigram_entropy(df).collect()}
        for did, tx in enumerate(texts):
            norm = re.sub(
                r"\s+", " ", re.sub(r"[^\w\s]", "", tx.lower())
            ).strip()
            if len(norm) < 2:
                assert did not in got
                continue
            grams = [norm[i : i + 2] for i in range(len(norm) - 1)]
            m = len(grams)
            cnt = Counter(grams)
            mean = round(
                sum(k * ((m // k).bit_length() - 1) for k in cnt.values()) / m,
                6,
            )
            r = got[did]
            assert r["n_bigrams"] == m
            assert r["distinct_bigrams"] == len(cnt)
            assert abs(r["mean_bits"] - mean) < 1e-9


class TestLargestRemainderProperties:
    """q230's Hamilton apportionment: for ANY positive token masses the
    integer quotas must (a) sum exactly to the budget, (b) stay within
    1 of the real-valued proportional share (the quota property), and
    (c) never go below the floored share."""

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=1, max_value=10_000),
            min_size=1,
            max_size=12,
        )
    )
    def test_quota_property(self, spark, tmp_path_factory, masses):
        import os

        from ursa_major_choir_etl_spark.plans.queries import (
            q230_largest_remainder_quota,
        )

        d = str(tmp_path_factory.mktemp("lrq"))
        rows = [
            (i, " ".join(["w"] * m), f"s{i:02d}")
            for i, m in enumerate(masses)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet"))
        got = {r["source"]: r["quota"] for r in
               q230_largest_remainder_quota(spark, d).collect()}
        total = sum(masses)
        assert sum(got.values()) == 1000
        for i, m in enumerate(masses):
            exact = 1000 * m / total
            q = got[f"s{i:02d}"]
            assert int(exact) <= q <= int(exact) + 1
