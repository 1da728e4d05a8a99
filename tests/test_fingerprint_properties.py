"""Property-based tests for the rolling-hash fingerprinting and graph
operators: the Spark implementations agree with driver-side pure-Python
mirrors on random corpora, and the winnowing guarantee (shared runs of
w + k - 1 tokens share a fingerprint) holds by construction."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ursa_major_choir_etl_spark.operators import dedup

K, W = 3, 4

token = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
doc = st.lists(token, min_size=K, max_size=30).map(" ".join)


def py_winnow(text: str, k: int = K, w: int = W) -> set[str]:
    """Pure-Python mirror of dedup.winnowing_fingerprints for one doc
    (already-normalized input)."""
    toks = text.split()
    if len(toks) < k:
        return set()
    hashes = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(len(toks) - k + 1)
    ]
    if len(hashes) < w:
        return {min(hashes)}
    return {min(hashes[j : j + w]) for j in range(len(hashes) - w + 1)}


class TestWinnowingProperties:
    @settings(max_examples=15, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8))
    def test_spark_matches_python_mirror(self, spark, texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got: dict[int, set] = {}
        for r in dedup.winnowing_fingerprints(df, k=K, w=W).collect():
            got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
        want = {i: py_winnow(t) for i, t in enumerate(texts) if py_winnow(t)}
        assert got == want

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(token, min_size=W + K - 1, max_size=W + K + 4).map(" ".join),
        st.lists(token, min_size=0, max_size=5).map(" ".join),
        st.lists(token, min_size=0, max_size=5).map(" ".join),
    )
    def test_shared_run_guarantee(self, spark, common, pre, suf):
        # Any shared run of >= w + k - 1 tokens must produce at least
        # one shared fingerprint (the winnowing coverage guarantee) —
        # verified against the pure mirror, no Spark needed for the
        # invariant but exercised through the Spark path.
        a, b = (pre + " " + common).strip(), (common + " " + suf).strip()
        assert py_winnow(a) & py_winnow(b)
        df = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, text string"
        )
        fps = dedup.winnowing_fingerprints(df, k=K, w=W)
        by_doc: dict[int, set] = {1: set(), 2: set()}
        for r in fps.collect():
            by_doc[r["doc_id"]].add(r["fingerprint"])
        assert by_doc[1] & by_doc[2]


class TestPagerankProperties:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.integers(min_value=0, max_value=9),
            ).filter(lambda p: p[0] != p[1]),
            min_size=1,
            max_size=15,
        )
    )
    def test_mass_conserved_and_positive(self, spark, raw_pairs):
        from ursa_major_choir_etl_spark.operators.graph import SCALE, pagerank_integer

        pairs = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in raw_pairs], "id_a long, id_b long"
        ).distinct()
        out = pagerank_integer(pairs, iters=2).collect()
        n_nodes = pairs.select(
            F.explode(F.array("id_a", "id_b")).alias("n")
        ).distinct().count()
        assert len(out) == n_nodes
        assert all(r["pr"] > 0 for r in out)
        total = sum(r["pr"] for r in out)
        # each truncating division loses < 1 unit; bounded by
        # (edges * rounds + nodes) units of 1e-9
        assert 0 <= SCALE - total < 10_000
