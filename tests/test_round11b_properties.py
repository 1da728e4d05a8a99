"""Property tests (hypothesis) for the round-11 operator batch:
isotonic minimax calibration, systematic PPS sampling, and
Nelson–Aalen survival. Fixed-example tests in test_round11b_ops.py
check exact reference values; these check the INVARIANTS the
operators promise over randomized inputs — monotonicity, pick-count
conservation, telescoping at-risk counts — with Spark round-trips
kept cheap (small generated frames, few examples).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


bin_spec = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),  # n per bin
        st.integers(min_value=0, max_value=12),  # events (clamped to n)
    ),
    min_size=2,
    max_size=6,
)


class TestIsotonicProperties:
    @settings(max_examples=10, deadline=None)
    @given(bin_spec)
    def test_fit_is_monotone_and_bounded(self, spark, spec):
        from ursa_major_choir_etl_spark.operators.quality import (
            isotonic_calibration,
        )

        rows = []
        for b, (n, x) in enumerate(spec):
            x = min(x, n)
            rows += [(b, 1)] * x + [(b, 0)] * (n - x)
        df = spark.createDataFrame(rows, "bin int, y int")
        got = sorted(
            isotonic_calibration(df, "bin", "y", len(spec)).collect(),
            key=lambda r: r["bin"],
        )
        iso = [r["iso_ppm"] for r in got]
        raw = [r["raw_ppm"] for r in got]
        assert iso == sorted(iso)  # non-decreasing fit
        assert min(raw) <= min(iso) and max(iso) <= max(raw)  # bounded
        # pool-preserving where already monotone: identical input order
        if raw == sorted(raw) and len(set(raw)) == len(raw):
            assert iso == raw


class TestSystematicPpsProperties:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=1, max_value=500),
            min_size=5,
            max_size=40,
        ),
        st.integers(min_value=1, max_value=8),
    )
    def test_pick_count_conserved_and_bounded(self, spark, weights, k):
        from ursa_major_choir_etl_spark.operators.sampling import (
            systematic_pps_sample,
        )

        items = list(enumerate(weights))
        df = spark.createDataFrame(items, "doc_id int, w int")
        got = systematic_pps_sample(df, "doc_id", "w", k).collect()
        total = sum(r["n_picks"] for r in got)
        # exactly k in the documented regime, k or k+1 in the corner
        w_total = sum(weights)
        step = max(w_total // k, 1)
        if step // 2 >= w_total % k:
            assert total == k
        else:
            assert total in (k, k + 1)
        # an item can never be picked more than ceil(w/step)+1 times
        for r in got:
            assert r["n_picks"] <= r["w"] // step + 1

    @settings(max_examples=6, deadline=None)
    @given(st.integers(min_value=2, max_value=30))
    def test_uniform_weights_spread_evenly(self, spark, n):
        """Equal weights: no item is picked twice while others are
        skipped disproportionately — picks differ by at most 1."""
        from ursa_major_choir_etl_spark.operators.sampling import (
            systematic_pps_sample,
        )

        k = min(n, 7)
        df = spark.createDataFrame(
            [(i, 10) for i in range(n)], "doc_id int, w int"
        )
        got = systematic_pps_sample(df, "doc_id", "w", k).collect()
        picks = [r["n_picks"] for r in got]
        assert max(picks) - min(picks) <= 1


class TestNelsonAalenProperties:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=20),  # duration
                st.integers(min_value=0, max_value=1),   # event flag
            ),
            min_size=1,
            max_size=40,
        )
    )
    def test_risk_telescopes_and_hazard_accumulates(self, spark, subjects):
        from ursa_major_choir_etl_spark.operators.survival import (
            nelson_aalen_risk_table,
        )

        df = spark.createDataFrame(subjects, "dur int, ev int")
        rows = sorted(
            nelson_aalen_risk_table(df, "dur", "ev").collect(),
            key=lambda r: r["duration"],
        )
        # at-risk at the first duration is everyone; it telescopes by
        # exactly the events+censorings of the PREVIOUS duration
        assert rows[0]["n_risk"] == len(subjects)
        for prev, cur in zip(rows, rows[1:]):
            assert cur["n_risk"] == prev["n_risk"] - (
                prev["n_events"] + prev["n_censored"]
            )
        # cumulative hazard is the running sum of the per-time terms
        acc = 0
        for r in rows:
            acc += r["hazard_ppm"]
            assert r["cum_hazard_ppm"] == acc
        # conservation: every subject appears exactly once
        assert sum(r["n_events"] + r["n_censored"] for r in rows) == len(
            subjects
        )
