"""Round-11 second-batch operator tests: Nelson–Aalen survival,
empirical-Bayes rate shrinkage, MAP@k retrieval grading, isotonic
(minimax PAVA) calibration, presence-bitmap algebra, systematic PPS
sampling, and Theil–Sen robust trend.

Each test checks the MATH against an independent pure-Python
computation (never another SQL engine — the oracle harness's job),
plus each operator's documented degenerate behaviors: censoring-only
durations, zero-variance priors, monotone-fit pooling, the bit-63
domain cap, the exactly-k pick count, and negative-slope truncation
parity.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — Spark DIV / DuckDB //
    semantics, NOT Python's floor //."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


class TestNelsonAalen:
    def _reference(self, subjects):
        hist = defaultdict(lambda: [0, 0])  # t -> [events, censored]
        for dur, ev in subjects:
            hist[dur][0 if ev else 1] += 1
        n = len(subjects)
        out = {}
        cum_total = 0
        cum_h = 0
        for t in sorted(hist):
            d, c = hist[t]
            n_risk = n - cum_total
            h = d * 1_000_000 // n_risk
            cum_h += h
            out[t] = (n_risk, d, c, h, cum_h)
            cum_total += d + c
        return out

    def test_matches_pure_python(self, spark):
        from ursa_major_choir_etl_spark.operators.survival import (
            nelson_aalen_risk_table,
        )

        subjects = [
            (0, 1), (0, 0), (1, 1), (1, 1), (1, 0),
            (3, 0), (3, 1), (5, 0), (5, 0), (9, 1),
        ]
        df = spark.createDataFrame(subjects, "dur int, ev int")
        got = {
            r["duration"]: r
            for r in nelson_aalen_risk_table(df, "dur", "ev").collect()
        }
        want = self._reference(subjects)
        assert set(got) == set(want)
        for t, (n_risk, d, c, h, cum_h) in want.items():
            r = got[t]
            assert (
                r["n_risk"],
                r["n_events"],
                r["n_censored"],
                r["hazard_ppm"],
                r["cum_hazard_ppm"],
            ) == (n_risk, d, c, h, cum_h), t

    def test_all_censored_has_zero_hazard(self, spark):
        from ursa_major_choir_etl_spark.operators.survival import (
            nelson_aalen_risk_table,
        )

        df = spark.createDataFrame(
            [(2, 0), (4, 0), (4, 0)], "dur int, ev int"
        )
        rows = nelson_aalen_risk_table(df, "dur", "ev").collect()
        assert all(r["hazard_ppm"] == 0 for r in rows)
        assert all(r["cum_hazard_ppm"] == 0 for r in rows)
        # at-risk still decrements through censorings
        assert [r["n_risk"] for r in sorted(rows, key=lambda r: r["duration"])] == [3, 2]

    def test_first_second_event_tiebreak(self, spark):
        from ursa_major_choir_etl_spark.operators.survival import (
            first_second_event,
        )

        df = spark.createDataFrame(
            [(1, "2024-01-05", 7), (1, "2024-01-05", 3), (1, "2024-01-09", 1),
             (2, "2024-02-01", 9)],
            "k int, d string, tb int",
        ).withColumn("d", F.to_date("d"))
        got = {r["k"]: r for r in first_second_event(df, "k", "d", "tb").collect()}
        assert str(got[1]["first_ts"]) == "2024-01-05"
        assert str(got[1]["second_ts"]) == "2024-01-05"  # same-day dup is the 2nd
        assert got[2]["second_ts"] is None


class TestEbShrinkage:
    def _reference(self, groups):
        raw = {g: x * 1_000_000 // n for g, (n, x) in groups.items()}
        G = len(groups)
        m = sum(raw.values()) // G
        v = sum((p - m) ** 2 for p in raw.values()) // G
        out = {}
        ku = None
        if v > 0:
            ku = m * (1_000_000 - m) * 1_000_000 // v - 1_000_000
        for g, (n, x) in groups.items():
            if v == 0:
                s = m
            elif ku <= 0:
                s = raw[g]
            else:
                s = (x * 1_000_000 + m * ku // 1_000_000) * 1_000_000 // (
                    n * 1_000_000 + ku
                )
            out[g] = (raw[g], s)
        return out

    def test_matches_pure_python(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            eb_shrunk_rates,
        )

        groups = {"a": (400, 200), "b": (3, 2), "c": (50, 10), "d": (1000, 100)}
        rows = []
        for g, (n, x) in groups.items():
            rows += [(g, 1)] * x + [(g, 0)] * (n - x)
        df = spark.createDataFrame(rows, "g string, ev int")
        got = {
            r["g"]: r for r in eb_shrunk_rates(df, "g", "ev").collect()
        }
        want = self._reference(groups)
        for g, (raw, s) in want.items():
            assert got[g]["raw_ppm"] == raw
            assert got[g]["shrunk_ppm"] == s
        # the small noisy group moves toward the mean more than the big one
        m = sum(r for r, _ in want.values()) // len(want)
        assert abs(got["b"]["shrunk_ppm"] - m) < abs(got["b"]["raw_ppm"] - m)

    def test_zero_variance_shrinks_to_mean(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            eb_shrunk_rates,
        )

        rows = [("a", 1), ("a", 0), ("b", 1), ("b", 0)]
        df = spark.createDataFrame(rows, "g string, ev int")
        got = eb_shrunk_rates(df, "g", "ev").collect()
        assert all(r["shrunk_ppm"] == 500_000 for r in got)


class TestMapAtK:
    def test_matches_pure_python(self, spark):
        from ursa_major_choir_etl_spark.operators.similarity import (
            map_at_k_report,
        )

        # shortlist: q1 hits at ranks 1,3; q2 hits at rank 2; q3 none
        short = spark.createDataFrame(
            [
                (1, 10, 1), (1, 11, 2), (1, 12, 3),
                (2, 13, 1), (2, 10, 2),
                (3, 14, 1),
            ],
            "query_id int, neighbor_id int, rank int",
        )
        # labels: queries 1,2,3 -> A,A,B; neighbors
        ql = spark.createDataFrame(
            [(1, "A"), (2, "A"), (3, "B")], "query_id int, label string"
        )
        nl = spark.createDataFrame(
            [(10, "A"), (11, "B"), (12, "A"), (13, "B"), (14, "A"),
             (1, "A"), (2, "A"), (3, "B")],
            "neighbor_id int, label string",
        )
        got = {
            r["label"]: r
            for r in map_at_k_report(short, ql, nl, k=10).collect()
        }
        # label A corpus count = 5 (10,12,14,1,2) -> R_total=4, R10=4
        # q1: rel ranks 1 (relcnt 1), 3 (relcnt 2): ap_u = 1e6//1 + 2e6//3
        ap1 = (1_000_000 // 1 + 2_000_000 // 3) // 4
        # q2: neighbor 13=B not rel, 10=A rel at rank 2, relcnt 1
        ap2 = (1_000_000 // 2) // 4
        assert got["A"]["map_ppm"] == (ap1 + ap2) // 2
        assert got["A"]["n_queries"] == 2
        assert got["A"]["n_relevant_total"] == 4
        # label B corpus count = 3 -> R=2; q3's only neighbor 14 is A: ap 0
        assert got["B"]["map_ppm"] == 0

    def test_empty_shortlist_query_still_counts(self, spark):
        from ursa_major_choir_etl_spark.operators.similarity import (
            map_at_k_report,
        )

        short = spark.createDataFrame(
            [(1, 10, 1)], "query_id int, neighbor_id int, rank int"
        )
        ql = spark.createDataFrame(
            [(1, "A"), (2, "A")], "query_id int, label string"
        )
        nl = spark.createDataFrame(
            [(10, "A"), (1, "A"), (2, "A")], "neighbor_id int, label string"
        )
        r = map_at_k_report(short, ql, nl, k=10).collect()[0]
        assert r["n_queries"] == 2  # query 2 scored 0, not dropped


class TestIsotonicCalibration:
    @staticmethod
    def _pava_minimax(bins, increasing=True):
        """bins: ordered list of (n, x); returns iso floor-ppm list."""
        idx = list(range(len(bins)))
        if not increasing:
            bins = bins[::-1]
        out = []
        L = len(bins)
        for i in range(L):
            best = None
            for a in range(0, i + 1):
                mn = None
                for b in range(i, L):
                    n = sum(bins[t][0] for t in range(a, b + 1))
                    x = sum(bins[t][1] for t in range(a, b + 1))
                    r = x * 1_000_000 // n
                    mn = r if mn is None else min(mn, r)
                best = mn if best is None else max(best, mn)
            out.append(best)
        if not increasing:
            out = out[::-1]
        return out

    def test_matches_pure_python_and_is_monotone(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            isotonic_calibration,
        )

        # per-bin (n, x) with violations to pool
        spec = [(10, 1), (10, 5), (10, 3), (10, 3), (10, 9), (10, 7)]
        rows = []
        for b, (n, x) in enumerate(spec):
            rows += [(b, 1)] * x + [(b, 0)] * (n - x)
        df = spark.createDataFrame(rows, "bin int, y int")
        got = {
            r["bin"]: r
            for r in isotonic_calibration(df, "bin", "y", 6).collect()
        }
        want = self._pava_minimax(spec, increasing=True)
        for b in range(6):
            assert got[b]["iso_ppm"] == want[b], b
        iso = [got[b]["iso_ppm"] for b in range(6)]
        assert iso == sorted(iso)  # monotone non-decreasing

    def test_antitonic_reflection(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            isotonic_calibration,
        )

        spec = [(10, 9), (10, 5), (10, 7), (10, 1)]
        rows = []
        for b, (n, x) in enumerate(spec):
            rows += [(b, 1)] * x + [(b, 0)] * (n - x)
        df = spark.createDataFrame(rows, "bin int, y int")
        got = {
            r["bin"]: r["iso_ppm"]
            for r in isotonic_calibration(
                df, "bin", "y", 4, increasing=False
            ).collect()
        }
        want = self._pava_minimax(spec, increasing=False)
        assert [got[b] for b in range(4)] == want
        iso = [got[b] for b in range(4)]
        assert iso == sorted(iso, reverse=True)

    def test_already_monotone_is_identity(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            isotonic_calibration,
        )

        spec = [(10, 1), (10, 3), (10, 7)]
        rows = []
        for b, (n, x) in enumerate(spec):
            rows += [(b, 1)] * x + [(b, 0)] * (n - x)
        df = spark.createDataFrame(rows, "bin int, y int")
        got = {
            r["bin"]: r
            for r in isotonic_calibration(df, "bin", "y", 3).collect()
        }
        for b, (n, x) in enumerate(spec):
            assert got[b]["iso_ppm"] == got[b]["raw_ppm"] == x * 100_000


class TestPresenceBitmaps:
    def test_pack_and_popcount(self, spark):
        from ursa_major_choir_etl_spark.operators.bitmaps import (
            presence_bitmaps,
        )

        rows = [(1, "view", 0), (1, "view", 5), (1, "view", 5),
                (1, "buy", 62), (2, "view", 63), (2, "view", -1)]
        df = spark.createDataFrame(rows, "u int, t string, p int")
        got = {
            (r["u"], r["t"]): r
            for r in presence_bitmaps(df, ["u", "t"], "p").collect()
        }
        assert got[(1, "view")]["bitmap"] == (1 << 0) | (1 << 5)
        assert got[(1, "view")]["n_active"] == 2
        assert got[(1, "buy")]["bitmap"] == 1 << 62
        # out-of-domain positions (63, -1) are excluded entirely
        assert (2, "view") not in got

    def test_pair_overlap_matches_sets(self, spark):
        from ursa_major_choir_etl_spark.operators.bitmaps import (
            bitmap_pair_overlap,
            presence_bitmaps,
        )

        days = {
            (1, "a"): {0, 1, 2}, (1, "b"): {2, 3},
            (2, "a"): {5}, (2, "b"): {5},
            (3, "a"): {7},  # no b side: excluded from the pair
        }
        rows = [(u, t, d) for (u, t), ds in days.items() for d in ds]
        df = spark.createDataFrame(rows, "u int, t string, p int")
        bm = presence_bitmaps(df, ["u", "t"], "p")
        got = bitmap_pair_overlap(bm, "u", "t").collect()
        assert len(got) == 1
        r = got[0]
        assert (r["side_a"], r["side_b"]) == ("a", "b")
        assert r["n_entities_both"] == 2
        # user1: inter {2} union {0,1,2,3}; user2: inter {5} union {5}
        assert r["sum_inter"] == 2 and r["sum_union"] == 5
        assert r["micro_jaccard_ppm"] == 2 * 1_000_000 // 5
        assert r["macro_jaccard_ppm"] == (1_000_000 // 4 + 1_000_000) // 2


class TestSystematicPps:
    @staticmethod
    def _reference(items, k):
        W = sum(w for _, w in items)
        step = max(W // k, 1)
        off = step // 2
        out = {}
        c = 0
        for i, w in sorted(items):
            lo, hi = c, c + w
            picks = (hi + step - 1 - off) // step - (lo + step - 1 - off) // step
            if picks > 0:
                out[i] = (w, hi, picks)
            c = hi
        return out

    def test_matches_pure_python_and_sums_to_k(self, spark):
        from ursa_major_choir_etl_spark.operators.sampling import (
            systematic_pps_sample,
        )

        items = [(i, (i * 37) % 100 + 1) for i in range(500)]
        df = spark.createDataFrame(items, "doc_id int, w int")
        k = 20
        got = {
            r["doc_id"]: r
            for r in systematic_pps_sample(df, "doc_id", "w", k).collect()
        }
        want = self._reference(items, k)
        assert set(got) == set(want)
        for i, (w, cw, p) in want.items():
            assert (got[i]["w"], got[i]["cum_weight"], got[i]["n_picks"]) == (
                w, cw, p,
            )
        assert sum(r["n_picks"] for r in got.values()) == k

    def test_heavy_item_multiplicity(self, spark):
        from ursa_major_choir_etl_spark.operators.sampling import (
            systematic_pps_sample,
        )

        items = [(1, 1000), (2, 10), (3, 10)]
        df = spark.createDataFrame(items, "doc_id int, w int")
        got = {
            r["doc_id"]: r["n_picks"]
            for r in systematic_pps_sample(df, "doc_id", "w", 10).collect()
        }
        assert got[1] >= 9  # the 98%-weight item is picked ~k times
        assert sum(got.values()) == 10

    def test_partition_layout_independent(self, spark):
        from ursa_major_choir_etl_spark.operators.sampling import (
            systematic_pps_sample,
        )

        items = [(i, (i * 13) % 50 + 1) for i in range(300)]
        a = spark.createDataFrame(items, "doc_id int, w int").repartition(1)
        b = spark.createDataFrame(items, "doc_id int, w int").repartition(17)
        ra = sorted(
            (r["doc_id"], r["n_picks"])
            for r in systematic_pps_sample(a, "doc_id", "w", 15).collect()
        )
        rb = sorted(
            (r["doc_id"], r["n_picks"])
            for r in systematic_pps_sample(b, "doc_id", "w", 15).collect()
        )
        assert ra == rb


class TestTheilSen:
    @staticmethod
    def _reference(pts, scale=1000):
        slopes = []
        pts = sorted(pts)
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dy = pts[j][1] - pts[i][1]
                dx = pts[j][0] - pts[i][0]
                slopes.append(_trunc_div(dy * scale, dx))
        slopes.sort()
        return slopes[(len(slopes) + 1) // 2 - 1], len(slopes)

    def test_matches_pure_python_with_negative_slopes(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            theil_sen_trend,
        )

        pts = [(0, 100), (1, 90), (2, 85), (3, 70), (5, 40), (8, 1000)]
        df = spark.createDataFrame(
            [("g",) + p for p in pts], "g string, x int, y long"
        )
        r = theil_sen_trend(df, "g", "x", "y").collect()[0]
        want_slope, want_pairs = self._reference(pts)
        assert r["slope_scaled"] == want_slope
        assert r["n_pairs"] == want_pairs
        assert r["n_points"] == len(pts)
        # robust: the 1000-outlier does not flip the trend positive
        assert r["slope_scaled"] < 0

    def test_negative_division_truncates_like_engines(self, spark):
        """-7 DIV 2 must be -3 (truncation) in Spark, matching the
        DuckDB // behavior the oracle relies on."""
        assert spark.sql("SELECT -7 DIV 2 AS q").collect()[0]["q"] == -3

    def test_two_groups_independent(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            theil_sen_trend,
        )

        rows = [("up", x, 10 * x) for x in range(5)] + [
            ("down", x, -3 * x) for x in range(4)
        ]
        df = spark.createDataFrame(rows, "g string, x int, y long")
        got = {r["g"]: r for r in theil_sen_trend(df, "g", "x", "y").collect()}
        assert got["up"]["slope_scaled"] == 10_000
        assert got["down"]["slope_scaled"] == -3_000


class TestHoltLinear:
    @staticmethod
    def _reference(series, a=2, b=1):
        def tdiv(x, y):
            q = abs(x) // abs(y)
            return q if (x >= 0) == (y >= 0) else -q

        out = []
        l = series[0][1]
        if len(series) == 1:
            return [(series[0][0], series[0][1], l, 0, None, None)]
        t = series[1][1] - series[0][1]
        out.append((series[0][0], series[0][1], l, t, None, None))
        for x, y in series[1:]:
            f = l + t
            l_new = tdiv(a * y + (10 - a) * f, 10)
            t = tdiv(b * (l_new - l) + (10 - b) * t, 10)
            l = l_new
            out.append((x, y, l, t, f, y - f))
        return out

    def test_matches_pure_python_with_negative_trend(self, spark):
        from ursa_major_choir_etl_spark.operators.forecast import (
            holt_linear_smoothing,
        )

        series = [(0, 1000), (1, 900), (2, 700), (3, 650), (4, 800)]
        df = spark.createDataFrame(
            [("g", x, y) for x, y in series], "g string, x int, y long"
        )
        got = sorted(
            holt_linear_smoothing(spark, df, "g", "x", "y").collect(),
            key=lambda r: r["x"],
        )
        want = self._reference(series)
        for r, (x, y, l, t, f, resid) in zip(got, want):
            assert (r["x"], r["y"], r["level"], r["trend"]) == (x, y, l, t)
            assert r["fitted"] == f and r["resid"] == resid
        # declining series drives a negative trend at some step
        assert any(r["trend"] < 0 for r in got)

    def test_single_point_group(self, spark):
        from ursa_major_choir_etl_spark.operators.forecast import (
            holt_linear_smoothing,
        )

        df = spark.createDataFrame(
            [("a", 3, 42), ("b", 1, 10), ("b", 2, 30)],
            "g string, x int, y long",
        )
        got = {
            (r["g"], r["x"]): r
            for r in holt_linear_smoothing(spark, df, "g", "x", "y").collect()
        }
        assert got[("a", 3)]["level"] == 42
        assert got[("a", 3)]["trend"] == 0
        assert got[("a", 3)]["fitted"] is None
        # two-point group: second fitted is exactly y (classic init)
        assert got[("b", 2)]["fitted"] == 30 and got[("b", 2)]["resid"] == 0


class TestKendallTauB:
    @staticmethod
    def _reference(pairs):
        n = len(pairs)
        c = d = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = pairs[j][0] - pairs[i][0]
                dy = pairs[j][1] - pairs[i][1]
                if dx == 0 and dy == 0:
                    tx += 1
                    ty += 1
                elif dx == 0:
                    tx += 1
                elif dy == 0:
                    ty += 1
                elif (dx > 0) == (dy > 0):
                    c += 1
                else:
                    d += 1
        import math

        n0 = n * (n - 1) // 2
        denom = math.isqrt((n0 - tx) * (n0 - ty) * 4)
        tau_ppm = None
        if denom > 0:
            a, b = (c - d) * 2_000_000, denom
            q = abs(a) // abs(b)
            tau_ppm = q if (a >= 0) == (b >= 0) else -q
        return c, d, tau_ppm

    def test_matches_pure_python_with_ties(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            kendall_tau_b,
        )

        pairs = [(0, 0), (0, 1), (1, 1), (1, 0), (2, 2), (2, 2), (3, 1)]
        df = spark.createDataFrame(
            [("g", x, y) for x, y in pairs], "g string, x int, y int"
        )
        r = kendall_tau_b(df, "g", "x", "y").collect()[0]
        c, d, tau = self._reference(pairs)
        assert (r["n_concordant"], r["n_discordant"]) == (c, d)
        assert r["tau_b_ppm"] == tau
        assert r["n_rows"] == len(pairs)

    def test_perfect_and_inverse_orders(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            kendall_tau_b,
        )

        rows = [("asc", i, i) for i in range(6)] + [
            ("desc", i, 5 - i) for i in range(6)
        ]
        df = spark.createDataFrame(rows, "g string, x int, y int")
        got = {r["g"]: r["tau_b_ppm"] for r in kendall_tau_b(df, "g", "x", "y").collect()}
        assert got["asc"] == 1_000_000
        assert got["desc"] == -1_000_000

    def test_all_tied_x_yields_null(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            kendall_tau_b,
        )

        df = spark.createDataFrame(
            [("g", 1, y) for y in range(4)], "g string, x int, y int"
        )
        r = kendall_tau_b(df, "g", "x", "y").collect()[0]
        assert r["tau_b_ppm"] is None  # zero denominator: undefined


class TestKrippendorffAlpha:
    @staticmethod
    def _reference(units):
        """units: dict unit -> list of values (len >= 1)."""
        kept = {u: vs for u, vs in units.items() if len(vs) >= 2}
        n = sum(len(vs) for vs in kept.values())
        s = 0
        for vs in kept.values():
            m = len(vs)
            cnt = Counter(vs)
            u_pairs = m * m - sum(k * k for k in cnt.values())
            s += u_pairs * 1_000_000 // (m - 1)
        nc = Counter()
        for vs in kept.values():
            nc.update(vs)
        e = n * n - sum(k * k for k in nc.values())
        alpha = 1_000_000 - s * (n - 1) // e if e > 0 else None
        return len(kept), n, alpha

    def test_matches_pure_python_with_missing(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            krippendorff_alpha_nominal,
        )

        units = {
            1: ["a", "a", "a"],
            2: ["a", "b"],
            3: ["b", "b", "b"],
            4: ["a"],          # single rating: excluded
            5: ["b", "a", "b"],
        }
        rows = [(u, v) for u, vs in units.items() for v in vs]
        df = spark.createDataFrame(rows, "u int, v string")
        r = krippendorff_alpha_nominal(df, "u", "v").collect()[0]
        nu, n, alpha = self._reference(units)
        assert (r["n_units"], r["n_ratings"], r["alpha_ppm"]) == (nu, n, alpha)

    def test_perfect_agreement_is_one(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            krippendorff_alpha_nominal,
        )

        rows = [(u, "a" if u % 2 else "b") for u in range(10) for _ in range(3)]
        df = spark.createDataFrame(rows, "u int, v string")
        r = krippendorff_alpha_nominal(df, "u", "v").collect()[0]
        assert r["alpha_ppm"] == 1_000_000

    def test_degenerate_single_category_is_null(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            krippendorff_alpha_nominal,
        )

        rows = [(u, "a") for u in range(4) for _ in range(2)]
        df = spark.createDataFrame(rows, "u int, v string")
        r = krippendorff_alpha_nominal(df, "u", "v").collect()[0]
        assert r["alpha_ppm"] is None  # E = 0: chance disagreement undefined


class TestCaptureRecapture:
    def test_chapman_formula(self, spark):
        from ursa_major_choir_etl_spark.operators.dedup import (
            capture_recapture_estimate,
        )

        a = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (4, 5)], "id_a int, id_b int"
        )
        b = spark.createDataFrame(
            [(1, 2), (2, 3), (6, 7), (8, 9), (4, 9)], "id_a int, id_b int"
        )
        r = capture_recapture_estimate(a, b, ["id_a", "id_b"]).collect()[0]
        # n_a=4, n_b=5, m=2 -> est = 5*6//3 - 1 = 9
        assert (r["n_pairs_a"], r["n_pairs_b"], r["n_both"]) == (4, 5, 2)
        assert r["est_total_pairs"] == 9
        assert r["coverage_a_ppm"] == 4 * 1_000_000 // 9
        assert r["coverage_b_ppm"] == 5 * 1_000_000 // 9

    def test_disjoint_catches_still_estimate(self, spark):
        from ursa_major_choir_etl_spark.operators.dedup import (
            capture_recapture_estimate,
        )

        a = spark.createDataFrame([(1, 2)], "id_a int, id_b int")
        b = spark.createDataFrame([(3, 4)], "id_a int, id_b int")
        r = capture_recapture_estimate(a, b, ["id_a", "id_b"]).collect()[0]
        assert r["n_both"] == 0
        assert r["est_total_pairs"] == 2 * 2 // 1 - 1  # = 3

    def test_empty_catches_degenerate_zero(self, spark):
        from ursa_major_choir_etl_spark.operators.dedup import (
            capture_recapture_estimate,
        )

        a = spark.createDataFrame([], "id_a int, id_b int")
        b = spark.createDataFrame([], "id_a int, id_b int")
        r = capture_recapture_estimate(a, b, ["id_a", "id_b"]).collect()[0]
        assert r["est_total_pairs"] == 0
        assert r["coverage_a_ppm"] is None


class TestStreamingBitmapStore:
    def _write_src(self, spark, tmp, rows):
        spark.createDataFrame(rows, "k string, pos int").repartition(
            3
        ).write.mode("overwrite").parquet(tmp)

    def test_drained_store_equals_batch_pack(self, spark, tmp_path_factory):
        """After draining multi-batch input, the bitmap store equals a
        one-shot batch pack — the lossless OR-merge property."""
        from ursa_major_choir_etl_spark.operators.bitmaps import (
            presence_bitmaps,
        )
        from ursa_major_choir_etl_spark.streaming import jobs

        src = str(tmp_path_factory.mktemp("bm_src"))
        wh = str(tmp_path_factory.mktemp("bm_wh"))
        rows = [(f"u{i % 7}", (i * 11) % 70 - 3) for i in range(400)]
        self._write_src(spark, src, rows)
        stream = (
            spark.readStream.schema("k string, pos int")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        assert jobs.streaming_presence_bitmap_sink(
            stream, wh, "bm", key_col="k", position_col="pos"
        ).awaitTermination(300)
        got = {
            (r["k"], r["bitmap"])
            for r in jobs.read_presence_bitmap_store(spark, wh, "bm").collect()
        }
        df = spark.createDataFrame(rows, "k string, pos int")
        want = {
            (r["k"], r["bitmap"])
            for r in presence_bitmaps(df, ["k"], "pos").collect()
        }
        assert got == want and got

    def test_replayed_batch_is_noop(self, spark, tmp_path_factory):
        """Draining the SAME source into the same store twice (a full
        replay) leaves the bitmaps unchanged — OR idempotence plus the
        generation layout."""
        from ursa_major_choir_etl_spark.streaming import jobs

        src = str(tmp_path_factory.mktemp("bm_src2"))
        wh = str(tmp_path_factory.mktemp("bm_wh2"))
        rows = [("a", 1), ("a", 5), ("b", 62), ("b", 0)]
        self._write_src(spark, src, rows)

        def drain():
            stream = (
                spark.readStream.schema("k string, pos int")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            assert jobs.streaming_presence_bitmap_sink(
                stream, wh, "bm", key_col="k", position_col="pos"
            ).awaitTermination(300)

        drain()
        first = sorted(
            (r["k"], r["bitmap"])
            for r in jobs.read_presence_bitmap_store(spark, wh, "bm").collect()
        )
        drain()
        second = sorted(
            (r["k"], r["bitmap"])
            for r in jobs.read_presence_bitmap_store(spark, wh, "bm").collect()
        )
        assert first == second == [("a", 34), ("b", (1 << 62) | 1)]

    def test_missing_store_reads_empty(self, spark, tmp_path_factory):
        from ursa_major_choir_etl_spark.streaming import jobs

        wh = str(tmp_path_factory.mktemp("bm_wh3"))
        assert (
            jobs.read_presence_bitmap_store(spark, wh, "nope").count() == 0
        )

    def test_empty_first_batch_leaves_readable_store(
        self, spark, tmp_path_factory
    ):
        """An all-filtered micro-batch publishes an EMPTY merged
        frame — dynamic partition overwrite then writes no partition
        directory at all, leaving a bare store dir with zero files.
        The next batch's reader must resolve that to 'no generations
        yet' (with the gen column present for its before_gen filter),
        not die on schema inference — the root cause of a flaky
        full-suite failure in round 12, pinned here with the file
        order forced."""
        import time

        from ursa_major_choir_etl_spark.operators.bitmaps import (
            presence_bitmaps,
        )
        from ursa_major_choir_etl_spark.streaming import jobs

        src = str(tmp_path_factory.mktemp("bm_src5"))
        wh = str(tmp_path_factory.mktemp("bm_wh5"))
        # file A (older): only out-of-domain positions -> empty batch
        spark.createDataFrame(
            [("x", -1), ("y", 99)], "k string, pos int"
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # ensure distinct mtimes: A drains first
        good = [("a", 3), ("b", 7), ("a", 60)]
        spark.createDataFrame(good, "k string, pos int").coalesce(
            1
        ).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("k string, pos int")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        assert jobs.streaming_presence_bitmap_sink(
            stream, wh, "bm", key_col="k", position_col="pos"
        ).awaitTermination(300)
        got = {
            (r["k"], r["bitmap"])
            for r in jobs.read_presence_bitmap_store(spark, wh, "bm").collect()
        }
        want = {
            (r["k"], r["bitmap"])
            for r in presence_bitmaps(
                spark.createDataFrame(good, "k string, pos int"),
                ["k"],
                "pos",
            ).collect()
        }
        assert got == want and got

    def test_integer_keyed_store_keeps_key_type(
        self, spark, tmp_path_factory
    ):
        """Round-11 ADVICE: a non-string key column must survive the
        store round-trip with its own type. The first batch unions
        the fresh pack against the missing-store empty frame — if
        that frame hardcoded 'k string', every later generation would
        carry silently stringified keys and batch parity would break
        for integer keys."""
        from ursa_major_choir_etl_spark.operators.bitmaps import (
            presence_bitmaps,
        )
        from ursa_major_choir_etl_spark.streaming import jobs

        src = str(tmp_path_factory.mktemp("bm_src4"))
        wh = str(tmp_path_factory.mktemp("bm_wh4"))
        rows = [(i % 5, (i * 13) % 63) for i in range(200)]
        spark.createDataFrame(rows, "k bigint, pos int").repartition(
            3
        ).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema("k bigint, pos int")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        assert jobs.streaming_presence_bitmap_sink(
            stream, wh, "bm", key_col="k", position_col="pos"
        ).awaitTermination(300)
        store = jobs.read_presence_bitmap_store(spark, wh, "bm")
        assert store.schema["k"].dataType.simpleString() == "bigint"
        got = {(r["k"], r["bitmap"]) for r in store.collect()}
        df = spark.createDataFrame(rows, "k bigint, pos int")
        want = {
            (r["k"], r["bitmap"])
            for r in presence_bitmaps(df, ["k"], "pos").collect()
        }
        assert got == want and got


class TestRboTopk:
    @staticmethod
    def _reference(list_a, list_b, k=10, p_tenths=9):
        """Truncated quantized RBO of two ranked item lists."""
        total = 0
        n_common = 0
        for d in range(1, k + 1):
            ov = len(set(list_a[:d]) & set(list_b[:d]))
            if d == k:
                n_common = ov
            total += ov * 1_000_000 * (10 - p_tenths) * p_tenths ** (
                d - 1
            ) // (10 ** d * d)
        return n_common, total

    def _ranks_df(self, spark, list_a, list_b):
        items = sorted(set(list_a) | set(list_b))
        rows = []
        for it in items:
            ra = list_a.index(it) + 1 if it in list_a else None
            rb = list_b.index(it) + 1 if it in list_b else None
            rows.append(("g", it, ra, rb))
        return spark.createDataFrame(
            rows, "g string, item int, ra int, rb int"
        )

    def test_matches_pure_python(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import rbo_topk

        la = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
        lb = [2, 1, 3, 11, 5, 12, 7, 13, 9, 14]
        df = self._ranks_df(spark, la, lb)
        r = rbo_topk(df, "g", "item", "ra", "rb").collect()[0]
        n_common, want = self._reference(la, lb)
        assert r["rbo_ppm"] == want
        assert r["n_common"] == n_common

    def test_identical_lists_near_one(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import rbo_topk

        la = list(range(1, 11))
        df = self._ranks_df(spark, la, la)
        r = rbo_topk(df, "g", "item", "ra", "rb").collect()[0]
        _, want = self._reference(la, la)
        assert r["rbo_ppm"] == want
        # truncated-at-10 RBO of identical lists: 1 - p^10 - tail quantization
        assert 600_000 < r["rbo_ppm"] <= 1_000_000
        assert r["n_common"] == 10

    def test_disjoint_lists_zero(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import rbo_topk

        df = self._ranks_df(spark, list(range(1, 11)), list(range(11, 21)))
        r = rbo_topk(df, "g", "item", "ra", "rb").collect()[0]
        assert r["rbo_ppm"] == 0 and r["n_common"] == 0

    def test_head_swap_beats_tail_swap(self, spark):
        """The defining property vs tau: disagreement at the head
        costs more than the same disagreement at the tail."""
        from ursa_major_choir_etl_spark.operators.quality import rbo_topk

        base = list(range(1, 11))
        head_swapped = [2, 1] + base[2:]
        tail_swapped = base[:8] + [10, 9]
        rh = rbo_topk(
            self._ranks_df(spark, base, head_swapped), "g", "item", "ra", "rb"
        ).collect()[0]["rbo_ppm"]
        rt = rbo_topk(
            self._ranks_df(spark, base, tail_swapped), "g", "item", "ra", "rb"
        ).collect()[0]["rbo_ppm"]
        assert rh < rt


class TestDegreeAssortativity:
    @staticmethod
    def _reference(edges):
        from collections import Counter

        deg = Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        m2 = 2 * len(edges)
        sjk = sum(2 * deg[a] * deg[b] for a, b in edges)
        sj = sum(deg[a] + deg[b] for a, b in edges)
        sj2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
        num = m2 * sjk - sj * sj
        den = m2 * sj2 - sj * sj
        if den <= 0:
            return len(deg), len(edges), None
        q = abs(num) * 1_000_000 // den
        return len(deg), len(edges), q if num >= 0 else -q

    def test_matches_pure_python_star_graph(self, spark):
        """A star is maximally disassortative: hub degree n, leaves 1."""
        from ursa_major_choir_etl_spark.operators.graph import (
            degree_assortativity,
        )

        edges = [(0, i) for i in range(1, 7)] + [(1, 2)]
        df = spark.createDataFrame(edges, "id_a int, id_b int")
        r = degree_assortativity(df).collect()[0]
        nn, ne, want = self._reference(edges)
        assert (r["n_nodes"], r["n_edges"]) == (nn, ne)
        assert r["assortativity_ppm"] == want
        assert r["assortativity_ppm"] < 0  # hub-and-spoke

    def test_two_cliques_positive(self, spark):
        """Two disjoint cliques of different sizes: degree correlates
        with neighbor degree -> assortative."""
        from itertools import combinations

        from ursa_major_choir_etl_spark.operators.graph import (
            degree_assortativity,
        )

        edges = list(combinations(range(5), 2)) + list(
            combinations(range(10, 13), 2)
        )
        df = spark.createDataFrame(edges, "id_a int, id_b int")
        r = degree_assortativity(df).collect()[0]
        _, _, want = self._reference(edges)
        assert r["assortativity_ppm"] == want
        assert r["assortativity_ppm"] == 1_000_000  # exactly regular within components

    def test_perfect_matching_degenerate(self, spark):
        from ursa_major_choir_etl_spark.operators.graph import (
            degree_assortativity,
        )

        edges = [(1, 2), (3, 4), (5, 6)]
        df = spark.createDataFrame(edges, "id_a int, id_b int")
        r = degree_assortativity(df).collect()[0]
        assert r["assortativity_ppm"] is None  # all degrees equal


class TestLshSignatureArtifact:
    def test_artifact_equals_direct_signatures(self, spark):
        """The materialized (vec_id, band, bkey) table is row-identical
        to a direct banded_signatures pass — the artifact never drifts
        from the operator that defines it."""
        from ursa_major_choir_etl_spark.operators.similarity import (
            banded_signatures,
        )
        from ursa_major_choir_etl_spark.plans import queries as Q

        sf = "/root/testdata/sf0.001"
        art = {
            (r["vec_id"], r["band"], r["bkey"])
            for r in Q.lsh_signatures_table(spark, sf).collect()
        }
        direct = {
            (r["_id"], r["_band"], r["_key"])
            for r in banded_signatures(
                Q.T(spark, sf, "embeddings"),
                "vec_id", "embedding", 4, 16, seed=42,
            ).select("_id", "_band", "_key").collect()
        }
        assert art == direct and art

    def test_topk_with_artifact_equals_without(self, spark):
        """sign_lsh_topk(corpus_keys=artifact) returns exactly the
        rows of the self-keying path — the artifact is a pure
        evaluation shortcut, never a semantic change."""
        from ursa_major_choir_etl_spark.operators.similarity import (
            sign_lsh_topk,
        )
        from ursa_major_choir_etl_spark.plans import queries as Q

        sf = "/root/testdata/sf0.001"
        emb = Q.T(spark, sf, "embeddings")
        q = emb.filter(F.col("vec_id") < 5)
        with_art = sign_lsh_topk(
            emb, q, k=5, planes_per_band=4, n_bands=16,
            corpus_keys=Q.lsh_signatures_table(spark, sf),
        )
        without = sign_lsh_topk(emb, q, k=5, planes_per_band=4, n_bands=16)
        ka = sorted(map(tuple, with_art.collect()))
        kb = sorted(map(tuple, without.collect()))
        assert ka == kb and ka

    def test_mismatched_artifact_geometry_rejected(self, spark):
        """Round-11 ADVICE: probing a signature artifact with a
        different band geometry or seed silently loses recall, so
        sign_lsh_topk must reject the mismatch via the geometry
        stamped in the artifact's column metadata."""
        import pytest

        from ursa_major_choir_etl_spark.operators.similarity import (
            sign_lsh_topk,
        )
        from ursa_major_choir_etl_spark.plans import queries as Q

        sf = "/root/testdata/sf0.001"
        emb = Q.T(spark, sf, "embeddings")
        q = emb.filter(F.col("vec_id") < 3)
        art = Q.lsh_signatures_table(spark, sf)  # built p=4, b=16, s=42
        assert art.schema["vec_id"].metadata["planes_per_band"] == 4
        for bad in (
            dict(planes_per_band=8, n_bands=16, seed=42),
            dict(planes_per_band=4, n_bands=8, seed=42),
            dict(planes_per_band=4, n_bands=16, seed=7),
        ):
            with pytest.raises(ValueError, match="geometry"):
                sign_lsh_topk(emb, q, k=5, corpus_keys=art, **bad)
        # matching geometry still accepted
        assert sign_lsh_topk(
            emb, q, k=5, planes_per_band=4, n_bands=16, seed=42,
            corpus_keys=art,
        ).count() >= 0
