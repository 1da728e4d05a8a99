"""Property/edge tests for the round-7 continuation operators
(q117-q124): curation quotas, soft dedup, BPE merges, entropy,
robust outliers, triangles, shard balance.

Strategy (SURVEY §5 model): every operator is checked against an
INDEPENDENT brute-force reference — a naive window/python/itertools
recomputation — on small synthetic inputs that include the edge cases
(ties, skewed keys, empty text, symbol runs, hub graphs)."""

from __future__ import annotations

import itertools
import math

from pyspark.sql import functions as F


class TestBoundedTopN:
    def test_matches_naive_window_with_ties_and_skew(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import (
            bounded_topn_per_key,
        )

        # Key "hot" is a heavy hitter; scores collide to force the
        # id tie-break through both phases.
        rows = [("hot", i, float(i % 7)) for i in range(200)]
        rows += [("cold", i, float(i)) for i in range(3)]
        df = spark.createDataFrame(rows, "k string, id long, score double")
        got = bounded_topn_per_key(
            df,
            ["k"],
            [F.col("score").desc(), F.col("id").asc()],
            cap=10,
            salt_on=F.col("id"),
            n_salts=4,
        )
        got_rows = {
            (r["k"], r["id"], r["rank"]) for r in got.collect()
        }
        expect = set()
        for k in ("hot", "cold"):
            members = sorted(
                [r for r in rows if r[0] == k],
                key=lambda r: (-r[2], r[1]),
            )[:10]
            expect |= {(k, r[1], i + 1) for i, r in enumerate(members)}
        assert got_rows == expect

    def test_cap_larger_than_group_returns_all(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import (
            bounded_topn_per_key,
        )

        df = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 2, 2.0)], "k string, id long, score double"
        )
        got = bounded_topn_per_key(
            df, ["k"], [F.col("score").desc(), F.col("id")], cap=99,
            salt_on=F.col("id"),
        )
        assert got.count() == 2


class TestDomainQuota:
    def test_report_invariants_and_kept_set(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import (
            domain_quota_report,
        )

        # Three domains; quality rises with doc_id thanks to longer
        # text, so the kept set is predictable.
        rows = []
        did = 0
        for dom in ("a", "b", "c"):
            for i in range(8):
                rows.append((did, "the of and " * (i + 1), dom))
                did += 1
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        rep = {r["domain"]: r for r in domain_quota_report(df, cap=3).collect()}
        for dom in ("a", "b", "c"):
            r = rep[dom]
            assert r["n_docs"] == 8
            assert r["n_kept"] == 3
            assert r["n_dropped"] == 5
            assert r["tokens_kept"] <= r["tokens_total"]

    def test_ties_break_by_doc_id(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import (
            domain_quota_report,
            bounded_topn_per_key,
        )
        from ursa_major_choir_etl_spark.operators import text as t

        # Identical text => identical quality; cap 2 must keep the
        # two smallest ids.
        df = spark.createDataFrame(
            [(i, "same text here", "d") for i in range(5)],
            "doc_id long, text string, source string",
        )
        scored = df.select(
            F.col("doc_id"), t.quality_score("text").alias("q")
        )
        kept = bounded_topn_per_key(
            scored, [], [F.col("q").desc(), F.col("doc_id")], cap=2,
            salt_on=F.col("doc_id"),
        )
        assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1]


class TestSoftDedup:
    def test_flags_match_brute_force(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import (
            soft_dedup_flags,
        )

        # Cluster sizes 1, 2, 5, 9 via identical text.
        rows, did = [], 0
        sizes = [1, 2, 5, 9]
        for ci, n in enumerate(sizes):
            for _ in range(n):
                rows.append((did, f"cluster {ci} shared body text"))
                did += 1
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = soft_dedup_flags(df).collect()
        by_fp: dict[str, list] = {}
        for r in got:
            by_fp.setdefault(r["fingerprint"], []).append(r)
        seen_sizes = sorted(len(v) and v[0]["cluster_size"] for v in by_fp.values())
        assert seen_sizes == sizes
        for members in by_fp.values():
            n = members[0]["cluster_size"]
            keep_k = n.bit_length()
            assert all(m["keep_k"] == keep_k for m in members)
            kept_ids = sorted(m["doc_id"] for m in members if m["kept"])
            all_ids = sorted(m["doc_id"] for m in members)
            assert kept_ids == all_ids[:keep_k]

    def test_prefix_mode_clusters_on_lead(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import (
            soft_dedup_flags,
        )

        lead = "alpha beta gamma"
        df = spark.createDataFrame(
            [
                (1, lead + " tail one"),
                (2, lead + " another ending"),
                (3, "different opening entirely"),
            ],
            "doc_id long, text string",
        )
        got = soft_dedup_flags(df, prefix_tokens=3).collect()
        fp = {r["doc_id"]: r["fingerprint"] for r in got}
        assert fp[1] == fp[2] != fp[3]


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Pure-python reference with the SAME contract: |-delimited
    symbols, plain str.replace (left-to-right non-overlapping),
    ties by (left, right) ascending."""
    syms = {f"|{'|'.join(w)}|": c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for w, c in syms.items():
            parts = [p for p in w.split("|") if p]
            for a, b in zip(parts, parts[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, cnt))
        new = {}
        for w, c in syms.items():
            w2 = w.replace(f"|{a}|{b}|", f"|{a}{b}|")
            new[w2] = new.get(w2, 0) + c
        syms = new
    return merges


class TestBpeMerges:
    def test_matches_python_reference(self, spark):
        from ursa_major_choir_etl_spark.operators.vocab import bpe_merge_table

        corpus = [
            (0, "low low low lower lowest"),
            (1, "new newer newest news"),
            (2, "low newer low"),
        ]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = [
            (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in bpe_merge_table(df, n_merges=4).collect()
        ]
        counts: dict[str, int] = {}
        for _, txt in corpus:
            for w in txt.split():
                counts[w] = counts.get(w, 0) + 1
        assert got == _py_bpe(counts, 4)

    def test_symbol_run_uses_replace_semantics(self, spark):
        from ursa_major_choir_etl_spark.operators.vocab import bpe_merge_table

        # 'aaaa' exercises the overlapping-pair rule: the contract is
        # str.replace semantics, mirrored exactly by the reference.
        df = spark.createDataFrame(
            [(0, "aaaa aaaa ab")], "doc_id long, text string"
        )
        got = [
            (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in bpe_merge_table(df, n_merges=3).collect()
        ]
        assert got == _py_bpe({"aaaa": 2, "ab": 1}, 3)


class TestCharEntropy:
    def test_matches_python_reference(self, spark):
        from ursa_major_choir_etl_spark.operators.text import (
            char_bigram_entropy,
        )

        rows = [
            (0, "aaaaaaaa"),            # zero-entropy run
            (1, "abcdefgh"),            # all-distinct bigrams
            (2, "x"),                   # too short -> dropped
            (3, ""),                    # empty -> dropped
            (4, "the cat sat on a mat"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in char_bigram_entropy(df).collect()}
        assert set(got) == {0, 1, 4}

        def ref(textv):
            import re

            norm = re.sub(r"\s+", " ", re.sub(r"[^\w\s]", "", textv.lower())).strip()
            grams = [norm[i : i + 2] for i in range(len(norm) - 1)]
            m = len(grams)
            from collections import Counter

            cnt = Counter(grams)
            bits = {g: (m // k).bit_length() - 1 for g, k in cnt.items()}
            mean = round(sum(k * bits[g] for g, k in cnt.items()) / m, 6)
            return m, len(cnt), mean

        for did, textv in rows:
            if did not in got:
                continue
            m, d, mean = ref(textv)
            r = got[did]
            assert (r["n_bigrams"], r["distinct_bigrams"]) == (m, d)
            assert abs(r["mean_bits"] - mean) < 1e-9

    def test_flags_both_tails(self, spark):
        from ursa_major_choir_etl_spark.operators.text import (
            char_bigram_entropy,
        )

        df = spark.createDataFrame(
            [(0, "aaaaaaaaaaaaaaaa"), (1, "the cat sat on the mat again")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["suspicious"] for r in char_bigram_entropy(df).collect()}
        assert got[0] is True      # ~0 bits
        assert got[1] is False


class TestRobustOutliers:
    def test_matches_numpy_reference(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            robust_outlier_report,
        )

        vals = [1.0, 1.1, 0.9, 1.05, 0.95, 50.0, 1.02, 0.98]
        df = spark.createDataFrame(
            [(i, "m", v) for i, v in enumerate(vals)],
            "event_id long, event_type string, value double",
        )
        r = robust_outlier_report(df, k=3.0).collect()[0]
        import statistics

        med = statistics.median(vals)
        med = round(med, 6)
        adevs = [abs(v - med) for v in vals]
        mad = round(statistics.median(adevs), 6)
        n_out = sum(1 for a in adevs if round(a, 6) > round(3.0 * mad, 6))
        assert r["n_events"] == len(vals)
        assert abs(r["med_value"] - round(med, 6)) < 1e-9
        assert abs(r["mad_value"] - round(mad, 6)) < 1e-9
        assert r["n_outliers"] == n_out
        assert abs(r["max_abs_dev"] - round(max(adevs), 6)) < 1e-9

    def test_constant_stream_has_zero_mad_and_no_outliers(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import (
            robust_outlier_report,
        )

        df = spark.createDataFrame(
            [(i, "c", 7.0) for i in range(10)],
            "event_id long, event_type string, value double",
        )
        r = robust_outlier_report(df).collect()[0]
        assert r["mad_value"] == 0.0 and r["n_outliers"] == 0


class TestTriangles:
    def _brute(self, edges):
        nodes = sorted({n for e in edges for n in e})
        eset = {frozenset(e) for e in edges}
        tri_count = {n: 0 for n in nodes}
        for a, b, c in itertools.combinations(nodes, 3):
            if (
                frozenset((a, b)) in eset
                and frozenset((b, c)) in eset
                and frozenset((a, c)) in eset
            ):
                for n in (a, b, c):
                    tri_count[n] += 1
        return {n: c for n, c in tri_count.items() if c}

    def test_matches_brute_force_with_hub(self, spark):
        from ursa_major_choir_etl_spark.operators.graph import triangle_counts

        # Hub 0 connects to everything; triangles only where spokes
        # also interconnect. Plus a separate clique of 4.
        edges = [(0, i) for i in range(1, 8)]
        edges += [(1, 2), (3, 4)]
        edges += list(itertools.combinations([10, 11, 12, 13], 2))
        df = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
        )
        got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
        assert got == self._brute(edges)

    def test_triangle_free_graph_is_empty(self, spark):
        from ursa_major_choir_etl_spark.operators.graph import triangle_counts

        df = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3)], "id_a long, id_b long"
        )
        assert triangle_counts(df).count() == 0


class TestAdaptiveShards:
    def test_conservation_and_shard_count(self, spark):
        from ursa_major_choir_etl_spark.operators.layout import (
            adaptive_shard_plan,
        )

        rows = [(i, 100 + (i % 7) * 13) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        total = sum(s for _, s in rows)
        target = 5_000
        got = adaptive_shard_plan(df, size_col="n_chars", target_per_shard=target).collect()
        expect_shards = math.ceil(total / target)
        assert all(r["n_shards"] == expect_shards for r in got)
        assert sum(r["n_docs"] for r in got) == len(rows)
        assert sum(r["shard_size"] for r in got) == total
        assert {r["shard"] for r in got} <= set(range(expect_shards))

    def test_placement_is_id_pure(self, spark):
        from ursa_major_choir_etl_spark.operators.layout import (
            adaptive_shard_plan,
        )

        rows = [(i, 50) for i in range(64)]
        df1 = spark.createDataFrame(rows, "doc_id long, n_chars long")
        df2 = spark.createDataFrame(rows, "doc_id long, n_chars long").repartition(7)
        a = sorted(map(tuple, adaptive_shard_plan(df1, size_col="n_chars").collect()))
        b = sorted(map(tuple, adaptive_shard_plan(df2, size_col="n_chars").collect()))
        assert a == b


class TestClusterRepresentatives:
    def test_elects_highest_quality_min_id(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import (
            cluster_representatives,
        )

        labels = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "node long, component long"
        )
        docs = spark.createDataFrame(
            [
                (1, "short"),
                (2, "the of and to in the of and to in " * 3),
                (3, "the of and to in the of and to in " * 3),
                (7, "tiny"),
                (8, "the of and in it " * 10),
            ],
            "doc_id long, text string",
        )
        got = {r["component"]: r for r in cluster_representatives(labels, docs).collect()}
        assert got[1]["cluster_size"] == 3
        # docs 2 and 3 tie on quality; min id wins.
        assert got[1]["rep_doc_id"] == 2
        assert got[7]["rep_doc_id"] == 8
        assert got[1]["tokens_kept"] <= got[1]["tokens_total"]


class TestMixturePlan:
    def test_rates_and_yields(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import mixture_plan

        # Domain "big" has 10x the tokens of "small": equal targets
        # mean big is downsampled, small is underfilled.
        rows = [(i, "tok " * 100, "big") for i in range(10)]
        rows += [(100, "tok " * 100, "small")]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {r["domain"]: r for r in mixture_plan(df, budget_ppm_of_corpus=400_000).collect()}
        total = 1100
        target = total * 400_000 // 1_000_000 // 2  # 220
        for dom, avail in (("big", 1000), ("small", 100)):
            r = got[dom]
            assert r["tokens_available"] == avail
            assert r["target_tokens"] == target
            expect_rate = min(1_000_000, target * 1_000_000 // avail)
            assert r["rate_ppm"] == expect_rate
            assert r["expected_tokens"] == avail * expect_rate // 1_000_000
        assert got["small"]["underfilled"] is True
        assert got["big"]["underfilled"] is False

    def test_zero_token_domain_excluded(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import mixture_plan

        df = spark.createDataFrame(
            [(0, "some text", "a"), (1, "", "empty")],
            "doc_id long, text string, source string",
        )
        doms = {r["domain"] for r in mixture_plan(df).collect()}
        assert doms == {"a"}


class TestCurationFunnel:
    def test_stages_are_monotone_and_match_manual(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import (
            curation_funnel,
        )
        from ursa_major_choir_etl_spark.operators import text as t

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rep = {r["stage_idx"]: r for r in curation_funnel(docs).collect()}
        assert [rep[i]["stage"] for i in (1, 2, 3, 4)] == [
            "all", "quality_gate", "soft_dedup", "domain_cap",
        ]
        for i in (2, 3, 4):
            assert rep[i]["n_docs"] <= rep[i - 1]["n_docs"]
            assert rep[i]["n_tokens"] <= rep[i - 1]["n_tokens"]
        assert rep[1]["n_docs"] == docs.count()
        s2 = docs.filter(t.quality_score("text") >= 0.5).count()
        assert rep[2]["n_docs"] == s2


class TestAnnRecall:
    def test_overlap_arithmetic(self, spark):
        from ursa_major_choir_etl_spark.operators.similarity import (
            ann_recall_report,
        )

        exact = spark.createDataFrame(
            [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)],
            "query_id long, neighbor_id long",
        )
        approx = spark.createDataFrame(
            [(1, 10), (1, 99), (2, 20), (2, 21)],
            "query_id long, neighbor_id long",
        )
        got = {r["query_id"]: r for r in ann_recall_report(exact, approx).collect()}
        assert (got[1]["n_exact"], got[1]["n_approx"], got[1]["n_overlap"]) == (3, 2, 1)
        assert abs(got[1]["recall"] - round(1 / 3, 6)) < 1e-9
        assert got[2]["n_overlap"] == 2 and got[2]["recall"] == 1.0

    def test_query_with_no_approx_results(self, spark):
        from ursa_major_choir_etl_spark.operators.similarity import (
            ann_recall_report,
        )

        exact = spark.createDataFrame(
            [(1, 10), (3, 30)], "query_id long, neighbor_id long"
        )
        approx = spark.createDataFrame(
            [(1, 10)], "query_id long, neighbor_id long"
        )
        got = {r["query_id"]: r for r in ann_recall_report(exact, approx).collect()}
        assert got[3]["n_approx"] == 0 and got[3]["n_overlap"] == 0
        assert got[3]["recall"] == 0.0


class TestBpeCompression:
    def test_matches_python_reference(self, spark):
        from ursa_major_choir_etl_spark.operators.vocab import (
            bpe_compression_report,
        )

        corpus = [(0, "low low low lower lowest"), (1, "low lowest ab")]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        counts: dict[str, int] = {}
        for _, txt in corpus:
            for w in txt.split():
                counts[w] = counts.get(w, 0) + 1
        merges = _py_bpe(counts, 3)
        syms = {f"|{'|'.join(w)}|": c for w, c in counts.items()}
        for _, a, b, _c in merges:
            new: dict[str, int] = {}
            for w, c in syms.items():
                w2 = w.replace(f"|{a}|{b}|", f"|{a}{b}|")
                new[w2] = new.get(w2, 0) + c
            syms = new
        total_words = sum(syms.values())
        total_chars = sum(len(w.replace("|", "")) * c for w, c in syms.items())
        total_syms = sum(
            len([p for p in w.split("|") if p]) * c for w, c in syms.items()
        )
        r = bpe_compression_report(df, n_merges=3).collect()[0]
        assert r["n_merges"] == 3
        assert r["n_distinct_words"] == len(counts)
        assert r["total_words"] == total_words
        assert r["total_chars"] == total_chars
        assert r["total_symbols"] == total_syms
        assert abs(r["compression"] - round(total_chars / total_syms, 6)) < 1e-9

    def test_zero_merges_is_identity(self, spark):
        from ursa_major_choir_etl_spark.operators.vocab import (
            bpe_compression_report,
        )

        df = spark.createDataFrame([(0, "ab cd ab")], "doc_id long, text string")
        r = bpe_compression_report(df, n_merges=0).collect()[0]
        assert r["n_merges"] == 0 and r["compression"] == 1.0


class TestVocabDrift:
    def test_identical_sources_fully_overlap(self, spark):
        from ursa_major_choir_etl_spark.operators.text import vocab_drift_report

        rows = [(i, "alpha beta gamma delta", "s%d" % (i % 2)) for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = vocab_drift_report(df, k=4).collect()
        assert all(r["overlap_ratio"] == 1.0 and r["n_top"] == 4 for r in got)
        assert all(r["top_term"] == "alpha" for r in got)

    def test_divergent_source_scores_low(self, spark):
        from ursa_major_choir_etl_spark.operators.text import vocab_drift_report

        rows = [(i, "common words shared here", "main") for i in range(20)]
        rows += [(100, "zzz qqq xxx vvv", "weird")]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {r["domain"]: r for r in vocab_drift_report(df, k=4).collect()}
        assert got["main"]["overlap_ratio"] == 1.0
        assert got["weird"]["overlap_ratio"] == 0.0


class TestThresholdSensitivity:
    def test_counts_match_brute_force(self, spark):
        from ursa_major_choir_etl_spark.operators.dedup import (
            threshold_sensitivity,
        )

        pairs = [(1, 2, 0.95), (1, 3, 0.72), (2, 3, 0.55), (4, 5, 0.61)]
        df = spark.createDataFrame(pairs, "id_a long, id_b long, jaccard double")
        got = {
            r["threshold"]: (r["n_pairs"], r["n_docs"])
            for r in threshold_sensitivity(df, [0.5, 0.6, 0.7, 0.9]).collect()
        }
        for t in (0.5, 0.6, 0.7, 0.9):
            sel = [(a, b) for a, b, j in pairs if j >= t]
            docs = {d for p in sel for d in p}
            if sel:
                assert got[t] == (len(sel), len(docs))
            else:
                assert t not in got

    def test_empty_cut_drops_out(self, spark):
        from ursa_major_choir_etl_spark.operators.dedup import (
            threshold_sensitivity,
        )

        df = spark.createDataFrame([(1, 2, 0.4)], "id_a long, id_b long, jaccard double")
        got = threshold_sensitivity(df, [0.5, 0.9]).collect()
        assert got == []


def _py_pq_recall(vecs: dict[int, list[float]], query_ids, m, k_codes, iters, k_nn,
                  scale=1_000_000):
    """Pure-python mirror of similarity.pq_recall_report's contract:
    integer scaling, smallest-id seeds, (dist, cid) argmin, trunc-div
    updates, final assignment against PRE-update centroids, ADC, and
    (adc, neighbor) / (exact, neighbor) top-k ordering."""
    ids = sorted(vecs)
    xi = {i: [int(round(x * scale)) for x in vecs[i]] for i in ids}
    dims = len(next(iter(xi.values())))
    ds = dims // m

    def sq(a, b):
        return sum((p - q) * (p - q) for p, q in zip(a, b))

    codes = {i: [] for i in ids}
    luts = []  # per s: {(qid, cid): d}
    for s in range(m):
        sub = {i: xi[i][s * ds:(s + 1) * ds] for i in ids}
        cents = {cid: list(sub[i]) for cid, i in enumerate(ids[:k_codes])}
        assign = {}
        for it in range(iters):
            assign = {
                i: min(cents, key=lambda c: (sq(sub[i], cents[c]), c))
                for i in ids
            }
            if it == iters - 1:
                break
            new = {}
            for c in cents:
                members = [i for i in ids if assign[i] == c]
                if members:
                    new[c] = [
                        int_div(sum(sub[i][d] for i in members), len(members))
                        for d in range(ds)
                    ]
                else:
                    new[c] = cents[c]
            cents = new
        for i in ids:
            codes[i].append(assign[i])
        luts.append({
            (q, c): sq(xi[q][s * ds:(s + 1) * ds], cents[c])
            for q in query_ids for c in cents
        })

    out = {}
    for q in query_ids:
        adc = {
            i: sum(luts[s][(q, codes[i][s])] for s in range(m))
            for i in ids if i != q
        }
        approx = sorted(adc, key=lambda i: (adc[i], i))[:k_nn]
        exact_d = {i: sq(xi[q], xi[i]) for i in ids if i != q}
        exact = sorted(exact_d, key=lambda i: (exact_d[i], i))[:k_nn]
        ov = len(set(approx) & set(exact))
        out[q] = (len(exact), len(approx), ov, round(ov / len(exact), 6))
    return out


def int_div(a, b):
    """Truncating integer division matching Spark DIV / DuckDB //."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


class TestPqRecall:
    def test_matches_python_mirror(self, spark):
        from ursa_major_choir_etl_spark.operators.similarity import (
            pq_recall_report,
        )

        import random

        rng = random.Random(7)
        vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(24)}
        df = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id long, embedding array<float>",
        )
        # float32 storage: mirror must see the same float32 values
        stored = {
            r["vec_id"]: list(r["embedding"]) for r in df.collect()
        }
        got = {
            r["query_id"]: (
                r["n_exact"], r["n_approx"], r["n_overlap"], r["recall"]
            )
            for r in pq_recall_report(
                df, df.filter("vec_id < 3"), m=2, k_codes=4, iters=2, k_nn=3
            ).collect()
        }
        want = _py_pq_recall(stored, [0, 1, 2], m=2, k_codes=4, iters=2, k_nn=3)
        assert got == want

    def test_exactly_clustered_corpus_has_full_recall(self, spark):
        from ursa_major_choir_etl_spark.operators.similarity import (
            pq_recall_report,
        )

        # Vectors exactly on 2 prototypes per subspace: the codebook
        # reconstructs every vector exactly, so ADC == exact distance
        # and recall must be 1.0 for every query.
        protos = [[1.0, 0.0], [0.0, 1.0]]
        rows = []
        for i in range(12):
            a, b = protos[i % 2], protos[(i // 2) % 2]
            rows.append((i, a + b))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = pq_recall_report(
            df, df.filter("vec_id < 2"), m=2, k_codes=4, iters=2, k_nn=3
        ).collect()
        assert all(r["recall"] == 1.0 for r in got)


class TestSpanCorruption:
    def test_reconstruction_invariants(self, spark):
        from ursa_major_choir_etl_spark.operators.samples import (
            span_corruption,
        )

        df = spark.createDataFrame(
            [(i, " ".join(f"w{j}" for j in range(20))) for i in range(6)]
            + [(100, ""), (101, "single")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in span_corruption(df).collect()}
        assert 100 not in got  # empty doc dropped
        assert got[101]["n_tokens"] == 1
        for did, r in got.items():
            # Unmasked tokens survive in order; masked ones move to
            # the target after their sentinel; counts reconcile.
            inp, tgt = r["input_text"].split(), r["target_text"].split()
            sentinels_in = [t for t in inp if t.startswith("<X_")]
            sentinels_tg = [t for t in tgt if t.startswith("<X_")]
            assert sentinels_in == sentinels_tg
            assert sentinels_in == [f"<X_{i}>" for i in range(len(sentinels_in))]
            plain_in = [t for t in inp if not t.startswith("<X_")]
            plain_tg = [t for t in tgt if not t.startswith("<X_")]
            assert len(plain_in) + len(plain_tg) == r["n_tokens"]
            assert len(plain_tg) == r["n_masked"]
            assert r["n_spans"] == len(sentinels_in)
            # Round-trip: interleaving target spans back at sentinel
            # positions restores the original token sequence.
            by_sent: dict[str, list[str]] = {}
            cur = None
            for t in tgt:
                if t.startswith("<X_"):
                    cur = t
                    by_sent[cur] = []
                else:
                    by_sent[cur].append(t)
            rebuilt: list[str] = []
            for t in inp:
                rebuilt.extend(by_sent[t] if t.startswith("<X_") else [t])
            orig = [r2 for r2 in df.filter(F.col("doc_id") == did).collect()]
            assert rebuilt == orig[0]["text"].split()

    def test_deterministic_and_id_pure(self, spark):
        from ursa_major_choir_etl_spark.operators.samples import (
            span_corruption,
        )

        df1 = spark.createDataFrame(
            [(7, "a b c d e f g h i j k l")], "doc_id long, text string"
        )
        df2 = spark.createDataFrame(
            [(7, "a b c d e f g h i j k l"), (8, "other text here")],
            "doc_id long, text string",
        ).repartition(5)
        r1 = span_corruption(df1).filter("doc_id = 7").collect()[0]
        r2 = span_corruption(df2).filter("doc_id = 7").collect()[0]
        assert (r1["input_text"], r1["target_text"]) == (
            r2["input_text"], r2["target_text"]
        )


class TestEmptyInputRobustness:
    """ANSI mode makes silent-corrupt paths loud; the flip side is
    that edge expressions (DIV, sequence bounds) must be guarded.
    Every round-7-continuation operator must accept an EMPTY input
    without raising and return an empty (or empty-report) result."""

    def _empty_docs(self, spark):
        return spark.createDataFrame([], "doc_id long, text string, source string")

    def test_docs_operators(self, spark):
        from ursa_major_choir_etl_spark.operators import curation, vocab
        from ursa_major_choir_etl_spark.operators.text import (
            char_bigram_entropy,
            vocab_drift_report,
        )
        from ursa_major_choir_etl_spark.operators.samples import span_corruption

        e = self._empty_docs(spark)
        assert curation.domain_quota_report(e).count() == 0
        assert curation.soft_dedup_report(e, prefix_tokens=10).count() == 0
        assert curation.mixture_plan(e).count() == 0
        assert char_bigram_entropy(e).count() == 0
        assert vocab_drift_report(e).count() == 0
        assert span_corruption(e).count() == 0
        assert vocab.bpe_merge_table(e).count() == 0
        funnel = curation.curation_funnel(e).collect()
        assert [r["n_docs"] for r in funnel] == [0, 0, 0, 0]

    def test_pairs_and_events_operators(self, spark):
        from ursa_major_choir_etl_spark.operators.dedup import (
            threshold_sensitivity,
        )
        from ursa_major_choir_etl_spark.operators.graph import triangle_counts
        from ursa_major_choir_etl_spark.operators.quality import (
            robust_outlier_report,
        )
        from ursa_major_choir_etl_spark.operators.layout import (
            adaptive_shard_plan,
        )

        ep = spark.createDataFrame([], "id_a long, id_b long, jaccard double")
        assert threshold_sensitivity(ep, [0.5]).count() == 0
        assert triangle_counts(ep).count() == 0
        ee = spark.createDataFrame(
            [], "event_id long, event_type string, value double"
        )
        assert robust_outlier_report(ee).count() == 0
        ed = spark.createDataFrame([], "doc_id long, n_chars long")
        assert adaptive_shard_plan(ed, size_col="n_chars").count() == 0


class TestDatasetCard:
    def test_metrics_match_manual(self, spark):
        from ursa_major_choir_etl_spark.operators.quality import dataset_card

        df = spark.createDataFrame(
            [
                (0, "the cat sat on the mat", "a"),
                (1, "the cat sat on the mat", "a"),     # exact dup of 0
                (2, "contact me at a@b.co today", "b"),
                (3, "der und das ist die", "b"),
            ],
            "doc_id long, text string, source string",
        )
        got = {r["metric"]: r["value"] for r in dataset_card(df).collect()}
        assert got["n_docs"] == 4.0
        assert got["n_sources"] == 2.0
        assert got["exact_dup_rate"] == round(1 - 3 / 4, 6)
        assert got["pii_doc_rate"] == 0.25
        assert got["mean_doc_tokens"] == round((6 + 6 + 5 + 5) / 4, 6)
        assert 0.0 <= got["mean_quality"] <= 1.0
        assert got["pct_en_predicted"] >= 0.5  # docs 0/1 vote 'en'


class TestFimTransform:
    def test_psm_reconstruction(self, spark):
        from ursa_major_choir_etl_spark.operators.samples import fim_transform

        txt = " ".join(f"t{j}" for j in range(10))
        df = spark.createDataFrame(
            [(0, txt), (1, "one"), (2, "")], "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in fim_transform(df).collect()}
        assert 2 not in got
        r = got[0]
        assert (r["n_prefix"], r["n_middle"], r["n_suffix"]) == (4, 2, 4)
        body = r["fim_text"]
        pre = body.split(" <SUF> ")[0].removeprefix("<PRE> ")
        suf = body.split(" <SUF> ")[1].split(" <MID> ")[0]
        mid = body.split(" <MID> ")[1]
        assert (pre + " " + mid + " " + suf).split() == txt.split()
        # 1-token doc: everything lands in the suffix.
        r1 = got[1]
        assert (r1["n_prefix"], r1["n_middle"], r1["n_suffix"]) == (0, 0, 1)
        assert r1["fim_text"] == "<PRE>  <SUF> one <MID> "


class TestHoldoutConstruction:
    def test_contamination_flags_planted_leak(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import (
            holdout_construction_report,
            bounded_topn_per_key,  # noqa: F401 (import guard)
        )
        from ursa_major_choir_etl_spark.operators.dedup import (
            bloom_position_sql,
        )

        # Find one id in the eval bucket and one in train, plant a
        # shared 8-gram between them; every other doc is unique text.
        import hashlib

        def bucket(i):
            return int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:5], 16) % 100

        eval_ids = [i for i in range(200) if bucket(i) < 10]
        train_ids = [i for i in range(200) if bucket(i) >= 10]
        leak = "alpha beta gamma delta epsilon zeta eta theta"
        rows = []
        for i in range(200):
            if i == eval_ids[0] or i == train_ids[0]:
                rows.append((i, f"{leak} marker{i}", "en"))
            else:
                rows.append((i, " ".join(f"u{i}w{j}" for j in range(12)), "en"))
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        rep = holdout_construction_report(df).collect()
        r = {x["lang"]: x for x in rep}["en"]
        assert r["n_eval"] == len(eval_ids)
        assert r["n_contaminated"] == 1   # exactly the planted leak
        assert r["n_clean"] == len(eval_ids) - 1

    def test_split_is_id_pure(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import (
            holdout_construction_report,
        )

        rows = [(i, " ".join(f"d{i}t{j}" for j in range(10)), "en") for i in range(60)]
        df1 = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        df2 = spark.createDataFrame(rows, "doc_id long, text string, lang string").repartition(9)
        a = sorted(map(tuple, holdout_construction_report(df1).collect()))
        b = sorted(map(tuple, holdout_construction_report(df2).collect()))
        assert a == b


class TestEmbeddingDrift:
    def test_identical_halves_have_zero_shift(self, spark):
        from ursa_major_choir_etl_spark.operators.similarity import (
            embedding_drift_ab,
        )

        # Every vector identical within a label: both half-centroids
        # equal the vector -> exact zero shift.
        rows = [(i, [float(l), float(-l)], l) for l in (1, 2) for i in range(l * 100, l * 100 + 40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        got = {r["label"]: r for r in embedding_drift_ab(df).collect()}
        for l in (1, 2):
            assert got[l]["l2sq_shift_micro"] == 0
            assert got[l]["n_a"] + got[l]["n_b"] == 40

    def test_shifted_half_detected(self, spark):
        from ursa_major_choir_etl_spark.operators.similarity import (
            embedding_drift_ab,
        )
        import hashlib

        def half(i):
            return int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:5], 16) % 2

        # Vectors depend on the SAME md5 parity the operator uses, so
        # half A sits at 0.0 and half B at 1.0 -> shift = dims * 1e12.
        rows = [(i, [float(half(i))] * 4, 0) for i in range(50)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        r = embedding_drift_ab(df).collect()[0]
        assert r["l2sq_shift_micro"] == 4 * (1_000_000 ** 2)


class TestRound8ReviewFixes:
    def test_outliers_quantize_median_before_deviation(self, spark):
        """Review finding (verified cross-engine): deviations must be
        taken from the 6dp-ROUNDED median or sub-6dp-precision inputs
        diverge between Spark and the oracle/mirror/streaming gate."""
        from ursa_major_choir_etl_spark.operators.quality import (
            robust_outlier_report,
        )

        vals = [0.9999999, 1.0000004, 2.0000007]
        df = spark.createDataFrame(
            [(i, "m", v) for i, v in enumerate(vals)],
            "event_id long, event_type string, value double",
        )
        r = robust_outlier_report(df, k=3.0).collect()[0]
        med = round(1.0000004, 6)  # 1.0
        adevs = [round(abs(v - med), 10) for v in vals]
        assert r["med_value"] == med
        assert abs(r["max_abs_dev"] - round(max(adevs), 6)) < 1e-12

    def test_domain_quota_keeps_null_domain(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import (
            domain_quota_report,
        )

        df = spark.createDataFrame(
            [(0, "the of and to", None), (1, "the of and to", "a")],
            "doc_id long, text string, source string",
        )
        rep = {r["domain"]: r for r in domain_quota_report(df, cap=5).collect()}
        assert None in rep and rep[None]["n_docs"] == 1

    def test_soft_dedup_keeps_null_text_cluster(self, spark):
        from ursa_major_choir_etl_spark.operators.curation import (
            soft_dedup_flags,
        )

        df = spark.createDataFrame(
            [(0, None), (1, None), (2, "real text")],
            "doc_id long, text string",
        )
        got = soft_dedup_flags(df).collect()
        nulls = [r for r in got if r["fingerprint"] is None]
        assert len(nulls) == 2 and all(r["cluster_size"] == 2 for r in nulls)

    def test_triangles_canonicalize_reversed_edges(self, spark):
        from ursa_major_choir_etl_spark.operators.graph import triangle_counts

        # Triangle with one edge listed BOTH ways: still one triangle.
        df = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (1, 3)], "id_a long, id_b long"
        )
        got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1}

    def test_mixture_plan_survives_petascale_counts(self, spark):
        """The decimal-routed ppm arithmetic must not ANSI-overflow at
        the 100 TB design point (~2.3e13 tokens and beyond)."""
        from ursa_major_choir_etl_spark.operators.curation import mixture_plan

        big = 30_000_000_000_000  # 3e13 tokens in one domain
        df = spark.createDataFrame(
            [(0, "x", "a"), (1, "y", "b")], "doc_id long, text string, source string"
        )
        # Bypass tokenization: patch the aggregate by feeding via a view
        # with a fake token_count — instead test the arithmetic directly
        # through the same expressions on a pre-aggregated frame.
        per_dom = spark.createDataFrame(
            [("a", big), ("b", 7)], "domain string, tokens_available long"
        )
        totals = per_dom.agg(
            F.sum("tokens_available").alias("_corpus_tokens"),
            F.count(F.lit(1)).alias("_n_domains"),
        )
        planned = per_dom.crossJoin(F.broadcast(totals)).select(
            "domain", "tokens_available",
            F.expr(
                "CAST(CAST(_corpus_tokens AS DECIMAL(38,0)) * 400000"
                " DIV 1000000 DIV _n_domains AS BIGINT)"
            ).alias("target_tokens"),
        ).withColumn(
            "rate_ppm",
            F.expr(
                "least(CAST(1000000 AS BIGINT),"
                " CAST(target_tokens AS DECIMAL(38,0)) * 1000000"
                " DIV tokens_available)"
            ),
        )
        rows = {r["domain"]: r for r in planned.collect()}
        target = (big + 7) * 400_000 // 1_000_000 // 2
        assert rows["a"]["target_tokens"] == target
        assert rows["a"]["rate_ppm"] == min(1_000_000, target * 1_000_000 // big)
        assert rows["b"]["rate_ppm"] == 1_000_000

    def test_shard_plan_zero_size_input_has_one_shard(self, spark):
        from ursa_major_choir_etl_spark.operators.layout import (
            adaptive_shard_plan,
        )

        df = spark.createDataFrame([(0, 0), (1, 0)], "doc_id long, n_chars long")
        got = adaptive_shard_plan(df, size_col="n_chars").collect()
        assert all(r["n_shards"] == 1 for r in got)
        assert sum(r["n_docs"] for r in got) == 2

    def test_pq_empty_input_returns_empty_report(self, spark):
        from ursa_major_choir_etl_spark.operators.similarity import (
            pq_recall_report,
        )

        e = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
        assert pq_recall_report(e, e).count() == 0
