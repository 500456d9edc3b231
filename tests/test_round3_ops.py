"""Unit tests for the round-3 analytics additions: BM25 retrieval,
duplicated-passage stats, token JS divergence, rolling percentiles.
Golden tiny-frame style (SURVEY §5 pattern 1)."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from pyspark.sql import functions as F

from eventstreamml_spark.operators.dedup import duplicate_passage_stats
from eventstreamml_spark.operators.text import bm25_topk, token_js_divergence
from eventstreamml_spark.operators.windows import rolling_percentiles


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBM25:
    def test_matches_hand_computed_score(self, spark):
        docs = _docs(
            spark,
            [
                (1, "spark spark engine"),
                (2, "spark rows"),
                (3, "other words entirely"),
            ],
        )
        out = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["spark"], k=3).collect()}
        # N=3, df=2, idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
        # avgdl = (3+2+3)/3 = 8/3
        idf = math.log(1.6)

        def s(tf, dl):
            return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (8 / 3)))

        assert out[1] == pytest.approx(round(s(2, 3), 6), abs=1e-6)
        assert out[2] == pytest.approx(round(s(1, 2), 6), abs=1e-6)
        assert 3 not in out  # no query term -> not retrieved

    def test_rank_is_total_and_k_bounded(self, spark):
        docs = _docs(spark, [(i, "spark x") for i in range(10)])
        rows = bm25_topk(docs, ["spark"], k=4).collect()
        assert [r["rk"] for r in rows] == [1, 2, 3, 4]
        # identical scores -> doc_id ascending tiebreak
        assert [r["doc_id"] for r in rows] == [0, 1, 2, 3]


class TestDuplicatePassages:
    def test_cross_doc_duplication_flagged(self, spark):
        docs = _docs(
            spark,
            [
                (1, "a b c d e"),  # grams: "a b c d", "b c d e"
                (2, "a b c d x"),  # shares "a b c d"
                (3, "p q r s t"),  # unique
            ],
        )
        out = {
            r["doc_id"]: (r["n_grams"], r["n_dup"], r["dup_ratio"])
            for r in duplicate_passage_stats(docs, k=4).collect()
        }
        assert out[1] == (2, 1, 0.5)
        assert out[2] == (2, 1, 0.5)
        assert out[3] == (2, 0, 0.0)

    def test_intra_doc_repeat_counts_as_duplicated(self, spark):
        docs = _docs(spark, [(1, "a b a b a b")])  # gram "a b a b" occurs twice
        row = duplicate_passage_stats(docs, k=4).collect()[0]
        assert row["n_grams"] == 3
        assert row["n_dup"] == 2  # positions 0 and 2 share "a b a b"


class TestTokenJSDivergence:
    def test_identical_slices_zero(self, spark):
        docs = spark.createDataFrame(
            [(1, "x y z", "a"), (2, "x y z", "b")],
            "doc_id long, text string, side string",
        )
        row = token_js_divergence(docs, F.col("side") == "a").collect()[0]
        assert row["jsd"] == 0.0
        assert row["n_terms"] == 3
        assert row["n_tokens_a"] == 3 and row["n_tokens_b"] == 3

    def test_disjoint_slices_ln2(self, spark):
        docs = spark.createDataFrame(
            [(1, "x x", "a"), (2, "y y", "b")],
            "doc_id long, text string, side string",
        )
        row = token_js_divergence(docs, F.col("side") == "a").collect()[0]
        assert row["jsd"] == pytest.approx(math.log(2), abs=1e-6)


class TestRollingPercentiles:
    def test_trailing_hour_median(self, spark):
        rows = [
            (1, 101, datetime(2024, 1, 1, 10, 0), 1.0),
            (2, 101, datetime(2024, 1, 1, 10, 30), 3.0),
            (3, 101, datetime(2024, 1, 1, 11, 0), 5.0),  # frame: all three
            (4, 101, datetime(2024, 1, 1, 12, 30), 7.0),  # frame: itself only
            (5, 202, datetime(2024, 1, 1, 10, 15), 9.0),  # other subject
        ]
        df = spark.createDataFrame(
            rows, "event_id long, subject_id long, timestamp timestamp, value double"
        )
        out = {
            r["event_id"]: r["med"]
            for r in rolling_percentiles(df, "value", {"med": 0.5}, 3600.0).collect()
        }
        assert out[1] == 1.0
        assert out[2] == 2.0  # interpolated between 1 and 3
        assert out[3] == 3.0  # median of {1,3,5}; window inclusive both ends
        assert out[4] == 7.0
        assert out[5] == 9.0


class TestPageRank:
    def test_mass_conserved_and_sink_ranks_higher(self, spark):
        from eventstreamml_spark.operators.aggregations import pagerank

        # star: a->c, b->c, c->a  (c receives from two nodes)
        edges = spark.createDataFrame(
            [("a", "c"), ("b", "c"), ("c", "a")], "src string, dst string"
        )
        pr = {r["node"]: r["pr"] for r in pagerank(edges, n_iter=5).collect()}
        assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)
        assert pr["c"] > pr["a"] > pr["b"]

    def test_dangling_mass_redistributed(self, spark):
        from eventstreamml_spark.operators.aggregations import pagerank

        # b has no out-edges: its mass must be redistributed, not lost
        edges = spark.createDataFrame([("a", "b")], "src string, dst string")
        pr = {r["node"]: r["pr"] for r in pagerank(edges, n_iter=4).collect()}
        assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)

    def test_zero_out_weight_source_is_dangling(self, spark):
        """A source whose out-edges all weigh 0 propagates nothing —
        its mass must flow through the dangling term, not vanish as
        0/0 nulls (round-3 advice)."""
        from eventstreamml_spark.operators.aggregations import pagerank

        edges = spark.createDataFrame(
            [("a", "b", 1.0), ("b", "c", 0.0), ("c", "a", 1.0)],
            "src string, dst string, w double",
        )
        pr = {r["node"]: r["pr"] for r in pagerank(edges, n_iter=4, weight="w").collect()}
        assert len(pr) == 3
        assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)

    def test_weighted_edges_shift_rank(self, spark):
        from eventstreamml_spark.operators.aggregations import pagerank

        edges = spark.createDataFrame(
            [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
            "src string, dst string, w double",
        )
        pr = {r["node"]: r["pr"] for r in pagerank(edges, n_iter=6, weight="w").collect()}
        assert pr["b"] > pr["c"]


class TestCusum:
    def test_level_shift_scores_high_stable_scores_zeroish(self, spark):
        from eventstreamml_spark.operators.quality import cusum_changepoint

        rows = []
        for i in range(10):  # subject 1: mean jumps at i=5
            rows.append((i, 1, datetime(2024, 1, 1, i), 0.0 if i < 5 else 10.0))
        for i in range(10):  # subject 2: alternating, no drift
            rows.append((100 + i, 2, datetime(2024, 1, 1, i), float(i % 2)))
        df = spark.createDataFrame(
            rows, "event_id long, subject_id long, timestamp timestamp, value double"
        )
        out = {r["subject_id"]: r for r in cusum_changepoint(df).collect()}
        assert out[1]["cusum_max"] > out[2]["cusum_max"]
        # max |S| of the shifted subject is at the last pre-shift point
        assert out[1]["ts_at_max"] == datetime(2024, 1, 1, 4)

    def test_zero_variance_scores_zero(self, spark):
        from eventstreamml_spark.operators.quality import cusum_changepoint

        df = spark.createDataFrame(
            [(1, 1, datetime(2024, 1, 1), 5.0), (2, 1, datetime(2024, 1, 2), 5.0)],
            "event_id long, subject_id long, timestamp timestamp, value double",
        )
        row = cusum_changepoint(df).collect()[0]
        assert row["cusum_max"] == 0.0
        assert row["ts_at_max"] == datetime(2024, 1, 1)


class TestCountMinSketch:
    def test_overestimates_only_and_exact_for_sparse(self, spark):
        from eventstreamml_spark.operators.sketches import cms_build, cms_estimate

        data = [(v,) for v in [1] * 50 + [2] * 30 + [3] * 5]
        df = spark.createDataFrame(data, "x long")
        cms = cms_build(df, "x", width=64, depth=3)
        probes = spark.createDataFrame([(1,), (2,), (3,), (99,)], "p long")
        est = {r["probe"]: r["est"] for r in cms_estimate(cms, probes, "p", width=64, depth=3).collect()}
        assert est[1] >= 50 and est[2] >= 30 and est[3] >= 5  # never underestimates
        # 3 distinct keys in 64 buckets x 3 rows: min over rows is exact
        assert est[1] == 50 and est[2] == 30 and est[3] == 5
        assert est[99] == 0

    def test_sketch_size_bounded(self, spark):
        from eventstreamml_spark.operators.sketches import cms_build

        df = spark.range(10000).select((F.col("id") % 997).alias("x"))
        cms = cms_build(df, "x", width=32, depth=3)
        assert cms.count() <= 32 * 3


class TestWeightedSample:
    def test_deterministic_and_k_bounded(self, spark):
        from eventstreamml_spark.operators.setops import weighted_sample_topk

        df = spark.createDataFrame(
            [(i, "s", float(i % 7) + 0.5) for i in range(100)],
            "event_id long, stratum string, w double",
        )
        a = weighted_sample_topk(df, "w", 10, stratum_col="stratum").collect()
        b = weighted_sample_topk(df, "w", 10, stratum_col="stratum").collect()
        assert sorted(r["event_id"] for r in a) == sorted(r["event_id"] for r in b)
        assert len(a) == 10 and {r["rk"] for r in a} == set(range(1, 11))

    def test_nonpositive_weights_excluded(self, spark):
        from eventstreamml_spark.operators.setops import weighted_sample_topk

        df = spark.createDataFrame(
            [(1, 1.0), (2, 0.0), (3, -2.0), (4, None)],
            "event_id long, w double",
        )
        out = weighted_sample_topk(df, "w", 10).collect()
        assert [r["event_id"] for r in out] == [1]

    def test_heavier_weights_win_on_average(self, spark):
        from eventstreamml_spark.operators.setops import weighted_sample_topk

        # ids 0..49 weight 100, ids 50..99 weight 0.01: the sample
        # should be dominated by heavy ids
        df = spark.createDataFrame(
            [(i, 100.0 if i < 50 else 0.01) for i in range(100)],
            "event_id long, w double",
        )
        out = weighted_sample_topk(df, "w", 20).collect()
        heavy = sum(1 for r in out if r["event_id"] < 50)
        assert heavy >= 18


class TestMergeMoments:
    def test_merge_equals_recompute(self, spark):
        from eventstreamml_spark.operators.aggregations import (
            merge_moments,
            moments_of,
        )

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 14.0)],
            "k string, v double",
        )
        base = moments_of(df.filter(F.col("v") <= 2.0), "v", ["k"])
        delta = moments_of(df.filter(F.col("v") > 2.0), "v", ["k"])
        merged = {r["k"]: r for r in merge_moments(base, delta, ["k"]).collect()}
        direct = {r["k"]: r for r in moments_of(df, "v", ["k"]).collect()}
        for k in ("a", "b"):
            assert merged[k]["n"] == direct[k]["n"]
            assert merged[k]["s1"] == pytest.approx(direct[k]["s1"])
            assert merged[k]["s2"] == pytest.approx(direct[k]["s2"])
        assert merged["a"]["mean"] == pytest.approx(2.0)
        assert merged["a"]["std"] == pytest.approx(1.0)

    def test_new_key_only_in_delta_survives(self, spark):
        from eventstreamml_spark.operators.aggregations import merge_moments

        base = spark.createDataFrame([("a", 2, 3.0, 5.0)], "k string, n long, s1 double, s2 double")
        delta = spark.createDataFrame([("z", 1, 4.0, 16.0)], "k string, n long, s1 double, s2 double")
        out = {r["k"]: r for r in merge_moments(base, delta, ["k"]).collect()}
        assert out["z"]["n"] == 1 and out["z"]["mean"] == 4.0
        assert out["z"]["std"] is None  # n <= 1: sample std undefined
        assert out["a"]["n"] == 2


class TestBigramPMI:
    def test_collocation_scores_above_independent_pair(self, spark):
        from eventstreamml_spark.operators.text import bigram_pmi

        # "x y" always adjacent (perfect collocation); p follows y in
        # only half its occurrences, so ("y","p") is weaker
        rows = [
            (i, "x y p r" if i % 2 == 0 else "p x y s") for i in range(20)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {(r["w1"], r["w2"]): r["pmi"] for r in bigram_pmi(docs, min_count=5).collect()}
        assert ("x", "y") in out and ("y", "p") in out
        assert out[("x", "y")] > out[("y", "p")]
