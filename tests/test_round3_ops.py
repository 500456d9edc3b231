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
