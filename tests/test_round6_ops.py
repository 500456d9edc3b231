"""Round-6 regression pins for the round-6 ADVICE findings: null- and
zero-denominator edges that current fixtures never exercise but one
data drop away would crash a query (ANSI DIVIDE_BY_ZERO, np.stack on
NULL) or silently break oracle parity (concat_ws null-skipping,
count(*) vs count(DISTINCT), equi-join dropping a NULL-key group).

Each test writes a tiny synthetic parquet table that HAS the edge and
runs the full Spark-vs-DuckDB compare on it, so the fix is pinned at
the same contract the driver checks.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from eventstreamml_spark import queries as q
from tests.oracle import compare

US = 1_000_000


def _write_events(dirpath: str, rows: list[tuple]) -> str:
    """rows: (event_id, ts_us, user_id, event_type, value, props)."""
    cols = list(zip(*rows))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(dirpath, "events.parquet"))
    return dirpath


def _ev(eid, ts_us, uid, etype="click", value=1.0, props="{}"):
    return (eid, ts_us, uid, etype, value, props)


class TestBurstinessZeroMeanGap:
    def test_identical_timestamps_null_not_crash(self, spark, tmp_path):
        # subject 1: 3 events at the SAME instant -> mean gap 0 ->
        # sd/m and (sd-m)/(sd+m) must be NULL on both sides, not a
        # DIVIDE_BY_ZERO crash under ANSI mode
        t0 = 1_700_000_000 * US
        rows = [
            _ev(1, t0, 1),
            _ev(2, t0, 1),
            _ev(3, t0, 1),
            _ev(4, t0, 2),
            _ev(5, t0 + 10 * US, 2),
            _ev(6, t0 + 40 * US, 2),
        ]
        sf = _write_events(str(tmp_path), rows)
        fn, sql = q._REGISTRY["subject_burstiness"]
        compare(spark, sf, fn, sql)
        got = {r["user_id"]: r for r in fn(spark, sf).collect()}
        assert got[1]["cv"] is None and got[1]["burstiness"] is None
        assert got[2]["cv"] is not None and got[2]["burstiness"] is not None


class TestRollingActivesNullSubject:
    def test_null_subject_excluded_both_sides(self, spark, tmp_path):
        t0 = 1_700_000_000 * US
        day = 86_400 * US
        rows = [
            _ev(1, t0, 1),
            _ev(2, t0, 2),
            _ev(3, t0, None),  # NULL subject on day 0
            _ev(4, t0 + day, 1),
            _ev(5, t0 + 2 * day, None),  # a day with ONLY a NULL subject
        ]
        sf = _write_events(str(tmp_path), rows)
        fn, sql = q._REGISTRY["rolling_active_users_7d"]
        compare(spark, sf, fn, sql)
        got = {str(r["day"]): r for r in fn(spark, sf).collect()}
        # day 0 has users {1,2} plus a NULL row -> 2, not 3
        assert got["2023-11-14"]["n_active_today"] == 2

    def test_unit_count_distinct(self, spark):
        from eventstreamml_spark.operators.windows import (
            rolling_distinct_subjects,
        )

        df = spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00"),
                (2, "2024-01-01 01:00:00"),
                (None, "2024-01-01 02:00:00"),
            ],
            "user_id long, ts string",
        ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        out = rolling_distinct_subjects(df, "user_id", "ts", 7).collect()
        assert len(out) == 1
        assert out[0]["n_active_today"] == 2
        assert out[0]["n_active"] == 2


class TestUpsertChecksumNullId:
    def test_null_user_id_checksum_parity(self, spark, tmp_path):
        t0 = 1_700_000_000 * US
        rows = [
            _ev(1, t0, 1, "purchase", 10.0),
            _ev(2, t0, None, "click", 2.0),  # NULL user_id
            _ev(3, t0, 3, "view", None),  # NULL value
        ]
        sf = _write_events(str(tmp_path), rows)
        fn, sql = q._REGISTRY["events_upsert_merge"]
        compare(spark, sf, fn, sql)
        # the NULL-id row still contributes a non-null hash term
        total = (
            fn(spark, sf)
            .agg(F.sum("id_checksum").alias("s"), F.sum("n").alias("n"))
            .collect()[0]
        )
        assert total["n"] == 3 and total["s"] is not None


class TestSpcNullGroup:
    def test_null_key_group_keeps_row(self, spark, tmp_path):
        t0 = 1_700_000_000 * US
        rows = [_ev(i, t0 + i * US, i, None, float(i)) for i in range(1, 6)]
        rows += [
            _ev(10 + i, t0 + i * US, i, "click", float(i))
            for i in range(1, 6)
        ]
        sf = _write_events(str(tmp_path), rows)
        fn, sql = q._REGISTRY["spc_value_control_limits"]
        compare(spark, sf, fn, sql)
        types = {r["event_type"] for r in fn(spark, sf).collect()}
        assert None in types and "click" in types

    def test_unit_null_group(self, spark):
        from eventstreamml_spark.operators.stats import spc_control_limits

        df = spark.createDataFrame(
            [(None, 1.0), (None, 2.0), (None, 3.0), ("a", 5.0), ("a", 7.0)],
            "g string, x double",
        )
        out = {r["g"]: r for r in spc_control_limits(df, "x", "g").collect()}
        assert None in out and out[None]["n"] == 3


class TestMadApproxPath:
    def test_approx_tracks_exact(self, spark):
        from eventstreamml_spark.preprocessing.outliers import (
            mad_outlier_bounds,
        )

        df = spark.range(20_000).select(
            (F.col("id") % 4).cast("string").alias("event_type"),
            # deterministic heavy-tailed-ish values, a few huge outliers
            (
                F.pmod(F.col("id") * 2654435761, F.lit(1000)).cast("double")
                + F.when(F.col("id") % 997 == 0, 1e6).otherwise(0.0)
            ).alias("value"),
        )
        exact = {
            r["event_type"]: r
            for r in mad_outlier_bounds(df, approx=False).collect()
        }
        approx = {
            r["event_type"]: r
            for r in mad_outlier_bounds(df, approx=True).collect()
        }
        assert exact.keys() == approx.keys()
        for k, e in exact.items():
            a = approx[k]
            assert a["n"] == e["n"]
            # rank error <= n/accuracy = 5000/10000 rows: on this value
            # grid that is a <=1% relative error on median and MAD
            assert abs(a["median"] - e["median"]) <= 0.01 * max(
                1.0, abs(e["median"])
            )
            assert abs(a["mad"] - e["mad"]) <= 0.01 * max(1.0, abs(e["mad"]))
            # the huge outliers are flagged on both paths
            assert a["n_outliers"] == e["n_outliers"]


class TestPcaNullEmbedding:
    def test_null_vector_filtered_not_crash(self, spark, tmp_path):
        import numpy as np

        rng = np.random.default_rng(7)
        vecs = [
            [float(x) for x in rng.normal(size=64).astype(np.float32)]
            for _ in range(20)
        ]
        emb = pa.table(
            {
                "vec_id": pa.array(list(range(21)), pa.int64()),
                "embedding": pa.array(
                    vecs + [None], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * 21, pa.int32()),
            }
        )
        pq.write_table(
            emb, os.path.join(str(tmp_path), "embeddings.parquet")
        )
        fn, sql = q._REGISTRY["embedding_pca_top_component"]
        compare(spark, str(tmp_path), fn, sql)
        out = fn(spark, str(tmp_path)).collect()
        assert len(out) == 64
        assert all(r["loading"] is not None for r in out)


class TestRound6Stats:
    def test_mann_whitney_known_values(self, spark):
        from eventstreamml_spark.operators.stats import mann_whitney_u

        df = spark.createDataFrame(
            [(0, 1.0), (0, 2.0), (0, 3.0), (1, 4.0), (1, 5.0), (1, 6.0)],
            "arm int, x double",
        )
        r = mann_whitney_u(df, "arm", "x").collect()[0]
        assert r["n_arms"] == 2 and r["n_a"] == 3 and r["n_b"] == 3
        # R_a = 1+2+3 = 6 -> U1 = 0; z = -4.5/sqrt(5.25)
        assert r["u_stat"] == 0.0
        assert abs(r["z"] - (-4.5 / 5.25**0.5)) < 1e-5

    def test_mann_whitney_three_arms_nulls(self, spark):
        from eventstreamml_spark.operators.stats import mann_whitney_u

        rows = [(a, float(v)) for a in (0, 1, 2) for v in range(5)]
        r = mann_whitney_u(
            spark.createDataFrame(rows, "arm int, x double"), "arm", "x"
        ).collect()[0]
        assert r["n_arms"] == 3
        assert r["u_stat"] is None and r["z"] is None

    def test_kruskal_wallis_identical_groups(self, spark):
        from eventstreamml_spark.operators.stats import kruskal_wallis

        # identical distributions -> H near 0; k and dof exact
        rows = [(g, float(v)) for g in ("a", "b", "c") for v in range(10)]
        r = kruskal_wallis(
            spark.createDataFrame(rows, "g string, x double"), "g", "x"
        ).collect()[0]
        assert r["k_groups"] == 3 and r["dof"] == 2 and r["n"] == 30
        assert abs(r["h_stat"]) < 1e-6
        assert abs(r["h_tie_corrected"]) < 1e-6

    def test_bayes_posterior_directional(self, spark):
        from eventstreamml_spark.operators.stats import (
            bayes_ab_beta_posterior,
        )

        rows = [(0, 0), (0, 1), (1, 1), (1, 1)]
        r = bayes_ab_beta_posterior(
            spark.createDataFrame(rows, "arm int, converted int"),
            "arm",
            "converted",
        ).collect()[0]
        assert r["post_mean_a"] == 0.5  # Beta(2,2)
        assert r["post_mean_b"] == 0.75  # Beta(3,1)
        assert r["p_b_gt_a"] > 0.5

    def test_power_mde_sane(self, spark):
        from eventstreamml_spark.operators.stats import ab_power_mde

        rows = [(i % 2, float(100 + (i * 37) % 50)) for i in range(2000)]
        r = ab_power_mde(
            spark.createDataFrame(rows, "arm int, x double"), "arm", "x"
        ).collect()[0]
        assert r["n_a"] == 1000 and r["n_b"] == 1000
        assert r["mde_abs"] > 0 and r["n_per_arm_for_rel_effect"] > 0
        # detecting a 5%-of-mean lift (~5.6 units) with sd~14 needs few
        # hundred per arm, not millions
        assert 10 < r["n_per_arm_for_rel_effect"] < 100_000

    def test_theil_sen_hand_computed(self, spark):
        from eventstreamml_spark.operators.stats import theil_sen_trend

        rows = [
            (1, "2024-01-01 00:00:00", 0.0),
            (1, "2024-01-01 00:00:01", 1.0),
            (1, "2024-01-01 00:00:02", 2.0),
            (1, "2024-01-01 00:00:03", 103.0),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
        )
        r = theil_sen_trend(df, "user_id", "ts", "value").collect()[0]
        assert r["n_points"] == 4 and r["n_pairs"] == 6
        # slopes/sec: 1,1,1, 103/3, 51, 101 -> median = (1 + 34.3333)/2
        assert abs(r["slope_per_sec"] - (1 + 103 / 3) / 2) < 1e-4

    def test_theil_sen_equal_ts_pairs_excluded(self, spark):
        from eventstreamml_spark.operators.stats import theil_sen_trend

        rows = [
            (1, "2024-01-01 00:00:00", 0.0),
            (1, "2024-01-01 00:00:00", 5.0),
            (1, "2024-01-01 00:00:01", 1.0),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
        )
        r = theil_sen_trend(df, "user_id", "ts", "value").collect()[0]
        assert r["n_pairs"] == 2  # the equal-ts pair contributes nothing


class TestClassicalStatsBatch:
    """Hand-computed pins for the round-6 classical-stats operators."""

    def test_spearman_monotone_and_anti(self, spark):
        from eventstreamml_spark.operators.stats import spearman_corr

        rows = [("g", float(i), float(i * 2)) for i in range(1, 6)] + [
            ("h", float(i), float(10 - i)) for i in range(1, 6)
        ]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        out = {r["g"]: r["spearman_rho"] for r in
               spearman_corr(df, "g", "x", "y").collect()}
        assert out["g"] == 1.0 and out["h"] == -1.0

    def test_spearman_ties_midrank(self, spark):
        from eventstreamml_spark.operators.stats import spearman_corr

        # x = [1,2,2,3], y = [1,2,3,4]: midranks x = [1,2.5,2.5,4]
        # rho = Pearson([1,2.5,2.5,4],[1,2,3,4]) = 4.5/sqrt(4.5*5)
        #     = 0.9486832980505138
        df = spark.createDataFrame(
            [("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 2.0, 3.0), ("g", 3.0, 4.0)],
            "g string, x double, y double",
        )
        rho = spearman_corr(df, "g", "x", "y").collect()[0]["spearman_rho"]
        assert abs(rho - 0.948683) < 1e-5

    def test_anova_identical_groups_f_zero(self, spark):
        from eventstreamml_spark.operators.stats import anova_oneway

        rows = [("a", v) for v in (1.0, 2.0, 3.0)] + [
            ("b", v) for v in (1.0, 2.0, 3.0)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r = anova_oneway(df, "g", "v").collect()[0]
        assert r["k_groups"] == 2 and r["n_total"] == 6
        assert r["f_stat"] == 0.0 and r["eta_sq"] == 0.0

    def test_anova_known_f(self, spark):
        from eventstreamml_spark.operators.stats import anova_oneway

        # groups [1,2,3] vs [4,5,6]: ssb = 13.5, ssw = 4, F = 13.5/(4/4) = 13.5
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
                ("b", 4.0), ("b", 5.0), ("b", 6.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = anova_oneway(df, "g", "v").collect()[0]
        assert abs(r["f_stat"] - 13.5) < 1e-9

    def test_anova_single_group_nulls_stat(self, spark):
        from eventstreamml_spark.operators.stats import anova_oneway

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0)], "g string, v double"
        )
        r = anova_oneway(df, "g", "v").collect()[0]
        assert r["f_stat"] is None

    def test_brown_forsythe_equal_spread(self, spark):
        from eventstreamml_spark.operators.stats import brown_forsythe

        # same |x - median| multiset in both groups -> BF stat 0
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
                ("b", 11.0), ("b", 12.0), ("b", 13.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = brown_forsythe(df, "g", "v").collect()[0]
        assert r["bf_stat"] == 0.0

    def test_two_proportion_known_z(self, spark):
        from eventstreamml_spark.operators.stats import two_proportion_ztest

        # arm 0: 30/100, arm 1: 45/100 -> pooled 0.375,
        # se = sqrt(0.375*0.625*0.02) = 0.068465...; z = 0.15/se = 2.190890
        rows = [(0, i < 30) for i in range(100)] + [
            (1, i < 45) for i in range(100)
        ]
        df = spark.createDataFrame(rows, "arm int, converted boolean")
        r = two_proportion_ztest(df, "arm", "converted").collect()[0]
        assert r["n_a"] == 100 and r["succ_a"] == 30 and r["succ_b"] == 45
        assert abs(r["z_stat"] - 2.19089) < 1e-5
        assert 0 < r["p_value"] < 0.05

    def test_two_proportion_degenerate_nulls(self, spark):
        from eventstreamml_spark.operators.stats import two_proportion_ztest

        rows = [(0, True)] * 5 + [(1, True)] * 5
        df = spark.createDataFrame(rows, "arm int, converted boolean")
        r = two_proportion_ztest(df, "arm", "converted").collect()[0]
        assert r["z_stat"] is None and r["p_value"] is None

    def test_poisson_rate_ratio_known(self, spark):
        from eventstreamml_spark.operators.stats import poisson_rate_ratio

        # n_a=50, n_b=100: RR=2, z = ln(2)/sqrt(0.02+0.01) = 4.001887
        rows = [(0,)] * 50 + [(1,)] * 100
        df = spark.createDataFrame(rows, "arm int")
        r = poisson_rate_ratio(df, "arm").collect()[0]
        assert r["rate_ratio"] == 2.0
        assert abs(r["z_stat"] - 4.001887) < 1e-5

    def test_bh_fdr_textbook(self, spark):
        from eventstreamml_spark.operators.stats import bh_fdr

        df = spark.createDataFrame(
            [("t1", 0.01), ("t2", 0.02), ("t3", 0.03), ("t4", 0.04),
             ("t5", 0.20)],
            "test_id string, p double",
        )
        out = {r["test_id"]: r for r in
               bh_fdr(df, "test_id", "p", alpha=0.05).collect()}
        # m*p/i = [.05,.05,.05,.05,.2]; reverse running min keeps them
        for t in ("t1", "t2", "t3", "t4"):
            assert out[t]["p_adj"] == 0.05 and out[t]["reject"]
        assert out["t5"]["p_adj"] == 0.2 and not out["t5"]["reject"]

    def test_bh_fdr_monotone_adjustment(self, spark):
        from eventstreamml_spark.operators.stats import bh_fdr

        # p = [0.03, 0.04]: m*p/i = [0.06, 0.04] -> rev-min -> [0.04, 0.04]
        df = spark.createDataFrame(
            [("a", 0.03), ("b", 0.04)], "test_id string, p double"
        )
        out = {r["test_id"]: r["p_adj"] for r in
               bh_fdr(df, "test_id", "p").collect()}
        assert out["a"] == 0.04 and out["b"] == 0.04


class TestExperimentDesignBatch:
    def test_sprt_crosses_reject(self, spark):
        from eventstreamml_spark.operators.stats import sprt_bernoulli
        import math
        from datetime import datetime

        # 3 days, 100 obs/day at 60% success with H0 p=0.3 vs H1 p=0.4:
        # daily llr = 60*ln(4/3) + 40*ln(0.6/0.7) = 11.093 -> crosses
        # ln(19)=2.944 on day 1 already
        rows = []
        for d in range(3):
            for i in range(100):
                rows.append((0, datetime(2024, 1, d + 1, 12), i < 60))
        df = spark.createDataFrame(rows, "arm int, ts timestamp, conv boolean")
        out = sprt_bernoulli(df, "arm", "ts", "conv", p0=0.3, p1=0.4)
        rows_out = sorted(out.collect(), key=lambda r: r["day"])
        day1 = 60 * math.log(0.4 / 0.3) + 40 * math.log(0.6 / 0.7)
        assert abs(rows_out[0]["llr_cum"] - round(day1, 6)) < 1e-9
        assert all(r["decision"] == "reject_h0" for r in rows_out)
        assert abs(rows_out[2]["llr_cum"] - round(3 * day1, 6)) < 1e-6

    def test_sprt_continues_at_null_rate(self, spark):
        from eventstreamml_spark.operators.stats import sprt_bernoulli
        from datetime import datetime

        # exactly between p0 and p1 -> llr hovers near 0 -> continue
        rows = [
            (0, datetime(2024, 1, 1, 12), i < 35) for i in range(100)
        ]
        df = spark.createDataFrame(rows, "arm int, ts timestamp, conv boolean")
        r = sprt_bernoulli(df, "arm", "ts", "conv", p0=0.3, p1=0.4).collect()[0]
        assert r["decision"] == "continue"

    def test_t_closeness_identical_group_zero_emd(self, spark):
        from eventstreamml_spark.operators.stats import t_closeness

        # two groups with the same value multiset: both EMD 0
        rows = [("a", float(v)) for v in range(10)] + [
            ("b", float(v)) for v in range(10)
        ]
        df = spark.createDataFrame(rows, "grp string, value double")
        out = {r["grp"]: r for r in
               t_closeness(df, "grp", "value").collect()}
        assert out["a"]["emd"] == 0.0 and not out["a"]["violates_t"]
        assert out["b"]["emd"] == 0.0

    def test_t_closeness_skewed_group_flagged(self, spark):
        from eventstreamml_spark.operators.stats import t_closeness

        # group "lo" sits entirely in bin 0, "hi" entirely in bin 9:
        # global is 50/50, each group EMD = sum|cum diff|/9
        rows = [("lo", 0.0)] * 10 + [("hi", 100.0)] * 10
        df = spark.createDataFrame(rows, "grp string, value double")
        out = {r["grp"]: r for r in
               t_closeness(df, "grp", "value", t=0.15).collect()}
        # lo: p=[1,0..], pg=[.5,0...,.5]; cumdiff = .5 for all 9 gaps
        # (bins 0..8), last bin cum is 0 -> emd = (9*0.5 - 0.5 + 0.5*0)/9
        assert out["lo"]["emd"] == 0.5 and out["lo"]["violates_t"]
        assert out["hi"]["emd"] == 0.5 and out["hi"]["violates_t"]


class TestTimeSeriesBatch:
    def test_peak_concurrency_hand_case(self, spark):
        from eventstreamml_spark.operators.windows import (
            peak_concurrency_by_day,
        )
        from datetime import datetime

        # day 0: [0,10], [5,15], [12,20] -> peak 2 (at t=5 and t=12;
        # end-at-12 still open at 12 under the closed convention ->
        # conc(12) = 3 starts - 1 end(<12)... end of [0,10] is <12 ->
        # conc(12)=2); day 1: one interval -> peak 1, plus carry from
        # a session spanning midnight
        d0 = datetime(2024, 1, 1)
        rows = [
            (datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 10)),
            (datetime(2024, 1, 1, 0, 5), datetime(2024, 1, 1, 0, 15)),
            (datetime(2024, 1, 1, 0, 12), datetime(2024, 1, 1, 0, 20)),
            # spans midnight into day 2
            (datetime(2024, 1, 1, 23, 50), datetime(2024, 1, 2, 0, 30)),
            (datetime(2024, 1, 2, 0, 10), datetime(2024, 1, 2, 0, 20)),
        ]
        df = spark.createDataFrame(
            rows, "session_start timestamp, session_end timestamp"
        )
        out = {r["day_index"]: r["peak_concurrency"] for r in
               peak_concurrency_by_day(df).collect()}
        base = 19723  # 2024-01-01 epoch days
        assert out[base] == 2
        # day 2: midnight-spanner still open (carry) + new session -> 2
        assert out[base + 1] == 2

    def test_peak_concurrency_end_at_start_overlaps(self, spark):
        from eventstreamml_spark.operators.windows import (
            peak_concurrency_by_day,
        )
        from datetime import datetime

        # [0,10] and [10,20]: at t=10 the first has NOT ended (end<t is
        # strict) -> peak 2 under the closed-interval convention
        rows = [
            (datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 10)),
            (datetime(2024, 1, 1, 0, 10), datetime(2024, 1, 1, 0, 20)),
        ]
        df = spark.createDataFrame(
            rows, "session_start timestamp, session_end timestamp"
        )
        out = peak_concurrency_by_day(df).collect()
        assert out[0]["peak_concurrency"] == 2

    def test_watermark_lateness_hand_case(self, spark):
        from eventstreamml_spark.operators.windows import watermark_lateness
        from datetime import datetime, timedelta

        t0 = datetime(2024, 1, 1)
        # arrival order 1..4; event 3 is 20 min behind the watermark
        # set by event 2 -> late at threshold 900s; event 4 in order
        rows = [
            (1, t0, "a"),
            (2, t0 + timedelta(minutes=30), "a"),
            (3, t0 + timedelta(minutes=10), "a"),   # 20 min late
            (4, t0 + timedelta(minutes=31), "b"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )
        out = {r["event_type"]: r for r in watermark_lateness(
            df, bucket_size=2).collect()}
        assert out["a"]["n_events"] == 3 and out["a"]["n_late"] == 1
        assert out["a"]["max_lateness_sec"] == 1200.0
        assert out["b"]["n_late"] == 0

    def test_watermark_lateness_cross_bucket_carry(self, spark):
        from eventstreamml_spark.operators.windows import watermark_lateness
        from datetime import datetime, timedelta

        t0 = datetime(2024, 1, 1)
        # bucket_size=2: event 3 opens bucket 2 with no local history;
        # its watermark must come from bucket 0's carry (event 2's ts)
        rows = [
            (0, t0 + timedelta(hours=2), "a"),
            (1, t0 + timedelta(hours=3), "a"),
            (2, t0, "a"),  # 3h behind carry watermark
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )
        r = watermark_lateness(df, bucket_size=2).collect()[0]
        assert r["n_late"] == 1 and r["max_lateness_sec"] == 10800.0


class TestEvalBatch:
    def test_regression_metrics_perfect_prediction(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            regression_metrics,
        )

        df = spark.createDataFrame(
            [("a", 1.0, 1.0), ("a", 2.0, 2.0), ("a", 3.0, 3.0)],
            "g string, y double, f double",
        )
        r = regression_metrics(df, "y", "f", "g").collect()[0]
        assert r["rmse"] == 0.0 and r["mae"] == 0.0 and r["r2"] == 1.0

    def test_regression_metrics_known_values(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            regression_metrics,
        )

        # y=[1,2,3,4], f=[2,2,2,2]: errors [-1,0,1,2]
        # rmse=sqrt(6/4)=1.224745, mae=1.0, sst=5, r2=1-6/5=-0.2
        rows = [("a", 1.0, 2.0), ("a", 2.0, 2.0), ("a", 3.0, 2.0),
                ("a", 4.0, 2.0)]
        df = spark.createDataFrame(rows, "g string, y double, f double")
        r = regression_metrics(df, "y", "f", "g").collect()[0]
        assert abs(r["rmse"] - 1.224745) < 1e-6
        assert r["mae"] == 1.0
        assert abs(r["r2"] - (-0.2)) < 1e-9

    def test_regression_metrics_constant_truth_nulls_r2(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            regression_metrics,
        )

        df = spark.createDataFrame(
            [("a", 5.0, 4.0), ("a", 5.0, 6.0)], "g string, y double, f double"
        )
        r = regression_metrics(df, "y", "f", "g").collect()[0]
        assert r["r2"] is None and r["rmse"] == 1.0

    def test_brier_identity_closes(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            brier_decomposition,
        )

        rows = [(1, 0.9), (0, 0.9), (1, 0.8), (1, 0.3), (0, 0.2), (0, 0.1)]
        df = spark.createDataFrame(rows, "y int, p double")
        r = brier_decomposition(df, "y", "p", n_bins=10).collect()[0]
        # BS = reliability - resolution + uncertainty + within_bin_var
        # (binned identity; within-bin variance of p is the residual)
        lhs = r["brier"]
        rhs = (r["reliability"] - r["resolution"] + r["uncertainty"]
               + r["within_bin_var"])
        assert abs(lhs - rhs) < 5e-6
        assert r["n"] == 6

    def test_brier_perfect_calibration_zero_reliability(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            brier_decomposition,
        )

        # bin 0.35: 2 of 4 positive -> pbar 0.35 vs ybar 0.5; use p
        # exactly equal to within-bin base rate for zero reliability
        rows = [(1, 0.5), (0, 0.5), (1, 0.5), (0, 0.5)]
        df = spark.createDataFrame(rows, "y int, p double")
        r = brier_decomposition(df, "y", "p", n_bins=10).collect()[0]
        assert r["reliability"] == 0.0 and r["resolution"] == 0.0
        assert r["uncertainty"] == 0.25 and r["brier"] == 0.25


class TestTextCorpusBatch:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_rake_hand_case(self, spark):
        from eventstreamml_spark.operators.text import rake_keyphrases

        # "deep learning" appears twice as a phrase; "deep" also alone.
        # deg(deep)=2+2+1=5, freq=3 -> 5/3; deg(learning)=4, freq=2 -> 2
        # score("deep learning") = 5/3 + 2 = 3.666667; score("deep")=5/3
        docs = self._docs(spark, [
            (1, "deep learning is the deep learning of it"),
            (2, "deep and shallow"),
        ])
        out = {r["phrase"]: r for r in
               rake_keyphrases(docs, top_k=10).collect()}
        assert abs(out["deep learning"]["score"] - 3.666667) < 1e-6
        assert out["deep learning"]["n_occurrences"] == 2
        assert abs(out["deep"]["score"] - 1.666667) < 1e-6
        assert out["shallow"]["score"] == 1.0

    def test_rake_rank_deterministic_ties(self, spark):
        from eventstreamml_spark.operators.text import rake_keyphrases

        docs = self._docs(spark, [(1, "alpha and beta and gamma")])
        out = rake_keyphrases(docs, top_k=3).collect()
        # all singleton phrases score 1.0; rank order = phrase asc
        assert [r["phrase"] for r in out] == ["alpha", "beta", "gamma"]

    def test_heaps_monotone_curve(self, spark):
        from eventstreamml_spark.operators.text import heaps_law_fit

        # vocabulary growth slower than token growth -> 0 < b < 1
        docs = self._docs(spark, [
            (i, " ".join(f"w{j % (5 + i)}" for j in range(20)))
            for i in range(1, 11)
        ])
        r = heaps_law_fit(docs).collect()[0]
        assert r["n_docs"] == 10
        assert 0.0 < r["slope_b"] < 1.0
        assert r["r2"] is not None and r["r2"] > 0.5

    def test_bigram_lm_prefers_in_domain_order(self, spark):
        from eventstreamml_spark.operators.text import bigram_lm_nll

        # train docs (even ids) all use the bigram "a b" repeatedly;
        # test doc 1 repeats it (low nll), test doc 3 reverses (high)
        docs = self._docs(spark, [
            (0, "a b a b a b a b"),
            (2, "a b a b a b"),
            (1, "a b a b"),
            (3, "b a b a"),
        ])
        out = {r["doc_id"]: r for r in bigram_lm_nll(docs).collect()}
        assert out[1]["avg_nll"] < out[3]["avg_nll"]
        assert out[1]["ppl"] < out[3]["ppl"]
        assert out[1]["n_bigrams"] == 3

    def test_bloom_audit_no_false_negatives(self, spark):
        from eventstreamml_spark.operators.sketches import (
            bloom_membership_audit,
        )

        build = spark.range(0, 50).select(F.col("id").alias("key"))
        probe = spark.range(0, 500).select(F.col("id").alias("key"))
        r = bloom_membership_audit(build, probe, m_bits=4096,
                                   k_hashes=3).collect()[0]
        # bloom filters never miss a member
        assert r["n_true_pos"] == 50
        assert r["n_build_keys"] == 50 and r["n_probes"] == 500
        assert r["n_candidates"] == 50 + r["n_false_pos"]
        # at n=50,m=4096,k=3 theoretical fpr ~ 4e-5: measured near it
        assert r["fpr_measured"] <= 0.05
        assert 0.0 <= r["fpr_theoretical"] < 0.001


class TestGraphAuditBatch:
    def test_assortativity_star_graph_negative(self, spark, tmp_path):
        # hub-and-spoke transitions: hub type "h" alternating with
        # distinct leaves -> high-degree hub connects to low-degree
        # leaves -> assortativity < 0; parity-checked vs DuckDB
        t0 = 1_700_000_000 * US
        rows, eid = [], 1
        for u, leaf in enumerate(["a", "b", "c", "d"]):
            for i in range(3):
                rows.append(_ev(eid, t0 + eid * US, u, "h"))
                eid += 1
                rows.append(_ev(eid, t0 + eid * US, u, leaf))
                eid += 1
        sf = _write_events(str(tmp_path), rows)
        fn, sql = q._REGISTRY["graph_degree_assortativity"]
        compare(spark, sf, fn, sql)
        r = fn(spark, sf).collect()[0]
        assert r["assortativity"] < 0

    def test_session_path_truncates_at_8(self, spark, tmp_path):
        t0 = 1_700_000_000 * US
        # one 12-event session: path must contain exactly 8 steps
        rows = [_ev(i, t0 + i * US, 1, "click") for i in range(1, 13)]
        sf = _write_events(str(tmp_path), rows)
        fn, sql = q._REGISTRY["session_path_topk"]
        compare(spark, sf, fn, sql)
        r = fn(spark, sf).collect()[0]
        assert r["path"].count(">") == 7 and r["n_sessions"] == 1

    def test_join_skew_audit_detects_hot_key(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import os
        from datetime import datetime

        n_hot, n_cold = 50, 10
        keys = [1] * n_hot + list(range(2, 2 + n_cold))
        table = pa.table({
            "o_orderkey": pa.array(range(len(keys)), pa.int64()),
            "o_custkey": pa.array(keys, pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(keys)),
            "o_totalprice": pa.array([1.0] * len(keys), pa.float64()),
            "o_orderdate": pa.array([datetime(2024, 1, 1)] * len(keys),
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * len(keys)),
        })
        pq.write_table(table, os.path.join(str(tmp_path), "orders.parquet"))
        fn, sql = q._REGISTRY["join_skew_key_audit"]
        compare(spark, str(tmp_path), fn, sql)
        top = fn(spark, str(tmp_path)).collect()[0]
        # hot key 1: 50 rows of 60 total over 11 keys; mean = 60/11
        assert top["key"] == 1 and top["n"] == 50
        assert abs(top["skew_ratio"] - 50 / (60 / 11)) < 1e-6


class TestDriftQualityBatch:
    def test_dq_uniqueness_flags_duplicates(self, spark, tmp_path):
        t0 = 1_700_000_000 * US
        # event_id 1 appears 3x, id 2 once
        rows = [_ev(1, t0, 1), _ev(1, t0 + US, 1), _ev(1, t0 + 2 * US, 2),
                _ev(2, t0, 3)]
        sf = _write_events(str(tmp_path), rows)
        fn, sql = q._REGISTRY["dq_uniqueness_audit"]
        compare(spark, sf, fn, sql)
        r = fn(spark, sf).collect()[0]
        assert r["n_rows"] == 4 and r["n_keys"] == 2
        assert r["n_dup_rows"] == 2 and r["max_key_multiplicity"] == 3
        assert r["dup_ratio"] == 0.5

    def test_seasonality_strength_pure_periodic(self, spark, tmp_path):
        t0 = (1_700_000_000 // 604800) * 604800 * US  # week-aligned
        rows, eid = [], 1
        # two weeks: hour-of-week slot 0 gets 3 events, slot 1 gets 1 -
        # perfectly periodic -> residual 0 -> strength 1
        for week in range(2):
            base = t0 + week * 604800 * US
            for _ in range(3):
                rows.append(_ev(eid, base + eid, 1)); eid += 1
            rows.append(_ev(eid, base + 3_600_000_000 + eid, 1)); eid += 1
        sf = _write_events(str(tmp_path), rows)
        fn, sql = q._REGISTRY["seasonality_strength_by_type"]
        compare(spark, sf, fn, sql)
        r = fn(spark, sf).collect()[0]
        assert r["seasonality_strength"] == 1.0


class TestRound6PlanShapes:
    """Pin the documented shuffle shapes of the round-6 operators — a
    regression that adds an exchange or flips a broadcast to a shuffle
    join is a scale bug even when results stay correct."""

    def _plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_sprt_windows_partition_by_arm(self, spark):
        from eventstreamml_spark.operators.stats import sprt_bernoulli
        from datetime import datetime

        rows = [(i % 2, datetime(2024, 1, 1 + i % 5), True)
                for i in range(50)]
        df = spark.createDataFrame(rows, "arm int, ts timestamp, c boolean")
        plan = self._plan(sprt_bernoulli(df, "arm", "ts", "c", 0.3, 0.4))
        # the cumulative LLR window must run per-arm over the DAILY
        # aggregate, never single-partition over raw events
        assert "Exchange SinglePartition" not in plan
        assert plan.count("Window") == 1

    def test_watermark_bucketed_window_no_global_sort(self, spark):
        from eventstreamml_spark.operators.windows import watermark_lateness
        from datetime import datetime

        rows = [(i, datetime(2024, 1, 1), "a") for i in range(100)]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )
        plan = self._plan(watermark_lateness(df, bucket_size=10))
        # the per-event running max partitions by bucket; the ONLY
        # single-partition stage is the |buckets|-relation carry window
        assert "hashpartitioning(_bk" in plan
        assert plan.count("Exchange SinglePartition") <= 1

    def test_bigram_lm_model_joins_broadcast(self, spark):
        from eventstreamml_spark.operators.text import bigram_lm_nll

        docs = spark.createDataFrame(
            [(i, "a b c d e f g") for i in range(8)],
            "doc_id long, text string",
        )
        plan = self._plan(bigram_lm_nll(docs))
        # pair counts, unigram counts, and V are model state: all three
        # reach the held-out bigrams as broadcasts, never a shuffle join
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan

    def test_bloom_bit_set_broadcast(self, spark):
        from eventstreamml_spark.operators.sketches import (
            bloom_membership_audit,
        )

        build = spark.range(20).select(F.col("id").alias("key"))
        probe = spark.range(200).select(F.col("id").alias("key"))
        plan = self._plan(bloom_membership_audit(build, probe))
        # the bit set is <= m_bits rows by construction: the probe-side
        # membership check must be a broadcast semi-join
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    def test_t_closeness_windows_on_grid_only(self, spark):
        from eventstreamml_spark.operators.stats import t_closeness

        df = spark.range(1000).select(
            (F.col("id") % 7).alias("g"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        plan = self._plan(t_closeness(df, "g", "v"))
        # every window partitions by group (cumulative EMD) or by bin
        # (per-bin totals over the dense grid) — never an unpartitioned
        # window (the SinglePartition exchanges in this plan are the
        # one-row scalar aggregates, the documented broadcast-scalar
        # pattern)
        n_specs = plan.count("windowspecdefinition(")
        assert n_specs >= 1
        assert (
            plan.count("windowspecdefinition(_g")
            + plan.count("windowspecdefinition(_b")
            == n_specs
        )


class TestRidgeRegression:
    def test_matches_numpy_closed_form(self, spark):
        import numpy as np
        from eventstreamml_spark.operators.stats import ridge_regression_3f

        rng = np.random.default_rng(11)
        n = 500
        X = rng.normal(size=(n, 3)) * [2.0, 0.5, 5.0]
        beta_true = np.array([3.0, -7.0, 0.25])
        yv = 10.0 + X @ beta_true + rng.normal(size=n) * 0.1
        rows = [(float(yv[i]), float(X[i, 0]), float(X[i, 1]),
                 float(X[i, 2])) for i in range(n)]
        df = spark.createDataFrame(rows, "y double, x1 double, x2 double, x3 double")
        lam = 1.0
        r = ridge_regression_3f(df, "y", ("x1", "x2", "x3"), lam=lam).collect()[0]
        # numpy reference: centered ridge normal equations
        Xc = X - X.mean(axis=0)
        yc = yv - yv.mean()
        A = Xc.T @ Xc + lam * np.eye(3)
        beta = np.linalg.solve(A, Xc.T @ yc)
        icept = yv.mean() - X.mean(axis=0) @ beta
        assert abs(r["beta_1"] - beta[0]) < 1e-3
        assert abs(r["beta_2"] - beta[1]) < 1e-3
        assert abs(r["beta_3"] - beta[2]) < 1e-3
        assert abs(r["intercept"] - icept) < 1e-3
        assert r["r2"] > 0.99 and r["n"] == n

    def test_singular_unregularized_nulls(self, spark):
        from eventstreamml_spark.operators.stats import ridge_regression_3f

        # x2 = 2*x1 exactly collinear, lam=0 -> det 0 -> NULL betas
        rows = [(float(i), float(i), 2.0 * i, 1.0) for i in range(20)]
        df = spark.createDataFrame(rows, "y double, x1 double, x2 double, x3 double")
        r = ridge_regression_3f(df, "y", ("x1", "x2", "x3"), lam=0.0).collect()[0]
        assert r["beta_1"] is None and r["beta_2"] is None


class TestSurvivalKM:
    def test_textbook_km_curve(self, spark):
        # classic worked example: durations (t, observed):
        # 1+, 2, 3, 3, 4+, 5  -> events at 2 (n=5), 3 (d=2, n=4), 5 (n=1)
        from eventstreamml_spark.operators.stats import kaplan_meier

        df = spark.createDataFrame(
            [(1, 0), (2, 1), (3, 1), (3, 1), (4, 0), (5, 1)],
            "duration int, observed int",
        )
        rows = {r["t"]: r for r in kaplan_meier(df).collect()}
        assert set(rows) == {2, 3, 5}
        assert rows[2]["n_at_risk"] == 5
        assert rows[2]["survival"] == round(4 / 5, 6)
        assert rows[3]["n_at_risk"] == 4
        assert rows[3]["survival"] == round(4 / 5 * 2 / 4, 6)
        # last subject exits by event: survival hits exactly 0, not
        # ln(0) (NULL on Spark, -inf on DuckDB)
        assert rows[5]["n_at_risk"] == 1
        assert rows[5]["survival"] == 0.0

    def test_censored_only_times_absent_but_at_risk_correct(self, spark):
        from eventstreamml_spark.operators.stats import kaplan_meier

        df = spark.createDataFrame(
            [(1, 0), (1, 0), (2, 1), (2, 1)], "duration int, observed int"
        )
        rows = kaplan_meier(df).collect()
        assert len(rows) == 1 and rows[0]["t"] == 2
        # the two censored exits at t=1 reduce the at-risk set
        assert rows[0]["n_at_risk"] == 2
        assert rows[0]["survival"] == 0.0


class TestWassersteinGrid:
    def test_identical_arms_zero(self, spark):
        from eventstreamml_spark.operators.stats import wasserstein_grid

        df = spark.createDataFrame(
            [(1.0, 0), (2.0, 0), (1.0, 1), (2.0, 1)], "value double, arm int"
        )
        assert wasserstein_grid(df).collect()[0]["w1"] == 0.0

    def test_unit_shift_unit_distance(self, spark):
        from eventstreamml_spark.operators.stats import wasserstein_grid

        # arm 1 = arm 0 shifted by exactly +1.0 -> W1 = 1.0 on the grid
        df = spark.createDataFrame(
            [(0.0, 0), (2.0, 0), (1.0, 1), (3.0, 1)], "value double, arm int"
        )
        assert wasserstein_grid(df).collect()[0]["w1"] == 1.0


class TestCramersV:
    def test_perfect_association_is_one(self, spark):
        from eventstreamml_spark.operators.stats import cramers_v

        df = spark.createDataFrame(
            [("a", 0), ("a", 0), ("b", 1), ("b", 1)], "x string, y int"
        )
        row = cramers_v(df, "x", "y").collect()[0]
        assert row["cramers_v"] == 1.0

    def test_single_level_factor_nulls_v(self, spark):
        from eventstreamml_spark.operators.stats import cramers_v

        df = spark.createDataFrame(
            [("a", 0), ("a", 1)], "x string, y int"
        )
        row = cramers_v(df, "x", "y").collect()[0]
        assert row["cramers_v"] is None  # min(r,c)-1 = 0, not a crash


class TestMcNemar:
    def test_known_discordant_counts(self, spark):
        from eventstreamml_spark.operators.stats import mcnemar_test

        df = spark.createDataFrame(
            [(1, 1), (1, 0), (1, 0), (0, 1), (0, 0)], "before int, after int"
        )
        row = mcnemar_test(df).collect()[0]
        assert (row["n_yes_no"], row["n_no_yes"]) == (2, 1)
        assert row["mcnemar_chi2_cc"] == 0.0  # (|2-1|-1)^2 / 3

    def test_no_discordance_nulls_statistic(self, spark):
        from eventstreamml_spark.operators.stats import mcnemar_test

        df = spark.createDataFrame([(1, 1), (0, 0)], "before int, after int")
        row = mcnemar_test(df).collect()[0]
        assert row["mcnemar_chi2_cc"] is None


class TestCohensKappa:
    def test_perfect_agreement_two_classes(self, spark):
        from eventstreamml_spark.operators.evalmetrics import cohens_kappa

        df = spark.createDataFrame(
            [("a", "a"), ("b", "b"), ("a", "a"), ("b", "b")],
            "label string, pred string",
        )
        row = cohens_kappa(df).collect()[0]
        assert row["kappa"] == 1.0 and row["p_observed"] == 1.0

    def test_single_shared_class_nulls_kappa(self, spark):
        from eventstreamml_spark.operators.evalmetrics import cohens_kappa

        # p_e = 1 -> 0/0 must be NULL, not a crash or a fake 0
        df = spark.createDataFrame(
            [("a", "a"), ("a", "a")], "label string, pred string"
        )
        assert cohens_kappa(df).collect()[0]["kappa"] is None

    def test_marginal_only_classes_count_in_pe(self, spark):
        from eventstreamml_spark.operators.evalmetrics import cohens_kappa

        # class 'c' appears only as a prediction: its row marginal is 0
        # so it adds nothing to p_e, but must not crash the outer join
        df = spark.createDataFrame(
            [("a", "a"), ("a", "c"), ("b", "b")], "label string, pred string"
        )
        row = cohens_kappa(df).collect()[0]
        po, pe = 2 / 3, (2 * 1 + 1 * 1 + 0 * 1) / 9
        assert row["kappa"] == round((po - pe) / (1 - pe), 6)


class TestKendallTauGroups:
    def test_reversed_ranking_minus_one(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            kendall_tau_groups,
        )

        df = spark.createDataFrame(
            [("g", 1, 1, 30), ("g", 2, 2, 20), ("g", 3, 3, 10)],
            "grp string, item int, sa int, sb int",
        )
        row = kendall_tau_groups(df, "grp", "item", "sa", "sb").collect()[0]
        assert row["kendall_tau"] == -1.0
        assert (row["n_concordant"], row["n_discordant"]) == (0, 3)

    def test_ties_count_as_neither(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            kendall_tau_groups,
        )

        # sb ties on the (1,2) pair: tau-a keeps the full denominator
        df = spark.createDataFrame(
            [("g", 1, 1, 10), ("g", 2, 2, 10), ("g", 3, 3, 20)],
            "grp string, item int, sa int, sb int",
        )
        row = kendall_tau_groups(df, "grp", "item", "sa", "sb").collect()[0]
        assert (row["n_concordant"], row["n_discordant"]) == (2, 0)
        assert row["kendall_tau"] == round(2 / 3, 6)

    def test_single_item_group_nulls_tau(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            kendall_tau_groups,
        )

        df = spark.createDataFrame(
            [("g", 1, 1, 1)], "grp string, item int, sa int, sb int"
        )
        row = kendall_tau_groups(df, "grp", "item", "sa", "sb").collect()[0]
        assert row["kendall_tau"] is None and row["n_items"] == 1


class TestCommonNeighborLinkScores:
    def test_path_graph_predicts_endpoints(self, spark):
        from eventstreamml_spark.operators.graph import (
            common_neighbor_link_scores,
        )

        # path 1-2-3: only candidate pair is (1,3) through middle 2
        edges = spark.createDataFrame(
            [(1, 2), (2, 3)], "src int, dst int"
        )
        rows = common_neighbor_link_scores(edges, top_k=5).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["u"], r["v"], r["n_common"]) == (1, 3, 1)
        assert r["jaccard"] == 1.0  # deg 1 + deg 1 - 1 common

    def test_existing_edges_excluded(self, spark):
        from eventstreamml_spark.operators.graph import (
            common_neighbor_link_scores,
        )

        # triangle: every pair already adjacent -> no candidates
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3)], "src int, dst int"
        )
        assert common_neighbor_link_scores(edges).count() == 0

    def test_hub_degree_cap_drops_hub_wedges(self, spark):
        from eventstreamml_spark.operators.graph import (
            common_neighbor_link_scores,
        )

        # star around 9 (deg 3) plus path through 5 (deg 2): capping
        # hub degree at 2 keeps only the path's candidate pair
        edges = spark.createDataFrame(
            [(1, 9), (2, 9), (3, 9), (1, 5), (4, 5)], "src int, dst int"
        )
        uncapped = common_neighbor_link_scores(edges, top_k=100)
        # (1,2),(1,3),(2,3) via 9; (1,4) via 5; (5,9) via 1
        assert uncapped.count() == 5
        capped = common_neighbor_link_scores(
            edges, top_k=100, max_hub_degree=2
        ).collect()
        # hub 9 (deg 3) is no longer a valid middle; 1 and 5 (deg 2) are
        assert sorted((r["u"], r["v"]) for r in capped) == [(1, 4), (5, 9)]


class TestFleschReadability:
    def test_known_sentence_counts(self, spark):
        from eventstreamml_spark.operators.text import flesch_reading_ease

        docs = spark.createDataFrame(
            [(1, "the cat sat. the dog ran!")], "doc_id long, text string"
        )
        r = flesch_reading_ease(docs).collect()[0]
        assert r["n_words"] == 6
        assert r["n_sentences"] == 2
        # vowel groups: e/a/a/e/o/a -> 6
        assert r["n_syllables"] == 6
        expected = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
        assert abs(r["flesch_score"] - expected) < 1e-9

    def test_empty_doc_null_score_empty_band(self, spark):
        from eventstreamml_spark.operators.text import flesch_band_histogram

        docs = spark.createDataFrame(
            [(1, ""), (2, "a b c.")], "doc_id long, text string"
        )
        bands = {r["band"]: r for r in flesch_band_histogram(docs).collect()}
        assert bands["empty"]["n_docs"] == 1
        assert bands["empty"]["avg_score"] is None


class TestZoneMapAudit:
    def test_partition_classes(self, spark, tmp_path):
        from eventstreamml_spark.operators.storage import zone_map_audit

        # three days: all-below, straddling, all-above a mean of ~2
        t0 = 1_700_000_000 * US
        rows = [
            _ev(1, t0, 1, value=0.0),
            _ev(2, t0 + US, 1, value=1.0),
            _ev(3, t0 + 86_400 * US, 2, value=1.0),
            _ev(4, t0 + 86_401 * US, 2, value=5.0),
            _ev(5, t0 + 2 * 86_400 * US, 3, value=4.0),
            _ev(6, t0 + 2 * 86_400 * US + US, 3, value=7.0),
        ]
        _write_events(str(tmp_path), rows)
        df = spark.read.parquet(os.path.join(str(tmp_path), "events.parquet"))
        r = zone_map_audit(df).collect()[0]
        # mean = 3.0 -> threshold floor(mean) = 3
        assert r["threshold"] == 3
        assert (r["n_pruned"], r["n_full"], r["n_partial"]) == (1, 1, 1)
        assert r["n_rows_scanned"] == 4
        assert r["n_rows_matching"] == 3
        assert r["scan_ratio"] == round(4 / 6, 6)
        assert r["selectivity"] == 0.5


class TestRound6FinalBatchPlanShapes:
    """Shuffle-shape pins for the final round-6 batch."""

    def _plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_kaplan_meier_windows_on_duration_grid_only(self, spark):
        from eventstreamml_spark.operators.stats import kaplan_meier

        df = spark.range(1000).select(
            (F.col("id") % 30).alias("duration"),
            (F.col("id") % 3 == 0).cast("int").alias("observed"),
        )
        plan = self._plan(kaplan_meier(df))
        # exactly one reduction of the raw data (the duration groupBy);
        # every window runs over that bounded |distinct t| relation
        assert plan.count("HashAggregate") >= 2  # partial+final of one agg
        assert plan.count("Exchange SinglePartition") <= 1

    def test_wasserstein_single_data_exchange(self, spark):
        from eventstreamml_spark.operators.stats import wasserstein_grid

        df = spark.range(1000).select(
            (F.col("id") % 97).cast("double").alias("value"),
            (F.col("id") % 2).alias("arm"),
        )
        plan = self._plan(wasserstein_grid(df))
        # one map-side-combined groupBy folds the data to the grid;
        # the CDF windows never see raw rows (same pin as the KS test)
        assert "hashpartitioning(xb" in plan

    def test_link_prediction_no_cartesian(self, spark):
        from eventstreamml_spark.operators.graph import (
            common_neighbor_link_scores,
        )

        edges = spark.createDataFrame(
            [(i, (i * 7) % 23) for i in range(40)], "src int, dst int"
        )
        plan = self._plan(common_neighbor_link_scores(edges))
        # wedge build and close are equi-joins; the candidate filter is
        # an anti join — nothing all-pairs
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_zone_map_threshold_broadcast_not_shuffled(self, spark):
        from eventstreamml_spark.operators.storage import zone_map_audit
        from datetime import datetime

        df = spark.createDataFrame(
            [(i, datetime(2024, 1, 1 + i % 5), i, "t", float(i), "{}")
             for i in range(50)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        plan = self._plan(zone_map_audit(df))
        # the global threshold is a one-row scalar: it must reach the
        # per-day aggregate as a broadcast, never a shuffle join
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_kendall_pairs_join_within_group_key(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            kendall_tau_groups,
        )

        df = spark.createDataFrame(
            [("g%d" % (i % 4), i % 24, i, i * 2) for i in range(96)],
            "grp string, item int, sa long, sb long",
        )
        plan = self._plan(
            kendall_tau_groups(df, "grp", "item", "sa", "sb")
        )
        # the pair self-join keys on the group column — candidate pairs
        # never cross groups
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestFinalBatchNullEdges:
    def test_wasserstein_empty_arm_null_not_crash(self, spark):
        from eventstreamml_spark.operators.stats import wasserstein_grid

        df = spark.createDataFrame(
            [(1.0, 0), (2.0, 0)], "value double, arm int"
        )
        row = wasserstein_grid(df).collect()[0]
        assert row["n_b"] == 0 and row["w1"] is None

    def test_kendall_null_group_pairs_counted(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            kendall_tau_groups,
        )

        df = spark.createDataFrame(
            [(None, 1, 1, 10), (None, 2, 2, 20), ("g", 1, 1, 5)],
            "grp string, item int, sa int, sb int",
        )
        rows = {r["grp"]: r for r in
                kendall_tau_groups(df, "grp", "item", "sa", "sb").collect()}
        # the NULL group's pair is concordant, not silently dropped
        assert rows[None]["n_concordant"] == 1
        assert rows[None]["kendall_tau"] == 1.0

    def test_seasonality_null_type_keeps_group(self, spark, tmp_path):
        t0 = 1_700_000_000 * US
        rows = [_ev(i, t0 + i * 3600 * US, 1, None, 1.0) for i in range(6)]
        rows += [_ev(10 + i, t0 + i * 3600 * US, 1, "click", 1.0)
                 for i in range(6)]
        sf = _write_events(str(tmp_path), rows)
        fn, sql = q._REGISTRY["seasonality_strength_by_type"]
        compare(spark, sf, fn, sql)
        types = {r["event_type"] for r in fn(spark, sf).collect()}
        assert None in types and "click" in types


class TestNullGroupJoins:
    """The spc_control_limits lesson applied to every round-6 operator
    that joins groupBy-produced stats back on the group key: a NULL
    key is a legitimate group and must keep its row on BOTH engines."""

    def test_theil_sen_null_subject_kept(self, spark):
        from eventstreamml_spark.operators.stats import theil_sen_trend
        from datetime import datetime, timedelta

        t0 = datetime(2024, 1, 1)
        rows = [(None, t0 + timedelta(seconds=i), float(i)) for i in range(4)]
        rows += [(1, t0 + timedelta(seconds=i), float(2 * i)) for i in range(4)]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        out = {
            r["user_id"]: r
            for r in theil_sen_trend(df, "user_id", "ts", "value").collect()
        }
        assert None in out and out[None]["slope_per_sec"] == 1.0
        assert out[1]["slope_per_sec"] == 2.0

    def test_spearman_null_group_kept(self, spark):
        from eventstreamml_spark.operators.stats import spearman_corr

        df = spark.createDataFrame(
            [(None, 1.0, 2.0), (None, 2.0, 4.0), (None, 3.0, 5.0),
             ("a", 1.0, 3.0), ("a", 2.0, 2.0), ("a", 3.0, 1.0)],
            "g string, x double, y double",
        )
        out = {r["g"]: r for r in spearman_corr(df, "g", "x", "y").collect()}
        assert out[None]["spearman_rho"] == 1.0
        assert out["a"]["spearman_rho"] == -1.0

    def test_brown_forsythe_null_group_counted(self, spark):
        from eventstreamml_spark.operators.stats import brown_forsythe

        df = spark.createDataFrame(
            [(None, 1.0), (None, 3.0), ("a", 2.0), ("a", 8.0)],
            "g string, v double",
        )
        row = brown_forsythe(df, "g", "v").collect()[0]
        # both groups present: k = 2, n = 4
        assert row["k_groups"] == 2 and row["n_total"] == 4

    def test_t_closeness_null_group_audited(self, spark):
        from eventstreamml_spark.operators.stats import t_closeness

        df = spark.createDataFrame(
            [(None, float(i)) for i in range(10)]
            + [("a", float(i)) for i in range(10)],
            "g string, v double",
        )
        out = {r["g"]: r for r in t_closeness(df, "g", "v").collect()}
        assert None in out and out[None]["n"] == 10


class TestDegenerateDataGuards:
    def test_pca_constant_embeddings_null_not_crash(self, spark):
        # zero covariance -> zero power-iteration vector -> NULL
        # loadings, not an ANSI DIVIDE_BY_ZERO mid-iteration
        from eventstreamml_spark.operators.similarity import (
            pca_top_component,
        )

        emb = spark.createDataFrame(
            [(i, [1.0, 1.0]) for i in range(8)],
            "vec_id long, embedding array<double>",
        )
        rows = pca_top_component(emb, dim=2).collect()
        assert len(rows) == 2
        assert all(r["loading"] is None for r in rows)

    def test_bm25_all_empty_corpus_no_crash(self, spark):
        from eventstreamml_spark.operators.text import bm25_topk

        docs = spark.createDataFrame(
            [(1, ""), (2, "")], "doc_id long, text string"
        )
        # avgdl = 0: scores degrade to NULL/empty, never a crash
        bm25_topk(docs, query_terms=["x"]).collect()


class TestKMeansFitNullVectors:
    def test_ivf_fit_skips_null_embeddings(self, spark):
        from eventstreamml_spark.operators.similarity import (
            fit_ivf_centroids,
        )

        emb = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(12)] + [(99, None)],
            "vec_id long, embedding array<double>",
        )
        cents = fit_ivf_centroids(
            emb, n_cells=2, sample_cap=100
        ).collect()
        assert len(cents) == 2  # fit, didn't crash on the None row

    def test_pq_fit_skips_null_embeddings(self, spark):
        from eventstreamml_spark.operators.similarity import fit_pq_codebooks

        emb = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(12)] + [(99, None)],
            "vec_id long, embedding array<double>",
        )
        rows = fit_pq_codebooks(emb, m=2, n_codes=2, sample_cap=100).collect()
        assert len(rows) == 4


class TestChiSquareSparseContingency:
    def test_missing_cell_mass_matches_oracle(self, spark, tmp_path):
        # user 1 only ever clicks, user 2 only purchases -> the
        # (click, u2) and (purchase, u1) cells are EMPTY; both engines
        # must add the zero-cell mass N - sum E(observed)
        t0 = 1_700_000_000 * US
        rows = [_ev(i, t0 + i * US, 1, "click", 1.0) for i in range(4)]
        rows += [_ev(10 + i, t0 + i * US, 2, "purchase", 1.0)
                 for i in range(4)]
        sf = _write_events(str(tmp_path), rows)
        for name in ("chi_square_type_segment", "cramers_v_type_segment"):
            fn, sql = q._REGISTRY[name]
            compare(spark, sf, fn, sql)
        # 2x2 perfect association: chi2 = n, V = 1
        fn, _ = q._REGISTRY["cramers_v_type_segment"]
        row = fn(spark, sf).collect()[0]
        assert row["chi2"] == 8.0 and row["cramers_v"] == 1.0
