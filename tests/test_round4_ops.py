"""Round-4 operators: eval metrics (AUC / calibration / threshold
sweep), DSIR importance weights, quality logit gate, winsorization,
type-co-occurrence lift, seasonal hour-of-week anomaly."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _scored(spark, rows):
    return spark.createDataFrame(rows, "label int, score double")


class TestBinaryAUC:
    def test_perfect_and_reversed_ranking(self, spark):
        from eventstreamml_spark.operators.evalmetrics import binary_auc

        rows = [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)]
        out = binary_auc(_scored(spark, rows)).collect()[0]
        assert out["auc"] == 1.0 and out["n_pos"] == 2 and out["n_neg"] == 2
        rev = [(0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1)]
        assert binary_auc(_scored(spark, rev)).collect()[0]["auc"] == 0.0

    def test_matches_sklearn_formula_with_ties(self, spark):
        from eventstreamml_spark.operators.evalmetrics import binary_auc

        # hand-computed midrank AUC with duplicate scores
        rows = [(1, 0.5), (0, 0.5), (1, 0.7), (0, 0.3), (1, 0.3)]
        # ranks asc: 0.3 -> midrank 1.5 (x2), 0.5 -> 3.5 (x2), 0.7 -> 5
        # sum ranks of positives = 3.5 + 5 + 1.5 = 10
        # auc = (10 - 3*4/2) / (3*2) = 4/6
        out = binary_auc(_scored(spark, rows)).collect()[0]
        assert out["auc"] == pytest.approx(round(4 / 6, 6))

    def test_single_class_group_is_null(self, spark):
        from eventstreamml_spark.operators.evalmetrics import binary_auc

        rows = [(1, 0.2), (1, 0.9)]
        assert binary_auc(_scored(spark, rows)).collect()[0]["auc"] is None

    def test_grouped(self, spark):
        from eventstreamml_spark.operators.evalmetrics import binary_auc

        df = spark.createDataFrame(
            [("a", 1, 0.9), ("a", 0, 0.1), ("b", 0, 0.9), ("b", 1, 0.1)],
            "g string, label int, score double",
        )
        out = {r["g"]: r["auc"] for r in binary_auc(df, by="g").collect()}
        assert out == {"a": 1.0, "b": 0.0}


class TestCalibrationBins:
    def test_bins_and_top_edge_fold(self, spark):
        from eventstreamml_spark.operators.evalmetrics import calibration_bins

        df = _scored(spark, [(1, 1.0), (0, 0.95), (1, 0.05), (0, 0.0)])
        out = {r["bin"]: r for r in calibration_bins(df, n_bins=10).collect()}
        assert set(out) == {0, 9}  # score 1.0 folds into bin 9
        assert out[9]["n"] == 2 and out[0]["n"] == 2
        assert out[9]["event_rate"] == 0.5


class TestThresholdMetrics:
    def test_sweep_counts(self, spark):
        from eventstreamml_spark.operators.evalmetrics import threshold_metrics

        df = _scored(spark, [(1, 0.9), (1, 0.4), (0, 0.6), (0, 0.1)])
        out = {r["threshold"]: r for r in
               threshold_metrics(df, [0.5, 0.95]).collect()}
        r5 = out[0.5]
        assert (r5["tp"], r5["fp"], r5["fn"]) == (1, 1, 1)
        assert r5["precision"] == 0.5 and r5["recall"] == 0.5
        r95 = out[0.95]
        assert (r95["tp"], r95["fp"], r95["fn"]) == (0, 0, 2)
        assert r95["precision"] is None  # 0/0 -> null, not NaN


class TestDsirImportance:
    def test_target_like_docs_score_higher(self, spark):
        from eventstreamml_spark.operators.curation import dsir_importance

        rows = [
            # target domain: about cats
            (1, "cat cat feline cat", "t"),
            (2, "cat feline purr", "t"),
            # raw pool: one cat-like, one finance-like
            (3, "cat feline cat cat", "r"),
            (4, "stock bond market stock", "r"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, grp string")
        out = {
            r["doc_id"]: r["log_w"]
            for r in dsir_importance(docs, F.col("grp") == "t").collect()
        }
        assert set(out) == {3, 4}  # only raw docs scored
        assert out[3] > out[4]

    def test_weights_are_token_additive(self, spark):
        from eventstreamml_spark.operators.curation import dsir_importance

        rows = [
            (1, "a a b", "t"),
            (2, "a", "r"),
            (3, "a a", "r"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, grp string")
        out = {
            r["doc_id"]: r["log_w"]
            for r in dsir_importance(docs, F.col("grp") == "t").collect()
        }
        assert out[3] == pytest.approx(2 * out[2], abs=1e-5)


class TestQualityLogit:
    def test_scores_in_unit_interval_and_keep_matches(self, spark):
        from eventstreamml_spark.operators.text import quality_logit_score

        docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat and it is a fine day in the sun"),
                (2, "$$$ !!! ### @@@ %%% ^^^ &&& *** ((( )))"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in quality_logit_score(docs).collect()}
        for r in out.values():
            assert 0.0 <= r["q_score"] <= 1.0
            assert r["keep"] == (r["q_score"] >= 0.5)
        assert out[1]["q_score"] > out[2]["q_score"]

    def test_no_shuffle_in_plan(self, spark):
        from eventstreamml_spark.operators.text import quality_logit_score

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = quality_logit_score(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestWinsorize:
    def test_clamps_to_exact_quantiles_preserving_rows(self, spark):
        from eventstreamml_spark.preprocessing.outliers import winsorize_by_key

        vals = [float(i) for i in range(1, 101)]  # 1..100
        df = spark.createDataFrame(
            [("k", v) for v in vals] + [("k", None)],
            "event_type string, value double",
        )
        out = winsorize_by_key(df, lower_q=0.05, upper_q=0.95)
        rows = out.collect()
        assert len(rows) == 101  # row count preserved (incl. null)
        vs = [r["value"] for r in rows if r["value"] is not None]
        # exact interpolated p05/p95 of 1..100 = 5.95 / 95.05
        assert min(vs) == pytest.approx(5.95)
        assert max(vs) == pytest.approx(95.05)
        assert any(r["value"] is None for r in rows)  # nulls pass through

    def test_interior_values_untouched(self, spark):
        from eventstreamml_spark.preprocessing.outliers import winsorize_by_key

        df = spark.createDataFrame(
            [("k", v) for v in [0.0, 10.0, 11.0, 12.0, 100.0]],
            "event_type string, value double",
        )
        out = sorted(
            r["value"]
            for r in winsorize_by_key(df, lower_q=0.2, upper_q=0.8).collect()
        )
        assert out[1:4] == [10.0, 11.0, 12.0]


class TestTypeLift:
    def test_lift_separates_coupled_from_independent(self, spark):
        from eventstreamml_spark.operators.aggregations import type_cooccurrence_lift

        rows = []
        # a & b always co-occur (10 subjects); c occurs alone in 10 others
        for s in range(10):
            rows += [(s, "a"), (s, "b")]
        for s in range(10, 20):
            rows.append((s, "c"))
        # a & c co-occur for 5 subjects 20..24
        for s in range(20, 25):
            rows += [(s, "a"), (s, "c")]
        ev = spark.createDataFrame(rows, "user_id long, event_type string")
        out = {(r["type_a"], r["type_b"]): r for r in
               type_cooccurrence_lift(ev, min_subjects=5).collect()}
        # P(ab)=10/25, P(a)=15/25, P(b)=10/25 -> lift=10*25/(15*10)
        assert out[("a", "b")]["lift"] == pytest.approx(round(10 * 25 / 150, 6))
        assert out[("a", "c")]["lift"] < out[("a", "b")]["lift"]

    def test_min_subjects_thresholds(self, spark):
        from eventstreamml_spark.operators.aggregations import type_cooccurrence_lift

        ev = spark.createDataFrame(
            [(1, "x"), (1, "y")], "user_id long, event_type string"
        )
        assert type_cooccurrence_lift(ev, min_subjects=2).count() == 0


class TestSeasonalAnomaly:
    def test_spike_in_last_week_scores_high_z(self, spark):
        from eventstreamml_spark.operators.quality import seasonal_hourweek_anomaly

        # slot 0 of weeks 0..4: one event each; week 5: 40 events (spike)
        rows = []
        for wk in range(5):
            rows.append((f"e{wk}", wk * 168 * 3600, "click"))
        for i in range(40):
            rows.append((f"s{i}", 5 * 168 * 3600, "click"))
        df = spark.createDataFrame(rows, "event_id string, sec long, event_type string")
        df = df.select("event_type", F.timestamp_seconds("sec").alias("ts"))
        out = {r["hour_of_week"]: r for r in seasonal_hourweek_anomaly(df).collect()}
        r0 = out[0]
        assert r0["n_weeks"] == 5 and r0["last_c"] == 40
        assert r0["mean_c"] == 1.0 and r0["std_c"] == 0.0
        assert r0["z"] is None  # zero-variance baseline guarded

    def test_zero_fill_weeks_enter_baseline(self, spark):
        from eventstreamml_spark.operators.quality import seasonal_hourweek_anomaly

        # slot 0: events in weeks 0 and 2 only; week 3 is last.
        # baseline over weeks 0,1,2 = [2, 0, 2] -> mean 4/3 (week 1 zero-filled)
        rows = [("a", 0), ("b", 1), ("c", 2 * 168 * 3600), ("d", 2 * 168 * 3600 + 1),
                ("e", 3 * 168 * 3600)]
        df = spark.createDataFrame(rows, "event_id string, sec long").select(
            F.lit("click").alias("event_type"),
            F.timestamp_seconds("sec").alias("ts"),
        )
        out = {r["hour_of_week"]: r for r in seasonal_hourweek_anomaly(df).collect()}
        r0 = out[0]
        assert r0["n_weeks"] == 3
        assert r0["mean_c"] == pytest.approx(round(4 / 3, 6))
        assert r0["last_c"] == 1
        assert r0["z"] is not None


class TestNdcgAtK:
    def test_perfect_ranking_is_one(self, spark):
        from eventstreamml_spark.operators.evalmetrics import ndcg_at_k

        df = spark.createDataFrame(
            [(1, 10, 0.9, 3), (1, 11, 0.5, 2), (1, 12, 0.1, 0)],
            "query_id int, item int, score double, rel int",
        )
        out = ndcg_at_k(df, k=10).collect()[0]
        assert out["ndcg"] == 1.0 and out["dcg"] == out["idcg"]

    def test_hand_computed_swap(self, spark):
        from eventstreamml_spark.operators.evalmetrics import ndcg_at_k

        # ranking puts rel=0 first: dcg = 0 + 3/log2(3) = 3/1.58496...
        df = spark.createDataFrame(
            [(1, 10, 0.9, 0), (1, 11, 0.5, 3)],
            "query_id int, item int, score double, rel int",
        )
        out = ndcg_at_k(df, k=10).collect()[0]
        dcg = (2**3 - 1) / math.log2(3)
        idcg = (2**3 - 1) / math.log2(2)
        assert out["dcg"] == pytest.approx(round(dcg, 6))
        assert out["ndcg"] == pytest.approx(round(dcg / idcg, 6), abs=1e-6)

    def test_k_truncates_and_zero_rel_null(self, spark):
        from eventstreamml_spark.operators.evalmetrics import ndcg_at_k

        rows = [(1, i, 1.0 - i / 10.0, 1) for i in range(5)]
        out = ndcg_at_k(
            spark.createDataFrame(
                rows, "query_id int, item int, score double, rel int"
            ),
            k=2,
        ).collect()[0]
        expect = 1.0 + 1.0 / math.log2(3)
        assert out["dcg"] == pytest.approx(round(expect, 6))
        # all-zero relevance -> idcg 0 -> ndcg NULL, not NaN
        zero = spark.createDataFrame(
            [(7, 1, 0.5, 0)], "query_id int, item int, score double, rel int"
        )
        assert ndcg_at_k(zero, k=10).collect()[0]["ndcg"] is None


class TestMulticlassMetrics:
    def test_confusion_derivation(self, spark):
        from eventstreamml_spark.operators.evalmetrics import multiclass_metrics

        df = spark.createDataFrame(
            [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a")],
            "label string, pred string",
        )
        out = {r["clazz"]: r for r in multiclass_metrics(df).collect()}
        assert out["a"]["tp"] == 1 and out["a"]["n_label"] == 2
        assert out["a"]["n_pred"] == 2  # one true a + the c misfire
        assert out["b"]["precision"] == pytest.approx(2 / 3)
        assert out["b"]["recall"] == 1.0
        # class only in labels: precision NULL (0 predicted), recall 0
        assert out["c"]["n_pred"] == 0 and out["c"]["precision"] is None
        assert out["c"]["recall"] == 0.0 and out["c"]["f1"] is None

    def test_pred_only_class_gets_row(self, spark):
        from eventstreamml_spark.operators.evalmetrics import multiclass_metrics

        df = spark.createDataFrame(
            [("a", "z"), ("a", "a")], "label string, pred string"
        )
        out = {r["clazz"]: r for r in multiclass_metrics(df).collect()}
        assert out["z"]["n_label"] == 0 and out["z"]["recall"] is None


class TestBootstrapMeanCI:
    def test_interval_brackets_mean_and_is_deterministic(self, spark):
        from eventstreamml_spark.operators.stats import bootstrap_mean_ci

        df = spark.range(500).select(
            F.lit("g").alias("grp"),
            F.col("id"),
            (F.col("id") % 37).cast("double").alias("x"),
        )
        out1 = bootstrap_mean_ci(df, "x", "id", "grp", n_replicates=32).collect()
        out2 = bootstrap_mean_ci(df, "x", "id", "grp", n_replicates=32).collect()
        assert out1 == out2  # hash-seeded, bit-reproducible
        r = out1[0]
        assert r["ci_lo"] < r["mean_value"] < r["ci_hi"]
        # CI of a 500-row mean with sd~10 should be within ~+/-2
        assert r["ci_hi"] - r["ci_lo"] < 4.0

    def test_no_row_fanout_single_shuffle(self, spark):
        from eventstreamml_spark.operators.stats import bootstrap_mean_ci

        df = spark.range(100).select(
            (F.col("id") % 2).alias("grp"),
            F.col("id"),
            F.col("id").cast("double").alias("x"),
        )
        plan = bootstrap_mean_ci(
            df, "x", "id", "grp", n_replicates=16
        )._jdf.queryExecution().executedPlan().toString()
        # the raw-data explode would show as Generate BEFORE the first
        # HashAggregate; the only Generate must sit above the grouped relation
        first_agg = plan.find("HashAggregate")
        gen = plan.find("Generate")
        assert first_agg != -1 and gen != -1


class TestChiSquare:
    def test_independent_uniform_is_zero(self, spark):
        from eventstreamml_spark.operators.stats import chi_square_independence

        rows = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
        out = chi_square_independence(
            spark.createDataFrame(rows, "a string, b string"), "a", "b"
        ).collect()[0]
        assert out["chi2"] == 0.0 and out["dof"] == 1 and out["n"] == 20

    def test_hand_computed_2x2(self, spark):
        from eventstreamml_spark.operators.stats import chi_square_independence

        # O = [[30,10],[10,30]]; all marginals 40, N=80, E=20 everywhere
        rows = (
            [("x", "u")] * 30 + [("x", "v")] * 10
            + [("y", "u")] * 10 + [("y", "v")] * 30
        )
        out = chi_square_independence(
            spark.createDataFrame(rows, "a string, b string"), "a", "b"
        ).collect()[0]
        assert out["chi2"] == pytest.approx(4 * 100 / 20)  # 20.0


class TestWelchTTest:
    def test_matches_closed_form(self, spark):
        from eventstreamml_spark.operators.stats import welch_ttest

        a = [float(x) for x in (1, 2, 3, 4, 5)]
        b = [float(x) for x in (4, 5, 6, 7, 8, 9)]
        df = spark.createDataFrame(
            [("a", x) for x in a] + [("b", x) for x in b],
            "arm string, x double",
        )
        out = welch_ttest(df, "arm", "x").collect()[0]
        import statistics

        va, vb = statistics.variance(a), statistics.variance(b)
        se2 = va / len(a) + vb / len(b)
        t = (statistics.mean(b) - statistics.mean(a)) / math.sqrt(se2)
        dof = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1)
            + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        assert out["arm_a"] == "a" and out["arm_b"] == "b"
        assert out["t_stat"] == pytest.approx(round(t, 6))
        assert out["welch_dof"] == pytest.approx(round(dof, 6))
        assert out["n_a"] == 5 and out["n_b"] == 6


class TestBpeEncodeWords:
    def test_run_merging_matches_greedy_bpe(self, spark):
        from eventstreamml_spark.operators.text import bpe_encode_words

        docs = spark.createDataFrame(
            [(1, "aaaa aaaa"), (2, "aaaa")], "doc_id int, text string"
        )
        # round 1 merges (a,a): 'a a a a' -> '(aa)(aa)' greedily;
        # round 2 merges (aa,aa) -> one 'aaaa' token
        out = bpe_encode_words(docs, n_merges=2, top_words=10).collect()
        assert len(out) == 1
        r = out[0]
        assert r["word"] == "aaaa" and r["n"] == 3
        assert r["tokens"] == "aaaa" and r["n_tokens"] == 1

    def test_partial_merge_and_ranking(self, spark):
        from eventstreamml_spark.operators.text import bpe_encode_words

        docs = spark.createDataFrame(
            [(1, "abc abc abc xy"), (2, "xy abq")],
            "doc_id int, text string",
        )
        # best pair: (a,b) count 4 -> merge 'ab'
        out = {
            r["word"]: r
            for r in bpe_encode_words(docs, n_merges=1, top_words=10).collect()
        }
        assert out["abc"]["tokens"] == "ab c"
        assert out["abc"]["n_tokens"] == 2
        assert out["abq"]["tokens"] == "ab q"
        assert out["xy"]["tokens"] == "x y"
        # rk orders by frequency desc then word
        assert out["abc"]["rk"] == 1 and out["xy"]["rk"] == 2

    def test_top_words_cut(self, spark):
        from eventstreamml_spark.operators.text import bpe_encode_words

        docs = spark.createDataFrame(
            [(1, "q w e r t y")], "doc_id int, text string"
        )
        assert bpe_encode_words(docs, n_merges=1, top_words=3).count() == 3


class TestQuantileSketch:
    def test_estimates_within_relative_error(self, spark):
        from eventstreamml_spark.operators.sketches import quantile_sketch

        df = spark.range(1, 10001).select(
            F.lit("g").alias("grp"), F.col("id").cast("double").alias("x")
        )
        out = {r["p"]: r for r in quantile_sketch(df, "x", "grp").collect()}
        import math

        tol = math.exp(0.5 / 20)  # half-bin geometric radius
        for p, truth in [(0.5, 5000), (0.95, 9500), (0.99, 9900)]:
            est = out[p]["estimate"]
            assert truth / tol <= est <= truth * tol
            assert out[p]["n_pos"] == 10000 and out[p]["n_nonpos"] == 0

    def test_nonpositive_values_reported_not_binned(self, spark):
        from eventstreamml_spark.operators.sketches import quantile_sketch

        rows = [("g", -1.0), ("g", 0.0)] + [("g", float(2**i)) for i in range(8)]
        out = quantile_sketch(
            spark.createDataFrame(rows, "grp string, x double"),
            "x",
            "grp",
            probs=[0.5],
        ).collect()[0]
        assert out["n_nonpos"] == 2 and out["n_pos"] == 8
        # the sketch's median (first bin with cum >= ceil(0.5*8) = 4
        # -> the 4th positive, 8.0) estimated within half a bin
        import math

        assert abs(math.log(out["estimate"] / 8.0)) <= 0.5 / 20

    def test_sketch_is_histogram_sized(self, spark):
        from eventstreamml_spark.operators.sketches import quantile_sketch

        df = spark.range(1, 1001).select(
            (F.col("id") % 2).alias("grp"), F.col("id").cast("double").alias("x")
        )
        plan = (
            quantile_sketch(df, "x", "grp")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the probs explode (Generate) must sit ABOVE the first
        # aggregation, i.e. fan-out happens on histograms, not raw rows
        assert plan.find("Generate") < plan.rfind("HashAggregate")


class TestTriangleCount:
    def test_single_triangle_plus_tail(self, spark):
        from eventstreamml_spark.operators.graph import triangle_count

        # triangle 1-2-3 plus a dangling edge 3-4
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (3, 4)], "src int, dst int"
        )
        out = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
        assert out == {1: 1, 2: 1, 3: 1}

    def test_k4_every_node_in_three(self, spark):
        from eventstreamml_spark.operators.graph import triangle_count

        nodes = [1, 2, 3, 4]
        edges = spark.createDataFrame(
            [(a, b) for a in nodes for b in nodes if a < b], "src int, dst int"
        )
        out = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
        assert out == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        from eventstreamml_spark.operators.graph import triangle_count

        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)],
            "src int, dst int",
        )
        out = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
        assert out == {1: 1, 2: 1, 3: 1}


class TestConformalCalibration:
    def test_coverage_meets_target_and_deterministic(self, spark):
        from eventstreamml_spark.operators.stats import conformal_calibration

        df = spark.range(4000).select(
            F.col("id"),
            (F.col("id") % 2).alias("label"),
            ((F.col("id") % 100) / 100.0).alias("score"),
        )
        r1 = conformal_calibration(df, id_col="id", alpha=0.1).collect()
        r2 = conformal_calibration(df, id_col="id", alpha=0.1).collect()
        assert r1 == r2
        out = r1[0]
        # conformal guarantee: coverage >= 1 - alpha (up to grid rounding)
        assert out["coverage"] >= 0.9 - 0.02
        assert out["n_calib"] + out["n_test"] == 4000
        assert out["target"] == 0.9

    def test_qhat_is_the_order_statistic(self, spark):
        from eventstreamml_spark.operators.stats import conformal_calibration

        # force everything into calibration via calib_frac=1.0? split is
        # hashed — instead verify qhat against a python replay of the split
        import hashlib

        rows = [(i, i % 2, (i % 10) / 10.0) for i in range(500)]
        df = spark.createDataFrame(rows, "id long, label int, score double")
        out = conformal_calibration(df, id_col="id", alpha=0.2).collect()[0]
        calib_nc = []
        for i, y, s in rows:
            u = int(hashlib.md5(f"{i}:conformal".encode()).hexdigest()[:8], 16) / 2**32
            if u < 0.5:
                calib_nc.append(round(abs(y - s), 6))
        calib_nc.sort()
        k = math.ceil((len(calib_nc) + 1) * 0.8)
        assert out["qhat"] == pytest.approx(calib_nc[k - 1])
        assert out["n_calib"] == len(calib_nc)


class TestProductQuantization:
    def test_encode_picks_nearest_and_tiebreaks_low_code(self, spark):
        from eventstreamml_spark.operators.similarity import pq_encode

        # 1 subspace of dim 2, codes at (0,0) and (1,1)
        books = [(0, 0, [0.0, 0.0]), (0, 1, [1.0, 1.0])]
        df = spark.createDataFrame(
            [(1, [0.1, 0.1]), (2, [0.9, 0.8]), (3, [0.5, 0.5])],
            "vec_id int, embedding array<double>",
        )
        out = {r["vec_id"]: r for r in pq_encode(df, books).collect()}
        assert out[1]["code"] == 0 and out[2]["code"] == 1
        # equidistant -> lower code id wins
        assert out[3]["code"] == 0
        assert out[1]["sq_err"] == pytest.approx(0.02)

    def test_multi_subspace_rows(self, spark):
        from eventstreamml_spark.operators.similarity import pq_encode

        books = [
            (0, 0, [0.0]), (0, 1, [1.0]),
            (1, 0, [0.0]), (1, 1, [1.0]),
        ]
        df = spark.createDataFrame(
            [(7, [0.9, 0.1])], "vec_id int, embedding array<double>"
        )
        out = {(r["subspace"]): r["code"] for r in pq_encode(df, books).collect()}
        assert out == {0: 1, 1: 0}

    def test_fit_shapes_and_encode_consistency(self, spark):
        from eventstreamml_spark.operators.similarity import (
            fit_pq_codebooks,
            pq_encode,
        )

        import numpy as np

        rng = np.random.default_rng(0)
        rows = [
            (i, [float(x) for x in rng.standard_normal(8)]) for i in range(200)
        ]
        df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
        cb = fit_pq_codebooks(df, m=4, n_codes=4, seed=1, sample_cap=200)
        books = [(r["subspace"], r["code"], r["centroid"]) for r in cb.collect()]
        assert len(books) == 16 and len(books[0][2]) == 2
        enc = pq_encode(df, books)
        assert enc.count() == 200 * 4
        # every subspace's mean sq_err must beat the variance of raw
        # coords (2 dims/subspace, unit-normal): quantization helps
        err = enc.groupBy("subspace").agg(F.avg("sq_err").alias("e")).collect()
        assert all(r["e"] < 2.0 for r in err)


class TestHllDistinct:
    def test_accuracy_across_cardinalities(self, spark):
        from eventstreamml_spark.operators.sketches import hll_distinct_estimate

        for n in (50, 2000, 50000):
            df = spark.range(n).select(F.col("id").alias("k"))
            est = hll_distinct_estimate(df, "k").collect()[0]["estimate"]
            assert abs(est - n) / n < 0.05, (n, est)

    def test_grouped_and_duplicates_ignored(self, spark):
        from eventstreamml_spark.operators.sketches import hll_distinct_estimate

        df = spark.range(30000).select(
            (F.col("id") % 2 == 0).alias("g"),
            (F.col("id") % 1000).alias("k"),  # only 1000 distinct
        )
        out = {r["g"]: r["estimate"] for r in
               hll_distinct_estimate(df, "k", by="g").collect()}
        for est in out.values():
            # p=10 -> sigma ~3.2%; allow 3 sigma for this fixed key set
            assert abs(est - 500) / 500 < 0.10

    def test_deterministic(self, spark):
        from eventstreamml_spark.operators.sketches import hll_distinct_estimate

        df = spark.range(5000).select(F.col("id").alias("k"))
        a = hll_distinct_estimate(df, "k").collect()
        b = hll_distinct_estimate(df, "k").collect()
        assert a == b


class TestAveragePrecision:
    def test_hand_computed(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            average_precision_at_k,
        )

        # ranking by score desc: rel pattern [1, 0, 1, 0]
        df = spark.createDataFrame(
            [(1, 10, 0.9, 1), (1, 11, 0.8, 0), (1, 12, 0.7, 2), (1, 13, 0.6, 0)],
            "query_id int, item int, score double, rel int",
        )
        out = average_precision_at_k(df, k=10).collect()[0]
        # AP = (1/1 + 2/3) / 2
        assert out["ap"] == pytest.approx(round((1 + 2 / 3) / 2, 6))
        assert out["n_rel"] == 2

    def test_k_cut_and_no_relevant(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            average_precision_at_k,
        )

        rows = [(1, i, 1.0 - i / 100.0, 1 if i == 5 else 0) for i in range(8)]
        out = average_precision_at_k(
            spark.createDataFrame(
                rows, "query_id int, item int, score double, rel int"
            ),
            k=3,
        ).collect()[0]
        # the only hit sits at rank 6 > k -> psum 0, denom min(1, 3) = 1
        assert out["ap"] == 0.0
        none = spark.createDataFrame(
            [(2, 1, 0.5, 0)], "query_id int, item int, score double, rel int"
        )
        assert average_precision_at_k(none, k=3).collect()[0]["ap"] is None


class TestRuntimeBloomFilter:
    def test_injected_on_selective_dim_join(self, spark, tmp_path):
        # engine sessions pin bloomFilter.enabled=true; with test-scope
        # thresholds lowered, a selective dim filter must inject
        # might_contain on the fact side BEFORE its shuffle
        confs = {
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            big_p = str(tmp_path / "big")
            dim_p = str(tmp_path / "dim")
            spark.range(50000).select(
                F.col("id").alias("k"), (F.col("id") % 100).alias("v")
            ).write.mode("overwrite").parquet(big_p)
            spark.range(50000).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("f")
            ).write.mode("overwrite").parquet(dim_p)
            big = spark.read.parquet(big_p)
            dim = spark.read.parquet(dim_p).filter(F.col("f") == 3)
            plan = (
                big.join(dim, "k")
                ._jdf.queryExecution()
                .optimizedPlan()
                .toString()
            )
            assert "might_contain" in plan
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestSkipgramPairs:
    def test_window_and_symmetry(self, spark):
        from eventstreamml_spark.operators.text import skipgram_pairs

        docs = spark.createDataFrame(
            [(1, "a b c")], "doc_id int, text string"
        )
        out = {(r["center"], r["context"]): r["n"] for r in
               skipgram_pairs(docs, window=2, min_count=1).collect()}
        # pairs within +-2: (a,b),(a,c),(b,c) each symmetric
        assert out[("a", "b")] == 1 and out[("b", "a")] == 1
        assert out[("a", "c")] == 1 and out[("c", "a")] == 1
        assert len(out) == 6

    def test_window_one_excludes_distance_two(self, spark):
        from eventstreamml_spark.operators.text import skipgram_pairs

        docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
        out = {(r["center"], r["context"]) for r in
               skipgram_pairs(docs, window=1, min_count=1).collect()}
        assert ("a", "c") not in out and ("a", "b") in out

    def test_min_count_and_lowercase(self, spark):
        from eventstreamml_spark.operators.text import skipgram_pairs

        docs = spark.createDataFrame(
            [(1, "The cat"), (2, "the cat")], "doc_id int, text string"
        )
        out = {(r["center"], r["context"]): r["n"] for r in
               skipgram_pairs(docs, window=1, min_count=2).collect()}
        assert out == {("the", "cat"): 2, ("cat", "the"): 2}


class TestNegativeSampling:
    def test_labels_and_determinism(self, spark):
        from eventstreamml_spark.operators.curation import (
            negative_sample_interactions,
        )

        ev = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "a"), (3, "c")],
            "user_id long, event_type string",
        )
        out1 = negative_sample_interactions(ev, neg_pct=100).collect()
        out2 = negative_sample_interactions(ev, neg_pct=100).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        rows = {(r["user_id"], r["event_type"]): r["label"] for r in out1}
        # at 100% sampling: every non-positive grid cell is a negative
        assert rows[(1, "a")] == 1 and rows[(1, "c")] == 0
        assert rows[(3, "c")] == 1 and rows[(3, "a")] == 0
        assert len(rows) == 9  # 3 users x 3 types

    def test_no_overlap_between_labels(self, spark):
        from eventstreamml_spark.operators.curation import (
            negative_sample_interactions,
        )

        ev = spark.createDataFrame(
            [(u, t) for u in range(50) for t in ("x", "y") if (u + len(t)) % 3],
            "user_id long, event_type string",
        )
        out = negative_sample_interactions(ev, neg_pct=50)
        dup = (
            out.groupBy("user_id", "event_type")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dup == 0


class TestClassBalancedResample:
    def test_factors_and_checksum(self, spark):
        from eventstreamml_spark.operators.setops import class_balanced_resample

        rows = [("big", 1.0)] * 10 + [("small", 2.0)] * 3
        df = spark.createDataFrame(rows, "label string, x double")
        out = {r["label"]: r for r in
               class_balanced_resample(df, "label", "x").collect()}
        assert out["big"]["factor"] == 1 and out["big"]["resampled_n"] == 10
        assert out["small"]["factor"] == 3  # floor(10/3)
        assert out["small"]["resampled_n"] == 9
        assert out["small"]["value_checksum"] == pytest.approx(2.0 * 9)


class TestTemporalEmbargoSplit:
    def test_split_counts_and_gap(self, spark):
        from eventstreamml_spark.operators.setops import temporal_embargo_split

        # 100 events one minute apart
        df = spark.sql(
            "SELECT timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,id,0) AS ts "
            "FROM range(100)"
        )
        out = {r["split"]: r for r in
               temporal_embargo_split(df, test_frac=0.2,
                                      embargo_us=600_000_000).collect()}
        # cutoff = p80 of 0..99 min; test = newest ~20, embargo = 10 min
        assert out["test"]["n"] == 20
        assert out["embargoed"]["n"] == 10
        assert out["train"]["n"] == 70
        # no overlap: max train < min embargoed < min test
        assert out["train"]["max_us"] < out["embargoed"]["min_us"]
        assert out["embargoed"]["max_us"] < out["test"]["min_us"]


class TestStorageLayouts:
    def test_bucketed_join_has_no_exchange(self, spark):
        import uuid

        from eventstreamml_spark.operators.storage import bucketed_pair

        left = spark.range(2000).select(
            F.col("id").alias("k"), (F.col("id") % 9).alias("a")
        )
        right = spark.range(2000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("b")
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            l, r = bucketed_pair(
                spark, left, right, "k", cache_tag=f"plan-test-{uuid.uuid4()}"
            )
            plan = (
                l.join(r, "k")._jdf.queryExecution().executedPlan().toString()
            )
            # the whole point: both scans bucketed, zero shuffle
            assert "Exchange hashpartitioning" not in plan
            assert plan.count("Bucketed: true") == 2
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_partition_filter_reaches_scan(self, spark, tmp_path):
        from eventstreamml_spark.operators.storage import partitioned_copy

        src = str(tmp_path / "src.parquet")
        df = spark.range(1000).select(
            F.col("id"), (F.col("id") % 3).cast("string").alias("part")
        )
        df.write.parquet(src)
        path = partitioned_copy(spark.read.parquet(src), src, "part")
        scan = spark.read.parquet(path).filter(F.col("part") == "1")
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(part" in plan
        assert scan.count() == 333  # ids 1,4,...,997

    def test_partitioned_copy_is_cached(self, spark, tmp_path):
        import os

        from eventstreamml_spark.operators.storage import partitioned_copy

        src = str(tmp_path / "src2.parquet")
        spark.range(10).select(
            F.col("id"), F.lit("x").alias("part")
        ).write.parquet(src)
        df = spark.read.parquet(src)
        p1 = partitioned_copy(df, src, "part")
        m1 = os.path.getmtime(os.path.join(os.path.dirname(p1), "_done"))
        p2 = partitioned_copy(df, src, "part")
        m2 = os.path.getmtime(os.path.join(os.path.dirname(p2), "_done"))
        assert p1 == p2 and m1 == m2  # second call reused the layout


class TestWoeBins:
    def test_separating_feature_monotone_woe(self, spark):
        from eventstreamml_spark.operators.stats import woe_bins

        # x < 50 -> y=0, x >= 50 -> y=1: WOE must rise with bin
        rows = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, "x double, y int")
        out = sorted(
            woe_bins(df, "x", "y", n_bins=4).collect(), key=lambda r: r["bin"]
        )
        woes = [r["woe"] for r in out]
        assert woes == sorted(woes) and woes[0] < 0 < woes[-1]
        assert sum(r["n"] for r in out) == 100
        # IV contributions are non-negative by construction
        assert all(r["iv_contrib"] >= 0 for r in out)

    def test_uninformative_feature_near_zero(self, spark):
        from eventstreamml_spark.operators.stats import woe_bins

        rows = [(float(i), i % 2) for i in range(200)]
        df = spark.createDataFrame(rows, "x double, y int")
        out = woe_bins(df, "x", "y", n_bins=5).collect()
        assert all(abs(r["woe"]) < 0.2 for r in out)


class TestTimeDecayFeatures:
    def test_recent_outweighs_old(self, spark):
        from eventstreamml_spark.operators.aggregations import (
            time_decay_features,
        )

        df = spark.sql(
            """SELECT * FROM VALUES
               (1, timestamp'2024-01-02 00:00:00', 10.0),
               (1, timestamp'2024-01-01 00:00:00', 10.0),
               (2, timestamp'2024-01-02 00:00:00', 10.0)
               AS t(user_id, ts, value)"""
        )
        out = {r["user_id"]: r for r in
               time_decay_features(df, half_life_hours=24.0).collect()}
        # subject 1: weight 1 (at now) + 0.5 (one half-life old)
        assert out[1]["decayed_count"] == pytest.approx(1.5)
        assert out[1]["decayed_value_sum"] == pytest.approx(15.0)
        assert out[2]["decayed_count"] == pytest.approx(1.0)

    def test_null_value_skipped_in_sum_not_count(self, spark):
        from eventstreamml_spark.operators.aggregations import (
            time_decay_features,
        )

        df = spark.sql(
            """SELECT * FROM VALUES
               (1, timestamp'2024-01-01 00:00:00', CAST(NULL AS DOUBLE)),
               (1, timestamp'2024-01-01 00:00:00', 4.0)
               AS t(user_id, ts, value)"""
        )
        out = time_decay_features(df).collect()[0]
        assert out["n_events"] == 2 and out["decayed_count"] == 2.0
        assert out["decayed_value_sum"] == pytest.approx(4.0)


class TestCascadeDeleteAudit:
    def test_counts_balance_across_tables(self, spark):
        from eventstreamml_spark.operators.quality import cascade_delete_audit

        ev = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (1, "d")],
            "user_id long, x string",
        )
        od = spark.createDataFrame(
            [(1, 10.0), (9, 5.0)], "cust long, total double"
        )
        subjects = spark.createDataFrame([(1,), (3,)], "subject_id long")
        out = {r["table_name"]: r for r in cascade_delete_audit(
            [("ev", ev, "user_id"), ("od", od, "cust")], subjects
        ).collect()}
        assert out["ev"]["n_before"] == 4
        assert out["ev"]["n_deleted"] == 3  # two user 1 rows + user 3
        assert out["ev"]["n_after"] == 1
        assert out["od"]["n_deleted"] == 1 and out["od"]["n_after"] == 1
        for r in out.values():
            assert r["n_before"] == r["n_deleted"] + r["n_after"]


class TestRandomWalks:
    def test_walks_follow_edges_and_are_deterministic(self, spark):
        from eventstreamml_spark.operators.graph import random_walks

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (3, 4)], "src int, dst int"
        )
        adj = {1: [2, 3], 2: [1, 3], 3: [1, 2, 4], 4: [3]}
        out1 = random_walks(edges, n_steps=3).collect()
        out2 = random_walks(edges, n_steps=3).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        assert len(out1) == 4  # one walk per non-isolated node
        for r in out1:
            nodes = [int(x) for x in r["path"].split("->")]
            assert nodes[0] == r["start"] and nodes[-1] == r["end"]
            assert len(nodes) == 4  # start + 3 hops
            for a, b in zip(nodes, nodes[1:]):
                assert b in adj[a]  # every hop is a real edge

    def test_max_degree_cap_keeps_lowest_ids(self, spark):
        from eventstreamml_spark.operators.graph import random_walks

        # star: hub 1 connected to 2..6; cap hub adjacency at 2
        edges = spark.createDataFrame(
            [(1, n) for n in range(2, 7)], "src int, dst int"
        )
        out = random_walks(edges, n_steps=1, max_degree=2).collect()
        hub = next(r for r in out if r["start"] == 1)
        assert hub["end"] in (2, 3)  # only the two lowest ids survive


class TestJoinSizeEstimate:
    def test_exact_when_no_collisions(self, spark):
        from eventstreamml_spark.operators.sketches import join_size_estimate

        a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
        b = spark.createDataFrame([(1,), (2,), (2,), (9,)], "k long")
        out = join_size_estimate(a, b, "k", "k", n_buckets=4096).collect()[0]
        # |join| = 2*1 + 1*2 = 4; 4 keys in 4096 buckets: no collisions
        assert out["exact"] == 4 and out["estimate"] == 4
        assert out["rel_overcount"] == 0.0

    def test_collisions_only_overcount(self, spark):
        from eventstreamml_spark.operators.sketches import join_size_estimate

        a = spark.range(500).select(F.col("id").alias("k"))
        b = spark.range(500).select(F.col("id").alias("k"))
        out = join_size_estimate(a, b, "k", "k", n_buckets=64).collect()[0]
        assert out["exact"] == 500
        assert out["estimate"] >= out["exact"]  # never undercounts


class TestWindowedValueBins:
    def test_bin_edges_clamped(self, spark):
        from eventstreamml_spark.streaming.ops import windowed_value_bins

        # batch frame through the same expression path (no stream needed
        # for the binning semantics): negative clamps to 0, huge to 9
        df = spark.sql(
            """SELECT * FROM VALUES
               (timestamp'2024-01-01 00:10:00', -5.0),
               (timestamp'2024-01-01 00:20:00', 950.0),
               (timestamp'2024-01-01 00:30:00', 99999.0),
               (timestamp'2024-01-01 00:40:00', CAST(NULL AS DOUBLE))
               AS t(timestamp, value)"""
        )
        out = {
            r["bin"]: r["c"]
            for r in windowed_value_bins(df).collect()
        }
        assert out == {0: 1, 9: 2}  # null dropped, extremes clamped


class TestRound4PlanShapes:
    """Pin the documented shuffle shapes of the round-4 operators — a
    regression that adds an exchange is a scale bug even when results
    stay correct."""

    def _plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def _retrieval(self, spark):
        return spark.range(100).select(
            (F.col("id") % 5).alias("query_id"),
            F.col("id").alias("item"),
            (F.col("id") % 17 / 17.0).alias("score"),
            (F.col("id") % 3).alias("rel"),
        )

    def test_ndcg_single_exchange(self, spark):
        from eventstreamml_spark.operators.evalmetrics import ndcg_at_k

        plan = self._plan(ndcg_at_k(self._retrieval(spark)))
        # both rank windows AND the groupBy share the query-id
        # partitioning: exactly one hash exchange in the whole plan
        assert plan.count("Exchange hashpartitioning") == 1

    def test_average_precision_single_exchange(self, spark):
        from eventstreamml_spark.operators.evalmetrics import (
            average_precision_at_k,
        )

        plan = self._plan(average_precision_at_k(self._retrieval(spark)))
        assert plan.count("Exchange hashpartitioning") == 1

    def test_skipgram_no_nested_loop(self, spark):
        from eventstreamml_spark.operators.text import skipgram_pairs

        docs = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id int, text string"
        )
        plan = self._plan(skipgram_pairs(docs, window=2, min_count=1))
        # the distance fan-out must stay an equi-join — a range join
        # would plan as a nested-loop/cartesian and explode at scale
        assert "NestedLoop" not in plan and "Cartesian" not in plan

    def test_hll_register_reduction_single_hash_exchange(self, spark):
        from eventstreamml_spark.operators.sketches import hll_distinct_estimate

        df = spark.range(100).select(F.col("id").alias("k"))
        plan = self._plan(hll_distinct_estimate(df, "k"))
        # raw rows reduce to registers with ONE hash exchange; the
        # final harmonic sum is a single-partition agg of <=1024 rows
        assert plan.count("Exchange hashpartitioning") == 1


class TestSortedNeighborhood:
    def test_typo_in_block_key_still_pairs(self, spark):
        from eventstreamml_spark.operators.joins import (
            sorted_neighborhood_pairs,
        )

        # 'smith'/'smyth' sort adjacent; a hash block on the full name
        # would separate them — SNM's whole point
        df = spark.createDataFrame(
            [(1, "smith"), (2, "smyth"), (3, "zzz")],
            "id long, name string",
        )
        out = sorted_neighborhood_pairs(
            df, "id", "name", window=2, max_edit=1
        ).collect()
        pairs = {(r["a_id"], r["b_id"]): r["edit_distance"] for r in out}
        assert pairs == {(1, 2): 1}

    def test_window_bounds_candidates(self, spark):
        from eventstreamml_spark.operators.joins import (
            sorted_neighborhood_pairs,
        )

        rows = [(i, f"name{i:03d}") for i in range(10)]
        df = spark.createDataFrame(rows, "id long, name string")
        out = sorted_neighborhood_pairs(
            df, "id", "name", window=2, max_edit=3
        )
        # each record pairs with at most 2 successors: <= 2n candidates
        assert out.count() <= 2 * 10
        # every pair is within 2 rank positions: ids sort like names here
        for r in out.collect():
            assert 0 < r["b_id"] - r["a_id"] <= 2
