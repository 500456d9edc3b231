"""Round-10 operator tests.

Starts with the ADVICE-driven degenerate-denominator guards (every
denominator that can hit zero now nullif's identically on both engines,
so ANSI Spark returns NULL instead of throwing where DuckDB returns
NULL) and the EWMA bit-identical threshold form. Every fixture replays
the DuckDB oracle via ``compare`` so the unit tests double as
engine-parity checks on inputs the sf fixtures cannot produce.
"""

from __future__ import annotations

import os

import pytest

from eventstreamml_spark import queries as q
from tests.oracle import compare
from tests.test_round8_ops import _write_documents, _write_events
from tests.test_round9_ops import (
    _bucket_counts_events,
    _events_with_values,
    _write_embeddings,
)


def _run(spark, tmp_path, name):
    compare(spark, str(tmp_path), q.queries()[name], q.oracle_sql()[name])
    return q.queries()[name](spark, str(tmp_path)).collect()


class TestAdviceDegenerateGuards:
    """Round-9 ADVICE: degenerate-capable denominators must nullif on
    BOTH engines (ANSI Spark throws on double/0, DuckDB returns
    inf/NaN/NULL). Unit fixtures produce the degenerate inputs sf
    parity never sees."""

    def test_delong_single_positive_type_null_se(self, spark, tmp_path):
        # label = user_id % 3 == 0: user 3 positive, users 1/2 negative
        # -> n1 = 1, so the v1/(n1-1) variance term degenerates. Before
        # the nullif guard ANSI Spark threw DIVIDE_BY_ZERO here.
        rows = [
            (0, "2024-01-01 00:00:00", 3, "A", None, None),
            (1, "2024-01-01 00:00:01", 1, "A", None, None),
            (2, "2024-01-01 00:00:02", 2, "A", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "eval_auc_delong_se")[0]
        assert (r["n_pos"], r["n_neg"]) == (1, 2)
        assert r["auc"] is not None
        assert r["delong_se"] is None

    def test_delong_all_negative_type_null_auc(self, spark, tmp_path):
        # no positive labels at all -> 2*n1*n0 = 0: auc AND se are NULL
        rows = [
            (0, "2024-01-01 00:00:00", 1, "A", None, None),
            (1, "2024-01-01 00:00:01", 2, "A", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "eval_auc_delong_se")[0]
        assert (r["n_pos"], r["n_neg"]) == (0, 2)
        assert r["auc"] is None and r["delong_se"] is None

    def test_ari_single_row_embeddings_null(self, spark, tmp_path):
        # n = 1 -> C(n,2) = 0: the ARI expected-index term is 0/0;
        # both engines must yield NULL, not throw
        _write_embeddings(tmp_path, [(0, [1.0, -1.0, 0.5], 0)])
        r = _run(spark, tmp_path, "partition_agreement_ari_fm")[0]
        assert r["n_points"] == 1 and r["pairs_both"] == 0
        assert r["ari"] is None and r["fowlkes_mallows"] is None

    def test_turning_points_single_hour_null(self, spark, tmp_path):
        # a 1-hour span makes the variance argument 16*1-29 < 0:
        # DuckDB would hard-error on sqrt(negative) without the guard
        _bucket_counts_events(tmp_path, [5], bucket_seconds=3600)
        r = _run(spark, tmp_path, "turning_points_test_hourly")[0]
        assert r["n_hours"] == 1 and r["n_turning"] == 0
        assert r["z_stat"] is None

    def test_qq_octiles_exact_dyadic_interpolation(self, spark, tmp_path):
        # arm 0 (even users): milli-values 0..8000 step 1000; arm 1
        # (odd): shifted +500. Octile k sits at rank 1 + 8k/8 = exact
        # integer position, so every quantile is an exact order stat;
        # the CAST(k AS DOUBLE)/8 canonical form must reproduce it.
        rows = []
        for i in range(9):
            rows.append(
                (2 * i, "2024-01-01 00:00:%02d" % i, 2, "A",
                 float(i), None)
            )
            rows.append(
                (2 * i + 1, "2024-01-01 00:01:%02d" % i, 3, "A",
                 float(i) + 0.5, None)
            )
        _write_events(tmp_path, rows)
        got = {r["octile"]: r for r in
               _run(spark, tmp_path, "value_qq_octiles_arms")}
        for k in range(1, 8):
            assert got[k]["q_arm0"] == 1000.0 * k
            assert got[k]["q_arm1"] == 1000.0 * k + 500.0
            assert got[k]["qq_shift"] == 500.0

    def test_ewma_threshold_exact_integer_straddle(self, spark, tmp_path):
        # [c]*(n-1) + [c+d] keeps the EWMA at exactly c until the
        # final step, where dev = d and n*ss - s^2 = (n-1)*d^2:
        # violation iff n^2 > 9*(n-1) exactly. n=8: 64 > 63 (violates
        # by one integer part); n=7: 49 < 54 (does not). Both
        # decisions are exact-integer comparisons after the
        # bit-identical threshold fix — a half-ulp association drift
        # on either engine would flip the n=8 case.
        _bucket_counts_events(tmp_path, [1] * 7 + [9])
        r = _run(spark, tmp_path, "ewma_control_chart_6h")[0]
        assert r["n_buckets"] == 8 and r["n_violations"] == 1
        _bucket_counts_events(tmp_path, [1] * 6 + [9])
        r = _run(spark, tmp_path, "ewma_control_chart_6h")[0]
        assert r["n_buckets"] == 7 and r["n_violations"] == 0


class TestBatchARankTests:
    """Round-10 batch A: rank-based two-sample/trend/changepoint tests.
    Expected values hand-computed on tiny fixtures (the only guard
    against both-engines-agree decimal/quantization bugs)."""

    def test_cvm_separated_arms(self, spark, tmp_path):
        # arm0 = {1,2}, arm1 = {3,4}: sample-1 ranks (3,4) vs positions
        # (1,2) -> U = 2*8 = 16, T = 16/16 - 15/24 = 0.375
        rows = [
            (0, "2024-01-01 00:00:00", 2, "A", 1.0, None),
            (1, "2024-01-01 00:00:01", 2, "A", 2.0, None),
            (2, "2024-01-01 00:00:02", 3, "A", 3.0, None),
            (3, "2024-01-01 00:00:03", 3, "A", 4.0, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "cramer_von_mises_value_arms")[0]
        assert (r["n0"], r["n1"]) == (2, 2)
        assert r["cvm_t"] == 0.375

    def test_cvm_identical_arms_is_minimal(self, spark, tmp_path):
        # both arms = {1,2}: full tie groups, midranks equalize -> T at
        # its tie-degenerate minimum (-(4nm-1)/(6N) + small U term)
        rows = [
            (0, "2024-01-01 00:00:00", 2, "A", 1.0, None),
            (1, "2024-01-01 00:00:01", 2, "A", 2.0, None),
            (2, "2024-01-01 00:00:02", 3, "A", 1.0, None),
            (3, "2024-01-01 00:00:03", 3, "A", 2.0, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "cramer_von_mises_value_arms")[0]
        # per arm per tie group (c=1 within-arm positions, a=1):
        # u = 3+2*0 -> each group contributes 3*1*1 = 3... hand value:
        # ranks (1.5, 3.5) both arms, positions (1,2):
        # sum(r-i)^2 = .25+2.25 = 2.5 per arm -> U = 2*2.5+2*2.5 = 10
        # T = 10/16 - 15/24 = 0.625 - 0.625 = 0.0
        assert r["cvm_t"] == 0.0

    def test_mood_scale_central_arm(self, spark, tmp_path):
        # arm0 = {1,4} (extremes), arm1 = {2,3} (center): dev2 per rank
        # = 9,1,1,9 -> t4 = 2, ratio = 2/20 * 4/2 = 0.2
        rows = [
            (0, "2024-01-01 00:00:00", 2, "A", 1.0, None),
            (1, "2024-01-01 00:00:01", 2, "A", 4.0, None),
            (2, "2024-01-01 00:00:02", 3, "A", 2.0, None),
            (3, "2024-01-01 00:00:03", 3, "A", 3.0, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "mood_scale_rank_test_arms")[0]
        # t4w = 2 over n1 = 2 arm-1 values -> per-value mean 1.0
        assert r["mood_msq_x4"] == 1.0
        assert r["dispersion_ratio"] == 0.2

    def test_jt_increasing_blocks(self, spark, tmp_path):
        # block0 (hour 0): {1,2}; block3 (hour 19): {3,4} -> all 4
        # cross pairs ascend: JT2 = 8, E = n0*n3 = 4, ratio 2.0
        rows = [
            (0, "2024-01-01 00:10:00", 1, "A", 1.0, None),
            (1, "2024-01-01 00:20:00", 1, "A", 2.0, None),
            (2, "2024-01-01 19:10:00", 1, "A", 3.0, None),
            (3, "2024-01-01 19:20:00", 1, "A", 4.0, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "jonckheere_terpstra_hour_trend")[0]
        assert (r["jt2"], r["e_jt2"], r["trend_ratio"]) == (8, 4, 2.0)

    def test_jt_ties_count_half(self, spark, tmp_path):
        # block0: {5}, block3: {5}: one tied pair -> JT2 = 1, E = 1
        rows = [
            (0, "2024-01-01 00:10:00", 1, "A", 5.0, None),
            (1, "2024-01-01 19:10:00", 1, "A", 5.0, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "jonckheere_terpstra_hour_trend")[0]
        assert (r["jt2"], r["e_jt2"], r["trend_ratio"]) == (1, 1, 1.0)

    def test_cochran_q_hand_computed(self, spark, tmp_path):
        # day1 {A,B}, day2 {A}: k=2, S=3, G=(2,1), L=(2,1)
        # num = (4-3)^2+(2-3)^2 = 2; den = 2*(2*3-5) = 2 -> Q = 1.0
        rows = [
            (0, "2024-01-01 01:00:00", 1, "A", None, None),
            (1, "2024-01-01 02:00:00", 1, "B", None, None),
            (2, "2024-01-02 01:00:00", 1, "A", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "cochran_q_daily_types")[0]
        assert (r["n_types"], r["n_days"], r["dof"]) == (2, 2, 1)
        assert r["q_stat"] == 1.0

    def test_cochran_q_saturated_is_null(self, spark, tmp_path):
        # every type fires every day -> denominator 0 -> NULL on both
        rows = [
            (0, "2024-01-01 01:00:00", 1, "A", None, None),
            (1, "2024-01-02 01:00:00", 1, "A", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "cochran_q_daily_types")[0]
        assert r["q_stat"] is None

    def test_bowker_asymmetric_pair(self, spark, tmp_path):
        # one user path A->B->A->C: (A,B) balanced, (A,C) one-sided
        rows = [
            (0, "2024-01-01 00:00:00", 1, "A", None, None),
            (1, "2024-01-01 00:00:01", 1, "B", None, None),
            (2, "2024-01-01 00:00:02", 1, "A", None, None),
            (3, "2024-01-01 00:00:03", 1, "C", None, None),
        ]
        _write_events(tmp_path, rows)
        rs = {
            (r["type_a"], r["type_b"]): r
            for r in _run(spark, tmp_path, "bowker_symmetry_transitions")
        }
        assert rs[("A", "B")]["chi2_term"] == 0.0
        assert (rs[("A", "C")]["n_ab"], rs[("A", "C")]["n_ba"]) == (1, 0)
        assert rs[("A", "C")]["chi2_term"] == 1.0

    def test_pettitt_step_change(self, spark, tmp_path):
        # [1,1,5,5]: doubled midranks (3,3,7,7); U2 = (-2,-4,-2) ->
        # K2 = 4 at the second hour; norm = 16/(16*5) = 0.2
        _bucket_counts_events(tmp_path, [1, 1, 5, 5],
                              bucket_seconds=3600)
        r = _run(spark, tmp_path, "pettitt_changepoint_hourly")[0]
        assert (r["n_hours"], r["pettitt_k2"]) == (4, 4)
        assert r["k2_norm"] == 0.2

    def test_theil_u_perfect_association(self, spark, tmp_path):
        # segment 0 -> only type A, segment 1 -> only type B: U = 1
        rows = [
            (0, "2024-01-01 00:00:00", 0, "A", None, None),
            (1, "2024-01-01 00:00:01", 0, "A", None, None),
            (2, "2024-01-01 00:00:02", 1, "B", None, None),
            (3, "2024-01-01 00:00:03", 1, "B", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "theil_u_type_segment")[0]
        assert r["uncertainty_u"] == 1.0
        assert r["h_type_nats"] == round(0.6931471805599453, 6)

    def test_theil_u_independence_near_zero(self, spark, tmp_path):
        # identical type mix in both segments -> I = 0 -> U ~ 0
        rows = [
            (0, "2024-01-01 00:00:00", 0, "A", None, None),
            (1, "2024-01-01 00:00:01", 0, "B", None, None),
            (2, "2024-01-01 00:00:02", 1, "A", None, None),
            (3, "2024-01-01 00:00:03", 1, "B", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "theil_u_type_segment")[0]
        assert abs(r["uncertainty_u"]) <= 2e-6

    def test_haar_energy_at_scale_2_only(self, spark, tmp_path):
        # [3,1,2,2]: level-1 details (2,0) -> E=64 (x16); level-2
        # detail (3+1)-(2+2)=0 -> E=0; levels 3-5 have no full block
        _bucket_counts_events(tmp_path, [3, 1, 2, 2],
                              bucket_seconds=3600)
        rs = {r["level"]: r for r in
              _run(spark, tmp_path, "haar_wavelet_energy_hourly")}
        assert sorted(rs) == [1, 2]
        assert (rs[1]["n_blocks"], rs[1]["energy_scaled"]) == (2, 64)
        assert rs[1]["energy_share"] == 1.0
        assert (rs[2]["energy_scaled"], rs[2]["energy_share"]) == (0, 0.0)


class TestRound10PlanShapes:
    """Plan pins for the round-10 batches: the histogram/scaffold
    substrates must never spill a cartesian product or a row-level
    global sort."""

    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        from eventstreamml_spark import queries as qq

        return (
            qq.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    def test_cvm_no_cartesian(self, spark):
        plan = self._plan("cramer_von_mises_value_arms", spark)
        assert "CartesianProduct" not in plan

    def test_jt_single_histogram_shuffle(self, spark):
        plan = self._plan("jonckheere_terpstra_hour_trend", spark)
        assert "CartesianProduct" not in plan

    def test_pettitt_rank_join_broadcasts(self, spark):
        # the count-histogram rank relation joins the hour grid via
        # broadcast; nothing data-sized crosses
        plan = self._plan("pettitt_changepoint_hourly", spark)
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_haar_level_expansion_is_tiny(self, spark):
        # the 5-level cross join happens on the bounded hour grid with
        # a broadcast of the 5-row level relation, never on raw events
        plan = self._plan("haar_wavelet_energy_hourly", spark)
        assert "CartesianProduct" not in plan

    def test_cochran_broadcasts_scalars(self, spark):
        plan = self._plan("cochran_q_daily_types", spark)
        assert "CartesianProduct" not in plan


def _counts_by_type_hour(tmp_path, per_type_hour):
    """per_type_hour: {event_type: [count in hour 0, hour 1, ...]}."""
    import pandas as pd

    rows = []
    eid = 0
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    for ty, counts in per_type_hour.items():
        for i, c in enumerate(counts):
            for j in range(c):
                rows.append(
                    (eid, str(t0 + pd.Timedelta(hours=i, seconds=j)),
                     1 + j, ty, None, None)
                )
                eid += 1
    _write_events(tmp_path, rows)


class TestBatchBRegressionAndDiversity:
    """Round-10 batch B: exact-moment regression, concentration, and
    lexical diversity. Hand-computed expected values throughout."""

    def test_ar2_alternating_series(self, spark, tmp_path):
        # y = [1,2,1,2]: n*y-S = (-2,2,-2,2): C0=16, C1=-12, C2=8
        # r1=-0.75, r2=0.5; phi1=-96/112=-6/7, phi2=-16/112=-1/7
        _counts_by_type_hour(tmp_path, {"A": [1, 2, 1, 2]})
        r = _run(spark, tmp_path, "ar2_yule_walker_hourly")[0]
        assert (r["r1"], r["r2"]) == (-0.75, 0.5)
        assert r["phi1"] == round(-6.0 / 7.0, 6)
        assert r["phi2"] == round(-1.0 / 7.0, 6)

    def test_partial_corr_collinear_is_one(self, spark, tmp_path):
        # clicks = purchases = [1,2,3], views = [1,1,2]:
        # r_xy = 1 -> partial stays 1 (shared-control cancellation)
        _counts_by_type_hour(
            tmp_path,
            {"click": [1, 2, 3], "purchase": [1, 2, 3],
             "view": [1, 1, 2]},
        )
        r = _run(spark, tmp_path, "partial_correlation_hourly_types")[0]
        assert r["r_click_purchase"] == 1.0
        assert r["partial_r_given_view"] == 1.0

    def test_granger_hand_computed(self, spark, tmp_path):
        # clicks [1,0,2,0,1], purchases [0,1,0,2,1]: m=4 lag points,
        # scaled moments: Syy=8 Suu=11 Sxx=11 Suy=-4 Sxy=8 Sux=-9:
        # RSSr=72/11, RSSu=0.4, F=(72/11-0.4)/0.4*1=169/11, beta=1.3
        _counts_by_type_hour(
            tmp_path,
            {"click": [1, 0, 2, 0, 1], "purchase": [0, 1, 0, 2, 1]},
        )
        r = _run(spark, tmp_path,
                 "granger_lag1_clicks_to_purchases")[0]
        assert r["n_points"] == 4
        assert r["beta_click_lag1"] == 1.3
        assert r["granger_f"] == round(169.0 / 11.0, 6)

    def test_drawdown_hand_computed(self, spark, tmp_path):
        from tests.test_round8b_ops import _write_orders

        orders = [
            (1, 1, "O", 100.0, "1995-01-01", "1-URGENT"),
            (2, 1, "O", 50.0, "1995-01-02", "1-URGENT"),
            (3, 1, "O", 120.0, "1995-01-03", "1-URGENT"),
            (4, 1, "O", 80.0, "1995-01-04", "1-URGENT"),
        ]
        _write_orders(tmp_path, orders)
        r = _run(spark, tmp_path, "orders_daily_revenue_drawdown")[0]
        assert r["n_days"] == 4
        assert r["max_drawdown_cents"] == 5000
        assert r["drawdown_frac"] == 0.5

    def test_lorenz_ten_customers(self, spark, tmp_path):
        from tests.test_round8b_ops import _write_orders

        orders = [
            (k, k, "O", 100.0 * k, "1995-01-0%d" % (1 + k % 9),
             "1-URGENT")
            for k in range(1, 11)
        ]
        _write_orders(tmp_path, orders)
        rs = {r["decile"]: r for r in
              _run(spark, tmp_path, "revenue_lorenz_curve_deciles")}
        assert len(rs) == 10
        assert rs[1]["rev_share"] == round(100.0 / 5500.0, 6)
        assert rs[5]["cum_share"] == round(1500.0 / 5500.0, 6)
        assert rs[10]["cum_share"] == 1.0

    def test_simpson_and_yule_hand_computed(self, spark, tmp_path):
        # "a b b c c c c": counts (1,2,4), N=7
        _write_documents(tmp_path, [(0, "a b b c c c c", "en", "s")])
        r = _run(spark, tmp_path, "simpson_diversity_by_lang")[0]
        assert (r["n_tokens"], r["n_types"]) == (7, 3)
        assert r["simpson_d"] == round(14.0 / 42.0, 6)
        assert r["berger_parker"] == round(4.0 / 7.0, 6)
        r = _run(spark, tmp_path, "doc_yule_k_by_lang")[0]
        assert r["yule_k"] == round(1e4 * 14 / 49.0, 6)
        assert r["sichel_s"] == round(1.0 / 3.0, 6)

    def test_weekly_kl_hand_computed(self, spark, tmp_path):
        import math

        # week1 {A:1, B:1}, week2 {A:2}; overall A:3 B:1 N:4
        rows = [
            (0, "2024-01-01 00:00:00", 1, "A", None, None),
            (1, "2024-01-01 00:00:01", 1, "B", None, None),
            (2, "2024-01-08 00:00:00", 1, "A", None, None),
            (3, "2024-01-08 00:00:01", 1, "A", None, None),
        ]
        _write_events(tmp_path, rows)
        rs = sorted(
            _run(spark, tmp_path, "kl_divergence_weekly_type_mix"),
            key=lambda r: r["week"],
        )
        exp1 = (
            math.floor(1e6 * math.log(4.0 / 6.0))
            + math.floor(1e6 * math.log(2.0))
        ) / 1e6 / 2
        exp2 = math.floor(2e6 * math.log(8.0 / 6.0)) / 1e6 / 2
        assert rs[0]["kl_nats"] == round(exp1, 6)
        assert rs[1]["kl_nats"] == round(exp2, 6)

    def test_granger_constant_click_is_null(self, spark, tmp_path):
        # constant click series -> Sxx_c partial... den = Suu*0 - 0:
        # unrestricted design is singular -> NULL on both engines
        _counts_by_type_hour(
            tmp_path,
            {"click": [1, 1, 1, 1], "purchase": [2, 1, 2, 1]},
        )
        r = _run(spark, tmp_path,
                 "granger_lag1_clicks_to_purchases")[0]
        assert r["granger_f"] is None
        assert r["beta_click_lag1"] is None


class TestRound10PlanShapesB:
    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        from eventstreamml_spark import queries as qq

        return (
            qq.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    def test_ar2_broadcasts_scalars(self, spark):
        plan = self._plan("ar2_yule_walker_hourly", spark)
        assert "CartesianProduct" not in plan

    def test_granger_single_hour_pass(self, spark):
        plan = self._plan("granger_lag1_clicks_to_purchases", spark)
        assert "CartesianProduct" not in plan

    def test_lorenz_no_cartesian(self, spark):
        plan = self._plan("revenue_lorenz_curve_deciles", spark)
        assert "CartesianProduct" not in plan

    def test_kl_weekly_no_cartesian(self, spark):
        plan = self._plan("kl_divergence_weekly_type_mix", spark)
        assert "CartesianProduct" not in plan


class TestBatchCModelFitAndVerify:
    """Round-10 batch C: duration/calibration/ratio-metric fitting and
    near-dup/hubness/BFS verification."""

    def test_weibull_python_replica(self, spark, tmp_path):
        import math

        rows = [
            (0, "2024-01-01 00:00:00", 1, "purchase", None, None),
            (1, "2024-01-01 00:00:10", 1, "purchase", None, None),
            (2, "2024-01-01 00:00:30", 1, "purchase", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "weibull_fit_interpurchase")[0]
        fq = lambda x: math.floor(x * 1e6)  # noqa: E731
        n = 2
        xs = {10: fq(math.log(10)), 20: fq(math.log(20))}
        ys = {}
        for d, r2m1 in ((10, 1), (20, 3)):
            fpos = (r2m1 + 0.4) / (2 * n + 0.8)
            ys[d] = fq(math.log(-math.log(1 - fpos)))
        sx, sy = xs[10] + xs[20], ys[10] + ys[20]
        sxx = xs[10] ** 2 + xs[20] ** 2
        sxy = xs[10] * ys[10] + xs[20] * ys[20]
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        scale = math.exp(-((sy - slope * sx) / n) / slope / 1e6)
        assert r["n_gaps"] == 2
        assert r["weibull_shape"] == round(slope, 6)
        assert r["weibull_scale_sec"] == round(scale, 4)

    def test_hosmer_lemeshow_single_bin_term(self, spark, tmp_path):
        # construct 2 events in one type; the fixed-width bins and the
        # micro-quantized E replicate exactly in python
        import hashlib
        import math

        rows = [
            (0, "2024-01-01 00:00:00", 3, "A", None, None),
            (1, "2024-01-01 00:00:01", 1, "A", None, None),
        ]
        _write_events(tmp_path, rows)
        got = _run(spark, tmp_path, "eval_hosmer_lemeshow_deciles")
        bins = {}
        for eid, uid in ((0, 3), (1, 1)):
            y = 1 if uid % 3 == 0 else 0
            u = (
                int(hashlib.md5(str(eid).encode()).hexdigest()[:4], 16)
                % 1000
            ) / 999.0
            s = 0.3 * y + 0.7 * u
            b = min(math.floor(s * 10), 9)
            o, em, nb = bins.get(b, (0, 0, 0))
            bins[b] = (o + y, em + math.floor(s * 1e6), nb + 1)
        for r in got:
            o, em, nb = bins[r["bin"]]
            assert (r["n_obs"], r["n_pos"]) == (nb, o)
            assert r["e_pos"] == round(em / 1e6, 6)
            exp = (o * 10**6 - em) ** 2 * nb / (em * (nb * 10**6 - em))
            assert r["hl_term"] == round(exp + 0.0, 6)

    def test_delta_method_hand_computed(self, spark, tmp_path):
        import math

        rows = [
            (0, "2024-01-01 00:00:00", 2, "purchase", 1.0, None),
            (1, "2024-01-01 00:00:01", 2, "click", None, None),
            (2, "2024-01-01 00:00:02", 4, "purchase", 3.0, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "ab_delta_method_ratio_se")[0]
        ratio = 4000 / 3
        sd2 = (
            (1000**2 + 3000**2)
            - 2 * ratio * (1000 * 2 + 3000 * 1)
            + ratio * ratio * 5
        )
        se = math.sqrt(2 * sd2) / 3
        assert (r["arm"], r["n_users"]) == (0, 2)
        assert r["purchase_milli_per_event"] == round(ratio, 6)
        assert r["ratio_se"] == round(se, 6)

    def test_edit_distance_near_pair_only(self, spark, tmp_path):
        base = "x" * 40
        _write_documents(
            tmp_path,
            [
                (0, base + " tail one", "en", "s"),
                (1, base + " tail twe", "en", "s"),
                (2, "completely different text here", "en", "s"),
            ],
        )
        rs = _run(spark, tmp_path, "dedup_edit_distance_verify")
        assert [(r["doc_a"], r["doc_b"], r["edit_dist"]) for r in rs] == [
            (0, 1, 2)
        ]
        assert rs[0]["rel_dist"] == round(2.0 / 49.0, 6)

    def test_hubness_small_clique(self, spark, tmp_path):
        # 4 vectors, k=5 >= n-1: every vector appears in all 3 other
        # top lists -> k-occurrence 3 for all 4
        _write_embeddings(
            tmp_path,
            [
                (0, [1.0, 0.0], 0),
                (1, [0.9, 0.1], 0),
                (2, [0.8, 0.2], 0),
                (3, [0.0, 1.0], 1),
            ],
        )
        rs = {
            r["k_occurrence"]: r["n_vectors"]
            for r in _run(spark, tmp_path,
                          "embedding_hubness_k_occurrence")
        }
        assert rs == {3: 4}

    def test_bfs_path_graph(self, spark, tmp_path):
        # events (eid=10,u=1), (eid=20,u=10) -> edges 1-10, 10-20;
        # hub = node 10 (degree 2) -> hops {0:1, 1:2}
        rows = [
            (10, "2024-01-01 00:00:00", 1, "A", None, None),
            (20, "2024-01-01 00:00:01", 10, "A", None, None),
        ]
        _write_events(tmp_path, rows)
        rs = {r["hop"]: r["n_nodes"]
              for r in _run(spark, tmp_path, "graph_bfs_hops_from_hub")}
        assert rs == {0: 1, 1: 2}

    def test_elasticity_python_replica(self, spark, tmp_path):
        import math

        from tests.test_round9_ops import _write_lineitem

        import pyarrow as pa
        import pyarrow.parquet as pq

        part = pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_name": pa.array(["a", "b"], pa.string()),
                "p_brand": pa.array(["Brand#1", "Brand#1"], pa.string()),
                "p_type": pa.array(["t", "t"], pa.string()),
                "p_retailprice": pa.array([1.0, 2.0], pa.float64()),
            }
        )
        pq.write_table(part, os.path.join(str(tmp_path), "part.parquet"))
        li = [
            (1, 1, 1, 1, 10.0, 1000.0, 0.0, 0.0, "N", "O", "1995-01-01"),
            (2, 2, 1, 1, 5.0, 2000.0, 0.0, 0.0, "N", "O", "1995-01-02"),
        ]
        _write_lineitem(str(tmp_path), li)
        r = _run(spark, tmp_path,
                 "price_quantity_elasticity_by_brand")[0]
        fq = lambda x: math.floor(x * 1000)  # noqa: E731
        pts = [(fq(math.log(1000.0)), fq(math.log(10.0))),
               (fq(math.log(2000.0)), fq(math.log(5.0)))]
        n = 2
        sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
        sxx = sum(p[0] ** 2 for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        exp = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert r["n_lineitems"] == 2
        assert r["elasticity"] == round(exp + 0.0, 6)

    def test_reliability_perfect_binary_score(self, spark, tmp_path):
        # two events, one positive: slope/intercept replicate in python
        import hashlib
        import math

        rows = [
            (0, "2024-01-01 00:00:00", 3, "A", None, None),
            (1, "2024-01-01 00:00:01", 1, "A", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path,
                 "eval_reliability_slope_intercept")[0]
        pts = []
        for eid, uid in ((0, 3), (1, 1)):
            y = 1 if uid % 3 == 0 else 0
            u = (
                int(hashlib.md5(str(eid).encode()).hexdigest()[:4], 16)
                % 1000
            ) / 999.0
            pts.append((math.floor((0.3 * y + 0.7 * u) * 1e6), y))
        n = 2
        s1 = sum(p[0] for p in pts); ny = sum(p[1] for p in pts)
        s2 = sum(p[0] ** 2 for p in pts)
        sy1 = sum(p[0] * p[1] for p in pts)
        bm = (n * sy1 - s1 * ny) / (n * s2 - s1 * s1)
        assert r["reliability_slope"] == round(bm * 1e6 + 0.0, 6)
        assert r["reliability_intercept"] == round(
            (ny - bm * s1) / n + 0.0, 6
        )


class TestRound10PlanShapesC:
    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        from eventstreamml_spark import queries as qq

        return (
            qq.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    def test_elasticity_broadcasts_part(self, spark):
        plan = self._plan("price_quantity_elasticity_by_brand", spark)
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_edit_distance_blocked_equijoin(self, spark):
        # candidate pairs come from the prefix equi-join, never a
        # corpus cross product
        plan = self._plan("dedup_edit_distance_verify", spark)
        assert "CartesianProduct" not in plan

    def test_weibull_histogram_substrate(self, spark):
        plan = self._plan("weibull_fit_interpurchase", spark)
        assert "CartesianProduct" not in plan

    def test_hl_single_groupby(self, spark):
        plan = self._plan("eval_hosmer_lemeshow_deciles", spark)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestBatchDDistancesAndSeparation:
    """Round-10 batch D: variance homogeneity, distribution distances,
    zero inflation, lexical constants, KS separation, tau_int."""

    def test_bartlett_python_replica(self, spark, tmp_path):
        import math

        rows = [
            (i, "2024-01-01 00:00:%02d" % i, 1, t, v, None)
            for i, (t, v) in enumerate(
                [("A", 1.0), ("A", 2.0), ("A", 3.0),
                 ("B", 1.0), ("B", 5.0), ("B", 9.0)]
            )
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "bartlett_test_value_by_type")[0]
        groups = {"A": [1000, 2000, 3000], "B": [1000, 5000, 9000]}
        k, n, ssw_m, lnt, inv = 2, 6, 0, 0, 0
        for vs in groups.values():
            ni, si = len(vs), sum(vs)
            qi = sum(v * v for v in vs)
            ssw_m += math.floor((ni * qi - si * si) / ni * 1000)
            lnt += math.floor(
                (ni - 1)
                * math.log((ni * qi - si * si) / (ni * (ni - 1)))
                * 1e6
            )
            inv += math.floor(1e9 / (ni - 1))
        t = (
            (n - k) * math.log(ssw_m / 1000 / (n - k)) - lnt / 1e6
        ) / (1 + (inv / 1e9 - 1 / (n - k)) / (3 * (k - 1)))
        assert (r["n_groups"], r["n_values"]) == (2, 6)
        assert r["bartlett_t"] == round(t + 0.0, 6)

    def test_bartlett_drops_zero_variance_group(self, spark, tmp_path):
        # constant group would ln(0) (DuckDB -inf vs Spark NULL):
        # the variance guard excludes it from k on both engines
        rows = [
            (i, "2024-01-01 00:00:%02d" % i, 1, t, v, None)
            for i, (t, v) in enumerate(
                [("A", 2.0), ("A", 2.0), ("B", 1.0), ("B", 5.0),
                 ("C", 1.0), ("C", 9.0)]
            )
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "bartlett_test_value_by_type")[0]
        assert r["n_groups"] == 2 and r["n_values"] == 4

    def test_bartlett_single_surviving_group_null(self, spark, tmp_path):
        # only B survives the ni>=2/nonzero-variance filter -> k=1 ->
        # the 3*(k-1) correction denominator is 0: nullif on both
        # engines yields NULL bartlett_t instead of an ANSI throw
        rows = [
            (i, "2024-01-01 00:00:%02d" % i, 1, t, v, None)
            for i, (t, v) in enumerate(
                [("A", 2.0), ("A", 2.0), ("B", 1.0), ("B", 5.0),
                 ("C", 7.0)]
            )
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "bartlett_test_value_by_type")[0]
        assert (r["n_groups"], r["n_values"]) == (1, 2)
        assert r["bartlett_t"] is None

    def test_distribution_distance_hand_computed(self, spark, tmp_path):
        import math

        rows = [
            (0, "2024-01-01 00:00:00", 2, "A", 1.0, None),
            (1, "2024-01-01 00:00:01", 2, "A", 1.0, None),
            (2, "2024-01-01 00:00:02", 2, "A", 2.0, None),
            (3, "2024-01-01 00:00:03", 3, "A", 2.0, None),
            (4, "2024-01-01 00:00:04", 3, "A", 3.0, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "distribution_distance_arms")[0]
        assert (r["n0"], r["n1"]) == (3, 2)
        assert r["tv_distance"] == round(8.0 / 12.0, 6)
        assert r["bhattacharyya"] == round(1.0 / math.sqrt(6.0), 6)

    def test_lifespan_octiles_exact_ranks(self, spark, tmp_path):
        # 9 users with spans 0..8 sec: octile k lands on exact rank k
        rows = []
        eid = 0
        for uidx in range(9):
            rows.append(
                (eid, "2024-01-01 00:00:00", uidx, "A", None, None)
            )
            eid += 1
            rows.append(
                (eid, "2024-01-01 00:00:%02d" % uidx, uidx, "A",
                 None, None)
            )
            eid += 1
        _write_events(tmp_path, rows)
        rs = {r["octile"]: r["span_sec"]
              for r in _run(spark, tmp_path, "subject_lifespan_octiles")}
        assert rs == {k: float(k) for k in range(1, 8)}

    def test_zero_inflation_hand_computed(self, spark, tmp_path):
        import math

        _bucket_counts_events(tmp_path, [1, 0, 0, 2])
        r = _run(spark, tmp_path, "zero_inflation_score_6h")[0]
        assert (r["n_buckets"], r["n_zero"]) == (4, 2)
        assert r["p0_hat"] == 0.5
        assert r["p0_poisson"] == round(math.exp(-0.75), 6)
        assert r["excess_zero"] == round(0.5 - math.exp(-0.75), 6)

    def test_honore_hand_computed(self, spark, tmp_path):
        import math

        _write_documents(tmp_path, [(0, "a b b c c c c", "en", "s")])
        r = _run(spark, tmp_path, "doc_honore_statistic_by_lang")[0]
        assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (7, 3, 1)
        assert r["hapax_share"] == round(1.0 / 3.0, 6)
        assert r["honore_r"] == round(100 * math.log(7) * 3 / 2, 6)

    def test_honore_all_hapax_is_null(self, spark, tmp_path):
        _write_documents(tmp_path, [(0, "a b c", "en", "s")])
        r = _run(spark, tmp_path, "doc_honore_statistic_by_lang")[0]
        assert r["honore_r"] is None

    def test_ks_separation_perfect_split(self, spark, tmp_path):
        # type A: pos user 3, neg user 1 -> scores differ, KS = 1
        rows = [
            (0, "2024-01-01 00:00:00", 3, "A", None, None),
            (1, "2024-01-01 00:00:01", 1, "A", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "eval_ks_score_separation")[0]
        assert (r["n_pos"], r["n_neg"]) == (1, 1)
        assert r["ks_stat"] == 1.0

    def test_tau_int_alternating_series(self, spark, tmp_path):
        # [1,2,1,2]: rho = (-0.75, 0.5, -0.25) at lags 1..3 ->
        # tau = 1 + 2*(-0.5) = 0.0
        _bucket_counts_events(tmp_path, [1, 2, 1, 2],
                              bucket_seconds=3600)
        r = _run(spark, tmp_path,
                 "integrated_autocorrelation_time_hourly")[0]
        assert r["n_hours"] == 4
        assert r["rho1"] == -0.75
        assert r["tau_int"] == 0.0

    def test_tau_int_constant_series_null(self, spark, tmp_path):
        # constant hourly counts -> all centered deviations d = 0 ->
        # c0 = 0: the nullif(c0, 0) guard yields NULL rho1/tau_int on
        # both engines instead of an ANSI DIVIDE_BY_ZERO throw
        _bucket_counts_events(tmp_path, [3, 3, 3, 3],
                              bucket_seconds=3600)
        r = _run(spark, tmp_path,
                 "integrated_autocorrelation_time_hourly")[0]
        assert r["n_hours"] == 4
        assert r["rho1"] is None
        assert r["tau_int"] is None


class TestRound10PlanShapesD:
    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        from eventstreamml_spark import queries as qq

        return (
            qq.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    def test_bartlett_single_group_pass(self, spark):
        plan = self._plan("bartlett_test_value_by_type", spark)
        assert "CartesianProduct" not in plan

    def test_distance_histogram_substrate(self, spark):
        plan = self._plan("distribution_distance_arms", spark)
        assert "CartesianProduct" not in plan

    def test_ks_keyed_windows_only(self, spark):
        # partitioned windows over the score histogram: no global sort
        # of raw rows, no cartesian
        plan = self._plan("eval_ks_score_separation", spark)
        assert "CartesianProduct" not in plan

    def test_tau_lag_join_is_hash(self, spark):
        # the 24-lag expansion joins grid-to-grid on h+k equi-keys
        plan = self._plan("integrated_autocorrelation_time_hourly",
                          spark)
        assert "CartesianProduct" not in plan


class TestInt128Widening:
    """The N^3-magnitude rank sums (CvM, Mood) and squared-microlog
    moments (Weibull, Bartlett, elasticity) ride int128 intermediates
    (Spark DECIMAL(38,0) / DuckDB HUGEINT): at corpus scale the per-row
    products exceed BIGINT (~1.8M values for 3*c*a^2) and ANSI Spark
    would throw. This pins the widened arithmetic agreeing exactly
    across engines BEYOND the int64 range."""

    def test_cvm_term_formula_beyond_int64(self, spark):
        import duckdb

        c, a = 2_000_000, 3_999_999  # 3*c*a^2 ~ 9.6e19 > 2^63
        expr = (
            "CAST(3 AS DECIMAL(38,0)) * {c} * {a} * {a}"
            " - CAST(6 AS DECIMAL(38,0)) * {a} * {c} * ({c} - 1)"
            " + CAST(2 AS DECIMAL(38,0)) * {c} * ({c} - 1)"
            " * (2 * {c} - 1)"
        ).format(c=c, a=a)
        got_spark = spark.range(1).selectExpr(
            f"CAST({expr} AS STRING) AS v"
        ).collect()[0]["v"]
        dexpr = (
            "3::HUGEINT * {c} * {a} * {a}"
            " - 6::HUGEINT * {a} * {c} * ({c} - 1)"
            " + 2::HUGEINT * {c} * ({c} - 1) * (2 * {c} - 1)"
        ).format(c=c, a=a)
        got_duck = duckdb.sql(
            f"SELECT CAST({dexpr} AS VARCHAR) AS v"
        ).fetchone()[0]
        expect = 3 * c * a * a - 6 * a * c * (c - 1) + 2 * c * (c - 1) * (
            2 * c - 1
        )
        assert int(got_spark) == expect
        assert int(got_duck) == expect
        assert expect > 2**63  # the case BIGINT could not hold


class TestRound10EdgeCases:
    def test_lorenz_tied_revenue_deterministic_split(self, spark, tmp_path):
        # two customers with identical totals: the (rev, custkey)
        # ntile order is fully deterministic on both engines
        from tests.test_round8b_ops import _write_orders

        orders = [
            (1, 1, "O", 100.0, "1995-01-01", "1-URGENT"),
            (2, 2, "O", 100.0, "1995-01-02", "1-URGENT"),
            (3, 3, "O", 300.0, "1995-01-03", "1-URGENT"),
        ]
        _write_orders(tmp_path, orders)
        rs = {r["decile"]: r for r in
              _run(spark, tmp_path, "revenue_lorenz_curve_deciles")}
        assert rs[1]["rev_cents"] == 10000
        assert rs[2]["rev_cents"] == 10000
        assert rs[3]["rev_cents"] == 30000
        assert rs[3]["cum_share"] == 1.0

    def test_bowker_no_transitions_empty(self, spark, tmp_path):
        # one event per user -> no transitions -> empty relation on
        # both engines (the driver records 0 rows, hash of nothing)
        rows = [
            (0, "2024-01-01 00:00:00", 1, "A", None, None),
            (1, "2024-01-01 00:00:01", 2, "B", None, None),
        ]
        _write_events(tmp_path, rows)
        assert _run(spark, tmp_path, "bowker_symmetry_transitions") == []


@pytest.mark.slow  # 3M-row overflow smoke (minutes) — SPARK_GRAFT_SLOW_TESTS=1
class TestCvmScaleSmoke:
    def test_cvm_3m_rows_beyond_bigint_terms(self, spark):
        """30x-bench-volume smoke for the int128 widening: at 3M
        values the tripled rank sums reach ~1e19-1e20 (> 2^63), which
        the pre-widening BIGINT arithmetic could not represent (ANSI
        Spark would throw). The synthetic frame has 1000 distinct
        milli-values, so an exact python-bignum replica runs over the
        tiny histogram while Spark aggregates the full 3M rows."""
        import math

        n = 3_000_000
        v = spark.range(n).selectExpr(
            "CAST(id % 2 AS BIGINT) AS arm",
            # skewed multimodal values: 1000 distinct levels
            "CAST((id * id) % 1000 AS BIGINT) AS vm",
        )
        from pyspark.sql import Window as W, functions as F

        hist = v.groupBy("vm").agg(
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("long")
            .alias("c0"),
        )
        wb = W.orderBy("vm").rowsBetween(W.unboundedPreceding, -1)
        cum = hist.select(
            "vm",
            "c1",
            "c0",
            F.coalesce(F.sum(F.col("c1") + F.col("c0")).over(wb), F.lit(0))
            .cast("long")
            .alias("cb"),
            F.coalesce(F.sum("c1").over(wb), F.lit(0))
            .cast("long")
            .alias("cb1"),
            F.coalesce(F.sum("c0").over(wb), F.lit(0))
            .cast("long")
            .alias("cb0"),
        )
        got = (
            cum.selectExpr(
                "c1",
                "c0",
                "(2 * cb + c1 + c0 + 1) - 2 * cb1 - 2 AS a1",
                "(2 * cb + c1 + c0 + 1) - 2 * cb0 - 2 AS a0",
            )
            .selectExpr(
                "CAST(sum(CAST(3 AS DECIMAL(38,0)) * c1 * a1 * a1"
                " - CAST(6 AS DECIMAL(38,0)) * a1 * c1 * (c1 - 1)"
                " + CAST(2 AS DECIMAL(38,0)) * c1 * (c1 - 1)"
                " * (2 * c1 - 1)) AS STRING) AS u1"
            )
            .collect()[0]["u1"]
        )
        # exact bignum replica over the 1000-level histogram
        from collections import defaultdict

        h = defaultdict(lambda: [0, 0])
        # (i*i) % 1000 has period 1000 in i; count per residue class
        per = [0, 0]
        counts = defaultdict(lambda: [0, 0])
        for i in range(1000):
            counts[(i * i) % 1000][i % 2] += 1
        reps = n // 1000
        hist_py = {
            vm: (c[1] * reps, c[0] * reps) for vm, c in counts.items()
        }  # (c1, c0) with arm = id%2: odd ids arm 1
        cb = cb1 = 0
        cb0 = 0
        u1 = 0
        for vm in sorted(hist_py):
            c1, c0 = hist_py[vm]
            a1 = (2 * cb + c1 + c0 + 1) - 2 * cb1 - 2
            u1 += (
                3 * c1 * a1 * a1
                - 6 * a1 * c1 * (c1 - 1)
                + 2 * c1 * (c1 - 1) * (2 * c1 - 1)
            )
            cb += c1 + c0
            cb1 += c1
            cb0 += c0
        assert u1 > 2**63  # BIGINT could not have held this
        assert int(got) == u1


class TestRankInvariance:
    """Rank statistics must be invariant under strictly increasing
    value transforms that preserve the tie structure — a property the
    oracles can't check (they see only one dataset). Values are exact
    milli-representable so v -> 2v + 5 maps the milli-histogram
    monotonically with identical ties."""

    VALS = [("A", 1.0), ("A", 2.5), ("A", 2.5), ("B", 4.0),
            ("B", 0.5), ("A", 7.0), ("B", 7.0), ("B", 3.5)]

    def _write(self, tmp_path, transform):
        rows = [
            (i, "2024-01-01 0%d:00:%02d" % (i % 2 * 7, i), 1 + i, t,
             transform(v), None)
            for i, (t, v) in enumerate(self.VALS)
        ]
        _write_events(tmp_path, rows)

    @pytest.mark.parametrize(
        "name,cols",
        [
            ("cramer_von_mises_value_arms", ("cvm_t",)),
            ("mood_scale_rank_test_arms",
             ("mood_msq_x4", "dispersion_ratio")),
            ("jonckheere_terpstra_hour_trend",
             ("jt2", "e_jt2", "trend_ratio")),
        ],
    )
    def test_invariant_under_monotone_transform(
        self, spark, tmp_path, name, cols
    ):
        import os

        base = os.path.join(str(tmp_path), "base")
        tx = os.path.join(str(tmp_path), "tx")
        os.makedirs(base), os.makedirs(tx)
        self._write(base, lambda v: v)
        self._write(tx, lambda v: 2.0 * v + 5.0)
        r0 = _run(spark, base, name)[0]
        r1 = _run(spark, tx, name)[0]
        for c in cols:
            assert r0[c] == r1[c], (name, c, r0[c], r1[c])
