"""Round-11 operator tests (batch A: LSH-bucketed hubness + corpus
profiling + quota/retention planning).

Every fixture replays the DuckDB oracle via ``compare`` so the unit
tests double as engine-parity checks on hand-computable inputs the sf
fixtures cannot produce.
"""

from __future__ import annotations

import math

import pytest

from eventstreamml_spark import queries as q
from tests.oracle import compare
from tests.test_round8_ops import _write_documents, _write_events
from tests.test_round9_ops import _write_embeddings


def _run(spark, tmp_path, name):
    compare(spark, str(tmp_path), q.queries()[name], q.oracle_sql()[name])
    return q.queries()[name](spark, str(tmp_path)).collect()


class TestHubnessLshBucketed:
    def test_single_bucket_identical_direction(self, spark, tmp_path):
        # 7 positively-scaled copies of the all-ones direction share one
        # hyperplane bucket with pairwise cosine exactly 1.0, so each
        # top-5 is the 5 smallest other ids: ids 0-4 occur 6x, id 5
        # occurs 5x (dropped only by qa=6), id 6 never occurs.
        rows = [(i, [float(i + 1)] * 64, 0) for i in range(7)]
        _write_embeddings(tmp_path, rows)
        got = {
            r["k_occurrence"]: r["n_vectors"]
            for r in _run(spark, tmp_path, "embedding_hubness_lsh_bucketed")
        }
        assert got == {6: 5, 5: 1, 0: 1}

    def test_opposite_signs_never_candidates(self, spark, tmp_path):
        # all-plus and all-minus vectors land in complementary buckets:
        # k-occurrence is bounded by own-bucket size, so the 3 positive
        # vectors each occur twice and the 2 negative ones once —
        # cross-bucket pairs never form (the bucket equi-join contract)
        rows = [(i, [float(i + 1)] * 64, 0) for i in range(3)]
        rows += [(3 + j, [-float(j + 1)] * 64, 1) for j in range(2)]
        _write_embeddings(tmp_path, rows)
        got = {
            r["k_occurrence"]: r["n_vectors"]
            for r in _run(spark, tmp_path, "embedding_hubness_lsh_bucketed")
        }
        assert got == {2: 3, 1: 2}


class TestCorpusProfiling:
    def test_stopword_profile_hand_computed(self, spark, tmp_path):
        _write_documents(
            tmp_path,
            [
                (0, "the cat and the hat", "en", "s1"),
                (1, "chat noir", "fr", "s1"),
            ],
        )
        got = {r["lang"]: r
               for r in _run(spark, tmp_path, "doc_stopword_profile_by_lang")}
        assert got["en"]["n_tokens"] == 5
        assert got["en"]["n_stop"] == 3  # the, and, the
        assert got["en"]["stop_ratio"] == 0.6
        assert got["fr"]["n_stop"] == 0 and got["fr"]["stop_ratio"] == 0.0

    def test_lang_entropy_even_split(self, spark, tmp_path):
        # source with a 1/1 en/fr split: H = ln 2, via per-cell
        # micro-quantization floor(1*ln(2/1)*1e6) = 693147 each
        _write_documents(
            tmp_path,
            [
                (0, "a", "en", "s1"),
                (1, "b", "fr", "s1"),
                (2, "c", "en", "s2"),
            ],
        )
        got = {r["source"]: r
               for r in _run(spark, tmp_path, "doc_lang_entropy_by_source")}
        assert got["s1"]["n_docs"] == 2 and got["s1"]["n_langs"] == 2
        assert got["s1"]["lang_entropy_nats"] == round(
            2 * math.floor(math.log(2.0) * 1e6) / 1e6 / 2, 6
        )
        assert got["s2"]["lang_entropy_nats"] == 0.0

    def test_hill_tail_exact_log2(self, spark, tmp_path):
        # 50 docs of 200 chars above one doc of 100 chars (rank 51):
        # every q = floor(ln 2 * 1e6) -> alpha = 1/0.693147
        rows = [(i, "x" * 200, "en", "s") for i in range(50)]
        rows.append((50, "x" * 100, "en", "s"))
        rows.append((51, "x" * 10, "en", "s"))
        _write_documents(tmp_path, rows)
        r = _run(spark, tmp_path, "doc_length_hill_by_lang")[0]
        assert (r["k"], r["x_kplus1"]) == (50, 100)
        assert r["hill_mean_log"] == 0.693147
        assert r["tail_alpha"] == round(1.0 / 0.693147, 6)

    def test_trigram_coverage_tiny(self, spark, tmp_path):
        # doc "a b c d" -> trigrams "a b c", "b c d"; doc2 repeats
        # "a b c" -> totals 3, distinct 2, top100 covers all
        _write_documents(
            tmp_path,
            [(0, "a b c d", "en", "s"), (1, "a b c", "en", "s")],
        )
        r = _run(spark, tmp_path, "corpus_trigram_coverage_top100")[0]
        assert r["n_trigrams_total"] == 3
        assert r["n_distinct_trigrams"] == 2
        assert r["coverage_top100"] == 1.0

    def test_boilerplate_modal_prefix(self, spark, tmp_path):
        # 2 of 3 s1-docs share the 5-token prefix "a b c d e"
        _write_documents(
            tmp_path,
            [
                (0, "a b c d e foo", "en", "s1"),
                (1, "a b c d e bar", "en", "s1"),
                (2, "z y x w v u", "en", "s1"),
            ],
        )
        r = _run(spark, tmp_path, "doc_boilerplate_prefix_rate")[0]
        assert (r["n_docs"], r["modal_count"]) == (3, 2)
        assert r["boilerplate_rate"] == round(2 / 3, 6)


class TestQuotaAndRetention:
    def test_quota_rebalance_integer_plan(self, spark, tmp_path):
        _write_documents(
            tmp_path,
            [(0, "a", "en", "s"), (1, "b", "en", "s"), (2, "c", "en", "s"),
             (3, "d", "fr", "s")],
        )
        got = {r["lang"]: r
               for r in _run(spark, tmp_path, "corpus_lang_quota_rebalance")}
        assert got["en"]["uniform_quota"] == 2
        assert got["en"]["kept_docs"] == 2
        assert got["en"]["keep_frac"] == round(2 / 3, 6)
        assert got["fr"]["kept_docs"] == 1 and got["fr"]["keep_frac"] == 1.0

    def test_retention_half_life_exact_halving(self, spark, tmp_path):
        # users active at ages 0..3 in counts 8/4/2/1: lq differences
        # are exactly floor(ln2*1e6) = 693147 per week, so the OLS
        # slope is exactly -0.693147 and half-life rounds to 1.0 weeks
        rows, eid = [], 0
        base = "2024-01-%02d 12:00:00"
        days = [4, 11, 18, 25]
        active = {0: range(8), 1: range(4), 2: range(2), 3: range(1)}
        for a, users in active.items():
            for u in users:
                rows.append((eid, base % days[a], u, "click", None, None))
                eid += 1
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "user_retention_half_life")[0]
        assert (r["n_ages"], r["n_users_week0"]) == (4, 8)
        assert r["slope_ln_per_week"] == -0.693147
        assert r["half_life_weeks"] == 1.0

    def test_retention_growing_usage_null_half_life(self, spark, tmp_path):
        # retained counts can only shrink from age 0 by construction,
        # but a FLAT curve (everyone active every week) gives slope 0
        # -> half_life NULL instead of a divide-by-zero throw
        rows, eid = [], 0
        days = [4, 11]
        for a in range(2):
            for u in range(3):
                rows.append(
                    (eid, "2024-01-%02d 12:00:00" % days[a], u, "click",
                     None, None)
                )
                eid += 1
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "user_retention_half_life")[0]
        assert r["slope_ln_per_week"] == 0.0
        assert r["half_life_weeks"] is None


class TestRound11PlanShapesA:
    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        return (
            q.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    def test_hubness_lsh_bucket_equijoin(self, spark):
        # the whole point: candidates come from the bucket equi-join,
        # never a corpus cross product
        plan = self._plan("embedding_hubness_lsh_bucketed", spark)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan

    def test_trigram_positional_equijoin(self, spark):
        plan = self._plan("corpus_trigram_coverage_top100", spark)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan

    @pytest.mark.parametrize(
        "name",
        [
            "doc_stopword_profile_by_lang",
            "doc_lang_entropy_by_source",
            "doc_length_hill_by_lang",
            "doc_boilerplate_prefix_rate",
            "user_retention_half_life",
        ],
    )
    def test_no_cartesian(self, spark, name):
        assert "CartesianProduct" not in self._plan(name, spark)


def _two_type_hourly_events(tmp_path, counts_by_type):
    """counts_by_type: {type: [hourly counts]} on a shared hour grid."""
    import pandas as pd

    from tests.test_round8_ops import _write_events as _we

    rows, eid = [], 0
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    for et, counts in counts_by_type.items():
        for i, c in enumerate(counts):
            for j in range(c):
                rows.append(
                    (eid, str(t0 + pd.Timedelta(seconds=i * 3600 + j)),
                     1 + j, et, None, None)
                )
                eid += 1
    _we(tmp_path, rows)


class TestBatchBSeriesFeatures:
    def test_hjorth_hand_computed(self, spark, tmp_path):
        from tests.test_round9_ops import _bucket_counts_events

        # y = [1,3,2,4]: v0 = 1.25, v1(d1=[2,-1,2]) = 2, v2(d2=[-3,3]) = 9
        _bucket_counts_events(tmp_path, [1, 3, 2, 4], bucket_seconds=3600)
        r = _run(spark, tmp_path, "hjorth_parameters_hourly")[0]
        assert r["n_hours"] == 4
        assert r["activity"] == 1.25
        assert r["mobility"] == round(math.sqrt(2 / 1.25), 6)
        assert r["complexity"] == round(
            math.sqrt(9 / 2) / math.sqrt(2 / 1.25), 6
        )

    def test_hjorth_constant_series_null(self, spark, tmp_path):
        from tests.test_round9_ops import _bucket_counts_events

        _bucket_counts_events(tmp_path, [2, 2, 2], bucket_seconds=3600)
        r = _run(spark, tmp_path, "hjorth_parameters_hourly")[0]
        assert r["activity"] == 0.0
        assert r["mobility"] is None and r["complexity"] is None

    def test_cid_hand_computed(self, spark, tmp_path):
        # A = [1,3] (ce2 = 4), B = [2,4] (ce2 = 4): ed = sqrt(2),
        # cid = sqrt(2) * sqrt(4)/sqrt(4) = sqrt(2)
        _two_type_hourly_events(tmp_path, {"A": [1, 3], "B": [2, 4]})
        r = _run(spark, tmp_path, "cid_ce_pairwise_types")[0]
        assert (r["type_a"], r["type_b"]) == ("A", "B")
        assert r["euclid_dist"] == round(math.sqrt(2), 6)
        assert r["cid_dist"] == round(math.sqrt(2), 6)

    def test_cid_flat_series_null(self, spark, tmp_path):
        # B flat -> min ce2 = 0 -> cid NULL instead of an ANSI throw
        _two_type_hourly_events(tmp_path, {"A": [1, 3], "B": [2, 2]})
        r = _run(spark, tmp_path, "cid_ce_pairwise_types")[0]
        assert r["euclid_dist"] == round(math.sqrt(2), 6)
        assert r["cid_dist"] is None

    def test_sample_entropy_alternating(self, spark, tmp_path):
        from tests.test_round9_ops import _bucket_counts_events

        # [1,2,1,2,1], r = 0: B = 2 template matches (m=2), A = 1 (m=3)
        _bucket_counts_events(tmp_path, [1, 2, 1, 2, 1])
        r = _run(spark, tmp_path, "sample_entropy_6h")[0]
        assert (r["n_buckets"], r["r_tol"]) == (5, 0)
        assert (r["n_matches_m2"], r["n_matches_m3"]) == (2, 1)
        assert r["sample_entropy"] == round(math.log(2.0), 6)

    def test_theils_u2_and_mase_linear_ramp(self, spark, tmp_path):
        from tests.test_round9_ops import _bucket_counts_events

        # counts 1..26 hourly: for t in {25, 26}: |y - y_{t-24}| = 24,
        # |y - y_{t-1}| = 1 -> U2 = sqrt(2*576/2) = 24, MASE = 48/2 = 24
        _bucket_counts_events(
            tmp_path, list(range(1, 27)), bucket_seconds=3600
        )
        r = _run(spark, tmp_path, "theils_u2_seasonal_hourly")[0]
        assert r["n_used"] == 2
        assert r["sse_seasonal"] == 1152.0 and r["sse_naive"] == 2.0
        assert r["theils_u2"] == 24.0
        m = _run(spark, tmp_path, "mase_seasonal_naive_hourly")[0]
        assert m["n_used"] == 2
        assert (m["sum_abs_e_seasonal"], m["sum_abs_e_naive"]) == (48, 2)
        assert m["mase"] == 24.0

    def test_bartels_alternating(self, spark, tmp_path):
        from tests.test_round9_ops import _bucket_counts_events

        # [1,2,1,2]: doubled midranks [3,7,3,7] -> num = 48, den = 16
        _bucket_counts_events(tmp_path, [1, 2, 1, 2])
        r = _run(spark, tmp_path, "bartels_rank_vn_ratio_6h")[0]
        assert r["n_buckets"] == 4
        assert r["bartels_rvn"] == 3.0

    def test_bartels_constant_null(self, spark, tmp_path):
        from tests.test_round9_ops import _bucket_counts_events

        _bucket_counts_events(tmp_path, [2, 2, 2])
        r = _run(spark, tmp_path, "bartels_rank_vn_ratio_6h")[0]
        assert r["bartels_rvn"] is None

    def test_tracking_signal_monotone(self, spark, tmp_path):
        from tests.test_round9_ops import _bucket_counts_events

        # errors [1, 2]: TS = 2*3 / (3*2) = 1.0 (all-positive bias)
        _bucket_counts_events(tmp_path, [1, 2, 4])
        r = _run(spark, tmp_path, "tracking_signal_6h")[0]
        assert (r["n_errors"], r["sum_err"], r["sum_abs_err"]) == (2, 3, 3)
        assert r["tracking_signal"] == 1.0

    def test_lag_quadrant_phi_step(self, spark, tmp_path):
        from tests.test_round9_ops import _bucket_counts_events

        # [1,1,3,3]: doubled median 4, sides [0,0,1,1]:
        # n_ll=1, n_lh=1, n_hh=1 -> phi = 1/sqrt(4) = 0.5
        _bucket_counts_events(tmp_path, [1, 1, 3, 3], bucket_seconds=3600)
        r = _run(spark, tmp_path, "lag_quadrant_phi_hourly")[0]
        assert (r["n_ll"], r["n_lh"], r["n_hl"], r["n_hh"]) == (1, 1, 0, 1)
        assert r["lag_phi"] == 0.5


class TestRound11PlanShapesB:
    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        return (
            q.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    def test_cid_hour_equijoin(self, spark):
        # the type-pair distance joins series on the hour key — the
        # type_a < type_b predicate must not force a cartesian of rows
        plan = self._plan("cid_ce_pairwise_types", spark)
        assert "CartesianProduct" not in plan

    @pytest.mark.parametrize(
        "name",
        [
            "hjorth_parameters_hourly",
            "theils_u2_seasonal_hourly",
            "mase_seasonal_naive_hourly",
            "bartels_rank_vn_ratio_6h",
            "tracking_signal_6h",
            "lag_quadrant_phi_hourly",
        ],
    )
    def test_no_cartesian(self, spark, name):
        assert "CartesianProduct" not in self._plan(name, spark)


class TestBatchCScaleLocationTests:
    # arm0 (even users) = {1, 4} extremes; arm1 (odd) = {2, 3} center —
    # the mood fixture geometry, reused across the scale tests
    ARM_ROWS = [
        (0, "2024-01-01 00:00:00", 2, "A", 1.0, None),
        (1, "2024-01-01 00:00:01", 2, "A", 4.0, None),
        (2, "2024-01-01 00:00:02", 3, "A", 2.0, None),
        (3, "2024-01-01 00:00:03", 3, "A", 3.0, None),
    ]

    def test_conover_hand_computed(self, spark, tmp_path):
        # dm = 5000; d2: arm1 -> {1000, 1000} (r2 = 3), arm0 -> {3000,
        # 3000} (r2 = 7): t4w = 2*9 = 18, a4 = 2*9 + 2*49 = 116
        _write_events(tmp_path, self.ARM_ROWS)
        r = _run(spark, tmp_path, "conover_squared_ranks_arms")[0]
        assert (r["n0"], r["n1"]) == (2, 2)
        assert r["conover_msq_x4"] == 9.0
        assert r["dispersion_ratio"] == round(18 / 116 * 2, 6)

    def test_ansari_bradley_hand_computed(self, spark, tmp_path):
        # doubled AB scores over N=4 ranks: [2,4,4,2]; arm1 holds ranks
        # 2,3 -> ab1 = 2 + 2 = 4, mean score 2
        _write_events(tmp_path, self.ARM_ROWS)
        r = _run(spark, tmp_path, "ansari_bradley_scale_arms")[0]
        assert (r["n0"], r["n1"]) == (2, 2)
        assert r["ab_stat"] == 4.0
        assert r["ab_mean_score"] == 2.0

    def test_brown_mood_hand_computed(self, spark, tmp_path):
        # A = {1,2}, B = {3,4}: dm = 5000, above = {3,4} all in B:
        # each type's chi2 term = 2 -> 4.0 total
        rows = [
            (0, "2024-01-01 00:00:00", 1, "A", 1.0, None),
            (1, "2024-01-01 00:00:01", 1, "A", 2.0, None),
            (2, "2024-01-01 00:00:02", 1, "B", 3.0, None),
            (3, "2024-01-01 00:00:03", 1, "B", 4.0, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "brown_mood_median_ktypes")[0]
        assert (r["n_types"], r["n_values"], r["n_above"]) == (2, 4, 2)
        assert r["median_chi2"] == 4.0

    def test_kendall_w_perfect_agreement(self, spark, tmp_path):
        # two days, identical block ordering 1<2<3<4 events -> W = 1
        rows, eid = [], 0
        for day in (1, 2):
            for bkt in range(4):
                for j in range(bkt + 1):
                    rows.append(
                        (eid, "2024-01-%02d %02d:00:%02d"
                         % (day, bkt * 6, j), 1, "A", None, None)
                    )
                    eid += 1
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "kendall_w_hour_blocks")[0]
        assert (r["n_days"], r["n_blocks"]) == (2, 4)
        assert r["kendall_w"] == 1.0

    def test_dunn_no_ties_hand_computed(self, spark, tmp_path):
        # A = {1,2} (mean rank 1.5), B = {3,4} (3.5), no ties:
        # z = -2 / sqrt((4*5/12) * 1) = -1.549193
        rows = [
            (0, "2024-01-01 00:00:00", 1, "A", 1.0, None),
            (1, "2024-01-01 00:00:01", 1, "A", 2.0, None),
            (2, "2024-01-01 00:00:02", 1, "B", 3.0, None),
            (3, "2024-01-01 00:00:03", 1, "B", 4.0, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "dunn_posthoc_type_pairs")[0]
        assert (r["type_a"], r["type_b"]) == ("A", "B")
        assert r["dunn_z"] == round(-2 / math.sqrt(20 / 12), 6)

    def test_anderson_darling_two_singletons(self, spark, tmp_path):
        # arm0 = {1}, arm1 = {2}: single interior term = 1.0 micro-exact
        # -> A2 = 1.0 / nt = 0.5
        rows = [
            (0, "2024-01-01 00:00:00", 2, "A", 1.0, None),
            (1, "2024-01-01 00:00:01", 3, "A", 2.0, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "anderson_darling_value_arms")[0]
        assert (r["n0"], r["n1"]) == (1, 1)
        assert r["ad_stat"] == 0.5

    def test_anderson_darling_single_arm_null(self, spark, tmp_path):
        rows = [
            (0, "2024-01-01 00:00:00", 2, "A", 1.0, None),
            (1, "2024-01-01 00:00:01", 4, "A", 2.0, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "anderson_darling_value_arms")[0]
        assert r["n1"] == 0 and r["ad_stat"] is None


def _score_replica(eid, uid):
    """Python replica of the _SCORED_SQL deterministic score."""
    import hashlib

    y = 1 if uid % 3 == 0 else 0
    u = (int(hashlib.md5(str(eid).encode()).hexdigest()[:4], 16) % 1000) / 999.0
    return y, 0.3 * y + 0.7 * u


class TestBatchCEvalDiagnostics:
    def test_youden_matches_python_replica(self, spark, tmp_path):
        rows = [
            (eid, "2024-01-01 00:00:%02d" % (eid % 60), uid, "A", None,
             None)
            for eid, uid in enumerate(range(24))
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "eval_youden_j_threshold")[0]
        scored = [_score_replica(eid, uid) for eid, uid in
                  enumerate(range(24))]
        pos = sum(y for y, _ in scored)
        neg = len(scored) - pos
        best = None
        for thr10 in range(1, 10):
            tp = sum(1 for y, s in scored if s * 10 >= thr10 and y == 1)
            fp = sum(1 for y, s in scored if s * 10 >= thr10 and y == 0)
            crit = tp * neg - fp * pos
            if best is None or crit > best[0] or (
                crit == best[0] and thr10 < best[1]
            ):
                best = (crit, thr10, tp, fp)
        assert r["thr10"] == best[1]
        assert (r["tp"], r["fp"], r["pos"], r["neg"]) == (
            best[2], best[3], pos, neg
        )
        assert r["youden_j"] == round(
            best[2] / pos - best[3] / neg + 0.0, 6
        )

    def test_hanley_matches_python_replica(self, spark, tmp_path):
        rows = [
            (eid, "2024-01-01 00:00:%02d" % (eid % 60), uid, "A", None,
             None)
            for eid, uid in enumerate(range(24))
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "eval_auc_hanley_ci")[0]
        scored = [_score_replica(eid, uid) for eid, uid in
                  enumerate(range(24))]
        pos = [s for y, s in scored if y == 1]
        neg = [s for y, s in scored if y == 0]
        u2 = sum(
            2 * sum(1 for n_ in neg if n_ < p)
            + sum(1 for n_ in neg if n_ == p)
            for p in pos
        )
        a = u2 / (2 * len(pos) * len(neg))
        assert r["auc"] == round(a, 6)
        n1, n0 = len(pos), len(neg)
        se = math.sqrt(
            (a * (1 - a)
             + (n1 - 1) * (a / (2 - a) - a * a)
             + (n0 - 1) * (2 * a * a / (1 + a) - a * a))
            / (n1 * n0)
        )
        assert r["hanley_se"] == round(se, 6)


class TestRound11PlanShapesC:
    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        return (
            q.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    @pytest.mark.parametrize(
        "name",
        [
            "conover_squared_ranks_arms",
            "ansari_bradley_scale_arms",
            "brown_mood_median_ktypes",
            "kendall_w_hour_blocks",
            "anderson_darling_value_arms",
            "eval_auc_hanley_ci",
        ],
    )
    def test_no_cartesian(self, spark, name):
        # every scale/median test rides the value histogram with
        # broadcast scalar joins only
        assert "CartesianProduct" not in self._plan(name, spark)


class TestBatchDBusinessGraphPrivacy:
    def test_degree_gini_star(self, spark, tmp_path):
        # edges (5,10),(5,20),(5,30): degrees [1,1,1,3] ->
        # gini = (2*18 - 5*6)/(4*6) = 0.25
        rows = [
            (10, "2024-01-01 00:00:00", 5, "A", None, None),
            (20, "2024-01-01 00:00:01", 5, "A", None, None),
            (30, "2024-01-01 00:00:02", 5, "A", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "graph_degree_gini")[0]
        assert (r["n_nodes"], r["sum_degree"]) == (4, 6)
        assert r["degree_gini"] == 0.25

    def test_unicity_shared_cell(self, spark, tmp_path):
        # user 1: 8 events (band 1); users 2 and 18 share qi_arm=2,
        # hour 0, band 0 -> only user 1's cell is unique
        rows = [(i, "2024-01-01 00:00:%02d" % i, 1, "A", None, None)
                for i in range(8)]
        rows.append((8, "2024-01-01 00:30:00", 2, "A", None, None))
        rows.append((9, "2024-01-01 00:40:00", 18, "A", None, None))
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "privacy_unicity_risk")[0]
        assert (r["n_users"], r["n_cells"], r["n_unique"]) == (3, 2, 1)
        assert r["unicity_risk"] == round(1 / 3, 6)

    def test_seasonal_index_two_months(self, spark, tmp_path):
        from tests.test_round8b_ops import _write_orders

        orders = [
            (1, 1, "O", 100.0, "1995-01-15", "1-URGENT"),
            (2, 1, "O", 300.0, "1995-03-15", "1-URGENT"),
        ]
        _write_orders(tmp_path, orders)
        got = {r["month"]: r for r in
               _run(spark, tmp_path, "orders_seasonal_index_monthly")}
        assert got[1]["seasonal_index"] == 0.5
        assert got[3]["seasonal_index"] == 1.5

    def test_reorder_octiles_exact_ranks(self, spark, tmp_path):
        import pandas as pd

        from tests.test_round8b_ops import _write_orders

        # one customer, 9 orders with dyadically growing gaps:
        # sorted gaps [10,20,40,80,160,320,640,1280], octile k lands
        # on exact rank 1 + 7k div 8
        t0 = pd.Timestamp("1995-01-01")
        days = [0, 10, 30, 70, 150, 310, 630, 1270, 2550]
        orders = [
            (i + 1, 7, "O", 10.0, str(t0 + pd.Timedelta(days=d)),
             "1-URGENT")
            for i, d in enumerate(days)
        ]
        _write_orders(tmp_path, orders)
        got = {r["octile"]: r["gap_days_lo"] for r in
               _run(spark, tmp_path, "customer_reorder_gap_octiles")}
        assert got == {1: 10, 2: 20, 3: 40, 4: 80, 5: 160, 6: 320,
                       7: 640}

    def test_balanced_accuracy_and_fbeta_replica(self, spark, tmp_path):
        rows = [
            (eid, "2024-01-01 00:00:%02d" % (eid % 60), uid, "A", None,
             None)
            for eid, uid in enumerate(range(24))
        ]
        _write_events(tmp_path, rows)
        scored = [_score_replica(eid, uid) for eid, uid in
                  enumerate(range(24))]
        pos = sum(y for y, _ in scored)
        neg = len(scored) - pos
        ba = {r["thr10"]: r for r in
              _run(spark, tmp_path, "eval_balanced_accuracy_sweep")}
        fb = {r["thr10"]: r for r in
              _run(spark, tmp_path, "eval_fbeta_sweep")}
        for thr10 in (2, 5, 8):
            tp = sum(1 for y, s in scored if s * 10 >= thr10 and y == 1)
            tn = sum(1 for y, s in scored if s * 10 < thr10 and y == 0)
            fp = neg - tn
            fn = pos - tp
            assert (ba[thr10]["tp"], ba[thr10]["tn"]) == (tp, tn)
            assert ba[thr10]["balanced_accuracy"] == round(
                (tp / pos + tn / neg) / 2, 6
            )
            assert (fb[thr10]["tp"], fb[thr10]["fp"], fb[thr10]["fn"]) \
                == (tp, fp, fn)
            if 2 * tp + fp + fn:
                assert fb[thr10]["f1"] == round(
                    2 * tp / (2 * tp + fp + fn), 6
                )

    def test_priority_psi_identical_mix_zero(self, spark, tmp_path):
        from tests.test_round8b_ops import _write_orders

        # both months have the identical 1:1 priority mix -> every
        # term is floor(0 * ln 1 * 1e6) = 0 -> PSI exactly 0
        orders = [
            (1, 1, "O", 10.0, "1995-01-05", "1-URGENT"),
            (2, 1, "O", 10.0, "1995-01-06", "2-HIGH"),
            (3, 1, "O", 10.0, "1995-02-05", "1-URGENT"),
            (4, 1, "O", 10.0, "1995-02-06", "2-HIGH"),
        ]
        _write_orders(tmp_path, orders)
        got = {r["year_month"]: r for r in
               _run(spark, tmp_path, "orders_priority_mix_psi_monthly")}
        assert got[199501]["priority_psi"] == 0.0
        assert got[199502]["priority_psi"] == 0.0

    def test_discount_band_margin_hand_computed(self, spark, tmp_path):
        from tests.test_round9_ops import _write_lineitem

        rows = [
            (1, 1, 1, 1, 2.0, 100.0, 0.00, 0.0, "N", "O", "1995-01-01"),
            (1, 2, 1, 2, 1.0, 100.0, 0.10, 0.0, "N", "O", "1995-01-01"),
        ]
        _write_lineitem(tmp_path, rows)
        got = {r["discount_band"]: r for r in
               _run(spark, tmp_path, "lineitem_discount_band_margin")}
        assert got[0]["gross_cents"] == 10000
        assert got[0]["net_cents"] == 10000
        assert got[0]["discount_leakage"] == 0.0
        assert got[0]["net_per_unit"] == 50.0
        assert got[5]["net_cents"] == 9000  # 100*(1-0.1)
        assert got[5]["discount_leakage"] == 0.1


class TestRound11PlanShapesD:
    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        return (
            q.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    @pytest.mark.parametrize(
        "name",
        [
            "graph_degree_gini",
            "privacy_unicity_risk",
            "orders_seasonal_index_monthly",
            "customer_reorder_gap_octiles",
            "eval_balanced_accuracy_sweep",
            "eval_fbeta_sweep",
            "orders_priority_mix_psi_monthly",
            "lineitem_discount_band_margin",
        ],
    )
    def test_no_cartesian(self, spark, name):
        assert "CartesianProduct" not in self._plan(name, spark)


# ---------------------------------------------------------------------------
# Batch E: two-sample location-scale tests + robust estimators
# ---------------------------------------------------------------------------


def _arm_events(tmp_path, arm0, arm1):
    """Events whose user parity splits values into arm0/arm1 lists."""
    rows = []
    eid = 0
    for v in arm0:
        rows.append((eid, "2024-01-01 00:00:00", 2, "click", float(v), "{}"))
        eid += 1
    for v in arm1:
        rows.append((eid, "2024-01-01 00:00:00", 3, "click", float(v), "{}"))
        eid += 1
    _write_events(tmp_path, rows)


class TestCucconi:
    def test_hand_computed_no_ties(self, spark, tmp_path):
        # arm0 = {1,2,3}, arm1 = {4,5}: arm-1 ranks 4,5
        _arm_events(tmp_path, [1, 2, 3], [4, 5])
        r = _run(spark, tmp_path, "cucconi_test_arms")[0]
        n0, n1, nn = 3, 2, 5
        den = math.sqrt(n1 * n0 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5.0)
        u = (6 * (16 + 25) - n1 * (nn + 1) * (2 * nn + 1)) / den
        v = (6 * (4 + 1) - n1 * (nn + 1) * (2 * nn + 1)) / den
        rho = 2.0 * (nn * nn - 4) / ((2 * nn + 1) * (8 * nn + 11)) - 1.0
        c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
        assert (r["n0"], r["n1"]) == (3, 2)
        assert r["cucconi_u"] == pytest.approx(u, abs=2e-6)
        assert r["cucconi_v"] == pytest.approx(v, abs=2e-6)
        assert r["cucconi_c"] == pytest.approx(c, abs=2e-6)

    def test_n2_rho_minus_one_nulls_c(self, spark, tmp_path):
        # N = 2 -> rho = -1 exactly -> combined statistic NULL via nullif
        _arm_events(tmp_path, [1], [2])
        r = _run(spark, tmp_path, "cucconi_test_arms")[0]
        assert r["cucconi_c"] is None
        assert r["cucconi_u"] is not None

    def test_empty_arm_nulls(self, spark, tmp_path):
        _arm_events(tmp_path, [1, 2, 3], [])
        r = _run(spark, tmp_path, "cucconi_test_arms")[0]
        assert r["n1"] == 0
        assert r["cucconi_u"] is None and r["cucconi_c"] is None


class TestLepage:
    def test_hand_computed_no_ties(self, spark, tmp_path):
        # arm0 = {1,2,3}, arm1 = {4,5}: W = 9, AB scores (1,2,3,2,1)
        _arm_events(tmp_path, [1, 2, 3], [4, 5])
        r = _run(spark, tmp_path, "lepage_test_arms")[0]
        z_w = (2 * 9 - 2 * 6) / (2 * math.sqrt(3 * 2 / 12.0 * (6 - 0 / 20.0)))
        abar = 9 / 5.0
        var_a = 3 * 2 / 20.0 * (19 - 5 * abar * abar)
        z_a = (3 - 2 * abar) / math.sqrt(var_a)
        assert r["z_wilcoxon"] == pytest.approx(z_w, abs=2e-6)
        assert r["z_ansari"] == pytest.approx(z_a, abs=2e-6)
        assert r["lepage_d"] == pytest.approx(z_w**2 + z_a**2, abs=4e-6)

    def test_all_tied_null(self, spark, tmp_path):
        # every value identical: both variances are exactly zero -> NULL
        _arm_events(tmp_path, [5, 5, 5], [5, 5])
        r = _run(spark, tmp_path, "lepage_test_arms")[0]
        assert r["z_wilcoxon"] is None
        assert r["z_ansari"] is None
        assert r["lepage_d"] is None


class TestFlignerPolicello:
    def test_symmetric_interleave_zero(self, spark, tmp_path):
        # arm0 = {1,3,5}, arm1 = {2,4}: sum P = sum Q = 3 -> U-hat = 0
        _arm_events(tmp_path, [1, 3, 5], [2, 4])
        r = _run(spark, tmp_path, "fligner_policello_arms")[0]
        assert r["mean_placement_1"] == 1.5
        assert r["mean_placement_0"] == 1.0
        assert r["fp_u_hat"] == 0.0

    def test_single_tied_pair(self, spark, tmp_path):
        # one tied value per arm: P = Q = 0.5, V1 = V2 = 0,
        # denominator survives on Pbar*Qbar = 0.25 -> U-hat = 0
        _arm_events(tmp_path, [2], [2])
        r = _run(spark, tmp_path, "fligner_policello_arms")[0]
        assert r["mean_placement_1"] == 0.5
        assert r["fp_u_hat"] == 0.0

    def test_hand_computed_shifted(self, spark, tmp_path):
        # arm0 = {1,2}, arm1 = {3,4}: P = (2,2), Q = (0,0)
        # V1 = V2 = 0, Pbar*Qbar = 0 -> denominator 0 -> NULL
        _arm_events(tmp_path, [1, 2], [3, 4])
        r = _run(spark, tmp_path, "fligner_policello_arms")[0]
        assert r["mean_placement_1"] == 2.0
        assert r["mean_placement_0"] == 0.0
        assert r["fp_u_hat"] is None

    def test_hand_computed_overlap(self, spark, tmp_path):
        # arm0 = {1,4}, arm1 = {2,3,5}: P = (1,1,2), Q = (0,2)
        _arm_events(tmp_path, [1, 4], [2, 3, 5])
        r = _run(spark, tmp_path, "fligner_policello_arms")[0]
        v1 = (1 - 4 / 3) ** 2 * 2 + (2 - 4 / 3) ** 2
        v2 = (0 - 1) ** 2 + (2 - 1) ** 2
        u = (4 - 2) / (2 * math.sqrt(v1 + v2 + (4 / 3) * 1.0))
        assert r["fp_u_hat"] == pytest.approx(u, abs=2e-6)


class TestEnergyDistance:
    def test_hand_computed(self, spark, tmp_path):
        # arm0 = {0,2}, arm1 = {1,3}: E|XY| = 1.5, E|XX| = E|YY| = 1.0
        _arm_events(tmp_path, [0, 2], [1, 3])
        r = _run(spark, tmp_path, "energy_distance_arms")[0]
        assert r["mean_abs_xy"] == 1.5
        assert r["mean_abs_xx"] == 1.0
        assert r["mean_abs_yy"] == 1.0
        assert r["energy_distance"] == 1.0

    def test_identical_distributions_zero(self, spark, tmp_path):
        _arm_events(tmp_path, [1, 2], [1, 2])
        r = _run(spark, tmp_path, "energy_distance_arms")[0]
        assert r["energy_distance"] == 0.0

    def test_empty_arm_nulls(self, spark, tmp_path):
        _arm_events(tmp_path, [], [1, 2])
        r = _run(spark, tmp_path, "energy_distance_arms")[0]
        assert r["mean_abs_xy"] is None
        assert r["energy_distance"] is None


class TestGastwirth:
    def test_odd_n_runs_1_to_7(self, spark, tmp_path):
        # n = 7: k_lo = 3, median = 4, k_hi = 5
        rows = [(i, "2024-01-01 00:00:00", 1, "a", float(i + 1), "{}")
                for i in range(7)]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "gastwirth_location_by_type")[0]
        assert r["n_values"] == 7
        assert r["median_value"] == 4.0
        assert r["gastwirth_location"] == (3 * 3 + 2 * 8 + 3 * 5) / 10.0

    def test_n2_midpoint(self, spark, tmp_path):
        rows = [(0, "2024-01-01 00:00:00", 1, "a", 10.0, "{}"),
                (1, "2024-01-01 00:00:00", 1, "a", 20.0, "{}")]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "gastwirth_location_by_type")[0]
        assert r["median_value"] == 15.0
        assert r["gastwirth_location"] == 15.0

    def test_n1_identity(self, spark, tmp_path):
        rows = [(0, "2024-01-01 00:00:00", 1, "a", 42.5, "{}")]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "gastwirth_location_by_type")[0]
        assert r["gastwirth_location"] == 42.5


class TestGiniMeanDifference:
    def test_hand_computed(self, spark, tmp_path):
        # {1,2,3}: pair sum 4, GMD = 8/6, ratio = 4/(2*6)
        rows = [(i, "2024-01-01 00:00:00", 1, "a", float(i + 1), "{}")
                for i in range(3)]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "gini_mean_difference_by_type")[0]
        assert r["mean_value"] == 2.0
        assert r["gini_mean_diff"] == round(8 / 6.0, 6)
        assert r["gini_ratio"] == round(4 / 12.0, 6)

    def test_ties(self, spark, tmp_path):
        # {1,1,3}: pair sum 4 (0 + 2 + 2)
        rows = [(i, "2024-01-01 00:00:00", 1, "a", v, "{}")
                for i, v in enumerate([1.0, 1.0, 3.0])]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "gini_mean_difference_by_type")[0]
        assert r["gini_mean_diff"] == round(8 / 6.0, 6)

    def test_n1_null(self, spark, tmp_path):
        rows = [(0, "2024-01-01 00:00:00", 1, "a", 5.0, "{}")]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "gini_mean_difference_by_type")[0]
        assert r["gini_mean_diff"] is None and r["gini_ratio"] is None

    def test_zero_mean_ratio_null(self, spark, tmp_path):
        rows = [(i, "2024-01-01 00:00:00", 1, "a", v, "{}")
                for i, v in enumerate([-1.0, 1.0])]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "gini_mean_difference_by_type")[0]
        assert r["gini_ratio"] is None
        assert r["gini_mean_diff"] == 2.0


class TestRound11PlanShapesE:
    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        return (
            q.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    @pytest.mark.parametrize(
        "name",
        [
            "cucconi_test_arms",
            "lepage_test_arms",
            "fligner_policello_arms",
            "energy_distance_arms",
            "gastwirth_location_by_type",
            "gini_mean_difference_by_type",
        ],
    )
    def test_no_cartesian_no_python_udf(self, spark, name):
        plan = self._plan(name, spark)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert "NestedLoop" not in plan

    def test_arm_tests_single_histogram_shuffle(self, spark):
        # the raw-events scan feeds exactly one groupBy exchange before
        # the bounded-histogram window stage
        plan = self._plan("cucconi_test_arms", spark)
        assert plan.count("Exchange") <= 4


# ---------------------------------------------------------------------------
# Batch F: forecast selection, SPC, runs, ordinal association,
# reliability, embedding compression audit
# ---------------------------------------------------------------------------


def _bucket_events(tmp_path, counts, etype="click"):
    """counts[i] events in consecutive 6h buckets starting 2024-01-01."""
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        hh = (i * 6) % 24
        dd = 1 + (i * 6) // 24
        ts = f"2024-01-{dd:02d} {hh:02d}:00:00"
        for _ in range(c):
            rows.append((eid, ts, eid % 7, etype, 1.0, "{}"))
            eid += 1
    _write_events(tmp_path, rows)


def _ses_expected(series, alphas):
    out = {}
    for a in alphas:
        s, sse = float(series[0]), 0.0
        for y in series[1:]:
            sse += (y - s) * (y - s)
            s = a * y + (1.0 - a) * s
        out[a] = (s, sse)
    return out


class TestSesAlphaGrid:
    ALPHAS = [k / 8.0 for k in range(1, 8)]

    def test_two_points_all_alphas_tie(self, spark, tmp_path):
        _bucket_events(tmp_path, [4, 8])
        got = {r["alpha"]: r for r in _run(spark, tmp_path, "ses_alpha_grid_6h")}
        assert set(got) == set(self.ALPHAS)
        exp = _ses_expected([4, 8], self.ALPHAS)
        for a in self.ALPHAS:
            assert got[a]["n_points"] == 2
            assert got[a]["mse_one_step"] == 16.0
            assert got[a]["final_level"] == round(exp[a][0], 6)
        # tied SSE: the lowest alpha index wins the tiebreak
        assert [a for a in self.ALPHAS if got[a]["is_best"] == 1] == [0.125]

    def test_three_points_best_alpha(self, spark, tmp_path):
        _bucket_events(tmp_path, [2, 4, 2])
        got = {r["alpha"]: r for r in _run(spark, tmp_path, "ses_alpha_grid_6h")}
        exp = _ses_expected([2, 4, 2], self.ALPHAS)
        for a in self.ALPHAS:
            assert got[a]["mse_one_step"] == round(exp[a][1] / 2, 6)
            assert got[a]["final_level"] == round(exp[a][0], 6)
        best = min(self.ALPHAS, key=lambda a: (round(exp[a][1], 9), a))
        assert [a for a in self.ALPHAS if got[a]["is_best"] == 1] == [best]


class TestSpcCChart:
    def test_inside_limits(self, spark, tmp_path):
        _bucket_events(tmp_path, [1, 9, 2])
        r = _run(spark, tmp_path, "spc_c_chart_6h")[0]
        assert r["n_buckets"] == 3
        assert r["c_bar"] == 4.0
        assert r["ucl"] == 10.0
        assert r["lcl"] == 0.0
        assert r["n_above_ucl"] == 0 and r["n_below_lcl"] == 0

    def test_violations_both_sides(self, spark, tmp_path):
        # cbar = 50: UCL ~ 71.2 (100 above), LCL ~ 28.8 (25, 25 below)
        _bucket_events(tmp_path, [25, 25, 100])
        r = _run(spark, tmp_path, "spc_c_chart_6h")[0]
        assert r["c_bar"] == 50.0
        assert r["n_above_ucl"] == 1
        assert r["n_below_lcl"] == 2
        assert r["lcl"] == round(50 - 3 * math.sqrt(50.0), 6)


class TestRunLengthHistogram:
    def test_hand_computed(self, spark, tmp_path):
        rows = [
            (0, "2024-01-01 00:00:00", 1, "a", 1.0, "{}"),
            (1, "2024-01-01 00:01:00", 1, "a", 1.0, "{}"),
            (2, "2024-01-01 00:02:00", 1, "b", 1.0, "{}"),
            (3, "2024-01-01 00:03:00", 1, "a", 1.0, "{}"),
            (4, "2024-01-01 00:00:00", 2, "b", 1.0, "{}"),
            (5, "2024-01-01 00:01:00", 2, "b", 1.0, "{}"),
            (6, "2024-01-01 00:02:00", 2, "b", 1.0, "{}"),
        ]
        _write_events(tmp_path, rows)
        got = {
            (r["event_type"], r["run_len"]): r["n_runs"]
            for r in _run(spark, tmp_path, "event_run_length_histogram")
        }
        assert got == {("a", 2): 1, ("a", 1): 1, ("b", 1): 1, ("b", 3): 1}

    def test_tie_order_pinned_by_event_id(self, spark, tmp_path):
        # same ts: event_id breaks the tie -> a,b,a = three runs of 1
        rows = [
            (0, "2024-01-01 00:00:00", 1, "a", 1.0, "{}"),
            (1, "2024-01-01 00:00:00", 1, "b", 1.0, "{}"),
            (2, "2024-01-01 00:00:00", 1, "a", 1.0, "{}"),
        ]
        _write_events(tmp_path, rows)
        got = {
            (r["event_type"], r["run_len"]): r["n_runs"]
            for r in _run(spark, tmp_path, "event_run_length_histogram")
        }
        assert got == {("a", 1): 2, ("b", 1): 1}


class TestSomersD:
    def test_matches_2auc_minus_1(self, spark, tmp_path):
        rows = [
            (i, "2024-01-01 00:00:00", i % 6, "a", 1.0, "{}")
            for i in range(24)
        ] + [
            (100 + i, "2024-01-01 00:00:00", i % 5, "b", 1.0, "{}")
            for i in range(15)
        ]
        _write_events(tmp_path, rows)
        d = {r["event_type"]: r for r in _run(spark, tmp_path, "eval_somers_d_by_type")}
        auc = {
            r["event_type"]: r["auc"]
            for r in q.queries()["eval_auc_by_type"](spark, str(tmp_path)).collect()
        }
        for t in d:
            if auc[t] is not None and d[t]["somers_d"] is not None:
                assert d[t]["somers_d"] == pytest.approx(
                    2 * auc[t] - 1, abs=3e-6
                )

    def test_perfect_separation(self, spark, tmp_path):
        # users 0,3 -> label 1 (user_id % 3 == 0); the md5 score noise
        # is bounded by 0.7 so label-1 scores (>= 0.3... wait 0.3*1 +
        # 0.7*u) always exceed... not guaranteed; instead assert the
        # tied-pair accounting: n_pos*n_neg = conc+disc+tied pairs
        rows = [
            (i, "2024-01-01 00:00:00", i, "a", 1.0, "{}")
            for i in range(12)
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "eval_somers_d_by_type")[0]
        assert r["n_pos"] == 4 and r["n_neg"] == 8
        # gamma and D share the sign and |gamma| >= |D|
        if r["somers_d"] is not None and r["gk_gamma"] is not None:
            assert abs(r["gk_gamma"]) >= abs(r["somers_d"]) - 1e-9


class TestCronbachAlpha:
    def test_hand_computed(self, spark, tmp_path):
        # matrix: type a -> [1, 3], type b -> [2, 6]
        # item var nums: 4 + 16 = 20; total [3, 9] -> 36
        # alpha = 2 * (1 - 20/36) = 8/9
        counts = {("a", 0): 1, ("a", 1): 3, ("b", 0): 2, ("b", 1): 6}
        rows = []
        eid = 0
        for (t, b), c in counts.items():
            ts = f"2024-01-01 {b * 6:02d}:00:00"
            for _ in range(c):
                rows.append((eid, ts, eid % 3, t, 1.0, "{}"))
                eid += 1
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "cronbach_alpha_hour_types")[0]
        assert (r["n_items"], r["n_blocks"]) == (2, 2)
        assert r["cronbach_alpha"] == round(2 * (1 - 20 / 36), 6)

    def test_single_item_null(self, spark, tmp_path):
        _bucket_events(tmp_path, [1, 2])
        r = _run(spark, tmp_path, "cronbach_alpha_hour_types")[0]
        assert r["n_items"] == 1 and r["cronbach_alpha"] is None

    def test_constant_total_null(self, spark, tmp_path):
        # a -> [1, 2], b -> [2, 1]: totals constant -> tvar = 0 -> NULL
        counts = {("a", 0): 1, ("a", 1): 2, ("b", 0): 2, ("b", 1): 1}
        rows = []
        eid = 0
        for (t, b), c in counts.items():
            ts = f"2024-01-01 {b * 6:02d}:00:00"
            for _ in range(c):
                rows.append((eid, ts, eid % 3, t, 1.0, "{}"))
                eid += 1
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "cronbach_alpha_hour_types")[0]
        assert r["cronbach_alpha"] is None


class TestSq8Distortion:
    def test_exact_code_zero_distortion(self, spark, tmp_path):
        # all entries are exact multiples of scale = 127/127 = 1
        vec = [127.0] + [float(i % 5) for i in range(63)]
        _write_embeddings(tmp_path, [(0, vec, 0)])
        r = _run(spark, tmp_path, "embedding_sq8_distortion")[0]
        assert r["dim"] == 64
        assert r["sse_pico"] == 0 and r["max_abs_err_nano"] == 0

    def test_hand_computed_error(self, spark, tmp_path):
        vec = [1.0, 0.25] + [0.0] * 62
        _write_embeddings(tmp_path, [(0, vec, 0), (1, [0.0] * 64, 0)])
        rows = _run(spark, tmp_path, "embedding_sq8_distortion")
        assert len(rows) == 1  # the all-zero vector is excluded
        r = rows[0]
        scale = 1.0 / 127.0
        d = 0.25 - round(0.25 / scale) * scale
        assert r["sse_pico"] == math.floor(d * d * 1e12)
        assert r["max_abs_err_nano"] == math.floor(abs(d) * 1e9)


class TestRound11PlanShapesF:
    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        return (
            q.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    @pytest.mark.parametrize(
        "name",
        [
            "ses_alpha_grid_6h",
            "spc_c_chart_6h",
            "event_run_length_histogram",
            "eval_somers_d_by_type",
            "cronbach_alpha_hour_types",
            "embedding_sq8_distortion",
        ],
    )
    def test_no_cartesian_no_python_udf(self, spark, name):
        plan = self._plan(name, spark)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan

    def test_run_length_single_keyed_shuffle_window(self, spark):
        # both windows share the (user_id, ts, event_id) sort: exactly
        # one user-keyed exchange feeds the window stage
        plan = self._plan("event_run_length_histogram", spark)
        assert plan.count("Window") <= 2


# ---------------------------------------------------------------------------
# Batch G: supply-chain SLA, demand classification, workload skew,
# lexical richness, transition reciprocity, multimodal dHash
# ---------------------------------------------------------------------------

from tests.test_round8b_ops import _write_orders
from tests.test_round9_ops import _write_lineitem


def _write_part(tmp_path, rows):
    """rows: (p_partkey, p_brand)"""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_name": pa.array([f"part{r[0]}" for r in rows], pa.string()),
            "p_brand": pa.array([r[1] for r in rows], pa.string()),
            "p_type": pa.array(["t" for _ in rows], pa.string()),
            "p_size": pa.array([1 for _ in rows], pa.int32()),
            "p_retailprice": pa.array([1.0 for _ in rows], pa.float64()),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "part.parquet"))


def _li_row(ok, pk, sk, ln, qty, ship):
    return (ok, pk, sk, ln, qty, 100.0, 0.0, 0.0, "N", "O", ship)


class TestSlaAttainment:
    def test_hand_computed(self, spark, tmp_path):
        _write_orders(
            tmp_path,
            [(1, 1, "O", 10.0, "1994-01-01", "1-URGENT"),
             (2, 1, "O", 10.0, "1994-01-10", "1-URGENT")],
        )
        # order 1: ship +10d (on time) and +61d (late by 1);
        # order 2: ship +60d exactly (on time, boundary)
        _write_lineitem(
            tmp_path,
            [_li_row(1, 1, 1, 1, 5.0, "1994-01-11"),
             _li_row(1, 1, 1, 2, 5.0, "1994-03-03"),
             _li_row(2, 1, 1, 1, 5.0, "1994-03-11")],
        )
        got = {(r["yr"], r["mo"]): r
               for r in _run(spark, tmp_path, "lineitem_sla_attainment_monthly")}
        jan = got[(1994, 1)]
        assert (jan["n_lines"], jan["n_on_time"], jan["n_late"]) == (1, 1, 0)
        assert jan["avg_delay_days"] == 10.0
        mar = got[(1994, 3)]
        assert (mar["n_lines"], mar["n_on_time"], mar["n_late"]) == (2, 1, 1)
        assert mar["max_delay_days"] == 61
        assert mar["sla_rate"] == 0.5


class TestDemandAdiCv2:
    def test_quadrants_hand_computed(self, spark, tmp_path):
        _write_part(tmp_path, [(1, "B1"), (2, "B1")])
        # part 1: demand in weeks 0,1,2 with equal q -> ADI = 1 (smooth
        # axis), CV2 = 0 -> smooth
        # part 2: demand in weeks 0 and 4 only -> span 5, w 2,
        # ADI = 2.5 >= 1.32; q = 10 vs 40 -> CV2 = (2*1700-2500)/2500
        # = 0.36 < 0.49 -> intermittent
        rows = [
            _li_row(1, 1, 1, 1, 7.0, "1994-01-03"),
            _li_row(2, 1, 1, 1, 7.0, "1994-01-10"),
            _li_row(3, 1, 1, 1, 7.0, "1994-01-17"),
            _li_row(4, 2, 1, 1, 10.0, "1994-01-03"),
            _li_row(5, 2, 1, 1, 40.0, "1994-01-31"),
        ]
        _write_lineitem(tmp_path, rows)
        r = _run(spark, tmp_path, "demand_adi_cv2_brand")[0]
        assert r["p_brand"] == "B1" and r["n_parts"] == 2
        assert r["n_smooth"] == 1 and r["n_intermittent"] == 1
        assert r["n_erratic"] == 0 and r["n_lumpy"] == 0
        assert r["avg_adi"] == round((1.0 + 2.5) / 2, 6)
        assert r["avg_cv2"] == round((0.0 + 0.36) / 2, 6)

    def test_lumpy_boundary_is_inclusive(self, spark, tmp_path):
        _write_part(tmp_path, [(1, "B9")])
        # weeks 0 and 3: w=2, span=4 -> ADI=2 >= 1.32; q 10 vs 30:
        # CV2 = (2*1000 - 1600)/1600 = 0.25 -> intermittent; then make
        # it lumpy via q 10 vs 100: CV2 = (2*10100-12100)/12100 = 0.669
        rows = [
            _li_row(1, 1, 1, 1, 10.0, "1994-01-03"),
            _li_row(2, 1, 1, 1, 100.0, "1994-01-24"),
        ]
        _write_lineitem(tmp_path, rows)
        r = _run(spark, tmp_path, "demand_adi_cv2_brand")[0]
        assert r["n_lumpy"] == 1


class TestSupplierWorkload:
    def test_hand_computed(self, spark, tmp_path):
        # suppliers with line counts 5, 3, 1, 1: n=4, top decile k=1
        # -> share 5/10; doubled median = 1+3 -> median 2.0
        rows = []
        eid = 1
        for sk, c in [(1, 5), (2, 3), (3, 1), (4, 1)]:
            for _ in range(c):
                rows.append(_li_row(eid, 1, sk, 1, 1.0, "1994-01-01"))
                eid += 1
        _write_lineitem(tmp_path, rows)
        r = _run(spark, tmp_path, "supplier_workload_concentration")[0]
        assert (r["n_suppliers"], r["total_lines"], r["max_lines"]) == (4, 10, 5)
        assert r["median_orders"] == 2.0
        assert r["top_decile_share"] == 0.5
        assert r["max_over_median"] == 2.5


class TestSichelS:
    def test_hand_computed(self, spark, tmp_path):
        # en: tokens a a b b c -> V=3, V1=1 (c), V2=2 (a, b)
        _write_documents(tmp_path, [(0, "a a b b c", "en", "s")])
        r = _run(spark, tmp_path, "doc_sichel_s_by_lang")[0]
        assert (r["n_tokens"], r["n_types"], r["n_hapax"], r["n_dis"]) == (
            5, 3, 1, 2)
        assert r["sichel_s"] == round(2 / 3, 6)
        assert r["hapax_over_dis"] == 0.5

    def test_no_dislegomena_null(self, spark, tmp_path):
        _write_documents(tmp_path, [(0, "x y z", "en", "s")])
        r = _run(spark, tmp_path, "doc_sichel_s_by_lang")[0]
        assert r["sichel_s"] == 0.0
        assert r["hapax_over_dis"] is None


class TestReciprocity:
    def test_hand_computed(self, spark, tmp_path):
        # user 1: a->b, b->a, a->c  (edges ab:1, ba:1, ac:1)
        rows = [
            (0, "2024-01-01 00:00:00", 1, "a", 1.0, "{}"),
            (1, "2024-01-01 00:01:00", 1, "b", 1.0, "{}"),
            (2, "2024-01-01 00:02:00", 1, "a", 1.0, "{}"),
            (3, "2024-01-01 00:03:00", 1, "c", 1.0, "{}"),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "graph_reciprocity_transitions")[0]
        assert (r["n_edges"], r["n_reciprocated"]) == (3, 2)
        assert r["edge_reciprocity"] == round(2 / 3, 6)
        assert (r["total_weight"], r["reciprocated_weight"]) == (3, 2)
        assert r["weight_reciprocity"] == round(2 / 3, 6)

    def test_self_loops_excluded(self, spark, tmp_path):
        rows = [
            (0, "2024-01-01 00:00:00", 1, "a", 1.0, "{}"),
            (1, "2024-01-01 00:01:00", 1, "a", 1.0, "{}"),
            (2, "2024-01-01 00:02:00", 1, "b", 1.0, "{}"),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "graph_reciprocity_transitions")[0]
        assert r["n_edges"] == 1  # only a->b; a->a dropped
        assert r["n_reciprocated"] == 0
        assert r["weight_reciprocity"] == 0.0


class TestImageDhash:
    def test_constant_payload_zero_gradient(self, spark, tmp_path):
        _write_documents(tmp_path, [(0, "aaaa", "en", "s")])
        r = _run(spark, tmp_path, "image_dhash_gradient")[0]
        assert (r["dhash_lo"], r["dhash_hi"], r["n_set"]) == (0, 0, 0)

    def test_hand_computed_bits(self, spark, tmp_path):
        # payload "ba": grid alternates 98,97,98,97,... (72 cells).
        # bit r,c set iff grid[r*9+c] > grid[r*9+c+1]: in row r the
        # parity of r*9+c decides; expected replayed in python
        _write_documents(tmp_path, [(0, "ba", "en", "s")])
        raw = b"ba"
        grid = [raw[i % 2] for i in range(72)]
        bits = [
            1 if grid[r * 9 + c] > grid[r * 9 + c + 1] else 0
            for r in range(8)
            for c in range(8)
        ]
        lo = sum(b << i for i, b in enumerate(bits[:32]))
        hi = sum(b << i for i, b in enumerate(bits[32:]))
        r = _run(spark, tmp_path, "image_dhash_gradient")[0]
        assert (r["dhash_lo"], r["dhash_hi"], r["n_set"]) == (
            lo, hi, sum(bits))


class TestRound11PlanShapesG:
    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        return (
            q.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    @pytest.mark.parametrize(
        "name",
        [
            "lineitem_sla_attainment_monthly",
            "demand_adi_cv2_brand",
            "supplier_workload_concentration",
            "doc_sichel_s_by_lang",
            "graph_reciprocity_transitions",
        ],
    )
    def test_no_cartesian_no_python_udf(self, spark, name):
        plan = self._plan(name, spark)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan

    def test_adi_part_join_is_broadcast(self, spark):
        plan = self._plan("demand_adi_cv2_brand", spark)
        assert "BroadcastHashJoin" in plan

    def test_dhash_is_arrow_map_in_pandas(self, spark):
        plan = self._plan("image_dhash_gradient", spark)
        assert "MapInPandas" in plan
