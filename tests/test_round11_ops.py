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
