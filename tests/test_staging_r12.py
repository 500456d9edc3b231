"""Round-12 staged operator tests (eventstreamml_spark/staging_r12.py).

The staged dict is NOT registered — these tests drive it directly,
replaying each DuckDB oracle via ``compare`` so every fixture doubles
as an engine-parity check on hand-computable inputs, exactly like the
registered rounds' test files. When round 12 wires ``STAGED`` into the
registry these tests keep guarding the same semantics.
"""

from __future__ import annotations

import pytest

from eventstreamml_spark.staging_r12 import STAGED
from tests.oracle import compare
from tests.test_round8_ops import _write_events

# staged-operator fixture matrix: ~150 Spark-vs-DuckDB comparisons for
# UNREGISTERED code — slow-gated so the default suite fits the driver
# budget (scripts/staged_parity.py re-proves the set before wiring).
pytestmark = pytest.mark.slow


def _run(spark, tmp_path, name):
    fn, sql = STAGED[name]
    compare(spark, str(tmp_path), fn, sql)
    return fn(spark, str(tmp_path)).collect()


def _ev(rows):
    """(event_id, user_id parity -> arm, value) triplets to event rows
    at distinct timestamps."""
    return [
        (i, f"2024-01-01 00:{i:02d}:00", uid, "click", val, "{}")
        for i, (uid, val) in enumerate(rows)
    ]


class TestWaldWolfowitzRuns:
    def test_two_clean_runs(self, spark, tmp_path):
        # arm0 = {1, 2}, arm1 = {3, 4} -> pooled pattern 0011 = 2 runs;
        # z = (2 - 3) / sqrt(2/3) = -1.224745
        _write_events(
            tmp_path, _ev([(2, 1.0), (2, 2.0), (1, 3.0), (1, 4.0)])
        )
        row = _run(spark, tmp_path, "wald_wolfowitz_runs_two_sample")[0]
        assert row["n_runs"] == 2
        assert row["ww_z"] == pytest.approx(-1.224745, abs=1e-6)

    def test_tie_convention_merges(self, spark, tmp_path):
        # arm0 = {1}, arm1 = {1, 2}: the tied value expands to (0 then
        # 1) by the pinned convention, then 1 -> pattern 011 = 2 runs
        _write_events(tmp_path, _ev([(2, 1.0), (1, 1.0), (1, 2.0)]))
        row = _run(spark, tmp_path, "wald_wolfowitz_runs_two_sample")[0]
        assert row["n_runs"] == 2
        assert row["n0"] == 1 and row["n1"] == 2

    def test_alternating_max_runs(self, spark, tmp_path):
        # strictly interleaved values -> every observation is its own
        # run: r = 4 with n0 = n1 = 2
        _write_events(
            tmp_path, _ev([(2, 1.0), (1, 2.0), (2, 3.0), (1, 4.0)])
        )
        row = _run(spark, tmp_path, "wald_wolfowitz_runs_two_sample")[0]
        assert row["n_runs"] == 4

    def test_single_arm_null(self, spark, tmp_path):
        _write_events(tmp_path, _ev([(1, 1.0), (1, 2.0)]))
        row = _run(spark, tmp_path, "wald_wolfowitz_runs_two_sample")[0]
        assert row["ww_z"] is None


class TestBuishandRange:
    def test_two_hour_hand_computed(self, spark, tmp_path):
        # hourly counts [2, 4]: S_1 = -1, S_2 = 0, R = 1, pop std = 1
        # -> R/(s*sqrt(2)) = 0.707107
        rows = []
        eid = 0
        for h, c in [(0, 2), (1, 4)]:
            for _ in range(c):
                rows.append(
                    (eid, f"2024-01-01 {h:02d}:0{eid % 6}:00", 1, "c",
                     1.0, "{}")
                )
                eid += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "buishand_range_hourly")[0]
        assert row["n_hours"] == 2
        assert row["buishand_r_rescaled"] == pytest.approx(
            0.707107, abs=1e-6
        )

    def test_constant_series_null(self, spark, tmp_path):
        rows = []
        eid = 0
        for h in range(3):
            for _ in range(2):
                rows.append(
                    (eid, f"2024-01-01 {h:02d}:0{eid % 6}:00", 1, "c",
                     1.0, "{}")
                )
                eid += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "buishand_range_hourly")[0]
        assert row["buishand_r_rescaled"] is None


class TestTukeyFences:
    def test_no_outliers_n8(self, spark, tmp_path):
        # values 1..8: Tukey hinges q1 = 2.5, q3 = 6.5, fences
        # [-3.5, 12.5] -> zero outliers
        _write_events(
            tmp_path, _ev([(1, float(v)) for v in range(1, 9)])
        )
        row = _run(spark, tmp_path, "tukey_fences_outlier_rate_by_type")[0]
        assert row["q1"] == 2.5 and row["q3"] == 6.5
        assert row["n_outliers"] == 0 and row["outlier_rate"] == 0.0

    def test_one_outlier_n9_odd_hinges(self, spark, tmp_path):
        # values 1..8 plus 100: n = 9 -> both doubled-hinge ranks hit
        # the SAME row (q1 = 3, q3 = 7) — the added-CASE rule; fence
        # high = 7 + 1.5*4 = 13 < 100 -> exactly one outlier
        _write_events(
            tmp_path,
            _ev([(1, float(v)) for v in range(1, 9)] + [(1, 100.0)]),
        )
        row = _run(spark, tmp_path, "tukey_fences_outlier_rate_by_type")[0]
        assert row["q1"] == 3.0 and row["q3"] == 7.0
        assert row["n_outliers"] == 1
        assert row["outlier_rate"] == pytest.approx(0.111111, abs=1e-6)


class TestStuartMaxwell:
    def test_uniform_shift_hand_computed(self, spark, tmp_path):
        # 6 users, each first value in {1..6}, last value = first + 3
        # (shift-up). Pooled 12 values sorted: 1,2,3,4,4,5,5,6,6,7,8,9
        # b1 = rank (12+2)//3 = 4 -> 4; b2 = rank (26)//3 = 8 -> 6.
        # Bands (v<=4 -> 1, v<=6 -> 2): pairs u1 (1,1), u2 (1,2),
        # u3 (1,2), u4 (1,3), u5 (2,3), u6 (2,3)
        # d = (4-1, 2-2, 0-3) = (3, 0, -3); m12 = 2, m13 = 1, m23 = 2
        # chi2 = (2*9 + 1*0 + 2*9) / (2*1 + 2*2 + 1*2) = 36/8 = 4.5
        rows = []
        for u in range(1, 7):
            rows.append((2 * u, f"2024-01-01 00:{u:02d}:00", u, "c",
                         float(u), "{}"))
            rows.append((2 * u + 1, f"2024-01-01 01:{u:02d}:00", u, "c",
                         float(u + 3), "{}"))
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "stuart_maxwell_first_last_bands")[0]
        assert (row["d1"], row["d2"], row["d3"]) == (3, 0, -3)
        assert row["stuart_maxwell_chi2"] == pytest.approx(4.5, abs=1e-6)

    def test_diagonal_table_null(self, spark, tmp_path):
        # single event per user -> first == last -> all mass diagonal
        _write_events(
            tmp_path, _ev([(u, float(u)) for u in range(1, 7)])
        )
        row = _run(spark, tmp_path, "stuart_maxwell_first_last_bands")[0]
        assert row["stuart_maxwell_chi2"] is None
        assert (row["d1"], row["d2"], row["d3"]) == (0, 0, 0)


class TestSnhtChangepoint:
    def test_two_hour_hand_computed(self, spark, tmp_path):
        # hourly [2, 4]: T(1) = 1*z1^2 + 1*z2^2 with z = -+1 -> 2.0
        rows = []
        eid = 0
        for h, c in [(0, 2), (1, 4)]:
            for _ in range(c):
                rows.append(
                    (eid, f"2024-01-01 {h:02d}:0{eid % 6}:00", 1, "c",
                     1.0, "{}")
                )
                eid += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "snht_changepoint_hourly")[0]
        assert row["k_hat"] == 1
        assert row["snht_t_max"] == pytest.approx(2.0, abs=1e-6)

    def test_level_shift_argmax(self, spark, tmp_path):
        # hourly [1, 1, 5, 5]: the split after hour 2 maximizes T
        rows = []
        eid = 0
        for h, c in [(0, 1), (1, 1), (2, 5), (3, 5)]:
            for _ in range(c):
                rows.append(
                    (eid, f"2024-01-01 {h:02d}:{eid % 60:02d}:00", 1,
                     "c", 1.0, "{}")
                )
                eid += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "snht_changepoint_hourly")[0]
        # mean 3, pop var 4: z-halves at k=2 are (-1, +1) scaled:
        # T(2) = 2*(2/2-3)^2/4 + 2*(5-3)^2/4 = 2+2 = 4
        assert row["k_hat"] == 2
        assert row["snht_t_max"] == pytest.approx(4.0, abs=1e-6)

    def test_constant_series_null(self, spark, tmp_path):
        rows = []
        eid = 0
        for h in range(3):
            rows.append(
                (eid, f"2024-01-01 {h:02d}:00:00", 1, "c", 1.0, "{}")
            )
            eid += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "snht_changepoint_hourly")[0]
        assert row["snht_t_max"] is None


class TestHodgesLehmann:
    def test_median_of_pairwise_diffs(self, spark, tmp_path):
        # arm1 = {1, 3}, arm0 = {0}: diffs {1, 3} -> HL = 2.0
        _write_events(tmp_path, _ev([(1, 1.0), (1, 3.0), (2, 0.0)]))
        row = _run(spark, tmp_path, "hodges_lehmann_shift_arms")[0]
        assert row["n_pairs"] == 2
        assert row["hl_shift"] == pytest.approx(2.0, abs=1e-6)

    def test_weighted_even_median(self, spark, tmp_path):
        # arm1 = {1, 1, 5}, arm0 = {0, 2}: diffs sorted =
        # {-1, -1, 1, 1, 3, 5} -> doubled median ranks 3,4 -> (1+1)/2=1
        _write_events(
            tmp_path,
            _ev([(1, 1.0), (1, 1.0), (1, 5.0), (2, 0.0), (2, 2.0)]),
        )
        row = _run(spark, tmp_path, "hodges_lehmann_shift_arms")[0]
        assert row["n_pairs"] == 6
        assert row["hl_shift"] == pytest.approx(1.0, abs=1e-6)


def _bucket_events(counts, hours_per_bucket=6):
    """counts[i] events in consecutive `hours_per_bucket`-hour buckets
    starting 2024-01-01 00:00."""
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        day = 1 + (i * hours_per_bucket) // 24
        hour = (i * hours_per_bucket) % 24
        for j in range(c):
            rows.append(
                (eid, f"2024-01-{day:02d} {hour:02d}:{j % 60:02d}:00",
                 1, "c", 1.0, "{}")
            )
            eid += 1
    return rows


class TestC3AndTrev:
    def test_c3_ramp_hand_computed(self, spark, tmp_path):
        # 6h counts 1..5: lag1 mean = (6+24+60)/3 = 30; lag2 = 15
        # (single term 5*3*1); lag3 has no complete chain -> NULL
        _write_events(tmp_path, _bucket_events([1, 2, 3, 4, 5]))
        rows = _run(spark, tmp_path, "c3_nonlinearity_6h")
        got = {r["lag"]: (r["n_terms"], r["c3_mean"]) for r in rows}
        assert got == {1: (3, 30.0), 2: (1, 15.0), 3: (0, None)}

    def test_trev_ramp_hand_computed(self, spark, tmp_path):
        # same ramp: trev(1) = mean(y*py*(y-py)) = (2+6+12+20)/4 = 10;
        # trev(2) = (6+16+30)/3; trev(3) = (12+30)/2 = 21
        _write_events(tmp_path, _bucket_events([1, 2, 3, 4, 5]))
        rows = _run(spark, tmp_path, "time_reversal_asymmetry_6h")
        got = {r["lag"]: (r["n_terms"], r["trev_mean"]) for r in rows}
        assert got[1] == (4, 10.0)
        assert got[2][0] == 3
        assert got[2][1] == pytest.approx(52.0 / 3.0, abs=1e-6)
        assert got[3] == (2, 21.0)

    def test_trev_constant_series_zero(self, spark, tmp_path):
        _write_events(tmp_path, _bucket_events([2, 2, 2, 2]))
        rows = _run(spark, tmp_path, "time_reversal_asymmetry_6h")
        assert all(r["trev_mean"] == 0.0 for r in rows)


class TestAllanVariance:
    def test_doubling_series(self, spark, tmp_path):
        # hourly [1,2,4,8]: AVAR(1) = (1+4+16)/6 = 3.5;
        # AVAR(2) = 81/(2*4*1) = 10.125; AVAR(4): one group -> NULL
        _write_events(
            tmp_path, _bucket_events([1, 2, 4, 8], hours_per_bucket=1)
        )
        rows = _run(spark, tmp_path, "allan_variance_hourly_rate")
        got = {r["tau_hours"]: (r["n_groups"], r["allan_var"]) for r in rows}
        assert got == {1: (4, 3.5), 2: (2, 10.125), 4: (1, None)}


class TestLongestMonotoneRuns:
    def test_hand_computed(self, spark, tmp_path):
        # hourly [1,3,2,4,5,6,2,1,0,1]: longest strict up = 4
        # (2,4,5,6), longest strict down = 4 (6,2,1,0); the zero
        # bucket is interior so the span scaffold materializes it
        _write_events(
            tmp_path,
            _bucket_events(
                [1, 3, 2, 4, 5, 6, 2, 1, 0, 1], hours_per_bucket=1
            ),
        )
        row = _run(spark, tmp_path, "longest_monotone_runs_hourly")[0]
        assert row["n_hours"] == 10
        assert row["longest_up_run"] == 4
        assert row["longest_down_run"] == 4

    def test_flat_series_runs_of_one(self, spark, tmp_path):
        _write_events(
            tmp_path, _bucket_events([3, 3, 3], hours_per_bucket=1)
        )
        row = _run(spark, tmp_path, "longest_monotone_runs_hourly")[0]
        assert row["longest_up_run"] == 1
        assert row["longest_down_run"] == 1


class TestWelchAnova:
    def test_two_group_hand_computed(self, spark, tmp_path):
        # A = {1,2,3} (var 1e6 micro^2), B = {10,12} (var 2e6):
        # w = (3e-6, 1e-6), xw = 4250, A-num = 60.75, k = 2 ->
        # F = 60.75 (B-term vanishes at k = 2), df2 = 3/1.78125
        _write_events(
            tmp_path,
            [
                (0, "2024-01-01 00:00:00", 1, "A", 1.0, "{}"),
                (1, "2024-01-01 00:01:00", 1, "A", 2.0, "{}"),
                (2, "2024-01-01 00:02:00", 1, "A", 3.0, "{}"),
                (3, "2024-01-01 00:03:00", 1, "B", 10.0, "{}"),
                (4, "2024-01-01 00:04:00", 1, "B", 12.0, "{}"),
            ],
        )
        row = _run(spark, tmp_path, "welch_anova_value_types")[0]
        assert row["k_groups"] == 2
        assert row["welch_f"] == pytest.approx(60.75, abs=1e-6)
        assert row["welch_df2"] == pytest.approx(
            3.0 / 1.78125, abs=1e-6
        )

    def test_single_usable_group_null(self, spark, tmp_path):
        # constant group excluded by the exact integer variance test,
        # leaving k = 1 -> both outputs NULL
        _write_events(
            tmp_path,
            [
                (0, "2024-01-01 00:00:00", 1, "A", 5.0, "{}"),
                (1, "2024-01-01 00:01:00", 1, "A", 5.0, "{}"),
                (2, "2024-01-01 00:02:00", 1, "B", 1.0, "{}"),
                (3, "2024-01-01 00:03:00", 1, "B", 2.0, "{}"),
            ],
        )
        row = _run(spark, tmp_path, "welch_anova_value_types")[0]
        assert row["k_groups"] == 1
        assert row["welch_f"] is None and row["welch_df2"] is None


class TestQuade:
    def test_two_block_hand_computed(self, spark, tmp_path):
        # day1: (A=1, B=3) spread 2; day2: (A=5, B=4) spread 1.
        # S' matrix = [[-4, 4], [2, -2]]: A' = 40, B'' = 8,
        # F = 1*8 / (2*40 - 8) = 1/9
        rows = []
        eid = 0
        for day, tcounts in [(1, {"A": 1, "B": 3}), (2, {"A": 5, "B": 4})]:
            for t, c in tcounts.items():
                for j in range(c):
                    rows.append(
                        (eid, f"2024-01-{day:02d} 06:{j:02d}:00", 1, t,
                         1.0, "{}")
                    )
                    eid += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "quade_test_day_types")[0]
        assert row["b_days"] == 2 and row["k_types"] == 2
        assert row["quade_f"] == pytest.approx(1.0 / 9.0, abs=1e-6)

    def test_unanimous_identical_counts_null(self, spark, tmp_path):
        # both days count A twice, B twice: every rank tied -> S' = 0
        rows = []
        eid = 0
        for day in (1, 2):
            for t in ("A", "B"):
                for j in range(2):
                    rows.append(
                        (eid, f"2024-01-{day:02d} 06:{j:02d}:00", 1, t,
                         1.0, "{}")
                    )
                    eid += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "quade_test_day_types")[0]
        assert row["quade_f"] is None


from tests.test_round8_ops import _write_documents  # noqa: E402


class TestGoodTuring:
    def test_hand_computed(self, spark, tmp_path):
        # en tokens: a:2 b:1 c:1 -> N=4 V1=2 V2=1:
        # p_unseen = 0.5, r* = 2*V2/V1 = 1.0
        _write_documents(tmp_path, [(0, "a a b c", "en", "s1")])
        row = _run(spark, tmp_path, "good_turing_unseen_mass_by_lang")[0]
        assert (row["n_tokens"], row["n_types"], row["v1"]) == (4, 3, 2)
        assert row["p_unseen"] == 0.5
        assert row["gt_hapax_adjusted_count"] == 1.0

    def test_no_hapax_null(self, spark, tmp_path):
        _write_documents(tmp_path, [(0, "a a b b", "en", "s1")])
        row = _run(spark, tmp_path, "good_turing_unseen_mass_by_lang")[0]
        assert row["p_unseen"] == 0.0
        assert row["gt_hapax_adjusted_count"] is None


class TestMattr:
    def test_constant_vs_distinct_docs(self, spark, tmp_path):
        # 25 identical tokens -> MATTR = 1/25; 25 distinct -> 1.0;
        # a 24-token doc is excluded; lang mean = 0.52
        _write_documents(
            tmp_path,
            [
                (0, " ".join(["x"] * 25), "en", "s1"),
                (1, " ".join(f"w{i}" for i in range(25)), "en", "s1"),
                (2, " ".join(["y"] * 24), "en", "s1"),
            ],
        )
        row = _run(spark, tmp_path, "mattr_window25_by_lang")[0]
        assert row["n_docs_scored"] == 2
        assert row["mattr_mean"] == pytest.approx(0.52, abs=1e-6)


class TestReadability:
    def test_cli_ari_hand_computed(self, spark, tmp_path):
        # "ab cd. ef!": letters 6, words 3, sentence runs 2
        # CLI = 0.0588*200 - 0.296*(200/3) - 15.8 = -23.773333
        # ARI = 4.71*2 + 0.5*1.5 - 21.43 = -11.26
        _write_documents(tmp_path, [(0, "ab cd. ef!", "en", "s1")])
        row = _run(spark, tmp_path, "readability_cli_ari_by_lang")[0]
        assert row["coleman_liau"] == pytest.approx(
            0.0588 * 200 - 0.296 * 200 / 3 - 15.8, abs=1e-6
        )
        assert row["ari"] == pytest.approx(-11.26, abs=1e-6)

    def test_fog_hand_computed(self, spark, tmp_path):
        # docs "ab cd. ef!" (0 complex, 3 words, 2 sents) and
        # "aviation aviation." (2 complex, 2 words, 1 sent):
        # fog = 0.4*(5/3 + 100*2/5) = 16.666667
        _write_documents(
            tmp_path,
            [
                (0, "ab cd. ef!", "en", "s1"),
                (1, "aviation aviation.", "en", "s1"),
            ],
        )
        row = _run(spark, tmp_path, "gunning_fog_by_lang")[0]
        assert (row["words"], row["complex_words"]) == (5, 2)
        assert row["gunning_fog"] == pytest.approx(
            0.4 * (5.0 / 3.0 + 40.0), abs=1e-6
        )


class TestKeyness:
    def test_two_source_g2(self, spark, tmp_path):
        import math

        # top-2 sources by tokens: s1 (6 = 5x + 1y), s2 (5 = 5y);
        # the s3 doc must not participate
        _write_documents(
            tmp_path,
            [
                (0, "x x x x x y", "en", "s1"),
                (1, "y y y y y", "en", "s2"),
                (2, "z z", "en", "s3"),
            ],
        )
        rows = _run(spark, tmp_path, "keyness_g2_top_terms")
        got = {r["word"]: r for r in rows}
        assert set(got) == {"x", "y"}
        g2_x = 2 * (5 * math.log(5 * 11 / (5 * 6)))
        g2_y = 2 * (
            1 * math.log(1 * 11 / (6 * 6))
            + 5 * math.log(5 * 11 / (6 * 5))
        )
        assert got["x"]["keyness_g2"] == pytest.approx(g2_x, abs=1e-6)
        assert got["y"]["keyness_g2"] == pytest.approx(g2_y, abs=1e-6)
        assert (got["x"]["count_top1"], got["x"]["count_top2"]) == (5, 0)


class TestVocabOverlap:
    def test_two_source_jaccard(self, spark, tmp_path):
        # s1 vocab {a,b,c} (4 tokens), s2 vocab {b,c,d} (3 tokens):
        # intersection 2, union 4 -> jaccard 0.5, overlap 2/3
        _write_documents(
            tmp_path,
            [
                (0, "a a b c", "en", "s1"),
                (1, "b c d", "en", "s2"),
            ],
        )
        rows = _run(spark, tmp_path, "vocab_overlap_top_sources")
        assert len(rows) == 1
        r = rows[0]
        assert (r["source_rank_a"], r["source_rank_b"]) == (1, 2)
        assert r["n_shared_types"] == 2
        assert r["jaccard"] == 0.5
        assert r["overlap_coef"] == pytest.approx(2.0 / 3.0, abs=1e-6)


class TestCharBigramEntropy:
    def test_uniform_vs_constant(self, spark, tmp_path):
        # en "aabb": bigrams aa, ab, bb each once -> H = log2(3);
        # fr "aaa": both bigrams identical -> H = 0
        _write_documents(
            tmp_path,
            [(0, "aabb", "en", "s1"), (1, "aaa", "fr", "s1")],
        )
        rows = _run(spark, tmp_path, "char_bigram_entropy_by_lang")
        got = {r["lang"]: r for r in rows}
        assert got["en"]["n_bigrams"] == 3
        assert got["en"]["bigram_entropy_bits"] == pytest.approx(
            1.584963, abs=1e-6
        )
        assert got["fr"]["bigram_entropy_bits"] == 0.0


from tests.test_round9_ops import _write_embeddings  # noqa: E402


class TestVMeasure:
    def test_perfect_partition(self, spark, tmp_path):
        # label 0 -> all-positive quadrant, label 1 -> all-negative:
        # the partitions coincide -> h = c = V = 1
        rows = [(i, [1.0] * 64, 0) for i in range(3)]
        rows += [(3 + i, [-1.0] * 64, 1) for i in range(3)]
        _write_embeddings(tmp_path, rows)
        row = _run(spark, tmp_path, "v_measure_embedding_partition")[0]
        assert row["homogeneity"] == 1.0
        assert row["completeness"] == 1.0
        assert row["v_measure"] == 1.0

    def test_mixed_cell_hand_computed(self, spark, tmp_path):
        import math

        # labels [0,0,1,1], buckets [3,3,3,0]
        rows = [
            (0, [1.0] * 64, 0),
            (1, [1.0] * 64, 0),
            (2, [1.0] * 64, 1),
            (3, [-1.0] * 64, 1),
        ]
        _write_embeddings(tmp_path, rows)
        row = _run(spark, tmp_path, "v_measure_embedding_partition")[0]
        hc = math.log(2)
        hck = -(0.5 * math.log(2 / 3) + 0.25 * math.log(1 / 3))
        hk = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
        hkc = -(
            0.5 * math.log(2 / 2) + 0.25 * math.log(1 / 2)
            + 0.25 * math.log(1 / 2)
        )
        h, c = 1 - hck / hc, 1 - hkc / hk
        assert row["homogeneity"] == pytest.approx(h, abs=1e-6)
        assert row["completeness"] == pytest.approx(c, abs=1e-6)
        assert row["v_measure"] == pytest.approx(
            2 * h * c / (h + c), abs=1e-6
        )


class TestClusterValidity:
    def _fixture(self, tmp_path):
        _write_events(
            tmp_path,
            [
                (0, "2024-01-01 00:00:00", 1, "A", 1.0, "{}"),
                (1, "2024-01-01 00:01:00", 1, "A", 2.0, "{}"),
                (2, "2024-01-01 00:02:00", 1, "A", 3.0, "{}"),
                (3, "2024-01-01 00:03:00", 1, "B", 5.0, "{}"),
                (4, "2024-01-01 00:04:00", 1, "B", 7.0, "{}"),
            ],
        )

    def test_calinski_hand_computed(self, spark, tmp_path):
        # means 2000/6000 micro, grand 3600: between 19.2e6,
        # within 4e6 -> CH = 19.2e6 / (4e6/3) = 14.4
        self._fixture(tmp_path)
        row = _run(spark, tmp_path, "calinski_harabasz_value_types")[0]
        assert (row["k_clusters"], row["n_points"]) == (2, 5)
        assert row["ch_index"] == pytest.approx(14.4, abs=1e-6)

    def test_davies_bouldin_hand_computed(self, spark, tmp_path):
        import math

        self._fixture(tmp_path)
        row = _run(spark, tmp_path, "davies_bouldin_value_types")[0]
        ratio = (math.sqrt(2e6 / 3) + math.sqrt(1e6)) / 4000.0
        assert row["db_index"] == pytest.approx(ratio, abs=1e-6)

    def test_dunn_hand_computed(self, spark, tmp_path):
        # A = {1, 2}, B = {5, 9}: min inter 3000, max diam 4000
        _write_events(
            tmp_path,
            [
                (0, "2024-01-01 00:00:00", 1, "A", 1.0, "{}"),
                (1, "2024-01-01 00:01:00", 1, "A", 2.0, "{}"),
                (2, "2024-01-01 00:02:00", 1, "B", 5.0, "{}"),
                (3, "2024-01-01 00:03:00", 1, "B", 9.0, "{}"),
            ],
        )
        row = _run(spark, tmp_path, "cluster_dunn_index_types")[0]
        assert (row["min_inter"], row["max_diam"]) == (3000, 4000)
        assert row["dunn_index"] == 0.75

    def test_dunn_shared_value_zero(self, spark, tmp_path):
        # a value carried by both types forces min_inter = 0
        _write_events(
            tmp_path,
            [
                (0, "2024-01-01 00:00:00", 1, "A", 1.0, "{}"),
                (1, "2024-01-01 00:01:00", 1, "A", 4.0, "{}"),
                (2, "2024-01-01 00:02:00", 1, "B", 1.0, "{}"),
                (3, "2024-01-01 00:03:00", 1, "B", 2.0, "{}"),
            ],
        )
        row = _run(spark, tmp_path, "cluster_dunn_index_types")[0]
        assert row["min_inter"] == 0 and row["dunn_index"] == 0.0


def _si_pair(eid, uid):
    import hashlib

    y = 1 if uid % 3 == 0 else 0
    hx = hashlib.md5(str(eid).encode()).hexdigest()
    h1, h2 = int(hx[:4], 16) % 1000, int(hx[4:8], 16) % 1000
    return y, 2997 * y + 7 * h1, 2997 * y + 7 * h2


class TestNriAndPartialAuc:
    def test_nri_replica(self, spark, tmp_path):
        rows = [
            (eid, f"2024-01-01 00:{eid:02d}:00", uid, "c", 1.0, "{}")
            for eid, uid in [(i, i) for i in range(12)]
        ]
        _write_events(tmp_path, rows)
        exp = {"pos_up": 0, "pos_down": 0, "neg_up": 0, "neg_down": 0,
               "pos": 0, "neg": 0}
        for eid, uid in [(i, i) for i in range(12)]:
            y, si, si2 = _si_pair(eid, uid)
            exp["pos" if y else "neg"] += 1
            if y and si < 4995 <= si2:
                exp["pos_up"] += 1
            if y and si2 < 4995 <= si:
                exp["pos_down"] += 1
            if not y and si < 4995 <= si2:
                exp["neg_up"] += 1
            if not y and si2 < 4995 <= si:
                exp["neg_down"] += 1
        row = _run(spark, tmp_path, "nri_reclassification_scores")[0]
        for k, v in exp.items():
            assert row[k] == v, k
        want = (exp["pos_up"] - exp["pos_down"]) / exp["pos"] + (
            exp["neg_down"] - exp["neg_up"]
        ) / exp["neg"]
        assert row["nri"] == pytest.approx(want, abs=1e-6)

    def test_partial_auc_replica(self, spark, tmp_path):
        rows = [
            (eid, f"2024-01-01 00:{eid:02d}:00", uid, "c", 1.0, "{}")
            for eid, uid in [(i, i) for i in range(30)]
        ]
        _write_events(tmp_path, rows)
        scored = [_si_pair(i, i) for i in range(30)]
        pos = sum(y for y, _, _ in scored)
        negs = sorted((si for y, si, _ in scored if y == 0),
                      reverse=True)
        poss = [si for y, si, _ in scored if y == 1]
        m = len(negs) // 5
        s2 = 0
        for sn in negs[:m]:
            s2 += 2 * sum(1 for sp in poss if sp > sn)
            s2 += sum(1 for sp in poss if sp == sn)
        row = _run(spark, tmp_path, "eval_partial_auc_fpr20")[0]
        assert (row["pos"], row["neg"]) == (pos, len(negs))
        assert row["n_negatives_in_band"] == m
        assert row["pauc"] == pytest.approx(
            s2 / (2 * pos * len(negs)), abs=1e-6
        )
        assert row["pauc_normalized"] == pytest.approx(
            s2 / (2 * pos * m), abs=1e-6
        )

    def test_partial_auc_empty_band_null(self, spark, tmp_path):
        # 4 negatives -> m = 0 -> normalized NULL
        rows = [
            (i, f"2024-01-01 00:{i:02d}:00", 1 + (i % 2) * 2, "c", 1.0,
             "{}")
            for i in range(4)
        ]
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "eval_partial_auc_fpr20")[0]
        assert row["n_negatives_in_band"] == 0
        assert row["pauc_normalized"] is None


from tests.test_round8b_ops import _write_orders  # noqa: E402
from tests.test_round9_ops import _write_customer, _write_lineitem  # noqa: E402


class TestCrConcentration:
    def test_one_nation_hand_computed(self, spark, tmp_path):
        revs = [100.0, 50.0, 25.0, 10.0, 5.0, 1.0]
        _write_customer(
            tmp_path,
            [(c, f"c{c}", 1, 0.0, "BUILDING") for c in range(1, 7)],
        )
        _write_orders(
            tmp_path,
            [
                (i, i + 1, "O", revs[i], "2024-01-05", "1-URGENT")
                for i in range(6)
            ],
        )
        row = _run(spark, tmp_path, "cr_concentration_by_nation")[0]
        assert row["n_customers"] == 6
        assert row["cr4"] == pytest.approx(185.0 / 191.0, abs=1e-6)
        assert row["cr8"] == 1.0


class TestFrequencyMigration:
    def test_matrix_hand_computed(self, spark, tmp_path):
        orders = []
        ok = 0
        for cust, dates in [
            (1, ["2024-01-05"]),
            (2, ["2024-01-06", "2024-01-07", "2024-03-05"]),
            (3, ["2024-03-06", "2024-03-07", "2024-04-05", "2024-04-06"]),
            (4, ["2024-01-08", "2024-04-07"]),
        ]:
            for d in dates:
                orders.append((ok, cust, "O", 10.0, d, "1-URGENT"))
                ok += 1
        _write_orders(tmp_path, orders)
        rows = _run(
            spark, tmp_path, "customer_frequency_migration_halves"
        )
        got = {(r["band_from"], r["band_to"]): r["n_customers"]
               for r in rows}
        assert got == {
            ("1_one", "0_none"): 1,
            ("2_few", "1_one"): 1,
            ("0_none", "3_many"): 1,
            ("1_one", "1_one"): 1,
        }


class TestBenfordSecondDigit:
    def test_hand_computed(self, spark, tmp_path):
        _write_orders(
            tmp_path,
            [
                (0, 1, "O", 12.0, "2024-01-05", "1"),
                (1, 1, "O", 1234.0, "2024-01-06", "1"),
                (2, 1, "O", 95.0, "2024-01-07", "1"),
                (3, 1, "O", 9.0, "2024-01-08", "1"),
                (4, 1, "O", 105.0, "2024-01-09", "1"),
            ],
        )
        rows = _run(spark, tmp_path, "benford_second_digit_totalprice")
        assert len(rows) == 10
        got = {r["digit"]: r for r in rows}
        assert got[2]["n_obs"] == 2 and got[5]["n_obs"] == 1
        assert got[0]["n_obs"] == 1 and got[9]["n_obs"] == 0
        p2 = 0.108821
        assert got[2]["chi2_term"] == pytest.approx(
            (2 - 4 * p2) ** 2 / (4 * p2), abs=1e-6
        )
        assert got[2]["obs_p"] == 0.5


class TestPriceIndex:
    def test_two_month_hand_computed(self, spark, tmp_path):
        import math

        _write_lineitem(
            tmp_path,
            [
                (1, 1, 1, 1, 10.0, 10.0, 0.0, 0.0, "N", "O",
                 "2024-01-10"),
                (2, 2, 1, 1, 5.0, 10.0, 0.0, 0.0, "N", "O",
                 "2024-01-11"),
                (3, 1, 1, 1, 8.0, 16.0, 0.0, 0.0, "N", "O",
                 "2024-02-10"),
                (4, 2, 1, 1, 10.0, 10.0, 0.0, 0.0, "N", "O",
                 "2024-02-11"),
            ],
        )
        rows = _run(spark, tmp_path, "price_index_fisher_monthly")
        assert len(rows) == 2
        base, feb = rows
        assert base["laspeyres"] == 1.0 and base["fisher"] == 1.0
        assert feb["n_parts"] == 2
        assert feb["laspeyres"] == 1.25
        assert feb["paasche"] == pytest.approx(2.6 / 2.8, abs=1e-6)
        assert feb["fisher"] == pytest.approx(
            math.sqrt(1.25 * 2.6 / 2.8), abs=1e-6
        )


class TestRayleigh:
    def test_concentrated_vs_uniform(self, spark, tmp_path):
        rows = []
        eid = 0
        for _ in range(5):  # type A all at hour 0
            rows.append(
                (eid, f"2024-01-01 00:{eid:02d}:00", 1, "A", 1.0, "{}")
            )
            eid += 1
        for h in (0, 6, 12, 18):  # type B spread on the compass
            rows.append(
                (eid, f"2024-01-01 {h:02d}:30:00", 1, "B", 1.0, "{}")
            )
            eid += 1
        _write_events(tmp_path, rows)
        got = {
            r["event_type"]: r
            for r in _run(
                spark, tmp_path, "rayleigh_hour_concentration_by_type"
            )
        }
        assert got["A"]["resultant_rbar"] == 1.0
        assert got["A"]["rayleigh_z"] == 5.0
        assert got["B"]["resultant_rbar"] == pytest.approx(0.0, abs=1e-5)
        assert got["B"]["rayleigh_z"] == pytest.approx(0.0, abs=1e-5)


def _graph_events(edges):
    """Build events whose (user_id%997, event_id%997) pairs on
    event_id%10==0 produce exactly `edges` (CRT picks the event id)."""
    rows = []
    for i, (u, t) in enumerate(edges):
        k = (-t * 3) % 10
        eid = t + 997 * k
        assert eid % 10 == 0 and eid % 997 == t
        rows.append(
            (eid, f"2024-01-01 00:{i:02d}:00", u, "c", 1.0, "{}")
        )
    return rows


class TestGraphStaged:
    def test_avg_neighbor_degree(self, spark, tmp_path):
        # edges 1-10, 1-20, 10-30: knn(1) = 2.0 (nodes 20,30),
        # knn(2) = 1.5 (nodes 1,10)
        _write_events(
            tmp_path, _graph_events([(1, 10), (1, 20), (10, 30)])
        )
        rows = _run(
            spark, tmp_path, "graph_avg_neighbor_degree_profile"
        )
        got = {r["degree"]: (r["n_nodes"], r["avg_neighbor_degree"])
               for r in rows}
        assert got == {1: (2, 2.0), 2: (2, 1.5)}

    def test_square_count_single_cycle(self, spark, tmp_path):
        # 4-cycle 1-2-3-4: exactly one square
        _write_events(
            tmp_path,
            _graph_events([(1, 2), (2, 3), (3, 4), (4, 1)]),
        )
        row = _run(spark, tmp_path, "graph_square_count_c4")[0]
        assert row["n_edges"] == 4
        assert row["n_squares"] == 1

    def test_triangle_has_no_square(self, spark, tmp_path):
        _write_events(
            tmp_path, _graph_events([(1, 2), (2, 3), (3, 1)])
        )
        row = _run(spark, tmp_path, "graph_square_count_c4")[0]
        assert row["n_squares"] == 0


class TestEmbeddingGeometry:
    def test_participation_ratio_rank2(self, spark, tmp_path):
        e1 = [1.0] + [0.0] * 63
        e2 = [0.0, 1.0] + [0.0] * 62
        _write_embeddings(tmp_path, [(0, e1, 0), (1, e2, 0)])
        row = _run(spark, tmp_path, "embedding_participation_ratio")[0]
        assert row["n_dims"] == 64
        assert row["participation_ratio"] == 2.0
        assert row["pr_over_d"] == 0.03125

    def test_participation_ratio_collapsed(self, spark, tmp_path):
        e1 = [1.0] + [0.0] * 63
        _write_embeddings(tmp_path, [(0, e1, 0), (1, e1, 0)])
        row = _run(spark, tmp_path, "embedding_participation_ratio")[0]
        assert row["participation_ratio"] == 1.0


class TestBrunnerMunzel:
    def test_hand_computed(self, spark, tmp_path):
        # arm1 = {1,2,4}, arm0 = {3,5}: Rbar1 = 7/3, Rbar0 = 4,
        # S1^2 = 1/3, S0^2 = 1/2 -> stat = -10/(5*sqrt(2)),
        # p_hat = 1/6
        _write_events(
            tmp_path,
            _ev([(1, 1.0), (1, 2.0), (1, 4.0), (2, 3.0), (2, 5.0)]),
        )
        row = _run(spark, tmp_path, "brunner_munzel_arms")[0]
        assert (row["n0"], row["n1"]) == (2, 3)
        assert row["p_hat"] == pytest.approx(1.0 / 6.0, abs=1e-6)
        assert row["bm_statistic"] == pytest.approx(
            -10.0 / (5.0 * 2 ** 0.5), abs=1e-6
        )

    def test_singleton_arm_null(self, spark, tmp_path):
        _write_events(tmp_path, _ev([(1, 1.0), (2, 2.0), (2, 3.0)]))
        row = _run(spark, tmp_path, "brunner_munzel_arms")[0]
        assert row["bm_statistic"] is None


class TestIcc:
    def test_perfect_between_user_separation(self, spark, tmp_path):
        _write_events(
            tmp_path,
            _ev([(2, 1.0), (2, 1.0), (4, 3.0), (4, 3.0)]),
        )
        row = _run(spark, tmp_path, "icc_oneway_user_values")[0]
        assert (row["n_subjects"], row["n_values"]) == (2, 4)
        assert row["k0"] == 2.0
        assert row["icc1"] == 1.0

    def test_pure_within_variation(self, spark, tmp_path):
        _write_events(
            tmp_path,
            _ev([(2, 1.0), (2, 3.0), (4, 1.0), (4, 3.0)]),
        )
        row = _run(spark, tmp_path, "icc_oneway_user_values")[0]
        assert row["icc1"] == -1.0


class TestVarianceTimeSlope:
    def test_two_point_slope(self, spark, tmp_path):
        import math

        # hourly [2,0,2,0,0,2,2,1] (first bucket non-empty so the
        # span covers exactly these 8 hours); python replica below
        # mirrors the block-variance/micro-log pipeline
        ys = [2, 0, 2, 0, 0, 2, 2, 1]
        _write_events(
            tmp_path, _bucket_events(ys, hours_per_bucket=1)
        )
        pts = []
        for m, lx in [(1, 0), (2, 693147), (4, 1386294), (8, 2079441)]:
            blocks = [
                sum(ys[i * m:(i + 1) * m])
                for i in range(len(ys) // m)
            ]
            kk = len(blocks)
            if kk < 2:
                continue
            s1, s2 = sum(blocks), sum(b * b for b in blocks)
            num = kk * s2 - s1 * s1
            if num <= 0:
                continue
            var = num / (m * m * kk * (kk - 1))
            pts.append((lx, math.floor(math.log(var) * 1e6)))
        np_, sx = len(pts), sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        slope = (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx)
        row = _run(spark, tmp_path, "variance_time_slope_hourly")[0]
        assert row["n_points"] == np_
        assert row["vt_slope"] == pytest.approx(slope, abs=1e-6)
        assert row["hurst_vt"] == pytest.approx(1 + slope / 2, abs=1e-6)


class TestClvHeuristic:
    def test_segments_hand_computed(self, spark, tmp_path):
        orders = [
            (0, 1, "O", 100.0, "2024-01-05", "1"),
            (1, 2, "O", 50.0, "2024-01-06", "1"),
            (2, 2, "O", 50.0, "2024-02-06", "1"),
            (3, 3, "O", 25.0, "2024-01-07", "1"),
            (4, 3, "O", 25.0, "2024-02-07", "1"),
            (5, 3, "O", 25.0, "2024-03-07", "1"),
            (6, 3, "O", 25.0, "2024-04-07", "1"),
        ]
        _write_orders(tmp_path, orders)
        rows = _run(spark, tmp_path, "clv_heuristic_by_segment")
        got = {r["segment"]: r for r in rows}
        assert got["1_one"]["clv_24m"] == pytest.approx(2400.0)
        assert got["2_few"]["avg_order_value"] == 50.0
        assert got["2_few"]["clv_24m"] == pytest.approx(1200.0)
        assert got["3_many"]["orders_per_active_month"] == 1.0
        assert got["3_many"]["clv_24m"] == pytest.approx(600.0)


class TestStagedPlanShapes:
    """Every staged operator's physical plan must be free of
    non-broadcast cartesian products at sf0.001 — the same gate the
    registered rounds pin (broadcast nested loops over 1-row scalar
    relations are the accepted idiom; CartesianProduct is the scale
    killer)."""

    SF = "/root/testdata/sf0.001"

    @pytest.mark.parametrize("name", sorted(STAGED))
    def test_no_cartesian(self, spark, name):
        plan = (
            STAGED[name][0](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, name


class TestBws:
    def test_no_tie_hand_computed(self, spark, tmp_path):
        # X = arm1 = {1,3}, Y = arm0 = {2,4}: B_X = 9/8, B_Y = 0
        _write_events(
            tmp_path, _ev([(1, 1.0), (1, 3.0), (2, 2.0), (2, 4.0)])
        )
        row = _run(spark, tmp_path, "bws_test_arms")[0]
        assert (row["n0"], row["n1"]) == (2, 2)
        assert row["b_arm1"] == pytest.approx(1.125, abs=1e-6)
        assert row["b_arm0"] == 0.0
        assert row["bws_b"] == pytest.approx(0.5625, abs=1e-6)


class TestGTest:
    def test_two_by_two_hand_computed(self, spark, tmp_path):
        import math

        rows = []
        eid = 0
        for t, arm, c in [("A", 0, 10), ("A", 1, 10), ("B", 0, 5),
                          ("B", 1, 15)]:
            for j in range(c):
                rows.append(
                    (eid, f"2024-01-01 00:{j:02d}:{eid % 60:02d}", 
                     2 + arm, t, 1.0, "{}")
                )
                eid += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "g_test_type_arm_independence")[0]
        g2 = 2 * (
            10 * math.log(10 * 40 / (20 * 15))
            + 10 * math.log(10 * 40 / (20 * 25))
            + 5 * math.log(5 * 40 / (20 * 15))
            + 15 * math.log(15 * 40 / (20 * 25))
        )
        assert (row["n_events"], row["df"]) == (40, 1)
        assert row["g2"] == pytest.approx(g2, abs=1e-6)


def _goertzel_int(xs, c):
    s1 = s2 = 0
    for x in xs:
        s1, s2 = x + c * s1 - s2, s1
    return s1 * s1 + s2 * s2 - c * s1 * s2


class TestGoertzel:
    def test_constant_signal_no_tone_energy(self, spark, tmp_path):
        # 60 identical samples: zero power at every non-DC bin
        _write_documents(tmp_path, [(0, "a" * 60, "en", "s1")])
        row = _run(spark, tmp_path, "audio_goertzel_tone_energy")[0]
        assert row["n_docs"] == 1
        assert row["mean_power_fs6"] == 0.0
        assert row["mean_power_fs4"] == 0.0
        assert row["mean_power_fs3"] == 0.0

    def test_alternating_signal_replica(self, spark, tmp_path):
        text = "ab" * 30
        _write_documents(
            tmp_path,
            [(0, text, "en", "s1"), (1, "x" * 59, "en", "s1")],
        )
        xs = [ord(ch) for ch in text]
        row = _run(spark, tmp_path, "audio_goertzel_tone_energy")[0]
        assert row["n_docs"] == 1  # the 59-char doc is excluded
        assert row["mean_power_fs6"] == float(_goertzel_int(xs, 1))
        assert row["mean_power_fs4"] == float(_goertzel_int(xs, 0))
        assert row["mean_power_fs3"] == float(_goertzel_int(xs, -1))


def _lz_ks(s):
    c, p = 1, 2
    for j in range(2, len(s) + 1):
        if p > j:
            continue
        if s[p - 1:j] in s[:j - 1]:
            continue
        c += 1
        p = j + 1
    if p <= len(s):
        c += 1
    return c


class TestLempelZiv:
    def test_alternating_series(self, spark, tmp_path):
        # 6h counts [1,2,1,2,1,2] -> bits 010101 -> KS complexity 3
        _write_events(tmp_path, _bucket_events([1, 2, 1, 2, 1, 2]))
        row = _run(spark, tmp_path, "lempel_ziv_complexity_6h")[0]
        assert row["n_symbols"] == 6
        assert row["lz_complexity"] == _lz_ks("010101") == 3

    def test_flat_series(self, spark, tmp_path):
        # constant counts never exceed the mean -> bits 000 -> c = 2
        _write_events(tmp_path, _bucket_events([2, 2, 2]))
        row = _run(spark, tmp_path, "lempel_ziv_complexity_6h")[0]
        assert row["lz_complexity"] == _lz_ks("000") == 2

    def test_random_ish_replica(self, spark, tmp_path):
        counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
        _write_events(tmp_path, _bucket_events(counts))
        mean_n, s_n = sum(counts), len(counts)
        bits = "".join(
            "1" if y * s_n > mean_n else "0" for y in counts
        )
        row = _run(spark, tmp_path, "lempel_ziv_complexity_6h")[0]
        assert row["lz_complexity"] == _lz_ks(bits)


def _write_part_sized(tmp_path, rows):
    """rows: (p_partkey, p_brand, p_size)"""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_name": pa.array(
                [f"part{r[0]}" for r in rows], pa.string()
            ),
            "p_brand": pa.array([r[1] for r in rows], pa.string()),
            "p_type": pa.array(["t" for _ in rows], pa.string()),
            "p_size": pa.array([r[2] for r in rows], pa.int32()),
            "p_retailprice": pa.array(
                [1.0 for _ in rows], pa.float64()
            ),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "part.parquet"))


def _dfa_replica(ys):
    import math

    n, s = len(ys), sum(ys)
    prof, cum = [], 0
    for k, y in enumerate(ys, 1):
        cum += y
        prof.append(n * cum - k * s)
    pts = []
    for m, lx in [(8, 2079441), (16, 2772588), (32, 3465735)]:
        kk = n // m
        if kk < 2:
            continue
        sr6 = 0
        for g in range(kk):
            seg = prof[g * m:(g + 1) * m]
            sp = sum(seg)
            spp = sum(v * v for v in seg)
            sxp = sum((i + 1) * v for i, v in enumerate(seg))
            syy = spp - sp * sp / m
            sxy = sxp - (m + 1) / 2.0 * sp
            rss = (
                (syy - sxy * sxy / (m * (m * m - 1) / 12.0))
                / (n * n) * 1000000.0
            )
            sr6 += math.floor(rss)
        if sr6 <= 0:
            continue
        pts.append(
            (lx, math.floor(math.log(sr6 / (1000000.0 * kk * m)) * 1e6))
        )
    np_, sx = len(pts), sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy_ = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    den = np_ * sxx - sx * sx
    return np_, ((np_ * sxy_ - sx * sy) / den / 2.0 if den else None)


class TestDfa:
    def test_replica_agreement(self, spark, tmp_path):
        ys = [((i * 37) % 11) + 1 for i in range(64)]
        _write_events(
            tmp_path, _bucket_events(ys, hours_per_bucket=1)
        )
        np_, alpha = _dfa_replica(ys)
        row = _run(spark, tmp_path, "dfa_alpha_hourly")[0]
        assert row["n_scales"] == np_ == 3
        assert row["dfa_alpha"] == pytest.approx(alpha, abs=1e-6)


class TestEmbeddingNormOctiles:
    def test_ladder(self, spark, tmp_path):
        rows = [
            (k, [float(k)] + [0.0] * 63, 0) for k in range(1, 10)
        ]
        _write_embeddings(tmp_path, rows)
        out = _run(spark, tmp_path, "embedding_norm_octiles_by_label")
        got = {r["octile"]: r["norm_at_octile"] for r in out}
        # rank (o*8)//8 + 1 = o + 1 -> norm o+1
        assert got == {o: float(o + 1) for o in range(1, 8)}


class TestMsprt:
    def test_hand_computed(self, spark, tmp_path):
        import math

        _write_events(
            tmp_path,
            _ev([(1, 1.0), (1, 2.0), (1, 3.0),
                 (2, 2.0), (2, 3.0), (2, 4.0)]),
        )
        row = _run(spark, tmp_path, "ab_msprt_always_valid")[0]
        zd = -1000.0
        sd2 = (43e6 - 15000.0 ** 2 / 6) / 5 * (2.0 / 3.0)
        ll = -0.5 * math.log(2.0) + zd * zd / (4 * sd2)
        assert row["log_lambda"] == pytest.approx(ll, abs=1e-6)
        assert row["always_valid_p"] == pytest.approx(
            min(1.0, math.exp(-ll)), abs=1e-6
        )


class TestPartSizeMix:
    def test_two_brand_hand_computed(self, spark, tmp_path):
        _write_part_sized(
            tmp_path,
            [(1, "B1", 1), (2, "B1", 2), (3, "B2", 1), (4, "B2", 15)],
        )
        rows = _run(spark, tmp_path, "part_size_mix_chi2_by_brand")
        got = {r["brand"]: r for r in rows}
        assert got["B1"]["df"] == 1
        assert got["B1"]["mix_chi2"] == pytest.approx(
            2.0 / 3.0, abs=1e-6
        )
        assert got["B2"]["mix_chi2"] == pytest.approx(
            2.0 / 3.0, abs=1e-6
        )


class TestCommonNeighborEdgeRate:
    def test_path_vs_triangle(self, spark, tmp_path):
        # path 1-2-3: the (1,3) pair has q=1 and no edge
        _write_events(tmp_path, _graph_events([(1, 2), (2, 3)]))
        row = _run(
            spark, tmp_path, "graph_common_neighbor_edge_rate"
        )[0]
        assert (row["n_common_neighbors"], row["n_pairs"],
                row["n_edged"]) == (1, 1, 0)
        assert row["edge_rate"] == 0.0

    def test_triangle_fully_edged(self, spark, tmp_path):
        _write_events(
            tmp_path, _graph_events([(1, 2), (2, 3), (3, 1)])
        )
        row = _run(
            spark, tmp_path, "graph_common_neighbor_edge_rate"
        )[0]
        assert (row["n_pairs"], row["n_edged"]) == (3, 3)
        assert row["edge_rate"] == 1.0


class TestTemporalGini:
    def test_uniform_zero(self, spark, tmp_path):
        _write_events(
            tmp_path, _bucket_events([2, 2, 2, 2], hours_per_bucket=1)
        )
        row = _run(spark, tmp_path, "temporal_gini_hourly")[0]
        assert row["temporal_gini"] == 0.0

    def test_concentrated(self, spark, tmp_path):
        # hourly [4,0,0,0] (leading bucket non-empty pins the span):
        # sorted 0,0,0,4 -> G = (2*4-5)*4 / (4*4) = 0.75
        _write_events(
            tmp_path, _bucket_events([4, 0, 0, 1], hours_per_bucket=1)
        )
        # the trailing single event keeps hour 3 in-span; series
        # [4,0,0,1]: sorted 0,0,1,4 -> w = (2*3-5)*1 + (2*4-5)*4 = 13
        row = _run(spark, tmp_path, "temporal_gini_hourly")[0]
        assert row["n_hours"] == 4 and row["n_events"] == 5
        assert row["temporal_gini"] == pytest.approx(
            13.0 / 20.0, abs=1e-6
        )


class TestNationRepeatRate:
    def test_hand_computed(self, spark, tmp_path):
        _write_customer(
            tmp_path,
            [(1, "c1", 7, 0.0, "B"), (2, "c2", 7, 0.0, "B")],
        )
        _write_orders(
            tmp_path,
            [
                (0, 1, "O", 10.0, "2024-01-05", "1"),
                (1, 2, "O", 10.0, "2024-01-06", "1"),
                (2, 2, "O", 10.0, "2024-02-06", "1"),
                (3, 2, "O", 10.0, "2024-03-06", "1"),
            ],
        )
        row = _run(spark, tmp_path, "customer_nation_repeat_rate")[0]
        assert (row["n_buyers"], row["n_repeaters"]) == (2, 1)
        assert row["repeat_rate"] == 0.5
        assert row["orders_per_repeater"] == 3.0


class TestMosesExtremeReaction:
    def test_nested_spans(self, spark, tmp_path):
        # arm0 = {2,3} nested inside arm1 = {1,4}: spans 2 vs 4
        _write_events(
            tmp_path, _ev([(1, 1.0), (2, 2.0), (2, 3.0), (1, 4.0)])
        )
        row = _run(spark, tmp_path, "moses_extreme_reaction_arms")[0]
        assert row["span_arm0"] == 2.0 and row["span_arm1"] == 4.0
        assert row["span_ratio_arm0"] == 1.0
        assert row["span_ratio_arm1"] == 2.0


class TestDimRedundancy:
    def test_constructed_correlations(self, spark, tmp_path):
        # dim1 = (1,2,3,4), dim2 = 2*dim1, dim3 reversed, rest zero:
        # pairs (1,2) r=1, (1,3) r=-1, (2,3) r=-1; zero-variance
        # pairs are NULL and fill the tail by the (a, b) tiebreak
        vecs = [
            [1.0, 2.0, 4.0] + [0.0] * 61,
            [2.0, 4.0, 3.0] + [0.0] * 61,
            [3.0, 6.0, 2.0] + [0.0] * 61,
            [4.0, 8.0, 1.0] + [0.0] * 61,
        ]
        _write_embeddings(
            tmp_path, [(i, v, 0) for i, v in enumerate(vecs)]
        )
        rows = _run(
            spark, tmp_path, "embedding_dim_redundancy_pairs"
        )
        assert len(rows) == 10
        got = {(r["dim_a"], r["dim_b"]): r["redundancy_corr"]
               for r in rows}
        assert got[(1, 2)] == 1.0
        assert got[(1, 3)] == -1.0
        assert got[(2, 3)] == -1.0


def test_no_staged_name_collides_with_registry():
    """Round-12 wiring appends STAGED to the live registry — a name
    collision would silently overwrite a registered operator (dict
    assignment) and corrupt the driver window. Guard it now, not at
    wiring time."""
    from eventstreamml_spark import queries as q

    clashes = sorted(set(STAGED) & set(q._REGISTRY))
    assert not clashes, f"staged names already registered: {clashes}"
