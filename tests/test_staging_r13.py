"""Round-13 staged operator tests (eventstreamml_spark/staging_r13.py).

Same contract as tests/test_staging_r12.py: the staged dict is NOT
registered — these tests drive it directly, replaying each DuckDB
oracle via ``compare`` so every fixture doubles as an engine-parity
check on hand-computable inputs.  When round 13 wires ``STAGED`` into
the registry these tests keep guarding the same semantics.
"""

from __future__ import annotations

import pytest

from eventstreamml_spark.staging_r13 import STAGED
from tests.oracle import compare
from tests.test_round8_ops import _write_events
from tests.test_round8b_ops import _write_orders

pytestmark = pytest.mark.slow  # staged (unregistered) fixture matrix — see test_staging_r12.py


def _run(spark, tmp_path, name):
    fn, sql = STAGED[name]
    compare(spark, str(tmp_path), fn, sql)
    return fn(spark, str(tmp_path)).collect()


def _ev(rows):
    """(user_id, value) pairs to event rows at distinct timestamps."""
    return [
        (i, f"2024-01-01 00:{i:02d}:00", uid, "click", val, "{}")
        for i, (uid, val) in enumerate(rows)
    ]


class TestKuiper:
    def test_interleaved(self, spark, tmp_path):
        # arm1 = {1, 3}, arm0 = {2, 4}: D+ = 1/2 at v=1 and v=3,
        # D- = 0 (F1 >= F0 everywhere), V = 1/2
        _write_events(
            tmp_path, _ev([(1, 1.0), (2, 2.0), (1, 3.0), (2, 4.0)])
        )
        row = _run(spark, tmp_path, "kuiper_test_arms")[0]
        assert row["d_plus"] == 0.5
        assert row["d_minus"] == 0.0
        assert row["kuiper_v"] == 0.5

    def test_crossing_cdfs(self, spark, tmp_path):
        # arm1 = {1, 4}, arm0 = {2, 3}: F1-F0 = 1/2, 0, -1/2, 0
        # -> D+ = D- = 1/2, V = 1 (the shape KS alone underreports)
        _write_events(
            tmp_path, _ev([(1, 1.0), (2, 2.0), (2, 3.0), (1, 4.0)])
        )
        row = _run(spark, tmp_path, "kuiper_test_arms")[0]
        assert row["d_plus"] == 0.5
        assert row["d_minus"] == 0.5
        assert row["kuiper_v"] == 1.0


class TestTukeyQuick:
    def test_clean_separation(self, spark, tmp_path):
        # arm0 = {2, 3}, arm1 = {4, 5}: both arm1 values exceed
        # max(arm0) and both arm0 values undercut min(arm1) -> T = 4
        _write_events(
            tmp_path, _ev([(2, 2.0), (2, 3.0), (1, 4.0), (1, 5.0)])
        )
        row = _run(spark, tmp_path, "tukey_quick_test_arms")[0]
        assert row["t_arm1_high"] == 4.0
        assert row["t_arm0_high"] == 0.0

    def test_boundary_tie_half(self, spark, tmp_path):
        # arm0 = {2, 4}, arm1 = {4, 5}: arm1's 5 exceeds (1), its 4
        # ties max(arm0) (1/2); arm0's 2 undercuts (1), its 4 ties
        # min(arm1) (1/2) -> T = 3
        _write_events(
            tmp_path, _ev([(2, 2.0), (2, 4.0), (1, 4.0), (1, 5.0)])
        )
        row = _run(spark, tmp_path, "tukey_quick_test_arms")[0]
        assert row["t_arm1_high"] == 3.0


class TestGkGamma:
    def test_hand_computed(self, spark, tmp_path):
        # bands (25k wide): 10000->0, 30000->1, 60000->2; cells
        # (0,1) (1,2) (2,5) (0,3): C = 4, D = 1, gamma = 3/5
        _write_orders(
            tmp_path,
            [
                (1, 1, "O", 10000.0, "2024-01-01", "1-URGENT"),
                (2, 1, "O", 30000.0, "2024-01-02", "2-HIGH"),
                (3, 1, "O", 60000.0, "2024-01-03", "5-LOW"),
                (4, 1, "O", 10000.0, "2024-01-04", "3-MEDIUM"),
            ],
        )
        row = _run(spark, tmp_path, "gk_gamma_price_priority")[0]
        assert row["concordant"] == 4.0
        assert row["discordant"] == 1.0
        assert row["gk_gamma"] == 0.6

    def test_all_tied_bands_null(self, spark, tmp_path):
        # every order in band 0: no untied pairs -> gamma NULL
        _write_orders(
            tmp_path,
            [
                (1, 1, "O", 1000.0, "2024-01-01", "1-URGENT"),
                (2, 1, "O", 2000.0, "2024-01-02", "5-LOW"),
            ],
        )
        row = _run(spark, tmp_path, "gk_gamma_price_priority")[0]
        assert row["gk_gamma"] is None


class TestGkLambda:
    def test_hand_computed(self, spark, tmp_path):
        # seg0: 3A+1B, seg1: 2B, seg2: 2A, seg3: 1B (segment =
        # user_id % 4): lambda_t|s = (8-5)/(9-5) = 0.75,
        # lambda_s|t = (5-4)/(9-4) = 0.2, symmetric = 4/9
        rows = []
        spec = [
            (0, ["A", "A", "A", "B"]),
            (1, ["B", "B"]),
            (2, ["A", "A"]),
            (3, ["B"]),
        ]
        i = 0
        for uid, types in spec:
            for t in types:
                rows.append(
                    (i, f"2024-01-01 00:{i:02d}:00", uid, t, 1.0, "{}")
                )
                i += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "gk_lambda_type_segment")[0]
        assert row["n_events"] == 9
        assert row["lambda_type_given_segment"] == 0.75
        assert row["lambda_segment_given_type"] == 0.2
        assert row["lambda_symmetric"] == pytest.approx(4 / 9, abs=1e-6)

    def test_modal_everywhere_zero(self, spark, tmp_path):
        # same type modal in every segment -> lambda_t|s = 0 even
        # though the table is not independent
        rows = []
        i = 0
        for uid, types in [(0, ["A", "A", "B"]), (1, ["A", "A"])]:
            for t in types:
                rows.append(
                    (i, f"2024-01-01 00:{i:02d}:00", uid, t, 1.0, "{}")
                )
                i += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "gk_lambda_type_segment")[0]
        assert row["lambda_type_given_segment"] == 0.0


class TestWeightedKappa:
    def test_hand_computed(self, spark, tmp_path):
        # per-user (first, last) values: (1,1) (2,8) (5,6) (7,3);
        # pooled quartile bounds 1/3/6 -> bands (1,1) (2,4) (3,3)
        # (4,2): kappa_w = 1 - 4*4/20 = 0.2, unweighted = 1/3
        rows = []
        i = 0
        for uid, vals in [(0, [1.0]), (1, [2.0, 8.0]),
                          (2, [5.0, 6.0]), (3, [7.0, 3.0])]:
            for v in vals:
                rows.append(
                    (i, f"2024-01-01 00:{i:02d}:00", uid, "x", v, "{}")
                )
                i += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "weighted_kappa_value_bands")[0]
        assert row["n_users"] == 4
        assert row["kappa_linear"] == pytest.approx(0.2, abs=1e-6)
        assert row["kappa_unweighted"] == pytest.approx(
            1 / 3, abs=1e-6
        )

    def test_perfect_agreement(self, spark, tmp_path):
        # every user stays in its band -> both kappas = 1
        rows = []
        i = 0
        for uid, vals in [(0, [1.0, 1.0]), (1, [5.0, 5.0]),
                          (2, [9.0, 9.0]), (3, [13.0, 13.0])]:
            for v in vals:
                rows.append(
                    (i, f"2024-01-01 00:{i:02d}:00", uid, "x", v, "{}")
                )
                i += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "weighted_kappa_value_bands")[0]
        assert row["kappa_linear"] == 1.0
        assert row["kappa_unweighted"] == 1.0


def _bd_events(strata_cells):
    """strata_cells: {stratum: (a, b, c, d)} -> event rows.  arm 1 =
    odd user, purchase = outcome 1; stratum s lands at hour 6*s."""
    rows = []
    i = 0
    for s, (a, b, c, d) in strata_cells.items():
        for n, uid, typ in (
            (a, 1, "purchase"),
            (b, 1, "click"),
            (c, 2, "purchase"),
            (d, 2, "click"),
        ):
            for _ in range(n):
                rows.append(
                    (
                        i,
                        f"2024-01-01 {6 * s:02d}:{i % 60:02d}:00",
                        uid,
                        typ,
                        1.0,
                        "{}",
                    )
                )
                i += 1
    return rows


class TestBreslowDay:
    def test_homogeneous_strata_zero(self, spark, tmp_path):
        # both strata have OR exactly 2 -> common OR 2, BD chi2 = 0
        _write_events(
            tmp_path,
            _bd_events({0: (2, 1, 1, 1), 1: (4, 2, 1, 1)}),
        )
        row = _run(spark, tmp_path, "breslow_day_or_homogeneity")[0]
        assert row["or_mh"] == 2.0
        assert row["bd_chi2"] == 0.0

    def test_heterogeneous_vs_reference(self, spark, tmp_path):
        # textbook reference computed independently below
        cells = {0: (8, 2, 2, 8), 1: (5, 5, 5, 5)}
        _write_events(tmp_path, _bd_events(cells))
        row = _run(spark, tmp_path, "breslow_day_or_homogeneity")[0]

        import math

        orn = sum(
            a * d / (a + b + c + d) for a, b, c, d in cells.values()
        )
        ord_ = sum(
            b * c / (a + b + c + d) for a, b, c, d in cells.values()
        )
        rr = orn / ord_
        bd = 0.0
        for a, b, c, d in cells.values():
            r1, c1, n = a + b, a + c, a + b + c + d
            qa, qb, qc = (
                1 - rr,
                (n - r1 - c1) + rr * (r1 + c1),
                -rr * r1 * c1,
            )
            if rr == 1:
                ae = r1 * c1 / n
            else:
                disc = math.sqrt(max(qb * qb - 4 * qa * qc, 0))
                roots = [
                    (-qb + disc) / (2 * qa),
                    (-qb - disc) / (2 * qa),
                ]
                ae = next(
                    r
                    for r in roots
                    if max(0, r1 + c1 - n) <= r <= min(r1, c1)
                )
            vinv = (
                1 / ae
                + 1 / (r1 - ae)
                + 1 / (c1 - ae)
                + 1 / (n - r1 - c1 + ae)
            )
            bd += (a - ae) ** 2 * vinv
        assert row["or_mh"] == pytest.approx(rr, abs=1e-6)
        assert row["bd_chi2"] == pytest.approx(bd, abs=1e-5)

    def test_single_stratum_zero(self, spark, tmp_path):
        # one stratum: its expected cell equals the observed cell
        # under the (trivially common) OR -> BD = 0
        _write_events(tmp_path, _bd_events({2: (3, 2, 1, 4)}))
        row = _run(spark, tmp_path, "breslow_day_or_homogeneity")[0]
        assert row["bd_chi2"] == pytest.approx(0.0, abs=1e-9)


class TestCochranC:
    def test_hand_computed(self, spark, tmp_path):
        # A: {1,2,3} s2=1; B: {1,5} s2=8; C: {2,2} s2=0
        # -> C = 8/9, max type B
        rows = []
        i = 0
        for typ, vals in [
            ("A", [1.0, 2.0, 3.0]),
            ("B", [1.0, 5.0]),
            ("C", [2.0, 2.0]),
        ]:
            for v in vals:
                rows.append(
                    (i, f"2024-01-01 00:{i:02d}:00", 1, typ, v, "{}")
                )
                i += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "cochran_c_variance_types")[0]
        assert row["n_types"] == 3
        assert row["max_type"] == "B"
        assert row["cochran_c"] == pytest.approx(8 / 9, abs=1e-6)

    def test_all_constant_null(self, spark, tmp_path):
        # every group variance 0 -> total 0 -> NULL via nullif
        rows = [
            (0, "2024-01-01 00:00:00", 1, "A", 2.0, "{}"),
            (1, "2024-01-01 00:01:00", 1, "A", 2.0, "{}"),
            (2, "2024-01-01 00:02:00", 2, "B", 3.0, "{}"),
            (3, "2024-01-01 00:03:00", 2, "B", 3.0, "{}"),
        ]
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "cochran_c_variance_types")[0]
        assert row["cochran_c"] is None


class TestArchLm:
    def test_hand_computed(self, spark, tmp_path):
        # hourly counts 1,5,2,6 -> |4y-14| = 10,6,6,10; pairs
        # (6,10)(6,6)(10,6): R^2 = 256/1024 = 0.25, LM = 0.75
        rows = []
        i = 0
        for h, cnt in [(0, 1), (1, 5), (2, 2), (3, 6)]:
            for _ in range(cnt):
                rows.append(
                    (
                        i,
                        f"2024-01-01 {h:02d}:{i % 60:02d}:00",
                        1,
                        "x",
                        1.0,
                        "{}",
                    )
                )
                i += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "arch_lm_effect_hourly")[0]
        assert row["n_pairs"] == 3
        assert row["arch_r2"] == 0.25
        assert row["arch_lm"] == 0.75

    def test_constant_deviations_null(self, spark, tmp_path):
        # counts 2,4,2,4 -> all |4y-12| = 4: zero variance -> NULL
        rows = []
        i = 0
        for h, cnt in [(0, 2), (1, 4), (2, 2), (3, 4)]:
            for _ in range(cnt):
                rows.append(
                    (
                        i,
                        f"2024-01-01 {h:02d}:{i % 60:02d}:00",
                        1,
                        "x",
                        1.0,
                        "{}",
                    )
                )
                i += 1
        _write_events(tmp_path, rows)
        row = _run(spark, tmp_path, "arch_lm_effect_hourly")[0]
        assert row["arch_r2"] is None
        assert row["arch_lm"] is None


class TestStagedR13PlanShapes:
    """Every staged operator's physical plan must be free of
    non-broadcast cartesian products at sf0.001 (the staging_r12 gate:
    broadcast nested loops over scalar/bounded relations are the
    accepted idiom; CartesianProduct is the scale killer)."""

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


def test_no_staged_r13_name_collides_with_registry_or_r12():
    """Round-13 wiring appends STAGED to the live registry AFTER the
    round-12 set lands — a collision with either would silently
    overwrite an operator (dict assignment) and corrupt the driver
    window.  Guard it now, not at wiring time."""
    from eventstreamml_spark import queries as q
    from eventstreamml_spark import staging_r12 as r12

    clashes = sorted(
        (set(STAGED) & set(q._REGISTRY))
        | (set(STAGED) & set(r12.STAGED))
    )
    assert not clashes, f"staged r13 names already taken: {clashes}"


def _grid_events(counts, hours_per_bucket=6, start_hour=0):
    """bucket counts -> event rows, one bucket per `hours_per_bucket`
    hours starting 2024-01-01 00:00."""
    rows = []
    i = 0
    for b, cnt in enumerate(counts):
        h = start_hour + b * hours_per_bucket
        for _ in range(cnt):
            rows.append(
                (
                    i,
                    f"2024-01-{1 + h // 24:02d} {h % 24:02d}:"
                    f"{i % 60:02d}:00",
                    1,
                    "x",
                    1.0,
                    "{}",
                )
            )
            i += 1
    return rows


class TestTeagerKaiser:
    def test_single_interior(self, spark, tmp_path):
        # counts 2,3,1 -> psi = 9 - 2*1 = 7
        _write_events(tmp_path, _grid_events([2, 3, 1]))
        row = _run(spark, tmp_path, "teager_kaiser_energy_6h")[0]
        assert row["n_interior"] == 1
        assert row["mean_tk_energy"] == 7.0
        assert row["negative_share"] == 0.0

    def test_mixed_signs(self, spark, tmp_path):
        # counts 1,2,3,6 -> psi = 4-3 = 1, 9-12 = -3: mean -1, 50% neg
        _write_events(tmp_path, _grid_events([1, 2, 3, 6]))
        row = _run(spark, tmp_path, "teager_kaiser_energy_6h")[0]
        assert row["n_interior"] == 2
        assert row["mean_tk_energy"] == -1.0
        assert row["negative_share"] == 0.5


class TestMosum:
    def test_level_shift(self, spark, tmp_path):
        # 24 hours at 1 then 24 hours at 2: single valid t at idx 24,
        # |48 - 24| = 24; s2 = 12/47, stat = 24/sqrt(48*12/47)
        _write_events(
            tmp_path, _grid_events([1] * 24 + [2] * 24, 1)
        )
        row = _run(spark, tmp_path, "mosum_changepoint_hourly")[0]
        assert row["n_hours"] == 48
        assert row["peak_idx"] == 24
        assert row["mosum_max"] == 24
        import math

        expect = 24 / math.sqrt(48 * (12 / 47))
        assert row["mosum_stat"] == pytest.approx(expect, abs=1e-6)

    def test_too_short_empty(self, spark, tmp_path):
        # < 48 hours: no valid window positions -> empty result on
        # both engines
        _write_events(tmp_path, _grid_events([1, 2, 3], 1))
        rows = _run(spark, tmp_path, "mosum_changepoint_hourly")
        assert rows == []


class TestMeanCrossingProfile:
    def test_alternating(self, spark, tmp_path):
        # counts 3,1,3,1,3: signs + - + - + -> 4 crossings, longest
        # above-run 1, total variation 8 -> mean abs change 2
        _write_events(tmp_path, _grid_events([3, 1, 3, 1, 3], 1))
        row = _run(spark, tmp_path, "mean_crossing_profile_hourly")[0]
        assert row["n_hours"] == 5
        assert row["n_crossings"] == 4
        assert row["longest_above"] == 1
        assert row["mean_abs_change"] == 2.0

    def test_run_above(self, spark, tmp_path):
        # counts 1,1,5,5,5,1: signs - - + + + -: 2 crossings,
        # longest above-run 3, tv = 8 -> 1.6
        _write_events(tmp_path, _grid_events([1, 1, 5, 5, 5, 1], 1))
        row = _run(spark, tmp_path, "mean_crossing_profile_hourly")[0]
        assert row["n_crossings"] == 2
        assert row["longest_above"] == 3
        assert row["mean_abs_change"] == 1.6


class TestWesternElectric:
    def test_rule1_spike(self, spark, tmp_path):
        # counts 1,1,1,1,9: only the spike breaches 3 sigma
        # ((32)^2 = 1024 > 9*65); the -8 rows sit just inside 1 sigma
        # (64 < 65)
        _write_events(tmp_path, _grid_events([1, 1, 1, 1, 9]))
        row = _run(spark, tmp_path, "western_electric_rules_6h")[0]
        assert row["n_buckets"] == 5
        assert row["hits_rule1"] == 1
        assert row["hits_rule2"] == 0
        assert row["hits_rule3"] == 0
        assert row["hits_rule4"] == 0

    def test_rule2_two_of_three(self, spark, tmp_path):
        # counts 1,1,1,26,26,1 (nonzero ends keep the grid span):
        # deviations 6y-56 = -50 x3, +100 x2, -50 — every point
        # beyond 2 sigma (1344); only the +100s breach 3 sigma
        # (3024); rule-2 windows fire at idx 3,4 (below) and 5,6
        # (above)
        _write_events(
            tmp_path, _grid_events([1, 1, 1, 26, 26, 1])
        )
        row = _run(spark, tmp_path, "western_electric_rules_6h")[0]
        assert row["hits_rule1"] == 2
        assert row["hits_rule2"] == 4
        assert row["hits_rule3"] == 0
        assert row["hits_rule4"] == 0

    def test_rule4_run_of_eight(self, spark, tmp_path):
        # counts 3 x8 then 1: deviations 9y-25 = +2 x8 then -16 —
        # exactly one full window of 8 same-side points, nothing in
        # the outer zones
        _write_events(
            tmp_path, _grid_events([3] * 8 + [1])
        )
        row = _run(spark, tmp_path, "western_electric_rules_6h")[0]
        assert row["hits_rule1"] == 0
        assert row["hits_rule4"] == 1


class TestDieboldMariano:
    def test_zero_variance_null(self, spark, tmp_path):
        # a single valid term (25-hour span): variance 0 -> DM NULL
        counts = [5] + [0] * 23 + [5]
        _write_events(tmp_path, _grid_events(counts, 1))
        row = _run(spark, tmp_path, "diebold_mariano_forecast_test")[0]
        assert row["n_terms"] == 1
        assert row["mean_loss_diff"] == 5.0
        assert row["dm_stat"] is None

    def test_hand_computed(self, spark, tmp_path):
        # terms d = 5 and 3: DM = 4 / sqrt(2/4) = 5.656854
        counts = [5] + [0] * 23 + [5, 1]
        _write_events(tmp_path, _grid_events(counts, 1))
        row = _run(spark, tmp_path, "diebold_mariano_forecast_test")[0]
        assert row["n_terms"] == 2
        assert row["mean_loss_diff"] == 4.0
        assert row["dm_stat"] == pytest.approx(5.656854, abs=1e-6)
