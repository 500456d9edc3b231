"""Systematic int128 magnitude audit (round-11, per round-10 VERDICT #3).

Every exact-integer statistic in the registry is enumerated here with
its worst-case intermediate magnitude at the 100-TB design point and
the integer capacity it is declared to ride.  The audit has two teeth:

1. A pure-arithmetic check that the declared worst-case bound actually
   fits the declared capacity (INT64 = 2^63-1 for BIGINT paths,
   INT128 = 10^38-1 for the DECIMAL(38,0)/HUGEINT-widened paths).
2. For every WIDENED statistic, a source-level check that the widening
   is really there on BOTH engines: the composed DuckDB oracle contains
   HUGEINT and the Spark plan carries decimal(38,0) arithmetic.

Design-point domains (the 100x-at-least scale the engine must survive,
see CLAUDE.md "int128-widening rule"):

- N_EVENTS = 1e12 raw event rows (100 TB of events)
- N_USERS  = 1e9 distinct subjects
- N_DOCS   = 1e10 documents / embedding rows
- N_HOURS  = 1e6 zero-filled hourly buckets (~114 years)
- N_DAYS   = 1e5 daily buckets (~274 years)
- VM_MAX   = 1e9 milli-value digest magnitude (|value| <= 1e6 contract)
- MICRO    = 1e6-quantized bounded statistics (|stat| <= ~1e3 -> 1e9/row)

A statistic whose bound exceeds INT64 at these domains MUST be widened;
one that fits with margin is documented here so the next 10x re-audit
is a one-line change, not an archaeology dig.
"""

from __future__ import annotations

import pytest

INT64 = 2**63 - 1
INT128 = 10**38 - 1  # DECIMAL(38,0) capacity; HUGEINT holds ~1.7e38

N_EVENTS = 1e12
N_USERS = 1e9
N_DOCS = 1e10
N_HOURS = 1e6
N_DAYS = 1e5
VM_MAX = 1e9
MICRO = 1e6
GAP_SEC = 3e9  # ~95 years, max single inter-event gap in seconds

SF = "/root/testdata/sf0.001"

# name -> (bound description, worst-case magnitude, capacity)
# capacity INT128 == the statistic is int128-widened on both engines.
AUDIT = {
    # --- N^3-magnitude doubled-rank statistics (round-10 widening) ---
    "cramer_von_mises_value_arms": (
        "sum(3*c*a^2), a <= 2N", 12 * N_EVENTS**3, INT128),
    "mood_scale_rank_test_arms": (
        "sum(c1*dev^2), |dev| <= 2N", 4 * N_EVENTS**3, INT128),
    "wilcoxon_signed_rank_halves": (
        "2n(n+1)(2n+1) and sum(t^3), n = pairs", 5 * N_USERS**3, INT128),
    # --- N^4 contingency variance (round-11) ---
    "cochran_armitage_trend": (
        "rr(nn-rr)(nn*sw2n - swn^2) ~ N^4", N_USERS**4, INT128),
    # --- nn-scaled centered second moments: sum((n*y - S)^2) <= n^2*N^2
    "integrated_autocorrelation_time_hourly": (
        "sum(d^2), d = nn*y - S", N_HOURS**2 * N_EVENTS**2, INT128),
    "ar2_yule_walker_hourly": (
        "sum(e*e_k), e = nn*y - S", N_HOURS**2 * N_EVENTS**2, INT128),
    "ljung_box_hourly_whiteness": (
        "ACF sums s0..s5, d = n*x - T", N_HOURS**2 * N_EVENTS**2, INT128),
    "pacf_hourly_durbin_levinson": (
        "ACF sums s0..s5 (shared substrate)",
        N_HOURS**2 * N_EVENTS**2, INT128),
    "dominant_period_hourly": (
        "s0/sk autocovariances, x = n*y - T",
        N_HOURS**2 * N_EVENTS**2, INT128),
    # kpss: adversarial worst case n^3*N^2 passes even int128 once the
    # 6h-bucket count exceeds ~5e4 (~34 years) at N=1e12 — the 6h
    # coarsening plus a <=30-year span is the DECLARED domain here.
    "kpss_level_stat_6h": (
        "sum((n*P_t - t*s)^2) <= n^3*N^2, n <= 4.4e4 6h buckets (30y)",
        (4.4e4) ** 3 * N_EVENTS**2, INT128),
    "hurst_rs_exponent": (
        "64*(128*x)^2 per window, x = hourly count",
        64 * (128 * N_EVENTS / N_HOURS) ** 2, INT128),
    # --- squared count / digest / gap sums ---
    "event_rate_dispersion_by_type": (
        "sum(c^2) + n_hours*sum(c^2)",
        N_HOURS * (N_EVENTS / N_HOURS) ** 2 * N_HOURS, INT128),
    "negative_binomial_fit_by_type": (
        "sum(x^2), x = hourly count",
        N_HOURS * (N_EVENTS / N_HOURS) ** 2, INT128),
    "durbin_watson_hourly_counts": (
        "n*ss - s^2 <= n*sum(y^2)", N_HOURS**2 * (N_EVENTS / N_HOURS) ** 2,
        INT128),
    "ewma_control_chart_6h": (
        "9*(n*ss - s^2)", 9 * (N_HOURS / 6) ** 2
        * (6 * N_EVENTS / N_HOURS) ** 2, INT128),
    "grubbs_statistic_by_type": (
        "sum(vm^2) and per-row n*vm", N_EVENTS * VM_MAX**2, INT128),
    # bartlett's ni*qi is N^2*vm^2: int128 requires N*vm <= 1e19, i.e.
    # |value| <= 1e3 at N=1e12 (or <= 1e6 at N=1e9) — the declared
    # milli-digest domain for the variance-homogeneity family
    "bartlett_test_value_by_type": (
        "ni*qi = N^2*vm^2, vm <= 1e6 (|value| <= 1e3) at N=1e12",
        N_EVENTS**2 * MICRO**2, INT128),
    "lognormal_fit_ks_by_type": (
        "sum(lq^2), lq = micro-log <= ~3e7", N_EVENTS * (3e7) ** 2, INT128),
    "extreme_value_gumbel_fit": (
        "sum(mx^2), mx = block-max price int", N_DAYS * (1e10) ** 2, INT128),
    "gamma_fit_time_to_purchase": (
        "n*ss - s^2, ss = sum(d^2) seconds", N_USERS**2 * GAP_SEC**2,
        INT128),
    "interpurchase_cv2": (
        "sum(d^2) over gaps", N_EVENTS * GAP_SEC**2, INT128),
    "hhi_concentration_by_lang": (
        "sum(n^2) per lang, n = docs/source", N_DOCS**2, INT128),
    "subject_count_gini": (
        "sum(i*x) <= n_users*N + (n+1)*sx", 2 * N_USERS * N_EVENTS, INT128),
    "ab_delta_method_ratio_se": (
        "sum(x^2), x = per-user milli-value", N_USERS * (1e9) ** 2, INT128),
    # --- n-scaled centered cross moments over the hour grid ---
    "partial_correlation_hourly_types": (
        "n*sxx - sx^2 <= 2n^2*max(x)^2*n",
        2 * N_HOURS**2 * (N_EVENTS / N_HOURS) ** 2, INT128),
    "granger_lag1_clicks_to_purchases": (
        "n*wyy - wy^2 (same class)",
        2 * N_HOURS**2 * (N_EVENTS / N_HOURS) ** 2, INT128),
    # --- O(N^2) pair counts over raw-value histograms ---
    "jonckheere_terpstra_hour_trend": (
        "JT2 <= 2N^2; E = sum n_i*n_j", 2 * N_EVENTS**2, INT128),
    "cliffs_delta_value_arms": (
        "gt/lt = sum(c1*c0_cum) <= N^2", N_EVENTS**2, INT128),
    "distribution_distance_arms": (
        "sum|c0*n1 - c1*n0| <= 2N^2", 2 * N_EVENTS**2, INT128),
    "bowker_symmetry_transitions": (
        "(n_ab - n_ba)^2 <= N^2", N_EVENTS**2, INT128),
    "eval_auc_delong_se": (
        "u2 = sum(c1*(2*c0_below+c0)) <= 2N^2", 2 * N_EVENTS**2, INT128),
    "partition_agreement_ari_fm": (
        "doubled pair counts n(n-1) <= N^2", N_DOCS**2, INT128),
    "haar_wavelet_energy_hourly": (
        "sum(D^2)*scale, D <= block event total",
        32 * N_HOURS / 2 * (32 * N_EVENTS / N_HOURS) ** 2, INT128),
    # --- round-10 micro-log moment widenings (already DECIMAL/HUGEINT)
    "weibull_fit_interpurchase": (
        "squared micro-log moments", N_EVENTS * (1e8) ** 2, INT128),
    "price_quantity_elasticity_by_brand": (
        "squared micro-log moments", N_EVENTS * (1e8) ** 2, INT128),
    # --- round-11 batch E two-sample tests (doubled-rank N^3 class) ---
    "cucconi_test_arms": (
        "3*sum(c1*dr^2) + 2*n1*(N+1)*(2N+1), dr <= 2N+1",
        16 * N_EVENTS**3, INT128),
    "lepage_test_arms": (
        "asq256 = sum(floor(ds2^2/(4t)*256)) <= 64*N^3; per-group terms "
        "pass 2^63, so the Spark side uses the guarded _floor_big_sql "
        "(plain floor(DOUBLE) saturates at Long.MAX)",
        64 * N_EVENTS**3, INT128),
    "ansari_bradley_scale_arms": (
        "micro score sum <= n1*(N+1)/2*1e6 (guarded floor on Spark, "
        "HUGEINT sum in the oracle)",
        N_EVENTS**2 / 2 * MICRO, INT128),
    "fligner_policello_arms": (
        "sum(c1*dP^2), dP <= 2N doubled placements",
        4 * N_EVENTS**3, INT128),
    "energy_distance_arms": (
        "sum(c*(vm*cum - sum_below)) <= 2*N^2*vm",
        2 * N_EVENTS**2 * MICRO, INT128),
    "gini_mean_difference_by_type": (
        "sum(cnt*(2cb+cnt-n)*vm) <= N^2*vm", N_EVENTS**2 * MICRO, INT128),
    # --- round-11 batch F ---
    "eval_somers_d_by_type": (
        "concordant/discordant pair sums <= N^2", N_EVENTS**2, INT128),
    "cronbach_alpha_hour_types": (
        "sum_items(nb*sxx) <= nb*N^2 (sum of sxx <= (sum x)^2 = N^2)",
        (N_HOURS / 6) * N_EVENTS**2, INT128),
    # --- round-11 batch G ---
    "demand_adi_cv2_brand": (
        "w*sq2 <= 2500*N^2 (single-part worst case, q <= 50*fan) and "
        "49*sq^2 <= 49*(50N)^2", 49 * (50 * N_EVENTS) ** 2, INT128),
}

# Exact-integer statistics that remain BIGINT by a DOCUMENTED domain
# bound.  bound < INT64 is asserted; if a future re-audit raises the
# domain, the assertion fires and the operator must be widened.
BIGINT_SAFE = {
    "mann_kendall_hourly_by_type": (
        "2n^3 tie/variance terms over the per-type HOURLY series; the "
        "O(hours^2) pair join binds long before the integer bound",
        2 * N_HOURS**3 + N_HOURS**3),
    "pettitt_changepoint_hourly": (
        "U_t <= 2*hours^2 + hours^2 over doubled hour-grid midranks",
        3 * N_HOURS**2 * 4),
    "friedman_test_hour_blocks": (
        "doubled rank sums over 24 blocks x days; sq <= 24*(48*days)^2",
        24 * (48 * N_DAYS) ** 2),
    "page_trend_test_hour_blocks": (
        "L2 = sum((bkt+1)*dr) <= 4*48*days", 4 * 48 * N_DAYS),
    "cochran_q_daily_types": (
        "presence matrix is days x 5 types; (k*G - S)^2 <= (5*days)^2",
        5 * (5 * N_DAYS) ** 2),
    "sign_test_halves_by_type": ("plus/minus/tie counts O(N)", N_EVENTS),
    "mood_median_test_by_type": (
        "above/below counts and doubled medians O(N + vm)",
        N_EVENTS + 2 * VM_MAX),
    "fisher_exact_purchase_cohort": (
        "odds-ratio cross products a*d <= n_users^2/4", N_USERS**2 / 4),
    "mantel_haenszel_or_by_segment": (
        "per-stratum b*c <= (users/stratum)^2", N_USERS**2 / 4),
    "theil_sen_trend_by_subject": (
        "slopes ride round(x,9) doubles; integer parts are hour indexes",
        N_HOURS),
    "runs_test_hourly_randomness": (
        "2.0*n1*n2 runs in DOUBLE (float-first), counts O(hours)",
        N_HOURS),
    "gastwirth_location_by_type": (
        "order-stat rank picks (cb, n <= N) and 10x milli-value sums",
        N_EVENTS + 20 * MICRO),
    "lineitem_sla_attainment_monthly": (
        "sum(delay_days) <= N * 1e5-day pathological delay",
        N_EVENTS * 1e5),
    "supplier_workload_concentration": (
        "per-supplier counts, ranks, doubled median <= 2N",
        2 * N_EVENTS),
    "graph_reciprocity_transitions": (
        "edge weights and min-weight sums <= N", N_EVENTS),
    "jackknife_ratio_variance": (
        "q = micro leave-one-out ratio (bounded ~1e9); sum(q^2) over "
        "users ~ 1e9*(1e9)^2 would overflow -> q^2 sums must stay "
        "double-checked if users >> 1e5; current q is micro-DELTA "
        "(bounded ~1e6): users*(1e6)^2", N_USERS * MICRO**2 / 1e7),
}


class TestMagnitudeBounds:
    def test_int128_bounds_fit_capacity(self):
        for name, (desc, bound, cap) in AUDIT.items():
            assert bound <= cap, (
                f"{name}: {desc} -> {bound:.3e} exceeds declared "
                f"capacity {cap:.3e}"
            )

    def test_int128_entries_genuinely_exceed_bigint(self):
        # every widened entry must be at least within two decades of
        # the BIGINT cliff at the design point (margin-motivated
        # widening like hurst's 64*(128*x)^2 is allowed; an entry far
        # below the cliff belongs in BIGINT_SAFE instead)
        for name, (desc, bound, cap) in AUDIT.items():
            if cap == INT128:
                assert bound > INT64 / 100, (
                    f"{name}: {desc} -> {bound:.3e} is far inside "
                    "BIGINT; move to BIGINT_SAFE"
                )

    def test_bigint_safe_bounds_fit_int64(self):
        for name, (desc, bound) in BIGINT_SAFE.items():
            assert bound <= INT64, (
                f"{name}: {desc} -> {bound:.3e} no longer fits BIGINT — "
                "widen it to int128 (DECIMAL(38,0)/HUGEINT)"
            )


class TestWideningPresentInBothEngines:
    """The declared widening must exist in the actual code, not just in
    this table: HUGEINT in the composed DuckDB oracle, decimal(38,0)
    (or an all-double formulation) in the analyzed Spark plan."""

    @pytest.fixture(scope="class")
    def oracles(self):
        from eventstreamml_spark import queries as q

        return q.oracle_sql()

    @pytest.mark.parametrize("name", sorted(AUDIT))
    def test_oracle_contains_hugeint(self, oracles, name):
        sql = oracles[name]
        assert "HUGEINT" in sql, f"{name}: oracle lacks HUGEINT widening"

    @pytest.mark.parametrize("name", sorted(AUDIT))
    def test_spark_plan_contains_decimal38(self, spark, name):
        from eventstreamml_spark import queries as q

        plan = (
            q.queries()[name](spark, SF)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        assert "decimal(38,0)" in plan, (
            f"{name}: Spark plan lacks decimal(38,0) int128 arithmetic"
        )
