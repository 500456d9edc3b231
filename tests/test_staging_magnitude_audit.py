"""Design-point magnitude audit for the 50 STAGED round-12 operators
(the test_int128_magnitude_audit.py discipline, applied BEFORE wiring).

Writing this table surfaced seven genuine scale bugs in the staged set
that sf0.1 parity could never catch (all fixed in the same commit):
welch's variance HAVING multiplied two int128s past 1e38, calinski and
bws squared int128 differences inside int128 (1e66 / 1e49), quade's
b*A' cross term outgrew BIGINT at 1e5 blocks, price_index's v*1000
pre-division product outgrew BIGINT, hodges-lehmann's pair mass
(n1*n0 ~ 2.5e23) needed a division-free int128 rank walk, and the
Lempel-Ziv state encoding base (1e5) collided with the 114-year
design-point series length.

Same design-point domains as the registered audit:
N_EVENTS 1e12, N_USERS 1e9, N_DOCS 1e10, N_HOURS 1e6, N_DAYS 1e5,
VM_MAX 1e9 (micro-grid |value| <= 1e6 contract).
"""

from __future__ import annotations

import pytest

from eventstreamml_spark.staging_r12 import STAGED

INT64 = 2**63 - 1
INT128 = 10**38 - 1

N_EVENTS = 1e12
N_USERS = 1e9
N_DOCS = 1e10
N_HOURS = 1e6
N_SIXH = N_HOURS / 6
N_DAYS = 1e5
VM_MAX = 1e9
VC_MAX = 1e7  # deci-grid |value| <= 1e6 contract
CHARS = 1e14  # corpus characters
USER_ROWS = 1e7  # per-user event bound (icc s*1000 headroom)

# name -> (bound description, worst-case magnitude, capacity)
AUDIT = {
    "wald_wolfowitz_runs_two_sample": (
        "run/arm counts O(N); z floats float-first like runs_test",
        N_EVENTS, INT64),
    "buishand_range_hourly": (
        "n*sk - k*s <= N_HOURS*N", N_HOURS * N_EVENTS, INT64),
    "tukey_fences_outlier_rate_by_type": (
        "fence compare 5*h1d <= 10*VM; ranks <= N",
        max(10 * VM_MAX, N_EVENTS), INT64),
    "stuart_maxwell_first_last_bands": (
        "m_ij*d^2 <= n_users^3 (widened)", N_USERS**3, INT128),
    "snht_changepoint_hourly": (
        "(n*S1 - k*S)^2 <= (N_HOURS*N)^2 (widened)",
        (N_HOURS * N_EVENTS) ** 2, INT128),
    "hodges_lehmann_shift_arms": (
        "pair mass W = n1*n0 and 2cb+2w walk in int128, no division",
        2 * N_EVENTS**2 / 4 * 2, INT128),
    "c3_nonlinearity_6h": (
        "sum y*l1*l2 <= (sum y)^3 (widened)", N_EVENTS**3, INT128),
    "time_reversal_asymmetry_6h": (
        "y^2*l - l^2*y <= 2*(sum y)^3 (widened)",
        2 * N_EVENTS**3, INT128),
    "allan_variance_hourly_rate": (
        "(S_{k+1}-S_k)^2 <= (2N)^2 (widened)", 4 * N_EVENTS**2, INT128),
    "longest_monotone_runs_hourly": (
        "island ids and lengths O(N_HOURS)", N_HOURS, INT64),
    "welch_anova_value_types": (
        "ss = sum vm^2 <= N*VM^2 (widened); variance gate is min<>max",
        N_EVENTS * VM_MAX**2, INT128),
    "quade_test_day_types": (
        "b*A' <= b^2*k*(2b*2k)^2 ~ 2e23 at 1e5 days (widened)",
        N_DAYS**2 * 5 * (2 * N_DAYS * 10) ** 2 / N_DAYS, INT128),
    "good_turing_unseen_mass_by_lang": (
        "token/type counts O(corpus tokens)", CHARS, INT64),
    "mattr_window25_by_lang": (
        "per-doc window contributions <= 25*L; lang micro sums",
        25 * CHARS, INT64),
    "readability_cli_ari_by_lang": (
        "letter/word/sentence sums <= corpus chars", CHARS, INT64),
    "gunning_fog_by_lang": (
        "word/complex-word counts <= corpus tokens", CHARS, INT64),
    "keyness_g2_top_terms": (
        "counts O(tokens); G2 floats from exact ints", CHARS, INT64),
    "vocab_overlap_top_sources": (
        "vocab sizes / intersections O(types)", N_DOCS, INT64),
    "char_bigram_entropy_by_lang": (
        "bigram counts <= corpus chars; c*ln(c) in double",
        CHARS, INT64),
    "v_measure_embedding_partition": (
        "contingency counts <= N_DOCS; entropies in double",
        N_DOCS, INT64),
    "calinski_harabasz_value_types": (
        "diff n*s_j - n_j*S <= 2*N*N*VM in int128; SQUARED IN DOUBLE",
        2 * N_EVENTS * N_EVENTS * VM_MAX, INT128),
    "davies_bouldin_value_types": (
        "ssj <= N*VM^2 (widened); sqrt/ratio in double",
        N_EVENTS * VM_MAX**2, INT128),
    "nri_reclassification_scores": (
        "band-crossing counts O(N)", N_EVENTS, INT64),
    "eval_partial_auc_fpr20": (
        "s2 <= 2*pos*neg (widened MW-U class)",
        2 * N_EVENTS**2 / 2, INT128),
    "cluster_dunn_index_types": (
        "min/max micro values and gaps <= 2*VM", 2 * VM_MAX, INT64),
    "cr_concentration_by_nation": (
        "nation cents <= 4e10 orders * 6e7 cents (TPC-H price cap)",
        4e10 * 6e7, INT64),
    "customer_frequency_migration_halves": (
        "order counts and month indexes", N_EVENTS, INT64),
    "benford_second_digit_totalprice": (
        "digit counts O(N); chi2 floats", N_EVENTS, INT64),
    "price_index_fisher_monthly": (
        "v*1000 pre-division in int128; p*q <= 1e11*1e9 (widened)",
        1e11 * 1e9 * 1e5, INT128),
    "rayleigh_hour_concentration_by_type": (
        "cs^2 <= (N*1e6)^2 (widened)", (N_EVENTS * 1e6) ** 2, INT128),
    "graph_avg_neighbor_degree_profile": (
        "997-node graph: sdeg*1e6 <= 1e12", 1e12, INT64),
    "graph_square_count_c4": (
        "q <= 997; C(q,2) sums over <= 997^2 pairs", 997**4, INT64),
    "embedding_participation_ratio": (
        "c6 <= N_DOCS*1e7; c6^2 (widened)",
        (N_DOCS * 1e7) ** 2, INT128),
    "brunner_munzel_arms": (
        "sum c*(dr-dh)^2 <= 4N^3 (widened)", 4 * N_EVENTS**3, INT128),
    "icc_oneway_user_values": (
        "s*1000 <= user_rows*VM*1e3; n*m6^2 <= N*(VM*1e3)^2 (widened)",
        N_EVENTS * (VM_MAX * 1e3) ** 2, INT128),
    "variance_time_slope_hourly": (
        "block-sum squares <= N^2 (widened); ln micro-grid ints",
        N_EVENTS**2, INT128),
    "clv_heuristic_by_segment": (
        "cents sums <= 4e10*6e7 (TPC-H price cap)", 4e10 * 6e7, INT64),
    "bws_test_arms": (
        "diff n*dr - 2(m+n)i <= 4e24 in int128; SQUARED IN DOUBLE",
        4 * N_EVENTS**2 * 4, INT128),
    "g_test_type_arm_independence": (
        "contingency counts O(N); ln in double", N_EVENTS, INT64),
    "audio_goertzel_tone_energy": (
        "|state| < 2^13 by the 60-sample window; packed < 2^27",
        2**27, INT64),
    "lempel_ziv_complexity_6h": (
        "enc = c*1e7 + p <= 1.7e5*1e7 (1e7 base clears design series)",
        1.7e5 * 1e7, INT64),
    "dfa_alpha_hourly": (
        "spp <= 32*(N_HOURS*N)^2 ~ 3.2e37 (widened, tight)",
        32 * (N_HOURS * N_EVENTS) ** 2, INT128),
    "embedding_norm_octiles_by_label": (
        "q2 = sum x3^2 <= 64*(1e7)^2", 64 * 1e14, INT64),
    "ab_msprt_always_valid": (
        "arm sumsq <= N*VM^2 (widened)", N_EVENTS * VM_MAX**2, INT128),
    "part_size_mix_chi2_by_brand": (
        "part counts and margins", N_DOCS, INT64),
    "graph_common_neighbor_edge_rate": (
        "q <= 997; pair counts <= 997^2", 997**2, INT64),
    "temporal_gini_hourly": (
        "(2i - n - 1)*y <= 2*N_HOURS*N per row (widened)",
        2 * N_HOURS * N_EVENTS, INT128),
    "customer_nation_repeat_rate": (
        "buyer/order counts", N_EVENTS, INT64),
    "moses_extreme_reaction_arms": (
        "doubled midranks <= 4N", 4 * N_EVENTS, INT64),
    "embedding_dim_redundancy_pairs": (
        "cells c6 <= N_DOCS*1e7; covariance ratios in double",
        N_DOCS * 1e7, INT64),
}


def test_audit_covers_every_staged_operator():
    assert sorted(AUDIT) == sorted(STAGED)


@pytest.mark.parametrize(
    "name", [n for n, (_, m, cap) in AUDIT.items() if cap == INT128]
)
def test_int128_bounds_fit_capacity(name):
    _, magnitude, cap = AUDIT[name]
    assert magnitude <= cap, (
        f"{name}: declared int128 bound {magnitude:.3g} exceeds "
        "DECIMAL(38,0) capacity — restructure (square in double / "
        "divide earlier) like calinski/bws"
    )


@pytest.mark.parametrize(
    "name", [n for n, (_, m, cap) in AUDIT.items() if cap == INT64]
)
def test_bigint_bounds_fit_int64(name):
    _, magnitude, cap = AUDIT[name]
    assert magnitude <= cap, (
        f"{name}: BIGINT-declared bound {magnitude:.3g} exceeds 2^63 — "
        "widen to int128 on both engines"
    )


@pytest.mark.parametrize(
    "name", [n for n, (_, m, cap) in AUDIT.items() if cap == INT128]
)
def test_widened_oracle_contains_hugeint(name):
    sql = STAGED[name][1]
    assert "HUGEINT" in sql or "::HUGEINT" in sql, (
        f"{name} declares int128 but its oracle carries no HUGEINT"
    )
