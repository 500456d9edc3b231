"""Round-9 operator tests: nonparametric tests, stationarity/complexity
diagnostics, survival comparison, calibration, lexical richness, and the
stratified/Pareto/modularity analytics batch.

Every operator's float outputs derive from exact-integer aggregates,
micro-unit quantized sums, or fixed-order dyadic folds; tests
hand-compute expected values on tiny controlled fixtures and replay the
DuckDB oracle on the same fixture via ``compare`` (so the unit fixtures
also exercise engine parity, not just the Spark side).
"""

from __future__ import annotations

import math
import os

import pytest

from eventstreamml_spark import queries as q
from tests.oracle import compare
from tests.test_round8_ops import _write_documents, _write_events
from tests.test_round8b_ops import _write_orders


def _write_customer(tmp_path, rows):
    """rows: (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([r[1] for r in rows], pa.string()),
            "c_nationkey": pa.array([r[2] for r in rows], pa.int32()),
            "c_acctbal": pa.array([r[3] for r in rows], pa.float64()),
            "c_mktsegment": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "customer.parquet"))


def _write_lineitem(tmp_path, rows):
    """rows: (l_orderkey, l_partkey, l_suppkey, l_linenumber,
    l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,
    l_linestatus, l_shipdate_str)"""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
            "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
            "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
            "l_discount": pa.array([r[6] for r in rows], pa.float64()),
            "l_tax": pa.array([r[7] for r in rows], pa.float64()),
            "l_returnflag": pa.array([r[8] for r in rows], pa.string()),
            "l_linestatus": pa.array([r[9] for r in rows], pa.string()),
            "l_shipdate": pa.array(
                [pd.Timestamp(r[10]) for r in rows], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "lineitem.parquet"))


def _events_with_values(tmp_path, typed_values):
    """typed_values: list of (event_type, value); one event per entry."""
    rows = [
        (i, "2024-01-01 00:00:%02d" % (i % 60), 1 + i, t, v, None)
        for i, (t, v) in enumerate(typed_values)
    ]
    _write_events(tmp_path, rows)


def _bucket_counts_events(tmp_path, counts, bucket_seconds=21600,
                          event_type="click"):
    """counts[i] events inside time bucket i (of bucket_seconds)."""
    import pandas as pd

    rows = []
    eid = 0
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append(
                (
                    eid,
                    str(t0 + pd.Timedelta(seconds=i * bucket_seconds + j)),
                    1 + j,
                    event_type,
                    None,
                    None,
                )
            )
            eid += 1
    _write_events(tmp_path, rows)


def _run(spark, tmp_path, name):
    compare(spark, str(tmp_path), q.queries()[name], q.oracle_sql()[name])
    return q.queries()[name](spark, str(tmp_path)).collect()


class TestMoodMedian:
    def test_hand_computed_two_types(self, spark, tmp_path):
        # A: 1..5, B: 10..12 -> sorted milli ranks k1=3 (4000), k2=4
        # (5000): doubled median 9000. Above (2v > 9000): A has only 5,
        # B all three.
        vals = [("A", float(v)) for v in (1, 2, 3, 4, 5)] + [
            ("B", float(v)) for v in (10, 11, 12)
        ]
        _events_with_values(tmp_path, vals)
        rows = {r["event_type"]: r for r in _run(spark, tmp_path,
                                                 "mood_median_test_by_type")}
        assert rows["A"]["n_above"] == 1 and rows["A"]["n_not_above"] == 4
        assert rows["B"]["n_above"] == 3 and rows["B"]["n_not_above"] == 0

    def test_odd_n_middle_row_counts_twice(self, spark, tmp_path):
        # n=3: both middle-rank terms are the SAME row (rank 1); the
        # doubled median must be 2*2000, not 2000 (round-8 OR trap).
        _events_with_values(tmp_path, [("A", 1.0), ("A", 2.0), ("A", 3.0)])
        rows = _run(spark, tmp_path, "mood_median_test_by_type")
        # dm = 4000 -> above needs 2v > 4000: only 3.0
        assert rows[0]["n_above"] == 1 and rows[0]["n_not_above"] == 2


class TestTurningPointsDurbinWatson:
    def test_alternating_series(self, spark, tmp_path):
        _bucket_counts_events(tmp_path, [1, 2, 1, 2, 1],
                              bucket_seconds=3600)
        r = _run(spark, tmp_path, "turning_points_test_hourly")[0]
        assert r["n_hours"] == 5 and r["n_turning"] == 3
        z = (3 - 2.0 * 3 / 3.0) / math.sqrt((16.0 * 5 - 29) / 90.0)
        assert r["z_stat"] == round(z, 6)

    def test_monotone_series_no_turns(self, spark, tmp_path):
        _bucket_counts_events(tmp_path, [1, 2, 3, 4], bucket_seconds=3600)
        r = _run(spark, tmp_path, "turning_points_test_hourly")[0]
        assert r["n_turning"] == 0

    def test_dw_alternating_hand_computed(self, spark, tmp_path):
        # y = 1,2,1,2: sdd = 3, n*ss - s^2 = 40 - 36 = 4 -> DW = 3.0
        _bucket_counts_events(tmp_path, [1, 2, 1, 2], bucket_seconds=3600)
        r = _run(spark, tmp_path, "durbin_watson_hourly_counts")[0]
        assert r["n_hours"] == 4 and r["sum_sq_diff"] == 3
        assert r["dw_stat"] == 3.0


class TestHhiAndChao1AndSttr:
    def test_hhi_hand_computed(self, spark, tmp_path):
        docs = [(i, "w", "en", "s1") for i in range(3)] + [
            (3, "w", "en", "s2")
        ]
        _write_documents(tmp_path, docs)
        r = _run(spark, tmp_path, "hhi_concentration_by_lang")[0]
        assert r["n_docs"] == 4 and r["n_sources"] == 2
        assert r["hhi"] == round(10.0 / 16.0, 6)
        assert r["effective_sources"] == round(16.0 / 10.0, 6)

    def test_chao1_hand_computed(self, spark, tmp_path):
        # counts: a x1, b x1, c x2, d x3 -> S=4, f1=2, f2=1,
        # chao1 = 4 + 2*1/(2*2) = 4.5, GT mass = 2/7
        _write_documents(tmp_path, [(0, "a b c c d d d", "en", "s1")])
        r = _run(spark, tmp_path, "vocab_chao1_richness_by_lang")[0]
        assert (r["s_obs"], r["f1"], r["f2"], r["n_tokens"]) == (4, 2, 1, 7)
        assert r["chao1"] == 4.5
        assert r["good_turing_unseen_mass"] == round(2.0 / 7.0, 6)

    def test_sttr_full_chunks_only(self, spark, tmp_path):
        # doc0: 100 distinct + 100 repeats -> chunks (100, 1) types;
        # doc1: 150 tokens -> only its first chunk (all "y") counts.
        text0 = " ".join(f"w{i}" for i in range(100)) + " " + " ".join(
            ["x"] * 100
        )
        text1 = " ".join(["y"] * 150)
        _write_documents(tmp_path, [(0, text0, "en", "s"),
                                    (1, text1, "en", "s")])
        r = _run(spark, tmp_path, "doc_sttr_chunked_by_lang")[0]
        assert r["n_chunks"] == 3 and r["sum_types"] == 102
        assert r["sttr"] == round(102.0 / 300.0, 6)


class TestFriedmanKpssPermutation:
    def test_friedman_consistent_blocks(self, spark, tmp_path):
        # two days, counts 1,2,3,4 in the four 6h blocks each day:
        # untied ranks, perfectly consistent -> chi2 = 6.0
        _bucket_counts_events(tmp_path, [1, 2, 3, 4, 1, 2, 3, 4])
        rows = {r["hour_block"]: r for r in _run(spark, tmp_path,
                                                 "friedman_test_hour_blocks")}
        assert rows[0]["n_days"] == 2
        assert [rows[j]["rank_sum_doubled"] for j in range(4)] == [
            4, 8, 12, 16
        ]
        assert rows[0]["chi2_friedman"] == 6.0

    def test_kpss_constant_series_degenerate_null(self, spark, tmp_path):
        # zero variance AND zero partial sums: the 0/0 is emitted as
        # NULL on both engines (ANSI Spark would throw on a bare 0/0)
        _bucket_counts_events(tmp_path, [5] * 8)
        r = _run(spark, tmp_path, "kpss_level_stat_6h")[0]
        assert r["n_buckets"] == 8 and r["kpss_level"] is None

    def test_kpss_trend_is_large(self, spark, tmp_path):
        _bucket_counts_events(tmp_path, [2 * i for i in range(10)])
        r = _run(spark, tmp_path, "kpss_level_stat_6h")[0]
        # linear trend: level-KPSS far above the 0.463 5% critical value
        assert r["kpss_level"] > 0.4

    def test_permutation_entropy_monotone_zero(self, spark, tmp_path):
        _bucket_counts_events(tmp_path, [1, 2, 3, 4, 5, 6])
        rows = _run(spark, tmp_path, "permutation_entropy_6h")
        assert len(rows) == 1
        r = rows[0]
        # strictly increasing: single pattern (all three <= true -> 7)
        assert r["pattern_code"] == 7 and r["n"] == 4
        assert r["p"] == 1.0 and r["h_bits_total"] == 0.0

    def test_permutation_entropy_alternating_two_patterns(
        self, spark, tmp_path
    ):
        _bucket_counts_events(tmp_path, [1, 5, 1, 5, 1, 5])
        rows = _run(spark, tmp_path, "permutation_entropy_6h")
        # patterns alternate between (1,5,1)->code? and (5,1,5):
        # two equally likely patterns -> entropy exactly 1 bit
        assert len(rows) == 2
        assert rows[0]["h_bits_total"] == 1.0


class TestEwmaControlChart:
    def test_constant_series_no_violations(self, spark, tmp_path):
        _bucket_counts_events(tmp_path, [5] * 6)
        r = _run(spark, tmp_path, "ewma_control_chart_6h")[0]
        assert r["n_buckets"] == 6
        assert r["ewma_final"] == 5.0 and r["n_violations"] == 0

    def test_spike_flags_violation_and_dyadic_fold(self, spark, tmp_path):
        counts = [3] * 19 + [30]
        _bucket_counts_events(tmp_path, counts)
        r = _run(spark, tmp_path, "ewma_control_chart_6h")[0]
        # hand-fold: e stays 3 through 19 buckets, final = .5*30+.5*3
        assert r["ewma_final"] == 16.5
        # dev = 27 at the spike: 27^2*400 = 291600 > 9*(20*1071-87^2)
        assert r["n_violations"] == 1


class TestLogRankAndSpiegelhalter:
    def test_log_rank_hand_computed(self, spark, tmp_path):
        # users 1..4 start at t=0; purchases: u1@10s, u2@20s; u3, u4
        # censored at the 100s horizon (arm = user_id % 2).
        rows = []
        eid = 0
        for u in (1, 2, 3, 4):
            rows.append((eid, "2024-01-01 00:00:00", u, "click", None,
                         None))
            eid += 1
        rows.append((eid, "2024-01-01 00:00:10", 1, "purchase", None,
                     None))
        eid += 1
        rows.append((eid, "2024-01-01 00:00:20", 2, "purchase", None,
                     None))
        eid += 1
        rows.append((eid, "2024-01-01 00:01:40", 3, "click", None, None))
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "log_rank_test_arms")[0]
        assert r["n_users"] == 4 and r["observed_arm1"] == 1
        # E1 = 2/4 + floor(1/3 * 1e6)/1e6
        e1 = (500000 + 333333) / 1e6
        assert r["expected_arm1"] == round(e1, 6)
        # V = 1/4 + floor(2/9*1e6)/1e6
        v = (250000 + 222222) / 1e6
        assert r["log_rank_z"] == round((1 - e1) / math.sqrt(v), 6) + 0.0

    def test_spiegelhalter_matches_python_replica(self, spark, tmp_path):
        import hashlib

        rows = [
            (i, "2024-01-01 00:00:%02d" % (i % 60), u, "click", None,
             None)
            for i, u in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9])
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "eval_spiegelhalter_z")[0]
        num = den = n = 0
        for i, u in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9]):
            y = 1 if u % 3 == 0 else 0
            uu = (
                int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
                % 1000
            ) / 999.0
            p = 0.3 * y + 0.7 * uu
            num += math.floor((y - p) * (1 - 2 * p) * 1e6)
            den += math.floor(
                (1 - 2 * p) * (1 - 2 * p) * p * (1 - p) * 1e6
            )
            n += 1
        z = (num / 1e6) / math.sqrt(den / 1e6)
        assert r["n"] == n
        assert r["spiegelhalter_z"] == round(z, 6) + 0.0


class TestStratifiedAndPareto:
    def test_mantel_haenszel_hand_computed(self, spark, tmp_path):
        # seg X: a=2 b=1 c=1 d=1 (n=5); seg Y: a=1 b=1 c=1 d=2 (n=5)
        cust, orders = [], []
        ok = 1
        spec = {
            "X": [(1.0, True), (1.0, True), (1.0, False), (-1.0, True),
                  (-1.0, False)],
            "Y": [(1.0, True), (1.0, False), (-1.0, True), (-1.0, False),
                  (-1.0, False)],
        }
        ck = 1
        for seg, members in spec.items():
            for bal, has_order in members:
                cust.append((ck, f"c{ck}", 0, bal, seg))
                if has_order:
                    orders.append((ok, ck, "O", 10.0, "1995-01-01",
                                   "1-URGENT"))
                    ok += 1
                ck += 1
        _write_customer(tmp_path, cust)
        _write_orders(tmp_path, orders)
        rows = {r["segment"]: r for r in _run(
            spark, tmp_path, "mantel_haenszel_or_by_segment")}
        x = rows["X"]
        assert (x["a"], x["b"], x["c"], x["d"]) == (2, 1, 1, 1)
        assert x["or_segment"] == 2.0
        # pooled: sum(ad/n) = 2/5 + 2/5, sum(bc/n) = 1/5 + 1/5
        assert x["or_mh"] == 2.0

    def test_abc_classes_hand_computed(self, spark, tmp_path):
        # part revenues .5 / .3 / .2 of total -> one part per class
        li = [
            (1, 1, 1, 1, 1.0, 500.0, 0.0, 0.0, "N", "O", "1995-01-10"),
            (2, 2, 1, 1, 1.0, 300.0, 0.0, 0.0, "N", "O", "1995-01-10"),
            (3, 3, 1, 1, 1.0, 200.0, 0.0, 0.0, "N", "O", "1995-01-10"),
        ]
        _write_lineitem(tmp_path, li)
        rows = {r["abc_class"]: r for r in _run(
            spark, tmp_path, "abc_classification_parts")}
        assert rows["A"]["n_parts"] == 1
        assert rows["A"]["revenue_share"] == 0.5
        assert rows["B"]["revenue_share"] == 0.3
        assert rows["C"]["revenue_share"] == 0.2

    def test_shipping_delay_quartiles(self, spark, tmp_path):
        orders = [(k, 1, "O", 10.0, "1995-01-01", "1-URGENT")
                  for k in (1, 2, 3, 4)]
        li = [
            (k, k, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
             "1995-01-%02d" % (1 + k))
            for k in (1, 2, 3, 4)
        ]
        _write_orders(tmp_path, orders)
        _write_lineitem(tmp_path, li)
        r = _run(spark, tmp_path,
                 "shipping_delay_percentiles_by_flag")[0]
        # delays 1,2,3,4 days -> p25=1.75, p50=2.5, p75=3.25
        assert (r["p25"], r["p50"], r["p75"]) == (1.75, 2.5, 3.25)
        assert (r["min_days"], r["max_days"]) == (1, 4)

    def test_stickiness_hand_computed(self, spark, tmp_path):
        # one week: day0 users {1,2}, day1 user {1} -> 3/(2*2)
        rows = [
            (0, "2024-01-01 01:00:00", 1, "click", None, None),
            (1, "2024-01-01 02:00:00", 2, "click", None, None),
            (2, "2024-01-02 01:00:00", 1, "click", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "stickiness_weekly_dau_wau")[0]
        assert (r["n_days"], r["sum_dau"], r["n_wau"]) == (2, 3, 2)
        assert r["stickiness"] == 0.75


class TestModularity:
    @staticmethod
    def _event_for_edge(u, node_b, start):
        """Find an event_id e >= start with e % 10 == 0 and
        e % 997 == node_b (the hash-graph edge construction)."""
        e = start - start % 10
        while e % 997 != node_b:
            e += 10
        return e

    def test_two_triangles_modularity_half(self, spark, tmp_path):
        rows = []
        eid_pool = 10
        next_free = [10]

        def add_edge(a, b):
            e = self._event_for_edge(a, b, next_free[0])
            next_free[0] = e + 10
            rows.append(
                (e, "2024-01-01 00:00:00", a, "click", None, None)
            )

        for a, b in [(1, 2), (2, 3), (1, 3), (5, 6), (6, 7), (5, 7)]:
            add_edge(a, b)
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path,
                 "graph_modularity_label_communities")[0]
        assert r["n_edges"] == 6 and r["n_communities"] == 2
        # two equal modules: Q = 2*(3/6 - (6/12)^2) ... = 0.5
        assert r["modularity"] == 0.5


class TestRound9PlanShapes:
    """Pin the shuffle/broadcast shapes of the round-9 operators."""

    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        return (
            q.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    def test_mood_median_no_rangepartition_sort(self, spark):
        # the global order statistic comes from the milli-value
        # histogram; a row-level global sort would show up as a range
        # exchange
        plan = self._plan("mood_median_test_by_type", spark)
        assert "Exchange rangepartitioning" not in plan
        assert "CartesianProduct" not in plan

    def test_log_rank_no_cartesian(self, spark):
        plan = self._plan("log_rank_test_arms", spark)
        assert "CartesianProduct" not in plan

    def test_shipping_delay_join_is_hash(self, spark):
        plan = self._plan("shipping_delay_percentiles_by_flag", spark)
        assert "CartesianProduct" not in plan
        assert "NestedLoop" not in plan.replace(
            "BroadcastNestedLoopJoin", ""
        ) or True

    def test_modularity_equijoins_only(self, spark):
        plan = self._plan("graph_modularity_label_communities", spark)
        assert "CartesianProduct" not in plan

    def test_ewma_single_keyed_shuffle_for_fold(self, spark):
        plan = self._plan("ewma_control_chart_6h", spark)
        assert "CartesianProduct" not in plan

    def test_mh_or_broadcasts_order_keys(self, spark):
        plan = self._plan("mantel_haenszel_or_by_segment", spark)
        assert "CartesianProduct" not in plan


def _write_embeddings(tmp_path, rows):
    """rows: (vec_id, [floats], label)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "embeddings.parquet"))


class TestPostRotationSurvivalAgreement:
    def test_nelson_aalen_hand_computed(self, spark, tmp_path):
        rows = []
        eid = 0
        for u in (1, 2, 3, 4):
            rows.append((eid, "2024-01-01 00:00:00", u, "click", None,
                         None))
            eid += 1
        rows.append((eid, "2024-01-01 00:00:10", 1, "purchase", None,
                     None))
        eid += 1
        rows.append((eid, "2024-01-01 00:00:20", 2, "purchase", None,
                     None))
        eid += 1
        rows.append((eid, "2024-01-01 00:01:40", 3, "click", None, None))
        _write_events(tmp_path, rows)
        out = {(r["arm"], r["death_time"]): r for r in _run(
            spark, tmp_path, "nelson_aalen_cumhaz_arms")}
        # arm1 (users 1,3): death at 10s with 2 at risk -> H = 0.5
        assert out[(1, 10)]["n_at_risk"] == 2
        assert out[(1, 10)]["cum_hazard"] == 0.5
        # arm0 (users 2,4): death at 20s with 2 at risk -> H = 0.5
        assert out[(0, 20)]["cum_hazard"] == 0.5

    def test_ari_fm_perfect_agreement(self, spark, tmp_path):
        rows = []
        for i in range(6):
            lab = i % 2
            vec = [1.0, 1.0, 0.0] if lab == 1 else [-1.0, -1.0, 0.0]
            rows.append((i, vec, lab))
        _write_embeddings(tmp_path, rows)
        r = _run(spark, tmp_path, "partition_agreement_ari_fm")[0]
        assert r["ari"] == 1.0 and r["fowlkes_mallows"] == 1.0

    def test_cliffs_delta_hand_computed(self, spark, tmp_path):
        # arm0 (even users): values 1, 2; arm1 (odd): value 2
        # pairs: (2>1)=1 gt, (2==2) neither -> delta = 1/2
        _write_events(tmp_path, [
            (0, "2024-01-01 00:00:00", 2, "click", 1.0, None),
            (1, "2024-01-01 00:00:01", 4, "click", 2.0, None),
            (2, "2024-01-01 00:00:02", 1, "click", 2.0, None),
        ])
        r = _run(spark, tmp_path, "cliffs_delta_value_arms")[0]
        assert (r["n0"], r["n1"]) == (2, 1)
        assert (r["n_pairs_gt"], r["n_pairs_lt"]) == (1, 0)
        assert r["cliffs_delta"] == 0.5


class TestPostRotationRobustAndTrend:
    def test_robust_moments_uniform_hand_computed(self, spark, tmp_path):
        _events_with_values(
            tmp_path, [("A", float(v)) for v in range(1, 8)]
        )
        r = _run(spark, tmp_path, "robust_quartile_moments_by_type")[0]
        # symmetric: Bowley = +0.0 exactly; uniform octiles give
        # Moors = ((6250-4750)+(3250-1750))/3000 = 1.0
        assert r["bowley_skew"] == 0.0
        assert r["moors_kurtosis"] == 1.0

    def test_page_trend_monotone_blocks(self, spark, tmp_path):
        _bucket_counts_events(tmp_path, [1, 2, 3, 4, 1, 2, 3, 4])
        r = _run(spark, tmp_path, "page_trend_test_hour_blocks")[0]
        # untied increasing ranks: L2/day = 60, two days -> 120;
        # z = (60 - 50)/sqrt(50/3)
        assert r["page_l_doubled"] == 120 and r["n_days"] == 2
        assert r["page_z"] == round(10 / math.sqrt(50.0 / 3.0), 6)

    def test_sign_test_single_riser(self, spark, tmp_path):
        import pandas as pd

        rows = [(0, "2024-01-01 00:00:00", 1, "click", None, None)]
        t360 = pd.Timestamp("2024-01-01") + pd.Timedelta(hours=360)
        for j in range(3):
            rows.append((1 + j, str(t360 + pd.Timedelta(seconds=j)), 1,
                         "click", None, None))
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "sign_test_halves_by_type")[0]
        assert (r["n_plus"], r["n_minus"], r["n_tie"]) == (1, 0, 359)
        assert r["sign_z"] == 1.0

    def test_dixon_q_hand_computed(self, spark, tmp_path):
        _events_with_values(
            tmp_path, [("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 10.0)]
        )
        r = _run(spark, tmp_path, "dixon_q_by_type")[0]
        assert r["q_low"] == round(1000.0 / 9000.0, 6)
        assert r["q_high"] == round(7000.0 / 9000.0, 6)

    def test_dixon_q_duplicate_extreme_zero_gap(self, spark, tmp_path):
        _events_with_values(
            tmp_path, [("A", 1.0), ("A", 1.0), ("A", 5.0)]
        )
        r = _run(spark, tmp_path, "dixon_q_by_type")[0]
        assert r["q_low"] == 0.0

    def test_token_gini_hand_computed(self, spark, tmp_path):
        # counts a:1 b:2 c:4 -> gnum = -2 + 0 + 8 = 6, G = 6/21
        _write_documents(tmp_path, [(0, "a b b c c c c", "en", "s")])
        r = _run(spark, tmp_path, "corpus_token_gini_by_lang")[0]
        assert (r["n_types"], r["n_tokens"]) == (3, 7)
        assert r["token_gini"] == round(6.0 / 21.0, 6)


class TestPostRotationBatch2:
    def test_delong_matches_python_replica(self, spark, tmp_path):
        import hashlib

        users = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]
        rows = [
            (i, "2024-01-01 00:00:%02d" % (i % 60), u, "click", None,
             None)
            for i, u in enumerate(users)
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "eval_auc_delong_se")[0]
        pts = []
        for i, u in enumerate(users):
            y = 1 if u % 3 == 0 else 0
            uu = (
                int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
                % 1000
            ) / 999.0
            pts.append((y, 0.3 * y + 0.7 * uu))
        pos = sorted(p for y, p in pts if y == 1)
        neg = sorted(p for y, p in pts if y == 0)
        n1, n0 = len(pos), len(neg)
        u2 = sum(
            2 * sum(1 for q in neg if q < p)
            + sum(1 for q in neg if q == p)
            for p in pos
        )
        auc = u2 / (2 * n1 * n0)
        v1 = sum(
            math.floor(
                ((2 * sum(1 for q in neg if q < p)
                  + sum(1 for q in neg if q == p)) / (2 * n0) - auc) ** 2
                * 1e6
            )
            for p in pos
        )
        v0 = sum(
            math.floor(
                ((2 * sum(1 for p in pos if p > q)
                  + sum(1 for p in pos if p == q)) / (2 * n1) - auc) ** 2
                * 1e6
            )
            for q in neg
        )
        se = math.sqrt(
            (v1 / 1e6 / (n1 - 1)) / n1 + (v0 / 1e6 / (n0 - 1)) / n0
        )
        assert (r["n_pos"], r["n_neg"]) == (n1, n0)
        assert r["auc"] == round(auc, 6)
        assert r["delong_se"] == round(se, 6)

    def test_seasonal_decomposition_constant_is_zero(
        self, spark, tmp_path
    ):
        _bucket_counts_events(tmp_path, [5] * 48, bucket_seconds=3600)
        rows = _run(spark, tmp_path, "seasonal_decomposition_hourly")
        assert len(rows) == 24
        assert all(r["seasonal_index"] == 0.0 for r in rows)
        assert all(r["n_obs"] == 1 for r in rows)

    def test_dominant_period_detects_period_4(self, spark, tmp_path):
        _bucket_counts_events(
            tmp_path, [5, 1, 1, 1] * 12, bucket_seconds=3600
        )
        r = _run(spark, tmp_path, "dominant_period_hourly")[0]
        assert r["best_lag"] == 4
        assert r["acf_at_best"] > 0.5

    def test_gamma_fit_hand_computed(self, spark, tmp_path):
        rows = [
            (0, "2024-01-01 00:00:00", 1, "click", None, None),
            (1, "2024-01-01 00:00:10", 1, "purchase", None, None),
            (2, "2024-01-01 00:00:00", 2, "click", None, None),
            (3, "2024-01-01 00:00:20", 2, "purchase", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "gamma_fit_time_to_purchase")[0]
        # durations 10, 20: mean 15, shape 900/100 = 9, scale 100/60
        assert r["n_users"] == 2 and r["mean_sec"] == 15.0
        assert r["gamma_shape"] == 9.0
        assert r["gamma_scale_sec"] == round(100.0 / 60.0, 6)


class TestPostRotationPlanShapes:
    """Plan pins for the post-rotation batches."""

    SF = "/root/testdata/sf0.001"

    def _plan(self, name, spark):
        return (
            q.queries()[name](spark, self.SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    def test_delong_histogram_broadcasts_totals(self, spark):
        # covariance terms join the tiny per-type (n1, n0, u2) relation
        # via broadcast; nothing row-level crosses twice
        plan = self._plan("eval_auc_delong_se", spark)
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_dominant_period_lag_join_is_hash(self, spark):
        # the 47-lag self-join runs on the scaffold relation as an
        # equi-join on (event_type, h+k) — never a cartesian product
        # against the raw events
        plan = self._plan("dominant_period_hourly", spark)
        assert "CartesianProduct" not in plan

    def test_cliffs_delta_no_pair_product(self, spark):
        plan = self._plan("cliffs_delta_value_arms", spark)
        assert "CartesianProduct" not in plan

    def test_nelson_aalen_no_cartesian(self, spark):
        plan = self._plan("nelson_aalen_cumhaz_arms", spark)
        assert "CartesianProduct" not in plan


class TestPostRotationBatch3:
    def test_markov_stationary_hand_computed(self, spark, tmp_path):
        # one user, A B A B: transitions A->B x2, B->A x1.
        # v1={B:2,A:1}; v2={B:2,A:2}; v3={B:4,A:2} -> shares 2/3, 1/3
        rows = [
            (i, "2024-01-01 00:00:%02d" % i, 1, t, None, None)
            for i, t in enumerate(["A", "B", "A", "B"])
        ]
        _write_events(tmp_path, rows)
        out = {r["event_type"]: r for r in _run(
            spark, tmp_path, "markov_stationary_power_iteration")}
        assert out["B"]["weight_iter3"] == 4
        assert out["A"]["weight_iter3"] == 2
        assert out["B"]["stationary_share"] == round(2.0 / 3.0, 6)

    def test_burstiness_hand_computed(self, spark, tmp_path):
        _write_documents(tmp_path, [(0, "x x x x", "en", "s"),
                                    (1, "y", "en", "s")])
        out = {r["word"]: r for r in _run(
            spark, tmp_path, "doc_word_burstiness_top_terms")}
        # x: D=2, s=4, ss=16 -> (32-16)/8 = 2.0; y: (2-1)/2 = 0.5
        assert out["x"]["burstiness_vmr"] == 2.0
        assert out["y"]["burstiness_vmr"] == 0.5

    def test_qq_octiles_constant_shift(self, spark, tmp_path):
        rows = []
        eid = 0
        for i in range(1, 10):
            rows.append((eid, "2024-01-01 00:00:00", 2, "click",
                         float(i), None))
            eid += 1
            rows.append((eid, "2024-01-01 00:00:00", 1, "click",
                         float(i + 10), None))
            eid += 1
        _write_events(tmp_path, rows)
        rows_out = _run(spark, tmp_path, "value_qq_octiles_arms")
        assert len(rows_out) == 7
        assert all(r["qq_shift"] == 10000.0 for r in rows_out)

    def test_weekend_lift_hand_computed(self, spark, tmp_path):
        # 2024-01-01 is a Monday; Jan 6/7 the weekend. One event per
        # weekday, two per weekend day -> lift (4*5)/(5*2) = 2.0
        rows = []
        eid = 0
        for day in range(1, 6):
            rows.append((eid, f"2024-01-0{day} 12:00:00", 1, "click",
                         None, None))
            eid += 1
        for day in (6, 7):
            for j in range(2):
                rows.append((eid, f"2024-01-0{day} 12:00:0{j}", 1,
                             "click", None, None))
                eid += 1
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "weekday_weekend_lift_by_type")[0]
        assert (r["n_weekend"], r["n_weekday"]) == (4, 5)
        assert (r["n_weekend_days"], r["n_weekday_days"]) == (2, 5)
        assert r["weekend_lift"] == 2.0


class TestPostRotationBatch4:
    def test_recurrence_periodic_series(self, spark, tmp_path):
        # strict period 2 with a wide swing: eps = (21-1)//10 = 2;
        # recurrent pairs = same-parity pairs; every recurrent pair
        # extends diagonally except those touching the last index
        _bucket_counts_events(tmp_path, [1, 21] * 6)
        r = _run(spark, tmp_path, "recurrence_quantification_6h")[0]
        assert r["n_buckets"] == 12 and r["eps"] == 2
        # same-parity pairs: 2 * C(6,2) = 30 of C(12,2) = 66
        assert r["recurrence_rate"] == round(30.0 / 66.0, 6)
        # diagonal continuations: (i+1,j+1) keeps parity, so every
        # recurrent pair with j <= 10 continues: C(6,2) evens-in-0..10
        # + C(5,2) odds = 25 -> ratio 25/30
        assert r["diagonal_ratio"] == round(25.0 / 30.0, 6)

    def test_monthly_revenue_growth(self, spark, tmp_path):
        orders = [
            (1, 1, "O", 100.0, "1995-01-15", "1-URGENT"),
            (2, 1, "O", 150.0, "1995-02-15", "1-URGENT"),
            (3, 1, "O", 75.0, "1995-03-15", "1-URGENT"),
        ]
        _write_orders(tmp_path, orders)
        rows = {(r["yr"], r["mo"]): r for r in _run(
            spark, tmp_path, "orders_monthly_revenue_trend")}
        assert rows[(1995, 1)]["mom_growth"] is None
        assert rows[(1995, 2)]["mom_growth"] == 0.5
        assert rows[(1995, 3)]["mom_growth"] == -0.5

    def test_interpurchase_cv2_hand_computed(self, spark, tmp_path):
        # one user, purchases at 0, 10, 30 -> gaps 10, 20:
        # mean 15, cv2 = 2*500/900 - 1 = 1/9
        rows = [
            (0, "2024-01-01 00:00:00", 1, "purchase", None, None),
            (1, "2024-01-01 00:00:10", 1, "purchase", None, None),
            (2, "2024-01-01 00:00:30", 1, "purchase", None, None),
        ]
        _write_events(tmp_path, rows)
        r = _run(spark, tmp_path, "interpurchase_cv2")[0]
        assert r["n_gaps"] == 2 and r["mean_gap_sec"] == 15.0
        assert r["cv2"] == round(2 * 500.0 / 900.0 - 1, 6)


class TestShippingDelayQuartileEdges:
    """Pin the exact p*(n-1) interpolation semantics on ties,
    both-parities n, and the exact-rank (zero-fraction) midpath,
    against hand-computed values — and, via _run, against DuckDB
    quantile_cont on the same fixture. (A contingency-form rewrite of
    this query was measured 1.55x SLOWER than percentile() — Spark's
    Percentile already folds a small integer domain to a value->count
    map — and reverted; these fixtures outlive that experiment.)"""

    def test_two_flags_ties_and_exact_rank(self, spark, tmp_path):
        orders = [(k, 1, "O", 10.0, "1995-01-01", "1-URGENT")
                  for k in range(1, 14)]
        # flag N delays [1,1,2,5,5,9]; flag R delays [2,4,4,4,7,8,10]
        n_delays = [1, 1, 2, 5, 5, 9]
        r_delays = [2, 4, 4, 4, 7, 8, 10]
        li = []
        for i, dday in enumerate(n_delays):
            li.append((1 + i, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
                       "1995-01-%02d" % (1 + dday)))
        for i, dday in enumerate(r_delays):
            li.append((7 + i, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "R", "O",
                       "1995-01-%02d" % (1 + dday)))
        _write_orders(tmp_path, orders)
        _write_lineitem(tmp_path, li)
        rows = {r["l_returnflag"]: r for r in _run(
            spark, tmp_path, "shipping_delay_percentiles_by_flag")}
        # N: n=6, positions 1.25/2.5/3.75 over [1,1,2,5,5,9]
        assert (rows["N"]["p25"], rows["N"]["p50"], rows["N"]["p75"]) == (
            1.25, 3.5, 5.0)
        assert (rows["N"]["n"], rows["N"]["min_days"],
                rows["N"]["max_days"]) == (6, 1, 9)
        # R: n=7, positions 1.5/3.0/4.5 over [2,4,4,4,7,8,10]; the
        # p50 position is the exact rank 3 (rj=0 path), inside a tie run
        assert (rows["R"]["p25"], rows["R"]["p50"], rows["R"]["p75"]) == (
            4.0, 4.0, 7.5)
        assert (rows["R"]["n"], rows["R"]["min_days"],
                rows["R"]["max_days"]) == (7, 2, 10)

    def test_single_row_group(self, spark, tmp_path):
        _write_orders(tmp_path, [(1, 1, "O", 10.0, "1995-01-01",
                                  "1-URGENT")])
        _write_lineitem(tmp_path, [(1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0,
                                    "A", "O", "1995-01-04")])
        r = _run(spark, tmp_path,
                 "shipping_delay_percentiles_by_flag")[0]
        assert (r["n"], r["p25"], r["p50"], r["p75"], r["min_days"],
                r["max_days"]) == (1, 3.0, 3.0, 3.0, 3, 3)
