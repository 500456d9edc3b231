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
