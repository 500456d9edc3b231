"""Round-8 regression + new-operator tests.

Opens with the round-7 driver red row: ``theil_sen_trend_by_subject``
emitted ``-0.0`` (Spark ``F.round`` → ``+0.0``, DuckDB ``round()`` →
``-0.0`` for a tiny-negative median slope); the driver's hasher
distinguishes the two. Fixed by appending ``+ 0.0`` after the 6dp round
on BOTH engines (IEEE: ``-0.0 + 0.0 == +0.0``).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


class TestTheilSenSignedZero:
    def test_tiny_negative_median_slope_is_positive_zero(self, spark):
        """A median slope of -1e-10/sec rounds to zero at the 6dp
        micro-unit grid; the output must be +0.0, not -0.0."""
        from eventstreamml_spark.operators.stats import theil_sen_trend

        # values decrease by 1e-4 over 1000s -> slope -1e-7/sec
        # -> slope_per_sec = round(-0.1, 6)... that's nonzero. Use a
        # slope small enough that round(slope*1e6, 6) == -0.0:
        # slope = -1e-13/sec -> *1e6 = -1e-7 -> round(.,6) = -0.0.
        rows = [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:16:40", 1.0 - 1e-10),
            (1, "2024-01-01 00:33:20", 1.0 - 2e-10),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
        )
        r = theil_sen_trend(df, "user_id", "ts", "value").collect()[0]
        v = r["slope_per_sec"]
        assert v == 0.0
        assert math.copysign(1.0, v) > 0, f"signed zero leaked: {v!r}"

    def test_duckdb_oracle_sign_normalized(self):
        """The oracle SQL must carry the same `+ 0.0` normalization —
        DuckDB preserves -0.0 through round() without it."""
        import duckdb

        conn = duckdb.connect()
        raw, fixed = conn.execute(
            "SELECT round(-1e-7, 6), round(-1e-7, 6) + 0.0"
        ).fetchone()
        conn.close()
        assert math.copysign(1.0, raw) < 0  # the trap is real
        assert math.copysign(1.0, fixed) > 0

    def test_registry_oracle_contains_normalization(self):
        from eventstreamml_spark import queries as q

        sql = q.oracle_sql()["theil_sen_trend_by_subject"]
        assert "+ 0.0 AS slope_per_sec" in sql


class TestComparatorSignExactness:
    def test_norm_cell_distinguishes_signed_zero(self):
        from tests.oracle import _norm_cell

        assert _norm_cell(0.0) != _norm_cell(-0.0)
        assert _norm_cell(0.0) == 0.0
