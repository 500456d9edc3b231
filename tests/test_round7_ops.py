"""Round-7 regression pins for the round-6 ADVICE findings: engine
rounding-mode and degenerate-guard mismatches that agree on the driver
fixtures by coincidence but diverge on ragged / all-constant / near-
tied data (DuckDB CAST-to-BIGINT rounds while Spark cast truncates;
eta_sq's denominator can cancel to a tiny negative; BH-FDR ranks were
ulp-dependent).

Each test either writes a tiny synthetic parquet table that HAS the
edge and runs the full Spark-vs-DuckDB compare on it, or pins the
operator's degenerate-case contract directly.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from eventstreamml_spark import queries as q
from tests.oracle import compare


class TestCentroidDriftRaggedFloor:
    def test_ragged_embeddings_floor_both_engines(self, spark, tmp_path):
        # Ragged lengths make sum(n)/count(DISTINCT dim) fractional
        # (old half: one 3-dim + one 2-dim vector over 3 distinct dims
        # -> 5/3): DuckDB CAST(.. AS BIGINT) rounds to nearest while
        # Spark .cast("long") truncates, so without the explicit floor
        # n_old would read 2 vs 1.  The full compare pins the floor.
        vecs = [
            (0, [1.0, 2.0, 3.0], 0),
            (2, [4.0, 5.0], 0),
            (1, [2.0, 1.0, 0.5], 1),
            (3, [0.5, 1.5], 1),
            (5, [1.0, 1.0, 2.0], 1),
        ]
        table = pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([v[2] for v in vecs], pa.int32()),
            }
        )
        pq.write_table(table, os.path.join(tmp_path, "embeddings.parquet"))
        name = "embedding_centroid_drift"
        compare(spark, str(tmp_path), q.queries()[name], q.oracle_sql()[name])


class TestAnovaDegenerateEtaSq:
    def test_constant_data_nulls_eta_sq(self, spark):
        # All-constant values: SSB + SSW cancels to ~0 (float noise can
        # leave it a hair NEGATIVE).  The oracle's strict > 0 CASE
        # emits NULL; the Spark side must mirror it rather than emit a
        # noise ratio through try_divide.
        from eventstreamml_spark.operators.stats import anova_oneway

        rows = [(g, 0.1) for g in ("a", "b", "c") for _ in range(7)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = anova_oneway(df, "g", "v").collect()[0]
        assert r["eta_sq"] is None

    def test_brown_forsythe_constant_data(self, spark):
        from eventstreamml_spark.operators.stats import brown_forsythe

        rows = [(g, 2.5) for g in ("a", "b") for _ in range(5)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = brown_forsythe(df, "g", "v").collect()[0]
        # |x - median| == 0 everywhere -> degenerate by construction
        assert r[3] is None  # eta_sq twin column


class TestRidgeSingularRowParity:
    def test_singular_case_emits_exactly_one_null_row(self, spark):
        # The oracle now emits the NULL-coefficient row via
        # nullif(det, 0) instead of dropping it (WHERE det <> 0), so
        # the Spark side's 1-row contract is the shared contract: a
        # singular system is one row of NULLs, never zero rows.
        from eventstreamml_spark.operators.stats import ridge_regression_3f

        rows = [(float(i), float(i), 2.0 * i, 1.0) for i in range(20)]
        df = spark.createDataFrame(
            rows, "y double, x1 double, x2 double, x3 double"
        )
        out = ridge_regression_3f(df, "y", ("x1", "x2", "x3"), lam=0.0).collect()
        assert len(out) == 1
        assert out[0]["beta_1"] is None and out[0]["beta_2"] is None

    def test_ridge_oracle_keeps_singular_row(self, spark):
        import duckdb

        sql = q.oracle_sql()["ridge_regression_price"]
        assert "nullif(det, 0)" in sql and "det <> 0" not in sql


class TestBhFdrGridStableRanks:
    def test_sub_grid_ties_rank_by_id(self, spark):
        # Two p-values 1e-12 apart collapse onto the same 9dp grid
        # point, so the rank must come from the id tiebreak — the exact
        # situation where an exp/ln ulp between libm and the JVM would
        # otherwise swap rank_i between engines.
        from eventstreamml_spark.operators.stats import bh_fdr

        df = spark.createDataFrame(
            [("b", 0.1), ("a", 0.1 + 1e-12), ("c", 0.5)],
            "test_id string, p double",
        )
        rows = {r["test_id"]: r for r in bh_fdr(df, "test_id", "p").collect()}
        assert rows["a"]["rank_i"] == 1  # id tiebreak, not the raw ulp
        assert rows["b"]["rank_i"] == 2
        assert rows["c"]["rank_i"] == 3
        # p_adj arithmetic also runs on the 9dp grid: both ties give
        # m * 0.1 / i with the SAME rounded p
        assert rows["a"]["p_adj"] == rows["b"]["p_adj"] == 0.15
