"""Round-5 edge-case behavior pinned by the round-4 advice review:
welch_ttest arm-count guard, quantile_sketch all-nonpositive groups,
join_size_estimate empty-overlap zero, bucketed_pair source freshness.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestWelchArmGuard:
    def test_three_arms_nulls_statistic(self, spark):
        from eventstreamml_spark.operators.stats import welch_ttest

        rows = [(a, float(v)) for a in (0, 1, 2) for v in range(10)]
        df = spark.createDataFrame(rows, "arm int, x double")
        out = welch_ttest(df, "arm", "x").collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_arms"] == 3
        assert r["t_stat"] is None
        assert r["welch_dof"] is None
        assert r["mean_diff"] is None

    def test_two_arms_reports_n_arms(self, spark):
        from eventstreamml_spark.operators.stats import welch_ttest

        rows = [(0, 1.0), (0, 2.0), (0, 4.0), (1, 2.0), (1, 5.0), (1, 6.0)]
        df = spark.createDataFrame(rows, "arm int, x double")
        r = welch_ttest(df, "arm", "x").collect()[0]
        assert r["n_arms"] == 2
        assert r["t_stat"] is not None


class TestQuantileSketchAllNonpos:
    def test_all_nonpos_group_still_emitted(self, spark):
        from eventstreamml_spark.operators.sketches import quantile_sketch

        rows = [("pos", float(v)) for v in range(1, 21)]
        rows += [("nonpos", -1.0), ("nonpos", 0.0), ("nonpos", -7.5)]
        df = spark.createDataFrame(rows, "g string, value double")
        out = quantile_sketch(df, "value", "g", probs=[0.5, 0.9])
        got = {(r["g"], r["p"]): r for r in out.collect()}
        assert ("nonpos", 0.5) in got and ("nonpos", 0.9) in got
        r = got[("nonpos", 0.5)]
        assert r["estimate"] is None
        assert r["n_pos"] == 0
        assert r["n_nonpos"] == 3
        # the positive group is unaffected
        assert got[("pos", 0.5)]["estimate"] is not None
        assert got[("pos", 0.5)]["n_pos"] == 20


class TestJoinSizeEstimateEmpty:
    def test_disjoint_keys_estimate_zero(self, spark):
        from eventstreamml_spark.operators.sketches import join_size_estimate

        left = spark.createDataFrame([("a",), ("b",)], "k string")
        right = spark.createDataFrame([("a",), ("b",)], "j string")
        # force zero bucket overlap by using 1 bucket on an empty side
        empty_right = right.filter(F.lit(False))
        r = join_size_estimate(left, empty_right, "k", "j").collect()[0]
        assert r["estimate"] == 0
        assert r["exact"] == 0


class TestBucketedPairFreshness:
    def test_source_mtime_change_yields_fresh_table(self, spark, tmp_path):
        import os
        import time

        from eventstreamml_spark.operators.storage import bucketed_pair

        src = tmp_path / "src.parquet"
        spark.range(10).select(
            F.col("id").alias("k"), F.lit(1).alias("v")
        ).write.parquet(str(src))
        df1 = spark.read.parquet(str(src))
        l1, _ = bucketed_pair(
            spark, df1, df1, "k", cache_tag="fresh-test", src_paths=(str(src),)
        )
        assert l1.agg(F.sum("v")).collect()[0][0] == 10

        time.sleep(1.1)  # ensure a distinct mtime even on coarse filesystems
        spark.range(10).select(
            F.col("id").alias("k"), F.lit(2).alias("v")
        ).write.mode("overwrite").parquet(str(src))
        os.utime(src)
        df2 = spark.read.parquet(str(src))
        l2, _ = bucketed_pair(
            spark, df2, df2, "k", cache_tag="fresh-test", src_paths=(str(src),)
        )
        # stale-reuse bug would return the v=1 table here
        assert l2.agg(F.sum("v")).collect()[0][0] == 20

    def test_missing_src_paths_still_caches_within_session(self, spark):
        from eventstreamml_spark.operators.storage import bucketed_pair

        df = spark.range(5).select(F.col("id").alias("k"))
        l1, r1 = bucketed_pair(spark, df, df, "k", cache_tag="nosrc-test")
        l2, r2 = bucketed_pair(spark, df, df, "k", cache_tag="nosrc-test")
        assert l1.count() == l2.count() == 5
