"""Plan-property regression tests: pushdown, pruning, broadcast — the
scale behaviors the engine is designed around (SURVEY §4)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eventstreamml_spark.plans.inspect import (
    codegen_stage_count,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    uses_broadcast_join,
)
from eventstreamml_spark.sources.testdata import load_table

SF = os.path.join(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001")


def test_filter_pushdown_reaches_scan(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey")
    assert any("l_quantity" in f for f in pushed_filters(q))


def test_column_pruning(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    assert set(read_schema_columns(q)) == {"l_orderkey", "l_quantity"}


def test_dimension_join_broadcasts(spark):
    li = load_table(spark, SF, "lineitem")
    part = load_table(spark, SF, "part")
    q = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select("l_orderkey", "p_name")
    assert uses_broadcast_join(q)


def test_histogram_is_single_shuffle(spark):
    from eventstreamml_spark.operators.aggregations import event_type_histogram

    ev = load_table(spark, SF, "events")
    q = event_type_histogram(ev)
    # one exchange for the groupBy (plus possibly one for the tiny
    # global sort of the grouped output)
    assert shuffle_count(q) <= 2
    q.collect()  # AQE: codegen stages exist only after execution
    assert codegen_stage_count(q) >= 1


def test_drop_censor_is_narrow(spark):
    from eventstreamml_spark.operators.filters import drop_or_censor

    ev = load_table(spark, SF, "events")
    q = ev.select(
        "event_id",
        drop_or_censor(
            F.col("value"), drop_lower_bound=5.0, drop_lower_bound_inclusive=False
        ).alias("v"),
    )
    assert shuffle_count(q) == 0  # pure map — no exchange at any scale
