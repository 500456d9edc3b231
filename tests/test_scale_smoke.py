"""Scale smoke: the per-subject core pipeline on millions of synthetic
rows — ~30× the sf0.1 bench volume — with every assertion an aggregate
(no driver materialization of any large frame). What this pins:

- no stage collects or broadcasts the event set;
- the distributed id assignment really is distributed (forced
  ``strategy="distributed"`` — the path the size gate picks at real
  scale, exercised here at a volume where the window path would still
  work but mask regressions);
- per-subject windows hold up when every subject has a long sequence.

spark.range generates the data executor-side (no driver lists), so the
test's memory footprint is O(1) regardless of N.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventstreamml_spark.sources.synthetic import synthetic_events

pytestmark = pytest.mark.slow  # 2M-row pipeline smokes — SPARK_GRAFT_SLOW_TESTS=1

N = 2_000_000
N_SUBJECTS = 50_000


def _events(spark):
    # deterministic synthetic stream: 50k subjects × 40 events, minute
    # spacing with collisions (id % 7 == 0 repeats the prior timestamp)
    return synthetic_events(spark, N, N_SUBJECTS)


def test_scale_agg_by_time_type(spark):
    from eventstreamml_spark.operators.aggregations import agg_by_time_type

    ev = _events(spark)
    out = agg_by_time_type(ev)
    distinct_triples = ev.select("subject_id", "timestamp", "event_type").distinct().count()
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
        F.sum("n_merged").alias("total"),
    ).collect()[0]
    assert stats["n"] == distinct_triples
    assert (stats["lo"], stats["hi"]) == (0, distinct_triples - 1)  # dense renumber
    assert stats["total"] == N  # every input row accounted for


def test_scale_distributed_dense_ids(spark):
    from eventstreamml_spark.operators.windows import dense_ids

    ev = _events(spark)
    out = dense_ids(
        ev.drop("event_id"),
        order_cols=["subject_id", "timestamp", "event_type", "value"],
        out_col="new_id",
        strategy="distributed",
    )
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("new_id").alias("lo"),
        F.max("new_id").alias("hi"),
        F.countDistinct("new_id").alias("nd"),
    ).collect()[0]
    assert stats["n"] == N
    assert (stats["lo"], stats["hi"], stats["nd"]) == (0, N - 1, N)


def test_scale_rolling_window(spark):
    from eventstreamml_spark.operators.windows import rolling_time_agg

    ev = _events(spark)
    out = rolling_time_agg(
        ev, window_seconds=3600.0, aggs={"n_1h": ("count", "*")}
    )
    stats = out.agg(
        F.count(F.lit(1)).alias("n"), F.max("n_1h").alias("mx")
    ).collect()[0]
    assert stats["n"] == N
    # minute spacing → at most ~61 events can fall into any hour window
    assert 2 <= stats["mx"] <= 62


def test_scale_sketches_and_bootstrap(spark):
    """Round-4 sketch/resampling ops at ~30x bench volume: the HLL and
    the quantile sketch reduce 2M rows to fixed-size register/histogram
    relations; the Poisson bootstrap's 2B aggregate expressions ride
    one map-side-combined pass. Every assertion is an aggregate —
    nothing row-sized reaches the driver."""
    from eventstreamml_spark.operators.sketches import (
        hll_distinct_estimate,
        quantile_sketch,
    )
    from eventstreamml_spark.operators.stats import bootstrap_mean_ci

    ev = _events(spark).withColumn(
        "row_id", F.monotonically_increasing_id()
    )

    hll = hll_distinct_estimate(ev, "subject_id", by="event_type").collect()
    assert len(hll) == 5  # one row per type — the sketch is the output
    for r in hll:
        # subject_id = id%50k and type = id%5 couple (50000 % 5 == 0):
        # each type sees exactly N_SUBJECTS/5 distinct subjects
        expect = N_SUBJECTS / 5
        assert abs(r["estimate"] - expect) / expect < 0.15

    qs = {
        (r["event_type"], r["p"]): r["estimate"]
        for r in quantile_sketch(
            ev.filter(F.col("value") > 0), "value", "event_type", probs=[0.5]
        ).collect()
    }
    assert len(qs) == 5
    for est in qs.values():
        # value = id % 1000 uniform -> median ~500, sketch rel err ~2.5%
        assert 450 <= est <= 550

    ci = bootstrap_mean_ci(
        ev, "value", "row_id", "event_type", n_replicates=16
    ).collect()
    assert len(ci) == 5
    for r in ci:
        assert r["ci_lo"] < r["mean_value"] < r["ci_hi"]
        # 400k rows per type: the CI of the mean must be tight
        assert r["ci_hi"] - r["ci_lo"] < 10.0


def test_scale_round5_ops(spark):
    """Round-5 ops at ~30x bench volume: the KS grid relation stays
    bounded regardless of row count, churn labels fold 2M rows to one
    row per subject in a single conditional-aggregate pass, and the
    7-day rolling distinct fans out the DEDUPED (subject, day)
    relation, never the log. Aggregate-only assertions."""
    from eventstreamml_spark.operators.stats import ks_two_sample
    from eventstreamml_spark.operators.windows import (
        rolling_distinct_subjects,
    )
    from eventstreamml_spark.tasks import churn_labels

    ev = _events(spark)

    ks = ks_two_sample(
        ev.select("value", (F.col("subject_id") % 2).alias("arm")),
        "value",
        "arm",
    ).collect()[0]
    assert ks["n_a"] + ks["n_b"] == N
    assert 0.0 <= ks["ks_d"] <= 0.05  # same distribution in both arms

    ch = churn_labels(ev, "subject_id", "timestamp")
    st = ch.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_events").alias("total"),
    ).collect()[0]
    assert st["n"] == N_SUBJECTS and st["total"] == N

    rd = rolling_distinct_subjects(ev, "subject_id", "timestamp", 7)
    mx = rd.agg(F.max("n_active").alias("m")).collect()[0]["m"]
    assert mx <= N_SUBJECTS


def test_scale_kaplan_meier(spark):
    """KM on 2M subjects: the estimator folds to the |distinct
    durations| relation, survival is monotone non-increasing, and the
    first event time sees every subject at risk."""
    from eventstreamml_spark.operators.stats import kaplan_meier

    df = spark.range(N).select(
        (F.col("id") % 30).alias("duration"),
        (F.col("id") % 3 == 0).cast("int").alias("observed"),
    )
    out = kaplan_meier(df)
    stats = out.agg(
        F.count(F.lit(1)).alias("n_times"),
        F.max("n_at_risk").alias("max_risk"),
    ).collect()[0]
    # events (observed=1) exist only at durations divisible by 3
    assert stats["n_times"] == 10
    assert stats["max_risk"] == N
    surv = [r["survival"] for r in out.orderBy("t").collect()]  # 10 rows
    assert all(a >= b for a, b in zip(surv, surv[1:]))


def test_scale_wasserstein_exact_shift(spark):
    """W1 between two 1M-row uniform grids offset by exactly 100
    integer cells is exactly 100.0 — the distance survives scale
    because the data folds to the bounded grid relation first."""
    from eventstreamml_spark.operators.stats import wasserstein_grid

    # value base uses id//2 so BOTH arms cover the full 0..999 grid
    # (id%1000 with an id%2 arm split would interleave odd/even
    # supports and shift the true distance to 101)
    base = F.floor(F.col("id") / 2) % 1000
    df = spark.range(N).select(
        F.when(F.col("id") % 2 == 0, base.cast("double"))
        .otherwise((base + 100).cast("double"))
        .alias("value"),
        (F.col("id") % 2).alias("arm"),
    )
    row = wasserstein_grid(df, grid_dp=0).collect()[0]
    assert row["n_a"] == row["n_b"] == N // 2
    assert row["w1"] == 100.0


def test_scale_graph_link_ops(spark):
    """Late round-8 graph ops at a 50k-node graph built from the 2M-row
    stream: Adamic-Adar's wedge fan-out stays bounded by the hub cap
    (deg(w)^2 only below max_hub_degree), and 3 synchronous
    label-propagation sweeps stay pure equi-join + rank rounds.
    Aggregate-only assertions; nothing collects an edge list."""
    from eventstreamml_spark.operators.graph import (
        adamic_adar_link_scores,
        label_propagation,
    )

    ev = _events(spark)
    edges = ev.select(
        (F.col("subject_id") % 50_000).alias("src"),
        ((F.col("subject_id") * 31 + F.col("event_id")) % 50_000).alias(
            "dst"
        ),
    ).filter(F.col("event_id") % 20 == 0)  # ~100k raw edges

    top = adamic_adar_link_scores(edges, top_k=10, max_hub_degree=64)
    rows = top.collect()  # top-k only: bounded by construction
    assert len(rows) <= 10
    assert all(r["aa_micro"] > 0 for r in rows)
    assert [r["rank"] for r in rows] == sorted(r["rank"] for r in rows)

    lab = label_propagation(edges, rounds=3)
    st = lab.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.count_distinct("lab").alias("n_comm"),
    ).collect()[0]
    assert 0 < st["n_comm"] <= st["n_nodes"]
