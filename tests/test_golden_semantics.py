"""Golden-frame tests for exact reference semantics (SURVEY §5 pattern
1/2): tiny literal inputs, exact expected outputs. These encode the
traps: bounds inclusivity/priority, UNK-fold arithmetic, ddof=1,
dedup renumbering, split determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from eventstreamml_spark.operators import aggregations as agg
from eventstreamml_spark.operators import filters as flt
from eventstreamml_spark.operators import setops
from eventstreamml_spark.vocabulary import build_vocabulary, filter_vocabulary, apply_vocab_index


# --- P5 drop/censor truth table (test_event_stream_dataset.py:138-179) ---
DC_BOUNDS = dict(
    drop_lower_bound=0.0,
    drop_lower_bound_inclusive=False,
    drop_upper_bound=10.0,
    drop_upper_bound_inclusive=True,
    censor_lower_bound=2.0,
    censor_upper_bound=8.0,
)
DC_CASES = [
    (-1.0, None),   # below drop lower → null
    (0.0, None),    # at exclusive? lower inclusive=False → but val==bound and not inclusive → NOT dropped; censor: 0 < 2 → 2
    (1.0, 2.0),     # above drop lower, below censor lower → clamp up
    (2.0, 2.0),     # at censor lower → pass (strict <)
    (5.0, 5.0),     # interior → pass
    (8.0, 8.0),     # at censor upper → pass (strict >)
    (9.0, 8.0),     # above censor upper → clamp down
    (10.0, None),   # at inclusive drop upper → null
    (11.0, None),   # above drop upper → null
]


def test_drop_or_censor_truth_table(spark):
    # fix: val==0.0 with exclusive lower drop bound is NOT dropped
    cases = dict(DC_CASES)
    cases[0.0] = 2.0  # not dropped (exclusive), then censored up to 2
    df = spark.createDataFrame([Row(v=v) for v in cases], "v double")
    out = df.select(
        "v", flt.drop_or_censor(F.col("v"), **DC_BOUNDS).alias("r")
    ).collect()
    got = {r["v"]: r["r"] for r in out}
    assert got == cases


def test_drop_or_censor_null_bounds_noop(spark):
    df = spark.createDataFrame([Row(v=5.0), Row(v=None)], "v double")
    out = df.select(flt.drop_or_censor(F.col("v")).alias("r")).collect()
    assert [r["r"] for r in out] == [5.0, None]


def test_drop_oob_per_key_bounds(spark):
    """P6: per-key bounds join; missing keys pass through
    (event_stream_dataset.py:213-266)."""
    vals = spark.createDataFrame(
        [("k1", -5.0), ("k1", 0.5), ("k2", 99.0), ("k3", 42.0)],
        "key string, value double",
    )
    bounds = spark.createDataFrame(
        [
            ("k1", 0.0, True, None, None, None, None),
            ("k2", None, None, None, None, None, 50.0),
        ],
        "key string, drop_lower_bound double, drop_lower_bound_inclusive boolean, "
        "drop_upper_bound double, drop_upper_bound_inclusive boolean, "
        "censor_lower_bound double, censor_upper_bound double",
    )
    out = flt.drop_oob_and_censor_outliers(vals, bounds, "key", "value")
    got = {(r["key"], r["value"]) for r in out.collect()}
    assert got == {("k1", None), ("k1", 0.5), ("k2", 50.0), ("k3", 42.0)}


def test_unit_bounds_merge(spark):
    """Percent unit implies (0,1) exclusive drop bounds; existing
    tighter bounds win; ties OR inclusivity
    (event_stream_dataset.py:64-141 + UNIT_BOUNDS :59-62)."""
    bounds = spark.createDataFrame(
        [
            ("a", "%", None, None, None, None),
            ("b", "percent", 0.2, True, 2.0, True),
            ("c", "kg", None, None, 7.0, False),
            ("d", "%", 0.0, True, None, None),
        ],
        "key string, unit string, drop_lower_bound double, "
        "drop_lower_bound_inclusive boolean, drop_upper_bound double, "
        "drop_upper_bound_inclusive boolean",
    )
    out = {r["key"]: r for r in flt.merge_unit_inferred_bounds(bounds).collect()}
    assert (out["a"]["drop_lower_bound"], out["a"]["drop_upper_bound"]) == (0.0, 1.0)
    assert out["a"]["drop_lower_bound_inclusive"] is False
    # b: existing lower 0.2 is tighter (max wins); upper 1.0 from unit is tighter (min wins)
    assert (out["b"]["drop_lower_bound"], out["b"]["drop_upper_bound"]) == (0.2, 1.0)
    assert out["b"]["drop_lower_bound_inclusive"] is True
    assert out["b"]["drop_upper_bound_inclusive"] is False
    # c: unknown unit → untouched
    assert out["c"]["drop_lower_bound"] is None and out["c"]["drop_upper_bound"] == 7.0
    # d: tie at 0.0 → inclusivity OR-ed: True or False = True
    assert out["d"]["drop_lower_bound"] == 0.0
    assert out["d"]["drop_lower_bound_inclusive"] is True


# --- A1 dedup golden (test_event_stream_dataset.py:497-546 shape) ---
def test_agg_by_time_type_golden(spark):
    from datetime import datetime

    t1, t2 = datetime(2020, 1, 1), datetime(2020, 1, 2)
    rows = [
        (0, 1, t1, "A"),
        (1, 1, t1, "A"),   # dup of 0
        (2, 1, t1, "B"),
        (3, 2, t1, "A"),
        (4, 2, t2, "A"),
    ]
    df = spark.createDataFrame(rows, "event_id long, subject_id long, timestamp timestamp_ntz, event_type string")
    out = agg.agg_by_time_type(df).orderBy("event_id").collect()
    assert [(r["event_id"], r["subject_id"], r["event_type"], r["n_merged"]) for r in out] == [
        (0, 1, "A", 2), (1, 1, "B", 1), (2, 2, "A", 1), (3, 2, "A", 1),
    ]
    assert out[0]["old_event_ids"] == [0, 1]

    meta = spark.createDataFrame([(10, 0), (11, 1), (12, 4)], "metadata_id long, event_id long")
    dedup = agg.agg_by_time_type(df)
    remapped = {r["metadata_id"]: r["event_id"] for r in agg.remap_event_ids(meta, dedup).collect()}
    assert remapped == {10: 0, 11: 0, 12: 3}


def test_inter_event_time_ddof1(spark):
    """A9 golden: sample std (ddof=1), minutes, log(Δt+1)
    (test_event_stream_dataset.py:667-707)."""
    from datetime import datetime

    rows = [
        (0, 1, datetime(2020, 1, 1, 0, 0)),
        (1, 1, datetime(2020, 1, 1, 0, 1)),    # Δ=1 min
        (2, 1, datetime(2020, 1, 1, 0, 4)),    # Δ=3 min
        (3, 2, datetime(2020, 1, 1, 0, 0)),
        (4, 2, datetime(2020, 1, 1, 0, 11)),   # Δ=11 min
    ]
    df = spark.createDataFrame(rows, "event_id long, subject_id long, timestamp timestamp_ntz")
    r = agg.inter_event_time_stats(df).collect()[0]
    import statistics

    ttes = [math.log(2.0), math.log(4.0), math.log(12.0)]
    assert r["n_ttes"] == 3
    assert abs(r["mean_log_tte"] - statistics.mean(ttes)) < 1e-12
    assert abs(r["std_log_tte"] - statistics.stdev(ttes)) < 1e-12  # ddof=1


def test_zero_minute_gap_log_guard(spark):
    """FIXTURES 'gaps of exactly 0 minutes': log(0+1)=0, no -inf."""
    from datetime import datetime

    t = datetime(2020, 1, 1)
    df = spark.createDataFrame(
        [(0, 1, t), (1, 1, t)], "event_id long, subject_id long, timestamp timestamp_ntz"
    )
    r = agg.inter_event_time_stats(df).collect()[0]
    assert r["n_ttes"] == 1 and r["mean_log_tte"] == 0.0


# --- Vocabulary goldens (vocabulary.py semantics) ---
def test_build_vocab_freq_denominator_includes_nulls(spark):
    """freq = count/len(observations): nulls skipped in numerator but
    counted in the denominator (vocabulary.py:114-133)."""
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "x string"
    )
    v = {r["element"]: (r["freq"], r["idx"]) for r in build_vocabulary(df, "x").collect()}
    assert v["UNK"] == (0.0, 0)
    assert v["a"] == (0.5, 1)
    assert v["b"] == (0.25, 2)


def test_filter_vocab_unk_fold(spark):
    """A5: dropped elements' mass folds into UNK; survivors re-ranked
    (vocabulary.py:84-112)."""
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1 + [("d",)] * 1, "x string"
    )
    v = build_vocabulary(df, "x")
    out = {r["element"]: (r["freq"], r["idx"]) for r in filter_vocabulary(v, 0.25).collect()}
    assert set(out) == {"UNK", "a", "b"}
    assert abs(out["UNK"][0] - 0.2) < 1e-12  # 0.1 + 0.1 folded
    assert out["a"] == (0.5, 1) and out["b"] == (0.3, 2)
    # count-threshold form: 3 of 10 observations
    out2 = {r["element"] for r in filter_vocabulary(v, 3, total_observations=10).collect()}
    assert out2 == {"UNK", "a", "b"}


def test_apply_vocab_index_unk_default(spark):
    df = spark.createDataFrame([("a",), ("zzz",), (None,)], "x string")
    v = build_vocabulary(spark.createDataFrame([("a",), ("a",), ("b",)], "x string"), "x")
    out = [r["idx"] for r in apply_vocab_index(df, v, "x").orderBy(F.col("x").asc_nulls_first()).collect()]
    assert out == [0, 1, 0]  # null→UNK, a→1, unseen→UNK


def test_build_vocabulary_rejects_integer_elements(spark):
    """Reference guard (vocabulary.py:63): integer vocabularies raise —
    silently re-indexing an already-indexed column corrupts mappings."""
    import pytest

    df = spark.createDataFrame([(1,), (2,)], "x int")
    with pytest.raises(TypeError, match="integer vocabularies"):
        build_vocabulary(df, "x")
    # explicit cast is the sanctioned path
    v = build_vocabulary(df.select(F.col("x").cast("string").alias("x")), "x")
    assert {r["element"] for r in v.collect()} == {"UNK", "1", "2"}


# --- O6 split contracts (seeded-randomness, SURVEY §5 pattern 3) ---
def test_split_contracts(spark):
    subs = spark.createDataFrame([(i,) for i in range(1000)], "subject_id long")
    fr = {"train": 0.8, "tuning": 0.1, "held_out": 0.1}
    s1 = setops.assign_splits(subs, fr, seed=7).collect()
    s2 = setops.assign_splits(subs, fr, seed=7).collect()
    s3 = setops.assign_splits(subs, fr, seed=8).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))  # same seed ⇒ identical
    assert sorted(map(tuple, s1)) != sorted(map(tuple, s3))  # diff seed ⇒ different
    counts = {}
    for r in s1:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert sum(counts.values()) == 1000
    assert 700 < counts["train"] < 900  # distributional contract


def test_split_exact_sizes(spark):
    """Exact-size variant reproduces the reference's round(frac × N)
    contract (event_stream_dataset.py:723-740): every named split gets
    exactly round(f_i × N) subjects (half-even, as np.round), splits are
    disjoint, and the same seed reproduces the assignment."""
    subs = spark.createDataFrame([(i,) for i in range(149)], "subject_id long")
    fr = {"train": 0.8, "tuning": 0.1, "held_out": 0.1}
    rows = setops.assign_splits_exact(subs, fr, seed=3).collect()
    counts = {}
    seen = set()
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
        assert r["subject_id"] not in seen
        seen.add(r["subject_id"])
    # round(119.2)=119, round(14.9)=15, round(14.9)=15
    assert counts == {"train": 119, "tuning": 15, "held_out": 15}

    again = setops.assign_splits_exact(subs, fr, seed=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    # half-even boundary: N=10, fracs .25/.75 → round(2.5)=2, round(7.5)=8
    small = spark.createDataFrame([(i,) for i in range(10)], "subject_id long")
    c2 = {}
    for r in setops.assign_splits_exact(small, {"a": 0.25, "b": 0.75}, seed=1).collect():
        c2[r["split"]] = c2.get(r["split"], 0) + 1
    assert c2 == {"a": 2, "b": 8}

    # implicit remainder bucket appears when fractions undershoot 1
    c3 = {}
    for r in setops.assign_splits_exact(small, {"train": 0.8}, seed=1).collect():
        c3[r["split"]] = c3.get(r["split"], 0) + 1
    assert c3 == {"train": 8, "held_out": 2}

    # both numbering strategies agree on the assignment
    w = setops.assign_splits_exact(subs, fr, seed=3, id_strategy="window").collect()
    d = setops.assign_splits_exact(subs, fr, seed=3, id_strategy="distributed").collect()
    assert sorted(map(tuple, w)) == sorted(map(tuple, d))


def test_min_seq_len_and_time_range(spark):
    from datetime import datetime

    rows = [(i, 1 if i < 5 else 2, datetime(2020, 1, 1, i)) for i in range(8)]
    df = spark.createDataFrame(rows, "event_id long, subject_id long, timestamp timestamp_ntz")
    kept = flt.filter_min_seq_len(df, 4)
    assert {r["subject_id"] for r in kept.collect()} == {1}
    rng = flt.restrict_time_range(
        df, datetime(2020, 1, 1, 2), datetime(2020, 1, 1, 5), "timestamp"
    )
    assert sorted(r["event_id"] for r in rng.collect()) == [2, 3, 4, 5]  # inclusive both ends


def test_nullify_nonfinite(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("inf"),), (float("-inf"),), (float("nan"),)], "v double"
    )
    out = [r["r"] for r in df.select(flt.nullify_nonfinite(F.col("v")).alias("r")).collect()]
    assert out == [1.0, None, None, None]


def test_drop_all_null_columns(spark):
    df = spark.createDataFrame(
        [(1, None, "x"), (2, None, None)], "a long, b string, c string"
    )
    out = flt.drop_all_null_columns(df)
    assert out.columns == ["a", "c"]
    out2 = flt.drop_all_null_columns(df, keep=["b"])
    assert out2.columns == ["a", "b", "c"]


def test_dense_ids_strategies_agree(spark):
    """The persisted distributed numbering must equal the exact global
    window for any input — this is the regression test for the
    boundary-resample bug (unpinned range partitions gave the offsets
    branch different boundaries than the main branch)."""
    from pyspark.sql import functions as F

    from eventstreamml_spark.operators.windows import dense_ids

    df = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 100003).alias("k"), F.col("id").alias("payload")
    )
    w = {r["k"]: r["i"] for r in dense_ids(df, ["k", "payload"], "i").collect()}
    d = {r["k"]: r["i"] for r in dense_ids(df, ["k", "payload"], "i", strategy="distributed").collect()}
    assert w == d
    assert sorted(w.values()) == list(range(5000))


def test_salted_collect_equals_direct(spark):
    """Two-phase salted collect_list/collect_set must equal the direct
    aggregation (as multisets / sets) — salting changes the physical
    shape only. One hot key carries most rows, mimicking skew."""
    from eventstreamml_spark.operators.skew import (
        salted_collect_list,
        salted_collect_set,
    )

    rows = [("hot", i % 7) for i in range(500)] + [("cold", i) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, v int")

    direct = {
        r["k"]: sorted(r["vs"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    salted = {
        r["k"]: r["values"]
        for r in salted_collect_list(df, ["k"], "v", n_salt=8).collect()
    }
    assert salted == direct

    direct_set = {
        r["k"]: sorted(r["vs"])
        for r in df.groupBy("k").agg(F.collect_set("v").alias("vs")).collect()
    }
    salted_set = {
        r["k"]: r["values"]
        for r in salted_collect_set(df, ["k"], "v", n_salt=8).collect()
    }
    assert salted_set == direct_set


def test_as_of_join_semantics(spark):
    from eventstreamml_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 15), (5, "c", 5)],
        "lid long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("a", 10, 100), ("a", 25, 101), ("b", 15, 102), ("b", 16, 103)],
        "k string, ts long, mid long",
    )
    out = {
        r["lid"]: r["mid"]
        for r in as_of_join(
            left, right, keys=["k"], left_ts="ts", right_ts="ts"
        ).collect()
    }
    # equal timestamps are visible (>= semantics); later markers not;
    # keys with no marker at-or-before → null
    assert out == {1: 100, 2: 100, 3: 101, 4: 102, 5: None}

    strict = {
        r["lid"]: r["mid"]
        for r in as_of_join(
            left, right, keys=["k"], left_ts="ts", right_ts="ts", strict=True
        ).collect()
    }
    # strict: the equal-ts markers at (a,10) and (b,15) are invisible
    assert strict == {1: None, 2: 100, 3: 101, 4: None, 5: None}

    # row count is exactly the left side's — no amplification
    assert as_of_join(left, right, keys=["k"], left_ts="ts", right_ts="ts").count() == 5


def test_as_of_join_rejects_collisions(spark):
    import pytest

    from eventstreamml_spark.operators.joins import as_of_join

    left = spark.createDataFrame([(1, "a", 10)], "lid long, k string, ts long")
    right = spark.createDataFrame([("a", 10, 100)], "k string, ts long, mid long")

    # reserved internal names on either input
    bad_left = left.withColumn("_side", F.lit(1))
    with pytest.raises(ValueError, match="reserves column names"):
        as_of_join(bad_left, right, keys=["k"], left_ts="ts", right_ts="ts")
    bad_right = right.withColumn("_asof", F.lit(1))
    with pytest.raises(ValueError, match="reserves column names"):
        as_of_join(left, bad_right, keys=["k"], left_ts="ts", right_ts="ts")

    # payload column duplicating a left column would emit two `lid`s
    dup_right = right.withColumnRenamed("mid", "lid")
    with pytest.raises(ValueError, match="collide with left columns"):
        as_of_join(left, dup_right, keys=["k"], left_ts="ts", right_ts="ts")


def test_column_observation_counts_empty_candidates(spark):
    from eventstreamml_spark.operators.filters import column_observation_counts

    df = spark.createDataFrame([(1, "a")], "id long, k string")
    out = column_observation_counts(df, [])
    assert out.columns == ["col_name", "n_obs", "kept"]
    assert out.count() == 0


def test_quality_profile_and_orphans(spark):
    from eventstreamml_spark.operators.quality import orphaned_keys, profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (3, "b", 2.5), (4, "a", None)],
        "id long, k string, v double",
    )
    prof = {r["col_name"]: r for r in profile_table(df).collect()}
    assert prof["id"]["n_nonnull"] == 4 and prof["id"]["null_rate"] == 0.0
    assert prof["k"]["n_nonnull"] == 3 and prof["k"]["n_distinct"] == 2
    assert prof["k"]["min_num"] is None  # strings don't cast
    assert prof["v"]["null_rate"] == 0.5
    assert prof["v"]["min_num"] == 1.5 and prof["v"]["max_num"] == 2.5

    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99), (13, None)], "row_id long, fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "fk long")
    orphans = orphaned_keys(child, parent, key="fk")
    # 99 is orphaned; the null FK is excluded by contract
    assert [r["row_id"] for r in orphans.collect()] == [12]


def test_stratified_sample_contract(spark):
    from eventstreamml_spark.operators.setops import stratified_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id long, event_type string")
    out = stratified_sample(df, {"a": 0.3, "b": 1.0}, seed=5)
    got = out.groupBy("event_type").count().collect()
    counts = {r["event_type"]: r["count"] for r in got}
    # stratum b kept whole; stratum a near its fraction; no extra strata
    assert counts["b"] == 1000
    assert 0.2 * 1000 < counts["a"] < 0.4 * 1000
    assert set(counts) == {"a", "b"}
    # deterministic: same seed → identical row set
    ids1 = {r["event_id"] for r in out.collect()}
    ids2 = {
        r["event_id"]
        for r in stratified_sample(df, {"a": 0.3, "b": 1.0}, seed=5).collect()
    }
    assert ids1 == ids2
    # different seed → different sample of stratum a
    ids3 = {
        r["event_id"]
        for r in stratified_sample(df, {"a": 0.3, "b": 1.0}, seed=6).collect()
    }
    assert ids1 != ids3
    # global-float form
    n_half = stratified_sample(df, 0.5, seed=5).count()
    assert 0.4 * 2000 < n_half < 0.6 * 2000


def test_rolling_time_agg_boundaries(spark):
    from datetime import datetime

    from eventstreamml_spark.operators.windows import rolling_time_agg

    t = lambda m: datetime(2024, 1, 1, m // 60, m % 60)
    df = spark.createDataFrame(
        [(1, "s", t(0), 1.0), (2, "s", t(30), 2.0), (3, "s", t(60), 4.0),
         (4, "s", t(61), 8.0), (5, "u", t(0), 16.0)],
        "event_id long, subject_id string, timestamp timestamp, value double",
    )
    out = {
        r["event_id"]: (r["n_1h"], r["v_1h"])
        for r in rolling_time_agg(
            df, 3600, {"n_1h": ("count", "*"), "v_1h": ("sum", "value")}
        ).collect()
    }
    # window is inclusive both ends: the event exactly 60min back counts
    assert out[3] == (3, 7.0)
    # one minute later the t=0 event falls out
    assert out[4] == (3, 14.0)
    # subjects never see each other's events
    assert out[5] == (1, 16.0)
    assert out[1] == (1, 1.0)


def test_as_of_join_forward_and_tolerance(spark):
    from eventstreamml_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 15), (5, "c", 5)],
        "lid long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("a", 10, 100), ("a", 25, 101), ("b", 16, 103)],
        "k string, ts long, mid long",
    )
    fwd = {
        r["lid"]: r["mid"]
        for r in as_of_join(
            left, right, keys=["k"], left_ts="ts", right_ts="ts",
            direction="forward",
        ).collect()
    }
    # earliest marker at-or-after; equal ts visible; none after → null
    assert fwd == {1: 100, 2: 101, 3: None, 4: 103, 5: None}

    fwd_strict = {
        r["lid"]: r["mid"]
        for r in as_of_join(
            left, right, keys=["k"], left_ts="ts", right_ts="ts",
            direction="forward", strict=True,
        ).collect()
    }
    # strict: the equal-ts marker at (a,10) is invisible → next is 25
    assert fwd_strict == {1: 101, 2: 101, 3: None, 4: 103, 5: None}

    # tolerance: ts are epoch seconds here; cap the gap at 5s
    tol = {
        r["lid"]: r["mid"]
        for r in as_of_join(
            left, right, keys=["k"], left_ts="ts", right_ts="ts",
            direction="forward", tolerance_s=5.0,
        ).collect()
    }
    # lid=2 (ts 20 → marker 25, gap 5) kept; lid=4 (15→16) kept
    assert tol == {1: 100, 2: 101, 3: None, 4: 103, 5: None}
    tol2 = {
        r["lid"]: r["mid"]
        for r in as_of_join(
            left, right, keys=["k"], left_ts="ts", right_ts="ts",
            direction="forward", tolerance_s=4.0,
        ).collect()
    }
    assert tol2 == {1: 100, 2: None, 3: None, 4: 103, 5: None}

    with pytest.raises(ValueError, match="direction"):
        as_of_join(left, right, keys=["k"], direction="nearest")
