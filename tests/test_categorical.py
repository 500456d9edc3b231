"""Categorical fit/transform (E2 step 3) — golden semantics:
column drop by observation frequency, UNK folding, collapse-to-UNK
drop, out-of-vocab → UNK at transform."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstreamml_spark.preprocessing.categorical import CategoricalPreprocessor
from eventstreamml_spark.preprocessing.config import PreprocessingConfig


def _fit(spark, rows, total=None, **cfg):
    df = spark.createDataFrame(rows, "measurement string, element string")
    pre = CategoricalPreprocessor(config=PreprocessingConfig(**cfg))
    return df, pre.fit(df, total_possible=total)


def test_vocab_ranked_with_unk_mass(spark):
    rows = [("m", "a")] * 6 + [("m", "b")] * 3 + [("m", "c")] * 1
    _, model = _fit(spark, rows, min_valid_vocab_element_observations=2)
    v = {r["element"]: (r["freq"], r["idx"]) for r in model.vocab.collect()}
    assert v["a"] == (0.6, 1) and v["b"] == (0.3, 2)
    assert "c" not in v and v["UNK"] == (0.1, 0)  # c's mass folded into UNK


def test_column_drop_by_observation_frequency(spark):
    rows = [("rare", "x")] * 2 + [("common", "y")] * 50
    df, model = _fit(spark, rows, total=100, min_valid_column_observations=0.05)
    st = {r["measurement"]: r for r in model.status.collect()}
    assert st["rare"]["dropped"] and not st["common"]["dropped"]
    assert st["rare"]["observation_frequency"] == 0.02
    # dropped measurement's elements are nulled at transform
    out = model.transform(df)
    assert out.filter((F.col("measurement") == "rare") & F.col("element").isNotNull()).count() == 0
    assert out.filter((F.col("measurement") == "common") & (F.col("element") == "y")).count() == 50


def test_collapse_to_unk_drops_measurement(spark):
    # every element too rare → vocab would be ['UNK'] → dropped
    rows = [("m", f"e{i}") for i in range(10)]
    _, model = _fit(spark, rows, min_valid_vocab_element_observations=5)
    assert model.status.collect()[0]["dropped"]
    assert model.vocab.count() == 0


def test_out_of_vocab_maps_to_unk(spark):
    train_rows = [("m", "a")] * 5 + [("m", "b")] * 5
    df, model = _fit(spark, train_rows)
    test = spark.createDataFrame(
        [("m", "a"), ("m", "zzz"), ("m", None)], "measurement string, element string"
    )
    out = {i: r["element"] for i, r in enumerate(model.transform(test).collect())}
    assert set(out.values()) == {"a", "UNK", None}


def test_null_elements_excluded_from_freq_denominator(spark):
    rows = [("m", "a"), ("m", "a"), ("m", None), ("m", "b")]
    _, model = _fit(spark, rows)
    v = {r["element"]: r["freq"] for r in model.vocab.collect()}
    # denominator is 3 non-null observations, not 4 rows
    assert abs(v["a"] - 2 / 3) < 1e-12
    st = model.status.collect()[0]
    assert st["n_obs"] == 3 and st["total_possible"] == 4


def test_fit_non_string_elements_cast_in_grouped_base(spark):
    """fit() now aggregates one (measurement, element-as-string) base
    relation in a single pass; a non-string element column must cast
    at the group key with nulls still excluded from n_obs/freq."""
    df = spark.createDataFrame(
        [("m", 1.5), ("m", 1.5), ("m", 2.5), ("m", None)],
        "measurement string, element double",
    )
    model = CategoricalPreprocessor().fit(df)
    v = {r["element"]: (r["freq"], r["idx"]) for r in model.vocab.collect()}
    assert abs(v["1.5"][0] - 2 / 3) < 1e-12 and v["1.5"][1] == 1
    assert abs(v["2.5"][0] - 1 / 3) < 1e-12 and v["2.5"][1] == 2
    st = model.status.collect()[0]
    assert st["n_obs"] == 3 and st["total_possible"] == 4
