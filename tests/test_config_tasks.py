"""Declared config system (SURVEY §1.2) + task frames (U3/J5/J6)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from eventstreamml_spark.config import (
    DataModality,
    DatasetConfig,
    MeasurementConfig,
    TemporalityType,
)
from eventstreamml_spark.tasks import (
    events_in_task_windows,
    normalize_task_labels,
    restrict_tasks_to_subjects,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# --- config validation matrix (reference config.py:158-200) ----------
def test_static_numeric_rejected():
    with pytest.raises(NotImplementedError):
        MeasurementConfig("m", TemporalityType.STATIC, DataModality.UNIVARIATE_REGRESSION)


def test_dynamic_univariate_rejected():
    with pytest.raises(NotImplementedError):
        MeasurementConfig("m", TemporalityType.DYNAMIC, DataModality.UNIVARIATE_REGRESSION)


def test_multivariate_requires_values_column():
    with pytest.raises(ValueError):
        MeasurementConfig("m", TemporalityType.DYNAMIC, DataModality.MULTIVARIATE_REGRESSION)


def test_functor_required_for_time_dependent():
    with pytest.raises(ValueError):
        MeasurementConfig(
            "m", TemporalityType.FUNCTIONAL_TIME_DEPENDENT, DataModality.UNIVARIATE_REGRESSION
        )


def test_from_simple_args_and_json_roundtrip(tmp_path):
    cfg = DatasetConfig.from_simple_args(
        dynamic_measurement_columns=["dx", ("lab", "lab_value")],
        static_measurement_columns=["sex"],
        time_dependent_measurement_columns=[("age", "age")],
        min_true_float_frequency=0.2,
    )
    mc = cfg.measurement_configs
    assert mc["dx"].modality == DataModality.MULTI_LABEL_CLASSIFICATION
    assert mc["lab"].modality == DataModality.MULTIVARIATE_REGRESSION
    assert mc["lab"].values_column == "lab_value"
    assert mc["sex"].temporality == TemporalityType.STATIC
    assert mc["age"].functor == "age"

    p = str(tmp_path / "cfg.json")
    cfg.to_json_file(p)
    back = DatasetConfig.from_json_file(p)
    assert back.to_dict() == cfg.to_dict()
    assert back.preprocessing_config().min_true_float_frequency == 0.2


# --- task label normalization (U3) ------------------------------------
def test_normalize_task_labels(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2020-01-01"), _ts("2020-01-02"), True, 2, 0.5, "b"),
            (2, _ts("2020-01-01"), _ts("2020-01-02"), False, 0, 1.5, "a"),
            (3, _ts("2020-01-01"), _ts("2020-01-02"), None, 1, None, "a"),
        ],
        "subject_id long, start_time timestamp, end_time timestamp, "
        "died boolean, stage int, score double, site string",
    )
    out, types, vocabs = normalize_task_labels(df)
    assert types == {
        "died": "binary_classification",
        "stage": "multi_class_classification",
        "score": "regression",
        "site": "multi_class_classification",
    }
    rows = {r["subject_id"]: r for r in out.collect()}
    assert rows[1]["died"] == 1.0 and rows[2]["died"] == 0.0 and rows[3]["died"] is None
    # 'a' is most frequent → code 0; 'b' → 1
    assert rows[1]["site"] == 1 and rows[2]["site"] == 0
    codes = {r["element"]: r["code"] for r in vocabs["site"].collect()}
    assert codes == {"a": 0, "b": 1}


def test_unsupported_label_type_raises(spark):
    df = spark.createDataFrame(
        [(1, _ts("2020-01-01"), _ts("2020-01-02"), [1, 2])],
        "subject_id long, start_time timestamp, end_time timestamp, arr array<int>",
    )
    with pytest.raises(TypeError):
        normalize_task_labels(df)


# --- task window join (J5) + subject restriction (J6) -----------------
def test_events_in_task_windows_inclusive_bounds(spark):
    events = spark.createDataFrame(
        [
            (0, 1, _ts("2020-01-01 00:00:00")),
            (1, 1, _ts("2020-01-01 12:00:00")),
            (2, 1, _ts("2020-01-02 00:00:00")),
            (3, 1, _ts("2020-01-03 00:00:00")),
            (4, 2, _ts("2020-01-01 12:00:00")),
        ],
        "event_id long, subject_id long, timestamp timestamp",
    )
    tasks = spark.createDataFrame(
        [(1, _ts("2020-01-01 00:00:00"), _ts("2020-01-02 00:00:00"))],
        "subject_id long, start_time timestamp, end_time timestamp",
    )
    got = sorted(r["event_id"] for r in events_in_task_windows(events, tasks).collect())
    assert got == [0, 1, 2]  # both window ends inclusive; subject 2 excluded

    kept = restrict_tasks_to_subjects(
        tasks, spark.createDataFrame([(2,)], "subject_id long")
    )
    assert kept.count() == 0
