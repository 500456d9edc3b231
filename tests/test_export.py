"""Tensorization export (E3): global offset arithmetic, per-event entry
order, per-subject sequence assembly — golden layout mirrors the
reference's test_event_stream_pytorch_dataset.py:148-165 offset scheme."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from eventstreamml_spark.export import tensorize
from eventstreamml_spark.vocabulary import assign_measurement_offsets


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _vocab(spark, elems):
    rows = [("UNK", 0.0, 0)] + [(e, 0.1, i + 1) for i, e in enumerate(elems)]
    return spark.createDataFrame(rows, "element string, freq double, idx int")


def test_offset_assignment_golden():
    # event_type block starts at 1 (no UNK slot — size = #types); metadata
    # blocks include their local UNK slot
    offs = assign_measurement_offsets({"event_type": 3, "lab": 4, "rx": 2})
    assert offs == {"event_type": 1, "lab": 4, "rx": 8}


def test_tensorize_layout(spark):
    events = spark.createDataFrame(
        [
            (0, 1, _ts("2020-01-01 00:00:00"), "admit"),
            (1, 1, _ts("2020-01-01 00:30:00"), "lab"),
            (2, 2, _ts("2020-01-02 00:00:00"), "mystery"),  # OOV event type
        ],
        "event_id long, subject_id long, timestamp timestamp, event_type string",
    )
    metadata = spark.createDataFrame(
        [
            (0, 1, "labval", "hr", 70.0),
            (1, 1, "labval", "bp", 120.0),
            (2, 1, "labval", "unseen", 9.0),   # OOV element → idx 0
        ],
        "metadata_id long, event_id long, measurement string, element string, value double",
    )
    vocabs = {
        "event_type": _vocab(spark, ["admit", "lab"]),   # 2 types → block [1,2]
        "labval": _vocab(spark, ["hr", "bp"]),           # size 3 (incl UNK) → offset 3
    }
    out = {r["subject_id"]: r for r in tensorize(events, metadata, vocabs).collect()}

    s1 = out[1]
    assert s1["time"] == [0.0, 30.0]
    # event 0: only event_type 'admit' (local 0) → global 1
    assert s1["dynamic_indices"][0] == [1]
    assert s1["dynamic_measurement_indices"][0] == [1]
    assert s1["dynamic_values"][0] == [None]
    # event 1: event_type 'lab' (1+1=2) first, then hr (3+1=4), bp (3+2=5),
    # unseen → labval's own UNK slot 3+0=3; metadata order by metadata_id
    assert s1["dynamic_indices"][1] == [2, 4, 5, 3]
    assert s1["dynamic_values"][1] == [None, 70.0, 120.0, 9.0]
    assert s1["dynamic_measurement_indices"][1] == [1, 2, 2, 2]

    # OOV event type → sentinel 0, still measurement 1
    s2 = out[2]
    assert s2["dynamic_indices"] == [[0]] and s2["dynamic_measurement_indices"] == [[1]]


def test_tensorize_min_seq_len_and_static(spark):
    events = spark.createDataFrame(
        [
            (0, 1, _ts("2020-01-01 00:00:00"), "a"),
            (1, 1, _ts("2020-01-01 01:00:00"), "a"),
            (2, 2, _ts("2020-01-01 00:00:00"), "a"),  # subject 2: one event only
        ],
        "event_id long, subject_id long, timestamp timestamp, event_type string",
    )
    metadata = spark.createDataFrame(
        [], "metadata_id long, event_id long, measurement string, element string, value double"
    )
    static_df = spark.createDataFrame([(1, "F"), (2, "M")], "subject_id long, sex string")
    out = tensorize(
        events,
        metadata,
        {"event_type": _vocab(spark, ["a"])},
        static_df=static_df,
        static_vocab=_vocab(spark, ["F", "M"]),
        static_col="sex",
        min_seq_len=2,
    )
    rows = out.collect()
    assert [r["subject_id"] for r in rows] == [1]  # subject 2 filtered (P10)
    # static block starts after event_type block (offset 1 + 1 type = 2);
    # 'F' idx 1 → global 3 (slot 2 is the static block's UNK)
    assert rows[0]["static_indices"] == [3]
    assert rows[0]["time"] == [0.0, 60.0]


def test_pad_sequences_sides(spark):
    events = spark.createDataFrame(
        [
            (0, 1, _ts("2020-01-01 00:00:00"), "a"),
            (1, 1, _ts("2020-01-01 01:00:00"), "a"),
            (2, 2, _ts("2020-01-01 00:00:00"), "a"),
        ],
        "event_id long, subject_id long, timestamp timestamp, event_type string",
    )
    metadata = spark.createDataFrame(
        [], "metadata_id long, event_id long, measurement string, element string, value double"
    )
    base = tensorize(events, metadata, {"event_type": _vocab(spark, ["a"])})
    from eventstreamml_spark.export import pad_sequences

    right = {r["subject_id"]: r for r in pad_sequences(base, 4, "right").collect()}
    assert right[1]["time"] == [0.0, 60.0, 0.0, 0.0]
    assert right[1]["event_mask"] == [True, True, False, False]
    assert right[1]["dynamic_indices"] == [[1], [1], [], []]
    assert right[2]["event_mask"] == [True, False, False, False]

    left = {r["subject_id"]: r for r in pad_sequences(base, 4, "left").collect()}
    assert left[1]["time"] == [0.0, 0.0, 0.0, 60.0]
    assert left[1]["event_mask"] == [False, False, True, True]
    assert left[1]["dynamic_indices"] == [[], [], [1], [1]]

    # truncation: max_seq_len below the sequence length keeps the head
    trunc = {r["subject_id"]: r for r in pad_sequences(base, 1, "right").collect()}
    assert trunc[1]["time"] == [0.0] and trunc[1]["event_mask"] == [True]


def test_tensorize_tasks_windows(spark):
    events = spark.createDataFrame(
        [
            (0, 1, _ts("2020-01-01 00:00:00"), "a"),
            (1, 1, _ts("2020-01-01 06:00:00"), "a"),
            (2, 1, _ts("2020-01-02 00:00:00"), "a"),
            (3, 2, _ts("2020-01-01 00:00:00"), "a"),
        ],
        "event_id long, subject_id long, timestamp timestamp, event_type string",
    )
    metadata = spark.createDataFrame(
        [], "metadata_id long, event_id long, measurement string, element string, value double"
    )
    # two overlapping windows for subject 1 (event 1 is in both), one label col
    tasks = spark.createDataFrame(
        [
            (1, _ts("2020-01-01 00:00:00"), _ts("2020-01-01 12:00:00"), 1.0),
            (1, _ts("2020-01-01 03:00:00"), _ts("2020-01-02 12:00:00"), 0.0),
            (2, _ts("2020-01-05 00:00:00"), _ts("2020-01-06 00:00:00"), 1.0),  # no events
        ],
        "subject_id long, start_time timestamp, end_time timestamp, died double",
    )
    from eventstreamml_spark.export import tensorize_tasks

    out = tensorize_tasks(events, metadata, {"event_type": _vocab(spark, ["a"])}, tasks)
    rows = {r["task_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}  # empty window produces no sequence
    w1, w2 = rows[1], rows[2]
    assert w1["subject_id"] == 1 and w1["died"] == 1.0
    assert w1["time"] == [0.0, 360.0]            # events 0,1; minutes from window's first event
    assert w2["time"] == [0.0, 1080.0]           # events 1,2; event 1 replicated into both
    assert w2["died"] == 0.0
