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


def test_golden_reference_layout_parity(spark):
    """End-to-end rebuild of the reference's literal golden example
    (test_event_stream_pytorch_dataset.py:294-447 test_get_item, offsets
    pinned at :148-165): two subjects, six events, dynamic measurements
    [B_key(+B_val), A_col], time-dependent [age, time_of_day], static
    [buzz]. Asserts the EXACT global index space the reference computes:

        offsets  = {event_type:1, B_key:3, A_col:6, age:9,
                    time_of_day:10, buzz:15}, total vocab 18
        idxmap   = {event_type:1, B_key:2, A_col:3, age:4,
                    time_of_day:5, buzz:6}

    Vocabularies are built by the engine (build_vocabulary) from the
    same train data; only `buzz` is literal because its two elements tie
    in frequency and the reference breaks ties by first appearance while
    build_vocabulary pins ties alphabetically (documented deviation).
    """
    import pytest

    from eventstreamml_spark.preprocessing.functors import time_of_day, with_age
    from eventstreamml_spark.vocabulary import build_vocabulary

    subjects = spark.createDataFrame(
        [(1, "foo", _ts("2021-12-01 00:00:00")), (2, "bar", _ts("2020-12-01 00:00:00"))],
        "subject_id long, buzz string, dob timestamp",
    )
    events = spark.createDataFrame(
        [
            (0, 1, _ts("2022-12-01 00:00:00"), "A"),
            (1, 1, _ts("2022-12-02 14:00:00"), "B"),
            (2, 1, _ts("2022-12-03 10:00:00"), "A"),
            (3, 1, _ts("2022-12-04 23:00:00"), "A"),
            (4, 2, _ts("2022-12-01 15:00:00"), "A"),
            (5, 2, _ts("2022-12-02 02:00:00"), "B"),
        ],
        "event_id long, subject_id long, timestamp timestamp, event_type string",
    )
    # dynamic (user-supplied) long-format metadata; metadata_id orders
    # entries within an event (dynamic first — measurement order, then
    # input order within B_key)
    dynamic = [
        (0, 0, "A_col", "foo", None),
        (0, 1, "B_key", "a", 1.0),
        (1, 1, "B_key", "a", 2.0),
        (2, 1, "B_key", "a", 3.0),
        (3, 1, "B_key", "b", 4.0),
        (4, 1, "B_key", "b", 5.0),
        (0, 2, "A_col", "bar", None),
        (0, 3, "A_col", "foo", None),
        (0, 4, "A_col", "foo", None),
        (0, 5, "B_key", "a", 1.0),
        (1, 5, "B_key", "b", 5.0),
    ]
    md_dynamic = spark.createDataFrame(
        dynamic, "metadata_id long, event_id long, measurement string, element string, value double"
    )
    # time-dependent rows computed BY THE ENGINE's functors (U1), then
    # appended in long format after the dynamic entries (higher ids)
    func_src = with_age(events, subjects).withColumn("tod", time_of_day(F.col("timestamp")))
    md_age = func_src.select(
        F.lit(100).alias("metadata_id"),
        "event_id",
        F.lit("age").alias("measurement"),
        F.lit(None).cast("string").alias("element"),
        F.col("age").alias("value"),
    )
    md_tod = func_src.select(
        F.lit(101).alias("metadata_id"),
        "event_id",
        F.lit("time_of_day").alias("measurement"),
        F.col("tod").alias("element"),
        F.lit(None).cast("double").alias("value"),
    )
    metadata = md_dynamic.unionByName(md_age).unionByName(md_tod)

    # engine-built vocabularies from the same train split
    vocabs = {
        "event_type": build_vocabulary(events, "event_type"),  # A(4) > B(2)
        "B_key": build_vocabulary(
            md_dynamic.filter(F.col("measurement") == "B_key"), "element"
        ),  # a(4) > b(3)
        "A_col": build_vocabulary(
            md_dynamic.filter(F.col("measurement") == "A_col"), "element"
        ),  # foo(3) > bar(1)
        "age": _vocab(spark, []),  # numeric univariate: single-slot block
        "time_of_day": build_vocabulary(func_src, "tod"),
    }
    # buzz ties (foo:1, bar:1) — reference keeps first-appearance order
    buzz_vocab = _vocab(spark, ["foo", "bar"])

    out = {
        r["subject_id"]: r
        for r in tensorize(
            events,
            metadata,
            vocabs,
            static_df=subjects.select("subject_id", "buzz"),
            static_vocab=buzz_vocab,
            static_col="buzz",
        ).collect()
    }

    Y = 365.0 * 24  # hours per reference "year"
    ages_s1 = [1.0, 1 + 1 / 365 + 14 / Y, 1 + 2 / 365 + 10 / Y, 1 + 3 / 365 + 23 / Y]
    ages_s2 = [2 + 15 / Y, 2 + 1 / 365 + 2 / Y]

    s1 = out[1]
    assert s1["time"] == [0.0, (24 + 14) * 60.0, (2 * 24 + 10) * 60.0, (3 * 24 + 23) * 60.0]
    assert s1["static_indices"] == [16]
    assert s1["static_measurement_indices"] == [6]
    assert s1["dynamic_indices"] == [
        [1, 7, 9, 11],
        [2, 4, 4, 4, 5, 5, 9, 12],
        [1, 8, 9, 13],
        [1, 7, 9, 14],
    ]
    assert s1["dynamic_measurement_indices"] == [
        [1, 3, 4, 5],
        [1, 2, 2, 2, 2, 2, 4, 5],
        [1, 3, 4, 5],
        [1, 3, 4, 5],
    ]
    want_vals_s1 = [
        [None, None, ages_s1[0], None],
        [None, 1.0, 2.0, 3.0, 4.0, 5.0, ages_s1[1], None],
        [None, None, ages_s1[2], None],
        [None, None, ages_s1[3], None],
    ]
    for got_row, want_row in zip(s1["dynamic_values"], want_vals_s1):
        assert got_row == pytest.approx(want_row, rel=1e-12)

    s2 = out[2]
    assert s2["time"] == [0.0, 11 * 60.0]
    assert s2["static_indices"] == [17]
    assert s2["static_measurement_indices"] == [6]
    assert s2["dynamic_indices"] == [[1, 7, 9, 12], [2, 4, 5, 9, 11]]
    assert s2["dynamic_measurement_indices"] == [[1, 3, 4, 5], [1, 2, 2, 4, 5]]
    want_vals_s2 = [[None, None, ages_s2[0], None], [None, 1.0, 5.0, ages_s2[1], None]]
    for got_row, want_row in zip(s2["dynamic_values"], want_vals_s2):
        assert got_row == pytest.approx(want_row, rel=1e-12)


def test_tensorize_vocab_union_single_materialization(spark):
    """r12: all vocabularies (and the static vocab) materialize through
    ONE tagged-union localCheckpoint and block sizes come from one
    grouped collect — a vocab missing freq, an UNK-only vocab, and a
    name colliding with nothing must all keep the pre-union offset
    arithmetic."""
    events = spark.createDataFrame(
        [
            (0, 1, _ts("2020-01-01 00:00:00"), "admit"),
            (1, 1, _ts("2020-01-01 00:30:00"), "lab"),
        ],
        "event_id long, subject_id long, timestamp timestamp, event_type string",
    )
    metadata = spark.createDataFrame(
        [(0, 1, "labval", "hr", 70.0)],
        "metadata_id long, event_id long, measurement string, element string,"
        " value double",
    )
    # freq-less vocab exercises the null-padded union column
    nofreq = spark.createDataFrame(
        [("UNK", 0), ("hr", 1), ("bp", 2)], "element string, idx int"
    )
    # UNK-only vocab: block size 1, nothing maps into it
    unk_only = spark.createDataFrame([("UNK", 0.0, 0)],
                                     "element string, freq double, idx int")
    vocabs = {
        "event_type": _vocab(spark, ["admit", "lab"]),  # block [1,2]
        "labval": nofreq,                               # size 3 -> offset 3
        "emptyish": unk_only,                           # size 1 -> offset 6
    }
    static_df = spark.createDataFrame([(1, "F")], "subject_id long, sex string")
    static_vocab = _vocab(spark, ["F", "M"])
    out = {
        r["subject_id"]: r
        for r in tensorize(
            events, metadata, vocabs,
            static_df=static_df, static_vocab=static_vocab,
            static_col="sex",
        ).collect()
    }
    s1 = out[1]
    # admit -> 1; lab -> 2 then hr at labval offset 3 + idx 1 = 4
    assert s1["dynamic_indices"] == [[1], [2, 4]]
    # static block starts after emptyish (offset 6 + size 1 = 7): F idx1 -> 8
    assert s1["static_indices"] == [8]
    # emptyish occupies measurement index 3, static follows at 4
    assert s1["static_measurement_indices"] == [4]
