"""Ingestion builders (S1-S4) + EventStreamDataset construction (E1) +
persistence (S5) — golden-frame style per reference tests
(test_event_stream_dataset.py:364-495)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from eventstreamml_spark.dataset import EventStreamDataset
from eventstreamml_spark.sources.ingest import (
    backfill_metadata,
    explode_metadata,
    nest_metadata,
    to_events,
    to_events_and_metadata,
)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def raw(spark):
    return spark.createDataFrame(
        [
            (2, "2020-01-01 08:00:00", 7.0, "x"),
            (1, "2020-01-01 09:30:00", 8.5, "y"),
            (1, "2020-01-01 07:00:00", None, "z"),
        ],
        "subj long, t string, val double, code string",
    )


def test_to_events_shapes(raw):
    ev = to_events(raw, "lab", "subj", "t", ["val", "code"])
    assert ev.columns == ["subject_id", "timestamp", "event_type", "metadata"]
    rows = ev.orderBy("subject_id", "timestamp").collect()
    assert [r["event_type"] for r in rows] == ["lab"] * 3
    assert [m.asDict() for m in rows[0]["metadata"]] == [{"val": None, "code": "z"}]
    assert isinstance(rows[0]["timestamp"], datetime.datetime)


def test_to_events_and_metadata_shared_dense_ids(raw):
    ev, md = to_events_and_metadata(raw, "lab", "subj", "t", ["val", "code"])
    ev_rows = ev.orderBy("event_id").collect()
    # dense 0..n-1 over (subject, timestamp)
    assert [r["event_id"] for r in ev_rows] == [0, 1, 2]
    assert [r["subject_id"] for r in ev_rows] == [1, 1, 2]
    md_rows = md.orderBy("metadata_id").collect()
    assert [(r["event_id"], r["event_type"], r["subject_id"]) for r in md_rows] == [
        (0, "lab", 1),
        (1, "lab", 1),
        (2, "lab", 2),
    ]
    # joined back, values land on the right event
    j = {r["event_id"]: r["code"] for r in ev.join(md.select("event_id", "code"), "event_id").collect()}
    assert j == {0: "z", 1: "y", 2: "x"}


def test_backfill_metadata(spark, raw):
    ev, _ = to_events_and_metadata(raw, "lab", "subj", "t")
    md = spark.createDataFrame([(0, 1.5), (2, 2.5)], "event_id long, m double")
    out = backfill_metadata(md, ev).orderBy("event_id").collect()
    assert [(r["event_id"], r["event_type"], r["subject_id"], r["m"]) for r in out] == [
        (0, "lab", 1, 1.5),
        (2, "lab", 2, 2.5),
    ]


def test_explode_and_nest_roundtrip(spark):
    ev = spark.createDataFrame(
        [
            (0, 1, _ts("2020-01-01 07:00:00"), "lab", [(1.0, "a"), (2.0, "b")]),
            (1, 1, _ts("2020-01-01 09:00:00"), "lab", []),
            (2, 2, _ts("2020-01-01 08:00:00"), "lab", [(3.0, "c")]),
        ],
        "event_id long, subject_id long, timestamp timestamp, event_type string, "
        "metadata array<struct<val double, code string>>",
    )
    flat, md = explode_metadata(ev)
    assert "metadata" not in flat.columns
    md_rows = md.orderBy("metadata_id").collect()
    # dense metadata_id ordered by (event_id, position-within-event)
    assert [(r["metadata_id"], r["event_id"], r["val"]) for r in md_rows] == [
        (0, 0, 1.0),
        (1, 0, 2.0),
        (2, 2, 3.0),
    ]
    # event 1 (no measurements) exists in events, absent from metadata
    assert md.filter(F.col("event_id") == 1).count() == 0

    nested = nest_metadata(flat, md)
    got = {r["event_id"]: r["metadata"] for r in nested.collect()}
    assert [m["val"] for m in got[0]] == [1.0, 2.0]
    assert got[1] == []  # left join keeps measurement-less events
    assert [m["code"] for m in got[2]] == ["c"]


def test_dataset_construction_sorts_and_derives(spark, raw):
    subjects = spark.createDataFrame([(1, "F"), (2, "M"), (3, "F")], "subject_id long, sex string")
    ev = to_events(raw, "lab", "subj", "t", ["val", "code"])
    ds = EventStreamDataset(ev, subjects=subjects)
    rows = ds.events.collect()
    # sorted by (subject, ts); surrogate ids assigned over that order
    assert [(r["event_id"], r["subject_id"]) for r in rows] == [(0, 1), (1, 1), (2, 2)]
    # nested metadata got exploded into the flat relation + backfilled keys
    md = ds.metadata.orderBy("metadata_id").collect()
    assert [r["code"] for r in md] == ["z", "y", "x"]
    assert [r["subject_id"] for r in md] == [1, 1, 2]
    # derived aggregates
    assert ds.event_types().collect()[0]["n_events"] == 3
    counts = {r["subject_id"]: r["n_events"] for r in ds.n_events_per_subject().collect()}
    assert counts == {1: 2, 2: 1, 3: 0}  # zero-event subject included


def test_dataset_metadata_view_filters_and_null_drop(spark):
    ev = spark.createDataFrame(
        [(0, 1, _ts("2020-01-01"), "a"), (1, 2, _ts("2020-01-02"), "b")],
        "event_id long, subject_id long, timestamp timestamp, event_type string",
    )
    md = spark.createDataFrame(
        [(0, 0, "a", 1, 1.0, None), (1, 1, "b", 2, None, None)],
        "metadata_id long, event_id long, event_type string, subject_id long, hr double, dead double",
    )
    ds = EventStreamDataset(ev, metadata=md)
    v = ds.metadata_view(event_types=["a"], drop_null_cols=True)
    assert v.count() == 1 and "dead" not in v.columns and "hr" in v.columns
    r = ds.restrict_subjects(spark.createDataFrame([(2,)], "subject_id long"))
    assert r.events.count() == 1 and r.metadata.count() == 1


def test_dataset_save_load_roundtrip(spark, raw, tmp_path):
    ev = to_events(raw, "lab", "subj", "t", ["val"])
    ds = EventStreamDataset(ev)
    path = str(tmp_path / "ds")
    ds.save(path, partition_events_by_subject_bucket=4)
    back = EventStreamDataset.load(spark, path)
    assert back.events.count() == 3
    assert sorted(back.events.columns) == sorted(ds.events.columns)
    assert back.metadata.count() == ds.metadata.count()
