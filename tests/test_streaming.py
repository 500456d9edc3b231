"""Structured Streaming operators: file-source micro-batch runs with
memory sinks; maxFilesPerTrigger=1 forces multi-batch execution so
keyed state genuinely carries across micro-batches."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from eventstreamml_spark.streaming.ops import (
    canonicalize_stream,
    stream_inter_event_times,
    windowed_event_type_counts,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    """Two parquet files → two micro-batches (maxFilesPerTrigger=1)."""
    schema = "user long, t timestamp, et string"
    b1 = spark.createDataFrame(
        [
            (1, _ts("2020-01-01 00:00:00"), "a"),
            (1, _ts("2020-01-01 00:10:00"), "b"),
            (2, _ts("2020-01-01 00:05:00"), "a"),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (1, _ts("2020-01-01 01:00:00"), "a"),
            (2, _ts("2020-01-01 00:06:00"), "a"),
        ],
        schema,
    )
    d = str(tmp_path / "in")
    b1.coalesce(1).write.mode("append").parquet(d)
    b2.coalesce(1).write.mode("append").parquet(d)
    return d


def _run(stream_df, name, tmp_path, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_canonicalize_and_windowed_counts(spark, stream_dir, tmp_path):
    src = (
        spark.readStream.schema("user long, t timestamp, et string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    ev = canonicalize_stream(src, "evt", "user", "t")
    counts = windowed_event_type_counts(ev, "1 hour", "5 minutes")
    _run(counts, "win_counts", tmp_path, "complete")
    rows = {
        (r["window_start"].hour, r["event_type"]): r["n_events"]
        for r in spark.sql("select * from win_counts").collect()
    }
    # all canonicalized rows carry the literal event_type 'evt'
    assert rows == {(0, "evt"): 4, (1, "evt"): 1}


def test_stateful_inter_event_times_across_batches(spark, stream_dir, tmp_path):
    src = (
        spark.readStream.schema("user long, t timestamp, et string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    ev = canonicalize_stream(src, "evt", "user", "t")
    tte = stream_inter_event_times(ev)
    _run(tte, "tte_out", tmp_path, "append")
    got = {
        (r["subject_id"], r["timestamp"].isoformat()): r["tte"]
        for r in spark.sql("select * from tte_out").collect()
    }
    assert got[(1, "2020-01-01T00:00:00")] is None  # first-ever event
    assert got[(1, "2020-01-01T00:10:00")] == 10.0  # intra-batch diff
    assert got[(1, "2020-01-01T01:00:00")] == 50.0  # state across batches
    assert got[(2, "2020-01-01T00:05:00")] is None
    assert got[(2, "2020-01-01T00:06:00")] == 1.0   # cross-batch, subject 2
    assert len(got) == 5
