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


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    """Duplicates arriving in the SAME and in LATER micro-batches (within
    the watermark) are suppressed; first occurrence wins."""
    from eventstreamml_spark.streaming.ops import stream_exact_dedup

    schema = "event_id long, user long, t timestamp, et string"
    b1 = spark.createDataFrame(
        [
            (1, 1, _ts("2020-01-01 00:00:00"), "a"),
            (1, 1, _ts("2020-01-01 00:00:00"), "a"),  # in-batch dup
            (2, 1, _ts("2020-01-01 00:01:00"), "b"),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (2, 1, _ts("2020-01-01 00:01:00"), "b"),  # cross-batch dup
            (3, 2, _ts("2020-01-01 00:02:00"), "a"),
        ],
        schema,
    )
    d = str(tmp_path / "dedup_in")
    b1.coalesce(1).write.mode("append").parquet(d)
    b2.coalesce(1).write.mode("append").parquet(d)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stream_exact_dedup(src, ["event_id"], watermark_delay="1 hour", ts_col="t")
    _run(out, "dedup_out", tmp_path, "append")
    rows = spark.sql("select * from dedup_out").collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]


def test_sessionize_gap_semantics(spark, tmp_path):
    """Events strictly within the gap merge; a gap-length pause closes
    the session; session end = last event + gap. Sessions also merge
    across micro-batches."""
    from eventstreamml_spark.streaming.ops import sessionize

    schema = "subject_id long, timestamp timestamp"
    b1 = spark.createDataFrame(
        [
            (1, _ts("2020-01-01 00:00:00")),
            (1, _ts("2020-01-01 00:20:00")),  # merges (20 < 30)
            (2, _ts("2020-01-01 00:00:00")),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (1, _ts("2020-01-01 00:40:00")),  # merges with 00:20 session
            (1, _ts("2020-01-01 02:00:00")),  # new session (>= gap)
        ],
        schema,
    )
    d = str(tmp_path / "sess_in")
    b1.coalesce(1).write.mode("append").parquet(d)
    b2.coalesce(1).write.mode("append").parquet(d)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = sessionize(src, gap="30 minutes", watermark_delay="10 minutes")
    _run(out, "sess_out", tmp_path, "complete")
    got = {
        (r["subject_id"], r["session_start"].isoformat()): (
            r["session_end"].isoformat(),
            r["n_events"],
        )
        for r in spark.sql("select * from sess_out").collect()
    }
    assert got[(1, "2020-01-01T00:00:00")] == ("2020-01-01T01:10:00", 3)
    assert got[(1, "2020-01-01T02:00:00")] == ("2020-01-01T02:30:00", 1)
    assert got[(2, "2020-01-01T00:00:00")] == ("2020-01-01T00:30:00", 1)
    assert len(got) == 3


def test_stateful_ops_run_on_rocksdb_state_store(spark, stream_dir, tmp_path):
    """ST3-ST5 production state store (session.py defaults): the session
    pins the RocksDB provider + changelog checkpointing, and a stateful
    query actually materializes RocksDB state artifacts (zip snapshots /
    changelogs) in its checkpoint — not the HDFS provider's .delta
    files."""
    import pathlib

    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass").endswith(
            "RocksDBStateStoreProvider"
        )
    )

    src = (
        spark.readStream.schema("user long, t timestamp, et string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    ev = canonicalize_stream(src, "evt", "user", "t")
    tte = stream_inter_event_times(ev)  # applyInPandasWithState (ST3)
    _run(tte, "rocksdb_tte", tmp_path, "append")
    assert spark.sql("select * from rocksdb_tte").count() == 5

    state = pathlib.Path(tmp_path / "ckpt_rocksdb_tte" / "state")
    files = [p.name for p in state.rglob("*") if p.is_file()]
    assert files, "no state files checkpointed"
    rocks = [f for f in files if f.endswith((".zip", ".changelog"))]
    hdfs_delta = [f for f in files if f.endswith(".delta")]
    assert rocks and not hdfs_delta, f"state files not RocksDB-shaped: {files[:10]}"


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data contract (SURVEY §2.8): an event arriving after the
    watermark has passed its window's end is EXCLUDED from the
    append-mode windowed histogram; an in-horizon straggler is merged.

    Two runs share one checkpoint so the watermark advance is a hard
    batch boundary (a single availableNow listing can fuse files into
    one micro-batch, which would never exercise the drop): run 1 sees
    event time up to 02:00 (watermark 01:50 at 10-minute delay); run 2
    delivers one event for the already-finalized 00:00-01:00 window
    (dropped) and one for the still-open 01:00-02:00 window (counted).
    """
    schema = "user long, t timestamp, et string"
    d = str(tmp_path / "late_in")
    ckpt = str(tmp_path / "ckpt_late")

    out_dir = str(tmp_path / "late_out")

    def run_once():
        # file sink: the only sink with checkpoint recovery in append mode
        src = spark.readStream.schema(schema).parquet(d)
        ev = canonicalize_stream(src, "evt", "user", "t")
        counts = windowed_event_type_counts(ev, "1 hour", "10 minutes")
        q = (
            counts.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [
            (1, _ts("2020-01-01 00:10:00"), "a"),
            (1, _ts("2020-01-01 02:00:00"), "a"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(d)
    run_once()

    spark.createDataFrame(
        [
            (2, _ts("2020-01-01 00:20:00"), "a"),  # late: window finalized
            (2, _ts("2020-01-01 01:30:00"), "a"),  # straggler: still open
            (2, _ts("2020-01-01 03:00:00"), "a"),  # advances the watermark
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(d)
    run_once()

    got = {
        r["window_start"].hour: r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    # hour 0 finalized with ONLY the on-time event (late arrival gone);
    # hour 1 includes the straggler; hours 2-3 still open (not emitted)
    assert got == {0: 1, 1: 1}


def test_stream_interval_join_pairs_and_bounds(spark, tmp_path):
    """ST7: purchases pair with same-key clicks strictly inside the
    lookback window — boundary clicks at exactly -30min are kept,
    clicks at the purchase instant or after it are not."""
    from eventstreamml_spark.streaming.ops import stream_interval_join

    schema = "k long, pts timestamp, pid long"
    purchases = spark.createDataFrame(
        [(1, _ts("2020-01-01 01:00:00"), 100)], schema
    )
    clicks = spark.createDataFrame(
        [
            (1, _ts("2020-01-01 00:30:00"), 1),  # exactly lookback ago: kept
            (1, _ts("2020-01-01 00:29:59"), 2),  # too old: dropped
            (1, _ts("2020-01-01 00:59:00"), 3),  # inside: kept
            (1, _ts("2020-01-01 01:00:00"), 4),  # simultaneous: dropped
            (2, _ts("2020-01-01 00:59:00"), 5),  # other key: dropped
        ],
        "k long, cts timestamp, cid long",
    )
    pdir, cdir = str(tmp_path / "p"), str(tmp_path / "c")
    purchases.coalesce(1).write.parquet(pdir)
    clicks.coalesce(1).write.parquet(cdir)
    ps = spark.readStream.schema("k long, pts timestamp, pid long").parquet(pdir)
    cs = spark.readStream.schema("k long, cts timestamp, cid long").parquet(cdir)
    joined = stream_interval_join(
        ps, cs, key="k", left_ts="pts", right_ts="cts", lookback="30 minutes"
    )
    _run(joined, "ivj", tmp_path, "append")
    rows = spark.table("ivj").collect()
    assert sorted(r["cid"] for r in rows) == [1, 3]
    assert all(r["pid"] == 100 and r["k"] == 1 for r in rows)


def test_stream_interval_left_outer_emits_unmatched(spark, tmp_path):
    """leftOuter: a purchase with no preceding click emits with null
    right columns once the watermark clears its window — driven by a
    second, much-later batch advancing the watermark."""
    from eventstreamml_spark.streaming.ops import stream_interval_join

    pdir, cdir = str(tmp_path / "p"), str(tmp_path / "c")
    pschema, cschema = "k long, pts timestamp, pid long", "k long, cts timestamp, cid long"
    # batch 1: one matched purchase, one unmatched
    spark.createDataFrame(
        [(1, _ts("2020-01-01 01:00:00"), 100), (2, _ts("2020-01-01 01:00:00"), 200)],
        pschema,
    ).coalesce(1).write.mode("append").parquet(pdir)
    spark.createDataFrame(
        [(1, _ts("2020-01-01 00:45:00"), 1)], cschema
    ).coalesce(1).write.mode("append").parquet(cdir)
    # batch 2: far-future rows push the watermark past batch 1's windows
    spark.createDataFrame(
        [(9, _ts("2020-01-02 00:00:00"), 900)], pschema
    ).coalesce(1).write.mode("append").parquet(pdir)
    spark.createDataFrame(
        [(9, _ts("2020-01-02 00:00:00"), 9)], cschema
    ).coalesce(1).write.mode("append").parquet(cdir)

    ps = spark.readStream.schema(pschema).option("maxFilesPerTrigger", "1").parquet(pdir)
    cs = spark.readStream.schema(cschema).option("maxFilesPerTrigger", "1").parquet(cdir)
    joined = stream_interval_join(
        ps, cs, key="k", left_ts="pts", right_ts="cts",
        lookback="30 minutes", how="leftOuter",
    )
    _run(joined, "ivj_outer", tmp_path, "append")
    rows = {r["pid"]: r["cid"] for r in spark.table("ivj_outer").collect()}
    assert rows[100] == 1       # matched pair
    assert 200 in rows and rows[200] is None  # unmatched, emitted on watermark pass


def test_observed_metrics_surface_per_batch(spark, stream_dir, tmp_path):
    from eventstreamml_spark.streaming.ops import with_ingest_metrics

    src = (
        spark.readStream.schema("user long, t timestamp, et string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    observed = with_ingest_metrics(src, ts_col="t", value_col=None)
    q = _run(observed.groupBy("et").count(), "obs_metrics", tmp_path, "complete")
    rows_seen = [
        p.observedMetrics["ingest_metrics"]["n_rows"]
        for p in q.recentProgress
        if "ingest_metrics" in p.observedMetrics
    ]
    # two micro-batches (3 rows then 2), surfaced without a second scan
    assert sorted(rows_seen) == [2, 3]


def test_incremental_count_mv_multi_batch_and_replay_base(spark, tmp_path):
    from eventstreamml_spark.streaming.ops import incremental_count_mv, read_count_mv

    schema = "user long, t timestamp, et string"
    rows = [
        (1, _ts("2020-01-01 00:00:00"), "a"),
        (1, _ts("2020-01-01 00:10:00"), "b"),
        (2, _ts("2020-01-01 00:05:00"), "a"),
        (1, _ts("2020-01-01 01:00:00"), "a"),
        (2, _ts("2020-01-01 00:06:00"), "b"),
    ]
    d = str(tmp_path / "mv_in")
    for r in rows:  # five files -> five micro-batches
        spark.createDataFrame([r], schema).coalesce(1).write.mode("append").parquet(d)
    src = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    mv = str(tmp_path / "mv_out")
    q = incremental_count_mv(
        src, mv, ["et"], checkpoint_dir=str(tmp_path / "mv_ckpt")
    )
    q.awaitTermination(120)
    got = {r["et"]: r["n"] for r in read_count_mv(spark, mv).collect()}
    assert got == {"a": 3, "b": 2}

    # append one more file and resume from the same checkpoint: the MV
    # advances incrementally (no reprocessing of the first five batches)
    spark.createDataFrame(
        [(3, _ts("2020-01-01 02:00:00"), "a")], schema
    ).coalesce(1).write.mode("append").parquet(d)
    src2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q2 = incremental_count_mv(
        src2, mv, ["et"], checkpoint_dir=str(tmp_path / "mv_ckpt")
    )
    q2.awaitTermination(120)
    got2 = {r["et"]: r["n"] for r in read_count_mv(spark, mv).collect()}
    assert got2 == {"a": 4, "b": 2}


def test_stream_ewma_matches_batch_fold_across_batches(spark, stream_dir, tmp_path):
    from eventstreamml_spark.streaming.ops import stream_ewma

    # value rides in as the epoch-minute of t so the fold is nontrivial
    src = (
        spark.readStream.schema("user long, t timestamp, et string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .withColumn("v", F.unix_timestamp("t").cast("double") / 60.0)
    )
    out = stream_ewma(src, alpha=0.5, subject_col="user", ts_col="t", value_col="v")
    q = _run(out, "ewma_sink", tmp_path, "update")
    sink = spark.table("ewma_sink")
    final = {
        r["subject_id"]: (r["n_obs"], r["ewma"])
        for r in sink.orderBy("n_obs").collect()  # later updates overwrite
    }
    # batch replica over the same rows
    batch = (
        spark.read.parquet(stream_dir)
        .withColumn("v", F.unix_timestamp("t").cast("double") / 60.0)
        .orderBy("user", "t")
        .collect()
    )
    import collections

    exp = {}
    cnt = collections.Counter()
    for r in batch:
        u, v = r["user"], r["v"]
        exp[u] = v if u not in exp else exp[u] * 0.5 + 0.5 * v
        cnt[u] += 1
    for u, (n, s) in final.items():
        assert n == cnt[u]
        assert abs(s - exp[u]) < 1e-9


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(), reason="transformWithState needs google.protobuf"
)
def test_transform_with_state_running_counts(spark, stream_dir, tmp_path):
    from eventstreamml_spark.streaming.ops import stream_running_counts_tws

    src = (
        spark.readStream.schema("user long, t timestamp, et string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .withColumn("value", F.col("user").cast("double"))
    )
    out = stream_running_counts_tws(src, subject_col="user", value_col="value")
    _run(out, "tws_counts", tmp_path, "update")
    sink = spark.table("tws_counts")
    final = {}
    for r in sink.orderBy("n_events").collect():  # later updates win
        final[r["subject_id"]] = (r["n_events"], r["sum_value"])
    # subject 1: 3 events (2 in batch1, 1 in batch2) — state carries over
    assert final[1] == (3, 3.0)
    assert final[2] == (2, 4.0)


@pytest.mark.skipif(_has_protobuf(), reason="raise-path only without protobuf")
def test_transform_with_state_raises_early_without_protobuf(spark):
    from eventstreamml_spark.streaming.ops import stream_running_counts_tws

    src = spark.readStream.format("rate").load().withColumn(
        "subject_id", F.col("value") % 5
    )
    with pytest.raises(ImportError, match="protobuf"):
        stream_running_counts_tws(src, value_col="value")


def test_state_operator_metrics_in_progress(spark, tmp_path):
    """Observability: stateOperators in StreamingQueryProgress report
    state row counts and memory for the sessionization aggregation —
    the numbers a production alert watches for state-store growth."""
    from eventstreamml_spark.streaming.ops import sessionize

    schema = "subject_id long, timestamp timestamp"
    d = str(tmp_path / "met_in")
    spark.createDataFrame(
        [(i % 7, _ts("2020-01-01 00:00:00")) for i in range(20)], schema
    ).coalesce(1).write.mode("append").parquet(d)
    src = spark.readStream.schema(schema).parquet(d)
    out = sessionize(src, gap="30 minutes", watermark_delay="5 minutes")
    q = _run(out, "met_out", tmp_path, "complete")
    ops = [op for p in q.recentProgress for op in p.stateOperators]
    assert ops, "no stateOperators reported"
    assert any(op["operatorName"] == "sessionWindowStateStoreSaveExec" for op in ops)
    assert any(op["numRowsTotal"] == 7 for op in ops)  # one session per subject
