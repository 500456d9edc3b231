"""Corpus-curation operators: golden semantics on tiny literal inputs
(chunk boundary math, offset-binning packing, quota determinism,
contamination totality, redaction ordering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstreamml_spark.operators.curation import (
    chunk_documents,
    ngram_contamination,
    pack_documents,
    quota_sample,
    redact_pii,
    redacted_text,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_redaction_email_before_digits(spark):
    # digits inside the address must vanish with the address, not
    # leave a partial run that then matches the digit rule
    df = _docs(
        spark,
        [
            (1, "mail me at user123456789@example.com or call 5551234567890", "en", "a"),
            (2, "clean text with no pii at all", "en", "a"),
        ],
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_digit_runs"] == 1
    assert out[2]["n_emails"] == 0 and out[2]["n_digit_runs"] == 0
    txt = df.filter("doc_id = 1").select(
        redacted_text(F.col("text")).alias("t")
    ).collect()[0]["t"]
    assert txt == "mail me at <EMAIL> or call <NUMBER>"


def test_chunk_boundaries_exact(spark):
    # len 1000, chunk 500, stride 400 -> starts 0,400,800 (ceil((1000-500)/400)+1 = 3)
    df = _docs(spark, [(1, "x" * 1000, "en", "a"), (2, "y" * 10, "en", "a")])
    rows = chunk_documents(df, chunk_chars=500, stride=400).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(r["chunk_no"] for r in by_doc[1]) == [0, 1, 2]
    assert sorted(r["chunk_len"] for r in by_doc[1]) == [200, 500, 500]
    # short doc: one chunk, its own length
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_len"] == 10


def test_chunk_full_coverage_and_overlap(spark):
    text = "".join(chr(97 + i % 26) for i in range(1234))
    df = _docs(spark, [(1, text, "en", "a")])
    rows = chunk_documents(df, chunk_chars=500, stride=400, keep_text=True).collect()
    covered = set()
    for r in rows:
        start = r["chunk_no"] * 400
        assert r["chunk_text"] == text[start : start + 500]
        covered.update(range(start, start + r["chunk_len"]))
    assert covered == set(range(len(text)))


def test_chunk_rejects_bad_stride(spark):
    df = _docs(spark, [(1, "abc", "en", "a")])
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=100, stride=200)


def test_pack_offset_binning(spark):
    # source a: docs of 1000 tokens each, capacity 2048:
    # starts 0,1000,2000,3000 -> packs 0,0,0,1 — a doc may straddle the
    # capacity boundary (split at tokenization), bins stay full
    rows = [(i, " ".join(["w"] * 1000), "en", "a") for i in range(4)]
    rows += [(10, " ".join(["w"] * 5000), "en", "b")]  # longer than capacity
    df = _docs(spark, rows)
    out = {r["doc_id"]: r for r in pack_documents(df, capacity_tokens=2048).collect()}
    assert [out[i]["pack_id"] for i in range(4)] == [0, 0, 0, 1]
    assert [out[i]["start_offset"] for i in range(4)] == [0, 1000, 2000, 3000]
    # strata are independent
    assert out[10]["pack_id"] == 0 and out[10]["start_offset"] == 0


def test_quota_sample_deterministic_and_capped(spark):
    rows = [(i, f"doc {i}", "en" if i % 2 else "fr", "a") for i in range(40)]
    df = _docs(spark, rows)
    a = sorted((r["lang"], r["doc_id"], r["rk"]) for r in quota_sample(df, k=3).collect())
    b = sorted((r["lang"], r["doc_id"], r["rk"]) for r in quota_sample(df, k=3).collect())
    assert a == b and len(a) == 6
    assert all(rk <= 3 for _, _, rk in a)
    # widening k keeps the prefix: rank order is content-free md5(id)
    wide = sorted((r["lang"], r["doc_id"]) for r in quota_sample(df, k=10).collect() if r["rk"] <= 3)
    assert wide == [(l, d) for l, d, _ in a]


def test_contamination_total_and_flagged(spark):
    shared = "alpha beta gamma delta epsilon"
    docs = _docs(
        spark,
        [
            (1, f"{shared} and some unique tail words here", "en", "a"),
            (2, "completely different content with zero overlap at all", "en", "a"),
        ],
    )
    bench = _docs(spark, [(100, f"prefix words then {shared} closing", "en", "b")])
    out = {r["doc_id"]: r for r in ngram_contamination(docs, bench, k=4, min_shared=2).collect()}
    # "alpha beta gamma delta" and "beta gamma delta epsilon" are shared
    assert out[1]["n_shared"] == 2 and out[1]["contaminated"]
    assert out[2]["n_shared"] == 0 and not out[2]["contaminated"]
    assert set(out) == {1, 2}  # zero-overlap doc still present


def test_resample_ffill_golden(spark):
    """Grid spans hour-truncated first obs → last obs; on-grid
    observations are included at their grid point; values carry
    forward across gaps; simultaneous obs resolve to the max."""
    import datetime

    from eventstreamml_spark.operators.windows import resample_ffill

    ts = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, ts("2020-01-01 00:30:00"), 10.0),
            (1, ts("2020-01-01 02:00:00"), 20.0),  # exactly on grid
            (1, ts("2020-01-01 02:00:00"), 30.0),  # simultaneous: max wins
            (1, ts("2020-01-01 04:10:00"), None),  # null obs: no reset
        ],
        "subject_id long, timestamp timestamp, value double",
    )
    out = {
        r["timestamp"].isoformat(): r["value"]
        for r in resample_ffill(df, step="1 hour").collect()
    }
    assert out == {
        "2020-01-01T00:00:00": None,  # before first obs
        "2020-01-01T01:00:00": 10.0,
        "2020-01-01T02:00:00": 30.0,  # on-grid obs included, max of ties
        "2020-01-01T03:00:00": 30.0,  # carried across the gap
        "2020-01-01T04:00:00": 30.0,
    }


def test_zorder_interleave_golden(spark):
    """Morton golden values and the pruning property: rows inside one
    z-range quadrant stay inside the matching x/y box."""
    from eventstreamml_spark.functions.layout import zorder_key

    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x long, y long"
    )
    rows = df.select("x", "y", zorder_key(F.col("x"), F.col("y"), bits=3).alias("z")).collect()
    z = {(r["x"], r["y"]): r["z"] for r in rows}
    assert z[(0, 0)] == 0 and z[(1, 0)] == 1 and z[(0, 1)] == 2 and z[(1, 1)] == 3
    assert z[(7, 7)] == 63 and z[(2, 0)] == 4 and z[(0, 2)] == 8
    # quadrant property: z in [0,16) <=> x,y both in [0,4)
    for (x, y), zz in z.items():
        assert (zz < 16) == (x < 4 and y < 4)


def test_dp_noise_distribution_and_determinism(spark):
    """Seeded Laplace noise: deterministic across runs, zero-mean-ish
    over many groups, scale consistent with 1/epsilon."""
    import math

    from eventstreamml_spark.operators.quality import dp_noisy_counts

    df = spark.createDataFrame([(f"g{i}",) for i in range(2000)], "g string")
    out1 = dp_noisy_counts(df, ["g"], epsilon=1.0, seed=7).collect()
    out2 = dp_noisy_counts(df, ["g"], epsilon=1.0, seed=7).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # deterministic
    noise = [r["noisy_count"] - r["true_count"] for r in out1]
    mean = sum(noise) / len(noise)
    mad = sum(abs(x) for x in noise) / len(noise)  # E|X| = b = 1/eps
    assert abs(mean) < 0.15
    assert 0.8 < mad < 1.2
    # different seed -> different noise
    out3 = dp_noisy_counts(df, ["g"], epsilon=1.0, seed=8).collect()
    assert sorted(map(tuple, out1)) != sorted(map(tuple, out3))
    # tighter epsilon -> larger noise scale
    wide = dp_noisy_counts(df, ["g"], epsilon=0.1, seed=7).collect()
    mad_wide = sum(abs(r["noisy_count"] - r["true_count"]) for r in wide) / len(wide)
    assert mad_wide > 5 * mad


def test_mixture_weights_temperature_limits(spark):
    from eventstreamml_spark.operators.curation import mixture_weights

    docs = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)], "doc_id long, source string"
    )
    t1 = {r["source"]: r for r in mixture_weights(docs, temperature=1.0).collect()}
    assert abs(t1["big"]["expected_share"] - 0.9) < 1e-6  # tau=1: natural
    t100 = {r["source"]: r for r in mixture_weights(docs, temperature=100.0).collect()}
    assert abs(t100["big"]["expected_share"] - 0.5) < 0.02  # tau->inf: uniform
    t2 = {r["source"]: r for r in mixture_weights(docs, temperature=2.0).collect()}
    assert 0.5 < t2["big"]["expected_share"] < 0.9  # in between
    assert t2["small"]["upweight"] > 1.0 > t2["big"]["upweight"]


def test_table_diff_statuses(spark):
    from eventstreamml_spark.operators.quality import table_diff

    before = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k long, s string, v double"
    )
    after = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", 99.0), (4, "d", 4.0)], "k long, s string, v double"
    )
    got = {r["k"]: r["status"] for r in table_diff(before, after, ["k"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged drops out


def test_table_diff_null_patterns_not_confused(spark):
    from eventstreamml_spark.operators.quality import table_diff

    before = spark.createDataFrame([(1, "a", None)], "k long, x string, y string")
    after = spark.createDataFrame([(1, None, "a")], "k long, x string, y string")
    got = [r["status"] for r in table_diff(before, after, ["k"]).collect()]
    assert got == ["changed"]  # concat_ws would have silently matched


def test_pps_sample_size_and_weighting(spark):
    from eventstreamml_spark.operators.setops import pps_systematic_sample

    # 1000 docs: 990 light (size 10), 10 heavy (size 1000)
    rows = [(i, 10) for i in range(990)] + [(1000 + i, 1000) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = pps_systematic_sample(df, n_target=100, size_col="n_chars").collect()
    n = len(out)
    # total=19900, step=199: each light doc crosses w/step ~ 5% of grid
    # lines (~50 selected); each heavy doc spans ~5 steps but counts
    # once -> doc count is BELOW the 100 grid crossings by design
    assert 45 <= n <= 75
    heavy = sum(1 for r in out if r["doc_id"] >= 1000)
    # every heavy doc (size >= step) is selected with certainty
    assert heavy == 10
    # deterministic across runs
    out2 = pps_systematic_sample(df, n_target=100, size_col="n_chars").collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in out2)
