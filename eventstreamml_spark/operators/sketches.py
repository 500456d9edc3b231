"""Mergeable frequency sketches (declared-new engine extension).

A count-min sketch is the bounded-memory answer to "how often does X
occur" over a stream or a 100 TB table: d hash rows × w counters,
point estimates overestimate by at most ε·N with probability 1−δ
(w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉). Unlike an exact groupBy the sketch is
FIXED-SIZE — two sketches merge by cell-wise addition, so partial
sketches combine map-side and the shuffle moves d·w counters, not the
key universe.

Hashes are the engine's portable md5 convention (seeded, replayable
in ANSI SQL), so estimates are bit-identical across engines — the
DuckDB oracle replays the whole sketch, not just its contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(x: Column, i: int, seed: int, width: int) -> Column:
    """Portable row-``i`` hash bucket: first 8 md5 hex chars of
    ``"{x}#{seed}#{i}"`` as an int, mod width. Replayable in DuckDB as
    ``('0x'||substr(md5(x||'#seed#i'),1,8))::BIGINT % width``."""
    h = F.md5(F.concat_ws("#", x.cast("string"), F.lit(str(seed)), F.lit(str(i))))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).alias("b")


def cms_build(
    df: DataFrame,
    col: str,
    width: int = 256,
    depth: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Build a count-min sketch of ``df[col]`` as a (row:int,
    bucket:long, cnt:long) relation of at most ``depth·width`` rows.

    One groupBy on (row, bucket) — map-side partial aggregation
    collapses every task's contribution to ≤ d·w rows before the
    exchange, so the shuffle is O(d·w·tasks) regardless of input size
    or key skew. Null inputs are skipped (count-min counts
    occurrences of values, not rows).
    """
    x = F.col(col)
    hashed = df.filter(x.isNotNull()).select(
        F.posexplode(
            F.array(*[_bucket(x, i, seed, width) for i in range(depth)])
        ).alias("row", "bucket")
    )
    return hashed.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    probe_col: str,
    width: int = 256,
    depth: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Point-estimate each probe value against a built sketch:
    est(x) = min_i cnt[i, h_i(x)] (0 when a bucket was never hit).
    Overestimates only: est ≥ true count always, and est ≤ true +
    ε·N with the standard (w, d) guarantees. Broadcast-joins the
    (tiny, fixed-size) sketch to the probe set — no shuffle on the
    probe side."""
    x = F.col(probe_col)
    pb = probes.select(
        x.alias("probe"),
        F.posexplode(
            F.array(*[_bucket(x, i, seed, width) for i in range(depth)])
        ).alias("row", "bucket"),
    )
    return (
        pb.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy("probe")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
