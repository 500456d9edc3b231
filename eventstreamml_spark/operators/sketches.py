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


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    by: str,
    probs: list[float] = (0.5, 0.95, 0.99),
    bins_per_e: int = 20,
) -> DataFrame:
    """Log-binned mergeable quantile sketch: per-group quantile
    ESTIMATES with bounded relative error from a fixed-size histogram —
    the cluster-scale alternative to exact percentiles, whose sort (or
    full-value shuffle) is the thing that dies at 100 TB.

    Positive values land in bin ⌊ln(x)·k⌋ (k = ``bins_per_e`` bins per
    e-fold, so every estimate is within a factor e^(1/2k) ≈ 2.5% of the
    truth at k=20); the per-group histogram is the sketch — it merges
    by bucket addition (map-side combined), its size is bounded by the
    value range's log-span, and it never holds raw values. Quantile p
    reads off the first bin whose cumulative count reaches ⌈p·n⌉, and
    the estimate is the bin's geometric midpoint e^((bin+0.5)/k).

    Plan shape: one groupBy builds the histograms; the cumulative
    window, the probs fan-out, and the min-bin pick all run on the
    histogram relation (|groups|·|bins| rows), never the data. Zero
    and negative values are counted and reported (n_nonpos) but not
    binned — a log sketch's domain is (0, ∞) and silently folding
    them would corrupt the tails."""
    from pyspark.sql import Window as W

    x = F.col(value_col).cast("double")
    pos = df.select(F.col(by), x.alias("_x")).filter(x.isNotNull())
    binned = pos.select(
        by,
        F.when(
            F.col("_x") > 0, F.floor(F.log(F.col("_x")) * bins_per_e)
        ).alias("_bin"),
    )
    hist = binned.groupBy(by, "_bin").agg(F.count(F.lit(1)).alias("_c"))
    n_pos = F.sum(F.when(F.col("_bin").isNotNull(), F.col("_c"))).over(
        W.partitionBy(by)
    )
    n_nonpos = F.sum(F.when(F.col("_bin").isNull(), F.col("_c"))).over(
        W.partitionBy(by)
    )
    cum = F.sum("_c").over(
        W.partitionBy(by).orderBy(F.col("_bin").asc_nulls_last())
    )
    h = hist.select(
        by,
        "_bin",
        F.coalesce(n_pos, F.lit(0)).alias("_n"),
        F.coalesce(n_nonpos, F.lit(0)).alias("n_nonpos"),
        cum.alias("_cum"),
    ).filter(F.col("_bin").isNotNull())
    p = F.explode(
        F.array(*[F.lit(float(q)) for q in sorted(probs)])
    ).alias("p")
    hits = h.select(by, "_bin", "_n", "n_nonpos", "_cum", p).filter(
        F.col("_cum") >= F.ceil(F.col("p") * F.col("_n"))
    )
    return (
        hits.groupBy(by, "p")
        .agg(
            F.min("_bin").alias("_qbin"),
            F.max("_n").alias("n_pos"),
            F.max("n_nonpos").alias("n_nonpos"),
        )
        .select(
            by,
            "p",
            F.round(
                F.exp((F.col("_qbin") + 0.5) / F.lit(float(bins_per_e))), 6
            ).alias("estimate"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_nonpos").cast("long").alias("n_nonpos"),
        )
    )
