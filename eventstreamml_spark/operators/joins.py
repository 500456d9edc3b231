"""Temporal joins beyond equi/range — currently the as-of join.

The reference has no as-of join (SURVEY §2.3 notes its only non-equi
join is the task-window range join J5), but a training-data engine
needs one for point-in-time-correct feature attachment: "the most
recent measurement/marker at or before this event" is the join that
keeps feature pipelines leak-free.

Scale design: the naive formulations are a non-equi range join (the
candidate explosion AQE cannot save) or a per-key collect (driver
bound). This implementation is the single-shuffle form: tag both
inputs, union them, and carry the latest right-side payload forward
with a per-key ordered window — one Exchange on the join keys, no row
amplification, ties resolved deterministically by the side tag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    payload_cols: list[str] | None = None,
    strict: bool = False,
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Attach to each left row the most recent right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``), per key — or,
    with ``direction="forward"``, the EARLIEST right row with
    ``right_ts >= left_ts`` (``>`` when strict). ``tolerance_s``
    bounds the match distance (pandas ``merge_asof`` semantics):
    payloads farther than that many seconds are nulled, so a stale
    marker never attaches across an unbounded gap.

    Returns the left relation plus ``payload_cols`` (null when no
    right row qualifies). Rows of ``right`` sharing (keys, right_ts)
    should be pre-deduplicated by the caller — among exact timestamp
    ties the carried payload is otherwise unspecified.

    The implementation reserves the internal column names ``_t``,
    ``_p``, ``_rt``, ``_side``, ``_asof``; inputs using them, or a
    payload column that collides with a left column, are rejected up
    front (silent duplicate/wrong output otherwise).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    payload_cols = payload_cols or [
        c for c in right.columns if c not in set(keys) | {right_ts}
    ]
    reserved = {"_t", "_p", "_rt", "_side", "_asof"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"as_of_join reserves column names {sorted(reserved)}; rename "
            f"input columns {sorted(clash)}"
        )
    dup = set(payload_cols) & set(left.columns)
    if dup:
        raise ValueError(
            f"payload columns {sorted(dup)} collide with left columns; "
            f"rename them on the right side before joining"
        )
    backward = direction == "backward"
    # side ordering decides visibility of equal-timestamp right rows:
    # backward scans (unbounded, current], so a right row visible at
    # equal ts must sort BEFORE the left row; forward scans [current,
    # unbounded), so it must sort AFTER. Strict flips each.
    if backward:
        right_side = 2 if strict else 0
    else:
        right_side = 0 if strict else 2
    r = right.select(
        *keys,
        F.col(right_ts).alias("_t"),
        F.struct(
            F.col(right_ts).alias("_rt"), *[F.col(c) for c in payload_cols]
        ).alias("_p"),
        F.lit(right_side).alias("_side"),
    )
    p_type = r.schema["_p"].dataType
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_t"),
        F.lit(None).cast(p_type).alias("_p"),
        F.lit(1).alias("_side"),
    )
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.unionByName(r.select(*l.columns))
    if backward:
        w = (
            W.partitionBy(*keys)
            .orderBy("_t", "_side")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        carried = F.last("_p", ignorenulls=True).over(w)
    else:
        w = (
            W.partitionBy(*keys)
            .orderBy("_t", "_side")
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        carried = F.first("_p", ignorenulls=True).over(w)
    out = u.withColumn("_asof", carried).filter(F.col("_side") == 1)
    if tolerance_s is not None:
        dist_us = F.abs(
            F.unix_micros(F.col("_t").cast("timestamp"))
            - F.unix_micros(F.col("_asof")["_rt"].cast("timestamp"))
        )
        out = out.withColumn(
            "_asof",
            F.when(dist_us <= F.lit(int(tolerance_s * 1_000_000)), F.col("_asof")),
        )
    return out.select(
        *left.columns, *[F.col("_asof")[c].alias(c) for c in payload_cols]
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    block_keys: list[str],
    left_str: str,
    right_str: str,
    max_edit: int = 1,
) -> DataFrame:
    """Blocked fuzzy (edit-distance) join — the entity-resolution
    primitive: candidates pair only WITHIN a blocking key (the same
    idea as LSH banding: never all-pairs), then a JVM ``levenshtein``
    filter keeps pairs within ``max_edit``.

    Block on something cheap and high-recall (nation + name prefix,
    zip code, sorted-token fingerprint); at 100 TB the block sizes —
    not the corpus — bound the quadratic term, exactly like LSH bucket
    sizes. Spark's levenshtein accepts a threshold argument, which
    short-circuits the DP once the bound is exceeded — pass it, don't
    post-filter. Returns both sides' strings, the block keys, and the
    distance."""
    l = left.select(
        *[F.col(c) for c in block_keys], F.col(left_str).alias("_sl")
    )
    r = right.select(
        *[F.col(c) for c in block_keys], F.col(right_str).alias("_sr")
    )
    j = l.join(r, block_keys)
    dist = F.levenshtein(F.col("_sl"), F.col("_sr"), max_edit)
    return (
        j.withColumn("edit_distance", dist)
        # threshold form returns -1 when the bound is exceeded
        .filter((F.col("edit_distance") >= 0) & (F.col("_sl") < F.col("_sr")))
        .select(
            *block_keys,
            F.col("_sl").alias("left_value"),
            F.col("_sr").alias("right_value"),
            "edit_distance",
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    window: int = 3,
    max_edit: int = 2,
) -> DataFrame:
    """Sorted-neighborhood entity-resolution candidates — the
    complement to :func:`fuzzy_join`'s hash blocking: sort the corpus
    once by the match key and compare each record only against its
    ``window`` successors, so near-duplicates land adjacent even when a
    typo sits IN the blocking key itself (where an equality block
    silently drops the pair).

    Scale shape: the global order comes from the engine's distributed
    dense-rank (``dense_ids`` — range-partitioned sort, no single-task
    window), and the neighborhood is a bounded ``window``-way distance
    fan-out joined back on rank equality — the same one-equi-join
    pattern as skip-gram extraction. The quadratic term is
    window·n, not block-size², regardless of key skew. Levenshtein runs
    with the threshold argument (short-circuits the DP past the
    bound)."""
    from eventstreamml_spark.operators.windows import dense_ids

    base = df.select(F.col(id_col), F.col(str_col))
    ranked = dense_ids(
        base, order_cols=[str_col, id_col], out_col="_rk"
    )
    d = F.explode(
        F.array(*[F.lit(i) for i in range(1, window + 1)])
    ).alias("_d")
    left = ranked.select(
        F.col(id_col).alias("a_id"), F.col(str_col).alias("a_val"), "_rk", d
    ).select("a_id", "a_val", (F.col("_rk") + F.col("_d")).alias("_tgt"))
    right = ranked.select(
        F.col("_rk").alias("_tgt"),
        F.col(id_col).alias("b_id"),
        F.col(str_col).alias("b_val"),
    )
    pairs = left.join(right, "_tgt")
    dist = F.levenshtein(F.col("a_val"), F.col("b_val"), max_edit)
    return (
        pairs.withColumn("edit_distance", dist)
        .filter(F.col("edit_distance") >= 0)
        .select("a_id", "b_id", "a_val", "b_val", "edit_distance")
    )
