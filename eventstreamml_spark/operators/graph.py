"""Distributed graph analytics over relation-encoded edge lists.

Companions to the iterative graph ops elsewhere in the engine
(connected-components min-label propagation in operators/dedup.py,
plan-side pagerank in operators/aggregations.py). No reference analog;
declared-new per SURVEY §2.8b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def canonical_edges(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Undirected edge canonicalization: drop self-loops, order each
    endpoint pair as (lo, hi), dedup. One shuffle (the distinct)."""
    s, d = F.col(src_col), F.col(dst_col)
    return (
        edges.filter(s != d)
        .select(
            F.least(s, d).alias("lo"),
            F.greatest(s, d).alias("hi"),
        )
        .distinct()
    )


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts via degree-ordered edge
    orientation — the classic communication-optimal formulation: orient
    every undirected edge from the endpoint with smaller (degree, id)
    to the larger, so each wedge and each triangle is generated exactly
    once and the wedge self-join fans out by the oriented OUT-degree,
    which degree ordering bounds by O(√m) even on power-law graphs
    (the hub that would explode a naive neighbor join has huge
    in-degree but tiny out-degree).

    Plan shape: canonicalize (1 shuffle) → degree groupBy (1 shuffle)
    → two equi-joins (wedge build on the low endpoint, wedge close on
    the (v,w) pair). Returns (node, n_triangles) for every node in at
    least one triangle; union-aggregate over the three corners of each
    closed wedge.
    """
    und = canonical_edges(edges, src_col, dst_col)
    # degree over the undirected canonical edges
    deg = (
        und.select(F.col("lo").alias("node"))
        .unionAll(und.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dl = deg.select(
        F.col("node").alias("lo"), F.col("deg").alias("_dlo")
    )
    dh = deg.select(
        F.col("node").alias("hi"), F.col("deg").alias("_dhi")
    )
    with_deg = und.join(dl, "lo").join(dh, "hi")
    # orient by (degree, id): u -> v iff (deg(u), u) < (deg(v), v)
    u_first = (F.col("_dlo") < F.col("_dhi")) | (
        (F.col("_dlo") == F.col("_dhi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(u_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
    )
    e1 = oriented.select(F.col("u"), F.col("v"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("w"))
    # each wedge (v, w) out of u is generated once with v != w; the
    # closing edge is oriented too, so one more equi-join finds it
    wedges = e1.join(e2, "u").filter(F.col("v") != F.col("w"))
    close = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    )
    tri = wedges.join(close, ["v", "w"])
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
