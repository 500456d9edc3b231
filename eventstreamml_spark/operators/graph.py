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


def random_walks(
    edges: DataFrame,
    n_steps: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int | None = None,
) -> DataFrame:
    """Deterministic uniform random-walk corpus generation — the
    node2vec/DeepWalk data-prep step: one walk of ``n_steps`` hops from
    every node, each hop choosing a neighbor by the engine's portable
    md5 hash of (walk start, step), so the corpus is bit-reproducible
    (and oracle-replayable) with no RNG state to ship.

    Plan shape: adjacency materializes ONCE as sorted neighbor arrays
    (one groupBy); each hop is then one equi-join of the walk frontier
    against that adjacency — n_steps bounded joins total, never an
    explode of the neighborhood. On power-law graphs a hub's array is
    its degree; pass ``max_degree`` to clip adjacency lists (keeping
    the id-lowest neighbors — still deterministic) so no single row
    exceeds memory — the standard degree-cap every production walker
    applies.

    Emits (start, path, end) with path as '->'-joined node ids; walks
    from isolated nodes don't exist (no neighbors to hop to)."""
    und = canonical_edges(edges, src_col, dst_col)
    both = und.select(
        F.col("lo").alias("node"), F.col("hi").alias("nbr")
    ).unionAll(und.select(F.col("hi").alias("node"), F.col("lo").alias("nbr")))
    adj = both.groupBy("node").agg(
        F.array_sort(F.collect_list("nbr")).alias("nbrs")
    )
    if max_degree is not None:
        adj = adj.select(
            "node", F.slice(F.col("nbrs"), 1, max_degree).alias("nbrs")
        )
    walks = adj.select(
        F.col("node").alias("start"),
        F.col("node").alias("cur"),
        F.col("node").cast("string").alias("path"),
    )
    for s in range(1, n_steps + 1):
        step = walks.join(adj, walks["cur"] == adj["node"])
        idx = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col("start").cast("string"), F.lit(str(s))
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("int")
            % F.size(F.col("nbrs"))
        )
        nxt = F.get(F.col("nbrs"), idx)
        walks = step.select(
            "start",
            nxt.alias("cur"),
            F.concat(F.col("path"), F.lit("->"), nxt.cast("string")).alias(
                "path"
            ),
        )
    return walks.select("start", "path", F.col("cur").alias("end"))
