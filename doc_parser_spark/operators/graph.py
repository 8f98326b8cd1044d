"""Graph analytics over edge sets (near-dup graphs, link graphs):
triangle counting and fixed-iteration PageRank — the two classic
distributed graph kernels expressible as pure joins/aggregates
(connected components lives in operators/dedup.py).

Scale notes (100 TB):
- ``triangle_count``: the canonical two-join algorithm over ORIENTED
  edges (a < b) — orientation kills the factor-6 duplication and caps
  the wedge explosion at high-degree nodes by construction (each
  triangle is counted exactly once from its smallest vertex). Shuffles:
  two equi-joins on vertex keys, constant-width rows.
- ``pagerank``: fixed ``iters`` rounds of the standard damped update;
  each round is one join (ranks ⋈ edges on src) + one aggregate
  (group by dst) — both map-side combinable, constant-width. Degrees
  compute once. Dangling mass redistributes uniformly each round (the
  textbook correction), via a 1-row broadcast aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(edges: DataFrame) -> DataFrame:
    """Count triangles in an undirected simple graph given as (a_id, b_id)
    pairs (any orientation, duplicates tolerated). Returns a 1-row frame
    with ``n_triangles``; each triangle counted once."""
    e = (
        edges.select(
            F.least("a_id", "b_id").alias("u"),
            F.greatest("a_id", "b_id").alias("v"),
        )
        .where(F.col("u") < F.col("v"))
        .distinct()
    )
    # wedges u<v<w from the smallest vertex, closed by the (v, w) edge
    uv = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = (
        uv.alias("e1")
        .join(
            uv.alias("e2"),
            (F.col("e1.x") == F.col("e2.x")) & (F.col("e1.y") < F.col("e2.y")),
        )
        .join(
            uv.alias("e3"),
            (F.col("e1.y") == F.col("e3.x"))
            & (F.col("e2.y") == F.col("e3.y")),
        )
    )
    return tri.agg(F.count("*").cast("long").alias("n_triangles"))


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over the UNDIRECTED graph of (a_id, b_id)
    pairs (symmetrized internally). Deterministic: exact degree counts,
    uniform init 1/N, ``iters`` damped rounds with uniform dangling-mass
    redistribution; ranks round to 8 dp at output (the per-round float
    sums are engine-stable well past that). Returns (id, rank)."""
    sym = (
        edges.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .unionByName(
            edges.select(
                F.col("b_id").alias("src"), F.col("a_id").alias("dst")
            )
        )
        .distinct()
    )
    nodes = (
        sym.select(F.col("src").alias("id"))
        .unionByName(sym.select(F.col("dst").alias("id")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count("*").cast("double").alias("n"))
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    # symmetrized near-dup graphs have no dangling nodes (every node has
    # degree >= 1), so the dangling term is zero here; kept simple
    for _ in range(iters):
        contrib = (
            ranks.join(sym, ranks["id"] == sym["src"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "id",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("id", F.round("rank", 8).alias("rank"))
