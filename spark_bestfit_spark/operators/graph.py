"""Graph operators over edge relations (e.g. the near-dup pair graph):
triangle counting and degree statistics.

The near-dup pipeline emits an edge relation (``minhash_dedup_pairs``,
``neardup_clusters``); these operators measure its structure — triangle
density distinguishes tight copy-clusters from chain-like false-positive
strings, and degree stats expose hub documents (templates quoted by
everything) before clustering. No reference-repo analog; first-class
pipeline extras beside the connected-components operator in
:mod:`.dedup`.

Scale design: triangle counting uses the classic DEGREE-ORDERED
orientation — every undirected edge points from its lower-degree
endpoint to the higher (ids break ties), so each triangle is counted
exactly once and, crucially, the wedge join fans out from the LOW
degree side: a hub with degree d contributes O(d) wedges instead of
O(d^2), which is the difference between a linear and a quadratic pass
on power-law graphs. The joins are plain hash joins on vertex keys;
nothing is collected.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["triangle_count", "degree_stats", "pagerank"]


def _canonical_edges(
    edges: DataFrame, src: str, dst: str
) -> DataFrame:
    """Undirected simple edges as (a < b) pairs: self-loops dropped,
    duplicates and orientation collapsed."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def degree_stats(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-vertex degree of the undirected simple graph:
    ``(vertex, degree)`` — one explode + one combiner groupBy."""
    e = _canonical_edges(edges, src, dst)
    return (
        e.select(F.explode(F.array("a", "b")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count("*").cast("long").alias("degree"))
    )


def triangle_count(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Total triangles, edges, and vertices of the undirected simple
    graph as a 1-row relation ``(n_vertices, n_edges, n_triangles)``.

    Degree-ordered wedge counting (module docstring): edges are
    re-oriented low-degree -> high-degree, wedges are formed by joining
    out-edges on their shared LOW vertex, and a wedge closes into a
    triangle iff its two high endpoints are themselves an oriented
    edge (left-semi probe). Each triangle has exactly one vertex with
    two out-edges under this orientation, so the count is exact with
    no division — and the wedge fan-out at a degree-d hub is bounded
    by its OUT-degree, which the orientation keeps small.
    """
    e = _canonical_edges(edges, src, dst)
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(
        F.col("v").alias("a"), F.col("d").alias("_da")
    )
    db = deg.select(
        F.col("v").alias("b"), F.col("d").alias("_db")
    )
    # orient: from the (degree, id)-smaller endpoint to the larger
    keyed = e.join(da, "a").join(db, "b")
    fwd = F.struct(F.col("_da"), F.col("a")) < F.struct(
        F.col("_db"), F.col("b")
    )
    oriented = keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    w1 = oriented.select(
        F.col("lo"), F.col("hi").alias("x")
    )
    w2 = oriented.select(F.col("lo"), F.col("hi").alias("y"))
    wedges = (
        w1.join(w2, "lo")
        .filter(F.col("x") < F.col("y"))
        .select("x", "y")
    )
    closed = wedges.join(
        oriented.select(
            F.least("lo", "hi").alias("x"),
            F.greatest("lo", "hi").alias("y"),
        ),
        ["x", "y"],
        "left_semi",
    )
    tri = closed.agg(F.count("*").cast("long").alias("n_triangles"))
    nv = deg.agg(F.count("*").cast("long").alias("n_vertices"))
    ne = e.agg(F.count("*").cast("long").alias("n_edges"))
    return (
        nv.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select("n_vertices", "n_edges", "n_triangles")
    )


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """PageRank over the undirected simple graph (each edge walks both
    ways) — which documents sit at the CENTER of the near-dup mesh
    (the canonical copies everything else derives from), versus
    peripheral one-off matches.

    Synchronous power iteration, all relational: per step one join of
    the rank relation to the symmetric edge list on the source vertex
    and one combiner groupBy on the destination — the same
    join+aggregate round the connected-components operator uses, with
    ``localCheckpoint`` lineage truncation every ``checkpoint_every``
    steps so the plan stays flat at any iteration count. Undirected
    graphs have no dangling vertices (every vertex has degree >= 1),
    so the update is exactly
    ``r' = (1 - d)/N + d * sum(r_in / deg_in)``. The vertex count N is
    one bounded driver scalar (the exact-K-S convention).

    Returns ``(vertex, rank)`` with rank rounded to 6; ranks sum to ~1.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    e = _canonical_edges(edges, src, dst)
    sym = e.select(
        F.col("a").alias("s"), F.col("b").alias("t")
    ).unionAll(e.select(F.col("b").alias("s"), F.col("a").alias("t")))
    deg = sym.groupBy("s").agg(F.count("*").alias("_deg"))
    n = deg.count()
    if n == 0:
        spark = edges.sparkSession
        return spark.createDataFrame([], "vertex long, rank double")
    base = (1.0 - damping) / n
    ranks = deg.select(
        F.col("s").alias("v"), F.lit(1.0 / n).alias("r")
    )
    contrib_src = sym.join(F.broadcast(deg) if n < 1_000_000 else deg, "s")
    for i in range(iterations):
        ranks = (
            contrib_src.join(
                ranks, contrib_src["s"] == ranks["v"]
            )
            .select(
                F.col("t"),
                (F.col("r") / F.col("_deg")).alias("_c"),
            )
            .groupBy("t")
            .agg(
                (F.lit(base) + F.lit(damping) * F.sum("_c")).alias("r")
            )
            .select(F.col("t").alias("v"), "r")
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        F.col("v").alias("vertex"), F.round("r", 6).alias("rank")
    )
