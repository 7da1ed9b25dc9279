"""Per-vertex triangle count — closed-form equivalent of the reference's
3-superstep exchange.

Reference semantics (TriangleCount.java:35-122; edge_freq pinned SINGLE by
TriangleCountParams.java:41-42): on the symmetrized, deduplicated,
self-loop-free graph, superstep 1 assembles each vertex's full undirected
neighbor set N(v) and mails it to every neighbor; superstep 2 computes

    count(v) = ( Σ_{u ∈ N(v)} |N(u) ∩ N(v)| ) >> 1

(each triangle v-a-b is seen once via a's list and once via b's). We compute
the identical quantity without materializing the quadratic message volume:

    pairs(u,v) ∈ E  →  common = |N(u) ∩ N(v)|   (array_intersect, JVM-side)
    count(v) = sum(common over edges with src=v) / 2

``array_intersect`` hashes the smaller array — O(|N(u)|+|N(v)|) per edge,
whole-stage-codegen'd, no Python. Scale: the E ⋈ adj ⋈ adj double join is
the textbook distributed triangle plan; both joins are equi-joins on a
hash-partitioned key, AQE splits skewed hubs. For graphs whose hubs exceed
a single row (chunked adjacency), counts per chunk-pair sum to the same
total because intersection distributes over the disjoint chunks of N(u).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hugegraph_computer_spark.graph.graph import Graph


def _undirected(graph: Graph) -> DataFrame:
    """Dedup'd, self-loop-free symmetric edges (TriangleCount.java:54-56)."""
    return graph.edges.where(F.col("src") != F.col("dst")).dropDuplicates(
        ["src", "dst"]
    )


def triangle_count(graph: Graph, job_name: str = "triangle_count") -> DataFrame:
    """Returns ``(vid long, triangles long)`` per vertex (0 if none)."""
    e = _undirected(graph)
    adj = (
        e.groupBy("src")
        .agg(F.collect_set("dst").alias("nbrs"))
        .select(F.col("src").alias("vid"), "nbrs")
    )
    pairs = (
        e.join(adj.select(F.col("vid").alias("src"), F.col("nbrs").alias("src_nbrs")), "src")
        .join(adj.select(F.col("vid").alias("dst"), F.col("nbrs").alias("dst_nbrs")), "dst")
        .select(
            "src",
            F.size(F.array_intersect("src_nbrs", "dst_nbrs")).cast("long").alias("common"),
        )
    )
    counts = pairs.groupBy(F.col("src").alias("vid")).agg(
        (F.sum("common") / 2).cast("long").alias("triangles")
    )
    return (
        graph.vertices()
        .join(counts, "vid", "left")
        .select("vid", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"))
    )
