"""Local clustering coefficient — triangle count + degree.

Reference (ClusteringCoefficient.java:55-146) runs the TriangleCount
exchange and at output divides by the number of possible neighbor pairs:
C(v) = 2·T(v) / (d(v)·(d(v)−1)) over the deduplicated undirected
neighborhood, 0 when d(v) < 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hugegraph_computer_spark.graph.graph import Graph
from hugegraph_computer_spark.operators.triangle import _undirected, triangle_count


def clustering_coefficient(graph: Graph) -> DataFrame:
    """Returns ``(vid long, coefficient double)``."""
    tc = triangle_count(graph)
    deg = (
        _undirected(graph)
        .groupBy(F.col("src").alias("vid"))
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    return (
        tc.join(deg, "vid", "left")
        .select(
            "vid",
            F.when(
                F.coalesce("d", F.lit(0)) >= 2,
                2.0 * F.col("triangles") / (F.col("d") * (F.col("d") - 1)),
            )
            .otherwise(0.0)
            .alias("coefficient"),
        )
    )
