"""Degree centrality — single-superstep (DegreeCentrality.java:38-131).

Reference: value = ``vertex.numEdges()`` on the symmetrized adjacency, or,
with ``degree_centrality.weight_property`` set, the sum of that edge
property with missing/non-positive weights defaulting to 1.0
(DegreeCentrality.weightValue:75-90). Asserted to 1e-6 by the reference's
own test (DegreeCentralityTest.java:49-76). A pure groupBy — one shuffle,
map-side partial sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hugegraph_computer_spark.graph.graph import Graph


def degree_centrality(graph: Graph, weighted: bool = False) -> DataFrame:
    """Returns ``(vid long, degree double)``.

    ``weighted=True`` requires the graph's edges to carry a ``weight``
    column; missing weights count 1.0 like the reference default.
    """
    if weighted and "weight" in graph.edges.columns:
        agg = F.sum(F.coalesce(F.col("weight"), F.lit(1.0))).alias("degree")
    else:
        agg = F.count(F.lit(1)).cast("double").alias("degree")
    d = graph.edges.groupBy(F.col("src").alias("vid")).agg(agg)
    return (
        graph.vertices()
        .join(d, "vid", "left")
        .select("vid", F.coalesce("degree", F.lit(0.0)).alias("degree"))
    )
