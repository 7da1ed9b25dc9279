"""hugegraph_computer_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimplementation of the computational semantics of
yandababa2/hugegraph-computer (an Apache HugeGraph Pregel/BSP engine) as
iterative DataFrame programs:

* vertex-centric algorithms (PageRank, WCC, LPA, TriangleCount, degree /
  clustering centralities) expressed as DataFrame joins + aggregations over
  a symmetrized, hash-partitioned edge table,
* a superstep harness with per-superstep checkpoint snapshots (lineage +
  convergence metrics) and mid-iteration resume,
* large-scale training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing).

The architecture is Spark-first: logical plans are declared with the
DataFrame API and optimized by Catalyst/AQE; Python only orchestrates the
superstep loop on the driver (the reference's "master" role). No code is
ported from the reference's Java BSP runtime.
"""

from hugegraph_computer_spark.session import get_spark
from hugegraph_computer_spark.graph.graph import Graph

__all__ = ["get_spark", "Graph"]
__version__ = "0.1.0"
