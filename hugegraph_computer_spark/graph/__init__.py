from hugegraph_computer_spark.graph.graph import Graph
from hugegraph_computer_spark.graph.bsp import SuperstepLoop, SuperstepRecord

__all__ = ["Graph", "SuperstepLoop", "SuperstepRecord"]
