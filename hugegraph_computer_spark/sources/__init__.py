from hugegraph_computer_spark.sources.corpus import synth_corpus
from hugegraph_computer_spark.sources.extract import extract_edges, corpus_graph
from hugegraph_computer_spark.sources.tpch_graph import (
    customer_supplier_edges,
    copurchase_edges,
    nation_same_region_edges,
)

__all__ = [
    "synth_corpus",
    "extract_edges",
    "corpus_graph",
    "customer_supplier_edges",
    "copurchase_edges",
    "nation_same_region_edges",
]
