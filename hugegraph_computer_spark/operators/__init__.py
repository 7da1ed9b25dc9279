"""Graph algorithms + pipeline operators.

Graph algorithms reproduce the reference's per-vertex results
(SURVEY.md §2.11-2.12); pipeline operators (dedup / similarity / text /
multimodal) are the training-data extensions required at 100 TB scale.
"""

from hugegraph_computer_spark.operators.pagerank import (
    pagerank,
    personalized_pagerank,
)
from hugegraph_computer_spark.operators.wcc import wcc
from hugegraph_computer_spark.operators.lpa import lpa
from hugegraph_computer_spark.operators.triangle import triangle_count
from hugegraph_computer_spark.operators.degree import degree_centrality
from hugegraph_computer_spark.operators.clustering import clustering_coefficient
from hugegraph_computer_spark.operators.closeness import closeness_centrality
from hugegraph_computer_spark.operators.rings import (
    rings_detection,
    rings_detection_with_filter,
    rings_count,
)
from hugegraph_computer_spark.operators.links import links, links_from_describe
from hugegraph_computer_spark.operators.betweenness import betweenness_centrality
from hugegraph_computer_spark.operators.kcore import coreness
from hugegraph_computer_spark.operators.walks import (
    node2vec_walks,
    random_walks,
    skipgram_pairs,
)
from hugegraph_computer_spark.operators.gnn import neighborhood_sample

ALGORITHMS = {
    "page_rank": pagerank,
    "wcc": wcc,
    "lpa": lpa,
    "triangle_count": triangle_count,
    "degree_centrality": degree_centrality,
    "clustering_coefficient": clustering_coefficient,
    "closeness_centrality": closeness_centrality,
    "rings": rings_count,
    "links": links,
    "betweenness_centrality": betweenness_centrality,
    "coreness": coreness,
    "random_walks": random_walks,
    "node2vec": node2vec_walks,
    "ppr": personalized_pagerank,
    "neighborhood_sample": neighborhood_sample,
}

__all__ = [
    "pagerank",
    "personalized_pagerank",
    "wcc",
    "lpa",
    "triangle_count",
    "degree_centrality",
    "clustering_coefficient",
    "closeness_centrality",
    "rings_detection",
    "rings_detection_with_filter",
    "rings_count",
    "links",
    "links_from_describe",
    "betweenness_centrality",
    "coreness",
    "random_walks",
    "node2vec_walks",
    "skipgram_pairs",
    "neighborhood_sample",
    "ALGORITHMS",
]
