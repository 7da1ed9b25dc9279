"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference-exact PageRank on the
customer–supplier link graph derived from sf0.001). ``queries()`` exposes
every implemented operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-equivalent SQL (hugegraph_computer_spark/
oracles.py) for every SQL-expressible one. Column names and float rounding
match pairwise so the driver's order-insensitive value hash compares equal.

Entries without an oracle (driver records a rows-only check):
* simhash / simhash_near_pairs — the 64-bit bit-packing loop is a
  vectorized pandas UDF; per-bit SQL reconstruction is impractical.
* corpus_* — run on the deterministic synthetic source-code corpus
  (BASELINE.json input_hint shape), not on the driver's parquet views.
* multimodal_features — mapInPandas over binary payloads with a
  deterministic fake decoder (no codec libs in this container).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hugegraph_computer_spark import oracles
from hugegraph_computer_spark.graph.graph import Graph
from hugegraph_computer_spark.operators import (
    betweenness_centrality,
    coreness,
    closeness_centrality,
    links,
    clustering_coefficient,
    degree_centrality,
    lpa,
    pagerank,
    rings_count,
    triangle_count,
    wcc,
)
from hugegraph_computer_spark.operators.dedup import (
    exact_dedup,
    minhash_bands,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from hugegraph_computer_spark.operators.multimodal import extract_features, synth_assets
from hugegraph_computer_spark.operators.similarity import (
    _hyperplanes,
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
)
from hugegraph_computer_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from hugegraph_computer_spark.sources.corpus import synth_corpus
from hugegraph_computer_spark.sources.extract import corpus_graph
from hugegraph_computer_spark.sources.tpch_graph import (
    copurchase_edges,
    customer_supplier_edges,
    customer_supplier_weighted,
    hierarchy_edges,
    nation_same_region_edges,
)

PAGERANK_SUPERSTEPS = 6
LPA_SUPERSTEPS = 10
TOPK = 10
N_QUERIES = 8
IVF_PLANES = 4
EMB_DIM = 64


# ------------------------------------------------------------ graph helpers
def _cs_graph(spark: SparkSession, sf_dir: str) -> Graph:
    return Graph.from_edges(customer_supplier_edges(spark, sf_dir))


def _cp_graph(spark: SparkSession, sf_dir: str) -> Graph:
    return Graph.from_edges(copurchase_edges(spark, sf_dir), drop_self_loops=True)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ------------------------------------------------------------- the queries
def q_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degree_centrality(_cs_graph(spark, sf_dir))


def q_degree_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = Graph.from_edges(
        customer_supplier_weighted(spark, sf_dir), weight_col="weight"
    )
    return degree_centrality(g, weighted=True).select(
        "vid", F.round("degree", 6).alias("degree")
    )


def q_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wcc(_cs_graph(spark, sf_dir))


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = pagerank(
        _cs_graph(spark, sf_dir),
        l1_threshold=-1.0,  # fixed superstep count → oracle-unrollable
        max_supersteps=PAGERANK_SUPERSTEPS,
    )
    return pr.select("vid", F.round("rank", 9).alias("rank"))


def q_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lpa(_cs_graph(spark, sf_dir), max_supersteps=LPA_SUPERSTEPS)


def q_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count(_cp_graph(spark, sf_dir))


def q_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clustering_coefficient(_cp_graph(spark, sf_dir)).select(
        "vid", F.round("coefficient", 6).alias("coefficient")
    )


def q_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return closeness_centrality(_cs_graph(spark, sf_dir), sources=32)


def q_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = Graph.from_edges(nation_same_region_edges(spark, sf_dir))
    return rings_count(g)


def q_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = Graph.from_edges(nation_same_region_edges(spark, sf_dir))
    out = links(
        g,
        start_cond="vid < 5",
        spread_cond="dst > src",
        end_vertex_cond="vid >= 15",
    )
    return out.select("vid", F.concat_ws("-", F.col("path")).alias("path_str"))


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return betweenness_centrality(_cs_graph(spark, sf_dir), sources=16)


def q_betweenness_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact betweenness on the supplier-nation-region forest — oracle
    checkable via the tree closed form."""
    g = Graph.from_edges(hierarchy_edges(spark, sf_dir))
    return betweenness_centrality(g)


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_docs(spark, sf_dir))


def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_bands(_docs(spark, sf_dir))


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(_docs(spark, sf_dir))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    cand = minhash_lsh_pairs(docs)
    out = ngram_jaccard_pairs(docs, threshold=0.3, candidates=cand)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(_docs(spark, sf_dir))


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(_docs(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(_docs(spark, sf_dir))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(_docs(spark, sf_dir))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return cosine_topk(emb, emb.where(F.col("vec_id") < N_QUERIES), k=TOPK)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return ivf_topk(
        emb,
        emb.where(F.col("vec_id") < N_QUERIES),
        k=TOPK,
        n_planes=IVF_PLANES,
        dim=EMB_DIM,
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_pairs(
        _emb(spark, sf_dir), threshold=0.3, n_planes=IVF_PLANES, dim=EMB_DIM
    )


# ------------------------------------------------- rows-only (no SQL oracle)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3)


def q_corpus_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship north-rule pipeline: synthetic source-code corpus →
    import-edge extraction (sha256-verified) → dense ids → PageRank."""
    corpus = synth_corpus(spark, n_repos=200, files_per_repo=4, seed=42)
    g, ids = corpus_graph(corpus)
    pr = pagerank(g, l1_threshold=1e-6, max_supersteps=10)
    return (
        pr.join(ids, pr["vid"] == ids["vid"])
        .select(ids["orig"].alias("repo"), F.round(pr["rank"], 9).alias("rank"))
    )


def q_corpus_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = synth_corpus(spark, n_repos=200, files_per_repo=4, seed=42)
    g, ids = corpus_graph(corpus)
    comp = wcc(g)
    return comp.join(ids, comp["vid"] == ids["vid"]).select(
        ids["orig"].alias("repo"), comp["component"]
    )


def q_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return coreness(_cp_graph(spark, sf_dir))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = synth_assets(spark, n=64, seed=42)
    return extract_features(assets, dim=16)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pagerank(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- BSP graph algorithms (SURVEY.md §2.11-2.12) ---
        "degree_centrality": q_degree,
        "degree_centrality_weighted": q_degree_weighted,
        "wcc": q_wcc,
        "pagerank": q_pagerank,
        "lpa": q_lpa,
        "triangle_count": q_triangle,
        "clustering_coefficient": q_clustering,
        "closeness_centrality": q_closeness,
        "rings_count": q_rings,
        "links": q_links,
        "betweenness_centrality": q_betweenness,
        "betweenness_tree": q_betweenness_tree,
        # --- training-data pipeline: dedup ---
        "exact_dedup": q_exact_dedup,
        "minhash_bands": q_minhash_bands,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard,
        "simhash_near_pairs": q_simhash_pairs,
        # --- text analysis ---
        "token_stats": q_token_stats,
        "quality_score": q_quality,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        # --- similarity search ---
        "cosine_topk": q_cosine_topk,
        "ivf_topk": q_ivf_topk,
        "embedding_near_dup": q_embedding_near_dup,
        # --- corpus link graph (north rule input shape) + multimodal ---
        "corpus_pagerank": q_corpus_pagerank,
        "corpus_wcc": q_corpus_wcc,
        "coreness": q_coreness,
        "multimodal_features": q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "degree_centrality": oracles.degree_sql(),
        "degree_centrality_weighted": oracles.degree_weighted_sql(),
        "wcc": oracles.wcc_sql(),
        "pagerank": oracles.pagerank_sql(supersteps=PAGERANK_SUPERSTEPS),
        "lpa": oracles.lpa_sql(supersteps=LPA_SUPERSTEPS),
        "triangle_count": oracles.triangle_sql(),
        "clustering_coefficient": oracles.clustering_sql(),
        "closeness_centrality": oracles.closeness_sql(),
        "rings_count": oracles.rings_count_sql(),
        "links": oracles.links_sql(),
        "betweenness_tree": oracles.betweenness_tree_sql(),
        "exact_dedup": oracles.exact_dedup_sql(),
        "minhash_bands": oracles.minhash_bands_sql(),
        "minhash_lsh_pairs": oracles.minhash_lsh_pairs_sql(),
        "ngram_jaccard_pairs": oracles.ngram_jaccard_sql(threshold=0.3),
        "token_stats": oracles.token_stats_sql(),
        "quality_score": oracles.quality_score_sql(),
        "lang_id": oracles.lang_id_sql(),
        "fingerprint": oracles.fingerprint_sql(),
        "cosine_topk": oracles.cosine_topk_sql(k=TOPK, n_queries=N_QUERIES),
        "ivf_topk": oracles.ivf_topk_sql(
            _hyperplanes(EMB_DIM, IVF_PLANES), k=TOPK, n_queries=N_QUERIES
        ),
        "embedding_near_dup": oracles.embedding_near_dup_sql(
            _hyperplanes(EMB_DIM, IVF_PLANES), threshold=0.3
        ),
    }
