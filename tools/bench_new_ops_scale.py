"""Measure the round-4-late operators at sf0.1 and sf1 in one session
protocol (fresh JVM per SF would be ideal; one JVM per run here, the SFs
run as separate invocations of this script)."""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from hugegraph_computer_spark.session import get_spark
from hugegraph_computer_spark.graph.graph import Graph
from hugegraph_computer_spark.operators import (
    neighborhood_sample, node2vec_walks, random_walks, skipgram_pairs,
)
from hugegraph_computer_spark.operators.dedup import decontaminate
from hugegraph_computer_spark.operators.text import repetition_stats, tfidf_topk, chunk_documents
from hugegraph_computer_spark.operators.pagerank import personalized_pagerank
from hugegraph_computer_spark.sources.tpch_graph import customer_supplier_edges
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark()
def consume(df):
    df.write.format("noop").mode("overwrite").save()

edges = customer_supplier_edges(spark, sf_dir)
g = Graph.from_edges(edges)
n_edges = g.edges.count()
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
n_docs = docs.count()
res = {}
def timed(name, fn):
    t0 = time.time(); fn(); res[name] = round(time.time() - t0, 3)
    print(name, res[name], flush=True)

timed("neighborhood_sample", lambda: consume(neighborhood_sample(g, fanouts=(10, 5))))
timed("random_walks_skipgram", lambda: consume(skipgram_pairs(random_walks(g, walks_per_vertex=4, walk_length=8), window=2)))
timed("node2vec_walks", lambda: consume(node2vec_walks(g, walks_per_vertex=2, walk_length=6, p=0.25, q=4.0)))
timed("ppr", lambda: consume(personalized_pagerank(g, g.degrees().where(F.col("vid") % 50 == 0).select("vid"), supersteps=6)))
timed("decontaminate", lambda: consume(decontaminate(docs.where(F.col("doc_id") % 20 != 0), docs.where(F.col("doc_id") % 20 == 0), shingle_n=5)))
timed("repetition_stats", lambda: consume(repetition_stats(docs)))
timed("tfidf_topk", lambda: consume(tfidf_topk(docs, k=5)))
timed("chunk_documents", lambda: consume(chunk_documents(docs, max_tokens=128, overlap=16)))
print(json.dumps({"sf_dir": sf_dir, "sym_edges": n_edges, "docs": n_docs, "queries": res}))
