"""Structured-Streaming incremental WCC (engine extension; SURVEY.md §2.9
notes the reference is batch-only — this is our continuously-arriving-edges
path) — the maintained labels must equal a batch WCC over the union of all
edges seen so far."""

from __future__ import annotations

import os

from hugegraph_computer_spark.graph.graph import Graph
from hugegraph_computer_spark.operators import wcc
from hugegraph_computer_spark.streaming.ingest import (
    incremental_wcc_batch,
    run_incremental_wcc,
)
from tests.oracle import ref_wcc, symmetrize
from tests.test_algorithms import df_to_dict


def edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_incremental_batches_match_batch_wcc(spark, tmp_path):
    labels_path = str(tmp_path / "labels")
    b1 = [(0, 1), (2, 3), (10, 11)]
    b2 = [(1, 2), (12, 13)]          # merges {0,1} with {2,3}
    b3 = [(3, 10), (13, 12)]         # merges into one big component
    seen = []
    for batch in (b1, b2, b3):
        seen += batch
        incremental_wcc_batch(edges_df(spark, batch), labels_path, spark)
        got = {r["vid"]: r["component"]
               for r in spark.read.parquet(labels_path).collect()}
        adj = symmetrize(seen)
        assert got == ref_wcc(sorted(adj), adj)


def test_streaming_files_end_to_end(spark, tmp_path):
    edges_dir = str(tmp_path / "edges")
    labels_path = str(tmp_path / "labels")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(edges_dir)
    all_edges = [(0, 1), (1, 2), (5, 6), (6, 0)]
    edges_df(spark, all_edges[:2]).write.mode("overwrite").parquet(
        f"{edges_dir}/f1.parquet"
    )
    edges_df(spark, all_edges[2:]).write.mode("overwrite").parquet(
        f"{edges_dir}/f2.parquet"
    )
    q = run_incremental_wcc(spark, f"{edges_dir}/*", labels_path, ckpt)
    q.awaitTermination(120)
    got = {r["vid"]: r["component"]
           for r in spark.read.parquet(labels_path).collect()}
    g = Graph.from_edges(edges_df(spark, all_edges), num_partitions=4)
    assert got == df_to_dict(wcc(g), "vid", "component")
