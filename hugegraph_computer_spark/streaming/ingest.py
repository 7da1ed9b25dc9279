"""Structured-Streaming edge ingest + incremental component maintenance.

The reference is strictly batch-BSP (SURVEY.md §2.9) — this module is our
extension for continuously-arriving link data: new edge files land in a
directory (in production: an Iceberg/Kafka feed), each micro-batch folds
them into the persisted component labeling without recomputing the world.

Incremental WCC fold per micro-batch (foreachBatch):

  1. map both endpoints of each new edge through the current ``labels``
     table (new vertices label themselves),
  2. merged groups: union-find style collapse of the (label_a, label_b)
     pairs — iterated min-join until fixpoint (few rounds: the pair graph
     is tiny relative to the base graph),
  3. rewrite ``labels`` rows whose label changed; checkpoint.

This touches only Δ-edges + affected labels per batch — the property that
matters when the base graph is 10^12 edges and a batch is a few million.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

EDGE_DDL = "src long, dst long"


def stream_edges(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a directory of parquet edge files."""
    return spark.readStream.schema(EDGE_DDL).parquet(path)


def _collapse_labels(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """(a, b) same-component label pairs → (label, root) minimal mapping.

    This is exactly WCC on the (tiny) label-pair graph, so run the engine's
    own min-label fixpoint — a one-pass min-neighbor + pointer jump is NOT
    sufficient (a min label must be able to flow through a larger
    intermediate label, e.g. 5—6—0 must collapse 5 to 0)."""
    from hugegraph_computer_spark.graph.graph import Graph
    from hugegraph_computer_spark.operators.wcc import wcc

    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    g = Graph.from_edges(edges, num_partitions=8)
    comp = wcc(g, max_supersteps=max_rounds, job_name="wcc_label_collapse")
    return comp.select(F.col("vid").alias("label"), F.col("component").alias("root"))


def incremental_wcc_batch(
    batch: DataFrame, labels_path: str, spark: SparkSession
) -> None:
    """Fold one micro-batch of edges into the labels table at labels_path."""
    if os.path.exists(labels_path):
        labels = spark.read.parquet(labels_path)
    else:
        labels = spark.createDataFrame([], "vid long, component long")
    verts = (
        batch.select(F.col("src").alias("vid"))
        .unionByName(batch.select(F.col("dst").alias("vid")))
        .dropDuplicates(["vid"])
    )
    all_labels = (
        labels.unionByName(
            verts.join(labels, "vid", "left_anti").select(
                "vid", F.col("vid").alias("component")
            )
        )
    ).localCheckpoint(eager=True)
    la = all_labels.select(F.col("vid").alias("src"), F.col("component").alias("a"))
    lb = all_labels.select(F.col("vid").alias("dst"), F.col("component").alias("b"))
    pairs = (
        batch.join(la, "src").join(lb, "dst").select("a", "b").where(F.col("a") != F.col("b"))
    ).dropDuplicates(["a", "b"])
    if pairs.isEmpty():
        merged = all_labels
    else:
        mapping = _collapse_labels(pairs)
        merged = (
            all_labels.join(mapping, all_labels["component"] == mapping["label"], "left")
            .select(
                "vid",
                F.coalesce(mapping["root"], all_labels["component"]).alias("component"),
            )
        )
    tmp = labels_path + "_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(labels_path)


def run_incremental_wcc(
    spark: SparkSession, edges_path: str, labels_path: str, checkpoint: str
):
    """availableNow streaming query maintaining labels_path from edge files."""
    stream = stream_edges(spark, edges_path)
    return (
        stream.writeStream.foreachBatch(
            lambda batch, _id: incremental_wcc_batch(batch, labels_path, spark)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
