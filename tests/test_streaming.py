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


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Watermark-finalized streaming sessions must equal the batch
    sessionize rollup on the same events (same gap rule)."""
    from pyspark.sql import functions as F

    from hugegraph_computer_spark.operators.events import sessionize
    from hugegraph_computer_spark.streaming.sessions import run_streaming_sessionize

    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "sess_ckpt")
    os.makedirs(events_dir)
    rows = [
        # user 1: one session (0,10min), second session at 50min
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 00:10:00", 1, "click", 2.0, "{}"),
        (3, "2024-01-01 00:50:00", 1, "view", 4.0, "{}"),
        # user 2: one session
        (4, "2024-01-01 00:05:00", 2, "view", 8.0, "{}"),
        # watermark flusher: far-future event closes everything above
        (99, "2024-01-01 12:00:00", 9, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, "
              "value double, props string"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.write.mode("overwrite").parquet(f"{events_dir}/f1.parquet")
    q = run_streaming_sessionize(
        spark, f"{events_dir}/*", ckpt, query_name="sess_test"
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["n_events"], r["value_sum"])
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }
    # batch twin (drop the flusher's still-open session bucket comparison:
    # user 9's session is NOT finalized by the watermark, so the stream
    # must emit exactly the closed sessions)
    batch = {
        (r["user_id"], r["n_events"], r["value_sum"])
        for r in sessionize(
            df.where(F.col("user_id") != 9).select(
                "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
                "user_id", "event_type", "value", "props",
            )
        ).collect()
    }
    assert got == batch
    assert (1, 2, 3.0) in got and (1, 1, 4.0) in got and (2, 1, 8.0) in got


def test_stateful_sessionize_ordinals_match_batch(spark, tmp_path):
    """applyInPandasWithState sessionize must reproduce the batch
    sessionize rollup EXACTLY — including the per-user session ordinal
    and integer epoch-us bounds that session_window cannot emit — with
    state carried across micro-batches (one file per trigger)."""
    from pyspark.sql import functions as F

    from hugegraph_computer_spark.operators.events import sessionize
    from hugegraph_computer_spark.streaming.stateful import (
        run_stateful_sessionize,
    )

    events_dir = str(tmp_path / "sf_events")
    ckpt = str(tmp_path / "sf_ckpt")
    os.makedirs(events_dir)

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, "
                  "event_type string, value double, props string"
        ).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id", "event_type", "value", "props",
        )

    # coalesce(1): ONE part-file per input file, so with
    # maxFilesPerTrigger=1 the micro-batch sequence is deterministic
    # (the far-future flusher must not advance the watermark past
    # sibling events still waiting in another part-file)
    # file 1: user 1 sessions 0+1 begin; user 2 session 0
    mk([
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 00:10:00", 1, "click", 2.0, "{}"),
        (4, "2024-01-01 00:05:00", 2, "view", 8.0, "{}"),
    ]).coalesce(1).write.parquet(f"{events_dir}/f1.parquet")
    # file 2: user 1 session 1 + a THIRD session; out-of-order event 3
    # lands in session 1 (arrives after event 5 but is earlier in time)
    mk([
        (5, "2024-01-01 00:55:00", 1, "view", 0.5, "{}"),
        (3, "2024-01-01 00:50:00", 1, "view", 4.0, "{}"),
        (6, "2024-01-01 02:00:00", 1, "buy", 16.0, "{}"),
        # watermark flusher: far-future event closes everything above
        (99, "2024-01-01 12:00:00", 9, "view", 0.0, "{}"),
    ]).coalesce(1).write.parquet(f"{events_dir}/f2.parquet")

    q = run_stateful_sessionize(
        spark, f"{events_dir}/*", ckpt, query_name="sf_sess",
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    got = {
        tuple(r) for r in spark.sql(
            "SELECT user_id, session_id, n_events, start_us, end_us, "
            "value_sum FROM sf_sess"
        ).collect()
    }
    batch = {
        tuple(r) for r in sessionize(
            mk([
                (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
                (2, "2024-01-01 00:10:00", 1, "click", 2.0, "{}"),
                (3, "2024-01-01 00:50:00", 1, "view", 4.0, "{}"),
                (4, "2024-01-01 00:05:00", 2, "view", 8.0, "{}"),
                (5, "2024-01-01 00:55:00", 1, "view", 0.5, "{}"),
                (6, "2024-01-01 02:00:00", 1, "buy", 16.0, "{}"),
            ]).select(
                "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
                "user_id", "event_type", "value", "props",
            )
        ).select(
            "user_id", "session_id", "n_events", "start_us", "end_us",
            "value_sum",
        ).collect()
    }
    assert got == batch
    # the ordinal the declarative path cannot produce: user 1 has
    # sessions 0, 1, 2 in chronological order
    assert {(u, s) for (u, s, *_ ) in got if u == 1} == {(1, 0), (1, 1), (1, 2)}
