"""Structured-Streaming session windows over a continuously-arriving
event feed — the streaming twin of ``operators.events.sessionize``.

The reference is strictly batch-BSP (SURVEY.md §2.9); this is engine
surface for the training-data-pipeline stream case: events land as
parquet files in a directory (in production: Kafka/Iceberg feed), and a
watermarked ``session_window`` aggregation maintains per-entity gap
sessions incrementally — late events within the watermark still merge
into their session; events older than the watermark are dropped, which
is exactly the bounded-state contract a 100 TB/day feed needs (state
per key is evicted once the watermark passes the session's close).

Uses Spark's built-in session_window (state-store backed, merging
windows on overlap) rather than hand-rolled state — the declarative
path; applyInPandasWithState is only warranted when the state machine
cannot be expressed as a windowed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENT_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a directory of parquet event files."""
    return spark.readStream.schema(EVENT_DDL).parquet(path)


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_minutes: int = 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked gap-session aggregation:
    ``(user_id, session_start, session_end, n_events, value_sum)``.

    Semantics match the batch ``sessionize`` rollup (same gap rule; the
    batch op reports integer epoch-us bounds and a per-user session
    index, the stream reports the window struct — both are the same
    partition of events into gap sessions). Append mode emits a session
    only once its window is finalized by the watermark."""
    return (
        events.withWatermark(ts_col, f"{watermark_minutes} minutes")
        .groupBy(
            F.col(user_col).alias("user_id"),
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def run_streaming_sessionize(
    spark: SparkSession,
    events_path: str,
    checkpoint: str,
    query_name: str = "sessions",
    gap_minutes: int = 30,
    watermark_minutes: int = 60,
):
    """availableNow streaming query writing finalized sessions to an
    in-memory sink (swap for a parquet/Iceberg sink in production)."""
    sessions = streaming_sessionize(
        stream_events(spark, events_path),
        gap_minutes=gap_minutes,
        watermark_minutes=watermark_minutes,
    )
    return (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
