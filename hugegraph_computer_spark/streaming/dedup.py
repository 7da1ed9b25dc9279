"""Streaming exact deduplication over a continuously-arriving document
feed — the streaming twin of ``operators.dedup.exact_dedup``.

The reference is strictly batch-BSP (SURVEY.md §2.9); this is engine
surface for the training-data-pipeline stream case: documents land as
parquet files in a directory (in production: a Kafka/Iceberg feed) and
must be content-deduplicated *as they arrive*, with bounded state. The
declarative path is Spark's ``dropDuplicatesWithinWatermark``: the
first document seen for a content fingerprint is emitted, subsequent
copies arriving within the watermark horizon are dropped, and the
per-fingerprint state entry is evicted once the watermark passes its
event time — so state size is bounded by the duplicate-arrival horizon
(watermark × ingest rate), not by corpus size. That eviction contract
is exactly what a 100 TB/day feed needs: an UNwatermarked
``dropDuplicates`` on a stream would grow state forever.

Deliberate consequence (asserted in tests): a duplicate arriving AFTER
the watermark has evicted its fingerprint is re-emitted — streaming
dedup is exact within the horizon and best-effort beyond it; the batch
``exact_dedup`` (or ``dedup_clusters``) over the accumulated table is
the periodic global compaction, same key (``md5(text)``) on both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOC_FEED_DDL = "doc_id long, text string, ingest_ts timestamp"


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a directory of parquet document-feed files."""
    return spark.readStream.schema(DOC_FEED_DDL).parquet(path)


def streaming_exact_dedup(
    docs: DataFrame,
    watermark_minutes: int = 60,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
) -> DataFrame:
    """First-arrival-per-fingerprint within the watermark horizon.

    Key = ``md5(text)`` — the SAME survivor key as the batch
    ``exact_dedup``, so the stream's output unions cleanly with batch
    re-dedup. Emits the surviving row plus its fingerprint."""
    return (
        docs.withColumn("fingerprint", F.md5(F.col(text_col)))
        .withWatermark(ts_col, f"{watermark_minutes} minutes")
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def run_streaming_dedup(
    spark: SparkSession,
    docs_path: str,
    checkpoint: str,
    query_name: str = "stream_dedup",
    watermark_minutes: int = 60,
    max_files_per_trigger: int | None = None,
    output_path: str | None = None,
):
    """availableNow streaming query writing survivors to an in-memory
    sink, or — with ``output_path`` — to a parquet directory (the
    production shape: a durable append sink that accumulates across
    restarts of the same checkpointed query; in-memory tables are
    recreated per start, so only the parquet sink observes a paced
    multi-restart feed end to end).

    ``max_files_per_trigger=1`` replays the feed one file per
    micro-batch — arrival order equals file order, which makes the
    surviving doc_id deterministic for tests and mirrors a paced
    production feed."""
    reader = spark.readStream.schema(DOC_FEED_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    survivors = streaming_exact_dedup(
        reader.parquet(docs_path), watermark_minutes=watermark_minutes
    )
    writer = survivors.writeStream.outputMode("append").option(
        "checkpointLocation", checkpoint
    )
    if output_path is not None:
        writer = writer.format("parquet").option("path", output_path)
    else:
        writer = writer.format("memory").queryName(query_name)
    return writer.trigger(availableNow=True).start()
