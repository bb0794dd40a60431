"""Structured Streaming operators over the events stream.

The reference has NO streaming surface (SURVEY.md §2.9 — its checkpointing
maps to stage snapshots, not stream state). These are the training-data-
pipeline extensions a live ingest needs: watermarked tumbling-window
aggregation and stateless enrichment, written so the SAME transformation
runs in batch (driver oracle checks) and streaming (readStream) — the
classic Structured Streaming unification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    On a streaming DataFrame the watermark bounds late-data state; on a
    batch DataFrame `withWatermark` is a no-op, so one definition serves
    both (and the DuckDB oracle checks the batch run).
    """
    # watermarks require TIMESTAMP (tz-aware); parquet feeds often carry
    # TIMESTAMP_NTZ — cast once (session tz is pinned to UTC) for both
    # modes so batch and stream window identically
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
             .cast("double").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n", "total_value")
    )


def run_stream_from_parquet(spark: SparkSession, events_dir: str,
                            checkpoint_dir: str, out_table: str,
                            window: str = "1 hour") -> None:
    """File-source streaming run with availableNow (batch-sized stream) —
    the pattern a production ingest uses with a growing Iceberg/files feed;
    exercised in tests via the memory sink."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_event_counts(stream, window)
    (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(600)
    )
