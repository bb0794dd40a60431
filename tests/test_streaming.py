"""Structured Streaming ↔ batch unification: the SAME windowed aggregation
definition must produce identical results via readStream (availableNow +
memory sink) and via a plain batch run. The reference has no streaming
surface (SURVEY.md §2.9); this is the mandated live-ingest extension."""

from __future__ import annotations

import pytest

from osm_jigsaw_spark.streaming.events import (
    run_stream_from_parquet,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _as_sorted_rows(df):
    return sorted(
        (r["window_start"], r["event_type"], r["n"], r["total_value"])
        for r in df.collect()
    )


def test_stream_matches_batch(spark, events, tmp_path):
    batch = windowed_event_counts(events)
    # file-stream sources ingest directories (a growing feed), not single
    # files — stage the fixture into one
    events_dir = str(tmp_path / "events_feed")
    events.write.mode("overwrite").parquet(events_dir)
    run_stream_from_parquet(
        spark, events_dir, str(tmp_path / "ckpt"),
        out_table="stream_counts")
    streamed = spark.table("stream_counts")
    assert _as_sorted_rows(streamed) == _as_sorted_rows(batch)


def test_watermark_applied_on_streaming_plan(spark):
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(f"{SF_DIR}/events.parquet")
    agg = windowed_event_counts(stream, watermark="2 hours")
    assert agg.isStreaming
    assert "watermark" in agg._jdf.queryExecution().analyzed().toString().lower()
