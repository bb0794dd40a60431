"""Gap-based sessionization: the batch (window-function) and streaming
(applyInPandasWithState) twins must agree. With a finite availableNow
stream and NoTimeout, the streaming side emits only sessions CLOSED by an
in-data gap — i.e. everything except each user's final (still-open)
session — so the assertion is: streamed == batch minus last-per-user."""

from __future__ import annotations

import numpy as np
import pytest

from osm_jigsaw_spark.streaming.sessions import (
    _gap_split,
    run_sessions_stream,
    sessionize_batch,
)

SF_DIR = "/root/testdata/sf0.001"
GAP_MIN = 240


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_gap_split_kernel():
    m = 60 * 1_000_000  # µs per minute
    gap_us = GAP_MIN * m
    ts = np.array([0 * m, 10 * m, 500 * m, 505 * m], np.int64)
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    closed, carry = _gap_split(ts, vals, gap_us, None)
    assert closed == [(0 * m, 10 * m, 2, 3.0)]
    assert carry == (500 * m, 505 * m, 2, 7.0)
    # carried session extended by a close follow-up, then closed by a gap
    closed2, carry2 = _gap_split(
        np.array([506 * m, 10_000 * m], np.int64), np.array([5.0, 6.0]),
        gap_us, carry)
    assert closed2 == [(500 * m, 506 * m, 3, 12.0)]
    assert carry2 == (10_000 * m, 10_000 * m, 1, 6.0)
    # carried session closed immediately when the next event is far away
    closed3, carry3 = _gap_split(
        np.array([100_000 * m], np.int64), np.array([7.0]), gap_us, carry2)
    assert closed3 == [(10_000 * m, 10_000 * m, 1, 6.0)]
    assert carry3 == (100_000 * m, 100_000 * m, 1, 7.0)


def _batch_rows(batch_df, drop_open=True):
    rows = batch_df.collect()
    if drop_open:
        last_idx = {}
        for r in rows:
            k = r["user_id"]
            if k not in last_idx or r["session_idx"] > last_idx[k]:
                last_idx[k] = r["session_idx"]
        rows = [r for r in rows if r["session_idx"] != last_idx[r["user_id"]]]
    return sorted(
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], round(r["total_value"], 4))
        for r in rows
    )


def test_stream_sessions_match_batch_closed(spark, events, tmp_path):
    batch = sessionize_batch(events, GAP_MIN)
    events_dir = str(tmp_path / "events_feed")
    events.write.mode("overwrite").parquet(events_dir)
    run_sessions_stream(spark, events_dir, str(tmp_path / "ckpt_sess"),
                        out_table="stream_sessions", gap_minutes=GAP_MIN)
    streamed = spark.table("stream_sessions")
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], round(r["total_value"], 4))
        for r in streamed.collect()
    )
    want = _batch_rows(batch, drop_open=True)
    assert len(want) > 0  # fixture must actually contain closed sessions
    assert got == want


def test_batch_sessions_invariants(spark, events):
    rows = sessionize_batch(events, GAP_MIN).collect()
    n_events = events.count()
    assert sum(r["n_events"] for r in rows) == n_events
    for r in rows:
        assert r["session_start"] <= r["session_end"]
