"""Gap-based sessionization — batch twin + custom stateful streaming.

Training-data-pipeline extension (no reference analog; the reference's
only "state" is stage snapshots, SURVEY.md §2.9). Sessions = maximal runs
of a user's events where consecutive events are ≤ gap apart.

Two implementations of the SAME semantics:

- sessionize_batch: pure window functions (lag → gap flag → running sum →
  group), fully codegen, SQL-expressible — this is the driver-oracle'd
  surface (`event_sessions`).
- sessionize_stream: `applyInPandasWithState` over a streaming DataFrame —
  the custom stateful operator shape Structured Streaming offers when
  built-in session windows don't fit (here: we also carry a running value
  sum and emit sessions closed by an in-data gap). State per user is one
  open session (start, last_ts, n, total); sessions are CLOSED and emitted
  as soon as a later event arrives > gap after the last one. The trailing
  open session per user stays in state (a production run would add
  EventTimeTimeout + watermark to flush idle sessions; with a finite
  availableNow stream the trailing sessions are intentionally held, and
  tests assert closed == batch minus each user's final session).

At 100 TB scale: state is O(active users), keyed shuffle is the standard
stateful-stream exchange, and the per-group kernel is a vectorized numpy
gap-split (no per-row Python beyond group dispatch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_GAP_MIN = 240


def sessionize_batch(events: DataFrame,
                     gap_minutes: int = DEFAULT_GAP_MIN) -> DataFrame:
    """(user_id, session_idx, session_start, session_end, n_events,
    total_value) — gap-and-island sessionization, all whole-stage codegen.

    session_idx is 1-based in (ts, event_id) order per user, so output is
    deterministic for any tie pattern.
    """
    # parquet feeds often carry TIMESTAMP_NTZ, which won't cast to long;
    # session tz is pinned UTC so the timestamp cast is value-preserving.
    # Gaps compare in MICROSECONDS (unix_micros) — whole-second truncation
    # merges sessions whose gap is e.g. 14400.38 s when the threshold is
    # 14400, diverging from the oracle's fractional epoch() and from the
    # streaming twin.
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    ts_us = F.unix_micros(F.col("ts"))
    prev = F.lag(ts_us).over(w)
    new_sess = F.when(
        prev.isNull() | (ts_us - prev > gap_us),
        F.lit(1)).otherwise(F.lit(0))
    running = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val = F.col("value").cast("decimal(18,6)")
    return (
        events.withColumn("new_sess", new_sess)
        .withColumn("session_idx", F.sum("new_sess").over(running))
        .groupBy("user_id", "session_idx")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count("*").alias("n_events"),
             F.round(F.sum(val), 4).cast("double").alias("total_value"))
    )


_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),   # open-session start (epoch µs)
    T.StructField("last_us", T.LongType()),    # last event ts (epoch µs)
    T.StructField("n", T.LongType()),
    T.StructField("total_micro", T.LongType()),  # value sum in 1e-6 units
])


def _round_half_up_4(total_micro: np.ndarray) -> np.ndarray:
    """Micro-unit total → double rounded to 4 decimals, HALF_UP (away from
    zero), matching Spark/DuckDB DECIMAL round — np.round's half-to-even
    diverges on .00005 boundaries."""
    tm = np.asarray(total_micro, np.int64)
    sign = np.sign(tm)
    return sign * ((np.abs(tm) + 50) // 100) / 1e4


def _gap_split(ts_us: np.ndarray, vals_micro: np.ndarray, gap_us: int,
               carry: tuple[int, int, int, int] | None):
    """Vectorized session splitter for one user's sorted events.

    vals_micro are event values in integer micro-units (value × 1e6), so
    accumulation is exact and matches the batch DECIMAL(18,6) sum.
    Returns (closed_sessions, open_carry) where closed_sessions is a list
    of (start_us, end_us, n, total_micro) and open_carry the trailing open
    one.
    """
    sessions = []
    if carry is not None:
        start_us, last_us, n0, tot0 = carry
        if len(ts_us) and ts_us[0] - last_us <= gap_us:
            # first incoming run extends the carried session
            pass
        else:
            sessions.append((start_us, last_us, n0, tot0))
            carry = None
    if len(ts_us) == 0:
        return sessions, carry
    breaks = np.nonzero(np.diff(ts_us) > gap_us)[0] + 1
    starts = np.concatenate(([0], breaks))
    ends = np.concatenate((breaks, [len(ts_us)]))
    for i, (s, e) in enumerate(zip(starts, ends)):
        n = int(e - s)
        tot = int(vals_micro[s:e].sum())
        st, en = int(ts_us[s]), int(ts_us[e - 1])
        if i == 0 and carry is not None:
            st = carry[0]
            # a micro-batch is not guaranteed globally time-ordered vs the
            # carried session — never let session_end regress below the
            # carried last-event timestamp
            en = max(en, carry[1])
            n += carry[2]
            tot += carry[3]
        if e == len(ts_us):  # trailing run stays open
            return sessions, (st, en, n, tot)
        sessions.append((st, en, n, tot))
    return sessions, None  # unreachable: loop always returns on last run


def sessionize_stream(events: DataFrame,
                      gap_minutes: int = DEFAULT_GAP_MIN) -> DataFrame:
    """Custom stateful streaming sessionization via applyInPandasWithState.

    Emits a row per CLOSED session (closed by a later-arriving event > gap
    after the session's last event). `events` must be a streaming
    DataFrame (readStream); use sessionize_batch for batch inputs.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        ts_parts, val_parts = [], []
        for pdf in pdfs:
            ts_parts.append(pdf["ts"].to_numpy("datetime64[us]").astype(np.int64))
            # integer micro-units so stream accumulation is exact and agrees
            # with the batch DECIMAL(18,6) sum bit-for-bit
            val_parts.append(np.rint(
                pdf["value"].to_numpy(np.float64) * 1e6).astype(np.int64))
        ts_us = np.concatenate(ts_parts) if ts_parts else np.array([], np.int64)
        vals = np.concatenate(val_parts) if val_parts else np.array([], np.int64)
        order = np.argsort(ts_us, kind="stable")
        ts_us, vals = ts_us[order], vals[order]

        carry = state.get if state.exists else None
        closed, open_carry = _gap_split(ts_us, vals, gap_us, carry)
        if open_carry is not None:
            state.update(open_carry)
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame({
                "user_id": np.full(len(closed), user_id, dtype=np.int64),
                "session_start": pd.to_datetime(
                    [c[0] for c in closed], unit="us"),
                "session_end": pd.to_datetime(
                    [c[1] for c in closed], unit="us"),
                "n_events": np.array([c[2] for c in closed], np.int64),
                "total_value": _round_half_up_4(
                    np.array([c[3] for c in closed], np.int64)),
            })

    src = events.select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                        "value")
    return src.groupBy("user_id").applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)


def run_sessions_stream(spark, events_dir: str, checkpoint_dir: str,
                        out_table: str,
                        gap_minutes: int = DEFAULT_GAP_MIN) -> None:
    """availableNow file-source run of sessionize_stream into a memory sink
    (test/dev harness; production swaps the sink for files/Kafka)."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    (
        sessionize_stream(stream, gap_minutes)
        .writeStream.outputMode("append")
        .format("memory").queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(600)
    )
