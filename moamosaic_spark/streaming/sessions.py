"""Event sessionization — batch (gaps-and-islands) and streaming
(applyInPandasWithState custom stateful operator).

The reference engine has no event stream (its queue is an intra-run
pipe, SURVEY.md §2.7); a 10^12-doc ingestion pipeline does, and
per-user sessionization is the canonical custom stateful operator the
built-in windowed aggregations can't express (session extent depends on
data, not a fixed window).

* ``sessionize`` — batch/exact: lag + running sum of new-session flags
  (the classic gaps-and-islands), pure window functions, DuckDB-
  replayable (driver_contract:q_user_sessions).
* ``sessionize_stream`` — streaming: groupBy(user).applyInPandasWithState;
  state = the one open session per user; a new event with gap >
  ``gap_seconds`` closes and EMITS the open session and starts a new
  one. Sessions still open when the stream pauses stay in state (and
  survive restarts via the checkpoint) — they emit when later data
  closes them. Events are sorted per micro-batch; data arriving across
  batches out of event-time order by more than the gap would need a
  watermark + timeout design, which this operator intentionally keeps
  out of scope (documented simplification).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", DoubleType()),
    StructField("session_end", DoubleType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("start", DoubleType()),
    StructField("last", DoubleType()),
    StructField("n", LongType()),
    StructField("sum_value", DoubleType()),
])


def sessionize(
    events: DataFrame,
    gap_seconds: float,
    user_col: str = "user_id",
    epoch_col: str = "epoch",
    value_col: str = "value",
) -> DataFrame:
    """Exact batch sessionization: events of one user belong to the same
    session while consecutive gaps are <= gap_seconds. Returns
    (user_id, session_start, session_end, n_events, sum_value)."""
    w = Window.partitionBy(user_col).orderBy(epoch_col)
    prev = F.lag(epoch_col).over(w)
    new_sess = (
        prev.isNull() | (F.col(epoch_col) - prev > F.lit(float(gap_seconds)))
    ).cast("int")
    run = events.withColumn(
        "_sess",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return run.groupBy(F.col(user_col).alias("user_id"), "_sess").agg(
        F.min(epoch_col).alias("session_start"),
        F.max(epoch_col).alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(value_col).cast("double").alias("sum_value"),
    ).drop("_sess")


def _make_session_fn(gap_seconds: float):
    gap = float(gap_seconds)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n, sv = state.get
        else:
            start = last = None
            n, sv = 0, 0.0
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values("epoch")
            for ep, val in zip(pdf["epoch"], pdf["value"]):
                ep, val = float(ep), float(val)
                if start is None:
                    start, last, n, sv = ep, ep, 1, val
                elif ep - last > gap:
                    closed.append((user_id, start, last, n, sv))
                    start, last, n, sv = ep, ep, 1, val
                else:
                    # cross-batch disorder within the gap: an earlier
                    # event merging into the open session must extend
                    # BOTH ends (the batch twin sorts globally and
                    # would put it first)
                    start = min(start, ep)
                    last = max(last, ep)
                    n += 1
                    sv += val
        if start is not None:
            state.update((start, last, n, sv))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
            )

    return fn


def sessionize_stream(
    events_stream: DataFrame,
    gap_seconds: float,
    checkpoint: str,
    out_path: str,
    trigger_available_now: bool = True,
):
    """Wire a streaming events DataFrame (columns user_id, epoch,
    value) into the stateful sessionizer; CLOSED sessions append to the
    parquet sink at ``out_path``. Returns the StreamingQuery."""
    closed = events_stream.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        closed.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
):
    """Watermarked tumbling-window aggregation over an event stream —
    the built-in late-data pattern (events later than ``watermark``
    behind the max seen event time are dropped; windows finalize once
    the watermark passes their end). Returns a streaming DataFrame
    (window, event_type, n, sum_value); semantics on bounded input
    match the batch groupBy(F.window(ts)) equivalent, which tests use
    as the golden."""
    # watermarks require TIMESTAMP (with timezone); NTZ event tables are
    # interpreted under the session timezone (set it to UTC for
    # determinism across runs)
    ev = events_stream.withColumn("_ts", F.col(ts_col).cast("timestamp"))
    return (
        ev.withWatermark("_ts", watermark)
        .groupBy(F.window("_ts", window).alias("window"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
