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
  closes them. The kernel is vectorized: per micro-batch it runs numpy
  gaps-and-islands over the user's events (sort + diff + bincount, no
  per-event Python), then merges the handful of resulting session
  islands with the open state session by interval gap. Cross-batch
  events out of order by MORE than the gap split into their own
  (earlier) session and emit — observable divergence from a global
  sort, never a silent merge; a late fragment may duplicate a
  previously-emitted session's time range (inherent to late data
  without a watermark+timeout design, documented simplification).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StructField, StructType,
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

# emit-once mode holds EVERY not-yet-final island (bounded by the
# watermark horizon), not just the latest one
STATE_SCHEMA_EMIT_ONCE = StructType([
    StructField("starts", ArrayType(DoubleType())),
    StructField("ends", ArrayType(DoubleType())),
    StructField("ns", ArrayType(LongType())),
    StructField("sums", ArrayType(DoubleType())),
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


def _batch_islands(ep: "np.ndarray", val: "np.ndarray", gap: float):
    """Vectorized gaps-and-islands over one micro-batch's events (already
    a single user): sort by epoch, split where the gap exceeds ``gap``,
    aggregate per island with bincount. Returns a list of
    (start, end, n, sum_value) in time order — O(events) numpy work,
    O(islands) python."""
    order = np.argsort(ep, kind="stable")
    ep = ep[order]
    val = val[order]
    new = np.empty(len(ep), dtype=bool)
    new[0] = True
    if len(ep) > 1:
        np.greater(np.diff(ep), gap, out=new[1:])
    sess = np.cumsum(new) - 1
    starts = ep[new]
    ends = ep[np.flatnonzero(np.append(new[1:], True))]
    counts = np.bincount(sess)
    sums = np.bincount(sess, weights=val)
    return [
        (float(starts[i]), float(ends[i]), int(counts[i]), float(sums[i]))
        for i in range(len(starts))
    ]


def _make_session_fn(gap_seconds: float):
    gap = float(gap_seconds)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        eps, vals = [], []
        for pdf in pdfs:
            if len(pdf):
                eps.append(pdf["epoch"].to_numpy(dtype=np.float64))
                vals.append(pdf["value"].to_numpy(dtype=np.float64))
        islands: list[tuple[float, float, int, float]] = []
        if eps:
            islands = _batch_islands(
                np.concatenate(eps), np.concatenate(vals), gap
            )
        if state.exists:
            s_start, s_last, s_n, s_sv = state.get
            islands.append((float(s_start), float(s_last), int(s_n), float(s_sv)))
            islands.sort(key=lambda t: (t[0], t[1]))
        # merge adjacent islands whose interval gap is <= gap — this is
        # where the open state session joins (or bridges) batch
        # sessions. Splitting ALSO happens on the negative side: a
        # cross-batch island ending more than gap before the open
        # session's start stays a separate (earlier) session and is
        # emitted, exactly as the batch twin would — instead of silently
        # merging out-of-order-beyond-gap events.
        merged = _merge_islands(islands, gap)
        if merged:
            # latest island stays open in state; everything earlier is
            # closed and emitted
            st, en, n, sv = merged[-1]
            state.update((float(st), float(en), int(n), float(sv)))
        if len(merged) > 1:
            yield pd.DataFrame(
                [(user_id, m[0], m[1], int(m[2]), m[3]) for m in merged[:-1]],
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
            )

    return fn


def _merge_islands(islands: list, gap: float) -> list[list[float]]:
    """Merge time-sorted (start, end, n, sum) islands whose interval
    gap is <= gap."""
    merged: list[list[float]] = []
    for st, en, n, sv in islands:
        if merged and st - merged[-1][1] <= gap:
            m = merged[-1]
            m[0] = min(m[0], st)
            m[1] = max(m[1], en)
            m[2] += n
            m[3] += sv
        else:
            merged.append([st, en, n, sv])
    return merged


def _make_session_fn_emit_once(gap_seconds: float):
    """Watermark + event-time-timeout sessionizer: a session is emitted
    ONLY when the event-time watermark passes session_end + gap — at
    that point no in-order-enough event can still extend it (later
    fragments are beyond-watermark and DROPPED, documented), so every
    session row is emitted exactly once. The trade vs the default
    kernel: emission waits for the watermark instead of the next
    closing event, and state holds every island inside the watermark
    horizon (bounded by it) instead of just the open tail."""
    gap = float(gap_seconds)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        wm = state.getCurrentWatermarkMs() / 1000.0
        islands: list[tuple[float, float, int, float]] = []
        if state.exists:
            starts, ends, ns, svs = state.get
            islands = [
                (float(a), float(b), int(c), float(d))
                for a, b, c, d in zip(starts, ends, ns, svs)
            ]
        eps, vals = [], []
        for pdf in pdfs:
            if len(pdf):
                ep = pdf["epoch"].to_numpy(dtype=np.float64)
                va = pdf["value"].to_numpy(dtype=np.float64)
                keep = ep >= wm  # beyond-watermark fragments: dropped
                if keep.any():
                    eps.append(ep[keep])
                    vals.append(va[keep])
        if eps:
            islands += _batch_islands(np.concatenate(eps), np.concatenate(vals), gap)
            islands.sort(key=lambda t: (t[0], t[1]))
        merged = _merge_islands(islands, gap)
        # STRICT close (end+gap < wm, not <=): an event at exactly
        # ts == wm passes the late filter and may still extend a
        # session whose end+gap == wm — emitting it then would split
        # what the batch twin merges
        final = [m for m in merged if m[1] + gap < wm]
        pending = [m for m in merged if m[1] + gap >= wm]
        if pending:
            state.update((
                [m[0] for m in pending],
                [m[1] for m in pending],
                [int(m[2]) for m in pending],
                [m[3] for m in pending],
            ))
            # wake when the watermark passes the earliest pending close
            wake_ms = int((pending[0][1] + gap) * 1000)
            state.setTimeoutTimestamp(max(wake_ms, int(wm * 1000) + 1))
        elif state.exists:
            state.remove()
        if final:
            yield pd.DataFrame(
                [(user_id, m[0], m[1], int(m[2]), m[3]) for m in final],
                columns=["user_id", "session_start", "session_end",
                         "n_events", "sum_value"],
            )

    return fn


def sessionize_stream(
    events_stream: DataFrame,
    gap_seconds: float,
    checkpoint: str,
    out_path: str,
    trigger_available_now: bool = True,
    emit_once: bool = False,
    watermark: str = "10 minutes",
):
    """Wire a streaming events DataFrame (columns user_id, epoch,
    value) into the stateful sessionizer; CLOSED sessions append to the
    parquet sink at ``out_path``. Returns the StreamingQuery.

    Default mode emits a session as soon as a later event closes it —
    lowest latency, but a fragment arriving after that may re-emit the
    session's range. ``emit_once=True`` switches to the watermark +
    event-time-timeout kernel: sessions emit only once the event-time
    watermark (``watermark`` behind max event time) passes their end +
    gap; fragments later than the watermark are dropped — exactly-once
    session rows, latency = the watermark delay."""
    if emit_once:
        ev = events_stream.withColumn(
            "_ts", F.col("epoch").cast("timestamp")
        ).withWatermark("_ts", watermark)
        closed = ev.groupBy("user_id").applyInPandasWithState(
            _make_session_fn_emit_once(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA_EMIT_ONCE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    else:
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
