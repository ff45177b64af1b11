"""Sessionization: batch gaps-and-islands vs a pandas golden, and the
applyInPandasWithState streaming operator across micro-batches (state
carries open sessions between batches; later data closes and emits
them; checkpoint resume keeps state)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

from moamosaic_spark.streaming.sessions import sessionize, sessionize_stream

EV_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("epoch", DoubleType()),
    StructField("value", DoubleType()),
])

GAP = 100.0


def golden_sessions(rows):
    """Independent pandas implementation."""
    out = []
    df = pd.DataFrame(rows, columns=["user_id", "epoch", "value"])
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("epoch")
        start = last = None
        n, sv = 0, 0.0
        for ep, val in zip(g["epoch"], g["value"]):
            if start is None:
                start, last, n, sv = ep, ep, 1, val
            elif ep - last > GAP:
                out.append((uid, start, last, n, sv))
                start, last, n, sv = ep, ep, 1, val
            else:
                last, n, sv = ep, n + 1, sv + val
        if start is not None:
            out.append((uid, start, last, n, sv))
    return sorted(out)


ROWS_B1 = [
    (1, 10.0, 1.0), (1, 50.0, 2.0),            # user 1 session A (open)
    (2, 0.0, 5.0),                               # user 2 session A (open)
    (1, 400.0, 3.0),                             # closes A, opens B
]
ROWS_B2 = [
    (1, 450.0, 4.0),                             # extends B
    (2, 1000.0, 6.0),                            # closes user2 A, opens B
    (1, 2000.0, 7.0),                            # closes B, opens C
    (3, 5.0, 9.0),                               # user 3 session A (open)
]


def test_batch_sessionize_matches_golden(spark):
    df = spark.createDataFrame(ROWS_B1 + ROWS_B2, EV_SCHEMA)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in sessionize(df, GAP).collect()
    )
    assert got == golden_sessions(ROWS_B1 + ROWS_B2)


def test_streaming_sessions_across_batches(spark, tmp_path):
    src = tmp_path / "ev_src"
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def feed(rows, name):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )

    def run():
        stream = (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src) + "/*")
        )
        q = sessionize_stream(stream, GAP, ckpt, out)
        q.awaitTermination(300)

    feed(ROWS_B1, "b1")
    run()
    # only sessions CLOSED by in-batch data so far: user1 session A
    got1 = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    )
    assert got1 == [(1, 10.0, 50.0, 2, 3.0)]

    # second availableNow run picks up ONLY the new file via the
    # checkpoint; state (open sessions) survived the restart
    feed(ROWS_B2, "b2")
    run()
    got2 = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    )
    all_rows = ROWS_B1 + ROWS_B2
    golden_all = golden_sessions(all_rows)
    # emitted = every golden session that is CLOSED (a later event for
    # the same user exists beyond the gap); open tails stay in state
    open_tails = set()
    df = pd.DataFrame(all_rows, columns=["user_id", "epoch", "value"])
    for uid, g in df.groupby("user_id"):
        open_tails.add(uid)
    want_closed = [
        s for s in golden_all
        if not (s[0] in open_tails and s == max(
            [t for t in golden_all if t[0] == s[0]], key=lambda t: t[1]))
    ]
    assert got2 == sorted(want_closed)
    # user 3 never closed: absent
    assert all(r[0] != 3 for r in got2)


def test_windowed_event_counts_matches_batch(spark, tmp_path):
    """readStream + watermark + tumbling window == the batch windowed
    aggregation on the same bounded input (append mode emits only
    watermark-finalized windows; availableNow + bounded input finalizes
    all but the trailing window, so compare on the emitted set)."""
    from moamosaic_spark.streaming.sessions import windowed_event_counts

    src = str(tmp_path / "ev.parquet")
    out = str(tmp_path / "win_out")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        windowed_event_counts(stream, "1 hour", "2 hours")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.window.start, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    assert got, "no finalized windows emitted"
    want = {
        (r.window.start, r.event_type): (r.n, r.sum_value)
        for r in ev.withColumn("_ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("_ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .collect()
    }
    # every emitted (finalized) window must equal the batch value, and
    # only trailing windows past the final watermark may be missing
    for k, v in got.items():
        assert want[k] == v, k
    missing_starts = {k[0] for k in want} - {k[0] for k in got}
    if missing_starts:
        max_emitted = max(k[0] for k in got)
        assert all(s > max_emitted for s in missing_starts)


def test_streaming_session_extends_start_backward(spark, tmp_path):
    """Cross-batch disorder WITHIN the gap: a later batch delivering an
    earlier event must extend the open session's start (the batch twin
    sorts globally and would put it first)."""
    src = tmp_path / "ev_back"
    out = str(tmp_path / "sess_back")
    ckpt = str(tmp_path / "ckpt_back")
    src.mkdir()

    def feed_and_run(rows, name):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )
        stream = spark.readStream.schema(EV_SCHEMA).parquet(str(src) + "/*")
        q = sessionize_stream(stream, GAP, ckpt, out)
        q.awaitTermination(300)

    feed_and_run([(7, 500.0, 1.0)], "b1")
    # batch 2: an EARLIER event within the gap joins the open session,
    # then a far event closes it
    feed_and_run([(7, 450.0, 2.0), (7, 5000.0, 3.0)], "b2")
    got = [
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    ]
    assert got == [(7, 450.0, 500.0, 2, 3.0)], got


def test_streaming_session_splits_beyond_gap_backward(spark, tmp_path):
    """Cross-batch disorder BEYOND the gap: an event older than the open
    session's start by more than the gap must become its own (earlier)
    session and emit — exactly what a global sort would produce — not
    silently merge into the open session (ADVICE round-2 low)."""
    from moamosaic_spark.streaming.sessions import sessionize

    src = tmp_path / "ev_split"
    out = str(tmp_path / "sess_split")
    ckpt = str(tmp_path / "ckpt_split")
    src.mkdir()

    def feed_and_run(rows, name):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )
        stream = spark.readStream.schema(EV_SCHEMA).parquet(str(src) + "/*")
        q = sessionize_stream(stream, GAP, ckpt, out)
        q.awaitTermination(300)

    feed_and_run([(9, 1000.0, 1.0), (9, 1050.0, 2.0)], "b1")
    # a late event 900s before the open session's start (gap=100):
    # a separate earlier session, emitted immediately
    feed_and_run([(9, 100.0, 5.0)], "b2")
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(9, 100.0, 100.0, 1, 5.0)], got
    # the batch twin on the same rows agrees on that session
    all_rows = [(9, 1000.0, 1.0), (9, 1050.0, 2.0), (9, 100.0, 5.0)]
    batch = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in sessionize(
            spark.createDataFrame(all_rows, EV_SCHEMA), GAP
        ).collect()
    )
    assert batch[0] == got[0]


def test_streaming_session_big_batch_matches_batch_twin(spark, tmp_path):
    """One hot user with many disordered events inside a single micro-
    batch: the vectorized gaps-and-islands kernel must equal the batch
    twin exactly (all but the trailing open session emitted)."""
    import numpy as np

    from moamosaic_spark.streaming.sessions import sessionize

    rng = np.random.default_rng(11)
    eps = np.cumsum(rng.integers(1, 300, size=4000)).astype(float)
    rng.shuffle(eps)  # heavy within-batch disorder
    rows = [(42, float(e), float(i % 7)) for i, e in enumerate(eps)]

    src = tmp_path / "ev_big"
    out = str(tmp_path / "sess_big")
    src.mkdir()
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = spark.readStream.schema(EV_SCHEMA).parquet(str(src) + "/*")
    q = sessionize_stream(stream, GAP, str(tmp_path / "ckpt_big"), out)
    q.awaitTermination(300)

    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
        for r in spark.read.parquet(out).collect()
    )
    batch = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
        for r in sessionize(spark.createDataFrame(rows, EV_SCHEMA), GAP).collect()
    )
    assert len(batch) > 10, "fixture should produce many sessions"
    assert got == batch[:-1]  # trailing session stays open in state


def test_streaming_sessions_emit_once_no_late_duplicate(spark, tmp_path):
    """emit_once mode: a session emits ONLY when the event-time
    watermark passes its end + gap, and a late fragment arriving after
    that emission is dropped — never a duplicated/extended session row
    (the default mode's documented re-emission hazard)."""
    src = tmp_path / "ev_src1"
    out = str(tmp_path / "sessions1")
    ckpt = str(tmp_path / "ckpt1")
    src.mkdir()

    def feed(rows, name):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )

    def run():
        stream = (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src) + "/*")
        )
        q = sessionize_stream(stream, GAP, ckpt, out, emit_once=True,
                              watermark="10 seconds")
        q.awaitTermination(300)

    def sessions():
        try:
            return sorted(
                (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
                for r in spark.read.parquet(out).collect()
            )
        except Exception:
            return []

    # session A for user 1; nothing can emit yet (watermark behind)
    feed([(1, 10.0, 1.0), (1, 50.0, 2.0)], "b1")
    run()
    assert sessions() == []

    # advance event time far past A's end+gap; A emits on the NEXT
    # batch (watermark trails one batch), via the event-time timer —
    # no user-1 event needed
    feed([(1, 5000.0, 3.0)], "b2")
    run()
    assert sessions() == [(1, 10.0, 50.0, 2, 3.0)]

    # next run's no-data batch advances the watermark past 5000's
    # close, firing user 1's event-time timer with no new user-1 data
    feed([(2, 6000.0, 5.0)], "b3")
    run()
    assert sessions() == [(1, 10.0, 50.0, 2, 3.0),
                          (1, 5000.0, 5000.0, 1, 3.0)]

    # a LATE fragment inside A's range: beyond-watermark -> dropped;
    # the emitted sessions must not duplicate, extend, or re-emit
    feed([(1, 60.0, 99.0)], "b4")
    run()
    assert sessions() == [(1, 10.0, 50.0, 2, 3.0),
                          (1, 5000.0, 5000.0, 1, 3.0)]


def test_streaming_emit_once_survives_kill_restart(spark, tmp_path):
    """emit_once across checkpoint restarts: every run() below is a
    COLD START of the streaming query from the same checkpoint (the
    previous query object is gone — the kill/restart boundary). A
    session held only in state must survive restarts and emit exactly
    once when a post-restart watermark passes it; a restart with no
    new data (pure replay) must neither duplicate nor lose emissions."""
    src = tmp_path / "ev_src_kr"
    out = str(tmp_path / "sessions_kr")
    ckpt = str(tmp_path / "ckpt_kr")
    src.mkdir()

    def feed(rows, name):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )

    def run():
        stream = (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src) + "/*")
        )
        q = sessionize_stream(stream, GAP, ckpt, out, emit_once=True,
                              watermark="10 seconds")
        q.awaitTermination(300)

    def sessions():
        try:
            return sorted(
                (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
                for r in spark.read.parquet(out).collect()
            )
        except Exception:
            return []

    A = (1, 10.0, 50.0, 2, 3.0)
    B = (1, 5000.0, 5000.0, 1, 3.0)

    # session A enters STATE only; the query then dies
    feed([(1, 10.0, 1.0), (1, 50.0, 2.0)], "b1")
    run()
    assert sessions() == []
    # restart with no new data: nothing duplicated, nothing lost
    run()
    assert sessions() == []

    # post-restart data advances the watermark past A's close: the
    # session held in pre-restart state emits exactly once
    feed([(1, 5000.0, 3.0)], "b2")
    run()
    assert sessions() == [A]
    # another pure-replay restart: still exactly one A
    run()
    assert sessions() == [A]

    # the 5000-session now lives in state ACROSS two restart
    # boundaries; a watermark-advancing batch after yet another
    # restart fires its event-time timer — not lost, not doubled
    feed([(2, 6000.0, 5.0)], "b3")
    run()
    assert sessions() == [A, B]
    run()
    assert sessions() == [A, B]
