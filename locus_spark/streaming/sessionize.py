"""Custom stateful streaming operator: user sessionization.

The reference is fully batch (no streaming semantics exist in locus), so this
is engine surface, not parity: the canonical "custom stateful operator"
pattern — ``applyInPandasWithState`` keyed by user, state = the open
session, output = closed sessions.  A session closes when a gap larger than
``gap`` seconds separates consecutive events (or on processing-timeout for
truly idle users).

Scale shape: state is per-user and O(1); the shuffle is one hash exchange on
``user_id``; batches stream through Arrow.  The same callable works under
``trigger(availableNow=True)`` for backfill and continuous triggers for live
streams — but note that with ``ProcessingTimeTimeout`` an availableNow query
does not self-terminate (it stays alive to fire idle-session timeouts); for
pure backfill use ``sessionize_batch``, which emits open tails too.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events int"
)
STATE_SCHEMA = "start bigint, last bigint, n int"

#: default inactivity gap that closes a session (seconds)
DEFAULT_GAP_S = 1800


def _sessionize_user(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                }
            )
        return

    ts: list[int] = []
    for b in batches:
        # microseconds since epoch — integers, exact
        ts.extend(b["ts"].astype("datetime64[us]").astype("int64").tolist())
    ts.sort()
    start, last, n = state.get if state.exists else (None, None, 0)
    closed: list[tuple[int, int, int]] = []
    for t in ts:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > gap_s * 1_000_000:
            closed.append((start, last, n))
            start, last, n = t, t, 1
        else:
            # cross-batch late event (t <= last): fold into the open session
            # without moving `last` backwards — see ordered-arrival caveat in
            # sessionize_stream's docstring
            last, n = max(last, t), n + 1
    state.update((start, last, n))
    state.setTimeoutDuration(gap_s * 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize_batch(
    events: DataFrame, gap_s: int = DEFAULT_GAP_S
) -> DataFrame:
    """Batch form of the sessionization (same gap semantics, window-function
    plan — lag/cumsum/groupBy, all JVM-side).  Emits every session including
    open tails; the streaming form above emits a session when the gap (or the
    state timeout) closes it.  Order key is (ts, event_id) so duplicate
    timestamps sessionize deterministically."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps may load as TIMESTAMP_NTZ; session TZ is UTC, so the
    # cast is instant-preserving
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = (prev.isNull() | (us - prev > gap_s * 1_000_000)).cast("int")
    sid = F.sum(new_session).over(w)
    return (
        events.select("user_id", "event_id", "ts")
        .withColumn("_sid", sid)
        .groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def sessionize_stream(
    events: DataFrame, gap_s: int = DEFAULT_GAP_S
) -> DataFrame:
    """Closed sessions per user from a (streaming) events DataFrame with
    columns (user_id long, ts timestamp).

    **Ordered-arrival assumption**: there is no event-time watermark — events
    are sorted *within* each micro-batch, but an event arriving in a later
    batch with ``ts`` earlier than the open session's ``last`` is folded into
    the current session (``last`` never moves backwards), and an event whose
    session was already emitted starts/extends a new one.  Under heavily
    out-of-order arrival the streaming output therefore diverges from
    ``sessionize_batch`` (which sees the full history) — both the fold
    behavior and the divergence are pinned by the multi-batch replay test
    (tests/test_streaming_multimodal.py::
    test_sessionize_stream_out_of_order_replay).  Idle sessions are
    closed by ``ProcessingTimeTimeout`` — i.e. on *processing* time, not
    event time."""

    def fn(key, batches, state):
        yield from _sessionize_user(key, batches, state, gap_s)

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
