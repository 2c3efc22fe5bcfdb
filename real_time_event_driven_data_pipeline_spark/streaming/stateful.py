"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no stateful streaming (SURVEY §2.9) — this is the
Spark-native capability its architecture gestures at: per-key state
that survives across micro-batches, with explicit timeout-driven
flushing.  Gap-based sessionization is the canonical case: a session
is a run of one user's events where consecutive gaps are <= ``gap``;
it cannot be expressed as a (non-session) windowed aggregation because
the window boundary depends on the data.

Correctness under lateness: state holds the full LIST of open sessions
per key, new events merge into it interval-style (a late event may
extend a session backward, bridge two open sessions, or start its own),
and a session is emitted ONLY once the event-time watermark passes
session_end + gap — the point after which no admissible event can
extend or merge it.  Emitting on in-data gaps alone would mis-split
sessions when events arrive out of order across micro-batches.

Scale notes: state is partitioned by the grouping key across the
cluster and checkpointed by the state store (RocksDB-backed in prod
configs); each executor holds only its keys' state.  Event-time
timeout + watermark bound both state size and result latency at
100 TB/day event volumes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
# open sessions, parallel arrays sorted by start (epoch-micros + counts)
_STATE_SCHEMA = "starts array<long>, lasts array<long>, ns array<long>"

_US = 1_000_000
_MS = 1_000


def _merge_sessions(
    sessions: list[list[int]], ts_list: list[int], gap_us: int
) -> list[list[int]]:
    """Merge sorted event times into gap-sessions interval-style."""
    for t in ts_list:
        placed = False
        for s in sessions:
            if s[0] - gap_us <= t <= s[1] + gap_us:
                s[0] = min(s[0], t)
                s[1] = max(s[1], t)
                s[2] += 1
                placed = True
                break
        if not placed:
            sessions.append([t, t, 1])
    sessions.sort(key=lambda s: s[0])
    # bridge sessions a late event may have connected
    merged: list[list[int]] = []
    for s in sessions:
        if merged and s[0] - merged[-1][1] <= gap_us:
            merged[-1][1] = max(merged[-1][1], s[1])
            merged[-1][2] += s[2]
        else:
            merged.append(s)
    return merged


def _close_sessions_fn(gap_minutes: float, ts_col: str, user_col: str):
    gap_us = int(gap_minutes * 60 * _US)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        sessions: list[list[int]] = []
        if state.exists:
            starts, lasts, ns = state.get
            sessions = [[s, e, n] for s, e, n in zip(starts, lasts, ns)]

        if not state.hasTimedOut:
            ts_list: list[int] = []
            for pdf in pdfs:
                ts_list.extend(
                    int(t) for t in pdf[ts_col].astype("datetime64[us]").astype("int64")
                )
            ts_list.sort()
            sessions = _merge_sessions(sessions, ts_list, gap_us)

        # flush every session the watermark has sealed: no admissible
        # event (>= watermark) can reach [start - gap, last + gap]
        wm_us = state.getCurrentWatermarkMs() * _MS
        closed = [s for s in sessions if s[1] + gap_us < wm_us]
        keep = [s for s in sessions if s[1] + gap_us >= wm_us]

        if keep:
            state.update(
                ([s[0] for s in keep], [s[1] for s in keep], [s[2] for s in keep])
            )
            # wake when the watermark passes the oldest open session's
            # seal point (must be strictly > current watermark)
            next_ms = min(s[1] + gap_us for s in keep) // _MS + 1
            state.setTimeoutTimestamp(max(next_ms, state.getCurrentWatermarkMs() + 1))
        elif state.exists:
            state.remove()

        yield _emit(user_id, [tuple(s) for s in closed])

    return fn


def _emit(user_id, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(sessions), dtype="int64"),
            "session_start": pd.Series(
                [s for s, _, _ in sessions], dtype="datetime64[us]"
            ),
            "session_end": pd.Series([e for _, e, _ in sessions], dtype="datetime64[us]"),
            "n_events": pd.Series([n for _, _, n in sessions], dtype="int64"),
        }
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup by key with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps each key in state only
    until the watermark passes it — the streaming twin of the batch
    ``dedup_exact`` operator, and the standard guard against re-delivered
    events in a training-data ingest path.  State is partitioned by key
    across executors; the watermark bounds it at (arrival rate x delay).
    """
    from pyspark.sql import functions as F

    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join.

    The static side is re-read per micro-batch by Spark (so a slowly
    changing dimension table picks up updates between batches) and is
    broadcast when small — the standard pattern for attaching dimension
    attributes to an event stream without stateful machinery.
    """
    from pyspark.sql import functions as F

    return events.join(F.broadcast(dim), on, how)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join (the attribution shape, streaming).

    Inner-joins two event streams on ``key``, keeping right events whose
    timestamp lies in ``[left_ts - lookback, left_ts]`` — e.g. clicks
    preceding a purchase.  Both sides carry event-time watermarks and
    the join condition time-bounds both streams, so Spark can size the
    join state: each side buffers only rows the other side's watermark
    could still match (state ~ rate x (watermark + lookback) per side,
    partitioned by key across executors).  Without the time bound the
    state would grow forever — the condition is load-bearing, not an
    optimization.  This is the streaming twin of the batch binned range
    join (operators/rangejoin.py).

    ``left_ts`` and ``right_ts`` must be distinct names (rename before
    calling); the output keeps left's ``key`` column only.
    """
    from pyspark.sql import functions as F

    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    l = (  # noqa: E741
        left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
        .withWatermark(left_ts, watermark)
        .alias("l")
    )
    r = (
        right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
        .withWatermark(right_ts, watermark)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback}")
        )
    )
    return l.join(r, cond, "inner").drop(F.col(f"r.{key}"))


def sessionize_stream(
    events: DataFrame,
    gap_minutes: float = 30.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Closed gap-based sessions per user over a streaming frame.

    Emits a row per session once the event-time watermark passes
    ``session_end + gap`` (the session can no longer change).  Open
    sessions — including ones a late event might still extend backward
    or bridge — remain in state across micro-batches, which is the
    thing stateless windowing cannot do.
    """
    # watermarks require TIMESTAMP (ltz) — sessions are UTC-pinned so a
    # cast from NTZ parquet sources is lossless
    from pyspark.sql import functions as F

    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            _close_sessions_fn(gap_minutes, ts_col, user_col),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
