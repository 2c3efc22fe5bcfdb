"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no stateful streaming (SURVEY §2.9) — this is the
Spark-native capability its architecture gestures at: per-key state
that survives across micro-batches, with explicit timeout-driven
flushing.  Gap-based sessionization is the canonical case: a session
is a run of one user's events where consecutive gaps are <= ``gap``;
it cannot be expressed as a (non-session) windowed aggregation because
the window boundary depends on the data.

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
_STATE_SCHEMA = "start long, last long, n long"  # epoch-micros + count

_US = 1_000_000


def _close_sessions_fn(gap_minutes: float, ts_col: str, user_col: str):
    gap_us = int(gap_minutes * 60 * _US)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # event-time timeout: watermark passed last_ts + gap -> the
            # open session can never be extended; flush it
            start, last, n = state.get
            state.remove()
            yield _emit(user_id, [(start, last, n)])
            return

        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(
                int(t) for t in pdf[ts_col].astype("datetime64[us]").astype("int64")
            )
        ts_list.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        for t in ts_list:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        # timeout when the event-time watermark passes last + gap
        state.setTimeoutTimestamp((last + gap_us) // 1000)
        yield _emit(user_id, closed)

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


def sessionize_stream(
    events: DataFrame,
    gap_minutes: float = 30.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Closed gap-based sessions per user over a streaming frame.

    Emits a row per *closed* session: one the data closed (a later
    event arrived past the gap) or the event-time timeout closed (the
    watermark passed session_end + gap).  Open sessions remain in
    state across micro-batches — the thing stateless windowing cannot
    do.
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
