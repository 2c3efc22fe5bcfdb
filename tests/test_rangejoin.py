"""Binned interval join: exact equivalence with the naive range join
across bin widths (pairs crossing bin boundaries must not be lost or
duplicated)."""

import datetime as dt

import pytest

from real_time_event_driven_data_pipeline_spark.operators.rangejoin import interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            (1, "u1", _ts("2025-03-01T10:30:00")),
            (2, "u1", _ts("2025-03-01T11:59:59")),
            (3, "u1", _ts("2025-03-01T13:00:00")),
            (4, "u2", _ts("2025-03-01T10:30:00")),  # other key
        ],
        "pid bigint, user string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, "u1", _ts("2025-03-01T10:00:00"), _ts("2025-03-01T12:00:00")),
            (11, "u1", _ts("2025-03-01T11:00:00"), _ts("2025-03-01T14:00:00")),  # overlaps
            (12, "u2", _ts("2025-03-01T09:00:00"), _ts("2025-03-01T10:30:00")),  # end == ts
        ],
        "iid bigint, user string, s timestamp, e timestamp",
    )
    return points, intervals


def naive(points, intervals):
    p, i = points.alias("p"), intervals.alias("i")
    from pyspark.sql import functions as F

    return {
        (r.pid, r.iid)
        for r in p.join(
            i,
            (F.col("p.user") == F.col("i.user"))
            & (F.col("p.ts") >= F.col("i.s"))
            & (F.col("p.ts") <= F.col("i.e")),
        ).collect()
    }


def test_left_join_keeps_unmatched_points(spark, frames):
    points, intervals = frames
    rows = interval_join(
        points, intervals, "ts", "s", "e", by=["user"], how="left"
    ).collect()
    matched = {(r.pid, r.iid) for r in rows if r.iid is not None}
    unmatched = {r.pid for r in rows if r.iid is None}
    assert matched == naive(points, intervals)
    # point 3 (13:00, covered only by interval 11? 11 spans 11:00-14:00 ->
    # matched) — unmatched set = points with zero containing intervals
    all_matched_pids = {p for p, _ in matched}
    assert unmatched == {r.pid for r in points.collect()} - all_matched_pids


@pytest.mark.parametrize("bin_seconds", [60, 3600, 86400])
def test_matches_naive_all_bin_widths(spark, frames, bin_seconds):
    points, intervals = frames
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "ts", "s", "e", by=["user"], bin_seconds=bin_seconds
        ).collect()
    }
    assert got == naive(points, intervals)
    assert (2, 10) in got and (2, 11) in got  # overlapping intervals both match
    assert (4, 12) in got  # inclusive end bound
