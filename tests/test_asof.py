"""As-of join semantics: inclusive backward match, left-join nulls,
null value fields preserved, tolerance windows."""

import datetime as dt

import pytest

from real_time_event_driven_data_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2025-03-01T10:00:00"), 100.0),
            (2, "u1", _ts("2025-03-01T11:00:00"), 200.0),
            (3, "u2", _ts("2025-03-01T10:30:00"), 300.0),
            (4, "u3", _ts("2025-03-01T09:00:00"), 400.0),  # no right rows
        ],
        "id bigint, user string, ts timestamp, amount double",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2025-03-01T09:55:00"), "a"),
            ("u1", _ts("2025-03-01T10:00:00"), "b"),  # ties left id=1 -> inclusive
            ("u1", _ts("2025-03-01T10:59:00"), "c"),
            ("u2", _ts("2025-03-01T10:31:00"), "d"),  # after left id=3 -> no match
            ("u2", _ts("2025-03-01T10:00:00"), None),  # matched value is null
        ],
        "user string, ts timestamp, tag string",
    )
    return left, right


def test_backward_inclusive_match(spark, frames):
    left, right = frames
    out = {r.id: r for r in asof_join(left, right, on="ts", by=["user"]).collect()}
    assert out[1].asof_tag == "b"  # equal ts matches (inclusive)
    assert out[2].asof_tag == "c"  # latest prior
    assert out[4].asof_ts is None and out[4].asof_tag is None  # left join


def test_null_value_field_not_skipped(spark, frames):
    left, right = frames
    out = {r.id: r for r in asof_join(left, right, on="ts", by=["user"]).collect()}
    # u2's matched row (10:00) carries a NULL tag; it must NOT fall back
    # to an older non-null row
    assert out[3].asof_ts == _ts("2025-03-01T10:00:00")
    assert out[3].asof_tag is None


def test_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    out = {
        r.id: r
        for r in asof_join(
            left, right, on="ts", by=["user"], tolerance_seconds=120
        ).collect()
    }
    assert out[1].asof_tag == "b"  # 0s old, kept
    assert out[2].asof_tag == "c"  # 60s old, kept
    assert out[3].asof_tag is None and out[3].asof_ts is None  # 1800s, dropped


def test_left_columns_untouched(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="ts", by=["user"])
    assert out.count() == left.count()
    assert [c for c in out.columns[:4]] == ["id", "user", "ts", "amount"]
