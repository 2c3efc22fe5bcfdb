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


# --- property-based equivalence with pandas merge_asof ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=500),  # seconds offset
    ),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_rows=_events, right_rows=_events)
def test_matches_pandas_merge_asof(spark, left_rows, right_rows):
    import pandas as pd

    base = dt.datetime(2025, 3, 1)
    lp = pd.DataFrame(
        {
            "user": [u for u, _ in left_rows],
            "ts": [base + dt.timedelta(seconds=s) for _, s in left_rows],
        }
    ).assign(lid=lambda d: range(len(d)))
    rp = (
        pd.DataFrame(
            {
                "user": [u for u, _ in right_rows],
                "ts": [base + dt.timedelta(seconds=s) for _, s in right_rows],
            }
        )
        .drop_duplicates(["user", "ts"])  # unique match target per (key, ts)
        .assign(rv=lambda d: [float(i) for i in range(len(d))])
    )
    if lp.empty or rp.empty:
        return

    want = pd.merge_asof(
        lp.sort_values("ts", kind="stable"),
        rp.sort_values("ts", kind="stable"),
        on="ts",
        by="user",
        direction="backward",
    )
    want_map = {
        r.lid: (None if pd.isna(r.rv) else r.rv) for r in want.itertuples()
    }

    left = spark.createDataFrame(lp, "user int, ts timestamp, lid long")
    right = spark.createDataFrame(rp, "user int, ts timestamp, rv double")
    got = {
        r.lid: r.asof_rv
        for r in asof_join(left, right, on="ts", by=["user"]).collect()
    }
    assert got == want_map


# --- grouped as-of aggregate (asof_aggregate) ------------------------


@pytest.fixture(scope="module")
def agg_frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2025-03-01T10:00:00")),
            (2, "u1", _ts("2025-03-01T11:00:00")),
            (3, "u2", _ts("2025-03-01T10:30:00")),
            (4, "u3", _ts("2025-03-01T09:00:00")),  # no right rows
        ],
        "id bigint, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2025-03-01T09:55:00"), 10.0),
            ("u1", _ts("2025-03-01T10:00:00"), 20.0),  # tie with left id=1
            ("u1", _ts("2025-03-01T10:59:00"), 40.0),
            ("u2", _ts("2025-03-01T10:31:00"), 99.0),  # after left id=3
            ("u2", _ts("2025-03-01T10:00:00"), None),  # null value row
        ],
        "user string, ts timestamp, v double",
    )
    return left, right


def test_asof_aggregate_inclusive(spark, agg_frames):
    from real_time_event_driven_data_pipeline_spark.operators.asof import asof_aggregate

    left, right = agg_frames
    got = {
        r.id: (r.n, r.s, r.mx, r.av)
        for r in asof_aggregate(
            left,
            right,
            on="ts",
            by=["user"],
            aggs={
                "n": ("v", "count"),
                "s": ("v", "sum"),
                "mx": ("v", "max"),
                "av": ("v", "avg"),
            },
        ).collect()
    }
    assert got[1] == (2, 30.0, 20.0, 15.0)  # tie included, count counts ROWS
    assert got[2] == (3, 70.0, 40.0, 70.0 / 3)
    # u2: only the null-value row is <= 10:30 -> count 1 row, aggs null
    assert got[3] == (1, None, None, None)
    assert got[4] == (0, None, None, None)  # no right rows at all


def test_asof_aggregate_strict_bound(spark, agg_frames):
    from real_time_event_driven_data_pipeline_spark.operators.asof import asof_aggregate

    left, right = agg_frames
    got = {
        r.id: (r.n, r.s)
        for r in asof_aggregate(
            left,
            right,
            on="ts",
            by=["user"],
            aggs={"n": ("v", "count"), "s": ("v", "sum")},
            include_equal=False,
        ).collect()
    }
    assert got[1] == (1, 10.0)  # the 10:00 tie now excluded
    assert got[2] == (3, 70.0)


def test_asof_aggregate_null_ts_right_rows_never_match(spark, agg_frames):
    """ADVICE r4: a null-ts right row sorts FIRST under window ordering
    and would leak into every frame, but the SQL oracle's
    ``right.ts <= left.ts`` never matches null — pin the join-semantics
    behavior (null-ts rows contribute nothing; a null-ts LEFT row
    aggregates over nothing)."""
    from real_time_event_driven_data_pipeline_spark.operators.asof import asof_aggregate

    left, right = agg_frames
    left = left.union(
        spark.createDataFrame([(9, "u1", None)], left.schema)
    )
    right = right.union(
        spark.createDataFrame([("u1", None, 1000.0)], right.schema)
    )
    got = {
        r.id: (r.n, r.s)
        for r in asof_aggregate(
            left, right, on="ts", by=["user"],
            aggs={"n": ("v", "count"), "s": ("v", "sum")},
        ).collect()
    }
    assert got[1] == (2, 30.0)  # the 1000.0 null-ts row did NOT leak in
    assert got[9] == (0, None)  # null-ts left row matches nothing


def test_asof_join_null_ts_right_rows_never_match(spark, agg_frames):
    from real_time_event_driven_data_pipeline_spark.operators.asof import asof_join

    left, right = agg_frames
    right = right.union(
        spark.createDataFrame([("u3", None, 1000.0)], right.schema)
    )
    got = {r.id: r.asof_v for r in asof_join(left, right, by=["user"]).collect()}
    assert got[4] is None  # u3's only right row has null ts -> no match


def test_asof_aggregate_unknown_fn(spark, agg_frames):
    from real_time_event_driven_data_pipeline_spark.operators.asof import asof_aggregate

    left, right = agg_frames
    with pytest.raises(ValueError, match="unknown asof aggregate"):
        asof_aggregate(left, right, by=["user"], aggs={"x": ("v", "median")}).collect()
