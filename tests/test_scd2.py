"""SCD2 dimension history: initial build (change compression +
interval stitching) and incremental merge (closed rows untouched,
forward-only updates, O(touched-keys) rebuild)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from real_time_event_driven_data_pipeline_spark.operators.scd2 import (
    scd2_build,
    scd2_merge,
)


def _d(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def log(spark):
    # key 1: A -> A (compressed) -> B; key 2: constant X; key 3: C
    rows = [
        (1, _d("2025-01-01"), "A", 10),
        (1, _d("2025-01-05"), "A", 11),  # no-op update -> compressed
        (1, _d("2025-02-01"), "B", 12),
        (2, _d("2025-01-03"), "X", 13),
        (2, _d("2025-03-03"), "X", 14),  # no-op
        (3, _d("2025-01-02"), "C", 15),
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, attr string, src long")


def _by_key(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.k, []).append(
            (r.attr, r.valid_from, r.valid_to, r.is_current)
        )
    return {k: sorted(v, key=lambda t: (t[1], t[0])) for k, v in out.items()}


def test_scd2_build_compresses_and_stitches(spark, log):
    hist = scd2_build(log, ["k"], ["attr"], "ts", tiebreak_cols=["src"])
    got = _by_key(hist)
    assert got[1] == [
        ("A", _d("2025-01-01"), _d("2025-02-01"), False),
        ("B", _d("2025-02-01"), None, True),
    ]
    assert got[2] == [("X", _d("2025-01-03"), None, True)]
    assert got[3] == [("C", _d("2025-01-02"), None, True)]


def test_scd2_merge_incremental_equals_rebuild(spark, log):
    """Applying a second batch via scd2_merge == building from the
    concatenated log in one shot (the defining correctness property)."""
    hist = scd2_build(log, ["k"], ["attr"], "ts", tiebreak_cols=["src"])
    batch = spark.createDataFrame(
        [
            (1, _d("2025-03-01"), "C", 20),  # real change for key 1
            (2, _d("2025-04-01"), "X", 21),  # no-op -> nothing changes
            (4, _d("2025-03-15"), "N", 22),  # brand-new key
        ],
        "k long, ts timestamp, attr string, src long",
    )
    merged = scd2_merge(hist, batch, ["k"], ["attr"], "ts", tiebreak_cols=["src"])
    rebuilt = scd2_build(
        log.unionByName(batch), ["k"], ["attr"], "ts", tiebreak_cols=["src"]
    )
    assert _by_key(merged) == _by_key(rebuilt)
    got = _by_key(merged)
    assert got[1][-1] == ("C", _d("2025-03-01"), None, True)
    assert got[2] == [("X", _d("2025-01-03"), None, True)]  # untouched
    assert got[4] == [("N", _d("2025-03-15"), None, True)]


def test_scd2_merge_drops_late_updates(spark, log):
    hist = scd2_build(log, ["k"], ["attr"], "ts", tiebreak_cols=["src"])
    late = spark.createDataFrame(
        [(1, _d("2025-01-15"), "Z", 30)],  # before key 1's current valid_from
        "k long, ts timestamp, attr string, src long",
    )
    merged = scd2_merge(hist, late, ["k"], ["attr"], "ts", tiebreak_cols=["src"])
    assert _by_key(merged) == _by_key(hist)


def test_scd2_merge_equal_ts_correction(spark, log):
    hist = scd2_build(log, ["k"], ["attr"], "ts", tiebreak_cols=["src"])
    fix = spark.createDataFrame(
        [(3, _d("2025-01-02"), "C2", 31)],  # same ts as key 3's current
        "k long, ts timestamp, attr string, src long",
    )
    merged = scd2_merge(hist, fix, ["k"], ["attr"], "ts", tiebreak_cols=["src"])
    got = _by_key(merged)
    # superseded: old state survives as a zero-length closed version
    assert got[3] == [
        ("C", _d("2025-01-02"), _d("2025-01-02"), False),
        ("C2", _d("2025-01-02"), None, True),
    ]


def test_scd2_merge_only_touches_batch_keys(spark, log):
    """Plan shape: untouched current rows pass through an anti-join on
    the BROADCAST batch keys — no full-history shuffle."""
    hist = scd2_build(log, ["k"], ["attr"], "ts", tiebreak_cols=["src"])
    batch = spark.createDataFrame(
        [(1, _d("2025-03-01"), "C", 20)], "k long, ts timestamp, attr string, src long"
    )
    merged = scd2_merge(hist, batch, ["k"], ["attr"], "ts", tiebreak_cols=["src"])
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# --- streaming SCD2 maintenance (streaming/dimensions.py) ------------


def test_scd2_stream_matches_one_shot_build(spark, tmp_path):
    """Two streamed CDC batches MERGEd into the bucketed history ==
    scd2_build over the concatenated log; second activation reads back
    only touched buckets and closed rows survive untouched."""
    from real_time_event_driven_data_pipeline_spark.streaming.dimensions import (
        read_scd2_history,
        run_scd2_stream,
        scd2_as_of,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    hist_path = str(tmp_path / "dim_history")
    schema = "k long, ts timestamp, attr string, src long"

    batch1 = [
        (1, _d("2025-01-01"), "A", 1),
        (1, _d("2025-02-01"), "B", 2),
        (2, _d("2025-01-03"), "X", 3),
    ]
    batch2 = [
        (1, _d("2025-03-01"), "C", 4),   # change
        (2, _d("2025-02-03"), "X", 5),   # no-op
        (3, _d("2025-03-05"), "N", 6),   # new key
    ]
    # single-file parquet arrivals (the file-stream source lists files,
    # not Spark output directories)
    spark.createDataFrame(batch1, schema).toPandas().to_parquet(
        f"{landing}/b1.parquet", coerce_timestamps="us", allow_truncated_timestamps=True
    )

    def drain():
        stream = spark.readStream.schema(
            spark.read.parquet(f"{landing}/b1.parquet").schema
        ).parquet(str(landing))
        q = run_scd2_stream(
            stream,
            hist_path,
            str(tmp_path / "ckpt"),
            key_cols=["k"],
            attr_cols=["attr"],
            ts_col="ts",
            tiebreak_cols=["src"],
            n_buckets=8,
        )
        q.awaitTermination()

    drain()
    spark.createDataFrame(batch2, schema).toPandas().to_parquet(
        f"{landing}/b2.parquet", coerce_timestamps="us", allow_truncated_timestamps=True
    )
    drain()

    got = _by_key(read_scd2_history(spark, hist_path))
    expected = _by_key(
        scd2_build(
            spark.createDataFrame(batch1 + batch2, schema),
            ["k"],
            ["attr"],
            "ts",
            tiebreak_cols=["src"],
        )
    )
    assert got == expected
    assert got[1][-1][0] == "C" and got[1][-1][3] is True

    # point-in-time snapshot: who was what on Feb 10
    snap = {
        r.k: r.attr
        for r in scd2_as_of(
            read_scd2_history(spark, hist_path), _d("2025-02-10")
        ).collect()
    }
    assert snap == {1: "B", 2: "X"}


# --- property: merge(build(log1), log2) == build(log1 + log2) --------
# for FORWARD-ONLY batches (every batch-2 ts at-or-after the key's
# current valid_from), the defining SCD2 maintenance invariant.

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_updates = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=20),  # day offset
        st.sampled_from(["A", "B", "C"]),  # attr
    ),
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows1=_updates, rows2=_updates)
def test_scd2_merge_equals_rebuild_property(spark, rows1, rows2):
    base = dt.datetime(2025, 1, 1)

    def frame(rows, src0):
        # src tiebreak = arrival order, unique across both batches
        data = [
            (k, base + dt.timedelta(days=d), a, src0 + i)
            for i, (k, d, a) in enumerate(rows)
        ]
        return spark.createDataFrame(data, "k long, ts timestamp, attr string, src long")

    f1 = frame(rows1, 0)
    # forward-only: shift batch 2 past every batch-1 timestamp so no
    # update is dropped by the late gate (that path has its own test)
    max1 = max(d for _, d, _ in rows1)
    rows2_fwd = [(k, d + max1, a) for k, d, a in rows2]
    f2 = frame(rows2_fwd, 1000)

    merged = scd2_merge(
        scd2_build(f1, ["k"], ["attr"], "ts", tiebreak_cols=["src"]),
        f2, ["k"], ["attr"], "ts", tiebreak_cols=["src"],
    )
    rebuilt = scd2_build(
        f1.unionByName(f2), ["k"], ["attr"], "ts", tiebreak_cols=["src"]
    )
    assert _by_key(merged) == _by_key(rebuilt)
