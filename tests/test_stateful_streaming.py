"""applyInPandasWithState sessionization: closed sessions from the
stream match the batch lag/cumsum twin, across multi-batch arrivals."""

import pandas as pd
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from real_time_event_driven_data_pipeline_spark.sources.readers import load_testdata
from real_time_event_driven_data_pipeline_spark.streaming.stateful import (
    sessionize_stream,
)

GAP_MIN = 30.0


def batch_sessions(events):
    """Oracle: every session via lag + cumulative sum (batch)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = int(GAP_MIN * 60 * 1_000_000)
    lag_ts = F.lag("ts").over(w)
    new_s = F.when(
        lag_ts.isNull() | (F.unix_micros("ts") - F.unix_micros(lag_ts) > gap_us), 1
    ).otherwise(0)
    sess = (
        events.withColumn("sid", F.sum(new_s).over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return sess.select("user_id", "session_start", "session_end", "n_events")


def run_stream(spark, src, ckpt, name):
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = sessionize_stream(stream, gap_minutes=GAP_MIN)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_stream_sessions_match_batch(spark, tmp_path):
    events = load_testdata(spark, "/root/testdata/sf0.001", "events")["events"]
    src = str(tmp_path / "src")
    events.write.parquet(src)

    got = run_stream(spark, src, str(tmp_path / "ckpt"), "sess_stream")

    all_batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch_sessions(events).collect()
    }
    # the stream emits sessions closed by data or by the event-time
    # timeout; sessions still open at end-of-input (watermark never
    # advanced past them) stay in state -> got is a subset
    assert got <= all_batch
    assert len(got) > 0.5 * len(all_batch)
    # every session the watermark could close must have been emitted:
    # those ending > gap+watermark before the max event time
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    horizon = pd.Timestamp(max_ts) - pd.Timedelta(minutes=GAP_MIN) - pd.Timedelta(hours=1)
    must_close = {s for s in all_batch if pd.Timestamp(s[2]) < horizon}
    missing = must_close - got
    assert not missing, f"{len(missing)} closeable sessions not emitted"


def test_out_of_order_across_batches_single_session(spark, tmp_path):
    """A late-but-within-watermark event arriving in a later batch must
    merge into (and extend backward) the open session, not split it."""
    out_dir = str(tmp_path / "ooo_out")
    ckpt = str(tmp_path / "ooo_ck")
    src = tmp_path / "ooo_src"
    src.mkdir()

    def run():
        schema = spark.read.parquet(str(src)).schema
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            sessionize_stream(stream, gap_minutes=GAP_MIN)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            return {
                (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
                for r in spark.read.parquet(out_dir).collect()
            }
        except Exception:
            return set()

    def mk(rows):
        return pd.DataFrame(
            [(u, e, pd.Timestamp(t)) for u, e, t in rows],
            columns=["user_id", "event_id", "ts"],
        ).astype({"ts": "datetime64[us]"})

    # batch 1: 10:00 for user 1
    mk([(1, 1, "2025-03-01T10:00:00")]).to_parquet(src / "a.parquet")
    run()
    # batch 2: LATE 09:40 (within 1h watermark) + far-future watermark
    # driver for user 2 that seals user 1's session
    mk([(1, 2, "2025-03-01T09:40:00"), (2, 9, "2025-03-03T00:00:00")]).to_parquet(
        src / "b.parquet"
    )
    got = run()
    u1 = {s for s in got if s[0] == 1}
    assert u1 == {(1, "2025-03-01 09:40:00", "2025-03-01 10:00:00", 2)}, got


def test_stream_static_enrichment_join(spark, tmp_path):
    from real_time_event_driven_data_pipeline_spark.streaming.stateful import (
        enrich_stream,
    )

    events = load_testdata(spark, "/root/testdata/sf0.001", "events")["events"]
    src = str(tmp_path / "enrich_src")
    events.write.parquet(src)
    dim = events.select("user_id").distinct().withColumn(
        "tier", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd")
    )

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        enrich_stream(stream, dim, "user_id")
        .groupBy("tier")
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "enrich_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.tier: r["count"] for r in spark.sql("SELECT * FROM enriched").collect()}
    want = {
        r.tier: r["count"]
        for r in events.join(dim, "user_id").groupBy("tier").count().collect()
    }
    assert got == want and set(got) == {"even", "odd"}


def test_stream_dedup_within_watermark(spark, tmp_path):
    from real_time_event_driven_data_pipeline_spark.streaming.stateful import (
        dedup_stream,
    )

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 1, 3, 2, 4],  # 1 and 2 re-delivered
            "ts": pd.to_datetime(
                [
                    "2025-03-01T10:00:00",
                    "2025-03-01T10:01:00",
                    "2025-03-01T10:02:00",
                    "2025-03-01T10:03:00",
                    "2025-03-01T10:04:00",
                    "2025-03-01T10:05:00",
                ]
            ),
        }
    ).astype({"ts": "datetime64[us]"})
    src = tmp_path / "dedup_src"
    src.mkdir()
    pdf.to_parquet(src / "a.parquet")

    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        dedup_stream(stream, ["event_id"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "dedup_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3, 4]  # each key exactly once


def test_state_survives_across_batches(spark, tmp_path):
    """A session spanning two arrivals closes with the full count."""
    rows = [
        # user 1: one session split across files (gap 5 min < 30)
        (1, 100, "2025-03-01T10:00:00"),
        (1, 101, "2025-03-01T10:05:00"),
        # user 1 later event far in the future closes it (gap > 30min)
        (1, 102, "2025-03-01T12:00:00"),
        # watermark driver: very late event advances watermark
        (2, 200, "2025-03-02T12:00:00"),
    ]
    pdf = pd.DataFrame(
        [(u, e, pd.Timestamp(t)) for u, e, t in rows],
        columns=["user_id", "event_id", "ts"],
    ).astype({"ts": "datetime64[us]"})  # µs parquet, not TIMESTAMP(NANOS)
    src = tmp_path / "src2"
    src.mkdir()
    out_dir = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ck2")

    def run_to_parquet():
        # memory sink cannot recover a checkpoint; a file sink can, which
        # is what exercises state surviving across separate activations
        schema = spark.read.parquet(str(src)).schema
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            sessionize_stream(stream, gap_minutes=GAP_MIN)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            return {
                (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
                for r in spark.read.parquet(out_dir).collect()
            }
        except Exception:
            return set()

    pdf.iloc[:2].to_parquet(src / "a.parquet")
    got1 = run_to_parquet()
    assert got1 == set()  # session still open, nothing closed yet

    pdf.iloc[2:].to_parquet(src / "b.parquet")
    got2 = run_to_parquet()
    assert (1, "2025-03-01 10:00:00", "2025-03-01 10:05:00", 2) in got2


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Purchases joined to preceding same-user clicks, streaming vs batch."""
    from real_time_event_driven_data_pipeline_spark.streaming.stateful import (
        interval_join_streams,
    )

    events = load_testdata(spark, "/root/testdata/sf0.001", "events")["events"]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    p_src, c_src = str(tmp_path / "p"), str(tmp_path / "c")
    purchases.write.parquet(p_src)
    clicks.write.parquet(c_src)

    p_stream = spark.readStream.schema(purchases.schema).parquet(p_src)
    c_stream = spark.readStream.schema(clicks.schema).parquet(c_src)
    joined = interval_join_streams(
        p_stream, c_stream, key="user_id", left_ts="p_ts", right_ts="c_ts",
        lookback="30 minutes", watermark="1 hour",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("sj")
        .option("checkpointLocation", str(tmp_path / "ckpt_sj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["p_id"], r["c_id"])
        for r in spark.sql("SELECT p_id, c_id FROM sj").collect()
    }

    expected = {
        (r["p_id"], r["c_id"])
        for r in purchases.alias("p")
        .join(
            clicks.alias("c"),
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("c.c_ts") <= F.col("p.p_ts"))
            & (F.col("c.c_ts") >= F.col("p.p_ts") - F.expr("INTERVAL 30 minutes")),
        )
        .collect()
    }
    # append mode may hold back pairs the final watermark never sealed in
    # a finite input; everything emitted must be correct and cover all
    # pairs sealed by the terminal watermark — with availableNow over a
    # finite set, Spark runs a final batch with watermark past the max
    # event time, so the join should be complete here.
    assert got == expected
    assert len(got) > 0
