"""Table maintenance: compaction, shard export, incremental rollup."""

import json

import pyspark.sql.functions as F

from real_time_event_driven_data_pipeline_spark.sinks.maintenance import (
    compact_partitions,
    export_training_shards,
    partition_file_stats,
    refresh_rollup,
)


def _events(spark, n=2000, days=4):
    # day values are non-numeric strings ("d0"...) so the partition-dir
    # round-trip can't retype them via partition-column inference
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("d"), (F.col("id") % days).cast("string")).alias("day"),
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )


def test_partition_file_stats_and_compaction(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = _events(spark)
    # simulate 6 streaming micro-batch appends -> 6+ files per partition
    for i in range(6):
        df.filter(F.col("id") % 6 == i).write.mode("append").partitionBy("day").parquet(path)

    before = partition_file_stats(spark, path)
    assert set(before) == {f"day=d{d}" for d in range(4)}
    assert all(n >= 6 for n, _ in before.values())
    rows_before = sorted(spark.read.parquet(path).drop("day").collect())

    done = compact_partitions(spark, path, ["day"], target_file_bytes=1 << 30)
    assert set(done) == set(before)

    after = partition_file_stats(spark, path)
    assert all(n == 1 for n, _ in after.values()), after  # 1 big file each
    # byte-identical content
    assert sorted(spark.read.parquet(path).drop("day").collect()) == rows_before

    # already-compact partitions are skipped (O(fragmented), not O(all))
    assert compact_partitions(spark, path, ["day"]) == {}


def test_export_training_shards_deterministic(spark, tmp_path):
    docs = spark.range(500).select(F.col("id").alias("doc_id"), F.sha1(F.col("id").cast("string")).alias("text"))
    path = str(tmp_path / "shards")
    manifest = export_training_shards(docs, path, rows_per_shard=100)
    assert manifest["n_rows"] == 500 and manifest["n_shards"] == 5
    assert sum(manifest["shards"].values()) == 500
    # every shard is exactly one data file
    stats = partition_file_stats(spark, path)
    assert len(stats) == 5 and all(n == 1 for n, _ in stats.values())
    # manifest written and matches
    with open(f"{path}/_manifest.json") as f:
        assert json.load(f) == manifest

    # deterministic: re-export assigns every doc to the same shard
    assign1 = {r.doc_id: r.shard for r in spark.read.parquet(path).collect()}
    export_training_shards(docs, path, rows_per_shard=100)
    assign2 = {r.doc_id: r.shard for r in spark.read.parquet(path).collect()}
    assert assign1 == assign2


def _daily_rollup(df):
    return df.groupBy("day", "k").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sum_v")
    )


def test_refresh_rollup_incremental_equals_full(spark, tmp_path):
    rollup_path = str(tmp_path / "rollup")
    base1 = _events(spark, n=2000, days=4).cache()

    # bootstrap: full build
    refresh_rollup(spark, base1, rollup_path, _daily_rollup, ["day", "k"], ["day"], None)
    got = {(r.day, r.k): (r.n, r.sum_v) for r in spark.read.parquet(rollup_path).collect()}
    want = {(r.day, r.k): (r.n, r.sum_v) for r in _daily_rollup(base1).collect()}
    assert got == want

    # new arrivals touch day 1 and add day 9
    extra = spark.range(5000, 5300).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "d1").otherwise("d9").alias("day"),
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )
    base2 = base1.unionByName(extra).cache()
    refresh_rollup(
        spark, base2, rollup_path, _daily_rollup, ["day", "k"], ["day"],
        changed=[{"day": "d1"}, {"day": "d9"}],
    )
    got = {(r.day, r.k): (r.n, r.sum_v) for r in spark.read.parquet(rollup_path).collect()}
    want = {(r.day, r.k): (r.n, r.sum_v) for r in _daily_rollup(base2).collect()}
    assert got == want  # incremental == full recompute

    # empty change set is a no-op
    refresh_rollup(spark, base2, rollup_path, _daily_rollup, ["day", "k"], ["day"], changed=[])
    assert {(r.day, r.k) for r in spark.read.parquet(rollup_path).collect()} == set(want)


def test_compact_unpartitioned_sidecar(spark, tmp_path):
    from real_time_event_driven_data_pipeline_spark.sinks.maintenance import (
        compact_unpartitioned,
    )

    path = str(tmp_path / "keyidx")
    for i in range(6):  # six activation appends
        spark.range(i * 100, (i + 1) * 100).write.mode("append").parquet(path)
    assert sum(n for n, _ in partition_file_stats(spark, path).values()) >= 6

    rows_before = sorted(r.id for r in spark.read.parquet(path).collect())
    n_out = compact_unpartitioned(spark, path, target_file_bytes=1 << 30)
    assert n_out == 1
    stats = partition_file_stats(spark, path)
    assert sum(n for n, _ in stats.values()) == 1
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows_before
    # below threshold -> no-op
    assert compact_unpartitioned(spark, path) is None


def test_compact_partitions_escaped_partition_values(spark, tmp_path):
    """Hive URL-escapes special chars in partition dirs (name=a%20b);
    the dir parser must unescape so the pruned read matches rows."""
    path = str(tmp_path / "esc")
    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "a b").otherwise("c=d").alias("name"),
    )
    for i in range(4):
        df.filter(F.col("id") % 4 == i).write.mode("append").partitionBy("name").parquet(path)

    before = partition_file_stats(spark, path)
    # Spark escapes '=' (%3D) in partition dirs; space passes through
    assert set(before) == {"name=a b", "name=c%3Dd"}
    rows_before = sorted(r.id for r in spark.read.parquet(path).collect())

    done = compact_partitions(spark, path, ["name"], target_file_bytes=1 << 30)
    assert set(done) == set(before)  # both partitions actually rewritten
    after = partition_file_stats(spark, path)
    assert all(n == 1 for n, _ in after.values()), after
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows_before


def test_recover_compaction_restores_moved_aside_table(spark, tmp_path):
    from real_time_event_driven_data_pipeline_spark.sinks.maintenance import (
        compact_unpartitioned,
        recover_compaction,
    )

    path = str(tmp_path / "keyidx")
    for i in range(4):
        spark.range(i * 50, (i + 1) * 50).write.mode("append").parquet(path)
    rows = sorted(r.id for r in spark.read.parquet(path).collect())

    # simulate a crash inside the swap window: root moved aside, tmp left
    import shutil

    shutil.move(path, f"{path}.compact-old")
    shutil.copytree(f"{path}.compact-old", f"{path}.compact-tmp")

    assert recover_compaction(spark, path) is True
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows
    import os

    assert not os.path.exists(f"{path}.compact-tmp")  # stale tmp cleaned
    # healthy table -> recovery is a no-op and compaction runs clean
    assert recover_compaction(spark, path) is False
    assert compact_unpartitioned(spark, path, target_file_bytes=1 << 30) == 1
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows
