"""CLI jobs: exit-code contract (S8), CSV folder-as-table ingestion
(S1/S2), and the transform job's executor-side KV sink (S6)."""

import os
import sqlite3

import pytest

from real_time_event_driven_data_pipeline_spark import cli
from tests.ecom_fixtures import make_ecom


@pytest.fixture(scope="module")
def csv_dirs(tmp_path_factory):
    """Reference-shaped CSV layout: single products file + part-file
    folders for orders/order_items (reference Data/ layout)."""
    root = tmp_path_factory.mktemp("ecom_csv")
    products, orders, order_items = make_ecom(n_products=150, n_orders=120, seed=7)
    products.to_csv(root / "products.csv", index=False)
    (root / "orders").mkdir()
    (root / "order_items").mkdir()
    for i, chunk in enumerate(
        [orders.iloc[:60], orders.iloc[60:]]
    ):
        chunk.to_csv(root / "orders" / f"orders_part{i + 1}.csv", index=False)
    for i, chunk in enumerate(
        [order_items.iloc[:150], order_items.iloc[150:300], order_items.iloc[300:]]
    ):
        chunk.to_csv(root / "order_items" / f"order_items_part{i + 1}.csv", index=False)
    return root


def _args(root, extra=()):
    return [
        "--products", str(root / "products.csv"),
        "--orders", str(root / "orders") + "/",
        "--order-items", str(root / "order_items") + "/",
        *extra,
    ]


def test_validate_clean_exits_zero(spark, csv_dirs):
    assert cli.main(["validate", *_args(csv_dirs)]) == 0


def test_validate_dirty_exits_one(spark, csv_dirs, tmp_path):
    # orphan FK: an order_items row pointing at a missing product
    import shutil

    dirty = tmp_path / "dirty"
    shutil.copytree(csv_dirs, dirty)
    with open(dirty / "order_items" / "order_items_part1.csv", "a") as f:
        f.write("99999,1,1,999999,delivered,2025-03-10T00:00:00,"
                "2025-03-11T00:00:00,2025-03-12T00:00:00,,10.0\n")
    assert cli.main(["validate", *_args(dirty)]) == 1


def test_validate_missing_input_exits_one(spark, tmp_path):
    assert cli.main([
        "validate",
        "--products", str(tmp_path / "nope.csv"),
        "--orders", str(tmp_path / "nope"),
        "--order-items", str(tmp_path / "nope2"),
    ]) == 1


def test_pipeline_activation(spark, csv_dirs, tmp_path):
    import shutil

    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(
        csv_dirs / "order_items" / "order_items_part1.csv", landing / "arrival1.csv"
    )
    work = tmp_path / "work"
    rc = cli.main(
        [
            "pipeline",
            "--landing-dir", str(landing),
            "--work-dir", str(work),
            "--store", str(tmp_path / "kpis.db"),
        ]
    )
    assert rc == 0
    con = sqlite3.connect(tmp_path / "kpis.db")
    assert con.execute("SELECT COUNT(*) FROM daily_revenue").fetchone()[0] > 0
    assert spark.read.parquet(str(work / "valid")).count() == 150


def test_transform_writes_kpi_store(spark, csv_dirs, tmp_path):
    store = tmp_path / "kpis.db"
    assert cli.main(["transform", *_args(csv_dirs, ["--store", str(store)])]) == 0
    con = sqlite3.connect(store)
    n_cat = con.execute("SELECT COUNT(*) FROM category_kpis").fetchone()[0]
    n_ord = con.execute("SELECT COUNT(*) FROM order_kpis").fetchone()[0]
    assert n_cat > 0 and n_ord > 0
    # keys serialize dates as yyyy-MM-dd (reference sink contract)
    k = con.execute("SELECT k FROM order_kpis LIMIT 1").fetchone()[0]
    assert len(k) == 10 and k[4] == "-" and k[7] == "-"


def test_maintain_compacts_fragmented_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_spark.sinks.maintenance import (
        partition_file_stats,
    )

    path = str(tmp_path / "table")
    df = spark.range(500).select(
        "id", F.concat(F.lit("d"), (F.col("id") % 2).cast("string")).alias("day")
    )
    for i in range(5):
        df.filter(F.col("id") % 5 == i).write.mode("append").partitionBy("day").parquet(path)
    assert all(n >= 5 for n, _ in partition_file_stats(spark, path).values())

    rc = cli.main(["maintain", "--path", path, "--partition-cols", "day"])
    assert rc == 0
    after = partition_file_stats(spark, path)
    assert all(n == 1 for n, _ in after.values())
    assert spark.read.parquet(path).count() == 500


def test_maintain_unpartitioned_sidecar(spark, tmp_path):
    from real_time_event_driven_data_pipeline_spark.sinks.maintenance import (
        partition_file_stats,
    )

    path = str(tmp_path / "keyidx")
    for i in range(5):
        spark.range(i * 10, (i + 1) * 10).write.mode("append").parquet(path)
    rc = cli.main(["maintain", "--path", path])
    assert rc == 0
    assert sum(n for n, _ in partition_file_stats(spark, path).values()) == 1
    assert spark.read.parquet(path).count() == 50


def test_maintain_recovers_crashed_compaction_first(spark, tmp_path):
    """A maintain run that died inside compact_unpartitioned's swap
    leaves the table at <path>.compact-old.  The NEXT `maintain` — even
    one invoked on the partitioned code path — must restore it before
    doing anything else (r3 verdict item 7: recovery reachable without
    operator knowledge)."""
    import shutil

    from real_time_event_driven_data_pipeline_spark.sinks.maintenance import (
        partition_file_stats,
    )

    from pyspark.sql import functions as F

    path = str(tmp_path / "table")
    df = spark.range(100).select(
        "id", F.concat(F.lit("d"), (F.col("id") % 2).cast("string")).alias("day")
    )
    for i in range(5):
        df.filter(F.col("id") % 5 == i).write.mode("append").partitionBy("day").parquet(path)
    # simulate the crash window: root moved aside, stale tmp left behind.
    # The partitioned maintain branch itself never creates this state
    # (dynamic-partition overwrite has no swap), but an earlier
    # unpartitioned run on the same path can — and before the fix the
    # partitioned branch would just fail on the missing root.
    shutil.move(path, f"{path}.compact-old")
    shutil.copytree(f"{path}.compact-old", f"{path}.compact-tmp")

    rc = cli.main(["maintain", "--path", path, "--partition-cols", "day"])
    assert rc == 0
    assert not os.path.exists(f"{path}.compact-old")
    assert not os.path.exists(f"{path}.compact-tmp")
    after = partition_file_stats(spark, path)
    assert all(n == 1 for n, _ in after.values())
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == list(range(100))


def test_export_shards_from_corpus(spark, tmp_path):
    import json

    from pyspark.sql import functions as F

    corpus = str(tmp_path / "corpus")
    spark.range(250).select(
        F.col("id").alias("doc_id"), F.sha1(F.col("id").cast("string")).alias("text")
    ).write.parquet(corpus)
    out = str(tmp_path / "shards")
    rc = cli.main(["export", "--corpus", corpus, "--out", out, "--rows-per-shard", "100"])
    assert rc == 0
    with open(f"{out}/_manifest.json") as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == 250 and manifest["n_shards"] == 3
    assert spark.read.parquet(out).count() == 250


def test_dims_cli_builds_scd2_history(spark, tmp_path):
    """`dims` drains a CDC landing dir into the bucketed SCD2 history."""
    import datetime as dt

    landing = tmp_path / "cdc"
    landing.mkdir()
    rows = [
        (1, dt.datetime(2025, 1, 1), "A", 1),
        (1, dt.datetime(2025, 2, 1), "B", 2),
        (2, dt.datetime(2025, 1, 5), "X", 3),
    ]
    spark.createDataFrame(
        rows, "k long, ts timestamp, attr string, src long"
    ).toPandas().to_parquet(
        f"{landing}/b1.parquet", coerce_timestamps="us", allow_truncated_timestamps=True
    )
    hist = str(tmp_path / "hist")
    rc = cli.main(
        [
            "dims",
            "--landing-dir", str(landing),
            "--history", hist,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--keys", "k",
            "--attrs", "attr",
            "--tiebreak", "src",
        ]
    )
    assert rc == 0
    got = {
        (r.k, r.attr): (r.valid_to, r.is_current)
        for r in spark.read.parquet(hist).collect()
    }
    assert got[(1, "A")] == (dt.datetime(2025, 2, 1), False)
    assert got[(1, "B")] == (None, True)
    assert got[(2, "X")] == (None, True)
