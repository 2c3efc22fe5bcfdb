"""Bucketed tables: co-located join must plan with NO shuffle exchange,
and results must equal the plain join."""

import pytest

from real_time_event_driven_data_pipeline_spark.sinks.tables import (
    cobucketed_join,
    write_bucketed_table,
)
from real_time_event_driven_data_pipeline_spark.sources.readers import load_testdata

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("warehouse")
    d = load_testdata(spark, SF, "orders", "lineitem")
    write_bucketed_table(
        d["orders"].withColumnRenamed("o_orderkey", "orderkey"),
        "orders_b", ["orderkey"], 8, path=str(root / "orders_b"),
    )
    write_bucketed_table(
        d["lineitem"].withColumnRenamed("l_orderkey", "orderkey"),
        "lineitem_b", ["orderkey"], 8, path=str(root / "lineitem_b"),
    )
    yield d
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_cobucketed_join_has_no_shuffle(spark, bucketed):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force SMJ: broadcast would hide whether bucketing removed the
        # shuffle (it never shuffles the big side anyway)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = cobucketed_join(spark, "lineitem_b", "orders_b", ["orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_matches_plain(spark, bucketed):
    joined = cobucketed_join(spark, "lineitem_b", "orders_b", ["orderkey"])
    plain = (
        bucketed["lineitem"]
        .withColumnRenamed("l_orderkey", "orderkey")
        .join(bucketed["orders"].withColumnRenamed("o_orderkey", "orderkey"), "orderkey")
    )
    assert joined.count() == plain.count()
    got = joined.groupBy().sum("l_extendedprice").collect()[0][0]
    want = plain.groupBy().sum("l_extendedprice").collect()[0][0]
    assert abs(got - want) < 1e-6
