"""Skew utilities: salted plans must be semantically identical to their
unsalted twins, including under heavy key skew."""

import pyspark.sql.functions as F

from real_time_event_driven_data_pipeline_spark.operators import skew


def _skewed_df(spark):
    # one hot key (90%) + a long tail, duplicate values per key
    rows = [(1, v % 40) for v in range(1800)] + [
        (k, v) for k in range(2, 30) for v in range(k)
    ]
    return spark.createDataFrame(rows, "key int, value int")


def test_salted_count_distinct_matches_exact(spark):
    df = _skewed_df(spark)
    got = {
        (r.key, r.n)
        for r in skew.salted_count_distinct(df, ["key"], "value", out_alias="n").collect()
    }
    want = {
        (r.key, r.n)
        for r in df.groupBy("key").agg(F.countDistinct("value").alias("n")).collect()
    }
    assert got == want


def test_salted_join_matches_plain_join(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(1, 25)], "id int, name string"
    )
    got = sorted(
        (r.key, r.value, r.name)
        for r in skew.salted_join(fact, dim, "key", "id", n_salts=4).collect()
    )
    want = sorted(
        (r.key, r.value, r.name)
        for r in fact.join(dim, fact.key == dim.id).collect()
    )
    assert got == want


def test_salted_count_distinct_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(1, None), (1, 5), (1, 5), (2, None), (2, None)], "key int, value int"
    )
    got = {
        (r.key, r.n)
        for r in skew.salted_count_distinct(df, ["key"], "value", out_alias="n").collect()
    }
    want = {
        (r.key, r.n)
        for r in df.groupBy("key").agg(F.countDistinct("value").alias("n")).collect()
    }
    assert got == want  # key 2 (all nulls) absent in both


def test_salted_join_rejects_outer(spark):
    import pytest

    df = _skewed_df(spark)
    with pytest.raises(ValueError, match="replicated"):
        skew.salted_join(df, df, "key", "key", how="full")


def test_top_keys_finds_hot_key(spark):
    df = _skewed_df(spark)
    top = skew.top_keys(df, ["key"], n=1).collect()
    assert top[0].key == 1 and top[0].n_rows == 1800
