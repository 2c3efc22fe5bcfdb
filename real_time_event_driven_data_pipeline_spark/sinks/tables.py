"""Managed-table writers: partitioned + bucketed parquet.

The 100 TB co-location story: a fact table bucketed on its join key
joins a dimension bucketed on the same key with the same bucket count
with NO shuffle on either side — the sort-merge join reads co-located
buckets directly (verified by plan assertion in tests/test_bucketing.py).
Daily partitioning gives partition pruning on date predicates; bucket
pruning fires on key equality predicates.

Spark bucketing requires ``saveAsTable`` (metastore-tracked); plain
``.parquet(path)`` writes lose bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (optionally partitioned) managed parquet table.

    Sorting within buckets lets the sort-merge join skip its sort step
    entirely; pick ``n_buckets`` so one bucket of the biggest table is
    a few hundred MB at target scale.
    """
    writer = df.write.format("parquet").mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables; with matching bucket specs Catalyst
    plans a shuffle-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
