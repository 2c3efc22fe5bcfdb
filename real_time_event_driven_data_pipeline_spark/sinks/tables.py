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


# --- dynamic partition overwrite + MERGE-style upsert ---
# The reference re-publishes the full KPI result into DynamoDB on every
# activation (reference: docker-images/transformation/transform.py:149-202).
# At 100 TB the scale-correct analogue for an analytical sink is to
# rewrite ONLY the date partitions an arrival event touched.


from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _conf(spark: SparkSession, key: str, value: str):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Replace only the partitions present in ``df``; others untouched.

    ``partitionOverwriteMode=dynamic`` makes ``mode("overwrite")`` drop
    just the partition directories the incoming frame writes — the
    idempotent per-day re-publish primitive.  A static overwrite (the
    default) would truncate the whole table: O(history) instead of
    O(changed days) per activation.
    """
    with _conf(
        df.sparkSession, "spark.sql.sources.partitionOverwriteMode", "dynamic"
    ):
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def touched_partitions_predicate(touched_rows, partition_cols: list[str]):
    """OR-of-ANDs equality predicate over partition columns.

    Built only from partition-column equality comparisons, so Catalyst
    classifies the whole disjunction as a PartitionFilter: the read-back
    lists only the touched partition directories and never opens a file
    in any other partition (pinned in tests/test_sinks.py).
    """
    import functools
    import operator

    return functools.reduce(
        operator.or_,
        (
            functools.reduce(
                operator.and_, (F.col(c) == r[c] for c in partition_cols)
            )
            for r in touched_rows
        ),
    )


def merge_upsert_partitioned(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    partition_cols: list[str],
) -> None:
    """MERGE INTO emulation on plain partitioned parquet.

    Semantics: rows in ``updates`` replace existing rows with the same
    ``key_cols``; other existing rows in touched partitions survive;
    untouched partitions are never read or written.  Plan shape:

    1. The touched-partition values are collected (day-grain: one tiny
       row per partition) and turned into a pushable predicate, so the
       read-back scans only those partition directories.
    2. Survivors = existing ⟕anti updates on the key — executed as a
       broadcast anti join when the update batch is small.
    3. survivors ∪ updates is localCheckpoint-ed (materialized on
       executors, truncating lineage to the input files) before the
       dynamic overwrite, because Spark cannot overwrite a path it is
       still lazily reading.
    """
    from pathlib import Path

    touched = updates.select(*partition_cols).distinct().collect()
    if not touched:
        return
    target = Path(path)
    if target.exists() and any(target.iterdir()):
        row_pred = touched_partitions_predicate(touched, partition_cols)
        existing = spark.read.parquet(path).filter(row_pred)  # partition-pruned
        survivors = existing.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        out = survivors.unionByName(updates)
    else:
        out = updates
    overwrite_partitions(out.localCheckpoint(), path, partition_cols)
