"""Streaming SCD2 dimension maintenance — change-data-capture batches
applied incrementally to a versioned dimension history.

The reference re-reads its dimension fresh per activation
(``transform.py:96-107`` reloads products on every event); this is the
history-preserving upgrade on the same arrival model: dimension updates
land as a stream, and each micro-batch MERGEs into an SCD2 history
table (``operators/scd2.py``) with work proportional to the BATCH, not
the history:

- the history is partitioned by a key-hash bucket (``__kb``), so the
  merge's read-back prunes to the buckets the batch touches;
- ``scd2_merge(changed_only=True)`` emits only the re-derived versions
  of the batch's keys (new current rows + superseded rows with their
  ``valid_to`` closed);
- ``sinks.tables.merge_upsert_partitioned`` keyed on the version
  identity (keys..., valid_from, attrs...) replaces exactly those
  rows — closed history and untouched keys are never read or written.

Epoch replays are idempotent: re-applying the same batch re-derives the
same versions and the keyed upsert replaces them with themselves.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scd2 import SCD2_META, scd2_build, scd2_merge
from ..sinks.tables import merge_upsert_partitioned

BUCKET_COL = "__kb"


def _with_bucket(df: DataFrame, key_cols: list[str], n_buckets: int) -> DataFrame:
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")
    )


def scd2_apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    history_path: str,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
    n_buckets: int = 64,
) -> None:
    """Apply one CDC batch to the bucketed SCD2 history at
    ``history_path``.  Reads only the touched buckets; writes only the
    re-derived versions."""
    if batch.isEmpty():
        return
    target = Path(history_path)
    if target.exists() and any(target.iterdir()):
        touched = _with_bucket(
            batch.select(*key_cols).dropDuplicates(), key_cols, n_buckets
        )
        buckets = [r[BUCKET_COL] for r in touched.select(BUCKET_COL).distinct().collect()]
        hist = spark.read.parquet(history_path).filter(
            F.col(BUCKET_COL).isin(buckets)  # partition-pruned read-back
        )
        delta = scd2_merge(
            hist.drop(BUCKET_COL),
            batch,
            key_cols,
            attr_cols,
            ts_col,
            tiebreak_cols=tiebreak_cols,
            changed_only=True,
        )
    else:
        delta = scd2_build(
            batch, key_cols, attr_cols, ts_col, tiebreak_cols=tiebreak_cols
        )
    # upsert identity = (keys, valid_from, attrs): a version's attrs are
    # immutable (only valid_to / is_current ever change), and an
    # equal-ts correction legitimately leaves TWO versions at the same
    # (key, valid_from) with different attrs — keying on attrs too keeps
    # both while still replacing a version whose interval closed.
    merge_upsert_partitioned(
        spark,
        _with_bucket(delta, key_cols, n_buckets),
        history_path,
        key_cols=[*key_cols, "valid_from", *attr_cols],
        partition_cols=[BUCKET_COL],
    )


def run_scd2_stream(
    updates: DataFrame,
    history_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
    n_buckets: int = 64,
):
    """Wire a streaming updates frame into the SCD2 history: one MERGE
    per micro-batch via foreachBatch, availableNow trigger (the drain
    model of the reference's event-driven activation).  Returns the
    started StreamingQuery (caller awaits/stops)."""

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        scd2_apply_batch(
            batch_df.sparkSession,
            batch_df,
            history_path,
            key_cols,
            attr_cols,
            ts_col,
            tiebreak_cols=tiebreak_cols,
            n_buckets=n_buckets,
        )

    return (
        updates.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_scd2_history(spark: SparkSession, history_path: str) -> DataFrame:
    """The history without the internal bucket column."""
    return spark.read.parquet(history_path).drop(BUCKET_COL)


def scd2_as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time dimension snapshot: the version valid AT ``ts``
    (half-open intervals: valid_from <= ts < valid_to)."""
    return history.filter(
        (F.col("valid_from") <= F.lit(ts))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(ts)))
    ).drop(*[c for c in SCD2_META if c != "valid_from"])
