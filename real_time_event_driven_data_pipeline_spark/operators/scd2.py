"""Type-2 slowly-changing-dimension (SCD2) history — versioned
dimension rows with validity intervals.

The reference keeps only current-state dimensions (``products``;
reference ``transform.py:28-61`` reads them fresh per activation).  A
serving layer that answers "what was this product's category WHEN the
order was placed" needs the history, and a 100 TB fact table can't
afford rebuilding it: this module provides

- ``scd2_build``: initial load — collapse an event/update log into
  versions ``(keys..., attrs..., valid_from, valid_to, is_current)``.
  One shuffle on the key, two window passes (change-compression, then
  interval stitching).
- ``scd2_merge``: incremental maintenance — apply a batch of updates
  to an existing history.  Closed versions are NEVER touched; only
  current rows of keys present in the batch are re-derived, so the
  work is O(|batch| + |touched current rows|), independent of history
  size.  Pair with ``sinks.tables.merge_upsert_partitioned`` keyed on
  (keys..., valid_from) to write back only the changed versions.

Semantics (standard warehouse SCD2):
- an update whose attributes equal the previous state is a no-op
  (change compression);
- ``valid_to`` is the next version's ``valid_from`` (half-open
  intervals); the last version has ``valid_to`` null and
  ``is_current`` true;
- updates are forward-only: a batch row older than the key's current
  ``valid_from`` would require splicing closed history and is dropped
  by ``scd2_merge`` (documented; count them upstream if they matter);
- an update AT the current version's ``valid_from`` with different
  attributes supersedes it: the new state becomes current and the old
  one survives as a zero-length closed version (audit trail); with
  equal attributes it compresses away entirely.

Determinism: all windows order by (ts, tiebreak...), so runs are
reproducible given a unique tiebreak (e.g. the source row id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCD2_META = ["valid_from", "valid_to", "is_current"]


def _attrs_struct(attr_cols: list[str]):
    return F.struct(*[F.col(c) for c in attr_cols])


def _compress_and_stitch(
    timeline: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    order_extra: list,
) -> DataFrame:
    """Drop rows equal to the previous state per key, then stitch
    validity intervals over the surviving change rows."""
    order = [F.col(ts_col), *order_extra]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    a = _attrs_struct(attr_cols)
    changed = (
        timeline.withColumn("__prev", F.lag(a).over(w))
        # null-safe: first row per key has __prev null and is kept
        .filter(F.col("__prev").isNull() | ~a.eqNullSafe(F.col("__prev")))
        .drop("__prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changed.withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumnRenamed(ts_col, "valid_from")
        .select(*key_cols, *attr_cols, *SCD2_META)
    )


def scd2_build(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Initial SCD2 load from an update/event log.

    Each key's rows are ordered by (ts, tiebreaks), consecutive equal
    attribute states are compressed away, and the survivors become
    versions with half-open validity intervals.
    """
    extra = [F.col(c) for c in (tiebreak_cols or [])]
    timeline = df.select(*key_cols, F.col(ts_col), *attr_cols, *(tiebreak_cols or []))
    return _compress_and_stitch(timeline, key_cols, attr_cols, ts_col, extra)


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
    changed_only: bool = False,
) -> DataFrame:
    """Apply a batch of updates to an existing SCD2 history; returns the
    new full history (closed rows passed through by reference — only
    touched-current rows and the batch shuffle).

    Touched keys' current rows are re-derived from (current baseline +
    updates); everything else passes through untouched.  Late updates
    (ts < the key's current valid_from) are dropped (forward-only).

    ``changed_only=True`` returns ONLY the re-derived versions of the
    batch's keys — the delta a MERGE sink needs (keyed on
    keys + valid_from, it closes superseded current rows and inserts
    the new ones; see ``streaming/dimensions.py``).  The delta may
    re-emit byte-identical current rows for no-op batches; a keyed
    upsert makes that harmless.
    """
    tiebreaks = tiebreak_cols or []
    closed = history.filter(~F.col("is_current"))
    cur = history.filter(F.col("is_current"))

    upd_keys = updates.select(*key_cols).dropDuplicates()
    cur_untouched = cur.join(F.broadcast(upd_keys), key_cols, "left_anti")
    cur_touched = cur.join(F.broadcast(upd_keys), key_cols, "left_semi")

    # baseline rows: the touched current versions, re-entering the
    # timeline at their original valid_from.  side 0 sorts BEFORE
    # updates at an equal timestamp, so an equal-ts update with the
    # same attrs compresses away, and one with different attrs lands
    # after the baseline and supersedes it (module docstring).
    base = cur_touched.select(
        *key_cols,
        F.col("valid_from").alias(ts_col),
        *attr_cols,
        F.lit(0).alias("__side"),
        # tiebreak columns exist only on the updates side; baselines
        # carry typed nulls (they sort first at equal ts via __side)
        *[
            F.lit(None).cast(updates.schema[c].dataType).alias(f"__tb_{c}")
            for c in tiebreaks
        ],
    )
    # forward-only gate: drop updates older than the key's current
    # valid_from (splicing closed history is out of scope)
    floor = cur_touched.select(
        *key_cols, F.col("valid_from").alias("__floor")
    )
    upd = (
        updates.join(F.broadcast(floor), key_cols, "left")
        .filter(F.col("__floor").isNull() | (F.col(ts_col) >= F.col("__floor")))
        .select(
            *key_cols,
            F.col(ts_col),
            *attr_cols,
            F.lit(1).alias("__side"),
            *[F.col(c).alias(f"__tb_{c}") for c in tiebreaks],
        )
    )
    timeline = base.unionByName(upd)
    extra = [F.col("__side"), *[F.col(f"__tb_{c}") for c in tiebreaks]]
    rebuilt = _compress_and_stitch(timeline, key_cols, attr_cols, ts_col, extra)

    if changed_only:
        return rebuilt
    return closed.unionByName(cur_untouched).unionByName(rebuilt)
