"""Skew-mitigation utilities: salting for hot keys.

AQE's skew-join handling (enabled in session.py) covers sort-merge
joins automatically; these utilities cover the cases AQE cannot:

- ``salted_count_distinct``: a two-stage exact distinct count.  A
  plain ``countDistinct`` shuffles every (key, value) pair to one
  reducer per key — a hot key's reducer OOMs at 100 TB.  Stage 1
  dedups (key, value) pairs sharded by value-hash; stage 2 sums per
  key.  Same result, bounded partition sizes.
- ``salted_join``: replicate the small side R times and scatter the
  skewed fact side across R salt shards, so one hot key's rows spread
  over R tasks instead of one.  For broadcast-sized dims prefer
  ``F.broadcast`` (no shuffle at all); salting is for when the right
  side is too big to broadcast AND the left is skewed.

Both are pure plan rewrites — semantics identical to the unsalted
operator, verifiable against the same oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    out_alias: str | None = None,
    n_shards: int = 32,
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) GROUP BY group_cols, with the
    distinct stage sharded by value hash.

    Plan: dedup (group, value-shard, value) -> count per group.  The
    heavy shuffle keys are (group, shard), so a hot group splits into
    n_shards bounded partitions; the final per-group sum moves only
    n_shards rows per group.
    """
    alias = out_alias or f"{distinct_col}_distinct"
    shard = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_shards)).alias("__shard")
    deduped = (
        # COUNT(DISTINCT x) ignores NULLs — drop them before sharding...
        df.filter(F.col(distinct_col).isNotNull())
        .select(*group_cols, F.col(distinct_col), shard)
        .dropDuplicates([*group_cols, "__shard", distinct_col])
        .groupBy(*group_cols, "__shard")
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(*group_cols)
        .agg(F.sum("__partial").cast("long").alias(alias))
    )
    # ...but groupBy preserves groups whose values are ALL null (count 0),
    # so restore them from the full group-key set
    groups = df.select(*group_cols).dropDuplicates()
    return groups.join(deduped, group_cols, "left").select(
        *group_cols, F.coalesce(F.col(alias), F.lit(0)).cast("long").alias(alias)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted across n_salts shards and the
    dim side replicated n_salts times.

    Output columns = fact columns + dim columns (join keys from both
    sides retained, as with an expression join).  Supported ``how``:
    inner / left / left_semi / left_anti — shapes where the replicated
    dim side cannot surface as unmatched output rows.  right/full would
    emit each unmatched dim row once per replica and are rejected.
    """
    if how not in {"inner", "left", "left_outer", "left_semi", "left_anti"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the dim side is "
            "replicated n_salts times, so outer-preserved dim rows would "
            "be duplicated"
        )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    joined = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["__salt"] == replicated_dim["__salt"]),
        how,
    )
    return joined.drop("__salt")


def top_keys(df: DataFrame, key_cols: list[str], n: int = 10) -> DataFrame:
    """Hot-key probe: the n heaviest keys and their row counts — the
    input to deciding whether a join/agg needs salting."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), *key_cols)
        .limit(n)
    )


def with_salt(df: DataFrame, key_col: str | Column, n_salts: int, out: str = "__salt") -> DataFrame:
    """Attach a deterministic salt shard derived from the row's key —
    building block for custom salted aggregations."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return df.withColumn(out, F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int"))
