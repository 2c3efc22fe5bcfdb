"""Table maintenance for partitioned parquet sinks.

Event-driven ingestion (reference: per-arrival micro-batches appended by
the streaming pipeline; SURVEY §2.9) fragments a table into many small
files — the classic 100 TB operational problem: file-listing cost grows
per query, row-group statistics lose selectivity, and scan tasks become
seek-bound.  This module keeps the analytical sink healthy with
O(changed-partitions) maintenance passes, plus the training-export step
a data pipeline feeds to a trainer:

- ``partition_file_stats``: Hadoop-FS walk (works on any Hadoop
  filesystem — local, HDFS, s3a) -> per-partition file count/bytes.
- ``compact_partitions``: rewrite only fragmented partitions into
  ~``target_file_bytes`` files each, via the same dynamic-partition
  overwrite primitive as the MERGE sink (tables.py).
- ``export_training_shards``: deterministic, size-bounded shard export
  with a manifest — the hand-off format for a training loader.
- ``refresh_rollup``: incremental materialized-rollup maintenance —
  recompute ONLY the partitions an arrival touched and MERGE them into
  the rollup table.
"""

from __future__ import annotations

import json
import math
from collections.abc import Callable
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import merge_upsert_partitioned, overwrite_partitions, touched_partitions_predicate


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def partition_file_stats(spark: SparkSession, path: str) -> dict[str, tuple[int, int]]:
    """Per-partition-directory (n_files, total_bytes) for a partitioned
    parquet table, via the Hadoop FileSystem API (filesystem-agnostic:
    the same call pattern lists local dirs, HDFS, or an object store).

    Returns {relative_partition_dir: (n_files, bytes)}; "" for files at
    the table root (unpartitioned).
    """
    fs, root, jvm = _hadoop_fs(spark, path)
    stats: dict[str, list[int]] = {}
    it = fs.listFiles(root, True)  # recursive
    root_str = fs.makeQualified(root).toString().rstrip("/")
    while it.hasNext():
        f = it.next()
        p = f.getPath().toString()
        name = p.rsplit("/", 1)[-1]
        if not name.endswith(".parquet"):
            continue  # _SUCCESS, checksums, tmp files
        rel = p[len(root_str) :].lstrip("/")
        part_dir = rel.rsplit("/", 1)[0] if "/" in rel else ""
        agg = stats.setdefault(part_dir, [0, 0])
        agg[0] += 1
        agg[1] += f.getLen()
    return {k: (v[0], v[1]) for k, v in stats.items()}


def _partition_values(part_dir: str) -> dict[str, str]:
    """Parse 'day=2025-03-08/region=EU' into {'day': '2025-03-08', ...}.

    Directory names use Hive's URL-style escaping for special characters
    (``name=a%20b`` for value ``a b``), so both key and value are
    unquoted — the returned values compare equal to the column values,
    which is what ``touched_partitions_predicate`` filters on.
    """
    out = {}
    for seg in part_dir.split("/"):
        if "=" in seg:
            k, v = seg.split("=", 1)
            out[unquote(k)] = unquote(v)
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
) -> dict[str, int]:
    """Rewrite fragmented partitions into ~``target_file_bytes`` files.

    Only partitions with >= ``min_files_to_compact`` files are touched;
    each is read partition-pruned, coalesced to
    ceil(bytes / target_file_bytes) files, and republished with the
    dynamic-partition overwrite (others partitions never read or
    written).  Cost is O(fragmented partitions), so this can run after
    every ingestion burst.  Returns {partition_dir: n_output_files}.

    ``coalesce`` (not ``repartition``): compaction must not shuffle —
    it narrows existing tasks into fewer output files.
    """
    stats = partition_file_stats(spark, path)
    done: dict[str, int] = {}
    for part_dir, (n_files, n_bytes) in stats.items():
        if n_files < min_files_to_compact or not part_dir:
            continue
        values = _partition_values(part_dir)
        pred = touched_partitions_predicate([values], list(values))
        pruned = spark.read.parquet(path).filter(pred)
        n_out = max(1, math.ceil(n_bytes / target_file_bytes))
        # localCheckpoint: materialize before overwriting the files the
        # plan is lazily reading (same contract as merge_upsert)
        compacted = pruned.coalesce(n_out).localCheckpoint()
        if compacted.isEmpty():
            # The pruned filter matched no rows (e.g. a partition value
            # this parser cannot round-trip): overwriting would silently
            # rewrite nothing — skip it and leave the directory as-is.
            continue
        overwrite_partitions(compacted, path, partition_cols)
        done[part_dir] = n_out
    return done


def export_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    id_col: str = "doc_id",
) -> dict:
    """Deterministic size-bounded shard export for a training loader.

    Shard assignment is ``xxhash64(id) % n_shards`` — stable across
    re-runs and re-partitioning, so an interrupted export resumes
    identically and two exports of the same corpus are diffable.
    ``repartition(n_shards, shard)`` routes each shard to one task, so
    every shard is exactly one parquet file under ``shard=K/``.  A
    ``_manifest.json`` records per-shard row counts for the loader.

    One count() action sizes the export (single pruned scan); pass the
    corpus through ``quality_filter``/dedup first — this is the last
    step of the curation pipeline.
    """
    n_rows = df.count()
    n_shards = max(1, math.ceil(n_rows / rows_per_shard))
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )
    sharded.repartition(n_shards, "shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)

    spark = df.sparkSession
    counts = {
        int(r["shard"]): int(r["n"])
        for r in spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    manifest = {
        "n_rows": n_rows,
        "n_shards": n_shards,
        "rows_per_shard_target": rows_per_shard,
        "shards": {str(k): counts.get(k, 0) for k in range(n_shards)},
    }
    fs, root, jvm = _hadoop_fs(spark, path)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(f"{path}/_manifest.json"), True)
    out.write(bytearray(json.dumps(manifest, indent=2).encode()))
    out.close()
    return manifest


def refresh_rollup(
    spark: SparkSession,
    base: DataFrame,
    rollup_path: str,
    agg_fn: Callable[[DataFrame], DataFrame],
    key_cols: list[str],
    partition_cols: list[str],
    changed: list[dict] | None,
) -> None:
    """Incrementally maintain a materialized rollup table.

    ``agg_fn`` must be partition-local: its group key has to contain
    ``partition_cols`` (e.g. a daily rollup grouped by day), so the
    rollup rows of a partition depend only on base rows of that
    partition.  Then maintenance is exact with this plan:

    1. filter base to the ``changed`` partition values (partition-pruned
       scan — O(changed days), never O(history));
    2. recompute the rollup for just those partitions;
    3. MERGE the recomputed rows into the rollup table (replaces that
       partition's stale rows, leaves every other partition untouched).

    ``changed=None`` rebuilds everything (bootstrap path).  The changed
    list is day-grain metadata (one dict per partition), the same shape
    ``touched_partitions_predicate`` takes — at 100 TB/day it has ~1
    entry per arrival day, not per row.
    """
    if changed is None:
        updates = agg_fn(base)
    else:
        if not changed:
            return
        pred = touched_partitions_predicate(changed, partition_cols)
        updates = agg_fn(base.filter(pred))
    merge_upsert_partitioned(spark, updates, rollup_path, key_cols, partition_cols)


def recover_compaction(spark: SparkSession, path: str) -> bool:
    """Restore a table moved aside by a crashed ``compact_unpartitioned``.

    The swap in ``compact_unpartitioned`` has a window between
    rename(root -> old) and rename(tmp -> root) where ``path`` does not
    exist; a crash there leaves the data at ``<path>.compact-old``.
    Call this at process startup, before the first sidecar read: if the
    root is missing and the ``-old`` directory exists, it is renamed
    back.  Returns True if a recovery
    was performed.  A stale ``-tmp`` directory is deleted either way —
    it only ever holds a redundant coalesced copy.
    """
    fs, root, jvm = _hadoop_fs(spark, path)
    hpath = jvm.org.apache.hadoop.fs.Path
    tmp, old = hpath(f"{path}.compact-tmp"), hpath(f"{path}.compact-old")
    recovered = False
    if not fs.exists(root) and fs.exists(old):
        if not fs.rename(old, root):
            raise OSError(f"recover_compaction: cannot restore {path}")
        recovered = True
    fs.delete(tmp, True)
    return recovered


def compact_unpartitioned(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
) -> int | None:
    """Compact an unpartitioned parquet directory (e.g. the streaming
    pipeline's key-index sidecar, which accretes one file per accepted
    activation).

    Writes the coalesced copy to ``<path>.compact-tmp`` first, then
    swaps directories with two Hadoop-FS renames.  On local disk and
    HDFS the renames are atomic, but there is still a window between
    them where ``path`` does not exist, so readers must not race the
    swap — compact a streaming sidecar only between micro-batches.  On
    object stores (s3a) "rename" is copy+delete and the window is
    wide — run compaction only when the table is quiesced.  A crash
    inside the window leaves the data at ``<path>.compact-old``;
    ``recover_compaction`` restores it and is invoked here first.
    Returns the output file count, or None if below the threshold.
    """
    recover_compaction(spark, path)
    stats = partition_file_stats(spark, path)
    n_files = sum(n for n, _ in stats.values())
    n_bytes = sum(b for _, b in stats.values())
    if n_files < min_files_to_compact:
        return None
    n_out = max(1, math.ceil(n_bytes / target_file_bytes))
    df = spark.read.parquet(path).coalesce(n_out).localCheckpoint()
    replace_table(spark, path, df)
    return n_out


def replace_table(spark: SparkSession, path: str, df) -> None:
    """Atomically-as-possible replace ``path``'s contents with ``df``
    via the tmp-write + two-rename swap (see ``compact_unpartitioned``
    for the reader-race and object-store caveats; ``df`` must already
    be materialized — a lazy plan still reading ``path`` would race its
    own swap)."""
    fs, root, jvm = _hadoop_fs(spark, path)
    hpath = jvm.org.apache.hadoop.fs.Path
    tmp, old = hpath(f"{path}.compact-tmp"), hpath(f"{path}.compact-old")
    fs.delete(tmp, True)
    fs.delete(old, True)
    df.write.mode("overwrite").parquet(f"{path}.compact-tmp")
    if not fs.rename(root, old):
        raise OSError(f"replace_table: cannot move {path} aside")
    if not fs.rename(tmp, root):
        fs.rename(old, root)  # roll back
        raise OSError(f"replace_table: swap failed for {path}")
    fs.delete(old, True)
