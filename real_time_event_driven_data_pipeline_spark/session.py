"""SparkSession factory.

The reference builds its session per-job with S3A configs
(reference: docker-images/validation/validate.py:57-63,
docker-images/transformation/transform.py:64-69). Ours centralizes
session construction and tunes for the local[N] test harness while
keeping every knob cluster-safe (AQE, shuffle partitions, UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Knobs that are safe to (re)apply on an externally supplied session at
# runtime.  Timezone pinning matters for oracle comparison: DuckDB
# timestamps are naive-UTC, so date truncation must agree.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # testdata events.parquet carries TIMESTAMP(NANOS); Spark's reader
    # rejects it unless nanos are surfaced as long (converted back to
    # timestamps in sources.readers.load_testdata)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # testdata timestamp[us] columns have isAdjustedToUTC=false; read
    # them as TimestampType (not NTZ) so unix_micros/watermarks accept
    # them and timestamp predicates still push down to the parquet scan
    # (a cast-in-the-loader would sit between scan and filter).  Session
    # tz is UTC, so the instant equals DuckDB's naive reading.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to any session (incl. the driver's)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not runtime-settable on this build — fine
    return spark


def get_spark(app_name: str = "rtedp-spark", cpus: int | None = None) -> SparkSession:
    """Local session tuned for the test harness.

    On a real cluster the master/memory settings come from spark-submit;
    everything set here is either local-only or cluster-neutral.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
