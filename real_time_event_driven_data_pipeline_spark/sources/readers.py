"""Schema-enforced sources.

Reference behavior being re-expressed (SURVEY §2.1):

- S1/S2: CSV scans with explicit ``StructType`` + header, single file or
  folder-of-part-files as one table (reference:
  docker-images/validation/validate.py:78-84,
  docker-images/transformation/transform.py:79-81).  Spark's file
  source globs folders natively, so folder-as-table is free.
- S4: empty-input guard — the reference pays a full ``count()`` per
  table (validate.py:87-92); ours probes with ``limit(1)`` so the scan
  stops at the first row regardless of table size.
- Streaming arrivals: the reference's S3-event trigger becomes a
  Structured Streaming file source (``read_stream_csv``); explicit
  schemas are mandatory there, which the registry already provides.

At 100 TB the same entry points apply: parquet scans get column
pruning + predicate pushdown from Catalyst; never infer schemas in
production (a full pre-scan of the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import TESTDATA_SCHEMAS


class EmptyInputError(ValueError):
    """Raised when a required source has no rows (reference exit-1 path)."""


def require_non_empty(df: DataFrame, name: str) -> DataFrame:
    # limit(1) stops the scan at the first row — O(1), not O(table) like
    # the reference's count()==0 guard.
    if not df.limit(1).take(1):
        raise EmptyInputError(f"source table '{name}' is empty")
    return df


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    check_non_empty: bool = False,
) -> DataFrame:
    """CSV scan (single file or folder of part files) with enforced schema.

    Malformed values become nulls (PERMISSIVE mode) and are surfaced by
    the validation operators — the reference's two-layer schema system.
    """
    df = spark.read.schema(schema).option("header", header).csv(path)
    return require_non_empty(df, path) if check_non_empty else df


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    check_non_empty: bool = False,
) -> DataFrame:
    """NDJSON scan (single file or folder), schema enforced.

    Same two-layer contract as CSV: the declared schema is the shape
    (no inference pass over the data — at 100 TB schema inference is a
    full extra scan), PERMISSIVE mode nulls out malformed values for
    the validation operators to catch.
    """
    df = spark.read.schema(schema).json(path)
    return require_non_empty(df, path) if check_non_empty else df


# Tables whose LongType 'ts' is epoch-NANOSECONDS surfaced by
# spark.sql.legacy.parquet.nanosAsLong (session.py).  Gated by table
# name so a future table with a genuine long 'ts' (epoch seconds/micros)
# is never silently rescaled (ADVICE r1).
_NANOS_TS_TABLES = frozenset({"events"})


def _normalize_timestamps(df: DataFrame, table: str) -> DataFrame:
    """Normalize testdata timestamp encodings to plain ``TimestampType``.

    The driver's parquet has shipped two encodings across rounds:

    - TIMESTAMP(NANOS) (events.ts only — see ``_NANOS_TS_TABLES``): with
      ``spark.sql.legacy.parquet.nanosAsLong`` (session.py) the column
      arrives as LongType nanoseconds.  ``ts div 1000`` keeps the math
      in exact integers (ns since epoch overflows double's 53-bit
      mantissa) and matches DuckDB's own ns→µs truncation, so oracles
      agree.
    - timestamp[us] with isAdjustedToUTC=false: Spark reads it as
      TIMESTAMP_NTZ, which functions like ``unix_micros`` and streaming
      watermarks reject.  Casting NTZ→TIMESTAMP interprets the wall
      value in the session timezone (pinned UTC in session.py), so the
      instant is unchanged and still matches DuckDB's naive reading.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if (
            table in _NANOS_TS_TABLES
            and field.name == "ts"
            and isinstance(field.dataType, T.LongType)
        ):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast(T.TimestampType()))
    return df


# Tables that feed per-row-EXPENSIVE operators (Arrow featurization,
# explode-heavy shingling, BLAS matmuls): when such a table arrives as
# fewer splits than cores — single-file local testdata is ONE split —
# every downstream Arrow/codegen stage inherits that parallelism and
# runs nearly serial (classifier featurization measured 22 s -> ~5 s
# with the fanout).  Mapping value = the stable hash key to fan out on
# (hash-partitioning by id keeps downstream id-keyed joins/groupBys on
# an already-useful distribution).  At real scale (100 TB = thousands
# of splits) the split count exceeds cores and this never fires — it is
# a small-input affordance, not a plan stage.
_FANOUT_TABLES = {"documents": "doc_id", "embeddings": "vec_id"}

FANOUT_CONF = "spark.rtedp.fanoutSmallInputs"


def _fanout_small(df: DataFrame, spark: SparkSession, table: str) -> DataFrame:
    """Repartition a few-split expensive-consumer table up to core count
    (r4 verdict item 5: centralized here so query call sites don't each
    carry a min_parallelism/repartition knob).  Opt out with
    ``spark.rtedp.fanoutSmallInputs=false``."""
    key = _FANOUT_TABLES.get(table)
    if key is None:
        return df
    if str(spark.conf.get(FANOUT_CONF, "true")).lower() != "true":
        return df
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= cores:
        return df
    return df.repartition(cores, key)


# (applicationId, sf_dir, table) -> loaded DataFrame.  spark.read.parquet
# schedules a footer/schema-inference job on EVERY call; the query
# registry re-loads the same ten immutable tables hundreds of times per
# session (bench: 108 queries x 3 passes), so memoizing the lazy
# DataFrame removes that per-build job and re-listing entirely.  Keyed
# by applicationId so a new session (new JVM state) re-reads.
_TESTDATA_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_testdata(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, DataFrame]:
    """Load driver testdata parquet tables as {name: DataFrame}
    (memoized per session — the tables are immutable driver fixtures)."""
    app = spark.sparkContext.applicationId
    # entries of stopped sessions are dead weight (dangling JVM refs):
    # drop them whenever the active app differs
    stale = [k for k in _TESTDATA_CACHE if k[0] != app]
    for k in stale:
        del _TESTDATA_CACHE[k]
    names = tables or tuple(TESTDATA_SCHEMAS)
    out = {}
    for t in names:
        key = (app, sf_dir, t)
        if key not in _TESTDATA_CACHE:
            df = _normalize_timestamps(
                spark.read.parquet(f"{sf_dir}/{t}.parquet"), t
            )
            _TESTDATA_CACHE[key] = _fanout_small(df, spark, t)
        out[t] = _TESTDATA_CACHE[key]
    return out


def read_stream_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file source over a landing directory.

    Spark-native analogue of the reference's S3 ObjectCreated ->
    Step Functions trigger (SURVEY §2.9): each newly arrived file is a
    micro-batch input; ``Trigger.AvailableNow`` gives the one-activation
    batch semantics the orchestrator had.
    """
    reader = spark.readStream.schema(schema).option("header", header)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(path)


def read_stream_parquet(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.readStream.schema(schema).parquet(path)


def read_orc_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    check_non_empty: bool = False,
) -> DataFrame:
    """ORC scan (single file or folder) — the second columnar format the
    engine serves natively.  Same pushdown/pruning story as parquet
    (ORC carries min/max stride statistics Spark's reader consumes);
    pass ``schema`` to skip footer-driven inference on huge file lists.
    """
    reader = spark.read.schema(schema) if schema is not None else spark.read
    df = reader.orc(path)
    return require_non_empty(df, path) if check_non_empty else df
