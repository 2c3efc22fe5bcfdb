"""The event-driven pipeline, Spark-native.

Reference architecture (SURVEY §3.3): S3 ObjectCreated -> Step
Functions -> ECS validation container -> branch on exit code -> ECS
transformation container -> DynamoDB.  Ours collapses those container
hops into one Structured Streaming application:

    file source (arrival detection)          [readStream over landing dir]
      -> validation gate                     [per-micro-batch battery]
           fail -> quarantine sink           [exit-code branch analogue]
           pass -> accumulate valid data
      -> KPI recompute                       [same plans as batch]
      -> idempotent KV upsert                [foreachBatch, executor-side]

Two KPI modes:

- ``EventDrivenPipeline`` (reference-parity): full recompute of the
  daily KPIs over all validated-so-far data on every activation —
  exactly the reference's per-event semantics (transform.py:204-215),
  late/out-of-order arrivals tolerated implicitly.
- ``streaming_windowed_kpis`` (Spark-native): incremental tumbling
  1-day window aggregation with a watermark bounding state.  Semantic
  delta vs the reference (documented, SURVEY §2.9): rows later than
  the watermark are dropped instead of triggering recompute, and exact
  ``countDistinct`` is replaced by ``approx_count_distinct``, or by a
  mergeable Datasketches HLL sketch with ``distinct_mode="sketch"``
  (exact distinct is unsupported in streaming aggregation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.validation import ValidationReport, validate_tables
from ..sinks.kv import write_kv_upsert
from ..sources.readers import read_stream_csv
from .epochs import commit_epoch, epoch_committed, publish_epoch, read_epoch_dir


class EventDrivenPipeline:
    """File-arrival-triggered validate -> transform -> serve pipeline.

    One instance per logical table-set.  ``run_available_now()`` is one
    "activation" (the analogue of one S3-event-triggered Step Functions
    execution): it drains all newly arrived files, validates them as a
    micro-batch, quarantines bad batches, and recomputes + upserts the
    KPI tables from all valid data so far.
    """

    def __init__(
        self,
        spark: SparkSession,
        landing_dir: str,
        schema: T.StructType,
        contract_schema: T.StructType,
        table_name: str,
        valid_dir: str,
        quarantine_dir: str,
        checkpoint_dir: str,
        primary_key: list[str] | None = None,
        kpi_fns: dict[str, Callable[[DataFrame], DataFrame]] | None = None,
        kv_store_path: str | None = None,
        kpi_key_cols: dict[str, list[str]] | None = None,
    ):
        self.spark = spark
        self.landing_dir = landing_dir
        self.schema = schema
        self.contract_schema = contract_schema
        self.table_name = table_name
        self.valid_dir = valid_dir
        self.quarantine_dir = quarantine_dir
        self.checkpoint_dir = checkpoint_dir
        self.primary_key = primary_key or []
        self.kpi_fns = kpi_fns or {}
        self.kv_store_path = kv_store_path
        self.kpi_key_cols = kpi_key_cols or {}
        self.reports: list[tuple[int, ValidationReport]] = []
        # compact per-table key index: the cross-batch duplicate probe
        # reads this narrow sidecar (primary-key columns only), never
        # the full accumulated valid data — probe I/O is O(#keys * key
        # width) instead of O(history * row width) per activation
        self.key_index_dir = f"{valid_dir.rstrip('/')}_keyidx" if self.primary_key else None
        self.epoch_marker_dir = f"{valid_dir.rstrip('/')}_epochs"

    # -- validation gate (the exit-code branch, in-engine) --

    def _gate(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if epoch_committed(self.spark, self.epoch_marker_dir, epoch_id):
            return  # post-success replay (checkpoint lagged the publish)
        # pin the micro-batch: the validation battery, dup probe, data
        # write and key-index write are each an action, and an uncached
        # batch_df re-scans the arrival files per action (~3x source
        # reads per activation, visible in numInputRows)
        batch_df = batch_df.persist()
        try:
            self._gate_pinned(batch_df, epoch_id)
        finally:
            batch_df.unpersist()

    def _gate_pinned(self, batch_df: DataFrame, epoch_id: int) -> None:
        report = validate_tables(
            {self.table_name: batch_df},
            {self.table_name: self.contract_schema},
            {self.table_name: self.primary_key} if self.primary_key else {},
            [],
        )
        # Reference parity: the reference re-validates the WHOLE folder
        # each activation (validate.py loads all files so far), so a
        # re-delivered file with already-seen keys must fail.  We keep
        # it incremental AND bounded: only the new batch's keys are
        # probed, and only against the key-index sidecar (primary-key
        # columns of accepted rows), not the full history (ADVICE r1 —
        # the probe side no longer grows with row width or KPI columns).
        if report.passed and self.primary_key:
            # explicit listing probe, not a blanket except: a transient
            # read error must propagate rather than silently disabling
            # the cross-batch dup gate for this activation (round-2
            # ADVICE).  The current epoch's files are excluded so a
            # replay of a partially published epoch probes exactly the
            # pre-epoch history instead of flagging its own keys.
            seen_keys = read_epoch_dir(
                self.spark, self.key_index_dir, exclude_epoch=epoch_id
            )
            if seen_keys is not None:
                n_dups = (
                    batch_df.join(seen_keys, self.primary_key, "left_semi")
                    .limit(1)
                    .count()
                )
                report.add(
                    self.table_name,
                    "unique_key_cross_batch",
                    n_dups == 0,
                    "batch contains keys already accepted in a prior arrival"
                    if n_dups
                    else "",
                )
        self.reports.append((epoch_id, report))
        # idempotent per-epoch publish (streaming/epochs.py): an epoch
        # replay after a crash between the data write and the key-index
        # write must not double-append rows or leave the index desynced
        # (a desynced index would fail the retried batch as a cross-
        # batch duplicate and lose it to quarantine)
        target = self.valid_dir if report.passed else self.quarantine_dir
        publish_epoch(batch_df, target, epoch_id)
        if report.passed and self.key_index_dir:
            publish_epoch(
                batch_df.select(self.primary_key), self.key_index_dir, epoch_id
            )
        if report.passed:
            self._recompute_kpis()
        # marker last: KV upserts are idempotent by key, so re-running
        # the recompute on replay is safe; skipping a committed epoch is
        # just the fast path
        commit_epoch(self.spark, self.epoch_marker_dir, epoch_id)

    def _recompute_kpis(self) -> None:
        valid = self.spark.read.parquet(self.valid_dir)
        for name, fn in self.kpi_fns.items():
            kpis = fn(valid)
            if self.kv_store_path:
                write_kv_upsert(
                    kpis, self.kv_store_path, self.kpi_key_cols[name], table=name
                )

    def run_available_now(self, listener=None) -> None:
        """One activation: drain currently available files, then stop.

        ``listener`` (a ``StreamingQueryListener``, e.g.
        ``streaming.listener.MetricsLogListener``) is attached for the
        activation and detached after — per-batch telemetry without
        leaking listeners into a shared session.
        """
        if listener is not None:
            self.spark.streams.addListener(listener)
        try:
            stream = read_stream_csv(self.spark, self.landing_dir, self.schema)
            q = (
                stream.writeStream.foreachBatch(self._gate)
                .option("checkpointLocation", self.checkpoint_dir)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            if listener is not None:
                self.spark.streams.removeListener(listener)


def streaming_windowed_kpis(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    user_col: str = "user_id",
    window: str = "1 day",
    watermark: str = "1 day",
    distinct_mode: str = "approx",
) -> DataFrame:
    """Spark-native incremental KPI aggregation for a streaming frame.

    Watermark bounds state.  Exact countDistinct is unsupported in
    streaming aggregation (SURVEY §4.3); ``distinct_mode`` picks the
    substitute:

    - ``"approx"`` (default): ``approx_count_distinct`` — an estimate
      only, nothing downstream can re-aggregate.
    - ``"sketch"``: Datasketches HLL via ``hll_sketch_agg`` — emits the
      same ``approx_unique_users`` estimate PLUS the mergeable sketch
      bytes (``user_sketch``), so served windows can later be rolled up
      (day → week/month) with ``hll_union_agg`` without ever re-reading
      the raw stream.  Error vs the batch exact twin is bounded in
      tests/test_streaming.py.
    """
    if distinct_mode == "sketch":
        sk = F.hll_sketch_agg(user_col).alias("user_sketch")
        distinct_cols = [
            F.hll_sketch_estimate("user_sketch").alias("approx_unique_users"),
            "user_sketch",
        ]
    elif distinct_mode == "approx":
        sk = F.approx_count_distinct(user_col).alias("approx_unique_users")
        distinct_cols = ["approx_unique_users"]
    else:
        raise ValueError(f"distinct_mode must be 'approx' or 'sketch', got {distinct_mode!r}")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
            sk,
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
            *distinct_cols,
        )
    )


def incremental_kpi_upsert(
    events: DataFrame,
    kv_store_path: str,
    checkpoint_dir: str,
    table: str = "windowed_kpis",
    **kpi_kwargs,
):
    """True incremental serving: windowed KPIs -> per-micro-batch
    idempotent KV upsert.

    ``update`` output mode emits only the windows each micro-batch
    changed; the ``foreachBatch`` upsert overwrites those keys in the
    serving store (idempotent by (window_start, key), so micro-batch
    retries are safe).  Contrast with ``EventDrivenPipeline``'s
    reference-parity full recompute: here state, output, and write
    volume are all proportional to the CHANGED windows, not to history —
    the shape that holds at 100 TB/day.

    Returns the started StreamingQuery (caller awaits/stops).
    """
    kpis = streaming_windowed_kpis(events, **kpi_kwargs)
    key_col = kpi_kwargs.get("key_col", "event_type")

    def _upsert(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_kv_upsert(
            batch_df, kv_store_path, ["window_start", key_col], table=table
        )

    return (
        kpis.writeStream.outputMode("update")
        .foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def incremental_bottomk_sample(
    events: DataFrame,
    sample_dir: str,
    checkpoint_dir: str,
    value_col: str,
    group_col: str,
    key_col: str,
    k: int = 512,
):
    """Streaming twin of the deterministic bottom-k quantile sketch
    (r9 verdict item 7b): each micro-batch publishes its own per-group
    bottom-k partial; the CURRENT global sample is derived at read time
    by re-ranking the union of partials (``resolved_bottomk_quantiles``).

    Why this is exact, not approximately-stitched: bottom-k is
    mergeable by construction — bottom-k(union) == bottom-k(union of
    each part's bottom-k) (operators/sketches.py, pytest-pinned), so
    the resolved sample equals the batch sketch over everything that
    ever streamed, bit for bit.  The same composition as the md5-HLL
    day registers: per-epoch partials are append-only and tiny
    (<= k rows per group per epoch), raw data is scanned once ever,
    and any later rollup reads KBs of sketch state.

    Exactly-once: partials publish through the idempotent per-epoch
    protocol (``streaming/epochs.py``) keyed by the marker dir
    ``<sample_dir>_epochs``, so micro-batch replays never double-count
    a row into the resolved sample.  The epoch id is the idempotency
    key and is bound to the CHECKPOINT lineage: keep one checkpoint
    per sample_dir for the sidecar's life (a fresh checkpoint restarts
    epoch ids at 0 and collides with committed markers — batches would
    be silently skipped; the same single-lineage contract as the
    curation pipeline's sidecars).  The partial sidecar accretes one
    file AND <= k x |groups| rows per epoch — ``fold_bottomk_sample``
    collapses the rows to the resolved <= k per group (exact by
    mergeability, bounding the read-time re-rank at
    O(groups x k + rows-since-fold)); plain
    ``sinks.maintenance.compact_unpartitioned`` merges only files.

    Returns the started StreamingQuery (caller awaits/stops).
    """
    from ..operators.sketches import bottomk_sample

    marker_dir = f"{sample_dir.rstrip('/')}_epochs"

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if epoch_committed(spark, marker_dir, epoch_id):
            return
        publish_epoch(
            bottomk_sample(batch_df, value_col, group_col, key_col, k),
            sample_dir,
            epoch_id,
        )
        commit_epoch(spark, marker_dir, epoch_id)

    return (
        events.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def fold_bottomk_sample(
    spark: SparkSession,
    sample_dir: str,
    value_col: str,
    group_col: str,
    key_col: str,
    k: int = 512,
) -> int | None:
    """Fold the per-epoch partial sidecar down to its RESOLVED bottom-k
    (<= k rows per group, replacing the accumulated epoch partials).

    Why: partials accrete <= k x |groups| rows EVERY epoch forever, so
    the read-time re-rank — and the sidecar scan itself — grows
    O(epochs).  Mergeability makes this fold EXACT: bottom-k of the
    fold's output unioned with any future partials equals bottom-k
    over everything that ever streamed (the same argument that makes
    the resolved read exact), so folding periodically bounds the
    sidecar at O(groups x k) + rows-since-last-fold with zero effect
    on any later resolution (pytest-pinned).

    Same operational contract as ``compact_cluster_labels``: run ONLY
    with the stream stopped CLEANLY — last epoch's marker committed
    (``replace_table`` reader race; folded rows lose their epoch-N
    file naming, which is safe for committed history only: folding a
    crashed epoch's uncommitted rows would double-count them when the
    epoch replays, since the replay's partial-attempt cleanup keys off
    the file prefix).  Returns the resolved row count, or None when no
    partials exist."""
    from ..operators.sketches import bottomk_sample
    from ..sinks.maintenance import replace_table

    parts = read_epoch_dir(spark, sample_dir)
    if parts is None:
        return None
    resolved = bottomk_sample(
        parts, value_col, group_col, key_col, k
    ).localCheckpoint()  # materialized BEFORE the swap
    n = resolved.count()
    replace_table(spark, sample_dir, resolved)
    return n


def resolved_bottomk_quantiles(
    spark: SparkSession,
    sample_dir: str,
    value_col: str,
    group_col: str,
    key_col: str,
    k: int = 512,
    percents: tuple[int, ...] = (50, 95, 99),
    exclude_epoch: int | None = None,
) -> DataFrame | None:
    """Current quantile estimates from an ``incremental_bottomk_sample``
    sidecar: re-rank the union of per-epoch partials (mergeability makes
    this EQUAL to the batch sketch over all streamed rows) and read the
    integer-exact target ranks.  ``None`` before any partials exist.
    Output matches ``bottomk_sample_quantiles``:
    (group, n_sample, p{p}_est ...).

    Read between activations, like every reader of a live epoch dir
    (review r10): concurrent with a stream replaying a crashed epoch,
    that epoch's republish deletes files this lazy plan still
    references (FILE_NOT_EXIST at action time) and its uncommitted
    partial would ride into the "exact" resolution.  When reading
    around a known in-flight epoch, pass it as ``exclude_epoch`` —
    the ``resolved_cluster_labels`` convention."""
    from ..operators.sketches import bottomk_sample_quantiles

    parts = read_epoch_dir(spark, sample_dir, exclude_epoch=exclude_epoch)
    if parts is None:
        return None
    return bottomk_sample_quantiles(
        parts, value_col, group_col, key_col, k, percents
    )
