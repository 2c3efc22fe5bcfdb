"""Executor-counter observability shared by bench.py, the probes, and
the curation pipeline's per-stage instrumentation (review r10: the
drain + statusStore pattern previously lived in three copies, each
reading ``executorList(True).apply(0)`` — correct only in local mode,
where the single driver-executor is the whole story; on a
multi-executor cluster that attributes an arbitrary executor's
fraction of the work).

The totals here SUM over every executor the status store retains,
including dead ones (``executorList(False)``): summing only ACTIVE
executors would make the counter non-monotone whenever an executor is
decommissioned mid-measurement, manufacturing negative deltas.  The
remaining caveat at cluster scale: the store retains
``spark.ui.retainedDeadExecutors`` (default 100) dead entries, so a
job churning through more lost executors than that undercounts —
acceptable for the plan-shape deltas these counters adjudicate, and
impossible in the single-executor local mode all current recordings
run in.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def drain_listener_bus(spark: SparkSession, timeout_ms: int = 10_000) -> bool:
    """Wait for the async listener queue to empty so counter reads see
    every task-end event of the work just executed (bench r8: without
    the drain, a query's late events land in the NEXT query's delta).
    Returns False — never raises — when the drain times out: a stalled
    bus degrades one measurement's attribution, not the run."""
    jsc = spark.sparkContext._jsc.sc()
    try:
        jsc.listenerBus().waitUntilEmpty(timeout_ms)
        return True
    except Exception:
        return False


def executor_io_totals(
    spark: SparkSession, drain: bool = True
) -> tuple[int, int, int]:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes, gc_ms)
    summed over all retained executors, listener-drained first by
    default.  Before/after differences of these totals are the
    plan+data-determined cost signals the measurement discipline rests
    on (shuffle bytes) plus the memory-pressure witness (GC time)."""
    if drain:
        drain_listener_bus(spark)
    lst = spark.sparkContext._jsc.sc().statusStore().executorList(False)
    r = w = g = 0
    for i in range(lst.size()):
        e = lst.apply(i)
        r += e.totalShuffleRead()
        w += e.totalShuffleWrite()
        g += e.totalGCTime()
    return r, w, g
