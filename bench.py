"""Benchmark harness (driver contract).

Runs the engine's registered queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE compact JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {10 slowest only}, "sf": ..., "n_queries": N,
     "detail": "BENCH_DETAIL.json"}

The line is deliberately short: round 1 showed the driver's capture
window truncating a ~3 KB line carrying all 92 per-query timings,
leaving ``"parsed": null`` in BENCH_r01.json.  The full per-query dict
now goes to ``BENCH_DETAIL.json`` next to this script; stdout keeps
only the headline total plus the 10 slowest queries (bounded length).

Timing covers plan construction + execution (count-style materialize,
no driver-side collect of large results); session bootstrap is
excluded — at 100 TB the session is long-lived, queries are not.

Isolation semantics (r11, r10 verdict item 6): EVERY pass resets the
scoped-cache slots + clearCache before EVERY query, so each recorded
time is the query's own cold-cache cost.  Before r11 only the measured
pass 1 was isolated; passes 2..N let a query whose plan contains a
subtree EQUAL to an earlier query's live cache ride that cache, so the
per-query min mixed semantics — share-heavy queries (the dedup/kmeans/
classifier families, which share featurization/shingle/fit subtrees
with sibling queries) recorded ride-assisted minima up to ~1.6x below
their honest cold cost.  Consequence for cross-round comparison: r11
numbers for those queries sit ABOVE their r10 records by construction,
not by regression — like-for-like isolated pass-1 totals moved +2.3%
on the same box (258.1 s r10-baseline vs 264.1 s with unchanged
queries); the per-query-min total moved more because the ride passes
are gone.

Noise damping: the full query loop runs ``$SPARK_GRAFT_BENCH_PASSES``
times (default 3) and each query reports its fastest pass among ALL
passes.  The round-3 recording took min over passes 2..N on the theory
that pass 1 is the noisy one (worker forks, JIT, page-cache misses) —
but round-4 runs observed the OPPOSITE (co-tenant load arriving
mid-run made pass 1 the clean pass and passes 2-3 up to 8x slower), so
excluding any pass can inflate the record.  Every pass is a real
execution; the per-query minimum is the most noise-resistant honest
estimate on a co-tenant box.  Per-pass timings are preserved in
BENCH_DETAIL.json under ``passes``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# Noise detection (r8 verdict item 2): BENCH_r08 recorded a 1.21x
# common-set "regression" that was pure co-tenant load — unchanged code,
# zero shuffle-byte deltas across 147 queries.  The official record must
# defend itself: when the run LOOKS hot (per-pass total spread > 1.3x),
# take extra full passes; when individual shuffle-UNCHANGED queries
# disagree with the previous committed record by > 1.5x and > 0.5 s,
# re-run just those queries before writing the record.  All retries are
# real executions feeding the same per-query min.
PASS_SPREAD_BAR = 1.30
MAX_EXTRA_PASSES = 2
QUERY_REGRESSION_RATIO = 1.5
QUERY_REGRESSION_FLOOR_S = 0.5
MAX_QUERY_RETRIES = 3
SHUFFLE_SAME_RATIO = 1.30  # same bar as tools/shuffle_regression_check.py
SHUFFLE_MIN_BYTES = 1 << 20


def _latest_committed_detail() -> dict | None:
    """Newest git-committed BENCH_DETAIL.json carrying per-query
    timings + a shuffle block — the reference for the per-query noise
    check (mirrors tools/shuffle_regression_check.py's baseline)."""
    revs = subprocess.run(
        ["git", "log", "--format=%H", "--", "BENCH_DETAIL.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.split()
    for rev in revs:
        raw = subprocess.run(
            ["git", "show", f"{rev}:BENCH_DETAIL.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout
        try:
            d = json.loads(raw)
        except json.JSONDecodeError:
            continue
        if d.get("shuffle") and d.get("queries"):
            return d
    return None


def _shuffle_unchanged(prev: dict | None, cur: dict | None) -> bool:
    """True when two shuffle records describe the same plan shape —
    write bytes within the gate ratio in both directions (or both
    below the noise floor)."""
    if not prev or not cur:
        return False
    b = prev["shuffle_write_bytes"]
    c = cur["shuffle_write_bytes"]
    if max(b, c) < SHUFFLE_MIN_BYTES:
        return True
    return c <= SHUFFLE_SAME_RATIO * b and b <= SHUFFLE_SAME_RATIO * c


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir

    from real_time_event_driven_data_pipeline_spark.plans.registry import queries_map
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM + file listings once so per-query numbers measure the
    # queries, not first-touch costs (the long-lived-session model: at
    # 100 TB the session outlives any single query)
    from real_time_event_driven_data_pipeline_spark.schemas import TESTDATA_SCHEMAS

    for t in TESTDATA_SCHEMAS:
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()
        except Exception:
            pass
    # pre-fork the Arrow Python workers (first mapInPandas otherwise
    # pays worker startup inside whichever query runs it first)
    spark.range(64, numPartitions=8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # per-query shuffle/GC attribution (r7 verdict item 7): wall time
    # alone can't separate a plan regression from co-tenant noise, but
    # shuffle bytes are a property of the PLAN + data, not the machine.
    # The executor-summary counters (statusStore; populated with the UI
    # off) are monotone totals, so a before/after diff per query is
    # that query's shuffle volume.  Shared helper (r10): drains the
    # async listener queue first (review r8 — late task-end events
    # otherwise land in the NEXT query's delta) without ever aborting
    # the run (round-8 ADVICE), and sums ALL executors so the same
    # code is correct beyond local mode.
    from real_time_event_driven_data_pipeline_spark.observability import (
        drain_listener_bus,
        executor_io_totals,
    )
    from real_time_event_driven_data_pipeline_spark.operators.dedup import (
        reset_scoped_caches,
    )

    def _counters() -> tuple[int, int, int]:
        if not drain_listener_bus(spark):
            print("# warn: listener drain timed out", file=sys.stderr)
        return executor_io_totals(spark, drain=False)

    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    passes: list[dict[str, float]] = []
    shuffle: dict[str, dict[str, int]] = {}

    def _maintain() -> None:
        # between-pass maintenance a long-lived session would do: drop
        # cached relations left by the previous pass and give the JVM
        # one full collection, so later numbers measure the queries
        # rather than accumulated old-gen garbage
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def _run_query(name, fn, label: str) -> float:
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = round(time.perf_counter() - t0, 3)
        print(f"# [{label}] {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        return dt

    def _run_pass(label: str, measure_shuffle: bool) -> dict[str, float]:
        pass_times: dict[str, float] = {}
        for name, fn in queries_map().items():
            # isolation semantics for EVERY pass (r10 verdict item 6 —
            # formerly only the measured pass 1): scoped-cache slots
            # outlive their query (lifetime = until slot reuse), so a
            # later query whose plan contains an EQUAL subtree gets a
            # CacheManager hit and silently skips that subtree's
            # shuffle/compute — per-query bytes AND per-query min
            # timings then depend on registry ORDER, and a
            # certification-prefix rotation manufactures phantom deltas
            # (round 9 observed 4 queries each "improving" by the same
            # 1.7 MB after the r9 reorder; isolated re-measurement
            # matched the old baseline byte-for-byte).  Clearing the
            # cache before each query pins timing and attribution to
            # the query's own plan — and round 10 found clearCache
            # alone is NOT enough: the still-held slot REFERENCES leak
            # plan-equality state through the CacheManager and flip a
            # later query's physical plan (incremental_near_dups
            # measured 11.1 MB with residue vs its deterministic
            # clean-room 7.7 MB), so the slots themselves are reset
            # too.  Additions-only: pass 1 keeps its counter drains.
            reset_scoped_caches()
            spark.catalog.clearCache()
            if measure_shuffle:
                r0, w0, g0 = _counters()
            pass_times[name] = _run_query(name, fn, label)
            if measure_shuffle:
                r1, w1, g1 = _counters()
                shuffle[name] = {
                    "shuffle_read_bytes": r1 - r0,
                    "shuffle_write_bytes": w1 - w0,
                    "gc_ms": g1 - g0,
                }
        return pass_times

    for p in range(n_passes):
        if p:
            _maintain()
        # shuffle volume is plan-determined; one pass suffices
        passes.append(_run_pass(f"{p + 1}/{n_passes}", measure_shuffle=p == 0))

    # hot-box detection 1: per-pass total spread.  Identical work whose
    # pass totals disagree >1.3x means co-tenant load hit part of the
    # run; extra passes give the per-query min more clean samples.
    # Pass 1 is ALWAYS excluded: it carries the per-query
    # shuffle-counter drains, so it is structurally slower than passes
    # 2..N (at small sf by >1.3x on its own) — only like-for-like
    # passes can witness co-tenant load.  With fewer than 3 total
    # passes there is no like-for-like PAIR, so the spread check is
    # skipped entirely (ADVICE r9: comparing pass 1 against a single
    # clean pass fired the hot-box path spuriously on a quiet box).
    def _spread_passes() -> list[dict[str, float]]:
        return passes[1:]

    extra_passes = 0
    while (
        extra_passes < MAX_EXTRA_PASSES
        and len(_spread_passes()) > 1
        and max(sum(pt.values()) for pt in _spread_passes())
        > PASS_SPREAD_BAR * min(sum(pt.values()) for pt in _spread_passes())
    ):
        extra_passes += 1
        print(
            f"# noise: pass totals spread >{PASS_SPREAD_BAR}x — extra pass "
            f"{extra_passes}/{MAX_EXTRA_PASSES}",
            file=sys.stderr,
        )
        _maintain()
        passes.append(_run_pass(f"extra {extra_passes}", measure_shuffle=False))

    # per-query min over ALL passes: every pass is a real execution,
    # and co-tenant noise has been observed landing on EITHER side of
    # the warm-up boundary — excluding a pass can only inflate
    timings = {name: min(pt[name] for pt in passes) for name in passes[0]}

    # hot-box detection 2: a shuffle-UNCHANGED query (same plan moving
    # the same bytes) that is >1.5x and >0.5 s slower than the previous
    # committed record is presumed noise — re-run just that query until
    # it clears the bar or retries run out, so one loaded core doesn't
    # write a phantom regression into the permanent record.
    requeried: dict[str, int] = {}
    prev = _latest_committed_detail()
    if prev and prev.get("sf") != sf:
        prev = None  # cross-sf timings are not comparable
    if prev:
        qmap = queries_map()
        suspects = [
            name
            for name, cur_t in timings.items()
            if name in prev["queries"]
            and _shuffle_unchanged(prev["shuffle"].get(name), shuffle.get(name))
            and cur_t > QUERY_REGRESSION_RATIO * prev["queries"][name]
            and cur_t - prev["queries"][name] > QUERY_REGRESSION_FLOOR_S
        ]
        if suspects:
            _maintain()
        for name in suspects:
            for attempt in range(1, MAX_QUERY_RETRIES + 1):
                requeried[name] = attempt
                # same isolation as the pass loop (r11): retry N must
                # not ride attempt N-1's scoped-cache slots
                reset_scoped_caches()
                spark.catalog.clearCache()
                timings[name] = min(
                    timings[name], _run_query(name, qmap[name], f"retry {attempt}")
                )
                if (
                    timings[name] <= QUERY_REGRESSION_RATIO * prev["queries"][name]
                    or timings[name] - prev["queries"][name]
                    <= QUERY_REGRESSION_FLOOR_S
                ):
                    break

    total = round(sum(timings.values()), 3)
    detail_path = REPO / "BENCH_DETAIL.json"
    detail_doc = (
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_passes": n_passes,
                "passes": passes,
                "shuffle": shuffle,
                "noise": {
                    "extra_passes": extra_passes,
                    "requeried": requeried,
                    "baseline_total": prev.get("value") if prev else None,
                },
            },
            indent=2,
        )
        + "\n"
    )
    detail_path.write_text(detail_doc)
    # per-run detail copy (r10 verdict item 5/8): successive runs at
    # different core counts were overwriting each other's only detail
    # record (the driver's 8-core pass clobbered the committed 32-core
    # one).  BENCH_DETAIL.json stays the canonical latest-run file (the
    # noise baseline above reads its committed history), and a
    # cpu-suffixed sibling preserves each configuration's record.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "").strip() or "default"
    (REPO / f"BENCH_DETAIL_{cpus}c.json").write_text(detail_doc)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "sf": sf,
                "n_queries": len(timings),
                "detail": detail_path.name,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
