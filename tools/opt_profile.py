"""Per-query optimization profiler (round 10).

For each named registered query: isolate it exactly the way bench.py's
measured pass does (scoped-cache reset + clearCache), then

  - time plan BUILD (python-side fn() call) and EXECUTE (.count(), the
    bench's timed action) separately over N repeats,
  - optionally time a noop-sink execution (guide §1.4) which computes
    every column — the count() action can let the optimizer prune,
  - count Spark jobs/stages launched by one execution (statusStore
    delta) — at sf0.1 the fixed per-job overhead dominates, so job
    count is a first-class optimization target,
  - dump `explain("formatted")` to plans/r10/<query>_<tag>.txt.

Usage:
  python tools/opt_profile.py [--tag before|after] [--noop] [--repeats N]
                              [--no-plans] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default=None, help="plans/r10/<q>_<tag>.txt")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from real_time_event_driven_data_pipeline_spark.observability import (
        drain_listener_bus,
        executor_io_totals,
    )
    from real_time_event_driven_data_pipeline_spark.operators.dedup import (
        reset_scoped_caches,
    )
    from real_time_event_driven_data_pipeline_spark.plans.registry import queries_map
    from real_time_event_driven_data_pipeline_spark.schemas import TESTDATA_SCHEMAS
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("opt-profile")
    for t in TESTDATA_SCHEMAS:
        try:
            spark.read.parquet(f"{args.sf_dir}/{t}.parquet").limit(1).count()
        except Exception:
            pass
    spark.range(64, numPartitions=8).mapInPandas(lambda it: it, schema="id long").count()

    qmap = queries_map()
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark._jvm.java.util.ArrayList()  # null hits py4j overload ambiguity

    def _iso() -> None:
        reset_scoped_caches()
        spark.catalog.clearCache()

    plans_dir = REPO / "plans" / os.environ.get("OPT_PLANS_ROUND", "r11")
    plans_dir.mkdir(parents=True, exist_ok=True)

    for name in args.queries:
        if name not in qmap:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = qmap[name]
        builds, execs, noops = [], [], []
        jobs_delta = 0
        for r in range(args.repeats):
            _iso()
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            if r == 0:
                drain_listener_bus(spark)
                j0 = store.jobsList(empty).size()
            n = df.count()
            t2 = time.perf_counter()
            if r == 0:
                drain_listener_bus(spark)
                jobs_delta = store.jobsList(empty).size() - j0
                if not args.no_plans and args.tag:
                    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                    plan = df._jdf.queryExecution().explainString(mode)
                    (plans_dir / f"{name}_{args.tag}.txt").write_text(plan)
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            if args.noop:
                _iso()
                df2 = fn(spark, args.sf_dir)
                t3 = time.perf_counter()
                df2.write.format("noop").mode("overwrite").save()
                noops.append(time.perf_counter() - t3)
        msg = (
            f"{name}: build {min(builds):.3f}s exec {min(execs):.3f}s "
            f"(total {min(b + e for b, e in zip(builds, execs)):.3f}s, "
            f"rows {n}, jobs {jobs_delta}"
        )
        if noops:
            msg += f", noop {min(noops):.3f}s"
        print(msg + ")")

    spark.stop()


if __name__ == "__main__":
    main()
