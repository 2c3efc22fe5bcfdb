"""BPE re-materialization cadence probe (r4 verdict item 4): evidence
that per-merge wall time stays FLAT over a long fit.

Without a cadence, merge step t re-applies all t prior ``replace``s
over the cached base relation — O(n_merges² · vocab) total work and a
plan that grows per merge (Catalyst re-analysis cost on top).  With
``rematerialize_every=K`` the symbolized relation is checkpointed every
K merges, so step cost is bounded by O(vocab · K) and total work is
linear in n_merges.

Measured two ways on the same corpus:
- t(100)/t(25) with the cadence on — flat per-merge cost means ~4x
  (linear in merges); quadratic growth would approach 16x.
- t_cadence(100) vs t_nocadence(100) — the direct win.

And the correctness half of the done-criterion: the cadence-on and
cadence-off trajectories must be IDENTICAL (checkpointing only
materializes; the replica test pins the same property at pytest
scale).

Appends a ``"kind": "bpe_cadence_probe"`` record to PROGRESS.jsonl.

Usage: python tools/bpe_cadence_probe.py [n_merges]   (default 100)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from bpe_probe import generate  # noqa: E402  (same corpus generator)

BASE_DOCS = 20_000
CADENCE = 16


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    quarter = n_merges // 4

    base = Path("/tmp/bpe_cadence_probe/x1")
    generate(BASE_DOCS, base)

    from real_time_event_driven_data_pipeline_spark.operators import bpe
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("bpe-cadence-probe")
    spark.range(64, numPartitions=8).count()  # warm the JVM
    docs = spark.read.parquet(str(base / "documents.parquet")).repartition(32)

    def timed(n: int, cadence: int) -> tuple[float, list]:
        t0 = time.perf_counter()
        merges = bpe.bpe_fit(docs, n_merges=n, rematerialize_every=cadence,
                             small_vocab_threshold=None)
        return round(time.perf_counter() - t0, 2), merges

    # warm pass (listing/codegen), then the measured fits
    timed(3, CADENCE)
    t_quarter, _ = timed(quarter, CADENCE)
    t_full, traj_on = timed(n_merges, CADENCE)
    t_off, traj_off = timed(n_merges, 10**9)  # cadence disabled
    spark.stop()

    growth = round(t_full / max(t_quarter, 1e-9), 2)
    flat_bar = (n_merges / quarter) * 1.4  # linear-in-merges + noise
    identical = traj_on == traj_off
    record = {
        "ts": time.time(),
        "kind": "bpe_cadence_probe",
        "n_merges": n_merges,
        "cadence": CADENCE,
        "base_docs": BASE_DOCS,
        "sec_quarter": t_quarter,
        "sec_full": t_full,
        "sec_full_no_cadence": t_off,
        "growth_ratio": growth,
        "flat_bar": flat_bar,
        "trajectory_identical": identical,
        "pass": growth <= flat_bar and identical,
        "note": (
            "Flat per-merge cost: t(full)/t(quarter) ~ merges ratio (4) "
            "when per-merge time is constant; the no-cadence column shows "
            "the growing-plan cost avoided.  Trajectories (cadence on/off) "
            "must match exactly — localCheckpoint only materializes."
        ),
    }
    with open(REPO / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
