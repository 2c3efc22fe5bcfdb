"""Large-vocab BPE probe (r5 verdict item 6): per-merge wall time must
be INDEPENDENT OF STEP INDEX over a ~1k-merge fit with the production
cadence (rematerialize_every=64).

The cadence probe (tools/bpe_cadence_probe.py) validated flatness at
100 merges; a real 32k-vocab tokenizer runs thousands of merges, where
any residual per-step growth (plan re-analysis, lineage, executor-side
state) compounds.  This probe runs ONE long fit and buckets per-merge
wall time into segments of 100 steps via the ``on_step`` hook: flat
cost means the last segment's per-merge time ~= the first's (ratio
bounded by a noise bar), not merely that total time is sub-quadratic.

Appends a ``"kind": "bpe_longrun_probe"`` record to PROGRESS.jsonl.

Usage: python tools/bpe_longrun_probe.py [n_merges]   (default 1000)
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
CADENCE = 64
SEGMENT = 100


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    base = Path("/tmp/bpe_longrun_probe/x1")
    generate(BASE_DOCS, base)

    from real_time_event_driven_data_pipeline_spark.operators import bpe
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("bpe-longrun-probe")
    spark.range(64, numPartitions=8).count()  # warm the JVM
    docs = spark.read.parquet(str(base / "documents.parquet")).repartition(32)

    bpe.bpe_fit(docs, n_merges=3, rematerialize_every=CADENCE,
                small_vocab_threshold=None)  # warm pass

    step_secs: list[float] = []
    t0 = time.perf_counter()
    merges = bpe.bpe_fit(
        docs,
        n_merges=n_merges,
        rematerialize_every=CADENCE,
        on_step=lambda step, s: step_secs.append(s),
        small_vocab_threshold=None,  # this probes the DISTRIBUTED loop
    )
    total = round(time.perf_counter() - t0, 2)
    spark.stop()

    segments = [
        round(sum(step_secs[i : i + SEGMENT]) / len(step_secs[i : i + SEGMENT]), 4)
        for i in range(0, len(step_secs), SEGMENT)
    ]
    # median-of-segments as the reference: robust to one noisy segment
    # on this co-tenant box; the bar is on the LAST segment because
    # per-step growth compounds monotonically if present
    ref = sorted(segments)[len(segments) // 2]
    ratio_last = round(segments[-1] / max(ref, 1e-9), 2)
    bar = 1.6  # flat + co-tenant noise; quadratic growth would be ~10x
    record = {
        "ts": time.time(),
        "kind": "bpe_longrun_probe",
        "n_merges_requested": n_merges,
        "n_merges_learned": len(merges),
        "cadence": CADENCE,
        "base_docs": BASE_DOCS,
        "sec_total": total,
        "sec_per_merge_by_segment": segments,
        "segment_size": SEGMENT,
        "ratio_last_vs_median": ratio_last,
        "flat_bar": bar,
        "pass": ratio_last <= bar,
        "note": (
            "Per-merge wall time bucketed by step index over one long fit "
            "with the production cadence; flat segments = per-merge cost "
            "independent of step index (the 32k-vocab prerequisite)."
        ),
    }
    with open(REPO / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
