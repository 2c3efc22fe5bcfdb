"""Incremental connected-components scale probe (r7 verdict item 4's
done-bar): per-epoch cost must be bounded by the AFFECTED-component
size, not the accumulated graph size.

Setup: an existing labeling over a dup graph big enough that a full
recompute is forced onto the distributed min-label loop (600k
symmetrized edges, 3x the union-find fast-path threshold; 300k
two-vertex components).  An epoch then lands 10 new edges, each
bridging two existing components (~40 affected vertices out of 600k).

Measured through the public operator (``incremental_connected_
components``), asserting:
- updated rows == the affected subgraph exactly (bridged members +
  new vertices), i.e. 40 rows, NOT 600k;
- the incremental update's reduced graph fits the union-find fast
  path (it is affected-size), so the epoch pays seconds while the
  batch recompute over the union pays the full distributed loop;
- labels agree with the batch recompute on every affected vertex.

Appends a ``"kind": "incremental_cc_probe"`` record to PROGRESS.jsonl.

Usage: python tools/incremental_cc_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_PAIRS = 300_000  # two-vertex components; 600k symmetrized edges


def main() -> None:
    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_spark.operators.components import (
        connected_components,
        incremental_connected_components,
        merged_labels,
    )
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("incremental-cc-probe")

    # historical graph: (2i, 2i+1) pairs — generated distributed
    hist = (
        spark.range(N_PAIRS)
        .select(
            (F.col("id") * 2).alias("src"), (F.col("id") * 2 + 1).alias("dst")
        )
        .localCheckpoint()
    )
    t0 = time.perf_counter()
    labels = connected_components(hist).localCheckpoint()
    n_labels = labels.count()
    t_initial = round(time.perf_counter() - t0, 2)

    # the epoch: 10 bridges, each joining components 40k apart
    bridges = [(i * 4 + 1, 40_000 + i * 4) for i in range(10)]
    new_edges = spark.createDataFrame(bridges, "src long, dst long")

    t0 = time.perf_counter()
    updated = incremental_connected_components(labels, new_edges).localCheckpoint()
    n_updated = updated.count()
    t_incr = round(time.perf_counter() - t0, 2)

    # batch recompute over the union — what every epoch previously paid
    t0 = time.perf_counter()
    batch = connected_components(
        hist.unionByName(new_edges)
    ).localCheckpoint()
    batch.count()
    t_batch = round(time.perf_counter() - t0, 2)

    # exactness: merged incremental labels == batch labels, everywhere
    merged = merged_labels(labels, updated)
    n_diff = (
        merged.join(
            batch.select("id", F.col("comp").alias("_b")), "id", "full"
        )
        .filter(~F.col("comp").eqNullSafe(F.col("_b")))
        .count()
    )
    spark.stop()

    affected_expected = 4 * len(bridges)  # two 2-vertex components/bridge
    ok = (
        n_updated == affected_expected
        and n_diff == 0
        and t_incr < t_batch
    )
    record = {
        "ts": time.time(),
        "kind": "incremental_cc_probe",
        "graph": {
            "sym_edges": 2 * N_PAIRS,
            "vertices": 2 * N_PAIRS,
            "components": N_PAIRS,
            "fastpath_threshold": 200_000,
        },
        "epoch_edges": len(bridges),
        "updated_rows": n_updated,
        "updated_rows_expected": affected_expected,
        "labels_match_batch": n_diff == 0,
        "sec_initial_full_cc": t_initial,
        "sec_incremental_epoch": t_incr,
        "sec_batch_recompute": t_batch,
        "speedup_vs_recompute": round(t_batch / max(t_incr, 0.01), 1),
        "pass": ok,
        "note": (
            "10 bridge edges into a 600k-edge graph relabel exactly the "
            "40 affected vertices; the reduced graph rides the union-find "
            "fast path while the batch recompute pays the full "
            "distributed loop — per-epoch cost tracks the affected "
            "subgraph, not the accumulated graph."
        ),
    }
    with open(REPO / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
