"""K-means scale probe: evidence the distributed Lloyd's fit scales
~linearly in corpus size.

The driver's sf0.1 embeddings table is 2,000 vectors — small enough
that fixed per-job latency (not compute) dominates, so a ratio there
says nothing.  This tool synthesizes clustered corpora large enough
for the assignment compute (n·k·dim HOF evaluations per iteration) to
dominate — base 20k vectors, default 10x = 200k — and times
``operators/clustering.kmeans_centroid_table`` at 1x and Nx.

Why the design should pass: assignment is a map-side projection
(embarrassingly parallel over input splits), the update shuffle is
≤ k rows per partition regardless of n, and driver traffic is ≤ k rows
per iteration — nothing in the plan grows super-linearly with n.

Appends a ``"kind": "kmeans_scale_probe"`` record to PROGRESS.jsonl.

Usage: python tools/kmeans_probe.py [multiplier]   (default 10)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE_N = 20_000
DIM = 64
K = 8
ITERS = 3


def generate(n: int, path: Path, seed: int = 7) -> None:
    path.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 0.5, size=(K, DIM)).astype(np.float32)
    assign = rng.integers(0, K, size=n)
    vecs = centers[assign] + rng.normal(0.0, 0.08, size=(n, DIM)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1).astype(np.float32)), DIM
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(assign.astype(np.int32)),
        }
    )
    pq.write_table(tbl, path / "embeddings.parquet")


def main() -> None:
    multiplier = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    base = Path("/tmp/kmeans_probe/x1")
    big = Path(f"/tmp/kmeans_probe/x{multiplier}")
    generate(BASE_N, base)
    generate(BASE_N * multiplier, big, seed=11)

    from real_time_event_driven_data_pipeline_spark.operators import clustering
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("kmeans-probe")
    spark.range(64, numPartitions=8).count()  # warm the JVM

    def timed(d: Path) -> dict:
        best = None
        for _ in range(2):  # min-of-2: first touch pays listing/codegen
            emb = spark.read.parquet(str(d / "embeddings.parquet"))
            t0 = time.perf_counter()
            rows = clustering.kmeans_centroid_table(
                emb, k=K, iters=ITERS, min_parallelism=32
            ).collect()
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
        sizes = sorted(
            (r["cluster"], r["n_vectors"]) for r in rows if r["dim"] == 1
        )
        return {"sec": round(best, 2), "cluster_sizes": [s for _, s in sizes]}

    out = {}
    for label, d in [("x1", base), (f"x{multiplier}", big)]:
        out[label] = timed(d)
        print(f"# kmeans @ {label}: {out[label]}", file=sys.stderr)
    spark.stop()

    ratio = round(out[f"x{multiplier}"]["sec"] / max(out["x1"]["sec"], 1e-9), 2)
    bar = 1.25 * multiplier
    record = {
        "ts": time.time(),
        "kind": "kmeans_scale_probe",
        "multiplier": multiplier,
        "base_n": BASE_N,
        "k": K,
        "iters": ITERS,
        "dim": DIM,
        "results": out,
        "time_ratio": ratio,
        "pass": ratio <= bar,
        "note": (
            "Gate: Nx fit <= linear + 25% noise headroom.  Assignment is "
            "map-side (no shuffle), update shuffles <= k rows/partition, "
            "driver sees <= k rows/iteration — per-unit cost should be "
            "flat in n."
        ),
    }
    with open(REPO / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
