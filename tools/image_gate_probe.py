"""Incremental image-gate scale probe (round 6): the streaming image
near-dup gate's per-activation cost must track the BATCH, touching
history only through the narrow band-posting sidecar — never by
re-decoding or re-hashing accepted payloads.

Measured at history = 1x (20k images) and 10x (200k), fixed 2k-image
batch with 100 planted near-dups of history (one byte flipped):

- gate wall time at both history sizes (the index-scan term grows with
  history; the Arrow hash + join-probe terms do not);
- the contrast baseline: re-hashing the whole history through
  ``packed_dhash`` (what a gate WITHOUT the sidecar would pay every
  activation).  NOTE the stub decoder underprices this baseline by
  orders of magnitude — it reads 400 synthetic bytes where a real
  codec decodes megapixel images, while the posting scan the gate
  performs instead is 32 bytes/row at ANY payload size — so the
  baseline is recorded for context, not gated on;
- planted-dup recall (must be total: banding is lossless at d <= 3)
  and raw candidate-pair counts, so the bucket math is auditable.

Pass = all planted dups caught at both scales AND gate(10x) <= 2x
gate(1x): per-activation cost tracks the BATCH (the design claim),
with the history term a narrow columnar scan.

Appends a ``"kind": "image_gate_probe"`` record to PROGRESS.jsonl.

Usage: python tools/image_gate_probe.py [multiplier]   (default 10)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

HISTORY_BASE = 20_000
BATCH = 2_000
PLANTED = 100
PAYLOAD_BYTES = 400
MAX_DIST = 3


def _payloads(n: int, seed: int) -> list[bytes]:
    rng = np.random.default_rng(seed)
    return [
        bytes(rng.integers(0, 256, PAYLOAD_BYTES).astype(np.uint8)) for _ in range(n)
    ]


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_spark.operators import multimodal
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("image-gate-probe")
    spark.range(64, numPartitions=8).count()  # warm the JVM

    def media_df(payloads, id_start=0):
        rows = [
            (id_start + i, "image", p, None, None, None, None)
            for i, p in enumerate(payloads)
        ]
        return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA).repartition(32)

    results = {}
    for label, n_hist in (("1x", HISTORY_BASE), (f"{mult}x", HISTORY_BASE * mult)):
        hist_payloads = _payloads(n_hist, seed=3)
        # sidecar simulation: postings land in parquet per accepted epoch
        idx_dir = f"/tmp/image_gate_probe/idx_{label}"
        t0 = time.perf_counter()
        multimodal.image_dhash_postings(
            media_df(hist_payloads), max_dist=MAX_DIST
        ).write.mode("overwrite").parquet(idx_dir)
        t_index_build = round(time.perf_counter() - t0, 2)

        # batch: fresh images + planted near-dups of history (1 byte off)
        batch_payloads = _payloads(BATCH - PLANTED, seed=11)
        for j in range(PLANTED):
            p = bytearray(hist_payloads[j * (n_hist // PLANTED)])
            p[50] = (p[50] + 1) % 256
            batch_payloads.append(bytes(p))
        batch = media_df(batch_payloads, id_start=10_000_000).cache()
        batch.count()

        posting = spark.read.parquet(idx_dir)
        t0 = time.perf_counter()
        pairs = multimodal.incremental_image_near_dup_pairs(
            posting, batch, max_dist=MAX_DIST, max_bucket_df=10_000
        ).cache()
        n_pairs = pairs.count()
        t_gate = round(time.perf_counter() - t0, 2)
        # planted recall: each planted batch image must pair with its
        # history original (Hamming <= small byte perturbation)
        n_planted_found = (
            pairs.filter(
                (F.col("media_id_a") < 10_000_000)
                & (F.col("media_id_b") >= 10_000_000 + BATCH - PLANTED)
            )
            .select("media_id_b")
            .distinct()
            .count()
        )

        # contrast: what a sidecar-less gate pays — re-hash all history
        t0 = time.perf_counter()
        multimodal.packed_dhash(media_df(hist_payloads)).count()
        t_rehash = round(time.perf_counter() - t0, 2)

        pairs.unpersist()
        batch.unpersist()
        results[label] = {
            "n_history": n_hist,
            "sec_index_build_once": t_index_build,
            "sec_gate": t_gate,
            "sec_rehash_history_baseline": t_rehash,
            "candidate_pairs": n_pairs,
            "planted_found": n_planted_found,
            "planted_total": PLANTED,
        }
    spark.stop()

    big = results[f"{mult}x"]
    ok_recall = all(r["planted_found"] == PLANTED for r in results.values())
    ok_cost = big["sec_gate"] <= 2.0 * results["1x"]["sec_gate"]
    record = {
        "ts": time.time(),
        "kind": "image_gate_probe",
        "batch": BATCH,
        "planted": PLANTED,
        "max_dist": MAX_DIST,
        "results": results,
        "pass": ok_recall and ok_cost,
        "note": (
            "Arrival-time image gate vs history sizes: per-activation cost "
            "must track the BATCH (gate(10x) <= 2x gate(1x)); history is "
            "touched only through the 32-byte/row posting sidecar, never "
            "re-decoded.  The rehash baseline is context only: the stub "
            "decoder underprices what a real codec would pay by orders of "
            "magnitude.  Banding lossless at d<=3 -> planted recall total."
        ),
    }
    with open(REPO / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
