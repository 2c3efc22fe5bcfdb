"""Incremental embedding-gate scale probe (r8 verdict item 3): the
arrival-time SEMANTIC near-dup gate's per-activation cost must track
the BATCH, touching accepted history only through two narrow sidecars
(LSH postings + vector store) — never by re-hashing accepted vectors
or shuffling the corpus.

Measured at history = 1x (20k vectors) and 10x (200k), fixed 2k-vector
batch with 100 planted near-dups of history (cos ~0.99 perturbations):

- gate wall time at both history sizes (the posting/vector index-scan
  terms grow with history; the signature UDF + candidate join + verify
  terms track batch x bucket occupancy);
- the contrast baseline: re-running ``embedding_lsh_postings`` over
  the whole history — what a sidecar-less gate would pay every
  activation (a full-corpus Arrow UDF scan);
- planted-dup recall and raw candidate-pair counts, so the bucket math
  is auditable.  At the probe's settings (16 tables x 12 planes, sized
  by ``lsh_planes_for_corpus`` for the 10x corpus) the analytic miss
  probability for a cos-0.99 pair is (1 - 0.974^12)^16 ~ 1e-9, so
  planted recall must be total.

Pass = all planted dups caught at both scales AND gate(10x) <= 2x
gate(1x): per-activation cost tracks the BATCH (the design claim),
with the history terms narrow columnar scans.

Appends a ``"kind": "embedding_gate_probe"`` record to PROGRESS.jsonl.

Usage: python tools/embedding_gate_probe.py [multiplier]   (default 10)
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
DIM = 64
THRESHOLD = 0.8
N_TABLES = 16


def _vec_of(i: int) -> np.ndarray:
    """Deterministic per-id vector — recomputable executor-side, so the
    probe never ships a 200k-row LocalRelation from the driver (the
    first probe draft did, and driver serialization dominated every
    measurement it was supposed to take of the gate)."""
    return np.random.default_rng(1_000_003 * i + 7).standard_normal(DIM)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    import pandas as pd
    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_spark.operators import similarity
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("embedding-gate-probe")
    spark.range(64, numPartitions=8).count()  # warm the JVM

    def _gen(src_col: str):
        def g(it):
            for c in it:
                yield pd.DataFrame(
                    {
                        "vec_id": c["vec_id"],
                        "embedding": [list(_vec_of(int(i))) for i in c[src_col]],
                    }
                )

        return g

    def hist_df(n: int):
        return (
            spark.range(n, numPartitions=32)
            .select(F.col("id").alias("vec_id"), F.col("id").alias("src"))
            .mapInPandas(_gen("src"), "vec_id long, embedding array<double>")
        )

    results = {}
    for label, n_hist in (("1x", HISTORY_BASE), (f"{mult}x", HISTORY_BASE * mult)):
        # each scale is its own DEPLOYMENT: a sidecar's plane count is
        # fixed for its life and sized for ITS corpus by the production
        # rule — that is what holds bucket occupancy (and so candidate
        # volume per arrival) ~constant as the corpus grows.  Sizing
        # both scales for the larger corpus instead (an early draft)
        # makes 1x under-occupied and the comparison measure the
        # occupancy mismatch, not the gate: on this fixture every
        # background vector is random, so candidates ARE batch x 16 x
        # occupancy — the exact quantity the plane rule controls.
        n_planes = similarity.lsh_planes_for_corpus(n_hist)
        # sidecar simulation: postings + vectors land in parquet per
        # accepted epoch (the pipeline's emb_post/emb_vec index dirs)
        post_dir = f"/tmp/embedding_gate_probe/post_{label}"
        vec_dir = f"/tmp/embedding_gate_probe/vec_{label}"
        hist_df(n_hist).write.mode("overwrite").parquet(vec_dir)
        hist = spark.read.parquet(vec_dir)
        t0 = time.perf_counter()
        similarity.embedding_lsh_postings(
            hist, DIM, n_tables=N_TABLES, n_planes=n_planes
        ).write.mode("overwrite").parquet(post_dir)
        t_index_build = round(time.perf_counter() - t0, 2)

        # batch: fresh vectors + planted near-dups of history (cos~0.99,
        # built executor-side from the planted ids' deterministic vectors)
        stride = n_hist // PLANTED
        fresh = spark.range(BATCH - PLANTED, numPartitions=8).select(
            (F.col("id") + 10_000_000).alias("vec_id"),
            (F.col("id") + 777_000_000).alias("src"),  # disjoint vector space
        )

        def _gen_planted(it):
            for c in it:
                vecs = []
                for new_id in c["vec_id"]:
                    j = int(new_id) - 20_000_000
                    rng = np.random.default_rng(31 * j + 5)
                    vecs.append(
                        list(_vec_of(j * stride) + rng.standard_normal(DIM) * 0.02)
                    )
                yield pd.DataFrame({"vec_id": c["vec_id"], "embedding": vecs})

        planted = (
            spark.range(PLANTED, numPartitions=4)
            .select((F.col("id") + 20_000_000).alias("vec_id"))
            .mapInPandas(_gen_planted, "vec_id long, embedding array<double>")
        )
        batch = (
            fresh.mapInPandas(_gen("src"), "vec_id long, embedding array<double>")
            .unionByName(planted)
            .cache()
        )
        batch.count()

        posting = spark.read.parquet(post_dir)
        vecs = spark.read.parquet(vec_dir)
        t0 = time.perf_counter()
        pairs = similarity.incremental_embedding_near_dup_pairs(
            posting,
            vecs,
            batch,
            DIM,
            threshold=THRESHOLD,
            n_tables=N_TABLES,
            n_planes=n_planes,
            max_bucket_size=10_000,
        ).cache()
        n_pairs = pairs.count()
        t_gate = round(time.perf_counter() - t0, 2)
        n_planted_found = (
            pairs.filter(
                (F.col("id_a") < 10_000_000) & (F.col("id_b") >= 20_000_000)
            )
            .select("id_b")
            .distinct()
            .count()
        )

        # contrast: what a sidecar-less gate pays — re-signature history
        t0 = time.perf_counter()
        similarity.embedding_lsh_postings(
            hist, DIM, n_tables=N_TABLES, n_planes=n_planes
        ).count()
        t_rehash = round(time.perf_counter() - t0, 2)

        pairs.unpersist()
        batch.unpersist()
        results[label] = {
            "n_history": n_hist,
            "n_planes": n_planes,
            "sec_index_build_once": t_index_build,
            "sec_gate": t_gate,
            "sec_rehash_history_baseline": t_rehash,
            "verified_pairs": n_pairs,
            "planted_found": n_planted_found,
            "planted_total": PLANTED,
        }
    spark.stop()

    big = results[f"{mult}x"]
    ok_recall = all(r["planted_found"] == PLANTED for r in results.values())
    ok_cost = big["sec_gate"] <= 2.0 * results["1x"]["sec_gate"]
    record = {
        "ts": time.time(),
        "kind": "embedding_gate_probe",
        "batch": BATCH,
        "planted": PLANTED,
        "threshold": THRESHOLD,
        "results": results,
        "pass": ok_recall and ok_cost,
        "note": (
            "Arrival-time embedding gate vs history sizes: per-activation "
            "cost must track the BATCH (gate(10x) <= 2x gate(1x)); history "
            "is touched only through the posting + vector sidecars, never "
            "re-hashed (the rehash baseline shows what that would cost and "
            "grows linearly with history).  16x12-plane LSH -> planted "
            "recall total at cos~0.99."
        ),
    }
    with open(REPO / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
