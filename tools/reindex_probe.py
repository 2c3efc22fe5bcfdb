"""Embedding-LSH re-index probe (r9 verdict item 2, measurement half):
at a FIXED plane count, bucket occupancy — and the arrival gate's
per-epoch candidate volume — grows linearly with accepted history, so
a sidecar sized for a 20k-vector target quietly degrades as history
reaches 200k.  ``reindex_embedding_lsh_index`` is the migration path
(re-hash accepted vectors once, swap, restamp); this probe pins that
the migration actually RESTORES the gate's cost.

Method (the ``embedding_gate_probe`` fixture, one deployment instead
of two): 200k-vector history indexed at the plane count the production
rule picks for a 20k corpus (the outgrown sizing), a 2k batch with 100
planted cos~0.99 dups of history, then the same batch after re-hashing
the history at the plane count sized for the ACTUAL 200k corpus — the
exact work ``reindex_embedding_lsh_index`` performs on the vector
sidecar.

Pass criteria (plan-determined first — reproducible on a co-tenant
box):
- planted recall total BEFORE and AFTER (the migration must not lose
  pairs; analytic miss probability ~1e-9 at both settings);
- candidate pairs AFTER <= half of BEFORE (occupancy 200k/2^9 ~ 390
  vs 200k/2^12 ~ 49 predicts ~8x; the bar is deliberately loose);
- gate wall AFTER < gate wall BEFORE (min of 2 runs each, reported
  but informational next to the byte-determined candidate counts).

Also records the one-time re-hash cost (amortized across every later
epoch) and the verified-pair sets' equality before/after (the
exactness claim: the index only generates candidates; verification
decides).

Appends a ``"kind": "reindex_probe"`` record to PROGRESS.jsonl.

Usage: python tools/reindex_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TARGET_SIZED_FOR = 20_000  # what the sidecar was originally sized for
HISTORY = 200_000  # what history has grown to
BATCH = 2_000
PLANTED = 100
DIM = 64
THRESHOLD = 0.8
N_TABLES = 16


def _vec_of(i: int) -> np.ndarray:
    return np.random.default_rng(1_000_003 * i + 7).standard_normal(DIM)


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_spark.operators import similarity
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("reindex-probe")
    spark.range(64, numPartitions=8).count()

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

    vec_dir = "/tmp/reindex_probe/vec"
    (
        spark.range(HISTORY, numPartitions=32)
        .select(F.col("id").alias("vec_id"), F.col("id").alias("src"))
        .mapInPandas(_gen("src"), "vec_id long, embedding array<double>")
        .write.mode("overwrite")
        .parquet(vec_dir)
    )
    hist = spark.read.parquet(vec_dir)

    # batch: fresh vectors + planted near-dups of history (cos~0.99)
    stride = HISTORY // PLANTED
    fresh = spark.range(BATCH - PLANTED, numPartitions=8).select(
        (F.col("id") + 10_000_000).alias("vec_id"),
        (F.col("id") + 777_000_000).alias("src"),
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

    results = {}
    pair_sets = {}
    for label, n_planes in (
        ("outgrown", similarity.lsh_planes_for_corpus(TARGET_SIZED_FOR)),
        ("reindexed", similarity.lsh_planes_for_corpus(HISTORY)),
    ):
        post_dir = f"/tmp/reindex_probe/post_{label}"
        t0 = time.perf_counter()
        similarity.embedding_lsh_postings(
            hist, DIM, n_tables=N_TABLES, n_planes=n_planes
        ).write.mode("overwrite").parquet(post_dir)
        t_hash = round(time.perf_counter() - t0, 2)
        posting = spark.read.parquet(post_dir)

        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = similarity.incremental_embedding_near_dup_pairs(
                posting,
                hist,
                batch,
                DIM,
                threshold=THRESHOLD,
                n_tables=N_TABLES,
                n_planes=n_planes,
                max_bucket_size=10_000,
            ).cache()
            n_pairs = pairs.count()
            walls.append(round(time.perf_counter() - t0, 2))
            if _ == 0:
                n_planted_found = (
                    pairs.filter(
                        (F.col("id_a") < 10_000_000) & (F.col("id_b") >= 20_000_000)
                    )
                    .select("id_b")
                    .distinct()
                    .count()
                )
                pair_sets[label] = {
                    (r.id_a, r.id_b) for r in pairs.collect()
                }
            pairs.unpersist()
        # candidate volume pre-verification: re-run just the candidate
        # stage (deterministic; the cost driver the plane count governs)
        post_new = similarity.embedding_lsh_postings(
            batch, DIM, id_col="vec_id", vec_col="embedding",
            n_tables=N_TABLES, n_planes=n_planes,
        ).withColumnsRenamed({"vec_id": "_id"})
        new_keys = post_new.select("bucket").dropDuplicates()
        probed = posting.withColumnsRenamed({"vec_id": "_id"}).unionByName(
            post_new
        ).join(F.broadcast(new_keys), "bucket", "left_semi")
        n_cand = (
            probed.withColumnsRenamed({"_id": "_ida"})
            .join(post_new.withColumnsRenamed({"_id": "_idb"}), "bucket")
            .filter(F.col("_ida") != F.col("_idb"))
            .select(
                F.least("_ida", "_idb").alias("a"),
                F.greatest("_ida", "_idb").alias("b"),
            )
            .dropDuplicates()
            .count()
        )
        results[label] = {
            "n_planes": n_planes,
            "sec_hash_history_once": t_hash,
            "sec_gate_min2": min(walls),
            "sec_gate_runs": walls,
            "candidate_pairs": n_cand,
            "verified_pairs": n_pairs,
            "planted_found": n_planted_found,
            "planted_total": PLANTED,
        }
    spark.stop()

    before, after = results["outgrown"], results["reindexed"]
    ok_recall = (
        before["planted_found"] == PLANTED and after["planted_found"] == PLANTED
    )
    ok_cand = after["candidate_pairs"] <= before["candidate_pairs"] / 2
    ok_wall = after["sec_gate_min2"] < before["sec_gate_min2"]
    ok_pairs_equal = pair_sets["outgrown"] == pair_sets["reindexed"]
    record = {
        "ts": time.time(),
        "kind": "reindex_probe",
        "history": HISTORY,
        "sized_for": TARGET_SIZED_FOR,
        "batch": BATCH,
        "planted": PLANTED,
        "threshold": THRESHOLD,
        "results": results,
        "verified_pairs_identical": ok_pairs_equal,
        "pass": ok_recall and ok_cand and ok_wall and ok_pairs_equal,
        "note": (
            "Gate cost at 200k history under the OUTGROWN plane sizing "
            "(sized for 20k) vs after the reindex re-hash at the "
            "200k-sized plane count — the exact work "
            "reindex_embedding_lsh_index performs.  Pass rests on the "
            "plan-determined candidate count (<= 1/2) and total planted "
            "recall on both sides, with identical verified pair sets "
            "(the index only proposes; verification decides); walls "
            "reported as min-of-2."
        ),
    }
    with open(REPO / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
