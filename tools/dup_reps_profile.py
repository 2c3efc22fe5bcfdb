"""Stage-level 10x profile of dup_cluster_representatives (r7 verdict
item 5: its whole-query 10x ratio, 4.23x vs the 12.5x linear bar, was
the highest of the round-7 additions — attribute the superlinearity).

The query is a three-stage composition; this probe times each stage in
isolation at 1x and 10x on the same sparse-regime synthetic corpora as
tools/scale_probe.py, pinning each stage's input so a stage's time
cannot leak into the next:

    1. pairs    — minhash_lsh_pairs (banded posting join + verify)
    2. clusters — near_dup_clusters (CC + cluster-size window)
    3. reps     — cluster_representatives (join + argmax aggregate)

Candidate attributions it can separate:
- CC fast-path threshold crossover: at sf0.1 the dup graph is ~512
  symmetrized edges and 10x is ~5k — BOTH far under the 200k default,
  so a crossover would show as stage-2-only superlinearity with the
  edge counts recorded alongside (it cannot be a threshold effect if
  both runs take the same path).
- banded-join skew or verification growth: stage-1-only.
- fixed per-query overhead amortizing differently: sub-linear stages.

Appends a ``"kind": "dup_reps_profile"`` record to PROGRESS.jsonl.

Usage: python tools/dup_reps_profile.py [multiplier]   (default 10)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scale_probe import generate, measure_base  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"


def profile(spark, docs_path: str) -> dict:
    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_spark.operators import (
        components,
        dedup,
    )

    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    docs = docs.localCheckpoint()  # scan cost out of stage 1
    n_docs = docs.count()

    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).localCheckpoint()
    n_pairs = pairs.count()
    t_pairs = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    clusters = components.near_dup_clusters(pairs).localCheckpoint()
    n_clustered = clusters.count()
    t_cc = round(time.perf_counter() - t0, 2)

    qual = docs.select(
        "doc_id",
        (
            F.length("text") - F.length(F.regexp_replace("text", "[a-zA-Z]", ""))
        )
        .cast("long")
        .alias("quality"),
    )
    t0 = time.perf_counter()
    n_reps = components.cluster_representatives(clusters, qual).count()
    t_reps = round(time.perf_counter() - t0, 2)

    return {
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        "sym_edges": 2 * n_pairs,
        "n_clustered": n_clustered,
        "n_reps": n_reps,
        "sec_pairs": t_pairs,
        "sec_cc": t_cc,
        "sec_reps": t_reps,
        "sec_total": round(t_pairs + t_cc + t_reps, 2),
    }


def main() -> None:
    multiplier = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    stats = measure_base(duckdb.connect())
    out_dir = Path("/tmp/dup_reps_profile_corpus")
    generate(stats, multiplier, out_dir, grow_vocab=True)

    spark = get_spark("dup-reps-profile")
    base = profile(spark, f"{BASE_SF}/documents.parquet")
    big = profile(spark, str(out_dir / "documents.parquet"))
    spark.stop()

    ratios = {
        k: round(big[f"sec_{k}"] / max(base[f"sec_{k}"], 0.01), 2)
        for k in ("pairs", "cc", "reps", "total")
    }
    fastpath_both = (
        base["sym_edges"] <= 200_000 and big["sym_edges"] <= 200_000
    )
    # attribution: name the stage with the highest ratio
    worst = max(("pairs", "cc", "reps"), key=lambda k: ratios[k])
    record = {
        "ts": time.time(),
        "kind": "dup_reps_profile",
        "multiplier": multiplier,
        "base": base,
        "bigger": big,
        "stage_ratios": ratios,
        "cc_fastpath_at_both_scales": fastpath_both,
        "worst_stage": worst,
        "linear_bar": round(1.25 * multiplier, 1),
        "pass": ratios["total"] <= 1.25 * multiplier,
        "note": (
            "Per-stage 10x ratios with pinned stage inputs; edge counts "
            "recorded so a CC fast-path threshold crossover is directly "
            "checkable (both scales under 200k symmetrized edges -> same "
            "code path, so any stage-2 superlinearity is NOT a crossover)."
        ),
    }
    with open(REPO / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
