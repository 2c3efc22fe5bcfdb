"""LSH semantic-dedup recall + candidate-count probe (r7 verdict item 2).

``semantic_dedup_clusters_lsh`` is the 100 TB path the exact
triangle-blocked operator's docstring hands off to past ~1e7 vectors.
Its correctness gate is oracle-EXACT (the md5-derived hyperplanes are
replicated in the DuckDB SQL), but exactness-vs-its-own-oracle says
nothing about RECALL vs the exact all-pairs operator — that is what
this probe records, at the driver corpus and at a 10x synthetic corpus,
together with the candidate-volume audit that shows the pair join is
O(bucket co-occupancy), not O(n^2).

Measured through the PUBLIC operators only (``lsh_dedup_candidates`` is
the same generator the cluster query executes), so the probe cannot
drift from the implementation — the anti-drift contract of
tools/ann_recall_probe.py.

What to expect:
- driver corpus (500 vecs, every true pair at cos 0.45-0.48, i.e. AT
  the threshold — the hardest regime for LSH): theoretical pair recall
  at 16 tables x 3 planes is 1-(1-p^3)^16 with p = 1 - theta/pi ~ 0.65,
  ~0.995; the sf0.1 corpus showed 263/264 clustered vectors.
- 10x synthetic (mixture-of-Gaussians, intra-cluster cos ~0.86 — the
  REALISTIC semantic-dup regime): per-pair recall ~1.0.
- candidates: at the toy bucket space (2^3 per table) occupancy is
  dense, so candidate counts approach n^2/2 — recorded honestly; the
  production knob is n_planes ~ log2(corpus / target bucket size),
  which keeps candidates ~ true-near-dup volume.  The probe records
  candidates at n_planes=3 AND at a 10x-appropriate n_planes=6 to show
  the knob working.

Appends a ``"kind": "lsh_dedup_probe"`` record to PROGRESS.jsonl.

Usage: python tools/lsh_dedup_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DIM = 64
THRESHOLD = 0.45
N_TABLES, N_PLANES = 16, 3  # the registered-query settings


def generate(spark, n: int, seed: int = 7):
    """Mixture-of-Gaussians corpus (16 clusters) — same generator as
    tools/ann_recall_probe.py; intra-cluster cosine ~0.86."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((16, DIM)) * 2.0
    assign = rng.integers(0, 16, size=n)
    vecs = centers[assign] + rng.standard_normal((n, DIM)) * 0.8
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def clustered_sets(df):
    rows = df.collect()
    return {r["vec_id"] for r in rows}, {
        r["vec_id"]: r["component"] for r in rows
    }


def partitions_agree_on(ids, a: dict, b: dict) -> bool:
    """Same-cluster relation restricted to ``ids``: labels themselves
    may differ after a recall miss (losing a cluster's min id renames
    the survivors' component), so compare the induced PARTITIONS, not
    the label values (review finding r8 — the original check's two
    operands were the same subset predicate)."""

    def groups(lbl):
        return frozenset(
            frozenset(i for i in ids if lbl[i] == c) for c in {lbl[i] for i in ids}
        )

    return groups(a) == groups(b)


def main() -> None:
    from real_time_event_driven_data_pipeline_spark.operators import similarity
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("lsh-dedup-probe")
    out = {}

    # --- driver corpus: the at-threshold adversarial regime ---------
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    n = emb.count()
    t0 = time.perf_counter()
    lsh_ids, lsh_labels = clustered_sets(
        similarity.semantic_dedup_clusters_lsh(
            emb, dim=DIM, threshold=THRESHOLD, n_tables=N_TABLES, n_planes=N_PLANES
        )
    )
    t_lsh = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    ex_ids, ex_labels = clustered_sets(
        similarity.semantic_dedup_clusters(emb, threshold=THRESHOLD)
    )
    t_exact = round(time.perf_counter() - t0, 2)
    n_cand = similarity.lsh_dedup_candidates(
        emb, DIM, n_tables=N_TABLES, n_planes=N_PLANES
    ).count()
    out["driver_sf0.1"] = {
        "n_corpus": n,
        "exact_clustered": len(ex_ids),
        "lsh_clustered": len(lsh_ids),
        "vector_recall": round(len(lsh_ids & ex_ids) / max(len(ex_ids), 1), 3),
        "partitions_agree_on_common": partitions_agree_on(
            lsh_ids & ex_ids, lsh_labels, ex_labels
        ),
        "candidates": n_cand,
        "all_pairs": n * (n - 1) // 2,
        "sec_lsh": t_lsh,
        "sec_exact": t_exact,
    }
    emb.unpersist()

    # --- 10x synthetic: the realistic tight-dup regime --------------
    # one corpus, one exact baseline; then three LSH settings against
    # it — the test-scale p3, the docstring's hand-picked p6, and the
    # AUTO-SIZED count from lsh_planes_for_corpus (r8 verdict item 4:
    # sizing is now code; the probe records the code's own choice).
    emb = generate(spark, 5000).repartition(32).cache()
    n = emb.count()
    t0 = time.perf_counter()
    ex_ids, _ = clustered_sets(
        similarity.semantic_dedup_clusters(emb, threshold=THRESHOLD, n_blocks=16)
    )
    sec_exact_10x = round(time.perf_counter() - t0, 2)
    auto_planes = similarity.lsh_planes_for_corpus(n)
    for label, planes in (
        ("10x_p3", 3),
        ("10x_p6", 6),
        ("10x_auto", None),
    ):
        t0 = time.perf_counter()
        lsh_ids, _ = clustered_sets(
            similarity.semantic_dedup_clusters_lsh(
                emb, dim=DIM, threshold=THRESHOLD, n_tables=N_TABLES, n_planes=planes
            )
        )
        t_lsh = round(time.perf_counter() - t0, 2)
        n_cand = similarity.lsh_dedup_candidates(
            emb, DIM, n_tables=N_TABLES, n_planes=planes
        ).count()
        out[label] = {
            "n_corpus": n,
            "n_planes": auto_planes if planes is None else planes,
            "auto_sized": planes is None,
            "lsh_clustered": len(lsh_ids),
            "exact_clustered": len(ex_ids),
            "vector_recall": round(len(lsh_ids & ex_ids) / max(len(ex_ids), 1), 3),
            "candidates": n_cand,
            "all_pairs": n * (n - 1) // 2,
            "candidate_fraction": round(n_cand / (n * (n - 1) / 2), 4),
            "sec_lsh": t_lsh,
            "sec_exact": sec_exact_10x,
        }
    emb.unpersist()
    spark.stop()

    recall_ok = (
        out["driver_sf0.1"]["vector_recall"] >= 0.95
        and out["10x_p3"]["vector_recall"] >= 0.95
        and out["10x_auto"]["vector_recall"] >= 0.95
    )
    knob_works = out["10x_p6"]["candidates"] < out["10x_p3"]["candidates"]
    # the r8 verdict item-4 done-bar: the CODE's own sizing keeps the
    # pair join sparse while holding recall
    auto_ok = out["10x_auto"]["candidate_fraction"] <= 0.3
    record = {
        "ts": time.time(),
        "kind": "lsh_dedup_probe",
        "settings": {
            "n_tables": N_TABLES,
            "n_planes": N_PLANES,
            "threshold": THRESHOLD,
        },
        "results": out,
        "recall_holds": recall_ok,
        "planes_knob_reduces_candidates": knob_works,
        "auto_sizing_sparse": auto_ok,
        "pass": recall_ok and knob_works and auto_ok,
        "note": (
            "Recall vs the exact all-pairs operator at the driver corpus "
            "(at-threshold pairs, adversarial) and a 10x realistic corpus; "
            "candidate volume recorded against n(n-1)/2, with the n_planes "
            "density knob shown cutting candidates at 10x and the "
            "lsh_planes_for_corpus auto-sizing holding candidate fraction "
            "<= 0.3 at recall >= 0.95."
        ),
    }
    with open(REPO / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
