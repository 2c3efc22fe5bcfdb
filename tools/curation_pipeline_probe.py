"""Full curation-pipeline composition probe (r8 verdict item 7b): every
per-gate design has its own probe, but the COMPOSITION — quality +
decontamination + exact-dup + text near-dup + image near-dup +
embedding near-dup + cluster labels + export manifest, all on at once —
had never been cost-pinned end to end.  This runs the real pipeline
(``run_available_now`` activations, the driver contract's streaming
path) for N epochs of a fixed-size batch and records per-epoch wall
time while accepted history grows ~N-fold.

Each epoch past the first plants one duplicate per gate family against
EARLIER-epoch history — exact copy, one-token text mutation (shingle
near-dup), a beyond-grid character flip (dHash dup), a same-vector
fresh-text doc (semantic dup) — plus one eval-contaminated doc, so the
probe simultaneously re-verifies that every gate keeps firing against
deep history, not just the previous epoch.

Pass = (a) every epoch's stats ladder matches the planted counts
exactly (arrived -> quality -> decontam -> exact -> accepted drops 1 at
each planted stage); (b) late-epoch PER-EPOCH SHUFFLE BYTES <= 2x
early-epoch — the plan + data determined cost signal, reproducible on
a co-tenant box (this criterion caught the PPJoin df/prefix stages
re-shuffling the full posting index each epoch); and (c) late-epoch
MIN wall <= 2x early-epoch MIN wall — min, not mean, because co-tenant
spikes are non-monotone (an epoch can take 8x its neighbors while
LATER epochs with MORE history drop back; a genuine history term
cannot), the same noise argument as bench.py's per-query min.

Appends a ``"kind": "curation_pipeline_probe"`` record to
PROGRESS.jsonl.

Usage: python tools/curation_pipeline_probe.py [n_epochs] [batch]
       (defaults 16 epochs x 250 docs)
"""

from __future__ import annotations

import json
import random
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# dim 64, not 16: at dim 16 a RANDOM pair clears cos 0.9 with ~1e-5
# probability — ~2-3 false "semantic dups" per 250k batch-x-history
# comparisons, which breaks the exact ladder assertion; at dim 64 the
# same tail is ~1e-23 (the first calibration run caught this)
DIM = 64
STOPWORDS = "the a and of to in is it that for".split()

# HIGH-ENTROPY token vocabularies: with "word{N}" tokens, 4 of every
# ~6 chars were the constant prefix, so the stub dHash (which samples
# a sparse byte grid) collided at d=0 between unrelated docs about
# once per ~5e5 pairs — one phantom image_near_dup drop per full run
# (epoch 9 of the first 16-epoch run caught exactly one).  Random
# 6-letter tokens spread the sampled bytes over the full alphabet.
# Eval words are 7 LETTERS — disjoint from fresh tokens by length, so
# no accidental k-gram contamination overlap, by construction.
_w = random.Random(424242)
WORDS = ["".join(_w.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6)) for _ in range(600)]
EVAL_WORDS = ["".join(_w.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(7)) for _ in range(400)]


def _doc(rng, n=40):
    """Random doc with a GUARANTEED stopword cadence (every 7th token):
    the quality gate's stopword-ratio floor must never reject a fresh
    doc, or the probe's exact ladder assertion turns flaky."""
    return " ".join(
        rng.choice(STOPWORDS) if i % 7 == 3 else rng.choice(WORDS)
        for i in range(n)
    )


def _eval_doc(rng, n=40):
    """Eval-suite doc on a DISJOINT vocab (no accidental k-gram overlap
    with fresh docs), stopwords every 3rd token but never adjacent, so
    every 3-gram contains >= 2 eval-only words AND the quality gate
    passes."""
    return " ".join(
        rng.choice(STOPWORDS) if i % 3 == 2 else rng.choice(EVAL_WORDS)
        for i in range(n)
    )


def _image_dup_of(text, rng):
    """A dHash-IDENTICAL but shingle-DISJOINT rewrite of ``text``: the
    stub decoder reads byte values at an 8x9 nearest-neighbor grid of
    the payload (multimodal.decode_image_stub + dhash_bands), so
    preserving length, spaces, stopword tokens (quality's ratio floor),
    and the sampled byte positions keeps the dHash bit-identical while
    scrambling every other character destroys the token shingles — the
    one planted dup ONLY the image gate can catch, even with the text
    near-dup gate fully on."""
    side = max(1, int(len(text) ** 0.5))
    rs = [(r * side) // 8 for r in range(8)]
    cs = [(c * side) // 9 for c in range(9)]
    sampled = {r * side + c for r in rs for c in cs}
    out, pos = [], 0
    for tok in text.split(" "):
        keep = tok in STOPWORDS
        for k, ch in enumerate(tok):
            if keep or (pos + k) in sampled:
                out.append(ch)
            else:
                out.append(rng.choice("abcdefghijklmnopqrstuvwxyz"))
        out.append(" ")
        pos += len(tok) + 1
    return "".join(out[:-1])


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 250

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_spark.session import get_spark
    from real_time_event_driven_data_pipeline_spark.streaming.curation import (
        CorpusCurationPipeline,
    )

    spark = get_spark("curation-pipeline-probe")
    spark.range(64, numPartitions=8).count()

    root = Path("/tmp/curation_pipeline_probe")
    shutil.rmtree(root, ignore_errors=True)
    (root / "landing").mkdir(parents=True)

    # deterministic per-doc embedding, computed executor-side from the
    # id; planted semantic dups override via id aliasing (see below)
    def _vec_of(i: int) -> list[float]:
        return list(np.random.default_rng(7_919 * i + 3).standard_normal(DIM))

    def _embedder(df):
        def g(it):
            for c in it:
                yield pd.DataFrame(
                    {
                        "doc_id": c["doc_id"],
                        # semantic-dup ids (9xxx block) alias an earlier
                        # doc's vector space: vec(9000e+j) == vec(base)+eps
                        "embedding": [
                            _vec_of(int(i) if int(i) < 9_000_000 else int(i) % 1000)
                            for i in c["doc_id"]
                        ],
                    }
                )

        emb = df.select("doc_id").mapInPandas(
            g, "doc_id long, embedding array<double>"
        )
        return df.join(emb, "doc_id", "left")

    eval_rng = random.Random(99)
    eval_docs = spark.createDataFrame(
        [(10_000 + i, _eval_doc(eval_rng)) for i in range(20)],
        "doc_id long, text string",
    )

    pipe = CorpusCurationPipeline(
        spark,
        landing_dir=str(root / "landing"),
        corpus_dir=str(root / "corpus"),
        quarantine_dir=str(root / "quarantine"),
        checkpoint_dir=str(root / "ckpt"),
        near_dup_threshold=0.5,
        eval_docs=eval_docs,
        image_gate=True,
        # d=0: the planted image dup is dHash-IDENTICAL by construction,
        # while fixture texts land false pairs at d in {2,3} at ~4e-6 of
        # pairs (measured over 500k) — at d<=3 that is ~2 phantom image
        # drops per epoch breaking the exact ladder; at d=0 the expected
        # false count over the whole run is ~0.03
        image_max_dist=0,
        embedding_gate=True,
        embedding_dim=DIM,
        embedding_threshold=0.9,
        embedding_n_planes=6,
        embedder=_embedder,
        cluster_labels=True,
        manifest_token_budget=5_000,
        # per-STAGE shuffle attribution (r9 verdict item 3): the probe
        # must NAME the owner of any per-epoch cost slope, not just
        # detect one
        instrument_io=True,
    )

    # per-epoch executor-counter deltas (the shared bench.py helper):
    # shuffle bytes are plan+data determined, GC time exposes memory
    # pressure — together they adjudicate a wall-time ramp as real
    # growth (bytes/GC ramp too) vs co-tenant noise (flat bytes, flat GC)
    from real_time_event_driven_data_pipeline_spark.observability import (
        executor_io_totals,
    )

    def _counters():
        _, w, g = executor_io_totals(spark)
        return w, g

    rng = random.Random(5)
    eval_texts = [r.text for r in eval_docs.collect()]
    history: dict[int, str] = {}
    walls, ladders, epoch_io = [], [], []
    next_id = 0
    for epoch in range(n_epochs):
        rows = []
        fresh_n = batch_n if epoch == 0 else batch_n - 5
        for _ in range(fresh_n):
            rows.append((next_id, _doc(rng), "src"))
            next_id += 1
        if epoch:
            # plant one dup per gate family vs a RANDOM earlier epoch
            victims = rng.sample(sorted(history), 4)
            rows.append((1_000_000 + epoch, history[victims[0]], "src"))  # exact
            toks = history[victims[1]].split()
            toks[7] = "mutated"
            rows.append((2_000_000 + epoch, " ".join(toks), "src"))  # text near
            rows.append(
                (3_000_000 + epoch, _image_dup_of(history[victims[2]], rng), "src")
            )  # image dup (dHash-identical, shingle-disjoint)
            # semantic dup: FRESH text, embedding aliased to victims[3]
            rows.append(
                (9_000_000 + victims[3], _doc(rng), "src")
            )  # embedding dup (id % 1000 == victim id -> same vector)
            # eval contamination: an eval doc verbatim
            rows.append((4_000_000 + epoch, rng.choice(eval_texts), "src"))
        pd.DataFrame(rows, columns=["doc_id", "text", "source"]).to_csv(
            root / "landing" / f"b{epoch}.csv", index=False
        )
        w0, g0 = _counters()
        t0 = time.perf_counter()
        pipe.run_available_now()
        walls.append(round(time.perf_counter() - t0, 2))
        w1, g1 = _counters()
        epoch_io.append({"shuffle_write_bytes": w1 - w0, "gc_ms": g1 - g0})
        ladders.append(dict(pipe.stats[-1]))
        for did, text, _ in rows[:fresh_n]:
            if did < 1000:  # only small ids can be embedding-dup victims
                history[did] = text
        print(f"# epoch {epoch}: {walls[-1]}s {ladders[-1]}", file=sys.stderr)

    spark.stop()

    # expected ladder for every planted epoch: arrived = batch, quality
    # passes all, decontam drops 1, exact drops 1, near-dup gates drop 3
    ladder_ok = all(
        s["arrived"] == batch_n
        and s["quality_pass"] == batch_n
        and s["after_decontam"] == batch_n - 1
        and s["after_exact"] == batch_n - 2
        and s["accepted"] == batch_n - 5
        for s in ladders[1:]
    )
    early = sum(walls[1:4]) / 3
    late = sum(walls[-3:]) / 3
    early_min, late_min = min(walls[1:4]), min(walls[-3:])
    sh = [e["shuffle_write_bytes"] for e in epoch_io]
    sh_early, sh_late = sum(sh[1:4]) / 3, sum(sh[-3:]) / 3
    shuffle_flat = sh_late <= 2.0 * sh_early
    wall_flat = late_min <= 2.0 * early_min

    # per-stage slope attribution (r9 verdict item 3): for every
    # instrumented stage, early-vs-late mean shuffle-write delta; the
    # attribution names each stage's share of the TOTAL epoch slope so
    # a residual creep can be pinned on its owner (probed-bucket
    # occupancy? label sidecar? manifest offset read?).  Shares are of
    # the summed positive stage deltas (a stage can shrink).
    stage_names = sorted({k for s in ladders if "stage_io" in s for k in s["stage_io"]})
    stage_rows = {}
    raw_delta = {}  # raw BYTES — shares must not inherit MB rounding
    for name in stage_names:
        per_epoch = [s["stage_io"].get(name, 0) for s in ladders]
        e_mean = sum(per_epoch[1:4]) / 3
        l_mean = sum(per_epoch[-3:]) / 3
        raw_delta[name] = l_mean - e_mean
        stage_rows[name] = {
            "early_mb": round(e_mean / 2**20, 3),
            "late_mb": round(l_mean / 2**20, 3),
            "delta_mb": round((l_mean - e_mean) / 2**20, 3),
        }
    total_delta = sum(max(0.0, d) for d in raw_delta.values())
    for name, row in stage_rows.items():
        row["share_of_growth"] = round(
            max(0.0, raw_delta[name]) / total_delta, 3
        ) if total_delta else 0.0
    record = {
        "ts": time.time(),
        "kind": "curation_pipeline_probe",
        "n_epochs": n_epochs,
        "batch": batch_n,
        "walls_sec": walls,
        "epoch_io": epoch_io,
        "ladders": ladders,
        "early_mean_sec": round(early, 2),
        "late_mean_sec": round(late, 2),
        "early_min_sec": early_min,
        "late_min_sec": late_min,
        "shuffle_early_mb": round(sh_early / 2**20, 1),
        "shuffle_late_mb": round(sh_late / 2**20, 1),
        "gates_ladder_exact": ladder_ok,
        "shuffle_per_epoch_flat": shuffle_flat,
        "wall_min_flat": wall_flat,
        "stage_attribution": stage_rows,
        "pass": ladder_ok and shuffle_flat and wall_flat,
        "note": (
            "Full composition (quality + decontam + exact + text/image/"
            "embedding near-dup gates + cluster labels + manifest) run "
            "through run_available_now for N epochs; per-epoch cost must "
            "track the batch as history grows N-fold — gated on the "
            "plan-determined shuffle-byte slope plus min-wall (co-tenant "
            "spikes are non-monotone; a real history term cannot drop "
            "back), and every planted dup per gate family must be caught "
            "against arbitrarily old history."
        ),
    }
    with open(REPO / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    out = dict(record)
    out.pop("ladders")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
