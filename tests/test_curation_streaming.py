"""Streaming corpus curation: per-arrival quality gate, exact-dup gate
against history, and incremental near-dup gate — history never changes
retroactively, rejects carry reasons."""

import random

import pytest
from pyspark.sql import functions as F

from real_time_event_driven_data_pipeline_spark.streaming.curation import (
    CorpusCurationPipeline,
)

VOCAB = [f"word{i}" for i in range(60)] + list("the a and of to in is it that for".split())


def _doc(rng, n=40):
    # enough English stopwords to pass the stopword-ratio gate
    toks = [rng.choice(VOCAB) for _ in range(n)]
    return " ".join(toks)


def _write(rows, path):
    import pandas as pd

    pd.DataFrame(rows, columns=["doc_id", "text", "source"]).to_csv(path, index=False)


@pytest.fixture()
def pipe(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    return (
        CorpusCurationPipeline(
            spark,
            landing_dir=str(landing),
            corpus_dir=str(tmp_path / "corpus"),
            quarantine_dir=str(tmp_path / "quarantine"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        ),
        str(landing),
    )


def test_curation_pipeline_gates_across_activations(spark, pipe):
    pipe, landing = pipe
    rng = random.Random(7)
    base = {i: _doc(rng) for i in range(1, 9)}

    # activation 1: 8 clean docs + 1 too-short (quality) + 1 exact dup
    # of doc 3 + 1 near-dup of doc 5 (one token changed) — all in-batch
    near5 = base[5].split()
    near5[10] = "sentinel"
    rows1 = (
        [(i, t, "src") for i, t in base.items()]
        + [(20, "too short", "src")]
        + [(21, base[3], "src")]
        + [(22, " ".join(near5), "src")]
    )
    _write(rows1, f"{landing}/batch1.csv")
    pipe.run_available_now()
    s = pipe.stats[-1]
    assert (s["arrived"], s["quality_pass"]) == (11, 10)
    assert s["after_exact"] == 9  # 21 dropped (dup of 3)
    assert s["accepted"] == 8  # 22 dropped (near-dup of 5)

    corpus = {r.doc_id for r in spark.read.parquet(pipe.corpus_dir).collect()}
    assert corpus == set(base)
    reasons = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(pipe.quarantine_dir).collect()
    }
    assert reasons == {20: "quality", 21: "exact_dup", 22: "near_dup"}

    # activation 2: re-delivery of doc 2 (exact dup vs HISTORY), a
    # near-dup of doc 7 vs HISTORY, and one genuinely fresh doc
    near7 = base[7].split()
    near7[0] = "changed"
    rows2 = [
        (30, base[2], "src"),
        (31, " ".join(near7), "src"),
        (32, _doc(rng), "src"),
    ]
    _write(rows2, f"{landing}/batch2.csv")
    pipe.run_available_now()
    s = pipe.stats[-1]
    assert (s["arrived"], s["accepted"]) == (3, 1)

    corpus2 = {r.doc_id for r in spark.read.parquet(pipe.corpus_dir).collect()}
    assert corpus2 == set(base) | {32}  # history unchanged, 32 accepted
    reasons2 = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(pipe.quarantine_dir).collect()
    }
    assert reasons2[30] == "exact_dup" and reasons2[31] == "near_dup"

    # fingerprint sidecar is narrow (fp only) and tracks accepted rows
    fpidx = spark.read.parquet(pipe.fp_index_dir)
    assert fpidx.columns == ["fp"]
    assert fpidx.count() == len(corpus2)


def test_reliable_checkpoint_mode_same_gating(spark, tmp_path):
    """reliable_checkpoints=True routes every intra-gate pin through a
    replicated checkpoint dir (survives executor loss; ADVICE r3) and
    must gate identically to the default localCheckpoint mode."""
    landing = tmp_path / "landing"
    landing.mkdir()
    pipe = CorpusCurationPipeline(
        spark,
        landing_dir=str(landing),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        reliable_checkpoints=True,
    )
    rng = random.Random(7)
    base = {i: _doc(rng) for i in range(1, 5)}
    rows = [(i, t, "src") for i, t in base.items()] + [(9, base[1], "src")]
    _write(rows, f"{landing}/batch1.csv")

    if spark.sparkContext.getCheckpointDir() is None:
        # without a checkpoint dir the misconfiguration fails fast
        # (wrapped in the streaming query failure)
        with pytest.raises(Exception, match="setCheckpointDir"):
            pipe.run_available_now()

    spark.sparkContext.setCheckpointDir(str(tmp_path / "reliable_ckpt"))
    pipe2 = CorpusCurationPipeline(
        spark,
        landing_dir=str(landing),
        corpus_dir=str(tmp_path / "corpus2"),
        quarantine_dir=str(tmp_path / "quarantine2"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
        reliable_checkpoints=True,
    )
    pipe2.run_available_now()
    corpus = {r.doc_id for r in spark.read.parquet(pipe2.corpus_dir).collect()}
    assert corpus == set(base)
    reasons = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(pipe2.quarantine_dir).collect()
    }
    assert reasons == {9: "exact_dup"}


def test_posting_sidecar_tracks_accepted(spark, pipe):
    pipe, landing = pipe
    rng = random.Random(3)
    _write([(i, _doc(rng), "s") for i in range(1, 6)], f"{landing}/b1.csv")
    pipe.run_available_now()
    posts = spark.read.parquet(pipe.post_index_dir)
    assert set(posts.columns) == {"doc_id", "n_sh", "shingle"}
    assert {r.doc_id for r in posts.select("doc_id").distinct().collect()} == set(range(1, 6))
    # per-doc posting count equals its recorded distinct-shingle count
    bad = posts.groupBy("doc_id", "n_sh").count().filter("count != n_sh")
    assert bad.count() == 0


def test_decontamination_gate_quarantines_eval_overlap(spark, tmp_path):
    rng = random.Random(11)
    eval_text = _doc(rng)
    eval_docs = spark.createDataFrame(
        [(1000, eval_text)], "doc_id long, text string"
    )
    landing = tmp_path / "landing"
    landing.mkdir()
    pipe = CorpusCurationPipeline(
        spark,
        landing_dir=str(landing),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        eval_docs=eval_docs,
        decontam_min_hits=1,
    )
    # doc 2 embeds a verbatim eval span (>= 3 tokens); docs 1,3 clean
    leak = " ".join(eval_text.split()[5:9])
    rows = [
        (1, _doc(rng), "s"),
        (2, _doc(rng) + " " + leak, "s"),
        (3, _doc(rng), "s"),
    ]
    _write(rows, f"{landing}/b1.csv")
    pipe.run_available_now()
    s = pipe.stats[-1]
    assert s["quality_pass"] == 3 and s["after_decontam"] == 2
    assert s["accepted"] == 2
    corpus = {r.doc_id for r in spark.read.parquet(pipe.corpus_dir).collect()}
    assert corpus == {1, 3}
    reasons = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(pipe.quarantine_dir).collect()
    }
    assert reasons == {2: "contaminated"}


def test_image_gate_quarantines_perceptual_dups(spark, tmp_path):
    """r5 verdict item 3: the optional image gate rejects arrivals whose
    dHash is within image_max_dist of accepted history (or a lower-id
    batchmate), carries the reject reason, and the stream-accepted set
    equals the batch image_near_dups greedy (arrival-order keep-first)
    filter."""
    from real_time_event_driven_data_pipeline_spark.operators import multimodal

    landing = tmp_path / "landing"
    landing.mkdir()
    pipe = CorpusCurationPipeline(
        spark,
        landing_dir=str(landing),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        # text near-dup gate effectively off so the IMAGE gate does the
        # work (the planted pairs share ~85% of their text shingles)
        near_dup_threshold=0.99,
        image_gate=True,
        image_max_dist=3,
    )
    rng = random.Random(13)
    base = {i: _doc(rng) for i in (1, 2, 3, 4)}

    def image_dup_of(text):
        # flip one character BEYOND the stub grid (byte index >= side^2):
        # the dHash is identical (Hamming 0) while the fingerprint and
        # shingle set differ -> only the image gate can catch it
        side = max(1, int(len(text) ** 0.5))
        assert side * side < len(text)
        i = side * side
        return text[:i] + ("x" if text[i] != "x" else "y") + text[i + 1 :]

    rows1 = [(i, t, "src") for i, t in base.items()] + [
        (10, image_dup_of(base[1]), "src")
    ]
    _write(rows1, f"{landing}/batch1.csv")
    pipe.run_available_now()
    assert pipe.stats[-1]["accepted"] == 4

    fresh = _doc(rng)
    rows2 = [(20, image_dup_of(base[2]), "src"), (21, fresh, "src")]
    _write(rows2, f"{landing}/batch2.csv")
    pipe.run_available_now()

    corpus = {r.doc_id for r in spark.read.parquet(pipe.corpus_dir).collect()}
    reasons = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(pipe.quarantine_dir).collect()
    }
    assert reasons == {10: "image_near_dup", 20: "image_near_dup"}

    # stream == batch pin: greedy arrival-order filter over the batch
    # operator's pairs on the full arrival set
    all_rows = [(i, t) for i, t, _ in rows1] + [(i, t) for i, t, _ in rows2]
    media = spark.createDataFrame(all_rows, "media_id long, text string").select(
        "media_id",
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    pairs = {
        (r.media_id_a, r.media_id_b)
        for r in multimodal.image_near_dups(media, max_dist=3).collect()
    }
    accepted = []
    for i, _ in all_rows:  # arrival order == listing order
        if not any((min(a, i), max(a, i)) in pairs for a in accepted):
            accepted.append(i)
    assert corpus == set(accepted) == {1, 2, 3, 4, 21}
