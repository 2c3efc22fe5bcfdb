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
    filter ON THIS FIXTURE.  The equivalence is fixture-specific: the
    gate drops any new doc paired with a lower-id batchmate even when
    that batchmate is itself quarantined, so on a within-batch CHAIN
    (A-history, B~A, C~B but C!~A) it over-drops C where greedy keeps
    it — conservative transitive drop, same rule as the text gate;
    pinned in test_image_gate_within_batch_chain_drops_conservatively."""
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


def _dhash_of(text):
    from real_time_event_driven_data_pipeline_spark.operators import multimodal

    return multimodal.dhash_bands(
        multimodal.decode_image(text.encode("utf-8"))
    )


def _hamming(a, b):
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def _grid_positions(text):
    """Byte indexes the dHash 8x9 grid actually samples for this text."""
    side = max(1, int(len(text.encode("utf-8")) ** 0.5))
    rs = [(r * side) // 8 for r in range(8)]
    cs = [(c * side) // 9 for c in range(9)]
    return [(r, rs[r] * side + cs[c]) for r in range(8) for c in range(9)]


def _mutate_for_distance(text, lo, hi, rows_used=()):
    """First single-char grid mutation with dHash distance in [lo, hi],
    restricted to grid rows not in ``rows_used`` (edits in distinct rows
    flip disjoint bit positions, so chain distances add)."""
    base = _dhash_of(text)
    for row, pos in _grid_positions(text):
        if row in rows_used:
            continue
        for ch in "zqjkvxw":
            if text[pos] == ch:
                continue
            cand = text[:pos] + ch + text[pos + 1 :]
            d = _hamming(base, _dhash_of(cand))
            if lo <= d <= hi:
                return cand, row, d
    raise AssertionError("no grid mutation found in the distance window")


def test_image_gate_within_batch_chain_drops_conservatively(spark, tmp_path):
    """Pins the gate's CHAIN semantics (round-6 ADVICE): for a
    within-batch chain A(history) ~ B ~ C with C !~ A, the gate drops
    BOTH B and C — C pairs with its lower-id batchmate B even though B
    is itself quarantined via the history pair.  A greedy arrival-order
    filter would keep C; the gate is deliberately conservative
    (transitive over-drop, the same rule as the text near-dup gate:
    dropping only against KEPT docs would need an in-batch sequential
    pass, serializing the batch)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    pipe = CorpusCurationPipeline(
        spark,
        landing_dir=str(landing),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        near_dup_threshold=0.99,  # text gate effectively off
        image_gate=True,
        image_max_dist=3,
    )
    rng = random.Random(29)
    a = _doc(rng)
    # b: 2-3 bits from a; c: 2-3 bits from b in a DIFFERENT grid row, so
    # d(a, c) = d(a, b) + d(b, c) >= 4 > image_max_dist
    b, row_ab, d_ab = _mutate_for_distance(a, 2, 3)
    c, _, d_bc = _mutate_for_distance(b, 2, 3, rows_used=(row_ab,))
    assert d_ab + d_bc >= 4
    assert _hamming(_dhash_of(a), _dhash_of(c)) == d_ab + d_bc

    _write([(1, a, "src")], f"{landing}/batch1.csv")
    pipe.run_available_now()
    assert pipe.stats[-1]["accepted"] == 1

    _write([(10, b, "src"), (11, c, "src")], f"{landing}/batch2.csv")
    pipe.run_available_now()

    corpus = {r.doc_id for r in spark.read.parquet(pipe.corpus_dir).collect()}
    reasons = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(pipe.quarantine_dir).collect()
    }
    # conservative: 11 (~10 only) dropped too, though greedy would keep it
    assert corpus == {1}
    assert reasons == {10: "image_near_dup", 11: "image_near_dup"}


def test_image_gate_backfill_indexes_pregate_history(spark, tmp_path):
    """Enabling image_gate on a pipeline with accepted epochs starts
    from an empty dHash sidecar — history predating the flag is never
    matched (round-6 ADVICE).  backfill_image_dhash_index() closes the
    gap: it indexes exactly the corpus docs missing from the sidecar,
    is idempotent, and afterwards a perceptual dup of PRE-GATE history
    is quarantined."""
    landing = tmp_path / "landing"
    landing.mkdir()
    dirs = dict(
        landing_dir=str(landing),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        near_dup_threshold=0.99,
    )
    rng = random.Random(31)
    base = {1: _doc(rng), 2: _doc(rng)}

    # phase 1: gate OFF — two docs accepted, dhash sidecar never written
    pipe_off = CorpusCurationPipeline(spark, **dirs)
    _write([(i, t, "src") for i, t in base.items()], f"{landing}/batch1.csv")
    pipe_off.run_available_now()
    assert pipe_off.stats[-1]["accepted"] == 2

    # phase 2: gate ON (same dirs/checkpoint).  Backfill indexes the 2
    # pre-gate docs; a second run re-publishes the same set (idempotent)
    pipe_on = CorpusCurationPipeline(spark, image_gate=True, image_max_dist=3, **dirs)
    assert pipe_on.backfill_image_dhash_index() == 2
    assert pipe_on.backfill_image_dhash_index() == 2

    # dup of PRE-GATE doc 1: identical dHash, different fingerprint and
    # shingle set (flip one char beyond the stub grid) -> only the image
    # gate can catch it, and only because of the backfill
    t1 = base[1]
    side = max(1, int(len(t1.encode("utf-8")) ** 0.5))
    i = side * side
    assert i < len(t1)
    dup = t1[:i] + ("x" if t1[i] != "x" else "y") + t1[i + 1 :]
    fresh = _doc(rng)
    _write([(20, dup, "src"), (21, fresh, "src")], f"{landing}/batch2.csv")
    pipe_on.run_available_now()

    corpus = {r.doc_id for r in spark.read.parquet(pipe_on.corpus_dir).collect()}
    reasons = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(pipe_on.quarantine_dir).collect()
    }
    assert corpus == {1, 2, 21}
    assert reasons == {20: "image_near_dup"}

    # backfill after a gated epoch: 21's postings came from the epoch
    # publish, so the pre-gate set is still exactly the original 2 docs
    assert pipe_on.backfill_image_dhash_index() == 2


def _unit_vecs(rng, ids, dim=8):
    """Deterministic distinct vectors per id (seed-fixed Gaussian)."""
    return {i: [rng.gauss(0, 1) for _ in range(dim)] for i in ids}


def _near(vec, rng, eps=0.05):
    return [x + rng.gauss(0, eps) for x in vec]


def _emb_pipeline(spark, tmp_path, emb_df, **extra):
    landing = tmp_path / "landing"
    landing.mkdir(exist_ok=True)
    kwargs = dict(
        # text near-dup gate effectively off: the planted dups have
        # FRESH text (the paraphrase case), only embeddings collide
        near_dup_threshold=0.99,
        embedding_dim=8,
        embedding_threshold=0.9,
        embedding_n_tables=16,
        embedding_n_planes=4,
        embedder=lambda df: df.join(emb_df, "doc_id", "left"),
    )
    kwargs.update(extra)
    return CorpusCurationPipeline(
        spark,
        landing_dir=str(landing),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        **kwargs,
    ), str(landing)


def test_embedding_gate_quarantines_paraphrase_dups(spark, tmp_path):
    """r8 verdict item 3: the optional SEMANTIC gate rejects arrivals
    whose embedding cosine vs accepted history (or a lower-id
    batchmate) clears the threshold — the paraphrase-duplicate case,
    DIFFERENT text (invisible to the fingerprint and shingle gates),
    same meaning.  Pins: reject reason ``semantic_near_dup``; the
    stream-accepted set equals the greedy arrival-order filter over the
    EXACT batch pair relation (embedding_similar_pairs — the LSH gate's
    recall at these settings is 1, so stream == exact batch semantics);
    and the verified pair edges feed the cluster-label sidecar."""
    from real_time_event_driven_data_pipeline_spark.operators import similarity

    rng = random.Random(17)
    text_rng = random.Random(18)
    base_v = _unit_vecs(rng, [1, 2, 3, 4, 21])
    vec = dict(base_v)
    vec[10] = _near(base_v[1], rng)  # paraphrase of 1, same batch
    vec[20] = _near(base_v[2], rng)  # paraphrase of 2, next epoch
    emb_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vec.items()],
        "doc_id long, embedding array<float>",
    )
    pipe, landing = _emb_pipeline(
        spark, tmp_path, emb_df, embedding_gate=True, cluster_labels=True
    )

    texts = {i: _doc(text_rng) for i in vec}  # every text distinct
    rows1 = [(i, texts[i], "src") for i in (1, 2, 3, 4, 10)]
    _write(rows1, f"{landing}/batch1.csv")
    pipe.run_available_now()
    assert pipe.stats[-1]["accepted"] == 4

    rows2 = [(20, texts[20], "src"), (21, texts[21], "src")]
    _write(rows2, f"{landing}/batch2.csv")
    pipe.run_available_now()

    corpus = {r.doc_id for r in spark.read.parquet(pipe.corpus_dir).collect()}
    reasons = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(pipe.quarantine_dir).collect()
    }
    assert reasons == {10: "semantic_near_dup", 20: "semantic_near_dup"}

    # stream == batch pin: greedy arrival-order filter over the exact
    # all-pairs batch operator on the full arrival set
    all_ids = [i for i, _, _ in rows1] + [i for i, _, _ in rows2]
    allv = emb_df.join(
        spark.createDataFrame([(i,) for i in all_ids], "doc_id long"),
        "doc_id",
        "left_semi",
    ).withColumnRenamed("doc_id", "vec_id")
    pairs = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_similar_pairs(allv, threshold=0.9).collect()
    }
    accepted = []
    for i in all_ids:  # arrival order == listing order
        if not any((min(a, i), max(a, i)) in pairs for a in accepted):
            accepted.append(i)
    assert corpus == set(accepted) == {1, 2, 3, 4, 21}

    # the semantic pair edges fed the cluster-label sidecar
    labels = {r.id: r.comp for r in pipe.resolved_cluster_labels().collect()}
    assert labels == {1: 1, 10: 1, 2: 2, 20: 2}


def test_embedding_gate_backfill_indexes_pregate_history(spark, tmp_path):
    """Enabling embedding_gate on a pipeline with accepted epochs
    starts from empty sidecars — pre-flag history is invisible to the
    gate.  backfill_embedding_lsh_index() closes the gap (the image
    gate's dHash backfill, for embeddings): idempotent, cumulative,
    and afterwards a paraphrase dup of PRE-GATE history is
    quarantined."""
    rng = random.Random(23)
    text_rng = random.Random(24)
    base_v = _unit_vecs(rng, [1, 2, 21])
    vec = dict(base_v)
    vec[20] = _near(base_v[1], rng)  # paraphrase of PRE-GATE doc 1
    emb_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vec.items()],
        "doc_id long, embedding array<float>",
    )
    texts = {i: _doc(text_rng) for i in vec}

    # phase 1: gate OFF — two docs accepted, sidecars never written
    pipe_off, landing = _emb_pipeline(spark, tmp_path, emb_df)
    _write([(i, texts[i], "src") for i in (1, 2)], f"{landing}/batch1.csv")
    pipe_off.run_available_now()
    assert pipe_off.stats[-1]["accepted"] == 2

    # phase 2: gate ON (same dirs/checkpoint); backfill indexes the 2
    # pre-gate docs; a second run re-publishes the same set (idempotent)
    pipe_on, _ = _emb_pipeline(spark, tmp_path, emb_df, embedding_gate=True)
    assert pipe_on.backfill_embedding_lsh_index() == 2
    assert pipe_on.backfill_embedding_lsh_index() == 2

    _write([(20, texts[20], "src"), (21, texts[21], "src")], f"{landing}/b2.csv")
    pipe_on.run_available_now()
    corpus = {r.doc_id for r in spark.read.parquet(pipe_on.corpus_dir).collect()}
    reasons = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(pipe_on.quarantine_dir).collect()
    }
    assert corpus == {1, 2, 21}
    assert reasons == {20: "semantic_near_dup"}
    # 21's postings came from the epoch publish, so the pre-gate set is
    # still exactly the original 2 docs
    assert pipe_on.backfill_embedding_lsh_index() == 2


def test_incremental_manifest_continues_across_epochs(spark, tmp_path):
    """Continuous export manifest (round 7): each epoch's survivors are
    assigned to training shards CONTINUING the global token count — a
    shard that ended mid-epoch stays ended, the epoch boundary never
    resets shard ids, and a replayed activation never double-assigns."""
    import pyspark.sql.functions as SF

    landing = tmp_path / "landing"
    landing.mkdir()
    budget = 60  # ~40-token docs -> a shard spans ~2 docs, boundaries everywhere
    pipe = CorpusCurationPipeline(
        spark,
        landing_dir=str(landing),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        manifest_token_budget=budget,
    )
    rng = random.Random(41)
    b1 = [(i, _doc(rng), "s") for i in range(1, 5)]
    b2 = [(i, _doc(rng), "s") for i in range(10, 13)]
    _write(b1, f"{landing}/b1.csv")
    pipe.run_available_now()
    m1 = spark.read.parquet(pipe.manifest_dir).collect()
    total1 = sum(r.n_tokens for r in m1)
    assert {r.doc_id for r in m1} == {1, 2, 3, 4}
    assert max(r.cum_tokens for r in m1) == total1

    _write(b2, f"{landing}/b2.csv")
    pipe.run_available_now()
    rows = {r.doc_id: r for r in spark.read.parquet(pipe.manifest_dir).collect()}
    assert set(rows) == {1, 2, 3, 4, 10, 11, 12}
    # epoch 2 continues the global count: its smallest cum exceeds
    # epoch 1's total by exactly its first doc's tokens
    e2 = sorted((rows[i] for i in (10, 11, 12)), key=lambda r: r.cum_tokens)
    assert e2[0].cum_tokens == total1 + e2[0].n_tokens
    # shard ids never reset: epoch 2's first shard id >= epoch 1's last
    last_e1_shard = max(rows[i].shard_id for i in (1, 2, 3, 4))
    assert e2[0].shard_id >= last_e1_shard
    # every row satisfies the assignment law: shard = exclusive_cum DIV budget
    for r in rows.values():
        assert r.shard_id == (r.cum_tokens - r.n_tokens) // budget
    # epoch-boundary continuation: if epoch 1 ended mid-shard, epoch 2's
    # first doc joins that SAME shard
    if total1 % budget != 0:
        assert e2[0].shard_id == total1 // budget
    # re-activation with no new files: nothing double-assigned
    pipe.run_available_now()
    again = spark.read.parquet(pipe.manifest_dir).collect()
    assert len(again) == len(rows)
    # and the per-epoch assignment equals direct operator composition
    from real_time_event_driven_data_pipeline_spark.operators.text import (
        incremental_export_manifest,
    )

    d1 = spark.createDataFrame([(i, t) for i, t, _ in b1], "doc_id long, text string")
    d2 = spark.createDataFrame([(i, t) for i, t, _ in b2], "doc_id long, text string")
    want1 = {r.doc_id: (r.cum_tokens, r.shard_id)
             for r in incremental_export_manifest(d1, 0, budget).collect()}
    want2 = {r.doc_id: (r.cum_tokens, r.shard_id)
             for r in incremental_export_manifest(d2, total1, budget).collect()}
    got = {i: (rows[i].cum_tokens, rows[i].shard_id) for i in rows}
    assert got == {**want1, **want2}


def test_manifest_backfill_assigns_preflag_history(spark, tmp_path):
    """Enabling manifest_token_budget on a pipeline with accepted
    epochs leaves pre-flag history unassigned (round-7 review finding)
    — backfill_export_manifest() assigns exactly the missing docs, is
    a no-op when nothing is missing, and subsequent epochs continue
    AFTER the backfilled total."""
    landing = tmp_path / "landing"
    landing.mkdir()
    budget = 60
    dirs = dict(
        landing_dir=str(landing),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rng = random.Random(43)

    pipe_off = CorpusCurationPipeline(spark, **dirs)
    _write([(i, _doc(rng), "s") for i in (1, 2, 3)], f"{landing}/b1.csv")
    pipe_off.run_available_now()
    assert pipe_off.stats[-1]["accepted"] == 3

    pipe_on = CorpusCurationPipeline(spark, manifest_token_budget=budget, **dirs)
    assert pipe_on.backfill_export_manifest() == 3
    assert pipe_on.backfill_export_manifest() == 0  # idempotent no-op
    hist = spark.read.parquet(pipe_on.manifest_dir).collect()
    total_hist = sum(r.n_tokens for r in hist)
    assert {r.doc_id for r in hist} == {1, 2, 3}
    assert max(r.cum_tokens for r in hist) == total_hist

    _write([(10, _doc(rng), "s")], f"{landing}/b2.csv")
    pipe_on.run_available_now()
    rows = {r.doc_id: r for r in spark.read.parquet(pipe_on.manifest_dir).collect()}
    assert set(rows) == {1, 2, 3, 10}
    # epoch 2 continues after the backfilled history total
    assert rows[10].cum_tokens == total_hist + rows[10].n_tokens
    assert rows[10].shard_id == (rows[10].cum_tokens - rows[10].n_tokens) // budget


def test_manifest_backfill_refusals(spark, tmp_path):
    """backfill_export_manifest refuses (a) to overwrite an existing
    backfill when a disable/re-enable gap left new unassigned history,
    and (b) to publish when the manifest changed between its offset
    read and its publish (a stream epoch in flight would get the same
    start offset — overlapping global token ranges; round-7 ADVICE)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    dirs = dict(
        landing_dir=str(landing),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rng = random.Random(47)

    # pre-flag history, then a backfill
    pipe_off = CorpusCurationPipeline(spark, **dirs)
    _write([(i, _doc(rng), "s") for i in (1, 2)], f"{landing}/b1.csv")
    pipe_off.run_available_now()
    pipe_on = CorpusCurationPipeline(spark, manifest_token_budget=60, **dirs)
    assert pipe_on.backfill_export_manifest() == 2

    # (a) disable/re-enable gap: more history lands with the flag OFF,
    # so a second backfill would have to rewrite the epoch-1 files
    pipe_gap = CorpusCurationPipeline(spark, **dirs)
    _write([(5, _doc(rng), "s")], f"{landing}/b2.csv")
    pipe_gap.run_available_now()
    with pytest.raises(ValueError, match="immutable"):
        pipe_on.backfill_export_manifest()

    # (b) concurrent-epoch race: simulate a gate epoch publishing into
    # the manifest between the backfill's offset read and its publish
    # by injecting the write under _pin (which runs in that window)
    dirs2 = dict(
        landing_dir=str(landing),
        corpus_dir=str(tmp_path / "corpus2"),
        quarantine_dir=str(tmp_path / "quarantine2"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    pipe2_off = CorpusCurationPipeline(spark, **dirs2)
    _write([(7, _doc(rng), "s")], f"{landing}/b3.csv")
    pipe2_off.run_available_now()
    pipe2 = CorpusCurationPipeline(spark, manifest_token_budget=60, **dirs2)

    real_pin = pipe2._pin

    def racing_pin(df):
        import pathlib

        mdir = pathlib.Path(pipe2.manifest_dir)
        mdir.mkdir(parents=True, exist_ok=True)
        (mdir / "epoch3-part-racer.parquet").write_bytes(b"")
        return real_pin(df)

    pipe2._pin = racing_pin
    with pytest.raises(ValueError, match="in flight"):
        pipe2.backfill_export_manifest()


def test_cluster_label_sidecar_tracks_evolving_dup_graph(spark, tmp_path):
    """cluster_labels=True maintains duplicate-cluster labels across
    epochs incrementally (r7 verdict item 4): each epoch folds only its
    NEW pair edges into the label sidecar, updated rows are bounded by
    the affected subgraph, and the resolved labeling equals a batch CC
    recompute over the union of every epoch's edges."""
    from real_time_event_driven_data_pipeline_spark.operators.components import (
        near_dup_clusters,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    pipe = CorpusCurationPipeline(
        spark,
        landing_dir=str(landing),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        cluster_labels=True,
    )
    rng = random.Random(11)
    base = {i: _doc(rng) for i in range(1, 6)}

    # epoch 1: 5 clean docs + an in-batch near-dup of doc 5 (id 22)
    near5 = base[5].split()
    near5[10] = "sentinel"
    _write(
        [(i, t, "s") for i, t in base.items()] + [(22, " ".join(near5), "s")],
        f"{landing}/b1.csv",
    )
    pipe.run_available_now()
    assert pipe.stats[-1]["label_updates"] == 2  # the (5, 22) pair
    lab1 = {r.id: r.comp for r in pipe.resolved_cluster_labels().collect()}
    assert lab1 == {5: 5, 22: 5}

    # epoch 2: another near-dup of doc 5 (id 30) + unrelated clean doc.
    # 22 was quarantined so the posting index pairs 30 with 5 only; the
    # update must still relabel the WHOLE touched component {5, 22, 30}
    # and nothing else.
    near5b = base[5].split()
    near5b[20] = "sentinel2"
    _write(
        [(30, " ".join(near5b), "s"), (31, _doc(rng), "s")],
        f"{landing}/b2.csv",
    )
    pipe.run_available_now()
    assert pipe.stats[-1]["label_updates"] == 3  # affected component only
    lab2 = {r.id: r.comp for r in pipe.resolved_cluster_labels().collect()}
    assert lab2 == {5: 5, 22: 5, 30: 5}

    # epoch 3: nothing similar -> zero label updates, labels unchanged
    _write([(40, _doc(rng), "s")], f"{landing}/b3.csv")
    pipe.run_available_now()
    assert pipe.stats[-1]["label_updates"] == 0
    lab3 = {r.id: r.comp for r in pipe.resolved_cluster_labels().collect()}
    assert lab3 == lab2

    # the verdict's done-bar: resolved labels == batch CC over the
    # union of every epoch's edges ((5,22) from epoch 1, (5,30) from 2)
    union_edges = spark.createDataFrame(
        [(5, 22), (5, 30)], "id_a long, id_b long"
    )
    want = {
        r.doc_id: r.component for r in near_dup_clusters(union_edges).collect()
    }
    assert lab3 == want

    # compaction collapses superseded rows (5 and 22 were each written
    # twice) without changing the resolved labeling, and the NEXT
    # epoch's incremental update composes on top of the compacted rows
    import pathlib

    raw_before = spark.read.parquet(pipe.cc_label_dir).count()
    assert pipe.compact_cluster_labels() == 3
    assert spark.read.parquet(pipe.cc_label_dir).count() == 3 < raw_before
    assert {
        r.id: r.comp for r in pipe.resolved_cluster_labels().collect()
    } == lab3
    assert len(list(pathlib.Path(pipe.cc_label_dir).glob("*.parquet"))) == 1

    near5c = base[5].split()
    near5c[30] = "sentinel3"
    _write([(50, " ".join(near5c), "s")], f"{landing}/b4.csv")
    pipe.run_available_now()
    assert pipe.stats[-1]["label_updates"] == 4  # {5, 22, 30, 50}
    lab4 = {r.id: r.comp for r in pipe.resolved_cluster_labels().collect()}
    assert lab4 == {5: 5, 22: 5, 30: 5, 50: 5}


# --- sidecar settings metadata (r9 verdict items 1/2/6) ---------------


def test_sidecar_meta_mismatch_raises(spark, tmp_path):
    """The stamped index settings are FIXED for the sidecar's life: a
    restart with a different plane count (or max_dist) would probe an
    incompatible bucket space and silently miss every historical
    duplicate — construction must RAISE instead."""
    rng = random.Random(31)
    emb_df = spark.createDataFrame(
        [(1, [float(x) for x in v]) for _, v in _unit_vecs(rng, [1]).items()],
        "doc_id long, embedding array<float>",
    )
    _emb_pipeline(spark, tmp_path, emb_df, embedding_gate=True)  # stamps 16x4
    with pytest.raises(ValueError, match="sidecar index settings mismatch"):
        _emb_pipeline(
            spark, tmp_path, emb_df, embedding_gate=True, embedding_n_planes=5
        )
    with pytest.raises(ValueError, match="n_tables"):
        _emb_pipeline(
            spark, tmp_path, emb_df, embedding_gate=True, embedding_n_tables=8
        )
    # verification-only settings are stamped too (threshold)
    with pytest.raises(ValueError, match="threshold"):
        _emb_pipeline(
            spark, tmp_path, emb_df, embedding_gate=True, embedding_threshold=0.8
        )
    # same settings reconstruct cleanly
    _emb_pipeline(spark, tmp_path, emb_df, embedding_gate=True)

    # the image gate's Hamming sidecar has the same contract (max_dist)
    dirs = dict(
        landing_dir=str(tmp_path / "landing2"),
        corpus_dir=str(tmp_path / "corpus2"),
        quarantine_dir=str(tmp_path / "quarantine2"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    CorpusCurationPipeline(spark, image_gate=True, image_max_dist=3, **dirs)
    with pytest.raises(ValueError, match="max_dist"):
        CorpusCurationPipeline(spark, image_gate=True, image_max_dist=2, **dirs)
    CorpusCurationPipeline(spark, image_gate=True, image_max_dist=3, **dirs)


def test_embedding_gate_requires_embedding_source_at_construction(
    spark, tmp_path
):
    """embedder=None with no 'embedding' arrival column must fail at
    construction, not mid-epoch with a raw AnalysisException deep in
    the pair plan (ADVICE r9 — the backfill helper already raised)."""
    with pytest.raises(ValueError, match="no embedder"):
        CorpusCurationPipeline(
            spark,
            landing_dir=str(tmp_path / "landing"),
            corpus_dir=str(tmp_path / "corpus"),
            quarantine_dir=str(tmp_path / "quarantine"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            embedding_gate=True,
            embedding_dim=8,
        )


def test_embedding_n_planes_none_adopts_stamp_or_autosizes(spark, tmp_path):
    """``embedding_n_planes=None``: adopt the stamped plane count when
    a sidecar stamp exists (a restart never repeats the explicit
    setting); otherwise size from the accepted-corpus count via the
    production rule (lsh_planes_for_corpus) and stamp the result —
    enable-later on a large corpus must NOT keep a test-scale default
    (r9 verdict item 6)."""
    from pyspark.sql import functions as F

    from real_time_event_driven_data_pipeline_spark.operators.similarity import (
        lsh_planes_for_corpus,
    )
    from real_time_event_driven_data_pipeline_spark.streaming.curation import (
        read_sidecar_meta,
    )
    from real_time_event_driven_data_pipeline_spark.streaming.epochs import (
        publish_epoch,
    )

    rng = random.Random(37)
    emb_df = spark.createDataFrame(
        [(1, [float(x) for x in v]) for _, v in _unit_vecs(rng, [1]).items()],
        "doc_id long, embedding array<float>",
    )
    # stamp 16x4 via the helper, then None adopts the stamped 4
    _emb_pipeline(spark, tmp_path, emb_df, embedding_gate=True)
    adopted, _ = _emb_pipeline(
        spark, tmp_path, emb_df, embedding_gate=True, embedding_n_planes=None
    )
    assert adopted.embedding_n_planes == 4

    # enable-later on a pipeline with 600 pre-gate accepted docs and NO
    # stamp: None sizes from the corpus count (> the floor of 3)
    corpus2 = str(tmp_path / "corpus3")
    publish_epoch(
        spark.range(600).select(
            F.col("id").alias("doc_id"),
            F.lit("stub text").alias("text"),
            F.lit("s").alias("source"),
        ),
        corpus2,
        0,
    )
    sized = CorpusCurationPipeline(
        spark,
        landing_dir=str(tmp_path / "landing3"),
        corpus_dir=corpus2,
        quarantine_dir=str(tmp_path / "quarantine3"),
        checkpoint_dir=str(tmp_path / "ckpt3"),
        embedding_gate=True,
        embedding_dim=8,
        embedding_n_planes=None,
        embedder=lambda df: df.join(emb_df, "doc_id", "left"),
    )
    want = lsh_planes_for_corpus(600)
    assert want > 3  # the production rule, not the recall floor
    assert sized.embedding_n_planes == want
    stamp = read_sidecar_meta(spark, sized.emb_post_index_dir)
    assert stamp["n_planes"] == want and stamp["kind"] == "embedding_lsh"


def test_reindex_embedding_lsh_index_migrates_bucket_space(spark, tmp_path):
    """Plane-count migration (r9 verdict item 2): re-hash the accepted
    vectors once, swap atomically, restamp.  Pair OUTPUT is equivalent
    across the reindex — a paraphrase dup of pre-reindex history is
    still quarantined — and the old plane count now raises at
    construction while the new one passes."""
    from real_time_event_driven_data_pipeline_spark.streaming.curation import (
        read_sidecar_meta,
    )

    rng = random.Random(41)
    text_rng = random.Random(42)
    base_v = _unit_vecs(rng, [1, 2, 21])
    vec = dict(base_v)
    vec[20] = _near(base_v[1], rng)  # paraphrase of PRE-REINDEX doc 1
    emb_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vec.items()],
        "doc_id long, embedding array<float>",
    )
    texts = {i: _doc(text_rng) for i in vec}

    pipe, landing = _emb_pipeline(spark, tmp_path, emb_df, embedding_gate=True)
    _write([(i, texts[i], "src") for i in (1, 2)], f"{landing}/b1.csv")
    pipe.run_available_now()
    assert pipe.stats[-1]["accepted"] == 2

    assert pipe.reindex_embedding_lsh_index(new_n_planes=6) == 6
    assert pipe.embedding_n_planes == 6
    assert read_sidecar_meta(spark, pipe.emb_post_index_dir)["n_planes"] == 6
    # postings were re-hashed: every accepted doc reindexed, old bucket
    # space gone (6-plane tags stride 64, 4-plane tags stride 16)
    posts = spark.read.parquet(pipe.emb_post_index_dir)
    assert {r.doc_id for r in posts.select("doc_id").distinct().collect()} == {1, 2}
    assert posts.count() == 2 * 16  # n_tables rows per vector

    # the old setting is now a loud mismatch; the new one reconstructs,
    # and embedding_n_planes=None adopts the RESTAMPED count — a
    # restart after a reindex needs no explicit setting either
    with pytest.raises(ValueError, match="sidecar index settings mismatch"):
        _emb_pipeline(spark, tmp_path, emb_df, embedding_gate=True)
    _emb_pipeline(
        spark, tmp_path, emb_df, embedding_gate=True, embedding_n_planes=6
    )
    adopted, _ = _emb_pipeline(
        spark, tmp_path, emb_df, embedding_gate=True, embedding_n_planes=None
    )
    assert adopted.embedding_n_planes == 6

    # gate equivalence across the migration: the planted paraphrase dup
    # of pre-reindex history is caught in the 6-plane bucket space
    _write([(20, texts[20], "src"), (21, texts[21], "src")], f"{landing}/b2.csv")
    pipe.run_available_now()
    corpus = {r.doc_id for r in spark.read.parquet(pipe.corpus_dir).collect()}
    reasons = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(pipe.quarantine_dir).collect()
    }
    assert corpus == {1, 2, 21}
    assert reasons == {20: "semantic_near_dup"}

    # auto-size mode: 3 accepted vectors -> the recall floor
    assert pipe.reindex_embedding_lsh_index() == 3
    assert read_sidecar_meta(spark, pipe.emb_post_index_dir)["n_planes"] == 3


def test_instrument_io_records_stage_deltas(spark, pipe):
    """Opt-in per-stage shuffle attribution (r9 verdict item 3): with
    instrument_io=True every epoch's stats record carries a stage_io
    block covering the always-on stages, with non-negative byte deltas;
    the default pipeline records none (the probe's contract)."""
    pipe, landing = pipe
    rng = random.Random(53)
    pipe.instrument_io = True
    _write([(i, _doc(rng), "src") for i in range(4)], f"{landing}/b1.csv")
    pipe.run_available_now()
    s = pipe.stats[-1]
    assert "stage_io" in s
    for stage in ("arrival", "quality", "exact_dup", "text_near_dup",
                  "publish_corpus", "quarantine"):
        assert stage in s["stage_io"], stage
        assert s["stage_io"][stage] >= 0
    # optional-gate stages absent when their gates are off
    assert "image_near_dup" not in s["stage_io"]
    assert "embedding_near_dup" not in s["stage_io"]

    pipe.instrument_io = False
    _write([(100, _doc(rng), "src")], f"{landing}/b2.csv")
    pipe.run_available_now()
    assert "stage_io" not in pipe.stats[-1]


def test_reindex_image_dhash_index_migrates_band_space(spark, tmp_path):
    """max_dist migration for the image gate's Hamming sidecar: corpus
    payloads are re-hashed once (band count = max_dist + 1), the
    posting dir swaps atomically, the stamp updates — the old setting
    now raises at construction, the new one passes — and a
    dHash-identical dup of PRE-reindex history is still quarantined in
    the new band space."""
    from real_time_event_driven_data_pipeline_spark.streaming.curation import (
        read_sidecar_meta,
    )

    rng = random.Random(61)
    dirs = dict(
        landing_dir=str(tmp_path / "landing"),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        # text near-dup gate effectively off (the image backfill test's
        # setting): the planted dup must be catchable ONLY by the image
        # gate so the reason pins the migrated band space
        near_dup_threshold=0.99,
    )
    (tmp_path / "landing").mkdir()
    base = {1: _doc(rng), 2: _doc(rng)}

    pipe = CorpusCurationPipeline(spark, image_gate=True, image_max_dist=3, **dirs)
    _write([(i, t, "src") for i, t in base.items()], f"{dirs['landing_dir']}/b1.csv")
    pipe.run_available_now()
    assert pipe.stats[-1]["accepted"] == 2
    posts3 = spark.read.parquet(pipe.dhash_index_dir)
    # the d<=3 regime posts the C(6,3)=20 Manku block-triple bands
    assert posts3.select("band").distinct().count() == 20

    # 3 -> 4 crosses the banding regime (block triples -> 8 byte bands):
    # a genuine band-space migration, not just a threshold change
    assert pipe.reindex_image_dhash_index(new_max_dist=4) == 2
    assert pipe.image_max_dist == 4
    assert read_sidecar_meta(spark, pipe.dhash_index_dir)["max_dist"] == 4
    posts4 = spark.read.parquet(pipe.dhash_index_dir)
    assert posts4.select("band").distinct().count() == 8  # rebuilt band space
    assert {r.media_id for r in posts4.select("media_id").distinct().collect()} == {1, 2}

    with pytest.raises(ValueError, match="max_dist"):
        CorpusCurationPipeline(spark, image_gate=True, image_max_dist=3, **dirs)
    CorpusCurationPipeline(spark, image_gate=True, image_max_dist=4, **dirs)

    # dHash-identical dup of pre-reindex doc 1 (beyond-grid char flip,
    # the backfill test's construction): caught in the NEW (byte-band)
    # space — d = 0 <= 4
    t1 = base[1]
    side = max(1, int(len(t1.encode("utf-8")) ** 0.5))
    i = side * side
    assert i < len(t1)
    dup = t1[:i] + ("x" if t1[i] != "x" else "y") + t1[i + 1 :]
    _write([(20, dup, "src"), (21, _doc(rng), "src")], f"{dirs['landing_dir']}/b2.csv")
    pipe.run_available_now()
    corpus = {r.doc_id for r in spark.read.parquet(pipe.corpus_dir).collect()}
    reasons = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(pipe.quarantine_dir).collect()
    }
    assert corpus == {1, 2, 21}
    assert reasons == {20: "image_near_dup"}
