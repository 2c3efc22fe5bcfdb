"""streaming/epochs.py: per-epoch publishes must converge to exactly
one copy under replay — full re-run, partial-attempt leftovers, and
the commit-marker fast path."""

from real_time_event_driven_data_pipeline_spark.streaming.epochs import (
    commit_epoch,
    epoch_committed,
    path_exists,
    publish_epoch,
)


def _df(spark, ids):
    return spark.createDataFrame([(i, f"t{i}") for i in ids], "id long, txt string")


def test_publish_epoch_appends_across_epochs(spark, tmp_path):
    d = str(tmp_path / "t")
    publish_epoch(_df(spark, [1, 2]), d, 0)
    publish_epoch(_df(spark, [3]), d, 1)
    assert spark.read.parquet(d).count() == 3


def test_publish_epoch_replay_is_idempotent(spark, tmp_path):
    d = str(tmp_path / "t")
    publish_epoch(_df(spark, [1, 2]), d, 0)
    publish_epoch(_df(spark, [1, 2]), d, 0)  # full epoch re-run
    got = sorted(r.id for r in spark.read.parquet(d).collect())
    assert got == [1, 2]


def test_publish_epoch_cleans_partial_attempt(spark, tmp_path):
    d = str(tmp_path / "t")
    publish_epoch(_df(spark, [1]), d, 0)
    # simulate a crashed first attempt of epoch 1 that landed one file
    _df(spark, [7, 8]).coalesce(1).write.parquet(str(tmp_path / "stray"))
    import shutil

    part = next((tmp_path / "stray").glob("part-*.parquet"))
    shutil.copy(part, tmp_path / "t" / "epoch1-part-leftover.parquet")
    assert spark.read.parquet(d).count() == 3  # corrupted: 1 + stray 2
    publish_epoch(_df(spark, [5, 6]), d, 1)  # the retry
    got = sorted(r.id for r in spark.read.parquet(d).collect())
    assert got == [1, 5, 6]  # stray epoch-1 files replaced, epoch 0 kept


def test_commit_marker_roundtrip(spark, tmp_path):
    m = str(tmp_path / "markers")
    assert not epoch_committed(spark, m, 3)
    commit_epoch(spark, m, 3)
    assert epoch_committed(spark, m, 3)
    assert not epoch_committed(spark, m, 4)


def test_path_exists(spark, tmp_path):
    assert not path_exists(spark, str(tmp_path / "nope"))
    d = str(tmp_path / "yes")
    _df(spark, [1]).write.parquet(d)
    assert path_exists(spark, d)


def test_curation_gate_skips_committed_epoch(spark, tmp_path):
    """Replay of a fully committed epoch is a no-op for every output."""
    from real_time_event_driven_data_pipeline_spark.streaming.curation import (
        CorpusCurationPipeline,
    )

    pipe = CorpusCurationPipeline(
        spark,
        landing_dir=str(tmp_path / "landing"),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quar"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    words = " ".join(
        ["the quick brown fox jumps over the lazy dog and runs far away"] * 4
    )
    batch = spark.createDataFrame(
        [(1, words, "s"), (2, "too short", "s")],
        "doc_id long, text string, source string",
    )
    pipe._gate(batch, 0)
    n_corpus = spark.read.parquet(pipe.corpus_dir).count()
    n_quar = spark.read.parquet(pipe.quarantine_dir).count()
    assert (n_corpus, n_quar) == (1, 1)

    pipe._gate(batch, 0)  # post-success replay: marker short-circuits
    assert spark.read.parquet(pipe.corpus_dir).count() == n_corpus
    assert spark.read.parquet(pipe.quarantine_dir).count() == n_quar
    assert spark.read.parquet(pipe.fp_index_dir).count() == 1
    assert len(pipe.stats) == 1


def test_curation_gate_partial_replay_converges(spark, tmp_path):
    """Re-running an UNcommitted epoch (crash mid-publish) converges:
    no double-appends, sidecars in sync with the corpus."""
    from real_time_event_driven_data_pipeline_spark.streaming.curation import (
        CorpusCurationPipeline,
    )

    pipe = CorpusCurationPipeline(
        spark,
        landing_dir=str(tmp_path / "landing"),
        corpus_dir=str(tmp_path / "corpus"),
        quarantine_dir=str(tmp_path / "quar"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    words = " ".join(
        ["a different sentence with the usual stopwords in it for the gate"] * 4
    )
    batch = spark.createDataFrame(
        [(1, words, "s")], "doc_id long, text string, source string"
    )
    pipe._gate(batch, 0)
    # simulate "published but not committed": delete the marker, replay
    import os

    os.remove(f"{pipe.epoch_marker_dir}/epoch-0.done")
    pipe._gate(batch, 0)
    assert spark.read.parquet(pipe.corpus_dir).count() == 1
    assert spark.read.parquet(pipe.fp_index_dir).count() == 1
    posts = spark.read.parquet(pipe.post_index_dir)
    bad = posts.groupBy("doc_id", "n_sh").count().filter("count != n_sh")
    assert bad.count() == 0  # postings not doubled
