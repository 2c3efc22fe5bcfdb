"""Round-3 curation operators: train/eval decontamination, the
deterministic global shuffle, vocabulary encoding, and int8 embedding
quantization.  Behavior is pinned against hand-computable micro
corpora plus invariants on the driver testdata."""

import math

import pyspark.sql.functions as F
import pytest

from real_time_event_driven_data_pipeline_spark.operators import (
    decontam,
    similarity,
    text,
)
from real_time_event_driven_data_pipeline_spark.sources.readers import load_testdata

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_testdata(spark, SF, "documents")["documents"].cache()


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- decontamination ---


def test_contamination_flags_verbatim_span(spark):
    train = _mkdocs(
        spark,
        [
            (1, "the quick brown fox jumps"),  # contains eval 3-gram
            (2, "completely unrelated training content here"),
        ],
    )
    ev = _mkdocs(spark, [(100, "quick brown fox elsewhere entirely")])
    stats = {r.doc_id: r for r in decontam.contamination_stats(train, ev).collect()}
    assert set(stats) == {1}
    r = stats[1]
    assert r.n_shingles == 3 and r.n_hit == 1
    assert math.isclose(r.hit_ratio, 1 / 3)


def test_decontaminate_drops_only_flagged(spark):
    train = _mkdocs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "one two three four five"),
            (3, "six seven eight nine ten"),
        ],
    )
    ev = _mkdocs(spark, [(100, "zero one two three wrap")])
    kept = sorted(
        r.doc_id for r in decontam.decontaminate(train, ev).select("doc_id").collect()
    )
    assert kept == [1, 3]  # doc 2 shares "one two three"


def test_contamination_hashed_matches_string_shingles(spark, docs):
    split = text.train_split(docs)
    train = docs.join(split.filter(F.col("split") == "train"), "doc_id", "left_semi")
    ev = docs.join(split.filter(F.col("split") == "test"), "doc_id", "left_semi")
    a = {
        (r.doc_id, r.n_shingles, r.n_hit)
        for r in decontam.contamination_stats(train, ev, hashed=True).collect()
    }
    b = {
        (r.doc_id, r.n_shingles, r.n_hit)
        for r in decontam.contamination_stats(train, ev, hashed=False).collect()
    }
    assert a and a == b


def test_short_docs_produce_no_shingles_and_never_flag(spark):
    train = _mkdocs(spark, [(1, "two words"), (2, "")])
    ev = _mkdocs(spark, [(100, "two words exactly here")])
    assert decontam.contamination_stats(train, ev).count() == 0
    assert decontam.decontaminate(train, ev).count() == 2


# --- deterministic global shuffle ---


def test_shuffle_shards_is_a_permutation(spark, docs):
    out = text.shuffle_shards(docs, n_shards=8)
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    # (shard, pos) is a dense 1..count_per_shard numbering
    per = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    for r in per.collect():
        assert r.mn == 1 and r.mx == r.n


def test_shuffle_shards_deterministic_and_order_differs_from_id_order(spark, docs):
    a = text.shuffle_shards(docs, n_shards=4).orderBy("shard", "pos").collect()
    b = text.shuffle_shards(docs, n_shards=4).orderBy("shard", "pos").collect()
    assert a == b
    ids_in_shuffle_order = [r.doc_id for r in a]
    assert ids_in_shuffle_order != sorted(ids_in_shuffle_order)


# --- vocabulary + token-id encoding ---


def test_fit_vocab_ranks_by_frequency_then_token(spark):
    d = _mkdocs(spark, [(1, "b b b a a c"), (2, "a z z")])
    v = {r.tok: r.token_id for r in text.fit_vocab(d, vocab_size=3).collect()}
    # a:3 b:3 c:1 z:2 -> top3 by (n desc, tok asc): a(1), b(2), z(3)
    assert v == {"a": 1, "b": 2, "z": 3}


def test_encode_token_ids_round_trip(spark):
    d = _mkdocs(spark, [(1, "b a c a"), (2, "c c q")])
    v = text.fit_vocab(d, vocab_size=2)  # c:3,a:2,b:1,q:1 -> c(1), a(2)
    enc = {r.doc_id: r for r in text.encode_token_ids(d, v).collect()}
    assert enc[1].ids == "0 2 1 2" and enc[1].n_oov == 1 and enc[1].n_tokens == 4
    assert enc[2].ids == "1 1 0" and enc[2].n_oov == 1


def test_encode_preserves_document_order_at_scale(spark, docs):
    vocab = text.fit_vocab(docs, vocab_size=64)
    enc = text.encode_token_ids(docs, vocab)
    row = enc.filter(F.col("doc_id") == 0).collect()[0]
    toks = docs.filter(F.col("doc_id") == 0).select(
        F.split(F.trim("text"), r"\s+").alias("t")
    ).collect()[0].t
    vmap = {r.tok: r.token_id for r in vocab.collect()}
    expect = " ".join(str(vmap.get(t, 0)) for t in toks)
    assert row.ids == expect and row.n_tokens == len(toks)


# --- int8 quantization ---


def test_quantize_embeddings_bounds_and_error(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in similarity.quantize_embeddings(emb).collect()}
    r1 = out[1]
    scale = 1.0 / 127
    # floor(x/scale): 127, -64, 31, 0
    assert r1.q_sum == 127 - 64 + 31 + 0
    assert r1.n_dims == 4 and math.isclose(r1.scale, scale)
    # reconstruction error bounded by one quantization step per dim
    assert 0 <= r1.mse <= scale * scale
    r2 = out[2]  # zero vector: guarded division
    assert r2.scale == 0.0 and r2.q_sum == 0 and r2.mse == 0.0


def test_quantize_codes_fit_int8(spark):
    emb = load_testdata(spark, SF, "embeddings")["embeddings"]
    out = similarity.quantize_embeddings(emb)
    # max |code| <= 128 (floor can hit -128; +127 upper)
    bad = out.filter((F.col("q_sum") > 128 * F.col("n_dims")) | (F.col("q_sum") < -128 * F.col("n_dims"))).count()
    assert bad == 0
    # quantization of unit-ish vectors keeps mse tiny relative to scale
    worst = out.agg(F.max(F.col("mse") / (F.col("scale") * F.col("scale") + F.lit(1e-18)))).collect()[0][0]
    assert worst <= 1.0


# --- two-stage quantized ANN ---


def test_quantized_topk_recall_vs_exact(spark):
    emb = load_testdata(spark, SF, "embeddings")["embeddings"].cache()
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=10)
    quant = similarity.quantized_topk(emb, queries, k=10, oversample=4)
    ex = {(r.query_id, r.vec_id) for r in exact.collect()}
    qu = {(r.query_id, r.vec_id) for r in quant.collect()}
    assert len(qu) == len(ex)
    recall = len(ex & qu) / len(ex)
    # int8 floor-quantization at 4x oversampling: near-lossless prefilter
    assert recall >= 0.95, recall
    # exact re-score: every returned similarity matches the exact path
    ex_sim = {(r.query_id, r.vec_id): r.cos_sim for r in exact.collect()}
    for r in quant.collect():
        if (r.query_id, r.vec_id) in ex_sim:
            assert r.cos_sim == ex_sim[(r.query_id, r.vec_id)]


def test_quantized_topk_deterministic(spark):
    emb = load_testdata(spark, SF, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = similarity.quantized_topk(emb, queries, k=5).orderBy("query_id", "rank").collect()
    b = similarity.quantized_topk(emb, queries, k=5).orderBy("query_id", "rank").collect()
    assert a == b
