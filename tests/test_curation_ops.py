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


# --- C4-style boilerplate-span removal (round 4) ---


def test_boilerplate_span_removed_across_docs(spark):
    span = "a b c d e f g h i j"  # one exact 10-token span
    docs = _mkdocs(
        spark,
        [
            (1, span + " unique one tail"),
            (2, span + " other content entirely"),
            (3, "totally different ten tokens here that never repeat at all"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in text.remove_boilerplate_spans(docs, span_tokens=10).collect()
    }
    # docs 1 and 2 share the leading span -> removed from both
    assert out[1]["n_removed"] == 1 and out[1]["clean_text"] == "unique one tail"
    assert out[2]["n_removed"] == 1 and out[2]["clean_text"] == "other content entirely"
    # doc 3's single full span is unique -> kept verbatim
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == "totally different ten tokens here that never repeat at all"


def test_boilerplate_tail_window_always_survives(spark):
    tail = "common short tail"  # < span_tokens, shared by both docs
    docs = _mkdocs(spark, [(1, tail), (2, tail)])
    out = text.remove_boilerplate_spans(docs, span_tokens=10).collect()
    assert all(r["clean_text"] == tail and r["n_spans"] == 0 for r in out)


def test_boilerplate_within_doc_repeat_not_removed(spark):
    # the rule is >= min_docs DISTINCT docs, not occurrences: a span
    # repeated inside ONE doc survives
    span = "a b c d e f g h i j"
    docs = _mkdocs(spark, [(1, span + " " + span), (2, "something else here")])
    row = (
        text.remove_boilerplate_spans(docs, span_tokens=10)
        .filter(F.col("doc_id") == 1)
        .collect()[0]
    )
    assert row["n_removed"] == 0 and row["clean_text"] == span + " " + span


def test_boilerplate_token_conservation(spark, docs):
    """clean tokens + removed spans * span_tokens == total tokens."""
    out = text.remove_boilerplate_spans(docs, span_tokens=10)
    n_clean = F.when(F.col("clean_text") == "", 0).otherwise(
        F.size(F.split(F.trim("clean_text"), "\\s+"))
    )
    bad = out.filter(n_clean + F.col("n_removed") * 10 != F.col("n_tokens"))
    assert bad.count() == 0


# --- bigram-model familiarity (round 4) ---


def test_bigram_model_top_k_deterministic(spark):
    docs = _mkdocs(spark, [(1, "x y x y x z"), (2, "x y q r")])
    # bigrams: "x y"x3, "y x"x2, "x z", "y q", "q r"
    model = text.bigram_model(docs, top_k=2).collect()
    assert [(r["bigram"], r["n"]) for r in model] == [("x y", 3), ("y x", 2)]


def test_bigram_familiarity_counts(spark):
    docs = _mkdocs(spark, [(1, "x y x y x z"), (2, "x y q r")])
    model = text.bigram_model(docs, top_k=2)  # {"x y", "y x"}
    out = {
        r["doc_id"]: r for r in text.bigram_familiarity(docs, model).collect()
    }
    # doc 1: 5 bigrams, hits: x y, y x, x y, y x, (x z miss) -> 4
    assert out[1]["n_bigrams"] == 5 and out[1]["n_in_model"] == 4
    assert out[1]["familiarity"] == 4 / 5
    # doc 2: x y hit, y q miss, q r miss
    assert out[2]["n_bigrams"] == 3 and out[2]["n_in_model"] == 1


def test_bigram_familiarity_omits_sub_bigram_docs(spark):
    docs = _mkdocs(spark, [(1, "solo"), (2, "two tokens")])
    model = text.bigram_model(docs, top_k=10)
    out = text.bigram_familiarity(docs, model)
    assert [r["doc_id"] for r in out.collect()] == [2]


# --- two-stage retrieval rerank (round 4) ---


def test_rerank_orders_by_model_score(spark):
    from real_time_event_driven_data_pipeline_spark.operators import search

    cands = spark.createDataFrame(
        [(1, 10, 100, 1), (1, 11, 90, 2), (1, 12, 80, 3)],
        "query_id long, doc_id long, score long, rank int",
    )
    scores = spark.createDataFrame(
        [(10, 0.1), (11, 0.9), (12, 0.5)], "doc_id long, model_score double"
    )
    out = search.rerank_topk(cands, scores, k=2).collect()
    assert [(r["doc_id"], r["rerank"]) for r in out] == [(11, 1), (12, 2)]
    assert out[0]["lex_score"] == 90


# --- DSIR importance scoring (round 4) ---


def test_dsir_upweights_target_like_docs(spark):
    # target docs are pure "aa bb"; off-domain docs pure "zz yy".  A
    # doc made of target n-grams must score above one of off-domain
    # n-grams under the smoothed target/raw bucket-weight model.
    rows = [(i, "aa bb aa bb aa", True) for i in range(4)] + [
        (10 + i, "zz yy zz yy zz", False) for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    out = {r["doc_id"]: r for r in text.dsir_importance(docs, "is_tgt").collect()}
    assert out[0]["avg_importance"] > out[10]["avg_importance"]
    # identical docs get identical scores
    assert out[0]["importance_sum"] == out[1]["importance_sum"]


def test_dsir_feature_count_is_tokens_plus_bigrams(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", True), (2, "solo", False)],
        "doc_id long, text string, is_tgt boolean",
    )
    out = {r["doc_id"]: r for r in text.dsir_importance(docs, "is_tgt").collect()}
    assert out[1]["n_feats"] == 3 + 2  # 3 unigrams + 2 bigrams
    assert out[2]["n_feats"] == 1


def test_dsir_separates_sources_on_testdata(spark, docs):
    """On the driver corpus the target source's docs must rank higher
    on average than the rest (the whole point of the sampler)."""
    tagged = docs.withColumn("is_tgt", F.col("source") == "src0")
    out = text.dsir_importance(tagged, "is_tgt")
    joined = out.join(docs.select("doc_id", "source"), "doc_id")
    means = {
        r["tgt"]: r["m"]
        for r in joined.groupBy((F.col("source") == "src0").alias("tgt"))
        .agg(F.avg("avg_importance").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


# --- DSIR budget resampling (round 4) ---


def test_dsir_budget_greedy_prefix(spark):
    """Selection is the importance-ordered prefix: the doc crossing the
    budget line is kept, everything after it is cut."""
    rows = [(i, "aa bb aa bb aa", True) for i in range(2)] + [
        (10 + i, "zz yy zz yy zz", False) for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    # every doc is 5 tokens; budget 12 -> docs at cum 5, 10, 15 kept (15
    # crosses the line), cum 20+ cut.  Target docs sort first.
    out = text.dsir_select_by_budget(docs, "is_tgt", token_budget=12).collect()
    assert len(out) == 3
    kept = {r["doc_id"] for r in out}
    assert {0, 1} <= kept  # both target docs beat the off-domain ones
    assert max(r["cum_tokens"] for r in out) == 15
    assert all(r["cum_tokens"] - r["n_tokens"] < 12 for r in out)


def test_dsir_budget_edges(spark):
    docs = spark.createDataFrame(
        [(1, "a b", True), (2, "c d", False)],
        "doc_id long, text string, is_tgt boolean",
    )
    assert text.dsir_select_by_budget(docs, "is_tgt", token_budget=0).count() == 0
    # budget beyond the corpus keeps everything
    assert text.dsir_select_by_budget(docs, "is_tgt", token_budget=10**9).count() == 2


# --- hybrid RRF retrieval (operators/search.py) ---

def test_hybrid_rrf_fuses_both_systems(spark):
    from pyspark.sql import functions as F  # noqa: F401
    from real_time_event_driven_data_pipeline_spark.operators import search

    docs = spark.createDataFrame(
        [
            (0, "spark shuffle join hash partition"),
            (1, "window order sort rank frame"),
            (2, "shuffle shuffle shuffle exchange network"),
            (3, "totally unrelated pelican prose"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(1, "shuffle"), (1, "join")], "query_id long, term string")
    out = search.hybrid_rrf_topk(docs, qs, k=4, k_retrieve=4).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # doc 0 matches lexically AND shares hashed buckets -> both ranks set
    assert by_doc[0]["lex_rank"] is not None
    # rrf = sum of the two reciprocal terms, exactly
    for r in out:
        want = (1.0 / (60 + r["lex_rank"]) if r["lex_rank"] is not None else 0.0) + (
            1.0 / (60 + r["dense_rank"]) if r["dense_rank"] is not None else 0.0
        )
        assert r["rrf_score"] == want
    # ranks are 1..n dense per query, no gaps
    assert sorted(r["rank"] for r in out) == list(range(1, len(out) + 1))


def test_hybrid_rrf_partitioning_independent(spark):
    from real_time_event_driven_data_pipeline_spark.operators import search

    docs = spark.createDataFrame(
        [(i, f"term{i % 5} shuffle join word{i}") for i in range(30)],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(1, "shuffle"), (2, "join")], "query_id long, term string")
    a = search.hybrid_rrf_topk(docs.coalesce(1), qs, k=5).collect()
    b = search.hybrid_rrf_topk(docs.repartition(7), qs, k=5).collect()
    key = lambda r: tuple((v if v is not None else -1) for v in r)  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))


# --- round-7: cluster representatives / temperature mixture / overlap ---


def test_cluster_representatives_argmax_and_ties(spark):
    from real_time_event_driven_data_pipeline_spark.operators import components

    # clusters: {1,2,3} (component 1), {7,8} (component 7)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    clusters = components.near_dup_clusters(pairs)
    # quality: 2 wins cluster 1 outright; 7 and 8 TIE -> min id 7 wins
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 7), (7, 4), (8, 4)], "doc_id long, quality long"
    )
    got = {
        r.component: (r.cluster_size, r.kept_doc_id, r.kept_quality)
        for r in components.cluster_representatives(clusters, scores).collect()
    }
    assert got == {1: (3, 2, 9), 7: (2, 7, 4)}


def test_sqrt_temperature_mixture_integer_exact(spark):
    from real_time_event_driven_data_pipeline_spark.operators import text as t

    # counts: a=16 (w=4), b=15 (w=3: floor boundary), c=1 (w=1)
    rows = (
        [(i, "x", "a") for i in range(16)]
        + [(100 + i, "x", "b") for i in range(15)]
        + [(200, "x", "c")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.source: (r.n_docs, r.weight, r.sample_target)
        for r in t.sqrt_temperature_mixture(df).collect()
    }
    # total_docs=32, total_w=8: targets 32*4//8=16, 32*3//8=12, 32*1//8=4
    assert got == {"a": (16, 4, 16), "b": (15, 3, 12), "c": (1, 1, 4)}
    # head flattened: b oversampled (12 > 15*? no - targets rebalance
    # toward c: c gets 4 from 1 doc), and floor targets never exceed total
    assert sum(v[2] for v in got.values()) <= 32


def test_source_shingle_overlap_counts_and_rounding(spark):
    from real_time_event_driven_data_pipeline_spark.operators import dedup as dd

    rows = [
        # source A: shingles {a b c, b c d} (2 distinct)
        (1, "a b c d", "A"),
        # source B: {a b c, b c d, c d e} (3 distinct; full containment of A)
        (2, "a b c d e", "B"),
        # source C: {x y z} — no overlap with A; one shared with B? no.
        (3, "x y z", "C"),
        # source D: {b c d, q r s} -> overlap 1 with A (min size 2 -> 50.00%)
        (4, "b c d", "D"),
        (5, "q r s", "D"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r.source_a, r.source_b): (r.n_sh_a, r.n_sh_b, r.overlap, r.containment_bp)
        for r in dd.source_shingle_overlap(df).collect()
    }
    # A fully contained in B: 2/2 -> 10000 bp; A-D: 1/min(2,2) -> 5000 bp;
    # B-D: {b c d}/min(3,2) -> 5000 bp; C pairs absent (zero overlap)
    assert got == {
        ("A", "B"): (2, 3, 2, 10000),
        ("A", "D"): (2, 2, 1, 5000),
        ("B", "D"): (3, 2, 1, 5000),
    }


def test_training_export_manifest_greedy_fill(spark, docs):
    from real_time_event_driven_data_pipeline_spark.operators import text as t

    budget = 500
    rows = sorted(
        t.training_export_manifest(docs, shard_token_budget=budget).collect(),
        key=lambda r: r.shard_id,
    )
    assert rows, "manifest empty"
    # shard ids contiguous from 0 (greedy sequential fill: no gaps)
    assert [r.shard_id for r in rows] == list(range(len(rows)))
    # a shard closes only AFTER the doc that crosses its budget, so the
    # cumulative token count through shard k covers (k+1) budgets for
    # every shard except possibly the last
    cum = 0
    for r in rows[:-1]:
        cum += r.shard_tokens
        assert cum >= (r.shard_id + 1) * budget, r
    # conservation: every kept doc's tokens land in exactly one shard
    total_docs = sum(r.n_docs for r in rows)
    from real_time_event_driven_data_pipeline_spark.operators.dedup import dedup_exact
    import pyspark.sql.functions as SF

    kept = dedup_exact(t.quality_filter(docs))
    want_docs = kept.count()
    want_tokens = kept.select(
        SF.sum(SF.size(t.tokens_expr("text"))).cast("long")
    ).collect()[0][0]
    assert total_docs == want_docs
    assert sum(r.shard_tokens for r in rows) == want_tokens
    # determinism: a second run is byte-identical
    again = sorted(
        t.training_export_manifest(docs, shard_token_budget=budget).collect(),
        key=lambda r: r.shard_id,
    )
    assert rows == again


def test_eval_span_scrub_removes_exact_spans(spark):
    from real_time_event_driven_data_pipeline_spark.operators import decontam

    eval_docs = _mkdocs(
        spark, [(100, "alpha beta gamma delta epsilon zeta")]
    )
    train = _mkdocs(
        spark,
        [
            # embeds a 5-token eval run mid-document
            (1, "aa bb alpha beta gamma delta epsilon cc dd"),
            # clean doc: passes through untouched, ratio 0
            (2, "xx yy zz ww vv uu"),
            # 4-token overlap only (below k=5): NOT scrubbed
            (3, "beta gamma delta epsilon qq rr ss tt"),
            # the span at the very start (boundary)
            (4, "beta gamma delta epsilon zeta mm nn oo pp"),
        ],
    )
    got = {
        r.doc_id: r
        for r in decontam.eval_span_scrub(train, eval_docs, k=5).collect()
    }
    assert got[1].n_contaminated_tokens == 5
    assert got[1].cleaned_text == "aa bb cc dd"
    assert got[2].n_contaminated_tokens == 0
    assert got[2].cleaned_text == "xx yy zz ww vv uu"
    assert got[3].n_contaminated_tokens == 0
    assert got[4].n_contaminated_tokens == 5
    assert got[4].cleaned_text == "mm nn oo pp"
    # overlapping eval runs cover the union of positions, not 2x
    train2 = _mkdocs(
        spark, [(9, "alpha beta gamma delta epsilon zeta tail1 tail2")]
    )
    got2 = decontam.eval_span_scrub(train2, eval_docs, k=5).collect()[0]
    assert got2.n_contaminated_tokens == 6  # two overlapping runs, union
    assert got2.cleaned_text == "tail1 tail2"


def test_quality_gate_reasons_consistent_with_filter(spark, docs):
    from real_time_event_driven_data_pipeline_spark.operators import text as t

    out = t.quality_gate_reasons(docs)
    passed_ids = {r.doc_id for r in out.filter("passed = 1").collect()}
    kept_ids = {r.doc_id for r in t.quality_filter(docs).select("doc_id").collect()}
    assert passed_ids == kept_ids  # reasons gate == filter gate, exactly
    # every failed row names at least one rule; passed rows name none
    for r in out.collect():
        assert (r.passed == 1) == (r.reasons == "")
    # planted: short doc carries too_short
    bad = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    row = t.quality_gate_reasons(bad).collect()[0]
    assert row.passed == 0 and "too_short" in row.reasons


def test_temperature_sampled_corpus_hits_targets(spark):
    from real_time_event_driven_data_pipeline_spark.operators import text as t

    # skewed mix: a=100 docs, b=25, c=4 -> weights 10/5/2, total_w=17,
    # total=129 -> targets 129*10//17=75, 129*5//17=37, 129*2//17=15
    # (c's target exceeds its 4 docs: a source can't contribute more
    # than it has — the per-source pick is capped by membership)
    rows = (
        [(i, "x", "a") for i in range(100)]
        + [(200 + i, "x", "b") for i in range(25)]
        + [(300 + i, "x", "c") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = t.temperature_sampled_corpus(df).collect()
    per = {}
    for r in got:
        per.setdefault(r.source, []).append(r.pick_rank)
    assert len(per["a"]) == 75 and sorted(per["a"]) == list(range(1, 76))
    assert len(per["b"]) == 25  # target 37 capped by membership
    assert len(per["c"]) == 4
    # deterministic: identical pick set on re-run
    again = {(r.doc_id, r.pick_rank) for r in t.temperature_sampled_corpus(df).collect()}
    assert again == {(r.doc_id, r.pick_rank) for r in got}


def test_source_quality_profile_invariants(spark, docs):
    from real_time_event_driven_data_pipeline_spark.operators import text as t

    prof = t.source_quality_profile(docs).collect()
    assert sum(r.n_docs for r in prof) == docs.count()
    # per-source pass counts agree with the filter itself
    kept = (
        t.quality_filter(docs)
        .join(docs.select("doc_id", "source"), "doc_id", "left_semi")
        .count()
    )
    assert sum(r.n_passed for r in prof) == t.quality_filter(docs).count() == kept
    for r in prof:
        assert 0 <= r.n_passed <= r.n_docs
        assert 0 <= r.pass_rate_bp <= 10000
        # a failed doc names >= 1 rule, so rule columns cover the gap
        assert (
            r.n_too_short + r.n_too_long + r.n_low_alpha
            + r.n_low_stopword + r.n_high_stopword
            >= r.n_docs - r.n_passed
        )


def test_eval_span_scrub_exploded_rebuild_matches_inrow(spark):
    """rebuild='exploded' (the book-length linear path — round-7
    ADVICE) must be bit-identical to the default in-row rebuild,
    including empty-cover docs, a fully-scrubbed doc, and overlapping
    eval runs whose covered positions union."""
    from real_time_event_driven_data_pipeline_spark.operators import decontam

    eval_docs = _mkdocs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    train = _mkdocs(
        spark,
        [
            (1, "aa bb alpha beta gamma delta epsilon cc dd"),
            (2, "xx yy zz ww vv uu"),
            (3, "beta gamma delta epsilon qq rr ss tt"),
            (4, "beta gamma delta epsilon zeta mm nn oo pp"),
            (5, "alpha beta gamma delta epsilon"),  # fully scrubbed
            (6, "alpha beta gamma delta epsilon zeta tail1 tail2"),
        ],
    )
    a = {
        r.doc_id: tuple(r)
        for r in decontam.eval_span_scrub(train, eval_docs, k=5).collect()
    }
    b = {
        r.doc_id: tuple(r)
        for r in decontam.eval_span_scrub(
            train, eval_docs, k=5, rebuild="exploded"
        ).collect()
    }
    assert a == b
    assert a[5][4] == ""  # fully-scrubbed doc rebuilds to empty text
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inrow"):
        decontam.eval_span_scrub(train, eval_docs, rebuild="nope")


def test_exact_substring_dedup_min_freq_alias(spark):
    """min_doc_freq survives as a deprecated alias of the scope-neutral
    min_freq (round-7 ADVICE): same value by either name, same result."""
    from real_time_event_driven_data_pipeline_spark.operators import dedup

    d = _mkdocs(
        spark,
        [
            (1, "p q r s t u v w"),
            (2, "p q r s t x y z"),
            (3, "p q r s t x y z"),
        ],
    )
    via_new = {
        r.doc_id: tuple(r)
        for r in dedup.exact_substring_dedup(d, min_tokens=5, min_freq=3).collect()
    }
    via_old = {
        r.doc_id: tuple(r)
        for r in dedup.exact_substring_dedup(
            d, min_tokens=5, min_doc_freq=3
        ).collect()
    }
    assert via_new == via_old
    # freq=3: the 5-run 'p q r s t' appears in all three docs -> cut
    assert via_new[1][2] > 0


def test_modality_profile_counts_and_dups(spark):
    """Per-source x per-modality dashboard: one hash agg, exact-dup
    volume = items minus distinct payloads, mean bytes int/int."""
    from real_time_event_driven_data_pipeline_spark.operators import multimodal

    media = spark.createDataFrame(
        [
            (1, "s1", "image", b"aaaa"),
            (2, "s1", "image", b"aaaa"),   # exact dup payload
            (3, "s1", "audio", b"bb"),
            (4, "s2", "image", b"cccccc"),
        ],
        "media_id long, source string, kind string, payload binary",
    )
    got = {
        (r.source, r.kind): (
            r.n_items,
            r.total_bytes,
            r.distinct_payloads,
            r.n_exact_dups,
            r.avg_bytes,
        )
        for r in multimodal.modality_profile(media).collect()
    }
    assert got == {
        ("s1", "image"): (2, 8, 1, 1, 4.0),
        ("s1", "audio"): (1, 2, 1, 0, 2.0),
        ("s2", "image"): (1, 6, 1, 0, 6.0),
    }


def test_exact_substring_dedup_rejects_both_freq_names(spark):
    """Passing both min_freq and the deprecated min_doc_freq must raise
    instead of silently clobbering the new name (review finding r8)."""
    import pytest as _pytest

    from real_time_event_driven_data_pipeline_spark.operators import dedup

    d = _mkdocs(spark, [(1, "p q r s t u")])
    with _pytest.raises(ValueError, match="not both"):
        dedup.exact_substring_dedup(d, min_freq=3, min_doc_freq=2)
    # r8 ADVICE: an explicit min_freq equal to its default (2) must ALSO
    # refuse — the old `min_freq != 2` check silently took the alias
    with _pytest.raises(ValueError, match="not both"):
        dedup.exact_substring_dedup(d, min_freq=2, min_doc_freq=5)
