"""Sparse lexical search: keyword top-k over the document corpus.

The dense complement lives in ``similarity.py`` (brute-force / LSH /
IVF / quantized ANN over embeddings); this is the inverted-index side
of a retrieval stack — tf-idf-weighted keyword scoring, expressed as
pure DataFrame ops (explode -> broadcast term filter -> two hash
aggregates -> per-query top-k).

Scoring uses INTEGER idf weights: ``idf = (S * (N + 1)) div (df + 1)``
with scale S = 1e6 and ``score = sum(tf * idf)`` over the query's
distinct terms.  Integer math keeps the result bit-identical across
engines (the DuckDB oracle mirrors it with ``//``), which is what the
correctness gate hashes; a production variant would use float BM25
(k1/b saturation) — the plan shape is identical, only the scoring
expression changes.

Scale notes: the corpus is tokenized ONCE and immediately filtered
map-side against the broadcast query-term set, so the first shuffle
moves only postings of queried terms (|docs containing a query term|,
not |corpus tokens|).  df/idf are per-term aggregates of that same
narrow relation; the final top-k moves k rows per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def keyword_search_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    idf_scale: int = 1_000_000,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` docs per query by integer tf-idf.

    ``queries``: (query_id, term) pairs — one row per DISTINCT query
    term (duplicate terms in a query would double-count; dedup
    upstream).  Output: (query_id, doc_id, score, rank), docs matching
    at least one term, ties broken by doc id.

    ``max_df`` is the stop-term cap for 100 TB corpora: a query term
    matching more than ``max_df`` documents is dropped from scoring —
    its postings would dominate the shuffle while contributing the
    LEAST discriminating signal (idf is lowest exactly when df is
    highest, the standard IR stop-term argument).  ``None`` (default)
    scores every term — the oracle-parity setting.
    """
    from .dedup import _scoped_cache

    terms = queries.select("term").dropDuplicates()
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("term"),
    ).filter(F.col("term") != "")
    # map-side semi filter: only queried terms survive the explode
    postings = toks.join(F.broadcast(terms), "term", "left_semi")
    # pinned: tf feeds BOTH the per-term df aggregate and the scoring
    # join — uncached, the corpus tokenization + posting filter run
    # twice (r10 plan audit).  Bounded: one row per (matching doc,
    # queried term), never O(corpus tokens).
    tf = _scoped_cache(
        postings.groupBy(id_col, "term").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        ),
        "search_tf",
    )
    df_per_term = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")  # tf is one row per doc
    )
    if max_df is not None:
        df_per_term = df_per_term.filter(F.col("df") <= max_df)
    n_docs = docs.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    idf = df_per_term.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.expr(f"{idf_scale}L * (n_docs + 1) div (df + 1)").alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(F.broadcast(queries), "term")
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("tf") * F.col("idf")).cast("long").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def rerank_topk(
    candidates: DataFrame,
    doc_scores: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Stage 2 of a two-stage retrieval stack: re-order each query's
    stage-1 candidates by a model score (cross-encoder / quality
    classifier pattern — cheap recall-oriented retrieval over the whole
    corpus, expensive precision-oriented scoring over candidates only).

    ``candidates``: (query_id, doc_id, score, rank) from
    ``keyword_search_topk`` (or an ANN variant); ``doc_scores``:
    (doc_id, model_score) — computed over the CANDIDATE docs only, a
    |queries| x k_retrieve bounded relation, so the join broadcasts and
    the expensive model never sees the corpus.  Ties: model_score desc,
    stage-1 score desc, then doc id.  Output: (query_id, doc_id,
    lex_score, model_score, rerank).
    """
    rr = candidates.join(F.broadcast(doc_scores), id_col)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("model_score"), F.desc("score"), F.col(id_col)
    )
    return (
        rr.withColumn("rerank", F.row_number().over(w).cast("int"))
        .filter(F.col("rerank") <= k)
        .select(
            "query_id",
            id_col,
            F.col("score").alias("lex_score"),
            "model_score",
            "rerank",
        )
    )


def dense_hash_search_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    dim: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dense retrieval twin of ``keyword_search_topk`` over the
    feature-hashed embedding space (`text.hashed_embedding_weights`):
    score(q, d) = <q_vec, d_vec> as an exact INTEGER dot product of the
    signed hashed token counts, so the ranking is bit-identical across
    engines (float cosine ANN lives in ``similarity.py``; this is the
    retrieval-stack member that composes with RRF fusion).

    ``query_terms``: (query_id, term) — the query's bag of words.
    The query embedding is vocab-hashed exactly like documents, stays
    |queries| x dim rows, and broadcasts; the dot product is a sparse
    equi-join on the bucket key (docs with zero overlapping buckets
    cannot rank).  Output: (query_id, doc_id, dense_score, rank).
    """
    from . import text as _text

    demb = _text.hashed_embedding_weights(docs, dim=dim, id_col=id_col, text_col=text_col)
    h = F.md5(F.col("term"))
    bucket = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % dim).cast("int")
    sign = F.when(
        F.conv(F.substring(h, 5, 1), 16, 10).cast("long") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    qemb = (
        query_terms.select("query_id", bucket.alias("bucket"), sign.alias("sign"))
        .groupBy("query_id", "bucket")
        .agg(F.sum("sign").cast("long").alias("qw"))
    )
    dots = (
        demb.join(F.broadcast(qemb), "bucket")
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("weight") * F.col("qw")).cast("long").alias("dense_score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dense_score"), F.col(id_col))
    return (
        dots.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "dense_score", "rank")
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    k_retrieve: int = 20,
    rrf_k: int = 60,
    dim: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.,
    "Reciprocal rank fusion outperforms Condorcet and individual rank
    learning methods"): run the lexical tf-idf ranking and the dense
    hashed-embedding ranking to depth ``k_retrieve`` each, then fuse

        rrf(d) = sum over systems of 1 / (rrf_k + rank_system(d))

    (missing from a system contributes 0).  Both per-system ranks are
    integer-exact; the fusion is two correctly-rounded IEEE divisions
    plus one add, mirrored verbatim by the oracle, so even the fused
    ORDER is engine-identical (ties -> doc id).

    Scale shape: each system's result is |queries| x k_retrieve rows —
    the fusion join and final window touch only bounded relations; the
    corpus is scanned once per system.  Output: (query_id, doc_id,
    lex_rank, dense_rank, rrf_score, rank), top ``k`` per query.

    ``min_parallelism`` fans the docs out once for BOTH arms — a
    single-file corpus otherwise tokenizes twice in one task each
    (semantic no-op, the engine's standard few-split fanout).
    """
    if min_parallelism:
        docs = docs.repartition(min_parallelism, id_col)
    lex = keyword_search_topk(
        docs, query_terms, k=k_retrieve, id_col=id_col, text_col=text_col
    ).select("query_id", id_col, F.col("rank").alias("lex_rank"))
    dense = dense_hash_search_topk(
        docs, query_terms, k=k_retrieve, dim=dim, id_col=id_col, text_col=text_col
    ).select("query_id", id_col, F.col("rank").alias("dense_rank"))
    fused = lex.join(dense, ["query_id", id_col], "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("dense_rank")), F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.col(id_col))
    return (
        fused.withColumn("rrf_score", rrf)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "lex_rank", "dense_rank", "rrf_score", "rank")
    )
