"""Train/eval decontamination: flag training documents that share
k-gram shingles with a held-out evaluation set.

The standard LLM-corpus hygiene step (the reference pipeline has no
analogue — its scope ends at KPI aggregation, `transform.py:94-147`;
this extends the curation family of `operators/dedup.py` to the
benchmark-leakage problem): any training document containing a
verbatim k-token span from an eval document can leak benchmark
answers into the model, so it must be flagged (and usually dropped)
before training.

Scale design (the 100 TB shape):

- Both sides reduce to DISTINCT (doc, shingle) postings via the same
  built-in array exprs as the dedup family (`with_shingles`) — no
  Python, no UDFs.
- The eval side collapses to its DISTINCT shingle set.  Eval suites
  are small (thousands of docs) while the training corpus is the
  100 TB side, so that set is broadcast-joined against the training
  postings: the full corpus is filtered map-side with ZERO shuffle of
  training data.  If the eval side ever outgrows broadcast, the same
  code degrades to a shuffled left-semi join on the shingle key —
  still |postings| work, never |train| x |eval|.
- Per-doc contamination counts are one partial+final hash aggregate
  on doc_id.
- Shingles can be xxhash64-hashed (64-bit bigints) instead of strings:
  postings shrink ~4x and the broadcast set is 8 bytes/entry; the
  2^-64 collision odds are the standard trade (`dedup.with_shingles`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast

from .dedup import with_shingles


def eval_shingle_set(
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    hashed: bool = True,
    min_parallelism: int | None = None,
) -> DataFrame:
    """DISTINCT shingles across the whole eval set (column ``shingle``).

    ``min_parallelism`` fans the eval docs out before shingling: an
    eval suite read from one file otherwise shingles in ONE task, and
    that serial stage sits on the critical path of every downstream
    broadcast (semantic no-op — same rationale as the train side)."""
    if min_parallelism:
        eval_docs = eval_docs.repartition(min_parallelism, id_col)
    return (
        with_shingles(eval_docs, id_col, text_col, k=k, hashed=hashed)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )


def contaminated_ids(
    train_docs: DataFrame,
    eval_shingles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_hits: int = 1,
    hashed: bool = True,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Ids of training docs sharing >= ``min_hits`` distinct k-gram
    shingles with a PRECOMPUTED eval shingle set (``eval_shingle_set``
    output, possibly persisted across many batches — the streaming-gate
    entry point, where the eval suite is static but batches keep
    arriving)."""
    posts = with_shingles(train_docs, id_col, text_col, k=k, hashed=hashed).select(
        F.col(id_col), F.explode("shingles").alias("shingle")
    )
    ev = broadcast(eval_shingles) if broadcast_eval else eval_shingles
    return (
        posts.join(ev, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") >= min_hits)
        .select(id_col)
    )


def contamination_stats(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    hashed: bool = True,
    broadcast_eval: bool = True,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Per-training-doc overlap with the eval shingle set.

    Returns every training doc with at least one hit:
    ``(doc_id, n_shingles, n_hit, hit_ratio)`` where ``n_hit`` counts
    DISTINCT k-gram shingles of the doc that appear anywhere in the
    eval set and ``hit_ratio = n_hit / n_shingles`` (raw double
    division of exact integers — deterministic cross-engine).
    """
    # shingling parallelizes over input splits; a single-file test table
    # has one, so allow fanning the train side out first (semantic no-op
    # — see dedup.minhash_band_buckets for the full rationale)
    if min_parallelism:
        train_docs = train_docs.repartition(min_parallelism, id_col)
    train_sh = with_shingles(train_docs, id_col, text_col, k=k, hashed=hashed)
    # keep n_shingles BEFORE exploding so docs are not re-shingled later
    train_posts = train_sh.select(
        F.col(id_col),
        F.size("shingles").cast("long").alias("n_shingles"),
        F.explode("shingles").alias("shingle"),
    )
    ev = eval_shingle_set(
        eval_docs, id_col, text_col, k=k, hashed=hashed,
        min_parallelism=min_parallelism,
    )
    if broadcast_eval:
        ev = broadcast(ev)
    # left_semi keeps train postings whose shingle is in the eval set;
    # with the broadcast hint this is a map-side filter of the corpus.
    hits = train_posts.join(ev, "shingle", "left_semi")
    return (
        hits.groupBy(id_col, "n_shingles")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
        .withColumn("hit_ratio", F.col("n_hit") / F.col("n_shingles"))
        .select(id_col, "n_shingles", "n_hit", "hit_ratio")
    )


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_hits: int = 1,
    hashed: bool = True,
) -> DataFrame:
    """Training corpus with contaminated docs removed (left-anti on the
    flagged set).  ``min_hits`` tunes sensitivity: 1 drops a doc on any
    shared k-gram; larger values tolerate incidental phrase overlap."""
    flagged = (
        contamination_stats(
            train_docs, eval_docs, id_col, text_col, k=k, hashed=hashed
        )
        .filter(F.col("n_hit") >= min_hits)
        .select(id_col)
    )
    return train_docs.join(flagged, id_col, "left_anti")


def eval_span_scrub(
    train: DataFrame,
    eval_docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    rebuild: str = "inrow",
) -> DataFrame:
    """Span-grain decontamination: REMOVE eval-verbatim spans from
    training documents instead of dropping the documents.

    ``contaminated_ids`` flags whole docs for the drop policy; this is
    the salvage policy — a long, otherwise-clean document that quotes
    one benchmark answer keeps everything except the leaked span.
    Mechanically it is the Lee et al. exact-substring machinery
    (``dedup.exact_substring_dedup``) pointed at a REFERENCE corpus:
    a train token position is contaminated if it lies inside any
    k-token run whose exact text occurs anywhere in the eval suite;
    contaminated positions are cut and the document rebuilt from the
    survivors.

    Scale shape (same contract as the rest of this module): the eval
    suite's distinct k-gram md5 set is small and static -> broadcast
    left-semi against the train gram posting, so the training corpus
    is filtered map-side with ZERO train-side shuffle; covered
    positions aggregate per doc (hash agg on the id) and the rebuild
    is an in-row array filter.

    Output: (id, n_tokens, n_contaminated_tokens, contaminated_ratio,
    cleaned_text) — one row per TRAIN doc, clean docs pass through
    with ratio 0.  Deterministic (md5 grams, integer positions) ->
    DuckDB-oracle exact.

    ``rebuild`` mirrors ``exact_substring_dedup`` (bit-identical
    output, pytest-pinned): ``"inrow"`` (default) filters the token
    array against the covered-position set in-row — O(n_tokens ·
    n_covered) per doc, zero extra shuffle, right for web-document
    lengths; ``"exploded"`` explodes tokens with positions, ANTI-joins
    covered positions on (id, pos), and re-aggregates in position
    order — linear in tokens at the cost of one more shuffle, right
    for book-length documents that are heavily contaminated (where
    the in-row filter would go quadratic — round-7 ADVICE).
    """
    from .dedup import _scoped_cache
    from .text import tokens_expr

    if rebuild not in ("inrow", "exploded"):
        raise ValueError("rebuild must be 'inrow' or 'exploded'")

    def _grams(n):
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.md5(F.array_join(F.slice("_toks", i, k), " ")),
            ),
        ).otherwise(F.array().cast("array<string>"))

    etoked = eval_docs.select(tokens_expr(text_col).alias("_toks"))
    egrams = (
        etoked.select(F.explode(_grams(F.size("_toks"))).alias("g")).dropDuplicates()
    )
    toked = _scoped_cache(
        train.select(F.col(id_col), tokens_expr(text_col).alias("_toks")),
        "span_scrub_toked",
    )
    posting = toked.select(
        F.col(id_col), F.posexplode(_grams(F.size("_toks"))).alias("_p0", "g")
    ).select(F.col(id_col), (F.col("_p0") + 1).alias("pos"), "g")
    cov_pos = posting.join(broadcast(egrams), "g", "left_semi").select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("cp"),
    )
    if rebuild == "exploded":
        n_cov = cov_pos.dropDuplicates([id_col, "cp"]).groupBy(id_col).agg(
            F.count(F.lit(1)).cast("long").alias("_ncov")
        )
        toks_pos = toked.select(
            F.col(id_col), F.posexplode("_toks").alias("_p0", "_tok")
        ).select(F.col(id_col), (F.col("_p0") + 1).cast("int").alias("pos"), "_tok")
        kept = toks_pos.join(
            cov_pos.withColumnRenamed("cp", "pos"), [id_col, "pos"], "left_anti"
        )
        cleaned = kept.groupBy(id_col).agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_tok"))),
                    lambda x: x["_tok"],
                ),
                " ",
            ).alias("_cleaned")
        )
        ncov = F.coalesce(F.col("_ncov"), F.lit(0).cast("long"))
        return (
            toked.join(n_cov, id_col, "left")
            .join(cleaned, id_col, "left")
            .select(
                F.col(id_col),
                F.size("_toks").cast("long").alias("n_tokens"),
                ncov.alias("n_contaminated_tokens"),
                F.when(F.size("_toks") > 0, ncov / F.size("_toks"))
                .otherwise(F.lit(0.0))
                .alias("contaminated_ratio"),
                F.coalesce(F.col("_cleaned"), F.lit("")).alias("cleaned_text"),
            )
        )
    cov = cov_pos.groupBy(id_col).agg(F.collect_set("cp").alias("_cov"))
    covered = F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
    return toked.join(cov, id_col, "left").select(
        F.col(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.size(covered).cast("long").alias("n_contaminated_tokens"),
        F.when(F.size("_toks") > 0, F.size(covered) / F.size("_toks"))
        .otherwise(F.lit(0.0))
        .alias("contaminated_ratio"),
        F.array_join(
            F.filter(
                F.col("_toks"),
                lambda x, i: ~F.array_contains(covered, (i + 1).cast("int")),
            ),
            " ",
        ).alias("cleaned_text"),
    )
