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
