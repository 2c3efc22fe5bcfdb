"""Distributed quality-classifier TRAINING (full-batch integer
perceptron over hashed text features).

`operators/inference.py` covers the *scoring* side of the "model in
the loop" curation pattern (FineWeb-Edu, DCLM: train a small quality
classifier, score the whole corpus, keep the top slice).  This module
covers the *training* side with the same engine discipline the k-means
stage established (`operators/clustering.py`): every quantity is an
exact 64-bit integer, so the fit is independent of partitioning,
accumulation order, and engine — DuckDB-oracle-certifiable end to end.

Model: a linear classifier w over feature-hashed token counts
(`text.hashed_embedding_weights` convention: bucket = md5-hex mod dim,
sign = parity hex digit) plus a constant bias feature, trained by
FULL-BATCH perceptron updates:

    w_0 = 0
    for t in 1..iters:
        margin(d)  = <w_{t-1}, x_d>                (integer dot)
        w_t = w_{t-1} + sum_{d : y_d * margin(d) <= 0} y_d * x_d

Full-batch (not SGD) is the scale-correct choice AND the determinism
choice: the update is a pure sum over documents, so it needs no
ordering guarantee and partial-aggregates map-side.  Weak labels come
from the C4/Gopher rule gate (`text.quality_filter` thresholds):
y = +1 iff the doc passes — the standard bootstrap for a learned gate
when no human labels exist.

Scale shape per iteration (same as a Lloyd's step):
- weights live on the driver (dim+1 <= 33 longs) and fold into the
  margin expression as ONE literal array — broadcast by the plan, the
  corpus is never shuffled;
- the gradient is a single hash aggregate with dim+1 SUM measures:
  map-side partials reduce every partition to ONE row before the
  exchange, so the shuffle is `partitions` rows per iteration
  regardless of corpus size;
- the driver sees exactly one (dim+1)-column row per iteration.

Bounds: |x_dj| <= tokens(d), |w_j| grows by at most the corpus token
count per iteration — with iters <= ~5 and <= 1e13 tokens the margins
stay far inside int64.

No analogue in the reference (`transform.py:28-227` has no ML ops);
extends SURVEY §2's LLM-pipeline family.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from . import text


def _dense_features(
    df: DataFrame, dim: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, y, x array<long> len dim+1): signed hashed token counts,
    x[dim] = 1 (bias).  y = +1 iff the doc passes the rule gate.

    Shuffle-free: the whole feature vector is a per-row array
    expression (buckets/signs materialized first — the with_shingles
    rule), and the label is a per-row predicate on exact int/int
    ratios (the proven `quality_filtered_docs` condition set)."""
    toked = df.select(
        F.col(id_col), F.col(text_col), text.tokens_expr(text_col).alias("_toks")
    )

    def _bucket(t: Column) -> Column:
        return (F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long") % dim).cast(
            "int"
        )

    def _sign(t: Column) -> Column:
        return F.when(
            F.conv(F.substring(F.md5(t), 5, 1), 16, 10).cast("long") % 2 == 0,
            F.lit(1),
        ).otherwise(F.lit(-1))

    n_tokens = F.size("_toks")
    n_alpha = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "[a-zA-Z]", "")
    )
    alpha_ratio = n_alpha.cast("double") / F.length(F.col(text_col)).cast("double")
    stop_hits = F.size(
        F.filter(
            "_toks",
            lambda x: F.lower(x).isin(
                "the", "a", "and", "of", "to", "in", "is", "it", "that", "for"
            ),
        )
    )
    stop_ratio = stop_hits.cast("double") / n_tokens.cast("double")
    passes = (
        (n_tokens >= 20)
        & (n_tokens <= 100_000)
        & (alpha_ratio >= 0.5)
        & (stop_ratio >= 0.01)
        & (stop_ratio <= 0.60)
    )

    hashed = toked.select(
        F.col(id_col),
        F.when(passes, F.lit(1)).otherwise(F.lit(-1)).alias("y"),
        F.transform("_toks", _bucket).alias("_bs"),
        F.transform("_toks", _sign).alias("_ss"),
    )
    vec = F.concat(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.aggregate(
                F.zip_with("_bs", "_ss", lambda b, s: F.when(b == i, s).otherwise(0)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        ),
        F.array(F.lit(1).cast("long")),  # bias
    )
    return hashed.select(F.col(id_col), "y", vec.alias("x"))


def _margin_expr(weights: list[int]) -> Column:
    """<w, x> with w folded in as ONE literal array (one py4j call)."""
    lit = "array(" + ",".join(f"{int(v)}L" for v in weights) + ")"
    return F.aggregate(
        F.zip_with(F.col("x"), F.expr(lit), lambda xi, wi: xi * wi),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def perceptron_fit(feat: DataFrame, dim: int, iters: int) -> list[int]:
    """Run ``iters`` full-batch perceptron updates over the prepared
    feature frame; returns the final integer weight vector (len dim+1).

    One hash aggregate per iteration; the driver materializes only the
    (dim+1)-column gradient row."""
    w = [0] * (dim + 1)
    for _ in range(iters):
        miscls = F.col("y").cast("long") * _margin_expr(w) <= 0
        grad_row = feat.agg(
            *[
                F.sum(
                    F.when(
                        miscls,
                        F.col("y").cast("long") * F.element_at("x", j + 1),
                    ).otherwise(F.lit(0).cast("long"))
                ).alias(f"g{j}")
                for j in range(dim + 1)
            ]
        ).collect()[0]
        w = [w[j] + int(grad_row[j] or 0) for j in range(dim + 1)]
    return w


def quality_classifier_scores(
    df: DataFrame,
    dim: int = 32,
    iters: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Train the weak-label perceptron, then score every document under
    the final weights: (id, label, margin, pred) with pred = +1 iff
    margin > 0 (ties -> -1, mirrored by the oracle).

    The feature frame is computed once and cached for the training
    passes (scoped persist, released before returning the score plan —
    scoring recomputes features map-side, keeping the returned plan
    self-contained and cache-free).

    ``min_parallelism`` fans the docs out before featurization: a
    single-file table otherwise computes every O(dim x tokens) feature
    vector in ONE task (semantic no-op — the engine's standard
    few-split fanout, see dedup.minhash_band_buckets)."""
    if min_parallelism:
        df = df.repartition(min_parallelism, id_col)
    feat = _dense_features(df, dim, id_col, text_col)
    cached = feat.persist()
    try:
        w = perceptron_fit(cached, dim, iters)
    finally:
        try:
            cached.unpersist()
        except Exception:
            pass
    margin = _margin_expr(w)
    return _dense_features(df, dim, id_col, text_col).select(
        F.col(id_col),
        F.col("y").alias("label"),
        margin.alias("margin"),
        F.when(margin > 0, F.lit(1)).otherwise(F.lit(-1)).cast("int").alias("pred"),
    )
