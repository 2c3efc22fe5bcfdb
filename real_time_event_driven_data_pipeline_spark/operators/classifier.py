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


_STOPS = frozenset(
    ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
)


def _dense_features(
    df: DataFrame,
    dim: int,
    id_col: str,
    text_col: str,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [extra_cols...,] y, x array<long> len dim+1): signed hashed
    token counts, x[dim] = 1 (bias).  y = +1 iff the doc passes the
    rule gate.  ``extra_cols`` are passed through the Arrow stage
    untouched (r10): a consumer that needs per-doc attributes alongside
    the features (the curriculum cut needs ``source``) would otherwise
    join the corpus back to itself on the id key — two corpus-wide
    shuffles at scale for columns the featurization scan already held.

    Arrow-batched `mapInPandas` with a per-partition token -> (bucket,
    sign) memo: md5 is computed once per DISTINCT token per partition
    (Zipfian corpora hit the memo almost always), and the fold runs on
    unboxed Python ints.  This replaced two pure-Catalyst formulations
    that were semantically identical but pathological at scale: the
    per-dim `transform(sequence(dim), i -> aggregate(...))` gets its
    single-referenced hash arrays CollapseProject-inlined INTO the
    per-dim lambda (md5 re-evaluated dim times per row), and the
    allocation-light rewrite (single fold building the array
    accumulator) spent 3x its CPU time in GC from interpreted-HOF
    boxing (353 s jvmGcTime vs 147 s CPU on the 500k-doc probe).
    Interpreted HOFs never enter whole-stage codegen, so the Arrow path
    is the engine-idiomatic escape hatch — same pattern as
    `operators/inference.py`.

    Exactness is preserved (pinned by the Python-replica test and the
    DuckDB oracle): hashlib md5 == Spark md5 == DuckDB md5 on UTF-8
    bytes, and the label ratios are the same two IEEE divisions.
    ASCII-whitespace corpora tokenize identically under Python ``\\s``
    and Java ``\\s`` (both testdata and reference data are ASCII)."""
    import re

    extra_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in extra_cols
    )
    schema = f"{id_col} long{extra_schema}, y int, x array<long>"
    stops = _STOPS

    def gen(batches):
        import hashlib

        import pandas as pd

        memo: dict[str, tuple[int, int]] = {}

        def pair(tok: str) -> tuple[int, int]:
            p = memo.get(tok)
            if p is None:
                h = hashlib.md5(tok.encode("utf-8")).hexdigest()
                p = (int(h[:4], 16) % dim, 1 if int(h[4], 16) % 2 == 0 else -1)
                memo[tok] = p
            return p

        ws = re.compile(r"\s+")
        alpha = re.compile(r"[a-zA-Z]")
        for pdf in batches:
            out_y, out_x = [], []
            for txt in pdf[text_col].astype(str).values:
                toks = ws.split(txt.strip())
                x = [0] * (dim + 1)
                x[dim] = 1
                stop_hits = 0
                for t in toks:
                    b, s = pair(t)
                    x[b] += s
                    if t.lower() in stops:
                        stop_hits += 1
                n = len(toks)
                alpha_ratio = len(alpha.findall(txt)) / len(txt) if txt else 0.0
                stop_ratio = stop_hits / n
                y = (
                    1
                    if (
                        20 <= n <= 100_000
                        and alpha_ratio >= 0.5
                        and 0.01 <= stop_ratio <= 0.60
                    )
                    else -1
                )
                out_y.append(y)
                out_x.append(x)
            out = {id_col: pdf[id_col].values}
            for c in extra_cols:
                out[c] = pdf[c].values
            out["y"] = out_y
            out["x"] = out_x
            yield pd.DataFrame(out)

    return df.select(id_col, *extra_cols, text_col).mapInPandas(gen, schema)


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

    One job per iteration: a vectorized numpy partial-gradient pass
    (mapInPandas) emits ONE (dim+1)-column row per partition, a tiny
    final aggregate sums them, and the driver materializes a single
    row.  The former formulation folded the margin as a Catalyst
    higher-order function inside EVERY one of the dim+1 conditional
    SUM measures — (dim+1)² interpreted lambda calls per document per
    iteration (HOFs never enter whole-stage codegen; guide §4.2).  The
    numpy pass is the same exact wrapping-int64 arithmetic (margins
    stay far inside int64 per the module docstring), so the fitted
    weights are bit-identical."""
    import numpy as np

    w = [0] * (dim + 1)
    part_schema = ", ".join(f"g{j} long" for j in range(dim + 1))

    def _grad_partials(weights):
        W = np.asarray(weights, dtype=np.int64)

        def gen(batches):
            import pandas as pd

            g = np.zeros(len(W), np.int64)
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.stack(pdf["x"].to_numpy()).astype(np.int64)
                y = pdf["y"].to_numpy().astype(np.int64)
                miscls = y * (X @ W) <= 0
                if miscls.any():
                    g += (y[miscls, None] * X[miscls]).sum(axis=0)
            yield pd.DataFrame({f"g{j}": [g[j]] for j in range(len(W))})

        return gen

    for _ in range(iters):
        partials = feat.select("y", "x").mapInPandas(_grad_partials(w), part_schema)
        grad_row = partials.agg(
            *[F.sum(f"g{j}").alias(f"g{j}") for j in range(dim + 1)]
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
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Train the weak-label perceptron, then score every document under
    the final weights: (id, [extra_cols...,] label, margin, pred) with
    pred = +1 iff margin > 0 (ties -> -1, mirrored by the oracle).
    ``extra_cols`` ride the featurization untouched (see
    ``_dense_features``) so consumers needing per-doc attributes next
    to the scores skip the corpus self-join.

    The feature frame is computed ONCE (scoped cache, the dedup-family
    slot discipline) and serves both the training passes and the
    returned scoring plan: featurization is the query's only Python
    stage, and the r10 plan audit found the former
    "recompute-features-at-scoring" contract re-ran the Arrow
    featurization of the whole corpus a second time inside the
    returned plan (guide §1.2: don't compute things twice).  The
    returned plan referencing the cached frame is still
    self-contained — an evicted/unpersisted cache transparently
    recomputes, it can never change results.

    ``min_parallelism`` fans the docs out before featurization: a
    single-file table otherwise computes every O(dim x tokens) feature
    vector in ONE task (semantic no-op — the engine's standard
    few-split fanout, see dedup.minhash_band_buckets)."""
    from .dedup import _scoped_cache

    if min_parallelism:
        df = df.repartition(min_parallelism, id_col)
    feat = _scoped_cache(
        _dense_features(df, dim, id_col, text_col, extra_cols), "clf_features"
    )
    w = perceptron_fit(feat, dim, iters)
    margin = _margin_expr(w)
    return feat.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.col("y").alias("label"),
        margin.alias("margin"),
        F.when(margin > 0, F.lit(1)).otherwise(F.lit(-1)).cast("int").alias("pred"),
    )


def score_with_weights(
    df: DataFrame,
    weights: list[int],
    dim: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under a FROZEN weight vector: (id, label, margin,
    pred).  Stateless per-row work (Arrow featurization + a literal-array
    dot product), so the same transformation applies unchanged to a
    Structured Streaming source — `streaming.scoring.score_stream` is
    this function on a readStream frame."""
    if len(weights) != dim + 1:
        raise ValueError(f"weights must have dim+1={dim + 1} entries, got {len(weights)}")
    margin = _margin_expr(weights)
    return _dense_features(df, dim, id_col, text_col).select(
        F.col(id_col),
        F.col("y").alias("label"),
        margin.alias("margin"),
        F.when(margin > 0, F.lit(1)).otherwise(F.lit(-1)).cast("int").alias("pred"),
    )


def margin_curriculum_cut(
    df: DataFrame,
    keep_pct: int = 25,
    dim: int = 32,
    iters: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_parallelism: int | None = None,
) -> DataFrame:
    """FineWeb-style curriculum selection: keep the top ``keep_pct``%
    of documents PER SOURCE by classifier margin — per-stratum cuts
    keep rare sources represented instead of letting one source's score
    distribution swallow the budget (the same coverage argument as
    `clustering.cluster_balanced_sample`).

    Per-source quota: k_s = ceil(keep_pct * n_s / 100) (integer-exact);
    ranking is (margin desc, id) — fully deterministic.

    Scale shape: a plain window partitioned by source would move each
    source's ENTIRE membership into one task (and with k_s PROPORTIONAL
    to n_s, a per-partition top-k_s prune bounds nothing — the round-4
    verdict's funnel finding), so the rank runs through the grouped
    hierarchical window (`windows.with_grouped_row_number`): range
    partitions on (source, margin desc, id) bound every task by
    partition size, never by source size.  The per-source quotas are a
    |sources|-row broadcast join.

    Output: (source, id, margin, rk) with rk in 1..k_s.
    """
    from .windows import with_grouped_row_number

    # ``source`` rides the featurization (extra_cols) instead of being
    # joined back on the id key (r10): the former plan shuffled the
    # corpus twice through a self-join to re-attach a column the
    # featurization scan already held.  ``base`` is a cheap margin
    # projection over the scoped-cached feature frame, so its two
    # consumers (the quota aggregate and the hierarchical window's
    # ranged input) re-derive it from the cache without re-running any
    # Python stage — no extra materialization needed.
    base = quality_classifier_scores(
        df, dim, iters, id_col, text_col, min_parallelism,
        extra_cols=(source_col,),
    ).select(F.col(id_col), F.col(source_col), "margin")
    quotas = (
        base.groupBy(source_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        .select(
            source_col,
            F.expr(f"(_n * {keep_pct} + 99) div 100").alias("_k"),
        )
    )
    with_k = base.join(F.broadcast(quotas), source_col)
    ranked = with_grouped_row_number(
        with_k,
        [source_col],
        [("margin", False), (id_col, True)],
        "rk",
        # checkpoint (r11 A/B): the upstream margin projection reads the
        # already-cached feature frame, so the eager pin is cheap and
        # measured ~0.6 s faster than the cache here
        materialize="checkpoint",
    )
    return ranked.filter(F.col("rk") <= F.col("_k")).select(
        source_col, id_col, "margin", "rk"
    )
