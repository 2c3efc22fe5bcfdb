"""Similarity search over embedding columns (array<float>).

Determinism contract: embeddings are cast element-wise to double
*before* any arithmetic; dot products are in-order left folds
(``F.aggregate`` over ``zip_with``), so every engine doing in-order
double accumulation produces identical bits (verified exact vs DuckDB
``list_dot_product`` on DOUBLE[]).  Cosines are emitted unrounded.

Scale design:
- ``cosine_topk`` broadcasts the (small) query set against the corpus —
  one pass, no corpus shuffle; ranking is a per-query top-k window.
- ``embedding_similar_pairs`` is the exact all-pairs path: a
  triangle-blocked self-join (each block-pair scored by one task, BLAS
  inside, in-order re-score on emit) — distributed, O(1) driver memory.
- ``lsh_bucket_ann`` is the 100 TB path: random-hyperplane sign
  buckets (deterministic seeded planes) -> candidates share a bucket ->
  exact re-scoring of candidates only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """In-order double fold of the element-wise product."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def _inorder_dot(a, b) -> float:
    """Left-to-right IEEE-double fold — bit-identical to Spark's
    ``F.aggregate`` fold and DuckDB's ``list_dot_product``."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def embedding_similar_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact near-duplicate pairs: cosine >= threshold, id_a < id_b.

    Triangle-blocked distributed self-join — nothing is collected to the
    driver.  Each vector is hashed into one of ``n_blocks`` blocks and
    replicated to the ``n_blocks`` unordered block-pairs it participates
    in, so every global pair (x, y) is scored by exactly one task: the
    one owning block-pair (min(bx, by), max(bx, by)).  Per task, one
    BLAS matmul scores the a-side block against the b-side block; the
    (few) candidates above ``threshold - margin`` are re-scored with the
    in-order fold so emitted values are bit-exact vs the oracle.

    Cost model at scale: shuffle volume = n_blocks * |corpus| rows,
    n_blocks*(n_blocks+1)/2 independent tasks of (n/n_blocks)^2 BLAS
    work, O(block^2 / n_blocks^2) peak task memory, O(1) driver memory.
    Grow ``n_blocks`` ~ sqrt(cluster cores) so tasks stay cache-sized.
    All-pairs exact is inherently O(n^2); past ~1e7 vectors use
    ``lsh_bucket_ann`` — that is the 100 TB path.
    """
    import math

    nb = int(n_blocks)
    e = emb.select(
        F.col(id_col).alias("_id"),
        as_double(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int").alias("_blk"),
    )
    # replicate each vector to its nb unordered block-pairs; the pair
    # keys {min(b,j)*nb + max(b,j) : j in 0..nb-1} are all distinct, so
    # replication is exactly nb copies per row with no dedup needed
    rep = e.select(
        "_id",
        "v",
        "_blk",
        F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("_j"),
    ).select(
        "_id",
        "v",
        "_blk",
        (F.least("_blk", "_j") * nb + F.greatest("_blk", "_j")).alias("_bp"),
    )

    out_schema = "id_a bigint, id_b bigint, cos_sim double"

    def _score(key, pdf):
        bp = int(key[0])
        bi, bj = divmod(bp, nb)
        if pdf.empty:
            return pd.DataFrame(columns=["id_a", "id_b", "cos_sim"])
        a = pdf[pdf["_blk"] == bi]
        b = a if bi == bj else pdf[pdf["_blk"] == bj]
        if a.empty or b.empty:
            return pd.DataFrame(columns=["id_a", "id_b", "cos_sim"])
        ids_a = a["_id"].to_numpy()
        ids_b = b["_id"].to_numpy()
        mat_a = np.stack(a["v"].to_numpy()).astype(np.float64)
        mat_b = np.stack(b["v"].to_numpy()).astype(np.float64)
        norm_a = mat_a / np.sqrt((mat_a * mat_a).sum(axis=1))[:, None]
        norm_b = mat_b / np.sqrt((mat_b * mat_b).sum(axis=1))[:, None]
        sims = norm_a @ norm_b.T
        # each unordered pair occurs once across tasks; within the
        # diagonal task it occurs twice (i,j)/(j,i), so keep id_a < id_b
        # there; off-diagonal tasks see it once — normalize order on emit
        if bi == bj:
            cand = (sims >= threshold - 1e-6) & (ids_a[:, None] < ids_b[None, :])
        else:
            cand = sims >= threshold - 1e-6
        rows = []
        for i, j in zip(*np.nonzero(cand)):
            va, vb = mat_a[i], mat_b[j]
            cos = _inorder_dot(va, vb) / math.sqrt(
                _inorder_dot(va, va) * _inorder_dot(vb, vb)
            )
            if cos >= threshold:
                ia, ib = int(ids_a[i]), int(ids_b[j])
                rows.append((min(ia, ib), max(ia, ib), cos))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "cos_sim"])

    return rep.groupBy("_bp").applyInPandas(_score, schema=out_schema)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force top-k neighbors per query vector.

    The query side is broadcast (queries are small by construction);
    the corpus is scanned once with no shuffle until the final per-query
    top-k, which moves only k rows per query.  Ties broken by id.
    """
    c = corpus.select(F.col(id_col), as_double(vec_col).alias("v"))
    q = queries.select(F.col(query_id_col), as_double(vec_col).alias("qv"))
    scored = c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).select(
        query_id_col, id_col, cosine(F.col("qv"), F.col("v")).alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def hard_negative_topk(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-k most-cosine-similar corpus vectors whose LABEL DIFFERS — the
    negatives that sit closest to the decision boundary, the standard
    negative-sampling step for embedding/reranker training.

    Same scale shape as ``cosine_topk``: the anchor set is small by
    construction and broadcast; the corpus is scanned once with no
    shuffle until the per-anchor top-k (k rows per anchor move).  Rows
    with a null label on either side are excluded (SQL ``<>``
    three-valued semantics, mirrored by the oracle).
    """
    c = corpus.select(
        F.col(id_col), F.col(label_col).alias("_cl"), as_double(vec_col).alias("v")
    )
    q = anchors.select(
        F.col(query_id_col),
        F.col(label_col).alias("_ql"),
        as_double(vec_col).alias("qv"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col(id_col) != F.col(query_id_col)) & (F.col("_cl") != F.col("_ql")),
    ).select(
        query_id_col,
        id_col,
        F.col("_cl").alias("neg_label"),
        cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "neg_label", "cos_sim", "rank")
    )


def _lsh_signature_udf(planes: np.ndarray):
    """Arrow-vectorized signature: one numpy matmul per batch, emitting
    ``array<bigint>`` of n_tables bucket ids ((table_idx << n_planes) | bits).

    A Column-expression formulation of the same thing expands to
    n_tables*n_planes*dim codegen terms (~10 MiB task binaries at
    dim=64); the Pandas UDF keeps the plan small and the math in BLAS.
    """
    n_tables, n_planes, _dim = planes.shape
    flat = planes.reshape(n_tables * n_planes, -1).T  # (dim, T*P)
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    table_tag = (np.arange(n_tables, dtype=np.int64) << n_planes)

    @F.pandas_udf("array<bigint>")
    def sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (batch, dim) float64
        bits = (mat @ flat >= 0).reshape(len(v), n_tables, n_planes)
        buckets = (bits * weights).sum(axis=2) + table_tag  # (batch, T)
        return pd.Series(list(buckets))

    return sig


def _lsh_signature_udf_lazy(seed: int, n_tables: int, n_planes: int):
    """Like ``_lsh_signature_udf`` but the hyperplanes are generated ON
    THE EXECUTOR from (seed, observed dim) at first batch — so building
    the plan triggers no driver action to discover the vector length.
    Every executor derives the identical planes (seeded PRNG, and all
    vectors in a column share one dim), so signatures stay consistent
    across partitions and across the corpus/query sides.
    """
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    table_tag = (np.arange(n_tables, dtype=np.int64) << n_planes)

    @F.pandas_udf("array<bigint>")
    def sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (batch, dim) float64
        dim = mat.shape[1]
        planes = np.random.default_rng(seed).standard_normal((n_tables, n_planes, dim))
        flat = planes.reshape(n_tables * n_planes, dim).T  # (dim, T*P)
        bits = (mat @ flat >= 0).reshape(len(v), n_tables, n_planes)
        buckets = (bits * weights).sum(axis=2) + table_tag  # (batch, T)
        return pd.Series(list(buckets))

    return sig


def _nearest_centroids_udf(centroids: np.ndarray, n_probe: int):
    """Arrow-vectorized assignment: ids of the n_probe nearest centroids
    (by cosine) per vector, as array<int>."""
    cent_norm = centroids / np.sqrt((centroids * centroids).sum(axis=1))[:, None]

    @F.pandas_udf("array<int>")
    def assign(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
        sims = mat @ cent_norm.T
        # argsort descending, take n_probe; deterministic tie-break by id
        top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return assign


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
    max_rows: int = 100_000,
    n_iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Deterministic spherical k-means on a *bounded* corpus sample.

    Driver-side numpy is fine here because IVF training is O(sample),
    never O(corpus): the materialized sample is hard-capped at
    ``max_rows`` (``limit`` short-circuits the scan after enough rows),
    so driver memory stays bounded no matter the corpus size.  For a
    statistically spread sample at 100 TB pass ``sample_fraction`` ~
    max_rows/|corpus| (the fraction-sample runs distributed *before*
    the cap), or swap in pyspark.ml.clustering.KMeans.

    Spherical (unit-norm data + centroids, assign by max dot product)
    because the search metric is cosine — Euclidean cells misalign with
    cosine neighborhoods when vector norms vary.
    """
    sample = corpus.select(as_double(vec_col).alias("v"))
    if sample_fraction < 1.0:
        sample = sample.sample(fraction=sample_fraction, seed=seed)
    if max_rows is not None:
        sample = sample.limit(int(max_rows))
    mat = np.stack(sample.toPandas()["v"].to_numpy()).astype(np.float64)
    mat = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=n_centroids, replace=False)].copy()
    for _ in range(n_iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / np.sqrt((m * m).sum())
    return cent


def ivf_ann(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned into centroid cells
    (inverted file), queries probe their n_probe nearest cells, exact
    cosine re-scores cell members only.

    The scale path complement to ``lsh_bucket_ann``: cell assignment is
    data-adaptive (k-means) rather than data-oblivious (hyperplanes),
    so clustered corpora get much tighter candidate sets.  The cell
    equi-join shuffles only cell ids + vectors, and each query touches
    n_probe/n_centroids of the corpus.
    """
    assign1 = _nearest_centroids_udf(centroids, 1)
    assignp = _nearest_centroids_udf(centroids, n_probe)
    c = corpus.select(F.col(id_col), as_double(vec_col).alias("v"))
    q = queries.select(F.col(query_id_col), as_double(vec_col).alias("qv"))
    c_cells = c.select(id_col, "v", F.explode(assign1(F.col("v"))).alias("cell"))
    q_cells = q.select(query_id_col, "qv", F.explode(assignp(F.col("qv"))).alias("cell"))
    cand = (
        c_cells.join(F.broadcast(q_cells), "cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(
        query_id_col, id_col, cosine(F.col("qv"), F.col("v")).alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def lsh_bucket_ann(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int | None = None,
    n_planes: int = 5,
    n_tables: int = 16,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets, exact re-score
    of bucket-sharing candidates.  Deterministic (seeded planes).

    At 100 TB the bucket equi-join replaces the corpus-wide scan per
    query: each query probes its n_tables posting lists only, and the
    candidate set (not the corpus) pays the exact-cosine cost.  Tune
    n_planes up as corpus density grows (bucket occupancy ~ N/2^p).

    ``dim=None`` (default) defers hyperplane generation to the
    executors (seeded, hence identical everywhere) so that building
    this plan performs NO driver action; pass an explicit dim only to
    pin plane reuse against a separately-built signature table.
    """
    if dim is None:
        sig = _lsh_signature_udf_lazy(seed, n_tables, n_planes)
    else:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_tables, n_planes, dim))
        sig = _lsh_signature_udf(planes)

    c = corpus.select(F.col(id_col), as_double(vec_col).alias("v"))
    q = queries.select(F.col(query_id_col), as_double(vec_col).alias("qv"))
    c_post = c.select(id_col, "v", F.explode(sig(F.col("v"))).alias("bucket"))
    q_post = q.select(query_id_col, "qv", F.explode(sig(F.col("qv"))).alias("bucket"))

    cand = (
        c_post.join(F.broadcast(q_post), "bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(query_id_col, id_col, cosine(F.col("qv"), F.col("v")).alias("cos_sim"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def semantic_dedup_clusters(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_blocks: int = 8,
) -> DataFrame:
    """Embedding-space near-duplicate clustering: exact cosine pairs
    (triangle-blocked, ``embedding_similar_pairs``) -> connected
    components -> (vec_id, component, cluster_size).

    The semantic complement to the lexical MinHash/SimHash family: two
    documents whose embeddings sit above ``threshold`` cluster together
    even with zero shingle overlap.  The canonical keeper of a cluster
    is its minimum id (== ``component``), so downstream curation drops
    ``vec_id != component`` rows — same contract as the lexical
    ``near_dup_clusters``.
    """
    from .components import near_dup_clusters

    pairs = embedding_similar_pairs(
        emb, id_col=id_col, vec_col=vec_col, threshold=threshold, n_blocks=n_blocks
    )
    return near_dup_clusters(pairs).withColumnRenamed("doc_id", id_col)


def _md5_planes(n_tables: int, n_planes: int, dim: int) -> list:
    """Deterministic pseudo-random hyperplanes from md5 — coefficient
    (t, p, d) = (int(md5("t-p-d")[:8], 16) % 2001 - 1000) / 1000.0,
    uniform-ish on [-1, 1].  The md5-hex portability convention (same
    as ``hashed_doc_embeddings``): an ANSI-SQL oracle derives the
    IDENTICAL planes with string md5 + integer arithmetic, so the whole
    LSH composition is engine-independent — unlike the seeded-PRNG
    planes of ``lsh_bucket_ann``, which are numpy-only."""
    import hashlib

    return [
        [
            [
                (
                    int(
                        hashlib.md5(f"{t}-{p}-{d}".encode()).hexdigest()[:8], 16
                    )
                    % 2001
                    - 1000
                )
                / 1000.0
                for d in range(dim)
            ]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def lsh_planes_for_corpus(
    n_vectors: int,
    target_bucket_size: int = 64,
    floor: int = 3,
    cap: int = 24,
) -> int:
    """Production plane-count sizing: ``ceil(log2(n / target_bucket_
    size))``, floored at the test-scale recall setting and capped at 24
    bits (r8 verdict item 4 — this rule previously lived only in a
    docstring; the first real deployment could run near-all-pairs by
    keeping a test-scale plane count).

    Rationale: each table splits the corpus into ~2^n_planes sign-bit
    buckets, so expected occupancy is ~n / 2^n_planes and candidate
    volume ~n_tables * n * occupancy / 2.  Holding occupancy at a
    constant ``target_bucket_size`` keeps candidates linear in n —
    tracking true near-dup volume instead of corpus^2.  Recall loss per
    added plane is recovered across ``n_tables`` OR-ed tables: at 16
    tables x 7 planes, a realistic cos~0.86 duplicate pair is missed
    with prob (1 - 0.83^7)^16 ~ 0.7% (probed: recall 1.0 at 10x)."""
    import math

    if n_vectors <= target_bucket_size:
        return floor
    return max(floor, min(cap, math.ceil(math.log2(n_vectors / target_bucket_size))))


def _warn_if_dense(n_tables: int, n_planes: int) -> None:
    """Loudly flag settings that are quadratic-ish BY CONSTRUCTION:
    under even the best case (uniform bucket occupancy — clustered
    real data is denser), candidate fraction ~ n_tables / 2^n_planes,
    so >= 0.5 there means the pair join approaches all-pairs on any
    large corpus regardless of data.  Warning, not error: at test
    scale a dense recall-oriented setting is a legitimate choice (the
    registered driver query runs 16x3 on a 500-5000 vector corpus)."""
    import warnings

    if n_tables / (1 << n_planes) >= 0.5:
        warnings.warn(
            f"LSH settings n_tables={n_tables}, n_planes={n_planes} give a "
            f"best-case candidate fraction ~{n_tables / (1 << n_planes):.2f} "
            "of all-pairs — fine for test-scale recall, quadratic at corpus "
            "scale; pass n_planes=None to auto-size from the corpus count "
            "(lsh_planes_for_corpus)",
            stacklevel=3,
        )


def _cosine_verify_udf(threshold: float):
    """Arrow-batched exact-cosine verifier shared by the batch LSH
    cluster operator and the arrival-time embedding gate: BLAS for the
    bulk, with any cosine within 1e-9 of ``threshold`` re-scored by the
    in-order fold so DECISIONS are bit-exact vs the oracle's
    ``list_dot_product`` semantics (the float64 64-term summation error
    bound is ~1e-12 — see ``semantic_dedup_clusters_lsh``)."""
    import math

    thr = float(threshold)

    @F.pandas_udf("boolean")
    def passes(va: pd.Series, vb: pd.Series) -> pd.Series:
        a = np.stack(va.to_numpy()).astype(np.float64)
        b = np.stack(vb.to_numpy()).astype(np.float64)
        cos = (a * b).sum(axis=1) / np.sqrt(
            (a * a).sum(axis=1) * (b * b).sum(axis=1)
        )
        out = cos >= thr
        for i in np.nonzero(np.abs(cos - thr) < 1e-9)[0]:
            c = _inorder_dot(a[i], b[i]) / math.sqrt(
                _inorder_dot(a[i], a[i]) * _inorder_dot(b[i], b[i])
            )
            out[i] = c >= thr
        return pd.Series(out)

    return passes


def _gram_block_pairs(
    ids: np.ndarray,
    V: np.ndarray,
    thr: float,
    blk: int = 2048,
    keep_rows: np.ndarray | None = None,
) -> tuple[list, list]:
    """All (ids[i], ids[j]) with i < j and cosine(V[i], V[j]) >= thr,
    computed in blk x blk BLAS gram slabs — the per-bucket verifier of
    ``semantic_dedup_clusters_lsh``, module-level so the slab-boundary
    arithmetic is testable directly.  ``ids`` must be sorted ascending.

    BOTH gram dimensions are chunked (r11, ADVICE r10): a blk x n slab
    grows linearly with bucket size, so one pathological near-constant-
    embedding bucket would OOM its task; blk x blk bounds the slab at
    32 MB of doubles regardless of bucket size.  (V itself remains
    O(bucket_size x dim) — inherent to grouping the bucket into one
    task; see the Scale-shape docstring of the caller.)  Decisions are
    bit-identical to the per-pair verifier: any cosine within 1e-9 of
    ``thr`` is re-scored with the exact in-order fold.  Rows whose ids
    are EQUAL (an upstream contract violation) are skipped, matching
    the strict id_a < id_b filter of the per-pair verifier this
    replaced.

    ``keep_rows`` (optional bool mask aligned with ``ids``): emit only
    pairs where AT LEAST ONE endpoint is marked — the arrival-time
    gate's "involves a new record" restriction, applied inside the slab
    so (history, history) pairs never materialize."""
    import math

    n = len(ids)
    norms = (V * V).sum(axis=1)
    out_a: list = []
    out_b: list = []
    for s in range(0, n, blk):
        rows_blk = V[s : s + blk]
        for t in range(s, n, blk):
            cos = (rows_blk @ V[t : t + blk].T) / np.sqrt(
                norms[s : s + blk][:, None] * norms[t : t + blk][None, :]
            )
            for bi in range(rows_blk.shape[0]):
                i = s + bi
                # only columns with global index > i form (a < b) pairs
                lo = max(i + 1 - t, 0)
                row = cos[bi, lo:]
                if not row.size:
                    continue
                base = t + lo  # global index of row[0]
                hits = np.nonzero(row >= thr)[0]
                border = np.nonzero(np.abs(row - thr) < 1e-9)[0]
                if border.size:
                    keep = set(hits.tolist()) - set(border.tolist())
                    for j in border:
                        a, b = V[i], V[base + j]
                        c = _inorder_dot(a, b) / math.sqrt(
                            _inorder_dot(a, a) * _inorder_dot(b, b)
                        )
                        if c >= thr:
                            keep.add(int(j))
                    hits = np.fromiter(sorted(keep), dtype=np.int64)
                if hits.size:
                    hits = hits[ids[base + hits] != ids[i]]
                if hits.size and keep_rows is not None and not keep_rows[i]:
                    hits = hits[keep_rows[base + hits]]
                if hits.size:
                    out_a.extend([ids[i]] * hits.size)
                    out_b.extend(ids[base + hits])
    return out_a, out_b


def semantic_dedup_clusters_lsh(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_tables: int = 8,
    n_planes: int | None = 4,
    max_bucket_size: int | None = None,
    allow_dense: bool = False,
) -> DataFrame:
    """THE 100 TB semantic-dedup path: LSH-bucketed candidate pairs ->
    exact cosine re-verification -> connected components.

    ``semantic_dedup_clusters`` routes through the exact triangle-
    blocked all-pairs join — inherently O(n^2), capped ~1e7 vectors by
    its own docstring.  This composition replaces the pair generator
    with random-hyperplane LSH postings: each vector lands in
    ``n_tables`` buckets (sign bits of ``n_planes`` hyperplane dots),
    candidates are pairs sharing >= 1 bucket, and ONLY candidates pay
    the exact-cosine cost.  Work is O(sum of bucket-size^2), i.e.
    O(near-dup pairs) on a corpus whose duplicates are actually near —
    never O(n^2) across the corpus.  Recall is probabilistic (two
    vectors at angle theta share a table's bucket with prob
    (1 - theta/pi)^n_planes; miss all n_tables to be lost) — probed at
    1.0 for this corpus vs the exact operator in PROGRESS.jsonl.

    Scale shape:
    - verification is bucket-grouped: vectors ride the posting rows
      (``n_tables`` copies per vector) through ONE groupBy(bucket)
      shuffle — O(postings x dim) bytes, occupancy/2 x less than
      attaching both vectors to every candidate pair — and each bucket
      verifies its internal pairs in blk x blk BLAS gram slabs.  A
      bucket's vectors are materialized in one task (applyInPandas), so
      per-task memory is O(bucket_size x dim) + one bounded slab;
      pathological buckets belong under ``max_bucket_size``.
    - ``max_bucket_size`` (default None for oracle parity) anti-drops
      pathological buckets exactly like the Hamming banding family
      (``dedup._cap_posting_buckets``) — near-constant embeddings all
      hash alike and would make one bucket quadratic.
    - signatures and verification run BLAS-batched (Arrow UDFs), with
      the DECISIONS kept bit-exact vs the in-order-fold semantics the
      oracle computes (``list_dot_product``): any dot within 1e-9 of
      its decision boundary (sign for bucket bits, ``threshold`` for
      the verify) is re-scored with the exact in-order fold.  The
      float64 summation-error bound for 64 O(1) terms is ~1e-12, three
      orders under the margin, so every decision outside the margin is
      provably identical across summation orders — the same
      exact-emission trick as ``embedding_similar_pairs``.  (A pure
      column-expression fold would be unconditionally exact but costs
      n_tables*n_planes codegen folds per row — measured ~3x slower
      end-to-end at test scale, and the gap widens with plane count.)

    Output: (id, component, cluster_size) for every vector in >= 1
    VERIFIED pair — identical contract to ``semantic_dedup_clusters``.

    ``n_planes=None`` auto-sizes the plane count from the corpus count
    via ``lsh_planes_for_corpus`` (one O(1)-output count aggregate over
    the corpus — negligible next to the signature scan); an explicit
    value is honored verbatim (the registered driver query pins 16x3
    so its oracle hash never moves) but warns when the setting is
    quadratic-ish by construction unless ``allow_dense=True``
    acknowledges the density as deliberate (a test-scale recall
    setting — what the registered driver query passes so its
    by-design density doesn't spam driver logs every round).
    """
    from .components import near_dup_clusters

    if n_planes is None:
        n_planes = lsh_planes_for_corpus(emb.count())
    elif not allow_dense:
        _warn_if_dense(n_tables, n_planes)

    from .dedup import _cap_posting_buckets, _scoped_cache

    # Bucket-grouped verification (r10, guide §8: move heavy bytes once,
    # decide on small rows).  The former shape materialized every
    # candidate PAIR, then attached both 64-double vectors to each pair
    # and shipped them through the Arrow boundary — at the registered
    # dense 16x3 setting that is 1.74M pairs x 2 vectors ~ 1.75 GB of
    # Arrow traffic to verify 143 true pairs (measured).  Vectors are
    # now attached to the POSTING rows (n_tables copies per vector —
    # 32k rows / ~17 MB here) and each bucket verifies ALL its internal
    # pairs in ONE BLAS gram matrix inside applyInPandas, emitting only
    # passing pairs.  Boundary bytes drop from O(candidate pairs x dim)
    # to O(postings x dim) — occupancy/2 times less whenever expected
    # bucket occupancy exceeds 2, and the per-pair work becomes dgemm.
    # DECISIONS are bit-identical to the per-pair verifier: any cosine
    # within 1e-9 of the threshold is re-scored with the exact in-order
    # fold (the float64 summation-order error bound is ~1e-12, so every
    # decision outside that margin is provably order-independent — see
    # the module-level exactness argument), and pairs sharing several
    # buckets re-verify to the same verdict before dropDuplicates.
    posts = _scoped_cache(
        _cap_posting_buckets(
            embedding_lsh_postings(
                emb, dim, id_col=id_col, vec_col=vec_col,
                n_tables=n_tables, n_planes=n_planes,
            ).withColumnRenamed(id_col, "_id"),
            max_bucket_size,
            ("bucket",),
        ),
        "lsh_dedup_posts",
    )
    e = emb.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("v"))
    pv = posts.join(e, "_id")
    id_dt = emb.schema[id_col].dataType.simpleString()
    thr = float(threshold)

    def _bucket_gram(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["_id"].to_numpy()
        order = np.argsort(ids, kind="stable")  # emit id_a < id_b directly
        ids = ids[order]
        if len(ids) < 2:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0]})
        V = np.stack(pdf["v"].to_numpy())[order].astype(np.float64)
        out_a, out_b = _gram_block_pairs(ids, V, thr)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    pairs = (
        pv.groupBy("bucket")
        .applyInPandas(_bucket_gram, f"id_a {id_dt}, id_b {id_dt}")
        .dropDuplicates()
    )
    return near_dup_clusters(pairs).withColumnRenamed("doc_id", id_col)


def lsh_dedup_candidates(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_planes: int | None = 4,
    max_bucket_size: int | None = None,
    allow_dense: bool = False,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing >= 1 LSH bucket —
    the pair generator of ``semantic_dedup_clusters_lsh``, public so
    the recall/candidate-count probe measures the exact production
    path (same anti-drift contract as the ANN probes).  ``n_planes=
    None`` auto-sizes like the cluster operator; an explicit
    quadratic-ish setting warns (``_warn_if_dense``) unless
    ``allow_dense=True`` — the public pair generator carries the same
    all-pairs-by-construction hazard as the cluster operator and must
    warn just as consistently (ADVICE r9)."""
    from .dedup import _cap_posting_buckets, _scoped_cache

    if n_planes is None:
        n_planes = lsh_planes_for_corpus(emb.count())
    elif not allow_dense:
        _warn_if_dense(n_tables, n_planes)

    # pinned: the posting relation is BOTH sides of the candidate
    # self-join — uncached, the signature UDF would run twice over the
    # corpus (two full scans at 100 TB)
    posts = _scoped_cache(
        _cap_posting_buckets(
            embedding_lsh_postings(
                emb,
                dim,
                id_col=id_col,
                vec_col=vec_col,
                n_tables=n_tables,
                n_planes=n_planes,
            ).withColumnRenamed(id_col, "_id"),
            max_bucket_size,
            ("bucket",),
        ),
        "lsh_dedup_posts",
    )
    return (
        posts.select(F.col("_id").alias("id_a"), "bucket")
        .join(posts.select(F.col("_id").alias("id_b"), "bucket"), "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )


def embedding_lsh_postings(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_planes: int = 4,
) -> DataFrame:
    """(id, bucket) LSH posting rows — ``n_tables`` rows per vector,
    bucket = table_tag | sign bits of the md5-derived hyperplane dots.
    The shared signature generator of ``lsh_dedup_candidates`` (batch)
    and the arrival-time embedding gate's append-only posting sidecar:
    postings are DETERMINISTIC per (vector, settings), so appending a
    batch's rows is exact — the same property that makes the text
    gate's ``doc_postings`` sidecar append-only.  Plane count must stay
    FIXED for the life of a sidecar (postings from different plane
    counts occupy incompatible bucket spaces)."""
    planes_np = np.array(_md5_planes(n_tables, n_planes, dim))
    flat = planes_np.reshape(n_tables * n_planes, dim).T  # (dim, T*P)
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    table_tag = np.arange(n_tables, dtype=np.int64) << n_planes

    @F.pandas_udf("array<bigint>")
    def sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        dots = mat @ flat  # (batch, T*P)
        for i, j in np.argwhere(np.abs(dots) < 1e-9):
            dots[i, j] = _inorder_dot(mat[i], flat[:, j])
        bits = (dots >= 0).reshape(len(v), n_tables, n_planes)
        return pd.Series(list((bits * weights).sum(axis=2) + table_tag))

    return emb.select(
        F.col(id_col), F.explode(sig(as_double(vec_col))).alias("bucket")
    )


def incremental_embedding_near_dup_pairs(
    existing_posting: DataFrame,
    existing_vecs: DataFrame | None,
    new_emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_tables: int = 8,
    n_planes: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Arrival-time SEMANTIC near-dup gate (r8 verdict item 3): all
    exact-cosine >= ``threshold`` pairs involving at least one NEW
    vector — (new, existing) and (new, new) — without re-hashing or
    re-shuffling the accepted corpus.  The embedding analogue of
    ``incremental_hamming_near_dup_pairs``, completing the gate family
    (text shingles, image/audio/video Hamming, now embeddings): a
    paraphrase duplicate invisible to every lexical gate is caught
    here.

    ``existing_posting`` is ``embedding_lsh_postings`` rows (id,
    bucket) accumulated over accepted batches — SAME ``n_tables``/
    ``n_planes`` for the sidecar's life.  ``existing_vecs`` is the
    accepted-vector relation (id, embedding) — a NARROW sidecar scan,
    used only to fetch candidate vectors for verification.

    Plan shape (the ``incremental_hamming_near_dup_pairs`` contract):
    - probe side = the NEW batch's postings only, never a filter of the
      combined relation — history is touched through one narrow index
      scan (the candidate join's build side, restricted map-side to the
      batch's broadcast bucket keys), so per-activation work is
      O(batch x bucket occupancy), never O(history).
    - ``max_bucket_size`` caps pathological buckets by COMBINED
      membership, dropping them from both sides (a burst of
      near-constant embeddings all hash alike); the streaming pipeline
      ships with the cap ON, like the image gate.
    - verification never shuffles history: the probed buckets' posting
      IDS (bounded by batch x occupancy, capped) broadcast into one
      map-side semi-join that plucks exactly the needed vectors from
      the sidecar scan; verification is then bucket-grouped (r11) —
      vectors ride the candidate-bounded posting rows, each bucket
      verifies its internal >=1-new pairs in bounded BLAS gram slabs
      (``_gram_block_pairs``), so the Python boundary carries
      O(probed postings x dim) bytes instead of O(candidate pairs x
      dim).  Decisions stay exact-at-the-boundary (in-order re-score
      within 1e-9 of threshold), bit-identical to the per-pair
      ``_cosine_verify_udf`` it replaced.

    Output: (id_a, id_b), id_a < id_b, exact-cosine verified.  Ids must
    be unique across both inputs.
    """
    from .dedup import _scoped_cache

    new_vecs = _scoped_cache(
        new_emb.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("v")),
        "inc_emb_vecs",
    )
    post_new = embedding_lsh_postings(
        new_vecs,
        dim,
        id_col="_id",
        vec_col="v",
        n_tables=n_tables,
        n_planes=n_planes,
    )
    post_all = existing_posting.select(
        F.col(id_col).alias("_id"), "bucket", F.lit(False).alias("_is_new")
    ).unionByName(post_new.select("_id", "bucket", F.lit(True).alias("_is_new")))
    # only buckets PROBED by the new batch can produce pairs — both the
    # candidate join's build side and the cap's occupancy count restrict
    # to them first (broadcast of the batch's distinct bucket keys)
    new_keys = post_new.select("bucket").dropDuplicates()
    probed = post_all.join(F.broadcast(new_keys), "bucket", "left_semi")
    if max_bucket_size is not None:
        overflow = (
            probed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_occ"))
            .filter(F.col("_occ") > max_bucket_size)
            .select("bucket")
        )
        probed = probed.join(F.broadcast(overflow), "bucket", "left_anti")
    # Bucket-grouped verification (r11, r10 verdict item 4 — the batch
    # operator's gram rewrite ported to the gate): the former shape
    # materialized every candidate PAIR and attached both vectors to
    # each pair (O(candidate pairs x dim) Arrow-boundary bytes).  Now
    # vectors attach to the PROBED-bucket POSTING rows (O(probed
    # postings x dim) — occupancy/2 x less whenever bucket occupancy
    # exceeds 2) and each bucket verifies all its internal pairs
    # carrying >= 1 NEW endpoint in bounded blk x blk BLAS gram slabs;
    # (history, history) pairs never materialize.  Decisions are
    # bit-identical to ``_cosine_verify_udf``: any cosine within 1e-9
    # of the threshold is re-scored with the exact in-order fold (see
    # ``_gram_block_pairs``).  History is still never shuffled by
    # corpus size: the ids-only broadcast (~8 B/posting row, bounded by
    # batch x occupancy after the cap) plucks the probed buckets'
    # vectors in one map-side pass over the sidecar scan, and every
    # relation below is candidate-bounded.
    vecs = new_vecs
    if existing_vecs is not None:
        vecs = vecs.unionByName(
            existing_vecs.select(
                F.col(id_col).alias("_id"), as_double(vec_col).alias("v")
            )
        )
    needed_ids = probed.select("_id").dropDuplicates()
    needed = vecs.join(F.broadcast(needed_ids), "_id", "left_semi")
    pv = probed.join(needed, "_id")
    thr = float(threshold)
    id_dt = new_emb.schema[id_col].dataType.simpleString()

    def _bucket_gram(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["_id"].to_numpy()
        order = np.argsort(ids, kind="stable")  # emit id_a < id_b directly
        ids = ids[order]
        if len(ids) < 2:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0]})
        V = np.stack(pdf["v"].to_numpy())[order].astype(np.float64)
        is_new = pdf["_is_new"].to_numpy()[order]
        out_a, out_b = _gram_block_pairs(ids, V, thr, keep_rows=is_new)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return (
        pv.groupBy("bucket")
        .applyInPandas(_bucket_gram, f"id_a {id_dt}, id_b {id_dt}")
        .dropDuplicates()
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization + reconstruction
    audit — the storage step of an embedding pipeline (int8 vectors are
    4x smaller and what ANN indexes ingest at scale).

    scale = max(|x|) / 127 per vector; q_i = floor(x_i / scale) in
    [-128, 127]; reconstruction x'_i = q_i * scale.  floor (not
    round) keeps the math bit-identical across engines — IEEE divide,
    floor and multiply are exactly specified, while round-half ties
    differ between Java and C.  All work is per-row array expressions:
    embarrassingly parallel, shuffle-free, no Python.

    Output: (id, n_dims, scale, q_sum, mse) where q_sum is the integer
    checksum of the quantized codes and mse the mean squared
    reconstruction error (both computed by an in-order fold over the
    array, so the float summation order is fixed).  Zero vectors get
    scale 0 and all-zero codes (guarded division).
    """
    v = as_double(vec_col)
    df2 = df.select(F.col(id_col), v.alias("_v"))
    amax = F.array_max(F.transform("_v", lambda x: F.abs(x)))
    df3 = df2.select(
        F.col(id_col), "_v", (amax / F.lit(127.0)).alias("scale")
    )
    q = F.when(
        F.col("scale") > 0,
        F.transform("_v", lambda x: F.floor(x / F.col("scale")).cast("long")),
    ).otherwise(F.transform("_v", lambda x: F.lit(0).cast("long")))
    df4 = df3.select(F.col(id_col), "_v", "scale", q.alias("_q"))
    def _se(x, c):
        d = x - c.cast("double") * F.col("scale")
        return d * d  # explicit multiply: pow() rounding is not pinned cross-engine

    sq_err = F.zip_with("_v", "_q", _se)
    mse = (
        F.aggregate(sq_err, F.lit(0.0), lambda acc, e: acc + e) / F.size("_v")
    ).alias("mse")
    return df4.select(
        F.col(id_col),
        F.size("_v").cast("long").alias("n_dims"),
        F.col("scale"),
        F.aggregate("_q", F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        mse,
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage ANN over int8-quantized vectors: an integer-dot
    prefilter selects ``oversample * k`` candidates per query from the
    NARROW quantized relation, then only candidates are joined back to
    the full-precision corpus for exact cosine re-scoring.

    The scale story is bandwidth, not FLOPs: stage 1 scans 1/4 of the
    bytes (int8 codes + one scale per vector), which is what bounds a
    100 TB embedding sweep; stage 2 is per-candidate point lookups
    (a join on id moving oversample*k rows per query).  Deterministic
    end to end — quantization is ``quantize_embeddings``' floor rule
    and all ties break on id.  Output schema matches ``cosine_topk``.
    """
    def codes(df: DataFrame, idc: str) -> DataFrame:
        v = as_double(vec_col)
        d = df.select(F.col(idc), v.alias("_v"))
        amax = F.array_max(F.transform("_v", lambda x: F.abs(x)))
        d = d.select(F.col(idc), "_v", (amax / F.lit(127.0)).alias("scale"))
        code = F.when(
            F.col("scale") > 0,
            F.transform("_v", lambda x: F.floor(x / F.col("scale")).cast("long")),
        ).otherwise(F.transform("_v", lambda x: F.lit(0).cast("long")))
        d = d.select(F.col(idc), "scale", code.alias("codes"))
        # reconstruction norm (double): fixed in-order fold
        rn = F.sqrt(
            F.aggregate(
                F.transform("codes", lambda c: c.cast("double") * F.col("scale")),
                F.lit(0.0),
                lambda a, x: a + x * x,
            )
        )
        return d.select(F.col(idc), "scale", "codes", rn.alias("rnorm"))

    cq = codes(corpus, id_col)
    qq = codes(queries, query_id_col).withColumnsRenamed(
        {"scale": "q_scale", "codes": "q_codes", "rnorm": "q_rnorm"}
    )
    # stage 1: integer dot on the narrow relation (JVM fold over longs)
    idot = F.aggregate(
        F.zip_with("codes", "q_codes", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    approx = (
        cq.join(F.broadcast(qq), F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            (
                idot.cast("double")
                * F.col("scale")
                * F.col("q_scale")
                / (F.col("rnorm") * F.col("q_rnorm") + F.lit(1e-300))
            ).alias("approx_sim"),
        )
    )
    w1 = Window.partitionBy(query_id_col).orderBy(F.desc("approx_sim"), F.col(id_col))
    cand = (
        approx.withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") <= oversample * k)
        .select(query_id_col, id_col)
    )
    # stage 2: exact re-score of candidates only.  The candidate list is
    # bounded by construction (n_queries * oversample * k rows), so it —
    # not the full-precision corpus — is the broadcast build side; left
    # to stats the optimizer would happily broadcast the corpus at small
    # SF, the exactly-backwards shape at 100 TB.
    c = corpus.select(F.col(id_col), as_double(vec_col).alias("v"))
    q = queries.select(F.col(query_id_col), as_double(vec_col).alias("qv"))
    scored = (
        c.join(F.broadcast(cand), id_col)
        .join(F.broadcast(q), query_id_col)
        .select(query_id_col, id_col, cosine(F.col("qv"), F.col("v")).alias("cos_sim"))
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )
