"""Distributed exact-arithmetic k-means over embedding columns.

The IVF index (`operators/similarity.py:train_ivf_centroids`) trains on
a BOUNDED driver-side sample because an index only needs approximate
cells.  Corpus *clustering* — the first stage of SemDeDup-style
semantic dedup and of cluster-balanced mixture construction — has to
assign EVERY vector, so this module runs Lloyd's iterations fully
distributed:

- centroids live on the driver (k rows — a bounded, tiny relation) and
  are folded into the assignment expression as literals, i.e. broadcast
  by the plan itself; the corpus is NEVER shuffled for assignment;
- the update step is one hash aggregate per iteration with 2·dim
  columnar SUM/COUNT measures: map-side partial aggregation reduces
  each partition to ≤ k rows before the exchange, so the per-iteration
  shuffle is k × partitions rows regardless of corpus size — the
  standard scalable k-means shape (Bahmani et al., VLDB'12, use the
  same broadcast-assign / mini-reduce structure for k-means‖);
- all arithmetic is integer-exact so the result is independent of
  partitioning, accumulation order, and engine: vectors are quantized
  to round(x·1e6) BIGINTs, distances are integer squared-L2, centroid
  updates are floor(sum/count) with sums < 2^53 (exact in the double
  division both engines use).  Ties in distance break to the lowest
  cluster id.  This is what makes the operator DuckDB-oracle-certifiable
  (`plans/extension_queries.py:kmeans_centroids`) — float k-means never
  hashes identically across engines.

Initialization is deterministic: the k vectors with the smallest ids
(collected once, k rows).  Empty clusters keep their previous centroid.

No analogue in the reference (Glue scripts, `transform.py:28-227`,
have no ML-adjacent ops); this extends SURVEY §2's extension families
with the clustering stage the dedup/ANN operators assume upstream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SCALE = 1_000_000  # |x| ≤ ~1 → scaled diffs ≤ ~2e6 → 64-dim squared sums ≤ ~2.6e14 « 2^63


def quantized_vec(vec_col: str | Column) -> Column:
    """array<long>: round(x * 1e6) per component (exact, order-free)."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(col, lambda x: F.round(x.cast("double") * SCALE).cast("long"))


def _assign_expr(qcol_name: str, centroids: list[list[int]]) -> Column:
    """Nearest-centroid id via integer squared-L2; ties → lowest id.

    Centroids are folded in as ONE literal array-of-arrays inside a
    single SQL expression (one py4j call; building k·dim separate
    ``F.lit`` Columns costs hundreds of driver round-trips).  The
    comparison runs map-side against the literal — zero shuffle, zero
    Python workers.  ``array_min`` over (distance, id) structs is the
    tie-to-lowest-id argmin, mirroring the oracle's
    ``ROW_NUMBER() OVER (ORDER BY d, cluster)``.
    """
    k = len(centroids)
    cent_sql = "array(" + ",".join(
        "array(" + ",".join(f"{int(v)}L" for v in cent) + ")" for cent in centroids
    ) + ")"
    # |x - c|^2 = |x|^2 - 2<x,c> + |c|^2 and |x|^2 is constant across
    # centroids, so argmin_c |x-c|^2 == argmin_c (|c|^2 - 2<x,c>) with
    # IDENTICAL ties (the score is the distance shifted by a per-row
    # constant) — the fold's lambda body shrinks from (x-y)*(x-y) to
    # x*y with |c|^2 folded in as a per-centroid literal (r10; HOFs are
    # interpreted per element, so smaller lambda bodies are the lever).
    # Integer bounds: |<x,c>| <= dim * (2e6)^2 ~ 2.6e14 << 2^63.
    norms_sql = "array(" + ",".join(
        f"{sum(int(v) * int(v) for v in cent)}L" for cent in centroids
    ) + ")"
    return F.expr(
        f"""array_min(zip_with(
              zip_with({cent_sql}, {norms_sql},
                       (c, n2) -> n2 - 2L * aggregate(zip_with({qcol_name}, c,
                                                               (x, y) -> x * y),
                                                      0L, (acc, v) -> acc + v)),
              sequence(0, {k - 1}),
              (d, i) -> struct(d AS d, CAST(i AS INT) AS c))).c"""
    ).alias("cluster")


def kmeans_fit_assign(
    emb: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_parallelism: int | None = None,
) -> tuple[DataFrame, list[list[int]]]:
    """Run ``iters`` exact Lloyd's iterations; return (assignments, centroids).

    assignments: (id_col, cluster int) — a lazy plan over ``emb`` using
    the FINAL centroids (safe to compose; triggers no extra jobs beyond
    the ``iters`` bounded collects already run).
    centroids: k × dim quantized ints.

    ``min_parallelism``: a 200k-vector corpus is a single <128 MB
    parquet split, which serializes the (CPU-bound) assignment behind
    one core; setting this repartitions the vectors once, and every
    iteration's map-side assignment then runs corpus-wide parallel —
    the same few-split escape hatch as ``minhash_lsh_pairs``.
    Registry/bench call sites set it to the session's shuffle
    partitions; the fit itself is partitioning-independent either way.
    """
    if min_parallelism and emb.rdd.getNumPartitions() < min_parallelism:
        emb = emb.repartition(min_parallelism, id_col)
    # Quantized vectors are materialized into a column so the HOF
    # lambdas below reference the column, not the transform() expression
    # (which Catalyst would otherwise re-evaluate once per cluster —
    # the winnowing pitfall, see operators/dedup.py:with_shingles).
    # Persisted because every Lloyd's iteration re-scans it.
    q = emb.select(id_col, quantized_vec(vec_col).alias("q")).persist()

    # deterministic init: the k smallest ids' vectors (bounded collect)
    init = q.orderBy(id_col).limit(k).collect()
    if not init:
        raise ValueError("kmeans_fit_assign: corpus has no vectors")
    # fewer vectors than requested clusters: fit the k that exist (the
    # update loop below indexes centroids[c] for c < k — ADVICE r4)
    k = min(k, len(init))
    centroids = [list(r["q"]) for r in init]
    dim = len(centroids[0])

    for _ in range(iters):
        assigned = q.select("q", _assign_expr("q", centroids))
        # one hash agg, 2·dim measures; partial agg → shuffle is ≤ k rows/partition
        sums = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at("q", d + 1)).alias(f"s{d}") for d in range(dim)],
        )
        rows = {r["cluster"]: r for r in sums.collect()}  # bounded: ≤ k rows
        centroids = [
            [
                # floor(sum/n) in double — sums < 2^53, so the division is
                # exact and engine-independent (mirrored in the oracle SQL)
                int(rows[c][f"s{d}"] // rows[c]["n"])
                if c in rows and rows[c]["n"] > 0
                else centroids[c][d]
                for d in range(dim)
            ]
            for c in range(k)
        ]

    q.unpersist()
    # final assignment re-quantizes lazily (q is unpersisted) but still
    # through a materialized column — never the raw transform() expr
    final = emb.select(id_col, quantized_vec(vec_col).alias("__q")).select(
        id_col, _assign_expr("__q", centroids)
    )
    return final, centroids


def kmeans_centroid_table(
    emb: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_parallelism: int | None = None,
) -> DataFrame:
    """(cluster, dim, centroid_q, n_vectors): the fitted model as a table.

    ``centroid_q`` is the FINAL-iteration centroid (quantized ints);
    ``n_vectors`` counts the final assignment under those centroids.
    """
    assigned, centroids = kmeans_fit_assign(
        emb, k, iters, id_col, vec_col, min_parallelism
    )
    spark = emb.sparkSession
    dim = len(centroids[0])
    cent_rows = [
        (int(c), int(d + 1), int(centroids[c][d]))
        for c in range(len(centroids))
        for d in range(dim)
    ]
    cent_df = spark.createDataFrame(cent_rows, "cluster int, dim int, centroid_q long")
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))
    return (
        cent_df.join(F.broadcast(sizes), "cluster", "left")
        .select(
            "cluster",
            "dim",
            "centroid_q",
            F.coalesce("n_vectors", F.lit(0)).cast("long").alias("n_vectors"),
        )
        .orderBy("cluster", "dim")
    )


def cluster_balanced_sample(
    emb: DataFrame,
    per_cluster: int,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Coverage sampling: fit k-means, then take the ``per_cluster``
    highest-hash-priority vectors from EVERY cluster — the
    cluster-balanced selection step (SemDeDup / DDS-style diversity
    sampling) that keeps rare regions of embedding space represented
    instead of letting the head clusters dominate a uniform sample.

    Priority is the md5-hex-prefix integer of the id (the repo's
    cross-engine hash convention), so the sample is deterministic and
    oracle-checkable; ties cannot happen (id is the tiebreak).

    Scale shape: a single window partitioned by (cluster) would move
    every cluster's full membership into ONE task, so the top-m runs in
    two phases: a per-input-partition prune to m rows per (cluster,
    partition) — distributed WindowExec over the pid-hash exchange —
    then the final rank over the pruned relation, whose size is bounded
    by m x partitions x k rows INDEPENDENT of corpus size (the same
    bounded-input-window argument as the day-grain rollups).

    Output: (id_col, cluster, rk) with rk in 1..per_cluster.
    """
    from pyspark.sql import Window

    assigned, _ = kmeans_fit_assign(emb, k, iters, id_col, vec_col, min_parallelism)
    pri = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("pri")
    )
    local = assigned.select(id_col, "cluster", pri).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid", "cluster").orderBy("pri", id_col)
    pruned = (
        local.withColumn("_lrk", F.row_number().over(w_local))
        .filter(F.col("_lrk") <= per_cluster)
        .drop("_pid", "_lrk")
    )
    w_final = Window.partitionBy("cluster").orderBy("pri", id_col)
    return (
        pruned.withColumn("rk", F.row_number().over(w_final))
        .filter(F.col("rk") <= per_cluster)
        .select(id_col, "cluster", "rk")
    )
