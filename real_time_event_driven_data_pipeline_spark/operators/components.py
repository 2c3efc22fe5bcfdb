"""Connected components over an edge list (near-dup cluster assembly).

Near-dup pair generation (dedup.py) emits edges; turning edges into
*clusters* — so one canonical document survives per duplicate group even
when A~B and B~C but A!~C — needs connected components.  This is the
missing last step of every corpus-dedup pipeline (the reference has no
analogue; its dedup surface is exact key uniqueness only,
reference: docker-images/validation/validate.py:158-172).

Algorithm: iterative min-label propagation expressed as DataFrame
joins — each vertex repeatedly adopts the smallest component id among
itself and its neighbors.  Converges in O(graph diameter) rounds; for
near-dup clusters (diameter a few hops at worst) that is 2-4 rounds.
Each round is one shuffle-join plus one shuffle-agg, both on the vertex
id, so AQE keeps partitioning stable across rounds.  ``localCheckpoint``
truncates lineage every round — without it the plan doubles per
iteration and the driver, not the data, becomes the bottleneck.

For adversarial long-chain graphs at 100 TB, swap the propagation loop
for the alternating large-star/small-star rounds of Kiveris et al.
("Connected Components in MapReduce and Beyond", SoCC'14), which
converge in O(log n); the DataFrame skeleton (join-agg-min per round)
is identical, so the swap is local to this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns (id, component) for every vertex incident to an edge, where
    ``component`` is the minimum vertex id reachable from ``id`` —  a
    deterministic, engine-independent canonical representative.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates()
        .localCheckpoint()
    )
    # Size the loop's parallelism to the edge list, not the corpus: the
    # duplicate graph is orders of magnitude smaller than its corpus, and
    # per-round task overhead dominates when partitions outnumber rows.
    n_edges = e.count()  # free: e is materialized by the checkpoint
    nparts = max(1, min(200, n_edges // 1_000_000 + 1))
    e = e.repartition(nparts, "dst")
    labels = (
        e.select(F.col("src").alias("id"))
        .dropDuplicates()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    # Convergence probe: comps only ever decrease, so SUM(comp) is
    # strictly decreasing until the fixed point — a scalar aggregate per
    # round instead of a join-based change diff.
    prev_sum = None
    for _ in range(max_iter):
        propagated = e.join(
            labels.select(F.col("id").alias("dst"), F.col("comp").alias("nbr_comp")),
            "dst",
        ).select(F.col("src").alias("id"), F.col("nbr_comp").alias("comp"))
        labels = (
            labels.unionByName(propagated)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def near_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster assignment for every doc in a near-dup pair list.

    Output: (doc_id, component, cluster_size), component = min doc_id
    of the cluster.  Docs not in any pair are absent (they are their own
    singleton cluster by definition).
    """
    from pyspark.sql import Window

    comps = connected_components(pairs, src=id_a, dst=id_b).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )
    w = Window.partitionBy("component")
    return comps.withColumn(
        "cluster_size", F.count(F.lit(1)).over(w).cast("long")
    )
