"""Distributed exact k-means (operators/clustering.py).

Pins the properties the DuckDB oracle cannot see at driver time:
partitioning-independence (the whole point of the integer arithmetic),
assignment optimality, and the empty-cluster carry-forward branch.
"""

import pyspark.sql.functions as F
import pytest

from real_time_event_driven_data_pipeline_spark.operators import clustering


def _toy(spark, n_parts):
    # two tight blobs far apart + an outlier pair; 12 vectors, dim 4.
    # ids interleave the groups so the smallest-ids init (ids 0,1,2)
    # seeds one centroid per group — the usual state for hash-assigned
    # ids, and what k-means++-style seeding buys in production.
    rows = []
    for j in range(5):  # blob1: ids 0,3,5,7,9
        rows.append(((0, 3, 5, 7, 9)[j], [1.0 + 0.01 * j, 1.0, 0.0, 0.0]))
    for j in range(5):  # blob2: ids 1,4,6,8,10
        rows.append(((1, 4, 6, 8, 10)[j], [-1.0 - 0.01 * j, -1.0, 0.0, 0.0]))
    rows.append((2, [0.0, 0.0, 5.0, 0.0]))  # outliers: ids 2, 11
    rows.append((11, [0.0, 0.0, 5.1, 0.0]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(n_parts)


def test_partitioning_independence(spark):
    """Same fit regardless of input partitioning / accumulation order."""
    a = clustering.kmeans_centroid_table(_toy(spark, 1), k=3, iters=3).collect()
    b = clustering.kmeans_centroid_table(_toy(spark, 7), k=3, iters=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 3 * 4  # k * dim rows
    assert sum(r["n_vectors"] for r in a) == 12 * 4  # each cluster row repeats per dim


def test_assignment_is_nearest_centroid(spark):
    """Every vector's cluster minimizes integer squared-L2 to the model."""
    emb = _toy(spark, 3)
    assigned, centroids = clustering.kmeans_fit_assign(emb, k=3, iters=2)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    qrows = emb.select(
        "vec_id", clustering.quantized_vec("embedding").alias("q")
    ).collect()
    for r in qrows:
        dists = [
            (sum((x - c) ** 2 for x, c in zip(r["q"], cent)), cid)
            for cid, cent in enumerate(centroids)
        ]
        assert got[r["vec_id"]] == min(dists)[1]


def test_blobs_separate(spark):
    """The two blobs and the outlier pair land in distinct clusters."""
    assigned, _ = clustering.kmeans_fit_assign(_toy(spark, 4), k=3, iters=3)
    by_vec = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    blob1 = {by_vec[i] for i in (0, 3, 5, 7, 9)}
    blob2 = {by_vec[i] for i in (1, 4, 6, 8, 10)}
    out = {by_vec[2], by_vec[11]}
    assert len(blob1) == 1 and len(blob2) == 1 and len(out) == 1
    assert len(blob1 | blob2 | out) == 3


def test_k_larger_than_corpus_fits_what_exists(spark):
    """ADVICE r4: |corpus| < k used to IndexError in the update loop —
    now the fit shrinks k to the vectors that exist."""
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned, centroids = clustering.kmeans_fit_assign(emb, k=5, iters=2)
    assert len(centroids) == 2
    assert {r["cluster"] for r in assigned.collect()} == {0, 1}


def test_empty_corpus_raises_clear_error(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="no vectors"):
        clustering.kmeans_fit_assign(emb, k=3, iters=1)


def test_empty_cluster_keeps_previous_centroid(spark):
    """k > distinct points: surplus clusters carry their init centroid."""
    rows = [(i, [0.0, 0.0]) for i in range(4)] + [(9, [8.0, 8.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # init = 3 smallest ids -> centroids 0,1,2 all at origin; after one
    # update clusters 1,2 are empty (ties assign to cluster 0) and must
    # keep their previous (init) centroid instead of dividing by zero.
    # Trace: iter1 ties send everything to cluster 0 (c1, c2 empty, keep
    # origin); iter2 origin points tie-break to cluster 1, the far point
    # stays with 0, and cluster 2 stays empty through the final count.
    table = clustering.kmeans_centroid_table(emb, k=3, iters=2)
    rows = table.collect()
    n_by_cluster = {r["cluster"]: r["n_vectors"] for r in rows}
    assert n_by_cluster == {0: 1, 1: 4, 2: 0}
    cent2 = [r["centroid_q"] for r in rows if r["cluster"] == 2]
    assert cent2 == [0, 0]  # carried forward from init, not NaN/garbage


def test_assignment_plan_is_shuffle_free(spark):
    """The per-iteration assignment must be a map-side projection: no
    exchange before the aggregate's own partial/final pair, no Python."""
    emb = _toy(spark, 4).localCheckpoint()  # truncate the repartition off the lineage
    assigned, _ = clustering.kmeans_fit_assign(emb, k=3, iters=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side assignment
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- property: the fit is a pure function of the SET of vectors ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_vecs = st.lists(
    st.lists(
        st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 500.0),
        min_size=3,
        max_size=3,
    ),
    min_size=3,
    max_size=16,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=_vecs)
def test_kmeans_partitioning_independence_property(spark, vecs):
    """Random corpora: identical fit under 1-partition and 5-partition
    layouts (integer arithmetic leaves no accumulation-order residue)."""
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    k = min(3, len(rows))
    a = clustering.kmeans_centroid_table(df.coalesce(1), k=k, iters=2).collect()
    b = clustering.kmeans_centroid_table(df.repartition(5), k=k, iters=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_cluster_balanced_sample_caps_every_cluster(spark):
    """Each cluster contributes min(m, cluster size) rows, ranked 1..m
    with unique ids — the head cluster cannot crowd out the tail."""
    emb = _toy(spark, 4)
    out = clustering.cluster_balanced_sample(emb, per_cluster=2, k=3, iters=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r["rk"])
    # 3 clusters of sizes 5/5/2 -> 2 rows each
    assert {c: sorted(v) for c, v in by_cluster.items()} == {
        0: [1, 2], 1: [1, 2], 2: [1, 2]
    }
    assert len({r["vec_id"] for r in out}) == len(out)


def test_cluster_balanced_sample_partitioning_independent(spark):
    a = clustering.cluster_balanced_sample(_toy(spark, 1), per_cluster=3, k=3, iters=2)
    b = clustering.cluster_balanced_sample(_toy(spark, 7), per_cluster=3, k=3, iters=2)
    key = lambda r: (r["cluster"], r["rk"], r["vec_id"])  # noqa: E731
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_cluster_balanced_sample_no_single_partition_window(spark):
    """The final per-cluster rank must run over the PRUNED bounded
    relation, and no window in the plan may sit on a single-partition
    exchange."""
    emb = _toy(spark, 4)
    df = clustering.cluster_balanced_sample(emb, per_cluster=2, k=3, iters=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Window") >= 2  # local prune + final rank
