"""Connected-components operator: transitive closure correctness.

The near-dup pipeline needs A~B, B~C to collapse into ONE cluster even
when A!~C; pairs alone can't express that.  These tests pin the
operator on hand-built graphs (chains, stars, disjoint cliques,
singleton edges) and on the registered query's oracle shape.
"""

from __future__ import annotations

from real_time_event_driven_data_pipeline_spark.operators.components import (
    connected_components,
    near_dup_clusters,
)


def _cc(spark, edges, small_graph_threshold=1_000_000):
    """threshold default -> union-find fast path; None -> the
    distributed min-label loop (kept exercised explicitly below)."""
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(
        df, small_graph_threshold=small_graph_threshold
    ).collect()
    return {r["id"]: r["comp"] for r in rows}


def test_chain_collapses_to_min(spark):
    # 1-2, 2-3, 3-4, 4-5: diameter 4, exercises multiple propagation
    # rounds on the distributed path; fast path must agree exactly
    want = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert _cc(spark, edges) == want
    assert _cc(spark, edges, small_graph_threshold=None) == want


def test_disjoint_components(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 32), (30, 32)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30}


def test_star_and_direction_independence(spark):
    # edges pointing both ways; hub has the max id
    got = _cc(spark, [(9, 1), (9, 2), (3, 9), (4, 9)])
    assert set(got.values()) == {1}
    assert len(got) == 5


def test_cluster_sizes(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    rows = near_dup_clusters(pairs).collect()
    by_doc = {r["doc_id"]: (r["component"], r["cluster_size"]) for r in rows}
    assert by_doc == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        7: (7, 2),
        8: (7, 2),
    }


# --- property-based: random graphs vs a union-find reference ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=20,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical representative = min id of the component
    return {v: find(v) for v in parent}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges)
def test_cc_matches_union_find(spark, edges):
    """Both the distributed min-label loop (threshold=None) and the
    small-graph union-find fast path must match the reference — the
    fast path IS a union-find, so the load-bearing comparison here is
    the distributed loop's."""
    e = [(int(a), int(b)) for a, b in edges]
    assert _cc(spark, e, small_graph_threshold=None) == _union_find(edges)
    assert _cc(spark, e) == _union_find(edges)


# --- large-star/small-star: same answers, diameter-independent rounds ---

from real_time_event_driven_data_pipeline_spark.operators.components import (  # noqa: E402
    connected_components_star,
)


def _cc_star(spark, edges, max_iter=40):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components_star(df, max_iter=max_iter).collect()
    return {r["id"]: r["comp"] for r in rows}


def test_star_cc_on_fixed_graphs(spark):
    assert _cc_star(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]) == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1
    }
    assert _cc_star(spark, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 32), (30, 32)]) == {
        10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30
    }
    # self-loop-only vertex survives as a singleton (union-find parity)
    assert _cc_star(spark, [(5, 5), (1, 2)]) == {5: 5, 1: 1, 2: 1}
    # regression (hypothesis-found): vertex 7 bridges two would-be stars
    # (edges to roots 0 and 1) — the roots-never-src probe alone called
    # that converged; the multi-root condition must keep merging
    assert _cc_star(spark, [(0, 9), (1, 8), (7, 9), (7, 8)]) == {
        0: 0, 9: 0, 7: 0, 8: 0, 1: 0
    }


def test_star_cc_long_chain_few_rounds(spark):
    """The adversarial case for min-label propagation: a 300-vertex path
    has diameter 299, but the star algorithm must collapse it within
    O(log^2 n) alternating rounds — 12 is generous headroom for n=300
    and would be far exceeded by any O(diameter) scheme."""
    n = 300
    got = _cc_star(spark, [(i, i + 1) for i in range(n)], max_iter=12)
    assert got == {i: 0 for i in range(n + 1)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges)
def test_star_cc_matches_union_find(spark, edges):
    got = _cc_star(spark, [(int(a), int(b)) for a, b in edges])
    assert got == _union_find(edges)


def test_cc_null_ids_match_between_paths(spark):
    """NULL vertex ids: the distributed loop's propagation equi-join
    means NULL's label never flows OUT, but NULL itself ABSORBS the min
    label of its non-NULL neighbors (src-side join; SQL MIN ignores its
    initial NULL).  The union-find fast path must replicate exactly
    that asymmetry instead of raising on None comparison (round-7
    review finding)."""
    df = spark.createDataFrame(
        [(None, 5), (5, 6), (None, None)], "src long, dst long"
    )
    fast = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    slow = {
        r["id"]: r["comp"]
        for r in connected_components(df, small_graph_threshold=None).collect()
    }
    assert fast == slow
    assert fast[5] == 5 and fast[6] == 5
    assert fast[None] == 5  # absorbed, not connected: 5/6 unchanged
    # a NULL with no non-NULL neighbor stays NULL-labeled on both paths
    lone = spark.createDataFrame([(None, None), (1, 2)], "src long, dst long")
    f2 = {r["id"]: r["comp"] for r in connected_components(lone).collect()}
    s2 = {
        r["id"]: r["comp"]
        for r in connected_components(lone, small_graph_threshold=None).collect()
    }
    assert f2 == s2 == {None: None, 1: 1, 2: 1}


def test_cluster_representatives_string_ids(spark):
    """Non-numeric ids take the two-aggregate path: ties still break to
    the MIN id deterministically (the unary-minus trick would silently
    cast a string to NULL — round-7 review finding)."""
    from real_time_event_driven_data_pipeline_spark.operators.components import (
        cluster_representatives,
    )

    pairs = spark.createDataFrame(
        [("u-b", "u-a"), ("u-a", "u-c"), ("x-2", "x-1")],
        "id_a string, id_b string",
    )
    clusters = near_dup_clusters(pairs)
    scores = spark.createDataFrame(
        [("u-a", 5), ("u-b", 9), ("u-c", 9), ("x-1", 4), ("x-2", 4)],
        "doc_id string, quality long",
    )
    got = {
        r.component: (r.cluster_size, r.kept_doc_id, r.kept_quality)
        for r in cluster_representatives(clusters, scores).collect()
    }
    # u cluster: b and c tie at 9 -> min id "u-b"; x cluster ties -> "x-1"
    assert got == {"u-a": (3, "u-b", 9), "x-1": (2, "x-1", 4)}


def _cc_str(spark, edges, small_graph_threshold=1_000_000):
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = connected_components(
        df, small_graph_threshold=small_graph_threshold
    ).collect()
    return {r["id"]: r["comp"] for r in rows}


def test_cc_string_ids_distributed_loop(spark):
    """Round-7 verdict finding: the distributed loop's old SUM(comp)
    convergence probe threw CAST_INVALID_INPUT on string vertex ids
    (md5 fingerprints, URLs) under ANSI — making the 100 TB path of
    every cluster query numeric-id-only.  The changed-labels probe is
    type-agnostic; both paths must agree on a multi-round string chain."""
    edges = [("d-b", "d-c"), ("d-a", "d-b"), ("d-c", "d-d"), ("x-9", "x-8")]
    want = {"d-a": "d-a", "d-b": "d-a", "d-c": "d-a", "d-d": "d-a",
            "x-8": "x-8", "x-9": "x-8"}
    assert _cc_str(spark, edges, small_graph_threshold=None) == want
    assert _cc_str(spark, edges) == want


_str_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=16,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_str_edges)
def test_cc_string_ids_match_union_find(spark, edges):
    """Property: random graphs re-labeled as zero-padded strings (so
    string order == numeric order) agree with the union-find reference
    on BOTH the distributed loop and the fast path, and with the star
    variant."""
    sedges = [(f"v{a:02d}", f"v{b:02d}") for a, b in edges]
    want = {f"v{v:02d}": f"v{c:02d}" for v, c in _union_find(edges).items()}
    assert _cc_str(spark, sedges, small_graph_threshold=None) == want
    assert _cc_str(spark, sedges) == want
    df = spark.createDataFrame(sedges, "src string, dst string")
    got_star = {r["id"]: r["comp"] for r in connected_components_star(df).collect()}
    assert got_star == want


def test_cluster_representatives_null_scores_paths_agree(spark):
    """Advice (r7): a component whose scores are ALL NULL must survive
    on both paths with kept_score NULL and kept_id = min id — the old
    non-numeric path's `score == _best` dropped it (NULL never equals)."""
    from real_time_event_driven_data_pipeline_spark.operators.components import (
        cluster_representatives,
    )

    # numeric ids -> max-of-struct path
    pairs_n = spark.createDataFrame([(2, 1), (1, 3), (8, 7)], "id_a long, id_b long")
    scores_n = spark.createDataFrame(
        [(1, None), (2, None), (3, None), (7, 4), (8, None)],
        "doc_id long, quality int",
    )
    got_n = {
        r.component: (r.cluster_size, r.kept_doc_id, r.kept_quality)
        for r in cluster_representatives(near_dup_clusters(pairs_n), scores_n).collect()
    }
    assert got_n == {1: (3, 1, None), 7: (2, 7, 4)}

    # string ids -> two-aggregate path; must agree shape-for-shape
    pairs_s = spark.createDataFrame(
        [("b", "a"), ("a", "c"), ("y", "x")], "id_a string, id_b string"
    )
    scores_s = spark.createDataFrame(
        [("a", None), ("b", None), ("c", None), ("x", 4), ("y", None)],
        "doc_id string, quality int",
    )
    got_s = {
        r.component: (r.cluster_size, r.kept_doc_id, r.kept_quality)
        for r in cluster_representatives(near_dup_clusters(pairs_s), scores_s).collect()
    }
    assert got_s == {"a": (3, "a", None), "x": (2, "x", 4)}


# --- incremental CC: fold new edges into an existing labeling ---

from real_time_event_driven_data_pipeline_spark.operators.components import (  # noqa: E402
    incremental_connected_components,
    merged_labels,
)


def _fold_incremental(spark, chunks, threshold=1_000_000):
    """Fold edge chunks through incremental_connected_components,
    composing the full table with merged_labels after each step."""
    labels = None
    last_updated = None
    for chunk in chunks:
        df = spark.createDataFrame(chunk, "src long, dst long")
        last_updated = incremental_connected_components(
            labels, df, small_graph_threshold=threshold
        )
        labels = merged_labels(labels, last_updated).localCheckpoint()
    return (
        {r["id"]: r["comp"] for r in labels.collect()},
        {r["id"]: r["comp"] for r in last_updated.collect()},
    )


def test_incremental_cc_bridge_merges_only_touched(spark):
    """A bridge edge between two existing components relabels exactly
    their members; an untouched third component must NOT appear in the
    updated rows (the bounded-work contract)."""
    full, updated = _fold_incremental(
        spark,
        [
            [(1, 2), (2, 3), (10, 11), (20, 21)],  # three components
            [(3, 10)],  # bridge 1-2-3 <-> 10-11; 20-21 untouched
        ],
    )
    assert full == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 20: 20, 21: 20}
    assert updated == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1}  # 20/21 absent


def test_incremental_cc_raises_on_null_ids(spark):
    """A planted NULL edge or NULL label row must raise loudly (r8
    verdict item 6): the star reduction would otherwise silently
    disconnect the NULL vertex, and a NULL-id label row would silently
    never relabel — the silent-wrong-labels failure class."""
    import pytest as _pytest

    good_labels = spark.createDataFrame([(1, 1), (2, 1)], "id long, comp long")
    null_edge = spark.createDataFrame(
        [(3, None), (4, 5)], "src long, dst long"
    )
    with _pytest.raises(ValueError, match="NULL vertex id in new_edges"):
        incremental_connected_components(good_labels, null_edge)
    with _pytest.raises(ValueError, match="NULL vertex id in new_edges"):
        incremental_connected_components(None, null_edge)  # first batch too

    null_labels = spark.createDataFrame(
        [(1, 1), (None, 1)], "id long, comp long"
    )
    good_edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError, match="NULL id/comp in labels"):
        incremental_connected_components(null_labels, good_edges)

    # clean inputs still work
    upd = incremental_connected_components(good_labels, good_edges)
    assert {r["id"]: r["comp"] for r in upd.collect()} == {1: 1, 2: 1}


def test_incremental_cc_new_vertices_and_string_ids(spark):
    labels = None
    c1 = [("a", "b")]
    c2 = [("c", "b"), ("x", "y")]
    df1 = spark.createDataFrame(c1, "src string, dst string")
    u1 = incremental_connected_components(labels, df1)
    labels = merged_labels(labels, u1)
    df2 = spark.createDataFrame(c2, "src string, dst string")
    u2 = incremental_connected_components(labels, df2)
    full = {r["id"]: r["comp"] for r in merged_labels(labels, u2).collect()}
    assert full == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges, cut=st.integers(min_value=0, max_value=20))
def test_incremental_cc_fold_equals_batch(spark, edges, cut):
    """Property (the r7 verdict's done-bar): any edge sequence folded
    incrementally in chunks equals batch CC over the union — both on
    the default fast path and through the distributed loop."""
    e = [(int(a), int(b)) for a, b in edges]
    k = min(cut, len(e))
    chunks = [c for c in (e[:k], e[k:]) if c]
    want = _union_find(edges)
    full_fast, _ = _fold_incremental(spark, chunks)
    assert full_fast == want
    full_slow, _ = _fold_incremental(spark, chunks, threshold=None)
    assert full_slow == want


def test_cc_raises_on_nonconvergence(spark):
    """Exhausting max_iter with labels still changing must FAIL LOUD —
    the old loop returned silently-wrong components for any graph of
    diameter > max_iter (round-8 self-review).  A 6-vertex chain needs
    ~4 propagation rounds; max_iter=2 must raise, and the message must
    name the diameter-independent star remedy."""
    import pytest as _pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="star"):
        connected_components(chain, max_iter=2, small_graph_threshold=None)
    # enough rounds: converges fine
    got = {
        r["id"]: r["comp"]
        for r in connected_components(
            chain, max_iter=10, small_graph_threshold=None
        ).collect()
    }
    assert got == {i: 0 for i in range(7)}


def test_prioritize_rejects_unknown_names():
    """A typo in the certification prefix must raise, not silently
    drop the query from the round's sampling order."""
    import pytest as _pytest

    from real_time_event_driven_data_pipeline_spark.plans import registry

    registry._ensure_loaded()
    with _pytest.raises(KeyError, match="not registered"):
        registry._prioritize("no_such_query_xyz", after=0)
    # and the real prefix still loads (no typos in it)
    assert "semantic_dedup_clusters_lsh" in registry.QUERIES


def test_register_rejects_duplicate_names():
    """Registering a name twice must raise at import time, not
    last-writer-win: round 8 shipped a query that silently shadowed
    `modality_profile` in the registry dict for two commits (r8
    verdict item 5 makes the failure structural)."""
    import pytest as _pytest

    from real_time_event_driven_data_pipeline_spark.plans import registry

    registry._ensure_loaded()
    existing = next(iter(registry.QUERIES))
    with _pytest.raises(ValueError, match="duplicate query name"):

        @registry.register(existing, oracle=None)
        def _clone(spark, sf_dir):  # pragma: no cover - must not register
            raise AssertionError("should never run")

    # the original binding is untouched and the count equals unique names
    assert registry.QUERIES[existing].name == existing
    assert len(registry.QUERIES) == len(set(registry.QUERIES))


def test_incremental_cc_tolerates_stale_label_rows(spark):
    """An append-only label sidecar read RAW has superseded rows; under
    append-only edges connectivity is monotone, so stale (id, comp)
    rows are valid (redundant) star edges and the update must equal
    the resolved-input run exactly (round-8: lets the curation gate
    skip the per-epoch resolve shuffle)."""
    # history: e1 made {5,22}->5; e2 merged in 3 -> {3,5,22,30}->3
    stale_plus_fresh = spark.createDataFrame(
        [(5, 5), (22, 5), (3, 3), (5, 3), (22, 3), (30, 3), (80, 80), (81, 80)],
        "id long, comp long",
    )
    resolved = spark.createDataFrame(
        [(5, 3), (22, 3), (3, 3), (30, 3), (80, 80), (81, 80)],
        "id long, comp long",
    )
    new_edges = spark.createDataFrame([(22, 4)], "src long, dst long")
    via_raw = {
        r["id"]: r["comp"]
        for r in incremental_connected_components(
            stale_plus_fresh, new_edges
        ).collect()
    }
    via_resolved = {
        r["id"]: r["comp"]
        for r in incremental_connected_components(resolved, new_edges).collect()
    }
    assert via_raw == via_resolved == {3: 3, 4: 3, 5: 3, 22: 3, 30: 3}
    # the untouched {80, 81} component appears in neither update
