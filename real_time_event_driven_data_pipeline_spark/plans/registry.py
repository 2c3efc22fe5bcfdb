"""Named-query registry: every operator from SURVEY §2, as a pair of
(PySpark plan builder, DuckDB oracle SQL) over the driver testdata.

This is the driver contract's backing store: ``__spark_entry__.queries``
and ``oracle_sql`` are thin views over ``QUERIES``.  Each entry keeps
the Spark implementation and its ANSI-SQL twin adjacent so the
column-name/rounding alignment (the correctness gate hashes values by
sorted column name) is reviewable in one place.

Queries whose semantics are not SQL-expressible (LSH banding, streaming
state) set ``oracle=None`` → the driver records a rows-only check and
pytest pins them against exact/batch references instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ref: str  # SURVEY §2 rows this query certifies


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None, survey_ref: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver supplies its own session; pin timezone & AQE
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        # Duplicate names must fail at import, not last-writer-win: a
        # round-8 query silently shadowed `modality_profile` for two
        # commits before a BENCH-set diff caught it.  dict assignment
        # would drop the earlier query from the driver contract with no
        # signal anywhere — the exact quiet failure the registry exists
        # to prevent.
        if name in QUERIES:
            raise ValueError(
                f"register: duplicate query name {name!r} — already "
                f"registered; rename one of the two"
            )
        QUERIES[name] = Query(name, wrapped, oracle, survey_ref)
        return wrapped

    return deco


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {n: q.fn for n, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    _ensure_loaded()
    return {n: q.oracle for n, q in QUERIES.items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import all modules that register queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # import errors must propagate: swallowing one would silently shrink
    # the registered query set and the driver would "pass" on the rump.
    # Order matters: the driver samples a prefix of the registration
    # order, and round 1 sampled only analytics+breadth — so the
    # families it has not yet hash-checked (reference-parity core KPIs,
    # the LLM-pipeline extensions, streaming twins) register first this
    # round; analytics/breadth (50 driver-green rows in r1) go last.
    from . import core_queries  # noqa: F401
    from . import extension_queries  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import analytics_queries  # noqa: F401
    from . import breadth_queries  # noqa: F401

    # round 11 sampling prefix (driver samples ~50): (a) queries whose
    # r10 optimization rewrites have never been driver-oracle-checked
    # post-change (r10 verdict item 2 — their last driver hash predates
    # the perceptron/featurization, dsir n_tokens, kmeans assignment,
    # min_cost semi-join, CC raw-edge gate, and search-cache rewrites);
    # (b) queries whose operators change in THIS round (crossmodal
    # shared-posting arm merge, bucket-gram column chunking, PPJoin
    # restructure candidates, window-core materialization A/B).
    _prioritize(
        # (b) touched this round — certify against the new code first
        "crossmodal_dup_clusters",
        "multimodal_dup_clusters",
        "semantic_dedup_clusters_lsh",
        "ngram_jaccard_near_dups",
        "incremental_near_dups",
        "acctbal_deciles",  # window-core correctness canary (r10 b3 §4)
        "context_packing",
        "top_order_percentiles",
        # (a) r10 rewrites with pre-rewrite driver hashes
        "quality_classifier_scores",
        "margin_curriculum_cut",
        "dsir_resampled_mixture",
        "kmeans_centroids",
        "kmeans_balanced_sample",
        "min_cost_suppliers",
        "dup_cluster_representatives",
        "search_rerank_topk",
        "hybrid_rrf_search",
        "near_dup_clusters",
        "curated_corpus",
        "minhash_lsh_near_dups",
        after=0,
    )

    _LOADED = True


def _prioritize(*names: str, after: int) -> None:
    """Reorder QUERIES so ``names`` sit at position ``after`` onward
    (dict insertion order is the driver's sampling order).  Unknown
    names raise: a typo would otherwise silently drop a query from the
    round's certification prefix — exactly the quiet failure the
    rotation exists to prevent."""
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise KeyError(f"_prioritize: not registered: {unknown}")
    rest = [n for n in QUERIES if n not in names]
    order = rest[:after] + list(names) + rest[after:]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    QUERIES.update({n: snapshot[n] for n in order})
