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

    # round 8 sampling prefix (driver samples ~50): (a) NEW this round;
    # (b) code paths changed this round — the CC distributed-loop
    # convergence probe went type-agnostic, the representatives tie-back
    # went null-safe, span-scrub gained the exploded rebuild, and
    # exact-substring renamed its frequency knob (defaults unchanged,
    # but certification should postdate the edits); (c) the round-7
    # late-fix queries whose paths commit b3abfab touched AFTER the r7
    # driver run (r7 verdict item 3); (d) the oldest-certified tail —
    # queries last driver-hashed in r1/r2 rotate forward so no query's
    # record goes stale (r7 verdict item 6; the remainder rotates in r9).
    _prioritize(
        # (a) new in round 8
        "semantic_dedup_clusters_lsh",  # the 100 TB semantic-dedup path
        "source_modality_matrix",  # per-source x per-modality dashboard
        "bpe_encoded_docs",  # the encoded token stream (vocab applied)
        # (b) code path changed in round 8
        "dup_cluster_representatives",  # null-safe tie-back
        "near_dup_clusters",  # CC convergence probe
        "multimodal_dup_clusters",  # CC convergence probe
        "semantic_dedup_clusters",  # CC convergence probe
        "crossmodal_dup_clusters",  # CC convergence probe
        "eval_span_scrub",  # rebuild param added
        "exact_substring_dedup",  # min_freq rename
        "intra_doc_dedup",  # min_freq rename
        "bpe_merge_table",  # fit takes the new small-vocab local path
        "bpe_token_budget",  # same — certification must postdate it
        # (c) round-7 late-fix recertification
        "event_volume_anomalies",
        "source_overlap_matrix",
        "training_export_manifest",
        "temperature_source_mixture",
        "temperature_sampled_corpus",
        "quality_gate_reasons",
        "source_quality_profile",
        # (d) r1/r2-era certification rotation (oldest first)
        "pricing_summary",
        "discount_revenue_opportunity",
        "promo_revenue_share",
        "large_quantity_orders",
        "top_loss_customers",
        "revenue_cube",
        "latest_event_per_user",
        "part_name_features",
        "late_shipment_priorities",
        "idle_rich_customers",
        "part_supplier_variety",
        "revenue_grouping_sets",
        "top_unshipped_orders",
        "order_count_distribution",
        "important_part_stock",
        "small_quantity_revenue",
        "disjunctive_promo_revenue",
        "waiting_suppliers",
        "daily_revenue_dod",
        "min_cost_suppliers",
        "nation_trade_volume",
        "nation_profit",
        "excess_stock_suppliers",
        "events_null_props",
        "repeat_customers",
        "order_point_lookup",
        "lineitem_projection",
        "customers_without_orders",
        "orders_with_big_items",
        "nation_customer_counts",
        # (lineitem_summary_stats / top_orders_by_value and the other
        # 24 r1-era rows rotate in round 9 — the prefix stays ~50)
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
