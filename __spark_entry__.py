"""Driver contract for the spark-graft builder (PySpark target).

Thin view over the engine's named-query registry
(``real_time_event_driven_data_pipeline_spark.plans.registry``): every
implemented operator from SURVEY.md §2 is registered there as a
(PySpark builder, DuckDB oracle SQL) pair.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from real_time_event_driven_data_pipeline_spark.plans.registry import (  # noqa: E402
    oracle_sql_map,
    queries_map,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (category_kpis) on /root/testdata/sf0.001."""
    return queries_map()["category_kpis"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return oracle_sql_map()
