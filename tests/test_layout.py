"""Z-order layout: multi-column file pruning from one clustered write.

The observable: per-file parquet min/max footer stats.  A single-column
sort prunes range predicates on its own column and nothing else; the
Morton layout prunes usefully on EVERY clustered column — the property
that matters when a 100 TB table serves several predicate shapes.
"""

import pyspark.sql.functions as F
import pytest

from real_time_event_driven_data_pipeline_spark.sinks.layout import (
    file_stat_ranges,
    pruning_fraction,
    zorder,
)

SF_DIR = "/root/testdata/sf0.01"
# 64 files = 6 Morton bits = 3 equi-depth bucket bits per clustered
# column; with fewer files the curve is too coarse to constrain either
# column (the same reason OPTIMIZE ZORDER pays off only past a few
# dozen files/row-groups per partition)
N_FILES = 64


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("layout")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    paths = {k: str(root / k) for k in ["plain", "sorted", "zorder"]}
    li.repartition(N_FILES).write.parquet(paths["plain"])
    li.repartitionByRange(N_FILES, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.parquet(paths["sorted"])
    zorder(li, ["l_orderkey", "l_partkey"], N_FILES).write.parquet(paths["zorder"])
    bounds = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).collect()[0]
    return spark, li, paths, bounds


def _slab(lo, hi, at=0.3, frac=0.02):
    """A narrow range predicate at the ``at`` quantile of the domain
    (off-center: a slab exactly at the midpoint straddles the top
    rank-code bit of every layout — the one cut no curve can prune)."""
    mid = lo + (hi - lo) * at
    w = (hi - lo) * frac / 2
    return mid - w, mid + w


def test_zorder_preserves_rows_and_stays_jvm_side(layouts):
    spark, li, paths, _ = layouts
    z = spark.read.parquet(paths["zorder"])
    assert z.count() == li.count()
    assert sorted(z.columns) == sorted(li.columns)
    assert (
        z.groupBy().sum("l_quantity").collect()[0][0]
        == li.groupBy().sum("l_quantity").collect()[0][0]
    )
    plan = zorder(li, ["l_orderkey", "l_partkey"], N_FILES)._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan and "PythonUDF" not in plan  # codegen path
    assert "rangepartitioning" in plan.lower()  # curve segments per file


def test_zorder_prunes_on_every_clustered_column(layouts):
    spark, _, paths, b = layouts
    ok_lo, ok_hi = _slab(b[0], b[1])
    pk_lo, pk_hi = _slab(b[2], b[3])
    cols = ["l_orderkey", "l_partkey"]
    prune = {}
    for k, p in paths.items():
        ranges = file_stat_ranges(spark, p, cols)
        assert len(ranges) == N_FILES
        prune[k] = (
            pruning_fraction(ranges, "l_orderkey", ok_lo, ok_hi),
            pruning_fraction(ranges, "l_partkey", pk_lo, pk_hi),
        )

    # unsorted: every file spans everything -> no pruning anywhere
    assert prune["plain"] == (0.0, 0.0)
    # single-column sort: excellent on its column, none on the other
    assert prune["sorted"][0] >= 0.75
    assert prune["sorted"][1] <= 0.25
    # z-order: substantial pruning on BOTH columns at once
    assert prune["zorder"][0] >= 0.5, prune
    assert prune["zorder"][1] >= 0.5, prune


def test_zorder_rejects_overflowing_code_width(layouts):
    spark, li, _, _ = layouts
    with pytest.raises(ValueError):
        zorder(li, ["l_orderkey", "l_partkey"], 4, bits=32)
