"""Range (interval) join — points into intervals without the O(|P|x|I|)
blow-up.

A naive ``P JOIN I ON p.ts BETWEEN i.start AND i.end`` plans as a
(broadcast) nested-loop join: every point tested against every
interval per key.  The binned realization co-partitions both sides on
time bins: each interval is exploded onto the bins it covers, each
point lands in exactly one bin, the equi-join on (key, bin) touches
only co-binned pairs, and the exact range predicate filters within.
Each (point, interval) pair meets exactly once — in the point's bin —
so no dedup is needed.

Pick ``bin_seconds`` ~ the typical interval length: too small explodes
intervals onto many bins, too large approaches the nested loop within
a bin.  This is the standard time-binning strategy for interval joins
on shuffle engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval containing them (inclusive
    bounds), equi-keyed on ``by`` + time bin.

    Output = point columns + interval columns (callers project/rename;
    ``by`` columns are deduplicated to one copy).
    """
    by = by or []
    width = bin_seconds * _US
    p_bin = (F.unix_micros(F.col(point_ts)) / width).cast("long")
    i_start_bin = (F.unix_micros(F.col(start_col)) / width).cast("long")
    i_end_bin = (F.unix_micros(F.col(end_col)) / width).cast("long")

    p = points.withColumn("__bin", p_bin)
    i = intervals.withColumn("__bin", F.explode(F.sequence(i_start_bin, i_end_bin)))

    # the range predicate is part of the JOIN CONDITION, not a post-join
    # filter — a filter would silently drop the null-extended rows of an
    # outer join, collapsing how='left' to inner semantics
    cond = (
        (p["__bin"] == i["__bin"])
        & (p[point_ts] >= i[start_col])
        & (p[point_ts] <= i[end_col])
    )
    for c in by:
        cond = cond & (p[c] == i[c])
    joined = p.join(i, cond, how)
    # single copy of the by/bin columns
    keep_p = [p[c] for c in points.columns]
    keep_i = [i[c] for c in intervals.columns if c not in by]
    return joined.select(*keep_p, *keep_i)
