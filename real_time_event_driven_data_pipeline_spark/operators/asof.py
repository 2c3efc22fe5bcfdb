"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row at-or-before the
left row's timestamp within the same key group (the ``ASOF JOIN`` of
DuckDB/QuestDB, ``merge_asof`` of pandas).

Spark-first realization (composition of built-ins, no UDF):
union both sides tagged, then one window pass per key ordered by
(ts, side) carrying the right side's values forward with
``last(..., ignorenulls=True)``.  Cost = ONE shuffle on the key +
a sort within partitions — compare the naive inequality-join +
row_number approach whose intermediate is |L|x|R| per key.  At 100 TB
this is the difference between a windowed scan and a blow-up.

Right-side rows sort before left rows at equal timestamps, giving the
standard ``right.ts <= left.ts`` inclusion semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    values: list[str] | None = None,
    prefix: str = "asof_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row with ``right.on <= left.on``
    per ``by`` group.

    ``values``: right columns to attach (default: all non-key/ts
    columns).  Output = left columns + ``{prefix}{on}`` (matched right
    timestamp) + ``{prefix}{v}`` per value column; unmatched rows get
    nulls (left-join semantics).  ``tolerance_seconds`` nulls matches
    older than the window, like pandas ``merge_asof(tolerance=...)``.
    """
    by = by or []
    if values is None:
        values = [c for c in right.columns if c != on and c not in by]

    matched_ts = f"{prefix}{on}"
    out_vals = {v: f"{prefix}{v}" for v in values}

    # the right row travels as ONE struct so a null *field* in a matched
    # row stays null instead of being skipped past by ignorenulls
    r_struct = F.struct(F.col(on).alias("__ts"), *[F.col(v).alias(v) for v in values])
    l_tagged = left.select(*left.columns, F.lit(1).alias("__side"))
    # null-ts right rows can never satisfy `right.on <= left.on` (SQL
    # comparison with null is never true), but window ordering would
    # sort them FIRST and carry them into every row's frame — drop them
    # so window and join semantics agree (ADVICE r4)
    r_tagged = right.filter(F.col(on).isNotNull()).select(
        *by, F.col(on), F.lit(0).alias("__side"), r_struct.alias("__r")
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows (side=0) sort before left rows at the same ts ->
    # inclusive <= semantics; one shuffle on `by`, sorted scan after
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *left.columns,
        F.col("__m.__ts").alias(matched_ts),
        *[F.col(f"__m.{v}").alias(out_vals[v]) for v in values],
    )

    if tolerance_seconds is not None:
        too_old = (
            F.unix_micros(F.col(on)) - F.unix_micros(F.col(matched_ts))
            > int(tolerance_seconds * 1_000_000)
        )
        out = out.select(
            *left.columns,
            *[
                F.when(too_old, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in [matched_ts, *out_vals.values()]
            ],
        )
    return out


_ASOF_AGG_FNS = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}


def asof_aggregate(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    aggs: dict[str, tuple[str, str]] | None = None,
    include_equal: bool = True,
) -> DataFrame:
    """Grouped as-of variant: for each left row, aggregate over ALL
    right rows with ``right.on <= left.on`` in the same ``by`` group —
    not just the latest one (``asof_join``), and with no fixed lower
    bound (the range join).  E.g. "clicks by this user up to this
    purchase".

    ``aggs`` maps output column -> (right value column, fn) with fn in
    {count, sum, min, max, avg}.  ``count`` counts matching right ROWS
    (0 when none); the others return null when no row matches (SQL
    aggregate-over-empty semantics, so a LEFT JOIN + GROUP BY oracle
    agrees).  ``include_equal=False`` makes the bound strict (<).

    Same plan shape as ``asof_join``: union the tagged sides, ONE
    shuffle on ``by``, and a single sorted cumulative-window scan —
    never the |L|x|R| inequality-join blow-up.  avg is computed as
    cumulative sum / cumulative count at the end (no second pass).
    """
    by = by or []
    aggs = aggs or {}

    l_tagged = left.select(*left.columns, F.lit(1).alias("__side"))
    need = sorted({c for c, _ in aggs.values()})
    # null-ts right rows never match `right.on <= left.on` in the SQL
    # oracle, but sort FIRST under window ordering and would aggregate
    # into every frame — drop them so the semantics agree (ADVICE r4)
    r_tagged = right.filter(F.col(on).isNotNull()).select(
        *by, F.col(on), F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__rv_{c}") for c in need],
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows (side=0) sort before left rows at equal ts -> <=
    # semantics; after left rows (side first, desc via flipping order)
    # for strict < the right row at the same ts must NOT be seen yet,
    # so left rows sort first instead.
    side_order = F.col("__side") if include_equal else -F.col("__side")
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    tmp = unioned
    for name, (col, fn) in aggs.items():
        rv = F.col(f"__rv_{col}")
        if fn == "count":
            expr = F.count(F.when(F.col("__side") == 0, F.lit(1))).over(w)
        elif fn in _ASOF_AGG_FNS:
            expr = _ASOF_AGG_FNS[fn](F.when(F.col("__side") == 0, rv)).over(w)
        elif fn == "avg":
            s = F.sum(F.when(F.col("__side") == 0, rv)).over(w)
            c = F.count(F.when(F.col("__side") == 0, rv)).over(w)
            expr = s / F.nullif(c.cast("double"), F.lit(0.0))
        else:
            raise ValueError(f"unknown asof aggregate fn {fn!r} for {name!r}")
        tmp = tmp.withColumn(name, expr)
    return tmp.filter(F.col("__side") == 1).select(*left.columns, *list(aggs))
