"""Operator-breadth queries: one named query per remaining SURVEY §2
row, each oracle-checkable, so the inventory is line-by-line certified
on the driver testdata.

Determinism rules applied throughout (see functions/money.py and the
project verify skill):
- ratio/avg outputs -> exact integer math;
- sums of 2-dp money -> round(sum, 2) (true value exact at 2 dp);
- sums of arbitrary doubles -> round(sum, 4) (boundary risk ~1e-8);
- ORDER BY ... LIMIT and window ranks -> tie-broken by a unique key,
  ordering on *rounded* measures so FP noise cannot reorder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_testdata
from .registry import register


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    d = load_testdata(spark, sf_dir, *names)
    return [d[n] for n in names]


# --- P1/F4: null-predicate filter (validate.py:110,118,126) ---


@register(
    "events_null_props",
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_null_props FROM events WHERE props IS NULL",
    "P1,F4,A11",
)
def q_events_null_props(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    return events.filter(F.col("props").isNull()).agg(
        F.count(F.lit(1)).alias("n_null_props")
    )


# --- P2/A1: group-count + having-as-filter (validate.py:160,168) ---


@register(
    "repeat_customers",
    """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 15
    ORDER BY order_count DESC, o_custkey
    """,
    "A1,P2,O1",
)
def q_repeat_customers(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .filter("order_count > 15")
        .orderBy(F.desc("order_count"), "o_custkey")
    )


# --- P3: equality-literal point lookup (notebook EDA) ---


@register(
    "order_point_lookup",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, ROUND(o_totalprice, 2) AS total_price
    FROM orders WHERE o_orderkey = 42
    """,
    "P3,P4,P7",
)
def q_order_point_lookup(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") == 42).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("total_price"),
    )


# --- P4/P5/P7/F1/F5: projection with derived columns ---


@register(
    "lineitem_projection",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_shipdate AS DATE)                    AS ship_date,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           ROUND(l_extendedprice * l_tax, 4)            AS tax_amount
    FROM lineitem WHERE l_quantity >= 49
    """,
    "P4,P5,P7,F1,F5",
)
def q_lineitem_projection(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_quantity") >= 49)
        .withColumn("ship_date", F.to_date("l_shipdate"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "ship_date",
            # 2dp × 2dp factors → true value exact at 4dp, so round(.,4)
            # is boundary-safe; round(.,2) would sit on half boundaries
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
            F.round(F.col("l_extendedprice") * F.col("l_tax"), 4).alias("tax_amount"),
        )
    )


# --- J3 variant: anti-join over a different parent pair ---


@register(
    "customers_without_orders",
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    "J3,A12",
)
def q_customers_without_orders(spark, sf_dir):
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(
            orders.select("o_custkey"),
            customer.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# --- left-semi join (EXISTS) ---


@register(
    "orders_with_big_items",
    """
    SELECT o.o_orderkey, o.o_orderstatus
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 50)
    ORDER BY o.o_orderkey
    """,
    "J1 semi variant",
)
def q_orders_with_big_items(spark, sf_dir):
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    big = lineitem.filter(F.col("l_quantity") >= 50).select("l_orderkey")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


# --- left-outer join + multi-way dim chain ---


@register(
    "nation_customer_counts",
    """
    SELECT r.r_name, n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers
    FROM region r
    LEFT JOIN nation n   ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "J1 outer variant,A2",
)
def q_nation_customer_counts(spark, sf_dir):
    region, nation, customer = _t(spark, sf_dir, "region", "nation", "customer")
    return (
        region.join(nation, nation.n_regionkey == region.r_regionkey, "left_outer")
        .join(customer, customer.c_nationkey == nation.n_nationkey, "left_outer")
        .groupBy("r_name", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
        .orderBy("r_name", "n_name")
    )


# --- A13: summary statistics (describe(), aliased for the oracle) ---


@register(
    "lineitem_summary_stats",
    """
    SELECT CAST(COUNT(*) AS BIGINT)            AS n_rows,
           ROUND(AVG(l_quantity), 4)           AS avg_qty,
           ROUND(STDDEV_SAMP(l_quantity), 4)   AS std_qty,
           MIN(l_quantity)                     AS min_qty,
           MAX(l_quantity)                     AS max_qty,
           ROUND(AVG(l_extendedprice), 4)      AS avg_price,
           MIN(l_extendedprice)                AS min_price,
           MAX(l_extendedprice)                AS max_price
    FROM lineitem
    """,
    "A13",
)
def q_lineitem_summary_stats(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


# --- O1-O3: global sort + limit (top-k with deterministic tie-break) ---


@register(
    "top_orders_by_value",
    """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders ORDER BY ROUND(o_totalprice, 2) DESC, o_orderkey LIMIT 25
    """,
    "O1-O3",
)
def q_top_orders_by_value(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"))
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(25)
    )


# --- set operations (SURVEY §2.7: absent in reference, added) ---


@register(
    "priority_segment_union",
    """
    SELECT DISTINCT o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) ORDER BY o_custkey
    """,
    "set ops: union/distinct",
)
def q_priority_segment_union(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return urgent.unionAll(finished).distinct().orderBy("o_custkey")


@register(
    "urgent_only_customers",
    """
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    ORDER BY o_custkey
    """,
    "set ops: except",
)
def q_urgent_only_customers(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    # subtract = set EXCEPT (exceptAll would keep per-occurrence leftovers)
    return urgent.subtract(low).orderBy("o_custkey")


# --- window functions (SURVEY §2.5: capability signaled, we implement) ---


@register(
    "top3_parts_per_brand",
    """
    SELECT p_brand, p_partkey, revenue, rn FROM (
        SELECT p.p_brand, p.p_partkey,
               ROUND(SUM(l.l_extendedprice), 2) AS revenue,
               ROW_NUMBER() OVER (PARTITION BY p.p_brand
                                  ORDER BY ROUND(SUM(l.l_extendedprice), 2) DESC,
                                           p.p_partkey) AS rn
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, p.p_partkey
    ) WHERE rn <= 3 ORDER BY p_brand, rn
    """,
    "window: row_number top-k per group",
)
def q_top3_parts_per_brand(spark, sf_dir):
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    per_part = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), "p_partkey")
    return (
        per_part.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter("rn <= 3")
        .select("p_brand", "p_partkey", "revenue", "rn")
        .orderBy("p_brand", "rn")
    )


@register(
    "daily_revenue_running",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS ship_date,
               ROUND(SUM(l_extendedprice), 2) AS revenue
        FROM lineitem GROUP BY 1
    )
    SELECT ship_date, revenue,
           ROUND(SUM(revenue) OVER (ORDER BY ship_date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_revenue,
           ROUND(revenue - LAG(revenue) OVER (ORDER BY ship_date), 2)  AS revenue_delta
    FROM daily ORDER BY ship_date
    """,
    "window: running sum + lag",
)
def q_daily_revenue_running(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    daily = (
        lineitem.withColumn("ship_date", F.to_date("l_shipdate"))
        .groupBy("ship_date")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )
    w = Window.orderBy("ship_date")
    return (
        daily.withColumn(
            "running_revenue",
            F.round(F.sum("revenue").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2),
        )
        .withColumn("revenue_delta", F.round(F.col("revenue") - F.lag("revenue").over(w), 2))
        .orderBy("ship_date")
    )


# --- grouping sets / rollup (beyond reference; A2 generalization) ---


@register(
    "revenue_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT)       AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "agg: rollup/grouping sets",
)
def q_revenue_rollup(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --- pivot (beyond reference) ---


@register(
    "quantity_pivot",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_open,
           ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_finished
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    "agg: pivot",
)
def q_quantity_pivot(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    pivoted = (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return pivoted.select(
        "l_returnflag",
        F.col("O").alias("qty_open"),
        F.col("F").alias("qty_finished"),
    ).orderBy("l_returnflag")


# --- scalar-function battery (F1-F7 + string/date fns) ---


@register(
    "event_time_features",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%d')                    AS day_str,
           CAST(year(ts) AS INT)                       AS y,
           CAST(month(ts) AS INT)                      AS m,
           CAST(hour(ts) AS INT)                       AS h,
           upper(event_type)                           AS type_uc,
           CAST(length(event_type) AS INT)             AS type_len,
           CAST(FLOOR(value) AS BIGINT)                AS value_floor,
           CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS value_band
    FROM events WHERE event_id % 97 = 0
    """,
    "F1-F7, string/date scalar fns",
)
def q_event_time_features(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    return events.filter(F.col("event_id") % 97 == 0).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.hour("ts").cast("int").alias("h"),
        F.upper("event_type").alias("type_uc"),
        F.length("event_type").cast("int").alias("type_len"),
        F.floor("value").cast("long").alias("value_floor"),
        F.when(F.col("value") >= 50, "high").otherwise("low").alias("value_band"),
    )


# --- exact percentiles (beyond reference; A-agg generalization) ---


@register(
    "price_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    "agg: exact percentile",
)
def q_price_percentiles(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


# --- array aggregation: collect_set + sort (beyond reference) ---
# Emitted as a joined string so value comparison is serialization-
# agnostic across engines.


@register(
    "brand_type_catalog",
    """
    SELECT p_brand,
           string_agg(DISTINCT p_type, '|' ORDER BY p_type) AS types,
           CAST(COUNT(DISTINCT p_type) AS BIGINT)           AS n_types
    FROM part GROUP BY 1 ORDER BY 1
    """,
    "agg: collect_set -> sorted array -> string",
)
def q_brand_type_catalog(spark, sf_dir):
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.array_join(F.array_sort(F.collect_set("p_type")), "|").alias("types"),
            F.countDistinct("p_type").alias("n_types"),
        )
        .orderBy("p_brand")
    )


# --- range-frame window: 7-day moving average (beyond reference) ---
# RANGE frame keyed on day number so calendar gaps count, unlike a
# 7-ROW frame.  Sums in exact cents; the ratio is int/int (bit-stable).


@register(
    "daily_revenue_7d_ma",
    """
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS ship_date,
               CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS day_num,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS rev_cents,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem GROUP BY 1, 2
    )
    SELECT ship_date,
           ROUND(rev_cents / 100.0, 2) AS revenue,
           SUM(rev_cents) OVER w / 100.0
             / SUM(1) OVER w            AS revenue_7d_ma,
           CAST(SUM(n_items) OVER w AS BIGINT) AS items_7d
    FROM daily
    WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY ship_date
    """,
    "window: RANGE frame over day numbers (7-day moving aggregate)",
)
def q_daily_revenue_7d_ma(spark, sf_dir):
    from ..functions.money import cents

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    daily = (
        lineitem.withColumn("ship_date", F.to_date("l_shipdate"))
        .withColumn("day_num", F.datediff("ship_date", F.lit("1970-01-01")))
        .groupBy("ship_date", "day_num")
        .agg(
            F.sum(cents("l_extendedprice")).alias("rev_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return (
        daily.select(
            "ship_date",
            F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
            (
                (F.sum("rev_cents").over(w) / F.lit(100.0))
                / F.sum(F.lit(1)).over(w)
            ).alias("revenue_7d_ma"),
            F.sum("n_items").over(w).cast("long").alias("items_7d"),
        )
        .orderBy("ship_date")
    )


# --- 6-way star join over every dimension table (TPC-H Q5 shape) ---
# Exercises join reordering + broadcast selection across region ->
# nation -> {customer, supplier} -> orders -> lineitem with the
# local-supplier condition (customer and supplier in the same nation).


@register(
    "regional_supplier_volume",
    """
    SELECT n.n_name                                      AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT)                      AS n_items
    FROM region r
    JOIN nation n    ON n.n_regionkey = r.r_regionkey
    JOIN customer c  ON c.c_nationkey = n.n_nationkey
    JOIN orders o    ON o.o_custkey   = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey  = o.o_orderkey
    JOIN supplier s  ON s.s_suppkey   = l.l_suppkey
                    AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1 ORDER BY revenue DESC, nation
    """,
    "join: 6-way star (TPC-H Q5 shape), local-supplier condition",
)
def q_regional_supplier_volume(spark, sf_dir):
    region, nation, customer, orders, lineitem, supplier = _t(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem", "supplier"
    )
    return (
        region.filter(F.col("r_name") == "ASIA")
        .join(nation, nation.n_regionkey == region.r_regionkey)
        .join(customer, customer.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            supplier,
            (supplier.s_suppkey == lineitem.l_suppkey)
            & (supplier.s_nationkey == customer.c_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "nation")
    )


# --- correlated-subquery shape (decorrelated to a self-join/window) ---


@register(
    "parts_above_brand_avg",
    """
    SELECT p_partkey, p_brand, p_retailprice,
           avg_brand_price
    FROM (
        -- exact integer-cents average: double SUM() accumulation order
        -- differs between engines in the last bits
        SELECT p_partkey, p_brand, p_retailprice,
               SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) OVER w / 100.0
                 / COUNT(*) OVER w AS avg_brand_price
        FROM part
        WINDOW w AS (PARTITION BY p_brand)
    )
    WHERE p_retailprice > avg_brand_price
    ORDER BY p_partkey
    """,
    "subquery: correlated avg filter (decorrelated via window)",
)
def q_parts_above_brand_avg(spark, sf_dir):
    from ..functions.money import cents

    (part,) = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    avg_exact = (F.sum(cents("p_retailprice")).over(w) / F.lit(100.0)) / F.count(
        F.lit(1)
    ).over(w)
    return (
        part.withColumn("avg_brand_price", avg_exact)
        .filter(F.col("p_retailprice") > F.col("avg_brand_price"))
        .select("p_partkey", "p_brand", "p_retailprice", "avg_brand_price")
        .orderBy("p_partkey")
    )


# --- histogram / binning (floor-division buckets, engine-exact) ---


@register(
    "price_histogram",
    """
    SELECT CAST(FLOOR(l_extendedprice / 500) AS BIGINT) * 500 AS bin_low,
           CAST(COUNT(*) AS BIGINT)                           AS n_items,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
                                                              AS bin_revenue
    FROM lineitem
    GROUP BY 1 ORDER BY 1
    """,
    "agg: histogram binning by floor division",
)
def q_price_histogram(spark, sf_dir):
    from ..functions.money import cents

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.withColumn(
            "bin_low", (F.floor(F.col("l_extendedprice") / 500) * 500).cast("long")
        )
        .groupBy("bin_low")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(cents("l_extendedprice")) / 100.0, 2).alias("bin_revenue"),
        )
        .orderBy("bin_low")
    )


# --- set op: INTERSECT (completes union/except coverage) ---


@register(
    "both_priority_customers",
    """
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    ORDER BY o_custkey
    """,
    "set ops: intersect",
)
def q_both_priority_customers(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersect(low).orderBy("o_custkey")


# --- distribution windows: percent_rank / cume_dist ---
# Both are int/int ratios of deterministic ranks (unique-key tiebreak),
# so the doubles are bit-identical across engines.


@register(
    "top_order_percentiles",
    """
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS total_price,
           PERCENT_RANK() OVER (ORDER BY ROUND(o_totalprice, 2), o_orderkey) AS pct_rank,
           CUME_DIST()    OVER (ORDER BY ROUND(o_totalprice, 2), o_orderkey) AS cume
    FROM orders WHERE o_orderkey % 191 = 0
    ORDER BY o_orderkey
    """,
    "window: percent_rank + cume_dist",
)
def q_top_order_percentiles(spark, sf_dir):
    # two-pass rank (round-2 verdict weakness #3): the unique order key
    # (total_price, o_orderkey) makes RANK == ROW_NUMBER, so
    # PERCENT_RANK = (rn-1)/(N-1) and CUME_DIST = rn/N with the global
    # rn computed hierarchically (operators/windows.py) and N a 1-row
    # broadcast -- the same int/int double divisions the window
    # operators perform, hence bit-identical output.
    from ..operators.windows import with_global_row_number

    (orders,) = _t(spark, sf_dir, "orders")
    sub = orders.filter(F.col("o_orderkey") % 191 == 0).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("total_price")
    )
    # checkpoint materialization: cheap filtered-scan upstream (r11 A/B)
    ranked = with_global_row_number(
        sub, ["total_price", "o_orderkey"], "rn", materialize="checkpoint"
    )
    total = sub.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        ranked.join(F.broadcast(total))  # single-row scalar
        .select(
            "o_orderkey",
            "total_price",
            (
                (F.col("rn") - 1).cast("double")
                / F.greatest(F.col("n_total") - 1, F.lit(1)).cast("double")
            ).alias("pct_rank"),
            (F.col("rn").cast("double") / F.col("n_total").cast("double")).alias(
                "cume"
            ),
        )
        .orderBy("o_orderkey")
    )


# --- full outer join (J-variant breadth: both-null-sides month edges) ---

MONTHLY_ORDERS_SHIPMENTS_SQL = """
WITH o AS (
    SELECT date_trunc('month', o_orderdate)::DATE AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
), l AS (
    SELECT date_trunc('month', l_shipdate)::DATE AS month,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_shipped
    FROM lineitem GROUP BY 1
)
SELECT COALESCE(o.month, l.month) AS month, o.n_orders, l.n_lines, l.qty_shipped
FROM o FULL OUTER JOIN l ON o.month = l.month
ORDER BY month
"""


@register(
    "monthly_orders_vs_shipments",
    MONTHLY_ORDERS_SHIPMENTS_SQL,
    "J-full-outer: order months vs shipment months (one-sided edges)",
)
def q_monthly_orders_vs_shipments(spark, sf_dir):
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    o = (
        orders.groupBy(
            F.trunc(F.col("o_orderdate").cast("date"), "month").alias("month")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    l = (
        lineitem.groupBy(
            F.trunc(F.col("l_shipdate").cast("date"), "month").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty_shipped"),
        )
    )
    return (
        o.join(l, "month", "full_outer")
        .select("month", "n_orders", "n_lines", "qty_shipped")
        .orderBy("month")
    )
