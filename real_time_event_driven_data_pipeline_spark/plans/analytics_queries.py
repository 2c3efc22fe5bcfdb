"""TPC-H-shaped analytical queries over the driver testdata.

The reference's KPI queries (SURVEY §2.11) are join+agg at daily grain;
these queries generalize the same operator classes (A2-A10 aggregation,
J1/J2 joins, O1-O3 sorts) to the classic decision-support shapes a user
of the engine would run next: scan-heavy pricing summaries, selective
pushdown filters, conditional-ratio KPIs, having-gated semi joins,
top-N loss reports, cube/grouping-set rollups, string feature
extraction, wide→long unpivots, and latest-per-key dedup.

Determinism rules follow functions/money.py: 2-dp money sums in exact
integer cents, 4-dp products (price×discount) in exact ten-thousandths,
ratios as integer-operand double division (correctly rounded, identical
bits in any IEEE engine), and every ORDER BY tie-broken by a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import cents
from ..sources.readers import load_testdata
from .registry import register


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    d = load_testdata(spark, sf_dir, *names)
    return [d[n] for n in names]


def _units4(col) -> F.Column:
    """Exact integer ten-thousandths of a product of two 2-dp values."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 10000).cast("long")


# --- TPC-H Q1 shape: full-scan multi-measure pricing summary ---
# The heaviest pure-aggregation query in the set: one scan, one shuffle
# on a 4-value group key, partial+final hash agg, every measure fused
# into the same Aggregate operator (verified: single WholeStageCodegen
# span covering scan→partial agg).


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)        AS sum_qty,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
                                                                  AS sum_base_price,
           ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 4)
                                                                  AS sum_disc_price,
           ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) / 1000000.0, 4)
                                                                  AS sum_charge,
           CAST(FLOOR((2 * SUM(CAST(l_quantity AS BIGINT)) * 100 + COUNT(*))
                      / (2 * COUNT(*))) AS BIGINT) / 100.0        AS avg_qty,
           CAST(FLOOR((2 * SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) + COUNT(*))
                      / (2 * COUNT(*))) AS BIGINT) / 100.0        AS avg_price,
           CAST(COUNT(*) AS BIGINT)                               AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "A2,A4,A5,A10 generalization: TPC-H Q1 pricing summary",
)
def q_pricing_summary(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")  # quantities are integral
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    sum_qty = F.sum(qty)
    sum_price_cents = F.sum(cents("l_extendedprice"))
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.alias("sum_qty"),
            F.round(sum_price_cents / 100.0, 2).alias("sum_base_price"),
            F.round(F.sum(_units4(disc_price)) / 10000.0, 4).alias("sum_disc_price"),
            F.round(
                F.sum(F.round(charge * 1000000).cast("long")) / 1000000.0, 4
            ).alias("sum_charge"),
            # round-half-up integer averages (see functions/money.py)
            (F.floor((2 * sum_qty * 100 + n) / (2 * n)) / F.lit(100.0)).alias("avg_qty"),
            (F.floor((2 * sum_price_cents + n) / (2 * n)) / F.lit(100.0)).alias(
                "avg_price"
            ),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- TPC-H Q6 shape: selective scan-aggregate (pushdown showcase) ---
# All three predicates reach the parquet reader as PushedFilters; the
# plan is scan→filter→partial agg→single-row exchange→final agg with no
# join and no wide shuffle.  At 100 TB this is the I/O-bound archetype:
# row-group statistics skip most of the file before Spark sees a row.


@register(
    "discount_revenue_opportunity",
    """
    SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT)) / 10000.0, 4)
               AS potential_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "P-pushdown,A4: TPC-H Q6 selective scan-agg",
)
def q_discount_revenue_opportunity(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(_units4(F.col("l_extendedprice") * F.col("l_discount")))
                / 10000.0,
                4,
            ).alias("potential_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- TPC-H Q14 shape: conditional-ratio KPI over a broadcast join ---


@register(
    "promo_revenue_share",
    """
    WITH j AS (
        SELECT CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT) AS rev_u,
               p.p_type = 'PROMO' AS is_promo
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT 100.0 * SUM(rev_u) FILTER (WHERE is_promo) / SUM(rev_u) AS promo_share_pct,
           ROUND(SUM(rev_u) FILTER (WHERE is_promo) / 10000.0, 4)  AS promo_revenue,
           ROUND(SUM(rev_u) / 10000.0, 4)                          AS total_revenue
    FROM j
    """,
    "J2,A7,A9: TPC-H Q14 promo revenue ratio",
)
def q_promo_revenue_share(spark, sf_dir):
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    rev_u = _units4(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo_u = F.sum(F.when(F.col("p_type") == "PROMO", rev_u))
    total_u = F.sum(rev_u)
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .agg(
            # long operands -> double division, correctly rounded, bit-stable
            (F.lit(100.0) * promo_u / total_u).alias("promo_share_pct"),
            F.round(promo_u / 10000.0, 4).alias("promo_revenue"),
            F.round(total_u / 10000.0, 4).alias("total_revenue"),
        )
    )


# --- TPC-H Q18 shape: having-gated aggregation joined back to dims ---
# The agg side (sum per orderkey) is the big shuffle; the dim joins
# afterwards touch only the few surviving keys, so Spark broadcasts the
# survivors' join against orders/customer under AQE.


@register(
    "large_quantity_orders",
    """
    SELECT c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE)      AS order_date,
           ROUND(o.o_totalprice, 2)         AS total_price,
           CAST(s.total_qty AS BIGINT)      AS total_qty
    FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS total_qty
          FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 200) s
    JOIN orders o   ON o.o_orderkey = s.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    ORDER BY total_qty DESC, o.o_orderkey
    LIMIT 100
    """,
    "A1,P2,J1: TPC-H Q18 large-volume orders",
)
def q_large_quantity_orders(spark, sf_dir):
    lineitem, orders, customer = _t(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(customer, customer.c_custkey == orders.o_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.col("total_qty").cast("long").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


# --- TPC-H Q10 shape: top-N loss report (returned items per customer) ---


@register(
    "top_loss_customers",
    """
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0, 4)
               AS lost_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_returned_items
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) DESC,
             c.c_custkey
    LIMIT 20
    """,
    "J1,A2,O3: TPC-H Q10 returned-item loss per customer",
)
def q_top_loss_customers(spark, sf_dir):
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    rev_u = _units4(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.sum(rev_u).alias("rev_u"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .orderBy(F.desc("rev_u"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.round(F.col("rev_u") / 10000.0, 4).alias("lost_revenue"),
            "n_returned_items",
        )
    )


# --- CUBE with grouping flags (generalizes the rollup query) ---


@register(
    "revenue_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT)  AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT)  AS g_status,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "agg: CUBE + GROUPING() flags",
)
def q_revenue_cube(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            # grouping() is only resolvable inside the Aggregate itself
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.round(F.sum(cents("l_extendedprice")) / 100.0, 2).alias("revenue"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "revenue")
        .orderBy(
            "g_flag",
            "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --- latest-per-key dedup (argmax pattern: CDC/log compaction) ---
# The canonical "keep the newest record per key" operator every log
# pipeline needs; one shuffle on the key, rank inside the partition.


@register(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, event_type, ts FROM (
        SELECT user_id, event_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    "dedup: latest-record-per-key (CDC compaction shape)",
)
def q_latest_event_per_user(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_id", "event_type", "ts")
        .orderBy("user_id")
    )


# --- string-function battery (split/substr/concat/regexp/pad) ---


@register(
    "part_name_features",
    """
    SELECT p_partkey,
           upper(split_part(p_name, ' ', 1))                   AS adjective,
           split_part(p_name, ' ', 2)                          AS noun,
           CAST(length(p_name) AS INT)                         AS name_len,
           concat(p_brand, ':', p_type)                        AS brand_type,
           substring(p_name, 1, 3)                             AS prefix3,
           replace(p_name, ' ', '_')                           AS snake_name,
           lpad(CAST(p_size AS VARCHAR), 3, '0')               AS size_padded,
           CASE WHEN regexp_matches(p_name, '^(red|blue|green)')
                THEN regexp_extract(p_name, '^(red|blue|green)', 1)
                ELSE NULL END                                  AS color
    FROM part WHERE p_partkey % 7 = 0
    ORDER BY p_partkey
    """,
    "F: string scalar battery (split/substr/concat/regexp/pad)",
)
def q_part_name_features(spark, sf_dir):
    (part,) = _t(spark, sf_dir, "part")
    # regexp_extract returns '' (not NULL) on no-match in Spark; nullify
    # to match the SQL CASE shape
    color_raw = F.regexp_extract("p_name", r"^(red|blue|green)", 1)
    return (
        part.filter(F.col("p_partkey") % 7 == 0)
        .select(
            "p_partkey",
            F.upper(F.split(F.col("p_name"), " ").getItem(0)).alias("adjective"),
            F.split(F.col("p_name"), " ").getItem(1).alias("noun"),
            F.length("p_name").cast("int").alias("name_len"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.substring("p_name", 1, 3).alias("prefix3"),
            F.regexp_replace("p_name", " ", "_").alias("snake_name"),
            F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
            F.when(color_raw != "", color_raw).alias("color"),
        )
        .orderBy("p_partkey")
    )


# --- wide→long unpivot (melt) via stack() ---


@register(
    "flag_measures_long",
    """
    WITH wide AS (
        SELECT l_returnflag,
               SUM(CAST(l_quantity AS BIGINT))                   AS qty,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS price_cents,
               CAST(COUNT(*) AS BIGINT)                          AS n_items
        FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, measure, amount FROM (
        SELECT l_returnflag, 'qty'         AS measure, qty         AS amount FROM wide
        UNION ALL
        SELECT l_returnflag, 'price_cents' AS measure, price_cents AS amount FROM wide
        UNION ALL
        SELECT l_returnflag, 'n_items'     AS measure, n_items     AS amount FROM wide
    ) ORDER BY l_returnflag, measure
    """,
    "reshape: wide->long unpivot (stack)",
)
def q_flag_measures_long(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    wide = lineitem.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        F.sum(cents("l_extendedprice")).alias("price_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return (
        wide.select(
            "l_returnflag",
            F.expr(
                "stack(3, 'qty', qty, 'price_cents', price_cents, "
                "'n_items', n_items) AS (measure, amount)"
            ),
        )
        .orderBy("l_returnflag", "measure")
    )


# --- distribution windows: ntile deciles + percent_rank ---


@register(
    "acctbal_deciles",
    """
    SELECT decile,
           CAST(COUNT(*) AS BIGINT)        AS n_customers,
           ROUND(MIN(c_acctbal), 2)        AS min_bal,
           ROUND(MAX(c_acctbal), 2)        AS max_bal
    FROM (
        SELECT c_custkey, c_acctbal,
               NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer
    )
    GROUP BY decile ORDER BY decile
    """,
    "window: ntile distribution buckets",
)
def q_acctbal_deciles(spark, sf_dir):
    (customer,) = _t(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        customer.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("decile")
    )


# --- TPC-H Q4 shape: lateness semi-count per priority ---


@register(
    "late_shipment_priorities",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_late_orders
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1 ORDER BY 1
    """,
    "J1,A8: TPC-H Q4 late orders per priority (post-join date predicate)",
)
def q_late_shipment_priorities(spark, sf_dir):
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_orderkey").alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


# --- TPC-H Q22 shape: scalar-subquery threshold + anti join ---
# The global-average threshold is a single-row aggregate broadcast into
# the filter; the comparison is exact integer cents x count (no double
# average crosses an engine boundary).  The "no urgent orders" clause is
# a left-anti join against the pruned urgent-order keys.


@register(
    "idle_rich_customers",
    """
    WITH thresh AS (
        SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_cents,
               CAST(COUNT(*) AS BIGINT)                    AS n
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) / 100.0, 2) AS total_bal
    FROM customer c, thresh t
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * t.n > t.sum_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY 1 ORDER BY 1
    """,
    "A-scalar-subquery,J3: TPC-H Q22 above-avg balance, no urgent orders",
)
def q_idle_rich_customers(spark, sf_dir):
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    thresh = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents("c_acctbal")).alias("sum_cents"),
        F.count(F.lit(1)).alias("n"),
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        customer.join(F.broadcast(thresh))  # single-row scalar subquery
        .filter(cents("c_acctbal") * F.col("n") > F.col("sum_cents"))
        .join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum(cents("c_acctbal")) / 100.0, 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# --- TPC-H Q16 shape: distinct-supplier counts with exclusions ---


@register(
    "part_supplier_variety",
    """
    SELECT p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13)
    GROUP BY 1, 2
    ORDER BY n_suppliers DESC, p.p_type, p.p_size
    """,
    "A8,P-IN-list: TPC-H Q16 supplier variety with brand/size exclusions",
)
def q_part_supplier_variety(spark, sf_dir):
    part, lineitem = _t(spark, sf_dir, "part", "lineitem")
    filtered = part.filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13)
    )
    return (
        lineitem.join(F.broadcast(filtered), lineitem.l_partkey == filtered.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
        .orderBy(F.desc("n_suppliers"), "p_type", "p_size")
    )


# --- GROUPING SETS (the general form of rollup/cube) ---
# Heterogeneous grains in one pass: per-flag, per-status, and grand
# total, without computing the (flag x status) cross grain CUBE would.


@register(
    "revenue_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "agg: GROUPING SETS heterogeneous grains",
)
def q_revenue_grouping_sets(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.round(F.sum(cents("l_extendedprice")) / 100.0, 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )
