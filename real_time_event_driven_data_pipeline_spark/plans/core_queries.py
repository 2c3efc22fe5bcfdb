"""Core reference-parity queries on the driver testdata star schema.

Role mapping (FIXTURES.md "Driver testdata mapping"):
order_items→lineitem, orders→orders, products→part, users→customer.
Column analogs: sale_price→l_extendedprice, item status→l_returnflag
('R' = returned), item created_at→l_shipdate, category→p_brand,
order created_at→o_orderdate, order status→o_orderstatus ('F' plays
the 'returned' role for rate math), num_of_item→o_totalprice (the
fan-out quirk target; non-integral, so rounded not cast).

Every computed column is aliased identically in the Spark plan and the
oracle SQL (the driver hashes values under sorted column names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.kpis import category_kpis, order_kpis
from ..operators.validation import duplicate_keys, fk_violations, null_counts
from ..sources.readers import load_testdata
from .registry import register


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    d = load_testdata(spark, sf_dir, *names)
    return [d[n] for n in names]


# --- Q1: category KPIs (SURVEY §2.11 Q1; reference transform.py:94-121) ---

# avg/rate columns mirror functions.money exact-integer rounding:
# FLOOR((2C+n)/(2n))/100 == round_half_up 2-dp, engine-deterministic.
CATEGORY_KPIS_SQL = """
SELECT p.p_brand                                               AS category,
       CAST(l.l_shipdate AS DATE)                              AS order_date,
       ROUND(SUM(l.l_extendedprice), 2)                        AS daily_revenue,
       FLOOR((2 * SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) + COUNT(*))
             / (2 * COUNT(*))) / 100.0                         AS avg_order_value,
       FLOOR((20000 * COUNT(*) FILTER (WHERE l.l_returnflag = 'R') + COUNT(*))
             / (2 * COUNT(*))) / 100.0                         AS avg_return_rate
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part   p ON l.l_partkey  = p.p_partkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("category_kpis", CATEGORY_KPIS_SQL, "S1,J1,J2,A2,A4-A7,A9,A10,F1-F3,O1")
def q_category_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    return category_kpis(
        lineitem,
        orders,
        part,
        item_order_fk="l_orderkey",
        order_pk="o_orderkey",
        item_product_fk="l_partkey",
        product_pk="p_partkey",
        category_col="p_brand",
        item_ts_col="l_shipdate",
        price_col="l_extendedprice",
        item_status_col="l_returnflag",
        returned_value="R",
    )


# --- Q2: order KPIs (SURVEY §2.11 Q2; reference transform.py:123-147) ---
# Fan-out parity: total_order_value sums the ORDER-level o_totalprice once
# per joined item row; return_rate's numerator counts joined rows.

ORDER_KPIS_SQL = """
SELECT CAST(o.o_orderdate AS DATE)                             AS order_date,
       COUNT(DISTINCT o.o_orderkey)                            AS total_orders,
       ROUND(SUM(l.l_extendedprice), 2)                        AS total_revenue,
       ROUND(SUM(o.o_totalprice), 2)                           AS total_order_value,
       FLOOR((20000 * COUNT(*) FILTER (WHERE o.o_orderstatus = 'F')
              + COUNT(DISTINCT o.o_orderkey))
             / (2 * COUNT(DISTINCT o.o_orderkey))) / 100.0     AS return_rate,
       COUNT(DISTINCT o.o_custkey)                             AS unique_customers
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1
ORDER BY 1
"""


@register("order_kpis", ORDER_KPIS_SQL, "J1,A3,A4,A8,A9,A10,F1-F3,O2")
def q_order_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    return order_kpis(
        orders,
        lineitem,
        order_pk="o_orderkey",
        item_order_fk="l_orderkey",
        order_ts_col="o_orderdate",
        price_col="l_extendedprice",
        order_status_col="o_orderstatus",
        returned_value="F",
        items_per_order_col="o_totalprice",
        items_per_order_is_integral=False,
        customer_col="o_custkey",
        items_sold_alias="total_order_value",
    )


# --- Q3a: fused null-count validation (SURVEY §2.11 Q3a; validate.py:104-129,
#     restructured per SURVEY §4.2-2 into one pass) ---

NULL_COUNTS_SQL = """
SELECT CAST(SUM(CASE WHEN l_orderkey      IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_orderkey_nulls,
       CAST(SUM(CASE WHEN l_partkey       IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_partkey_nulls,
       CAST(SUM(CASE WHEN l_quantity      IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_quantity_nulls,
       CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_extendedprice_nulls,
       CAST(SUM(CASE WHEN l_returnflag    IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_returnflag_nulls,
       CAST(SUM(CASE WHEN l_shipdate      IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_shipdate_nulls
FROM lineitem
"""


@register("validate_null_counts", NULL_COUNTS_SQL, "P1,A11 fused (Q3a)")
def q_validate_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return null_counts(
        lineitem,
        ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"],
    )


# --- Q3b: FK integrity via left-anti join (validate.py:131-156) ---

FK_ORPHANS_SQL = """
SELECT (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           AS orphan_order_rows,
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
           AS orphan_part_rows
"""


@register("validate_fk_orphans", FK_ORPHANS_SQL, "J3,A11 (Q3b)")
def q_validate_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    # both anti-join counts in ONE job (1-row aggregates cross-joined),
    # not two serial driver-side .count() actions
    a = fk_violations(lineitem, orders, "l_orderkey", "o_orderkey").agg(
        F.count(F.lit(1)).alias("orphan_order_rows")
    )
    b = fk_violations(lineitem, part, "l_partkey", "p_partkey").agg(
        F.count(F.lit(1)).alias("orphan_part_rows")
    )
    return a.crossJoin(b)


# --- Q3c: duplicate-key check (validate.py:158-172) ---

DUP_KEYS_SQL = """
SELECT (SELECT COUNT(*) FROM (
            SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1))
           AS dup_order_keys,
       (SELECT COUNT(*) FROM (
            SELECT l_orderkey, l_linenumber FROM lineitem
            GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
           AS dup_lineitem_keys
"""


@register("validate_duplicate_keys", DUP_KEYS_SQL, "A1,P2 (Q3c)")
def q_validate_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    a = duplicate_keys(orders, ["o_orderkey"]).agg(
        F.count(F.lit(1)).alias("dup_order_keys")
    )
    b = duplicate_keys(lineitem, ["l_orderkey", "l_linenumber"]).agg(
        F.count(F.lit(1)).alias("dup_lineitem_keys")
    )
    return a.crossJoin(b)
