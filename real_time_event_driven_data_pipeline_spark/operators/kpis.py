"""Daily-grain KPI aggregations — the reference's two production queries.

Semantics pinned to the reference implementation (SURVEY §2.11):

- ``category_kpis`` (reference: docker-images/transformation/
  transform.py:94-121): order_items ⋈ orders ⋈ products, grouped by
  (category, day-of-item-created_at).  The orders join adds no columns —
  it is an existence filter; return rate is item-status based with
  ``COUNT(*)`` denominator.
- ``order_kpis`` (reference: transform.py:123-147): orders ⋈
  order_items grouped by day-of-order-created_at.  The fan-out quirks
  are intentional parity: ``total_items_sold`` sums an order-level
  column once per item row, and ``return_rate``'s numerator counts
  joined rows over DISTINCT orders (can exceed 100%).  Do not "fix"
  them — the oracle encodes them verbatim.

Both functions are parameterized over column names so the same operator
runs on the e-commerce schema and on the driver's TPC-H-ish testdata
(FIXTURES.md "Driver testdata mapping": order_items→lineitem,
orders→orders, products→part).

Scale notes (100 TB): the joins are fact⋈dim equi-joins — dims get
broadcast (explicit hint below; AQE would also convert), so the only
shuffle is the final partial+final hash aggregation on the group keys.
``countDistinct`` expands to a two-phase distinct aggregate; that is
the one reference operator whose streaming variant needs a substitute
(see streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import avg_money_2dp, cents, pct_2dp


def category_kpis(
    items: DataFrame,
    orders: DataFrame,
    products: DataFrame,
    *,
    item_order_fk: str = "order_id",
    order_pk: str = "order_id",
    item_product_fk: str = "product_id",
    product_pk: str = "id",
    category_col: str = "category",
    item_ts_col: str = "created_at",
    price_col: str = "sale_price",
    item_status_col: str = "status",
    returned_value: str = "returned",
) -> DataFrame:
    """Per-(category, day) revenue / avg item value / item return rate.

    Output columns: category, order_date, daily_revenue,
    avg_order_value, avg_return_rate (reference transform.py:109-121).
    """
    oi = items.alias("oi")
    o = orders.alias("o")
    p = products.alias("p")
    is_returned = F.when(F.col(f"oi.{item_status_col}") == returned_value, 1)
    joined = (
        oi.join(
            # existence filter: inner join on the FK, no order columns used
            F.broadcast(o.select(order_pk)),
            F.col(f"oi.{item_order_fk}") == F.col(f"o.{order_pk}"),
            "inner",
        )
        .join(
            F.broadcast(p.select(product_pk, category_col)),
            F.col(f"oi.{item_product_fk}") == F.col(f"p.{product_pk}"),
            "inner",
        )
        .withColumn("order_date", F.to_date(F.col(f"oi.{item_ts_col}")))
    )
    # ratio outputs use exact integer-cents math (functions.money) so the
    # 2-dp rounding is engine-deterministic; plain sums stay round(sum,2)
    return (
        joined.groupBy(F.col(f"p.{category_col}").alias("category"), "order_date")
        .agg(
            F.round(F.sum(f"oi.{price_col}"), 2).alias("daily_revenue"),
            avg_money_2dp(
                F.sum(cents(f"oi.{price_col}")), F.count(F.lit(1))
            ).alias("avg_order_value"),
            pct_2dp(F.count(is_returned), F.count(F.lit(1))).alias("avg_return_rate"),
        )
        .orderBy("category", "order_date")
    )


def order_kpis(
    orders: DataFrame,
    items: DataFrame,
    *,
    order_pk: str = "order_id",
    item_order_fk: str = "order_id",
    order_ts_col: str = "created_at",
    price_col: str = "sale_price",
    order_status_col: str = "status",
    returned_value: str = "returned",
    items_per_order_col: str = "num_of_item",
    items_per_order_is_integral: bool = True,
    customer_col: str = "user_id",
    items_sold_alias: str = "total_items_sold",
) -> DataFrame:
    """Per-day order KPIs with the reference's fan-out semantics.

    Output columns: order_date, total_orders, total_revenue,
    <items_sold_alias>, return_rate, unique_customers
    (reference transform.py:133-147).
    """
    o = orders.alias("o")
    oi = items.alias("oi")
    returned_row = F.when(F.col(f"o.{order_status_col}") == returned_value, 1)
    joined = o.join(
        oi.select(item_order_fk, price_col),
        F.col(f"o.{order_pk}") == F.col(f"oi.{item_order_fk}"),
        "inner",
    ).withColumn("order_date", F.to_date(F.col(f"o.{order_ts_col}")))
    # fan-out parity: every aggregate below runs over the JOINED rows —
    # num_of_item is summed once per item row, the return-rate numerator
    # counts item rows of returned orders (reference transform.py:135-144)
    return (
        joined.groupBy("order_date")
        .agg(
            F.countDistinct(f"o.{order_pk}").alias("total_orders"),
            F.round(F.sum(f"oi.{price_col}"), 2).alias("total_revenue"),
            (
                F.sum(f"o.{items_per_order_col}").cast("long")
                if items_per_order_is_integral
                else F.round(F.sum(f"o.{items_per_order_col}"), 2)
            ).alias(items_sold_alias),
            pct_2dp(
                F.count(returned_row), F.countDistinct(f"o.{order_pk}")
            ).alias("return_rate"),
            F.countDistinct(f"o.{customer_col}").alias("unique_customers"),
        )
        .orderBy("order_date")
    )
