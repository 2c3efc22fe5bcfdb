"""Pin Q1/Q2 reference semantics (incl. fan-out quirks) on the
synthetic e-commerce fixture against a DuckDB oracle."""

import pytest

from real_time_event_driven_data_pipeline_spark.operators.kpis import category_kpis, order_kpis
from real_time_event_driven_data_pipeline_spark.schemas import (
    ECOM_ORDER_ITEMS,
    ECOM_ORDERS,
    ECOM_PRODUCTS,
)

from .ecom_fixtures import make_ecom, to_spark
from .oracle import assert_df_matches_sql, duck_con


@pytest.fixture(scope="module")
def ecom(spark):
    products, orders, order_items = make_ecom()
    sdfs = (
        to_spark(spark, products, ECOM_PRODUCTS),
        to_spark(spark, orders, ECOM_ORDERS),
        to_spark(spark, order_items, ECOM_ORDER_ITEMS),
    )
    con = duck_con({"products": products, "orders": orders, "order_items": order_items})
    return sdfs, con


def test_category_kpis_matches_oracle(ecom):
    (products, orders, order_items), con = ecom
    out = category_kpis(order_items, orders, products)
    assert_df_matches_sql(
        out,
        con,
        """
        SELECT p.category,
               CAST(oi.created_at AS DATE) AS order_date,
               ROUND(SUM(oi.sale_price), 2) AS daily_revenue,
               FLOOR((2 * SUM(CAST(ROUND(oi.sale_price * 100) AS BIGINT)) + COUNT(*))
                     / (2 * COUNT(*))) / 100.0 AS avg_order_value,
               FLOOR((20000 * COUNT(*) FILTER (WHERE oi.status = 'returned') + COUNT(*))
                     / (2 * COUNT(*))) / 100.0 AS avg_return_rate
        FROM order_items oi
        JOIN orders o ON oi.order_id = o.order_id
        JOIN products p ON oi.product_id = p.id
        GROUP BY 1, 2 ORDER BY 1, 2
        """,
    )


def test_order_kpis_matches_oracle_with_fanout(ecom):
    (products, orders, order_items), con = ecom
    out = order_kpis(orders, order_items)
    # fan-out parity: num_of_item summed once per ITEM row; return-rate
    # numerator counts item rows of returned orders over distinct orders
    assert_df_matches_sql(
        out,
        con,
        """
        SELECT CAST(o.created_at AS DATE) AS order_date,
               COUNT(DISTINCT o.order_id) AS total_orders,
               ROUND(SUM(oi.sale_price), 2) AS total_revenue,
               CAST(SUM(o.num_of_item) AS BIGINT) AS total_items_sold,
               FLOOR((20000 * COUNT(*) FILTER (WHERE o.status = 'returned')
                      + COUNT(DISTINCT o.order_id))
                     / (2 * COUNT(DISTINCT o.order_id))) / 100.0 AS return_rate,
               COUNT(DISTINCT o.user_id) AS unique_customers
        FROM orders o JOIN order_items oi ON o.order_id = oi.order_id
        GROUP BY 1 ORDER BY 1
        """,
    )


def test_order_kpis_fanout_overcounts_num_of_item(ecom):
    """The quirk is real: summed-per-item-row != summed-per-order."""
    (products, orders, order_items), con = ecom
    fanout = con.execute(
        "SELECT SUM(o.num_of_item) FROM orders o JOIN order_items oi ON o.order_id = oi.order_id"
    ).fetchone()[0]
    true_sum = con.execute("SELECT SUM(num_of_item) FROM orders").fetchone()[0]
    assert fanout > true_sum
