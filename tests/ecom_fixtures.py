"""Deterministic synthetic e-commerce tables per FIXTURES.md.

Small-volume analogue of the reference's Data/ corpus (products /
orders / order_items with the documented distributions and invariants)
so Q1/Q2/Q3 semantics — including the fan-out quirks — are pinned
against a DuckDB oracle in pytest.  Seeded numpy; no reference data is
read or copied.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CATEGORIES = ["Beauty", "Home & Kitchen", "Electronics", "Clothing", "Sports", "Books", "Toys"]
BRANDS = ["Acme", "Globex", "Initech", "Soylent", "Stark", "Umbrella", "Wonka"]
DEPARTMENTS = ["Personal Care", "Home", "Tech", "Fashion", "Outdoors", "Media", "Kids"]
BASE = np.datetime64("2025-03-08T00:00:00")


def make_ecom(n_products=400, n_orders=300, seed=42):
    rng = np.random.default_rng(seed)
    pid = np.arange(1, n_products + 1)
    cat_idx = rng.integers(0, len(CATEGORIES), n_products)
    retail = np.round(rng.uniform(15, 200, n_products), 2)
    brand = np.array(BRANDS)[rng.integers(0, len(BRANDS), n_products)].astype(object)
    brand[rng.random(n_products) < 0.03] = None
    products = pd.DataFrame(
        {
            "id": pid.astype("int32"),
            "sku": [f"ABC-{10000000 + i}" for i in pid],
            "cost": np.round(retail * rng.uniform(0.25, 0.40, n_products), 2),
            "category": np.array(CATEGORIES)[cat_idx],
            "name": [f"product item number {i}" for i in pid],
            "brand": brand,
            "retail_price": retail,
            "department": np.array(DEPARTMENTS)[cat_idx],
        }
    )

    oid = np.arange(1, n_orders + 1)
    created = BASE + rng.integers(0, 31 * 24 * 3600, n_orders).astype("timedelta64[s]")
    returned_mask = rng.random(n_orders) < 0.209
    shipped = created + rng.integers(3600, 2 * 24 * 3600, n_orders).astype("timedelta64[s]")
    delivered = shipped + rng.integers(24 * 3600, 3 * 24 * 3600, n_orders).astype("timedelta64[s]")
    returned = created + rng.integers(3 * 24 * 3600, 8 * 24 * 3600, n_orders).astype("timedelta64[s]")
    orders = pd.DataFrame(
        {
            "order_id": oid.astype("int32"),
            "user_id": rng.integers(1, 120, n_orders).astype("int32"),
            "status": np.where(returned_mask, "returned", "delivered"),
            "created_at": pd.Series(created),
            "returned_at": pd.Series(np.where(returned_mask, returned, np.datetime64("NaT"))),
            "shipped_at": pd.Series(shipped),
            "delivered_at": pd.Series(delivered),
            # intentionally independent of the item row count (fan-out quirk)
            "num_of_item": rng.integers(1, 5, n_orders).astype("int32"),
        }
    )

    n_items_per_order = rng.integers(1, 6, n_orders)
    item_order = np.repeat(oid, n_items_per_order)
    n_items = len(item_order)
    item_created = np.repeat(created, n_items_per_order) + rng.integers(
        0, 2 * 3600, n_items
    ).astype("timedelta64[s]")
    item_returned_mask = rng.random(n_items) < 0.166
    item_shipped = item_created + rng.integers(3600, 2 * 24 * 3600, n_items).astype("timedelta64[s]")
    item_delivered = item_shipped + rng.integers(24 * 3600, 3 * 24 * 3600, n_items).astype("timedelta64[s]")
    item_returned = item_created + rng.integers(3 * 24 * 3600, 8 * 24 * 3600, n_items).astype("timedelta64[s]")
    user_by_order = dict(zip(oid.tolist(), orders.user_id.tolist()))
    order_items = pd.DataFrame(
        {
            "id": np.arange(1, n_items + 1).astype("int32"),
            "order_id": item_order.astype("int32"),
            "user_id": np.array([user_by_order[o] for o in item_order], dtype="int32"),
            "product_id": rng.integers(1, n_products + 1, n_items).astype("int32"),
            "status": np.where(item_returned_mask, "returned", "delivered"),
            "created_at": pd.Series(item_created),
            "shipped_at": pd.Series(item_shipped),
            "delivered_at": pd.Series(item_delivered),
            "returned_at": pd.Series(np.where(item_returned_mask, item_returned, np.datetime64("NaT"))),
            "sale_price": np.round(rng.uniform(15, 200, n_items), 2),
        }
    )
    return products, orders, order_items


def to_spark(spark, pdf, schema):
    return spark.createDataFrame(pdf, schema=schema)
