"""KV sink: executor-side writes, serialization contract, idempotency."""

from real_time_event_driven_data_pipeline_spark.operators.kpis import category_kpis
from real_time_event_driven_data_pipeline_spark.schemas import ECOM_SCHEMAS
from real_time_event_driven_data_pipeline_spark.sinks.kv import (
    SQLiteKVStore,
    serialize_row,
    write_kv_batch,
)

from .ecom_fixtures import make_ecom, to_spark


def test_serialize_row_contract():
    import datetime as dt

    out = serialize_row(
        {
            "d": dt.date(2025, 3, 8),
            "ts": dt.datetime(2025, 3, 8, 12, 30, 1),
            "money": 123.456,
            "n": 7,
            "s": "x",
        }
    )
    assert out == {
        "d": "2025-03-08",
        "ts": "2025-03-08T12:30:01",
        "money": "123.46",
        "n": 7,
        "s": "x",
    }


def test_write_kv_batch_roundtrip_and_idempotency(spark, tmp_path):
    products, orders, order_items = make_ecom(n_products=100, n_orders=80, seed=3)
    kpis = category_kpis(
        to_spark(spark, order_items, ECOM_SCHEMAS["order_items"]),
        to_spark(spark, orders, ECOM_SCHEMAS["orders"]),
        to_spark(spark, products, ECOM_SCHEMAS["products"]),
    )
    n = kpis.count()
    store_path = str(tmp_path / "kv.db")
    write_kv_batch(kpis, store_path, ["category", "order_date"], table="category_kpis")
    store = SQLiteKVStore(store_path, "category_kpis")
    assert store.count() == n
    # idempotent upsert: rewriting the same rows must not grow the table
    write_kv_batch(kpis, store_path, ["category", "order_date"], table="category_kpis")
    assert store.count() == n
    sample = kpis.limit(1).collect()[0].asDict()
    key = f"{sample['category']}|{sample['order_date']:%Y-%m-%d}"
    item = store.get(key)
    assert item is not None
    assert item["daily_revenue"] == str(round(sample["daily_revenue"], 2))
    assert item["order_date"] == f"{sample['order_date']:%Y-%m-%d}"
