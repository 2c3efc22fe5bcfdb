"""Validation battery: clean fixture passes; each dirty variant flips
exactly its own check (FIXTURES.md 'Dirty variants')."""

import pandas as pd
import pytest

from real_time_event_driven_data_pipeline_spark.operators.validation import (
    duplicate_keys,
    fk_violations,
    null_counts,
    validate_tables,
)
from real_time_event_driven_data_pipeline_spark.schemas import (
    ECOM_FOREIGN_KEYS,
    ECOM_PRIMARY_KEYS,
    ECOM_SCHEMAS,
    nullable_copy,
)

from .ecom_fixtures import make_ecom, to_spark


@pytest.fixture(scope="module")
def ecom_pdf():
    return make_ecom(n_products=200, n_orders=150, seed=7)


def _validate(spark, products, orders, order_items):
    # ingestion uses the all-nullable reader shape (dirty data must be
    # loadable); validation checks against the declared contract
    tables = {
        "products": to_spark(spark, products, nullable_copy(ECOM_SCHEMAS["products"])),
        "orders": to_spark(spark, orders, nullable_copy(ECOM_SCHEMAS["orders"])),
        "order_items": to_spark(spark, order_items, nullable_copy(ECOM_SCHEMAS["order_items"])),
    }
    return validate_tables(tables, ECOM_SCHEMAS, ECOM_PRIMARY_KEYS, ECOM_FOREIGN_KEYS)


def failing_checks(report):
    return {(c.table, c.check) for c in report.checks if not c.passed}


def test_clean_fixture_passes(spark, ecom_pdf):
    report = _validate(spark, *ecom_pdf)
    assert report.passed, failing_checks(report)


def test_null_injection_fails_null_check_only(spark, ecom_pdf):
    products, orders, order_items = ecom_pdf
    dirty = order_items.copy()
    # object dtype so pandas keeps true None (float64 would store NaN,
    # which Spark treats as NaN, not null)
    dirty["sale_price"] = dirty["sale_price"].astype(object)
    dirty.loc[dirty.index[:5], "sale_price"] = None
    report = _validate(spark, products, orders, dirty)
    assert failing_checks(report) == {("order_items", "null_check")}


def test_orphan_fk_fails_fk_check_only(spark, ecom_pdf):
    products, orders, order_items = ecom_pdf
    dirty = order_items.copy()
    dirty.loc[dirty.index[:3], "product_id"] = 999_999
    report = _validate(spark, products, orders, dirty)
    assert failing_checks(report) == {("order_items", "fk_product_id->products.id")}
    bad = report.checks[-2] if report.checks[-2].check.startswith("fk_product") else report.checks[-1]
    assert 999_999 in bad.offenders


def test_duplicate_pk_fails_unique_check_only(spark, ecom_pdf):
    products, orders, order_items = ecom_pdf
    dirty = pd.concat([orders, orders.iloc[:2]], ignore_index=True)
    report = _validate(spark, products, dirty, order_items)
    assert failing_checks(report) == {("orders", "unique_key")}


def test_empty_table_fails_non_empty(spark, ecom_pdf):
    products, orders, order_items = ecom_pdf
    report = _validate(spark, products, orders.iloc[:0], order_items)
    assert ("orders", "non_empty") in failing_checks(report)


def test_fused_null_counts_single_row(spark, ecom_pdf):
    products, _, _ = ecom_pdf
    sdf = to_spark(spark, products, ECOM_SCHEMAS["products"])
    row = null_counts(sdf).collect()
    assert len(row) == 1
    assert set(row[0].asDict()) == {
        f"{c}_nulls" for c in ["id", "sku", "cost", "category", "name", "retail_price", "department"]
    }


def test_fk_violations_and_duplicate_keys_primitives(spark, ecom_pdf):
    products, orders, order_items = ecom_pdf
    child = to_spark(spark, order_items, ECOM_SCHEMAS["order_items"])
    parent = to_spark(spark, products, ECOM_SCHEMAS["products"])
    assert fk_violations(child, parent, "product_id", "id").count() == 0
    assert duplicate_keys(to_spark(spark, orders, ECOM_SCHEMAS["orders"]), ["order_id"]).count() == 0
