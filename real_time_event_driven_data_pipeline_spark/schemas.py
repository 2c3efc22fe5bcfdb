"""Schema registry.

The reference's defining data-model decision is fixed, explicitly
declared ``StructType`` schemas whose nullability doubles as the
validation contract (reference: docker-images/validation/validate.py:22-55,
duplicated at docker-images/transformation/transform.py:28-61).  We keep
that pattern: one registry consumed by batch readers, streaming readers
(which *require* explicit schemas) and the validation operators.

Two families live here:

- ``ECOM_*``: the reference's e-commerce star schema (products /
  orders / order_items), money widened FLOAT->DOUBLE (SURVEY §1.2 —
  32-bit float accumulation error is visible at the 2-dp rounding edge).
- ``TESTDATA_*``: the driver-supplied TPC-H-ish tables (TESTDATA.md),
  declared so the streaming file source and CSV ingestion can enforce
  them.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _st(fields: list[tuple[str, T.DataType, bool]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


# --- reference e-commerce schemas (nullability = validation contract) ---

ECOM_PRODUCTS = _st(
    [
        ("id", T.IntegerType(), False),
        ("sku", T.StringType(), False),
        ("cost", T.DoubleType(), False),
        ("category", T.StringType(), False),
        ("name", T.StringType(), False),
        ("brand", T.StringType(), True),  # the only nullable product column
        ("retail_price", T.DoubleType(), False),
        ("department", T.StringType(), False),
    ]
)

ECOM_ORDERS = _st(
    [
        ("order_id", T.IntegerType(), False),
        ("user_id", T.IntegerType(), False),
        ("status", T.StringType(), False),
        ("created_at", T.TimestampType(), False),
        ("returned_at", T.TimestampType(), True),
        ("shipped_at", T.TimestampType(), True),
        ("delivered_at", T.TimestampType(), True),
        ("num_of_item", T.IntegerType(), False),
    ]
)

ECOM_ORDER_ITEMS = _st(
    [
        ("id", T.IntegerType(), False),
        ("order_id", T.IntegerType(), False),
        ("user_id", T.IntegerType(), False),
        ("product_id", T.IntegerType(), False),
        ("status", T.StringType(), False),
        ("created_at", T.TimestampType(), False),
        ("shipped_at", T.TimestampType(), True),
        ("delivered_at", T.TimestampType(), True),
        ("returned_at", T.TimestampType(), True),
        ("sale_price", T.DoubleType(), False),
    ]
)

ECOM_SCHEMAS: dict[str, T.StructType] = {
    "products": ECOM_PRODUCTS,
    "orders": ECOM_ORDERS,
    "order_items": ECOM_ORDER_ITEMS,
}

# Primary / foreign keys used by the validation battery (SURVEY §2.11 Q3).
ECOM_PRIMARY_KEYS = {"products": ["id"], "orders": ["order_id"], "order_items": ["id"]}
ECOM_FOREIGN_KEYS = [
    # (child, child_key, parent, parent_key)
    ("order_items", "product_id", "products", "id"),
    ("order_items", "order_id", "orders", "order_id"),
]


def non_nullable_columns(schema: T.StructType) -> list[str]:
    """Columns whose declared nullability is the null-check contract."""
    return [f.name for f in schema.fields if not f.nullable]


def nullable_copy(schema: T.StructType) -> T.StructType:
    """All-nullable twin of a schema, for ingestion surfaces that cannot
    enforce nullability (CSV/parquet readers, createDataFrame on dirty
    data).  The declared schema stays the *contract*; this is the
    *reader* shape — the reference's two-layer model (SURVEY §1.3).
    """
    return T.StructType([T.StructField(f.name, f.dataType, True) for f in schema.fields])


# --- driver testdata schemas (TESTDATA.md / FIXTURES.md mapping) ---

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": _st([("r_regionkey", T.IntegerType(), False), ("r_name", T.StringType(), False)]),
    "nation": _st(
        [
            ("n_nationkey", T.IntegerType(), False),
            ("n_name", T.StringType(), False),
            ("n_regionkey", T.IntegerType(), False),
        ]
    ),
    "customer": _st(
        [
            ("c_custkey", T.LongType(), False),
            ("c_name", T.StringType(), False),
            ("c_nationkey", T.IntegerType(), False),
            ("c_acctbal", T.DoubleType(), False),
            ("c_mktsegment", T.StringType(), False),
        ]
    ),
    "supplier": _st(
        [
            ("s_suppkey", T.LongType(), False),
            ("s_name", T.StringType(), False),
            ("s_nationkey", T.IntegerType(), False),
            ("s_acctbal", T.DoubleType(), False),
        ]
    ),
    "part": _st(
        [
            ("p_partkey", T.LongType(), False),
            ("p_name", T.StringType(), False),
            ("p_brand", T.StringType(), False),
            ("p_type", T.StringType(), False),
            ("p_size", T.IntegerType(), False),
            ("p_retailprice", T.DoubleType(), False),
        ]
    ),
    "orders": _st(
        [
            ("o_orderkey", T.LongType(), False),
            ("o_custkey", T.LongType(), False),
            ("o_orderstatus", T.StringType(), False),
            ("o_totalprice", T.DoubleType(), False),
            ("o_orderdate", T.TimestampType(), False),
            ("o_orderpriority", T.StringType(), False),
        ]
    ),
    "lineitem": _st(
        [
            ("l_orderkey", T.LongType(), False),
            ("l_partkey", T.LongType(), False),
            ("l_suppkey", T.LongType(), False),
            ("l_linenumber", T.IntegerType(), False),
            ("l_quantity", T.DoubleType(), False),
            ("l_extendedprice", T.DoubleType(), False),
            ("l_discount", T.DoubleType(), False),
            ("l_tax", T.DoubleType(), False),
            ("l_returnflag", T.StringType(), False),
            ("l_linestatus", T.StringType(), False),
            ("l_shipdate", T.TimestampType(), False),
        ]
    ),
    "events": _st(
        [
            ("event_id", T.LongType(), False),
            ("ts", T.TimestampType(), False),
            ("user_id", T.LongType(), False),
            ("event_type", T.StringType(), False),
            ("value", T.DoubleType(), False),
            ("props", T.StringType(), True),
        ]
    ),
    "documents": _st(
        [
            ("doc_id", T.LongType(), False),
            ("text", T.StringType(), False),
            ("lang", T.StringType(), True),
            ("source", T.StringType(), True),
            ("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": _st(
        [
            ("vec_id", T.LongType(), False),
            ("embedding", T.ArrayType(T.FloatType()), False),
            ("label", T.IntegerType(), True),
        ]
    ),
}

TESTDATA_TABLES = list(TESTDATA_SCHEMAS)
