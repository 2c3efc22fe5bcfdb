"""Driver-contract conformance: entry smoke + every registered query
runs at sf0.001 and matches its oracle (fast pytest twin of
tools/verify_local.py)."""

import __spark_entry__ as ent

from .conftest import SF_DIR
from .oracle import assert_df_matches_sql, duck_con

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_entry_smoke(spark):
    df = ent.entry(spark)
    rows = df.take(5)
    assert rows
    assert df.columns == [
        "category", "order_date", "daily_revenue", "avg_order_value", "avg_return_rate",
    ]


def test_queries_have_oracles_or_are_flagged(spark):
    qs, oracles = ent.queries(), ent.oracle_sql()
    assert set(oracles) <= set(qs)


def test_all_queries_match_oracle_sf0001(spark):
    qs, oracles = ent.queries(), ent.oracle_sql()
    con = duck_con({t: f"{SF_DIR}/{t}.parquet" for t in TABLES})
    for name, fn in qs.items():
        sdf = fn(spark, SF_DIR)
        if name in oracles:
            assert_df_matches_sql(sdf, con, oracles[name])
        else:
            sdf.limit(5).collect()  # rows-only smoke
