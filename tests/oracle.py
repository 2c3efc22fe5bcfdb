"""DuckDB-oracle comparison helpers shared by the test suite."""

from __future__ import annotations

import math

import duckdb


def duck_con(tables: dict) -> duckdb.DuckDBPyConnection:
    """Register pandas DataFrames / parquet paths as DuckDB views."""
    con = duckdb.connect()
    for name, obj in tables.items():
        if isinstance(obj, str):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{obj}')")
        else:
            con.register(name, obj)
    return con


def assert_df_matches_sql(sdf, con, sql, float_tol=0.0):
    """Order-insensitive, column-name-keyed comparison (driver semantics)."""
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (len(spark_rows), len(duck_rows))
    order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    order_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
    a = sorted([tuple(r[i] for i in order_s) for r in spark_rows], key=key)
    b = sorted([tuple(r[i] for i in order_d) for r in duck_rows], key=key)
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                assert va == vb or abs(va - vb) <= float_tol, (ra, rb)
            else:
                assert va == vb, (ra, rb)
