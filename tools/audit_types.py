"""Type-parity audit between oracle SQL (DuckDB) and Spark queries.

Round-1 lesson (VERDICT.md "What's wrong" #1): DuckDB types SUM(BIGINT)
as HUGEINT (int128) while Spark emits BIGINT, and the driver's value
hash distinguishes the representations even when values are equal, so
`hash_match` fails with `rows_match`/`schema_match` green.  This tool
makes that class of bug impossible to ship again:

  * DESCRIBE every ``oracle_sql()[name]`` against DuckDB views over the
    sf parquet tables -> per-column DuckDB types (no execution).
  * Build every ``queries()[name]`` DataFrame -> Spark schema (analysis
    only, no job).
  * Map Spark types onto expected DuckDB types and report any column
    whose DuckDB type disagrees -- HUGEINT anywhere is an instant flag.

Usage: python tools/audit_types.py [sf_dir] [query ...]
Exit code 1 if any mismatch is found.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Spark simpleString -> acceptable DuckDB type names (upper-cased).
SPARK_TO_DUCK = {
    "tinyint": {"TINYINT"},
    "smallint": {"SMALLINT"},
    "int": {"INTEGER"},
    "bigint": {"BIGINT"},
    "float": {"FLOAT", "REAL"},
    "double": {"DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
    "binary": {"BLOB"},
}


def expected_duck(spark_type: str) -> set[str] | None:
    st = spark_type.lower()
    if st in SPARK_TO_DUCK:
        return SPARK_TO_DUCK[st]
    if st.startswith("decimal"):
        return {st.upper().replace("DECIMAL", "DECIMAL")}
    if st.startswith("array"):
        return None  # structural; hash path normalizes lists
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    queries = entry_mod.queries()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="audit-types")

    bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            duck_cols = {
                r[0]: r[1].upper()
                for r in con.execute(f"DESCRIBE ({sql})").fetchall()
            }
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: DESCRIBE error: {e}")
            bad += 1
            continue
        try:
            spark_schema = {f.name: f.dataType.simpleString() for f in queries[name](spark, sf_dir).schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark analysis error: {e}")
            bad += 1
            continue

        issues = []
        for col, dtype in duck_cols.items():
            if "HUGEINT" in dtype:
                issues.append(f"{col}: DuckDB {dtype} (int128 — cast the outer aggregate)")
        for col, stype in spark_schema.items():
            if col not in duck_cols:
                issues.append(f"{col}: missing from oracle output")
                continue
            exp = expected_duck(stype)
            if exp is not None and duck_cols[col] not in exp:
                issues.append(f"{col}: spark {stype} vs duck {duck_cols[col]}")
        for col in duck_cols:
            if col not in spark_schema:
                issues.append(f"{col}: missing from spark output")
        if issues:
            bad += 1
            print(f"FAIL {name}:")
            for i in issues:
                print(f"    {i}")
        else:
            print(f"ok   {name}")

    print(f"\n{bad} queries with type mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
