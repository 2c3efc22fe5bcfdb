"""Local stand-in for the driver's correctness gate.

Runs every ``queries()[name]`` at a given sf dir via Spark, runs the
matching ``oracle_sql()[name]`` via DuckDB on the same parquet tables,
and compares row count, schema (column names), and order-insensitive
values (columns sorted by name, rows sorted).  Floats are compared both
exactly and with tolerance so marginal rounding-boundary risk is
visible before the driver sees it.

Usage: python tools/verify_local.py [--fast] [sf_dir] [query ...]

``--fast`` skips the DuckDB side of queries whose oracle is quadratic
(all-pairs similarity / recursive-CTE clustering — they do not finish
at sf0.1) and records them rows-only, so a FULL sweep can run at bench
scale.  The skipped oracles stay exact-checked at sf0.001/sf0.01.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# oracles that are QUADRATIC in DuckDB (all-pairs similarity scans,
# recursive-CTE connected components) — exact and fine at sf<=0.01,
# do-not-finish at sf0.1.  --fast demotes these to rows-only.
QUADRATIC_ORACLES = {
    "ngram_jaccard_near_dups",
    "minhash_lsh_near_dups",
    "near_dup_clusters",
    "semantic_dedup_clusters",
    "semantic_dedup_clusters_lsh",
    "incremental_near_dups",
    "embedding_similar_pairs",
    "image_near_dups",
    "curated_corpus",
    "multimodal_dup_clusters",
    "simhash_near_pairs",
    "video_near_dups",
    "audio_near_dups",
    "crossmodal_dup_clusters",
    "dup_cluster_representatives",
}


def norm_cell(v):
    if isinstance(v, float):
        return v
    return v


def rows_to_sorted(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_rows, spark_cols, duck_rows, duck_cols):
    issues = []
    if len(spark_rows) != len(duck_rows):
        issues.append(f"row count: spark={len(spark_rows)} duck={len(duck_rows)}")
    if sorted(spark_cols) != sorted(duck_cols):
        issues.append(f"columns: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if issues:
        return issues, None
    a = rows_to_sorted(spark_rows, spark_cols)
    b = rows_to_sorted(duck_rows, duck_cols)
    max_float_diff = 0.0
    exact = True
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if va == vb:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                d = abs(va - vb)
                max_float_diff = max(max_float_diff, d)
                exact = False
                if d > 1e-6:
                    issues.append(f"value diff {d}: {va} vs {vb} (row {ra} / {rb})")
                    if len(issues) > 5:
                        return issues, max_float_diff
            else:
                issues.append(f"value mismatch: {va!r} vs {vb!r} (row {ra} / {rb})")
                if len(issues) > 5:
                    return issues, max_float_diff
    if not issues and not exact:
        issues.append(f"WARN inexact floats (max diff {max_float_diff:.3e}) — hash would FAIL")
    return issues, max_float_diff


def main():
    args = sys.argv[1:]
    fast = "--fast" in args
    if fast:
        args = [a for a in args if a != "--fast"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as ent
    from real_time_event_driven_data_pipeline_spark.session import get_spark

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = ent.queries(), ent.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"okro {name}: rows-only ({len(spark_rows)} rows, {t1-t0:.1f}s spark)")
            n_pass += 1
            continue
        if fast and name in QUADRATIC_ORACLES:
            print(
                f"okro {name}: oracle skipped --fast, quadratic at this sf "
                f"({len(spark_rows)} rows, {t1-t0:.1f}s spark)"
            )
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        issues, maxd = compare(spark_rows, spark_cols, duck_rows, duck_cols)
        hard = [i for i in issues if not i.startswith("WARN")]
        if hard:
            print(f"FAIL {name}: ({len(spark_rows)} rows, {t1-t0:.1f}s)")
            for i in issues[:6]:
                print(f"   {i}")
            n_fail += 1
        else:
            note = issues[0] if issues else "exact"
            print(f"PASS {name}: {len(spark_rows)} rows, {t1-t0:.1f}s spark [{note}]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
