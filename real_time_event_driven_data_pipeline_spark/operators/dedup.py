"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (the point of this module):

- **exact**: hash-groupBy on a normalized fingerprint — one shuffle on
  the md5 key, keep min id per group.  At 100 TB this is the cheapest
  possible dedup (no wide rows move: fingerprint first, join back).
- **n-gram Jaccard (exact)**: inverted-index self-join — explode
  distinct shingles, equi-join on shingle, count per pair.  Quadratic
  only within a shingle's posting list, never across the corpus; a
  ``max_shingle_df`` knob drops ubiquitous shingles (stop-shingles)
  which otherwise dominate the join at scale.
- **MinHash-LSH**: fixed-seed xxhash64 signatures (deterministic across
  runs/executors), banded bucket join -> candidate pairs -> exact
  Jaccard verification of candidates only.  This is the 100 TB path:
  candidates ~ O(near-dups), not O(n²).
- **SimHash**: 64-bit signature via a vectorized pandas UDF (numpy bit
  ops; the only Python in this module — per-token bit unpacking has no
  built-in expression), then pigeonhole banding on signature quarters:
  pairs within Hamming distance <= 3 must share >= 1 of 4 bands.

Everything emits unrounded int/int double ratios (deterministic; see
functions/money.py rationale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import fingerprint, tokens_expr

# --- exact dedup ---


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: (fp, n_copies,
    keep_id) for groups with more than one member."""
    fp = fingerprint(df, id_col, text_col)
    return (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per identical-text group."""
    fp = fingerprint(df, id_col, text_col)
    keep = fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return df.join(keep, id_col, "left_semi")


# --- shingling ---


def with_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct k-word shingles per document (built-in array exprs)."""
    toks = tokens_expr(text_col)
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    shingle_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
    )
    shingles = F.array_distinct(F.transform(idx, shingle_at))
    return df.select(
        F.col(id_col), F.when(F.size(toks) >= k, shingles).otherwise(F.array()).alias("shingles")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via inverted-index join.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard unrounded.
    ``max_shingle_df`` (off by default for oracle parity) drops
    shingles whose posting list exceeds the limit — the stop-shingle
    mitigation for 100 TB corpora.
    """
    sh = with_shingles(df, id_col, text_col, k)
    sizes = sh.select(F.col(id_col), F.size("shingles").alias("n_sh"))
    posts = sh.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    if max_shingle_df is not None:
        rare = (
            posts.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        posts = posts.join(rare, "shingle", "left_semi")
    a = posts.select(F.col(id_col).alias("id_a"), "shingle")
    b = posts.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- MinHash-LSH ---


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3, num_hashes: int = 64
) -> DataFrame:
    """num_hashes min-hash values per doc from fixed-seed xxhash64."""
    sh = with_shingles(df, id_col, text_col, k)
    posts = sh.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return posts.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    rows_per_band: int = 2,
) -> DataFrame:
    """Near-dup pairs: LSH banding for candidates, exact Jaccard verify.

    With r=2, b=32: P(candidate | s=0.5) = 1-(1-0.25)^32 ≈ 0.9999 —
    recall at the 0.5 threshold is effectively total while candidate
    volume stays ~linear in the number of true near-dups.
    Output: (id_a, id_b, jaccard), verified exact, id_a < id_b.
    """
    n_bands = num_hashes // rows_per_band
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes).cache()
    band_frames = []
    for band in range(n_bands):
        cols = [f"mh_{band * rows_per_band + r}" for r in range(rows_per_band)]
        band_frames.append(
            sig.select(
                F.col(id_col),
                F.lit(band).alias("band"),
                F.xxhash64(*[F.col(c) for c in cols]).alias("bucket"),
            )
        )
    bands = band_frames[0]
    for frame in band_frames[1:]:
        bands = bands.unionAll(frame)
    left = bands.select(F.col(id_col).alias("id_a"), "band", "bucket")
    right = bands.select(F.col(id_col).alias("id_b"), "band", "bucket")
    candidates = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    # exact verification restricted to candidates via semi-joins
    sh = with_shingles(df, id_col, text_col, k)
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


# --- SimHash ---

_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("simhash", T.LongType(), False),
    ]
)


def simhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document (vectorized numpy inside a pandas
    batch iterator; per-token bit-unpacking has no built-in expression).
    Token hashes are xxhash64 computed JVM-side first, so Python only
    folds sign-weighted bits."""
    hashed = (
        df.select(F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("toks"))
        .select("doc_id", F.explode("toks").alias("tok"))
        .select("doc_id", F.xxhash64("tok").alias("h"))
    )

    def _fold(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            h = pdf["h"].to_numpy().astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            )
            weights = bits * 2 - 1  # 0/1 -> -1/+1
            acc = (
                pd.DataFrame(weights)
                .groupby(pdf["doc_id"].to_numpy())
                .sum()
            )
            sig = (acc.to_numpy() > 0).astype(np.uint64)
            val = (sig << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
            yield pd.DataFrame(
                {"doc_id": acc.index.to_numpy(), "simhash": val.astype(np.int64)}
            )

    # repartition by doc so each doc's tokens land in one batch group
    return (
        hashed.repartition("doc_id")
        .sortWithinPartitions("doc_id")
        .mapInPandas(_fold, schema=_SIMHASH_SCHEMA)
        .groupBy("doc_id")
        .agg(F.max("simhash").alias("simhash"))  # merge per-batch partials (same value)
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within Hamming distance <= max_hamming via pigeonhole
    banding: split 64 bits into 4 16-bit bands; any pair with distance
    <= 3 shares at least one exact band.  Output (id_a, id_b, hamming)."""
    sig = simhash_signatures(df, id_col, text_col)
    bands = None
    for i in range(4):
        part = sig.select(
            F.col("doc_id"),
            F.col("simhash"),
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
        )
        bands = part if bands is None else bands.unionAll(part)
    left = bands.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sig_a"), "band", "bucket"
    )
    right = bands.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sig_b"), "band", "bucket"
    )
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
