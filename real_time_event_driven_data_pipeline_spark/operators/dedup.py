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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import fingerprint, tokens_expr

# One live cache per slot: the shingle relation feeds ~5 branches of
# the pair-join plan (posts, gdf, both join sides, verification), so
# caching it is a 3x win — but an operator can't know when its plan is
# done, so each call evicts the previous call's cache instead of
# leaking one per invocation in a long-lived session.
_ACTIVE_CACHES: dict[str, DataFrame] = {}


def _scoped_cache(df: DataFrame, slot: str) -> DataFrame:
    prev = _ACTIVE_CACHES.get(slot)
    if prev is not None:
        try:
            prev.unpersist(False)
        except Exception:
            pass
    _ACTIVE_CACHES[slot] = df.cache()
    return _ACTIVE_CACHES[slot]


def reset_scoped_caches() -> None:
    """Unpersist and forget every live scoped-cache slot — session
    cleanup AND measurement isolation.  Round 10 found that
    ``spark.catalog.clearCache()`` alone does not isolate per-query
    measurement: a prior query's still-REFERENCED slot frame changes a
    later query's physical plan through CacheManager plan-equality, so
    an equal-subtree query's shuffle bytes were bimodal (7.7 MB clean
    vs 11.1 MB with residue for ``incremental_near_dups``) depending
    on what ran earlier in the session.  bench.py's measured pass
    calls this alongside clearCache before each query, pinning every
    recording to the deterministic clean-room plan."""
    for _slot, df in list(_ACTIVE_CACHES.items()):
        try:
            df.unpersist(False)
        except Exception:
            pass
    _ACTIVE_CACHES.clear()


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
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    hashed: bool = False,
) -> DataFrame:
    """Distinct k-word shingles per document (built-in array exprs).

    Tokens are materialized into a column *before* the shingle lambda —
    referencing the raw split() expression inside the lambda would
    re-tokenize the document once per shingle position.

    ``hashed=True`` emits xxhash64(shingle) bigints instead of strings:
    downstream joins / set ops run ~3x faster and postings shrink; the
    2^-64 collision odds are the standard dedup-at-scale trade.
    """
    toked = df.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    idx = F.sequence(F.lit(1), F.size("_toks") - k + 1)  # 1-based slice starts
    if hashed:
        mk = lambda i: F.xxhash64(F.array_join(F.slice("_toks", i, k), " "))  # noqa: E731
        empty = F.array().cast("array<bigint>")
    else:
        mk = lambda i: F.array_join(F.slice("_toks", i, k), " ")  # noqa: E731
        empty = F.array().cast("array<string>")
    shingles = F.array_distinct(F.transform(idx, mk))
    return toked.select(
        F.col(id_col),
        F.when(F.size("_toks") >= k, shingles).otherwise(empty).alias("shingles"),
    )


def _drop_stop_shingles(posts: DataFrame, max_shingle_df: int | None) -> DataFrame:
    """Drop posting rows of shingles appearing in > ``max_shingle_df``
    docs (stop-shingles).  A candidate-recall knob, not a correctness
    one: verification stays exact over full shingle sets; only pairs
    whose ENTIRE overlap is stop-shingles can be missed.  ``None`` (the
    oracle-parity default) keeps every posting."""
    if max_shingle_df is None:
        return posts
    rare = (
        posts.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_shingle_df)
        .select("shingle")
    )
    return posts.join(rare, "shingle", "left_semi")


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
    sh = _scoped_cache(with_shingles(df, id_col, text_col, k, hashed=True), "ngram_sh")
    posts = sh.select(
        F.col(id_col), F.size("shingles").alias("n_sh"), F.explode("shingles").alias("shingle")
    )
    posts = _drop_stop_shingles(posts, max_shingle_df)

    # Prefix filtering (PPJoin): for Jaccard >= t two sets must share a
    # shingle within the first |s| - ceil(t*|s|) + 1 positions of a
    # global rarity order.  Joining only prefix postings keeps heavy
    # (stop-)shingles out of the candidate join entirely — the thing
    # that otherwise goes quadratic on a 100 TB corpus.
    gdf = posts.groupBy("shingle").agg(F.count(F.lit(1)).alias("gdf"))
    w = Window.partitionBy(id_col).orderBy("gdf", "shingle")
    # pinned (r10): the prefix relation is BOTH sides of the candidate
    # self-join — uncached, the posting-df join + rarity window execute
    # twice (column pruning de-unifies the two subtrees, so exchange
    # reuse never fires).  Bounded by the posting count, narrow.
    prefix = _scoped_cache(
        posts.join(gdf, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1)
        .select(F.col(id_col), "shingle", "pos", "n_sh"),
        "ngram_prefix",
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"), "shingle", F.col("pos").alias("pos_a"), F.col("n_sh").alias("n_a")
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), "shingle", F.col("pos").alias("pos_b"), F.col("n_sh").alias("n_b")
    )
    # PPJoin positional filter: remaining-suffix overlap upper bound must
    # reach the required overlap alpha = ceil(t/(1+t) * (|a|+|b|))
    alpha = F.ceil(F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b")))
    candidates = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least(F.col("n_a") - F.col("pos_a"), F.col("n_b") - F.col("pos_b")) + 1 >= alpha
        )
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
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


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    near_dup_threshold: float = 0.5,
    use_lsh: bool = False,
    max_shingle_df: int | None = None,
    min_parallelism: int | None = None,
) -> DataFrame:
    """End-to-end corpus curation: exact dedup (keep min id per
    fingerprint), then greedy near-dup removal (drop the higher id of
    every Jaccard >= threshold pair) — the standard keep-first rule of
    training-data pipelines.

    ``use_lsh=True`` swaps the exact PPJoin pair generation for
    MinHash-LSH banding (the 100 TB path; identical output whenever
    banding recall is total, which pytest pins at this threshold).
    ``max_shingle_df`` (exact path only) is the stop-shingle cap
    forwarded to ``ngram_jaccard_pairs`` — pipeline call sites should
    set it; the oracle query leaves it off for parity.
    Returns the surviving rows of ``df``.
    """
    # cached: the pair generator's signature/shingle branches, the drop
    # anti-join, and the returned frame all re-derive survivors, whose
    # lineage includes the regex-heavy quality gate upstream
    survivors = _scoped_cache(dedup_exact(df, id_col, text_col), "curate_survivors")
    if use_lsh:
        pairs = minhash_lsh_pairs(
            survivors, id_col, text_col, k=k, threshold=near_dup_threshold,
            min_parallelism=min_parallelism,
        )
    else:
        pairs = ngram_jaccard_pairs(
            survivors, id_col, text_col, k=k, threshold=near_dup_threshold,
            max_shingle_df=max_shingle_df,
        )
    drop = pairs.select(F.col("id_b").alias(id_col)).dropDuplicates()
    return survivors.join(drop, id_col, "left_anti")


# --- MinHash-LSH ---


_BAND_MIX = np.uint64(0x9E3779B97F4A7C15)


def minhash_band_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    rows_per_band: int = 2,
    seed: int = 7,
    min_parallelism: int | None = None,
) -> DataFrame:
    """(doc_id, array<bigint> of per-band bucket ids) — the LSH posting
    input, computed shuffle-free.

    Shingles are hashed JVM-side into an array column; num_hashes
    minhash values per doc come from multiply-shift universal hashing
    (``a_i * h + b_i`` in wrapping uint64) folded with one
    ``minimum.reduceat`` per Arrow batch; band buckets mix the band's
    rows in the same pass.  No explode, no signature shuffle — the only
    shuffle in the whole LSH pipeline is the candidate equi-join.

    ``min_parallelism``: the Arrow fold parallelizes over INPUT SPLITS,
    which a 100 TB corpus has by the hundred-thousand (so leave this
    None there: signatures stay shuffle-free).  A small single-file
    corpus has exactly one split, serializing the Python stage behind
    one core; setting this hash-repartitions the docs first — one
    linear pass of the text through the exchange, bought back ~corewise
    by the now-parallel fold.  Registry/bench call sites set it to the
    session's shuffle partitions.
    """
    src = df.repartition(min_parallelism, id_col) if min_parallelism else df
    sh = with_shingles(src, id_col, text_col, k, hashed=True)
    return _band_buckets_from_shingles(sh, id_col, num_hashes, rows_per_band, seed)


def _band_buckets_from_shingles(
    sh: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    rows_per_band: int = 2,
    seed: int = 7,
) -> DataFrame:
    """The numpy banding fold of ``minhash_band_buckets`` over an
    already-shingled (id, shingles array<bigint>) relation — split out
    (r10) so ``minhash_lsh_pairs`` can derive signatures from the SAME
    cached shingle relation its verification step reads, instead of
    tokenizing + shingling the corpus twice per query."""
    n_bands = num_hashes // rows_per_band
    rng = np.random.default_rng(seed)
    A = (rng.integers(0, 2**63, num_hashes, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    B = rng.integers(0, 2**63, num_hashes, dtype=np.uint64)

    def _fold(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            arrs = [np.asarray(a, dtype=np.int64) for a in pdf["shingles"]]
            lens = np.array([len(a) for a in arrs])
            docs = pdf[id_col].to_numpy()
            keep = lens > 0
            if not keep.any():
                yield pd.DataFrame({id_col: docs[:0], "buckets": []})
                continue
            flat = np.concatenate([a for a in arrs if len(a)]).astype(np.uint64)
            with np.errstate(over="ignore"):
                M = flat[:, None] * A[None, :] + B[None, :]  # wrapping uint64
            starts = np.concatenate([[0], np.cumsum(lens[keep])[:-1]])
            sig = np.minimum.reduceat(M, starts, axis=0)  # (n_docs, num_hashes)
            with np.errstate(over="ignore"):
                buckets = sig[:, 0::rows_per_band] * _BAND_MIX
                for r in range(1, rows_per_band):
                    buckets = buckets ^ (sig[:, r::rows_per_band] * _BAND_MIX)
                buckets = (buckets * _BAND_MIX) + np.arange(n_bands, dtype=np.uint64)
            yield pd.DataFrame(
                {
                    id_col: docs[keep],
                    "buckets": list(buckets.astype(np.int64)),
                }
            )

    return sh.mapInPandas(_fold, schema=f"{id_col} bigint, buckets array<bigint>")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    rows_per_band: int = 2,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Near-dup pairs: LSH banding for candidates, exact Jaccard verify.

    With r=2, b=32: P(candidate | s=0.5) = 1-(1-0.25)^32 ≈ 0.9999 —
    recall at the 0.5 threshold is effectively total while candidate
    volume stays ~linear in the number of true near-dups.
    Output: (id_a, id_b, jaccard), verified exact, id_a < id_b.
    """
    # ONE tokenize+shingle pass per query (r10): the shingle relation
    # is cached and feeds BOTH the signature fold and the exact-Jaccard
    # verification below — the former code shingled the corpus twice
    # (once inside minhash_band_buckets, once for verification), i.e.
    # two full text scans at 100 TB where one suffices.
    src = df.repartition(min_parallelism, id_col) if min_parallelism else df
    sh = _scoped_cache(with_shingles(src, id_col, text_col, k, hashed=True), "minhash_sh")
    # cache: both sides of the candidate self-join consume the signature
    # relation — without the cache the Python signature stage runs twice
    sig = _scoped_cache(
        _band_buckets_from_shingles(sh, id_col, num_hashes, rows_per_band),
        "minhash_sig",
    )
    bands = sig.select(F.col(id_col), F.posexplode("buckets").alias("band", "bucket"))
    left = bands.select(F.col(id_col).alias("id_a"), "band", "bucket")
    right = bands.select(F.col(id_col).alias("id_b"), "band", "bucket")
    candidates = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    # exact verification restricted to candidates via semi-joins, over
    # the SAME cached shingle relation the signatures derive from.
    # r11 MEASURED, REVERTED: restructuring this tail so candidate
    # pairs carry both shingle arrays through a pair-keyed exchange
    # (attach-by-broadcast x2 then SMJ on the pair key, or an ids-only
    # pluck then two candidate-keyed joins) re-ships every candidate
    # doc's array once PER CANDIDATE PAIR — 3.6 MB -> 84 MB shuffled
    # for ngram at sf0.1 (pair-degree duplication of the fattest rows;
    # the same fat-row lesson as r10's source_shingle_overlap revert).
    # The planner-chosen join here moves each array at most once per
    # side: broadcast at bench scale, SMJ of one-array-per-doc rows at
    # corpus scale — already the minimal array movement.
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

    Token hashes are md5 computed JVM-side *into an array column* (the
    signature takes the LOWER 64 bits = first 16 hex chars), so each
    row is self-contained: no explode, no repartition — the whole
    signature computation is shuffle-free and embarrassingly parallel
    (the shape that matters at 100 TB).  md5 (not xxhash64, r5) because
    Spark md5 == hashlib md5 == DuckDB md5 on UTF-8 bytes, which makes
    the whole SimHash pipeline ORACLE-EXACT (SIMHASH_PAIRS_SQL replays
    the per-bit majority vote); any uniform hash serves SimHash equally.
    """
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokens_expr(text_col), lambda t: F.md5(t)).alias("hs"),
    )

    def _fold(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            # memo scoped PER BATCH (r6, ADVICE): a partition-lifetime
            # dict grows unboundedly with distinct tokens on exactly the
            # 100 TB path; the parse is cheap and repeats cluster within
            # a batch anyway, so per-batch scope keeps the amortization
            # with bounded memory.
            memo: dict[str, int] = {}

            def h64(hx: str) -> int:
                v = memo.get(hx)
                if v is None:
                    v = int(hx[:16], 16)
                    memo[hx] = v
                return v

            arrs = [np.asarray(a, dtype=object) for a in pdf["hs"]]
            lens = np.array([len(a) for a in arrs])
            docs = pdf["doc_id"].to_numpy()
            nonempty = lens > 0
            out_docs, out_vals = [], []
            if nonempty.any():
                flat_hex = np.concatenate([a for a in arrs if len(a)])
                flat = np.fromiter(
                    (h64(h) for h in flat_hex), dtype=np.uint64, count=len(flat_hex)
                )
                bits = (
                    (flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                ).astype(np.int64)
                weights = bits * 2 - 1  # 0/1 -> -1/+1
                ne_lens = lens[nonempty]
                starts = np.concatenate([[0], np.cumsum(ne_lens)[:-1]])
                sums = np.add.reduceat(weights, starts, axis=0)  # (n_docs, 64)
                sig = (sums > 0).astype(np.uint64)
                val = (sig << np.arange(64, dtype=np.uint64)).sum(
                    axis=1, dtype=np.uint64
                )
                out_docs.append(docs[nonempty])
                out_vals.append(val.astype(np.int64))
            if (~nonempty).any():  # tokenless docs -> all-zero signature
                out_docs.append(docs[~nonempty])
                out_vals.append(np.zeros((~nonempty).sum(), dtype=np.int64))
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(out_docs),
                    "simhash": np.concatenate(out_vals),
                }
            )

    return hashed.mapInPandas(_fold, schema=_SIMHASH_SCHEMA)


# 64 bits split into 6 blocks (Manku/Jain/Das Sarma, WWW'07 — the
# simhash dedup deployed over multi-billion-page corpora): probing on
# COMBINATIONS of 3 intact blocks gives ~33-bit keys instead of 16-bit
# bands.  Pigeonhole: d <= 3 flips touch <= 3 blocks, so >= 3 of 6
# blocks are intact and some triple matches exactly — still LOSSLESS.
# Collision math for a uniform corpus: expected random candidate pairs
# ~ C(6,3) * n^2 / 2^34 vs 4 * n^2 / 2^17 for 16-bit bands — five
# orders of magnitude fewer at the same recall, the difference between
# feasible and infeasible at 10^9 documents.
_BLOCK_SIZES = (11, 11, 11, 11, 10, 10)


def hamming_band_keys(hash_col, max_dist: int = 3):
    """Array of (band, bucket) probe keys for a 64-bit hash Column such
    that two hashes within ``max_dist`` Hamming bits share at least one
    key (lossless by pigeonhole).  ``max_dist <= 3`` uses the
    block-combination scheme above; 4..7 falls back to 8 byte-bands and
    8..15 to 16 nibble-bands (progressively coarser recall/selectivity
    trades — pigeonhole needs more bands than flipped bits; the wide
    radii are for small-corpus/recall-probe use, not the scale path)."""
    from itertools import combinations

    if not 0 <= max_dist <= 15:
        raise ValueError("max_dist must be in [0, 15] for a 64-bit hash")
    offs = []
    off = 0
    for s in _BLOCK_SIZES:
        offs.append((off, s))
        off += s

    def block(i):
        o, s = offs[i]
        return F.shiftrightunsigned(hash_col, o).bitwiseAND(F.lit((1 << s) - 1))

    if max_dist <= 3:
        keys = [
            F.shiftleft(block(i), 22)
            .bitwiseOR(F.shiftleft(block(j), 11))
            .bitwiseOR(block(k))
            for i, j, k in combinations(range(6), 3)
        ]
    elif max_dist <= 7:
        keys = [
            F.shiftrightunsigned(hash_col, 8 * i).bitwiseAND(F.lit(0xFF))
            for i in range(8)
        ]
    else:
        keys = [
            F.shiftrightunsigned(hash_col, 4 * i).bitwiseAND(F.lit(0xF))
            for i in range(16)
        ]
    return F.array(*keys)


def hamming_bucket_counts(
    hashes: DataFrame, hash_col: str, max_dist: int = 3
) -> DataFrame:
    """(band, bucket, n_members) membership count of every Hamming
    probe-key bucket for a relation of 64-bit hashes — the AUDIT twin of
    ``max_bucket_df``: ``.filter(n_members > cap)`` is exactly the set
    of buckets the capped operators drop, with how many records each
    held, so the recall loss of a cap is inspectable (and loggable as a
    side output) rather than silent."""
    return (
        hashes.select(
            F.posexplode(hamming_band_keys(F.col(hash_col), max_dist)).alias(
                "band", "bucket"
            )
        )
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    )


def _cap_posting_buckets(
    posting: DataFrame, max_bucket_df: int | None, keys: tuple[str, str]
) -> DataFrame:
    """Drop posting rows of probe-key buckets holding more than
    ``max_bucket_df`` records — the Hamming-banding twin of
    ``_drop_stop_shingles`` (r5 verdict item 2).  A real multimodal
    corpus has millions of near-constant payloads (black frames, blank
    scans) that all hash to ~0: every one lands in the same (band,
    bucket) and the candidate self-join goes quadratic on that single
    skewed key.  The cap bounds candidate work per bucket at
    C(max_bucket_df, 2) — a recall knob, not a correctness one within
    surviving buckets (re-verification stays exact): only pairs whose
    EVERY shared probe key is over-cap can be missed, and those are
    near-constant payloads a curation pipeline should gate upstream
    anyway.  ``None`` (the oracle-parity default) keeps every bucket;
    audit the loss with ``hamming_bucket_counts``.

    Plan shape: the filter is an ANTI join against the OVERFLOW bucket
    keys — a tiny relation (the pathological buckets only; usually
    empty) that broadcasts for free.  Keeping the under-cap complement
    instead would build a distinct-buckets-sized (~corpus-sized, most
    probe keys are unique) broadcast per run — measured 2-3x the whole
    gate's cost at 200k images before the flip."""
    if max_bucket_df is None:
        return posting
    overflow = (
        posting.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bdf"))
        .filter(F.col("_bdf") > max_bucket_df)
        .select(*keys)
    )
    return posting.join(F.broadcast(overflow), list(keys), "left_anti")


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """Pairs within Hamming distance <= max_hamming via pigeonhole
    banding over block-combination probe keys (``hamming_band_keys``:
    C(6,3) ~33-bit keys for max_hamming <= 3 — the Manku et al. WWW'07
    scheme — falling back to 8 byte-bands for 4..7); any pair within
    distance shares at least one key, so the banding is LOSSLESS and
    the all-pairs DuckDB oracle certifies it exactly.

    ``max_bucket_df`` (off by default for oracle parity) drops probe-key
    buckets holding more than that many documents before the candidate
    self-join — the skewed-bucket guard for corpora with millions of
    near-identical signatures (see ``_cap_posting_buckets``); audit
    dropped buckets with ``hamming_bucket_counts``.
    Output (id_a, id_b, hamming)."""
    # cached: the banding self-join reads the signature relation twice
    sig = _scoped_cache(simhash_signatures(df, id_col, text_col), "simhash_sig")
    bands = sig.select(
        F.col("doc_id"),
        F.col("simhash"),
        F.posexplode(hamming_band_keys(F.col("simhash"), max_hamming)).alias(
            "band", "bucket"
        ),
    )
    bands = _cap_posting_buckets(bands, max_bucket_df, ("band", "bucket"))
    left = bands.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sig_a"), "band", "bucket"
    )
    right = bands.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sig_b"), "band", "bucket"
    )
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            .cast("long")
            .alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def incremental_near_dup_pairs(
    existing: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Arrival-time near-dup gate: all Jaccard >= threshold pairs that
    involve at least one NEW document — (new, existing) and (new, new) —
    without re-running the all-pairs search over the whole corpus.

    Same inverted-index + PPJoin prefix/positional machinery as
    ``ngram_jaccard_pairs`` (rarity order and prefixes computed over the
    COMBINED corpus, so the prefix-filter guarantee is unchanged), but
    the candidate join's probe side is restricted to new documents:
    join work scales with |new| x posting overlap, never |corpus|^2.
    This is the per-activation dedup step of a streaming curation
    pipeline — at 100 TB the historical side is touched only through
    its (cacheable) posting lists.  Ids must be unique across both
    inputs.  Output: (id_a, id_b, jaccard), id_a < id_b.
    """
    combined = existing.select(id_col, text_col).unionByName(
        new.select(id_col, text_col)
    )
    sh = _scoped_cache(
        with_shingles(combined, id_col, text_col, k, hashed=True), "inc_sh"
    )
    posts = sh.select(
        F.col(id_col),
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    posts = _drop_stop_shingles(posts, max_shingle_df)
    gdf = posts.groupBy("shingle").agg(F.count(F.lit(1)).alias("gdf"))
    w = Window.partitionBy(id_col).orderBy("gdf", "shingle")
    # pinned (r10): both candidate sides re-derive the prefix relation
    # (the probe side additionally semi-filters it) — cached, the
    # posting-df join + rarity window run once (same rule as
    # ngram_jaccard_pairs)
    prefix = _scoped_cache(
        posts.join(gdf, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .filter(
            F.col("pos") <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        )
        .select(F.col(id_col), "shingle", "pos", "n_sh"),
        "inc_prefix",
    )
    new_ids = new.select(id_col).dropDuplicates()
    a = prefix.select(
        F.col(id_col).alias("id_a"), "shingle",
        F.col("pos").alias("pos_a"), F.col("n_sh").alias("n_a"),
    )
    b = prefix.join(new_ids, id_col, "left_semi").select(
        F.col(id_col).alias("id_b"), "shingle",
        F.col("pos").alias("pos_b"), F.col("n_sh").alias("n_b"),
    )
    alpha = F.ceil(F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b")))
    candidates = (
        a.join(b, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(
            F.least(F.col("n_a") - F.col("pos_a"), F.col("n_b") - F.col("pos_b")) + 1
            >= alpha
        )
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .dropDuplicates()
    )
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
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


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    min_freq: int | None = None,
    rebuild: str = "inrow",
    scope: str = "corpus",
    min_doc_freq: int | None = None,
) -> DataFrame:
    """Exact duplicated-SPAN removal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): a token position is
    duplicated if it lies inside any ``min_tokens``-token run whose
    exact text also occurs in >= ``min_freq`` distinct documents;
    duplicated positions are removed from every document (the
    second-most-cited text dedup after MinHash — r5 verdict gap 2:
    winnowing DETECTS partial overlap, nothing removed it at arbitrary
    span grain).

    Spark-first shape — no pair join anywhere, so nothing is quadratic:
      1. per-position k-gram md5 over the token array (one scan; arrays
         materialized before the lambda, the ``with_shingles`` rule),
      2. one hash shuffle groups grams to count DISTINCT documents
         (Lee et al.'s suffix-array "occurs elsewhere" test, re-expressed
         as the k-gram posting aggregate: a span of length n >= k is
         cross-duplicated iff each of its n-k+1 k-gram seeds is),
      3. duplicated grams semi-join back to postings, each hit covers
         positions [pos, pos+k-1]; per-doc covered sets are bounded by
         document length, never corpus size.
    Work is O(corpus tokens) map-side + one groupBy on the gram hash —
    the same budget as exact dedup, and ubiquitous boilerplate grams
    make positions MORE covered, never a bigger join (there is no
    posting self-join to skew).

    Output per input doc: (id, n_tokens, n_dup_tokens, dup_token_ratio
    [int/int double], cleaned_text = surviving tokens joined by a single
    space — a tokenized normalization, like every text op here).
    Fully deterministic (md5 grams, integer positions) -> DuckDB-oracle
    exact.

    The cleaned-text rebuild has two equivalent modes
    (``rebuild=``, bit-identical output — pytest-pinned):
    - ``"inrow"`` (default): filter the token array against the
      covered-position set in-row — O(n_tokens · n_covered) per doc,
      zero extra shuffle; right for web-document lengths.
    - ``"exploded"``: explode tokens with positions, ANTI join covered
      positions on (id, pos), re-aggregate in position order — linear
      in tokens at the cost of one more shuffle; right for book-length
      documents where a heavily-covered doc would make the in-row
      filter quadratic.

    ``scope`` selects the duplication test — note ``min_freq`` is
    scope-relative (DISTINCT-document count under ``"corpus"``,
    within-document occurrence count under ``"doc"``; the old
    ``min_doc_freq`` name described only the former and survives as a
    deprecated alias — round-7 ADVICE):
    - ``"corpus"`` (default, the Lee et al. semantics above): a k-run
      is duplicated if it occurs in >= ``min_freq`` DISTINCT
      documents; ALL its positions are removed everywhere.
    - ``"doc"`` — INTRA-document repeated-span removal (the scraped-
      page boilerplate case: a nav block or footer repeated inside one
      page): a k-run repeated >= ``min_freq`` times within the
      SAME document keeps its FIRST occurrence and loses the rest.
      The gram aggregate is keyed on (id, gram) instead of gram, so
      the whole plan stays one hash shuffle; keep-first falls out of a
      MIN(pos) carried on the same aggregate — no extra pass.
      Keep-first is per GRAM: when occurrences of a run OVERLAP
      (period < k, e.g. 'a a a a a a' at k=5), a later occurrence's
      cover span reaches back into the first occurrence's tail, so
      only the non-overlapped prefix of the first occurrence survives
      (pytest pins 'a' surviving from six) — positions covered by any
      non-first occurrence are cut, wherever they sit."""
    # min_freq uses a None sentinel so an EXPLICIT min_freq=2 together
    # with the deprecated alias still refuses instead of silently taking
    # the alias value (round-8 ADVICE: `min_freq != 2` couldn't tell
    # "defaulted" from "explicitly 2").
    if min_doc_freq is not None:  # deprecated alias, pre-round-8 API
        if min_freq is not None:  # both given explicitly — refuse, don't clobber
            raise ValueError(
                "exact_substring_dedup: pass min_freq OR the deprecated "
                "min_doc_freq, not both"
            )
        min_freq = min_doc_freq
    elif min_freq is None:
        min_freq = 2
    if rebuild not in ("inrow", "exploded"):
        raise ValueError("rebuild must be 'inrow' or 'exploded'")
    if scope not in ("corpus", "doc"):
        raise ValueError("scope must be 'corpus' or 'doc'")
    k = min_tokens
    toked = _scoped_cache(
        df.select(F.col(id_col), tokens_expr(text_col).alias("_toks")), "substr_toked"
    )
    n = F.size("_toks")
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.md5(F.array_join(F.slice("_toks", i, k), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    posting = toked.select(
        F.col(id_col), F.posexplode(grams).alias("_p0", "g")
    ).select(F.col(id_col), (F.col("_p0") + 1).alias("pos"), "g")
    if scope == "doc":
        rep = (
            posting.groupBy(id_col, "g")
            .agg(F.min("pos").alias("_minpos"), F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= min_freq)
            .select(id_col, "g", "_minpos")
        )
        cov_src = (
            posting.join(rep, [id_col, "g"])
            .filter(F.col("pos") != F.col("_minpos"))
            .select(id_col, "pos")
        )
    else:
        dup_g = (
            posting.groupBy("g")
            .agg(F.count_distinct(F.col(id_col)).alias("_df"))
            .filter(F.col("_df") >= min_freq)
            .select("g")
        )
        cov_src = posting.join(dup_g, "g", "left_semi")
    cov_pos = cov_src.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("cp"),
    )
    if rebuild == "exploded":
        n_cov = cov_pos.dropDuplicates([id_col, "cp"]).groupBy(id_col).agg(
            F.count(F.lit(1)).cast("long").alias("_ncov")
        )
        toks_pos = toked.select(
            F.col(id_col), F.posexplode("_toks").alias("_p0", "_tok")
        ).select(F.col(id_col), (F.col("_p0") + 1).cast("int").alias("pos"), "_tok")
        kept = toks_pos.join(
            cov_pos.withColumnRenamed("cp", "pos"), [id_col, "pos"], "left_anti"
        )
        cleaned = kept.groupBy(id_col).agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_tok"))),
                    lambda x: x["_tok"],
                ),
                " ",
            ).alias("_cleaned")
        )
        ncov = F.coalesce(F.col("_ncov"), F.lit(0).cast("long"))
        return (
            toked.join(n_cov, id_col, "left")
            .join(cleaned, id_col, "left")
            .select(
                F.col(id_col),
                F.size("_toks").cast("long").alias("n_tokens"),
                ncov.alias("n_dup_tokens"),
                F.when(F.size("_toks") > 0, ncov / F.size("_toks"))
                .otherwise(F.lit(0.0))
                .alias("dup_token_ratio"),
                F.coalesce(F.col("_cleaned"), F.lit("")).alias("cleaned_text"),
            )
        )
    cov = cov_pos.groupBy(id_col).agg(F.collect_set("cp").alias("_cov"))
    covered = F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
    return toked.join(cov, id_col, "left").select(
        F.col(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.size(covered).cast("long").alias("n_dup_tokens"),
        F.when(
            F.size("_toks") > 0, F.size(covered) / F.size("_toks")
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_ratio"),
        F.array_join(
            F.filter(
                F.col("_toks"),
                lambda x, i: ~F.array_contains(covered, (i + 1).cast("int")),
            ),
            " ",
        ).alias("cleaned_text"),
    )


def doc_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, n_sh, shingle) posting rows — the appendable near-dup index.

    Postings are deterministic per document (hashed distinct k-shingles),
    so an accepted document's rows never change: the index is append-only
    alongside the corpus, and the arrival-time gate
    (``incremental_near_dup_pairs_indexed``) reads it instead of
    re-shingling history.
    """
    sh = with_shingles(df, id_col, text_col, k, hashed=True)
    return sh.select(
        F.col(id_col),
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )


def incremental_near_dup_pairs_indexed(
    existing_posts: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """``incremental_near_dup_pairs`` with the historical side supplied
    as a posting index (``doc_postings`` rows) instead of raw text.

    Identical output; the difference is operational: history costs one
    narrow index scan (no text read, no re-shingling — the O(corpus)
    term of the text-side variant), and the exact-verification step
    reconstructs shingle sets only for candidate documents.  This is
    the 100 TB shape of the arrival-time dedup gate.

    Only shingles PROBED by the new batch can produce pairs, so the
    history side is restricted map-side to the batch's broadcast
    shingle keys BEFORE any shuffle (the
    ``incremental_hamming_near_dup_pairs`` probed-buckets rule) — the
    round-9 curation-composition probe caught the df aggregate and
    prefix window re-shuffling the FULL posting index every epoch
    (per-epoch shuffle bytes ramped linearly with history).  The
    restriction is exact, not approximate: the semi-join keeps EVERY
    row of a probed shingle, so probed shingles' df counts (stop-
    shingle cap + prefix order) are their true global values, dropping
    unprobed shingles only shifts prefix positions EARLIER (candidate
    superset; the positional alpha filter also only loosens), and the
    final exact-Jaccard verification is unchanged — pytest pins the
    gate equal to the batch operator either way.
    """
    sh_new = _scoped_cache(
        with_shingles(new, id_col, text_col, k, hashed=True), "inc_sh_new"
    )
    posts_new = sh_new.select(
        F.col(id_col),
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    probed_keys = posts_new.select("shingle").dropDuplicates()
    probed_hist = existing_posts.select(id_col, "n_sh", "shingle").join(
        F.broadcast(probed_keys), "shingle", "left_semi"
    )
    posts_all = _drop_stop_shingles(
        probed_hist.unionByName(posts_new), max_shingle_df
    )
    gdf = posts_all.groupBy("shingle").agg(F.count(F.lit(1)).alias("gdf"))
    w = Window.partitionBy(id_col).orderBy("gdf", "shingle")
    prefix = (
        posts_all.join(gdf, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .filter(
            F.col("pos") <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        )
        .select(F.col(id_col), "shingle", "pos", "n_sh")
    )
    new_ids = new.select(id_col).dropDuplicates()
    a = prefix.select(
        F.col(id_col).alias("id_a"), "shingle",
        F.col("pos").alias("pos_a"), F.col("n_sh").alias("n_a"),
    )
    b = prefix.join(new_ids, id_col, "left_semi").select(
        F.col(id_col).alias("id_b"), "shingle",
        F.col("pos").alias("pos_b"), F.col("n_sh").alias("n_b"),
    )
    alpha = F.ceil(F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b")))
    candidates = (
        a.join(b, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(
            F.least(F.col("n_a") - F.col("pos_a"), F.col("n_b") - F.col("pos_b")) + 1
            >= alpha
        )
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .dropDuplicates()
    )
    # exact verification: shingle sets from the new side's arrays and,
    # for the (few) candidate historical docs only, from their postings
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .unionByName(candidates.select(F.col("id_b").alias(id_col)))
        .dropDuplicates()
    )
    exist_sets = (
        existing_posts.join(cand_ids, id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("shingles"))
    )
    all_sets = exist_sets.unionByName(sh_new.select(id_col, "shingles"))
    sa = all_sets.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = all_sets.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
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


def source_shingle_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Cross-source content overlap matrix: for every pair of sources
    sharing at least one distinct k-gram shingle, the shared-shingle
    count and a containment score — the corpus-composition audit run
    before mixing sources (a feed that is 90%-contained in another is a
    re-crawl, not new data; also the source-grain view of what
    eval_contamination does at doc grain).

    Scale shape: the unit of work is the DISTINCT (source, shingle)
    relation — one hash agg over exploded shingles, corpus-linear.  The
    overlap self-join is keyed on the shingle; a shingle present in s
    sources contributes C(s,2) pair rows, and s is bounded by the
    SOURCE count (hundreds, not documents), so per-key fanout is
    bounded by construction — no stop-key cap needed, unlike doc-grain
    posting joins where a boilerplate shingle fans out per DOCUMENT.

    containment_bp = round_half_up(10000 * overlap / min(|A|, |B|)),
    exact via integer DIV (the money.py pattern), so the driver hash is
    engine-independent.  Output: (source_a, source_b, n_sh_a, n_sh_b,
    overlap, containment_bp), a < b lexicographically.
    """
    sh = with_shingles(
        df.select(group_col, text_col), id_col=group_col, text_col=text_col, k=k
    )
    # pinned: the distinct (source, shingle) relation feeds BOTH sides
    # of the overlap self-join AND the per-source sizes — unpinned, the
    # physical plan re-runs the corpus explode+distinct three times
    ssh = _scoped_cache(
        sh.select(F.col(group_col), F.explode("shingles").alias("_sh"))
        .dropDuplicates(),
        "source_overlap_ssh",
    )
    sizes = ssh.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    # r10 NEGATIVE RESULT, kept as the self-join on purpose: rewriting
    # this as ONE groupBy(shingle) + collect_set(source) + map-side
    # C(s,2) pair expansion (one posting exchange instead of two join
    # sides) MEASURED WORSE — shuffle write 6.6 MB -> 11.7 MB at sf0.1
    # (collect_set partials ride an ObjectHashAggregate whose
    # serialized set rows outweigh the raw (source, shingle) row, and
    # the object agg never enters whole-stage codegen), wall +0.2 s.
    # Two exchanges of narrow rows beat one exchange of fat rows.
    a = ssh.select(F.col(group_col).alias("source_a"), "_sh")
    b = ssh.select(F.col(group_col).alias("source_b"), "_sh")
    ov = (
        a.join(b, "_sh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    return (
        ov.join(
            F.broadcast(sizes.select(F.col(group_col).alias("source_a"),
                                     F.col("n_sh").alias("n_sh_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col(group_col).alias("source_b"),
                                     F.col("n_sh").alias("n_sh_b"))),
            "source_b",
        )
        .withColumn("_m", F.least("n_sh_a", "n_sh_b"))
        .withColumn(
            "containment_bp",
            F.expr("(overlap * 20000 + _m) div (2 * _m)").cast("long"),
        )
        .select(
            "source_a", "source_b", "n_sh_a", "n_sh_b", "overlap", "containment_bp"
        )
        .orderBy("source_a", "source_b")
    )
