"""Count-min sketch: a mergeable frequency sketch with DETERMINISTIC
hashes — the frequency-domain complement of the HLL distinct-count
rollups (`plans/streaming_queries.py::weekly_users_from_daily_sketches`).

Why it earns its place next to the exact `top_tokens` aggregate: at
100 TB the exact token-frequency table is itself huge (vocab can be
billions of n-grams), while the CMS is a FIXED d x w counter grid
(d*w rows, here 4 x 512) that:
- builds with one explode(d) + one hash aggregate (map-side partials
  reduce every partition to <= d*w rows before the exchange);
- merges across shards/days by element-wise SUM (same union +
  re-aggregate shape as the HLL rollup — raw data scanned once ever);
- answers any point-frequency query with estimate = min over d rows,
  guaranteed >= the true count (Cormode & Muthukrishnan, "An improved
  data stream summary: the count-min sketch and its applications").

Unlike library sketches, the row hashes are the repo's md5-hex
convention (`md5(row || ':' || key)` prefix mod w), so the sketch —
and anything computed FROM it — is bit-identical in any engine and
DuckDB-oracle-certifiable (the seeded HLL queries are rows-only; this
one — like the histogram and bottom-k quantile sketches below — is
exact-hash-checkable).

No analogue in the reference (`transform.py:28-227`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.functions import broadcast


def _bucket(row: Column, key: Column, w: int) -> Column:
    h = F.md5(F.concat(row.cast("string"), F.lit(":"), key))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % w).cast("int")


def cms_build(
    df: DataFrame, key_col: str, d: int = 4, w: int = 512
) -> DataFrame:
    """Build the sketch: (row int, bucket int, cnt long), <= d*w rows.
    Sketches over different slices (days, sources, shards) merge by
    ``union -> groupBy(row, bucket) -> sum(cnt)``."""
    rows = df.select(
        F.col(key_col).alias("_k"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"),
    )
    return (
        rows.select("row", _bucket(F.col("row"), F.col("_k"), w).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Element-wise sum of compatible sketches (same d, w)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").cast("long").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, d: int = 4, w: int = 512
) -> DataFrame:
    """Point-frequency estimates for ``keys``: (key_col, est_count) with
    est = min over the d rows — always >= the true count.  The sketch
    is <= d*w rows, so it broadcasts; the probe side never shuffles
    more than one (key, d)-explode + the final min aggregate."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"),
    ).select(
        F.col(key_col),
        "row",
        _bucket(F.col("row"), F.col(key_col), w).alias("bucket"),
    )
    return (
        probes.join(broadcast(sketch), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )


def token_heavy_hitters(
    docs: DataFrame,
    top_n: int = 20,
    d: int = 4,
    w: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_n`` corpus tokens BY SKETCH ESTIMATE: build the CMS
    over all token occurrences, then estimate every distinct token and
    take the largest (ties -> lexicographically smallest token).
    Deterministic end-to-end, so exact-oracle-checkable even though the
    estimates themselves are approximate counts."""
    toks = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), "\\s+")).alias("token")
    ).filter(F.col("token") != "")
    sketch = cms_build(toks, "token", d, w)
    est = cms_estimate(sketch, toks.distinct(), "token", d, w)
    return est.orderBy(F.col("est_count").desc(), "token").limit(top_n)


def value_histogram(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo_hi: DataFrame,
    buckets: int = 128,
) -> DataFrame:
    """Fixed-width histogram: (group, bucket int, cnt long) against the
    1-row (lo, hi) bounds relation.  Mergeable across shards/days by
    ``union -> groupBy(group, bucket) -> sum(cnt)`` — the quantile
    analogue of the CMS/HLL rollups.  Nulls excluded; values clamp into
    [0, buckets-1] so merged histograms with wider live ranges stay
    well-defined.  A degenerate range (hi <= lo, e.g. a constant-valued
    column) short-circuits to bucket 0 for every row instead of the NaN
    division a zero width would produce (ADVICE r4) — quantile
    estimates then collapse to ``lo`` exactly."""
    ev = df.select(F.col(group_col), F.col(value_col).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(buckets))
    raw = F.floor((F.col("_v") - F.col("lo")) / width)
    clamped = F.least(
        F.greatest(raw, F.lit(0).cast("long")), F.lit(buckets - 1).cast("long")
    )
    bucket = (
        F.when(F.col("hi") > F.col("lo"), clamped)
        .otherwise(F.lit(0).cast("long"))
        .cast("int")
        .alias("bucket")
    )
    return (
        ev.join(F.broadcast(lo_hi))  # 1-row bounds: broadcast cross join
        .select(F.col(group_col), bucket)
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    buckets: int = 128,
    percents: tuple[int, ...] = (50, 95, 99),
) -> DataFrame:
    """Mergeable approximate quantiles via a fixed-width histogram —
    deterministic, so (unlike `percentile_approx`/KLL) the estimate is
    DuckDB-oracle-exact end to end.

    Estimate for percentile p: the LOWER EDGE of the first bucket whose
    cumulative count reaches ceil(p*n/100) (integer-exact target rank;
    edge = lo + bucket*width, one IEEE mul+add).  Error is bounded by
    one bucket width — the classic fixed-histogram trade, and the price
    of mergeability + determinism.

    Scale shape: one pass for the global (lo, hi) 1-row bounds
    (broadcast back), one pass to histogram (map-side partials reduce
    every partition to <= |groups| x buckets rows), then all remaining
    work (cumulative window, target selection) runs on <= buckets rows
    per group.  Output: (group, n, p{p}_est ...) ordered by group."""
    ev = df.select(F.col(group_col), F.col(value_col).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    bounds = ev.agg(F.min("_v").alias("lo"), F.max("_v").alias("hi"))
    hist = value_histogram(df, value_col, group_col, bounds, buckets)
    n = ev.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    sel = (
        cum.join(n, group_col)
        .groupBy(group_col)
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum") >= F.expr(f"({p} * n + 99) div 100"),
                        F.col("bucket"),
                    )
                ).alias(f"_b{p}")
                for p in percents
            ]
        )
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(buckets))
    return (
        sel.join(n, group_col)
        .join(F.broadcast(bounds))
        .select(
            F.col(group_col),
            F.col("n"),
            *[
                (F.col("lo") + F.col(f"_b{p}") * width).alias(f"p{p}_est")
                for p in percents
            ],
        )
        .orderBy(group_col)
    )


# --- deterministic md5-register HyperLogLog (r9 verdict item 5) ------
#
# The built-in HLL paths (approx_count_distinct, hll_sketch_agg) are
# seeded JVM internals — correct and fast, but non-replayable by an
# external oracle, so their queries were rows-only for the driver.
# This twin is the CMS/bottom-k recipe applied to HLL: registers are
# derived from md5 hex (the repo's portability convention), so the
# whole sketch — registers, harmonic sum, linear-counting correction —
# is bit-identical in any engine and DuckDB-oracle-exact.
#
# Estimator determinism is the delicate part and is engineered, not
# assumed:
# - the register rank rho comes from STRING ops on the md5 hex
#   (leading-zero run + a 16-way digit CASE) — no float log2;
# - the harmonic sum is computed as the INTEGER sum of 2^(61-rho)
#   (exact in DECIMAL(38,0) / HUGEINT; absent registers contribute
#   2^61 each), cast to double once — integer-exact in any engine,
#   immune to float summation order;
# - alpha * m^2 * 2^61 is ONE Python-computed double literal inlined
#   into both plans, so the estimate is a single IEEE division;
# - the linear-counting branch needs ln(m/V), and libm is NOT pinned
#   across engines — so all m possible values are precomputed in
#   Python as a shared literal table both sides index (V in 1..m).
#
# m = 1024 registers: raw-HLL sigma 1.04/sqrt(m) ~ 3.3%, and the
# linear-counting regime (E <= 2.5m = 2560) covers the daily/weekly
# user counts at every test sf with ~1-3% error.

import math

HLL_M = 1024
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# alpha * m^2 * 2^61: the numerator of the harmonic-mean estimate over
# the SCALED integer sum (see md5_hll_estimate)
HLL_ALPHA_SCALED = _HLL_ALPHA * HLL_M * HLL_M * float(1 << 61)
# linear-counting lookup: m * ln(m / V) for V = 1..m, computed once in
# Python and inlined into BOTH the Spark plan and the oracle SQL
HLL_LC_TABLE = tuple(HLL_M * math.log(HLL_M / v) for v in range(1, HLL_M + 1))


def md5_hll_registers(
    df: DataFrame, key_col: str, group_col: str
) -> DataFrame:
    """Per-group HLL register table: (group_col, reg int, rho int),
    <= ``HLL_M`` rows per group.  reg = 10 bits of md5(key); rho = 1 +
    leading-zero count of the next 60 bits (in [1, 61]); the table
    keeps max(rho) per register.  MERGEABLE across slices (days,
    shards) by ``union -> groupBy(group, reg) -> max(rho)`` — max is
    associative, so merged registers equal direct ones exactly
    (pytest-pinned), the same re-aggregation contract as the CMS.

    NULL keys are excluded (the ``approx_count_distinct`` convention):
    left in, a NULL key's all-NULL register row would inflate the
    present-register count and quietly deflate the linear-counting
    correction — identically in any engine (NULL propagation is the
    same everywhere), so the oracle would still match while both sides
    were statistically wrong."""
    df = df.filter(F.col(key_col).isNotNull())
    h = F.md5(F.col(key_col).cast("string"))
    # 3 hex chars = 12 bits; % 1024 of a non-negative 12-bit value is
    # an exact power-of-two split -> uniform over the 1024 registers
    reg = (F.conv(F.substring(h, 1, 3), 16, 10).cast("int") % HLL_M).alias("reg")
    h15 = F.substring(h, 4, 15)  # the next 60 bits as 15 hex digits
    z = F.length(F.regexp_extract(h15, "^0*", 0))  # leading zero DIGITS
    d = F.substr(h15, z + F.lit(1), F.lit(1))  # first non-zero digit
    lz = (
        F.when(d == "1", 3)
        .when(d.isin("2", "3"), 2)
        .when(d.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = (
        F.when(z == 15, F.lit(61)).otherwise(z * 4 + lz + 1).cast("int").alias("rho")
    )
    return (
        df.select(F.col(group_col), reg, rho)
        .groupBy(group_col, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def md5_hll_estimate(
    registers: DataFrame, group_col: str, out_col: str = "approx_distinct"
) -> DataFrame:
    """Distinct-count estimate per group from an ``md5_hll_registers``
    table: floor of the HLL harmonic-mean estimate, with the standard
    linear-counting correction when E <= 2.5m and empty registers
    remain (Flajolet et al. 2007) — every arithmetic step deterministic
    across engines (see the module comment).  Output:
    (group_col, out_col bigint)."""
    # scaled harmonic sum: present registers contribute 2^(61-rho)
    # (integer, <= 2^60), absent ones 2^61 each; the grand total
    # (<= m * 2^61 = 2^71) needs DECIMAL(38,0) — BIGINT overflows
    term = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 61 - rho) AS DECIMAL(38,0))")
    g = registers.groupBy(group_col).agg(
        F.sum(term).alias("_s"),
        F.count(F.lit(1)).cast("long").alias("_nreg"),
    )
    v = F.lit(HLL_M).cast("long") - F.col("_nreg")  # empty registers
    s_total = (
        F.col("_s")
        + v.cast("decimal(38,0)") * F.lit(1 << 61).cast("decimal(38,0)")
    ).cast("double")
    e_raw = F.lit(HLL_ALPHA_SCALED) / s_total
    lc = F.element_at(
        F.array(*[F.lit(x) for x in HLL_LC_TABLE]), v.cast("int")
    )
    est = F.when((v > 0) & (e_raw <= F.lit(2.5 * HLL_M)), lc).otherwise(e_raw)
    return g.select(
        F.col(group_col), F.floor(est).cast("long").alias(out_col)
    )


def bottomk_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    key_col: str,
    k: int = 512,
) -> DataFrame:
    """Deterministic per-group uniform sample: the ``k`` rows with the
    SMALLEST md5(key) per group — a bottom-k / KMV-style sketch
    (Bar-Yossef et al. 2002; Cohen & Kaplan 2007).  md5 of the row key
    is a fixed uniform-ish rank, so the kept set is a uniform sample of
    the group that is
    - deterministic (same input -> same sample, any engine: the md5-hex
      portability convention), and
    - MERGEABLE: bottom-k of a union == bottom-k of the union of each
      part's bottom-k, so partial samples from splits/epochs combine
      exactly (pytest-pinned).

    Scale shape — TWO-PHASE, exact by mergeability: phase 1 ranks per
    (group, salt-of-key) over ``n_salts`` salts, phase 2 re-ranks the
    surviving <= n_salts x k rows per group.  Both rank filters compile
    to WindowGroupLimit (Spark 3.5+), so each map partition keeps only
    its own k smallest per partition-spec BEFORE any shuffle; no task
    ever holds a whole group (few-large-group columns like event_type
    would otherwise funnel each group's full membership into one task —
    the plan-gate rule in tests/test_plans.py), and the phase-2 funnel
    input is bounded by construction, independent of corpus size.  The
    salt is engine-local plan detail only: the global bottom-k is a
    subset of the union of per-salt bottom-k's (mergeability), and
    phase 2 recomputes exact md5 ranks on that union, so the OUTPUT is
    identical to a single-phase rank — and to the oracle's.

    ``key_col`` SHOULD be unique per row (the dedup gates' "ids must
    be unique" contract): the sample is a bottom-k BY KEY, so rows
    sharing a key collapse onto the same md5 rank.  The sort is still
    fully deterministic for duplicate keys — ``value_col`` is the
    final tie-break (ADVICE r9), mirrored in the oracle SQL — but
    which k KEYS survive is then a sample of distinct keys, not rows,
    and the uniformity story degrades accordingly.

    Output: (group_col, value_col, key_col) — the key rides along so
    partial samples can be merged (re-sampled) downstream."""
    n_salts = 32
    base = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col), F.col(value_col), F.col(key_col))
        .withColumn("_mk", F.md5(F.col(key_col).cast("string")))
        .withColumn("_salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_salts)))
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy(
        "_mk", F.col(key_col), F.col(value_col)
    )
    pruned = base.withColumn("_rk1", F.row_number().over(w1)).filter(
        F.col("_rk1") <= k
    )
    w2 = Window.partitionBy(group_col).orderBy(
        "_mk", F.col(key_col), F.col(value_col)
    )
    return (
        pruned.withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= k)
        .select(group_col, value_col, key_col)
    )


def bottomk_sample_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    key_col: str,
    k: int = 512,
    percents: tuple[int, ...] = (50, 95, 99),
) -> DataFrame:
    """Approximate per-group quantiles from the ``bottomk_sample``
    sketch — the deterministic, oracle-EXACT replacement for
    ``percentile_approx``/KLL (r8 verdict item 7a): the estimate for
    percentile p is the ceil(p*m/100)-th smallest of the m sampled
    values (integer-exact target rank, no float arithmetic on the
    values themselves, so the DuckDB twin reproduces every output bit).
    Standard bottom-k error: the sample is uniform, so the rank error
    is O(sqrt(p(1-p)/k)) of the group size w.h.p. — pytest pins <= 5
    percentile points at k=512.

    Output: (group, n_sample, p{p}_est ...) ordered by group."""
    s = bottomk_sample(df, value_col, group_col, key_col, k)
    g = s.groupBy(group_col).agg(
        F.sort_array(F.collect_list(value_col)).alias("_vals"),
        F.count(F.lit(1)).cast("long").alias("n_sample"),
    )
    return g.select(
        F.col(group_col),
        F.col("n_sample"),
        *[
            F.element_at(
                "_vals", F.expr(f"CAST(({p} * n_sample + 99) DIV 100 AS INT)")
            ).alias(f"p{p}_est")
            for p in percents
        ],
    ).orderBy(group_col)
