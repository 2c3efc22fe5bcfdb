"""Streaming-shaped operators, certified in batch mode.

The reference has no in-engine streaming (SURVEY §2.9) — its
"real-time" property is the S3-event -> Step Functions trigger.  Our
engine's native streaming path lives in ``streaming/pipeline.py``;
the *operators* it uses (tumbling windows, sessionization) are
registered here over the batch ``events`` table so the driver can
oracle-check their semantics — ``F.window`` behaves identically in
batch and streaming, which is exactly why Structured Streaming is the
right 100 TB substrate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_testdata
from .registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_testdata(spark, sf_dir, "events")["events"]


# --- tumbling-window aggregation (the streaming KPI shape) ---

EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts)          AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT)        AS n_events,
       ROUND(SUM(value), 4)            AS sum_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("events_hourly_stats", EVENTS_HOURLY_SQL, "streaming: tumbling window agg")
def q_events_hourly_stats(spark, sf_dir):
    events = _events(spark, sf_dir)
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "unique_users",
        )
        .orderBy("window_start", "event_type")
    )


# --- sliding-window aggregation ---

EVENTS_SLIDING_SQL = """
WITH offsets AS (SELECT 0 AS off UNION ALL SELECT 30),
     slid AS (
       SELECT date_trunc('hour', e.ts - to_minutes(o.off)) + to_minutes(o.off)
                AS window_start,
              e.value
       FROM events e CROSS JOIN offsets o
     )
SELECT window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4)     AS sum_value
FROM slid
GROUP BY 1
ORDER BY 1
"""


@register("events_sliding_stats", EVENTS_SLIDING_SQL, "streaming: sliding window agg")
def q_events_sliding_stats(spark, sf_dir):
    events = _events(spark, sf_dir)
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


# --- sessionization (gap-based), the classic stateful-streaming op,
#     expressed with lag + cumulative sum so it is oracle-checkable ---

SESSIONS_SQL = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT)         AS n_events
FROM flagged
GROUP BY user_id
ORDER BY user_id
"""


# --- JSON functions over the props payload column ---

JSON_PROPS_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)                              AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
WHERE props IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


@register("event_props_json", JSON_PROPS_SQL, "F: JSON extraction + agg over semi-structured payload")
def q_event_props_json(spark, sf_dir):
    events = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.filter(F.col("props").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# --- session_window built-in (the native session aggregation; oracle =
#     the same lag/cumsum CTE that certifies user_sessionization) ---

SESSION_WINDOW_SQL = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
), sess AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start
"""


@register("session_window_agg", SESSION_WINDOW_SQL, "streaming: F.session_window gap sessions")
def q_session_window_agg(spark, sf_dir):
    events = _events(spark, sf_dir)
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            # session_window's end is exclusive (last_ts + gap); the
            # oracle reports the last event ts -> subtract the gap
            (F.col("w.end") - F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


# --- sketch aggregations (the 100 TB substitutes for exact distinct /
#     exact percentile: mergeable sketches, O(k) memory per group,
#     streaming-legal).  The registered distinct-count queries run the
#     DETERMINISTIC md5-register HLL since round 10 (operators/
#     sketches.py `md5_hll_registers`/`md5_hll_estimate`) and are
#     oracle-exact, the same upgrade the quantile sketch got in round 9
#     (KLL -> bottom-k) — the seeded built-ins (approx_count_distinct,
#     hll_sketch_agg) remain pytest-pinned alongside
#     (tests/test_sketches.py `test_builtin_hll_paths_still_pinned`),
#     and only the seeded ANN queries stay rows-only. ---

from ..operators.sketches import HLL_ALPHA_SCALED, HLL_LC_TABLE, HLL_M

# shared-constant oracle SQL (round-8 ADVICE convention): register
# derivation, scaled harmonic sum, and the Python-precomputed
# linear-counting table are f-string-inlined from the SAME constants
# the Spark operator uses — editing one side cannot desync the other
_HLL_LC_SQL = "[" + ", ".join(repr(x) for x in HLL_LC_TABLE) + "]"
_HLL_EST_SQL = f"""
       CAST(FLOOR(CASE WHEN {HLL_M} - nreg > 0
                        AND {HLL_ALPHA_SCALED!r} / sd <= {2.5 * HLL_M!r}
                       THEN ({_HLL_LC_SQL})[{HLL_M} - nreg]
                       ELSE {HLL_ALPHA_SCALED!r} / sd END) AS BIGINT)
"""


def _hll_regs_sql(group_expr: str, group_name: str) -> str:
    """Register-table CTE chain over events, grouped by ``group_expr``:
    yields ``regs(group, reg, rho)`` — the SQL twin of
    ``md5_hll_registers`` (10-bit md5 register, leading-zero rank from
    string ops, max per register)."""
    return f"""
ev AS (
  SELECT {group_expr} AS {group_name}, md5(CAST(user_id AS VARCHAR)) AS h
  FROM events WHERE user_id IS NOT NULL
), b AS (
  SELECT {group_name},
         CAST(('0x' || substr(h, 1, 3)) AS INTEGER) % {HLL_M} AS reg,
         substr(h, 4, 15) AS h15
  FROM ev
), z AS (
  SELECT {group_name}, reg, h15,
         length(regexp_extract(h15, '^0*')) AS z
  FROM b
), rho AS (
  SELECT {group_name}, reg,
         CASE WHEN z = 15 THEN 61
              ELSE z * 4 + CASE substr(h15, z + 1, 1)
                     WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                     WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                     WHEN '7' THEN 1 ELSE 0 END + 1 END AS rho
  FROM z
), regs AS (
  SELECT {group_name}, reg, MAX(rho) AS rho FROM rho GROUP BY {group_name}, reg
)"""


APPROX_DAILY_USERS_SQL = f"""
WITH {_hll_regs_sql("CAST(ts AS DATE)", "event_date")},
agg AS (
  SELECT event_date,
         SUM(CAST((CAST(1 AS BIGINT) << (61 - rho)) AS HUGEINT)) AS s,
         COUNT(*) AS nreg
  FROM regs GROUP BY event_date
), est AS (
  SELECT event_date, nreg,
         CAST(s + CAST({HLL_M} - nreg AS HUGEINT)
                    * CAST({1 << 61} AS HUGEINT) AS DOUBLE) AS sd
  FROM agg
)
SELECT event_date, {_HLL_EST_SQL} AS approx_users
FROM est ORDER BY event_date
"""


@register(
    "approx_daily_users",
    APPROX_DAILY_USERS_SQL,
    "sketch: deterministic md5-register HLL (oracle-exact since r10)",
)
def q_approx_daily_users(spark, sf_dir):
    from ..operators import sketches

    events = _events(spark, sf_dir)
    regs = sketches.md5_hll_registers(
        events.withColumn("event_date", F.to_date("ts")), "user_id", "event_date"
    )
    return sketches.md5_hll_estimate(regs, "event_date", "approx_users").orderBy(
        "event_date"
    )


# Deterministic mergeable quantile sketch (r8 verdict item 7a): the
# query was percentile_approx (KLL — seeded compaction, rows-only for
# the driver) through round 8; it is now the bottom-k-by-md5 uniform
# sample (operators/sketches.py `bottomk_sample_quantiles`), which has
# the same mergeable-sketch contract but DETERMINISTIC contents, so the
# oracle replays every output bit and the non-replayable set shrinks to
# the genuinely seeded cases (LSH/IVF ANN, HLL).
VALUE_QUANTILE_SKETCH_SQL = """
WITH ev AS (
  SELECT event_type, value AS v, event_id,
         md5(CAST(event_id AS VARCHAR)) AS mk
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY mk, event_id, v) AS rk
  FROM ev
), s AS (
  SELECT event_type, v FROM r WHERE rk <= 512
), g AS (
  SELECT event_type, list(v ORDER BY v) AS vals,
         CAST(COUNT(*) AS BIGINT) AS n_sample
  FROM s GROUP BY event_type
)
SELECT event_type, n_sample,
       vals[(50 * n_sample + 99) // 100] AS p50_est,
       vals[(95 * n_sample + 99) // 100] AS p95_est,
       vals[(99 * n_sample + 99) // 100] AS p99_est
FROM g ORDER BY event_type
"""


@register(
    "value_quantile_sketch",
    VALUE_QUANTILE_SKETCH_SQL,
    "sketch: bottom-k-by-md5 mergeable quantile sample (oracle-exact)",
)
def q_value_quantile_sketch(spark, sf_dir):
    from ..operators import sketches

    events = _events(spark, sf_dir)
    return sketches.bottomk_sample_quantiles(
        events, "value", "event_type", key_col="event_id", k=512
    )


@register("user_sessionization", SESSIONS_SQL, "streaming: session windows (batch twin)")
def q_user_sessionization(spark, sf_dir):
    events = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    # µs precision to match DuckDB's timestamp subtraction exactly
    # (cast-to-long would truncate sub-second gaps at the boundary)
    new_session = (
        F.when(
            lag_ts.isNull()
            | (F.unix_micros(F.col("ts")) - F.unix_micros(lag_ts) > 30 * 60 * 1_000_000),
            1,
        ).otherwise(0)
    )
    return (
        events.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


# --- conversion funnel (ordered-stage analytics) ---
# Per user: earliest ts of each stage; a stage converts only if it
# happens strictly after the previous stage's first occurrence.  One
# shuffle (groupBy user) computes all stages via conditional min —
# no joins, no self-union, scales linearly in events.

FUNNEL_SQL = """
WITH stages AS (
    SELECT user_id,
           MIN(ts) FILTER (WHERE event_type = 'view')     AS t_view,
           MIN(ts) FILTER (WHERE event_type = 'click')    AS t_click,
           MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
    FROM events GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT)                             AS n_users,
       CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT) AS n_viewed,
       CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view) AS BIGINT)
                                                            AS n_clicked_after_view,
       CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                               AND t_purchase > t_click) AS BIGINT)
                                                            AS n_purchased_after_click
FROM stages
"""


@register(
    "conversion_funnel",
    FUNNEL_SQL,
    "event analytics: ordered-stage conversion funnel via conditional MIN",
)
def q_conversion_funnel(spark, sf_dir):
    events = _events(spark, sf_dir)
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stages = events.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(viewed, 1)).alias("n_viewed"),
        F.count(F.when(clicked, 1)).alias("n_clicked_after_view"),
        F.count(F.when(purchased, 1)).alias("n_purchased_after_click"),
    )


# --- cohort retention (first-seen day x activity-day matrix) ---
# Two shuffles: per-user first day, then (cohort, day-offset) counts;
# the user-grain frame is reused for both via a single groupBy chain.

COHORT_SQL = """
WITH firsts AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT e.user_id, f.cohort_day,
           CAST(ts AS DATE) - f.cohort_day AS day_offset
    FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_day,
       CAST(day_offset AS INT)   AS day_offset,
       CAST(COUNT(*) AS BIGINT)  AS n_active_users
FROM activity
WHERE day_offset <= 7
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register(
    "cohort_retention",
    COHORT_SQL,
    "event analytics: cohort retention matrix (first-seen day x offset)",
)
def q_cohort_retention(spark, sf_dir):
    events = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    firsts = events.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", F.col("cohort_day")).alias("day_offset"),
        )
        .dropDuplicates(["user_id", "cohort_day", "day_offset"])
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", F.col("day_offset").cast("int").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_day", "day_offset")
    )


# --- per-day event-type map (nested collect -> canonical string) ---
# Two-level aggregation building a map-shaped result; emitted as a
# sorted "type:count" string so value comparison is engine-agnostic.

DAILY_TYPE_MAP_SQL = """
WITH per AS (
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
)
SELECT day,
       string_agg(event_type || ':' || n, '|' ORDER BY event_type) AS type_counts,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM per GROUP BY day ORDER BY day
"""


@register(
    "daily_event_type_map",
    DAILY_TYPE_MAP_SQL,
    "agg: two-level rollup into a map-shaped canonical string",
)
def q_daily_event_type_map(spark, sf_dir):
    events = _events(spark, sf_dir)
    per = (
        events.withColumn("day", F.to_date("ts"))
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per.groupBy("day")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.concat_ws(":", "event_type", "n"))), "|"
            ).alias("type_counts"),
            F.sum("n").cast("long").alias("n_events"),
        )
        .orderBy("day")
    )


# Re-aggregatable distinct counting: persist one tiny register table
# per day, answer ANY date-range distinct query later by max-merging
# registers — at 100 TB the raw events are scanned once ever, and every
# rollup reads KBs of register state instead.  (approx_count_distinct
# cannot do this: its partial state is not exposed.)  The register
# sketch is the deterministic md5-register HLL, so the day -> week
# rollup — including the merge — is oracle-exact: the oracle computes
# week-grain registers directly, and max-merge associativity makes the
# two IDENTICAL (the mergeability contract, also pinned in
# tests/test_sketches.py along with the Datasketches-HLL built-in
# twin of this rollup).
# The register sketch's whole point: daily register tables are
# persisted ONCE, and ANY later date-range distinct query merges them
# without touching raw events again.  This query certifies that claim
# end-to-end as an oracle-exact driver entry: max-merge the FIRST TEN
# DAYS' daily registers (range bound = a 1-row min-date scalar, the
# idle_rich_customers broadcast shape) into one estimate.  The oracle
# builds day-grain registers the same way and merges the same range —
# max associativity makes a direct range-grain build identical, which
# is exactly the re-aggregation property under test.
RANGE_USERS_SQL = f"""
WITH {_hll_regs_sql("CAST(ts AS DATE)", "event_date")},
cut AS (
  SELECT MIN(event_date) + INTERVAL 10 DAY AS cut FROM regs
), merged AS (
  SELECT 'first10' AS span, reg, MAX(rho) AS rho
  FROM regs, cut WHERE regs.event_date < cut.cut
  GROUP BY reg
), agg AS (
  SELECT span,
         SUM(CAST((CAST(1 AS BIGINT) << (61 - rho)) AS HUGEINT)) AS s,
         COUNT(*) AS nreg
  FROM merged GROUP BY span
), est AS (
  SELECT span, nreg,
         CAST(s + CAST({HLL_M} - nreg AS HUGEINT)
                    * CAST({1 << 61} AS HUGEINT) AS DOUBLE) AS sd
  FROM agg
), nd AS (
  SELECT CAST(COUNT(DISTINCT event_date) AS BIGINT) AS n_days
  FROM regs, cut WHERE regs.event_date < cut.cut
)
SELECT est.span, {_HLL_EST_SQL} AS approx_users, nd.n_days
FROM est, nd ORDER BY est.span
"""


@register(
    "range_users_from_daily_registers",
    RANGE_USERS_SQL,
    "sketch: arbitrary date-range rollup from persisted daily md5-HLL "
    "registers (oracle-exact re-aggregation)",
)
def q_range_users_from_daily_registers(spark, sf_dir):
    from ..operators import sketches

    events = _events(spark, sf_dir)
    # the persisted artifact: daily register tables — raw events are
    # never touched again below this line
    daily = sketches.md5_hll_registers(
        events.withColumn("event_date", F.to_date("ts")), "user_id", "event_date"
    )
    cut = daily.agg(F.date_add(F.min("event_date"), 10).alias("cut"))
    rng = daily.join(F.broadcast(cut), daily.event_date < F.col("cut"))
    merged = rng.groupBy(F.lit("first10").alias("span"), "reg").agg(
        F.max("rho").alias("rho")
    )
    est = sketches.md5_hll_estimate(merged, "span", "approx_users")
    n_days = rng.groupBy(F.lit("first10").alias("span")).agg(
        F.count_distinct("event_date").alias("n_days")
    )
    return est.join(n_days, "span").orderBy("span")


WEEKLY_USERS_SQL = f"""
WITH {_hll_regs_sql("CAST(date_trunc('week', ts) AS DATE)", "week_start")},
agg AS (
  SELECT week_start,
         SUM(CAST((CAST(1 AS BIGINT) << (61 - rho)) AS HUGEINT)) AS s,
         COUNT(*) AS nreg
  FROM regs GROUP BY week_start
), est AS (
  SELECT week_start, nreg,
         CAST(s + CAST({HLL_M} - nreg AS HUGEINT)
                    * CAST({1 << 61} AS HUGEINT) AS DOUBLE) AS sd
  FROM agg
), nd AS (
  -- same NULL-key exclusion as the register CTE: n_days counts days
  -- with >= 1 COUNTED user, matching the Spark side's count over the
  -- (NULL-filtered) daily register table — without the filter a day
  -- whose every event has a NULL user_id would diverge the two sides
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT est.week_start, {_HLL_EST_SQL} AS approx_users, nd.n_days
FROM est JOIN nd ON nd.week_start = est.week_start
ORDER BY est.week_start
"""


@register(
    "weekly_users_from_daily_sketches",
    WEEKLY_USERS_SQL,
    "sketch: re-aggregatable md5-register HLL (daily registers merged "
    "to weekly; oracle-exact since r10)",
)
def q_weekly_users_from_daily_sketches(spark, sf_dir):
    from ..operators import sketches

    events = _events(spark, sf_dir)
    # daily register tables: what a real deployment would PERSIST —
    # the weekly rollup below never touches raw events again
    daily = sketches.md5_hll_registers(
        events.withColumn("event_date", F.to_date("ts")), "user_id", "event_date"
    )
    # week key = the week's Monday via date_trunc, NOT calendar-year +
    # ISO-week-number: pairing year() with weekofyear() mis-buckets
    # year-boundary dates (2024-12-30 has ISO week 1 and would land in
    # (2024, 1) next to early January).  One date key is unambiguous.
    wk = F.date_trunc("week", "event_date").cast("date").alias("week_start")
    weekly_regs = daily.groupBy(wk, "reg").agg(F.max("rho").alias("rho"))
    est = sketches.md5_hll_estimate(weekly_regs, "week_start", "approx_users")
    n_days = daily.groupBy(wk).agg(
        F.count_distinct("event_date").alias("n_days")
    )
    return est.join(n_days, "week_start").orderBy("week_start")


# --- mergeable histogram quantiles (operators/sketches.py): the
# fixed-width complement to the bottom-k quantile sample — day
# histograms merge to any range by bucket-count sum, estimates are
# bucket lower edges with error <= one bucket width; oracle-EXACT.

HIST_QUANTILES_SQL = """
WITH ev AS (
  SELECT event_type, value AS v FROM events WHERE value IS NOT NULL
), b AS (
  SELECT MIN(v) AS lo, MAX(v) AS hi FROM ev
), h AS (
  SELECT event_type,
         CAST(LEAST(GREATEST(CAST(floor((ev.v - b.lo)
                / ((b.hi - b.lo) / CAST(128 AS DOUBLE))) AS BIGINT), 0), 127)
              AS INTEGER) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ev, b GROUP BY event_type, bucket
), n AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY event_type
), c AS (
  SELECT event_type, bucket,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
  FROM h
), sel AS (
  SELECT c.event_type,
         MIN(CASE WHEN c.cum >= (50 * n.n + 99) // 100 THEN c.bucket END) AS b50,
         MIN(CASE WHEN c.cum >= (95 * n.n + 99) // 100 THEN c.bucket END) AS b95,
         MIN(CASE WHEN c.cum >= (99 * n.n + 99) // 100 THEN c.bucket END) AS b99
  FROM c JOIN n ON n.event_type = c.event_type GROUP BY c.event_type
)
SELECT s.event_type, n.n,
       b.lo + s.b50 * ((b.hi - b.lo) / CAST(128 AS DOUBLE)) AS p50_est,
       b.lo + s.b95 * ((b.hi - b.lo) / CAST(128 AS DOUBLE)) AS p95_est,
       b.lo + s.b99 * ((b.hi - b.lo) / CAST(128 AS DOUBLE)) AS p99_est
FROM sel s JOIN n ON n.event_type = s.event_type, b
ORDER BY s.event_type
"""


@register(
    "value_histogram_quantiles",
    HIST_QUANTILES_SQL,
    "sketch: mergeable fixed-width histogram quantiles (oracle-exact)",
)
def q_value_histogram_quantiles(spark, sf_dir):
    from ..operators import sketches

    events = _events(spark, sf_dir)
    return sketches.histogram_quantiles(
        events, "value", "event_type", buckets=128, percents=(50, 95, 99)
    )


# --- integer-exact volume anomaly flags (observability) ---------------
# Daily event-volume spikes/dips per event type, flagged at 2 sigma
# WITHOUT any floating-point sigma: |x - mu| > 2*sigma is equivalent to
# (n*x - S)^2 > 4*(n*Q - S^2) for integer day-counts (S = sum, Q = sum
# of squares over the type's n days) — all-integer arithmetic, so the
# flag hashes identically in any engine.  The squares/products run in
# 38-digit exact decimals (Spark DECIMAL(38,0), DuckDB HUGEINT): at
# event-stream scale S alone can exceed 3e9, whose square overflows
# int64 — int64 math here would silently wrap in Spark while DuckDB
# errors, diverging the engines.  Only the comparison is promoted; the
# emitted columns stay BIGINT (dev_num = n*x - S is bounded by
# n_days * max daily count — promote it too if you run multi-century
# windows).  Two hash aggregates; the per-type stats relation is
# |types|-rows and broadcast back.

VOLUME_ANOMALY_SQL = """
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
), stats AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n_events) AS BIGINT) AS s,
           CAST(SUM(n_events * n_events) AS BIGINT) AS q
    FROM daily GROUP BY 1
)
SELECT d.event_type, d.day, d.n_events, st.n_days,
       CAST(st.n_days * d.n_events - st.s AS BIGINT) AS dev_num,
       CAST(CASE WHEN (CAST(st.n_days AS HUGEINT) * d.n_events - st.s)
                      * (CAST(st.n_days AS HUGEINT) * d.n_events - st.s)
                    > 4 * (CAST(st.n_days AS HUGEINT) * st.q
                           - CAST(st.s AS HUGEINT) * st.s)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM daily d JOIN stats st USING (event_type)
ORDER BY d.event_type, d.day
"""


@register(
    "event_volume_anomalies",
    VOLUME_ANOMALY_SQL,
    "event analytics: integer-exact 2-sigma volume anomaly flags",
)
def q_event_volume_anomalies(spark, sf_dir):
    daily = (
        _events(spark, sf_dir)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n_events").cast("long").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("q"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 — exact 38-digit ints
    dev = F.col("n_days") * F.col("n_events") - F.col("s")
    dev_d = dec(F.col("n_days")) * dec(F.col("n_events")) - dec(F.col("s"))
    var4_d = 4 * (
        dec(F.col("n_days")) * dec(F.col("q")) - dec(F.col("s")) * dec(F.col("s"))
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "n_events",
            "n_days",
            dev.cast("long").alias("dev_num"),
            (dev_d * dev_d > var4_d).cast("long").alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )
