"""Event-time operators over `events` (batch forms; streaming twins live in
`streaming/`). The reference has no streaming (SURVEY.md §2.10) — this is
the engine surface the north star mandates.

Time bucketing uses integer epoch-microsecond arithmetic
(unix_micros/epoch_us + make/timestamp_micros) — exact in both engines and
immune to session-timezone drift. Event `value` sums go through DECIMAL
(order-independent; see functions.numeric).

PRECONDITION (non-negative epochs): Spark's `div` truncates toward zero
while DuckDB's `//` floors, so every epoch-microsecond bucketing here
(tumbling/sliding/gapfill — and catalog.py's ts div 1000 nanos conversion)
agrees between engines only for timestamps >= 1970-01-01. The corpus is
1995+; pre-1970 data would need pmod-adjusted floor-division bucketing
(e.g. (x - pmod(x, N)) / N) on the Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

HOUR_US = 3_600_000_000
HALF_HOUR_US = 1_800_000_000
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min

# precision 18 keeps Spark's long-backed Decimal fast path for the
# per-value cast (precision>18 boxes to BigDecimal; measured ~1.5x slower
# on wide aggregations — see operators/tpch.py DEC). The SUM accumulator
# auto-widens, so sums stay exact and bit-identical to the oracle's
# DECIMAL(28,10) per-value form.
#
# DATA-CONTRACT INVARIANT: |value| < 1e8 (and, for seasonal_decompose's
# value*value term, |value| < 1e4). DECIMAL(18,10) holds 8 integer
# digits. Under Spark 4's ANSI default (this repo never disables it) an
# out-of-range value makes the cast THROW — loud, and consistent with
# the DuckDB oracle erroring; only a legacy spark.sql.ansi.enabled=false
# deployment would degrade to the silent NULL-drop wrong-answer mode.
# tests/test_eventsops_domain.py pins BOTH halves: every sf rung and
# up-scaled rung stays in-domain with >=4 orders of headroom (|value| <
# 1e3, preserved verbatim by scaleup.py), and the overflow path raises
# rather than dropping. A deployment with wider values must widen
# VAL_DEC (and every _vsum_sql twin) in lockstep — see
# functions/numeric.py for the same contract on money.
VAL_DEC = "decimal(18,10)"


# r5 conversion-exact form (see functions/numeric.py money_sum): sum
# exact integer 10^-10-units so the decimal->double conversion is a
# single correctly-rounded op in both engines at any group size.
def _vsum(col: str, alias: str):
    units = (F.col(col).cast(VAL_DEC) * F.lit(10_000_000_000).cast("decimal(12,0)")).cast(
        "decimal(38,0)"
    )
    return (F.sum(units).cast("double") / F.lit(1e10)).alias(alias)


def _vsum_sql(expr: str, alias: str) -> str:
    return (
        f"(CAST(SUM(CAST(CAST({expr} AS DECIMAL(18,10)) * 10000000000 AS DECIMAL(38,0))) AS DOUBLE)"
        f" / 10000000000.0) AS {alias}"
    )


# ---------------------------------------------------------------------------
# Tumbling window aggregation (1 hour).
# ---------------------------------------------------------------------------

def tumbling_hourly(events: DataFrame) -> DataFrame:
    bucket = F.expr(f"timestamp_micros((unix_micros(ts) div {HOUR_US}) * {HOUR_US})")
    return (
        events.groupBy(bucket.alias("window_start"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            _vsum("value", "total_value"),
        )
    )


def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_hourly(load_table(spark, sf_dir, "events"))


SQL_TUMBLING_HOURLY = f"""
SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_vsum_sql('value', 'total_value')}
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sliding window aggregation (1 hour window, 30 min slide): every event
# belongs to exactly 2 windows → explode the two window starts, then a plain
# hash agg (this is precisely how Spark's window() plans it).
# ---------------------------------------------------------------------------

def sliding_hourly(events: DataFrame) -> DataFrame:
    b0 = F.expr(f"timestamp_micros((unix_micros(ts) div {HALF_HOUR_US}) * {HALF_HOUR_US})")
    b1 = F.expr(
        f"timestamp_micros((unix_micros(ts) div {HALF_HOUR_US}) * {HALF_HOUR_US} - {HALF_HOUR_US})"
    )
    return (
        events.select(F.explode(F.array(b0, b1)).alias("window_start"), "value")
        .groupBy("window_start")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            _vsum("value", "total_value"),
        )
    )


def q_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_hourly(load_table(spark, sf_dir, "events"))


SQL_SLIDING_HOURLY = f"""
SELECT window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_vsum_sql('value', 'total_value')}
FROM (
  SELECT unnest([
           make_timestamp((epoch_us(ts) // {HALF_HOUR_US}) * {HALF_HOUR_US}),
           make_timestamp((epoch_us(ts) // {HALF_HOUR_US}) * {HALF_HOUR_US} - {HALF_HOUR_US})
         ]) AS window_start,
         value
  FROM events
) w
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Session windows (gaps-and-islands): new session when the per-user gap
# exceeds 30 min; session id = running sum of boundaries. The batch twin of
# session_window()/applyInPandasWithState.
# ---------------------------------------------------------------------------

def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_order))
    boundary = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_seq", F.sum(boundary).over(w_run).cast("long"))


def session_stats(events: DataFrame) -> DataFrame:
    s = sessionize(events)
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        _vsum("value", "total_value"),
    )


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_stats(load_table(spark, sf_dir, "events"))


SQL_SESSION_STATS = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS boundary
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       {_vsum_sql('value', 'total_value')}
FROM sessions
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# JSON-ish property extraction (props carries {"k": <int>}) + aggregation.
# regexp-based so the oracle needs no JSON extension.
# ---------------------------------------------------------------------------

def props_k_stats(events: DataFrame) -> DataFrame:
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("k").cast("long")).cast("long").alias("sum_k"),
            F.max("k").cast("int").alias("max_k"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


def q_props_k_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return props_k_stats(load_table(spark, sf_dir, "events"))


SQL_PROPS_K_STATS = """
SELECT event_type,
       CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT)) AS INT) AS max_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Top-5 users by total event value (O2-style top-k over a stream table).
# ---------------------------------------------------------------------------

def q_top5_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(_vsum("value", "total_value"), F.count(F.lit(1)).cast("long").alias("n_events"))
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(5)
    )


SQL_TOP5_USERS_BY_VALUE = f"""
SELECT user_id, {_vsum_sql('value', 'total_value')},
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1
ORDER BY total_value DESC, user_id ASC
LIMIT 5
"""


# ---------------------------------------------------------------------------
# Gap-filled hourly series: generate the full hour spine over the observed
# range (sequence + explode — no driver loop), left-join the hourly counts,
# fill empties with 0. The time-series completion every dashboard needs;
# spine generation is a tiny dimension broadcast against the agg.
# ---------------------------------------------------------------------------

def hourly_gapfill(events: DataFrame) -> DataFrame:
    bounds = events.agg(
        F.min(F.expr(f"unix_micros(ts) div {HOUR_US}")).alias("h0"),
        F.max(F.expr(f"unix_micros(ts) div {HOUR_US}")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hour_idx")
    ).select(F.expr(f"timestamp_micros(hour_idx * {HOUR_US})").alias("window_start"))
    counts = events.groupBy(
        F.expr(f"timestamp_micros((unix_micros(ts) div {HOUR_US}) * {HOUR_US})").alias("ws")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.join(counts, spine.window_start == counts.ws, "left")
        .select(
            "window_start",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


def q_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_gapfill(load_table(spark, sf_dir, "events"))


SQL_HOURLY_GAPFILL = f"""
WITH bounds AS (
  SELECT MIN(epoch_us(ts) // {HOUR_US}) AS h0, MAX(epoch_us(ts) // {HOUR_US}) AS h1 FROM events
),
spine AS (
  SELECT make_timestamp(unnest(range(h0, h1 + 1)) * {HOUR_US}) AS window_start FROM bounds
),
counts AS (
  SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS ws, count(*) AS n
  FROM events GROUP BY 1
)
SELECT s.window_start, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM spine s LEFT JOIN counts c ON s.window_start = c.ws
"""


# ---------------------------------------------------------------------------
# Value histogram: fixed-width buckets via integer floor division —
# engine-portable (no width_bucket dialect differences), single hash agg.
# ---------------------------------------------------------------------------

HIST_WIDTH = 50.0


def value_histogram(events: DataFrame) -> DataFrame:
    bucket = F.floor(F.col("value") / HIST_WIDTH).cast("long")
    return (
        events.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * HIST_WIDTH).alias("lo"),
            ((F.col("bucket") + 1) * HIST_WIDTH).alias("hi"),
            "n",
        )
    )


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(load_table(spark, sf_dir, "events"))


SQL_VALUE_HISTOGRAM = f"""
SELECT CAST(floor(value / {HIST_WIDTH}) AS BIGINT) AS bucket,
       CAST(floor(value / {HIST_WIDTH}) AS BIGINT) * {HIST_WIDTH} AS lo,
       (CAST(floor(value / {HIST_WIDTH}) AS BIGINT) + 1) * {HIST_WIDTH} AS hi,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Funnel analysis: users progressing signup -> first view after signup ->
# first purchase after that view. Each stage is a groupBy-min constrained by
# the previous stage's timestamp — joins stay on user_id (one shuffle key
# throughout; at scale all three stages co-partition).
# ---------------------------------------------------------------------------

def funnel_signup_view_purchase(events: DataFrame) -> DataFrame:
    s1 = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    s2 = (
        events.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id", "t_signup")
        .agg(F.min("ts").alias("t_view"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "t_signup", "t_view")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return s3.select(
        "user_id",
        "t_signup",
        "t_view",
        "t_purchase",
        (F.unix_micros("t_purchase") - F.unix_micros("t_signup")).cast("long").alias("funnel_us"),
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_signup_view_purchase(load_table(spark, sf_dir, "events"))


SQL_FUNNEL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t_signup FROM events WHERE event_type = 'signup' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, s1.t_signup, MIN(e.ts) AS t_view
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t_signup
  WHERE e.event_type = 'view'
  GROUP BY 1, 2
),
s3 AS (
  SELECT e.user_id, s2.t_signup, s2.t_view, MIN(e.ts) AS t_purchase
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t_view
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2, 3
)
SELECT user_id, t_signup, t_view, t_purchase,
       CAST(epoch_us(t_purchase) - epoch_us(t_signup) AS BIGINT) AS funnel_us
FROM s3
"""


QUERIES = {
    "tumbling_hourly": q_tumbling_hourly,
    "hourly_gapfill": q_hourly_gapfill,
    "value_histogram": q_value_histogram,
    "funnel_signup_view_purchase": q_funnel,
    "sliding_hourly": q_sliding_hourly,
    "session_stats": q_session_stats,
    "props_k_stats": q_props_k_stats,
    "top5_users_by_value": q_top5_users_by_value,
}

ORACLES = {
    "tumbling_hourly": SQL_TUMBLING_HOURLY,
    "hourly_gapfill": SQL_HOURLY_GAPFILL,
    "value_histogram": SQL_VALUE_HISTOGRAM,
    "funnel_signup_view_purchase": SQL_FUNNEL,
    "sliding_hourly": SQL_SLIDING_HOURLY,
    "session_stats": SQL_SESSION_STATS,
    "props_k_stats": SQL_PROPS_K_STATS,
    "top5_users_by_value": SQL_TOP5_USERS_BY_VALUE,
}


# ---------------------------------------------------------------------------
# Rolling 7-day active users (the DAU/WAU shape): for each day in the
# corpus, distinct users active in the trailing 7-day window. Shrink first
# (distinct user-days), then range-join against the tiny day spine —
# broadcast nested-loop on a spine of |days| rows (365/yr at any data
# scale), output |user-days| x 7 before the final distinct agg. Day kept as
# midnight TIMESTAMP (pandas dtype parity with the DuckDB oracle).
# ---------------------------------------------------------------------------

def rolling_7d_actives(events: DataFrame) -> DataFrame:
    user_days = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    spine = user_days.select("day").distinct()
    u, s = user_days.alias("u"), spine.alias("s")
    cond = (F.col("u.day") <= F.col("s.day")) & (
        F.col("u.day") >= F.col("s.day") - F.expr("INTERVAL 6 DAYS")
    )
    return (
        u.join(F.broadcast(s), cond)
        .groupBy(F.col("s.day").alias("day"))
        .agg(
            F.countDistinct(
                F.when(F.col("u.day") == F.col("s.day"), F.col("u.user_id"))
            ).cast("long").alias("active_users_1d"),
            F.countDistinct("u.user_id").cast("long").alias("active_users_7d"),
        )
    )


def q_rolling_7d_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_7d_actives(load_table(spark, sf_dir, "events"))


SQL_ROLLING_7D_ACTIVES = """
WITH user_days AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), spine AS (
  SELECT DISTINCT day FROM user_days
)
SELECT s.day,
       CAST(count(DISTINCT CASE WHEN u.day = s.day THEN u.user_id END)
            AS BIGINT) AS active_users_1d,
       CAST(count(DISTINCT u.user_id) AS BIGINT) AS active_users_7d
FROM spine s
JOIN user_days u
  ON u.day <= s.day AND u.day >= s.day - INTERVAL 6 DAY
GROUP BY s.day
"""


# ---------------------------------------------------------------------------
# Time-weighted average value per user (TWAP): each event's value holds
# until the user's next event; weight by the holding duration. Everything
# stays INTEGER (value in cents x duration in micros; sums exact and
# order-independent — cents*dur <= 3.3e4 * 2.6e12 and per-user dur
# telescopes to the corpus span, so no bigint overflow) until two final
# IEEE double divisions, which are bit-identical across engines. A
# decimal->double cast here would NOT be portable (DuckDB double-rounds
# int128-scaled decimals; Spark rounds once via BigDecimal).
# ---------------------------------------------------------------------------

def twap_per_user(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    held = events.select(
        "user_id",
        (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("cents"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return held.groupBy("user_id").agg(
        (
            F.sum(F.col("cents") * F.col("dur_us")).cast("double")
            / F.sum("dur_us").cast("double")
            / F.lit(100.0)
        ).alias("twap_value"),
        F.sum("dur_us").cast("long").alias("held_us"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    )


def q_twap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    return twap_per_user(load_table(spark, sf_dir, "events"))


SQL_TWAP_PER_USER = """
WITH held AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dur_us
  FROM events
)
SELECT user_id,
       CAST(sum(cents * dur_us) AS DOUBLE)
         / CAST(sum(dur_us) AS DOUBLE) / 100.0 AS twap_value,
       CAST(sum(dur_us) AS BIGINT) AS held_us,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM held
WHERE dur_us IS NOT NULL
GROUP BY user_id
"""

QUERIES["rolling_7d_actives"] = q_rolling_7d_actives
QUERIES["twap_per_user"] = q_twap_per_user
ORACLES["rolling_7d_actives"] = SQL_ROLLING_7D_ACTIVES
ORACLES["twap_per_user"] = SQL_TWAP_PER_USER


# ---------------------------------------------------------------------------
# Linear-interpolation gapfill: hourly mean value with missing hours
# filled by interpolating between the nearest observed hours (time-series
# resample + interpolate). Means stay integer (cents) until one double
# division; the interpolation formula is the identical IEEE expression on
# both engines, rounded to 6dp. The anchor-carrying windows are global
# (no partition) but run over the HOUR SPINE, whose size is the calendar
# (720 rows/month) at any data scale — not the event stream.
# ---------------------------------------------------------------------------

def interpolate_hourly(events: DataFrame) -> DataFrame:
    bounds = events.agg(
        F.min(F.expr(f"unix_micros(ts) div {HOUR_US}")).alias("h0"),
        F.max(F.expr(f"unix_micros(ts) div {HOUR_US}")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hour_idx")
    )
    means = events.groupBy(
        F.expr(f"unix_micros(ts) div {HOUR_US}").alias("hour_idx")
    ).agg(
        (
            F.sum((F.col("value").cast("decimal(12,2)") * 100).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(100.0)
        ).alias("mean_v"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    joined = spine.join(means, "hour_idx", "left")
    w_back = Window.orderBy("hour_idx").rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = Window.orderBy("hour_idx").rowsBetween(0, Window.unboundedFollowing)
    obs_h = F.when(F.col("mean_v").isNotNull(), F.col("hour_idx"))
    anchored = joined.select(
        "hour_idx",
        "mean_v",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("mean_v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(w_back).alias("ph"),
        F.first("mean_v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(w_fwd).alias("nh"),
    )
    interp = (
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * ((F.col("hour_idx") - F.col("ph")).cast("double")
           / (F.col("nh") - F.col("ph")).cast("double"))
    )
    from ..functions.numeric import round_half_up

    value = F.when(F.col("mean_v").isNotNull(), F.col("mean_v")).otherwise(
        F.when(F.col("ph").isNull(), F.col("nv"))
        .when(F.col("nh").isNull(), F.col("pv"))
        .otherwise(interp)
    )
    return anchored.select(
        F.expr(f"timestamp_micros(hour_idx * {HOUR_US})").alias("window_start"),
        "n_events",
        round_half_up(value, 6).alias("value_avg"),
        F.col("mean_v").isNull().alias("is_interpolated"),
    )


def q_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return interpolate_hourly(load_table(spark, sf_dir, "events"))


SQL_INTERPOLATE_HOURLY = f"""
WITH bounds AS (
  SELECT MIN(epoch_us(ts) // {HOUR_US}) AS h0, MAX(epoch_us(ts) // {HOUR_US}) AS h1 FROM events
),
spine AS (
  SELECT unnest(range(h0, h1 + 1)) AS hour_idx FROM bounds
),
means AS (
  SELECT epoch_us(ts) // {HOUR_US} AS hour_idx,
         CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) / 100.0 AS mean_v,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
anchored AS (
  SELECT s.hour_idx, m.mean_v,
         COALESCE(m.n_events, 0) AS n_events,
         last_value(m.mean_v IGNORE NULLS) OVER wb AS pv,
         last_value(CASE WHEN m.mean_v IS NOT NULL THEN s.hour_idx END IGNORE NULLS) OVER wb AS ph,
         first_value(m.mean_v IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN m.mean_v IS NOT NULL THEN s.hour_idx END IGNORE NULLS) OVER wf AS nh
  FROM spine s LEFT JOIN means m USING (hour_idx)
  WINDOW wb AS (ORDER BY s.hour_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (ORDER BY s.hour_idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT make_timestamp(hour_idx * {HOUR_US}) AS window_start,
       n_events,
       floor((CASE WHEN mean_v IS NOT NULL THEN mean_v
                   WHEN ph IS NULL THEN nv
                   WHEN nh IS NULL THEN pv
                   ELSE pv + (nv - pv) * (CAST(hour_idx - ph AS DOUBLE)
                                          / CAST(nh - ph AS DOUBLE))
              END) * 1000000.0 + 0.5) / 1000000.0 AS value_avg,
       mean_v IS NULL AS is_interpolated
FROM anchored
"""

QUERIES["interpolate_hourly"] = q_interpolate_hourly
ORACLES["interpolate_hourly"] = SQL_INTERPOLATE_HOURLY


# ---------------------------------------------------------------------------
# Event-type transition matrix: per-user consecutive event-type bigrams
# with transition probabilities (the product-analytics Markov view). One
# lead() window partitioned by user + one hash agg; probabilities are a
# single rational division per row of the tiny output.
# ---------------------------------------------------------------------------

def event_transitions(events: DataFrame) -> DataFrame:
    from ..functions.numeric import round_half_up

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        round_half_up(
            F.col("n").cast("double") / F.sum("n").over(wt).cast("double"), 6
        ).alias("p"),
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_transitions(load_table(spark, sf_dir, "events"))


SQL_EVENT_TRANSITIONS = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       floor((CAST(n AS DOUBLE)
              / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS p
FROM counts
"""


# ---------------------------------------------------------------------------
# Activity heatmap: day-of-week x hour-of-day event counts (the usage-
# pattern dashboard tile). DOW is computed from epoch days (epoch day 0 =
# Thursday -> (days + 4) % 7 with Sunday=0) so both engines use the same
# integer arithmetic instead of their differing dayofweek conventions.
# ---------------------------------------------------------------------------

DAY_US = 86_400_000_000


def activity_heatmap(events: DataFrame) -> DataFrame:
    # pmod (not %): % takes the dividend's sign, so pre-1970 timestamps
    # would produce negative dow/hour cells; pmod keeps the 0..6 / 0..23
    # calendar domain for any epoch
    epoch_days = F.expr(f"unix_micros(ts) div {DAY_US}")
    dow = F.pmod(epoch_days + 4, F.lit(7)).cast("int")
    hour = F.pmod(F.expr(f"unix_micros(ts) div {HOUR_US}"), F.lit(24)).cast("int")
    return (
        events.select(dow.alias("dow"), hour.alias("hour"))
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return activity_heatmap(load_table(spark, sf_dir, "events"))


SQL_ACTIVITY_HEATMAP = f"""
SELECT CAST((((epoch_us(ts) // {DAY_US} + 4) % 7) + 7) % 7 AS INT) AS dow,
       CAST((((epoch_us(ts) // {HOUR_US}) % 24) + 24) % 24 AS INT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1, 2
"""

QUERIES["event_transitions"] = q_event_transitions
QUERIES["activity_heatmap"] = q_activity_heatmap
ORACLES["event_transitions"] = SQL_EVENT_TRANSITIONS
ORACLES["activity_heatmap"] = SQL_ACTIVITY_HEATMAP


# ---------------------------------------------------------------------------
# Hourly anomaly detection: z-score of each hour's event count against the
# trailing 24 observed hours (the ops/monitoring shape). The mean/variance
# come from integer window sums (exact, order-independent); the z formula
# is one fixed IEEE expression on both engines, rounded to 6dp. Sample
# variance over the trailing frame; hours with fewer than 2 trailing
# observations or zero variance emit z = NULL (flag false).
# ---------------------------------------------------------------------------

ANOMALY_TRAIL = 24  # trailing observed hours in the baseline
ANOMALY_Z = 3.0


def hourly_anomalies(events: DataFrame) -> DataFrame:
    from ..functions.numeric import round_half_up

    hourly = events.groupBy(
        F.expr(f"unix_micros(ts) div {HOUR_US}").alias("hour_idx")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.orderBy("hour_idx").rowsBetween(-ANOMALY_TRAIL, -1)
    stats = hourly.select(
        "hour_idx",
        "n",
        F.count("n").over(w).alias("m"),
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
    )
    m = F.col("m").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    mean = s1 / m
    var = (m * s2 - s1 * s1) / (m * (m - 1.0))
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    zcol = F.when((F.col("m") >= 2) & (var > 0.0), round_half_up(z, 6))
    return stats.select(
        F.expr(f"timestamp_micros(hour_idx * {HOUR_US})").alias("window_start"),
        "n",
        zcol.alias("z"),
        F.coalesce(F.abs(zcol) > ANOMALY_Z, F.lit(False)).alias("is_anomaly"),
    )


def q_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_anomalies(load_table(spark, sf_dir, "events"))


SQL_HOURLY_ANOMALIES = f"""
WITH hourly AS (
  SELECT epoch_us(ts) // {HOUR_US} AS hour_idx, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
stats AS (
  SELECT hour_idx, n,
         count(n) OVER w AS m,
         sum(n) OVER w AS s1,
         sum(n * n) OVER w AS s2
  FROM hourly
  WINDOW w AS (ORDER BY hour_idx ROWS BETWEEN {ANOMALY_TRAIL} PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT hour_idx, n,
         CASE WHEN m >= 2
               AND (CAST(m AS DOUBLE) * CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) - 1.0)) > 0.0
              THEN floor(((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
                          / sqrt((CAST(m AS DOUBLE) * CAST(s2 AS DOUBLE)
                                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                                 / (CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) - 1.0))))
                         * 1000000.0 + 0.5) / 1000000.0 END AS z
  FROM stats
)
SELECT make_timestamp(hour_idx * {HOUR_US}) AS window_start,
       n,
       z,
       COALESCE(abs(z) > {ANOMALY_Z}, FALSE) AS is_anomaly
FROM scored
"""

QUERIES["hourly_anomalies"] = q_hourly_anomalies
ORACLES["hourly_anomalies"] = SQL_HOURLY_ANOMALIES


# ---------------------------------------------------------------------------
# Sessionized conversion: per user, the fraction of their sessions that
# contain a purchase (composes the gaps-and-islands sessionization).
# Ratio is rational (two integer counts, one division, portable rounding).
# ---------------------------------------------------------------------------

def session_conversion(events: DataFrame) -> DataFrame:
    from ..functions.numeric import round_half_up

    s = sessionize(events)
    # NULL-total like the oracle's CASE: an all-NULL-event_type session
    # counts as unconverted (0), never NULL-poisons the per-user sums
    per_session = s.groupBy("user_id", "session_seq").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
    ).select(
        "user_id",
        "n_sessions",
        "n_converted",
        round_half_up(
            F.col("n_converted").cast("double") / F.col("n_sessions").cast("double"), 6
        ).alias("conversion_rate"),
    )


def q_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_conversion(load_table(spark, sf_dir, "events"))


SQL_SESSION_CONVERSION = f"""
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS boundary
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_type,
         sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
per_session AS (
  SELECT user_id, session_seq,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM sessions GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       floor((CAST(sum(converted) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS conversion_rate
FROM per_session
GROUP BY user_id
"""

QUERIES["session_conversion"] = q_session_conversion
ORACLES["session_conversion"] = SQL_SESSION_CONVERSION


# ---------------------------------------------------------------------------
# Session path mining — r3

PATH_PREFIX_LEN = 5
PATH_TOPK = 20


def session_paths_topk(events: DataFrame) -> DataFrame:
    """Top-k most common session journeys: the first PATH_PREFIX_LEN
    event types of each session, in exact event order, counted across all
    sessions — the path-mining readout behind funnel design ("what do
    users actually do?").

    Order discipline: collect_list order after a shuffle is
    NON-deterministic, so the per-session sequence is materialized as
    array_sort over (ts, event_id, type) structs — sorted IN the row,
    deterministic on any partitioning — then truncated and joined.
    The agg shuffles one slim struct per event, grouped on
    (user_id, session_seq); the path count agg runs over |sessions| rows.
    Top-k via TakeOrdered, no global sort. Reuses sessionize's single
    user-keyed window shuffle (SCALE.md: derived session analytics never
    re-scan events beyond their base rollup).
    """
    s = sessionize(events)
    # pre-truncate to the first PATH_PREFIX_LEN events per session BEFORE
    # collecting: bounds per-group agg state to 5 slim structs even for
    # pathological million-event sessions. The (user_id, session_seq)
    # window reuses sessionize's user_id hash partitioning (subset rule —
    # no second shuffle; the array_sort keeps the collected order
    # deterministic regardless of partitioning).
    w_sess = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    paths = (
        s.withColumn("rn", F.row_number().over(w_sess))
        .where(F.col("rn") <= PATH_PREFIX_LEN)
        .groupBy("user_id", "session_seq")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
            ).alias("evs")
        )
        .select(
            F.array_join(F.transform("evs", lambda e: e.event_type), ">").alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATH_TOPK)
    )


def q_session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_paths_topk(load_table(spark, sf_dir, "events"))


SQL_SESSION_PATHS_TOPK = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS boundary
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts, event_type,
         sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
),
ranked AS (
  SELECT user_id, session_seq, event_type,
         row_number() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts, event_id) AS rn
  FROM sess
),
paths AS (
  SELECT string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= {PATH_PREFIX_LEN}
  GROUP BY user_id, session_seq
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT {PATH_TOPK}
"""

QUERIES["session_paths_topk"] = q_session_paths_topk
ORACLES["session_paths_topk"] = SQL_SESSION_PATHS_TOPK


# ---------------------------------------------------------------------------
# Conversation assembly: collapse each user's event stream into ONE ordered
# transcript row — the SFT/chat-data assembly shape (raw interaction logs ->
# one training document per conversation). Construction: collect_list of
# (epoch_us, event_id, event_type) structs, sort_array for a deterministic
# in-row order (struct compare = us, then event_id — unique, so layout
# never matters), then a sequential in-row fold to the transcript string.
# The transcript is emitted as md5 (rows stay narrow; the full string is
# what a real pipeline would write) plus the first turn as a readable probe.
#
# Scale: one user-keyed shuffle; per-user state is bounded by events-per-
# user (same bound session_paths_topk documents). Users with pathological
# event counts would need per-day sub-conversations — the split key exists
# (epoch day), not registered.
# ---------------------------------------------------------------------------

def conversation_assembly(events: DataFrame) -> DataFrame:
    turn = F.struct(
        F.unix_micros(F.col("ts")).alias("us"),
        F.col("event_id").alias("eid"),
        F.col("event_type").alias("et"),
    )
    per_user = events.groupBy("user_id").agg(
        F.sort_array(F.collect_list(turn)).alias("turns")
    )
    line = "concat(s.et, '@', CAST(s.us AS STRING))"
    return per_user.select(
        "user_id",
        F.size("turns").cast("int").alias("n_turns"),
        F.md5(F.expr(f"array_join(transform(turns, s -> {line}), '|')")).alias(
            "transcript_md5"
        ),
        F.expr(
            "concat(turns[0].et, '@', CAST(turns[0].us AS STRING))"
        ).alias("first_turn"),
    )


def q_conversation_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conversation_assembly(load_table(spark, sf_dir, "events"))


SQL_CONVERSATION_ASSEMBLY = """
SELECT user_id,
       CAST(count(*) AS INT) AS n_turns,
       md5(string_agg(event_type || '@' || CAST(epoch_us(ts) AS VARCHAR), '|'
                      ORDER BY ts, event_id)) AS transcript_md5,
       (array_agg(event_type || '@' || CAST(epoch_us(ts) AS VARCHAR)
                  ORDER BY ts, event_id))[1] AS first_turn
FROM events
GROUP BY user_id
"""

QUERIES["conversation_assembly"] = q_conversation_assembly
ORACLES["conversation_assembly"] = SQL_CONVERSATION_ASSEMBLY


# ---------------------------------------------------------------------------
# Seasonal decomposition (hour-of-day profile): per (event_type, hour-of-
# day) mean / variance plus the seasonal index (hour mean / series mean) —
# the classic additive-seasonality readout and the input to seasonal
# anomaly baselines (complements hourly_anomalies' trailing z-score).
#
# Exactness: per-bucket first and second moments are DECIMAL sums (order-
# independent; value² is computed in IEEE double first — identical in both
# engines — then cast); the series totals reuse those bucket sums through
# a window over the 24 hod rows (decimal again), so the only float ops are
# the final per-row divisions — identical expressions in the oracle.
# Shape: ONE shuffle on (event_type, hod) — 120 groups with map-side
# partial aggregation; the window runs inside 24-row partitions.
# ---------------------------------------------------------------------------

def seasonal_decompose(events: DataFrame) -> DataFrame:
    hod = (F.expr(f"unix_micros(ts) div {HOUR_US}") % 24).cast("int")
    scale = F.lit(10_000_000_000).cast("decimal(12,0)")
    u1 = (F.col("value").cast(VAL_DEC) * scale).cast("decimal(38,0)")
    u2 = ((F.col("value") * F.col("value")).cast(VAL_DEC) * scale).cast("decimal(38,0)")
    base = events.groupBy(F.col("event_type"), hod.alias("hod")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(u1).alias("s1u"),
        F.sum(u2).alias("s2u"),
    )
    w = Window.partitionBy("event_type")
    hod_mean = F.col("s1u").cast("double") / F.lit(1e10) / F.col("n").cast("double")
    series_mean = (
        F.sum("s1u").over(w).cast("double") / F.lit(1e10)
        / F.sum("n").over(w).cast("double")
    )
    hod_var = (
        F.col("s2u").cast("double") / F.lit(1e10) / F.col("n").cast("double")
        - hod_mean * hod_mean
    )
    return base.select(
        "event_type",
        "hod",
        F.col("n").cast("long").alias("n"),
        _round6(hod_mean).alias("hod_mean"),
        _round6(hod_var).alias("hod_var"),
        _round6(hod_mean / series_mean).alias("seasonal_index"),
    )


def _round6(c):
    from ..functions.numeric import round_half_up

    return round_half_up(c, 6)


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_decompose(load_table(spark, sf_dir, "events"))


SQL_SEASONAL_DECOMPOSE = f"""
WITH base AS (
  SELECT event_type,
         CAST((epoch_us(ts) // {HOUR_US}) % 24 AS INT) AS hod,
         CAST(count(*) AS BIGINT) AS n,
         SUM(CAST(CAST(value AS DECIMAL(18,10)) * 10000000000 AS DECIMAL(38,0))) AS s1u,
         SUM(CAST(CAST(value * value AS DECIMAL(18,10)) * 10000000000 AS DECIMAL(38,0))) AS s2u
  FROM events
  GROUP BY event_type, (epoch_us(ts) // {HOUR_US}) % 24
),
m AS (
  SELECT event_type, hod, n,
         CAST(s1u AS DOUBLE) / 10000000000.0 / CAST(n AS DOUBLE) AS hod_mean,
         CAST(s2u AS DOUBLE) / 10000000000.0 / CAST(n AS DOUBLE)
           - (CAST(s1u AS DOUBLE) / 10000000000.0 / CAST(n AS DOUBLE))
             * (CAST(s1u AS DOUBLE) / 10000000000.0 / CAST(n AS DOUBLE)) AS hod_var,
         CAST(SUM(s1u) OVER (PARTITION BY event_type) AS DOUBLE) / 10000000000.0
           / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS series_mean
  FROM base
)
SELECT event_type, hod, n,
       floor(hod_mean * 1000000.0 + 0.5) / 1000000.0 AS hod_mean,
       floor(hod_var * 1000000.0 + 0.5) / 1000000.0 AS hod_var,
       floor((hod_mean / series_mean) * 1000000.0 + 0.5) / 1000000.0 AS seasonal_index
FROM m
"""

QUERIES["seasonal_decompose"] = q_seasonal_decompose
ORACLES["seasonal_decompose"] = SQL_SEASONAL_DECOMPOSE


# ---------------------------------------------------------------------------
# A/B experiment lift (r3): deterministic md5 arm assignment (user-level,
# same bucket discipline as warehouse.leakage_safe_split so a user never
# straddles arms) + exact-decimal per-arm purchase metrics + arm B's lift
# over arm A. The analysis half of an experimentation pipeline —
# assignment is a pure projection (free at any scale), the rollup one
# 2-group agg, the lift a window over the 2 result rows.
# Variance/significance deliberately out of scope: the engine's job is
# the exact sums a stats layer consumes.
# ---------------------------------------------------------------------------

def ab_test_lift(events: DataFrame) -> DataFrame:
    arm_bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 2
    )
    arm = F.when(arm_bucket == 0, F.lit("A")).otherwise(F.lit("B"))
    per_arm = (
        events.filter(F.col("event_type") == "purchase")
        .select(arm.alias("arm"), "user_id", "value")
        .groupBy("arm")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            _vsum("value", "total_value"),
        )
    )
    w = Window.partitionBy()
    mean = F.col("total_value") / F.col("n_purchases").cast("double")
    # exactly one A row -> max over {mean, NULL} is deterministic
    mean_a = F.max(F.when(F.col("arm") == "A", mean)).over(w)
    return per_arm.select(
        "arm",
        "n_users",
        "n_purchases",
        "total_value",
        _round6(mean).alias("mean_value"),
        _round6(mean / mean_a - F.lit(1.0)).alias("lift_vs_a"),
    )


def q_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ab_test_lift(load_table(spark, sf_dir, "events"))


SQL_AB_TEST_LIFT = """
WITH per_arm AS (
  SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(count(*) AS BIGINT) AS n_purchases,
         (CAST(SUM(CAST(CAST(value AS DECIMAL(18,10)) * 10000000000 AS DECIMAL(38,0))) AS DOUBLE) / 10000000000.0) AS total_value
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY 1
),
m AS (
  SELECT arm, n_users, n_purchases, total_value,
         total_value / CAST(n_purchases AS DOUBLE) AS mean_v,
         MAX(CASE WHEN arm = 'A'
                  THEN total_value / CAST(n_purchases AS DOUBLE) END) OVER () AS mean_a
  FROM per_arm
)
SELECT arm, n_users, n_purchases, total_value,
       floor(mean_v * 1000000.0 + 0.5) / 1000000.0 AS mean_value,
       floor((mean_v / mean_a - 1.0) * 1000000.0 + 0.5) / 1000000.0 AS lift_vs_a
FROM m
"""

QUERIES["ab_test_lift"] = q_ab_test_lift
ORACLES["ab_test_lift"] = SQL_AB_TEST_LIFT


# ---------------------------------------------------------------------------
# Tolerance dedup (r3): BURST COLLAPSING — collapse each chain of same-
# (user, type) deliveries whose inter-arrival gaps are all <= DEDUP_TOL_US
# into its first event (a redelivery storm keeps re-sending until acked,
# so the whole transitive chain is one logical event). Semantics to be
# precise about (they differ and both are legitimate):
#   - THIS op: runs are the transitive closure of "gap <= tol" — a chain
#     at 0s,40s,80s with tol=60s is ONE run (survivor 0s), even though
#     80s is >tol from the survivor.
#   - "keep if gap from last KEPT > tol" (the dropDuplicatesWithinWatermark
#     -style recurrence) would keep 0s AND 80s; that recurrence is
#     order-dependent per key and would need an in-row fold (see
#     holt_linear_forecast) rather than the window construction here.
# Construction: gap > tol marks a run head, the cumulative head count
# labels runs, each run's first row survives. One (user_id, event_type)-
# keyed shuffle; lag/run-sum/agg all reuse it.
# ---------------------------------------------------------------------------

DEDUP_TOL_US = 60 * 1_000_000  # 60 s redelivery window


def event_dedup_tolerance(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    boundary = F.when(gap.isNull() | (gap > DEDUP_TOL_US), 1).otherwise(0)
    runs = events.select(
        "user_id", "event_type", "ts", "event_id", boundary.alias("b")
    ).withColumn(
        "run_id",
        F.sum("b").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        runs.groupBy("user_id", "event_type", "run_id")
        .agg(
            F.min(F.struct("ts", "event_id")).alias("first"),
            F.count(F.lit(1)).cast("long").alias("n_deliveries"),
        )
        .select(
            "user_id",
            "event_type",
            F.col("first.event_id").alias("kept_event_id"),
            (F.col("n_deliveries") - 1).cast("long").alias("n_dropped"),
        )
    )


def q_event_dedup_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_dedup_tolerance(load_table(spark, sf_dir, "events"))


SQL_EVENT_DEDUP_TOLERANCE = f"""
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {DEDUP_TOL_US}
              THEN 1 ELSE 0 END AS b
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, event_type, ts, event_id,
         sum(b) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM flagged
)
SELECT user_id, event_type,
       (array_agg(event_id ORDER BY ts, event_id))[1] AS kept_event_id,
       CAST(count(*) - 1 AS BIGINT) AS n_dropped
FROM runs
GROUP BY user_id, event_type, run_id
"""

QUERIES["event_dedup_tolerance"] = q_event_dedup_tolerance
ORACLES["event_dedup_tolerance"] = SQL_EVENT_DEDUP_TOLERANCE


# ---------------------------------------------------------------------------
# Value-RANGE window frame (r3): trailing 24-hour per-event running sum
# via RANGE BETWEEN <value> PRECEDING — the frame type the rest of the
# repo's windows don't exercise (ROWS frames count rows; RANGE frames
# bound by ORDER-BY value distance, here epoch seconds, so variable-width
# event spacing is handled by the frame itself — no spine join, no
# self-join). One user-keyed shuffle; the frame is evaluated within each
# user's sorted run. Exactness: DECIMAL running sums; the frame ORDER BY
# key is integer epoch-seconds. NOTE RANGE requires a single numeric
# order key, and ties (same second) share a frame — both engines agree on
# that semantics, and the output keys on event_id so tied rows are
# distinct rows with identical sums.
# ---------------------------------------------------------------------------

DAY_S = 86_400


def range_frame_daily_sum(events: DataFrame) -> DataFrame:
    base = events.select(
        "user_id", "event_id",
        F.expr("unix_micros(ts) div 1000000").alias("sec"),
        F.col("value").cast(VAL_DEC).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-(DAY_S - 1), Window.currentRow)
    )
    return base.select(
        "user_id",
        "event_id",
        F.sum("v").over(w).cast("double").alias("trailing_24h_value"),
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_24h_events"),
    )


def q_range_frame_daily_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return range_frame_daily_sum(load_table(spark, sf_dir, "events"))


SQL_RANGE_FRAME_DAILY_SUM = f"""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE) AS trailing_24h_value,
       CAST(COUNT(*) OVER w AS BIGINT) AS trailing_24h_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
             RANGE BETWEEN {DAY_S - 1} PRECEDING AND CURRENT ROW)
"""

QUERIES["range_frame_daily_sum"] = q_range_frame_daily_sum
ORACLES["range_frame_daily_sum"] = SQL_RANGE_FRAME_DAILY_SUM
