"""Event-time windowed aggregation (SURVEY §2B streaming rows), in the
batch-verifiable form: the same ``window``/``session_window``
expressions run identically under Structured Streaming (see
streaming/ingest.py for the readStream path + watermarks); running
them on a bounded DataFrame lets the DuckDB oracle check the exact
window semantics the stream would produce.

Window-start alignment: Spark tumbling windows align to the epoch;
DuckDB ``time_bucket`` aligns sub-day intervals to an epoch-aligned
origin too, so 5/10-minute buckets agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ..operators.relational import dsum


@query(
    "stream_tumbling_window",
    oracle="""
SELECT time_bucket(INTERVAL '10 minutes', ts)                    AS window_start,
       time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS window_end,
       event_type,
       count(*)::BIGINT                                          AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)         AS total
FROM events
GROUP BY 1, 2, 3
""",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows per event type — the
    batch twin of `readStream.groupBy(window(ts, '10 minutes'))`."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes")
    return (
        ev.groupBy(w, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )


@query(
    "stream_sliding_window",
    oracle="""
WITH slid AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) - (k.k * INTERVAL '5 minutes')
           AS window_start,
         value
  FROM events CROSS JOIN (VALUES (0), (1)) k(k)
)
SELECT window_start,
       window_start + INTERVAL '10 minutes'               AS window_end,
       count(*)::BIGINT                                   AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)  AS total
FROM slid
GROUP BY 1, 2
""",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10-minute length, 5-minute slide): every event
    lands in two windows. The oracle reproduces the window assignment
    by unioning the two shifted 5-minute buckets."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.groupBy(w)
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            "total",
        )
    )


@query(
    "stream_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts)                           AS session_start,
       max(ts) + INTERVAL '30 minutes'   AS session_end,
       count(*)::BIGINT                  AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM sessions
GROUP BY user_id, session_id
""",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user —
    `session_window` is the same expression Structured Streaming uses
    for stateful sessionization; the oracle derives sessions with the
    classic lag/cumsum islands construction. Spark's session end is
    last-event + gap."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw, "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total",
        )
    )


@query(
    "stream_dedup_first",
    oracle="""
SELECT event_id, user_id, event_type, ts FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) = 1
""",
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest event — the deterministic batch
    twin of streaming `dropDuplicates(["user_id","event_type"])` within
    a watermark (which keeps the first arrival)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


@query(
    "stream_rate_per_minute",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
       count(*)::BIGINT AS n_events,
       round(count(*) / 60.0, 6) AS events_per_minute,
       count(DISTINCT user_id)::BIGINT AS active_users
FROM events GROUP BY 1
""",
)
def stream_rate_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly throughput/active-user rollup — the monitoring query the
    reference approximates with CloudWatch log counts (README.md:234-270)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.count(F.lit(1)) / 60.0, 6).alias("events_per_minute"),
            F.countDistinct("user_id").alias("active_users"),
        )
        .select(F.col("w.start").alias("hour_start"), "n_events", "events_per_minute", "active_users")
    )


@query(
    "ts_resample_gapfill",
    oracle="""
WITH b AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start FROM b
),
types AS (SELECT DISTINCT event_type FROM events),
agg AS (
  SELECT date_trunc('hour', ts) AS bucket_start,
         event_type,
         count(*)::BIGINT AS n_raw,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_raw
  FROM events GROUP BY 1, 2
)
SELECT g.bucket_start,
       t.event_type,
       coalesce(a.n_raw, 0)::BIGINT   AS n,
       coalesce(a.total_raw, 0.0)     AS total,
       last_value(a.total_raw IGNORE NULLS)
         OVER (PARTITION BY t.event_type ORDER BY g.bucket_start) AS total_ffill
FROM grid g
CROSS JOIN types t
LEFT JOIN agg a ON a.bucket_start = g.bucket_start AND a.event_type = t.event_type
""",
)
def ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample to a dense hourly grid with gap fill:
    hourly count/sum per event type, missing buckets materialized as
    zero rows, plus a forward-filled last-observed sum (``last`` with
    ignorenulls over an ordered per-type window).

    The reference has no time-series surface at all; this is the
    standard downsample/regularize step before charting or feature
    windows. Scale shape: the raw aggregation is one map-side-combined
    groupBy over the fact table; the dense grid is (hours x types) —
    tiny and driver-free via ``sequence``+``explode``. The gap-fill
    join broadcasts the aggregated side (also only hours x types rows;
    a left join can only broadcast its non-preserved side), so the only
    shuffle of fact-table size is the single hash aggregation. The ffill window partitions by event type, so
    state per partition is one running value — bounded at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts"))
    agg = ev.groupBy(hr.alias("bucket_start"), "event_type").agg(
        F.count(F.lit(1)).alias("n_raw"),
        dsum("value").alias("total_raw"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("bucket_start")
    ).crossJoin(ev.select("event_type").distinct())
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        grid.join(F.broadcast(agg), ["bucket_start", "event_type"], "left")
        .select(
            "bucket_start",
            "event_type",
            F.coalesce("n_raw", F.lit(0)).cast("long").alias("n"),
            F.coalesce("total_raw", F.lit(0.0)).alias("total"),
            F.last("total_raw", ignorenulls=True).over(w).alias("total_ffill"),
        )
    )


@query(
    "stream_interval_join",
    oracle="""
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id,
       p.ts       AS purchase_ts,
       c.ts       AS click_ts
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts < p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
""",
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (attribution:
    each purchase joins the same user's clicks in the preceding 30
    minutes). The identical join condition runs under readStream with
    watermarks on both sides — `test_stream_stream_interval_join`
    drives that path; this bounded twin is what the oracle verifies.
    Scale shape: equi-key on user_id carries the shuffle, the time
    interval is a post-probe filter, and under streaming the watermark
    bounds the buffered state to the interval width — the plan a
    1000-executor attribution pipeline runs continuously."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    return (
        p.join(
            c,
            (p.user_id == c.c_user)
            & (c.click_ts >= p.purchase_ts - F.expr("interval 30 minutes"))
            & (c.click_ts < p.purchase_ts),
        )
        .select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")
    )
