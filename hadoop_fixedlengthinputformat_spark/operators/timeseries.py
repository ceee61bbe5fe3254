"""Time-series operators over ``events`` — resample + gap-fill.

The reference emits records in file order with no time semantics
(SURVEY.md §2.2); these are engine extensions for the telemetry-shaped
data the streaming family (§2.3-H) also consumes.

Scale notes (verified plan at sf0.01): two exchanges, both over
PRE-AGGREGATED data — the hourly sums (|users x hours| rows) and the
per-user spans (|users| rows); raw events shuffle zero times.  The grid
explode sits on the user-partitioned span aggregate and the forward-fill
window reuses that same partitioning (no extra exchange).  Locally the
hourly aggregate broadcasts into the grid join; at 100 TB it exceeds the
broadcast threshold and AQE picks a sort-merge join on (user, bucket) —
still aggregate-sized.  A hot user with a years-long span generates its
grid on one task — bound the span or split the fill by (user, month) if
that bites.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query(
    "ts_gap_fill",
    oracle="""
    WITH b AS (
        SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
               round(sum(value), 4) AS hr_sum
        FROM events GROUP BY 1, 2
    ),
    spans AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM b GROUP BY 1),
    grid AS (
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
        FROM spans
    )
    SELECT g.user_id, g.bucket,
           last_value(b.hr_sum IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
    FROM grid g
    LEFT JOIN b ON g.user_id = b.user_id AND g.bucket = b.bucket
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample events to an hourly grid per user and forward-fill gaps
    with the last observed hourly sum (`last(..., ignorenulls=True)` over
    an unbounded-preceding window)."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("bucket")
        ).agg(F.round(F.sum("value"), 4).alias("hr_sum"))
    )
    spans = b.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            F.last("hr_sum", ignorenulls=True).over(w).alias("filled_sum"),
        )
    )


@query(
    "ts_sessionize",
    oracle="""
    WITH x AS (
        SELECT event_id, user_id, ts,
               epoch(ts) - lag(epoch(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
        FROM events
    ),
    f AS (
        SELECT event_id, user_id, ts,
               CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END
                   AS is_start
        FROM x
    )
    SELECT event_id, user_id,
           sum(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_seq,
           is_start
    FROM f
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts at
    every >30 min silence; session_seq numbers a user's sessions via a
    running sum over the start flags.  The batch twin of
    stream_session_window.  One exchange on user_id; both windows reuse
    it (same partitioning + ordering), so raw events shuffle exactly
    once regardless of scale.  Epoch-seconds arithmetic (not intervals)
    so both engines compare identical integers."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ: hop through TIMESTAMP (session TZ pinned UTC
    # by tables.configure) to get epoch seconds, matching DuckDB epoch()
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap_s = epoch - F.lag(epoch).over(w)
    is_start = F.when(
        gap_s.isNull() | (gap_s > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    flagged = ev.select(
        "event_id", "user_id", "ts", is_start.alias("is_start")
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("is_start").over(run).alias("session_seq"),
        "is_start",
    )


@query(
    "ts_rollup_chain",
    oracle="""
    WITH hourly AS (
        SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h,
               sum(value) AS v, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    daily AS (
        SELECT user_id, time_bucket(INTERVAL '1 day', h) AS d,
               sum(v) AS v, sum(n) AS n
        FROM hourly GROUP BY 1, 2
    )
    SELECT user_id, time_bucket(INTERVAL '1 month', d) AS month,
           round(sum(v), 4) AS month_value, sum(n) AS month_events,
           count(*) AS days_active
    FROM daily GROUP BY 1, 2
    """,
)
def ts_rollup_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup chain (the hypertable pattern):
    monthly derives from daily derives from hourly — raw events are
    read ONCE and every higher level aggregates the level below, so at
    100 TB each rollup's input is the (tiny) previous aggregate, and in
    a materialized deployment each level persists and refreshes
    incrementally.  All three groupBys hash-partition on user_id+bucket;
    partial aggregation collapses map-side at every level."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum("value").alias("v"), F.count(F.lit(1)).alias("n"))
    daily = hourly.groupBy(
        "user_id", F.date_trunc("day", "h").alias("d")
    ).agg(F.sum("v").alias("v"), F.sum("n").alias("n"))
    return daily.groupBy(
        "user_id", F.date_trunc("month", "d").alias("month")
    ).agg(
        F.round(F.sum("v"), 4).alias("month_value"),
        F.sum("n").alias("month_events"),
        F.count(F.lit(1)).alias("days_active"),
    )
