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
    an unbounded-preceding window).

    Exchange shape (round 14 rework — the r7 "two exchanges" shape had
    silently become TWO RAW SCANS: the hourly table feeds both the span
    agg and the join probe, and column pruning narrows the span branch,
    so Spark planned the events scan + aggregate TWICE instead of
    sharing the subtree).  The hourly aggregate is localCheckpointed —
    raw events are scanned ONCE and only the |users x hours| aggregate
    materializes; the span agg re-keys it onto user_id (aggregate-sized
    exchange), and the grid explode, the grid⋈hourly join
    (hashpartitioning(user_id) satisfies
    ClusteredDistribution([user_id, bucket]) via
    requireAllClusterKeysForCoPartition=false) and the forward-fill
    window all ride that partitioning — the grid, the largest
    intermediate, never crosses the wire (pinned in
    tests/test_scale_plans.py)."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("bucket")
        ).agg(F.round(F.sum("value"), 4).alias("hr_sum"))
        .localCheckpoint(eager=False)
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
               CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
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
           CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq,
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
    once regardless of scale.  WHOLE-second epoch arithmetic on both
    sides: DuckDB's bare epoch() returns FRACTIONAL seconds while
    Spark's cast-to-long floors, so a gap inside (1800, 1801) seconds
    split the engines (~1 expected event per data roll — caught by the
    third alt-seed run)."""
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
           round(sum(v), 4) AS month_value, CAST(sum(n) AS BIGINT) AS month_events,
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


@query(
    "ts_interpolate",
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
    ),
    anchored AS (
        -- an all-NULL-value hour yields a b row with NULL hr_sum: it is
        -- UNOBSERVED for anchoring, so the bucket anchor must skip it
        -- too (bare b.bucket is non-NULL there and would desync pt/pv)
        SELECT g.user_id, g.bucket,
               last_value(CASE WHEN b.hr_sum IS NOT NULL THEN b.bucket END
                          IGNORE NULLS) OVER w_prev AS pt,
               last_value(b.hr_sum IGNORE NULLS) OVER w_prev AS pv,
               first_value(CASE WHEN b.hr_sum IS NOT NULL THEN b.bucket END
                           IGNORE NULLS) OVER w_next AS nt,
               first_value(b.hr_sum IGNORE NULLS) OVER w_next AS nv
        FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.bucket = b.bucket
        WINDOW w_prev AS (PARTITION BY g.user_id ORDER BY g.bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (PARTITION BY g.user_id ORDER BY g.bucket
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket,
           (CASE WHEN pt = nt THEN pv
                 ELSE pv + (nv - pv)
                      * ((CAST(epoch(bucket) AS BIGINT) - CAST(epoch(pt) AS BIGINT))
                         / (CAST(epoch(nt) AS BIGINT) - CAST(epoch(pt) AS BIGINT)))
            END) + 0 AS interp_sum
    FROM anchored
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing hourly buckets between each user's
    prev/next observed values (gap_fill's forward-fill upgraded to a
    two-sided anchor).

    Round-14 rework, measured at sf0.1 (12-38 s -> ~1 s):
    (1) the next-anchor pass used `first_value ... ROWS BETWEEN CURRENT
    ROW AND UNBOUNDED FOLLOWING` — Spark's UnboundedFollowing frame
    re-scans the remainder of the partition PER ROW (O(rows x gap run
    length), quadratic on sparse grids), so it is re-expressed as the
    exactly-equivalent `last_value ... IGNORE NULLS` over the SAME rows
    ordered bucket-DESC with a running UNBOUNDED PRECEDING frame (O(n)
    incremental state; one extra sort, no extra exchange — grid buckets
    are unique per user so the reversal is deterministic); (2) the
    hourly aggregate is localCheckpointed (the ts_gap_fill round-14
    fix: the span branch and the join probe otherwise each re-scan raw
    events).  The interpolation arithmetic runs the SAME IEEE ops on
    both engines (anchors are already-rounded sums, the time fraction
    is a bigint/bigint divide), so values are bit-identical without a
    final rounding; `+ 0` normalizes a possible -0.0 anchor."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.round(F.sum("value"), 4).alias("hr_sum")).localCheckpoint(
        eager=False
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
    g = grid.join(b, ["user_id", "bucket"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # next-anchor: identical row set to (CURRENT ROW .. UNBOUNDED
    # FOLLOWING) on the ascending order, evaluated as a running frame
    # on the descending order
    w_next_rev = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_bucket = F.when(F.col("hr_sum").isNotNull(), F.col("bucket"))
    anchored = g.select(
        "user_id",
        "bucket",
        F.last(obs_bucket, ignorenulls=True).over(w_prev).alias("pt"),
        F.last("hr_sum", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_bucket, ignorenulls=True).over(w_next_rev).alias("nt"),
        F.last("hr_sum", ignorenulls=True).over(w_next_rev).alias("nv"),
    )
    frac = (F.unix_timestamp("bucket") - F.unix_timestamp("pt")) / (
        F.unix_timestamp("nt") - F.unix_timestamp("pt")
    )
    interp = F.when(F.col("pt") == F.col("nt"), F.col("pv")).otherwise(
        F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    )
    return anchored.select(
        "user_id", "bucket", (interp + F.lit(0)).alias("interp_sum")
    )


@query(
    "ts_ewma",
    oracle="""
    WITH RECURSIVE chunks AS MATERIALIZED (
        -- round-12 sf1 soak rework (plans/NOTES.md round-12 has the
        -- full five-formulation story): the corpus has FEW users with
        -- VERY LONG histories (15 x 67k at sf1), the recurrence is
        -- inherently sequential, and a DuckDB recursive CTE rebuilds
        -- its join hash table (the whole ~8 MB chunk payload) EVERY
        -- level — so oracle cost = levels x corpus.  32-element chunks
        -- are list-aggregated straight from the row table (window rank
        -- -> groupBy, linear; never materialize a full history list);
        -- each level joins ONLY its own chunk row and advances 32
        -- steps via an unrolled nested expression with the identical
        -- float op order of the 1-step recurrence — bit-identical to
        -- the Spark numpy loop.  32 is the fastest feasible chunk:
        -- the binder rejects nesting past ~60, the parser past ~250,
        -- and a list_reduce prefix-fold variant (no nesting) measured
        -- 2x slower (564 s vs 281 s at sf1).  An input-scaling
        -- sequential recursion: HEAVY_CAPS-annotated in
        -- tools/soak_oracles.py; the Spark applyInPandas side is the
        -- linear scale path.
        SELECT user_id, CAST((rn - 1) // 32 AS BIGINT) AS ci,
               list(value ORDER BY rn) AS cxs,
               CAST(MAX(n) AS BIGINT) AS n
        FROM (
            SELECT user_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   count(*) OVER (PARTITION BY user_id) AS n
            FROM events
        )
        GROUP BY user_id, ci
    ),
    ew AS (
        SELECT c.user_id, CAST(0 AS BIGINT) AS rn0, u.j AS j, u.y AS y, c.n
        FROM chunks c,
             unnest([{'j': 1, 'y': c.cxs[1]},
               {'j': 2, 'y': (0.5*c.cxs[2]+0.5*c.cxs[1])},
               {'j': 3, 'y': (0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))},
               {'j': 4, 'y': (0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))},
               {'j': 5, 'y': (0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))},
               {'j': 6, 'y': (0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))},
               {'j': 7, 'y': (0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))},
               {'j': 8, 'y': (0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))},
               {'j': 9, 'y': (0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))))},
               {'j': 10, 'y': (0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))))},
               {'j': 11, 'y': (0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))))))},
               {'j': 12, 'y': (0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))))))},
               {'j': 13, 'y': (0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))))))))},
               {'j': 14, 'y': (0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))))))))},
               {'j': 15, 'y': (0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))))))))))},
               {'j': 16, 'y': (0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))))))))))},
               {'j': 17, 'y': (0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))))))))))))},
               {'j': 18, 'y': (0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))))))))))))},
               {'j': 19, 'y': (0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))))))))))))))},
               {'j': 20, 'y': (0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))))))))))))))},
               {'j': 21, 'y': (0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))))))))))))))))},
               {'j': 22, 'y': (0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))))))))))))))))},
               {'j': 23, 'y': (0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))))))))))))))))))},
               {'j': 24, 'y': (0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))))))))))))))))))},
               {'j': 25, 'y': (0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))))))))))))))))))))},
               {'j': 26, 'y': (0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))))))))))))))))))))},
               {'j': 27, 'y': (0.5*c.cxs[27]+0.5*(0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))))))))))))))))))))))},
               {'j': 28, 'y': (0.5*c.cxs[28]+0.5*(0.5*c.cxs[27]+0.5*(0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))))))))))))))))))))))},
               {'j': 29, 'y': (0.5*c.cxs[29]+0.5*(0.5*c.cxs[28]+0.5*(0.5*c.cxs[27]+0.5*(0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))))))))))))))))))))))))},
               {'j': 30, 'y': (0.5*c.cxs[30]+0.5*(0.5*c.cxs[29]+0.5*(0.5*c.cxs[28]+0.5*(0.5*c.cxs[27]+0.5*(0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))))))))))))))))))))))))},
               {'j': 31, 'y': (0.5*c.cxs[31]+0.5*(0.5*c.cxs[30]+0.5*(0.5*c.cxs[29]+0.5*(0.5*c.cxs[28]+0.5*(0.5*c.cxs[27]+0.5*(0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1]))))))))))))))))))))))))))))))},
               {'j': 32, 'y': (0.5*c.cxs[32]+0.5*(0.5*c.cxs[31]+0.5*(0.5*c.cxs[30]+0.5*(0.5*c.cxs[29]+0.5*(0.5*c.cxs[28]+0.5*(0.5*c.cxs[27]+0.5*(0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*c.cxs[1])))))))))))))))))))))))))))))))}]) AS t(u)
        WHERE c.ci = 0 AND u.j <= c.n
        UNION ALL
        SELECT e.user_id, e.rn0 + 32, u.j, u.y, e.n
        FROM ew e
        JOIN chunks c ON c.user_id = e.user_id
             AND c.ci = (e.rn0 + 32) // 32,
             unnest([{'j': 1, 'y': (0.5*c.cxs[1]+0.5*e.y)},
               {'j': 2, 'y': (0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))},
               {'j': 3, 'y': (0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))},
               {'j': 4, 'y': (0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))},
               {'j': 5, 'y': (0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))},
               {'j': 6, 'y': (0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))},
               {'j': 7, 'y': (0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))},
               {'j': 8, 'y': (0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))},
               {'j': 9, 'y': (0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))))},
               {'j': 10, 'y': (0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))))},
               {'j': 11, 'y': (0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))))))},
               {'j': 12, 'y': (0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))))))},
               {'j': 13, 'y': (0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))))))))},
               {'j': 14, 'y': (0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))))))))},
               {'j': 15, 'y': (0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))))))))))},
               {'j': 16, 'y': (0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))))))))))},
               {'j': 17, 'y': (0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))))))))))))},
               {'j': 18, 'y': (0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))))))))))))},
               {'j': 19, 'y': (0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))))))))))))))},
               {'j': 20, 'y': (0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))))))))))))))},
               {'j': 21, 'y': (0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))))))))))))))))},
               {'j': 22, 'y': (0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))))))))))))))))},
               {'j': 23, 'y': (0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))))))))))))))))))},
               {'j': 24, 'y': (0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))))))))))))))))))},
               {'j': 25, 'y': (0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))))))))))))))))))))},
               {'j': 26, 'y': (0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))))))))))))))))))))},
               {'j': 27, 'y': (0.5*c.cxs[27]+0.5*(0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))))))))))))))))))))))},
               {'j': 28, 'y': (0.5*c.cxs[28]+0.5*(0.5*c.cxs[27]+0.5*(0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))))))))))))))))))))))},
               {'j': 29, 'y': (0.5*c.cxs[29]+0.5*(0.5*c.cxs[28]+0.5*(0.5*c.cxs[27]+0.5*(0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))))))))))))))))))))))))},
               {'j': 30, 'y': (0.5*c.cxs[30]+0.5*(0.5*c.cxs[29]+0.5*(0.5*c.cxs[28]+0.5*(0.5*c.cxs[27]+0.5*(0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))))))))))))))))))))))))},
               {'j': 31, 'y': (0.5*c.cxs[31]+0.5*(0.5*c.cxs[30]+0.5*(0.5*c.cxs[29]+0.5*(0.5*c.cxs[28]+0.5*(0.5*c.cxs[27]+0.5*(0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y)))))))))))))))))))))))))))))))},
               {'j': 32, 'y': (0.5*c.cxs[32]+0.5*(0.5*c.cxs[31]+0.5*(0.5*c.cxs[30]+0.5*(0.5*c.cxs[29]+0.5*(0.5*c.cxs[28]+0.5*(0.5*c.cxs[27]+0.5*(0.5*c.cxs[26]+0.5*(0.5*c.cxs[25]+0.5*(0.5*c.cxs[24]+0.5*(0.5*c.cxs[23]+0.5*(0.5*c.cxs[22]+0.5*(0.5*c.cxs[21]+0.5*(0.5*c.cxs[20]+0.5*(0.5*c.cxs[19]+0.5*(0.5*c.cxs[18]+0.5*(0.5*c.cxs[17]+0.5*(0.5*c.cxs[16]+0.5*(0.5*c.cxs[15]+0.5*(0.5*c.cxs[14]+0.5*(0.5*c.cxs[13]+0.5*(0.5*c.cxs[12]+0.5*(0.5*c.cxs[11]+0.5*(0.5*c.cxs[10]+0.5*(0.5*c.cxs[9]+0.5*(0.5*c.cxs[8]+0.5*(0.5*c.cxs[7]+0.5*(0.5*c.cxs[6]+0.5*(0.5*c.cxs[5]+0.5*(0.5*c.cxs[4]+0.5*(0.5*c.cxs[3]+0.5*(0.5*c.cxs[2]+0.5*(0.5*c.cxs[1]+0.5*e.y))))))))))))))))))))))))))))))))}]) AS t(u)
        WHERE e.j = 32 AND e.rn0 + 32 + u.j <= e.n
    )
    SELECT user_id, CAST(rn0 + j AS BIGINT) AS rn,
           floor(y * 10000 + 0.5) / 10000 AS ewma
    FROM ew
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average (alpha = 0.5) —
    the inherently sequential recurrence y_i = 0.5*x_i + 0.5*y_{i-1}
    expressed as applyInPandas per user (Arrow batch per group, numpy
    loop inside; the DuckDB oracle is a recursive CTE running the SAME
    two multiplies + add per step, so doubles are bit-identical).
    Scale: one shuffle on user_id; per-group work is O(user history),
    the natural parallel grain — a training pipeline's per-source or
    per-domain smoothing runs the same shape.  The alpha=0.5 choice
    keeps every coefficient a power of two (exact halving)."""
    import pandas as pd  # noqa: F401 — applyInPandas contract

    def ewma(pdf):
        import numpy as np
        import pandas as pd
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        x = pdf["value"].to_numpy()
        y = np.empty_like(x)
        if len(x):
            y[0] = x[0]
            for i in range(1, len(x)):
                y[i] = 0.5 * x[i] + 0.5 * y[i - 1]
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "rn": np.arange(1, len(x) + 1, dtype="int64"),
                "ewma": np.floor(y * 10000 + 0.5) / 10000,
            }
        )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return ev.groupBy("user_id").applyInPandas(
        ewma, schema="user_id bigint, rn bigint, ewma double"
    )


@query(
    "ts_ohlc",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket,
           arg_min(value, printf('%020d%012d', epoch_us(ts), event_id)) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, printf('%020d%012d', epoch_us(ts), event_id)) AS close,
           count(*) AS n_events
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1
    """,
)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling — open/high/low/close of ``value`` per hourly
    bucket, the canonical downsample for metric/market feeds.  One
    hash-partial groupBy: each mapper reduces its rows to one candidate
    per bucket before the exchange, so the shuffle carries O(buckets)
    rows regardless of input size — scale-safe at 100 TB.  open/close
    use ``min_by``/``max_by`` on a zero-padded ``(epoch_us, event_id)``
    string key: a total order identical in both engines (DuckDB's
    ``arg_min`` rejects struct keys, and a bare ``ts`` key would be
    tie-fragile), so values are hash-exact with no rounding snap —
    the aggregate only selects existing doubles, never does arithmetic.
    NULL observations are excluded on BOTH sides: Spark's min_by
    returns the (NULL) value of the min-key row while DuckDB's arg_min
    skips NULL args — divergent exactly when a NULL-value event lands
    first/last in its bucket (caught by a fresh-seed nulls roll)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    key = F.format_string(
        "%020d%012d",
        F.unix_micros(F.col("ts").cast("timestamp")),
        F.col("event_id"),
    )
    return e.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "ts_cusum_changepoint",
    oracle="""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(floor(value) AS BIGINT) AS x
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL AND value >= 0
              AND user_id IS NOT NULL AND event_id IS NOT NULL
    ),
    cum AS (
        SELECT user_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS i,
               CAST(SUM(x) OVER w AS BIGINT) AS si,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
               CAST(SUM(x) OVER (PARTITION BY user_id) AS BIGINT) AS sn
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id, x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, n AS n_events,
           CAST(MAX(abs(n * si - i * sn)) AS BIGINT) AS peak_num,
           n * sn AS scale_den
    FROM cum WHERE n >= 2
    GROUP BY user_id, n, sn
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint score per user — how far the running total of
    event values strays from a constant-rate line — computed EXACTLY:
    the classic max_i |S_i − (i/n)·S_n| cross-multiplies to
    max |n·S_i − i·S_n| / (n·S_n), exposed as an exact integer fraction
    (numerator + scale) with no floating point anywhere, the agg_ks_test
    technique carried to time series.  Total order (ts, event_id, x)
    keeps duplicate-id rolls deterministic; one user-keyed window +
    groupBy reusing the same partitioning.  Overflow: n·S_i ≤ n²·max(x)
    — int64-safe for any realistic per-user stream (1e6 events of 1e6
    units)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") >= 0)
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.floor("value").cast("long").alias("x"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id", "x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wu = Window.partitionBy("user_id")
    cum = ev.select(
        "user_id",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("us", "event_id", "x")
        ).cast("long").alias("i"),
        F.sum("x").over(w).alias("si"),
        F.count(F.lit(1)).over(wu).alias("n"),
        F.sum("x").over(wu).alias("sn"),
    )
    return (
        cum.where(F.col("n") >= 2)
        .groupBy("user_id", "n", "sn")
        .agg(
            F.max(
                F.abs(F.col("n") * F.col("si") - F.col("i") * F.col("sn"))
            ).alias("peak_num")
        )
        .select(
            "user_id",
            F.col("n").alias("n_events"),
            "peak_num",
            (F.col("n") * F.col("sn")).alias("scale_den"),
        )
    )


# Lag-1 autocorrelation = Pearson over (x_t, x_{t-1}) pairs with exact
# int64 inputs: the same snapped-sqrt identity as agg_spearman.
from hadoop_fixedlengthinputformat_spark.functions.num import (
    money_units,
    snap_sql,
)

# snap() magnitude rule: n·sxx−sx² = n²·σ² grows with the series, so
# the SNAPPED sds are normalized by n² first (σ is in bounded data
# units — the un-normalized sqrt would saturate Spark's snap-8 floor
# from ~1e9 pairs/user); the n² factors cancel exactly in the ratio.
_AC_N2 = "(CAST(n AS DOUBLE) * n)"
_AC_DA = snap_sql(
    f"sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    f" / {_AC_N2})", 8
)
_AC_DB = snap_sql(
    f"sqrt((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"
    f" / {_AC_N2})", 8
)
_AC_R = snap_sql(
    f"((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / {_AC_N2})"
    f" / (({_AC_DA}) * ({_AC_DB}))", 4
)


@query(
    "ts_autocorr",
    oracle=f"""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(floor(value) AS BIGINT) AS x
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL AND value >= 0
              AND user_id IS NOT NULL AND event_id IS NOT NULL
    ),
    pairs AS (
        SELECT user_id, x,
               LAG(x) OVER (PARTITION BY user_id
                            ORDER BY us, event_id, x) AS y
        FROM base
    ),
    g AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               MAX(x) AS mxx, MIN(x) AS mnx,
               MAX(y) AS mxy, MIN(y) AS mny
        FROM pairs WHERE y IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n AS n_pairs, {_AC_R} + 0 AS acf1
    FROM g
    WHERE n >= 2 AND mxx > mnx AND mxy > mny
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of event values per user — the
    is-this-series-trending diagnostic — as Pearson over (x_t, x_{t−1})
    pairs with EXACT int64 power sums (floored values, total order
    (ts, event_id, x) so duplicate-id rolls pair identically); only
    the two snapped sqrts and the final ratio touch doubles, identical
    trees both engines.  One user-keyed lag window + a groupBy on the
    same key.  Constant or too-short series yield no row, not ÷0.
    Overflow budget (round-8 sf1 soak sweep): the degeneracy guard is
    max > min (the old n·sxx > sx² int64 products grew ~1.1e5·n² and
    would wrap/raise from ~2.9e6 pairs/user); the int64 sums bind next
    at sxx ≤ 1.1e5·n → ~8e13 pairs/user."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") >= 0)
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.floor("value").cast("long").alias("x"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id", "x")
    pairs = ev.select(
        "user_id", "x", F.lag("x").over(w).alias("y")
    ).where(F.col("y").isNotNull())
    g = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.max("x").alias("mxx"),
        F.min("x").alias("mnx"),
        F.max("y").alias("mxy"),
        F.min("y").alias("mny"),
    )
    return g.where(
        (F.col("n") >= 2)
        & (F.col("mxx") > F.col("mnx"))
        & (F.col("mxy") > F.col("mny"))
    ).select(
        "user_id",
        F.col("n").alias("n_pairs"),
        (F.expr(_AC_R) + F.lit(0.0)).alias("acf1"),
    )


# Bollinger bands over a fixed 20-row frame: per-frame n/S1/S2 are exact
# int64 window sums over cent units, the band arithmetic is one shared
# double tree (sqrt of the exact discriminant snapped to 8 first — the
# agg_moments discipline applied per row of a ROWS frame).
_BOLL_SQ = snap_sql("sqrt(CAST(20 * s2 - s1 * s1 AS DOUBLE))", 8)
_BOLL_MID = snap_sql("CAST(s1 AS DOUBLE) / 20.0", 4)
_BOLL_UP = snap_sql(f"(CAST(s1 AS DOUBLE) + 2.0 * ({_BOLL_SQ})) / 20.0", 4)
_BOLL_LO = snap_sql(f"(CAST(s1 AS DOUBLE) - 2.0 * ({_BOLL_SQ})) / 20.0", 4)


@query(
    "ts_bollinger",
    oracle=f"""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND value IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
    ),
    fr AS (
        SELECT user_id, us, event_id, vc,
               CAST(COUNT(*) OVER w AS BIGINT) AS n20,
               CAST(SUM(vc) OVER w AS BIGINT) AS s1,
               CAST(SUM(vc * vc) OVER w AS BIGINT) AS s2
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id, vc
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, us, event_id, vc,
           {_BOLL_MID} + 0 AS mid_cents,
           {_BOLL_UP} + 0 AS upper_cents,
           {_BOLL_LO} + 0 AS lower_cents
    FROM fr WHERE n20 = 20
    """,
)
def ts_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (20-row SMA ± 2σ) over each user's purchase
    values — the rolling-volatility primitive.  Values lift to exact
    cent int64s; per-frame S1/S2 are exact ROWS-frame window sums
    (merge-order-free — a frame sum has ONE evaluation order), the
    population-σ discriminant 20·S2−S1² stays integer, and only the
    shared sqrt/band tree touches doubles (sqrt snapped to 8, bands to
    4, +0 clears -0.0).  Total order (us, event_id, vc) pins frames
    under duplicate-id rolls (fully-identical rows permute
    sum-invariantly).  Partial leading frames (<20 rows) are excluded
    on both sides.  One user-keyed exchange; the frame never leaves the
    task.  Overflow: vc ≤ 5e4 ⇒ S2 ≤ 20·2.5e9 — int64-trivial."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id", "vc")
        .rowsBetween(-19, 0)
    )
    fr = ev.select(
        "user_id", "us", "event_id", "vc",
        F.count(F.lit(1)).over(w).alias("n20"),
        F.sum("vc").over(w).alias("s1"),
        F.sum(F.col("vc") * F.col("vc")).over(w).alias("s2"),
    )
    return fr.where(F.col("n20") == 20).select(
        "user_id", "us", "event_id", "vc",
        (F.expr(_BOLL_MID) + F.lit(0.0)).alias("mid_cents"),
        (F.expr(_BOLL_UP) + F.lit(0.0)).alias("upper_cents"),
        (F.expr(_BOLL_LO) + F.lit(0.0)).alias("lower_cents"),
    )


# SMA-RSI: gains/losses are exact cent int64 frame sums, and
# RSI = 100*G/(G+L) needs only ONE double division — zero sqrt, zero
# transcendentals (100 - 100/(1+G/L) simplifies away).
_RSI = snap_sql("100.0 * g14 / (CAST(g14 AS DOUBLE) + l14)", 4)


@query(
    "ts_rsi",
    oracle=f"""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND value IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
    ),
    pairs AS (
        SELECT user_id, us, event_id, vc,
               vc - LAG(vc) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id, vc) AS d
        FROM base
    ),
    fr AS (
        SELECT user_id, us, event_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n14,
               CAST(SUM(CASE WHEN d > 0 THEN d ELSE 0 END) OVER w
                    AS BIGINT) AS g14,
               CAST(SUM(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER w
                    AS BIGINT) AS l14
        FROM pairs WHERE d IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id, d
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, us, event_id, g14 AS gain14, l14 AS loss14,
           {_RSI} + 0 AS rsi
    FROM fr WHERE n14 = 14 AND g14 + l14 > 0
    """,
)
def ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index (14-period SMA variant) over each user's
    purchase values: period-over-period cent deltas split into gains
    and losses, summed EXACTLY over a 14-row frame, and
    RSI = 100·G/(G+L) — the algebraic simplification of
    100 − 100/(1+RS) — needs exactly ONE double division on exact
    integers (no sqrt, no transcendental, nothing to accumulate in
    float).  Total order (us, event_id, vc) for the lag, then
    (us, event_id, d) over the delta rows pins the frame contents under
    duplicate rolls.  Partial frames and all-flat frames (G+L=0) are
    excluded on both sides.  One user-keyed exchange shared by the lag
    and frame windows (same partitioning)."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    w_lag = Window.partitionBy("user_id").orderBy("us", "event_id", "vc")
    pairs = ev.select(
        "user_id", "us", "event_id", "vc",
        (F.col("vc") - F.lag("vc").over(w_lag)).alias("d"),
    ).where(F.col("d").isNotNull())
    w_fr = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id", "d")
        .rowsBetween(-13, 0)
    )
    fr = pairs.select(
        "user_id", "us", "event_id",
        F.count(F.lit(1)).over(w_fr).alias("n14"),
        F.sum(
            F.when(F.col("d") > 0, F.col("d")).otherwise(F.lit(0))
        ).over(w_fr).alias("g14"),
        F.sum(
            F.when(F.col("d") < 0, -F.col("d")).otherwise(F.lit(0))
        ).over(w_fr).alias("l14"),
    )
    return fr.where(
        (F.col("n14") == 14) & (F.col("g14") + F.col("l14") > 0)
    ).select(
        "user_id", "us", "event_id",
        F.col("g14").alias("gain14"),
        F.col("l14").alias("loss14"),
        (F.expr(_RSI) + F.lit(0.0)).alias("rsi"),
    )


# Day-of-week uniformity: dow from pure epoch arithmetic (no calendar
# function — Spark dayofweek and DuckDB dayofweek disagree on week
# start), counts per cell exact, chi-square vs uniform as a fixed-order
# 7-term shared expression (the agg_chisq shape).
_DOW_TERMS = " + ".join(
    f"pow(d{i} - CAST(n AS DOUBLE) / 7.0, 2) / (CAST(n AS DOUBLE) / 7.0)"
    for i in range(7)
)
_DOW_CHI = snap_sql(_DOW_TERMS, 4)


@query(
    "ts_dow_profile",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               CAST((((CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 7)
                     + 7) % 7 AS BIGINT) AS dow
        FROM events
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    g AS (
        SELECT event_type,
            {", ".join(
                f"CAST(count(*) FILTER (dow = {i}) AS BIGINT) AS d{i}"
                for i in range(7))},
            CAST(count(*) AS BIGINT) AS n
        FROM base GROUP BY event_type
    )
    SELECT event_type, n AS n_events, {_DOW_CHI} + 0 AS chi2_dow
    FROM g WHERE n >= 7
    """,
)
def ts_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality per event type: counts per weekday cell
    plus a chi-square-vs-uniform score (is this event type weekday-
    shaped?).  The weekday index is PURE EPOCH ARITHMETIC —
    ((epoch_days % 7)+7)%7, identical in both dialects — because the
    engines' calendar dayofweek() functions disagree on week start
    (Spark 1=Sunday, DuckDB 0=Sunday); epoch division has no such
    seam (UTC session pin makes the day boundary identical).  Cell
    counts are exact conditional int64s in one aggregate per type; the
    statistic is a fixed-order 7-term shared tree snapped to 4.  One
    map-side-combined groupBy, |event types| rows out."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        "event_type",
        (
            (
                (
                    F.floor(
                        F.col("ts").cast("timestamp").cast("double")
                    ).cast("long")
                    / 86400
                ).cast("long")
                % 7
                + 7
            )
            % 7
        ).alias("dow"),
    )
    aggs = [
        F.sum(
            F.when(F.col("dow") == i, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias(f"d{i}")
        for i in range(7)
    ]
    aggs.append(F.count(F.lit(1)).alias("n"))
    g = ev.groupBy("event_type").agg(*aggs)
    return g.where(F.col("n") >= 7).select(
        "event_type",
        F.col("n").alias("n_events"),
        (F.expr(_DOW_CHI) + F.lit(0.0)).alias("chi2_dow"),
    )


# Kaplan-Meier: S(t) = prod_{ti<=t} (1 - d_i/n_i).  A float product is
# merge-order-dependent; ln((n-d)/n) per DISTINCT event time snaps to
# int64 1e-8 units (the llm_lm_score rule), the prefix sum is exact,
# and one exp at the end recovers S — bit-identical both engines.
_KM_LN_U = (
    "CAST(floor(ln((CAST(nr AS DOUBLE) - d) / nr) * 100000000.0 + 0.5)"
    " AS BIGINT)"
)
_KM_S = snap_sql("exp(CAST(cum_lu AS DOUBLE) / 100000000.0)", 4)


@query(
    "ts_survival_km",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(floor(epoch(MIN(ts))) AS BIGINT) AS first_s,
               CAST(floor(epoch(COALESCE(
                   MIN(ts) FILTER (event_type = 'error'), MAX(ts)
               ))) AS BIGINT) AS end_s,
               (COUNT(*) FILTER (event_type = 'error')) > 0 AS observed
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
              AND event_type IS NOT NULL
        GROUP BY user_id
    ),
    durs AS (
        SELECT CAST((end_s - first_s) // 86400 AS BIGINT) AS t_day, observed
        FROM per_user
    ),
    cells AS (
        SELECT t_day,
               CAST(count(*) FILTER (observed) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS a
        FROM durs GROUP BY t_day
    ),
    risk AS (
        SELECT t_day, d,
               CAST(SUM(a) OVER () - COALESCE(SUM(a) OVER (
                   ORDER BY t_day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS nr
        FROM cells
    ),
    ev AS (
        SELECT t_day, d, nr,
               CASE WHEN nr > d THEN {_KM_LN_U} ELSE 0 END AS lu,
               CASE WHEN nr = d THEN 1 ELSE 0 END AS dies_out
        FROM risk WHERE d > 0
    ),
    cum AS (
        SELECT t_day, d, nr,
               CAST(SUM(lu) OVER w AS BIGINT) AS cum_lu,
               CAST(SUM(dies_out) OVER w AS BIGINT) AS dead
        FROM ev
        WINDOW w AS (ORDER BY t_day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT t_day, nr AS n_risk, d AS n_events,
           CASE WHEN dead > 0 THEN 0.0 ELSE {_KM_S} + 0 END AS survival
    FROM cum
    """,
)
def ts_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-error per user
    (censored at the user's last observed event) — the churn/reliability
    estimator.  S(t) = Π(1−dᵢ/nᵢ) would be a merge-order-dependent
    float product; instead ln((n−d)/n) per DISTINCT event day snaps to
    exact int64 1e-8 units, the prefix sum is exact, and one exp at the
    end recovers S bit-identically (the llm_lm_score transcendental
    rule applied to a product).  A day where every remaining subject
    dies (n=d) pins S to exactly 0.0 from there on.  Shuffle shape:
    one user groupBy collapses events to |users| duration rows, one
    day groupBy to |distinct days| cells; the risk/survival windows run
    over that tiny table (single-partition by design — event-time
    cells, not raw data)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    epoch = F.floor(F.col("ts").cast("timestamp").cast("double")).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.min(epoch).alias("first_s"),
        F.coalesce(
            F.min(F.when(F.col("event_type") == "error", epoch)),
            F.max(epoch),
        ).alias("end_s"),
        (
            F.sum(
                F.when(F.col("event_type") == "error", F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            > 0
        ).alias("observed"),
    )
    durs = per_user.select(
        ((F.col("end_s") - F.col("first_s")) / 86400)
        .cast("long")
        .alias("t_day"),
        "observed",
    )
    cells = durs.groupBy("t_day").agg(
        F.sum(F.when(F.col("observed"), F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("d"),
        F.count(F.lit(1)).alias("a"),
    )
    w_all = Window.partitionBy()
    # windowed input = |distinct event-time days| cells (fixed by the
    # data's time span, not corpus size) — single-partition is bounded
    w_prev = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = cells.select(
        "t_day",
        "d",
        (
            F.sum("a").over(w_all)
            - F.coalesce(F.sum("a").over(w_prev), F.lit(0))
        ).alias("nr"),
    )
    evt = risk.where(F.col("d") > 0).select(
        "t_day",
        "d",
        "nr",
        F.expr(f"CASE WHEN nr > d THEN {_KM_LN_U} ELSE 0 END").alias("lu"),
        F.expr("CASE WHEN nr = d THEN 1 ELSE 0 END").alias("dies_out"),
    )
    # same |days|-bounded input as w_prev above
    w_run = Window.orderBy("t_day").rowsBetween(Window.unboundedPreceding, 0)
    cum = evt.select(
        "t_day",
        "d",
        "nr",
        F.sum("lu").over(w_run).alias("cum_lu"),
        F.sum("dies_out").over(w_run).alias("dead"),
    )
    return cum.select(
        "t_day",
        F.col("nr").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.expr(
            f"CASE WHEN dead > 0 THEN 0.0 ELSE {_KM_S} + 0 END"
        ).alias("survival"),
    )


# Seasonal decomposition, additive MA form: residual-from-trend stays
# EXACT by scaling through the frame width — r9 = 9*vc - S9 where S9 is
# the centered 9-row frame sum (ONE evaluation order, merge-order-free)
# — so the per-(user, hour) seasonal index is an exact int64 sum
# divided once: sr / (9 * n).  Zero transcendentals, zero snapped
# intermediates.
_SEAS = snap_sql("CAST(sr AS DOUBLE) / (9.0 * n)", 4)


@query(
    "ts_seasonal_hour",
    oracle=f"""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
              AND user_id IS NOT NULL AND event_id IS NOT NULL
    ),
    fr AS (
        SELECT user_id, us, vc,
               CAST(COUNT(*) OVER w AS BIGINT) AS n9,
               CAST(SUM(vc) OVER w AS BIGINT) AS s9
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id, vc
                     ROWS BETWEEN 4 PRECEDING AND 4 FOLLOWING)
    ),
    res AS (
        SELECT user_id,
               (us // 1000000) % 86400 // 3600 AS hour_of_day,
               9 * vc - s9 AS r9
        FROM fr WHERE n9 = 9
    ),
    g AS (
        SELECT user_id, hour_of_day, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(r9) AS BIGINT) AS sr
        FROM res GROUP BY user_id, hour_of_day
    )
    SELECT user_id, CAST(hour_of_day AS BIGINT) AS hour_of_day,
           n AS n_frames, {_SEAS} + 0 AS seasonal_cents
    FROM g
    """,
)
def ts_seasonal_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition by hour of day: detrend each
    user's event values with a CENTERED 9-row moving average, then
    average the residuals per (user, hour-of-day) — the
    classical-decomposition seasonal index a telemetry pipeline uses to
    normalize diurnal load before anomaly scoring.  Exactness trick:
    instead of the per-row double residual vc − S9/9 (whose per-group
    SUM would be merge-order-unpinned), the residual is scaled through
    the frame width — r9 = 9·vc − S9 is EXACT int64 (a ROWS-frame sum
    has one evaluation order), the per-bucket Σr9 is an exact int64
    aggregate, and the index is ONE double division Σr9/(9·n), snapped
    to 4 (+0 clears -0.0).  Hour-of-day comes from pure epoch integer
    arithmetic ((us // 1e6) % 86400 // 3600) — the round-6
    calendar-seam rule, no engine hour()/TZ involvement.  Total frame
    order (us, event_id, vc) pins frames under duplicate-id rolls;
    partial edge frames (n9 < 9) are excluded on both sides.  Shuffle
    shape: ONE user_id exchange feeds the frame window, then a
    map-side-combined (user, hour) groupBy over |users|·24 output
    groups.  Overflow: |r9| ≤ 9·5e4 cents ⇒ Σr9 int64-exact past 2e13
    rows/user-hour."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id", "vc")
        .rowsBetween(-4, 4)
    )
    fr = ev.select(
        "user_id", "us", "vc",
        F.count(F.lit(1)).over(w).alias("n9"),
        F.sum("vc").over(w).alias("s9"),
    )
    res = fr.where(F.col("n9") == 9).select(
        "user_id",
        F.expr("(us div 1000000) % 86400 div 3600").alias("hour_of_day"),
        (9 * F.col("vc") - F.col("s9")).alias("r9"),
    )
    g = res.groupBy("user_id", "hour_of_day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r9").alias("sr"),
    )
    return g.select(
        "user_id",
        F.col("hour_of_day").cast("long").alias("hour_of_day"),
        F.col("n").alias("n_frames"),
        (F.expr(_SEAS) + F.lit(0.0)).alias("seasonal_cents"),
    )


@query(
    "ts_peak_detect",
    oracle="""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
              AND user_id IS NOT NULL AND event_id IS NOT NULL
    ),
    lagged AS (
        SELECT user_id, us, event_id, vc,
               LAG(vc) OVER w AS prev, LEAD(vc) OVER w AS nxt
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id, vc)
    )
    SELECT user_id, us, event_id, vc AS peak_cents,
           vc - prev AS rise_cents, vc - nxt AS fall_cents
    FROM lagged
    WHERE prev IS NOT NULL AND nxt IS NOT NULL
          AND vc > prev AND vc > nxt
    """,
)
def ts_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum (peak) detection over each user's event series —
    the spike-finding primitive under alerting and burst analysis: a
    row is a peak iff its value strictly exceeds BOTH neighbors in the
    user's time order.  Pure integer arithmetic end to end (cents via
    round-to-int64, strict > comparisons, exact rise/fall deltas) —
    zero doubles, zero snapping, the strongest cross-engine form.
    Total neighbor order (us, event_id, vc) pins lag/lead under
    duplicate-(ts,event_id) rolls; series endpoints (no neighbor on one
    side) are never peaks on either engine.  Shuffle shape: ONE
    user_id exchange, one window pass, a row-local filter — no second
    exchange, output is the peak subset only."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id", "vc")
    lagged = ev.select(
        "user_id", "us", "event_id", "vc",
        F.lag("vc").over(w).alias("prev"),
        F.lead("vc").over(w).alias("nxt"),
    )
    return lagged.where(
        F.col("prev").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("vc") > F.col("prev"))
        & (F.col("vc") > F.col("nxt"))
    ).select(
        "user_id", "us", "event_id",
        F.col("vc").alias("peak_cents"),
        (F.col("vc") - F.col("prev")).alias("rise_cents"),
        (F.col("vc") - F.col("nxt")).alias("fall_cents"),
    )


# Rolling OLS trend: with the regressor re-based to the frame (x' =
# 0..23 inside every FULL 24-row frame), Σx' = 276 and Σx'² = 4324 are
# CONSTANTS, so the least-squares denominator 24·4324 − 276² = 27600
# is a compile-time integer and the numerator stays an exact int64
# combination of two frame sums — zero transcendentals, one double
# division at the end.
_RSLOPE = snap_sql("CAST(slope_num AS DOUBLE) / 27600.0", 4)


@query(
    "ts_rolling_slope",
    oracle=f"""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND value IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
    ),
    rn AS (
        SELECT user_id, us, event_id, vc,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY us, event_id, vc) AS BIGINT) AS rn
        FROM base
    ),
    fr AS (
        SELECT user_id, us, event_id, vc, rn,
               CAST(COUNT(*) OVER w AS BIGINT) AS n24,
               CAST(SUM(vc) OVER w AS BIGINT) AS sy,
               CAST(SUM(rn * vc) OVER w AS BIGINT) AS sxy_raw
        FROM rn
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id, vc
                     ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, us, event_id, vc,
           CAST(24 * (sxy_raw - (rn - 23) * sy) - 276 * sy AS BIGINT)
               AS slope_num,
           {_RSLOPE} + 0 AS slope_cents_per_step
    FROM fr WHERE n24 = 24
    """,
)
def ts_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling least-squares trend slope (cents per event step) over
    each user's last 24 purchases — the windowed drift detector that
    complements ts_theil_sen's robust global slope.  The regressor is
    the IN-FRAME index x' = 0..23 (re-based from the per-user row
    number by the frame's first rank rn−23), so Σx' = 276 and
    Σx'² = 4324 are constants, the OLS denominator n·Σx'²−(Σx')² =
    27600 is compile-time, and the numerator 24·Σx'y − 276·Σy reduces
    to two exact int64 ROWS-frame sums (merge-order-free, one
    evaluation order) — the ts_bollinger discipline with the rank
    algebra of agg_spearman.  slope_num is exposed as exact BIGINT;
    the per-step slope is ONE double division snapped to 4 (+0 clears
    -0.0).  Total order (us, event_id, vc) pins frames on duplicate-id
    rolls; partial leading frames are excluded on both sides.  ONE
    user-keyed exchange shared by the rank and frame windows (same
    partitioning, one sort).  Overflow: Σrn·vc over a 24-frame ≤
    24·n_user·5e4 ⇒ int64 holds past 7e12 events/user; the re-based
    numerator itself is ≤ 24·23·5e4."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    w_rank = Window.partitionBy("user_id").orderBy("us", "event_id", "vc")
    rn = ev.select(
        "user_id", "us", "event_id", "vc",
        F.row_number().over(w_rank).cast("long").alias("rn"),
    )
    # frame window orders by the SAME total-order keys as the rank
    # window (rn order ≡ (us, event_id, vc) order by construction), so
    # Spark reuses one sort instead of re-sorting by rn
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id", "vc")
        .rowsBetween(-23, 0)
    )
    fr = rn.select(
        "user_id", "us", "event_id", "vc", "rn",
        F.count(F.lit(1)).over(w).alias("n24"),
        F.sum("vc").over(w).alias("sy"),
        F.sum(F.col("rn") * F.col("vc")).over(w).alias("sxy_raw"),
    )
    return fr.where(F.col("n24") == 24).select(
        "user_id", "us", "event_id", "vc",
        (
            24 * (F.col("sxy_raw") - (F.col("rn") - 23) * F.col("sy"))
            - 276 * F.col("sy")
        ).cast("long").alias("slope_num"),
        (F.expr(_RSLOPE) + F.lit(0.0)).alias("slope_cents_per_step"),
    )


# Durbin–Watson: DW = n·Σ(Δv)² / (n·Σv² − (Σv)²).  Numerator and the
# variance discriminant are exact int64 sums; the ratio is ONE shared
# double tree whose every cast starts from an int64-exact value (the
# _AC_R discipline).  DW ∈ [0,4] is bounded, so snap-4 is magnitude-safe.
_DW_EXPR = snap_sql(
    "(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv)", 4
)


@query(
    "ts_durbin_watson",
    oracle=f"""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND value IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
    ),
    pairs AS (
        SELECT user_id, vc,
               vc - LAG(vc) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id, vc) AS d
        FROM base
    ),
    g AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(vc) AS BIGINT) AS sv,
               CAST(SUM(vc * vc) AS BIGINT) AS svv,
               CAST(SUM(d * d) AS BIGINT) AS sdd,
               MAX(vc) AS mx, MIN(vc) AS mn
        FROM pairs GROUP BY user_id
    )
    SELECT user_id, n AS n_rows, sdd AS sq_diff_sum,
           {_DW_EXPR} + 0 AS dw
    FROM g WHERE n >= 2 AND mx > mn
    """,
)
def ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson serial-correlation statistic per user purchase
    series — the classical is-the-noise-autocorrelated test (DW ≈ 2 ⇒
    independent, → 0 ⇒ positive, → 4 ⇒ negative serial correlation).
    Centering cancels in the first difference (Δ(v − v̄) = Δv), so
    DW = Σ(Δv)² / Σ(v − v̄)² cross-multiplies to
    n·Σ(Δv)² / (n·Σv² − (Σv)²): numerator and discriminant are EXACT
    int64 sums over cent units; the single double tree is shared
    verbatim with the oracle and every cast starts from an int64-exact
    value (round-8 rule), snapped to 4 (+0 clears -0.0).  Degeneracy
    guard is max > min, never integer products.  One user-keyed lag
    window + a groupBy on the same key — ONE exchange, raw events never
    shuffle twice.  Overflow budget: vc ≤ ~4e4 cents ⇒ Σvc² ≤ 1.6e9·n
    (int64 to ~5.7e9 rows/user), ΣΔ² ≤ 6.4e9·n; the n·sums land in
    DOUBLE, not int64, so there is no product cliff."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id", "vc")
    pairs = ev.select(
        "user_id", "vc", (F.col("vc") - F.lag("vc").over(w)).alias("d")
    )
    g = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("sv"),
        F.sum(F.col("vc") * F.col("vc")).alias("svv"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.max("vc").alias("mx"),
        F.min("vc").alias("mn"),
    )
    return g.where((F.col("n") >= 2) & (F.col("mx") > F.col("mn"))).select(
        "user_id",
        F.col("n").alias("n_rows"),
        F.col("sdd").alias("sq_diff_sum"),
        (F.expr(_DW_EXPR) + F.lit(0.0)).alias("dw"),
    )


# Stochastic oscillator %K over the last 14 purchases: frame min/max are
# exact integers, %K is one double division of int64-exact casts.
_STOCH_K = snap_sql(
    "100.0 * CAST(vc - lo14 AS DOUBLE) / CAST(hi14 - lo14 AS DOUBLE)", 4
)


@query(
    "ts_stochastic_osc",
    oracle=f"""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND value IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
    ),
    fr AS (
        SELECT user_id, us, event_id, vc,
               CAST(COUNT(*) OVER w AS BIGINT) AS n14,
               MIN(vc) OVER w AS lo14,
               MAX(vc) OVER w AS hi14
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id, vc
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, us, event_id, vc, lo14 AS lo14_cents,
           hi14 AS hi14_cents, {_STOCH_K} + 0 AS pct_k
    FROM fr WHERE n14 = 14 AND hi14 > lo14
    """,
)
def ts_stochastic_osc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator %K = 100·(v − min₁₄)/(max₁₄ − min₁₄) over
    each user's last 14 purchases — the where-in-the-recent-range
    momentum gauge complementing ts_bollinger's dispersion bands.
    Frame min/max/count are exact integers over a ROWS frame (one
    evaluation order, merge-order-free); %K is ONE double division of
    int64-exact casts, snapped to 4 (+0 clears -0.0) and bounded in
    [0,100] so snap is magnitude-safe at any corpus size.  Partial
    leading frames and flat frames (hi = lo, the ANSI ÷0 seam) are
    excluded by integer predicates on BOTH sides.  Total order
    (us, event_id, vc) pins frames on duplicate-id rolls.  ONE
    user-keyed exchange; the frame window is the only sort."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id", "vc")
        .rowsBetween(-13, 0)
    )
    fr = ev.select(
        "user_id", "us", "event_id", "vc",
        F.count(F.lit(1)).over(w).alias("n14"),
        F.min("vc").over(w).alias("lo14"),
        F.max("vc").over(w).alias("hi14"),
    )
    return fr.where(
        (F.col("n14") == 14) & (F.col("hi14") > F.col("lo14"))
    ).select(
        "user_id", "us", "event_id", "vc",
        F.col("lo14").alias("lo14_cents"),
        F.col("hi14").alias("hi14_cents"),
        (F.expr(_STOCH_K) + F.lit(0.0)).alias("pct_k"),
    )


# Max drawdown: running peak and drawdown are exact integers; the
# per-row fraction is one division with a greatest(peak,1) denominator
# (round-4 ANSI ÷0 rule), snapped to 8 BEFORE the max (selection over
# identical bits), final snap to 4.
_DD_FRAC = snap_sql(
    "CAST(dd AS DOUBLE) / CAST(greatest(peak, 1) AS DOUBLE)", 8
)


@query(
    "ts_max_drawdown",
    oracle=f"""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND value IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
    ),
    run AS (
        SELECT user_id, vc,
               MAX(vc) OVER (PARTITION BY user_id
                             ORDER BY us, event_id, vc
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS peak
        FROM base
    ),
    dd AS (
        SELECT user_id, vc, peak, peak - vc AS dd,
               {_DD_FRAC} AS frac
        FROM run
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MAX(peak) AS peak_cents, MAX(dd) AS max_dd_cents,
           floor(MAX(frac) * 10000 + 0.5) / 10000 + 0 AS max_dd_frac
    FROM dd GROUP BY user_id
    """,
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user purchase series: running peak (ROWS
    unbounded-preceding max, exact int64), per-row drawdown
    dd = peak − v, and the per-user max of both the cent drawdown and
    the drawdown FRACTION dd/peak.  The fraction is the only double —
    one division with a greatest(peak,1) denominator, snapped to 8
    per-row BEFORE the max (max is selection, so identical bits
    survive aggregation on both engines), final snap to 4 (+0 clears
    -0.0); the fraction is bounded in [0,1] so snapping is
    magnitude-safe.  Total order (us, event_id, vc) pins the running
    peak on duplicate-id rolls.  ONE user-keyed exchange shared by the
    window and the groupBy."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id", "vc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = ev.select(
        "user_id", "vc", F.max("vc").over(w).alias("peak")
    )
    dd = run.select(
        "user_id", "vc", "peak",
        (F.col("peak") - F.col("vc")).alias("dd"),
    ).withColumn("frac", F.expr(_DD_FRAC))
    return dd.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("peak").alias("peak_cents"),
        F.max("dd").alias("max_dd_cents"),
        (
            F.floor(F.max("frac") * 10000 + F.lit(0.5)) / 10000
            + F.lit(0.0)
        ).alias("max_dd_frac"),
    )


@query(
    "ts_sma_crossover",
    oracle="""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND value IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
    ),
    fr AS (
        SELECT user_id, us, event_id, vc,
               CAST(COUNT(*) OVER w10 AS BIGINT) AS n10,
               CAST(SUM(vc) OVER w3 AS BIGINT) AS s3,
               CAST(SUM(vc) OVER w10 AS BIGINT) AS s10
        FROM base
        WINDOW w3 AS (PARTITION BY user_id ORDER BY us, event_id, vc
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
               w10 AS (PARTITION BY user_id ORDER BY us, event_id, vc
                       ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    ),
    sig AS (
        SELECT user_id, us, event_id, vc, s3, s10,
               CASE WHEN 10 * s3 > 3 * s10 THEN 1
                    WHEN 10 * s3 < 3 * s10 THEN -1 ELSE 0 END AS side,
               LAG(CASE WHEN 10 * s3 > 3 * s10 THEN 1
                        WHEN 10 * s3 < 3 * s10 THEN -1 ELSE 0 END)
                   OVER (PARTITION BY user_id
                         ORDER BY us, event_id, vc) AS prev_side
        FROM fr WHERE n10 = 10
    )
    SELECT user_id, us, event_id, vc, s3, s10,
           CASE WHEN side = 1 THEN 'golden' ELSE 'death' END AS cross_type
    FROM sig
    WHERE prev_side IS NOT NULL AND side <> 0 AND prev_side <> side
          AND prev_side <> 0
    """,
)
def ts_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover detector (golden/death cross of the
    3- vs 10-purchase simple averages) per user — the classical trend
    signal, with ZERO floating point: avg₃ vs avg₁₀ cross-multiplies
    to 10·s3 vs 3·s10, side ∈ {−1,0,+1} is an
    integer CASE, and a crossover is a lag-compare sign flip — every
    predicate exact int64 on both engines.  Ties (10·s3 = 3·s10) are a
    NEUTRAL side that ends a streak without emitting a cross (stated
    convention, same CASE both sides; a cross requires prev and cur
    strictly opposite non-zero sides).  Frames shorter than 10 are
    excluded by the integer n10 predicate.  The two frame sums and the
    lag share ONE user-keyed exchange and ONE sort (identical
    partition + order keys).  Overflow: 3·s10 ≤ 30·vc_max ~ 1.2e6 —
    nowhere near any cliff."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    order = ["us", "event_id", "vc"]
    w3 = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-2, 0)
    w10 = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-9, 0)
    fr = ev.select(
        "user_id", "us", "event_id", "vc",
        F.count(F.lit(1)).over(w10).alias("n10"),
        F.sum("vc").over(w3).alias("s3"),
        F.sum("vc").over(w10).alias("s10"),
    )
    side = (
        F.when(10 * F.col("s3") > 3 * F.col("s10"), 1)
        .when(10 * F.col("s3") < 3 * F.col("s10"), -1)
        .otherwise(0)
    )
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    sig = fr.where(F.col("n10") == 10).select(
        "user_id", "us", "event_id", "vc", "s3", "s10",
        side.alias("side"),
        F.lag(side).over(w_lag).alias("prev_side"),
    )
    return sig.where(
        F.col("prev_side").isNotNull()
        & (F.col("side") != 0)
        & (F.col("prev_side") != 0)
        & (F.col("prev_side") != F.col("side"))
    ).select(
        "user_id", "us", "event_id", "vc", "s3", "s10",
        F.when(F.col("side") == 1, "golden").otherwise("death")
        .alias("cross_type"),
    )


@query(
    "ts_rolling_median",
    oracle="""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND value IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
    ),
    fr AS (
        SELECT user_id, us, event_id, vc,
               CAST(COUNT(*) OVER w AS BIGINT) AS n15,
               list_sort(list(vc) OVER w)[8] AS med15
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id, vc
                     ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, us, event_id, vc, med15
    FROM fr WHERE n15 = 15
    """,
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling LOWER median over each user's last 15 purchases — the
    robust smoother that survives the spikes ts_ewma follows (the
    median filter of signal processing, windowed).  The frame is
    materialized as an in-memory 15-element array per row
    (collect_list / list over a ROWS frame — a multiset, so no
    ordering seam), canonically sorted, and indexed at 8 = the exact
    8th-smallest — an integer CENT value, zero floating point
    anywhere.  Arrays stay INTERNAL (the output column is the scalar
    median — the round-7 no-complex-outputs rule); partial leading
    frames are excluded by the integer n15 predicate on both sides.
    ONE user-keyed exchange, ONE sort; the per-row array sort is
    O(K log K) with K = 15 FIXED — cost per row is a constant
    independent of corpus size, the right trade against a 15x
    explode-join at 100 TB."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id", "vc")
        .rowsBetween(-14, 0)
    )
    fr = ev.select(
        "user_id", "us", "event_id", "vc",
        F.count(F.lit(1)).over(w).alias("n15"),
        F.element_at(
            F.sort_array(F.collect_list("vc").over(w)), 8
        ).alias("med15"),
    )
    return fr.where(F.col("n15") == 15).select(
        "user_id", "us", "event_id", "vc", "med15"
    )


@query(
    "ts_turning_points",
    oracle="""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND value IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
    ),
    nb AS (
        SELECT user_id, vc,
               LAG(vc) OVER w AS pv,
               LEAD(vc) OVER w AS nx
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id, vc)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN pv < vc AND nx < vc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_peaks,
           CAST(SUM(CASE WHEN pv > vc AND nx > vc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_valleys,
           CAST(SUM(CASE WHEN (pv < vc AND nx < vc)
                           OR (pv > vc AND nx > vc)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
    FROM nb
    GROUP BY user_id
    HAVING COUNT(*) >= 3
    """,
)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point census per user — counts of STRICT local maxima
    (prev < x > next) and minima (prev > x < next) in the purchase
    cent series, the classical nonparametric volatility/randomness
    census (an i.i.d. series has ~2(n−2)/3 turning points).  Exact
    integers end to end: cents comparisons and conditional counts
    only, no floating point anywhere.  Plateau members are NOT turning
    points (strict inequalities both sides — the convention stated so
    ties can't fragment differently per engine; rows tying on the full
    (us, event_id, vc) order key are identical, so lag/lead values are
    invariant to intra-tie order).  One user-keyed window + groupBy
    sharing the same partitioning — a single exchange."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id", "vc")
    nb = ev.select(
        "user_id", "vc",
        F.lag("vc").over(w).alias("pv"),
        F.lead("vc").over(w).alias("nx"),
    )
    peak = (F.col("pv") < F.col("vc")) & (F.col("nx") < F.col("vc"))
    valley = (F.col("pv") > F.col("vc")) & (F.col("nx") > F.col("vc"))

    def cnt(cond, name):
        return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast(
            "long"
        ).alias(name)

    return (
        nb.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            cnt(peak, "n_peaks"),
            cnt(valley, "n_valleys"),
            cnt(peak | valley, "n_turning"),
        )
        .where(F.col("n_events") >= 3)
    )


_VWAP = snap_sql("CAST(spq AS DOUBLE) / CAST(sq AS DOUBLE)", 4)


@query(
    "ts_vwap",
    oracle=f"""
    WITH base AS (
        SELECT CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400 // 7
                   AS wk,
               CAST(floor(l_quantity) AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc
        FROM lineitem
        WHERE l_shipdate IS NOT NULL AND l_quantity IS NOT NULL
              AND l_extendedprice IS NOT NULL AND l_quantity > 0
    ),
    g AS (
        SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(q) AS BIGINT) AS sq,
               CAST(SUM(pc * q) AS BIGINT) AS spq
        FROM base GROUP BY wk
    )
    SELECT wk, n_lines, sq AS sum_qty, spq AS sum_price_qty,
           {_VWAP} + 0 AS vwap_cents
    FROM g
    """,
)
def ts_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per ship WEEK — the canonical
    market/throughput downsample: Σ(price·qty)/Σ(qty) with price in
    exact cents and quantity floored to exact units.  The week bucket
    is PURE EPOCH ARITHMETIC (epoch_seconds // 86400 // 7 — the
    ts_dow_profile rule: calendar week functions disagree on week
    start across engines, integer division has no seam; UTC pin makes
    the day boundary identical).  Numerator and denominator are
    EXPOSED as exact BIGINTs; the VWAP itself is one snapped division.
    Overflow: Σ pc·q ≤ 5e8/row → int64-safe to ~1.8e10 rows,
    documented.  ONE map-side-combined groupBy — the corpus collapses
    to |weeks| rows before the exchange."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").isNotNull()
        & F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & (F.col("l_quantity") > 0)
    ).select(
        F.expr(
            # Spark `div` truncates toward zero while the oracle's `//`
            # floors; they agree ONLY because epoch(l_shipdate) > 0 for
            # all TPC-H dates (ADVICE r11) — a signed quantity (pre-1970
            # ts, differences) needs the floor-div pairing in NOTES.md.
            "CAST(floor(CAST(CAST(l_shipdate AS TIMESTAMP) AS DOUBLE))"
            " AS BIGINT) div 86400 div 7"
        ).alias("wk"),
        F.floor("l_quantity").cast("long").alias("q"),
        money_units(F.col("l_extendedprice"), 2).alias("pc"),
    )
    g = li.groupBy("wk").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("q").alias("sq"),
        F.sum(F.col("pc") * F.col("q")).alias("spq"),
    )
    return g.select(
        "wk",
        "n_lines",
        F.col("sq").alias("sum_qty"),
        F.col("spq").alias("sum_price_qty"),
        (F.expr(_VWAP) + F.lit(0.0)).alias("vwap_cents"),
    )


_ATR = snap_sql("CAST(trsum AS DOUBLE) / CAST(nw AS DOUBLE)", 4)


@query(
    "ts_atr",
    oracle=f"""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND value IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
    ),
    bars AS (
        SELECT user_id, us // 86400000000 AS day,
               MAX(vc) AS hi, MIN(vc) AS lo,
               arg_max(vc, printf('%020d%012d', us, event_id)) AS cl
        FROM base GROUP BY user_id, us // 86400000000
    ),
    tr AS (
        SELECT user_id, day, hi, lo, cl,
               CAST(CASE WHEN pc IS NULL THEN hi - lo
                    ELSE greatest(hi - lo, abs(hi - pc), abs(lo - pc))
                    END AS BIGINT) AS tr
        FROM (
            SELECT user_id, day, hi, lo, cl,
                   LAG(cl) OVER (PARTITION BY user_id ORDER BY day) AS pc
            FROM bars
        )
    ),
    win AS (
        SELECT user_id, day, tr,
               CAST(SUM(tr) OVER w AS BIGINT) AS trsum,
               CAST(COUNT(*) OVER w AS BIGINT) AS nw
        FROM tr
        WINDOW w AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, day, tr AS tr_cents, nw AS n_bars,
           {_ATR} + 0 AS atr_cents
    FROM win
    """,
)
def ts_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average True Range (Wilder's volatility measure, simple-mean
    variant) over per-user DAILY purchase bars: true range =
    max(hi−lo, |hi−prev_close|, |lo−prev_close|) in exact cents (first
    bar: hi−lo), averaged over a ROWS 13-preceding window — a
    ROWS-frame int64 sum (merge-order-free, the round-6 rolling rule)
    with one snapped division.  Bars come from one (user, day) groupBy
    with the ts_ohlc determinism discipline: the close picks max_by on
    a zero-padded (us, event_id) string key — a total order identical
    in both engines; the day bucket is pure epoch integer division.
    Shuffle shape: one (user, day) map-side-combined groupBy, then a
    user-keyed window — bars, not raw events, cross the second
    exchange."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    key = F.format_string("%020d%012d", F.col("us"), F.col("event_id"))
    bars = ev.groupBy(
        "user_id", F.expr("us div 86400000000").alias("day")
    ).agg(
        F.max("vc").alias("hi"),
        F.min("vc").alias("lo"),
        F.max_by("vc", key).alias("cl"),
    )
    wd = Window.partitionBy("user_id").orderBy("day")
    tr = bars.select(
        "user_id", "day", "hi", "lo", "cl",
        F.lag("cl").over(wd).alias("pc"),
    ).select(
        "user_id", "day",
        F.when(
            F.col("pc").isNull(), F.col("hi") - F.col("lo")
        ).otherwise(
            F.greatest(
                F.col("hi") - F.col("lo"),
                F.abs(F.col("hi") - F.col("pc")),
                F.abs(F.col("lo") - F.col("pc")),
            )
        ).cast("long").alias("tr"),
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-13, Window.currentRow)
    )
    win = tr.select(
        "user_id", "day", "tr",
        F.sum("tr").over(wf).alias("trsum"),
        F.count(F.lit(1)).over(wf).alias("nw"),
    )
    return win.select(
        "user_id",
        "day",
        F.col("tr").alias("tr_cents"),
        F.col("nw").alias("n_bars"),
        (F.expr(_ATR) + F.lit(0.0)).alias("atr_cents"),
    )


@query(
    "ts_obv",
    oracle="""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND value IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
    ),
    d AS (
        SELECT user_id, us, event_id, vc,
               CAST(CASE WHEN pv IS NULL THEN 0
                    WHEN vc > pv THEN vc
                    WHEN vc < pv THEN -vc
                    ELSE 0 END AS BIGINT) AS step
        FROM (
            SELECT user_id, us, event_id, vc,
                   LAG(vc) OVER w AS pv
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id, vc)
        )
    )
    SELECT user_id, us, event_id, vc,
           CAST(SUM(step) OVER (PARTITION BY user_id
                ORDER BY us, event_id, vc
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS obv_cents
    FROM d
    """,
)
def ts_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume (value-weighted direction variant) per user:
    the running sum of +vc on an up-move, −vc on a down-move, 0 on a
    flat — the classical accumulation/distribution momentum line,
    here over purchase cents.  Exact int64 end to end: the step is an
    integer CASE on a lag comparison and the accumulator is a
    ROWS-frame running sum (single evaluation order — the round-6
    merge-order-free frame rule).  First row steps 0 (no prior).
    Rows tying on the full (us, event_id, vc) order key are identical,
    so lag and the running sum are invariant to intra-tie order.
    Overflow: Σ|vc| ≤ 1e7 · per-user history — int64-safe to ~1e11
    purchases/user.  ONE user-keyed exchange shared by the lag window
    and the running sum (same partition + order)."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        money_units(F.col("value"), 2).alias("vc"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id", "vc")
    d = ev.select(
        "user_id", "us", "event_id", "vc",
        F.lag("vc").over(w).alias("pv"),
    ).select(
        "user_id", "us", "event_id", "vc",
        F.when(F.col("pv").isNull(), F.lit(0))
        .when(F.col("vc") > F.col("pv"), F.col("vc"))
        .when(F.col("vc") < F.col("pv"), -F.col("vc"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("step"),
    )
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return d.select(
        "user_id", "us", "event_id", "vc",
        F.sum("step").over(wr).alias("obv_cents"),
    )


# --- round-12 additions: seasonality strength + cross-correlation -------
# Both collapse the corpus to a bounded |days| table in ONE map-side-
# combined groupBy (the time span is fixed — days do NOT grow with
# scale factor; per-day mass does), so everything after the collapse
# is constant-cost at any corpus size.

# eta² = SSB/SST over the 7 epoch-day-mod-7 buckets, evaluated in ONE
# explicitly parenthesized double tree from exact int64 power sums
# (the agg_bartlett pivot pattern: the |groups| dimension is
# conditional-aggregated into one row, so no cross-row double sum
# exists).  Terms for empty buckets contribute 0 via the n>0 guards.
_SEAS_GTERM = "(CASE WHEN n{g} > 0 THEN (CAST(s{g} AS DOUBLE) * s{g}) / CAST(n{g} AS DOUBLE) ELSE 0.0 END)"
_SEAS_BETWEEN = "(" + " + ".join(_SEAS_GTERM.format(g=g) for g in range(7)) + ")"
_SEAS_N = "(CAST(n0+n1+n2+n3+n4+n5+n6 AS DOUBLE))"
_SEAS_S = "(CAST(s0+s1+s2+s3+s4+s5+s6 AS DOUBLE))"
_SEAS_SS = "(CAST(ss0+ss1+ss2+ss3+ss4+ss5+ss6 AS DOUBLE))"
_SEAS_MEANSQ = f"(({_SEAS_S} * {_SEAS_S}) / {_SEAS_N})"
_SEAS_ETA2 = None  # assembled below (needs snap_sql import at module top)


def _seas_eta2_expr() -> str:
    from hadoop_fixedlengthinputformat_spark.functions.num import snap_sql as _s

    return _s(
        f"({_SEAS_BETWEEN} - {_SEAS_MEANSQ}) / ({_SEAS_SS} - {_SEAS_MEANSQ})",
        4,
    )


def _seas_oracle() -> str:
    gsel = []
    for g in range(7):
        gsel.append(
            f"CAST(SUM(CASE WHEN dow = {g} THEN 1 ELSE 0 END) AS BIGINT) AS n{g},\n"
            f"               CAST(SUM(CASE WHEN dow = {g} THEN y ELSE 0 END) AS BIGINT) AS s{g},\n"
            f"               CAST(SUM(CASE WHEN dow = {g} THEN y * y ELSE 0 END) AS BIGINT) AS ss{g}"
        )
    cols = ",\n               ".join(gsel)
    eta = _seas_eta2_expr()
    return f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400 AS day,
               CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                    AS BIGINT) // 10000000 AS y
        FROM lineitem
        WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
              AND l_discount IS NOT NULL
        GROUP BY 1
    ),
    tagged AS (SELECT day % 7 AS dow, y FROM daily),
    piv AS (
        SELECT {cols}
        FROM tagged
    )
    SELECT CAST(n0+n1+n2+n3+n4+n5+n6 AS BIGINT) AS n_days,
           {eta} + 0 AS eta2_dow,
           ({eta}) > 0.2 AS is_seasonal
    FROM piv
    WHERE ({_SEAS_SS} - {_SEAS_MEANSQ}) > 0
    """


@query("ts_seasonality_strength", oracle=_seas_oracle())
def ts_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonality strength of daily shipped revenue: the
    one-way eta² (SSB/SST) of daily revenue across the 7 epoch-day
    mod-7 buckets — the variance share a weekly cycle explains, the
    seasonality test run before choosing a rollup grain.  Buckets are
    day % 7 on the EPOCH day number, not a calendar weekday (the
    ts_dow_profile rule: week-start conventions differ across engines;
    mod-7 on an integer has no seam).  Daily revenue is exact integer
    kilodollar units (revenue micro-units div 1e7 — re-united so
    Σ y² ≤ ~4e13 at sf1; daily y grows linearly with scale factor
    while |days| is fixed, so Σ y² grows ~sf² and crosses int64 max
    (~9.2e18) near sf~480 — int64-safe to ~sf400, NOT sf1000; re-unit
    y by another 10× if a larger corpus is ever targeted); the 7
    buckets pivot into ONE row by conditional aggregation (the
    agg_bartlett shape), so eta² is a single identically parenthesized
    double tree over exact int64 sums, snapped to 4 (+0).  Shuffle
    shape: one map-side-combined day collapse (|days| is FIXED by the
    data's time span), a 7-bucket pivot to 1 row — corpus read once."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & F.col("l_discount").isNotNull()
    ).select(
        F.expr(
            "CAST(floor(CAST(CAST(l_shipdate AS TIMESTAMP) AS DOUBLE))"
            " AS BIGINT) div 86400"
        ).alias("day"),
        (
            money_units(F.col("l_extendedprice"), 2)
            * (F.lit(100) - money_units(F.col("l_discount"), 2))
        ).alias("units"),
    )
    daily = li.groupBy("day").agg(
        F.expr("CAST(SUM(units) AS BIGINT) div 10000000").alias("y")
    )
    tagged = daily.select((F.col("day") % 7).alias("dow"), "y")
    aggs = []
    for g in range(7):
        aggs.append(
            F.sum(F.when(F.col("dow") == g, 1).otherwise(0))
            .cast("long").alias(f"n{g}")
        )
        aggs.append(
            F.sum(F.when(F.col("dow") == g, F.col("y")).otherwise(0))
            .cast("long").alias(f"s{g}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("dow") == g, F.col("y") * F.col("y")).otherwise(0)
            ).cast("long").alias(f"ss{g}")
        )
    piv = tagged.agg(*aggs)
    eta = _seas_eta2_expr()
    return piv.where(
        F.expr(f"({_SEAS_SS} - {_SEAS_MEANSQ}) > 0")
    ).select(
        F.expr("CAST(n0+n1+n2+n3+n4+n5+n6 AS BIGINT)").alias("n_days"),
        (F.expr(eta) + F.lit(0.0)).alias("eta2_dow"),
        F.expr(f"({eta}) > 0.2").alias("is_seasonal"),
    )


def _lag_corr_oracle() -> str:
    from hadoop_fixedlengthinputformat_spark.operators.stats_extras import (
        _corr_expr,
    )

    corr = _corr_expr("sx", "sy", "sxx", "syy", "sxy")
    return f"""
    WITH od AS MATERIALIZED (
        SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
               CAST(count(*) AS BIGINT) AS oc
        FROM orders WHERE o_orderdate IS NOT NULL
        GROUP BY 1
    ),
    ld AS MATERIALIZED (
        SELECT CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400 AS day,
               CAST(count(*) AS BIGINT) AS lc
        FROM lineitem WHERE l_shipdate IS NOT NULL
        GROUP BY 1
    ),
    lags AS (SELECT unnest(generate_series(0, 5)) AS lag),
    j AS (
        SELECT lags.lag, od.oc AS x, ld.lc AS y
        FROM lags
        JOIN od ON true
        JOIN ld ON ld.day = od.day + lags.lag
    ),
    s AS (
        SELECT lag, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM j GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
           {corr} + 0 AS corr
    FROM s
    WHERE n >= 2 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    """


@query("ts_lag_corr", oracle=_lag_corr_oracle())
def ts_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation of daily order volume against daily shipment
    volume at lags 0–5 days — the lead/lag discovery a pipeline runs
    before aligning two event streams.  Both series collapse to exact
    int64 counts per epoch day (|days| fixed by the time span); each
    lag joins the order grid to the shipment grid shifted by k (an
    equi-join on day + k against the 6-row broadcast lag table), and
    Pearson r evaluates per lag from exact power sums in the
    _corr_expr DOUBLE convention (stats_extras: the n·S₂ products live
    in doubles, sqrt snaps to 8, r snaps to 4).  Budget: daily counts
    ≤ ~1e5 at sf1000 → Σx² ≤ 2.4e13, exact.  Degenerate (constant)
    series emit no row — the integer variance guard is identical both
    sides."""
    from hadoop_fixedlengthinputformat_spark.operators.stats_extras import (
        _corr_expr,
    )

    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").isNotNull()
    )
    od = o.groupBy(
        F.expr(
            "CAST(floor(CAST(CAST(o_orderdate AS TIMESTAMP) AS DOUBLE))"
            " AS BIGINT) div 86400"
        ).alias("day")
    ).agg(F.count(F.lit(1)).alias("oc"))
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").isNotNull()
    )
    ld = li.groupBy(
        F.expr(
            "CAST(floor(CAST(CAST(l_shipdate AS TIMESTAMP) AS DOUBLE))"
            " AS BIGINT) div 86400"
        ).alias("day")
    ).agg(F.count(F.lit(1)).alias("lc"))
    lags = od.sparkSession.range(0, 6).select(F.col("id").alias("lag"))
    j = (
        od.crossJoin(F.broadcast(lags))
        .join(
            ld.select(F.col("day").alias("lday"), "lc"),
            F.expr("lday = day + lag"),
        )
        .select("lag", F.col("oc").alias("x"), F.col("lc").alias("y"))
    )
    s = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    corr = _corr_expr("sx", "sy", "sxx", "syy", "sxy")
    return s.where(
        (F.col("n") >= 2)
        & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
    ).select(
        F.col("lag").alias("lag"),
        F.col("n").alias("n_days"),
        (F.expr(corr) + F.lit(0.0)).alias("corr"),
    )


# Per-user OLS trend + forecast as EXACT INTEGER FRACTIONS (the
# agg_ks_test cross-multiply discipline): with the regressor re-based
# to x = day − min(day) per user, slope = (nΣxy − ΣxΣy) / (nΣx² −
# (Σx)²), intercept = (ΣyΣx² − ΣxΣxy) / den, and forecast(x*+7) =
# (intercept_num + slope_num·(x*+7)) / den are ratios of int64-exact
# combinations of raw sums — the re-basing itself is algebraic
# (Σx = Σd − n·m etc.), so ONE two-level aggregate computes everything
# with zero windows and zero transcendentals.
_LRF_SLOPE = snap_sql("CAST(slope_num AS DOUBLE) / CAST(den AS DOUBLE)", 4)
_LRF_INTERCEPT = snap_sql(
    "CAST(intercept_num AS DOUBLE) / CAST(den AS DOUBLE)", 4
)
_LRF_FC = snap_sql(
    "CAST(intercept_num + slope_num * (xmax + 7) AS DOUBLE)"
    " / CAST(den AS DOUBLE)", 4
)


@query(
    "ts_linreg_forecast",
    oracle=f"""
    WITH daily AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS y
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
              AND user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    raw AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(d) AS BIGINT) AS dmin,
               CAST(MAX(d) AS BIGINT) AS dmax,
               CAST(SUM(d) AS BIGINT) AS sd,
               CAST(SUM(d * d) AS BIGINT) AS sdd,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(d * y) AS BIGINT) AS sdy
        FROM daily GROUP BY user_id
    ),
    reb AS (
        SELECT user_id, n, dmax - dmin AS xmax,
               sd - n * dmin AS sx,
               sdd - 2 * dmin * sd + n * dmin * dmin AS sxx,
               sy,
               sdy - dmin * sy AS sxy
        FROM raw WHERE n >= 2 AND dmax > dmin
    ),
    fr AS (
        SELECT user_id, n, xmax,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(sy * sxx - sx * sxy AS BIGINT) AS intercept_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS den
        FROM reb
    )
    SELECT user_id, n AS n_days, CAST(xmax AS BIGINT) AS x_span,
           slope_num, intercept_num, den,
           {_LRF_SLOPE} + 0 AS slope_cents_per_day,
           {_LRF_INTERCEPT} + 0 AS intercept_cents,
           {_LRF_FC} + 0 AS forecast_7d_cents
    FROM fr
    """,
)
def ts_linreg_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend over daily activity value (cents vs epoch-day
    offset) with a 7-day-ahead forecast — the capacity-planning /
    drift-projection primitive.  Everything is an exact integer
    fraction: the regressor re-bases to x = d − min(d) ALGEBRAICALLY
    from raw sums (Σx = Σd − n·m, Σx² = Σd² − 2mΣd + nm², Σxy = Σdy −
    mΣy), so slope/intercept/forecast numerators and the shared
    denominator are int64-exact BIGINTs exposed beside the three
    snapped ratios (one double division each, +0 clears -0.0) — the
    agg_ks_test zero-float discipline.  Day buckets are epoch integer
    division (calendar-seam rule); degenerate single-day users are
    excluded by max(day) > min(day) — a direct value compare, never an
    integer-product test (round-8 rule).  Shuffle shape: one
    (user, day) map-side-combined collapse, one |users|-row rollup —
    the corpus is read once, no windows, no joins.  Overflow budget at
    sf1 (d ~ 2.06e4, |days|/user ≤ ~400, day-cents ≤ ~1e6):
    Σd² ≤ 1.7e11, Σdy ≤ 8e12, intercept_num ≤ ~2.6e16 — 300×
    int64 headroom; daily cents grow linearly with corpus, so
    intercept_num crosses int64 near ~300× sf1 (re-unit y to dollars
    past that)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    )
    day = F.expr(
        "CAST(floor(CAST(CAST(ts AS TIMESTAMP) AS DOUBLE)) AS BIGINT)"
        " div 86400"
    )
    daily = ev.groupBy(
        "user_id", day.alias("d")
    ).agg(F.sum(money_units(F.col("value"), 2)).alias("y"))
    raw = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("d").alias("dmin"),
        F.max("d").alias("dmax"),
        F.sum("d").alias("sd"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum("y").alias("sy"),
        F.sum(F.col("d") * F.col("y")).alias("sdy"),
    )
    reb = raw.where(
        (F.col("n") >= 2) & (F.col("dmax") > F.col("dmin"))
    ).select(
        "user_id",
        "n",
        (F.col("dmax") - F.col("dmin")).alias("xmax"),
        (F.col("sd") - F.col("n") * F.col("dmin")).alias("sx"),
        (
            F.col("sdd")
            - 2 * F.col("dmin") * F.col("sd")
            + F.col("n") * F.col("dmin") * F.col("dmin")
        ).alias("sxx"),
        "sy",
        (F.col("sdy") - F.col("dmin") * F.col("sy")).alias("sxy"),
    )
    fr = reb.select(
        "user_id",
        "n",
        "xmax",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("slope_num"),
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
        .cast("long")
        .alias("intercept_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("den"),
    )
    return fr.select(
        "user_id",
        F.col("n").alias("n_days"),
        F.col("xmax").cast("long").alias("x_span"),
        "slope_num",
        "intercept_num",
        "den",
        (F.expr(_LRF_SLOPE) + F.lit(0.0)).alias("slope_cents_per_day"),
        (F.expr(_LRF_INTERCEPT) + F.lit(0.0)).alias("intercept_cents"),
        (F.expr(_LRF_FC) + F.lit(0.0)).alias("forecast_7d_cents"),
    )


# Backtest of the ts_linreg_forecast model: hold out each user's final
# 7 days, fit on the rest, score MAE/WAPE on the holdout — with the
# per-row residual kept EXACT: err·den = y·den − (intercept_num +
# slope_num·x) is an int64 combination of the exact fraction parts, so
# Σ|err·den| is merge-order-free and the two metrics are single double
# divisions of exact integers.
_BT_MAE = snap_sql(
    "CAST(sae_num AS DOUBLE) / CAST(n_test * den AS DOUBLE)", 4
)
_BT_WAPE = snap_sql(
    "CAST(sae_num AS DOUBLE) / CAST(greatest(den * say, 1) AS DOUBLE)", 4
)


@query(
    "ts_backtest_linreg",
    oracle=f"""
    WITH daily AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS y
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
              AND user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    mx AS (
        SELECT user_id, CAST(MAX(d) AS BIGINT) AS dmax
        FROM daily GROUP BY user_id
    ),
    flagged AS MATERIALIZED (
        SELECT daily.user_id, d, y, d <= mx.dmax - 7 AS is_train
        FROM daily JOIN mx ON daily.user_id = mx.user_id
    ),
    tr AS (
        SELECT user_id,
               CAST(COUNT(CASE WHEN is_train THEN 1 END) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN is_train THEN d END) AS BIGINT) AS dmin,
               CAST(MAX(CASE WHEN is_train THEN d END) AS BIGINT) AS dmaxtr,
               CAST(SUM(CASE WHEN is_train THEN d END) AS BIGINT) AS sd,
               CAST(SUM(CASE WHEN is_train THEN d * d END) AS BIGINT) AS sdd,
               CAST(SUM(CASE WHEN is_train THEN y END) AS BIGINT) AS sy,
               CAST(SUM(CASE WHEN is_train THEN d * y END) AS BIGINT) AS sdy
        FROM flagged GROUP BY user_id
    ),
    st AS (
        SELECT user_id, n, dmin,
               sd - n * dmin AS sx,
               sdd - 2 * dmin * sd + n * dmin * dmin AS sxx,
               sy, sdy - dmin * sy AS sxy
        FROM tr WHERE n >= 2 AND dmaxtr > dmin
    ),
    fr AS MATERIALIZED (
        SELECT user_id, n AS n_train, dmin,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(sy * sxx - sx * sxy AS BIGINT) AS intercept_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS den
        FROM st
    ),
    errs AS (
        SELECT f.user_id, fr.n_train, fr.den,
               abs(f.y * fr.den
                   - (fr.intercept_num + fr.slope_num * (f.d - fr.dmin)))
                   AS e_num,
               abs(f.y) AS ay
        FROM flagged f JOIN fr ON fr.user_id = f.user_id
        WHERE NOT f.is_train
    ),
    agg AS (
        SELECT user_id, n_train, den,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(e_num) AS BIGINT) AS sae_num,
               CAST(SUM(ay) AS BIGINT) AS say
        FROM errs GROUP BY user_id, n_train, den
    )
    SELECT user_id, n_train, n_test, den, sae_num, say,
           {_BT_MAE} + 0 AS mae_cents,
           {_BT_WAPE} + 0 AS wape
    FROM agg
    """,
)
def ts_backtest_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTEST inside the engine: hold out each user's final
    7 days, refit the ts_linreg_forecast OLS on the remainder, score
    the holdout with MAE and WAPE — the time-series cross-validation
    loop a forecasting pipeline runs before trusting a model, with
    ZERO accumulated floating error: the per-day residual is kept as
    the exact int64 numerator y·den − (intercept_num + slope_num·x),
    so Σ|residual| is merge-order-free and each metric is ONE double
    division of exact integers (snap 4, +0).  Degenerate users (under
    2 distinct train days) drop on both sides; WAPE divides by
    greatest(den·Σ|y|, 1).  Shuffle shape: one (user, day) collapse,
    one |users|-row max table joined back (user-co-partitioned), one
    conditional-sum train rollup, one test-row join on the same user
    key, one final rollup — no windows.  Overflow budget at sf1:
    den ≤ ~2.6e10, |y| ≤ ~1e6 ⇒ e_num ≤ ~2.6e16, Σ over ≤7 test days
    ≤ 1.8e17 (50× headroom); den·say ≤ 1.8e17 — both grow ~quadratically
    with corpus, re-unit y past ~5× sf1."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    )
    day = F.expr(
        "CAST(floor(CAST(CAST(ts AS TIMESTAMP) AS DOUBLE)) AS BIGINT)"
        " div 86400"
    )
    daily = ev.groupBy(
        "user_id", day.alias("d")
    ).agg(F.sum(money_units(F.col("value"), 2)).alias("y"))
    mx = daily.groupBy("user_id").agg(F.max("d").alias("dmax"))
    flagged = daily.join(mx, "user_id").select(
        "user_id", "d", "y",
        (F.col("d") <= F.col("dmax") - 7).alias("is_train"),
    ).localCheckpoint(eager=False)  # consumed twice (train agg + test join)
    t = lambda c: F.when(F.col("is_train"), c)  # noqa: E731
    tr = flagged.groupBy("user_id").agg(
        F.count(t(F.lit(1))).alias("n"),
        F.min(t(F.col("d"))).alias("dmin"),
        F.max(t(F.col("d"))).alias("dmaxtr"),
        F.sum(t(F.col("d"))).alias("sd"),
        F.sum(t(F.col("d") * F.col("d"))).alias("sdd"),
        F.sum(t(F.col("y"))).alias("sy"),
        F.sum(t(F.col("d") * F.col("y"))).alias("sdy"),
    )
    st = tr.where(
        (F.col("n") >= 2) & (F.col("dmaxtr") > F.col("dmin"))
    ).select(
        "user_id", "n", "dmin",
        (F.col("sd") - F.col("n") * F.col("dmin")).alias("sx"),
        (
            F.col("sdd")
            - 2 * F.col("dmin") * F.col("sd")
            + F.col("n") * F.col("dmin") * F.col("dmin")
        ).alias("sxx"),
        "sy",
        (F.col("sdy") - F.col("dmin") * F.col("sy")).alias("sxy"),
    )
    fr = st.select(
        "user_id",
        F.col("n").alias("n_train"),
        "dmin",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("slope_num"),
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
        .cast("long")
        .alias("intercept_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("den"),
    )
    errs = (
        flagged.where(~F.col("is_train"))
        .join(fr, "user_id")
        .select(
            "user_id", "n_train", "den",
            F.abs(
                F.col("y") * F.col("den")
                - (
                    F.col("intercept_num")
                    + F.col("slope_num") * (F.col("d") - F.col("dmin"))
                )
            ).alias("e_num"),
            F.abs(F.col("y")).alias("ay"),
        )
    )
    agg = errs.groupBy("user_id", "n_train", "den").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum("e_num").alias("sae_num"),
        F.sum("ay").alias("say"),
    )
    return agg.select(
        "user_id", "n_train", "n_test", "den", "sae_num", "say",
        (F.expr(_BT_MAE) + F.lit(0.0)).alias("mae_cents"),
        (F.expr(_BT_WAPE) + F.lit(0.0)).alias("wape"),
    )
