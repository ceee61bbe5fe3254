"""E family — window functions (SURVEY.md §2.3-E).

Engine extensions (reference has none, SURVEY §2.2).  Every ORDER BY
carries a unique tiebreak key (o_orderkey / c_custkey / event_id) so
row_number/lag/running sums are deterministic across engines.

Scale note: a window partitioned by a high-cardinality key (custkey,
user_id) is one hash shuffle then a per-partition sort — the same cost
envelope as a groupBy; no driver involvement.  Skewed partition keys are
handled by AQE only for joins, so at 100 TB a hot user_id would need a
two-level (salted prefix-agg) variant — noted in plans/NOTES.md.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_fixedlengthinputformat_spark.functions.num import money_units
from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query(
    "win_row_number",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select("o_orderkey", "o_custkey", F.row_number().over(w).alias("rn"))


@query(
    "win_rank_dense",
    oracle="""
    SELECT o_orderkey, o_custkey,
           RANK() OVER (PARTITION BY o_custkey ORDER BY floor(o_totalprice / 100000)) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY floor(o_totalprice / 100000)) AS drnk
    FROM orders
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed order value forces real ties; rank values are well-defined
    under ties even though intra-tie row order isn't (floor() in both
    engines — double->int casts round differently between Spark/DuckDB)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 100000)
    w = Window.partitionBy("o_custkey").orderBy(bucket)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT o_orderkey, o_custkey,
           lag(o_orderkey) OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           CAST(lag(o_orderdate, 1) OVER w AS DATE) AS prev_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.lag("o_orderdate", 1).over(w).cast("date").alias("prev_date"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_total"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 4) AS sliding_sum
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute sliding value sum per user.  Order key = epoch seconds
    (Spark long cast floors; DuckDB floor(epoch) matches).  RANGE frames
    depend only on the key value, so sub-second tie order is irrelevant."""
    # NTZ can't cast to long directly; go via LTZ (session tz pinned to UTC,
    # so the epoch value is preserved).
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_sec", F.col("ts").cast("timestamp").cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("sliding_sum"),
    )


@query(
    "win_ntile_first_last",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
           first_value(c_custkey) OVER w AS seg_poorest,
           last_value(c_custkey) OVER w AS seg_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ntile(4) WITHOUT a single-partition sort (round 2; the naive
    ``ntile(4) OVER (ORDER BY ...)`` funnels the whole table through one
    task — NOTES.md's known non-scalable construct, now fixed):

    1. ``repartitionByRange`` on the sort key — contiguous ordered ranges,
       partition i's keys all precede partition i+1's.
    2. ``row_number`` partitioned by ``spark_partition_id()`` — local rank,
       every partition sorts independently.
    3. Per-partition counts (one tiny row per partition) cumulate into
       offsets via a triangular self-join, so global_rn = local_rn +
       offset.  The offsets table is |partitions| rows — broadcast.
    4. ntile's exact bucket rule in integer arithmetic (bit-identical to
       the oracle, no IEEE anywhere): with q = N div 4, r = N mod 4, the
       first r buckets take q+1 rows:  rn <= r*(q+1)  ->  ceil(rn/(q+1)),
       else r + ceil((rn - r*(q+1))/q).

    The only data shuffle is the range partitioning (+ the window's
    pid re-cluster); nothing ever lands on a single task.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # NOT checkpointed (round-14 optimization pass finding): the three
    # consumers (ranked / counts / total) duplicate this subtree in the
    # initial plan, but the range exchange is identical across them, so
    # runtime ReusedExchange collapses the scan+shuffle to ONE execution
    # — pinned by test_ntile_has_no_unpartitioned_window, which also
    # guards the determinism the pid<->offset arithmetic relies on.  A
    # localCheckpoint here would only add a materialization layer and
    # hide the pinned structure.
    ranged = c.repartitionByRange(nparts, "c_acctbal", "c_custkey").withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("pid").orderBy("c_acctbal", "c_custkey")
    ranked = ranged.withColumn("lrn", F.row_number().over(w_local))
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(b, F.col("b.pid") <= F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(
            F.sum(F.when(F.col("b.pid") < F.col("a.pid"), F.col("b.cnt")).otherwise(0)
                  ).alias("offset"),
        )
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    g = (
        ranked.join(F.broadcast(offsets), "pid")
        .crossJoin(F.broadcast(total))
        .withColumn("rn", F.col("lrn") + F.col("offset"))
    )
    tile = F.expr(
        """
        CASE WHEN rn <= (total % 4) * (total div 4 + 1)
             THEN (rn + (total div 4)) div (total div 4 + 1)
             ELSE (total % 4)
                  + (rn - (total % 4) * (total div 4 + 1) + (total div 4) - 1)
                    div (total div 4)
        END
        """
    ).cast("int")
    w_seg = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return g.select(
        "c_custkey",
        tile.alias("quartile"),
        F.first("c_custkey").over(w_seg).alias("seg_poorest"),
        F.last("c_custkey").over(w_seg).alias("seg_richest"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) ranked WHERE rn <= 2
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer.  At scale this is the rank-filter pattern:
    shuffle once on the group key; Spark pushes a per-partition rank limit
    (WindowGroupLimit) below the shuffle so only k rows per key per mapper
    survive — check .explain for WindowGroupLimit."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "win_cume_dist",
    oracle="""
    SELECT c_custkey,
           floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cd,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pr,
           nth_value(c_custkey, 2) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks per segment — cume_dist/percent_rank/nth_value.
    One shuffle on the partition key; ties broken by c_custkey so both
    engines rank identically."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        # snap, not round(): k/n ratios can land a ulp from a 6-decimal
        # boundary where the two engines' round() implementations split
        (F.floor(F.cume_dist().over(w) * 1000000 + 0.5) / 1000000).alias("cd"),
        (F.floor(F.percent_rank().over(w) * 1000000 + 0.5) / 1000000).alias("pr"),
        F.nth_value("c_custkey", 2).over(w_full).alias("second_poorest"),
    )


@query(
    "win_range_interval",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS cnt_1h,
           round(sum(value) OVER w, 4) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval range frame: per-user trailing-1-hour count/sum at
    each event.  A RANGE frame over the ORDER BY timestamp — the sliding
    aggregation primitive for telemetry without bucketing; one shuffle on
    the partition key like any window."""
    from hadoop_fixedlengthinputformat_spark.tables import load_table as _lt

    _lt(spark, sf_dir, "events").createOrReplaceTempView("flif_wri_events")
    return spark.sql(
        """
        SELECT event_id, user_id,
               count(*) OVER w AS cnt_1h,
               round(sum(value) OVER w, 4) AS sum_1h
        FROM flif_wri_events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@query(
    "win_islands",
    oracle="""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND value IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
    ),
    marked AS (
        SELECT user_id, us, event_id, vc,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY us, event_id, vc) AS BIGINT) AS rn,
               CASE WHEN vc >= 5000 THEN 1 ELSE 0 END AS hi
        FROM base
    ),
    hi_only AS (
        SELECT user_id, us, event_id, vc, rn,
               rn - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY us, event_id, vc) AS BIGINT) AS island
        FROM marked WHERE hi = 1
    )
    SELECT user_id, island AS island_key,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(rn) AS start_rn, MAX(rn) AS end_rn,
           CAST(SUM(vc) AS BIGINT) AS island_cents,
           MAX(vc) AS peak_cents
    FROM hi_only
    GROUP BY user_id, island
    HAVING COUNT(*) >= 2
    """,
)
def win_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE high-value
    purchases (>= 50.00) per user, via the classical rn − rn'
    difference technique — rows in one unbroken run share
    (global row_number − within-predicate row_number), which is the
    island key.  The canonical streak/outage/uptime SQL pattern, all
    exact integers (count, span, cent sum, peak per island; islands
    shorter than 2 dropped by an integer HAVING on both sides).
    Total order (us, event_id, vc) pins both rank windows on
    duplicate-id rolls.  Rows tying on ALL of (us, event_id, vc) are
    IDENTICAL in every column this query reads, so whichever intra-tie
    order each engine picks, the rn sequence assigns the same rn
    VALUES to the same row CONTENTS and the rn − rn' difference (both
    windows ordered by the same key over nested row sets) yields the
    same island partition of identical rows — the same
    identical-row-invariance argument as agg_runs_test (ADVICE r10
    asked for this to be stated).  ONE user-keyed exchange: both
    row_number windows and the island groupBy share the user
    partitioning (the second window sorts the filtered subset in
    place — no new exchange; plan-pinned)."""
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
    marked = ev.select(
        "user_id", "us", "event_id", "vc",
        F.row_number().over(w).cast("long").alias("rn"),
    ).where(F.col("vc") >= 5000)
    hi = marked.select(
        "user_id", "vc", "rn",
        (F.col("rn") - F.row_number().over(w).cast("long")).alias("island"),
    )
    return (
        hi.groupBy("user_id", F.col("island").alias("island_key"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("rn").alias("start_rn"),
            F.max("rn").alias("end_rn"),
            F.sum("vc").alias("island_cents"),
            F.max("vc").alias("peak_cents"),
        )
        .where(F.col("n_events") >= 2)
    )
