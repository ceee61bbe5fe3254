"""Relational surface extras (round 3 widening).

The reference (bitsofinfo/hadoop-fixedlengthinputformat) has no query
language — it hands fixed-width records to whatever engine sits above
(SURVEY.md §2.2).  These operators round out the relational surface that
engine must provide: recursive CTEs, the remaining window functions,
schema-evolving unions, error-safe arithmetic, constraint auditing,
rolling anomaly detection, and Z-order maintenance clustering.

Cross-engine determinism follows plans/NOTES.md "Round-3 cross-engine
determinism rules": money and measure values ride exact integer units,
divisions happen once on bit-identical integers, `snap` replaces every
per-row round, and transcendentals are avoided entirely.

Plan shapes at 100 TB (verified via .explain):
  * ``cte_recursive`` — depth = ceil(log10(max key)) iterations, each a
    filtered projection of the previous frontier (no join in the
    recursive leg); the final name lookup is one broadcast-able join.
  * ``win_percent_rank_nth`` — one hash partitioning on ``c_nationkey``;
    all four window functions share the single sort.
  * ``dq_audit`` — each check is a scan + map-side-combined agg; the two
    referential checks are LeftAnti joins (customer broadcast; orders
    side shuffles once on the join key).
  * ``ts_anomaly_zscore`` — one hash partitioning on ``user_id``; count/
    sum/sum-of-squares share one window frame; z² is computed from
    exact integer moments (no stddev accumulator, no sqrt).
  * ``maintain_zorder`` — the interleave is per-row codegen arithmetic;
    clustering = repartitionByRange(zvalue) + sortWithinPartitions, so
    one range exchange total; the reported bucket profile aggregates
    map-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_fixedlengthinputformat_spark.functions.num import (
    money_units,
    snap,
    snap_sql,
)
from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


# --------------------------------------------------------------------------
# Recursive CTE
# --------------------------------------------------------------------------

@query(
    "cte_recursive",
    oracle="""
    WITH RECURSIVE anc AS (
        SELECT p_partkey AS part, p_partkey AS node, 0 AS depth FROM part
        UNION ALL
        SELECT part, node // 10, depth + 1 FROM anc WHERE node >= 10
    ),
    walked AS (
        SELECT part, max(depth) AS depth, min(node) AS root
        FROM anc GROUP BY part
    )
    SELECT w.part, w.depth, w.root, p.p_name AS root_name
    FROM walked w JOIN part p ON p.p_partkey = w.root
    """,
)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy walk via WITH RECURSIVE (Spark 4 recursive CTE): treat
    ``p_partkey DIV 10`` as a part's parent and walk every part to its
    single-digit root, returning depth, root key, and root name.

    Declared through ``spark.sql`` so Catalyst's UnionLoop execution
    runs the fixpoint: the recursive leg is a pure filtered projection
    terminating in ceil(log10(maxkey)) iterations (6-9 levels at any
    realistic key range — far under cteRecursionLevelLimit=100), and
    the only join is the final root-name lookup, which AQE turns into
    a broadcast.  Integer arithmetic only — ``DIV`` on both engines,
    nothing to snap.  The TOTAL row count across iterations is
    n·avg_depth ≈ n·log10(maxkey) — it scales with the input, so the
    default spark.sql.cteRecursionRowLimit=1e6 (a constant safety net,
    hit at sf1's 200k parts x ~5.3 avg depth in the round-8 soak) is
    lifted for THIS query only: the LEVEL limit is the correct
    unbounded-recursion guard for a fixpoint whose depth, not width,
    is the invariant.  The row-limit conf is read at EXECUTION time
    (probed round 9: a DF built under one value runs under the live
    value), so the fixpoint is materialized via localCheckpoint before
    the prior limit is restored in the finally — the shared session
    keeps its runaway-recursion safety net for every other query
    (ADVICE r8), and the checkpointed result is |part| rows, bounded
    by construction."""
    prev = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    spark.conf.set("spark.sql.cteRecursionRowLimit", "-1")
    try:
        load_table(spark, sf_dir, "part").createOrReplaceTempView("rx_part")
        return spark.sql(
            """
            WITH RECURSIVE anc AS (
                SELECT p_partkey AS part, p_partkey AS node, 0 AS depth
                FROM rx_part
                UNION ALL
                SELECT part, node DIV 10, depth + 1 FROM anc WHERE node >= 10
            ),
            walked AS (
                SELECT part, max(depth) AS depth, min(node) AS root
                FROM anc GROUP BY part
            )
            SELECT w.part, w.depth, w.root, p.p_name AS root_name
            FROM walked w JOIN rx_part p ON p.p_partkey = w.root
            """
        ).localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.cteRecursionRowLimit")
        else:
            spark.conf.set("spark.sql.cteRecursionRowLimit", prev)


# --------------------------------------------------------------------------
# Remaining window functions
# --------------------------------------------------------------------------

@query(
    "win_percent_rank_nth",
    oracle="""
    SELECT c_custkey, c_nationkey,
           percent_rank() OVER w AS pct_rank,
           nth_value(CAST(round(c_acctbal * 100, 0) AS BIGINT), 2) OVER (
               PARTITION BY c_nationkey
               ORDER BY CAST(round(c_acctbal * 100, 0) AS BIGINT), c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_bal_cents,
           first_value(c_custkey) OVER (
               PARTITION BY c_nationkey
               ORDER BY CAST(round(c_acctbal * 100, 0) AS BIGINT), c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS poorest_custkey,
           last_value(c_custkey) OVER (
               PARTITION BY c_nationkey
               ORDER BY CAST(round(c_acctbal * 100, 0) AS BIGINT), c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS richest_custkey
    FROM customer
    WINDOW w AS (
        PARTITION BY c_nationkey
        ORDER BY CAST(round(c_acctbal * 100, 0) AS BIGINT), c_custkey
    )
    """,
)
def win_percent_rank_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / nth_value / first_value / last_value — the window
    functions the r1 window family didn't cover.  The order key packs
    (balance cents, custkey) so it is UNIQUE per partition: percent_rank
    is then (rank-1)/(n-1) over exact integers (bit-identical division)
    and nth/first/last are single-valued — no tie nondeterminism on any
    data roll.  nth/first/last use an explicit unbounded ROWS frame on
    BOTH engines (their default frames differ).  One exchange on
    c_nationkey; all four functions share the one sort."""
    c = load_table(spark, sf_dir, "customer")
    cents = money_units(F.col("c_acctbal"), 2)
    w = Window.partitionBy("c_nationkey").orderBy(cents, "c_custkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.nth_value(cents, 2).over(wf).alias("second_bal_cents"),
        F.first_value(F.col("c_custkey")).over(wf).alias("poorest_custkey"),
        F.last_value(F.col("c_custkey")).over(wf).alias("richest_custkey"),
    )


# --------------------------------------------------------------------------
# Union by name (schema evolution)
# --------------------------------------------------------------------------

@query(
    "set_union_by_name",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(NULL AS BIGINT) AS total_cents, 'urgent' AS src
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS BIGINT) AS o_custkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_cents,
           'big' AS src
    FROM orders
    WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) > 30000000
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union: two branches with different column sets
    combined by NAME (``unionByName(allowMissingColumns=True)``), the
    operation behind appending a new-schema batch to an old-schema
    corpus.  Missing columns null-pad; matching is positional-order
    independent.  Catalyst plans a plain Union of two scans — each
    branch keeps its own pushed filter, no shuffle at all."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        "o_custkey",
        F.lit("urgent").alias("src"),
    )
    cents = money_units(F.col("o_totalprice"), 2)
    big = o.select("o_orderkey", cents.alias("total_cents"), "o_orderpriority") \
        .filter(F.col("total_cents") > 30_000_000) \
        .select("o_orderkey", "total_cents", F.lit("big").alias("src"))
    out = urgent.unionByName(big, allowMissingColumns=True)
    # Stable column order + types for the hash compare.
    return out.select(
        "o_orderkey",
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("total_cents").cast("long").alias("total_cents"),
        "src",
    )


# --------------------------------------------------------------------------
# Error-safe (TRY) arithmetic
# --------------------------------------------------------------------------

@query(
    "fn_try_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT)
               / NULLIF(o_custkey % 7, 0) AS per_bucket,
           TRY_CAST(o_orderpriority AS INTEGER) AS prio_full,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
           TRY_CAST(o_orderstatus AS DATE) AS status_date,
           list_extract(string_split(o_orderpriority, '-'), 5) AS missing_part
    FROM orders
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe arithmetic: Spark 4 runs with ANSI SQL semantics
    where bad casts and zero division THROW; the try_* family returns
    NULL instead — the only sane contract for a 100 TB pipeline where
    one malformed row must not kill a 1000-executor job.  try_divide /
    try_cast / try_element_at against DuckDB's natively NULL-yielding
    division and TRY_CAST.  The division operands are exact integer
    units, so the one double division is bit-identical."""
    o = load_table(spark, sf_dir, "orders")
    cents = money_units(F.col("o_totalprice"), 2)
    return o.select(
        "o_orderkey",
        F.try_divide(cents, F.col("o_custkey") % 7).alias("per_bucket"),
        F.col("o_orderpriority").try_cast("int").alias("prio_full"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
        F.col("o_orderstatus").try_cast("date").alias("status_date"),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(5)).alias(
            "missing_part"
        ),
    )


# --------------------------------------------------------------------------
# Data-quality constraint audit
# --------------------------------------------------------------------------

@query(
    "dq_audit",
    oracle="""
    SELECT 'dup_orderkey' AS check_name,
           count(*) - count(DISTINCT o_orderkey) AS violations FROM orders
    UNION ALL
    SELECT 'null_custkey',
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) FROM orders
    UNION ALL
    SELECT 'orphan_order_custkey', count(*) FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'orphan_lineitem_orderkey', count(*) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'bad_discount', count(*) FROM lineitem
    WHERE CAST(round(l_discount * 10000, 0) AS BIGINT) NOT BETWEEN 0 AND 10000
    UNION ALL
    SELECT 'ship_before_order', count(*) FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate < o.o_orderdate
    """,
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit — the pre-flight a training-data pipeline runs
    before trusting a 100 TB drop: key uniqueness, null keys, two
    referential-integrity orphan checks, a domain check, and a
    cross-table temporal sanity check.  Each check is a scan +
    map-side-combined count; the referential checks plan as LeftAnti
    hash joins (dimension side broadcast when small, else one shuffle
    on the key); the temporal check reuses the lineitem->orders equi
    join.  All outputs are exact integers."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def named(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("violations").cast("long").alias("violations"),
        )

    # dup + null ride ONE orders aggregate, unpivoted with stack()
    # (round 14: each unionAll arm re-evaluated its subtree — orders
    # was scanned once per check)
    dup_nulls = o.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("dup_v"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_v"),
    ).select(
        F.expr(
            "stack(2, 'dup_orderkey', dup_v, 'null_custkey', null_v)"
            " AS (check_name, violations)"
        )
    ).select("check_name", F.col("violations").cast("long").alias("violations"))
    orphan_o = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    # orphan_lineitem + ship_before_order share ONE left-outer join
    # (round 14; was a LeftAnti join + a separate inner join, i.e. two
    # full lineitem->orders joins).  A non-null marker on the orders
    # side makes the equivalence exact even under duplicate orderkeys:
    # no-match rows (marker NULL) are precisely the anti-join rows, and
    # matched rows are precisely the inner-join rows (k matches emit k
    # rows in both formulations).
    lo = li.select("l_orderkey", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate", F.lit(1).alias("_m")),
        li.l_orderkey == o.o_orderkey,
        "left_outer",
    )
    orphan_ship = lo.agg(
        F.coalesce(
            F.sum(F.when(F.col("_m").isNull(), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("orphan_v"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("l_shipdate") < F.col("o_orderdate"), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("ship_v"),
    ).select(
        F.expr(
            "stack(2, 'orphan_lineitem_orderkey', orphan_v,"
            " 'ship_before_order', ship_v) AS (check_name, violations)"
        )
    ).select("check_name", F.col("violations").cast("long").alias("violations"))
    bad_disc = li.agg(
        F.sum(
            F.when(
                ~money_units(F.col("l_discount"), 4).between(0, 10_000), 1
            ).otherwise(0)
        ).alias("violations")
    )
    return (
        dup_nulls
        .unionByName(named("orphan_order_custkey", orphan_o))
        .unionByName(orphan_ship)
        .unionByName(named("bad_discount", bad_disc))
    )


# --------------------------------------------------------------------------
# Rolling z-score anomaly detection (exact integer moments)
# --------------------------------------------------------------------------

@query(
    "ts_anomaly_zscore",
    oracle=f"""
    WITH w AS (
        SELECT event_id, user_id,
               CAST(round(value * 100, 0) AS BIGINT) AS v,
               count(*) OVER win AS n,
               sum(CAST(round(value * 100, 0) AS BIGINT)) OVER win AS s,
               sum(CAST(round(value * 100, 0) AS BIGINT)
                   * CAST(round(value * 100, 0) AS BIGINT)) OVER win AS q
        FROM events
        WINDOW win AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
        )
    )
    SELECT event_id, user_id,
           CASE WHEN n * q - s * s = 0 THEN NULL
                ELSE {snap_sql('CAST((n * v - s) * (n * v - s) AS DOUBLE)'
                               ' / (n * q - s * s)', 4)}
           END AS z2,
           (n * v - s) * (n * v - s) > 4 * (n * q - s * s) AS flagged
    FROM w WHERE n = 20
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags over the event stream, computed
    from EXACT integer moments: with cent units v and window moments
    (n, S=sum v, Q=sum v²), z² = (n·v−S)² / (n·Q−S²) — pure int64
    arithmetic plus ONE double division on bit-identical integers
    (plans/NOTES.md second-moment rule; no stddev accumulator, no
    sqrt, no merge-order sensitivity).  The |z|>2 flag compares
    integers only.  One exchange on user_id; count/sum/sum-of-squares
    share a single 20-row frame.  Full windows only (n=20) so warm-up
    rows don't flap across rolls."""
    e = load_table(spark, sf_dir, "events")
    v = money_units(F.col("value"), 2)
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    d = e.select(
        "event_id",
        "user_id",
        v.alias("v"),
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum(v).over(win).alias("s"),
        F.sum(v * v).over(win).alias("q"),
    ).filter(F.col("n") == 20)
    num = (F.col("n") * F.col("v") - F.col("s"))
    den = (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    return d.select(
        "event_id",
        "user_id",
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(snap((num * num).cast("double") / den, 4))
        .alias("z2"),
        (num * num > 4 * den).alias("flagged"),
    )


# --------------------------------------------------------------------------
# Z-order maintenance clustering
# --------------------------------------------------------------------------

_Z_BITS = 21  # per-dimension resolution; 42-bit z fits int64 comfortably
_Z_MAX = (1 << _Z_BITS) - 1


def _scale_spark(col: str, lo: str, hi: str) -> str:
    """Min-max scale ``col`` to [0, 2^21-1] in exact integer arithmetic.

    Scaling is what makes Z-order WORK: without it, the wider key's
    high bits own every interleaved high position and a range split on
    z degenerates to a single-key sort (measured: partkey span stayed
    at 0.99 of full range unscaled)."""
    return f"((({col} - {lo}) * {_Z_MAX}) DIV greatest({hi} - {lo}, 1))"


def _scale_duck(col: str, lo: str, hi: str) -> str:
    return f"((({col} - {lo}) * {_Z_MAX}) // greatest({hi} - {lo}, 1))"


def _z_spark(a: str, b: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


def _z_duck(a: str, b: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "maintain_zorder",
    oracle=f"""
    WITH s AS (
        SELECT min(l_orderkey) AS lo_ok, max(l_orderkey) AS hi_ok,
               min(l_partkey) AS lo_pk, max(l_partkey) AS hi_pk
        FROM lineitem
    ),
    scaled AS (
        SELECT {_scale_duck('l_orderkey', 'lo_ok', 'hi_ok')} AS sa,
               {_scale_duck('l_partkey', 'lo_pk', 'hi_pk')} AS sb,
               l_orderkey, l_partkey
        FROM lineitem CROSS JOIN s
    ),
    z AS (
        SELECT {_z_duck('sa', 'sb')} AS zval, l_orderkey, l_partkey
        FROM scaled
    )
    SELECT zval // 1073741824 AS zbucket, count(*) AS n_rows,
           min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
           min(l_partkey) AS min_pk, max(l_partkey) AS max_pk
    FROM z GROUP BY zval // 1073741824
    """,
)
def maintain_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering profile for lineitem on
    (l_orderkey, l_partkey): min-max scale each key to 21 bits (exact
    integer arithmetic — unscaled keys of unequal width degenerate to a
    single-key sort), interleave into a 42-bit z-value, bucket by the
    top 12 bits (z DIV 2^30), and report per-bucket row counts and
    min/max key envelopes.  Each bucket's envelope is tight in BOTH
    dimensions simultaneously — the property that makes post-clustering
    parquet min/max stats prune multi-column predicates (a linear sort
    is tight in one dimension only; effect measured in
    tests/test_zorder.py).  The maintenance path is
    repartitionByRange(zval) + sortWithinPartitions + write: the
    min/max scalars broadcast (one tiny agg), then ONE range exchange
    regardless of table size; scale + interleave are whole-stage-
    codegen integer arithmetic, no UDF."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_orderkey").alias("lo_ok"),
        F.max("l_orderkey").alias("hi_ok"),
        F.min("l_partkey").alias("lo_pk"),
        F.max("l_partkey").alias("hi_pk"),
    )
    scaled = li.crossJoin(F.broadcast(stats)).select(
        F.expr(_scale_spark("l_orderkey", "lo_ok", "hi_ok")).alias("sa"),
        F.expr(_scale_spark("l_partkey", "lo_pk", "hi_pk")).alias("sb"),
        "l_orderkey",
        "l_partkey",
    )
    z = scaled.select(
        F.expr(_z_spark("sa", "sb")).alias("zval"), "l_orderkey", "l_partkey"
    )
    return (
        z.groupBy(F.shiftright(F.col("zval"), 30).alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("min_ok"),
            F.max("l_orderkey").alias("max_ok"),
            F.min("l_partkey").alias("min_pk"),
            F.max("l_partkey").alias("max_pk"),
        )
    )


# --------------------------------------------------------------------------
# Datetime interval arithmetic
# --------------------------------------------------------------------------

@query(
    "fn_datetime_interval",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 90 MINUTE AS plus_90m,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
           last_day(o_orderdate) AS month_end,
           CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
           date_diff('day', o_orderdate, TIMESTAMP '1996-01-01') AS days_to_ref,
           date_diff('minute', TIMESTAMP '1995-01-01', o_orderdate)
               AS mins_since
    FROM orders
    """,
)
def fn_datetime_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/calendar arithmetic family: +INTERVAL, week/quarter
    truncation, month-end, calendar month addition (both engines clamp
    Jan 31 + 1 mo → Feb end), and day/minute differences.  Dialect
    traps handled: DuckDB ``date_diff`` takes (unit, start, end) vs
    Spark ``datediff(end, start)``; both count boundary crossings,
    which equals elapsed units here because o_orderdate is
    midnight-aligned (verified on the fixture generator); Spark
    ``date_trunc`` returns TIMESTAMP while DuckDB returns DATE — cast
    explicitly on both sides.  Pure projection, zero shuffles."""
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        (od + F.expr("INTERVAL 90 MINUTE")).alias("plus_90m"),
        F.date_trunc("week", od).cast("date").alias("week_start"),
        F.date_trunc("quarter", od).cast("date").alias("quarter_start"),
        F.last_day(od.cast("date")).alias("month_end"),
        F.add_months(od.cast("date"), 2).alias("plus_2mo"),
        F.datediff(F.lit("1996-01-01").cast("date"), od.cast("date")).alias(
            "days_to_ref"
        ),
        F.expr(
            "timestampdiff(MINUTE, TIMESTAMP '1995-01-01 00:00:00',"
            " o_orderdate)"
        ).alias("mins_since"),
    )


# --------------------------------------------------------------------------
# Nearest as-of join (backward + forward, pick closest)
# --------------------------------------------------------------------------

@query(
    "join_asof_nearest",
    oracle="""
    WITH od AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    ),
    bwd AS (
        SELECT e.event_id, e.user_id, e.ts,
               od.o_orderkey AS bkey, od.o_orderdate AS bt
        FROM events e
        ASOF LEFT JOIN od
          ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
    ),
    fwd AS (
        SELECT e.event_id, od.o_orderkey AS fkey, od.o_orderdate AS ft
        FROM events e
        ASOF LEFT JOIN od
          ON e.user_id = od.o_custkey AND e.ts <= od.o_orderdate
    )
    SELECT b.event_id, b.user_id,
           CASE WHEN f.fkey IS NULL THEN b.bkey
                WHEN b.bkey IS NULL THEN f.fkey
                WHEN CAST(floor(epoch(b.ts)) AS BIGINT)
                     - CAST(floor(epoch(b.bt)) AS BIGINT)
                     <= CAST(floor(epoch(f.ft)) AS BIGINT)
                     - CAST(floor(epoch(b.ts)) AS BIGINT)
                THEN b.bkey ELSE f.fkey END AS nearest_orderkey
    FROM bwd b JOIN fwd f ON f.event_id = b.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-as-of join: each event matched to the CLOSEST order of
    the same user in either time direction (ties break backward) — the
    sensor-alignment variant of plain backward as-of.  Same union+window
    formulation as ``join_asof`` (no range probe, no join explosion):
    one shuffle on user_id, a backward pass (last ignorenulls, ROWS
    UNBOUNDED PRECEDING) and a forward pass (round 15: last ignorenulls
    over the mirrored time-DESC sort with a running frame — the
    original UNBOUNDED-FOLLOWING frame re-scanned the partition
    remainder per row; an equal-timestamp order still sorts into the
    frame) share the one partitioning; distance compares
    floor-epoch BIGINTs (DuckDB epoch() is fractional — NOTES rule).
    Orders pre-deduped to one row per (custkey, orderdate) so both
    directions pick deterministically on any roll."""
    ev = load_table(spark, sf_dir, "events")
    od = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    left = ev.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("ord_key"),
        F.lit(None).cast("timestamp_ntz").alias("ord_t"),
    )
    right = od.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("ord_key"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("ord_t"),
    )
    w_b = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Round-15: the forward pass used `first ... CURRENT ROW ->
    # UNBOUNDED FOLLOWING` — the quadratic per-row re-scan frame (the
    # ts_interpolate r14 bug; join_asof_forward crawled minutes at
    # sf1).  Same rows, mirrored sort (desc_nulls_last x side ASC is
    # the exact reverse of t asc_nulls_first x side DESC), running
    # O(n) frame; ties among events hold NULL ord_key/ord_t so the
    # ignorenulls pick is identical.
    w_f = (
        Window.partitionBy("k")
        .orderBy(F.desc("t"), "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        left.unionByName(right)
        .withColumn("bkey", F.last("ord_key", ignorenulls=True).over(w_b))
        .withColumn("bt", F.last("ord_t", ignorenulls=True).over(w_b))
        .withColumn("fkey", F.last("ord_key", ignorenulls=True).over(w_f))
        .withColumn("ft", F.last("ord_t", ignorenulls=True).over(w_f))
        .filter(F.col("side") == 1)
    )
    ep = lambda c: F.unix_timestamp(F.col(c))  # noqa: E731  floor-epoch
    return merged.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.when(F.col("fkey").isNull(), F.col("bkey"))
        .when(F.col("bkey").isNull(), F.col("fkey"))
        .when(
            ep("t") - ep("bt") <= ep("ft") - ep("t"), F.col("bkey")
        )
        .otherwise(F.col("fkey"))
        .alias("nearest_orderkey"),
    )


@query(
    "dq_freshness",
    oracle="""
    WITH per AS (
        SELECT event_type,
               CAST(floor(epoch(MAX(ts))) AS BIGINT) AS latest_s,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY event_type
    ),
    g AS (SELECT CAST(MAX(latest_s) AS BIGINT) AS global_s FROM per)
    SELECT per.event_type, n_events,
           CAST(global_s - latest_s AS BIGINT) AS staleness_s,
           (global_s - latest_s) > 86400 AS is_stale
    FROM per, g
    """,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness audit (the data-SLA companion to dq_audit):
    each event type's lag behind the newest event anywhere, flagged
    stale past 24 h — whole-second integer epochs on both sides (the
    ts_sessionize rule), so the flag can't flip on a fractional-second
    seam.  One map-side-combined groupBy to |event types| rows + a
    broadcast 1-row global max — nothing scales with data volume past
    the scan."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    epoch = F.floor(F.col("ts").cast("timestamp").cast("double")).cast("long")
    per = ev.groupBy("event_type").agg(
        F.max(epoch).alias("latest_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    g = per.agg(F.max("latest_s").alias("global_s"))
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_events",
        (F.col("global_s") - F.col("latest_s")).alias("staleness_s"),
        ((F.col("global_s") - F.col("latest_s")) > 86400).alias("is_stale"),
    )


_DRIFT_RATE = "CAST({n} AS DOUBLE) / CAST(greatest({d}, 1) AS DOUBLE)"
_DRIFT_MEAN = snap_sql(
    "CAST(sum_{h} AS DOUBLE) / CAST(greatest(n_val_{h}, 1) AS DOUBLE)", 4
)


@query(
    "dq_drift",
    oracle=f"""
    WITH span AS (
        SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
        FROM events WHERE ts IS NOT NULL
    ),
    tagged AS (
        SELECT e.event_type,
               CASE WHEN epoch_us(e.ts) * 2 <= s.lo + s.hi
                    THEN 0 ELSE 1 END AS half,
               e.value
        FROM events e, span s
        WHERE e.ts IS NOT NULL AND e.event_type IS NOT NULL
    ),
    per AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN half = 0 AND value IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_val_a,
               CAST(SUM(CASE WHEN half = 1 AND value IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_val_b,
               CAST(SUM(CASE WHEN half = 0
                             THEN CAST(round(value * 100, 0) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS sum_a,
               CAST(SUM(CASE WHEN half = 1
                             THEN CAST(round(value * 100, 0) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS sum_b
        FROM tagged GROUP BY event_type
    )
    SELECT event_type, n_a, n_b, n_val_a, n_val_b,
           floor(({_DRIFT_RATE.format(n="n_val_a", d="n_a")}) * 10000
                 + 0.5) / 10000 + 0 AS val_rate_a,
           floor(({_DRIFT_RATE.format(n="n_val_b", d="n_b")}) * 10000
                 + 0.5) / 10000 + 0 AS val_rate_b,
           {_DRIFT_MEAN.format(h="a")} + 0 AS mean_cents_a,
           {_DRIFT_MEAN.format(h="b")} + 0 AS mean_cents_b
    FROM per
    """,
)
def dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal drift audit: the stream is split at the epoch MIDPOINT
    of its observed span (integer compare 2·t ≤ lo + hi — no division,
    no median machinery) and each event type's volume, value-presence
    rate, and mean cent value are profiled in BOTH halves side by
    side — the schema/content-drift check a pipeline runs before
    trusting "same as last month" (the dq_audit / dq_freshness
    companion).  Counts and cent sums are exact int64; the two rates
    and two means are single divisions with greatest(x,1) denominators
    (round-4 ANSI ÷0 rule), snapped to 4 (+0); means are per-row-unit
    bounded so snapping is magnitude-safe.  Shuffle shape: one 1-row
    global span aggregate joined in (AQE broadcast, unhinted), then
    ONE map-side-combined event_type groupBy — the corpus shuffles
    once, as |types| conditional-sum partials."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    span = ev.agg(
        F.min("us").alias("lo"), F.max("us").alias("hi")
    )
    tagged = ev.crossJoin(span).select(
        "event_type",
        F.when(2 * F.col("us") <= F.col("lo") + F.col("hi"), 0)
        .otherwise(1)
        .alias("half"),
        "value",
    )
    vc = money_units(F.col("value"), 2)
    per = tagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when((F.col("half") == 0) & F.col("value").isNotNull(), 1)
            .otherwise(0)
        ).alias("n_val_a"),
        F.sum(
            F.when((F.col("half") == 1) & F.col("value").isNotNull(), 1)
            .otherwise(0)
        ).alias("n_val_b"),
        F.sum(F.when(F.col("half") == 0, vc).otherwise(0)).alias("sum_a"),
        F.sum(F.when(F.col("half") == 1, vc).otherwise(0)).alias("sum_b"),
    )
    rate = lambda n, d: (  # noqa: E731
        F.floor(
            F.col(n).cast("double")
            / F.greatest(F.col(d), F.lit(1)).cast("double")
            * 10000
            + F.lit(0.5)
        )
        / 10000
        + F.lit(0.0)
    )
    return per.select(
        "event_type", "n_a", "n_b", "n_val_a", "n_val_b",
        rate("n_val_a", "n_a").alias("val_rate_a"),
        rate("n_val_b", "n_b").alias("val_rate_b"),
        (F.expr(_DRIFT_MEAN.format(h="a")) + F.lit(0.0)).alias("mean_cents_a"),
        (F.expr(_DRIFT_MEAN.format(h="b")) + F.lit(0.0)).alias("mean_cents_b"),
    )


@query(
    "dq_referential",
    oracle="""
    SELECT 'lineitem' AS child_table, 'l_orderkey->orders' AS fk,
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_orderkey IS NOT NULL) AS BIGINT) AS n_child_rows,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS (
                     SELECT 1 FROM orders o
                     WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
               AS n_orphans
    UNION ALL
    SELECT 'lineitem', 'l_partkey->part',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_partkey IS NOT NULL) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_partkey IS NOT NULL AND NOT EXISTS (
                     SELECT 1 FROM part p
                     WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem', 'l_suppkey->supplier',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_suppkey IS NOT NULL) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_suppkey IS NOT NULL AND NOT EXISTS (
                     SELECT 1 FROM supplier s
                     WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
    UNION ALL
    SELECT 'orders', 'o_custkey->customer',
           CAST((SELECT count(*) FROM orders
                 WHERE o_custkey IS NOT NULL) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
                     SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    """,
)
def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity census over the star schema's four FK
    edges (lineitem→orders/part/supplier, orders→customer): per edge,
    the non-NULL child count and the ORPHAN count (children whose key
    has no parent) — the first dashboard a warehouse DQ suite runs,
    completing the dq_ family next to dq_audit/dq_freshness/dq_drift.
    Exact integers only.  Each orphan count is an ids-only LEFT ANTI
    join: the child side projects to its 8-byte key before the
    exchange and the parent key set is dimension-sized (AQE broadcasts
    the small side unhinted — the r10 hint rule; at 100 TB the
    lineitem→orders edge degrades gracefully to a key-hash shuffle of
    ids, never of payloads).  NULL FKs are EXCLUDED from both counts
    (a NULL key is a completeness finding for dq_audit, not a
    referential orphan — and NOT IN's NULL semantics would otherwise
    diverge; the oracle uses NOT EXISTS for the same reason)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")

    # Round 14: each edge used to run a count scan + an anti-join scan
    # of its child (12 scans across the 4 edges).  Now every child is
    # scanned ONCE: the child rides a left-outer join per edge against
    # the DISTINCT parent key set (distinct makes the equivalence exact
    # under duplicate parent keys — each child row still appears
    # exactly once), a non-null marker identifies matches, and one
    # aggregate computes all of the child's edge counts, unpivoted
    # with stack().  NULL FKs never match and are excluded by the
    # conditional sums, exactly as the NOT-EXISTS oracle does.
    def pset(parent, pk_col, marker):
        return (
            parent.select(F.col(pk_col)).distinct()
            .withColumn(marker, F.lit(1))
        )

    li_joined = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(pset(orders, "o_orderkey", "_mo"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_outer")
        .join(pset(part, "p_partkey", "_mp"),
              F.col("l_partkey") == F.col("p_partkey"), "left_outer")
        .join(pset(supplier, "s_suppkey", "_ms"),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_outer")
    )

    def counts(fk_col, marker, n_name, o_name):
        nn = F.col(fk_col).isNotNull()
        return [
            F.coalesce(F.sum(F.when(nn, 1).otherwise(0)), F.lit(0))
            .cast("long").alias(n_name),
            F.coalesce(
                F.sum(
                    F.when(nn & F.col(marker).isNull(), 1).otherwise(0)
                ),
                F.lit(0),
            ).cast("long").alias(o_name),
        ]

    li_rows = li_joined.agg(
        *counts("l_orderkey", "_mo", "n_o", "or_o"),
        *counts("l_partkey", "_mp", "n_p", "or_p"),
        *counts("l_suppkey", "_ms", "n_s", "or_s"),
    ).select(
        F.expr(
            "stack(3,"
            " 'lineitem', 'l_orderkey->orders', n_o, or_o,"
            " 'lineitem', 'l_partkey->part', n_p, or_p,"
            " 'lineitem', 'l_suppkey->supplier', n_s, or_s)"
            " AS (child_table, fk, n_child_rows, n_orphans)"
        )
    )
    o_rows = (
        orders.select("o_custkey")
        .join(pset(customer, "c_custkey", "_mc"),
              F.col("o_custkey") == F.col("c_custkey"), "left_outer")
        .agg(*counts("o_custkey", "_mc", "n_c", "or_c"))
        .select(
            F.lit("orders").alias("child_table"),
            F.lit("o_custkey->customer").alias("fk"),
            F.col("n_c").alias("n_child_rows"),
            F.col("or_c").alias("n_orphans"),
        )
    )
    return li_rows.unionAll(o_rows)
