"""C family — joins (SURVEY.md §2.3-C).

The reference is a single-input format (no second input is ever opened —
FixedLengthRecordReader.java opens exactly one FSDataInputStream); joins
are engine extensions.

Scale notes (100 TB):
  * dimension tables (region/nation/customer at TPC-H ratios) are
    broadcast explicitly — no shuffle of the fact side;
  * fact-fact joins (orders x lineitem) shuffle on the join key; AQE
    converts to broadcast at runtime when a filtered side shrinks and
    splits skewed partitions (spark.sql.adaptive.skewJoin);
  * the as-of join is the union-window formulation: ONE shuffle on
    (key), no per-row range probe, no driver collect — this is the
    formulation that survives 1000 executors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query(
    "join_inner_hash",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way star join; both dims broadcast -> zero fact shuffles."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity
    FROM orders
    LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) big
      ON o_orderkey = big.l_orderkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity"
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity
    FROM (SELECT * FROM lineitem WHERE l_quantity > 45) big
    RIGHT JOIN orders ON big.l_orderkey = o_orderkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return li.join(o, li.l_orderkey == o.o_orderkey, "right").select(
        "o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity"
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT a.n_nationkey AS a_key, a.n_name AS a_name,
           b.n_nationkey AS b_key, b.n_name AS b_name
    FROM (SELECT * FROM nation WHERE n_nationkey < 15) a
    FULL OUTER JOIN (SELECT * FROM nation WHERE n_nationkey >= 10) b
      ON a.n_nationkey = b.n_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    a = n.filter(F.col("n_nationkey") < 15).select(
        F.col("n_nationkey").alias("a_key"), F.col("n_name").alias("a_name")
    )
    b = n.filter(F.col("n_nationkey") >= 10).select(
        F.col("n_nationkey").alias("b_key"), F.col("n_name").alias("b_name")
    )
    return a.join(b, a.a_key == b.b_key, "full")


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n))


@query(
    "join_theta_range",
    oracle="""
    SELECT s_suppkey, s_name, n_nationkey, n_name
    FROM supplier JOIN nation ON s_nationkey < n_nationkey
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi join -> broadcast nested loop (nation is tiny, so the
    broadcast side is the right physical strategy)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return s.join(F.broadcast(n), s.s_nationkey < n.n_nationkey).select(
        "s_suppkey", "s_name", "n_nationkey", "n_name"
    )


@query(
    "join_sort_merge",
    oracle="""
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan-level variant: force sort-merge via the merge hint (the
    broadcast-free strategy a fact-fact join at 100 TB would pick)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").hint("merge")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@query(
    "join_asof",
    oracle="""
    WITH od AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, od.o_orderkey AS asof_orderkey
    FROM events e
    ASOF LEFT JOIN od
      ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the latest prior order of the same
    user.  Spark has no batch ASOF; formulation = tag both sides, union on
    (key, time), then last(ignorenulls) over a (key)-partitioned window —
    one shuffle, linear scan, no range probe.  Orders are pre-deduped to
    one row per (custkey, orderdate) (max orderkey) so ties are
    deterministic in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    od = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    left = ev.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),  # events sort after orders at equal t
        F.col("event_id"),
        F.lit(None).cast("long").alias("ord_key"),
    )
    right = od.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("ord_key"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).withColumn(
        "asof_orderkey", F.last("ord_key", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id", F.col("k").alias("user_id"), "asof_orderkey"
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH od AS (
        SELECT o_custkey, o_orderdate, min(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, od.o_orderkey AS next_orderkey
    FROM events e
    ASOF LEFT JOIN od
      ON e.user_id = od.o_custkey AND e.ts <= od.o_orderdate
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join — each event matched to the EARLIEST
    subsequent order of the same user (the what-happened-next probe;
    join_asof is the backward twin).  Same one-shuffle formulation,
    mirrored: tag both sides, union on (key, time), then
    last(ignorenulls) over a (key)-partitioned RUNNING window on the
    time-DESCENDING sort (round 15 — the equivalent forward frame was
    the quadratic per-row re-scan) — in that order orders sort before
    their equal-t events, so a same-instant order matches (<=
    semantics, as in the oracle's ASOF
    ON e.ts <= od.o_orderdate).  Orders pre-deduped to one row per
    (custkey, orderdate) (min orderkey) so ties are deterministic in
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    od = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.min("o_orderkey").alias("o_orderkey"))
    )
    left = ev.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),  # events sort BEFORE orders at equal t
        F.col("event_id"),
        F.lit(None).cast("long").alias("ord_key"),
    )
    right = od.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("ord_key"),
    )
    # Round-15: `first ... ROWS BETWEEN CURRENT ROW AND UNBOUNDED
    # FOLLOWING` re-scans the partition remainder PER ROW (the
    # ts_interpolate r14 quadratic frame; this sibling shipped the same
    # shape and crawled minutes at sf1's 1M events).  Re-expressed as
    # the exactly-equivalent `last ... IGNORE NULLS` over the SAME rows
    # in the mirrored sort — desc_nulls_last is the exact reverse of
    # asc_nulls_first, ties among events carry NULL ord_key so the
    # first/last non-null is identical — with a running O(n) frame.
    w = (
        Window.partitionBy("k")
        .orderBy(F.desc("t"), F.desc("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).withColumn(
        "next_orderkey", F.last("ord_key", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 0).select(
        "event_id", F.col("k").alias("user_id"), "next_orderkey"
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-mitigated equi-join: salt the big side's key with a random
    bucket, replicate the small side across all buckets, join on
    (key, salt).  A pathological hot key is thereby spread over
    ``n_salts`` reducers instead of melting one.

    Use when AQE's skew-join split isn't enough (a single key larger than
    any split) and the small side is too big to broadcast outright.
    ``rand(seed)``'s per-row draw is what spreads the hot key; the
    replicated small side costs n_salts x |small| shuffle volume — pick
    n_salts ~ (hot-key rows / target partition rows).
    """
    salted_big = big.withColumn(
        "_salt", (F.rand(42) * n_salts).cast("int")
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(
        replicated_small,
        (F.col(big_key) == F.col(small_key)) & (salted_big._salt == replicated_small._salt),
    ).drop("_salt")


@query(
    "join_skew_salted",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_quantity, 4) AS qty,
           o_orderstatus
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting demo on lineitem x orders: result must equal the plain
    inner join (salting changes the shuffle layout, never the result)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return salted_join(li, o, "l_orderkey", "o_orderkey").select(
        "l_orderkey", "l_linenumber",
        F.round("l_quantity", 4).alias("qty"), "o_orderstatus",
    )


@query(
    "join_bucketed",
    oracle="""
    SELECT o_orderkey, o_orderstatus, count(*) AS n_items,
           round(sum(l_quantity), 4) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderstatus
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketing: both sides written bucketBy(8, key)
    as tables, so the sort-merge join reads pre-bucketed files with NO
    Exchange on either side — the 100 TB pattern for repeated fact-fact
    joins on the same key (pay the bucketed write once, join shuffle-free
    forever).  The follow-on groupBy(o_orderkey, ...) also reuses the
    bucketing.  tests assert the plan is Exchange-free."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    names = {t: f"flif_bkt_{t}_{tag}" for t in ("orders", "lineitem")}
    base = os.path.join(tempfile.gettempdir(), "flif_bucketed")
    # external tables (explicit path) — no dependence on the session's
    # static warehouse dir, which the driver owns
    if not spark.catalog.tableExists(names["orders"]):
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus"
        ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
            "path", os.path.join(base, names["orders"])
        ).mode("overwrite").saveAsTable(names["orders"])
    if not spark.catalog.tableExists(names["lineitem"]):
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
            "path", os.path.join(base, names["lineitem"])
        ).mode("overwrite").saveAsTable(names["lineitem"])
    o = spark.table(names["orders"])
    li = spark.table(names["lineitem"])
    return (
        o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )


@query(
    "join_null_safe",
    oracle="""
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b
    FROM (SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS grp
          FROM customer WHERE c_custkey <= 200) a
    JOIN (SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS grp
          FROM customer WHERE c_custkey <= 200) b
      ON a.grp IS NOT DISTINCT FROM b.grp AND a.c_custkey < b.c_custkey
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other, unlike plain = which drops them — still a hash join
    (null-safe equality is a valid shuffle key)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    grp = F.nullif(F.col("c_nationkey") % 5, F.lit(0))
    a = c.select(F.col("c_custkey").alias("cust_a"), grp.alias("grp_a"))
    b = c.select(F.col("c_custkey").alias("cust_b"), grp.alias("grp_b"))
    return (
        a.join(b, a.grp_a.eqNullSafe(b.grp_b) & (a.cust_a < b.cust_b))
        .select("cust_a", "cust_b")
    )


@query(
    "merge_scd2",
    oracle="""
    WITH upd AS (
        SELECT c_custkey, 'MACHINERY' AS new_segment
        FROM customer WHERE c_custkey % 10 = 0
    ),
    changed AS (
        SELECT c.c_custkey, c.c_mktsegment AS old_segment, u.new_segment
        FROM customer c JOIN upd u ON c.c_custkey = u.c_custkey
        WHERE c.c_mktsegment <> u.new_segment
    )
    SELECT c.c_custkey, c.c_mktsegment AS segment,
           (ch.c_custkey IS NULL) AS is_current, 1 AS version
    FROM customer c LEFT JOIN changed ch ON c.c_custkey = ch.c_custkey
    UNION ALL
    SELECT c_custkey, new_segment AS segment, TRUE AS is_current,
           2 AS version
    FROM changed
    """,
)
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO, SCD-type-2 shape, without a table format: an update
    batch (custkey % 10 -> MACHINERY) closes out changed dimension rows
    (version 1 flips is_current=false) and appends the new current
    version — unchanged rows pass through untouched.  One broadcast of
    the change set (updates are small by nature); the dimension never
    shuffles.  On a real lakehouse this is the transactional MERGE; the
    logical plan — change detection via join, closed-out + new rows via
    union — is identical."""
    c = load_table(spark, sf_dir, "customer")
    upd = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.lit("MACHINERY").alias("new_segment")
    )
    changed = (
        c.join(upd, "c_custkey")
        .filter(F.col("c_mktsegment") != F.col("new_segment"))
        .select("c_custkey", "new_segment")
    )
    # the changed-key set is an SF-growing customer slice (~10% of the
    # table) — no forced hint (the r8/r10 rule); AQE broadcasts it at
    # small SF and degrades to a shuffle join instead of an OOM at 100x
    marked = c.join(
        changed.withColumn("_chg", F.lit(True)),
        "c_custkey",
        "left",
    )
    v1 = marked.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("_chg").isNull().alias("is_current"),
        F.lit(1).alias("version"),
    )
    v2 = changed.select(
        "c_custkey",
        F.col("new_segment").alias("segment"),
        F.lit(True).alias("is_current"),
        F.lit(2).alias("version"),
    )
    return v1.unionByName(v2)


@query(
    "join_interval_bucketed",
    oracle="""
    SELECT i.event_id AS iv_id, count(*) AS n_events,
           round(sum(e.value), 4) + 0 AS val_sum
    FROM (SELECT event_id, ts AS start
          FROM events WHERE event_type = 'purchase') i
    JOIN events e ON e.ts >= i.start
                 AND e.ts < i.start + INTERVAL 30 MINUTE
    GROUP BY i.event_id
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join WITHOUT an equi key — the naive form is an
    O(|intervals| x |points|) theta join (a BroadcastNestedLoop at best).
    Scale formulation: truncate points to 30-minute buckets, explode each
    interval into the <=2 buckets it can overlap, equi-join on the bucket,
    then apply the exact range as a residual filter.  A point lives in
    exactly one bucket, so no pair dedup is needed.  The shuffle carries
    (bucket)-keyed rows; at 100 TB a hot bucket (flash-crowd minute) is
    one reduce key — salt the bucket with a point-side hash suffix and
    replicate the interval side if a bucket exceeds a task.  The DuckDB
    oracle runs the naive theta join — same result, quadratic plan —
    which is exactly the point."""
    ev = load_table(spark, sf_dir, "events")
    w = 1800  # bucket width == interval width, seconds
    pts = ev.select(
        "event_id",
        "ts",
        "value",
        F.floor(F.unix_timestamp("ts") / w).alias("bucket"),
    )
    iv = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("iv_id"), F.col("ts").alias("start"))
        .withColumn("b0", F.floor(F.unix_timestamp("start") / w))
        .withColumn("bucket", F.explode(F.array(F.col("b0"), F.col("b0") + 1)))
    )
    return (
        pts.join(iv, "bucket")
        .filter(
            (F.col("ts") >= F.col("start"))
            & (F.col("ts") < F.col("start") + F.expr("INTERVAL 30 MINUTES"))
        )
        .groupBy("iv_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.round(F.sum("value"), 4) + F.lit(0)).alias("val_sum"),
        )
    )


# deterministic one-char-deletion corruption of p_name (dialect-shared
# SQL fragment: substr/concat/greatest parse identically in Spark and
# DuckDB; greatest(len,1) guards the ANSI %-by-zero on empty names)
FUZZY_DIRTY_SQL = (
    "concat(substr(p_name, 1, CAST(p_partkey % greatest(length(p_name), 1) "
    "AS INT)), substr(p_name, CAST(p_partkey % greatest(length(p_name), 1) "
    "AS INT) + 2))"
)


def _del_variants(col: str):
    """Self + every 1-deletion variant of ``col`` (deduplicated) — the
    SymSpell deletion neighborhood for edit distance <= 1."""
    return F.expr(
        f"array_union(array({col}), CASE WHEN length({col}) >= 1 THEN "
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substr({col}, 1, i - 1), "
        f"substr({col}, i + 1, length({col})))) "
        f"ELSE array() END)"
    )


@query(
    "join_fuzzy_string",
    oracle=f"""
    WITH clean AS (
        SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL
    ),
    dirty AS (
        SELECT p_partkey, {FUZZY_DIRTY_SQL} AS dn
        FROM part WHERE p_name IS NOT NULL
    )
    SELECT d.p_partkey, c.p_name AS clean_match,
           CAST(levenshtein(d.dn, c.p_name) AS INTEGER) AS dist
    FROM dirty d JOIN clean c
      ON abs(length(d.dn) - length(c.p_name)) <= 1
     AND levenshtein(d.dn, c.p_name) <= 1
    """,
)
def join_fuzzy_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string join (edit distance <= 1) via SymSpell deletion
    neighborhoods: every name — the synthesized typo'd side and the
    clean dictionary side — expands to itself + its 1-deletion
    variants; two strings within edit distance 1 ALWAYS share a
    variant (equal → self; substitution → both drop the differing
    position; insert/delete → the shorter string itself), so an
    equi-join on the variant produces a complete candidate set and
    exact ``levenshtein`` verifies each candidate pair.

    Scale shape: candidate generation is an in-array transform (len+1
    variants per name) feeding a hash equi-join — NO cross/theta join
    anywhere, so cost is bucket-bounded like the LSH families; the
    verify touches only candidate pairs.  The oracle runs the naive
    length-blocked quadratic join — same result, quadratic plan —
    which is exactly the point (the join_interval_bucketed argument).
    """
    part = load_table(spark, sf_dir, "part")
    clean = (
        part.select("p_name").where(F.col("p_name").isNotNull()).distinct()
    )
    dirty = part.where(F.col("p_name").isNotNull()).select(
        "p_partkey", F.expr(FUZZY_DIRTY_SQL).alias("dn")
    )
    cvar = clean.select("p_name", F.explode(_del_variants("p_name")).alias("v"))
    dvar = dirty.select(
        "p_partkey", "dn", F.explode(_del_variants("dn")).alias("v")
    )
    return (
        dvar.join(cvar, "v")
        .select("p_partkey", "dn", "p_name")
        .distinct()
        .select(
            "p_partkey",
            F.col("p_name").alias("clean_match"),
            F.levenshtein("dn", "p_name").alias("dist"),
        )
        .filter(F.col("dist") <= 1)
    )


@query(
    "merge_upsert",
    oracle="""
    WITH target AS (
        SELECT c_custkey, COALESCE(c_name, '') AS name,
               round(COALESCE(c_acctbal, 0), 4) AS bal
        FROM customer WHERE c_custkey % 4 <> 0
    ),
    source AS (
        SELECT c_custkey, COALESCE(c_name, '') AS name,
               round(COALESCE(c_acctbal, 0) + 100, 4) AS bal
        FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
           COALESCE(s.name, t.name) AS name,
           COALESCE(s.bal, t.bal) AS bal,
           CASE WHEN s.c_custkey IS NULL THEN 'kept'
                WHEN t.c_custkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS action
    FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO, latest-wins upsert shape (the companion to
    merge_scd2's history-keeping variant): matched keys take the source
    row, unmatched target rows pass through, unmatched source rows
    insert — one FULL OUTER join keyed on the merge key, which at 100 TB
    is a single co-partitioned shuffle on both sides (and the standard
    logical plan a lakehouse MERGE lowers to when the update batch is
    too large to broadcast).  The action column audits the three merge
    outcomes; source/target carved from customer by key arithmetic so
    all three outcomes occur and the oracle recomputes them."""
    c = load_table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 4 != 0).select(
        "c_custkey",
        F.coalesce("c_name", F.lit("")).alias("name"),
        F.round(F.coalesce("c_acctbal", F.lit(0.0)), 4).alias("bal"),
    )
    source = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.coalesce("c_name", F.lit("")).alias("name"),
        F.round(F.coalesce("c_acctbal", F.lit(0.0)) + 100, 4).alias("bal"),
    )
    t = target.alias("t")
    s = source.alias("s")
    j = t.join(s, F.col("t.c_custkey") == F.col("s.c_custkey"), "full_outer")
    return j.select(
        F.coalesce(F.col("s.c_custkey"), F.col("t.c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("s.name"), F.col("t.name")).alias("name"),
        F.coalesce(F.col("s.bal"), F.col("t.bal")).alias("bal"),
        F.when(F.col("s.c_custkey").isNull(), F.lit("kept"))
        .when(F.col("t.c_custkey").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("action"),
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH od AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN CAST(floor(epoch(e.ts)) AS BIGINT)
                     - CAST(floor(epoch(od.o_orderdate)) AS BIGINT)
                     <= 30 * 86400
                THEN od.o_orderkey END AS asof_orderkey
    FROM events e
    ASOF LEFT JOIN od
      ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (the pandas merge_asof
    ``tolerance=`` semantics): each event matches its latest prior
    order ONLY if that order is at most 30 days old — stale state
    must read as no-state, the contract every feature-store lookup
    needs.  Same one-shuffle union + keyed-window formulation as
    join_asof, carrying BOTH the order key and its epoch through twin
    last(ignorenulls) windows (they null out together, so the pair is
    consistent); the age test is whole-second integer arithmetic on
    both engines (the ts_sessionize epoch rule).  Orders pre-deduped
    per (custkey, orderdate) for deterministic ties."""
    ev = load_table(spark, sf_dir, "events")
    od = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    left = ev.select(
        F.col("user_id").alias("k"),
        F.col("ts").cast("timestamp").alias("t"),
        F.lit(1).alias("side"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("ord_key"),
        F.lit(None).cast("long").alias("ord_s"),
    )
    right = od.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("ord_key"),
        F.floor(F.col("o_orderdate").cast("timestamp").cast("double"))
        .cast("long")
        .alias("ord_s"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        left.unionByName(right)
        .withColumn("a_key", F.last("ord_key", ignorenulls=True).over(w))
        .withColumn("a_s", F.last("ord_s", ignorenulls=True).over(w))
    )
    ev_s = F.floor(F.col("t").cast("double")).cast("long")
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.when(
            ev_s - F.col("a_s") <= 30 * 86400, F.col("a_key")
        ).alias("asof_orderkey"),
    )
