"""TPC-H composite suite (Q2/Q4/Q6-Q9/Q11-Q13/Q15-Q17/Q19-Q22 shapes).

With ``tpch_composites.py`` (Q3/Q5/Q10/Q14/Q18) and the Q1-shaped
``agg_groupby_hash``, every TPC-H query shape is covered.

Extends ``tpch_composites.py`` (Q3/Q5/Q10/Q14/Q18) to near-full TPC-H
coverage, adapted to the driver's reduced star schema: no ``partsupp``
(Q9's supply cost becomes a ``p_retailprice`` proxy, Q16 counts suppliers
via lineitem), no ``l_commitdate``/``l_receiptdate`` (Q4/Q21 lateness is
expressed against ``l_shipdate``), no ``c_phone`` (Q22 country code is
``c_nationkey % 10``).  The reference itself has no query language
(SURVEY.md §2.2); these are the engine-side composites a consumer of the
fixed-width source runs downstream.

Scale shapes (see plans/NOTES.md shuffle inventory):
  * broadcast HINTS only on bounded sides: nation/region (25/5 rows at
    every SF) and global one-row aggregates (q11's thr, q15's best,
    q22's avg_bal).  customer/supplier/part GROW with scale factor, so
    they carry NO hint — AQE broadcasts them while they fit
    autoBroadcastJoinThreshold and falls back to shuffle joins at
    100x, where a forced hint would OOM the driver (VERDICT r7 #2;
    pinned by test_tpch_hints_never_broadcast_sf_scaling_tables).
    The single fact shuffle is on the join key of lineitem⋈orders.
  * Q4/Q21 EXISTS / NOT EXISTS legs are orderkey-equi semi/anti joins —
    lineitem co-partitions on l_orderkey across all legs, so AQE reuses
    the exchange rather than re-shuffling per leg.
  * Q8's market share and Q17's avg-yearly divide ALREADY-ROUNDED sums
    with the floor(x*1e4+0.5)/1e4 trick so both engines run identical
    IEEE ops (never round(double,n) per-row — round-1 lesson).
  * Q13 groups the join output on its join key (c_custkey), so the
    count rides the join's hash partitioning without a second exchange;
    the c_count histogram exchange carries |distinct counts| rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.functions.num import money_units, snap
from hadoop_fixedlengthinputformat_spark.operators.tpch_composites import (
    _REV_SUM_SQL,
    _REV_UNITS_SQL,
    _rev_sum,
    _rev_units,
)
from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def _round4(col):
    # for values whose EXACT decimal form has <=4 decimals (counts, 2dp
    # money sums, 4dp qty-value sums): identity-distance rounding, safe.
    # Revenue-style 6-decimal sums must use _rev_sum/_rev_units instead
    # (see tpch_composites._rev_units for why).
    return F.round(col, 4)


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders in a quarter with at least one late-shipped line
    (shipdate > orderdate + 30 days stands in for the missing
    commitdate/receiptdate pair).  Semi join keyed on orderkey; the date
    filter shrinks the probe side before the shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT floor(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
                     CAST(round(l_discount * 10000, 0) AS BIGINT))
                 / 1000000.0 * 10000 + 0.5) / 10000 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan-side aggregate — every predicate pushes to the
    parquet scan, zero shuffles (map partials collapse to one row)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            snap(
                F.sum(
                    money_units(F.col("l_extendedprice"), 2)
                    * money_units(F.col("l_discount"), 4)
                )
                / F.lit(1_000_000.0),
                4,
            ).alias("revenue")
        )
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           floor(sum(volume) / 1000000.0 * 10000 + 0.5) / 10000 AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               {_REV_UNITS_SQL} AS volume
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume by year between two nations.
    supplier/customer/nation broadcast; one lineitem⋈orders fact shuffle;
    final agg carries 2 nations × 2 years of partials."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _rev_units().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(snap(F.sum("volume") / F.lit(1_000_000.0), 4).alias("revenue"))
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH all_nations AS (
        SELECT year(o_orderdate) AS o_year,
               {_REV_UNITS_SQL} AS volume,
               n2.n_name AS nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n1 ON c_nationkey = n1.n_nationkey
             JOIN region ON n1.n_regionkey = r_regionkey
             JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    ), sums AS (
        SELECT o_year,
               floor(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                     / 1000000.0 * 10000 + 0.5) / 10000 AS nation_volume,
               floor(sum(volume) / 1000000.0 * 10000 + 0.5) / 10000
                   AS total_volume
        FROM all_nations GROUP BY o_year
    )
    SELECT o_year, nation_volume, total_volume,
           floor(nation_volume / total_volume * 10000 + 0.5) / 10000 AS mkt_share
    FROM sums
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_3's share of PROMO-part volume sold into EUROPE,
    by order year.  All dims broadcast; the share divides two
    already-rounded sums (identical IEEE ops both engines)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sums = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_units().alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            snap(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume"))
                    .otherwise(F.lit(0).cast("long"))
                )
                / F.lit(1_000_000.0),
                4,
            ).alias("nation_volume"),
            snap(F.sum("volume") / F.lit(1_000_000.0), 4).alias("total_volume"),
        )
    )
    return sums.select(
        "o_year",
        "nation_volume",
        "total_volume",
        (
            F.floor(F.col("nation_volume") / F.col("total_volume") * 10000 + 0.5) / 10000
        ).alias("mkt_share"),
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT nation, o_year,
           floor(sum(amount) / 1000000.0 * 10000 + 0.5) / 10000 AS sum_profit
    FROM (
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               {_REV_UNITS_SQL}
                   - 60 * CAST(round(p_retailprice * 100, 0) AS BIGINT)
                        * CAST(round(l_quantity * 100, 0) AS BIGINT) AS amount
        FROM part JOIN lineitem ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and order year.  The schema has
    no partsupp, so cost is proxied as 0.6·p_retailprice·l_quantity —
    same plan shape (part filter broadcast, fact shuffle on orderkey)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    # profit in exact 1e-6 units: 0.6*retail*qty*1e6 == 60 * (retail
    # cents) * (qty cents) — every term an exact int64, so group sums
    # are bit-identical across engines (0.6 itself is binary-inexact;
    # computed in float it seeds boundary-straddle divergence)
    amount = _rev_units() - F.lit(60) * money_units(
        F.col("p_retailprice"), 2
    ) * money_units(F.col("l_quantity"), 2)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(snap(F.sum("amount") / F.lit(1_000_000.0), 4).alias("sum_profit"))
    )


@query(
    "tpch_q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: high/low-priority line counts per linestatus (the
    schema has no l_shipmode; linestatus plays the grouping role).
    One orderkey shuffle; conditional counts are map-side partials."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: histogram of per-customer order counts (excluding
    5-LOW).  The per-customer count groups on the join key, so it rides
    the join's partitioning; the histogram exchange is |distinct counts|."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {_REV_SUM_SQL} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) with max quarterly revenue.  The revenue agg
    shuffles on suppkey once; the max is a broadcast scalar; supplier is
    a broadcast dim.  (Rounding before the max keeps the equality
    comparison on values both engines agree on.)"""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_rev_sum().alias("total_revenue"))
    )
    best = revenue.agg(F.max("total_revenue").alias("best_rev"))
    return (
        revenue.join(F.broadcast(best), F.col("total_revenue") == F.col("best_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per part attribute bucket (lineitem
    plays partsupp's role).  Part filter broadcast; count-distinct is
    Spark's two-phase expand — first phase dedups (group, suppkey) pairs
    map-side, so the exchange never carries raw lineitem rows."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_quantity",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey,
               sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS s_units,
               count(*) AS n_li
        FROM lineitem GROUP BY l_partkey
    )
    SELECT floor(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
                 / 7.0 * 10000 + 0.5) / 10000 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
         JOIN part_avg ON part_avg.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#13'
      AND 5 * CAST(round(l_quantity * 100, 0) AS BIGINT) * n_li < s_units
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue lost to small-quantity orders of one brand.
    The per-part stats are computed only over that brand's parts
    (identical result: they are per-partkey, and the part filter prunes
    partkeys, not lineitems of a kept part) — at 100 TB the agg runs on
    the semi-filtered fact, not all of lineitem.  The qty < 0.2·avg test
    cross-multiplies in exact integer cents (5·qty·n < total), so a
    group whose average lands exactly on the boundary can't be decided
    by float error; the price sum is exact cents too."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    brand_li = li.join(p, li.l_partkey == p.p_partkey)
    part_stats = (
        brand_li.groupBy(F.col("l_partkey").alias("pa_key"))
        .agg(
            F.sum(money_units(F.col("l_quantity"), 2)).alias("s_units"),
            F.count(F.lit(1)).alias("n_li"),
        )
    )
    return (
        brand_li.join(part_stats, F.col("l_partkey") == F.col("pa_key"))
        .filter(
            5 * money_units(F.col("l_quantity"), 2) * F.col("n_li")
            < F.col("s_units")
        )
        .agg(
            (
                F.floor(
                    F.sum(money_units(F.col("l_extendedprice"), 2))
                    / F.lit(100.0)
                    / 7.0
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("avg_yearly")
        )
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
    SELECT {_REV_SUM_SQL} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunctive brand/size/quantity predicates over the
    part⋈lineitem join.  The equi-join on partkey broadcasts part; the
    OR residual evaluates post-join in codegen (Catalyst also extracts
    the common l_quantity/p_size bounds for scan-level pruning)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(_rev_sum().alias("revenue"))
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
         JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
         JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: NATION_1 suppliers whose line was the last to ship in a
    multi-supplier finished order (shipdate stands in for receiptdate-
    past-commitdate).  All three lineitem legs join on l_orderkey, so
    they share one hash partitioning; supplier/nation broadcast; the
    top-10 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    base = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    with_other = base.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    not_late = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        not_late.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eur AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ), best AS (
        SELECT c.l_partkey, min(c.unit_cost) AS min_cost
        FROM cost c JOIN eur ON c.l_suppkey = eur.s_suppkey
        GROUP BY c.l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
    FROM cost c
    JOIN eur ON c.l_suppkey = eur.s_suppkey
    JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.min_cost
    JOIN part ON c.l_partkey = p_partkey
    WHERE p_type = 'LARGE' AND p_size <= 10
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each small LARGE-type part, the European supplier(s)
    achieving the minimum observed unit price (min(l_extendedprice /
    l_quantity) over lineitem stands in for the missing
    partsupp.ps_supplycost).  The per-(part, supp) cost agg is the one
    fact shuffle; the per-part min rides pre-aggregated rows; supplier⋈
    nation⋈region and the filtered part slice broadcast.  The min-cost
    equality join compares doubles produced by IDENTICAL IEEE ops
    (divide, then min — pure selection, no re-arithmetic) so both
    engines keep exactly the same rows; ties keep every achieving
    supplier, as in real Q2."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # eur_cost feeds BOTH the per-part min and the final selection; the
    # executed plan (round 15) showed the two consumers re-running the
    # whole subtree — lineitem scanned twice, supplier/nation/region
    # twice (7 parquet scans, ReusedExchange recovered only the
    # exchange).  localCheckpoint materializes it once: the table is
    # the schema's stand-in for TPC-H partsupp — distinct (part, supp)
    # pairs filtered to one region, bounded by |part| x suppliers/part,
    # never corpus-sized (guide §5 caching rule).
    eur_cost = cost.join(eur, cost.l_suppkey == eur.s_suppkey).localCheckpoint(
        eager=False
    )
    best = eur_cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    return (
        eur_cost.join(
            best,
            (eur_cost.l_partkey == best.b_partkey)
            & (eur_cost.unit_cost == best.min_cost),
        )
        .join(p, eur_cost.l_partkey == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "unit_cost")
    )


@query(
    "tpch_q11_important_parts",
    oracle="""
    WITH val AS (
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
                   CAST(round(l_quantity * 100, 0) AS BIGINT)) AS raw_units
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT l_partkey, raw_units / 10000.0 AS part_value
    FROM val
    WHERE raw_units / 10000.0 >
          (SELECT floor(sum(raw_units) / 10000.0 * 0.001 * 10000 + 0.5) / 10000
           FROM val)
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts representing a significant share of one nation's
    traded value (sum(l_extendedprice * l_quantity) stands in for the
    missing ps_supplycost * ps_availqty).  The nation's supplier list
    broadcasts; the one fact shuffle is the per-part partial-agg sum;
    the grand total re-aggregates the per-part rows (tiny) and comes
    back as a broadcast scalar.  Both the per-part value and the
    threshold are snapped to 4 decimals BEFORE the comparison so the
    engines' different double-summation orders cannot flip a
    boundary row."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    val = (
        li.join(supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                money_units(F.col("l_extendedprice"), 2)
                * money_units(F.col("l_quantity"), 2)
            ).alias("raw_units")
        )
    )
    thr = val.agg(
        snap(F.sum("raw_units") / F.lit(10_000.0) * 0.001, 4).alias("thr")
    )
    return (
        val.join(F.broadcast(thr))
        .filter(F.col("raw_units") / F.lit(10_000.0) > F.col("thr"))
        .select(
            "l_partkey",
            (F.col("raw_units") / F.lit(10_000.0)).alias("part_value"),
        )
    )


@query(
    "tpch_q20_excess_share",
    oracle="""
    WITH per AS (
        SELECT l_suppkey, l_partkey,
               sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS supp_units
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
    ), tot AS (
        SELECT l_partkey, sum(supp_units) AS part_units
        FROM per GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM per
    JOIN tot USING (l_partkey)
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
      AND 10 * per.supp_units > 3 * tot.part_units
      AND n_regionkey = 1
    """,
)
def tpch_q20_excess_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: region-1 suppliers who shipped more than 30% of a
    gear-part's 1997 volume (the share test stands in for the missing
    ps_availqty excess-stock test).  Quantities sum as exact integer
    cents and the 30% share test is pure integer arithmetic
    (10*supp > 3*part) — an exact decimal tie can't be decided by float
    error direction.  One (supp, part) partial-agg shuffle; the per-part
    total rides those pre-aggregated rows; part/supplier/nation
    broadcast; output is the distinct supplier set."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    per = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(money_units(F.col("l_quantity"), 2)).alias("supp_units")
    )
    tot = per.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supp_units").alias("part_units")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    return (
        per.join(tot, per.l_partkey == tot.t_partkey)
        .filter(10 * F.col("supp_units") > 3 * F.col("part_units"))
        .join(p, per.l_partkey == p.p_partkey)
        .join(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey),
              per.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "tpch_q22_global_sales",
    oracle="""
    WITH eligible AS (
        SELECT CAST(c_nationkey % 10 AS INTEGER) AS cntrycode,
               c_acctbal, c_custkey
        FROM customer
        WHERE c_nationkey % 10 IN (1, 2, 4, 5, 7)
    )
    SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 4) AS totacctbal
    FROM eligible
    WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) *
          (SELECT count(*) FROM eligible WHERE c_acctbal > 0.0)
          > (SELECT sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
             FROM eligible WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY cntrycode
    """,
)
def tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: well-funded customers with no orders, bucketed by
    country code (c_nationkey % 10 stands in for the phone prefix).
    The avg threshold is cross-multiplied in exact integer cents
    (bal*n > total) — bal > sum/n as floats can tie exactly when the
    true average lands on a 2-decimal value, and then float summation
    error direction decides the row.  The (count, sum) pair is one
    broadcast scalar row; the NOT EXISTS is an anti join on custkey
    against the orders key column only."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    eligible = c.filter((F.col("c_nationkey") % 10).isin(1, 2, 4, 5, 7)).select(
        (F.col("c_nationkey") % 10).cast("int").alias("cntrycode"),
        "c_acctbal",
        "c_custkey",
    )
    pos = eligible.filter(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(money_units(F.col("c_acctbal"), 2)).alias("sum_units"),
    )
    return (
        eligible.join(F.broadcast(avg_bal))
        .filter(
            money_units(F.col("c_acctbal"), 2) * F.col("n_pos")
            > F.col("sum_units")
        )
        .join(o, eligible.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _round4(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )
