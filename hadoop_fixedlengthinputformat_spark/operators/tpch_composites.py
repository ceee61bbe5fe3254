"""Composite analytics queries (TPC-H Q3/Q5/Q10 shapes).

End-to-end showpieces composing the §2.3 primitives — multi-way joins
with selective pushed-down predicates, aggregate, top-k.  Dates are
adjusted to the synthetic tables' 1995-2001 span.

Scale shape (all three): dimension sides broadcast, fact-fact join
shuffles once on orderkey, map-side partial agg collapses before the
group-key exchange, and Q10's top-k is TakeOrderedAndProject (per-
partition heaps, never a global sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.functions.num import money_units, snap
from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


def _rev_units():
    """Revenue line contribution as EXACT integer units of 1e-6.

    price (≤2 decimals) in cents × (1-discount) (≤4 decimals) in
    basis points: every product and partial sum is an exact int64, so
    the group total is bit-identical across engines and summation
    orders.  Summed as doubles instead, a group total can land exactly
    on a 4-decimal rounding boundary (digits 5-6 == "50") where float
    error direction decides the rounded value — the alt-seed tpch_q3
    one-row divergence.  Built lazily (Column needs a SparkContext)."""
    return money_units(F.col("l_extendedprice"), 2) * money_units(
        1 - F.col("l_discount"), 4
    )


# DuckDB twin of _rev_units (keep in lockstep)
_REV_UNITS_SQL = (
    "(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
    "CAST(round((1 - l_discount) * 10000, 0) AS BIGINT))"
)


def _rev_sum():
    """snap4(sum(exact units) / 1e6) — the 4-decimal revenue contract."""
    return snap(F.sum(_rev_units()) / F.lit(1_000_000.0), 4)


_REV_SUM_SQL = (
    f"floor(sum({_REV_UNITS_SQL}) / 1000000.0 * 10000 + 0.5) / 10000"
)


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_REV_SUM_SQL} AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey, o_orderdate
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: segment-filtered customers' unshipped-revenue per order."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1997-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1997-03-15")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_rev_sum().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "tpch_q5_local_supplier",
    oracle=f"""
    SELECT n_name, {_REV_SUM_SQL} AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                                AND c_nationkey = s_nationkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue from orders where customer and supplier share an
    ASIA nation.  supplier/nation/region broadcast; one fact shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_rev_sum().alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_REV_SUM_SQL} AS revenue,
           round(c_acctbal, 4) AS acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by returned-item revenue in a quarter
    (deterministic tiebreak on c_custkey)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_sum().alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 4).alias("acctbal"), "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q14_promo_effect",
    oracle=f"""
    WITH s AS (
        SELECT floor(sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN {_REV_UNITS_SQL}
                              ELSE 0 END) / 1000000.0 * 10000 + 0.5) / 10000
                   AS promo_revenue,
               {_REV_SUM_SQL} AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'
    )
    SELECT promo_revenue, total_revenue,
           floor(100.0 * promo_revenue / total_revenue * 10000 + 0.5) / 10000
               AS promo_pct
    FROM s
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promotional revenue share for one month.  Part is the
    broadcast dim; the fact scan carries the shipdate pushdown; one
    global agg with map-side partials.  Revenue sums in exact integer
    units (see _rev_units); the pct divides the two ALREADY-SNAPPED
    sums (floor trick), so both engines do identical IEEE ops on
    identical inputs."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    p = load_table(spark, sf_dir, "part")
    s = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            snap(
                F.sum(
                    F.when(F.col("p_type").like("PROMO%"), _rev_units())
                    .otherwise(F.lit(0).cast("long"))
                )
                / F.lit(1_000_000.0),
                4,
            ).alias("promo_revenue"),
            _rev_sum().alias("total_revenue"),
        )
    )
    return s.select(
        "promo_revenue",
        "total_revenue",
        (
            F.floor(
                100.0 * F.col("promo_revenue") / F.col("total_revenue") * 10000
                + 0.5
            )
            / 10000
        ).alias("promo_pct"),
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0
                   AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) > 30000
    )
    SELECT c_custkey, c_name, o_orderkey,
           round(o_totalprice, 4) AS totalprice, sum_qty
    FROM big JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape (large-volume orders): the HAVING-filtered aggregate
    shrinks the fact side FIRST, so the join input is |big orders|, not
    |lineitem| — at 100 TB the agg output is small enough that AQE
    flips the orders join to broadcast at runtime."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # exact integer cents: the >300 threshold can tie exactly (sum ==
    # 300.00), where float summation error direction would decide
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money_units(F.col("l_quantity"), 2)).alias("_qty_units"))
        .filter(F.col("_qty_units") > 30_000)
        .select(
            "l_orderkey",
            (F.col("_qty_units") / F.lit(100.0)).alias("sum_qty"),
        )
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            "sum_qty",
        )
    )
