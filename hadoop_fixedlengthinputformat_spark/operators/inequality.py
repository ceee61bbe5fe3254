"""Round-12 inequality / concentration statistics.

Nothing like these exists in the reference (SURVEY.md §2.2); they
complete the concentration family around agg_gini / agg_hhi: the Theil
and Atkinson inequality indices (the two classical entropy-based
measures next to Gini), the Lorenz-curve decile table Gini is the area
of, and the Pareto-cover window ("how many suppliers cover 80% of
revenue") — the concentration questions a curation dashboard asks of
domain/source mixes at 100 TB.

Determinism recipes (CLAUDE.md rounds 5–8): values floor to exact
int64 units; transcendentals pay ONE snapped ln/exp per DISTINCT value
via integer ln-units (the agg_geometric_mean / agg_mutual_info trick)
so every corpus-sized sum is exact and merge-order-free; running sums
use explicit ROWS frames (rank-tied values are equal, so the running
sum at any fixed rank is tie-order invariant); final ratios snap to 4
with ``+ 0``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_fixedlengthinputformat_spark.functions.num import snap_sql
from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table

# ln in 1e5 integer units (5 decimals): Theil's Σ x·ln(x) carries the
# VALUE as a factor, so the unit scale trades precision against the
# int64 budget — at 1e5 units the per-term rounding is ≤ 5e-6 ln-units
# (invisible at the snapped-to-4 output) and the group sum
# Σ cnt·x·ln5(x) ≤ n · 5e5 · 1.32e6 ≈ n · 6.6e11 stays int64-exact to
# n ≈ 1.4e7 rows per group (~46x the sf1 per-priority count;
# re-unit x beyond).
_LN5_INT = "CAST(floor(ln(CAST({v} AS DOUBLE)) * 100000.0 + 0.5) AS BIGINT)"
# ln in 1e8 units for the un-weighted Σ ln(x) (agg_geometric_mean
# budget: ≤ 1.32e9/row → int64-safe to ~5e9 rows).
_LN8_INT = "CAST(floor(ln(CAST({v} AS DOUBLE)) * 100000000.0 + 0.5) AS BIGINT)"

# T = Σx·ln(x) / (S·unit) − ln(S/n): the first term is a division of
# exact int64s (identical bits both engines), the second a snapped ln
# of an int64-exact ratio — one shared tree, snapped to 4.
_THEIL = snap_sql(
    "CAST(sxl AS DOUBLE) / (CAST(s0 AS DOUBLE) * 100000.0) - ("
    + snap_sql("ln(CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE))", 8)
    + ")",
    4,
)

# A(eps=1) = 1 − geomean/mean = 1 − exp(Σln(x)/(n·1e8)) · n / S, the
# exp snapped to 8 before the int64-exact mean divides it.
_ATKINSON = snap_sql(
    "1.0 - ("
    + snap_sql("exp(CAST(sl8 AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0))", 8)
    + ") * CAST(n AS DOUBLE) / CAST(s0 AS DOUBLE)",
    4,
)


@query(
    "agg_theil_index",
    oracle=f"""
    WITH base AS (
        SELECT o_orderpriority AS priority,
               CAST(floor(o_totalprice) AS BIGINT) AS x
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_totalprice >= 1
              AND o_orderpriority IS NOT NULL
    ),
    per AS (
        SELECT priority, x, CAST(count(*) AS BIGINT) AS cnt
        FROM base GROUP BY priority, x
    ),
    s AS (
        SELECT priority,
               CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(cnt * x) AS BIGINT) AS s0,
               CAST(SUM(cnt * x * {_LN5_INT.format(v='x')}) AS BIGINT)
                   AS sxl
        FROM per GROUP BY priority
    )
    SELECT priority, n AS n_orders, s0 AS sum_value, sxl AS xlnx_sum_e5,
           {_THEIL} + 0 AS theil_t
    FROM s WHERE s0 > 0
    """,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of order value per priority class —
    the entropy-based inequality measure next to agg_gini:
    T = (1/n)·Σ (xᵢ/μ)·ln(xᵢ/μ) = Σx·ln(x)/(S·unit) − ln(S/n).
    Each DISTINCT floored-dollar value pays one ln, snapped straight to
    int64 1e-5 ln-units, so Σ cnt·x·ln5(x) is exact and merge-order-
    free (budget in the module header); the two final terms divide /
    ln int64-exact operands in one shared tree (snap 8 inside, 4
    outside, +0).  The exact Σx·ln(x) is EXPOSED as xlnx_sum_e5 (the
    float-free primary).  Shuffle shape: one (priority, x) map-side-
    combined collapse, then a |priorities|-row aggregate — corpus read
    once."""
    o = load_table(spark, sf_dir, "orders")
    base = o.where(
        F.col("o_totalprice").isNotNull()
        & (F.col("o_totalprice") >= 1)
        & F.col("o_orderpriority").isNotNull()
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.floor("o_totalprice").cast("long").alias("x"),
    )
    per = base.groupBy("priority", "x").agg(F.count(F.lit(1)).alias("cnt"))
    ln5 = F.floor(
        F.log(F.col("x").cast("double")) * 100000.0 + 0.5
    ).cast("long")
    s = per.groupBy("priority").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.col("x")).alias("s0"),
        F.sum(F.col("cnt") * F.col("x") * ln5).alias("sxl"),
    )
    return s.where(F.col("s0") > 0).select(
        "priority",
        F.col("n").alias("n_orders"),
        F.col("s0").alias("sum_value"),
        F.col("sxl").alias("xlnx_sum_e5"),
        (F.expr(_THEIL) + F.lit(0.0)).alias("theil_t"),
    )


@query(
    "agg_atkinson_index",
    oracle=f"""
    WITH base AS (
        SELECT o_orderpriority AS priority,
               CAST(floor(o_totalprice) AS BIGINT) AS x
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_totalprice >= 1
              AND o_orderpriority IS NOT NULL
    ),
    per AS (
        SELECT priority, x, CAST(count(*) AS BIGINT) AS cnt
        FROM base GROUP BY priority, x
    ),
    s AS (
        SELECT priority,
               CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(cnt * x) AS BIGINT) AS s0,
               CAST(SUM(cnt * {_LN8_INT.format(v='x')}) AS BIGINT) AS sl8
        FROM per GROUP BY priority
    )
    SELECT priority, n AS n_orders, sl8 AS ln_sum_e8,
           {_ATKINSON} + 0 AS atkinson
    FROM s WHERE s0 > 0
    """,
)
def agg_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index (inequality-aversion ε = 1) of order
    value per priority: A = 1 − geomean/mean.  The geometric mean
    reuses the agg_geometric_mean integer ln-unit sum (one snapped ln
    per DISTINCT value, Σ cnt·ln8(x) exact int64, exposed as
    ln_sum_e8); mean = S/n divides exact int64s; exp snaps to 8 before
    the final ratio snaps to 4 (+0).  Same single-collapse shuffle
    shape as agg_theil_index."""
    o = load_table(spark, sf_dir, "orders")
    base = o.where(
        F.col("o_totalprice").isNotNull()
        & (F.col("o_totalprice") >= 1)
        & F.col("o_orderpriority").isNotNull()
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.floor("o_totalprice").cast("long").alias("x"),
    )
    per = base.groupBy("priority", "x").agg(F.count(F.lit(1)).alias("cnt"))
    ln8 = F.floor(
        F.log(F.col("x").cast("double")) * 100000000.0 + 0.5
    ).cast("long")
    s = per.groupBy("priority").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.col("x")).alias("s0"),
        F.sum(F.col("cnt") * ln8).alias("sl8"),
    )
    return s.where(F.col("s0") > 0).select(
        "priority",
        F.col("n").alias("n_orders"),
        F.col("sl8").alias("ln_sum_e8"),
        (F.expr(_ATKINSON) + F.lit(0.0)).alias("atkinson"),
    )


_LORENZ_SHARE = snap_sql(
    "CAST(cum_value AS DOUBLE) / CAST(total_value AS DOUBLE)", 4
)


@query(
    "agg_lorenz_deciles",
    oracle=f"""
    WITH base AS (
        SELECT o_orderpriority AS priority,
               CAST(floor(o_totalprice) AS BIGINT) AS x
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0
              AND o_orderpriority IS NOT NULL
    ),
    ranked AS MATERIALIZED (
        SELECT priority, x,
               ROW_NUMBER() OVER (PARTITION BY priority ORDER BY x) AS i,
               CAST(SUM(x) OVER (PARTITION BY priority ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(COUNT(*) OVER (PARTITION BY priority) AS BIGINT) AS n,
               CAST(SUM(x) OVER (PARTITION BY priority) AS BIGINT) AS tot
        FROM base
    )
    SELECT r.priority, CAST(d.d AS INT) AS decile,
           CAST(r.i AS BIGINT) AS cum_orders,
           r.cum AS cum_value, r.tot AS total_value,
           {_LORENZ_SHARE.replace('cum_value', 'r.cum').replace('total_value', 'r.tot')}
               + 0 AS cum_share
    FROM ranked r
    JOIN (SELECT unnest(generate_series(1, 10)) AS d) d
      ON r.i = (d.d * r.n) // 10
    WHERE r.tot > 0
    """,
)
def agg_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve decile table of order value per priority — the
    cumulative value share held by the poorest 10%, 20%, … of orders
    (agg_gini is the area this curve encloses).  Rows rank ascending
    by exact int64 value with an explicit ROWS-frame running sum: rank
    ties are EQUAL values, so the running sum at any fixed rank is
    tie-order invariant (merge-order-free without a tiebreak column);
    decile d reads the running sum at rank (d·n) div 10 via an
    equi-join against the 10-row decile table (broadcast).  Groups
    smaller than 10 rows emit only the deciles whose boundary rank is
    ≥ 1 — identical join semantics both sides.  Shares divide exact
    int64s, snapped to 4 (+0).  Shuffle shape: ONE priority-keyed
    window exchange feeding rank + running sum + totals."""
    o = load_table(spark, sf_dir, "orders")
    base = o.where(
        F.col("o_totalprice").isNotNull()
        & (F.col("o_totalprice") >= 0)
        & F.col("o_orderpriority").isNotNull()
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.floor("o_totalprice").cast("long").alias("x"),
    )
    w_ord = Window.partitionBy("priority").orderBy("x")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("priority")
    ranked = base.select(
        "priority",
        F.row_number().over(w_ord).cast("long").alias("i"),
        F.sum("x").over(w_run).alias("cum"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("x").over(w_all).alias("tot"),
    )
    deciles = spark.range(1, 11).select(F.col("id").cast("int").alias("d"))
    # boundary rank of decile d is (d*n) div 10 — positive operands, so
    # Spark `div` and the oracle's `//` agree (ts_vwap rule)
    j = ranked.join(
        F.broadcast(deciles), F.expr("i = (CAST(d AS BIGINT) * n) div 10")
    )
    return j.where(F.col("tot") > 0).select(
        "priority",
        F.col("d").alias("decile"),
        F.col("i").alias("cum_orders"),
        F.col("cum").alias("cum_value"),
        F.col("tot").alias("total_value"),
        (F.expr(_LORENZ_SHARE.replace("cum_value", "cum").replace("total_value", "tot")) + F.lit(0.0)).alias(
            "cum_share"
        ),
    )


_PARETO_SHARE = snap_sql(
    "CAST(covered_units AS DOUBLE) / CAST(total_units AS DOUBLE)", 4
)


@query(
    "win_pareto_cover",
    oracle=f"""
    WITH rev AS (
        SELECT l_returnflag AS flag, l_suppkey,
               CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                    AS BIGINT) AS units
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_suppkey IS NOT NULL
              AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
        GROUP BY l_returnflag, l_suppkey
    ),
    ranked AS MATERIALIZED (
        SELECT flag,
               ROW_NUMBER() OVER (PARTITION BY flag
                   ORDER BY units DESC, l_suppkey) AS i,
               CAST(SUM(units) OVER (PARTITION BY flag
                    ORDER BY units DESC, l_suppkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(COUNT(*) OVER (PARTITION BY flag) AS BIGINT)
                   AS n_suppliers,
               CAST(SUM(units) OVER (PARTITION BY flag) AS BIGINT) AS tot
        FROM rev
    )
    SELECT flag, n_suppliers,
           CAST(MIN(i) AS BIGINT) AS k_cover80,
           CAST(MIN(cum) AS BIGINT) AS covered_units,
           tot AS total_units,
           {_PARETO_SHARE.replace('covered_units', 'MIN(cum)').replace('total_units', 'tot')}
               + 0 AS covered_share
    FROM ranked
    WHERE 5 * cum >= 4 * tot AND tot > 0
    GROUP BY flag, n_suppliers, tot
    """,
)
def win_pareto_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-cover: per return flag, the smallest number of suppliers
    whose revenue covers ≥ 80% of the flag total (the 80/20 census a
    curation dashboard runs over domain/source concentration).
    Revenue is exact integer units (price cents × discount points —
    the exact_revenue_sum construction); suppliers rank by
    (units DESC, suppkey ASC) — a total order, so the ROWS-frame
    running sum is fully deterministic; the cover point is the MIN
    rank where 5·cum ≥ 4·total (pure integer predicate), and MIN(cum)
    over qualifying rows equals the running sum AT that rank because
    the running sum is nondecreasing.  Overflow budget: per-flag tot
    is ~2.4e11 at sf1 (3 flags × lineitem revenue units ~7.3e11
    total), scaling linearly, so 5·tot ≈ 3.6e18 at sf1000 — ~2.5×
    int64 headroom; safe through sf1000, wraps near sf~2500 (re-unit
    before comparing, or switch to cum >= ceil(0.8·tot), if a larger
    corpus is ever targeted).  The only double is the final
    snapped share.  Shuffle shape: one (flag, suppkey) map-side-
    combined collapse, ONE flag-keyed window exchange, a |flags|-row
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isNotNull()
        & F.col("l_suppkey").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & F.col("l_discount").isNotNull()
    )
    rev = li.groupBy(
        F.col("l_returnflag").alias("flag"), "l_suppkey"
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long"))
        ).alias("units")
    )
    w_ord = Window.partitionBy("flag").orderBy(
        F.desc("units"), F.asc("l_suppkey")
    )
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("flag")
    ranked = rev.select(
        "flag",
        F.row_number().over(w_ord).cast("long").alias("i"),
        F.sum("units").over(w_run).alias("cum"),
        F.count(F.lit(1)).over(w_all).alias("n_suppliers"),
        F.sum("units").over(w_all).alias("tot"),
    )
    return (
        ranked.where((5 * F.col("cum") >= 4 * F.col("tot")) & (F.col("tot") > 0))
        .groupBy("flag", "n_suppliers", "tot")
        .agg(F.min("i").alias("k_cover80"), F.min("cum").alias("covered_units"))
        .select(
            "flag",
            "n_suppliers",
            "k_cover80",
            "covered_units",
            F.col("tot").alias("total_units"),
            (
                F.expr(_PARETO_SHARE.replace("total_units", "tot"))
                + F.lit(0.0)
            ).alias("covered_share"),
        )
    )
