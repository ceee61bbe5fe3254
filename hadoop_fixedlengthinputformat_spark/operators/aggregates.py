"""D family — aggregation (SURVEY.md §2.3-D).

The reference has no aggregation (its only arithmetic is offset math,
FixedLengthRecordReader.java:246); these ride Spark's hash aggregate with
map-side partial aggregation — at 100 TB the partial agg collapses each
scan partition to |groups| rows before the shuffle, so the shuffle volume
is O(groups x partitions), not O(rows).

Float policy (SURVEY §2.3 preamble): every double aggregate is wrapped in
round(x, 4) on BOTH engines so summation-order ulp drift can't flip the
driver's value hash; HAVING predicates use exact integer counts so no row
flickers across the boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.functions.num import money_units, snap
from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query(
    "agg_global",
    oracle="""
    SELECT sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0 AS sum_qty,
           floor(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                 / count(*) / 100.0 * 10000 + 0.5) / 10000 AS avg_price,
           round(min(l_discount), 4) AS min_disc,
           round(max(l_tax), 4) AS max_tax,
           count(*) AS cnt
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sums/avgs in exact integer cents (order-independent, bit-identical
    across engines); min/max are pure selection and stay raw."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return li.agg(
        (F.sum(money_units(F.col("l_quantity"), 2)) / F.lit(100.0)).alias(
            "sum_qty"
        ),
        snap(
            F.sum(money_units(F.col("l_extendedprice"), 2)) / n / F.lit(100.0), 4
        ).alias("avg_price"),
        F.round(F.min("l_discount"), 4).alias("min_disc"),
        F.round(F.max("l_tax"), 4).alias("max_tax"),
        F.count(F.lit(1)).alias("cnt"),
    )


# Q1 money/avg columns in exact integer units (2-decimal cents for
# qty/price, 4-decimal basis points for discount/tax): every group sum is
# order-independent and bit-identical across engines.  sum_charge's 10-dp
# unit product (<= ~1.1e15/row) sums in DECIMAL(38)/HUGEINT — int64 would
# overflow past ~1e4 rows/group — then converts once to double (the same
# exact integer converts to the same nearest double in both engines).
# Plain round(sum(double),4) here was a latent boundary-tie risk: a
# 6/10-dp exact group total CAN land exactly on the 4-decimal boundary.
Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0 AS sum_qty,
       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
           AS sum_base_price,
       floor(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
                 CAST(round((1 - l_discount) * 10000, 0) AS BIGINT))
             / 1000000.0 * 10000 + 0.5) / 10000 AS sum_disc_price,
       floor(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
                      CAST(round((1 - l_discount) * 10000, 0) AS BIGINT) *
                      CAST(round((1 + l_tax) * 10000, 0) AS BIGINT)) AS DOUBLE)
             / 10000000000.0 * 10000 + 0.5) / 10000 AS sum_charge,
       floor(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / count(*)
             / 100.0 * 10000 + 0.5) / 10000 AS avg_qty,
       floor(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / count(*)
             / 100.0 * 10000 + 0.5) / 10000 AS avg_price,
       floor(sum(CAST(round(l_discount * 10000, 0) AS BIGINT)) / count(*)
             / 10000.0 * 10000 + 0.5) / 10000 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the flagship query (``entry`` runs this at sf0.001).

    Plan shape at scale: parquet scan with l_shipdate predicate pushed down
    and 7-column pruning -> partial hash agg per scan partition (6 groups)
    -> single tiny shuffle -> final agg.  No join, no sort.  Money columns
    aggregate in exact integer units (see Q1_ORACLE comment); the decimal
    sum for sum_charge keeps partial aggregation map-side like any other
    hash-agg column.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty_u = money_units(F.col("l_quantity"), 2)
    price_u = money_units(F.col("l_extendedprice"), 2)
    disc_u = money_units(1 - F.col("l_discount"), 4)
    tax_u = money_units(1 + F.col("l_tax"), 4)
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_u) / F.lit(100.0)).alias("sum_qty"),
            (F.sum(price_u) / F.lit(100.0)).alias("sum_base_price"),
            snap(F.sum(price_u * disc_u) / F.lit(1_000_000.0), 4).alias(
                "sum_disc_price"
            ),
            snap(
                F.sum((price_u * disc_u * tax_u).cast("decimal(38,0)"))
                .cast("double")
                / F.lit(10_000_000_000.0),
                4,
            ).alias("sum_charge"),
            snap(F.sum(qty_u) / n / F.lit(100.0), 4).alias("avg_qty"),
            snap(F.sum(price_u) / n / F.lit(100.0), 4).alias("avg_price"),
            snap(
                F.sum(money_units(F.col("l_discount"), 4)) / n / F.lit(10_000.0),
                4,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


query("agg_groupby_hash", oracle=Q1_ORACLE)(pricing_summary)


@query(
    "agg_count_distinct",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS cnt_part,
           count(DISTINCT l_suppkey) AS cnt_supp,
           count(DISTINCT l_returnflag) AS cnt_flag
    FROM lineitem
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("cnt_part"),
        F.countDistinct("l_suppkey").alias("cnt_supp"),
        F.countDistinct("l_returnflag").alias("cnt_flag"),
    )


@query(
    "agg_distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS cnt
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "agg_cube",
    oracle="""
    SELECT c_mktsegment, c_nationkey, count(*) AS cnt,
           round(sum(c_acctbal), 4) AS sum_bal
    FROM customer
    GROUP BY CUBE (c_mktsegment, c_nationkey)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.cube("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("c_acctbal"), 4).alias("sum_bal"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty, count(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("flif_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty, count(*) AS cnt
        FROM flif_gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
        .filter(F.col("n_orders") > 12)
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           true AS parts_within_5pct,
           true AS orders_within_5pct
    FROM lineitem
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch, graded as a boolean accuracy gate (VERDICT
    r6 #2 recipe): the sketch estimate itself is engine-specific so it
    can't hash-match any oracle; instead emit the EXACT distinct counts
    (oracle-checkable) plus Spark-computed |approx-exact|/exact <= 0.05
    booleans whose oracle is the literal ``true``.  The raw sketch
    behavior stays covered in tests/test_operators.py.  rsd=0.02 gives
    ~2sigma headroom under the 5% gate at every SF."""
    li = load_table(spark, sf_dir, "lineitem")
    # Round-15: two countDistinct on DIFFERENT columns in one agg plan
    # as an Expand — every row duplicated per distinct group before the
    # shuffle (19.4 s at sf1).  One single-distinct aggregate per
    # column avoids Expand entirely (partial dedup by value map-side),
    # and the two 1-row results cross-join back.  Values identical:
    # exact counts are exact, and the HLL estimate is register-max
    # based, insensitive to plan shape.
    parts = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
    )
    orders = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("ao"),
    )
    agg = parts.crossJoin(orders)
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) / F.col(e) <= F.lit(0.05)
    )
    return agg.select(
        "exact_parts",
        "exact_orders",
        within("ap", "exact_parts").alias("parts_within_5pct"),
        within("ao", "exact_orders").alias("orders_within_5pct"),
    )


@query(
    "agg_hll_mergeable",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS exact_distinct,
           true AS est_within_5pct
    FROM customer GROUP BY c_nationkey
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT c_custkey) AS BIGINT), true
    FROM customer
    """,
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Datasketches HLL: per-nation customer sketches built in
    one pass, then UNIONED into a global distinct estimate WITHOUT
    re-reading the data — the two-level pattern that matters at 100 TB
    (per-partition/per-day sketches persist as bytes; any rollup is a
    cheap union over sketch blobs, never a re-scan).

    Graded via the boolean-gate recipe (VERDICT r6 #2): sketch
    estimates are engine-specific, so the driver-checked output is the
    EXACT per-group distinct plus a Spark-computed <=5% accuracy
    boolean (lgConfigK=12 keeps ~0.8% rsd — wide headroom).  The
    global row (-1) gates the UNIONED sketch, proving mergeability
    against the exact global count.  Raw estimates stay pinned in
    tests/test_operators.py."""
    c = load_table(spark, sf_dir, "customer")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_custkey").alias("exact_distinct"),
    )
    gate = (
        F.abs(
            F.hll_sketch_estimate("sk").cast("double")
            - F.col("exact_distinct")
        )
        / F.col("exact_distinct")
        <= F.lit(0.05)
    )
    nation_rows = per_nation.select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "n_rows",
        "exact_distinct",
        gate.alias("est_within_5pct"),
    )
    global_row = per_nation.agg(
        F.hll_union_agg("sk").alias("sk"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("exact_distinct").alias("exact_distinct"),
    ).select(
        F.lit(-1).cast("long").alias("c_nationkey"),
        "n_rows",
        # c_custkey is globally unique, so the exact global distinct is
        # the sum of per-nation distincts — no second data pass needed
        "exact_distinct",
        gate.alias("est_within_5pct"),
    )
    return nation_rows.unionByName(global_row)


@query(
    "agg_regression",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               count(*) AS n,
               sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS sx,
               sum(CAST(round(l_quantity * 100, 0) AS BIGINT)
                   * CAST(round(l_quantity * 100, 0) AS BIGINT)) AS sxx,
               sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
               sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                   * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS syy,
               sum(CAST(round(l_quantity * 100, 0) AS BIGINT)
                   * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sxy
        FROM lineitem GROUP BY l_returnflag
    ), d AS (
        SELECT l_returnflag, n, sx, sy,
               CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS cxy,
               CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS vx,
               CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS vy
        FROM m
    )
    SELECT l_returnflag,
           floor(cxy / vx * 10000 + 0.5) / 10000 AS slope,
           floor((CAST(sy AS DOUBLE) - cxy / vx * sx) / n / 100.0
                 * 10000 + 0.5) / 10000 AS intercept,
           floor(cxy * cxy / (vx * vy) * 10000 + 0.5) / 10000 AS r2,
           n
    FROM d
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (slope/intercept/R2/count of price vs
    quantity per return flag) from EXACT integer moment sums — same
    rationale and shuffle shape as agg_stats: one pass, map-side
    partials, and the closed-form identities on exact integers make
    both engines' doubles bit-identical before the snap.  The unit
    scale (cents/cents) cancels in slope and r2; intercept rescales by
    /100 once."""
    li = load_table(spark, sf_dir, "lineitem")
    xu = money_units(F.col("l_quantity"), 2)
    yu = money_units(F.col("l_extendedprice"), 2)

    def dec(c):
        return c.cast("decimal(38,0)")

    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xu).alias("sx"),
        F.sum(dec(xu * xu)).alias("sxx"),
        F.sum(yu).alias("sy"),
        F.sum(dec(yu * yu)).alias("syy"),
        F.sum(dec(xu * yu)).alias("sxy"),
    )
    n = F.col("n")
    cxy = (dec(n) * F.col("sxy") - dec(F.col("sx")) * dec(F.col("sy"))).cast(
        "double"
    )
    vx = (dec(n) * F.col("sxx") - dec(F.col("sx")) * dec(F.col("sx"))).cast(
        "double"
    )
    vy = (dec(n) * F.col("syy") - dec(F.col("sy")) * dec(F.col("sy"))).cast(
        "double"
    )
    slope = cxy / vx
    return m.select(
        "l_returnflag",
        snap(slope, 4).alias("slope"),
        snap(
            (F.col("sy").cast("double") - slope * F.col("sx")) / n / F.lit(100.0),
            4,
        ).alias("intercept"),
        snap(cxy * cxy / (vx * vy), 4).alias("r2"),
        n.alias("n"),
    )
