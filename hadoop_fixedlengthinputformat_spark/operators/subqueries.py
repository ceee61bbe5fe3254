"""C+ family — subqueries (scalar, IN, EXISTS, correlated).

The reference has no query language at all (SURVEY.md §2.2); subqueries
are part of the relational surface a consumer needs to *query* what the
fixed-length source ingests.  All four shapes are declared through
``spark.sql`` over temp views so Catalyst's subquery machinery runs
(decorrelation → join rewrite), rather than hand-rewriting them to joins
ourselves — the point of Spark-first design is that the optimizer picks
the join form.

Plan shapes at 100 TB (verified via .explain, see plans/NOTES.md):
  * uncorrelated scalar  → one tiny agg + BroadcastExchange into the filter
    (the scalar is computed once, broadcast, never a per-row re-execution).
  * IN / EXISTS / NOT EXISTS → LeftSemi / LeftAnti hash joins; Catalyst
    decorrelates the correlated predicate into the join condition, so the
    big table streams map-side against the (broadcast or shuffled) inner.
  * correlated scalar in SELECT → decorrelated to an aggregate + left
    outer join on the correlation key — O(rows) shuffle, no nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"subq_{t}")


@query(
    "subq_scalar_where",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS total
    FROM orders
    WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT)
          * (SELECT count(*) FROM orders)
          > 2 * (SELECT sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 FROM orders)
    """,
)
def subq_scalar_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in WHERE: orders above 2x the mean.
    The threshold cross-multiplies in exact integer cents (price·n >
    2·total) — `price > 2·avg` as floats can tie exactly when the true
    mean lands on a half-cent, where summation-order error decides."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS total
        FROM subq_orders
        WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT)
              * (SELECT count(*) FROM subq_orders)
              > 2 * (SELECT sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     FROM subq_orders)
        """
    )


@query(
    "subq_in_where",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    )
    """,
)
def subq_in_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → LeftSemi join under Catalyst."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM subq_customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM subq_orders WHERE o_totalprice > 400000
        )
        """
    )


@query(
    "subq_exists_correlated",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
        SELECT 1 FROM customer
        WHERE c_nationkey = s_nationkey AND c_acctbal > 9900
    )
    """,
)
def subq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: suppliers sharing a nation with a rich customer."""
    _views(spark, sf_dir, "supplier", "customer")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM subq_supplier
        WHERE EXISTS (
            SELECT 1 FROM subq_customer
            WHERE c_nationkey = s_nationkey AND c_acctbal > 9900
        )
        """
    )


@query(
    "subq_not_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
    )
    """,
)
def subq_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS → LeftAnti join (null-safe, unlike NOT IN)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM subq_customer
        WHERE NOT EXISTS (
            SELECT 1 FROM subq_orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        )
        """
    )


@query(
    "subq_scalar_select",
    oracle="""
    SELECT n_nationkey, n_name,
           (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey)
               AS n_customers
    FROM nation
    """,
)
def subq_scalar_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in the SELECT list — Catalyst
    decorrelates it to groupBy(c_nationkey).count + left outer join,
    never a per-row re-execution."""
    _views(spark, sf_dir, "nation", "customer")
    return spark.sql(
        """
        SELECT n_nationkey, n_name,
               (SELECT count(*) FROM subq_customer
                WHERE c_nationkey = n_nationkey) AS n_customers
        FROM subq_nation
        """
    )


@query(
    "join_lateral",
    oracle="""
    SELECT c_custkey, round(t.top_price, 4) AS top_price, t.n_orders
    FROM customer c, LATERAL (
        SELECT max(o_totalprice) AS top_price, count(*) AS n_orders
        FROM orders WHERE o_custkey = c_custkey
    ) t
    WHERE t.n_orders > 0
    """,
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (per-customer aggregate as a lateral
    table) — Catalyst decorrelates to an aggregate + join, same plan
    family as subq_scalar_select but with a multi-column lateral body."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, round(t.top_price, 4) AS top_price, t.n_orders
        FROM subq_customer c, LATERAL (
            SELECT max(o_totalprice) AS top_price, count(*) AS n_orders
            FROM subq_orders WHERE o_custkey = c_custkey
        ) t
        WHERE t.n_orders > 0
        """
    )
