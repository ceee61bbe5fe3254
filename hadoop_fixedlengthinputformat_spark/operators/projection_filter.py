"""B family — projection / filter / predicates (SURVEY.md §2.3-B).

The reference emits every record unconditionally (FixedLengthRecordReader.java:215-262
has no predicate code); these are the engine-side relational extensions.
All expressed with built-in Column expressions so Catalyst pushes filters
into the parquet scan (verify: ``.explain`` shows PushedFilters) and the
whole stage stays in codegen — no Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query(
    "proj_select",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem",
)
def proj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning: scan reads only 4 of 11 lineitem columns."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@query(
    "proj_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) / 10000 AS revenue,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000 + 0.5) / 10000 AS charge
    FROM lineitem
    """,
)
def proj_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row round-half-up via floor(x*1e4 + 0.5)/1e4 — the SAME IEEE ops
    on both engines, so results are bit-identical.  Spark's round() (BigDecimal
    HALF_UP on the exact binary double) and DuckDB's round() disagree on
    boundary values (~350 of 120k rows at sf0.01) — never round(double, n)
    per-row in an oracle'd query."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(rev * 10000 + 0.5) / 10000).alias("revenue"),
        (F.floor(rev * (1 + F.col("l_tax")) * 10000 + 0.5) / 10000).alias("charge"),
    )


@query(
    "filter_compare",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity < 24
    """,
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") < 24).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "filter_between_and",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND l_discount > 0.02
    """,
)
def filter_between_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-12-31").cast("timestamp_ntz")
    return li.filter(
        F.col("l_shipdate").between(lo, hi) & (F.col("l_discount") > 0.02)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


@query(
    "filter_in_or_not",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R') OR NOT (l_linestatus = 'O')
    """,
)
def filter_in_or_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cond = F.col("l_returnflag").isin("A", "R") | ~(F.col("l_linestatus") == "O")
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"
    )


@query(
    "filter_null",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_nn
    FROM orders WHERE nullif(o_orderstatus, 'O') IS NOT NULL
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isNull/isNotNull over a derived nullable column (the driver tables
    contain no physical nulls)."""
    o = load_table(spark, sf_dir, "orders")
    nn = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select("o_orderkey", nn.alias("status_nn")).filter(
        F.col("status_nn").isNotNull()
    )


@query(
    "filter_like",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE text LIKE '%spark%' AND regexp_matches(text, 'join|merge')
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        F.col("text").like("%spark%") & F.col("text").rlike("join|merge")
    ).select("doc_id", "lang")
