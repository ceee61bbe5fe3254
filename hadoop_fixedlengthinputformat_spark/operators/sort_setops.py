"""F family — sort / limit / set operations (SURVEY.md §2.3-F).

Scale notes: global orderBy is a range-partitioned sort (sampled
boundaries, no single-reducer bottleneck); orderBy().limit(k) compiles to
TakeOrderedAndProject — per-partition top-k heaps + driver merge of k
rows per partition, never a full sort.  Set ops are hash
shuffles/aggregations on the full row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query(
    "sort_multi_key",
    oracle="""
    SELECT n_regionkey, n_name, n_nationkey
    FROM nation ORDER BY n_regionkey DESC, n_name ASC
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.select("n_regionkey", "n_name", "n_nationkey").orderBy(
        F.col("n_regionkey").desc(), F.col("n_name").asc()
    )


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def _nation_slice(spark: SparkSession, sf_dir: str, keys: list[int]) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.filter(F.col("n_regionkey").isin(keys)).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "set_union_all",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey IN (0, 1)
    UNION ALL
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey IN (1, 2)
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _nation_slice(spark, sf_dir, [0, 1])
    b = _nation_slice(spark, sf_dir, [1, 2])
    return a.unionByName(b)


@query(
    "set_union_distinct",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey IN (0, 1)
    UNION
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey IN (1, 2)
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _nation_slice(spark, sf_dir, [0, 1])
    b = _nation_slice(spark, sf_dir, [1, 2])
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey IN (0, 1)
    INTERSECT
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey IN (1, 2)
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _nation_slice(spark, sf_dir, [0, 1])
    b = _nation_slice(spark, sf_dir, [1, 2])
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey IN (0, 1)
    EXCEPT ALL
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey IN (1, 2)
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _nation_slice(spark, sf_dir, [0, 1])
    b = _nation_slice(spark, sf_dir, [1, 2])
    return a.exceptAll(b)


@query(
    "set_except_all",
    oracle="""
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity >= 10
    EXCEPT ALL
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity >= 30
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics difference (exceptAll keeps multiplicities:
    count(a) - count(b) copies survive, vs except's set semantics)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 10).select("l_returnflag", "l_linestatus")
    b = li.filter(F.col("l_quantity") >= 30).select("l_returnflag", "l_linestatus")
    return a.exceptAll(b)


@query(
    "set_intersect_all",
    oracle="""
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity >= 10
    INTERSECT ALL
    SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity >= 30
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersection (min(count(a), count(b)) copies)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 10).select("l_returnflag", "l_linestatus")
    b = li.filter(F.col("l_quantity") >= 30).select("l_returnflag", "l_linestatus")
    return a.intersectAll(b)


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(COALESCE(o_totalprice, 0), 4)
               AS total
    FROM orders
    ORDER BY o_orderkey, o_orderstatus NULLS FIRST,
             round(COALESCE(o_totalprice, 0), 4)
    LIMIT 50 OFFSET 100
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination (ANSI OFFSET … FETCH): page 3 of the
    order book under a TOTAL order (every projected column in the sort,
    NULLS FIRST pinned — an underspecified sort makes every page
    nondeterministic, and rows identical across a page boundary are
    harmless because either order yields the same multiset).  Spark plans the whole page as one
    TakeOrdered-style global limit of offset+limit rows, so the skip
    never materializes upstream partitions beyond the per-partition
    heads — the reason OFFSET pagination stays usable at scale for
    early pages (deep pagination should keyset on the sort key
    instead)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.coalesce("o_totalprice", F.lit(0.0)), 4).alias("total"),
        )
        .orderBy(
            F.col("o_orderkey").asc(),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("total").asc(),
        )
        .offset(100)
        .limit(50)
    )
