"""I family — UDF / UDAF / UDTF surface (SURVEY.md §2.3-I).

The reference's extension point is "write your own Mapper" (outside the
repo); the engine's is the Arrow-vectorized Python surface.  Policy: UDFs
are the slow path — each query here reimplements something expressible in
SQL precisely so the oracle can check it; real pipelines should prefer
the built-in expression first (see scalar_queries.py).

``udtf_fixed_decode`` is the reference's soul as a UDTF: a fixed-width
record string -> typed fields splitter (FixedLengthRecordReader.java's
key-slice projection generalized to a full field layout).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf, udtf

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query(
    "udf_scalar_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) / 10000 AS revenue
    FROM lineitem
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF (vs proj_compute's codegen version —
    bench.py compares the two).  Round-half-up via floor(x*1e4+0.5)/1e4 so
    the per-row rounding is the same IEEE ops as the DuckDB oracle (see
    proj_compute docstring)."""

    @pandas_udf("double")
    def revenue(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = load_table(spark, sf_dir, "lineitem")
    rev = revenue("l_extendedprice", "l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(rev * 10000 + 0.5) / 10000).alias("revenue"),
    )


@query(
    "udf_arrow_scalar",
    oracle="""
    SELECT p_partkey,
           lower(trim(regexp_replace(p_name, ' +', ' ', 'g'))) AS name_canon,
           length(p_name) - length(replace(p_name, ' ', '')) + 1 AS n_words
    FROM part
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Arrow-optimized Python UDF (``useArrow=True``): row-at-a-
    time Python semantics but Arrow-batch transfer — the migration path
    between legacy pickle UDFs and pandas UDFs.  String canonicalization
    (collapse spaces, trim, lower) + word count, oracle-checked against
    the pure-SQL formulation."""
    import re

    @F.udf("string", useArrow=True)
    def canon(name: str) -> str:
        return re.sub(" +", " ", name).strip().lower()

    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        canon("p_name").alias("name_canon"),
        (
            F.length("p_name")
            - F.length(F.translate("p_name", " ", ""))
            + 1
        ).alias("n_words"),
    )


@query(
    "udaf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS weighted_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: quantity-weighted mean price."""

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("weighted_price")
    )


@query(
    "udtf_fixed_decode",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def udtf_fixed_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: encode nation rows to 40-byte fixed-width records with
    built-in expressions (FIXTURES.md §C1 layout), then decode them back
    through a Python UDTF — the fixed-width decoder as a table function."""

    @udtf(returnType="n_nationkey int, n_name string, n_regionkey int")
    class DecodeNation:
        def eval(self, rec: str):
            if rec is None or len(rec) != 40:
                return
            yield int(rec[0:5]), rec[5:35].rstrip(), int(rec[35:40])

    spark.udtf.register("flif_decode_nation", DecodeNation)
    n = load_table(spark, sf_dir, "nation")
    rec = F.concat(
        F.lpad(F.col("n_nationkey").cast("string"), 5, "0"),
        F.rpad(F.col("n_name"), 30, " "),
        F.lpad(F.col("n_regionkey").cast("string"), 5, "0"),
    )
    n.select(rec.alias("rec")).createOrReplaceTempView("flif_nation_recs")
    return spark.sql(
        "SELECT d.* FROM flif_nation_recs, LATERAL flif_decode_nation(rec) d"
    )


@query(
    "udf_grouped_map",
    oracle="""
    SELECT c_custkey,
           floor((c_acctbal - avg(c_acctbal) OVER seg)
                 / stddev_samp(c_acctbal) OVER seg * 10000 + 0.5) / 10000
               AS bal_z
    FROM customer
    WINDOW seg AS (PARTITION BY c_mktsegment)
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas per-group z-score normalization (the grouped-map
    pattern for per-entity feature scaling in a training pipeline).

    The z column is snapped with the floor trick, NOT pandas .round()
    (numpy rounds half-to-even; DuckDB rounds half-away — boundary
    values split)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        bal = pdf["c_acctbal"]
        z = (bal - bal.mean()) / bal.std(ddof=1)
        snapped = np.floor(z * 10000 + 0.5) / 10000
        return pd.DataFrame({"c_custkey": pdf["c_custkey"], "bal_z": snapped})

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, schema="c_custkey bigint, bal_z double"
    )
