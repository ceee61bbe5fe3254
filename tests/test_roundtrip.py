"""FIXTURES.md §C round-trip: parquet table -> fixed-width file -> fixedlen
read == original table (after decode), at randomized partition sizes."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from hadoop_fixedlengthinputformat_spark.sources import fixedlen, fixture_gen
from hadoop_fixedlengthinputformat_spark.tables import load_table


def _read_fixture(spark, sf_dir, table, max_pb):
    fixedlen.register(spark)
    path = fixture_gen.fixed_file_for(sf_dir, table)
    rec_len, spec, _ = fixture_gen.LAYOUTS[table]
    return (
        spark.read.format("fixedlen")
        .option("recordLength", str(rec_len))
        .option("layout", spec)
        .option("includeOffset", "false")
        .option("maxPartitionBytes", str(max_pb))
        .load(path)
    )


def _assert_same(a_df, b_df, sort_cols):
    a = [tuple(r) for r in a_df.orderBy(*sort_cols).collect()]
    b = [tuple(r) for r in b_df.orderBy(*sort_cols).collect()]
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra == rb, f"{ra} != {rb}"


def test_nation_roundtrip(spark, sf_dir):
    rng = random.Random(7)
    for _ in range(3):
        max_pb = rng.choice([40, 160, 999, 1 << 20])
        got = _read_fixture(spark, sf_dir, "nation", max_pb)
        want = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        _assert_same(got, want, ["n_nationkey"])


def test_customer_roundtrip(spark, sf_dir):
    got = _read_fixture(spark, sf_dir, "customer", 70 * 17)
    want = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    _assert_same(got, want, ["c_custkey"])


def test_lineitem_roundtrip(spark, sf_dir):
    got = _read_fixture(spark, sf_dir, "lineitem", 64 * 1024).withColumn(
        "l_shipdate", F.col("l_shipdate").cast("string")
    )
    want = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            F.col("l_shipdate").cast("date").cast("string").alias("l_shipdate"),
        )
    )
    _assert_same(got, want, ["l_orderkey", "l_linenumber"])


def test_fixedlen_write_read_roundtrip(spark, sf_dir, tmp_path):
    """Sink: DataFrame -> fixedlen write -> fixedlen read."""
    fixedlen.register(spark)
    rec_len, spec, _ = fixture_gen.LAYOUTS["customer"]
    src = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    out = str(tmp_path / "cust_fixed")
    (
        src.repartition(4)
        .write.format("fixedlen")
        .option("recordLength", str(rec_len))
        .option("layout", spec)
        .mode("overwrite")
        .save(out)
    )
    back = (
        spark.read.format("fixedlen")
        .option("recordLength", str(rec_len))
        .option("layout", spec)
        .option("includeOffset", "false")
        .load(out)
    )
    _assert_same(back, src, ["c_custkey"])
