"""A-family extras — GDG (generation data group) scans and rolls.

Mainframe fixed-length feeds arrive as cataloged GENERATIONS
(``BASE.GnnnnVvv``), referenced relatively — ``BASE(0)`` current,
``BASE(-1)`` previous, ``BASE(+1)`` the next one a writer creates.  The
reference reads whatever file it is handed; resolving WHICH file the
reference user meant is this layer (sources/gdg.py), composed with the
fixedlen source for the bytes.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.sources import fixedlen, fixture_gen, gdg
from hadoop_fixedlengthinputformat_spark.tables import configure, load_table

_CUST_PROJ = """
    SELECT {rel} AS rel, c_custkey, COALESCE(c_name, '') AS c_name,
           COALESCE(c_nationkey, 0) AS c_nationkey,
           round(COALESCE(c_acctbal, 0), 4) AS acctbal
    FROM customer WHERE c_custkey % 3 = {mod}
"""


def _read_member(spark: SparkSession, path: str, table: str) -> DataFrame:
    configure(spark)
    fixedlen.register(spark)
    record_length, spec, _ = fixture_gen.LAYOUTS[table]
    return (
        spark.read.format("fixedlen")
        .option("recordLength", str(record_length))
        .option("layout", spec)
        .option("includeOffset", "false")
        .load(path)
    )


@query(
    "scan_fixedlen_gdg",
    oracle=(
        _CUST_PROJ.format(rel=0, mod=2)
        + " UNION ALL "
        + _CUST_PROJ.format(rel=-1, mod=1)
    ),
)
def scan_fixedlen_gdg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-generation scan: CUST(0) resolves to G0003, CUST(-1) to
    G0002 — and within generation 2 to VERSION 01, past a deliberately
    stale V00 member whose content differs (a wrong version pick changes
    the row set and fails the hash).  Generation membership is custkey
    arithmetic the oracle recomputes."""
    d = fixture_gen.gdg_dir_for(sf_dir)

    def member(rel: int) -> DataFrame:
        df = _read_member(spark, gdg.resolve(d, "CUST", rel), "customer")
        return df.select(
            F.lit(rel).alias("rel"),
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.round("c_acctbal", 4).alias("acctbal"),
        )

    return member(0).unionAll(member(-1))


@query(
    "scan_fixedlen_gdg_all",
    oracle="""
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT c_custkey) AS n_keys,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_custkey % 3 IN (0, 1, 2)
    """,
)
def scan_fixedlen_gdg_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-group concatenation (the JCL GDG-base reference): every
    generation's RESOLVED member — G0002's stale V00 must be excluded,
    or duplicate custkeys inflate n_rows past n_keys.  Members load as
    independent fixedlen scans unioned; each file still plans its own
    record-aligned splits."""
    d = fixture_gen.gdg_dir_for(sf_dir)
    dfs = [
        _read_member(spark, p, "customer").select("c_custkey")
        for p in gdg.all_paths(d, "CUST")
    ]
    allg = dfs[0]
    for df in dfs[1:]:
        allg = allg.unionAll(df)
    return allg.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_custkey").alias("n_keys"),
        F.sum("c_custkey").alias("key_sum"),
    )


@query(
    "maintain_gdg_roll",
    oracle="""
    SELECT 0 AS rel, n_nationkey, COALESCE(n_name, '') AS n_name,
           COALESCE(n_regionkey, 0) AS n_regionkey
    FROM nation WHERE n_nationkey % 2 = 0
    UNION ALL
    SELECT -1 AS rel, n_nationkey, COALESCE(n_name, '') AS n_name,
           COALESCE(n_regionkey, 0) AS n_regionkey
    FROM nation
    """,
)
def maintain_gdg_roll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (+1) write convention: catalog a fresh GDG with nation as
    G0001, roll a new generation via next_generation_name (our fixedlen
    sink writes it as a directory member — generations can be files or
    part-file directories), then prove resolution flipped: (0) is the
    new member, (-1) the old.  A fresh temp catalog per run keeps the
    roll idempotent."""
    configure(spark)
    fixedlen.register(spark)
    record_length, spec, _ = fixture_gen.LAYOUTS["nation"]
    d = os.path.join(
        tempfile.gettempdir(), f"flif_gdg_roll_{uuid.uuid4().hex[:8]}"
    )
    os.makedirs(d)
    # generation 1: the full nation file (copied bytes, file member)
    src = fixture_gen.fixed_file_for(sf_dir, "nation")
    g1 = os.path.join(d, gdg.next_generation_name(d, "NAT") + ".fixed")
    with open(src, "rb") as fin, open(g1, "wb") as fout:
        fout.write(fin.read())
    # generation 2 via (+1): even keys only, written through OUR sink
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_nationkey") % 2 == 0
    ).select(
        "n_nationkey",
        F.coalesce("n_name", F.lit("")).alias("n_name"),
        F.coalesce("n_regionkey", F.lit(0)).alias("n_regionkey"),
    )
    g2 = os.path.join(d, gdg.next_generation_name(d, "NAT"))
    (
        nat.write.format("fixedlen")
        .option("recordLength", str(record_length))
        .option("layout", spec)
        .mode("overwrite")  # Python sinks support only append/overwrite
        .save(g2)
    )

    def member(rel: int) -> DataFrame:
        df = _read_member(spark, gdg.resolve(d, "NAT", rel), "nation")
        return df.select(
            F.lit(rel).alias("rel"), "n_nationkey", "n_name", "n_regionkey"
        )

    return member(0).unionAll(member(-1))


@query(
    "maintain_gdg_expire",
    oracle="""
    SELECT n_nationkey, COALESCE(n_name, '') AS n_name,
           3 + (n_nationkey % 3 + 2) % 3 AS generation
    FROM nation
    """,
)
def maintain_gdg_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GDG LIMIT attribute (catalog roll-off): a five-generation
    catalog — generation k holds nation keys with key % 3 == (k-2) % 3,
    so membership is SQL-derivable — expires down to LIMIT 3.
    Generations 1-2 roll off (every version deleted); the survivors
    3/4/5 hold keys with remainder 1/2/0 respectively, covering every
    key exactly once, so each row's surviving generation is
    3 + (key % 3 + 2) % 3 and the oracle replays it.  Post-expiry
    resolution is re-proven by reading (−2)/(−1)/(0) = G0003/4/5."""
    configure(spark)
    fixedlen.register(spark)
    record_length, spec, _ = fixture_gen.LAYOUTS["nation"]
    import pyarrow.parquet as _pq

    from hadoop_fixedlengthinputformat_spark.sources.layout import (
        encode_rows,
        parse_layout,
    )

    d = os.path.join(
        tempfile.gettempdir(), f"flif_gdg_expire_{uuid.uuid4().hex[:8]}"
    )
    os.makedirs(d)
    rows = (
        _pq.read_table(os.path.join(sf_dir, "nation.parquet"))
        .sort_by("n_nationkey")
        .to_pylist()
    )
    for r in rows:
        r["n_name"] = r["n_name"] or ""
        r["n_regionkey"] = r["n_regionkey"] if r["n_regionkey"] is not None else 0
    fields = parse_layout(spec, record_length)
    # generations 1..5; generation k holds keys with key % 3 == (k-2) % 3
    # (so the SURVIVORS 3,4,5 cover every key exactly once and the
    # oracle recomputes each row's generation as 2 + key % 3;
    # expired gens 1-2 hold overlapping content that MUST disappear)
    for k in range(1, 6):
        sub = [r for r in rows if r["n_nationkey"] % 3 == (k - 2) % 3]
        name = gdg.next_generation_name(d, "NAT") + ".fixed"
        with open(os.path.join(d, name), "wb") as f:
            f.write(encode_rows(sub, fields, record_length))
    removed = gdg.expire(d, "NAT", limit=3)
    assert len(removed) == 2 and gdg.generations(d, "NAT") == [3, 4, 5]

    def member(rel: int, gen: int) -> DataFrame:
        df = _read_member(spark, gdg.resolve(d, "NAT", rel), "nation")
        return df.select(
            "n_nationkey", "n_name", F.lit(gen).alias("generation")
        )

    return (
        member(-2, 3).unionAll(member(-1, 4)).unionAll(member(0, 5))
    )
