"""RECFM=FBA — ASA carriage-control print files (round-5 widening).

z/OS print datasets (RECFM=FBA/VBA) prefix every fixed-length record
with an ANSI/ASA carriage-control character that positions the paper
BEFORE the line prints: '1' top-of-form, ' ' single space, '0' double
space, '-' triple space, '+' overprint (no advance).  The reference's
fixed-length model (FixedLengthInputFormat.java:38-43) reads such files
as opaque record bytes with no channel interpretation — these two
operators add the interpretation: the scan decodes the control byte
into page/line coordinates, the sink renders a table INTO a compliant
FBA file and round-trips it.

The page/line reconstruction is two running sums over the record order
(record_offset — the reference's default key).  On a real report file
that order is the print order, so the windows are global; report files
are bounded (one spool dataset per job step), and for unbounded input
the same prefix-sum runs as per-split partials + a broadcast cumulative
offset (the llm_seq_packing formulation).  DuckDB types window SUM()
OVER as HUGEINT — every exposed sum is CAST AS BIGINT on the oracle
side (round-5 rule, tests/test_oracle_types.py).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.sources import fixedlen, fixture_gen
from hadoop_fixedlengthinputformat_spark.tables import configure, load_table

# decoded control byte ('' = the rtrimmed blank) -> lines advanced
# before printing
_ADVANCE = {"": 1, "1": 1, "0": 2, "-": 3, "+": 0}

# SQL CASE fragments shared by the Spark and DuckDB formulations so the
# two sides can never drift: cc from the 0-based record rank, advance
# from the decoded cc.
CC_FROM_RANK_SQL = (
    "CASE CAST(rn % 10 AS INTEGER) WHEN 0 THEN '1' WHEN 3 THEN '+' "
    "WHEN 5 THEN '0' WHEN 8 THEN '-' ELSE '' END"
)
ADVANCE_SQL = (
    "CASE cc WHEN '1' THEN 1 WHEN '+' THEN 0 WHEN '0' THEN 2 "
    "WHEN '-' THEN 3 ELSE 1 END"
)

_ASA_ORACLE = f"""
    WITH ranked AS (
        SELECT n_nationkey,
               ROW_NUMBER() OVER (ORDER BY n_nationkey) - 1 AS rn
        FROM nation
    ),
    ctl AS (
        SELECT n_nationkey, rn * {fixture_gen.ASA_RL} AS record_offset,
               {CC_FROM_RANK_SQL} AS cc
        FROM ranked
    ),
    adv AS (
        SELECT *, {ADVANCE_SQL} AS cc_advance,
               CAST(SUM(CASE WHEN cc = '1' THEN 1 ELSE 0 END)
                    OVER (ORDER BY record_offset) AS BIGINT) AS page_no
        FROM ctl
    )
    SELECT record_offset, n_nationkey, cc, cc_advance, page_no,
           CAST(SUM(cc_advance)
                OVER (PARTITION BY page_no ORDER BY record_offset)
                AS BIGINT) AS line_no
    FROM adv
"""


@query("scan_fixedlen_asa", oracle=_ASA_ORACLE)
def scan_fixedlen_asa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECFM=FBA scan: control byte -> (cc_advance, page_no, line_no).

    The control byte is just the first layout field (the reference's
    slice-key machinery reads it the same way, R6); the print-geometry
    reconstruction is relational: page_no = running count of
    top-of-form records, line_no = running sum of advances within the
    page.  Fixture rows are written in n_nationkey order so both
    windows are SQL-predictable from record_offset."""
    configure(spark)
    fixedlen.register(spark)
    path = fixture_gen.asa_file_for(sf_dir)
    df = (
        spark.read.format("fixedlen")
        .option("recordLength", str(fixture_gen.ASA_RL))
        .option("layout", fixture_gen.ASA_LAYOUT)
        .load(path)
    )
    # windowed input = ONE report file's records (print-report fixture;
    # unbounded report streams use the seq_packing two-phase prefix sum)
    w_page = Window.orderBy("record_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    adv = df.select(
        "record_offset",
        "n_nationkey",
        "cc",
        F.expr(ADVANCE_SQL).alias("cc_advance"),
        F.sum(F.when(F.col("cc") == "1", 1).otherwise(0))
        .over(w_page)
        .alias("page_no"),
    )
    w_line = (
        Window.partitionBy("page_no")
        .orderBy("record_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return adv.withColumn("line_no", F.sum("cc_advance").over(w_line))


@query(
    "sink_fixedlen_asa",
    oracle=f"""
    WITH ranked AS (
        SELECT n_nationkey, COALESCE(n_name, '') AS n_name,
               COALESCE(n_regionkey, 0) AS n_regionkey,
               ROW_NUMBER() OVER (ORDER BY n_nationkey) - 1 AS rn
        FROM nation
    )
    SELECT {CC_FROM_RANK_SQL} AS cc, n_nationkey, n_name, n_regionkey
    FROM ranked
    """,
)
def sink_fixedlen_asa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECFM=FBA report writer: render nation as an ASA print file
    (page break every 10 rows plus the fixture's spacing accents) via
    the fixedlen sink, then round-trip through the FBA scan.  The cc
    column is data like any other layout field — the writer space-pads
    it to width 1, exactly how JES2 spool datasets store it.  Fixed
    width has no NULL: blank/zero stand-ins with COALESCE mirrored in
    the oracle (round-4 rule)."""
    configure(spark)
    fixedlen.register(spark)
    n = load_table(spark, sf_dir, "nation")
    # windowed input = |nation| = 25 rows — single-partition is bounded
    rn = F.row_number().over(Window.orderBy("n_nationkey")) - 1
    report = (
        n.select(
            "n_nationkey",
            F.coalesce("n_name", F.lit("")).alias("n_name"),
            F.coalesce("n_regionkey", F.lit(0)).alias("n_regionkey"),
        )
        .withColumn("rn", rn)
        .select(
            F.expr(CC_FROM_RANK_SQL).alias("cc"),
            "n_nationkey",
            "n_name",
            "n_regionkey",
            "rn",
        )
    )
    out = os.path.join(tempfile.gettempdir(), "flif_sink_fixedlen_asa")
    (
        report.coalesce(1)
        .sortWithinPartitions("rn")
        .drop("rn")
        .write.format("fixedlen")
        .option("recordLength", str(fixture_gen.ASA_RL))
        .option("layout", fixture_gen.ASA_LAYOUT)
        .mode("overwrite")
        .save(out)
    )
    return (
        spark.read.format("fixedlen")
        .option("recordLength", str(fixture_gen.ASA_RL))
        .option("layout", fixture_gen.ASA_LAYOUT)
        .option("includeOffset", "false")
        .load(out)
    )


@query(
    "scan_varlen_vba",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id,
               CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT)
                   AS tail_bytes,
               ROW_NUMBER() OVER (ORDER BY doc_id, md5(COALESCE(text, '')),
                                  COALESCE(lang, ''), COALESCE(source, ''))
                   - 1 AS rn
        FROM documents
    ),
    ctl AS (
        SELECT doc_id, tail_bytes, rn, {CC_FROM_RANK_SQL} AS cc
        FROM ranked
    ),
    adv AS (
        SELECT *, {ADVANCE_SQL} AS cc_advance,
               CAST(SUM(CASE WHEN cc = '1' THEN 1 ELSE 0 END)
                    OVER (ORDER BY rn) AS BIGINT) AS page_no
        FROM ctl
    )
    SELECT doc_id, tail_bytes, cc, cc_advance, page_no,
           CAST(SUM(cc_advance) OVER (PARTITION BY page_no ORDER BY rn)
                AS BIGINT) AS line_no
    FROM adv
    """,
)
def scan_varlen_vba(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECFM=VBA scan — variable-length print records (SYSOUT spools,
    job logs): each RDW record's prefix leads with the ASA control
    byte, the tail is the variable print line.  Completes the print
    family next to the fixed-length FBA pair; the geometry windows are
    the same two running sums, ordered by record_offset on the Spark
    side and by the fixture's documented total order in the oracle
    (record_offset is strictly increasing in that order)."""
    from hadoop_fixedlengthinputformat_spark.sources import varlen

    configure(spark)
    varlen.register(spark)
    path = fixture_gen.vba_file_for(sf_dir)
    df = (
        spark.read.format("varlen")
        .option("prefixLength", str(fixture_gen.VBA_PREFIX_LEN))
        .option("layout", fixture_gen.VBA_PREFIX_LAYOUT)
        .load(path)
    )
    # windowed input = ONE report file's records (print-report fixture;
    # unbounded report streams use the seq_packing two-phase prefix sum)
    w_page = Window.orderBy("record_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    adv = df.select(
        "doc_id",
        F.length("record_tail").cast("long").alias("tail_bytes"),
        "record_offset",
        "cc",
        F.expr(ADVANCE_SQL).alias("cc_advance"),
        F.sum(F.when(F.col("cc") == "1", 1).otherwise(0))
        .over(w_page)
        .alias("page_no"),
    )
    w_line = (
        Window.partitionBy("page_no")
        .orderBy("record_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return adv.withColumn("line_no", F.sum("cc_advance").over(w_line)).drop(
        "record_offset"
    )
