"""Header/trailer record skip — mainframe banner records.

Production fixed-width feeds commonly wrap the data in banner records:
HDR records carrying feed metadata and TRL records carrying checksums or
record counts, all at the same record length but NOT matching the data
layout.  The reference has no notion of them (it emits every record
unconditionally, FixedLengthRecordReader.java:215-262); consumers have
to post-filter garbage rows.  The engine makes the skip declarative:

    .option("skipHeaderRecords", "2").option("skipTrailerRecords", "1")

For seekable files the skip happens at PLANNING time (`_plan_file`
slices the byte range), so the banner bytes are never read — at 100 TB
this is free, unlike a post-scan filter which would decode (and fail
on) every banner record.  Gzip streams discard the header as it
decompresses and withhold the trailer through a rolling holdback
buffer.  ``record_offset`` keeps true file positions, so offset-range
pushdown math is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.sources import fixedlen, fixture_gen
from hadoop_fixedlengthinputformat_spark.tables import configure

_NATION_SQL = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


@query("scan_fixedlen_skiprecs", oracle=_NATION_SQL)
def scan_fixedlen_skiprecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banner-wrapped fixed-width file -> typed columns, banners never
    read.  The fixture carries 2 HDR + 1 TRL records whose bytes would
    fail the int decode — a correct skip is the only way this query
    returns clean rows, so the oracle equivalence proves the planning
    arithmetic, not just row counts."""
    configure(spark)
    fixedlen.register(spark)
    path = fixture_gen.fixed_file_with_banners(sf_dir, "nation", 2, 1)
    record_length, spec, _ = fixture_gen.LAYOUTS["nation"]
    return (
        spark.read.format("fixedlen")
        .option("recordLength", str(record_length))
        .option("layout", spec)
        .option("skipHeaderRecords", "2")
        .option("skipTrailerRecords", "1")
        .option("includeOffset", "false")
        .load(path)
    )


@query(
    "scan_fixedlen_occurs",
    oracle="""
    SELECT n_nationkey,
           n_nationkey + 1 AS v1,
           (n_nationkey + 1) + (2 * n_nationkey) + n_regionkey AS vsum,
           3 AS n_vals
    FROM nation
    """,
)
def scan_fixedlen_occurs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COBOL OCCURS decode: layout type ``int[3]`` turns 3 consecutive
    5-byte slots into one array<int> column (vectorized per-slot decode
    + one Arrow row-major interleave — no per-record Python).  The query
    reduces the array with JVM-side lambdas (element_at / aggregate /
    size), and the oracle recomputes every element from the source
    table, proving positions, not just counts."""
    from pyspark.sql import functions as F

    configure(spark)
    fixedlen.register(spark)
    path = fixture_gen.occurs_file_for(sf_dir)
    df = (
        spark.read.format("fixedlen")
        .option("recordLength", "20")
        .option("layout", "n_nationkey:0:5:int,vals:5:5:int[3]")
        .option("includeOffset", "false")
        .load(path)
    )
    return df.select(
        "n_nationkey",
        F.element_at("vals", 1).alias("v1"),
        F.aggregate("vals", F.lit(0), lambda a, x: a + x).alias("vsum"),
        F.size("vals").alias("n_vals"),
    )


@query(
    "scan_fixedlen_stats_pruned",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-06-01'
    """,
)
def scan_fixedlen_stats_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max sidecar end to end: lineitem sorted by shipdate goes
    through the fixedlen WRITER with ``statsSidecar=true``, then the
    reader plans a shipdate-range scan — partitions whose stats blocks
    exclude the range are dropped before any byte is read (the
    parquet-row-group analog for a format with no footer).  The oracle
    runs the same predicate on the source table, proving pruning is
    correctness-neutral.  On sorted 100 TB data the skip is
    proportional to the date selectivity."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from hadoop_fixedlengthinputformat_spark.tables import load_table

    configure(spark)
    fixedlen.register(spark)
    rl, spec, _ = fixture_gen.LAYOUTS["lineitem"]
    sub = "l_orderkey:0:12:long,l_linenumber:30:2:int,l_quantity:32:12:double(2),l_shipdate:82:10:date"
    out = os.path.join(
        tempfile.gettempdir(),
        f"flif_stats_pruned_{os.path.basename(os.path.abspath(sf_dir))}",
    )
    marker = os.path.join(out, "_done")
    if not os.path.exists(marker):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus",
            F.col("l_shipdate").cast("date").alias("l_shipdate"),
        )
        (
            li.repartition(4)
            .sortWithinPartitions("l_shipdate")
            .write.format("fixedlen")
            .option("recordLength", str(rl))
            .option("layout", spec)
            .option("statsSidecar", "true")
            .option("statsBlockRecords", "2048")
            .mode("overwrite")
            .save(out)
        )
        open(marker, "w").close()
    return (
        spark.read.format("fixedlen")
        .option("recordLength", str(rl))
        .option("layout", sub)
        .option("includeOffset", "false")
        .load(out)
        .filter(F.col("l_shipdate") >= F.lit("2000-06-01").cast("date"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.col("l_shipdate").cast("timestamp_ntz").alias("l_shipdate"),
        )
    )


@query(
    "scan_fixedlen_corrupt_quarantine",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation WHERE n_nationkey NOT IN (3, 7)
    """,
)
def scan_fixedlen_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permissive decode + ``corruptRecordColumn``: two records are
    byte-poisoned on disk; the scan nulls their fields, captures their
    RAW bytes in the quarantine column, and the query keeps the clean
    rows — the standard quarantine pattern (clean rows flow on, corrupt
    originals are preserved for replay) without a second pass over the
    file.  The oracle excludes exactly the poisoned keys, proving
    per-row capture, not just a count."""
    import os as _os

    from pyspark.sql import functions as F

    configure(spark)
    fixedlen.register(spark)
    src = fixture_gen.fixed_file_for(sf_dir, "nation")
    record_length, spec, _ = fixture_gen.LAYOUTS["nation"]
    path = src.replace(".fixed", "-poisoned.fixed")
    if not _os.path.exists(path):
        data = bytearray(open(src, "rb").read())
        for ordinal in (3, 7):  # keys 3 and 7 (file is key-sorted)
            data[ordinal * record_length : ordinal * record_length + 5] = b"XXXXX"
        tmp = path + f".tmp{_os.getpid()}"
        open(tmp, "wb").write(bytes(data))
        _os.replace(tmp, path)
    return (
        spark.read.format("fixedlen")
        .option("recordLength", str(record_length))
        .option("layout", spec)
        .option("mode", "permissive")
        .option("corruptRecordColumn", "_corrupt")
        .option("includeOffset", "false")
        .load(path)
        .filter(F.col("_corrupt").isNull())
        .select("n_nationkey", "n_name", "n_regionkey")
    )
