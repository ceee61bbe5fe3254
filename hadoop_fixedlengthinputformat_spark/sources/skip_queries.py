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
