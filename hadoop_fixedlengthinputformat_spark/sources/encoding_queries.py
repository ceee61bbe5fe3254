"""EBCDIC charset queries — the mainframe side of fixed-width data.

Fixed-length, delimiter-free records are the native file format of
mainframe datasets, and those ship in EBCDIC code pages, not ASCII.
The reference treats records as opaque ``byte[]`` and leaves charset
interpretation to the consumer (FixedLengthInputFormat.java:38-43); the
engine makes it declarative: ``option("encoding", "cp037")`` transcodes
field decode via a single 256-byte numpy table lookup over the record
matrix (layout.transcode_table) — vectorized, zero Python per record —
while ``record_key``/``value`` binary columns keep the ORIGINAL bytes
(key fidelity, FixedLengthRecordReader.java:252-254).  The writer takes
the same option, so round trips stay in EBCDIC end to end.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.sources import fixedlen, fixture_gen
from hadoop_fixedlengthinputformat_spark.tables import configure, load_table

_NATION_SQL = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


@query("scan_fixedlen_ebcdic", oracle=_NATION_SQL)
def scan_fixedlen_ebcdic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EBCDIC (cp037) fixed-width file -> typed columns.  The fixture is
    genuinely EBCDIC on disk (digit '0' is byte 0xF0, not 0x30); decode
    cost is one table lookup folded into the vectorized path."""
    configure(spark)
    fixedlen.register(spark)
    path = fixture_gen.fixed_file_for(sf_dir, "nation", encoding="cp037")
    record_length, spec, _ = fixture_gen.LAYOUTS["nation"]
    return (
        spark.read.format("fixedlen")
        .option("recordLength", str(record_length))
        .option("layout", spec)
        .option("encoding", "cp037")
        .option("includeOffset", "false")
        .load(path)
    )


@query("sink_fixedlen_ebcdic", oracle=_NATION_SQL)
def sink_fixedlen_ebcdic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round trip through the WRITER in cp037: parquet -> EBCDIC
    fixed-width -> typed columns.  Same commit protocol as sink_fixedlen;
    only the byte charset differs."""
    configure(spark)
    fixedlen.register(spark)
    record_length, spec, _ = fixture_gen.LAYOUTS["nation"]
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = os.path.join(tempfile.gettempdir(), "flif_sink_fixedlen_ebcdic")
    (
        n.coalesce(1)
        .write.format("fixedlen")
        .option("recordLength", str(record_length))
        .option("layout", spec)
        .option("encoding", "cp037")
        .mode("overwrite")
        .save(out)
    )
    return (
        spark.read.format("fixedlen")
        .option("recordLength", str(record_length))
        .option("layout", spec)
        .option("encoding", "cp037")
        .option("includeOffset", "false")
        .load(out)
    )
