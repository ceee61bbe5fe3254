"""Multi-record-type fixed-width scan (COBOL header/detail dispatch).

Real fixed-width datasets routinely mix record types in one file, with
a discriminator byte slice selecting the layout (COBOL ``REDEFINES`` /
header-detail-trailer tapes).  The reference hands every record to the
consumer as opaque bytes (FixedLengthInputFormat.java:38-43) — the
engine makes the dispatch declarative:

    .option("layouts", "N=<layout>;R=<layout>")
    .option("typeStart", "0").option("typeLen", "1")

yielding ``record_type`` plus the UNION of all layouts' columns
(null where a record's type lacks the field).  Decode groups rows by
tag vectorized, decodes each group with its own layout, and scatters
back to file order — no per-record Python (layout.decode_chunk_multitype).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.sources import fixedlen, fixture_gen
from hadoop_fixedlengthinputformat_spark.sources.layout import (
    encode_rows,
    parse_layout,
)
from hadoop_fixedlengthinputformat_spark.tables import configure

RECORD_LENGTH = 41
NATION_SUB = "n_nationkey:1:5:int,n_name:6:30:string,n_regionkey:36:5:int"
REGION_SUB = "r_regionkey:1:5:int,r_name:6:25:string"
LAYOUTS_OPT = f"N={NATION_SUB};R={REGION_SUB}"


def multitype_file_for(sf_dir: str) -> str:
    """Mixed nation/region fixture: alternating 'N'/'R' records of one
    fixed 41-byte length, discriminator at byte 0."""
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|multitype|{LAYOUTS_OPT}"
        f"|{fixture_gen.source_stamp(sf_dir)}".encode()
    ).hexdigest()[:12]
    out = os.path.join(fixture_gen.fixture_dir(), f"multitype-{tag}.fixed")
    if os.path.exists(out):
        return out
    nation = (
        pq.read_table(os.path.join(sf_dir, "nation.parquet"))
        .sort_by("n_nationkey")
        .to_pylist()
    )
    region = (
        pq.read_table(os.path.join(sf_dir, "region.parquet"))
        .sort_by("r_regionkey")
        .to_pylist()
    )
    n_fields = parse_layout("rt:0:1:string," + NATION_SUB, RECORD_LENGTH)
    r_fields = parse_layout("rt:0:1:string," + REGION_SUB, RECORD_LENGTH)
    payload = bytearray()
    ni, ri = 0, 0
    while ni < len(nation) or ri < len(region):
        if ni < len(nation):
            payload += encode_rows(
                [{"rt": "N", **nation[ni]}], n_fields, RECORD_LENGTH
            )
            ni += 1
        if ri < len(region):
            payload += encode_rows(
                [{"rt": "R", **region[ri]}], r_fields, RECORD_LENGTH
            )
            ri += 1
    tmp = out + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(bytes(payload))
    os.replace(tmp, out)
    return out


@query(
    "scan_fixedlen_multitype",
    oracle="""
    SELECT 'N' AS record_type, n_nationkey, n_name, n_regionkey,
           CAST(NULL AS INTEGER) AS r_regionkey, CAST(NULL AS VARCHAR) AS r_name
    FROM nation
    UNION ALL
    SELECT 'R', CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR),
           CAST(NULL AS INTEGER), r_regionkey, r_name
    FROM region
    """,
)
def scan_fixedlen_multitype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed header/detail file -> record_type + union columns."""
    configure(spark)
    fixedlen.register(spark)
    path = multitype_file_for(sf_dir)
    return (
        spark.read.format("fixedlen")
        .option("recordLength", str(RECORD_LENGTH))
        .option("layouts", LAYOUTS_OPT)
        .option("typeStart", "0")
        .option("typeLen", "1")
        .option("includeOffset", "false")
        .load(path)
    )
