"""Option-combination round-trips for the fixedlen writer/reader.

Every advisor finding so far (r2: lineSep x skipHeader x streaming,
sidecar x skipHeader, empty x layout-write) lived at the INTERSECTION of
two options that each worked alone.  This matrix writes one dataset per
combination and requires the read-back to equal the source, with
banner-skip, pruning, pushdown, and sidecar pruning layered on top.
"""

from __future__ import annotations

import glob
import os

import pytest

LAYOUT = "k:0:6:long,name:6:12:string,v:18:10:double(2)"
REC_LEN = 28
# partitioned datasets carry the partition column in the PATH, not the
# record bytes, so they use a layout without it
LAYOUT_P = "k:0:6:long,v:6:10:double(2)"
REC_LEN_P = 16
N_ROWS = 311  # prime-ish: uneven final partitions


def _src(spark):
    from pyspark.sql import functions as F

    return (
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("name-"), F.col("id") % 7).alias("name"),
            ((F.col("id") * 37 % 9000) / 100.0).alias("v"),
        )
    )


def _write(spark, df, out, line_sep, compression, stats, partition_by):
    layout, rl = (LAYOUT_P, REC_LEN_P) if partition_by else (LAYOUT, REC_LEN)
    w = (
        df.coalesce(3)
        .write.format("fixedlen")
        .option("recordLength", str(rl))
        .option("layout", layout)
        .mode("overwrite")
    )
    if line_sep:
        w = w.option("lineSep", line_sep)
    if compression:
        w = w.option("compression", compression)
    if stats:
        w = w.option("statsSidecar", "true")
    if partition_by:
        w = w.option("partitionBy", partition_by)
    w.save(out)


def _prepend_banners(out, line_sep, n=2):
    """Mainframe-ify every part file: n banner records before the data."""
    sep = line_sep.encode() if line_sep else b""
    banner = (b"H" * REC_LEN + sep) * n
    for p in glob.glob(os.path.join(out, "*.fixed")):
        data = open(p, "rb").read()
        with open(p, "wb") as f:
            f.write(banner + data)


def _read(spark, out, line_sep, skip_header=0, columns=None, partitioned=False):
    layout, rl = (LAYOUT_P, REC_LEN_P) if partitioned else (LAYOUT, REC_LEN)
    r = (
        spark.read.format("fixedlen")
        .option("recordLength", str(rl))
        .option("layout", layout)
        .option("includeOffset", "false")
    )
    if line_sep:
        r = r.option("lineSep", line_sep)
    if skip_header:
        r = r.option("skipHeaderRecords", str(skip_header))
    if columns:
        r = r.option("columns", columns)
    return r.load(out)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


CASES = [
    # (line_sep, compression, stats, partition_by, banners, columns)
    ("", None, False, None, 0, None),
    ("\n", None, False, None, 0, None),
    ("", "gzip", False, None, 0, None),
    ("\n", "gzip", False, None, 0, None),
    ("", None, True, None, 0, None),
    ("\n", None, True, None, 0, None),
    ("", None, False, "name", 0, None),
    ("\n", None, True, "name", 0, None),
    ("", None, False, None, 2, None),
    ("\n", None, False, None, 2, None),
    ("", None, True, None, 2, None),
    ("\n", None, True, None, 2, "k,v"),
    ("", None, False, None, 0, "k,name"),
]


@pytest.mark.parametrize(
    "line_sep,compression,stats,partition_by,banners,columns",
    CASES,
    ids=[
        "plain", "linesep", "gzip", "linesep-gzip", "stats", "linesep-stats",
        "partitioned", "linesep-stats-partitioned", "banners",
        "linesep-banners", "stats-banners", "linesep-stats-banners-pruned",
        "pruned",
    ],
)
def test_roundtrip_combination(
    spark, tmp_path, line_sep, compression, stats, partition_by, banners, columns
):
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen

    fixedlen.register(spark)
    df = _src(spark)
    out = str(tmp_path / "ds")
    _write(spark, df, out, line_sep, compression, stats, partition_by)
    if banners:
        _prepend_banners(out, line_sep, banners)
    back = _read(
        spark, out, line_sep, skip_header=banners, columns=columns,
        partitioned=bool(partition_by),
    )
    want = df
    if partition_by:
        # partition columns come back as strings (hive semantics); compare
        # on the non-partition columns plus the cast-back key
        from pyspark.sql import functions as F

        back = back.select("k", F.col("name").cast("string").alias("name"), "v")
        want = df.select("k", "name", "v")
    if columns:
        cols = columns.split(",")
        back = back.select(*cols)
        want = want.select(*cols)
    assert _rows(back) == _rows(want)


def test_sidecar_pruning_with_banners_returns_full_result(spark, tmp_path):
    """stats pruning + skipHeaderRecords together (ADVICE 4's integration
    shape): a selective filter over a banner-wrapped, sidecar'd dataset
    must still return exactly the matching rows."""
    from pyspark.sql import functions as F

    from hadoop_fixedlengthinputformat_spark.sources import fixedlen

    fixedlen.register(spark)
    df = _src(spark)
    out = str(tmp_path / "ds")
    _write(spark, df, out, "", None, True, None)
    _prepend_banners(out, "", 2)
    back = _read(spark, out, "", skip_header=2).filter(F.col("k") < 40)
    assert _rows(back) == _rows(df.filter(F.col("k") < 40))


def test_streaming_reads_banner_wrapped_linesep_dir(spark, tmp_path):
    """partitionedStream over a directory whose files carry banners AND
    line terminators (the r2 ADVICE 2/3 interaction, directory flavor)."""
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen

    fixedlen.register(spark)
    df = _src(spark)
    out = str(tmp_path / "ds")
    _write(spark, df, out, "\n", None, False, None)
    _prepend_banners(out, "\n", 1)
    q = (
        spark.readStream.format("fixedlen")
        .option("recordLength", str(REC_LEN))
        .option("layout", LAYOUT)
        .option("lineSep", "\n")
        .option("skipHeaderRecords", "1")
        .option("includeOffset", "false")
        .option("partitionedStream", "true")
        .load(out)
        .writeStream.format("memory")
        .queryName("matrix_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r) for r in spark.sql("select * from matrix_stream").collect()
    )
    assert got == _rows(df)
