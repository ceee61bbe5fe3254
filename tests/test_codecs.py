"""Codec layer (gzip/bz2/xz): round trips, stream skip semantics,
malformed-tail policy, and directory-stream membership."""

from __future__ import annotations

import bz2
import gzip
import lzma
import os

import pytest

from hadoop_fixedlengthinputformat_spark.sources import fixedlen


RECORDS = [f"{i:04d}{'v' + str(i):<6}".encode() for i in range(12)]
RL = 10
LAYOUT = "k:0:4:int,v:4:6:string"


def _write(path: str, codec, payload: bytes) -> None:
    with codec(path, "wb") as f:
        f.write(payload)


@pytest.mark.parametrize(
    "name,ext,codec",
    [
        ("gzip", ".gz", gzip.open),
        ("bz2", ".bz2", bz2.open),
        ("xz", ".xz", lzma.open),
    ],
)
def test_compressed_read_all_codecs(spark, tmp_path, name, ext, codec):
    fixedlen.register(spark)
    p = str(tmp_path / f"d.fixed{ext}")
    _write(p, codec, b"".join(RECORDS))
    df = (
        spark.read.format("fixedlen")
        .option("recordLength", str(RL))
        .option("layout", LAYOUT)
        .option("includeOffset", "false")
        .load(p)
    )
    rows = sorted((r.k, r.v) for r in df.collect())
    assert rows == [(i, f"v{i}") for i in range(12)]


@pytest.mark.parametrize("comp,ext,codec", [
    ("bz2", ".bz2", bz2.open),
    ("xz", ".xz", lzma.open),
])
def test_write_round_trip_new_codecs(spark, tmp_path, comp, ext, codec):
    fixedlen.register(spark)
    src = str(tmp_path / "src.fixed")
    open(src, "wb").write(b"".join(RECORDS))
    df = (
        spark.read.format("fixedlen")
        .option("recordLength", str(RL))
        .option("layout", LAYOUT)
        .option("includeOffset", "false")
        .load(src)
    )
    out = str(tmp_path / f"out_{comp}")
    (
        df.coalesce(1)
        .write.format("fixedlen")
        .option("recordLength", str(RL))
        .option("layout", LAYOUT)
        .option("compression", comp)
        .mode("overwrite")
        .save(out)
    )
    parts = [f for f in os.listdir(out) if f.endswith(f".fixed{ext}")]
    assert parts, os.listdir(out)
    # the member must decompress back to the exact record bytes
    with codec(os.path.join(out, parts[0]), "rb") as f:
        assert f.read() == b"".join(RECORDS)
    back = (
        spark.read.format("fixedlen")
        .option("recordLength", str(RL))
        .option("layout", LAYOUT)
        .option("includeOffset", "false")
        .load(out)
    )
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (i, f"v{i}") for i in range(12)
    ]


def test_compressed_stream_header_trailer_skip(spark, tmp_path):
    """skip_header/skip_trailer on an unseekable stream: header dropped
    as it decompresses, trailer withheld via the EOF holdback buffer."""
    fixedlen.register(spark)
    p = str(tmp_path / "d.fixed.bz2")
    _write(p, bz2.open, b"".join(RECORDS))
    df = (
        spark.read.format("fixedlen")
        .option("recordLength", str(RL))
        .option("layout", LAYOUT)
        .option("skipHeaderRecords", "2")
        .option("skipTrailerRecords", "3")
        .option("includeOffset", "false")
        .load(p)
    )
    assert sorted(r.k for r in df.collect()) == list(range(2, 9))


def test_compressed_malformed_tail_fails_then_drops(spark, tmp_path):
    fixedlen.register(spark)
    p = str(tmp_path / "d.fixed.xz")
    _write(p, lzma.open, b"".join(RECORDS) + b"XYZ")
    base = (
        spark.read.format("fixedlen")
        .option("recordLength", str(RL))
        .option("layout", LAYOUT)
        .option("includeOffset", "false")
    )
    with pytest.raises(Exception, match="mid-record"):
        base.load(p).collect()
    ok = base.option("malformedTail", "drop").load(p)
    assert ok.count() == 12


def test_bad_compression_option_rejected(spark, tmp_path):
    fixedlen.register(spark)
    with pytest.raises(Exception, match="compression"):
        (
            spark.range(1)
            .selectExpr("1 as k", "'x' as v")
            .write.format("fixedlen")
            .option("recordLength", str(RL))
            .option("layout", LAYOUT)
            .option("compression", "snappy")
            .mode("overwrite")
            .save(str(tmp_path / "bad"))
        )


def test_streaming_rejects_compressed_single_file(spark, tmp_path):
    fixedlen.register(spark)
    p = str(tmp_path / "d.fixed.bz2")
    _write(p, bz2.open, b"".join(RECORDS))
    with pytest.raises(Exception, match="compressed"):
        q = (
            spark.readStream.format("fixedlen")
            .option("recordLength", str(RL))
            .option("layout", LAYOUT)
            .load(p)
            .writeStream.format("memory")
            .queryName("codec_rej")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
