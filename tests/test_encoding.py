"""EBCDIC encoding option: real cp037 bytes on disk, transcoded decode,
raw-byte key fidelity, and option validation."""

from __future__ import annotations

import pytest

from hadoop_fixedlengthinputformat_spark.sources import fixedlen, fixture_gen

SF = "/root/testdata/sf0.001"


def test_ebcdic_fixture_is_really_ebcdic():
    path = fixture_gen.fixed_file_for(SF, "nation", encoding="cp037")
    ascii_path = fixture_gen.fixed_file_for(SF, "nation")
    raw = open(path, "rb").read()
    assert raw != open(ascii_path, "rb").read()
    # EBCDIC digit zero is 0xF0, space is 0x40 — no ASCII digits anywhere
    assert 0xF0 in raw and 0x40 in raw
    assert not any(0x30 <= b <= 0x39 for b in raw)


def test_ebcdic_scan_decodes_and_keys_stay_raw(spark):
    fixedlen.register(spark)
    path = fixture_gen.fixed_file_for(SF, "nation", encoding="cp037")
    record_length, spec, _ = fixture_gen.LAYOUTS["nation"]
    df = (
        spark.read.format("fixedlen")
        .option("recordLength", str(record_length))
        .option("layout", spec)
        .option("encoding", "cp037")
        .option("keyStartAt", "0")
        .option("keyEndAt", "4")
        .load(path)
    )
    rows = df.orderBy("n_nationkey").collect()
    assert [r.n_nationkey for r in rows] == list(range(len(rows)))
    assert rows[0].n_name.startswith("NATION")
    # record_key carries the ORIGINAL EBCDIC bytes, not the transcode
    assert rows[0].record_key == "00000".encode("cp037")
    assert rows[0].record_key != b"00000"


def test_encoding_option_validation(spark):
    fixedlen.register(spark)
    path = fixture_gen.fixed_file_for(SF, "nation")
    reader = (
        spark.read.format("fixedlen")
        .option("recordLength", "40")
        .option("layout", fixture_gen.LAYOUTS["nation"][1])
    )
    with pytest.raises(Exception, match="unknown encoding"):
        reader.option("encoding", "no-such-charset").load(path).count()
    with pytest.raises(Exception, match="single-byte"):
        reader.option("encoding", "utf-16").load(path).count()


def test_ebcdic_streaming_tail(spark, tmp_path):
    """Charset symmetry extends to streaming: tailing a growing cp037
    file decodes identically (the partitioned stream reader delegates to
    the batch decode path, encoding included)."""
    src = fixture_gen.fixed_file_for(SF, "nation", encoding="cp037")
    p = tmp_path / "grow.fixed"
    p.write_bytes(open(src, "rb").read())
    fixedlen.register(spark)
    record_length, spec, _ = fixture_gen.LAYOUTS["nation"]
    q = (
        spark.readStream.format("fixedlen")
        .option("recordLength", str(record_length))
        .option("layout", spec)
        .option("encoding", "cp037")
        .option("partitionedStream", "true")
        .load(str(p))
        .writeStream.format("memory")
        .queryName("ebcdic_tail")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT n_nationkey, n_name FROM ebcdic_tail ORDER BY n_nationkey"
    ).collect()
    assert len(rows) == 25
    assert rows[0].n_name.startswith("NATION")
