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


def test_julian_decode_encode_roundtrip():
    """YYDDD/YYYYDDD kernel: round trip, windowed century bounds,
    leap-aware DDD validation, permissive nulling."""
    import datetime as dt

    import numpy as np
    import pytest

    from hadoop_fixedlengthinputformat_spark.sources.layout import (
        decode_field,
        encode_rows,
        parse_layout,
    )

    fields = parse_layout("j5:0:5:julian,j7:5:7:julian", 12)
    dates = [
        dt.date(1992, 1, 1), dt.date(1996, 2, 29), dt.date(1998, 12, 31),
        dt.date(2024, 7, 4), dt.date(1970, 1, 1), dt.date(2069, 12, 31),
    ]
    payload = encode_rows([{"j5": d, "j7": d} for d in dates], fields, 12)
    mat = np.frombuffer(payload, dtype=np.uint8).reshape(len(dates), 12)
    for f in fields:
        assert [v.as_py() for v in decode_field(mat, f)] == dates
    # 1995 is not a leap year: DDD=366 must failfast / null permissively
    bad = np.frombuffer(b"95366" + b"1995366", dtype=np.uint8).reshape(1, 12)
    with pytest.raises(ValueError, match="day-of-year"):
        decode_field(bad, fields[0])
    assert decode_field(bad, fields[1], permissive=True)[0].as_py() is None
    # century window edges: 70 -> 1970, 69 -> 2069
    m = np.frombuffer(b"70001" + b"1970001", dtype=np.uint8).reshape(1, 12)
    assert decode_field(m, fields[0])[0].as_py() == dt.date(1970, 1, 1)
    m = np.frombuffer(b"69365" + b"2069365", dtype=np.uint8).reshape(1, 12)
    assert decode_field(m, fields[0])[0].as_py() == dt.date(2069, 12, 31)
    # encode refuses years outside the YYDDD window
    with pytest.raises(ValueError, match="century window"):
        encode_rows([{"j5": dt.date(1969, 12, 31), "j7": dt.date(1969, 12, 31)}], fields, 12)
    # width validation
    with pytest.raises(ValueError, match="julian is 5"):
        parse_layout("x:0:6:julian", 6)
    # under-width digit run (ADVICE r7, medium): ' 1234' in a 5-byte
    # field and ' 95366 ' in the 7-byte field must FAILFAST, not
    # silently mis-slice into (year='1', ddd='234') / (9536, 6)
    m = np.frombuffer(b" 1234" + b" 95366 ", dtype=np.uint8).reshape(1, 12)
    with pytest.raises(ValueError, match="narrower than field width"):
        decode_field(m, fields[0])
    with pytest.raises(ValueError, match="narrower than field width"):
        decode_field(m, fields[1])
    # permissive keeps nulling under-width values
    assert decode_field(m, fields[0], permissive=True)[0].as_py() is None
    assert decode_field(m, fields[1], permissive=True)[0].as_py() is None
