"""COMP-1/COMP-2 (big-endian IEEE float) layout fields."""

from __future__ import annotations

import math
import struct

import pytest

from hadoop_fixedlengthinputformat_spark.sources import fixedlen
from hadoop_fixedlengthinputformat_spark.sources.layout import parse_layout

RL = 14
LAYOUT = "k:0:2:int,f1:2:4:comp1,f2:6:8:comp2"

VALUES = [0.0, -0.0, 1.5, -123.456, 1e30, float("inf"), 2.0**-149]


def _file(tmp_path):
    p = str(tmp_path / "c.fixed")
    with open(p, "wb") as f:
        for i, v in enumerate(VALUES):
            f.write(
                f"{i:02d}".encode()
                + struct.pack(">f", v)
                + struct.pack(">d", v)
            )
    return p


def test_decode_comp1_comp2(spark, tmp_path):
    fixedlen.register(spark)
    df = (
        spark.read.format("fixedlen")
        .option("recordLength", str(RL))
        .option("layout", LAYOUT)
        .option("includeOffset", "false")
        .load(_file(tmp_path))
    )
    rows = sorted(df.collect(), key=lambda r: r.k)
    for i, v in enumerate(VALUES):
        f32 = struct.unpack(">f", struct.pack(">f", v))[0]
        assert rows[i].f2 == v or (math.isnan(v) and math.isnan(rows[i].f2))
        assert rows[i].f1 == f32
        # -0.0 sign preserved through the zero-copy view
        if v == 0.0:
            assert math.copysign(1.0, rows[i].f1) == math.copysign(1.0, v)


def test_sink_round_trip(spark, tmp_path):
    fixedlen.register(spark)
    out = str(tmp_path / "sunk")
    df = spark.createDataFrame(
        [(i, v, v) for i, v in enumerate(VALUES) if not math.isinf(v)],
        "k int, f1 double, f2 double",
    )
    (
        df.write.format("fixedlen")
        .option("recordLength", str(RL))
        .option("layout", LAYOUT)
        .mode("overwrite")
        .save(out)
    )
    back = (
        spark.read.format("fixedlen")
        .option("recordLength", str(RL))
        .option("layout", LAYOUT)
        .option("includeOffset", "false")
        .load(out)
    )
    got = {r.k: (r.f1, r.f2) for r in back.collect()}
    for i, v in enumerate(VALUES):
        if math.isinf(v):
            continue
        f32 = struct.unpack(">f", struct.pack(">f", v))[0]
        assert got[i] == (f32, v)


def test_width_validation():
    with pytest.raises(ValueError, match="exactly 4 bytes"):
        parse_layout("f:0:8:comp1", 8)
    with pytest.raises(ValueError, match="exactly 8 bytes"):
        parse_layout("f:0:4:comp2", 8)


def test_nan_passthrough(spark, tmp_path):
    fixedlen.register(spark)
    p = str(tmp_path / "nan.fixed")
    with open(p, "wb") as f:
        f.write(b"00" + struct.pack(">f", float("nan")) + struct.pack(">d", float("nan")))
    r = (
        spark.read.format("fixedlen")
        .option("recordLength", str(RL))
        .option("layout", LAYOUT)
        .option("includeOffset", "false")
        .load(p)
    ).collect()[0]
    assert math.isnan(r.f1) and math.isnan(r.f2)
