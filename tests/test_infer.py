"""Layout inference heuristics (sources/infer.py)."""

from __future__ import annotations

import gzip
import os

from hadoop_fixedlengthinputformat_spark.sources import fixedlen
from hadoop_fixedlengthinputformat_spark.sources.infer import (
    infer_layout,
    infer_layout_from_file,
)


def _sample(rows, rl):
    return b"".join(r.ljust(rl) for r in rows)


def test_infers_gutter_separated_fields_and_types():
    rows = [
        b"00042 widget-a   12.50 2024-01-15",
        b"00007 gizmo-bb    7.25 2023-11-02",
        b"10000 bolt-c    100.00 2022-05-30",
    ]
    spec = infer_layout(_sample(rows, 34), 34)
    parts = spec.split(",")
    assert parts[0] == "c0:0:5:int"
    assert parts[1].endswith(":string") and parts[1].startswith("c1:6:")
    assert ":double(2)" in parts[2]
    assert parts[3].endswith(":date")


def test_abutting_fields_merge_to_string():
    # no gutter between digits and letters -> one string field (the
    # documented limitation; the user splits manually)
    rows = [b"00001NAME_A  ", b"00002NAME_B  "]
    spec = infer_layout(_sample(rows, 13), 13)
    assert spec == "c0:0:11:string"


def test_long_for_wide_integers_and_sign():
    rows = [b"  12345678901  -42 ", b"  99999999999  +17 "]
    spec = infer_layout(_sample(rows, 19), 19)
    f0, f1 = spec.split(",")
    assert f0.endswith(":long")
    assert f1.endswith(":int")


def test_inferred_spec_round_trips_through_reader(spark, tmp_path):
    rows = [
        b"00042 widget-a   12.50 2024-01-15",
        b"00007 gizmo-bb    7.25 2023-11-02",
    ]
    payload = _sample(rows, 34)
    path = os.path.join(str(tmp_path), "inf.fixed")
    open(path, "wb").write(payload)
    spec = infer_layout_from_file(path, 34)
    fixedlen.register(spark)
    df = (
        spark.read.format("fixedlen")
        .option("recordLength", "34")
        .option("layout", spec)
        .option("includeOffset", "false")
        .load(path)
    )
    got = sorted(df.collect(), key=lambda r: r.c0)
    assert got[0].c0 == 7 and abs(got[0].c2 - 7.25) < 1e-9
    assert str(got[1].c3) == "2024-01-15"


def test_infer_from_gzip_head(tmp_path):
    rows = [b"123 abc ", b"456 def "]
    path = os.path.join(str(tmp_path), "g.fixed.gz")
    with gzip.open(path, "wb") as f:
        f.write(_sample(rows, 8))
    spec = infer_layout_from_file(path, 8)
    assert spec.split(",")[0] == "c0:0:3:int"


def test_infer_julian7_conservative():
    """Width-7 YYYYDDD columns infer as julian only under the strict
    sniff: plausible years, leap-aware DDD, and at least one DDD > 31
    (a low-DDD-only column stays int — id sequences/truncated YYYYMMDD
    are likelier); 5-wide YYDDD is never inferred (ambiguous int)."""
    from hadoop_fixedlengthinputformat_spark.sources.infer import infer_layout

    recs = b"".join(
        f"{k:03d} {1992 + k % 5:04d}{40 + k:03d} {k:05d}".encode()
        for k in range(30)
    )
    spec = infer_layout(recs, 17)
    assert ":4:7:julian" in spec, spec
    assert spec.split(",")[2].endswith(":int"), spec  # 5-digit stays int
    # all-DDD<=31 column must NOT infer julian
    recs2 = b"".join(f"{k:03d} {2024001 + k:07d}".encode() for k in range(30))
    spec2 = infer_layout(recs2, 11)
    assert "julian" not in spec2, spec2
