"""sortedBy bisection pruning: partition clamping, conservativeness,
and option validation."""

from __future__ import annotations

import pytest

from hadoop_fixedlengthinputformat_spark.sources import fixedlen
from hadoop_fixedlengthinputformat_spark.sources.fixedlen import _Options

LAYOUT = "k:0:8:long,tag:8:12:string"


def _write(path, keys):
    with open(path, "wb") as f:
        f.write(b"".join(
            f"{k:08d}".encode() + f"v{k % 7}".ljust(12).encode() for k in keys
        ))


def _rd(spark, path, **extra):
    fixedlen.register(spark)
    r = (
        spark.read.format("fixedlen")
        .option("recordLength", "20")
        .option("layout", LAYOUT)
        .option("maxPartitionBytes", "4000")
    )
    for k, v in extra.items():
        r = r.option(k, v)
    return r.load(str(path))


def test_sorted_prunes_partitions_and_matches_unpruned(spark, tmp_path):
    p = tmp_path / "s.fixed"
    _write(p, range(10000))
    base = _rd(spark, p).where("k >= 4000 and k < 4200")
    srt = _rd(spark, p, sortedBy="k").where("k >= 4000 and k < 4200")
    assert sorted(r.k for r in srt.collect()) == list(range(4000, 4200))
    assert sorted(r.k for r in base.collect()) == list(range(4000, 4200))
    # 200 matching records * 20 B = 4000 B -> at most 2 clamped splits
    assert srt.rdd.getNumPartitions() <= 2 < base.rdd.getNumPartitions()


def test_sorted_equality_probe_single_partition(spark, tmp_path):
    p = tmp_path / "eq.fixed"
    _write(p, range(5000))
    df = _rd(spark, p, sortedBy="k").where("k = 1234")
    assert [r.k for r in df.collect()] == [1234]
    assert df.rdd.getNumPartitions() == 1


def test_sorted_out_of_range_probe_reads_nothing(spark, tmp_path):
    p = tmp_path / "oor.fixed"
    _write(p, range(100))
    df = _rd(spark, p, sortedBy="k").where("k > 100000")
    assert df.collect() == []


def test_sorted_with_header_skip(spark, tmp_path):
    p = tmp_path / "hdr.fixed"
    # banner record (non-numeric key bytes) + sorted data
    with open(p, "wb") as f:
        f.write(b"#HEADER#".ljust(20))
        f.write(b"".join(
            f"{k:08d}".encode() + b"x".ljust(12) for k in range(500)
        ))
    df = _rd(
        spark, p, sortedBy="k", skipHeaderRecords="1"
    ).where("k >= 100 and k < 110")
    assert sorted(r.k for r in df.collect()) == list(range(100, 110))


def test_sorted_duplicate_keys_all_returned(spark, tmp_path):
    p = tmp_path / "dup.fixed"
    keys = sorted([7] * 50 + list(range(100)) + [93] * 30)
    _write(p, keys)
    df = _rd(spark, p, sortedBy="k").where("k = 7")
    assert len(df.collect()) == 51
    df2 = _rd(spark, p, sortedBy="k").where("k >= 93")
    assert len(df2.collect()) == 31 + 6  # 93*31 + 94..99


def test_sorted_decode_failure_falls_back_conservatively(spark, tmp_path):
    """A garbage probe record (non-numeric key) must disable pruning,
    not wrongly prune — rows with decodable keys still come back if
    mode=permissive handles the bad row."""
    p = tmp_path / "bad.fixed"
    with open(p, "wb") as f:
        f.write(b"".join(
            f"{k:08d}".encode() + b"x".ljust(12) for k in range(100)
        ))
        f.write(b"GARBAGE!" + b"x".ljust(12))  # unsortable tail record
        f.write(b"".join(
            f"{k:08d}".encode() + b"x".ljust(12) for k in range(100, 120)
        ))
    df = _rd(spark, p, sortedBy="k", mode="permissive").where(
        "k >= 90 and k < 105"
    )
    assert sorted(r.k for r in df.collect()) == list(range(90, 105))


def test_sorted_option_validation():
    with pytest.raises(ValueError, match="sortedBy"):
        _Options.parse({"recordlength": "20", "sortedby": "k"})
    with pytest.raises(ValueError, match="sortedBy"):
        _Options.parse(
            {"recordlength": "20", "layout": LAYOUT, "sortedby": "missing"}
        )


def test_sorted_null_key_mid_file_falls_back_conservatively(spark, tmp_path):
    """ADVICE r6: a record whose key decodes to NULL (blank-padded
    trailer-like row) must make the bisect UNPROVABLE (whole file
    kept), not compare as below-range — the latter makes the predicate
    non-monotone and can clamp away matching byte ranges."""
    p = tmp_path / "nullkey.fixed"
    with open(p, "wb") as f:
        f.write(b"".join(
            f"{k:08d}".encode() + b"x".ljust(12) for k in range(100)
        ))
        f.write(b" " * 8 + b"x".ljust(12))  # NULL-key record mid-sort
        f.write(b"".join(
            f"{k:08d}".encode() + b"x".ljust(12) for k in range(100, 120)
        ))
    df = _rd(spark, p, sortedBy="k", mode="permissive").where(
        "k >= 90 and k < 105"
    )
    assert sorted(r.k for r in df.collect()) == list(range(90, 105))
