"""Min/max stats sidecar: write-side emission + planning-time pruning.

The poison tests prove pruning happens at PLANNING time: byte ranges
whose stats exclude the predicate are corrupted on disk, so any attempt
to actually decode them would hard-fail — a successful filtered read is
proof those partitions were never read.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from hadoop_fixedlengthinputformat_spark.sources import fixedlen, stats
from hadoop_fixedlengthinputformat_spark.sources.layout import parse_layout

RL = 12
LAYOUT = "k:0:4:int,v:4:8:string"


def _write_sorted(spark, out, n=100, block=10):
    fixedlen.register(spark)
    df = spark.createDataFrame(
        [(i, f"val{i:04d}") for i in range(n)], "k int, v string"
    ).coalesce(1)
    (
        df.sortWithinPartitions("k")
        .write.format("fixedlen")
        .option("recordLength", str(RL))
        .option("layout", LAYOUT)
        .option("statsSidecar", "true")
        .option("statsBlockRecords", str(block))
        .mode("overwrite")
        .save(out)
    )
    (part,) = [
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith(".fixed")
    ]
    return part


def _read(spark, path, **opts):
    r = (
        spark.read.format("fixedlen")
        .option("recordLength", str(RL))
        .option("layout", LAYOUT)
        .option("includeOffset", "false")
        .option("maxPartitionBytes", str(RL * 10))  # 1 partition per block
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(path)


def _poison(part, lo_rec, hi_rec):
    """Overwrite records [lo_rec, hi_rec) with bytes that hard-fail the
    int decode."""
    with open(part, "r+b") as f:
        f.seek(lo_rec * RL)
        f.write(b"X" * ((hi_rec - lo_rec) * RL))


def test_sidecar_written_and_excluded_from_listing(spark, tmp_path):
    out = os.path.join(str(tmp_path), "ds")
    part = _write_sorted(spark, out)
    side = stats.sidecar_path(part)
    assert os.path.exists(side)
    payload = json.load(open(side))
    assert len(payload["blocks"]) == 10
    assert payload["blocks"][0]["cols"]["k"] == {"min": 0, "max": 9, "nan": False}
    # directory read must not treat the sidecar as data
    assert _read(spark, out).count() == 100


def test_pruning_skips_poisoned_partitions(spark, tmp_path):
    out = os.path.join(str(tmp_path), "ds2")
    part = _write_sorted(spark, out)
    _poison(part, 0, 50)
    got = sorted(
        r.k for r in _read(spark, out).filter(F.col("k") >= 90).collect()
    )
    assert got == list(range(90, 100))
    # control: without the predicate the poisoned ranges ARE read -> error
    with pytest.raises(Exception):
        _read(spark, out).collect()


def test_pruning_is_conservative_at_block_boundaries(spark, tmp_path):
    """A block straddling the predicate boundary is kept and row-masked,
    never dropped."""
    out = os.path.join(str(tmp_path), "ds3")
    part = _write_sorted(spark, out)
    _poison(part, 0, 30)  # only fully-excluded blocks poisoned
    got = sorted(
        r.k for r in _read(spark, out).filter(F.col("k") >= 35).collect()
    )
    assert got == list(range(35, 100))


def test_string_and_in_predicates_prune(spark, tmp_path):
    out = os.path.join(str(tmp_path), "ds4")
    part = _write_sorted(spark, out)
    _poison(part, 0, 90)
    got = sorted(
        r.k
        for r in _read(spark, out)
        .filter(F.col("v").isin("val0095", "val0099"))
        .collect()
    )
    assert got == [95, 99]


def test_corrupt_gzip_pruned_without_read(spark, tmp_path):
    """A whole-file gzip partition is droppable by stats alone: the file
    here isn't even valid gzip, so any read attempt would fail."""
    fixedlen.register(spark)
    d = os.path.join(str(tmp_path), "gz")
    os.makedirs(d)
    part = os.path.join(d, "part-00000-deadbeef00.fixed.gz")
    with open(part, "wb") as f:
        f.write(b"NOT A GZIP STREAM")
    fields = parse_layout(LAYOUT, RL)
    coll = stats.StatsCollector(fields, 10)
    for i in range(10):
        coll.update({"k": i, "v": f"val{i:04d}"})
    stats.write_sidecar(stats.sidecar_path(part), coll.payload())
    df = _read(spark, d).filter(F.col("k") > 1000)
    assert df.count() == 0
    with pytest.raises(Exception):
        _read(spark, d).collect()


def test_overwrite_cleans_stale_sidecars(spark, tmp_path):
    out = os.path.join(str(tmp_path), "ds5")
    _write_sorted(spark, out, n=50)
    first = set(os.listdir(out))
    _write_sorted(spark, out, n=20)
    second = set(os.listdir(out))
    assert not (first & second)  # old part AND old sidecar replaced
    assert sum(1 for f in second if stats.is_sidecar(f)) == 1
    assert _read(spark, out).count() == 20


def test_missing_sidecar_changes_nothing(spark, tmp_path):
    out = os.path.join(str(tmp_path), "ds6")
    part = _write_sorted(spark, out)
    os.remove(stats.sidecar_path(part))
    assert _read(spark, out).filter(F.col("k") >= 90).count() == 10


def test_date_predicates_prune(spark, tmp_path):
    """Date min/max round-trips through ISO serialization and prunes."""
    fixedlen.register(spark)
    out = os.path.join(str(tmp_path), "ds7")
    df = spark.createDataFrame(
        [(i, f"20{i:02d}-06-15") for i in range(1, 31)], "k int, d string"
    ).selectExpr("k", "cast(d as date) d").coalesce(1)
    (
        df.sortWithinPartitions("d")
        .write.format("fixedlen")
        .option("recordLength", "14")
        .option("layout", "k:0:4:int,d:4:10:date")
        .option("statsSidecar", "true")
        .option("statsBlockRecords", "10")
        .mode("overwrite")
        .save(out)
    )
    (part,) = [os.path.join(out, f) for f in os.listdir(out) if f.endswith(".fixed")]
    with open(part, "r+b") as f:
        f.seek(0)
        f.write(b"X" * (14 * 20))  # first two blocks poisoned
    got = (
        spark.read.format("fixedlen")
        .option("recordLength", "14")
        .option("layout", "k:0:4:int,d:4:10:date")
        .option("includeOffset", "false")
        .option("maxPartitionBytes", str(14 * 10))
        .load(out)
        .filter(F.col("d") >= F.lit("2021-01-01").cast("date"))
    )
    assert sorted(r.k for r in got.collect()) == list(range(21, 31))
