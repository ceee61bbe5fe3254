"""Edge-case fixtures from FIXTURES.md §A3 / SURVEY.md §2.1 quirks."""

from __future__ import annotations

import os

import pytest

from hadoop_fixedlengthinputformat_spark.sources import fixedlen
from hadoop_fixedlengthinputformat_spark.sources.layout import parse_layout


def _write(tmp_path, name: str, payload: bytes) -> str:
    path = os.path.join(str(tmp_path), name)
    with open(path, "wb") as f:
        f.write(payload)
    return path


def _read(spark, path, rec_len, **opts):
    fixedlen.register(spark)
    r = spark.read.format("fixedlen").option("recordLength", str(rec_len))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(path)


def test_tail_partial_fails_by_default(spark, tmp_path):
    """File size = 10*len + 3 -> hard error (mirrors FLRR:231-235, raised
    eagerly at planning)."""
    path = _write(tmp_path, "tail.bin", b"x" * (10 * 8 + 3))
    with pytest.raises(Exception, match="not a multiple"):
        _read(spark, path, 8).collect()


def test_tail_partial_drop(spark, tmp_path):
    path = _write(tmp_path, "tail2.bin", b"x" * (10 * 8 + 3))
    df = _read(spark, path, 8, malformedTail="drop")
    assert df.count() == 10


def test_record_length_one(spark, tmp_path):
    path = _write(tmp_path, "one.bin", b"a" * 500)
    assert _read(spark, path, 1).count() == 500


def test_empty_file(spark, tmp_path):
    path = _write(tmp_path, "empty.bin", b"")
    df = _read(spark, path, 8)
    assert df.count() == 0


def test_key_end_eq_record_length_rejected(spark, tmp_path):
    """The reference accepts endAt == recordLength (FLIF:351-352 off-by-one,
    would read past the record); the engine rejects it."""
    path = _write(tmp_path, "k.bin", b"x" * 80)
    with pytest.raises(Exception, match="keyEndAt"):
        _read(spark, path, 8, keyStartAt="0", keyEndAt="8").collect()


def test_key_only_start_rejected(spark, tmp_path):
    """Both-or-neither rule (FLIF:348-349)."""
    path = _write(tmp_path, "k2.bin", b"x" * 80)
    with pytest.raises(Exception, match="together"):
        _read(spark, path, 8, keyStartAt="2").collect()


def test_key_start_gt_end_rejected(spark, tmp_path):
    path = _write(tmp_path, "k3.bin", b"x" * 80)
    with pytest.raises(Exception, match="keyStartAt"):
        _read(spark, path, 8, keyStartAt="5", keyEndAt="2").collect()


def test_missing_record_length_rejected(spark, tmp_path):
    path = _write(tmp_path, "k4.bin", b"x" * 80)
    fixedlen.register(spark)
    with pytest.raises(Exception, match="recordLength"):
        spark.read.format("fixedlen").load(path).collect()


def test_zero_record_length_rejected(spark, tmp_path):
    path = _write(tmp_path, "k5.bin", b"x" * 80)
    with pytest.raises(Exception, match="recordLength"):
        _read(spark, path, 0).collect()


def test_layout_field_out_of_bounds_rejected():
    with pytest.raises(ValueError, match="exceeds"):
        parse_layout("a:0:5:int,b:5:10:string", 12)


def test_layout_bad_type_rejected():
    with pytest.raises(ValueError, match="unsupported"):
        parse_layout("a:0:5:uuid", 12)


def test_multi_file_directory(spark, tmp_path):
    """Directory input: every file planned separately, offsets per file."""
    _write(tmp_path, "a.bin", b"!12345!!" * 4)
    _write(tmp_path, "b.bin", b"!abcde!!" * 3)
    df = _read(spark, str(tmp_path), 8)
    assert df.count() == 7
    offsets = sorted(r.record_offset for r in df.collect())
    assert offsets == [0, 0, 8, 8, 16, 16, 24]


def _write_gz(tmp_path, name: str, payload: bytes) -> str:
    import gzip

    path = os.path.join(str(tmp_path), name)
    with gzip.open(path, "wb") as f:
        f.write(payload)
    return path


def test_gzip_whole_file_read(spark, tmp_path):
    """Gzip input: one whole-file partition, offsets over the uncompressed
    stream (the reference rejects compressed input, FLRR:148-152)."""
    path = _write_gz(tmp_path, "g.bin.gz", b"!12345!!" * 100)
    df = _read(spark, path, 8)
    rows = df.collect()
    assert len(rows) == 100
    assert sorted(r.record_offset for r in rows) == [i * 8 for i in range(100)]
    assert df.rdd.getNumPartitions() == 1


def test_gzip_tail_partial_fails_by_default(spark, tmp_path):
    path = _write_gz(tmp_path, "gt.bin.gz", b"x" * (5 * 8 + 3))
    with pytest.raises(Exception, match="mid-record"):
        _read(spark, path, 8).collect()


def test_gzip_tail_partial_drop(spark, tmp_path):
    path = _write_gz(tmp_path, "gt2.bin.gz", b"x" * (5 * 8 + 3))
    assert _read(spark, path, 8, malformedTail="drop").count() == 5


def test_gzip_streaming_rejected(spark, tmp_path):
    path = _write_gz(tmp_path, "gs.bin.gz", b"x" * 80)
    fixedlen.register(spark)
    with pytest.raises(Exception, match="streaming does not support gzip"):
        (spark.readStream.format("fixedlen").option("recordLength", "8")
         .load(path).writeStream.format("noop")
         .trigger(availableNow=True).start().awaitTermination())


def test_partitioned_stream_matches_batch(spark, tmp_path):
    """partitionedStream=true: executor-parallel micro-batch reads must
    deliver exactly the batch content (whole records, correct offsets)."""
    payload = b"".join(f"{i:08d}".encode() for i in range(500))
    path = _write(tmp_path, "ps.bin", payload)
    fixedlen.register(spark)
    src = (
        spark.readStream.format("fixedlen")
        .option("recordLength", "8")
        .option("layout", "v:0:8:long")
        .option("partitionedStream", "true")
        .option("maxPartitionBytes", "256")  # force many range partitions
        .load(path)
    )
    import os as _os
    import uuid as _uuid

    name = f"ps_mem_{_uuid.uuid4().hex[:8]}"
    q = (
        src.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", _os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    assert len(rows) == 500
    assert sorted(r.v for r in rows) == list(range(500))
    assert sorted(r.record_offset for r in rows) == [i * 8 for i in range(500)]


def test_permissive_mode_nulls_malformed_fields(spark, tmp_path):
    """mode=permissive: garbage int/double/date values decode to NULL
    instead of failing the task; failfast (default) raises."""
    recs = (
        b"00042" + b"3.14      " + b"2024-01-15" +  # clean
        b"00x13" + b"oops      " + b"2024-13-99" +  # all three malformed
        b"     " + b"          " + b"2024-02-29"    # empty int/double
    )
    path = _write(tmp_path, "perm.bin", recs)
    layout = "k:0:5:int,v:5:10:double,d:15:10:date"
    with pytest.raises(Exception):
        _read(spark, path, 25, layout=layout).collect()
    rows = sorted(
        _read(spark, path, 25, layout=layout, mode="permissive").collect(),
        key=lambda r: r.record_offset,
    )
    assert rows[0].k == 42 and abs(rows[0].v - 3.14) < 1e-9
    assert rows[1].k is None and rows[1].v is None and rows[1].d is None
    assert rows[2].k is None and rows[2].v is None
    assert str(rows[2].d) == "2024-02-29"


def test_permissive_mode_rejects_bad_value(spark, tmp_path):
    path = _write(tmp_path, "perm2.bin", b"x" * 80)
    with pytest.raises(Exception, match="mode"):
        _read(spark, path, 8, mode="lenient").collect()
