"""Multi-record-type dispatch: union decode, file-order scatter, unknown
tags, and spec validation."""

from __future__ import annotations

import pytest

from hadoop_fixedlengthinputformat_spark.sources import fixedlen
from hadoop_fixedlengthinputformat_spark.sources.multitype_queries import (
    LAYOUTS_OPT,
    RECORD_LENGTH,
    multitype_file_for,
)

SF = "/root/testdata/sf0.001"


def _reader(spark, path):
    fixedlen.register(spark)
    return (
        spark.read.format("fixedlen")
        .option("recordLength", str(RECORD_LENGTH))
        .option("layouts", LAYOUTS_OPT)
        .option("typeStart", "0")
        .option("typeLen", "1")
        .load(path)
    )


def test_multitype_union_decode_and_order(spark):
    path = multitype_file_for(SF)
    rows = _reader(spark, path).orderBy("record_offset").collect()
    # fixture alternates N/R while both lists last
    assert rows[0].record_type == "N" and rows[1].record_type == "R"
    n = [r for r in rows if r.record_type == "N"]
    r = [r for r in rows if r.record_type == "R"]
    assert len(n) == 25 and len(r) == 5
    # union columns: own fields set, other type's fields null
    assert n[0].n_name.startswith("NATION") and n[0].r_name is None
    assert r[0].r_name in ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    assert r[0].n_nationkey is None and r[0].r_regionkey is not None


def test_multitype_unknown_tag_failfast_and_permissive(spark, tmp_path):
    src = open(multitype_file_for(SF), "rb").read()
    # corrupt the second record's tag
    bad = bytearray(src)
    bad[RECORD_LENGTH] = ord("X")
    p = tmp_path / "bad.fixed"
    p.write_bytes(bytes(bad))
    with pytest.raises(Exception, match="unknown record type"):
        _reader(spark, str(p)).collect()
    perm = (
        spark.read.format("fixedlen")
        .option("recordLength", str(RECORD_LENGTH))
        .option("layouts", LAYOUTS_OPT)
        .option("typeStart", "0")
        .option("typeLen", "1")
        .option("mode", "permissive")
        .load(str(p))
        .orderBy("record_offset")
        .collect()
    )
    assert perm[1].record_type == "X"
    assert perm[1].n_nationkey is None and perm[1].r_name is None


def test_multitype_spec_validation(spark):
    fixedlen.register(spark)
    path = multitype_file_for(SF)
    def base():
        # fresh reader per probe: DataFrameReader accumulates options
        return spark.read.format("fixedlen").option(
            "recordLength", str(RECORD_LENGTH)
        )

    with pytest.raises(Exception, match="mutually exclusive"):
        base().option("layouts", LAYOUTS_OPT).option(
            "layout", "a:0:5:int"
        ).load(path).count()
    with pytest.raises(Exception, match="conflicting types"):
        base().option(
            "layouts", "N=k:1:5:int;R=k:1:5:string"
        ).load(path).count()
    with pytest.raises(Exception, match="length != typeLen"):
        base().option("layouts", "NX=k:1:5:int").load(path).count()


def test_multitype_partitioned_stream(spark, tmp_path):
    """layouts + partitionedStream: the executor-parallel stream path
    delegates to the batch decode, so header/detail files can be tailed
    too; the driver-side simple reader rejects layouts with a pointer."""
    import pytest as _pytest

    path = multitype_file_for(SF)
    fixedlen.register(spark)
    q = (
        spark.readStream.format("fixedlen")
        .option("recordLength", str(RECORD_LENGTH))
        .option("layouts", LAYOUTS_OPT)
        .option("typeStart", "0")
        .option("typeLen", "1")
        .option("partitionedStream", "true")
        .load(path)
        .writeStream.format("memory")
        .queryName("mt_tail")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT record_type, count(*) c FROM mt_tail GROUP BY 1").collect()
    got = {r.record_type: r.c for r in rows}
    assert got == {"N": 25, "R": 5}

    with _pytest.raises(Exception, match="partitionedStream"):
        (
            spark.readStream.format("fixedlen")
            .option("recordLength", str(RECORD_LENGTH))
            .option("layouts", LAYOUTS_OPT)
            .load(path)
            .writeStream.format("memory")
            .queryName("mt_tail2")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


def test_multitype_corrupt_column_unknown_tag_and_bad_field(spark, tmp_path):
    """With layouts: unknown-tag rows and known rows whose OWN fields
    fail decode are corrupt; union columns a tag lacks stay
    expected-null and never mark corruption."""
    import os

    from hadoop_fixedlengthinputformat_spark.sources import fixedlen

    fixedlen.register(spark)
    recs = (
        b"N00001alpha    " +  # good N
        b"N00x02beta     " +  # bad int in N's own field
        b"X00003gamma    " +  # unknown tag
        b"R99    delta    "[:15]  # good R (different field set)
    )
    path = os.path.join(str(tmp_path), "mt.bin")
    with open(path, "wb") as f:
        f.write(recs)
    df = (
        spark.read.format("fixedlen")
        .option("recordLength", "15")
        .option("layouts", "N=nk:1:5:int,nm:6:9:string;R=rk:1:2:int,rv:7:6:string")
        .option("typeStart", "0").option("typeLen", "1")
        .option("mode", "permissive")
        .option("corruptRecordColumn", "_bad")
        .option("includeOffset", "true")
        .load(path)
    )
    rows = sorted(df.collect(), key=lambda r: r.record_offset)
    assert rows[0].record_type == "N" and rows[0]._bad is None and rows[0].nk == 1
    assert rows[1].record_type == "N" and rows[1].nk is None
    assert bytes(rows[1]._bad) == b"N00x02beta     "
    assert rows[2].record_type == "X" and bytes(rows[2]._bad).startswith(b"X")
    # R row: nk/nm are union-nulls (expected) -> NOT corrupt
    assert rows[3].record_type == "R" and rows[3]._bad is None and rows[3].rk == 99
