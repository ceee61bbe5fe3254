"""maxBytesPerTrigger: streaming admission control for the fixedlen
source (Spark file-source analog).

Supported ONLY on the default (simple) stream reader: its read(start)
call receives the batch's start offset, so the cap is stateless and
exactly-once by construction.  The partitioned readers refuse the
option — the Python DataSourceStreamReader API gives latestOffset() no
start offset (unlike the JVM SupportsAdmissionControl API), and
emulating the cap with reader-instance state double-delivered batches
when the engine spread calls across runner instances (measured: a
120-record backlog produced 215 output rows)."""

from __future__ import annotations

import time

import pytest

REC = 10


def _mk_file(path, n, start=0):
    with open(path, "wb") as f:
        for i in range(start, start + n):
            f.write(f"{i:010d}".encode())


def _opts(extra=None):
    from hadoop_fixedlengthinputformat_spark.sources.fixedlen import _Options

    base = {"recordlength": str(REC), "layout": f"v:0:{REC}:long"}
    base.update(extra or {})
    return _Options.parse(base)


def test_simple_reader_read_caps(tmp_path):
    from hadoop_fixedlengthinputformat_spark.sources.fixedlen import (
        FixedLenStreamReader,
    )

    p = str(tmp_path / "f.fixed")
    _mk_file(p, 25)
    r = FixedLenStreamReader(_opts({"maxbytespertrigger": str(10 * REC)}), p)
    start = r.initialOffset()
    seen = 0
    for _ in range(4):
        rows, end = r.read(start)
        n = sum(1 for _ in rows)
        assert n <= 10
        seen += n
        start = end
    assert seen == 25 and start["pos"] == 250


def test_budget_floors_to_whole_records():
    opts = _opts({"maxbytespertrigger": "25"})  # 2.5 records
    assert opts.trigger_budget() == 20
    tiny = _opts({"maxbytespertrigger": "3"})  # less than one record
    assert tiny.trigger_budget() == REC


def test_rejected_on_partitioned_stream(spark, tmp_path):
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen

    fixedlen.register(spark)
    p = str(tmp_path / "f.fixed")
    _mk_file(p, 5)
    with pytest.raises(Exception, match="maxBytesPerTrigger"):
        q = (
            spark.readStream.format("fixedlen")
            .option("recordLength", str(REC))
            .option("layout", f"v:0:{REC}:long")
            .option("partitionedStream", "true")
            .option("maxBytesPerTrigger", "100")
            .load(p)
            .writeStream.format("memory")
            .queryName("mbt_reject")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def test_streaming_drains_backlog_under_cap(spark, tmp_path):
    """End-to-end on the default stream reader: a 120-record backlog with
    a 25-record cap drains over multiple micro-batches and delivers every
    record exactly once."""
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen

    fixedlen.register(spark)
    p = str(tmp_path / "grow.fixed")
    _mk_file(p, 120)
    q = (
        spark.readStream.format("fixedlen")
        .option("recordLength", str(REC))
        .option("layout", f"v:0:{REC}:long")
        .option("includeOffset", "false")
        .option("maxBytesPerTrigger", str(25 * REC))
        .load(p)
        .writeStream.format("memory")
        .queryName("mbt_drain")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) c from mbt_drain").collect()[0].c >= 120:
                break
            time.sleep(0.5)
        rows = sorted(r.v for r in spark.sql("select v from mbt_drain").collect())
        assert rows == list(range(120))
        # the backlog really was split: 120 rows / 25-record cap -> >= 5
        # non-empty batches
        nonempty = [
            pr for pr in q.recentProgress if pr["numInputRows"] > 0
        ]
        assert len(nonempty) >= 5, [
            (pr["batchId"], pr["numInputRows"]) for pr in q.recentProgress
        ]
    finally:
        q.stop()
