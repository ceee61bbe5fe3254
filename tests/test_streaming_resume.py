"""Checkpoint-resume semantics: a restarted availableNow stream with the
same checkpoint must process ONLY files that arrived since the last run
(exactly-once across restarts — the contract production pipelines rely
on; stream_foreach_batch's oracle-checked run covers a single run)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def _write_chunk(spark, d, lo, hi):
    (
        spark.range(lo, hi)
        .select(F.col("id").alias("event_id"), (F.col("id") % 7).alias("user_id"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, f"chunk-{lo}-{hi}"))
    )


def test_stream_fixedlen_sink_restart_is_idempotent(spark, tmp_path):
    """Re-running the fixedlen streaming sink with the same checkpoint
    must not duplicate records: batch-id-keyed file names make a replay
    overwrite its own output, and a no-new-data restart adds nothing."""
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen

    fixedlen.register(spark)
    src = str(tmp_path / "src")
    _write_chunk(spark, src, 0, 120)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    layout = "event_id:0:12:long,user_id:12:10:long"

    def run():
        q = (
            spark.readStream.schema("event_id long, user_id long")
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.format("fixedlen")
            .option("recordLength", "22")
            .option("layout", layout)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(out)
        )
        q.awaitTermination()

    def read_back():
        return (
            spark.read.format("fixedlen")
            .option("recordLength", "22")
            .option("layout", layout)
            .option("includeOffset", "false")
            .load(out)
        )

    run()
    assert read_back().count() == 120
    run()  # restart, no new data
    assert read_back().count() == 120
    _write_chunk(spark, src, 120, 200)
    run()
    df = read_back()
    assert df.count() == 200
    assert df.select("event_id").distinct().count() == 200


def test_available_now_resumes_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "target")
    _write_chunk(spark, src, 0, 100)
    _write_chunk(spark, src, 100, 250)

    def run():
        batches = []

        def sink(batch_df, batch_id):
            batches.append(batch_df.count())
            batch_df.write.mode("append").parquet(target)

        q = (
            spark.readStream.schema("event_id long, user_id long")
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return batches

    first = run()
    assert sum(first) == 250
    # restart with NO new data: zero rows may flow, never a reprocess
    second = run()
    assert sum(second) == 0
    # new chunk arrives; restart processes ONLY it
    _write_chunk(spark, src, 250, 300)
    third = run()
    assert sum(third) == 50
    total = spark.read.parquet(target).count()
    assert total == 300  # no duplicates across the three runs
    assert spark.read.parquet(target).select("event_id").distinct().count() == 300


def test_directory_stream_picks_up_new_files_and_appends(spark, tmp_path):
    """Directory streaming (partitionedStream over a dir): run 1 ingests
    the initial files; run 2 with the same checkpoint processes ONLY the
    delta — a brand-new file, bytes appended to a known file, and a
    newly-dropped immutable .gz member."""
    import gzip

    from hadoop_fixedlengthinputformat_spark.sources import fixedlen

    fixedlen.register(spark)
    src = str(tmp_path / "dsrc")
    os.makedirs(src)
    rec = lambda i: f"{i:08d}".encode()  # noqa: E731

    with open(os.path.join(src, "a.fixed"), "wb") as f:
        f.write(b"".join(rec(i) for i in range(10)))
    with open(os.path.join(src, "b.fixed"), "wb") as f:
        f.write(b"".join(rec(i) for i in range(100, 105)))

    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")

    def run():
        q = (
            spark.readStream.format("fixedlen")
            .option("recordLength", "8")
            .option("layout", "v:0:8:int")
            .option("partitionedStream", "true")
            .option("includeOffset", "false")
            .load(src)
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    got1 = sorted(r.v for r in spark.read.parquet(out).collect())
    assert got1 == list(range(10)) + list(range(100, 105))

    # delta: append to a known file, add a new file, drop a gzip member
    with open(os.path.join(src, "a.fixed"), "ab") as f:
        f.write(b"".join(rec(i) for i in range(10, 13)))
    with open(os.path.join(src, "c.fixed"), "wb") as f:
        f.write(b"".join(rec(i) for i in range(200, 203)))
    with gzip.open(os.path.join(src, "d.fixed.gz"), "wb") as f:
        f.write(b"".join(rec(i) for i in range(300, 302)))

    run()
    got2 = sorted(r.v for r in spark.read.parquet(out).collect())
    assert got2 == sorted(
        list(range(13)) + list(range(100, 105))
        + list(range(200, 203)) + list(range(300, 302))
    )
