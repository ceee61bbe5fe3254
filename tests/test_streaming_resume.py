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


def _write_event_chunk(spark, d, lo, hi):
    """Events with interleaved view/purchase types and close timestamps
    so the 10-minute interval join has matches inside every chunk."""
    (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 5).alias("user_id"),
            F.when(F.col("id") % 2 == 0, "view").otherwise("purchase").alias(
                "event_type"
            ),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=(F.col("id") * 60).cast("double"))
            ).alias("ts"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, f"chunk-{lo}-{hi}"))
    )


def test_stream_stream_join_restart_is_idempotent(spark, tmp_path):
    """The watermarked interval join replayed across restarts: a restart
    with no new data adds no rows, and after a second chunk + restart
    the appended result equals the batch time-interval join of ALL data
    (exactly-once across the two runs — VERDICT r3 order #8)."""
    src = str(tmp_path / "ev_src")
    out_dir = str(tmp_path / "ssj_out")
    ckpt = str(tmp_path / "ssj_ckpt")
    _write_event_chunk(spark, src, 0, 60)

    def run():
        views = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts timestamp"
            )
            .option("recursiveFileLookup", "true")
            .parquet(src)
            .filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                "user_id",
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "30 minutes")
        )
        purchases = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts timestamp"
            )
            .option("recursiveFileLookup", "true")
            .parquet(src)
            .filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "30 minutes")
        )
        joined = views.join(
            purchases,
            (views.user_id == purchases.p_user)
            & (purchases.p_ts >= views.v_ts)
            & (purchases.p_ts <= views.v_ts + F.expr("INTERVAL 10 MINUTES")),
            "inner",
        ).select("view_id", "purchase_id", "user_id")
        q = (
            joined.writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(out_dir)
        )
        q.awaitTermination()

    def batch_expected():
        ev = spark.read.option("recursiveFileLookup", "true").parquet(src)
        v = ev.filter("event_type = 'view'").selectExpr(
            "event_id AS view_id", "user_id", "ts AS v_ts"
        )
        p = ev.filter("event_type = 'purchase'").selectExpr(
            "event_id AS purchase_id", "user_id AS p_user", "ts AS p_ts"
        )
        return (
            v.join(
                p,
                (v.user_id == p.p_user)
                & (p.p_ts >= v.v_ts)
                & (p.p_ts <= v.v_ts + F.expr("INTERVAL 10 MINUTES")),
            )
            .select("view_id", "purchase_id", "user_id")
        )

    def read_out():
        return spark.read.parquet(out_dir)

    run()
    n1 = read_out().count()
    assert n1 > 0
    run()  # restart, no new data: nothing replays
    assert read_out().count() == n1
    _write_event_chunk(spark, src, 60, 100)
    run()  # restart: processes ONLY the new chunk
    got = {tuple(r) for r in read_out().collect()}
    want = {tuple(r) for r in batch_expected().collect()}
    assert len(got) == read_out().count()  # no duplicate emits
    # note: rows whose match straddles the restart boundary are joined
    # because BOTH sides re-read the full directory listing state from
    # the checkpoint; the final multiset must equal the batch join
    assert got == want


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


def test_directory_stream_crash_midbatch_under_concurrent_growth(spark, tmp_path):
    """Chaos restart (VERDICT r8 #9): kill the partitionedStream
    directory query MID-BATCH — after the sink wrote batch 0 but
    before the checkpoint commit — then grow the directory (append to
    a known file + drop a new file) while the query is down.  The
    first restart must replay batch 0 with the SAME offset range the
    offsets WAL pinned — NOT the grown files (so an idempotent
    per-batch-id overwrite sink yields no duplicates, and uncommitted
    work is never silently widened); Python streaming sources run
    availableNow as single-batch execution, so the growth is the NEXT
    run's batch 1.  Exactly-once end to end across crash + 2 restarts."""
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen

    fixedlen.register(spark)
    src = str(tmp_path / "csrc")
    os.makedirs(src)
    rec = lambda i: f"{i:08d}".encode()  # noqa: E731
    with open(os.path.join(src, "a.fixed"), "wb") as f:
        f.write(b"".join(rec(i) for i in range(10)))
    with open(os.path.join(src, "b.fixed"), "wb") as f:
        f.write(b"".join(rec(i) for i in range(100, 105)))

    out = str(tmp_path / "cout")
    ckpt = str(tmp_path / "cckpt")
    crashes = []

    def run(poison: bool):
        def sink(batch_df, batch_id):
            # idempotent sink: batch-id-keyed overwrite, the pattern
            # the engine's own fixedlen sink uses for replay safety
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out, f"batch={batch_id}")
            )
            if poison and not crashes:
                crashes.append(batch_id)
                raise RuntimeError("injected mid-batch crash")

        q = (
            spark.readStream.format("fixedlen")
            .option("recordLength", "8")
            .option("layout", "v:0:8:int")
            .option("partitionedStream", "true")
            .option("includeOffset", "false")
            .load(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            assert not poison, "poisoned run should have crashed"
        except Exception:
            assert poison, "clean run crashed"

    run(poison=True)
    assert crashes == [0]
    # the query is down with batch 0 sunk but uncommitted; the
    # directory grows concurrently
    with open(os.path.join(src, "a.fixed"), "ab") as f:
        f.write(b"".join(rec(i) for i in range(10, 13)))
    with open(os.path.join(src, "c.fixed"), "wb") as f:
        f.write(b"".join(rec(i) for i in range(200, 203)))

    run(poison=False)
    # replay is pinned to the WAL offsets: EXACTLY the pre-crash 15
    # records, none of the growth leaks into the replayed batch
    vals1 = sorted(r.v for r in spark.read.parquet(out).select("v").collect())
    assert vals1 == sorted(list(range(10)) + list(range(100, 105)))

    run(poison=False)  # next trigger: the growth arrives as batch 1
    vals2 = sorted(r.v for r in spark.read.parquet(out).select("v").collect())
    want = sorted(
        list(range(13)) + list(range(100, 105)) + list(range(200, 203))
    )
    assert vals2 == want  # every record exactly once, growth included


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


def test_varlen_tail_drains_backlog_larger_than_batch_cap(spark, tmp_path):
    """Round-9 sf1 soak regression: the tail readers cap each
    micro-batch at READ_CHUNK_TARGET (16 MB), and Spark runs
    availableNow on Python sources as a SINGLE-batch fallback — so a
    backlog bigger than one cap silently truncated (sf1 ingested
    48,571 of 500,000 records).  Pin the fix: a >16 MB RDW file must
    ingest COMPLETELY through the multi-batch drain
    (processAllAvailable), i.e. strictly more than one capped batch."""
    import struct

    from hadoop_fixedlengthinputformat_spark.sources import varlen
    from hadoop_fixedlengthinputformat_spark.sources.fixture_gen import (
        RDW_PREFIX_LAYOUT,
        RDW_PREFIX_LEN,
    )
    from hadoop_fixedlengthinputformat_spark.streaming.stream_queries import (
        _drain_to_table,
    )

    varlen.register(spark)
    path = str(tmp_path / "big.rdw")
    n, tail_len = 40_000, 500  # ~21 MB total: > one 16 MB batch cap
    with open(path, "wb") as f:
        chunks = []
        for i in range(n):
            prefix = (
                f"{i:08d}" + "en" + "src000" + f"{tail_len:06d}"
            ).encode()
            assert len(prefix) == RDW_PREFIX_LEN
            tail = bytes([65 + i % 26]) * tail_len
            rec = struct.pack(
                ">HH", 4 + RDW_PREFIX_LEN + len(tail), 0
            ) + prefix + tail
            chunks.append(rec)
        f.write(b"".join(chunks))

    src = (
        spark.readStream.format("varlen")
        .option("prefixLength", str(RDW_PREFIX_LEN))
        .option("layout", RDW_PREFIX_LAYOUT)
        .option("includeOffset", "false")
        .load(path)
    )
    out = _drain_to_table(src.select("doc_id"), "append")
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
