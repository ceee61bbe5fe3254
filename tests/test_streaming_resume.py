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
