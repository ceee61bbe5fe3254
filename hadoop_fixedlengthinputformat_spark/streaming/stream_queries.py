"""H family — Structured Streaming operators (SURVEY.md §2.3-H).

The reference is batch MapReduce only (§2.2); these replay ``events`` as
a file stream (5 parquet chunks in ts order, maxFilesPerTrigger=1,
trigger availableNow) so watermarks actually advance between
micro-batches.  Checks are batch-equivalence: the final streaming state
must equal the batch SQL over the same rows — that's what the oracles
state where SQL-expressible; session windows / watermark drops are
rows-only.

Scale notes: these plans are the real Structured Streaming operators
(stateful agg with state store, watermark GC, session merge); at
production scale the same code runs against Kafka with executor-side
state stores — nothing here collects to the driver.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.sources import fixture_gen
from hadoop_fixedlengthinputformat_spark.tables import load_table

N_CHUNKS = 5


def _events_stream_dir(spark: SparkSession, sf_dir: str, with_late: bool) -> str:
    """Materialize events as N_CHUNKS parquet files in ts order (one file
    per micro-batch).  with_late appends a final chunk whose rows are
    clones shifted 30 minutes earlier (FIXTURES.md §D late-data fixture).
    """
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|late={with_late}|v4"
        f"|{fixture_gen.source_stamp(sf_dir)}".encode()
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"flif_stream_{tag}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    # distributed chunking (VERDICT r7 #3 — no full-table collect):
    # range-partition on (ts, event_id) into N_CHUNKS ordered slices,
    # checkpoint once, write each slice as its own micro-batch dir
    # sequentially (ascending mtimes keep FileStreamSource replay
    # order).  Every downstream streaming query is chunk-boundary
    # agnostic (final-state/complete-mode results over the full data);
    # the one boundary-sensitive fixture — the late chunk — is built
    # separately below.
    ev = (
        load_table(spark, sf_dir, "events")
        .repartitionByRange(N_CHUNKS, "ts", "event_id")
        .sortWithinPartitions("ts", "event_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    for i in range(N_CHUNKS):
        (
            ev.where(F.col("_pid") == i)
            .drop("_pid")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"chunk-{i}"))
        )
    if with_late:
        # replay the 20 OLDEST events (by ts): their shifted stamps sit
        # at the very bottom of the range, far below the late-event
        # filter watermark of ANY batch, so the watermark drops ALL of
        # them deterministically.  (v2 replayed the first 20 by
        # event_id — arbitrary ts; on some rolls the newest of those
        # survived because Spark's late filter LAGS one batch behind
        # eviction: in batch N it uses max(ts through batch N-2) -
        # delay, the two-watermark model — caught by the seed-20260813
        # parity roll, see plans/NOTES.md "Round-7 two-watermark".)
        late = (
            load_table(spark, sf_dir, "events")
            .orderBy("ts", "event_id")
            .limit(20)
            .withColumn("ts", F.col("ts") - F.expr("INTERVAL 30 MINUTES"))
            .withColumn("event_id", F.col("event_id") + 1_000_000)
        )
        late.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"chunk-{N_CHUNKS}")
        )
    open(done, "w").close()
    return out


def _read_stream(spark: SparkSession, data_dir: str) -> DataFrame:
    schema = (
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(data_dir)
    )


def _run_to_table(stream_df: DataFrame, mode: str) -> DataFrame:
    """Run with availableNow into a memory sink; return the final table."""
    spark = stream_df.sparkSession
    name = f"flif_mem_{uuid.uuid4().hex[:10]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"flif_ckpt_{uuid.uuid4().hex[:10]}")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # memory-sink rows live in the session, not the checkpoint —
        # remove it so repeated runs don't litter tempdir (ADVICE r9 #4)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def _drain_to_table(stream_df: DataFrame, mode: str) -> DataFrame:
    """Drain the FULL backlog through repeated micro-batches into a
    memory sink; return the final table.

    Needed by the tail family (round-9 sf1 soak find): their
    SimpleDataSourceStreamReader caps every micro-batch at
    READ_CHUNK_TARGET (16 MB — the ADVICE r3 rule that stops a large
    backlog from materializing as ONE driver-side list), but Spark runs
    availableNow on Python sources as a SINGLE-batch fallback, so at
    sf1 (10x file sizes) `_run_to_table` silently truncated the ingest
    to the first capped batch.  Default-trigger micro-batches +
    ``processAllAvailable()`` exercise the real multi-batch admission
    path and terminate once the (static) file is fully drained."""
    spark = stream_df.sparkSession
    name = f"flif_mem_{uuid.uuid4().hex[:10]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"flif_ckpt_{uuid.uuid4().hex[:10]}")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        q.awaitTermination()
    finally:
        # the drain variant commits one checkpoint entry per capped
        # micro-batch — even more litter than _run_to_table's; the
        # memory table survives removal (ADVICE r9 #4)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           count(*) AS cnt, round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _read_stream(spark, _events_stream_dir(spark, sf_dir, False))
    agg = src.groupBy(F.window("ts", "1 hour")).agg(
        F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value")
    )
    out = _run_to_table(agg, "complete")
    return out.select(
        F.col("window.start").alias("window_start"), "cnt", "sum_value"
    )


@query(
    "stream_sliding_window",
    oracle="""
    SELECT ws AS window_start, count(*) AS cnt, round(sum(value), 4) AS sum_value
    FROM (
        SELECT time_bucket(INTERVAL '15 minutes', ts)
               - k.k * INTERVAL '15 minutes' AS ws,
               value
        FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k
    ) expanded
    GROUP BY ws
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min; oracle expands each event into
    its 4 covering windows."""
    src = _read_stream(spark, _events_stream_dir(spark, sf_dir, False))
    agg = src.groupBy(F.window("ts", "1 hour", "15 minutes")).agg(
        F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value")
    )
    out = _run_to_table(agg, "complete")
    return out.select(
        F.col("window.start").alias("window_start"), "cnt", "sum_value"
    )


@query(
    "stream_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked
    )
    SELECT user_id, CAST(min(ts) AS DATE) AS session_day, count(*) AS cnt
    FROM sess GROUP BY user_id, sess_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user.  The oracle reproduces
    Spark's session merge with lag-based sessionization (new session when
    the gap to the previous event exceeds 30 min; session start = min ts)
    — verified to match exactly (4367 sessions at sf0.01)."""
    src = _read_stream(spark, _events_stream_dir(spark, sf_dir, False))
    agg = src.groupBy(
        F.session_window("ts", "30 minutes"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    out = _run_to_table(agg, "complete")
    return out.select(
        "user_id",
        F.col("session_window.start").cast("date").alias("session_day"),
        "cnt",
    )


@query(
    "stream_watermark_late_drop",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1
    HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR
           <= (SELECT max(ts) - INTERVAL 10 MINUTES FROM events)
    """,
)
def stream_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute watermark over tumbling hourly counts; the input's final
    chunk replays 20 events shifted 30 minutes earlier, which the
    watermark must drop (append mode emits only finalized windows).

    Exact oracle (upgraded from rows-only, r7): the replay clones the
    20 OLDEST events, whose shifted stamps sit at the bottom of the ts
    range — below the late-event filter watermark of EVERY batch (the
    filter lags eviction by one batch: in batch N it is max(ts through
    batch N-2) - delay, Spark's two-watermark model; see plans/NOTES.md
    "Round-7 two-watermark").  All replayed rows are therefore dropped
    deterministically, and the append-mode output is exactly the batch
    hourly counts for windows with end <= max(ts) - 10min (eviction
    uses the UPDATED watermark, finalizing on window.end <= watermark).
    Verified exact at sf0.001/sf0.01 and the variant-seed rolls.
    Boundary note: a window end landing EXACTLY on max(ts) - 10min
    relies on the <= eviction predicate; hour-aligned ends vs
    second-granular max(ts) make that alignment vanishingly rare."""
    src = _read_stream(spark, _events_stream_dir(spark, sf_dir, True))
    # watermarks require TIMESTAMP (LTZ); session tz is UTC so the cast is
    # value-preserving.
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = _run_to_table(agg, "append")
    return out.select(F.col("window.start").alias("window_start"), "cnt")


@query(
    "stream_dedup",
    oracle="SELECT event_id, user_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on event_id; the input replays chunk 0
    twice, so the deduped stream must equal the batch distinct."""
    data_dir = _events_stream_dir(spark, sf_dir, False)
    dup_dir = data_dir + "_dup"
    done = os.path.join(dup_dir, "_DONE")
    if not os.path.exists(done):
        import shutil

        os.makedirs(dup_dir, exist_ok=True)
        for i in range(N_CHUNKS):
            dst = os.path.join(dup_dir, f"chunk-{i}")
            if not os.path.exists(dst):
                shutil.copytree(os.path.join(data_dir, f"chunk-{i}"), dst)
        replay = os.path.join(dup_dir, "chunk-replay")
        if not os.path.exists(replay):
            shutil.copytree(os.path.join(data_dir, "chunk-0"), replay)
        open(done, "w").close()
    src = _read_stream(spark, dup_dir)
    dedup = src.select("event_id", "user_id", "event_type").dropDuplicates(
        ["event_id"]
    )
    return _run_to_table(dedup, "append")


@query(
    "stream_stateful_count",
    oracle="""
    SELECT user_id, count(*) AS cnt, round(sum(value), 4) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unwindowed stateful aggregation per user across all micro-batches;
    final state == batch GROUP BY."""
    src = _read_stream(spark, _events_stream_dir(spark, sf_dir, False))
    agg = src.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value")
    )
    return _run_to_table(agg, "complete")


@query(
    "stream_fixedlen_tail",
    oracle="""
    SELECT (ROW_NUMBER() OVER (ORDER BY n_nationkey) - 1) * 40 AS record_offset,
           n_nationkey, n_name
    FROM nation
    """,
)
def stream_fixedlen_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail a fixed-width file with the fixedlen SimpleDataSourceStreamReader
    (whole-record alignment carried into streaming)."""
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen, fixture_gen

    fixedlen.register(spark)
    path = fixture_gen.fixed_file_for(sf_dir, "nation")
    record_length, spec, _ = fixture_gen.LAYOUTS["nation"]
    src = (
        spark.readStream.format("fixedlen")
        .option("recordLength", str(record_length))
        .option("layout", spec)
        .load(path)
    )
    return _run_to_table(
        src.select("record_offset", "n_nationkey", "n_name"), "append"
    )


@query(
    "stream_custom_stateful",
    oracle="""
    SELECT user_id, count(*) AS cnt,
           round(sum(value), 4) AS sum_value,
           round(max(value), 4) AS max_value
    FROM events GROUP BY user_id
    """,
)
def stream_custom_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum, max) carried in an explicit GroupState across
    micro-batches — the escape hatch for stateful logic the built-in
    streaming aggregates can't express.

    Update mode emits one row per updated group per trigger; the final
    state per user is the emission with the highest (monotonic) count.
    State lives in the executor-side state store (RocksDB at production
    scale), keyed by user_id — nothing on the driver.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def running(key, pdfs, state: GroupState):
        (user_id,) = key
        cnt, sval, mval = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            cnt += len(pdf)
            sval += float(pdf["value"].sum())
            mval = max(mval, float(pdf["value"].max()))
        state.update((cnt, sval, mval))
        yield pd.DataFrame(
            {"user_id": [user_id], "cnt": [cnt],
             "sum_value": [sval], "max_value": [mval]}
        )

    src = _read_stream(spark, _events_stream_dir(spark, sf_dir, False))
    updates = src.groupBy("user_id").applyInPandasWithState(
        running,
        outputStructType="user_id bigint, cnt bigint, "
                         "sum_value double, max_value double",
        stateStructType="cnt bigint, sum_value double, max_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_table(updates, "update")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "cnt",
            F.round("sum_value", 4).alias("sum_value"),
            F.round("max_value", 4).alias("max_value"),
        )
    )


@query(
    "stream_static_join",
    oracle="""
    SELECT event_id, event_type, n_name AS region_name
    FROM events JOIN nation ON n_nationkey = user_id % 25
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    dimension (broadcast per micro-batch — the static side never enters
    the state store, so this is stateless and append-safe)."""
    src = _read_stream(spark, _events_stream_dir(spark, sf_dir, False))
    dim = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = src.join(
        F.broadcast(dim), dim.n_nationkey == src.user_id % 25
    ).select("event_id", "event_type", F.col("n_name").alias("region_name"))
    return _run_to_table(joined, "append")


@query(
    "stream_fixedlen_partitioned",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def stream_fixedlen_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executor-parallel fixedlen streaming (partitionedStream=true): each
    micro-batch's byte range is split into record-aligned partitions read
    on executors (DataSourceStreamReader), vs the driver-side Simple
    reader of stream_fixedlen_tail.  Content must equal the batch table."""
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen, fixture_gen

    fixedlen.register(spark)
    path = fixture_gen.fixed_file_for(sf_dir, "nation")
    record_length, spec, _ = fixture_gen.LAYOUTS["nation"]
    src = (
        spark.readStream.format("fixedlen")
        .option("recordLength", str(record_length))
        .option("layout", spec)
        .option("partitionedStream", "true")
        .option("includeOffset", "false")
        .load(path)
    )
    return _run_to_table(src, "append")


@query(
    "stream_stream_join",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 10 MINUTES
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks: views joined to the
    purchases that follow within 10 minutes for the same user.  Both
    sides carry watermarks so the join state is GC'd once the interval
    can no longer match — the unbounded-state hazard of stream-stream
    joins, bounded.  availableNow replay => final rows == the batch
    time-interval join."""
    data_dir = _events_stream_dir(spark, sf_dir, False)
    views = (
        _read_stream(spark, data_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").cast("timestamp").alias("v_ts"),
        )
        .withWatermark("v_ts", "30 minutes")
    )
    purchases = (
        _read_stream(spark, data_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = views.join(
        purchases,
        (views.user_id == purchases.p_user)
        & (purchases.p_ts >= views.v_ts)
        & (purchases.p_ts <= views.v_ts + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    )
    out = _run_to_table(joined, "append")
    return out.select("view_id", "purchase_id", "user_id")


@query(
    "stream_foreach_batch",
    oracle="""
    SELECT user_id, event_type, event_id FROM (
        SELECT user_id, event_type, event_id,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch upsert sink: each micro-batch keeps the first event
    per (user_id, event_type) key — first within the batch by (ts,
    event_id), anti-joined against keys already in the target table —
    and APPENDS the survivors to a parquet target (the merge-into shape
    used when the sink has no native upsert).  Because the replay
    chunks are globally ts-ordered, the final target must equal the
    batch first-event-per-key query, which is the oracle.  At scale the
    anti-join reads only the target's key columns (parquet column
    pruning) and foreachBatch gives exactly-once via the checkpoint's
    batch-id dedup contract."""
    from pyspark.sql import Window

    data_dir = _events_stream_dir(spark, sf_dir, with_late=False)
    target = os.path.join(
        tempfile.gettempdir(), f"flif_feb_{uuid.uuid4().hex[:10]}"
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("user_id", "event_type").orderBy(
            "ts", "event_id"
        )
        firsts = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "event_id")
        )
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            seen = batch_df.sparkSession.read.parquet(target).select(
                "user_id", "event_type"
            )
            firsts = firsts.join(seen, ["user_id", "event_type"], "left_anti")
        firsts.write.mode("append").parquet(target)

    ckpt = os.path.join(tempfile.gettempdir(), f"flif_ckpt_{uuid.uuid4().hex[:10]}")
    q = (
        _read_stream(spark, data_dir)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(target)


@query(
    "stream_fixedlen_sink",
    oracle="SELECT event_id, user_id, event_type FROM events",
)
def stream_fixedlen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming write through OUR fixed-width sink
    (``DataSourceStreamWriter``): the events replay stream lands as
    batch-id-keyed fixed-width files (replayed batches overwrite their
    own files — idempotent exactly-once), then the batch fixedlen reader
    ingests the directory back.  Completes the custom-source matrix:
    batch read/write + stream read/write."""
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen

    fixedlen.register(spark)
    data_dir = _events_stream_dir(spark, sf_dir, with_late=False)
    out = os.path.join(
        tempfile.gettempdir(), f"flif_ssink_{uuid.uuid4().hex[:10]}"
    )
    ckpt = os.path.join(tempfile.gettempdir(), f"flif_ckpt_{uuid.uuid4().hex[:10]}")
    layout = "event_id:0:12:long,user_id:12:10:long,event_type:22:10:string"
    q = (
        _read_stream(spark, data_dir)
        .select("event_id", "user_id", "event_type")
        .writeStream.format("fixedlen")
        .option("recordLength", "32")
        .option("layout", layout)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    q.awaitTermination()
    return (
        spark.read.format("fixedlen")
        .option("recordLength", "32")
        .option("layout", layout)
        .option("includeOffset", "false")
        .load(out)
    )


_EV_RDW_LAYOUT = "event_id:0:12:long,user_id:12:10:long"
_EV_RDW_PREFIX = 22


@query(
    "stream_varlen_sink",
    oracle="""
    SELECT event_id, user_id, COALESCE(event_type, '') AS event_type
    FROM events
    """,
)
def stream_varlen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming write through OUR RDW/variable-length sink
    (``DataSourceStreamWriter``): the events replay stream lands as
    batch-id-keyed RDW part files — a 22-byte fixed prefix plus the
    event_type as the genuinely variable tail — with replayed batches
    overwriting their own files (idempotent exactly-once), then the
    batch varlen reader ingests the directory back.  Closes the
    VERDICT r12 #5 asymmetry: the varlen tail READER existed
    (stream_varlen_tail) but stream output previously had to detour
    through the fixedlen sink.  NULL event_type coalesces to '' on
    both sides (round-4 writer rule: varlen tails encode NULL as
    empty)."""
    from hadoop_fixedlengthinputformat_spark.sources import varlen

    varlen.register(spark)
    data_dir = _events_stream_dir(spark, sf_dir, with_late=False)
    out = os.path.join(
        tempfile.gettempdir(), f"flif_vsink_{uuid.uuid4().hex[:10]}"
    )
    ckpt = os.path.join(
        tempfile.gettempdir(), f"flif_ckpt_{uuid.uuid4().hex[:10]}"
    )
    q = (
        _read_stream(spark, data_dir)
        .select(
            "event_id",
            "user_id",
            F.coalesce("event_type", F.lit("")).alias("event_type"),
        )
        .writeStream.format("varlen")
        .option("prefixLength", str(_EV_RDW_PREFIX))
        .option("layout", _EV_RDW_LAYOUT)
        .option("tailColumn", "event_type")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    q.awaitTermination()
    df = (
        spark.read.format("varlen")
        .option("prefixLength", str(_EV_RDW_PREFIX))
        .option("layout", _EV_RDW_LAYOUT)
        .option("tailColumn", "event_type")
        .option("includeOffset", "false")
        .load(out)
    )
    return df.select(
        "event_id",
        "user_id",
        F.col("event_type").cast("string").alias("event_type"),
    )


@query(
    "stream_awstape_sink",
    oracle="""
    SELECT event_id, user_id, COALESCE(event_type, '') AS event_type
    FROM events
    """,
)
def stream_awstape_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming write through OUR AWS-tape sink
    (``DataSourceStreamWriter``): each micro-batch partition lands as a
    complete batch-id-keyed RECFM=U tape image (data blocks chunked at
    256 bytes so records span chunks, tapemark + end-of-tape
    terminated), replayed batches overwriting their own images
    (idempotent exactly-once), then the batch tape reader reassembles
    the directory.  Completes the tape source matrix begun by
    stream_awstape_tail (VERDICT r12 #5)."""
    from hadoop_fixedlengthinputformat_spark.sources import awstape

    awstape.register(spark)
    data_dir = _events_stream_dir(spark, sf_dir, with_late=False)
    out = os.path.join(
        tempfile.gettempdir(), f"flif_tsink_{uuid.uuid4().hex[:10]}"
    )
    ckpt = os.path.join(
        tempfile.gettempdir(), f"flif_ckpt_{uuid.uuid4().hex[:10]}"
    )
    q = (
        _read_stream(spark, data_dir)
        .select(
            "event_id",
            "user_id",
            F.coalesce("event_type", F.lit("")).alias("event_type"),
        )
        .writeStream.format("awstape")
        .option("prefixLength", str(_EV_RDW_PREFIX))
        .option("layout", _EV_RDW_LAYOUT)
        .option("tailColumn", "event_type")
        .option("chunkSize", "256")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    q.awaitTermination()
    df = (
        spark.read.format("awstape")
        .option("prefixLength", str(_EV_RDW_PREFIX))
        .option("layout", _EV_RDW_LAYOUT)
        .option("tailColumn", "event_type")
        .option("includeOffset", "false")
        .load(out)
    )
    return df.select(
        "event_id",
        "user_id",
        F.col("event_type").cast("string").alias("event_type"),
    )


# NOTE: Spark 4's transformWithStateInPandas (the successor stateful API
# with typed ValueState/ListState handles and timers) was prototyped here
# but is NOT declarable in this environment: its driver-side schema
# worker requires google.protobuf, which is absent from the container
# (ImportError: cannot import name 'descriptor').  Re-checked rounds 2
# and 3 (2026-08-13): `import google.protobuf` still raises
# ModuleNotFoundError ("No module named 'google'") — blocker stands.  The
# applyInPandasWithState operator above (stream_custom_stateful) covers
# the custom-stateful surface; swap in transformWithStateInPandas where
# protobuf is available.


@query(
    "stream_approx_distinct",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS est_within_5pct
    FROM events GROUP BY 1
    """,
)
def stream_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming cardinality: per tumbling hour, distinct users via a
    mergeable Datasketches HLL built INSIDE the micro-batch engine
    (exact count-distinct is unsupported in streaming — the sketch IS
    the production answer, and its per-window state is a fixed-size
    blob the state store merges across batches).

    Graded with the r7 boolean-gate recipe: streaming estimates are
    engine-specific, so the output carries the batch-exact per-window
    distinct (oracle-checkable) plus a <=5% accuracy boolean computed
    by joining the streaming estimates back to the batch exacts
    (lgConfigK=12 ~ 0.8% rsd — wide headroom).  Window coverage is
    enforced by the FULL join: a window missing from either side
    surfaces as a row with NULL est/exact_users, which fails the
    null-intolerant est_within_5pct gate (and, for a streaming-only
    window, adds a row the oracle's window set cannot match)."""
    src = _read_stream(spark, _events_stream_dir(spark, sf_dir, False))
    agg = src.groupBy(F.window("ts", "1 hour")).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    stream_out = _run_to_table(agg, "complete").select(
        F.col("window.start").alias("window_start"), "est"
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    joined = stream_out.join(exact, "window_start", "full")
    return joined.select(
        "window_start",
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            F.col("est").isNotNull()
            & F.col("exact_users").isNotNull()
            & (
                F.abs(F.col("est").cast("double") - F.col("exact_users"))
                / F.col("exact_users")
                <= F.lit(0.05)
            )
        ).alias("est_within_5pct"),
    )
