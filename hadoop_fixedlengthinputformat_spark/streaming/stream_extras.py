"""Round-2 streaming additions registered after the grading window."""

from __future__ import annotations

import gzip
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.sources import fixedlen, fixture_gen
from hadoop_fixedlengthinputformat_spark.streaming.stream_queries import (
    _drain_to_table,
    _run_to_table,
)
from hadoop_fixedlengthinputformat_spark.tables import configure

_NATION_SQL = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


@query("stream_fixedlen_directory", oracle=_NATION_SQL)
def stream_fixedlen_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory ingest streaming: a landing directory of fixed-width
    part files (plain AND immutable gzip members) streamed with
    file-source semantics — each micro-batch picks up new files and
    record-aligned appends to known files, split into executor-side
    range partitions.  availableNow replay of the whole landing dir
    must equal the batch table."""
    configure(spark)
    fixedlen.register(spark)
    record_length, spec, _ = fixture_gen.LAYOUTS["nation"]
    whole = fixture_gen.fixed_file_for(sf_dir, "nation")
    payload = open(whole, "rb").read()
    cut = (len(payload) // record_length // 2) * record_length
    d = os.path.join(
        tempfile.gettempdir(),
        f"flif_stream_dir_{os.path.basename(os.path.abspath(sf_dir))}"
        f"_{fixture_gen.source_stamp(sf_dir)}",
    )
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-0.fixed"), "wb") as f:
            f.write(payload[:cut])
        with gzip.GzipFile(
            filename="", mode="wb",
            fileobj=open(os.path.join(d, "part-1.fixed.gz"), "wb"), mtime=0,
        ) as f:
            f.write(payload[cut:])
    src = (
        spark.readStream.format("fixedlen")
        .option("recordLength", str(record_length))
        .option("layout", spec)
        .option("partitionedStream", "true")
        .option("includeOffset", "false")
        .load(d)
    )
    return _run_to_table(src, "append")


@query(
    "stream_varlen_tail",
    oracle="""
    SELECT doc_id, COALESCE(lang, '') AS lang,
           COALESCE(n_chars, 0) AS n_chars,
           CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT)
               AS tail_bytes
    FROM documents
    """,
)
def stream_varlen_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail a growing RDW (RECFM=V) file: only WHOLE records are
    admitted per micro-batch — a half-written RDW/payload at EOF stays
    unread until complete (the fixed-length whole-record alignment
    invariant carried to variable strides; offsets are always record
    starts, so restart replays are exact)."""
    from hadoop_fixedlengthinputformat_spark.sources import varlen

    configure(spark)
    varlen.register(spark)
    path = fixture_gen.rdw_file_for(sf_dir)
    import pyspark.sql.functions as F

    src = (
        spark.readStream.format("varlen")
        .option("prefixLength", str(fixture_gen.RDW_PREFIX_LEN))
        .option("layout", fixture_gen.RDW_PREFIX_LAYOUT)
        .option("includeOffset", "false")
        .load(path)
    )
    out = src.select(
        "doc_id", "lang", "n_chars",
        F.length("record_tail").cast("long").alias("tail_bytes"),
    )
    return _drain_to_table(out, "append")


@query(
    "stream_vbs_tail",
    oracle="""
    SELECT doc_id, COALESCE(lang, '') AS lang,
           COALESCE(n_chars, 0) AS n_chars,
           CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT)
               AS tail_bytes
    FROM documents
    """,
)
def stream_vbs_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail a growing RECFM=VBS (spanned + blocked) file: only WHOLE
    logical records are admitted per micro-batch, which for VBS means
    the admission boundary is an assembler-idle block start — a record
    whose last segment hasn't landed yet keeps its ENTIRE segment
    chain unread (mid-block completions are held until a safe
    boundary), so restart replay re-assembles identical records.  The
    strictest member of the tail family: stream_fixedlen_tail aligns
    on a constant stride, stream_varlen_tail on one record's RDW, this
    on a cross-block segment chain."""
    from hadoop_fixedlengthinputformat_spark.sources import varlen

    configure(spark)
    varlen.register(spark)
    path = fixture_gen.vbs_file_for(sf_dir)
    import pyspark.sql.functions as F

    src = (
        spark.readStream.format("varlen")
        .option("prefixLength", str(fixture_gen.RDW_PREFIX_LEN))
        .option("layout", fixture_gen.RDW_PREFIX_LAYOUT)
        .option("recfm", "vbs")
        .option("includeOffset", "false")
        .load(path)
    )
    out = src.select(
        "doc_id", "lang", "n_chars",
        F.length("record_tail").cast("long").alias("tail_bytes"),
    )
    return _drain_to_table(out, "append")


@query(
    "stream_awstape_tail",
    oracle="""
    SELECT doc_id, COALESCE(lang, '') AS lang,
           COALESCE(n_chars, 0) AS n_chars,
           CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT)
               AS tail_bytes
    FROM documents
    """,
)
def stream_awstape_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail a growing AWS tape image (RECFM=U): only WHOLE blocks are
    admitted per micro-batch — a half-written chunk chain at EOF keeps
    its entire chain unread until the ENDREC chunk lands, and the
    stream offset carries the full walk state (position + backspace-
    chain value), so restart replays re-validate the exact chain they
    first walked.  Completes the tail family across every container:
    fixed stride -> RDW record -> VBS segment chain -> chunked tape
    block."""
    from hadoop_fixedlengthinputformat_spark.sources import awstape

    configure(spark)
    awstape.register(spark)
    path = fixture_gen.aws_u_file_for(sf_dir)
    import pyspark.sql.functions as F

    src = (
        spark.readStream.format("awstape")
        .option("prefixLength", str(fixture_gen.RDW_PREFIX_LEN))
        .option("layout", fixture_gen.RDW_PREFIX_LAYOUT)
        .option("includeOffset", "false")
        .load(path)
    )
    out = src.select(
        "doc_id", "lang", "n_chars",
        F.length("record_tail").cast("long").alias("tail_bytes"),
    )
    return _drain_to_table(out, "append")


@query(
    "stream_varlen_directory",
    oracle="""
    SELECT doc_id, COALESCE(lang, '') AS lang,
           COALESCE(n_chars, 0) AS n_chars,
           CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT)
               AS tail_bytes
    FROM documents
    """,
)
def stream_varlen_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory ingest streaming for the varlen source (round 13,
    completing the directory matrix begun by stream_fixedlen_directory):
    a landing directory of IMMUTABLE RDW parts — the atomic-rename
    contract our batch and streaming sinks follow — streamed with
    file-source semantics; each micro-batch admits newly appeared
    parts, split record-aligned via their index sidecars and decoded
    on executors (a grown member fails loudly: byte sizes cannot name
    varlen record boundaries, so append tailing stays with the
    single-file readers).  availableNow replay of the landing dir must
    equal the batch table."""
    import pyspark.sql.functions as F

    from hadoop_fixedlengthinputformat_spark.sources import varlen
    from hadoop_fixedlengthinputformat_spark.tables import load_table

    configure(spark)
    varlen.register(spark)
    d = os.path.join(
        tempfile.gettempdir(),
        f"flif_vstream_dir_{os.path.basename(os.path.abspath(sf_dir))}"
        f"_{fixture_gen.source_stamp(sf_dir)}",
    )
    if not os.path.isdir(os.path.join(d, "_DONE")):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.coalesce("lang", F.lit("")).alias("lang"),
            F.coalesce("source", F.lit("")).alias("source"),
            F.coalesce(F.col("n_chars"), F.lit(0)).alias("n_chars"),
            F.coalesce("text", F.lit("")).alias("text"),
        )
        (
            docs.repartition(3)
            .write.format("varlen")
            .option("prefixLength", str(fixture_gen.RDW_PREFIX_LEN))
            .option("layout", fixture_gen.RDW_PREFIX_LAYOUT)
            .option("tailColumn", "text")
            .option("indexEvery", "64")
            .mode("overwrite")
            .save(d)
        )
        os.makedirs(os.path.join(d, "_DONE"), exist_ok=True)
    src = (
        spark.readStream.format("varlen")
        .option("prefixLength", str(fixture_gen.RDW_PREFIX_LEN))
        .option("layout", fixture_gen.RDW_PREFIX_LAYOUT)
        .option("includeOffset", "false")
        .load(d)
    )
    out = _run_to_table(src, "append")
    return out.select(
        "doc_id",
        "lang",
        "n_chars",
        F.length("record_tail").cast("long").alias("tail_bytes"),
    )
