"""A-family extras — AWS virtual-tape scans/sinks (RECFM=U / FB).

The reference reads RECFM=F data already deblocked into flat files
(FixedLengthInputFormat.java:38-43); these queries exercise the
``awstape`` source (sources/awstape.py) on mainframe data that is still
in its tape container: RECFM=U records (block = record, no descriptor
words — the one RECFM whose record boundaries a flat dump cannot carry)
and FB blocks deblocked on read.

``record_offset`` stays SQL-predictable in both modes: U fixture
records are written in the rdw total order, each occupying
``len + 6 * ceil(len / chunk)`` image bytes (data + one 6-byte chunk
header per ``chunk``-byte slice), so the offset is a running sum the
oracle replays — one misread chunk header anywhere shifts every later
offset and fails the hash.  FB offsets are deblocked-stream positions,
``rank * recordLength`` exactly like the flat fixedlen scan.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.sources import awstape, fixture_gen
from hadoop_fixedlengthinputformat_spark.tables import configure, load_table


def read_tape(
    spark: SparkSession, path: str, **extra: str
) -> DataFrame:
    configure(spark)
    awstape.register(spark)
    reader = spark.read.format("awstape")
    for k, v in extra.items():
        reader = reader.option(k, v)
    return reader.load(path)


@query(
    "scan_awstape",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, COALESCE(lang, '') AS lang,
               COALESCE(source, '') AS source,
               COALESCE(n_chars, 0) AS n_chars,
               md5(COALESCE(text, '')) AS tie,
               {fixture_gen.RDW_PREFIX_LEN}
                   + octet_length(encode(COALESCE(text, ''))) AS len
        FROM documents
    )
    SELECT CAST(COALESCE(SUM(len + 6 * ((len + {fixture_gen.AWS_CHUNK - 1})
                                        // {fixture_gen.AWS_CHUNK}))
                    OVER (ORDER BY doc_id, tie, lang, source
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS BIGINT) AS record_offset,
           doc_id, lang, source, n_chars,
           CAST(len - {fixture_gen.RDW_PREFIX_LEN} AS BIGINT) AS tail_bytes
    FROM sized
    """,
)
def scan_awstape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECFM=U tape image -> typed prefix + variable tail: each tape
    block is one logical record, reassembled from its NEWREC..ENDREC
    chunk chain (the 512-byte fixture chunk makes most document texts
    span several chunks).  The oracle replays the whole chunk-header
    byte arithmetic to predict every record_offset."""
    path = fixture_gen.aws_u_file_for(sf_dir)
    df = read_tape(
        spark, path,
        prefixLength=str(fixture_gen.RDW_PREFIX_LEN),
        layout=fixture_gen.RDW_PREFIX_LAYOUT,
    )
    return df.select(
        "record_offset",
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.length("record_tail").cast("long").alias("tail_bytes"),
    )


@query(
    "scan_awstape_fb",
    oracle="""
    SELECT (ROW_NUMBER() OVER (ORDER BY n_nationkey) - 1) * 40
               AS record_offset,
           n_nationkey, n_name, n_regionkey
    FROM nation
    """,
)
def scan_awstape_fb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECFM=FB tape image -> deblocked fixed records: 40-byte nation
    records packed 5 per tape block (last block short), every block
    length validated as a recordLength multiple (the reference's
    non-multiple planning error carried to tape), offsets assigned in
    the DEBLOCKED stream — rank * recordLength, exactly what the
    reference computes after deblocking."""
    path = fixture_gen.aws_fb_file_for(sf_dir)
    rl, spec, _ = fixture_gen.LAYOUTS["nation"]
    df = read_tape(
        spark, path, recfm="fb", recordLength=str(rl), layout=spec
    )
    return df.select("record_offset", "n_nationkey", "n_name", "n_regionkey")


@query(
    "sink_awstape",
    oracle="""
    SELECT doc_id, COALESCE(lang, '') AS lang,
           COALESCE(n_chars, 0) AS n_chars, COALESCE(text, '') AS text
    FROM documents
    """,
)
def sink_awstape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round trip through OUR tape sink: parquet -> RECFM=U AWS images
    (one per partition, 256-byte chunks so records span, tapemark +
    end-of-tape terminated) -> tape read reassembling every record."""
    configure(spark)
    awstape.register(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce("lang", F.lit("")).alias("lang"),
        F.coalesce("source", F.lit("")).alias("source"),
        F.coalesce(F.col("n_chars"), F.lit(0)).alias("n_chars"),
        F.coalesce("text", F.lit("")).alias("text"),
    )
    out = os.path.join(tempfile.gettempdir(), "flif_sink_awstape")
    (
        docs.write.format("awstape")
        .option("prefixLength", str(fixture_gen.RDW_PREFIX_LEN))
        .option("layout", fixture_gen.RDW_PREFIX_LAYOUT)
        .option("tailColumn", "text")
        .option("chunkSize", "256")
        .mode("overwrite")
        .save(out)
    )
    df = read_tape(
        spark, out,
        prefixLength=str(fixture_gen.RDW_PREFIX_LEN),
        layout=fixture_gen.RDW_PREFIX_LAYOUT,
        tailColumn="text", includeOffset="false",
    )
    return df.select(
        "doc_id", "lang", "n_chars", F.col("text").cast("string").alias("text")
    )


@query(
    "sink_awstape_labeled",
    oracle="""
    SELECT doc_id, COALESCE(lang, '') AS lang,
           COALESCE(n_chars, 0) AS n_chars, COALESCE(text, '') AS text
    FROM documents
    """,
)
def sink_awstape_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IBM standard-label (SL) round trip: documents -> labeled AWS
    volumes (EBCDIC cp037 VOL1+HDR1+HDR2 header group, data file,
    EOF1+EOF2 trailer whose block count the reader re-verifies) ->
    labeled read that must match the HDR1 dataset name and the HDR2
    recfm before a single data block flows — the mount-the-wrong-tape
    class of operational error caught at the source, not downstream."""
    configure(spark)
    awstape.register(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce("lang", F.lit("")).alias("lang"),
        F.coalesce("source", F.lit("")).alias("source"),
        F.coalesce(F.col("n_chars"), F.lit(0)).alias("n_chars"),
        F.coalesce("text", F.lit("")).alias("text"),
    )
    out = os.path.join(tempfile.gettempdir(), "flif_sink_awstape_sl")
    (
        docs.write.format("awstape")
        .option("prefixLength", str(fixture_gen.RDW_PREFIX_LEN))
        .option("layout", fixture_gen.RDW_PREFIX_LAYOUT)
        .option("tailColumn", "text")
        .option("chunkSize", "512")
        .option("labels", "sl")
        .option("dataset", "DOCS.CORPUS")
        .option("volser", "DOC001")
        .mode("overwrite")
        .save(out)
    )
    df = read_tape(
        spark, out,
        prefixLength=str(fixture_gen.RDW_PREFIX_LEN),
        layout=fixture_gen.RDW_PREFIX_LAYOUT,
        tailColumn="text", includeOffset="false",
        labels="sl", dataset="DOCS.CORPUS",
    )
    return df.select(
        "doc_id", "lang", "n_chars", F.col("text").cast("string").alias("text")
    )


@query(
    "sql_awstape_view",
    oracle="""
    SELECT COALESCE(lang, '') AS lang, COUNT(*) AS n_docs,
           CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS sum_chars
    FROM documents GROUP BY COALESCE(lang, '')
    """,
)
def sql_awstape_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL surface for the tape source: ``CREATE TEMPORARY VIEW
    ... USING awstape OPTIONS (...)`` registers a RECFM=U image as a
    queryable relation — the third member of the SQL on-ramp family
    (fixedlen, varlen, awstape), so a SQL-only consumer never touches
    the DataFrame API."""
    configure(spark)
    awstape.register(spark)
    path = fixture_gen.aws_u_file_for(sf_dir)
    spark.sql(f"""
        CREATE OR REPLACE TEMPORARY VIEW docs_aws_sql
        USING awstape
        OPTIONS (
            path '{path}',
            prefixLength '{fixture_gen.RDW_PREFIX_LEN}',
            layout '{fixture_gen.RDW_PREFIX_LAYOUT}',
            includeOffset 'false', includeTail 'false'
        )
    """)
    return spark.sql("""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM docs_aws_sql GROUP BY lang
    """)


@query(
    "pipeline_tape_to_corpus",
    oracle="""
    WITH tape AS (
        SELECT doc_id, COALESCE(lang, '') AS lang,
               COALESCE(text, '') AS text
        FROM documents
    ),
    dedup AS (
        SELECT md5(text) AS h, min(doc_id) AS rep_id,
               arbitrary(lang ORDER BY doc_id, lang) AS lang,
               arbitrary(length(text) ORDER BY doc_id, lang) AS n_chars
        FROM tape GROUP BY md5(text)
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(rep_id) AS BIGINT) AS first_doc
    FROM dedup WHERE n_chars >= 50
    GROUP BY lang
    """,
)
def pipeline_tape_to_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole mainframe-to-training-corpus story in ONE plan: read
    raw documents out of an AWS tape image (chunk chains -> blocks ->
    typed prefix + text tail), exact-dedup on content digest (keep the
    lowest doc id per digest — deterministic under duplicate-id rolls),
    drop short documents (the first Gopher gate), and report the
    per-language corpus the curation steps downstream would consume.
    Scale shape: the dedup groupBy keys on md5(text) with the
    representative chosen map-side (min), text length computed BEFORE
    the exchange — the shuffle carries (digest, id, lang, len), never
    text; then a lang-keyed agg.  Exactly the plan a 100 TB tape
    unload pipeline would run."""
    path = fixture_gen.aws_u_file_for(sf_dir)
    df = read_tape(
        spark, path,
        prefixLength=str(fixture_gen.RDW_PREFIX_LEN),
        layout=fixture_gen.RDW_PREFIX_LAYOUT,
        includeOffset="false",
    )
    docs = df.select(
        "doc_id",
        "lang",
        F.col("record_tail").cast("string").alias("text"),
    )
    dedup = (
        docs.select(
            F.md5(F.col("text").cast("binary")).alias("h"),
            "doc_id",
            "lang",
            F.length("text").alias("n_chars"),
        )
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("rep_id"),
            F.min_by("lang", F.struct("doc_id", "lang")).alias("lang"),
            F.min_by("n_chars", F.struct("doc_id", "lang")).alias("n_chars"),
        )
    )
    return (
        dedup.where(F.col("n_chars") >= 50)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("rep_id").alias("first_doc"),
        )
    )
