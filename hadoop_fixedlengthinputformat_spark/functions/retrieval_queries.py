"""Retrieval scoring over ``documents`` — BM25 (SURVEY.md §2.3-J).

The LLM-pipeline family covers dedup/ANN/quality; this module adds the
lexical-retrieval scoring a data pipeline uses for query-based corpus
filtering and hard-negative mining.  Everything is built-in string /
math expressions (no UDFs): term frequency via length-difference
counting, document length normalization, and the classic BM25 idf.

Hash-exactness: ln() is the one operation whose last ulp can differ
between the JVM and DuckDB's libm, so the idf is snapped to 8 decimals
with the floor(x*1e8+0.5)/1e8 trick before it enters the score; all
remaining arithmetic is identical IEEE ops on identical operands.  The
final score is snapped to 4 decimals the same way.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table

_TERMS = ("spark", "join")
_K1 = 1.2
_B = 0.75


def _tf(term: str):
    # occurrences of term in text, counted via length difference —
    # stays in whole-stage codegen, no tokenizer UDF
    return (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(term)))
    ) / len(term)


def _snap(col, scale: int):
    return F.floor(col * scale + 0.5) / scale


@query(
    "llm_bm25",
    oracle=f"""
    WITH stats AS (
        SELECT count(*) AS n_docs, avg(length(text)) AS avgdl,
               sum(CASE WHEN text LIKE '%{_TERMS[0]}%' THEN 1 ELSE 0 END) AS df0,
               sum(CASE WHEN text LIKE '%{_TERMS[1]}%' THEN 1 ELSE 0 END) AS df1
        FROM documents
    ),
    scored AS (
        SELECT doc_id,
               (length(text) - length(replace(text, '{_TERMS[0]}', '')))
                   / {len(_TERMS[0])} AS tf0,
               (length(text) - length(replace(text, '{_TERMS[1]}', '')))
                   / {len(_TERMS[1])} AS tf1,
               length(text) AS dl,
               floor(ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0) * 100000000 + 0.5)
                   / 100000000 AS idf0,
               floor(ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0) * 100000000 + 0.5)
                   / 100000000 AS idf1,
               avgdl
        FROM documents, stats
    )
    SELECT doc_id,
           floor((idf0 * ((tf0 * ({_K1} + 1))
                      / (tf0 + {_K1} * (1 - {_B} + {_B} * dl / avgdl)))
                + idf1 * ((tf1 * ({_K1} + 1))
                      / (tf1 + {_K1} * (1 - {_B} + {_B} * dl / avgdl))))
                 * 10000 + 0.5) / 10000 AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def llm_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 for the query {'spark', 'join'}.

    Scale shape: corpus stats (N, avgdl, per-term df) are ONE global agg
    broadcast back as a scalar row; scoring is a stateless row expression
    over the scan (zero shuffles for the score itself); the top-20 is
    TakeOrderedAndProject — per-partition heaps, never a global sort.
    At 100 TB with a real vocabulary the df table becomes a broadcast
    join keyed by term instead of inline columns — same two-step shape."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.length("text")).alias("avgdl"),
        *[
            F.sum(
                F.when(F.col("text").like(f"%{t}%"), 1).otherwise(0)
            ).alias(f"df{i}")
            for i, t in enumerate(_TERMS)
        ],
    )
    scored = d.join(F.broadcast(stats))
    parts = []
    for i, t in enumerate(_TERMS):
        tf = _tf(t)
        idf = _snap(
            F.log(
                (F.col("n_docs") - F.col(f"df{i}") + 0.5)
                / (F.col(f"df{i}") + 0.5)
                + 1.0
            ),
            100000000,
        )
        norm = (tf * (_K1 + 1)) / (
            tf + _K1 * (1 - _B + _B * F.length("text") / F.col("avgdl"))
        )
        parts.append(idf * norm)
    return (
        scored.select(
            "doc_id", _snap(parts[0] + parts[1], 10000).alias("bm25")
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )
