"""Tokenizer-training queries (round-2 tail registrations)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.functions import text
from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query(
    "llm_bpe_train",
    oracle="""
    SELECT CAST(r AS INT) AS rank,
           true AS pair_nonempty,
           true AS count_positive,
           true AS freq_nonincreasing
    FROM generate_series(0, 7) t(r)
    """,
)
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-table training over the documents corpus (8 rounds).
    The corpus collapses to a word-frequency table first, so every
    iterative pass runs over |vocab| rows — the property that makes
    tokenizer training feasible at 100 TB (see text.bpe_train).

    Driver-gradeable (VERDICT r6 #3): the merge pairs are
    data-dependent strings no SQL oracle can re-derive (8 unrolled BPE
    rounds), so the graded output is the invariant set a correct
    trainer satisfies on ANY corpus: exactly ranks 0..7, non-empty
    pair halves, positive counts, and the max-pair-frequency
    MONOTONICITY of BPE (each merge's new pairs inherit counts bounded
    by the merged pair's, so the argmax sequence never increases).
    Merge order itself is pinned to the textbook walkthrough in
    tests/test_llm.py."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    out = text.bpe_train(d, n_merges=8)
    # windowed input = n_merges = 8 merge rows — bounded
    w = Window.orderBy("rank")
    prev = F.lag("pair_count").over(w)
    return out.select(
        "rank",
        ((F.length("left") > 0) & (F.length("right") > 0)).alias(
            "pair_nonempty"
        ),
        (F.col("pair_count") >= 1).alias("count_positive"),
        F.coalesce(F.col("pair_count") <= prev, F.lit(True)).alias(
            "freq_nonincreasing"
        ),
    )


@query(
    "llm_vocab_ids",
    oracle="""
    WITH toks AS (
        SELECT doc_id, t AS token
        FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents WHERE text IS NOT NULL AND text <> ''
        ) WHERE t <> ''
    ),
    v AS (
        SELECT token, CAST(count(*) AS BIGINT) AS freq,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM toks GROUP BY token
    )
    SELECT token, freq, n_docs,
           CAST(255 + ROW_NUMBER()
                    OVER (ORDER BY freq DESC, token ASC) AS BIGINT)
               AS token_id
    FROM v
    QUALIFY ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) <= 32768
    """,
)
def llm_vocab_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-style vocabulary id assignment: whitespace tokens
    ranked by corpus frequency (ties broken lexically — a total order,
    so ids are reproducible across runs and engines), ids starting at
    256 to reserve 0-255 for byte-fallback (the GPT-2 convention), top
    32768 kept.  The groupBy is Heaps-law bounded (|vocab| grows ~
    sqrt(corpus)), and the global rank runs AFTER an orderBy().limit()
    top-k — TakeOrdered computes per-partition heads in parallel and
    only the 32 K survivors enter the single-partition row_number
    window, so no full-vocab single-node sort exists at 100 TB.
    Empty/NULL text and empty split tokens excluded on BOTH sides
    (CLAUDE.md round-4 rule)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.where(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )
    v = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("freq"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    top = v.orderBy(F.desc("freq"), F.asc("token")).limit(32768)
    # windowed input = 32768 vocab rows (post-limit) — bounded
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return top.select(
        "token",
        "freq",
        "n_docs",
        (F.lit(255) + F.row_number().over(w)).cast("long").alias("token_id"),
    )
