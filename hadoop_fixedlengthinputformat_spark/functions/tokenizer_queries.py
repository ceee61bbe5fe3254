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


_VC_KS = (256, 1024, 4096)
_VC_COV = "floor((CAST(covered_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)) * 10000 + 0.5) / 10000"


def _vocab_coverage_sql() -> str:
    arms = "\n    UNION ALL ".join(
        f"SELECT {k} AS k, total_tokens, n_types, c_{k} AS covered_tokens,"
        f" {_VC_COV} + 0 AS coverage"
        f" FROM (SELECT t.total_tokens, t.n_types, c.c_{k},"
        f" c.c_{k} AS covered_tokens, t.total_tokens AS tt FROM tot t, cov c)"
        for k in _VC_KS
    )
    covs = ",\n               ".join(
        f"CAST(sum(CASE WHEN rk <= {k} THEN freq ELSE 0 END) AS BIGINT)"
        f" AS c_{k}"
        for k in _VC_KS
    )
    return f"""
    WITH toks AS (
        SELECT t AS token
        FROM (
            SELECT unnest(string_split(text, ' ')) AS t
            FROM documents WHERE text IS NOT NULL AND text <> ''
        ) WHERE t <> ''
    ),
    v AS MATERIALIZED (
        SELECT token, CAST(count(*) AS BIGINT) AS freq
        FROM toks GROUP BY token
    ),
    top AS (
        SELECT freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS rk
        FROM v
        QUALIFY ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC)
            <= {max(_VC_KS)}
    ),
    tot AS (
        SELECT CAST(sum(freq) AS BIGINT) AS total_tokens,
               CAST(count(*) AS BIGINT) AS n_types
        FROM v
    ),
    cov AS (
        SELECT {covs}
        FROM top
    )
    SELECT k, total_tokens, n_types, covered_tokens, coverage
    FROM ({arms})
    WHERE total_tokens > 0
    """


@query("llm_vocab_coverage", oracle=_vocab_coverage_sql())
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve (round 14) — the tokenizer-planning
    companion to llm_vocab_ids: for top-K whitespace vocabularies
    (K = 256 / 1024 / 4096, freq-desc token-asc total order, the
    llm_vocab_ids convention), what share of RUNNING tokens each K
    covers.  This is the curve a team reads before fixing a vocab
    size: head coverage rises steeply then flattens along Zipf's law
    (llm_zipf_fit's observation, turned into the planning metric).

    Determinism: frequency sums are exact int64; the K cutoffs use the
    same deterministic total order both engines agree on; coverage is
    ONE exact-int division snapped to 4 (+0).  Scale shape: the token
    census groupBy is Heaps-bounded (|vocab| ~ sqrt(corpus)); the only
    ordered structure is orderBy().limit(4096) — TakeOrdered with
    per-partition heads, no full-vocab single-node sort — and the rank
    window runs over the 4096 survivors only; totals are a 1-row
    aggregate; the final join is 1x1 broadcast.  Empty/NULL text and
    empty split tokens excluded on BOTH sides; an empty corpus emits
    zero rows both sides (total_tokens > 0)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.where(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )
    # Heaps-bounded census, localCheckpointed: it feeds BOTH the top-K
    # cutoff and the totals, and (round 14) the original
    # union-of-three-arms re-evaluated the whole subtree per arm — the
    # executed plan scanned documents SIX times.  Checkpoint + one
    # stack() generator over the single (cov x tot) row = ONE scan.
    v = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=False)
    )
    top = v.orderBy(F.desc("freq"), F.asc("token")).limit(max(_VC_KS))
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    ranked = top.select("freq", F.row_number().over(w).alias("rk"))
    cov = ranked.agg(
        *[
            F.sum(F.when(F.col("rk") <= k, F.col("freq")).otherwise(0))
            .cast("long")
            .alias(f"c_{k}")
            for k in _VC_KS
        ]
    )
    tot = v.agg(
        F.sum("freq").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    row = cov.crossJoin(tot)
    pairs = ", ".join(f"{k}, c_{k}" for k in _VC_KS)
    expl = row.select(
        "total_tokens",
        "n_types",
        F.expr(
            f"stack({len(_VC_KS)}, {pairs}) AS (k, covered_tokens)"
        ),
    )
    return expl.select(
        "k",
        "total_tokens",
        "n_types",
        "covered_tokens",
        (
            F.floor(
                (
                    F.col("covered_tokens").cast("double")
                    / F.col("total_tokens").cast("double")
                )
                * 10000
                + 0.5
            )
            / 10000
            + F.lit(0.0)
        ).alias("coverage"),
    ).where(F.col("total_tokens") > 0)
