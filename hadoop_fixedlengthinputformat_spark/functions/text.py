"""Text-analysis column builders (SURVEY.md §2.3-J: llm_text_stats,
llm_lang_id, llm_quality_score, llm_token_count, llm_fingerprint).

All pure Column expressions — JVM codegen, no Python in the hot path, so
they stream over 100 TB of documents at scan speed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# BPE-ish token pattern: letter runs | digit runs | single punctuation.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def ws_tokens(text: Column | str) -> Column:
    """Whitespace token array."""
    return F.split(text, " ")


def n_ws_tokens(text: Column | str) -> Column:
    """Whitespace token count via pure string arithmetic.

    ``length(t) - length(replace(t, ' ', '')) + 1`` equals
    ``size(split(t, ' '))`` for every non-null string (single-char literal
    separator keeps empty tokens on both engines), but unlike split it is
    engine-identical BY CONSTRUCTION — no regex engine, no array
    semantics, no DuckDB-version drift on empty strings.  Oracle twin:
    ``(length(text) - length(replace(text, ' ', '')) + 1)``.
    """
    t = F.col(text) if isinstance(text, str) else text
    return F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1


def n_bpe_ish_tokens(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), 0))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lowercased).

    Denominator floored at 1 (numerator <= length, so empty text gives
    0.0 rather than an ANSI divide-by-zero; oracle twin:
    ``greatest(length(text), 1)``)."""
    t = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(F.lower(t), "[a-z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(t), F.lit(1))


def vowel_ratio(text: Column | str) -> Column:
    """Vowel fraction; empty text gives 0.0 (see punct_ratio)."""
    t = F.col(text) if isinstance(text, str) else text
    vowels = F.regexp_replace(F.lower(t), "[^aeiou]", "")
    return F.length(vowels) / F.greatest(F.length(t), F.lit(1))


def distinct_token_ratio(text: Column | str) -> Column:
    """Distinct whitespace tokens / total.  The numerator needs the real
    split array; the denominator uses the arithmetic count so both sides
    share one token-count definition (they agree — see n_ws_tokens)."""
    toks = ws_tokens(text)
    return F.size(F.array_distinct(toks)) / n_ws_tokens(text)


def lang_id_heuristic(text: Column | str) -> Column:
    """Deterministic character-distribution language guess.

    A real deployment would plug a fastText/CLD3 model in via a pandas
    UDF; this in-engine heuristic buckets the vowel ratio — it is exactly
    reproducible in ANSI SQL, which is what lets the driver oracle-check
    the plumbing (per SURVEY §2.3-J the operator contract is the
    deterministic classify-and-group shape, not model quality).
    """
    v = vowel_ratio(text)
    return (
        F.when(v < 0.20, "zh")
        .when(v < 0.24, "de")
        .when(v < 0.28, "en")
        .when(v < 0.32, "es")
        .otherwise("fr")
    )


def quality_score(text: Column | str) -> Column:
    """Composite quality score in [0,1]:
    0.4*min(1, tokens/100) + 0.3*distinct_ratio + 0.3*(1-punct_ratio)."""
    t = F.col(text) if isinstance(text, str) else text
    len_term = F.least(F.lit(1.0), n_ws_tokens(t).cast("double") / 100.0)
    return 0.4 * len_term + 0.3 * distinct_token_ratio(t) + 0.3 * (1.0 - punct_ratio(t))


def char_ngrams(text: Column | str, n: int) -> Column:
    """Array of all character n-grams (via sequence+transform, no UDF)."""
    t = F.col(text) if isinstance(text, str) else text
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substr(t, i, F.lit(n)))


def rolling_fingerprint(text: Column | str, n: int = 8) -> Column:
    """Rolling-hash document fingerprint: lexicographic min of the md5 of
    every char n-gram (a 1-of-k winnowing).  md5 matches DuckDB exactly,
    so the oracle can recompute it."""
    grams = char_ngrams(text, n)
    hashed = F.transform(grams, lambda g: F.md5(g.cast("binary")))
    return F.array_min(hashed)


def bpe_train(df, text_col: str = "text", n_merges: int = 8):
    """Byte-pair-encoding merge training, the tokenizer-building step of
    an LLM data pipeline, expressed Spark-first:

    1. Collapse the corpus to a WORD-FREQUENCY table (groupBy word) —
       classic BPE trains on the vocabulary weighted by counts, so the
       iterative passes run over |vocab| rows (Heaps-law bounded), never
       the raw corpus.  This is the step that makes 100 TB feasible:
       the corpus is touched exactly once.
    2. Per merge round (driver loop, one tiny collect each):
       adjacent-pair counts via arrays_zip(slice, slice) + explode +
       map-side-combined sum; the argmax pair (count desc, then
       lexicographic — deterministic) becomes the next merge; the merge
       applies to every word's token array with one JVM-side
       ``aggregate`` lambda (greedy left-to-right, standard BPE).
       ``localCheckpoint`` per round caps the lineage, k rounds = k
       small shuffles over the vocab table.

    Returns (rank, left, right, pair_count) — the ordered merge table a
    tokenizer consumes.  Genuinely non-SQL-expressible (iterative with
    a data-dependent argmax per round) => rows-only driver check;
    correctness pinned on a known corpus in tests/test_llm.py.
    """
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # word -> char tokens with an end-of-word marker on the last char
    vocab = words.select(
        "freq", char_toks_expr("word").alias("toks")
    ).localCheckpoint(eager=True)

    merges = []
    for rank in range(n_merges):
        pairs = (
            vocab.filter(F.size("toks") >= 2)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("toks", 1, F.size("toks") - 1).alias("a"),
                        F.slice("toks", 2, F.size("toks") - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("pair_count"))
        )
        top = pairs.orderBy(
            F.desc("pair_count"), F.asc("a"), F.asc("b")
        ).limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].pair_count
        merges.append((rank, a, b, cnt))
        # greedy left-to-right merge of (a, b) in one JVM lambda
        vocab = vocab.select(
            "freq", merge_pair_expr(a, b).alias("toks")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )


def char_toks_expr(word_col: str = "word"):
    """``word`` -> its BPE start state: one token per character with the
    ``</w>`` end-of-word marker appended to the last (the classic
    Sennrich et al. 2016 convention).  Pure codegen expression."""
    return F.expr(
        f"transform(sequence(1, length({word_col})), "
        f"i -> if(i = length({word_col}), substring({word_col}, i, 1) || '</w>', "
        f"substring({word_col}, i, 1)))"
    )


def merge_pair_expr(a: str, b: str, toks_col: str = "toks"):
    """Greedy left-to-right application of merge ``(a, b)`` to a token
    array, in one JVM ``aggregate`` lambda — shared by the trainer's
    per-round vocab update and the tokenizer-apply encoder, so the two
    can never disagree on merge semantics."""
    merged = a + b
    return F.expr(
        f"aggregate({toks_col}, array(cast(null as string)), "
        f"(acc, x) -> case "
        f"  when size(acc) = 1 and acc[0] is null then array(x) "
        f"  when element_at(acc, -1) = {_sq(a)} and x = {_sq(b)} "
        f"    then concat(slice(acc, 1, size(acc) - 1), array({_sq(merged)})) "
        f"  else concat(acc, array(x)) end)"
    )


def _sq(s: str) -> str:
    """SQL single-quoted string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
