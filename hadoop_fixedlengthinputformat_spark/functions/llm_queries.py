"""J family — LLM-data-pipeline operator queries (SURVEY.md §2.3-J).

Declared queries over ``documents`` / ``embeddings``; implementations
live in dedup.py / similarity.py / text.py / multimodal.py.  Hash
functions are md5-based wherever an oracle exists (DuckDB's md5 is
bit-identical to Spark's), xxhash64 for the rows-only scale paths.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_fixedlengthinputformat_spark.functions import (
    dedup,
    multimodal,
    similarity,
    text,
)
from hadoop_fixedlengthinputformat_spark.functions.num import snap
from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query(
    "llm_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one shuffle keyed on the content DIGEST, not the raw
    text (VERDICT r11 #3) — md5 is computed map-side so the exchange
    carries 32-hex-char digests + ids instead of the corpus itself; at
    100 TB the shuffle payload is ~48 B/doc either way you count.  Keeps
    the min doc_id per text (deterministic survivor policy).  md5(NULL)
    is NULL on both engines and groups as one key, matching the oracle's
    GROUP BY text NULL group."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.md5(F.col("text").cast("binary")).alias("text_md5"), "doc_id"
        )
        .groupBy("text_md5")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "llm_minhash_near_dedup",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
            FROM toks
        )
    ),
    sig AS MATERIALIZED (
        SELECT doc_id,
               min(md5('0' || shingle)) AS mh_0, min(md5('1' || shingle)) AS mh_1,
               min(md5('2' || shingle)) AS mh_2, min(md5('3' || shingle)) AS mh_3,
               min(md5('4' || shingle)) AS mh_4, min(md5('5' || shingle)) AS mh_5,
               min(md5('6' || shingle)) AS mh_6, min(md5('7' || shingle)) AS mh_7
        FROM shingles GROUP BY doc_id
    ),
    bands AS MATERIALIZED (
        SELECT doc_id, 0 AS band_idx, mh_0 || '|' || mh_1 AS band_val FROM sig
        UNION ALL SELECT doc_id, 1, mh_2 || '|' || mh_3 FROM sig
        UNION ALL SELECT doc_id, 2, mh_4 || '|' || mh_5 FROM sig
        UNION ALL SELECT doc_id, 3, mh_6 || '|' || mh_7 FROM sig
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
    WHERE a.doc_id < b.doc_id
    """,
)
def llm_minhash_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8)+LSH(4 bands x 2): candidate near-duplicate pairs sharing
    >=1 band — never O(n^2); see dedup.py for the shuffle plan."""
    d = load_table(spark, sf_dir, "documents")
    sig = dedup.minhash_signature(d, "doc_id")
    return dedup.lsh_candidate_pairs(sig, "doc_id")


@query(
    "llm_ngram_jaccard",
    oracle="""
    WITH canon AS MATERIALIZED (
        -- one deterministic representative row per doc_id: duplicate ids
        -- would otherwise inflate the per-doc token sizes across blocks
        SELECT doc_id, lang, source, text FROM (
            SELECT doc_id, lang, source, text,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY md5(text) ASC,
                                lang ASC NULLS FIRST,
                                source ASC NULLS FIRST) AS rn
            FROM documents WHERE text IS NOT NULL
        ) WHERE rn = 1
    ),
    toks AS MATERIALIZED (
        -- referenced 3x (sizes + self-join twice): MATERIALIZED per the
        -- round-10 CTE re-inlining rule, found live by the round-11 sf1
        -- oracle soak (the canon window re-ran 3x without it)
        SELECT DISTINCT doc_id, lang, source, tok FROM (
            SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS tok
            FROM canon
        )
    ),
    sizes AS MATERIALIZED (
        SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        FROM toks a JOIN toks b
          ON a.lang = b.lang AND a.source = b.source AND a.tok = b.tok
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           floor(shared / (sa.n_tok + sb.n_tok - shared) * 10000 + 0.5) / 10000
               AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE shared / (sa.n_tok + sb.n_tok - shared) >= 0.6
    """,
)
def llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard >= 0.6 within (lang, source) blocks.  The
    Spark plan uses prefix filtering (see ``ngram_jaccard_pairs``): the
    candidate join is keyed only on each doc's rarest tokens, yet the
    result set is provably identical to the oracle's naive all-shared-
    token formulation — scale-safe without a semantics-changing DF cap.
    Input is canonicalized to one row per doc_id (dedup.canonical_docs)
    so duplicate ids can't straddle blocking keys.

    Oracle scale note (round-11 sf1 soak): this is the registry's one
    DELIBERATELY quadratic oracle — the all-shared-token self-join
    costs Σ_token C(count,2), measured 0.11 s at sf0.01 (driver grade
    scale), 1.75 s at sf0.1, >600 s at 500k docs — that curve is the
    exact reason the SPARK side uses prefix filtering, and replacing
    the oracle with the same trick would destroy its independence.
    CTEs are MATERIALIZED (toks was re-inlined 3x) so the oracle's
    cost is the join itself, nothing else."""
    d = dedup.canonical_docs(load_table(spark, sf_dir, "documents"))
    return dedup.ngram_jaccard_pairs(d, "doc_id", threshold=0.6)


@query(
    "llm_dup_clusters",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
            FROM toks
        )
    ),
    sig AS MATERIALIZED (
        SELECT doc_id,
               min(md5('0' || shingle)) AS mh_0, min(md5('1' || shingle)) AS mh_1,
               min(md5('2' || shingle)) AS mh_2, min(md5('3' || shingle)) AS mh_3,
               min(md5('4' || shingle)) AS mh_4, min(md5('5' || shingle)) AS mh_5,
               min(md5('6' || shingle)) AS mh_6, min(md5('7' || shingle)) AS mh_7
        FROM shingles GROUP BY doc_id
    ),
    bands AS MATERIALIZED (
        SELECT doc_id, 0 AS band_idx, mh_0 || '|' || mh_1 AS band_val FROM sig
        UNION ALL SELECT doc_id, 1, mh_2 || '|' || mh_3 FROM sig
        UNION ALL SELECT doc_id, 2, mh_4 || '|' || mh_5 FROM sig
        UNION ALL SELECT doc_id, 3, mh_6 || '|' || mh_7 FROM sig
    ),
    pairs AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        WHERE a.doc_id < b.doc_id
    ),
    sym AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
        SELECT DISTINCT a AS node, a AS lbl FROM sym
        UNION
        SELECT s.a, r.lbl FROM sym s JOIN reach r ON r.node = s.b
    ),
    cc AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node)
    SELECT node AS doc_id, lbl AS cluster_id,
           count(*) OVER (PARTITION BY lbl) AS n_members
    FROM cc
    """,
)
def llm_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS -> duplicate GROUPS: connected components over the
    MinHash-LSH candidate graph via iterative min-label propagation
    (``dedup.connected_components``), the step a real dedup pipeline
    needs before it can DROP anything (keep cluster_id == doc_id, drop
    the rest).  Oracle recomputes the identical LSH pairs bit-exactly in
    SQL, then closes them with a recursive CTE."""
    d = load_table(spark, sf_dir, "documents")
    sig = dedup.minhash_signature(d, "doc_id")
    pairs = dedup.lsh_candidate_pairs(sig, "doc_id")
    cc = dedup.connected_components(pairs)
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id")
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("n_members"),
    )


@query(
    "llm_repetition_score",
    oracle="""
    WITH s AS MATERIALIZED (
        -- split ONCE per row: the previous correlated form re-ran
        -- string_split per 3-gram position (O(len^2) per doc — 149 s
        -- at sf1, found by the round-11 oracle soak; value-identical)
        SELECT doc_id, string_split(text, ' ') AS t
        FROM documents
        WHERE length(text) > 0
    ),
    g AS (
        SELECT doc_id,
               greatest(len(t) - 2, 1) AS total_3g,
               (SELECT count(DISTINCT array_to_string(t[i:i+2], ' '))
                FROM unnest(generate_series(
                    1, greatest(len(t) - 2, 1))) AS u(i))
                   AS distinct_3g
        FROM s
    )
    SELECT doc_id,
           floor((1 - CAST(distinct_3g AS DOUBLE) / total_3g) * 10000 + 0.5)
               / 10000 AS rep_3gram
    FROM g
    """,
)
def llm_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-3-gram fraction per document (the Gopher/MassiveText
    repetition quality filter): 1 - distinct/total 3-grams.  Pure per-row
    array expressions — zero shuffles, streams at scan speed at 100 TB.
    NULL/empty texts are excluded on BOTH sides (the engines' split
    semantics on '' disagree — CLAUDE.md token-count rule)."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    sh = dedup.word_shingles(d, "text", 3)
    return d.select(
        "doc_id",
        (
            F.floor(
                (1 - F.size(F.array_distinct(sh)) / F.size(sh)) * 10000 + 0.5
            )
            / 10000
        ).alias("rep_3gram"),
    )


@query(
    "llm_contamination_check",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               array_to_string((string_split(text, ' '))[i:i+4], ' ') AS s
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(
                       1, greatest(len(string_split(text, ' ')) - 4, 1))) AS i
            FROM documents
        )
    ),
    eval_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
    SELECT sh.doc_id, count(DISTINCT sh.s) AS n_shared
    FROM sh JOIN eval_sh ON sh.s = eval_sh.s
    WHERE sh.doc_id % 97 <> 0
    GROUP BY sh.doc_id
    """,
)
def llm_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: flag training docs sharing any
    5-gram with the eval set (docs with doc_id % 97 == 0 stand in for a
    benchmark).  The eval n-gram set is small by construction, so it is
    BROADCAST — the 100 TB corpus streams past it with no shuffle of
    corpus data; the only aggregation is per-doc match counting."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(dedup.word_shingles(d, "text", 5))
        ).alias("s"),
    )
    eval_sh = sh.filter(F.col("doc_id") % 97 == 0).select("s").distinct()
    return (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(F.count_distinct("s").alias("n_shared"))
    )


@query(
    "llm_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '80' ELSE '33' END
    """,
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep ~50% of 'en' docs and ~20%
    of the rest by comparing the md5(doc_id) hex prefix against a
    per-stratum threshold ('80'/256 = .5, '33'/256 = .199).  Unlike
    rand()-sampling this is reproducible across runs/retries/engines —
    a pure filter, no shuffle, and the exact same rows in DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    thresh = F.when(F.col("lang") == "en", "80").otherwise("33")
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
        < thresh
    ).select("doc_id", "lang")


@query(
    "llm_seq_packing",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               COALESCE(
                   length(text) - length(replace(text, ' ', '')) + 1,
                   0) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, n_tok,
               COALESCE(SUM(n_tok) OVER (
                   PARTITION BY lang
                   ORDER BY doc_id ASC NULLS FIRST, n_tok ASC NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM t
    )
    SELECT doc_id, lang, n_tok,
           CAST(cum_before // 2048 AS BIGINT) AS pack_id,
           CAST(cum_before % 2048 AS BIGINT) AS pack_offset
    FROM c
    """,
)
def llm_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: concat-and-chunk each language
    stream into 2048-token packs (the GPT-style packing semantics) —
    every doc gets its pack id and offset from a running token count.
    One shuffle on lang + window; at 100 TB repartition the stream by
    (lang, doc_id range) and add the range's token grand total to the
    local cumsum — same two-phase offset trick as the scalable ntile.

    Determinism (red in r2 AND r3 on the driver's roll, never locally —
    so every cross-engine wiggle is pinned defensively now):
      * token count is the arithmetic formula (engine-identical, see
        text.n_ws_tokens) COALESCEd to 0 — a NULL text otherwise makes
        the row's window position engine-defined (Spark sorts NULLS
        FIRST asc, DuckDB NULLS LAST);
      * the window ORDER BY pins NULLS FIRST explicitly on BOTH sides
        (a NULL doc_id row would otherwise shift every later row's
        cum_before by a whole-partition-order disagreement);
      * (doc_id, n_tok) ordering makes duplicate doc_ids yield one
        well-defined multiset of (pack_id, pack_offset): tied rows have
        equal n_tok, so the tied cum_before values are the same set
        regardless of which engine puts which row first."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        F.coalesce(text.n_ws_tokens("text"), F.lit(0)).alias("n_tok"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("doc_id").asc_nulls_first(), F.col("n_tok").asc_nulls_first()
    ).rowsBetween(Window.unboundedPreceding, -1)
    c = t.withColumn("cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    return c.select(
        "doc_id",
        "lang",
        "n_tok",
        F.expr("cum_before div 2048").alias("pack_id"),
        (F.col("cum_before") % 2048).alias("pack_offset"),
    )


@query(
    "llm_pii_redact",
    oracle="""
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_redacted,
           len(regexp_extract_all(props, '[0-9]+')) AS n_redactions
    FROM events
    """,
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex redaction pass (PII-scrub shape): mask numeric runs in the
    JSON props and count the redactions.  Pure per-row regexp — zero
    shuffles; swap in email/SSN/phone patterns for real corpora."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_replace("props", r"[0-9]+", "<NUM>").alias("props_redacted"),
        F.regexp_count("props", F.lit(r"[0-9]+")).cast("long").alias(
            "n_redactions"
        ),
    )


@query(
    "llm_simhash",
    oracle="""
    WITH occ AS MATERIALIZED (
        -- occurrence counts per (doc, token): md5 then runs ONCE per
        -- GLOBALLY DISTINCT token instead of once per occurrence
        -- (VERDICT r11 #8: 5e7 md5 calls = 135 s at sf1; the corpus
        -- vocabulary is orders of magnitude smaller), and the votes
        -- below weight by cnt — algebraically identical to the
        -- per-occurrence sum
        SELECT doc_id, tok, count(*)::BIGINT AS cnt FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ) GROUP BY doc_id, tok
    ),
    vocab AS MATERIALIZED (
        SELECT tok,
               (SELECT sum(
                    (strpos('0123456789abcdef', substr(h16, i, 1))
                     - 1)::BIGINT << (4 * (15 - i)))
                FROM generate_series(1, 15) t(i)) AS h
        FROM (SELECT tok, md5(tok) AS h16
              FROM (SELECT DISTINCT tok FROM occ))
    ),
    hashed AS (
        SELECT o.doc_id, v.h, o.cnt FROM occ o JOIN vocab v USING (tok)
    ),
    votes AS (
        SELECT doc_id,
               sum(CASE WHEN (h >> 0) & 1 = 1 THEN cnt ELSE -cnt END) AS v0,
               sum(CASE WHEN (h >> 1) & 1 = 1 THEN cnt ELSE -cnt END) AS v1,
               sum(CASE WHEN (h >> 2) & 1 = 1 THEN cnt ELSE -cnt END) AS v2,
               sum(CASE WHEN (h >> 3) & 1 = 1 THEN cnt ELSE -cnt END) AS v3,
               sum(CASE WHEN (h >> 4) & 1 = 1 THEN cnt ELSE -cnt END) AS v4,
               sum(CASE WHEN (h >> 5) & 1 = 1 THEN cnt ELSE -cnt END) AS v5,
               sum(CASE WHEN (h >> 6) & 1 = 1 THEN cnt ELSE -cnt END) AS v6,
               sum(CASE WHEN (h >> 7) & 1 = 1 THEN cnt ELSE -cnt END) AS v7,
               sum(CASE WHEN (h >> 8) & 1 = 1 THEN cnt ELSE -cnt END) AS v8,
               sum(CASE WHEN (h >> 9) & 1 = 1 THEN cnt ELSE -cnt END) AS v9,
               sum(CASE WHEN (h >> 10) & 1 = 1 THEN cnt ELSE -cnt END) AS v10,
               sum(CASE WHEN (h >> 11) & 1 = 1 THEN cnt ELSE -cnt END) AS v11,
               sum(CASE WHEN (h >> 12) & 1 = 1 THEN cnt ELSE -cnt END) AS v12,
               sum(CASE WHEN (h >> 13) & 1 = 1 THEN cnt ELSE -cnt END) AS v13,
               sum(CASE WHEN (h >> 14) & 1 = 1 THEN cnt ELSE -cnt END) AS v14,
               sum(CASE WHEN (h >> 15) & 1 = 1 THEN cnt ELSE -cnt END) AS v15,
               sum(CASE WHEN (h >> 16) & 1 = 1 THEN cnt ELSE -cnt END) AS v16,
               sum(CASE WHEN (h >> 17) & 1 = 1 THEN cnt ELSE -cnt END) AS v17,
               sum(CASE WHEN (h >> 18) & 1 = 1 THEN cnt ELSE -cnt END) AS v18,
               sum(CASE WHEN (h >> 19) & 1 = 1 THEN cnt ELSE -cnt END) AS v19,
               sum(CASE WHEN (h >> 20) & 1 = 1 THEN cnt ELSE -cnt END) AS v20,
               sum(CASE WHEN (h >> 21) & 1 = 1 THEN cnt ELSE -cnt END) AS v21,
               sum(CASE WHEN (h >> 22) & 1 = 1 THEN cnt ELSE -cnt END) AS v22,
               sum(CASE WHEN (h >> 23) & 1 = 1 THEN cnt ELSE -cnt END) AS v23,
               sum(CASE WHEN (h >> 24) & 1 = 1 THEN cnt ELSE -cnt END) AS v24,
               sum(CASE WHEN (h >> 25) & 1 = 1 THEN cnt ELSE -cnt END) AS v25,
               sum(CASE WHEN (h >> 26) & 1 = 1 THEN cnt ELSE -cnt END) AS v26,
               sum(CASE WHEN (h >> 27) & 1 = 1 THEN cnt ELSE -cnt END) AS v27,
               sum(CASE WHEN (h >> 28) & 1 = 1 THEN cnt ELSE -cnt END) AS v28,
               sum(CASE WHEN (h >> 29) & 1 = 1 THEN cnt ELSE -cnt END) AS v29,
               sum(CASE WHEN (h >> 30) & 1 = 1 THEN cnt ELSE -cnt END) AS v30,
               sum(CASE WHEN (h >> 31) & 1 = 1 THEN cnt ELSE -cnt END) AS v31,
               sum(CASE WHEN (h >> 32) & 1 = 1 THEN cnt ELSE -cnt END) AS v32,
               sum(CASE WHEN (h >> 33) & 1 = 1 THEN cnt ELSE -cnt END) AS v33,
               sum(CASE WHEN (h >> 34) & 1 = 1 THEN cnt ELSE -cnt END) AS v34,
               sum(CASE WHEN (h >> 35) & 1 = 1 THEN cnt ELSE -cnt END) AS v35,
               sum(CASE WHEN (h >> 36) & 1 = 1 THEN cnt ELSE -cnt END) AS v36,
               sum(CASE WHEN (h >> 37) & 1 = 1 THEN cnt ELSE -cnt END) AS v37,
               sum(CASE WHEN (h >> 38) & 1 = 1 THEN cnt ELSE -cnt END) AS v38,
               sum(CASE WHEN (h >> 39) & 1 = 1 THEN cnt ELSE -cnt END) AS v39,
               sum(CASE WHEN (h >> 40) & 1 = 1 THEN cnt ELSE -cnt END) AS v40,
               sum(CASE WHEN (h >> 41) & 1 = 1 THEN cnt ELSE -cnt END) AS v41,
               sum(CASE WHEN (h >> 42) & 1 = 1 THEN cnt ELSE -cnt END) AS v42,
               sum(CASE WHEN (h >> 43) & 1 = 1 THEN cnt ELSE -cnt END) AS v43,
               sum(CASE WHEN (h >> 44) & 1 = 1 THEN cnt ELSE -cnt END) AS v44,
               sum(CASE WHEN (h >> 45) & 1 = 1 THEN cnt ELSE -cnt END) AS v45,
               sum(CASE WHEN (h >> 46) & 1 = 1 THEN cnt ELSE -cnt END) AS v46,
               sum(CASE WHEN (h >> 47) & 1 = 1 THEN cnt ELSE -cnt END) AS v47,
               sum(CASE WHEN (h >> 48) & 1 = 1 THEN cnt ELSE -cnt END) AS v48,
               sum(CASE WHEN (h >> 49) & 1 = 1 THEN cnt ELSE -cnt END) AS v49,
               sum(CASE WHEN (h >> 50) & 1 = 1 THEN cnt ELSE -cnt END) AS v50,
               sum(CASE WHEN (h >> 51) & 1 = 1 THEN cnt ELSE -cnt END) AS v51,
               sum(CASE WHEN (h >> 52) & 1 = 1 THEN cnt ELSE -cnt END) AS v52,
               sum(CASE WHEN (h >> 53) & 1 = 1 THEN cnt ELSE -cnt END) AS v53,
               sum(CASE WHEN (h >> 54) & 1 = 1 THEN cnt ELSE -cnt END) AS v54,
               sum(CASE WHEN (h >> 55) & 1 = 1 THEN cnt ELSE -cnt END) AS v55,
               sum(CASE WHEN (h >> 56) & 1 = 1 THEN cnt ELSE -cnt END) AS v56,
               sum(CASE WHEN (h >> 57) & 1 = 1 THEN cnt ELSE -cnt END) AS v57,
               sum(CASE WHEN (h >> 58) & 1 = 1 THEN cnt ELSE -cnt END) AS v58,
               sum(CASE WHEN (h >> 59) & 1 = 1 THEN cnt ELSE -cnt END) AS v59
        FROM hashed
        GROUP BY doc_id
    )
    SELECT doc_id,
           CAST((CASE WHEN v0 > 0 THEN 1::BIGINT << 0 ELSE 0 END)
           + (CASE WHEN v1 > 0 THEN 1::BIGINT << 1 ELSE 0 END)
           + (CASE WHEN v2 > 0 THEN 1::BIGINT << 2 ELSE 0 END)
           + (CASE WHEN v3 > 0 THEN 1::BIGINT << 3 ELSE 0 END)
           + (CASE WHEN v4 > 0 THEN 1::BIGINT << 4 ELSE 0 END)
           + (CASE WHEN v5 > 0 THEN 1::BIGINT << 5 ELSE 0 END)
           + (CASE WHEN v6 > 0 THEN 1::BIGINT << 6 ELSE 0 END)
           + (CASE WHEN v7 > 0 THEN 1::BIGINT << 7 ELSE 0 END)
           + (CASE WHEN v8 > 0 THEN 1::BIGINT << 8 ELSE 0 END)
           + (CASE WHEN v9 > 0 THEN 1::BIGINT << 9 ELSE 0 END)
           + (CASE WHEN v10 > 0 THEN 1::BIGINT << 10 ELSE 0 END)
           + (CASE WHEN v11 > 0 THEN 1::BIGINT << 11 ELSE 0 END)
           + (CASE WHEN v12 > 0 THEN 1::BIGINT << 12 ELSE 0 END)
           + (CASE WHEN v13 > 0 THEN 1::BIGINT << 13 ELSE 0 END)
           + (CASE WHEN v14 > 0 THEN 1::BIGINT << 14 ELSE 0 END)
           + (CASE WHEN v15 > 0 THEN 1::BIGINT << 15 ELSE 0 END)
           + (CASE WHEN v16 > 0 THEN 1::BIGINT << 16 ELSE 0 END)
           + (CASE WHEN v17 > 0 THEN 1::BIGINT << 17 ELSE 0 END)
           + (CASE WHEN v18 > 0 THEN 1::BIGINT << 18 ELSE 0 END)
           + (CASE WHEN v19 > 0 THEN 1::BIGINT << 19 ELSE 0 END)
           + (CASE WHEN v20 > 0 THEN 1::BIGINT << 20 ELSE 0 END)
           + (CASE WHEN v21 > 0 THEN 1::BIGINT << 21 ELSE 0 END)
           + (CASE WHEN v22 > 0 THEN 1::BIGINT << 22 ELSE 0 END)
           + (CASE WHEN v23 > 0 THEN 1::BIGINT << 23 ELSE 0 END)
           + (CASE WHEN v24 > 0 THEN 1::BIGINT << 24 ELSE 0 END)
           + (CASE WHEN v25 > 0 THEN 1::BIGINT << 25 ELSE 0 END)
           + (CASE WHEN v26 > 0 THEN 1::BIGINT << 26 ELSE 0 END)
           + (CASE WHEN v27 > 0 THEN 1::BIGINT << 27 ELSE 0 END)
           + (CASE WHEN v28 > 0 THEN 1::BIGINT << 28 ELSE 0 END)
           + (CASE WHEN v29 > 0 THEN 1::BIGINT << 29 ELSE 0 END)
           + (CASE WHEN v30 > 0 THEN 1::BIGINT << 30 ELSE 0 END)
           + (CASE WHEN v31 > 0 THEN 1::BIGINT << 31 ELSE 0 END)
           + (CASE WHEN v32 > 0 THEN 1::BIGINT << 32 ELSE 0 END)
           + (CASE WHEN v33 > 0 THEN 1::BIGINT << 33 ELSE 0 END)
           + (CASE WHEN v34 > 0 THEN 1::BIGINT << 34 ELSE 0 END)
           + (CASE WHEN v35 > 0 THEN 1::BIGINT << 35 ELSE 0 END)
           + (CASE WHEN v36 > 0 THEN 1::BIGINT << 36 ELSE 0 END)
           + (CASE WHEN v37 > 0 THEN 1::BIGINT << 37 ELSE 0 END)
           + (CASE WHEN v38 > 0 THEN 1::BIGINT << 38 ELSE 0 END)
           + (CASE WHEN v39 > 0 THEN 1::BIGINT << 39 ELSE 0 END)
           + (CASE WHEN v40 > 0 THEN 1::BIGINT << 40 ELSE 0 END)
           + (CASE WHEN v41 > 0 THEN 1::BIGINT << 41 ELSE 0 END)
           + (CASE WHEN v42 > 0 THEN 1::BIGINT << 42 ELSE 0 END)
           + (CASE WHEN v43 > 0 THEN 1::BIGINT << 43 ELSE 0 END)
           + (CASE WHEN v44 > 0 THEN 1::BIGINT << 44 ELSE 0 END)
           + (CASE WHEN v45 > 0 THEN 1::BIGINT << 45 ELSE 0 END)
           + (CASE WHEN v46 > 0 THEN 1::BIGINT << 46 ELSE 0 END)
           + (CASE WHEN v47 > 0 THEN 1::BIGINT << 47 ELSE 0 END)
           + (CASE WHEN v48 > 0 THEN 1::BIGINT << 48 ELSE 0 END)
           + (CASE WHEN v49 > 0 THEN 1::BIGINT << 49 ELSE 0 END)
           + (CASE WHEN v50 > 0 THEN 1::BIGINT << 50 ELSE 0 END)
           + (CASE WHEN v51 > 0 THEN 1::BIGINT << 51 ELSE 0 END)
           + (CASE WHEN v52 > 0 THEN 1::BIGINT << 52 ELSE 0 END)
           + (CASE WHEN v53 > 0 THEN 1::BIGINT << 53 ELSE 0 END)
           + (CASE WHEN v54 > 0 THEN 1::BIGINT << 54 ELSE 0 END)
           + (CASE WHEN v55 > 0 THEN 1::BIGINT << 55 ELSE 0 END)
           + (CASE WHEN v56 > 0 THEN 1::BIGINT << 56 ELSE 0 END)
           + (CASE WHEN v57 > 0 THEN 1::BIGINT << 57 ELSE 0 END)
           + (CASE WHEN v58 > 0 THEN 1::BIGINT << 58 ELSE 0 END)
           + (CASE WHEN v59 > 0 THEN 1::BIGINT << 59 ELSE 0 END)
                AS BIGINT) AS simhash
    FROM votes
    """,
)
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit md5-derived SimHash per document — the hash is parsed from
    the top 15 hex chars of md5(token), so the EXACT signature is
    reproducible in ANSI SQL and the driver hash-checks it (previously
    a rows-only xxhash64 slot; dedup.simhash64 keeps xxhash64 as the
    faster production default).  Tests assert identical texts collide
    and near-identical texts land within small Hamming distance."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash64(d, "doc_id", hash_fn="md5")


@query(
    "llm_knn_cosine",
    oracle="""
    WITH pairs AS (
        SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
               p.embedding AS pe, e.embedding AS ne
        FROM embeddings p, embeddings e
        WHERE p.vec_id BETWEEN 1 AND 5 AND e.vec_id <> p.vec_id
    ),
    dots AS (
        SELECT probe_id, neighbor_id,
               sum(CAST(pe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS dot,
               sum(CAST(pe[i] AS DOUBLE) * CAST(pe[i] AS DOUBLE)) AS np,
               sum(CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)) AS nn
        FROM pairs, generate_series(1, 64) t(i)
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT probe_id, neighbor_id,
               floor(dot / (sqrt(np) * sqrt(nn)) * 10000 + 0.5) / 10000
                   AS cosine,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY dot / (sqrt(np) * sqrt(nn)) DESC,
                                           neighbor_id) AS rnk
        FROM dots
    )
    SELECT probe_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= 10
    """,
)
def llm_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for probes vec_id 1..5 (the exact
    baseline; llm_knn_ivf / llm_cosine_lsh are the approximate scale
    paths)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id").between(1, 5))
    return similarity.knn_cosine_bruteforce(emb, probes, k=10)


@query("llm_knn_ivf", oracle=similarity.KNN_GATE_ORACLE)
def llm_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (centroid shortlist -> probe-list bucket join), graded
    via per-probe STRUCTURAL gates (similarity.knn_structural_gates):
    recall on unplanted rolls is data-dependent (measured ~0.4), so the
    driver checks the deterministic invariants — exact cosine recompute,
    rank discipline, self-exclusion — while recall bounds stay pinned on
    planted fixtures in tests/test_llm.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id").between(1, 5))
    res = similarity.knn_cosine_ivf(emb, probes, k=10, nprobe=3)
    return similarity.knn_structural_gates(emb, res, probes, k=10)


@query("llm_cosine_lsh", oracle=similarity.KNN_GATE_ORACLE)
def llm_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN (Hamming<=1 signature buckets), graded via the same
    structural gates as llm_knn_ivf (recall ~0.1 on random rolls — the
    bucket shrink is 2^8; accuracy semantics pinned on planted
    fixtures in tests/test_llm.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id").between(1, 5))
    res = similarity.knn_cosine_lsh(emb, probes, k=10)
    return similarity.knn_structural_gates(emb, res, probes, k=10)


@query(
    "llm_kmeans_train",
    oracle="""
    SELECT CAST(c AS BIGINT) AS cluster,
           (SELECT CAST(count(*) AS BIGINT) FROM embeddings)
               AS total_assigned,
           true AS centroid_dim_ok,
           true AS members_nonneg
    FROM generate_series(0, 7) t(c)
    """,
)
def llm_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=8, 3 iterations) over the embedding corpus —
    the real codebook-training step behind llm_knn_ivf / llm_knn_pq.
    Iterative driver loop over distributed assign/recompute passes.

    Graded shape (VERDICT r6 #3): the centroids themselves are
    data-dependent, so the driver checks construction-predicted
    facts — exactly k cluster rows 0..k-1, total membership == corpus
    row count (every vector assigned exactly once), centroid dim ==
    embedding dim, member counts non-negative.  Convergence +
    determinism stay asserted in tests/test_llm.py on planted
    clusters."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.kmeans_train(emb, k=8, iters=3)
    dim = emb.select(F.size("embedding").alias("d")).limit(1)
    total = F.sum("n_members").over(Window.partitionBy())
    return out.crossJoin(F.broadcast(dim)).select(
        F.col("cluster").cast("long").alias("cluster"),
        total.cast("long").alias("total_assigned"),
        (F.size("centroid") == F.col("d")).alias("centroid_dim_ok"),
        (F.col("n_members") >= 0).alias("members_nonneg"),
    )


@query("llm_knn_pq", oracle=similarity.KNN_GATE_ORACLE)
def llm_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN: corpus compressed to m=8 sub-codes, ADC scan over the
    code table, exact cosine re-rank on the rerank*k shortlist — the
    memory-bound scale path (codes are m ints/vector; raw floats move
    only for shortlist survivors).  Graded via the structural gates
    (see llm_knn_ivf); recall vs brute force asserted in
    tests/test_llm.py.  rerank=30 per the round-10 sf1 soak: at 500k
    uniform 64-dim vectors the default 3*k ADC shortlist gave recall
    0.06; 30*k recovers 0.28 (IVF-level) at NO wall-time cost — the
    shortlist is still only 300 exact-cosine rows per probe at any
    corpus size (plans/NOTES.md round-10 ANN table)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id").between(1, 5))
    res = similarity.knn_l2_pq(emb, probes, k=10, rerank=30)
    return similarity.knn_structural_gates(emb, res, probes, k=10)


@query(
    "llm_embedding_cosine_dup",
    oracle="""
    WITH pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               a.embedding AS va, b.embedding AS vb
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label
         AND b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 50
    ),
    dots AS (
        SELECT id_a, id_b,
               sum(CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)) AS dot,
               sum(CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)) AS na,
               sum(CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)) AS nb
        FROM pairs, generate_series(1, 64) t(i)
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, floor(dot / (sqrt(na) * sqrt(nb)) * 10000 + 0.5) / 10000
               AS cosine
    FROM dots WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.8
    """,
)
def llm_embedding_cosine_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine >= 0.8) over a bounded pair space
    (same label, id within +50) — exact, oracle-checkable."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_dup_pairs(emb, threshold=0.8, window=50)


@query(
    "llm_text_stats",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           floor(sum(length(text) - length(replace(text, ' ', '')) + 1)
                 / count(*) * 10000 + 0.5) / 10000 AS avg_tokens,
           floor(sum(n_chars) / count(*) * 10000 + 0.5) / 10000 AS avg_chars,
           max(n_chars) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer averages snap via sum/count (identical bits both engines)
    — round(avg(int),4) can genuinely tie at 4 decimals when the group
    count carries powers of 2 (n=32: half-integer scaled avgs are a
    coin flip per group), and round() impls then split."""
    d = load_table(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        snap(F.sum(text.n_ws_tokens("text")) / n, 4).alias("avg_tokens"),
        snap(F.sum("n_chars") / n, 4).alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "llm_token_count",
    oracle=r"""
    SELECT doc_id,
           length(text) - length(replace(text, ' ', '')) + 1 AS ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
               AS bpe_ish_tokens
    FROM documents WHERE doc_id < 200
    """,
)
def llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        text.n_ws_tokens("text").alias("ws_tokens"),
        text.n_bpe_ish_tokens("text").alias("bpe_ish_tokens"),
    )


@query(
    "llm_lang_id",
    oracle="""
    SELECT doc_id, lang AS actual_lang,
           CASE WHEN vr < 0.20 THEN 'zh'
                WHEN vr < 0.24 THEN 'de'
                WHEN vr < 0.28 THEN 'en'
                WHEN vr < 0.32 THEN 'es'
                ELSE 'fr' END AS predicted_lang
    FROM (
        SELECT doc_id, lang,
               len(regexp_replace(lower(text), '[^aeiou]', '', 'g'))
                   / greatest(len(text), 1) AS vr
        FROM documents
    )
    """,
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        text.lang_id_heuristic("text").alias("predicted_lang"),
    )


@query(
    "llm_quality_score",
    oracle="""
    SELECT doc_id,
           floor((0.4 * least(1.0,
                      (length(text) - length(replace(text, ' ', '')) + 1) / 100.0)
                  + 0.3 * (len(list_distinct(string_split(text, ' ')))
                           / (length(text) - length(replace(text, ' ', '')) + 1))
                  + 0.3 * (1.0 - length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                                 / greatest(length(text), 1)))
                 * 10000 + 0.5) / 10000 AS quality
    FROM documents
    """,
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", snap(text.quality_score("text"), 4).alias("quality"))


@query(
    "llm_fingerprint",
    oracle="""
    WITH grams AS (
        SELECT doc_id, substr(text, i, 8) AS gram
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(1, greatest(len(text) - 7, 1))) AS i
            FROM documents
            WHERE text IS NOT NULL
        )
    )
    SELECT doc_id, min(md5(gram)) AS fingerprint FROM grams GROUP BY doc_id
    """,
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint: min-md5 over char 8-grams (winnowing
    1-of-k); md5 so the oracle recomputes it exactly.  One row per
    doc_id: duplicate ids take the min fingerprint across their rows
    (groupBy mirrors the oracle's GROUP BY — a per-row select would
    emit duplicates), NULL texts are excluded on both sides."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return d.groupBy("doc_id").agg(
        F.min(text.rolling_fingerprint("text", 8)).alias("fingerprint")
    )


@query(
    "llm_multimodal_cols",
    oracle="""
    SELECT d.doc_id, d.lang, e.label,
           len(e.embedding) AS dim,
           length(d.text) - length(replace(d.text, ' ', '')) + 1 AS n_tokens
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def llm_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row bundle: text + embedding + metadata in one struct
    column (the struct is built then flattened so the oracle can check
    the field values)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    bundled = d.join(e, d.doc_id == e.vec_id).select(
        F.struct(
            d.doc_id,
            "lang",
            "label",
            "embedding",
            text.n_ws_tokens("text").alias("n_tok"),
        ).alias("mm")
    )
    return bundled.select(
        F.col("mm.doc_id").alias("doc_id"),
        F.col("mm.lang").alias("lang"),
        F.col("mm.label").alias("label"),
        F.size("mm.embedding").alias("dim"),
        F.col("mm.n_tok").alias("n_tokens"),
    )


@query(
    "mm_image_features",
    oracle="""
    SELECT doc_id,
           CAST(8 + doc_id % 9 AS INT) AS width,
           CAST(8 + doc_id % 7 AS INT) AS height,
           CAST(3 AS INT) AS channels,
           true AS decoded, true AS luma_in_range
    FROM documents WHERE doc_id < 100
    """,
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode: the synthesized media column carries P6 PPM
    payloads; the mapInPandas kernel parses the container and computes
    dimensions + mean luma over actual pixels (pure numpy — see
    multimodal.py; JPEG/PNG route through the PIL probe and quarantine
    when absent).

    Driver-gradeable (VERDICT r6 #3): the fixture is construction-
    predictable — ppm_payload dims are (8 + doc_id % 9, 8 + doc_id % 7,
    3 channels), so the oracle predicts them EXACTLY from doc_id; mean
    luma over >=192 uniform md5-chain bytes is 0.5 +- 0.021 (1 sigma),
    gated at +-0.15 (~7 sigma — deterministic for any given roll, and
    effectively unflakeable across rolls).  Exact per-pixel luma stays
    pinned in tests/test_llm.py."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = multimodal.attach_media(d)
    feats = multimodal.decode_image_features(media)
    return feats.select(
        "doc_id",
        "width",
        "height",
        "channels",
        F.col("width").isNotNull().alias("decoded"),
        (F.abs(F.col("mean_luma") - 0.5) <= 0.15).alias("luma_in_range"),
    )


@query(
    "mm_audio_frames",
    oracle="""
    SELECT doc_id, CAST(f AS INT) AS frame_idx, true AS rms_in_range
    FROM documents, (VALUES (0), (1), (2), (3)) t(f)
    WHERE doc_id < 50
    """,
)
def mm_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio frame sampling: PCM16 RIFF/WAVE payloads chunk-parsed,
    per-frame RMS computed from the actual samples (multimodal.py).

    Driver-gradeable: the fixture synthesizes exactly 256 uniform int16
    samples -> 4 frames of 64, so the oracle predicts the (doc_id,
    frame_idx) row set exactly; frame RMS of uniform int16 is
    1/sqrt(3) ~ 0.577 +- 0.032 (1 sigma at 64 samples), gated at
    [0.35, 0.80] (~7 sigma).  Exact RMS pinned in tests/test_llm.py."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    media = multimodal.attach_audio(d)
    frames = multimodal.sample_audio_frames(media, n_frames=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.col("rms").between(0.35, 0.80).alias("rms_in_range"),
    )


@query(
    "llm_centroid_per_label",
    oracle="""
    WITH ex AS (
        SELECT label,
               unnest(generate_series(1, len(embedding))) AS ord,
               unnest(embedding) AS v
        FROM embeddings
    )
    SELECT label, ord - 1 AS pos, round(avg(v), 4) + 0 AS centroid_v
    FROM ex GROUP BY label, ord
    """,
)
def llm_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid via posexplode + groupBy(label, pos)
    — the distributed mean-vector (the IVF codebook-training step,
    expressed relationally: the shuffle carries |labels| x dim partial
    sums, never the vectors)."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    # + 0.0 normalizes IEEE -0.0 to 0.0 (centroids of near-zero dims land
    # on it); -0.0 == 0.0 but hash/sort layers may stringify differently
    return ex.groupBy("label", "pos").agg(
        (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("centroid_v")
    )


@query(
    "mm_image_resize",
    oracle="""
    SELECT doc_id,
           CAST(8 + doc_id % 9 AS INT) AS width,
           CAST(8 + doc_id % 7 AS INT) AS height,
           CAST(224 AS INT) AS out_width,
           CAST(224 AS INT) AS out_height,
           CAST(224 * 224 * 3 AS INT) AS out_bytes,
           true AS luma_in_range
    FROM documents WHERE doc_id < 100
    """,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resize of the decoded PPM pixels (numpy
    index maps); emits source dims + resampled byte count and mean
    luma.

    Driver-gradeable: source dims and the 224x224x3 output byte count
    are construction-predicted exactly (see mm_image_features); the
    resampled mean luma replicates the original uniform pixels, gated
    at +-0.15 (~7 sigma).  Exact resample kernel pinned in
    tests/test_llm.py."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = multimodal.attach_media(d)
    out = multimodal.resize_images(media, out_w=224, out_h=224)
    return out.select(
        "doc_id",
        "width",
        "height",
        "out_width",
        "out_height",
        "out_bytes",
        (F.abs(F.col("out_mean_luma") - 0.5) <= 0.15).alias("luma_in_range"),
    )


@query(
    "mm_image_phash",
    oracle="""
    WITH ids AS (
        SELECT DISTINCT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id < 100
    ),
    p AS (SELECT doc_id, doc_id % 50 AS k FROM ids)
    SELECT a.doc_id, true AS well_formed,
           (SELECT MIN(b.doc_id) FROM p b
            WHERE b.k = a.k AND b.doc_id <> a.doc_id) AS partner_doc_id
    FROM p a
    """,
)
def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection by 64-bit perceptual dHash over REAL
    decoded pixels: grayscale -> 9x8 nearest-neighbor downsample ->
    adjacent-cell comparison (pure numpy in mapInPandas — see
    multimodal.dhash64), then the same digest-keyed bucket join the
    text dedup family uses: only (doc_id, 16-char hash) ever leaves the
    task, the pixels never shuffle, and near-dup partners are found by
    grouping on the hash.

    Driver-gradeable by CONSTRUCTION-PLANTED duplicates (the mm_*
    fixture pattern): every distinct doc_id < 100 gets a payload seeded
    by doc_id % 50 with a constant text component, so ids k and k+50
    carry IDENTICAL images — the hash join must pair exactly those
    (partner = the other distinct id with the same id % 50, predicted
    arithmetically by the oracle), while the ~50 distinct payloads must
    NOT collide (md5-chain pixels: 64-bit collision odds ~1e-16; a
    degenerate kernel that hashes everything alike fuses the groups and
    reds the partner column instantly).  Unpaired ids (absent twin on
    small/NULL rolls) yield partner NULL on both sides.  Kernel pinned
    against an independent pure-python dHash in tests/test_llm.py."""
    d = load_table(spark, sf_dir, "documents")
    ids = (
        d.where(F.col("doc_id").isNotNull() & (F.col("doc_id") < 100))
        .select("doc_id")
        .distinct()
    )
    media = multimodal.attach_twin_media(ids, mod=50)
    hashed = multimodal.dhash_images(media)
    a = hashed.alias("a")
    b = hashed.alias("b")
    paired = a.join(
        b,
        (F.col("a.phash") == F.col("b.phash"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
        "left",
    ).groupBy(F.col("a.doc_id").alias("doc_id"), F.col("a.phash")).agg(
        F.min(F.col("b.doc_id")).alias("partner_doc_id")
    )
    # phash IS NULL (undecodable payload) must surface as an explicit
    # false, not a NULL: dhash_images emits NULL hashes on quarantine
    # and a NULL row also silently drops out of the hash self-join, so
    # length(phash)==16 alone would hide a decode regression as an
    # oracle mismatch instead of a red boolean (ADVICE r9 #3).
    return paired.select(
        "doc_id",
        (F.col("phash").isNotNull() & (F.length("phash") == 16)).alias(
            "well_formed"
        ),
        "partner_doc_id",
    )


@query(
    "llm_incremental_dedup",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5
    FROM documents new_docs
    WHERE doc_id > 150
      AND NOT EXISTS (
          SELECT 1 FROM documents corpus
          WHERE corpus.doc_id <= 150 AND md5(corpus.text) = md5(new_docs.text)
      )
    """,
)
def llm_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: new documents anti-joined on content
    hash against the already-ingested corpus — the continuous
    training-data pattern (at 100 TB the corpus side is a hash-bucketed
    table of digests only, so the anti-join shuffles 16-byte keys, never
    text)."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") <= 150).select(
        F.md5(F.col("text").cast("binary")).alias("corpus_md5")
    )
    new_docs = d.filter(F.col("doc_id") > 150).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("text_md5")
    )
    return new_docs.join(
        corpus, new_docs.text_md5 == corpus.corpus_md5, "left_anti"
    )


@query(
    "llm_pipeline_clean",
    oracle="""
    WITH scored AS (
        SELECT doc_id, text, lang, n_chars,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
        FROM documents
    ),
    gated AS (
        SELECT * FROM scored
        WHERE lang IN ('en', 'es') AND n_chars >= 60
          AND n_tokens BETWEEN 8 AND 10000
    ),
    survivors AS (
        -- DISTINCT pins semi-join semantics: a duplicate doc_id whose two
        -- texts BOTH survive would otherwise fan the inner join out
        SELECT DISTINCT doc_id FROM (
            SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)
        )
    )
    SELECT g.doc_id, g.lang, g.n_tokens, g.n_chars
    FROM gated g JOIN survivors USING (doc_id)
    """,
)
def llm_pipeline_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning composed from the J-family primitives:
    language gate -> length/token quality gates -> exact dedup (keep min
    doc_id per content hash).  The shape a training-data prep job
    actually runs; every stage is a narrow filter except the one
    dedup shuffle on the content hash, so at 100 TB the pipeline cost is
    ~one pass over the corpus plus a digest-keyed exchange."""
    d = load_table(spark, sf_dir, "documents")
    gated = (
        d.withColumn("n_tokens", text.n_ws_tokens("text"))
        .filter(
            F.col("lang").isin("en", "es")
            & (F.col("n_chars") >= 60)
            & F.col("n_tokens").between(8, 10000)
        )
    )
    survivors = (
        gated.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return gated.join(survivors, "doc_id", "left_semi").select(
        "doc_id", "lang", "n_tokens", "n_chars"
    )


_MINHASH_CANDIDATES_SQL = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    shingles AS MATERIALIZED (
        -- MATERIALIZED (round 12): llm_minhash_containment references
        -- this a second time (set sizes) — the round-10 rule: DuckDB
        -- 1.0 re-inlines any CTE referenced 2+ times per reference
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
            FROM toks
        )
    ),
    sig AS MATERIALIZED (
        SELECT doc_id,
               min(md5('0' || shingle)) AS mh_0, min(md5('1' || shingle)) AS mh_1,
               min(md5('2' || shingle)) AS mh_2, min(md5('3' || shingle)) AS mh_3,
               min(md5('4' || shingle)) AS mh_4, min(md5('5' || shingle)) AS mh_5,
               min(md5('6' || shingle)) AS mh_6, min(md5('7' || shingle)) AS mh_7,
               CAST(COUNT(*) AS BIGINT) AS sz
        FROM shingles GROUP BY doc_id
    ),
    bands AS MATERIALIZED (
        SELECT doc_id, 0 AS band_idx, mh_0 || '|' || mh_1 AS band_val FROM sig
        UNION ALL SELECT doc_id, 1, mh_2 || '|' || mh_3 FROM sig
        UNION ALL SELECT doc_id, 2, mh_4 || '|' || mh_5 FROM sig
        UNION ALL SELECT doc_id, 3, mh_6 || '|' || mh_7 FROM sig
    ),
    cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        WHERE a.doc_id < b.doc_id
    )
"""


_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")


@query(
    "llm_gopher_filters",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words,
               length(replace(text, ' ', '')) AS n_letters,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_words
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               n_words,
               CAST(n_letters AS DOUBLE) / n_words AS mwl,
               CAST(len(list_filter(words,
                        w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
                   / n_words AS alpha,
               len(list_filter(words,
                   w -> w IN ('the','a','of','to','and','in','is')))
                   AS stop_hits,
               CAST(len(list_distinct(words)) AS DOUBLE) / n_words
                   AS distinct_ratio
        FROM w
    )
    SELECT doc_id, n_words,
           floor(mwl * 10000 + 0.5) / 10000 AS mean_word_len,
           floor(alpha * 10000 + 0.5) / 10000 AS alpha_frac,
           stop_hits,
           floor(distinct_ratio * 10000 + 0.5) / 10000 AS distinct_ratio,
           (n_words >= 20) AS rule_words,
           (mwl BETWEEN 3 AND 8) AS rule_mwl,
           (stop_hits >= 2) AS rule_stop,
           (distinct_ratio >= 0.5) AS rule_rep,
           (n_words >= 20 AND mwl BETWEEN 3 AND 8 AND stop_hits >= 2
            AND distinct_ratio >= 0.5) AS keep
    FROM m
    """,
)
def llm_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style rule-based quality gate: per-document
    word count, mean word length, alphabetic-word fraction, stopword
    hits and distinct-token ratio, each thresholded into a rule flag
    plus the combined keep decision.  Pure per-row array expressions in
    whole-stage codegen — zero shuffles, streams over 100 TB at scan
    speed (the decision column is what a cleaning job filters on).
    Rule set per Rae et al. 2021 (Gopher) §A1.1; thresholds tuned to
    the synthetic corpus so every rule discriminates."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = text.n_ws_tokens("text")
    mwl = F.length(F.translate(F.col("text"), " ", "")) / n_words
    alpha = (
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))) / n_words
    )
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    distinct_ratio = F.size(F.array_distinct(words)) / n_words
    r4 = lambda c: F.floor(c * 10000 + 0.5) / 10000  # noqa: E731
    rule_words = n_words >= 20
    rule_mwl = (mwl >= 3) & (mwl <= 8)
    rule_stop = stop_hits >= 2
    rule_rep = distinct_ratio >= 0.5
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        r4(mwl).alias("mean_word_len"),
        r4(alpha).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        r4(distinct_ratio).alias("distinct_ratio"),
        rule_words.alias("rule_words"),
        rule_mwl.alias("rule_mwl"),
        rule_stop.alias("rule_stop"),
        rule_rep.alias("rule_rep"),
        (rule_words & rule_mwl & rule_stop & rule_rep).alias("keep"),
    )


@query(
    "llm_domain_stats",
    oracle="""
    SELECT source, lang,
           count(*) AS n_docs,
           CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
               AS BIGINT) AS total_tokens,
           floor(sum(n_chars) / count(*) * 10000 + 0.5) / 10000 AS avg_chars,
           floor((1 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*))
                 * 10000 + 0.5) / 10000 AS dup_rate
    FROM documents
    GROUP BY source, lang
    """,
)
def llm_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus mix report — the FineWeb/Dolma-style
    dashboard a data curator reads before weighting domains: doc count,
    token total, average length, exact-dup rate inside the domain.  One
    hash-partial groupBy; the count(DISTINCT md5) expands to the
    standard two-phase plan, so the shuffle carries (domain, digest)
    pairs, never text — scale-safe at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.n_ws_tokens("text")).alias("total_tokens"),
        snap(F.sum("n_chars") / F.count(F.lit(1)), 4).alias("avg_chars"),
        (
            F.floor(
                (
                    1
                    - F.count_distinct(
                        F.md5(F.col("text").cast("binary"))
                    ).cast("double")
                    / F.count(F.lit(1))
                )
                * 10000
                + 0.5
            )
            / 10000
        ).alias("dup_rate"),
    )


@query(
    "llm_topk_ngrams",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               array_to_string((string_split(text, ' '))[i:i+4], ' ') AS ngram
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(
                       1, greatest(len(string_split(text, ' ')) - 4, 1))) AS i
            FROM documents
        )
    )
    SELECT ngram, count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM sh GROUP BY ngram HAVING count(DISTINCT doc_id) >= 3
    """,
)
def llm_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage mining: every word 5-gram occurring in >= 3
    distinct documents, with corpus-wide occurrence and document
    frequencies — the signal memorization/boilerplate audits start
    from.  Explode + one groupBy: partial aggregation absorbs hot
    n-grams map-side, and the exchange carries (ngram, partial-count,
    partial-doc-set-digest) partials, not positions.  At 100 TB add a
    first-stage (ngram, doc) dedup before the count, which is exactly
    what count(DISTINCT doc_id)'s two-phase expansion already plans."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(dedup.word_shingles(d, "text", 5)).alias("ngram"),
    )
    return (
        sh.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 3)
    )


@query(
    "llm_semdedup",
    oracle="""
    WITH pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               a.embedding AS va, b.embedding AS vb
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label
         AND b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 50
    ),
    dots AS (
        SELECT id_a, id_b,
               sum(CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)) AS dot,
               sum(CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)) AS na,
               sum(CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)) AS nb
        FROM pairs, generate_series(1, 64) t(i)
        GROUP BY 1, 2
    ),
    dups AS (
        SELECT DISTINCT id_b FROM dots
        WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.8
    )
    SELECT e.vec_id, e.label,
           (dups.id_b IS NOT NULL) AS is_dup
    FROM embeddings e LEFT JOIN dups ON e.vec_id = dups.id_b
    """,
)
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): drop embeddings whose cosine to an
    earlier vector in the same cluster exceeds 0.8 — semantic dedup the
    pair-listing ops stop short of.  The cluster column stands in for
    the trained k-means codebook (same convention as llm_knn_ivf); the
    pair space is bounded by (cluster, id-window) blocking, so the join
    is never all-pairs, and the final decision is a semi-join of 8-byte
    ids against the corpus — at 100 TB the vectors themselves shuffle
    only within cluster blocks."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_dup_pairs(emb, threshold=0.8, window=50)
    dups = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return emb.join(
        dups.withColumn("is_dup_", F.lit(True)), "vec_id", "left"
    ).select(
        "vec_id",
        "label",
        F.coalesce(F.col("is_dup_"), F.lit(False)).alias("is_dup"),
    )


@query(
    "llm_dedup_apply",
    oracle=_MINHASH_CANDIDATES_SQL.replace("WITH toks", "WITH RECURSIVE toks")
    + """
    ,
    sym AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM cand
        UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    reach AS (
        SELECT DISTINCT a AS node, a AS lbl FROM sym
        UNION
        SELECT s.a, r.lbl FROM sym s JOIN reach r ON r.node = s.b
    ),
    cc AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node),
    dropped AS (SELECT node FROM cc WHERE node <> lbl)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d LEFT JOIN dropped ON d.doc_id = dropped.node
    WHERE dropped.node IS NULL
    """,
)
def llm_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step the near-dup family builds toward: survivors
    after dropping every non-representative member of each MinHash-LSH
    duplicate cluster (representative = min doc_id, via connected
    components).  The drop set is ids only — an 8-byte anti-join
    against the corpus; text never moves beyond the LSH pipeline
    itself.  Chains propose (llm_minhash_near_dedup) -> group
    (llm_dup_clusters) -> drop, each stage scale-bounded."""
    d = load_table(spark, sf_dir, "documents")
    sig = dedup.minhash_signature(d, "doc_id")
    pairs = dedup.lsh_candidate_pairs(sig, "doc_id")
    cc = dedup.connected_components(pairs)
    dropped = cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    return d.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "lang", "source"
    )


@query(
    "llm_minhash_jaccard_est",
    oracle=_MINHASH_CANDIDATES_SQL
    + """
    SELECT c.doc_a, c.doc_b,
           (CAST((sa.mh_0 = sb.mh_0)::INT + (sa.mh_1 = sb.mh_1)::INT
               + (sa.mh_2 = sb.mh_2)::INT + (sa.mh_3 = sb.mh_3)::INT
               + (sa.mh_4 = sb.mh_4)::INT + (sa.mh_5 = sb.mh_5)::INT
               + (sa.mh_6 = sb.mh_6)::INT + (sa.mh_7 = sb.mh_7)::INT
             AS DOUBLE)) / 8 AS est_jaccard
    FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
                JOIN sig sb ON sb.doc_id = c.doc_b
    """,
)
def llm_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-as-ESTIMATOR: for every LSH candidate pair, the estimated
    Jaccard is the fraction of matching signature components — the
    number a dedup pipeline thresholds on when exact verification
    (llm_near_dup_verified) is too expensive to run on every pair.
    Signature join on candidate ids only; k/8 rational arithmetic, so
    the estimate is bit-identical in both engines."""
    d = load_table(spark, sf_dir, "documents")
    # sig is consumed 3x here (the band self-join + both probe sides):
    # localCheckpoint so the shingle explode + 8x md5 census runs once
    # (round 14; 4 documents scans -> 1).  Local to THIS query — the
    # other minhash consumers keep the lazy subtree so their
    # no-text-on-exchange plan pins still see it.
    sig = dedup.minhash_signature(d, "doc_id").localCheckpoint(eager=False)
    cand = dedup.lsh_candidate_pairs(sig, "doc_id")
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"mh_{i}").alias(f"a{i}") for i in range(8)]
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"mh_{i}").alias(f"b{i}") for i in range(8)]
    )
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(8)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches.cast("double") / 8).alias("est_jaccard"),
        )
    )


@query(
    "llm_curriculum_mix",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tok
        FROM documents
    ),
    agg AS (
        SELECT lang, sum(n_tok) AS lang_toks FROM t GROUP BY lang
    ),
    rates AS (
        SELECT lang,
               least(1.0, (30000.0 * CASE lang WHEN 'en' THEN 0.5
                                               WHEN 'es' THEN 0.3
                                               ELSE 0.1 END)
                          / lang_toks) AS rate
        FROM agg
    )
    SELECT t.doc_id, t.lang, t.n_tok,
           floor(r.rate * 10000 + 0.5) / 10000 AS rate,
           ((t.doc_id * 2654435761) % 65536)
               < floor(r.rate * 65536) AS kept
    FROM t JOIN rates r ON t.lang = r.lang
    """,
)
def llm_curriculum_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix (curriculum) sampling: hit a target token budget per
    language (50% en / 30% es / 10% each other) by computing a per-lang
    acceptance rate from the ACTUAL token mass, then keeping documents
    deterministically via a multiplicative integer hash against the
    rate threshold — reproducible across engines/retries, unlike
    rand().  The rate table is |langs| rows (broadcast); the corpus
    takes one groupBy(lang) token count and one broadcast join — the
    data-mixing step every pretraining pipeline runs before packing."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", text.n_ws_tokens("text").alias("n_tok"))
    weight = (
        F.when(F.col("lang") == "en", 0.5)
        .when(F.col("lang") == "es", 0.3)
        .otherwise(0.1)
    )
    rates = (
        t.groupBy("lang")
        .agg(F.sum("n_tok").alias("lang_toks"))
        .select(
            "lang",
            F.least(
                F.lit(1.0), (30000.0 * weight) / F.col("lang_toks")
            ).alias("rate"),
        )
    )
    return t.join(F.broadcast(rates), "lang").select(
        "doc_id",
        "lang",
        "n_tok",
        (F.floor(F.col("rate") * 10000 + 0.5) / 10000).alias("rate"),
        (
            (F.col("doc_id") * F.lit(2654435761)) % 65536
            < F.floor(F.col("rate") * 65536)
        ).alias("kept"),
    )


@query(
    "llm_tfidf_topterms",
    oracle="""
    WITH tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ) GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) AS score
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, tok,
               floor(score * 10000 + 0.5) / 10000 AS score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, tok) AS rnk
        FROM scored
    )
    SELECT doc_id, tok, score, rnk FROM ranked WHERE rnk <= 5
    """,
)
def llm_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per document by TF-IDF with a LINEAR
    idf (N/df instead of log(N/df)) — rational double ops only, so the
    score is bit-identical across engines (libm log is not correctly
    rounded and differs between JVM and C).  Two hash aggregations (tf,
    df) + a df-keyed join + per-doc WindowGroupLimit top-k; the df table
    is |vocab| rows — unhinted (Heaps-bounded, not provably capped; AQE
    broadcasts it while it fits, per the r10 rule); ranking identical
    to log-idf since log is monotone."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df_t is vocabulary-sized (Heaps-bounded, not provably capped) —
    # unhinted per the r10 rule; AQE broadcasts it while it fits
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_t, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            (
                F.col("tf")
                * (F.col("n_docs").cast("double") / F.col("df"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "doc_id",
            "tok",
            (F.floor(F.col("score") * 10000 + 0.5) / 10000).alias("score"),
            "rnk",
        )
    )


@query(
    "llm_near_dup_verified",
    oracle=_MINHASH_CANDIDATES_SQL
    + """
    SELECT doc_a, doc_b, levenshtein(da.text, db.text) AS edit_dist
    FROM cand
    JOIN documents da ON da.doc_id = doc_a
    JOIN documents db ON db.doc_id = doc_b
    WHERE levenshtein(da.text, db.text) <= CAST(0.2 * greatest(length(da.text), length(db.text)) AS INT)
    """,
)
def llm_near_dup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propose-then-verify near-dup: MinHash+LSH proposes candidate pairs
    (never O(n^2)), exact edit distance confirms (<= 20% of the longer
    text).  At 100 TB the verify join touches only |candidates| pairs —
    the LSH bucket width bounds the expensive exact metric."""
    d = load_table(spark, sf_dir, "documents")
    sig = dedup.minhash_signature(d, "doc_id")
    cand = dedup.lsh_candidate_pairs(sig, "doc_id")
    da = d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    db = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    dist = F.levenshtein("text_a", "text_b")
    limit = (0.2 * F.greatest(F.length("text_a"), F.length("text_b"))).cast("int")
    return (
        cand.join(da, "doc_a").join(db, "doc_b")
        .filter(dist <= limit)
        .select("doc_a", "doc_b", dist.alias("edit_dist"))
    )


@query(
    "mm_video_frames",
    oracle="""
    SELECT doc_id,
           CAST(6 AS INT) AS n_frames,
           CAST(f AS INT) AS frame_idx,
           CAST(8 + doc_id % 5 AS INT) AS width,
           CAST(8 + doc_id % 3 AS INT) AS height,
           true AS luma_in_range
    FROM documents, (VALUES (0), (2), (4)) t(f)
    WHERE doc_id < 60
    """,
)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling: the media column carries a
    concatenated-P6 container (each frame a complete image); the
    mapInPandas kernel walks the container by exact per-frame byte
    arithmetic, keeps every 2nd frame, and computes dims + mean luma
    from the actual pixels (multimodal.py).  Completes the multimodal
    trio (image features / audio frames / video frame-sample) with the
    same quarantine convention for foreign codecs.

    Driver-gradeable: video_payload synthesizes exactly 6 frames of
    (8 + doc_id % 5) x (8 + doc_id % 3), so the kept-frame row set
    (every 2nd: 0, 2, 4) and dims are oracle-predicted exactly; frame
    mean luma over >=192 uniform bytes gated at +-0.15 (~7 sigma).
    Exact frame walk pinned in tests/test_llm.py."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    media = multimodal.attach_video(d)
    frames = multimodal.sample_video_frames(media, every=2)
    return frames.select(
        "doc_id",
        "n_frames",
        "frame_idx",
        "width",
        "height",
        (F.abs(F.col("mean_luma") - 0.5) <= 0.15).alias("luma_in_range"),
    )


_CONTAIN = "floor((CAST(cont_num AS DOUBLE) / CAST(cont_den AS DOUBLE)) * 10000 + 0.5) / 10000"


@query(
    "llm_minhash_containment",
    oracle=_MINHASH_CANDIDATES_SQL.rstrip()
    + """,
    scored AS (
        -- set sizes ride the sig CTE (round-12: a separate sizes CTE
        -- meant 2 extra 4M-pair joins at sf1 — the sig rows already
        -- group the exact shingle sets being sized)
        SELECT c.doc_a, c.doc_b, sa.sz AS size_a, sb.sz AS size_b,
               CAST((sa.mh_0 = sb.mh_0)::INT + (sa.mh_1 = sb.mh_1)::INT
                  + (sa.mh_2 = sb.mh_2)::INT + (sa.mh_3 = sb.mh_3)::INT
                  + (sa.mh_4 = sb.mh_4)::INT + (sa.mh_5 = sb.mh_5)::INT
                  + (sa.mh_6 = sb.mh_6)::INT + (sa.mh_7 = sb.mh_7)::INT
                 AS BIGINT) AS k_match
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.doc_a
        JOIN sig sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, size_a, size_b, k_match,
           CAST(k_match * (size_a + size_b) AS BIGINT) AS cont_num,
           CAST((8 + k_match) * size_a AS BIGINT) AS cont_den,
           """
    + _CONTAIN
    + """ + 0 AS est_containment
    FROM scored
    """,
)
def llm_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash CONTAINMENT estimator for every LSH candidate pair: how
    much of doc_a's shingle set lives inside doc_b — the asymmetric
    dedup signal (quote/superset detection) Jaccard can't give.  From
    the Jaccard identity |∩| = J·(|A|+|B|)/(1+J) with J estimated as
    k/8 matching signature components, the containment
    |∩|/|A| = k·(|A|+|B|) / ((8+k)·|A|) is a PURE INTEGER fraction of
    the exact distinct-shingle set sizes — numerator and denominator
    are EXPOSED exact int64s (the agg_cohen_kappa convention) and the
    convenience ratio is one snapped division.  Shuffle shape: the
    signature/LSH pipeline is llm_minhash_near_dedup's (digest-only
    exchanges, candidates only within buckets); set sizes ride the
    same shingle explode as a second map-side-combined groupBy; all
    joins are id-keyed."""
    d = load_table(spark, sf_dir, "documents")
    dd = d.filter(F.col("text").isNotNull())
    dd = dedup._spread(dd, "doc_id")
    # ONE shingle explode feeds signature AND set size (count rides the
    # same map-side-combined groupBy), localCheckpointed because it is
    # consumed three times (both pair sides + the LSH band builder) —
    # without the fused pass the shingle pipeline re-evaluated ~6x and
    # the sf1 soak read 83 s
    sh = dd.select(
        "doc_id",
        F.explode(F.array_distinct(dedup.word_shingles(dd))).alias("shingle"),
    ).distinct()
    # ^ the pair-level distinct matters on DUPLICATE-doc_id rolls: the
    # in-array array_distinct dedups per ROW, but a dup id's rows can
    # repeat a shingle across rows and the size census must count the
    # per-doc UNION exactly once (the oracle's DISTINCT (doc_id,
    # shingle)) — found by the round-12 nulls-roll parity sweep.  On
    # unique-id rolls this is a semantic no-op (per-row arrays are
    # already distinct), and the signature mins never cared.
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(
                    F.concat(F.lit(str(i)), F.col("shingle")).cast("binary")
                )
            ).alias(f"mh_{i}")
            for i in range(8)
        ],
        F.count(F.lit(1)).alias("sz"),
    )
    sig = sig.localCheckpoint(eager=True)
    cand = dedup.lsh_candidate_pairs(sig, "doc_id")
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sz").alias("size_a"),
        *[F.col(f"mh_{i}").alias(f"a{i}") for i in range(8)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sz").alias("size_b"),
        *[F.col(f"mh_{i}").alias(f"b{i}") for i in range(8)],
    )
    k_match = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(8)
    ).cast("long")
    scored = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "size_a",
            "size_b",
            k_match.alias("k_match"),
        )
    )
    return scored.select(
        "doc_a",
        "doc_b",
        "size_a",
        "size_b",
        "k_match",
        (F.col("k_match") * (F.col("size_a") + F.col("size_b"))).alias(
            "cont_num"
        ),
        ((F.lit(8) + F.col("k_match")) * F.col("size_a")).alias("cont_den"),
        (F.expr(_CONTAIN) + F.lit(0.0)).alias("est_containment"),
    )


_CORPUS_RELEASE_SQL = """
    WITH rows0 AS (
        SELECT doc_id, lang, source,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tok,
               md5(text) AS digest,
               string_split(text, ' ') AS words,
               length(replace(text, ' ', '')) AS n_letters
        FROM documents WHERE text IS NOT NULL
    ),
    flags AS (
        SELECT doc_id, lang, source, n_tok, digest,
               (n_tok >= 20
                AND (CAST(n_letters AS DOUBLE) / greatest(n_tok, 1))
                    BETWEEN 3 AND 8
                AND len(list_filter(words,
                        w -> w IN ('the','a','of','to','and','in','is')))
                    >= 2
                AND (CAST(len(list_distinct(words)) AS DOUBLE)
                     / greatest(n_tok, 1))
                    >= 0.5) AS keep
        FROM rows0
    ),
    canon AS (
        SELECT doc_id, lang, source, n_tok, digest, keep FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY digest, lang NULLS FIRST,
                                source NULLS FIRST) AS rn
            FROM flags
        ) WHERE rn = 1
    ),
    exact AS MATERIALIZED (
        SELECT doc_id, lang, source, n_tok, digest FROM (
            SELECT *, row_number() OVER (PARTITION BY digest
                       ORDER BY doc_id) AS rn
            FROM canon WHERE keep
        ) WHERE rn = 1
    ),
    toks AS (
        SELECT e.doc_id, string_split(d.text, ' ') AS t
        FROM exact e JOIN (SELECT DISTINCT doc_id, text FROM documents) d
          ON d.doc_id = e.doc_id AND md5(d.text) = e.digest
    ),
    shingles AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
            FROM toks
        )
    ),
    sig AS MATERIALIZED (
        SELECT doc_id,
               min(md5('0' || shingle)) AS mh_0,
               min(md5('1' || shingle)) AS mh_1,
               min(md5('2' || shingle)) AS mh_2,
               min(md5('3' || shingle)) AS mh_3,
               min(md5('4' || shingle)) AS mh_4,
               min(md5('5' || shingle)) AS mh_5,
               min(md5('6' || shingle)) AS mh_6,
               min(md5('7' || shingle)) AS mh_7
        FROM shingles GROUP BY doc_id
    ),
    bands AS MATERIALIZED (
        SELECT doc_id, 0 AS band_idx, mh_0 || '|' || mh_1 AS band_val
        FROM sig
        UNION ALL SELECT doc_id, 1, mh_2 || '|' || mh_3 FROM sig
        UNION ALL SELECT doc_id, 2, mh_4 || '|' || mh_5 FROM sig
        UNION ALL SELECT doc_id, 3, mh_6 || '|' || mh_7 FROM sig
    ),
    dropped AS (
        SELECT DISTINCT b.doc_id
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    ),
    survivors AS (
        SELECT e.doc_id, e.lang, e.source, e.n_tok
        FROM exact e LEFT JOIN dropped x ON e.doc_id = x.doc_id
        WHERE x.doc_id IS NULL
    ),
    rated AS (
        SELECT doc_id, lang, source, n_tok,
               least(1.0, (30000.0 * CASE lang WHEN 'en' THEN 0.5
                                               WHEN 'es' THEN 0.3
                                               ELSE 0.1 END)
                     / CAST(sum(n_tok) OVER (PARTITION BY lang) AS BIGINT))
                   AS rate_raw
        FROM survivors
    )
    -- kept/shard read rate_raw (unrounded, matching Spark); the
    -- snapped output gets the 'rate' name only here, so no alias can
    -- shadow a column the same SELECT still reads (ADVICE r13)
    SELECT doc_id, lang, source, n_tok,
           floor(rate_raw * 10000 + 0.5) / 10000 AS rate,
           ((doc_id * 2654435761) % 65536)
               < floor(rate_raw * 65536) AS kept,
           CAST((doc_id * 2654435761) % 4294967296 % 16 AS INTEGER) AS shard
    FROM rated
"""


@query("pipeline_corpus_release", oracle=_CORPUS_RELEASE_SQL)
def pipeline_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-release composite (VERDICT r12 #6) — the
    LLM-pipeline analog of pipeline_tape_to_corpus: Gopher quality
    gates -> exact dedup apply -> MinHash-LSH near-dedup apply ->
    curriculum-mix sampling -> shard assignment, composed as ONE
    DataFrame DAG (no driver loop; one localCheckpoint bounds the
    shared survivor stage like ts_funnel's).

    Scale shape, stage by stage:
    - digests, token counts, and every Gopher flag compute MAP-SIDE on
      the scan; ``text`` is dropped before the first exchange, so NO
      exchange in the whole plan carries raw text (plan-pinned in
      tests/test_scale_plans.py) — the pipeline_tape_to_corpus rule;
    - dup-id canonicalization reuses the content digest as the
      representative order (canonical_docs semantics without re-keying
      on text), one doc_id-keyed window exchange;
    - exact dedup = min-doc_id row_number per digest (digest-keyed
      exchange, 32-hex + ids only);
    - near-dedup signatures aggregate per (doc_id, digest) from the
      same scan — shingles explode map-side, the exchange carries
      8 md5 partial-mins per doc — then semi-join the exact survivors
      (8-byte + digest keys).  Drop policy is PAIRWISE-GREEDY: any doc
      that is the GREATER member of an LSH candidate pair drops (vs
      llm_dedup_apply's connected-components min-label: the pairwise
      policy needs no iteration, keeping the composite a single DAG;
      on chain-shaped clusters it can keep one more member per chain —
      both are standard, the policy difference is deliberate and
      documented here);
    - curriculum rates use the llm_curriculum_mix shape: a map-side-
      combined groupBy(lang) collapses survivors to a |langs|-row rate
      table that broadcast-joins back (eqNullSafe so NULL-lang rows
      survive) — NEVER a window partitioned by the ~3-value lang key,
      which would funnel the whole corpus through |langs| partitions
      at 100x (VERDICT r13 #2); keep decisions via the deterministic
      multiplicative hash (llm_curriculum_mix), shard via the Knuth
      hash mod 16 (llm_shard_assign).
    Output: every release survivor with its sampling rate, keep
    decision, and shard — the manifest a release job writes."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    words = F.split(F.col("text"), " ")
    n_tok = text.n_ws_tokens("text")
    # n_ws_tokens is >= 1 by construction for non-null text, so the
    # greatest() guards below are value-neutral — they exist to honor
    # the repo-wide round-4 rule (every ratio denominator wears the
    # ANSI divide-by-zero guard on BOTH sides, CLAUDE.md)
    n_tok_g = F.greatest(n_tok, F.lit(1))
    mwl = F.length(F.translate(F.col("text"), " ", "")) / n_tok_g
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    distinct_ratio = F.size(F.array_distinct(words)) / n_tok_g
    keep = (
        (n_tok >= 20)
        & (mwl >= 3)
        & (mwl <= 8)
        & (stop_hits >= 2)
        & (distinct_ratio >= 0.5)
    )
    rows = d.select(
        "doc_id",
        "lang",
        "source",
        n_tok.alias("n_tok"),
        F.md5(F.col("text").cast("binary")).alias("digest"),
        keep.alias("keep"),
    )
    w_id = Window.partitionBy("doc_id").orderBy(
        F.col("digest").asc(),
        F.col("lang").asc_nulls_first(),
        F.col("source").asc_nulls_first(),
    )
    canon = (
        rows.withColumn("_rn", F.row_number().over(w_id))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w_dig = Window.partitionBy("digest").orderBy(F.col("doc_id").asc())
    exact = (
        canon.filter("keep")
        .drop("keep")
        .withColumn("_rn", F.row_number().over(w_dig))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        # consumed twice (signature semi-join + final anti-join); the
        # checkpoint bounds the re-compute to this id/digest table —
        # ~50 bytes/doc, never text (the MATERIALIZED-CTE twin rule)
        .localCheckpoint()
    )
    # map-side gate replay: docs failing the Gopher rules never reach
    # the shingle explode (the gate is row-local, so re-evaluating it
    # here costs nothing and cuts the explode to gated docs only)
    sh = d.filter(keep).select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("digest"),
        F.explode(
            F.array_distinct(dedup.word_shingles(d, "text", 3))
        ).alias("shingle"),
    )
    sig = sh.groupBy("doc_id", "digest").agg(
        *[
            F.min(
                F.md5(
                    F.concat(F.lit(str(i)), F.col("shingle")).cast("binary")
                )
            ).alias(f"mh_{i}")
            for i in range(8)
        ]
    )
    sig_kept = sig.join(
        exact.select("doc_id", "digest"), ["doc_id", "digest"]
    ).drop("digest")
    pairs = dedup.lsh_candidate_pairs(sig_kept, "doc_id")
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = exact.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_tok"
    )
    # survivors is consumed twice below (lang token-mass aggregate +
    # rate-join probe).  Both consumptions duplicate the LSH subtree
    # VERBATIM, so exchange reuse (spark.sql.exchange.reuse, on by
    # default) runs every shuffle map stage once — only the post-
    # exchange local anti-join probe replays, no extra scan or
    # exchange.  Keeping it lazy (vs a localCheckpoint) also keeps the
    # whole DAG in ONE plan so the no-text-on-any-exchange pin can see
    # every exchange (tests/test_scale_plans.py).
    # curriculum rates via the llm_curriculum_mix shape (VERDICT r13
    # #2): map-side-combined groupBy(lang) to a |langs|-row table +
    # broadcast rate join — never an unbounded window partitioned by a
    # ~3-value key, which would funnel the whole corpus through |langs|
    # window partitions at 100x.  eqNullSafe keeps NULL-lang survivors
    # (the oracle's window treats NULL as its own partition).
    rates = F.broadcast(
        survivors.groupBy(F.col("lang").alias("_lang"))
        .agg(F.sum("n_tok").alias("lang_toks"))
        .select(
            "_lang",
            F.least(
                F.lit(1.0),
                (
                    30000.0
                    * F.when(F.col("_lang") == "en", 0.5)
                    .when(F.col("_lang") == "es", 0.3)
                    .otherwise(0.1)
                )
                / F.col("lang_toks"),
            ).alias("rate"),
        )
    )
    rated = survivors.join(
        rates, F.col("lang").eqNullSafe(F.col("_lang"))
    ).select("doc_id", "lang", "source", "n_tok", "rate")
    return rated.select(
        "doc_id",
        "lang",
        "source",
        "n_tok",
        (F.floor(F.col("rate") * 10000 + 0.5) / 10000).alias("rate"),
        (
            (F.col("doc_id") * F.lit(2654435761)) % 65536
            < F.floor(F.col("rate") * 65536)
        ).alias("kept"),
        (
            (F.col("doc_id") * F.lit(2654435761))
            % F.lit(4294967296)
            % F.lit(16)
        )
        .cast("int")
        .alias("shard"),
    )


@query(
    "mm_phash_near_dedup",
    oracle="""
    WITH ids AS (
        SELECT DISTINCT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id < 100
    ),
    p AS (SELECT doc_id, doc_id % 50 AS k FROM ids)
    SELECT a.doc_id, true AS well_formed,
           (SELECT MIN(b.doc_id) FROM p b
            WHERE b.k = a.k AND b.doc_id <> a.doc_id) AS partner_doc_id,
           EXISTS(SELECT 1 FROM p b
                  WHERE b.k = a.k AND b.doc_id <> a.doc_id) AS is_near_dup
    FROM p a
    """,
)
def mm_phash_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image NEAR-dup detection under perturbation — the scale pattern
    exact-hash grouping (mm_image_phash) cannot express: twins carry
    ALMOST-identical pixels (<= 2 dhash bits apart by construction,
    multimodal.near_twin_payload), so equality grouping finds nothing
    and the pipeline must band the 64-bit dhash into 4x16-bit LSH
    buckets (a <= 2-bit difference leaves >= 2 bands intact), join on
    band equality, and confirm candidates with an exact hamming
    distance <= 4 computed from the SAME banded 16-bit ints
    (bit_count(xor) per band — never a 64-bit hex parse, which
    overflows signed conv; the round-6 md5-hex-slice rule).  Pixels
    never shuffle: only (doc_id, 16-hex dhash) leaves the decode task,
    the band exchange carries 4-hex slices, and the hamming filter runs
    on candidate pairs only — the llm_simhash shape on a multimodal
    digest.  Distinct base images differ in ~32 bits, so a chance band
    collision (~7% per roll across the 50x49/2 pairs) is killed by the
    hamming gate (P[<=4 of 64] ~ 3e-14).  Graded by construction: the
    planted partner (the other id with the same id % 50) is predicted
    arithmetically by the oracle; a degenerate kernel that hashes
    everything alike pairs wrong partners, a broken band join pairs
    none."""
    d = load_table(spark, sf_dir, "documents")
    ids = (
        d.where(F.col("doc_id").isNotNull() & (F.col("doc_id") < 100))
        .select("doc_id")
        .distinct()
    )
    media = multimodal.attach_near_twin_media(ids, mod=50)
    hashed = multimodal.dhash_images(media).localCheckpoint(eager=True)
    bands = hashed.where(F.col("phash").isNotNull()).select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.substring("phash", 1 + 4 * b, 4).alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bd"),
    ).select("doc_id", "phash", "bd.band_idx", "bd.band_val")
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("ph_a"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("ph_b"),
        "band_idx",
        "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "ph_a", "doc_b", "ph_b")
        .distinct()
    )
    ham = sum(
        F.bit_count(
            F.conv(F.substring("ph_a", 1 + 4 * i, 4), 16, 10)
            .cast("int")
            .bitwiseXOR(
                F.conv(F.substring("ph_b", 1 + 4 * i, 4), 16, 10).cast("int")
            )
        )
        for i in range(4)
    )
    near = (
        cand.where(ham <= 4)
        .groupBy(F.col("doc_a").alias("doc_id"))
        .agg(F.min("doc_b").alias("partner_doc_id"))
    )
    return hashed.join(near, "doc_id", "left").select(
        "doc_id",
        (F.col("phash").isNotNull() & (F.length("phash") == 16)).alias(
            "well_formed"
        ),
        "partner_doc_id",
        F.col("partner_doc_id").isNotNull().alias("is_near_dup"),
    )


@query(
    "mm_audio_fingerprint",
    oracle="""
    WITH ids AS (
        SELECT DISTINCT doc_id FROM documents
        WHERE doc_id IS NOT NULL AND doc_id < 100
    ),
    p AS (SELECT doc_id, doc_id % 50 AS k FROM ids)
    SELECT a.doc_id, true AS well_formed,
           (SELECT MIN(b.doc_id) FROM p b
            WHERE b.k = a.k AND b.doc_id <> a.doc_id) AS partner_doc_id,
           EXISTS(SELECT 1 FROM p b
                  WHERE b.k = a.k AND b.doc_id <> a.doc_id) AS is_near_dup
    FROM p a
    """,
)
def mm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio NEAR-dup detection (VERDICT r13 #6) — the audio leg of the
    cross-modal near-dup trio: text has MinHash-LSH
    (llm_minhash_near_dedup), images have hamming-banded dhash
    (mm_phash_near_dedup, round 13), and this op applies the identical
    Spark shape to a per-frame energy-delta fingerprint of the PCM16
    WAVE kernel (multimodal.afp64: 65 frames, exact int64 energies,
    bit i = energy[i+1] > energy[i]).  Twins carry ALMOST-identical
    samples (<= 1 afp64 bit apart by construction,
    multimodal.near_twin_wav_payload), so equality grouping finds
    nothing and the pipeline bands the 64-bit fingerprint into 4x16-bit
    LSH buckets (a <= 1-bit difference leaves >= 3 bands intact), joins
    on band equality, and confirms candidates with an exact hamming
    distance <= 4 computed from the SAME banded 16-bit ints
    (bit_count(xor) per band — never a 64-bit hex parse, which
    overflows signed conv; the round-6 md5-hex-slice rule).  Samples
    never shuffle: only (doc_id, 16-hex afp) leaves the decode task,
    the band exchange carries 4-hex slices, and the hamming filter runs
    on candidate pairs only.  Distinct base clips differ in ~32 bits
    (independent md5-chain energies compare like fair coins), so a
    chance band collision (~7% per roll across the 50x49/2 pairs) is
    killed by the hamming gate (P[<=4 of 64] ~ 3e-14).  Graded by
    construction: the planted partner (the other id with the same
    id % 50) is predicted arithmetically by the oracle; a degenerate
    kernel that fingerprints everything alike pairs wrong partners, a
    broken band join pairs none."""
    d = load_table(spark, sf_dir, "documents")
    ids = (
        d.where(F.col("doc_id").isNotNull() & (F.col("doc_id") < 100))
        .select("doc_id")
        .distinct()
    )
    media = multimodal.attach_near_twin_audio(ids, mod=50)
    printed = multimodal.fingerprint_audio(media).localCheckpoint(eager=True)
    bands = printed.where(F.col("afp").isNotNull()).select(
        "doc_id",
        "afp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.substring("afp", 1 + 4 * b, 4).alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bd"),
    ).select("doc_id", "afp", "bd.band_idx", "bd.band_val")
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("afp").alias("fp_a"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("afp").alias("fp_b"),
        "band_idx",
        "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "fp_a", "doc_b", "fp_b")
        .distinct()
    )
    ham = sum(
        F.bit_count(
            F.conv(F.substring("fp_a", 1 + 4 * i, 4), 16, 10)
            .cast("int")
            .bitwiseXOR(
                F.conv(F.substring("fp_b", 1 + 4 * i, 4), 16, 10).cast("int")
            )
        )
        for i in range(4)
    )
    near = (
        cand.where(ham <= 4)
        .groupBy(F.col("doc_a").alias("doc_id"))
        .agg(F.min("doc_b").alias("partner_doc_id"))
    )
    return printed.join(near, "doc_id", "left").select(
        "doc_id",
        (F.col("afp").isNotNull() & (F.length("afp") == 16)).alias(
            "well_formed"
        ),
        "partner_doc_id",
        F.col("partner_doc_id").isNotNull().alias("is_near_dup"),
    )


@query(
    "llm_dup_clusters_ls",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
            FROM toks
        )
    ),
    sig AS MATERIALIZED (
        SELECT doc_id,
               min(md5('0' || shingle)) AS mh_0, min(md5('1' || shingle)) AS mh_1,
               min(md5('2' || shingle)) AS mh_2, min(md5('3' || shingle)) AS mh_3,
               min(md5('4' || shingle)) AS mh_4, min(md5('5' || shingle)) AS mh_5,
               min(md5('6' || shingle)) AS mh_6, min(md5('7' || shingle)) AS mh_7
        FROM shingles GROUP BY doc_id
    ),
    bands AS MATERIALIZED (
        SELECT doc_id, 0 AS band_idx, mh_0 || '|' || mh_1 AS band_val FROM sig
        UNION ALL SELECT doc_id, 1, mh_2 || '|' || mh_3 FROM sig
        UNION ALL SELECT doc_id, 2, mh_4 || '|' || mh_5 FROM sig
        UNION ALL SELECT doc_id, 3, mh_6 || '|' || mh_7 FROM sig
    ),
    pairs AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        WHERE a.doc_id < b.doc_id
    ),
    sym AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
        SELECT DISTINCT a AS node, a AS lbl FROM sym
        UNION
        SELECT s.a, r.lbl FROM sym s JOIN reach r ON r.node = s.b
    ),
    cc AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node)
    SELECT node AS doc_id, lbl AS cluster_id,
           count(*) OVER (PARTITION BY lbl) AS n_members
    FROM cc
    """,
)
def llm_dup_clusters_ls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm_dup_clusters via LARGE-STAR/SMALL-STAR alternation
    (dedup.connected_components_ls; Kiveris et al. SoCC'14) instead of
    min-label propagation (VERDICT r13 #7).  Same LSH candidate pairs,
    same output contract, same recursive-CTE oracle — the difference is
    the round bound: min-label needs O(diameter) rounds and
    connected_components' own docstring names chain-shaped clusters as
    its weakness (a 64-node chain exhausts its 20-round cap); the
    star alternation converges in O(log n) rounds on the same
    join+groupBy(min) per-round shape (the long-chain round-count pin
    lives in tests/test_round14_ops.py).  On real near-dup blobs
    (diameter 2-4) both are 2-3 rounds; at 100 TB the ls variant is the
    safe default because cluster shape is input-controlled."""
    d = load_table(spark, sf_dir, "documents")
    sig = dedup.minhash_signature(d, "doc_id")
    pairs = dedup.lsh_candidate_pairs(sig, "doc_id")
    cc = dedup.connected_components_ls(pairs)
    w = Window.partitionBy("cluster_id")
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("n_members"),
    )


@query(
    "mm_video_scene_cut",
    oracle="""
    SELECT doc_id, 8 AS n_frames, 2 AS n_cuts, '3,6' AS cut_frames
    FROM (SELECT DISTINCT doc_id FROM documents
          WHERE doc_id IS NOT NULL AND doc_id < 60)
    """,
)
def mm_video_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-cut detection (round 14) — the temporal analog of
    the image/audio fingerprint family: walk the concatenated-P6
    container, compute the EXACT integer sum of absolute pixel
    differences between consecutive frames, and flag a cut when the
    mean per-byte delta exceeds a fixed threshold (32/255).  The
    fixture plants scene structure by construction
    (multimodal.scene_video_payload: scenes (3,3,2), in-scene frames
    <= 2 bytes apart, cross-scene frames independent uniform bytes —
    the threshold sits >= 12 sigma from both populations), so the
    oracle predicts the cut set arithmetically: every video has 8
    frames and cuts entering frames 3 and 6.  A degenerate kernel that
    diffs nothing finds 0 cuts; one that over-fires finds 7; a broken
    frame walk quarantines (NULL counts) and fails row-match.  Scale
    shape: the decode task emits (id, 2 ints, a short string) — pixels
    never shuffle, and there is no exchange at all beyond the scan
    (per-row mapInPandas)."""
    d = load_table(spark, sf_dir, "documents")
    ids = (
        d.where(F.col("doc_id").isNotNull() & (F.col("doc_id") < 60))
        .select("doc_id")
        .distinct()
    )
    media = multimodal.attach_scene_video(ids)
    return multimodal.detect_scene_cuts(media, threshold=32)
