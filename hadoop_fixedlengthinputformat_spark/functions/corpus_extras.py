"""Corpus-analysis extras for the LLM data pipeline (round 3 widening).

Four operators a training-data curation run needs beyond the round-1/2
dedup + quality families: collocation mining (PMI), passage-level exact
dedup, deterministic holdout splitting, and winnowing fingerprints
(Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS local document
fingerprinting algorithm).

Cross-engine determinism (plans/NOTES.md round-3 rules):
  * token arrays come from single-space splits (the llm_topk_ngrams
    convention — Spark ``split`` and DuckDB ``string_split`` agree on
    every text without regex/array-edge divergence risk),
  * every ranking/score is either exact integer arithmetic or ONE
    double division of bit-identical int64s — no transcendentals, so
    nothing to snap,
  * content hashes are md5 hex (identical bytes-in → identical hex on
    both engines; lowercase on both).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


def _tok(col: str = "text"):
    return F.split(F.col(col), " ")


# --------------------------------------------------------------------------
# PMI collocations
# --------------------------------------------------------------------------

@query(
    "llm_pmi_bigrams",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    uc AS (
        SELECT w, count(*) AS c
        FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w
    ),
    bi AS (
        SELECT unnest(list_transform(
                   range(1, len(t)),
                   i -> t[i] || ' ' || t[i + 1]
               )) AS bg
        FROM tok
    ),
    bc_all AS (
        SELECT string_split(bg, ' ')[1] AS w1,
               string_split(bg, ' ')[2] AS w2,
               count(*) AS c_xy
        FROM bi GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST((SELECT sum(c) FROM uc) AS BIGINT) AS n_uni,
               CAST((SELECT sum(c_xy) FROM bc_all) AS BIGINT) AS n_bi
    )
    SELECT b.w1, b.w2, b.c_xy,
           ((CAST(b.c_xy AS DOUBLE) / t.n_bi)
            * (CAST(t.n_uni AS DOUBLE) / u1.c))
               * (CAST(t.n_uni AS DOUBLE) / u2.c) AS lift
    FROM bc_all b
    CROSS JOIN tot t
    JOIN uc u1 ON u1.w = b.w1
    JOIN uc u2 ON u2.w = b.w2
    WHERE b.c_xy >= 5
    """,
)
def llm_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: for every bigram with corpus frequency >= 5,
    the PMI lift  P(xy) / (P(x)·P(y))  =  (c_xy/B)·(N/c_x)·(N/c_y).

    Every operand is an int64 COUNT cast to double individually, and
    the three exactly-rounded divisions + two multiplications run in
    ONE pinned order shared verbatim with the oracle — bit-identical
    without snapping (exp(PMI) is a monotone transform of PMI;
    consumers thresholding on PMI threshold on lift instead).  The
    round-8 sf1 soak retired two earlier formulations here: the
    original int64 product c_xy·N² overflowed at a 3e7-token corpus
    (Spark ANSI raised ARITHMETIC_OVERFLOW), and the DECIMAL/HUGEINT
    repair exposed a 1-ulp seam between Spark's Decimal→double and
    DuckDB's HUGEINT→double casts on >2^63 values — factored counts
    never leave int64, at ANY corpus size.  Plan: one explode + two
    groupBys for the count tables; the unigram table is vocabulary-
    sized, so AQE broadcasts both count joins from their shuffle-stage
    stats (unhinted — Heaps-bounded, not provably capped), and the
    scalar totals ride a broadcast nested loop of one row — the corpus
    itself is read once and never re-shuffled."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", _tok().alias("t"))
    uni = tok.select(F.explode("t").alias("w"))
    # count tables are consumed 3x (totals + two join probes) / 2x
    # (total + filtered join side): localCheckpoint both so the corpus
    # is read once per census instead of once per consumer (round 14:
    # 5 documents scans -> 2).  Both tables are count-collapsed —
    # vocabulary-sized, never corpus-sized.
    uc = (
        uni.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    # Guard single-token docs: sequence(1, 0) would DESCEND in Spark.
    bigrams = tok.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("t", i), F.element_at("t", i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg")
    )
    bc_all = (
        bigrams.select(
            F.split("bg", " ").getItem(0).alias("w1"),
            F.split("bg", " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .localCheckpoint(eager=False)
    )
    n_uni = uc.agg(F.sum("c").alias("n_uni"))
    n_bi = bc_all.agg(F.sum("c_xy").alias("n_bi"))
    bc = bc_all.filter(F.col("c_xy") >= 5)
    # The unigram tables are Heaps-bounded for natural language but not
    # provably capped (adversarial token soups grow them with the
    # corpus), so they carry NO forced broadcast hint (VERDICT r9 #3):
    # AQE broadcasts them from the groupBy stage stats while they fit
    # and degrades to a shuffle join instead of an OOM when they don't.
    # Only the two 1-row scalar totals keep hints (provably capped).
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        bc.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            "c_xy",
            (
                (
                    (F.col("c_xy").cast("double") / F.col("n_bi"))
                    * (F.col("n_uni").cast("double") / F.col("c1"))
                )
                * (F.col("n_uni").cast("double") / F.col("c2"))
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Passage-level exact dedup
# --------------------------------------------------------------------------

@query(
    "llm_passage_dedup",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    chunks AS (
        SELECT DISTINCT doc_id,
               md5(array_to_string(list_slice(t, i * 20 + 1, i * 20 + 20), ' '))
                   AS h
        FROM (
            SELECT doc_id, t,
                   unnest(range(0, CAST(ceil(len(t) / 20.0) AS BIGINT))) AS i
            FROM tok
        )
    )
    SELECT h, count(*) AS n_docs
    FROM chunks GROUP BY h HAVING count(*) >= 2
    """,
)
def llm_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup: split every document into
    non-overlapping 20-token passages, hash each, and report passages
    shared by >= 2 distinct documents — the sub-document boilerplate
    (license headers, navigation chrome) that document-level
    ``llm_exact_dedup`` can't see.  Per-doc chunking is array
    arithmetic inside codegen (no explode until the chunk hashes, which
    are 1/20th the token count); one (h, doc_id)-distinct + one count
    groupBy — both map-side combined.  At 100 TB the passage-hash
    exchange is the only data movement, carrying 16-byte digests."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", _tok().alias("t"))
    n_chunks = F.ceil(F.size("t") / F.lit(20.0)).cast("int")
    chunks = tok.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.md5(
                    F.concat_ws(
                        " ", F.slice("t", i * 20 + 1, 20)
                    ).cast("binary")
                ),
            )
        ).alias("h"),
    ).distinct()
    return (
        chunks.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


# --------------------------------------------------------------------------
# Deterministic holdout split
# --------------------------------------------------------------------------

@query(
    "llm_holdout_split",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def llm_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment by content-independent
    key hash: md5(doc_id) hex prefix thresholds 'cc' (~80% train) and
    'e6' (~10% valid), remainder test.  Unlike rand()-splits this is
    reproducible across runs, retries, engines, and INCREMENTAL drops —
    a new batch of documents lands in the same split forever, so eval
    contamination can't creep in via resampling.  A pure projection:
    no shuffle, no state, trivially 100 TB-safe (same recipe as
    llm_stratified_sample, which is driver-green)."""
    d = load_table(spark, sf_dir, "documents")
    pre = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    return d.select(
        "doc_id",
        "lang",
        F.when(pre < "cc", "train")
        .when(pre < "e6", "valid")
        .otherwise("test")
        .alias("split"),
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (MOSS)
# --------------------------------------------------------------------------

@query(
    "llm_winnowing",
    oracle="""
    WITH canon AS (
        -- one row per doc_id: duplicate ids make the window's ORDER BY i
        -- ambiguous (ties across the dup texts) and the result then
        -- depends on physical row order / parallelism
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY md5(text) ASC,
                                lang ASC NULLS FIRST,
                                source ASC NULLS FIRST) AS rn
            FROM documents WHERE text IS NOT NULL
        ) WHERE rn = 1
    ),
    grams AS (
        SELECT doc_id, i,
               substr(md5(substr(text, CAST(i AS INTEGER), 8)), 1, 8) AS h,
               length(text) AS len
        FROM (
            SELECT doc_id, text,
                   unnest(range(1, CAST(greatest(length(text) - 6, 2)
                                        AS BIGINT))) AS i
            FROM canon
        )
    ),
    wins AS (
        SELECT doc_id, i, len,
               min(h) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
               ) AS wmin
        FROM grams
    )
    SELECT doc_id,
           count(DISTINCT wmin) AS n_fp,
           min(wmin) AS min_fp
    FROM wins
    WHERE i <= len - 7 - 3
    GROUP BY doc_id
    """,
)
def llm_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): hash every 8-char gram, slide a 4-gram window, keep
    each window's minimum hash — guaranteeing any shared substring of
    length >= 8+4-1 produces a shared fingerprint, with ~2/(w+1)
    selection density.  Gram hashes are md5 hex prefixes (engine-
    identical for identical bytes; rolling Rabin hashes are faster but
    llm_fingerprint already covers that family).  The gram explode is
    the dominant cost — at 100 TB this runs as one narrow
    explode→window→agg chain partitioned by doc_id, with the window
    min needing no shuffle beyond the doc_id partitioning; fingerprint
    postings (doc_id, wmin) then feed the same bucket-join dedup
    machinery as minhash bands.  Input canonicalized to one row per
    doc_id (dedup.canonical_docs) — duplicate ids otherwise tie the
    window's ORDER BY i and the fingerprint set becomes parallelism-
    dependent (caught by the local[32] sweep on the nulls roll)."""
    from hadoop_fixedlengthinputformat_spark.functions import dedup

    d = dedup.canonical_docs(load_table(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id",
        F.length("text").alias("len"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 7, F.lit(1)))
        ).alias("i"),
        "text",
    ).select(
        "doc_id",
        "len",
        "i",
        F.substring(
            F.md5(F.expr("substring(text, i, 8)").cast("binary")), 1, 8
        ).alias("h"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, 3)
    )
    return (
        grams.select(
            "doc_id", "i", "len", F.min("h").over(win).alias("wmin")
        )
        .filter(F.col("i") <= F.col("len") - 7 - 3)
        .groupBy("doc_id")
        .agg(
            F.count_distinct("wmin").alias("n_fp"),
            F.min("wmin").alias("min_fp"),
        )
    )


# --------------------------------------------------------------------------
# Bigram language-model quality scoring (CCNet-style perplexity filter)
# --------------------------------------------------------------------------

@query(
    "llm_lm_score",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    uc AS (
        SELECT w, count(*) AS c
        FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w
    ),
    vocab AS (SELECT count(*) AS v FROM uc),
    bi AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(t)),
                   i -> t[i] || ' ' || t[i + 1]
               )) AS bg
        FROM tok
    ),
    bc AS (
        SELECT string_split(bg, ' ')[1] AS w1,
               string_split(bg, ' ')[2] AS w2,
               count(*) AS c_xy
        FROM bi GROUP BY 1, 2
    ),
    terms AS (
        SELECT b.doc_id,
               CAST(floor(ln(CAST(k.c_xy + 1 AS DOUBLE) / (u.c + v.v))
                          * 100000000 + 0.5) AS BIGINT) AS t_units
        FROM (SELECT doc_id,
                     string_split(bg, ' ')[1] AS w1,
                     string_split(bg, ' ')[2] AS w2
              FROM bi) b
        JOIN bc k ON k.w1 = b.w1 AND k.w2 = b.w2
        JOIN uc u ON u.w = b.w1
        CROSS JOIN vocab v
    )
    SELECT doc_id, count(*) AS n_bi,
           floor(CAST(sum(t_units) AS DOUBLE)
                 / (count(*) * 100000000.0) * 10000 + 0.5) / 10000
               AS avg_logp
    FROM terms GROUP BY doc_id
    """,
)
def llm_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: train an add-one-smoothed bigram
    LM on the corpus itself, score every document by mean log
    probability  avg ln((c_xy+1)/(c_x+V))  — the perplexity filter that
    separates fluent text from boilerplate/garbage, without any
    external model artifact.

    Determinism: each ln() term is snapped to 8 decimals AND LIFTED TO
    INT64 UNITS (floor(ln·1e8+0.5)) before summation — double sums are
    merge-order-dependent across engines, integer sums are not (the
    agg_stats exact-moment rule applied to transcendental terms); the
    per-doc mean is then ONE division on bit-identical integers, snapped
    to 4.  ln is evaluated per DISTINCT (bigram, unigram) count pair,
    so ulp-straddle exposure is vocabulary-sized, not corpus-sized (the
    llm_bm25 idf recipe).  Plan: bigram/unigram/vocab tables are
    vocabulary-sized → AQE broadcasts all three joins while they fit
    (count tables unhinted; the 1-row vocab keeps its hint); the
    corpus shuffles once, on doc_id, for the final mean."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", _tok().alias("t"))
    uc = (
        tok.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = uc.agg(F.count(F.lit(1)).alias("v"))
    bi = tok.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("t", i), F.element_at("t", i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    ).select(
        "doc_id",
        F.split("bg", " ").getItem(0).alias("w1"),
        F.split("bg", " ").getItem(1).alias("w2"),
    )
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    # bc/uc are Heaps-bounded but not provably capped — no forced
    # broadcast hints (VERDICT r9 #3); AQE broadcasts from the groupBy
    # stage stats while small.  vocab is a 1-row aggregate: hint kept.
    terms = (
        bi.join(bc, ["w1", "w2"])
        .join(uc.select(F.col("w").alias("w1"), "c"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.floor(
                F.log((F.col("c_xy") + 1).cast("double") / (F.col("c") + F.col("v")))
                * 100_000_000
                + 0.5
            ).alias("t_units"),
        )
    )
    return terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bi"),
        (
            F.floor(
                F.sum("t_units").cast("double")
                / (F.count(F.lit(1)) * 100_000_000.0)
                * 10_000
                + 0.5
            )
            / 10_000
        ).alias("avg_logp"),
    )


# --------------------------------------------------------------------------
# Dataset card (corpus-level summary)
# --------------------------------------------------------------------------

@query(
    "llm_dataset_card",
    oracle="""
    WITH doc AS (
        SELECT count(*) AS n_docs,
               count(DISTINCT lang) AS n_langs,
               CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
                   AS BIGINT) AS total_tokens,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               floor((1 - CAST(count(DISTINCT md5(text)) AS DOUBLE)
                          / count(*)) * 10000 + 0.5) / 10000 AS dup_rate,
               floor(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
                   AS pct_en
        FROM documents
    ),
    voc AS (
        SELECT count(DISTINCT w) AS vocab_size
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    )
    SELECT doc.*, voc.vocab_size FROM doc CROSS JOIN voc
    """,
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card — the summary block a corpus release ships
    with: document/language counts, token and char totals, exact-dup
    rate, English share, vocabulary size.  Two single-row aggregates
    (doc-level stats; vocab via explode+count-distinct's two-phase
    expansion) crossed with a broadcast — at 100 TB this is two
    map-side-combined passes and a 1-row join, nothing else.  Ratios
    are int-ratio snaps (floor trick); token counts use the
    length-difference formula (n_ws_tokens)."""
    from hadoop_fixedlengthinputformat_spark.functions import text as tx

    d = load_table(spark, sf_dir, "documents")
    doc = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum(tx.n_ws_tokens("text")).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (
            F.floor(
                (
                    1
                    - F.count_distinct(
                        F.md5(F.col("text").cast("binary"))
                    ).cast("double")
                    / F.count(F.lit(1))
                )
                * 10_000
                + 0.5
            )
            / 10_000
        ).alias("dup_rate"),
        (
            F.floor(
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
                * 10_000
                + 0.5
            )
            / 10_000
        ).alias("pct_en"),
    )
    voc = d.select(F.explode(_tok()).alias("w")).agg(
        F.count_distinct("w").alias("vocab_size")
    )
    return doc.crossJoin(F.broadcast(voc))


# --------------------------------------------------------------------------
# Corpus snapshot diff + deterministic per-group sampling (session-2 batch)
# --------------------------------------------------------------------------

@query(
    "llm_corpus_diff",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 7 THEN text || ' v2' ELSE text END AS text
        FROM documents WHERE doc_id % 10 <> 3
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text
        FROM documents WHERE doc_id % 10 = 0
    ),
    a AS (SELECT doc_id, md5(text) AS h FROM documents),
    b2 AS (SELECT doc_id, md5(text) AS h FROM b)
    SELECT COALESCE(a.doc_id, b2.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b2.doc_id IS NULL THEN 'removed'
                WHEN a.h <> b2.h THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM a FULL OUTER JOIN b2 ON a.doc_id = b2.doc_id
    """,
)
def llm_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (the release-over-release audit of a
    training set): content-hash comparison over a full outer join on
    doc_id -> added / removed / changed / unchanged.  The 'B' snapshot
    is synthesized deterministically from A (drops, edits, additions),
    so the oracle predicts every status.  Scale: both sides reduce to
    (id, 16-byte md5) BEFORE the join — the shuffle carries digests,
    never text; the join is co-partitioned on the id."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b = (
        docs.filter(F.col("doc_id") % 10 != 3)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 7, F.concat("text", F.lit(" v2"))
            ).otherwise(F.col("text")).alias("text"),
        )
        .unionAll(
            docs.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    a_h = docs.select("doc_id", F.md5("text").alias("h"))
    b_h = b.select("doc_id", F.md5("text").alias("h"))
    j = a_h.alias("a").join(
        b_h.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    return j.select(
        F.coalesce(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id"),
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.h") != F.col("b.h"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )


@query(
    "llm_group_sample",
    oracle="""
    SELECT lang, doc_id, n_chars FROM (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id,
                            COALESCE(n_chars, -1), md5(COALESCE(text, ''))
               ) AS rn
        FROM documents
    ) WHERE rn <= 25
    """,
)
def llm_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group sample (k docs per language): rank by
    md5(doc_id) — a reproducible pseudo-random order every engine/run
    agrees on, unlike TABLESAMPLE/rand() — and keep the top k per
    group.  Plans with WindowGroupLimit: each mapper keeps only its
    local top-k before the single hash shuffle, so the exchange carries
    O(groups·k) rows per mapper regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars", "text"
    )
    # tiebreak past doc_id: duplicate ids tie the md5(doc_id) sort key
    # completely, making the rn<=25 cut parallelism/engine-dependent;
    # (n_chars, md5(text)) pins a total order over the OUTPUT columns
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")),
        "doc_id",
        F.coalesce("n_chars", F.lit(-1)),
        F.md5(F.coalesce("text", F.lit("")).cast("binary")),
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .drop("rn", "text")
    )


@query(
    "llm_embedding_quantize",
    oracle="""
    SELECT vec_id,
           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx,
           array_to_string(
               CASE WHEN list_aggregate(embedding, 'max')
                         = list_aggregate(embedding, 'min')
                    THEN list_transform(embedding, x -> 0)
                    ELSE list_transform(
                        embedding,
                        x -> CAST(floor(
                            (CAST(x AS DOUBLE)
                             - CAST(list_aggregate(embedding, 'min') AS DOUBLE))
                            / (CAST(list_aggregate(embedding, 'max') AS DOUBLE)
                               - CAST(list_aggregate(embedding, 'min') AS DOUBLE))
                            * 255 + 0.5) AS INTEGER))
               END, ',') AS q
    FROM embeddings
    """,
)
def llm_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector uint8 scalar quantization (the 4× memory lever every
    large ANN index pulls before PQ): min-max scale each vector to
    0..255 with the floor(+0.5) snap.  Projection-only — zero shuffle,
    pure codegen lambda over the array.  Determinism: every op
    ((x−mn)/rng·255+0.5, floor) is an exactly-rounded IEEE step over
    identical float32-widened inputs, written with the same
    parenthesization on both engines — bit-identical codes, no
    transcendentals, nothing to snap further.

    Output shape: the codes are rendered ``array_join(q, ',')`` — the
    driver canonicalizer pandas-sorts every output column and an
    ``array<int>`` cell is unhashable there (FAIL r6); the CSV string
    carries identical information and hashes fine.  The complex-output
    class is gated repo-wide by tests/test_oracle_types.py."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mn = F.array_min("embedding").cast("double")
    mx = F.array_max("embedding").cast("double")
    q = F.when(mx == mn, F.transform("embedding", lambda x: F.lit(0))).otherwise(
        F.transform(
            "embedding",
            lambda x: F.floor(
                (x.cast("double") - mn) / (mx - mn) * 255 + F.lit(0.5)
            ).cast("int"),
        )
    )
    return emb.select(
        "vec_id",
        mn.alias("mn"),
        mx.alias("mx"),
        F.array_join(q.cast("array<string>"), ",").alias("q"),
    )


@query(
    "llm_mix_weights",
    oracle="""
    WITH per AS (
        SELECT COALESCE(source, '') AS source,
               count(*) AS n_docs,
               CAST(sum(length(COALESCE(text, ''))
                        - length(replace(COALESCE(text, ''), ' ', '')) + 1)
                    AS BIGINT) AS tok
        FROM documents GROUP BY COALESCE(source, '')
    ),
    tot AS (SELECT CAST(sum(tok) AS BIGINT) AS tok_all FROM per),
    u AS (
        SELECT p.source, p.n_docs, p.tok,
               CAST(floor(sqrt(CAST(p.tok AS DOUBLE) / t.tok_all)
                          * 100000000 + 0.5) AS BIGINT) AS units
        FROM per p CROSS JOIN tot t
    ),
    su AS (SELECT CAST(sum(units) AS BIGINT) AS units_all FROM u)
    SELECT u.source, u.n_docs, u.tok,
           floor(CAST(u.units AS DOUBLE) / s.units_all * 10000 + 0.5) / 10000
               AS weight
    FROM u CROSS JOIN su s
    """,
)
def llm_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per source (the multilingual
    /multi-domain data-mixing rule of mBERT/XLM-R and the starting point
    of DoReMi-style reweighting): w_s ∝ p_s^alpha with alpha = 0.5, so
    low-resource sources are upsampled relative to their token share.

    Determinism: sqrt (IEEE-exact in both engines) is snapped to 8
    decimals as integer units BEFORE the cross-source sum — summing
    int64 units is order-independent, where a float sum would depend on
    Spark's partition merge order (the CLAUDE.md "snap transcendentals
    before further math" rule).  Two tiny aggregates after one
    source-keyed shuffle; the per-source table (~#sources rows) then
    joins against two scalar totals — at 100 TB the heavy part stays
    the first map-side-combined token count."""
    from hadoop_fixedlengthinputformat_spark.functions import text as tx

    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy(
        F.coalesce("source", F.lit("")).alias("source")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tx.n_ws_tokens(F.coalesce("text", F.lit("")))).alias("tok"),
    )
    w_all = Window.partitionBy()
    units = F.floor(
        F.sqrt(F.col("tok").cast("double") / F.sum("tok").over(w_all))
        * 100000000
        + 0.5
    ).cast("long")
    u = per.select("source", "n_docs", "tok", units.alias("units"))
    return u.select(
        "source",
        "n_docs",
        "tok",
        (
            F.floor(
                F.col("units").cast("double")
                / F.sum("units").over(w_all)
                * 10000
                + 0.5
            )
            / 10000
        ).alias("weight"),
    )


@query(
    "llm_ccnet_bucket",
    oracle="""
    WITH scored AS (
        SELECT COALESCE(lang, '') AS lang,
               COALESCE(n_chars, 0) AS n_chars,
               CAST((COALESCE(n_chars, 0) * 1000)
                    // greatest(length(COALESCE(text, ''))
                                - length(replace(COALESCE(text, ''), ' ', ''))
                                + 1, 1) AS BIGINT) AS score_units,
               md5(COALESCE(text, '')) AS tie,
               doc_id
        FROM documents
    ),
    b AS (
        SELECT lang, n_chars, score_units,
               ntile(3) OVER (
                   PARTITION BY lang
                   ORDER BY score_units ASC, tie ASC, doc_id ASC NULLS FIRST
               ) AS tercile
        FROM scored
    )
    SELECT lang,
           CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(score_units) AS min_score,
           max(score_units) AS max_score
    FROM b GROUP BY lang, bucket
    """,
)
def llm_ccnet_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language quality bucketing: rank every document
    within its language by a deterministic quality score and cut the
    ranking into head / middle / tail terciles (CCNet does this with LM
    perplexity; the mechanics — per-lang windowed terciles feeding a
    keep/drop policy — are identical for any monotone score, and the
    score here is exact-integer so both engines rank bit-identically).

    score_units = n_chars * 1000 / tokens (integer division): average
    token length in milli-chars.  The ntile ORDER BY is a TOTAL order
    (score, md5(text), doc_id) per the round-4 parallelism-tie rule —
    duplicate doc_ids with identical text produce identical rows, so
    tile assignment between them cannot change the output multiset.
    One lang shuffle for the window, then a map-side-combined
    aggregate; at 100 TB the window is the classic sort-within-lang
    pass CCNet itself runs."""
    d = load_table(spark, sf_dir, "documents")
    from hadoop_fixedlengthinputformat_spark.functions import text as tx

    txt = F.coalesce("text", F.lit(""))
    # integer `div` on BOTH sides (`//` in the oracle): float division +
    # CAST would round in DuckDB but truncate in Spark (CLAUDE.md rule)
    score = F.expr(
        "(coalesce(n_chars, 0) * 1000L) div greatest("
        "length(coalesce(text, '')) "
        "- length(replace(coalesce(text, ''), ' ', '')) + 1, 1)"
    )
    scored = d.select(
        F.coalesce("lang", F.lit("")).alias("lang"),
        F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
        score.cast("long").alias("score_units"),
        F.md5(txt).alias("tie"),
        "doc_id",
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("score_units").asc(),
        F.col("tie").asc(),
        F.col("doc_id").asc_nulls_first(),
    )
    b = scored.withColumn("tercile", F.ntile(3).over(w))
    bucket = (
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail")
    )
    return (
        b.groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.min("score_units").alias("min_score"),
            F.max("score_units").alias("max_score"),
        )
    )


# DSIR bucket log-ratio in EXACT int64 units: each ln() snaps straight
# to 1e-8 units (CAST(floor(ln(x)*1e8 + 0.5) AS BIGINT)) so the
# per-document SUM over token buckets is integer-exact and
# merge-order-free on both engines.  The fragment is shared verbatim.
_DSIR_WU = (
    "CAST(floor(ln((ct + 1.0) / (tt + 256.0)) * 100000000 + 0.5) AS BIGINT)"
    " - "
    "CAST(floor(ln((cr + 1.0) / (tr + 256.0)) * 100000000 + 0.5) AS BIGINT)"
)


@query(
    "llm_dsir_resample",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, substr(md5(t), 1, 2) AS b,
               (COALESCE(lang, '') = 'en') AS is_en
        FROM (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
            FROM documents WHERE text IS NOT NULL AND text <> ''
        ) WHERE t <> ''
    ),
    g AS (
        SELECT b, CAST(count(*) AS BIGINT) AS cr,
               CAST(count(*) FILTER (is_en) AS BIGINT) AS ct
        FROM toks GROUP BY b
    ),
    w AS (
        SELECT b, {_DSIR_WU} AS wu
        FROM (SELECT b, cr, ct,
                     CAST(SUM(cr) OVER () AS DOUBLE) AS tr,
                     CAST(SUM(ct) OVER () AS DOUBLE) AS tt
              FROM g)
    )
    SELECT doc_id, COUNT(*) AS n_toks,
           CAST(SUM(wu) AS BIGINT) AS logw_units,
           CAST(SUM(wu) AS BIGINT) > 0 AS selected
    FROM toks JOIN w USING (b) GROUP BY doc_id
    """,
)
def llm_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scoring (Xie et al., data selection via
    importance resampling, simplified to hashed unigram buckets):
    estimate a 256-bucket hashed-feature distribution for the TARGET
    slice (lang='en') and the RAW corpus, weight every bucket by the
    Laplace-smoothed log ratio, and score each document by the sum of
    its tokens' bucket weights — positive means target-leaning, and
    ``selected`` keeps exactly those (a deterministic stand-in for
    sampling ∝ importance).  Every ln() snaps directly to exact 1e-8
    int64 UNITS before any sum (the llm_mix_weights technique), so the
    per-doc aggregation is merge-order-free.  Scale shape: the bucket
    table is 256 rows (broadcast join onto the token stream); only
    (doc_id, bucket) pairs shuffle — text never does."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.where(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(
            "doc_id",
            (F.coalesce("lang", F.lit("")) == "en").alias("is_en"),
            F.explode(F.split("text", " ")).alias("t"),
        )
        .where(F.col("t") != "")
        .select(
            "doc_id", "is_en",
            F.substring(F.md5(F.col("t").cast("binary")), 1, 2).alias("b"),
        )
    )
    g = toks.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("is_en"), F.lit(1)).otherwise(F.lit(0)))
        .cast("long").alias("ct"),
    )
    wall = Window.partitionBy()
    w = g.select(
        "b", "cr", "ct",
        F.sum("cr").over(wall).cast("double").alias("tr"),
        F.sum("ct").over(wall).cast("double").alias("tt"),
    ).select("b", F.expr(_DSIR_WU).alias("wu"))
    scored = (
        toks.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("wu").alias("logw_units"),
        )
    )
    return scored.select(
        "doc_id", "n_toks", "logw_units",
        (F.col("logw_units") > 0).alias("selected"),
    )
