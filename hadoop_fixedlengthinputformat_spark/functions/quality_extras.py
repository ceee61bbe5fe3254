"""Quality-signal extensions: character entropy + embedding outliers.

Two more training-pipeline filters (SURVEY.md §2.3-J):

* ``llm_char_entropy`` — character-level Shannon entropy per document.
  Low entropy flags repetitive/degenerate text (keyboard mashing, boiler-
  plate, encoding failures) that length/stopword heuristics miss.
* ``llm_centroid_outliers`` — squared distance of each embedding from its
  own label centroid; far points are mislabeled-example / noise
  candidates (the embedding-space analogue of a quality filter).

Hash-exactness notes: log2's last ulp can differ between the JVM and
libm, so each per-character log2 term is snapped to 8 decimals before
the weighted sum (the bm25 idf trick); the final entropy/distance is
snapped to 4.  The remaining hazard is float-add order across the
group-by — snapped away at 4 decimals with ~1e-15 relative noise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hadoop_fixedlengthinputformat_spark.functions import text
from hadoop_fixedlengthinputformat_spark.functions.num import snap_sql
from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.tables import load_table


@query(
    "llm_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch,
               length(text) AS tot
        FROM documents
        WHERE length(text) > 0
    ),
    freq AS (
        SELECT doc_id, ch, tot, count(*) AS cnt
        FROM chars GROUP BY doc_id, ch, tot
    )
    SELECT doc_id,
           floor(-sum((cnt / tot)
                      * (floor(log2(cnt / tot) * 100000000 + 0.5) / 100000000))
                 * 10000 + 0.5) / 10000 + 0 AS entropy
    FROM freq GROUP BY doc_id
    """,
)
def llm_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character entropy H = -sum p*log2(p).

    Scale shape: the char explode feeds a map-side partial count keyed
    (doc_id, ch) — the exchange carries at most |alphabet| rows per doc
    per mapper, never raw characters; the per-doc sum reuses the doc
    partitioning.  A degenerate one-char document is a single group row.
    """
    d = load_table(spark, sf_dir, "documents")
    # entropy of the empty string is undefined (0/0 terms): NULL/empty
    # texts are excluded on BOTH sides (Spark split('','') still yields
    # one '' element while DuckDB yields none — the filter pins it)
    chars = d.filter(F.length("text") > 0).select(
        "doc_id",
        F.length("text").alias("tot"),
        F.explode(F.split("text", "")).alias("ch"),
    )
    freq = chars.groupBy("doc_id", "ch", "tot").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    p = F.col("cnt") / F.col("tot")
    term = p * (F.floor(F.log2(p) * 100000000 + 0.5) / 100000000)
    return freq.groupBy("doc_id").agg(
        (F.floor(-F.sum(term) * 10000 + 0.5) / 10000 + F.lit(0)).alias("entropy")
    )


@query(
    "llm_centroid_outliers",
    oracle="""
    WITH ex AS (
        SELECT vec_id, label,
               unnest(generate_series(1, len(embedding))) AS ord,
               unnest(embedding) AS v
        FROM embeddings
    ),
    cent AS (
        SELECT label, ord, round(avg(v), 4) + 0 AS cv
        FROM ex GROUP BY label, ord
    )
    SELECT vec_id, ex.label,
           floor(sum((v - cv) * (v - cv)) * 10000 + 0.5) / 10000 AS dist2
    FROM ex JOIN cent ON ex.label = cent.label AND ex.ord = cent.ord
    GROUP BY vec_id, ex.label
    HAVING floor(sum((v - cv) * (v - cv)) * 10000 + 0.5) / 10000 > 1.0
    """,
)
def llm_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings farther than dist² > 1.0 from their label centroid —
    mislabeled / noisy example mining.

    Scale shape: centroids are a (label, pos) aggregate whose exchange
    carries |labels|·dim partial sums (never vectors) and the result is
    BROADCAST back; the per-vector distance reduces (vec_id)-keyed
    per-dimension terms with map-side partial sums.  The centroid values
    are snapped to 4 decimals on both engines BEFORE the distance, so
    every downstream operand is identical."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("vec_id", "label", F.posexplode("embedding").alias("pos", "v"))
    cent = ex.groupBy("label", "pos").agg(
        (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("cv")
    )
    d2 = F.floor(F.sum((F.col("v") - F.col("cv")) * (F.col("v") - F.col("cv"))) * 10000 + 0.5) / 10000
    return (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(d2.alias("dist2"))
        .filter(F.col("dist2") > 1.0)
    )


@query(
    "llm_shard_assign",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, n_chars,
               CAST((doc_id * 2654435761) % 4294967296 % 16 AS INTEGER) AS shard
        FROM documents
    )
    SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM assigned GROUP BY shard
    """,
)
def llm_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding: docs → 16 shards via a Knuth
    multiplicative hash on doc_id (pure modular bigint arithmetic, so
    DuckDB computes the identical assignment — engine hash() builtins
    differ and are unusable cross-engine).

    This is how a 100 TB pipeline shards its output: hash assignment is
    embarrassingly parallel, needs no global sort or sequential packer,
    and balances by the law of large numbers (tests assert max/min
    shard load < 1.5 at 500 docs; the ratio tightens as corpus grows).
    The only shuffle is the 16-group stats agg with map-side partials;
    in production the assignment column feeds write.partitionBy."""
    d = load_table(spark, sf_dir, "documents")
    shard = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) % F.lit(16)
    ).cast("int")
    return (
        d.select("doc_id", "n_chars", shard.alias("shard"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


@query(
    "llm_chunk_split",
    oracle="""
    SELECT doc_id,
           CAST((s - 1) / 150 AS INTEGER) AS chunk_idx,
           substring(text, s, 200) AS chunk,
           length(substring(text, s, 200)) AS chunk_len
    FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text), 1), 150)) AS s
        FROM documents
    )
    """,
)
def llm_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (200-char windows, 50-char
    overlap, stride 150) — the RAG / embedding-pipeline preprocessing
    step.  Pure codegen: sequence + posexplode + substring, zero
    shuffles, zero UDFs; chunk provenance is (doc_id, chunk_idx).  At
    100 TB the explode multiplies rows by len/stride but each output row
    is bounded by the window, so downstream batching stays uniform."""
    d = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(150)
    )
    ex = d.select("doc_id", "text", F.explode(starts).alias("s"))
    chunk = F.substring(F.col("text"), F.col("s"), 200)
    return ex.select(
        "doc_id",
        (((F.col("s") - 1) / 150).cast("int")).alias("chunk_idx"),
        chunk.alias("chunk"),
        F.length(chunk).alias("chunk_len"),
    )


# Flesch readability: every count is a pure length-difference integer
# (engine-identical BY CONSTRUCTION — no regex-count, no split-array
# semantics); the two ratios and the affine combination are ONE double
# tree shared verbatim with the oracle.  Run counting: replacing each
# [.!?]+ / vowel run with a single char and with '' makes
# (len_single − len_removed) = #runs exactly, on both regex engines
# (DuckDB needs the 'g' flag; Spark replaces globally by default).
_READ_R1 = (
    "(CAST(n_words AS DOUBLE) / CAST(greatest(n_sents, 1) AS DOUBLE))"
)
_READ_R2 = (
    "(CAST(n_syll AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE))"
)
_READ_FRE = snap_sql(
    f"206.835 - 1.015 * {_READ_R1} - 84.6 * {_READ_R2}", 4
)
_READ_FKGL = snap_sql(
    f"0.39 * {_READ_R1} + 11.8 * {_READ_R2} - 15.59", 4
)


@query(
    "llm_readability",
    oracle=f"""
    WITH c AS (
        SELECT doc_id,
               length(text) - length(replace(text, ' ', '')) + 1
                   AS n_words,
               length(regexp_replace(text, '[.!?]+', '.', 'g'))
                   - length(regexp_replace(text, '[.!?]+', '', 'g'))
                   AS n_sents,
               length(regexp_replace(text, '[aeiouyAEIOUY]+', 'a', 'g'))
                   - length(regexp_replace(text, '[aeiouyAEIOUY]+', '', 'g'))
                   AS n_syll
        FROM documents
        WHERE text IS NOT NULL AND length(text) > 0
    )
    SELECT doc_id, n_words, n_sents, n_syll,
           {_READ_FRE} + 0 AS flesch_ease,
           {_READ_FKGL} + 0 AS fk_grade
    FROM c
    """,
)
def llm_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease and Flesch–Kincaid grade level per document —
    the classical readability gate curation pipelines run next to
    llm_quality_score (Gopher-style filters drop the unreadable tails
    on exactly these two scores).  Words come from the length-difference
    whitespace count (the repo-wide n_ws_tokens definition); sentences
    and syllables are RUN counts of [.!?]+ / vowel groups via the
    replace-run-with-one-char-minus-remove-runs identity — all three
    are exact integers with no regex-count or split-array seam (vowel
    class spells out both cases, so no lower() unicode divergence).
    Syllable ≈ vowel-group is the standard public approximation; the
    contract is the deterministic count, not linguistic truth (the
    llm_lang_id precedent).  The two ratios (greatest(x,1) ANSI ÷0
    denominators) and the affine Flesch trees are shared verbatim with
    the oracle, snapped to 4 (+0 clears -0.0); W/S ≤ n_chars is bounded
    by document size, never corpus size, so snapping is magnitude-safe.
    Empty/NULL text is excluded on BOTH sides (round-4 per-char rule).
    Pure row expressions — zero exchanges, whole-stage codegen, scales
    at scan speed."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    c = d.select(
        "doc_id",
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).alias("n_words"),
        (
            F.length(F.regexp_replace(F.col("text"), r"[.!?]+", "."))
            - F.length(F.regexp_replace(F.col("text"), r"[.!?]+", ""))
        ).alias("n_sents"),
        (
            F.length(
                F.regexp_replace(F.col("text"), r"[aeiouyAEIOUY]+", "a")
            )
            - F.length(
                F.regexp_replace(F.col("text"), r"[aeiouyAEIOUY]+", "")
            )
        ).alias("n_syll"),
    )
    return c.select(
        "doc_id", "n_words", "n_sents", "n_syll",
        (F.expr(_READ_FRE) + F.lit(0.0)).alias("flesch_ease"),
        (F.expr(_READ_FKGL) + F.lit(0.0)).alias("fk_grade"),
    )


_CONF_RECALL = snap_sql(
    "CAST(n_docs AS DOUBLE) / CAST(n_actual AS DOUBLE)", 4
)
_CONF_PREC = snap_sql(
    "CAST(n_docs AS DOUBLE) / CAST(n_pred AS DOUBLE)", 4
)


@query(
    "llm_lang_confusion",
    oracle=f"""
    WITH pred AS (
        SELECT lang AS actual_lang,
               CASE WHEN vr < 0.20 THEN 'zh'
                    WHEN vr < 0.24 THEN 'de'
                    WHEN vr < 0.28 THEN 'en'
                    WHEN vr < 0.32 THEN 'es'
                    ELSE 'fr' END AS predicted_lang
        FROM (
            SELECT lang,
                   len(regexp_replace(lower(text), '[^aeiou]', '', 'g'))
                       / greatest(len(text), 1) AS vr
            FROM documents WHERE lang IS NOT NULL
        )
    ),
    cells AS (
        SELECT actual_lang, predicted_lang,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY actual_lang, predicted_lang
    )
    SELECT actual_lang, predicted_lang, n_docs,
           {_CONF_RECALL} + 0 AS recall,
           {_CONF_PREC} + 0 AS precision
    FROM (
        SELECT actual_lang, predicted_lang, n_docs,
               CAST(SUM(n_docs) OVER (PARTITION BY actual_lang)
                    AS BIGINT) AS n_actual,
               CAST(SUM(n_docs) OVER (PARTITION BY predicted_lang)
                    AS BIGINT) AS n_pred
        FROM cells
    )
    """,
)
def llm_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix with per-class recall and
    precision — the evaluation half of llm_lang_id (the classifier
    eval every curation pipeline runs before trusting a lang filter).
    Prediction semantics are REUSED verbatim from llm_lang_id
    (text.lang_id_heuristic; NULL text falls through to the ELSE
    class — stated, same CASE both sides); NULL actual labels are
    excluded on both sides.  Counts are exact; recall/precision are
    single divisions of int64-exact casts over the |langs|²-cell
    aggregate, snapped to 4 (+0).  Shuffle shape: ONE
    map-side-combined (actual, predicted) groupBy; the two class
    windows run on the ≤|langs|² cell table — never on the corpus."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull()
    )
    pred = d.select(
        F.col("lang").alias("actual_lang"),
        text.lang_id_heuristic("text").alias("predicted_lang"),
    )
    cells = pred.groupBy("actual_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    from pyspark.sql import Window

    w_a = Window.partitionBy("actual_lang")
    w_p = Window.partitionBy("predicted_lang")
    sized = cells.select(
        "actual_lang", "predicted_lang", "n_docs",
        F.sum("n_docs").over(w_a).alias("n_actual"),
        F.sum("n_docs").over(w_p).alias("n_pred"),
    )
    return sized.select(
        "actual_lang", "predicted_lang", "n_docs",
        (F.expr(_CONF_RECALL) + F.lit(0.0)).alias("recall"),
        (F.expr(_CONF_PREC) + F.lit(0.0)).alias("precision"),
    )


_TTR = snap_sql("CAST(n_distinct AS DOUBLE) / CAST(n_tok AS DOUBLE)", 4)


@query(
    "llm_type_token_ratio",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
            WHERE text IS NOT NULL AND length(text) > 0
        ) WHERE tok <> ''
    ),
    g AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
               CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct
        FROM toks GROUP BY doc_id
    )
    SELECT doc_id, n_tok, n_distinct, {_TTR} + 0 AS ttr
    FROM g
    """,
)
def llm_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio per document — distinct words / total words,
    the classical lexical-diversity score curation pipelines threshold
    next to llm_repetition_score (low TTR = template/boilerplate).
    Both counts come from the SAME construction both sides: split on
    single spaces (both engines keep interior/trailing empties
    identically), explode, and drop empty tokens explicitly — never
    an array-length seam (the CLAUDE round-3 token rule).  Duplicate
    doc_ids merge by the groupBy(doc_id) convention (round-4 rule) —
    deterministic on dup-id rolls; empty/NULL text is excluded both
    sides, and all-space texts drop out (zero tokens) identically.
    Exact int64 counts exposed; one snapped division.  Shuffle shape:
    the explode stays in the scan stage; one map-side partial
    (doc_id, tok) dedup feeds the per-doc count — tokens, not text,
    cross the exchange."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.col("text"), " ", -1)).alias("tok"),
    ).where(F.col("tok") != "")
    g = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.count_distinct(F.col("tok")).alias("n_distinct"),
    )
    return g.select(
        "doc_id",
        "n_tok",
        "n_distinct",
        (F.expr(_TTR) + F.lit(0.0)).alias("ttr"),
    )


_HAPAX = snap_sql(
    "CAST(n_hapax AS DOUBLE) / CAST(n_distinct AS DOUBLE)", 4
)


@query(
    "llm_hapax_ratio",
    oracle=f"""
    WITH toks AS (
        SELECT tok FROM (
            SELECT unnest(string_split(text, ' ')) AS tok
            FROM documents
            WHERE text IS NOT NULL AND length(text) > 0
        ) WHERE tok <> ''
    ),
    tf AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        FROM toks GROUP BY tok
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(SUM(cnt) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax
        FROM tf
    )
    SELECT n_total, n_distinct, n_hapax, {_HAPAX} + 0 AS hapax_share
    FROM s WHERE n_distinct > 0
    """,
)
def llm_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus hapax-legomena share — the fraction of the vocabulary
    appearing exactly once, the Zipf-tail health check a corpus card
    reports next to llm_zipf_fit (a crashed hapax share flags
    boilerplate-flooded or deduplication-starved corpora).  Same
    empty-token/empty-text discipline as llm_type_token_ratio; the
    corpus collapses to a (token, count) table in one map-side-combined
    groupBy (tokens cross the exchange once, text never does), then a
    1-row exact-integer census.  Exact BIGINTs exposed; one snapped
    division; empty vocabulary emits no row both sides."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    toks = d.select(
        F.explode(F.split(F.col("text"), " ", -1)).alias("tok")
    ).where(F.col("tok") != "")
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    s = tf.agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("cnt").alias("n_total"),
        F.sum(
            F.when(F.col("cnt") == 1, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_hapax"),
    )
    return s.where(F.col("n_distinct") > 0).select(
        "n_total",
        "n_distinct",
        "n_hapax",
        (F.expr(_HAPAX) + F.lit(0.0)).alias("hapax_share"),
    )


_SENT_AVG = snap_sql(
    "CAST(n_tok AS DOUBLE) / CAST(greatest(n_sentences, 1) AS DOUBLE)", 4
)


@query(
    "llm_sentence_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               length(text) - length(translate(text, '.!?', ''))
                   AS n_sentences,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tok,
               substring(text, length(text), 1) IN ('.', '!', '?')
                   AS ends_terminal
        FROM documents WHERE text IS NOT NULL AND text <> ''
    )
    SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_tok AS BIGINT) AS n_tok,
           {_SENT_AVG} + 0 AS avg_sentence_tokens,
           ends_terminal
    FROM base
    """,
)
def llm_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document sentence statistics — the structural half of a
    quality profile (llm_text_stats owns tokens/chars): sentence count
    via terminal-punctuation census, average sentence length in
    whitespace tokens, and whether the document ends on terminal
    punctuation (the Gopher 'ends mid-sentence' truncation signal).
    Sentence counting is the length-difference translate trick —
    engine-identical pure string arithmetic, no regex engine in play
    (the n_ws_tokens rule).  Pure per-row codegen projection, zero
    shuffles — scan-speed at any scale.  Empty/NULL text excluded on
    BOTH sides (round-4 per-char rule); the ratio divides by
    greatest(n, 1)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.col("text") != "")
    )
    n_sent = (
        F.length("text") - F.length(F.translate(F.col("text"), ".!?", ""))
    ).cast("long")
    n_tok = text.n_ws_tokens("text").cast("long")
    last_ch = F.substring(F.col("text"), -1, 1)
    base = d.select(
        "doc_id",
        n_sent.alias("n_sentences"),
        n_tok.alias("n_tok"),
        last_ch.isin(".", "!", "?").alias("ends_terminal"),
    )
    return base.select(
        "doc_id",
        "n_sentences",
        "n_tok",
        (F.expr(_SENT_AVG) + F.lit(0.0)).alias("avg_sentence_tokens"),
        "ends_terminal",
    )
