"""Round-4 determinism invariants: the NULL/duplicate-id rules of
plans/NOTES.md "Round-4 NULL / duplicate-id" hold structurally, not just
on one roll — canonical_docs is order-insensitive and total,
llm_seq_packing's output multiset survives row-order permutation, and
the ratio helpers are total functions over empty/NULL text."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


ROWS = [
    # (doc_id, text, lang, source) — dup ids with same and different text,
    # NULLs, empty strings
    (1, "alpha beta", "en", "s1"),
    (2, "gamma", "es", "s2"),
    (2, "delta epsilon", "en", "s1"),   # dup id, different text
    (3, "zeta", None, "s3"),            # NULL lang
    (3, "zeta", None, "s3"),            # exact dup row
    (4, None, "de", "s4"),              # NULL text
    (5, "", "fr", "s5"),                # empty text
    (6, "eta theta", "en", None),       # NULL source
]
SCHEMA = "doc_id long, text string, lang string, source string"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_canonical_docs_total_and_order_insensitive(spark, docs):
    from hadoop_fixedlengthinputformat_spark.functions.dedup import (
        canonical_docs,
    )

    out = {tuple(r) for r in canonical_docs(docs).collect()}
    # one row per doc_id, NULL-text ids dropped entirely
    ids = sorted(r[0] for r in out)
    assert ids == [1, 2, 3, 5, 6]
    # permuting input rows changes nothing
    shuffled = spark.createDataFrame(list(reversed(ROWS)), SCHEMA)
    assert {tuple(r) for r in canonical_docs(shuffled).collect()} == out
    # the representative is the md5-min text (deterministic, engines agree)
    import hashlib

    cand = [t for (i, t, _l, _s) in ROWS if i == 2]
    want = min(cand, key=lambda t: hashlib.md5(t.encode()).hexdigest())
    assert next(r for r in out if r[0] == 2)[1] == want


def test_seq_packing_multiset_invariant_under_permutation(spark, tmp_path):
    """Same rows in any physical order => same (doc_id, lang, n_tok,
    pack_id, pack_offset) multiset — the property the driver's
    order-insensitive hash requires."""
    from hadoop_fixedlengthinputformat_spark.functions.llm_queries import (
        llm_seq_packing,
    )

    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    spark.createDataFrame(ROWS, SCHEMA).withColumn(
        "n_chars", F.length("text").cast("long")
    ).coalesce(1).write.parquet(f"{d1}/documents.parquet")
    spark.createDataFrame(list(reversed(ROWS)), SCHEMA).withColumn(
        "n_chars", F.length("text").cast("long")
    ).repartition(4).write.parquet(f"{d2}/documents.parquet")
    m1 = sorted(map(tuple, llm_seq_packing(spark, d1).collect()))
    m2 = sorted(map(tuple, llm_seq_packing(spark, d2).collect()))
    assert m1 == m2
    # NULL text contributes n_tok 0, never NULL
    assert all(r[2] is not None for r in m1)


def test_ratio_helpers_total_over_degenerate_text(spark):
    from hadoop_fixedlengthinputformat_spark.functions import text as T

    df = spark.createDataFrame(
        [("",), (" ",), ("a",), (None,)], "t string"
    ).select(
        T.punct_ratio("t").alias("p"),
        T.vowel_ratio("t").alias("v"),
        T.quality_score("t").alias("q"),
    )
    rows = df.collect()
    # empty text: ratios 0.0, no ANSI divide-by-zero; NULL text: NULL out
    assert rows[0].p == 0.0 and rows[0].v == 0.0
    assert rows[3].p is None and rows[3].q is None
    assert all(r.q is None or 0.0 <= r.q <= 1.0 for r in rows)


def test_minhash_signature_skips_null_text(spark, docs):
    from hadoop_fixedlengthinputformat_spark.functions import dedup

    sig = dedup.minhash_signature(docs, "doc_id")
    ids = {r.doc_id for r in sig.collect()}
    assert 4 not in ids  # NULL-text doc has no signature
    pairs = dedup.lsh_candidate_pairs(sig, "doc_id").collect()
    # and therefore can never appear in a candidate pair
    assert all(4 not in (p.doc_a, p.doc_b) for p in pairs)


def _docs_roll(spark, tmp_path, name, n_part):
    """A dup-id documents roll written with n_part physical partitions."""
    import pyspark.sql.functions as F

    rows = []
    for i in range(200):
        doc_id = i if i % 10 else i - 1  # every 10th id duplicates its
        rows.append(                      # predecessor with OTHER text
            (doc_id, f"w{i} " * (5 + i % 37), ["en", "es", "de"][i % 3],
             f"s{i % 4}")
        )
    d = str(tmp_path / name)
    spark.createDataFrame(rows, SCHEMA).withColumn(
        "n_chars", F.length("text").cast("long")
    ).repartition(n_part).write.parquet(f"{d}/documents.parquet")
    return d


def test_windowed_queries_parallelism_invariant(spark, tmp_path):
    """The round-4 local[32] lesson, pinned in-suite: winnowing,
    group_sample, and seq_packing must return the same multiset whether
    the dup-id input arrives in 1 or 16 physical partitions with 4 or 32
    shuffle partitions."""
    from hadoop_fixedlengthinputformat_spark.functions.corpus_extras import (
        llm_group_sample,
        llm_winnowing,
    )
    from hadoop_fixedlengthinputformat_spark.functions.llm_queries import (
        llm_seq_packing,
    )

    d1 = _docs_roll(spark, tmp_path, "p1", 1)
    d2 = _docs_roll(spark, tmp_path, "p16", 16)
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = []
        for d, sp in ((d1, "4"), (d2, "32")):
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            results.append({
                "win": sorted(map(tuple, llm_winnowing(spark, d).collect())),
                "smp": sorted(map(tuple, llm_group_sample(spark, d).collect())),
                "pack": sorted(map(tuple, llm_seq_packing(spark, d).collect())),
            })
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert results[0]["win"] == results[1]["win"]
    assert results[0]["smp"] == results[1]["smp"]
    assert results[0]["pack"] == results[1]["pack"]
