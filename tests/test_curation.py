"""Round-5 curation operators: BPE tokenizer-apply and line-level dedup.

The line-dedup check is a third-engine oracle: a pure-Python replay of
the whole operator (canonicalization, 10-token segmentation, cross-doc
boilerplate set, reconstruction) compared row-for-row against Spark —
independent of both Spark and the DuckDB parity oracle.
"""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq

from hadoop_fixedlengthinputformat_spark.functions import text
from hadoop_fixedlengthinputformat_spark.functions.curation_extras import (
    _CHUNK,
    _MIN_DOCS,
    llm_line_dedup,
    llm_tokenizer_apply,
)


def ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference BPE encode: chars + '</w>', then each merge applied
    greedily left-to-right in rank order (Sennrich et al. 2016)."""
    toks = list(word)
    toks[-1] += "</w>"
    for a, b in merges:
        out: list[str] = []
        for t in toks:
            if out and out[-1] == a and t == b:
                out[-1] = a + b
            else:
                out.append(t)
        toks = out
    return toks


def test_merge_pair_expr_matches_reference(spark):
    words = ["lower", "lowest", "newer", "wider", "low", "l", "héllo"]
    merges = [("e", "r</w>"), ("l", "o"), ("lo", "w"), ("w", "er</w>")]
    df = spark.createDataFrame([(w,) for w in words], "word string").select(
        "word", text.char_toks_expr("word").alias("toks")
    )
    for a, b in merges:
        df = df.select("word", text.merge_pair_expr(a, b).alias("toks"))
    got = {r["word"]: list(r["toks"]) for r in df.collect()}
    for w in words:
        assert got[w] == ref_encode(w, merges), w


def test_char_toks_detokenize_roundtrip(spark):
    """Concatenating the start-state tokens and dropping the end marker
    must reproduce the word (BPE is lossless), incl. non-ASCII."""
    words = ["spark", "a", "héllo", "naïve", "日本語"]
    df = spark.createDataFrame([(w,) for w in words], "word string").select(
        "word", text.char_toks_expr("word").alias("toks")
    )
    for r in df.collect():
        assert "".join(r["toks"]).replace("</w>", "") == r["word"]


def test_tokenizer_apply_counts(spark, sf_dir):
    """Gate shape (r7): one row per DISTINCT doc_id (incl. word-less
    docs), every encoder-invariant boolean true."""
    rows = llm_tokenizer_apply(spark, sf_dir).collect()
    assert len(rows) > 0
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    assert len(rows) == len({r["doc_id"] for r in docs})
    for r in rows:
        # merges only ever shrink the per-word token count, and every
        # word is at least one token
        assert r.bpe_ge_ws_tokens and r.bpe_le_word_chars, r


def _canonical_docs_py(rows: list[dict]) -> dict[int, str]:
    """Python replay of dedup.canonical_docs ordering (md5(text) asc,
    lang asc NULLS FIRST, source asc NULLS FIRST)."""
    best: dict[int, tuple] = {}
    for r in rows:
        if r["text"] is None:
            continue
        key = (
            hashlib.md5(r["text"].encode()).hexdigest(),
            (r["lang"] is not None, r["lang"] or ""),
            (r["source"] is not None, r["source"] or ""),
        )
        if r["doc_id"] not in best or key < best[r["doc_id"]][0]:
            best[r["doc_id"]] = (key, r["text"])
    return {k: v[1] for k, v in best.items()}


def test_line_dedup_matches_python_replay(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    canon = _canonical_docs_py(docs)
    chunks: dict[int, list[str]] = {}
    for doc_id, t in canon.items():
        toks = t.split(" ")
        n = math.ceil(len(toks) / _CHUNK)
        chunks[doc_id] = [
            " ".join(toks[i * _CHUNK : (i + 1) * _CHUNK]) for i in range(n)
        ]
    seen: dict[str, set[int]] = {}
    for doc_id, cs in chunks.items():
        for c in cs:
            seen.setdefault(c, set()).add(doc_id)
    dup = {c for c, ids in seen.items() if len(ids) >= _MIN_DOCS}
    expected = {}
    for doc_id, cs in chunks.items():
        kept = [c for c in cs if c not in dup]
        clean = " ".join(kept)
        expected[doc_id] = (
            len(cs),
            sum(1 for c in cs if c in dup),
            hashlib.md5(clean.encode()).hexdigest(),
            len(clean),
        )

    got = {
        r.doc_id: (r.n_lines, r.n_removed, r.clean_md5, r.clean_chars)
        for r in llm_line_dedup(spark, sf_dir).collect()
    }
    assert got == expected
    # the corpus genuinely contains cross-doc boilerplate to remove
    assert any(v[1] > 0 for v in got.values())


def test_span_corruption_matches_python_replay(spark, sf_dir):
    """Third-engine replay of the span-corruption assignment."""
    from hadoop_fixedlengthinputformat_spark.functions.curation_extras import (
        _A,
        _B,
        _M,
        llm_span_corruption,
    )

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    canon = _canonical_docs_py(docs)
    expected = {}
    for doc_id, t in canon.items():
        toks = t.split(" ")
        n_win = len(toks) // 20
        key = doc_id if doc_id is not None else -1
        h = lambda w: (key * _A + w * _B) % _M  # noqa: E731  (key >= 0 here)
        n_masked = sum(2 + h(w) % 2 for w in range(n_win))
        span0 = None
        if n_win >= 1:
            s0, l0 = h(0) % 18, 2 + h(0) % 2
            span0 = " ".join(toks[s0 : s0 + l0])
        expected[doc_id] = (len(toks), n_win, n_masked, span0)
    got = {
        r.doc_id: (r.n_tok, r.n_spans, r.n_masked, r.span0_text)
        for r in llm_span_corruption(spark, sf_dir).collect()
    }
    assert got == expected
    assert any(v[2] > 0 for v in got.values())


def test_ngram_novelty_bounds_and_uniqueness(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.functions.curation_extras import (
        llm_ngram_novelty,
    )

    rows = llm_ngram_novelty(spark, sf_dir).collect()
    assert len(rows) > 0
    assert len({r.doc_id for r in rows}) == len(rows)
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams
        assert abs(r.novelty - r.n_novel / r.n_grams) < 1e-12
    # the corpus has both boilerplate-heavy and original docs
    assert any(r.novelty < 1.0 for r in rows)
    assert any(r.novelty > 0.0 for r in rows)


def test_repeated_ngrams_planted_span(spark, tmp_path):
    """A 10-word span planted verbatim in two docs must flag exactly
    the 8-gram instances inside it (3 per doc of 20 words: positions
    covering the shared span), and a fully-unique doc must flag 0."""
    from hadoop_fixedlengthinputformat_spark.functions.curation_extras import (
        llm_repeated_ngrams,
    )

    import pyspark.sql.functions as F

    span = " ".join(f"s{i}" for i in range(10))
    docs = [
        (1, span + " " + " ".join(f"a{i}" for i in range(10)), "en", "s0"),
        (2, " ".join(f"b{i}" for i in range(10)) + " " + span, "en", "s0"),
        (3, " ".join(f"c{i}" for i in range(20)), "en", "s0"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(out + "/documents.parquet")
    rows = {r.doc_id: r for r in llm_repeated_ngrams(spark, out).collect()}
    # 20 words -> 13 8-gram instances per doc; the 10-word shared span
    # contributes exactly 3 fully-inside 8-grams (offsets 0..2 / 10..12)
    assert rows[1].n_ngrams == 13 and rows[2].n_ngrams == 13
    assert rows[1].n_repeated == 3 and rows[2].n_repeated == 3
    assert abs(rows[1].repeated_frac - 3 / 13) < 1e-12
    assert rows[3].n_repeated == 0 and rows[3].repeated_frac == 0.0


def test_agg_moments_matches_numpy(spark, sf_dir):
    """Population skewness / excess kurtosis must match numpy computed
    from the same floored quantities (within snap tolerance)."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_moments,
    )

    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    groups: dict[str, list[int]] = {}
    for r in tbl:
        if r["l_quantity"] is not None:
            groups.setdefault(r["l_returnflag"], []).append(
                int(math.floor(r["l_quantity"]))
            )
    got = {r.l_returnflag: r for r in agg_moments(spark, sf_dir).collect()}
    for flag, vals in groups.items():
        x = np.array(vals, dtype=np.float64)
        m2 = ((x - x.mean()) ** 2).mean()
        if len(x) < 2 or m2 == 0:
            assert flag not in got
            continue
        skew = ((x - x.mean()) ** 3).mean() / m2 ** 1.5
        kurt = ((x - x.mean()) ** 4).mean() / m2 ** 2 - 3
        r = got[flag]
        assert r.n_rows == len(vals)
        assert abs(r.skew_q - skew) < 2e-4, (flag, r.skew_q, skew)
        assert abs(r.kurt_q - kurt) < 2e-4, (flag, r.kurt_q, kurt)


def test_agg_gini_matches_numpy(spark, sf_dir):
    """Gini via the rank-sum identity must match the O(n^2) pairwise
    definition computed by numpy on the same floored values."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_gini,
    )

    tbl = pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()
    groups: dict[str, list[int]] = {}
    for r in tbl:
        if r["o_totalprice"] is not None and r["o_totalprice"] >= 0 and \
                r["o_orderpriority"] is not None:
            groups.setdefault(r["o_orderpriority"], []).append(
                int(math.floor(r["o_totalprice"]))
            )
    got = {r.priority: r for r in agg_gini(spark, sf_dir).collect()}
    for pr, vals in groups.items():
        x = np.array(vals, dtype=np.float64)
        if x.sum() == 0:
            assert pr not in got
            continue
        diffs = np.abs(x[:, None] - x[None, :]).sum()
        gini = diffs / (2 * len(x) ** 2 * x.mean())
        r = got[pr]
        assert r.n_orders == len(vals)
        assert abs(r.gini - gini) < 2e-4, (pr, r.gini, gini)


def test_agg_ttest_matches_numpy(spark, sf_dir):
    """Welch t from the rank-free power-sum identity must match the
    textbook mean/variance formulation in numpy."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_ttest,
    )

    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    a = np.array([math.floor(r["l_quantity"]) for r in tbl
                  if r["l_quantity"] is not None
                  and r["l_returnflag"] == "A"], dtype=np.float64)
    r_ = np.array([math.floor(r["l_quantity"]) for r in tbl
                   if r["l_quantity"] is not None
                   and r["l_returnflag"] == "R"], dtype=np.float64)
    rows = agg_ttest(spark, sf_dir).collect()
    if len(a) < 2 or len(r_) < 2 or (a.var(ddof=1) == 0 and r_.var(ddof=1) == 0):
        assert rows == []
        return
    t = (a.mean() - r_.mean()) / math.sqrt(
        a.var(ddof=1) / len(a) + r_.var(ddof=1) / len(r_)
    )
    assert len(rows) == 1
    assert rows[0].n_a == len(a) and rows[0].n_r == len(r_)
    assert abs(rows[0].t_stat - t) < 2e-4, (rows[0].t_stat, t)


def test_agg_chisq_matches_numpy(spark, sf_dir):
    """Chi-square from the fixed 6-term expression must match the
    textbook contingency computation."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_chisq,
    )

    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    obs = np.zeros((3, 2))
    flags, stats = "ANR", "FO"
    for r in tbl:
        if r["l_returnflag"] in flags and r["l_linestatus"] in stats:
            obs[flags.index(r["l_returnflag"]),
                stats.index(r["l_linestatus"])] += 1
    rows = agg_chisq(spark, sf_dir).collect()
    if (obs.sum(axis=1) == 0).any() or (obs.sum(axis=0) == 0).any():
        assert rows == []
        return
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    assert len(rows) == 1
    assert rows[0].n_rows == int(obs.sum())
    assert abs(rows[0].chi2 - chi2) < 2e-4, (rows[0].chi2, chi2)


def test_agg_spearman_matches_scipy_free_reference(spark, sf_dir):
    """Spearman from exact integer midranks must match a pure-Python
    midrank + Pearson reference on the same floored values."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_spearman,
    )

    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    groups: dict[str, list[tuple[int, int]]] = {}
    for r in tbl:
        if r["l_quantity"] is not None and r["l_extendedprice"] is not None \
                and r["l_returnflag"] is not None:
            groups.setdefault(r["l_returnflag"], []).append(
                (int(math.floor(r["l_quantity"])),
                 int(math.floor(r["l_extendedprice"])))
            )

    def midranks(vals):
        order = np.argsort(np.asarray(vals), kind="stable")
        ranks = np.empty(len(vals), dtype=np.float64)
        sv = np.asarray(vals)[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2  # average of ranks i+1..j
            i = j
        return ranks

    got = {r.flag: r for r in agg_spearman(spark, sf_dir).collect()}
    for flag, pairs in groups.items():
        if len(pairs) < 2:
            assert flag not in got
            continue
        x = midranks([q for q, _ in pairs])
        y = midranks([p for _, p in pairs])
        if x.std() == 0 or y.std() == 0:
            assert flag not in got
            continue
        rho = np.corrcoef(x, y)[0, 1]
        r = got[flag]
        assert r.n_rows == len(pairs)
        assert abs(r.rho - rho) < 2e-4, (flag, r.rho, rho)


def test_agg_mannwhitney_matches_reference(spark, sf_dir):
    """U and z from exact rank sums must match a pure-Python midrank
    reference (tie-corrected normal approximation, no continuity
    correction)."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_mannwhitney,
    )

    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    a, r_ = [], []
    for r in tbl:
        if r["l_quantity"] is None:
            continue
        if r["l_returnflag"] == "A":
            a.append(math.floor(r["l_quantity"]))
        elif r["l_returnflag"] == "R":
            r_.append(math.floor(r["l_quantity"]))
    rows = agg_mannwhitney(spark, sf_dir).collect()
    pooled = np.array(a + r_, dtype=np.float64)
    if not a or not r_ or len(set(a + r_)) < 2:
        assert rows == []
        return
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled))
    sv = pooled[order]
    i = 0
    tsum = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2
        t = j - i
        tsum += t ** 3 - t
        i = j
    na, nb, nn = len(a), len(r_), len(pooled)
    ra = ranks[: na].sum()
    u = ra - na * (na + 1) / 2
    var = na * nb / 12 * ((nn + 1) - tsum / (nn * (nn - 1)))
    z = (u - na * nb / 2) / math.sqrt(var)
    assert len(rows) == 1
    got = rows[0]
    assert (got.n_a, got.n_r) == (na, nb)
    assert got.u2 == int(round(2 * u))
    assert abs(got.z_stat - z) < 2e-4, (got.z_stat, z)


def test_agg_ks_matches_reference(spark, sf_dir):
    """Exact-fraction KS distance must equal the ECDF sup-distance
    computed directly."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_ks_test,
    )

    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    a, b = [], []
    for r in tbl:
        if r["l_quantity"] is None:
            continue
        if r["l_returnflag"] == "A":
            a.append(math.floor(r["l_quantity"]))
        elif r["l_returnflag"] == "R":
            b.append(math.floor(r["l_quantity"]))
    rows = agg_ks_test(spark, sf_dir).collect()
    if not a or not b:
        assert rows == []
        return
    xs = sorted(set(a + b))
    aa, bb = np.array(sorted(a)), np.array(sorted(b))
    d = max(
        abs(
            np.searchsorted(aa, v, side="right") / len(a)
            - np.searchsorted(bb, v, side="right") / len(b)
        )
        for v in xs
    )
    assert len(rows) == 1
    got = rows[0]
    assert (got.n_a, got.n_r) == (len(a), len(b))
    assert abs(got.d_num / got.d_den - d) < 1e-12, (got.d_num / got.d_den, d)


def test_agg_kruskal_matches_reference(spark, sf_dir):
    """H from exact doubled rank sums must match a pure-Python midrank
    reference with tie correction."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_kruskal,
    )

    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    groups = {"A": [], "N": [], "R": []}
    for r in tbl:
        if r["l_quantity"] is not None and r["l_returnflag"] in groups:
            groups[r["l_returnflag"]].append(math.floor(r["l_quantity"]))
    rows = agg_kruskal(spark, sf_dir).collect()
    pooled = np.array(sum(groups.values(), []), dtype=np.float64)
    if any(not v for v in groups.values()) or len(set(pooled)) < 2:
        assert rows == []
        return
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled))
    sv = pooled[order]
    i = 0
    tsum = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2
        t = j - i
        tsum += t ** 3 - t
        i = j
    nn = len(pooled)
    h = 0.0
    start = 0
    for cls in ("A", "N", "R"):
        n_j = len(groups[cls])
        rj = ranks[start : start + n_j].sum()
        h += rj * rj / n_j
        start += n_j
    h = 12 / (nn * (nn + 1)) * h - 3 * (nn + 1)
    h /= 1 - tsum / (nn ** 3 - nn)
    assert len(rows) == 1
    got = rows[0]
    assert (got.n_a, got.n_n, got.n_r) == tuple(len(groups[c]) for c in "ANR")
    assert abs(got.h_stat - h) < 2e-4, (got.h_stat, h)


def test_agg_jarque_bera_matches_numpy(spark, sf_dir):
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_jarque_bera,
    )

    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    groups: dict[str, list[int]] = {}
    for r in tbl:
        if r["l_quantity"] is not None:
            groups.setdefault(r["l_returnflag"], []).append(
                int(math.floor(r["l_quantity"]))
            )
    got = {r.l_returnflag: r for r in agg_jarque_bera(spark, sf_dir).collect()}
    for flag, vals in groups.items():
        x = np.array(vals, dtype=np.float64)
        m2 = ((x - x.mean()) ** 2).mean()
        if len(x) < 2 or m2 == 0:
            assert flag not in got
            continue
        g1 = ((x - x.mean()) ** 3).mean() / m2 ** 1.5
        g2 = ((x - x.mean()) ** 4).mean() / m2 ** 2 - 3
        jb = len(x) / 6 * (g1 ** 2 + g2 ** 2 / 4)
        r = got[flag]
        assert r.n_rows == len(vals)
        assert abs(r.jb_stat - jb) < max(2e-4, 2e-4 * abs(jb)), (
            flag, r.jb_stat, jb,
        )


def test_agg_anova_matches_numpy(spark, sf_dir):
    """One-way F from the fixed 5-term power-sum tree must match the
    textbook SSB/SSW computation in numpy."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        SEGMENTS, agg_anova,
    )

    tbl = pq.read_table(f"{sf_dir}/customer.parquet").to_pylist()
    groups: dict[str, list[int]] = {}
    for r in tbl:
        if r["c_acctbal"] is not None and r["c_mktsegment"] in SEGMENTS:
            groups.setdefault(r["c_mktsegment"], []).append(
                int(math.floor(r["c_acctbal"]))
            )
    rows = agg_anova(spark, sf_dir).collect()
    if len(groups) < 5 or any(len(v) < 2 for v in groups.values()):
        assert rows == []
        return
    xs = [np.array(v, dtype=np.float64) for v in groups.values()]
    allx = np.concatenate(xs)
    ssb = sum(len(x) * (x.mean() - allx.mean()) ** 2 for x in xs)
    ssw = sum(((x - x.mean()) ** 2).sum() for x in xs)
    if ssw == 0:
        assert rows == []
        return
    f = (ssb / 4) / (ssw / (len(allx) - 5))
    assert len(rows) == 1
    assert rows[0].n_total == len(allx)
    assert abs(rows[0].f_stat - f) < max(2e-4, 2e-4 * abs(f)), (
        rows[0].f_stat, f,
    )


def test_agg_levene_matches_numpy(spark, sf_dir):
    """Brown-Forsythe from the per-value collapse must match the direct
    |x - lower_median| ANOVA in numpy."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_levene,
    )

    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    groups: dict[str, list[int]] = {}
    for r in tbl:
        if r["l_quantity"] is not None and r["l_returnflag"] in "ANR":
            groups.setdefault(r["l_returnflag"], []).append(
                int(math.floor(r["l_quantity"]))
            )
    rows = agg_levene(spark, sf_dir).collect()
    if len(groups) < 3 or any(len(v) < 2 for v in groups.values()):
        assert rows == []
        return

    def lower_median(vals):
        sv = sorted(vals)
        # smallest value whose cumulative count reaches half the total
        for i, v in enumerate(sv):
            if 2 * (i + 1) >= len(sv):
                return v

    zs = []
    meds = {}
    for flag in "ANR":
        m = lower_median(groups[flag])
        meds[flag] = m
        zs.append(np.abs(np.array(groups[flag], dtype=np.float64) - m))
    allz = np.concatenate(zs)
    ssb = sum(len(z) * (z.mean() - allz.mean()) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    if ssw == 0:
        assert rows == []
        return
    f = (ssb / 2) / (ssw / (len(allz) - 3))
    assert len(rows) == 1
    assert rows[0].n_total == len(allz)
    assert (rows[0].med_a, rows[0].med_n, rows[0].med_r) == (
        meds["A"], meds["N"], meds["R"],
    )
    assert abs(rows[0].bf_stat - f) < max(2e-4, 2e-4 * abs(f)), (
        rows[0].bf_stat, f,
    )


def test_agg_entropy_matches_numpy(spark, sf_dir):
    """Entropy from int64 ln-units must match the direct -sum(p ln p)."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_entropy,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    counts: dict[str, dict[str, int]] = {}
    for r in tbl:
        if r["lang"] is not None and r["source"] is not None:
            counts.setdefault(r["source"], {})
            counts[r["source"]][r["lang"]] = (
                counts[r["source"]].get(r["lang"], 0) + 1
            )
    got = {r.source: r for r in agg_entropy(spark, sf_dir).collect()}
    assert set(got) == set(counts)
    for src, langs in counts.items():
        n = sum(langs.values())
        p = np.array(list(langs.values()), dtype=np.float64) / n
        h = float(-(p * np.log(p)).sum())
        r = got[src]
        assert r.n_docs == n
        assert abs(r.lang_entropy - h) < 2e-4, (src, r.lang_entropy, h)


def test_agg_benford_matches_numpy(spark, sf_dir):
    """Benford chi-square from the literal-share 9-term tree must match
    the direct computation."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_benford,
    )

    tbl = pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()
    obs = np.zeros(9)
    for r in tbl:
        if r["o_totalprice"] is not None and r["o_totalprice"] >= 1:
            obs[int(str(int(math.floor(r["o_totalprice"])))[0]) - 1] += 1
    rows = agg_benford(spark, sf_dir).collect()
    if obs.sum() == 0:
        assert rows == []
        return
    exp = obs.sum() * np.log10(1 + 1 / np.arange(1, 10))
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert len(rows) == 1
    assert rows[0].n_orders == int(obs.sum())
    assert abs(rows[0].chi2_benford - chi2) < max(2e-4, 2e-4 * abs(chi2)), (
        rows[0].chi2_benford, chi2,
    )


def _purchase_series(sf_dir):
    """Per-user purchase cent values in the engine's total order."""
    tbl = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    series: dict[int, list[tuple]] = {}
    for r in tbl:
        if r["event_type"] == "purchase" and r["ts"] is not None \
                and r["value"] is not None and r["user_id"] is not None \
                and r["event_id"] is not None:
            vc = int(round(r["value"] * 100))
            series.setdefault(r["user_id"], []).append(
                (r["ts"], r["event_id"], vc)
            )
    for rows in series.values():
        rows.sort()
    return series


def test_ts_bollinger_matches_numpy(spark, sf_dir):
    """Band math from exact frame sums must match the direct rolling
    mean/population-sigma computation."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.timeseries import (
        ts_bollinger,
    )

    series = _purchase_series(sf_dir)
    expected = {}
    for uid, rows in series.items():
        vals = np.array([v for _, _, v in rows], dtype=np.float64)
        for i in range(19, len(vals)):
            fr = vals[i - 19:i + 1]
            mid = fr.mean()
            sd = fr.std()  # population
            expected[(uid, i)] = (mid, mid + 2 * sd, mid - 2 * sd)
    got = ts_bollinger(spark, sf_dir).collect()
    assert len(got) == len(expected)
    # per-user row counts and value ranges line up; spot-check values by
    # re-deriving each row's frame from its (user, sorted-position)
    by_user: dict[int, list] = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.us, r.event_id, r.vc))
        for i, r in enumerate(rows):
            mid, up, lo = expected[(uid, i + 19)]
            assert abs(r.mid_cents - mid) < 2e-4
            assert abs(r.upper_cents - up) < 5e-4
            assert abs(r.lower_cents - lo) < 5e-4


def test_ts_rsi_matches_numpy(spark, sf_dir):
    """RSI = 100*G/(G+L) from exact frame sums must match the direct
    gain/loss rolling computation."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.timeseries import (
        ts_rsi,
    )

    series = _purchase_series(sf_dir)
    expected: dict[int, list[float]] = {}
    for uid, rows in series.items():
        vals = np.array([v for _, _, v in rows], dtype=np.int64)
        d = np.diff(vals)
        out = []
        for i in range(13, len(d)):
            fr = d[i - 13:i + 1]
            g = int(fr[fr > 0].sum())
            loss = int(-fr[fr < 0].sum())
            if g + loss > 0:
                out.append(100.0 * g / (g + loss))
        expected[uid] = sorted(out)
    got: dict[int, list[float]] = {}
    for r in ts_rsi(spark, sf_dir).collect():
        assert r.gain14 >= 0 and r.loss14 >= 0 and r.gain14 + r.loss14 > 0
        got.setdefault(r.user_id, []).append(r.rsi)
    for uid in got:
        got[uid].sort()
    assert set(got) == {u for u, v in expected.items() if v}
    for uid, vals in got.items():
        exp = expected[uid]
        assert len(vals) == len(exp)
        for a, b in zip(vals, exp):
            assert abs(a - b) < 2e-4


def test_llm_zipf_fit_matches_numpy(spark, sf_dir):
    """Zipf exponent from int64 ln-units must match a direct numpy
    least-squares on the same head."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.functions.curation_extras import (
        _ZIPF_HEAD, llm_zipf_fit,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    counts: dict[str, int] = {}
    for r in tbl:
        if r["text"]:
            for tok in r["text"].split(" "):
                if tok:
                    counts[tok] = counts.get(tok, 0) + 1
    head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_HEAD]
    rows = llm_zipf_fit(spark, sf_dir).collect()
    if len(head) < 2:
        assert rows == []
        return
    x = np.log(np.arange(1, len(head) + 1, dtype=np.float64))
    y = np.log(np.array([c for _, c in head], dtype=np.float64))
    if np.allclose(x, x.mean()) or np.allclose(y, y.mean()):
        assert rows == []
        return
    slope = ((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum()
    r2 = (((x - x.mean()) * (y - y.mean())).sum() ** 2
          / (((x - x.mean()) ** 2).sum() * ((y - y.mean()) ** 2).sum()))
    assert len(rows) == 1
    assert rows[0].n_fit == len(head)
    assert abs(rows[0].zipf_exponent - (-slope)) < 5e-4
    assert abs(rows[0].r2 - r2) < 5e-4
    assert 0.0 <= rows[0].r2 <= 1.0


def test_llm_dedup_bloom_invariants(spark, sf_dir):
    """Bloom membership has NO false negatives; the false-positive rate
    stays inside a generous multiple of the theoretical bound."""
    import hashlib as _hl

    from hadoop_fixedlengthinputformat_spark.functions.curation_extras import (
        _BLOOM_BITS, _BLOOM_K, llm_dedup_bloom,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    idx_digests = {
        _hl.md5(r["text"].encode()).hexdigest()
        for r in tbl
        if r["doc_id"] is not None and r["doc_id"] % 5 != 0 and r["text"] is not None
    }
    rows = llm_dedup_bloom(spark, sf_dir).collect()
    assert len(rows) > 0
    fp = fn = 0
    for r in rows:
        assert r.exact_dup == (r.h in idx_digests)
        if r.exact_dup and not r.bloom_candidate:
            fn += 1
        if r.bloom_candidate and not r.exact_dup:
            fp += 1
    assert fn == 0, "bloom filter produced a false negative"
    # theoretical FPR (1-exp(-kn/m))^k; allow a wide margin on small n
    import math as _m

    n = len(idx_digests)
    p = (1 - _m.exp(-_BLOOM_K * n / _BLOOM_BITS)) ** _BLOOM_K
    non_dup = sum(1 for r in rows if not r.exact_dup)
    if non_dup >= 50:
        assert fp <= max(5, 10 * p * non_dup), (fp, p, non_dup)


def test_agg_hhi_matches_python(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_hhi,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    counts: dict[str, dict[str, int]] = {}
    for r in tbl:
        if r["lang"] is not None and r["source"] is not None:
            counts.setdefault(r["lang"], {})
            counts[r["lang"]][r["source"]] = (
                counts[r["lang"]].get(r["source"], 0) + 1
            )
    got = {r.lang: r for r in agg_hhi(spark, sf_dir).collect()}
    assert set(got) == set(counts)
    for lang, srcs in counts.items():
        n = sum(srcs.values())
        hhi = sum((c / n) ** 2 for c in srcs.values())
        r = got[lang]
        assert r.n_docs == n and r.n_sources == len(srcs)
        assert abs(r.hhi - hhi) < 2e-4
        assert 1.0 / max(len(srcs), 1) - 2e-4 <= r.hhi <= 1.0 + 2e-4


def test_ts_dow_profile_matches_python(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.operators.timeseries import (
        ts_dow_profile,
    )

    tbl = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    cells: dict[str, list[int]] = {}
    for r in tbl:
        if r["ts"] is not None and r["event_type"] is not None:
            ts = r["ts"]
            if ts.tzinfo is not None:
                import datetime as _dt

                ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            import datetime as _dt

            epoch = int(
                (ts - _dt.datetime(1970, 1, 1)).total_seconds() // 1
            )
            dow = ((epoch // 86400) % 7 + 7) % 7
            cells.setdefault(r["event_type"], [0] * 7)[dow] += 1
    got = {r.event_type: r for r in ts_dow_profile(spark, sf_dir).collect()}
    for et, cs in cells.items():
        n = sum(cs)
        if n < 7:
            assert et not in got
            continue
        chi = sum((c - n / 7) ** 2 / (n / 7) for c in cs)
        r = got[et]
        assert r.n_events == n
        assert abs(r.chi2_dow - chi) < max(2e-4, 2e-4 * abs(chi))


def test_llm_quality_classifier_matches_python(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.functions.curation_extras import (
        llm_quality_classifier,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    got = {}
    for r in llm_quality_classifier(spark, sf_dir).collect():
        got.setdefault(r.doc_id, []).append(r)
    import math as _m

    seen = 0
    for r in tbl:
        if r["doc_id"] is None or not r["text"]:
            continue
        seen += 1
        ntok = len(r["text"]) - len(r["text"].replace(" ", "")) + 1
        nns = len(r["text"].replace(" ", ""))
        z = -1.5 + 0.002 * min(ntok, 1000) + 0.3 * (nns / ntok - 4.0)
        score = 1.0 / (1.0 + _m.exp(-z))
        matches = [
            g for g in got.get(r["doc_id"], [])
            if g.n_tok == ntok and abs(g.quality_score - score) < 2e-4
        ]
        assert matches, (r["doc_id"], ntok, score)
        assert matches[0].is_quality == (matches[0].quality_score >= 0.5)
    assert seen > 0


def test_ts_survival_km_matches_python(spark, sf_dir):
    """KM from ln-unit sums must match the direct product estimator."""
    import datetime as _dt

    from hadoop_fixedlengthinputformat_spark.operators.timeseries import (
        ts_survival_km,
    )

    tbl = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    users: dict[int, dict] = {}
    for r in tbl:
        if r["ts"] is None or r["user_id"] is None or r["event_type"] is None:
            continue
        ts = r["ts"]
        if ts.tzinfo is not None:
            ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        epoch = int((ts - _dt.datetime(1970, 1, 1)).total_seconds() // 1)
        u = users.setdefault(
            r["user_id"], {"first": epoch, "last": epoch, "err": None}
        )
        u["first"] = min(u["first"], epoch)
        u["last"] = max(u["last"], epoch)
        if r["event_type"] == "error":
            u["err"] = epoch if u["err"] is None else min(u["err"], epoch)
    durs = []
    for u in users.values():
        end = u["err"] if u["err"] is not None else u["last"]
        durs.append(((end - u["first"]) // 86400, u["err"] is not None))
    # direct KM
    from collections import Counter

    d_at = Counter(t for t, obs in durs if obs)
    a_at = Counter(t for t, _ in durs)
    total = len(durs)
    surv, expected, cum_before = 1.0, {}, 0
    for t in sorted(a_at):
        nr = total - cum_before
        d = d_at.get(t, 0)
        if d > 0:
            surv *= (nr - d) / nr
            expected[t] = (nr, d, surv)
        cum_before += a_at[t]
    got = {r.t_day: r for r in ts_survival_km(spark, sf_dir).collect()}
    assert set(got) == set(expected)
    for t, (nr, d, s) in expected.items():
        r = got[t]
        assert (r.n_risk, r.n_events) == (nr, d)
        assert abs(r.survival - s) < 2e-4, (t, r.survival, s)
    # survival is non-increasing in t
    vals = [got[t].survival for t in sorted(got)]
    assert all(a >= b - 1e-9 for a, b in zip(vals, vals[1:]))


def test_llm_length_histogram_buckets(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.functions.curation_extras import (
        llm_length_histogram,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    exp: dict[int, list[int]] = {}
    for r in tbl:
        if r["text"]:
            ntok = len(r["text"]) - len(r["text"].replace(" ", "")) + 1
            b = 1
            while b * 2 <= ntok and b < 4096:
                b *= 2
            cell = exp.setdefault(b, [0, 0])
            cell[0] += 1
            cell[1] += ntok
    got = {r.bucket: (r.n_docs, r.sum_tokens)
           for r in llm_length_histogram(spark, sf_dir).collect()}
    assert got == {b: tuple(v) for b, v in exp.items()}


def test_video_frame_sampling_matches_numpy(spark, sf_dir):
    """Video kernel ground truth: the sampled frames' luma must match a
    direct numpy decode of the same deterministic container, and a
    foreign-codec payload must quarantine (zero rows)."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.functions import multimodal

    # pure-python reference on one doc
    payload = multimodal.video_payload(7, "hello", n_frames=6)
    frames = multimodal.split_video_frames(payload)
    assert frames is not None and len(frames) == 6
    for img in frames:
        assert img.shape == (8 + 7 % 3, 8 + 7 % 5, 3)
    # spark pipeline agrees per (doc, frame) — run the kernel directly
    # (the registered query now collapses luma to a driver-gate boolean)
    import pyspark.sql.functions as F

    from hadoop_fixedlengthinputformat_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    kernel_out = multimodal.sample_video_frames(
        multimodal.attach_video(d), every=2
    )
    got = {(r.doc_id, r.frame_idx): r for r in kernel_out.collect()}
    assert got
    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    checked = 0
    for r in tbl:
        if r["doc_id"] is None or r["doc_id"] >= 60:
            continue
        frames = multimodal.split_video_frames(
            multimodal.video_payload(r["doc_id"], r["text"] or "")
        )
        for fi in range(0, len(frames), 2):
            g = got[(r["doc_id"], fi)]
            assert g.n_frames == len(frames)
            assert abs(g.mean_luma - float(frames[fi].mean()) / 255.0) < 1e-9
            checked += 1
    assert checked > 0
    # quarantine: foreign magic yields None
    assert multimodal.split_video_frames(b"\x00\x01notavideo") is None
    # truncated mid-frame yields None, never a shifted parse
    assert multimodal.split_video_frames(payload[:-5]) is None
