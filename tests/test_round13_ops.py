"""Independent reference pins for the round-13 operators.

Parity (Spark vs DuckDB) cannot see a wrong formula both engines agree
on — each operator is re-derived from the raw parquet with a
brute-force pure-Python/numpy implementation and compared exactly (the
test_round11_ops / test_round12_ops pattern).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from hadoop_fixedlengthinputformat_spark.functions.quality_extras import (
    llm_sentence_stats,
)
from hadoop_fixedlengthinputformat_spark.functions.scalar_queries import (
    fn_string_similarity,
)
from hadoop_fixedlengthinputformat_spark.operators.dq_suite import (
    dq_unique_keys,
)
from hadoop_fixedlengthinputformat_spark.operators.timeseries import (
    ts_linreg_forecast,
)

TOL = 2e-4  # both sides snap to 4 decimals


def _rows(sf_dir: str, table: str, cols: list[str]) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=cols).to_pylist()


def test_dq_unique_keys_matches_bruteforce(spark, sf_dir):
    checks = {
        "orders.o_orderkey": ("orders", "o_orderkey"),
        "part.p_partkey": ("part", "p_partkey"),
        "customer.c_custkey": ("customer", "c_custkey"),
        "documents.doc_id": ("documents", "doc_id"),
        "embeddings.vec_id": ("embeddings", "vec_id"),
    }
    got = {r.check_name: r for r in dq_unique_keys(spark, sf_dir).collect()}
    assert set(got) == set(checks)
    for name, (table, key) in checks.items():
        vals = [
            r[key] for r in _rows(sf_dir, table, [key]) if r[key] is not None
        ]
        cnt = Counter(vals)
        dups = sum(1 for c in cnt.values() if c > 1)
        g = got[name]
        assert g.n_rows == len(vals)
        assert g.n_distinct == len(cnt)
        assert g.n_dup_keys == dups
        assert g.passed == (dups == 0)


def test_ts_linreg_forecast_matches_numpy(spark, sf_dir):
    import numpy as np

    daily: dict[int, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for r in _rows(sf_dir, "events", ["user_id", "ts", "value"]):
        if r["user_id"] is None or r["ts"] is None or r["value"] is None:
            continue
        day = math.floor(r["ts"].timestamp()) // 86400
        daily[r["user_id"]][day] += round(r["value"] * 100)
    got = {r.user_id: r for r in ts_linreg_forecast(spark, sf_dir).collect()}
    expected_users = {
        u for u, d in daily.items() if len(d) >= 2 and max(d) > min(d)
    }
    assert set(got) == expected_users
    for u in expected_users:
        days = sorted(daily[u])
        m = days[0]
        x = np.array([d - m for d in days], dtype=float)
        y = np.array([daily[u][d] for d in days], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        g = got[u]
        assert g.n_days == len(days)
        assert g.x_span == days[-1] - m
        # exact integer fractions against numpy's float solution
        assert abs(g.slope_num / g.den - slope) < 1e-6 * max(1, abs(slope))
        assert abs(g.intercept_num / g.den - intercept) < 1e-6 * max(
            1, abs(intercept)
        )
        fc = intercept + slope * (g.x_span + 7)
        assert abs(g.slope_cents_per_day - slope) < TOL + 1e-6 * abs(slope)
        assert abs(g.intercept_cents - intercept) < TOL + 1e-6 * abs(intercept)
        assert abs(g.forecast_7d_cents - fc) < TOL + 1e-6 * abs(fc)


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fn_string_similarity_matches_bruteforce(spark, sf_dir):
    rows = [
        r
        for r in _rows(sf_dir, "part", ["p_partkey", "p_name", "p_type"])
        if r["p_name"] is not None and r["p_type"] is not None
    ]
    got = {r.p_partkey: r for r in fn_string_similarity(spark, sf_dir).collect()}
    assert set(got) == {r["p_partkey"] for r in rows}
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    for r in rows[:200]:
        a, b = r["p_name"], r["p_type"]
        g = got[r["p_partkey"]]
        lev = _levenshtein(a, b)
        assert g.lev == lev
        sa = {c for c in a.lower() if c in alphabet}
        sb = {c for c in b.lower() if c in alphabet}
        assert g.inter == len(sa & sb)
        assert g.uni == len(sa | sb)
        assert abs(g.lev_sim - (1 - lev / max(len(a), len(b), 1))) < TOL
        assert (
            abs(g.letter_jaccard - len(sa & sb) / max(len(sa | sb), 1)) < TOL
        )


def test_llm_sentence_stats_matches_bruteforce(spark, sf_dir):
    rows = [
        r
        for r in _rows(sf_dir, "documents", ["doc_id", "text"])
        if r["text"]
    ]
    got = {}
    for r in llm_sentence_stats(spark, sf_dir).collect():
        got.setdefault(r.doc_id, []).append(r)
    for r in rows[:500]:
        t = r["text"]
        n_sent = sum(1 for c in t if c in ".!?")
        n_tok = len(t) - len(t.replace(" ", "")) + 1
        cands = got[r["doc_id"]]
        # dup-id rolls: one output row per input row; match on values
        assert any(
            g.n_sentences == n_sent
            and g.n_tok == n_tok
            and g.ends_terminal == (t[-1] in ".!?")
            and abs(g.avg_sentence_tokens - n_tok / max(n_sent, 1)) < TOL
            for g in cands
        ), (r["doc_id"], n_sent, n_tok)


def test_near_twin_payload_hamming_bound():
    """The mm_phash_near_dedup fixture invariant: twin images hash
    within 2 bits (independent pure-python dHash, no numpy), distinct
    bases stay far apart — the separation the banded join resolves."""
    from hadoop_fixedlengthinputformat_spark.functions.multimodal import (
        near_twin_payload,
    )

    def py_dhash(payload: bytes) -> int:
        pos = 2
        vals = []
        for _ in range(3):
            while payload[pos : pos + 1].isspace():
                pos += 1
            start = pos
            while not payload[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(payload[start:pos]))
        w, h, _ = vals
        pix = payload[pos + 1 :]
        gray = [
            [
                (
                    pix[3 * (r * w + c)]
                    + pix[3 * (r * w + c) + 1]
                    + pix[3 * (r * w + c) + 2]
                )
                / 3.0
                for c in range(w)
            ]
            for r in range(h)
        ]
        small = [
            [gray[(r * h) // 8][(c * w) // 9] for c in range(9)]
            for r in range(8)
        ]
        val = 0
        for r in range(8):
            for c in range(8):
                val = (val << 1) | (1 if small[r][c + 1] > small[r][c] else 0)
        return val

    hashes = {i: py_dhash(near_twin_payload(i)) for i in range(100)}
    for k in range(50):
        d = bin(hashes[k] ^ hashes[k + 50]).count("1")
        assert d <= 2, (k, d)
    # distinct bases are far apart: every cross pair clears the gate
    far = [
        bin(hashes[i] ^ hashes[j]).count("1")
        for i in range(50)
        for j in range(i + 1, 50)
    ]
    assert min(far) > 4


def test_graph_hits_matches_bruteforce(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.operators.analytics_extras import (
        graph_hits,
    )

    cust = {
        r["o_orderkey"]: r["o_custkey"]
        for r in _rows(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        if r["o_custkey"] is not None
    }
    edges = set()
    for r in _rows(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]):
        if r["l_partkey"] is None:
            continue
        c = cust.get(r["l_orderkey"])
        if c is not None:
            edges.add((c, r["l_partkey"]))
    h1: dict[int, int] = defaultdict(int)
    for c, p in edges:
        h1[c] += 1
    a1: dict[int, int] = defaultdict(int)
    for c, p in edges:
        a1[p] += h1[c]
    h2: dict[int, int] = defaultdict(int)
    for c, p in edges:
        h2[c] += a1[p]
    a2: dict[int, int] = defaultdict(int)
    for c, p in edges:
        a2[p] += h2[c]
    got = {r.p_partkey: r for r in graph_hits(spark, sf_dir).collect()}
    assert set(got) == set(a1)
    for p, r in got.items():
        assert r.auth1 == a1[p] and r.auth2 == a2[p], p


def test_ts_backtest_linreg_matches_numpy(spark, sf_dir):
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.timeseries import (
        ts_backtest_linreg,
    )

    daily: dict[int, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for r in _rows(sf_dir, "events", ["user_id", "ts", "value"]):
        if r["user_id"] is None or r["ts"] is None or r["value"] is None:
            continue
        day = math.floor(r["ts"].timestamp()) // 86400
        daily[r["user_id"]][day] += round(r["value"] * 100)
    got = {r.user_id: r for r in ts_backtest_linreg(spark, sf_dir).collect()}
    for u, dd in daily.items():
        cutoff = max(dd) - 7
        train = sorted(d for d in dd if d <= cutoff)
        test = sorted(d for d in dd if d > cutoff)
        if len(train) < 2 or train[-1] == train[0]:
            assert u not in got
            continue
        assert u in got and test
        m = train[0]
        x = np.array([d - m for d in train], dtype=float)
        y = np.array([dd[d] for d in train], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        errs = [abs(dd[d] - (intercept + slope * (d - m))) for d in test]
        g = got[u]
        assert g.n_train == len(train) and g.n_test == len(test)
        mae = sum(errs) / len(errs)
        assert abs(g.mae_cents - mae) < TOL + 1e-6 * abs(mae)
        say = sum(abs(dd[d]) for d in test)
        if say:
            wape = sum(errs) / say
            assert abs(g.wape - wape) < TOL + 1e-6 * abs(wape)
