"""Independent reference pins for the round-12 operators.

Parity (Spark vs DuckDB) cannot see a wrong formula both engines agree
on — each operator is re-derived from the raw parquet with a
brute-force pure-Python implementation and compared exactly (the
round-11 test_round11_ops pattern).
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq

from hadoop_fixedlengthinputformat_spark.functions.curation_extras import (
    llm_tokenizer_fertility,
)
from hadoop_fixedlengthinputformat_spark.functions.llm_queries import (
    llm_minhash_containment,
)
from hadoop_fixedlengthinputformat_spark.operators.analytics_extras import (
    graph_adamic_adar,
    graph_transitivity,
)
from hadoop_fixedlengthinputformat_spark.operators.dq_suite import (
    dq_accepted_values,
    dq_null_profile,
    dq_reconciliation,
    dq_row_count_anomaly,
)
from hadoop_fixedlengthinputformat_spark.operators.inequality import (
    agg_atkinson_index,
    agg_lorenz_deciles,
    agg_theil_index,
    win_pareto_cover,
)
from hadoop_fixedlengthinputformat_spark.operators.timeseries import (
    ts_lag_corr,
    ts_seasonality_strength,
)

TOL = 2e-4  # both sides snap to 4 decimals
LN5_TOL = 2e-4 + 1e-5  # theil adds <=5e-6 per-term ln-unit rounding


def _rows(sf_dir: str, table: str, cols: list[str]) -> list[dict]:
    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=cols).to_pylist()


def _order_values(sf_dir: str) -> dict[str, list[int]]:
    by: dict[str, list[int]] = defaultdict(list)
    for r in _rows(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]):
        if r["o_orderpriority"] is not None and r["o_totalprice"] is not None:
            by[r["o_orderpriority"]].append(math.floor(r["o_totalprice"]))
    return by


def test_theil_index_matches_bruteforce(spark, sf_dir):
    got = {r.priority: r for r in agg_theil_index(spark, sf_dir).collect()}
    for pr, vs in _order_values(sf_dir).items():
        vs = [v for v in vs if v >= 1]
        if not vs or sum(vs) <= 0:
            continue
        mu = sum(vs) / len(vs)
        want = sum((v / mu) * math.log(v / mu) for v in vs) / len(vs)
        r = got[pr]
        assert r.n_orders == len(vs)
        assert r.sum_value == sum(vs)
        assert abs(r.theil_t - want) < LN5_TOL


def test_atkinson_index_matches_bruteforce(spark, sf_dir):
    got = {r.priority: r for r in agg_atkinson_index(spark, sf_dir).collect()}
    for pr, vs in _order_values(sf_dir).items():
        vs = [v for v in vs if v >= 1]
        if not vs:
            continue
        gm = math.exp(sum(math.log(v) for v in vs) / len(vs))
        want = 1.0 - gm / (sum(vs) / len(vs))
        r = got[pr]
        assert r.n_orders == len(vs)
        assert abs(r.atkinson - want) < TOL


def test_lorenz_deciles_match_bruteforce(spark, sf_dir):
    got = {
        (r.priority, r.decile): r
        for r in agg_lorenz_deciles(spark, sf_dir).collect()
    }
    for pr, raw in _order_values(sf_dir).items():
        vs = sorted(v for v in raw if v >= 0)
        n, tot = len(vs), sum(v for v in raw if v >= 0)
        if tot <= 0:
            continue
        cum = 0
        cums = []
        for v in vs:
            cum += v
            cums.append(cum)
        for d in range(1, 11):
            b = (d * n) // 10
            if b < 1:
                assert (pr, d) not in got
                continue
            r = got[(pr, d)]
            assert r.cum_orders == b
            assert r.cum_value == cums[b - 1]
            assert r.total_value == tot
            assert abs(r.cum_share - cums[b - 1] / tot) < TOL


def test_pareto_cover_matches_bruteforce(spark, sf_dir):
    rev: dict[tuple[str, int], int] = defaultdict(int)
    for r in _rows(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_suppkey", "l_extendedprice", "l_discount"],
    ):
        if None in (
            r["l_returnflag"],
            r["l_suppkey"],
            r["l_extendedprice"],
            r["l_discount"],
        ):
            continue
        units = round(r["l_extendedprice"] * 100) * (
            100 - round(r["l_discount"] * 100)
        )
        rev[(r["l_returnflag"], r["l_suppkey"])] += units
    by_flag: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for (flag, supp), u in rev.items():
        by_flag[flag].append((u, supp))
    got = {r.flag: r for r in win_pareto_cover(spark, sf_dir).collect()}
    for flag, items in by_flag.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        tot = sum(u for u, _ in items)
        if tot <= 0:
            continue
        cum = 0
        for i, (u, _) in enumerate(items, start=1):
            cum += u
            if 5 * cum >= 4 * tot:
                k, covered = i, cum
                break
        r = got[flag]
        assert r.n_suppliers == len(items)
        assert r.k_cover80 == k
        assert r.covered_units == covered
        assert r.total_units == tot
        assert abs(r.covered_share - covered / tot) < TOL


def _daily_revenue_kusd(sf_dir: str) -> dict[int, int]:
    daily: dict[int, int] = defaultdict(int)
    for r in _rows(
        sf_dir, "lineitem", ["l_shipdate", "l_extendedprice", "l_discount"]
    ):
        if None in (r["l_shipdate"], r["l_extendedprice"], r["l_discount"]):
            continue
        day = math.floor(r["l_shipdate"].timestamp()) // 86400
        daily[day] += round(r["l_extendedprice"] * 100) * (
            100 - round(r["l_discount"] * 100)
        )
    return {d: u // 10000000 for d, u in daily.items()}


def test_seasonality_strength_matches_bruteforce(spark, sf_dir):
    ys = _daily_revenue_kusd(sf_dir)
    groups: dict[int, list[int]] = defaultdict(list)
    for d, y in ys.items():
        groups[d % 7].append(y)
    all_y = [y for g in groups.values() for y in g]
    n = len(all_y)
    mean = sum(all_y) / n
    sst = sum((y - mean) ** 2 for y in all_y)
    ssb = sum(len(g) * (sum(g) / len(g) - mean) ** 2 for g in groups.values())
    rows = ts_seasonality_strength(spark, sf_dir).collect()
    if sst <= 0:
        assert rows == []
        return
    (r,) = rows
    assert r.n_days == n
    assert abs(r.eta2_dow - ssb / sst) < TOL
    assert r.is_seasonal == ((r.eta2_dow) > 0.2)


def test_lag_corr_matches_bruteforce(spark, sf_dir):
    oc: dict[int, int] = defaultdict(int)
    for r in _rows(sf_dir, "orders", ["o_orderdate"]):
        if r["o_orderdate"] is not None:
            oc[math.floor(r["o_orderdate"].timestamp()) // 86400] += 1
    lc: dict[int, int] = defaultdict(int)
    for r in _rows(sf_dir, "lineitem", ["l_shipdate"]):
        if r["l_shipdate"] is not None:
            lc[math.floor(r["l_shipdate"].timestamp()) // 86400] += 1
    got = {r.lag: r for r in ts_lag_corr(spark, sf_dir).collect()}
    for lag in range(6):
        xs, ys = [], []
        for d, x in oc.items():
            if d + lag in lc:
                xs.append(x)
                ys.append(lc[d + lag])
        n = len(xs)
        if n < 2:
            assert lag not in got
            continue
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            assert lag not in got
            continue
        want = (n * sxy - sx * sy) / math.sqrt(vx) / math.sqrt(vy)
        r = got[lag]
        assert r.n_days == n
        assert abs(r.corr - want) < TOL


def _copurchase_edges(sf_dir: str) -> set[tuple[int, int]]:
    by_order: dict[int, set[int]] = defaultdict(set)
    for r in _rows(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]):
        if r["l_orderkey"] is not None and r["l_partkey"] is not None:
            by_order[r["l_orderkey"]].add(r["l_partkey"])
    support: dict[tuple[int, int], int] = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                support[(u, v)] += 1
    return {e for e, c in support.items() if c >= 2}


def test_adamic_adar_matches_bruteforce(spark, sf_dir):
    edges = _copurchase_edges(sf_dir)
    nbrs: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    got = {(r.u, r.v): r for r in graph_adamic_adar(spark, sf_dir).collect()}
    assert set(got) == edges
    for u, v in edges:
        common = nbrs[u] & nbrs[v]
        r = got[(u, v)]
        assert r.common == len(common)
        assert r.pref_attach == len(nbrs[u]) * len(nbrs[v])
        aa = sum(1.0 / math.log(len(nbrs[w])) for w in common)
        ra = sum(1.0 / len(nbrs[w]) for w in common)
        assert abs(r.adamic_adar - aa) < TOL + 1e-6 * max(len(common), 1)
        assert abs(r.resource_alloc - ra) < TOL
        # every witness of an edge is adjacent to both ends: deg >= 2
        assert all(len(nbrs[w]) >= 2 for w in common)


def test_transitivity_matches_bruteforce(spark, sf_dir):
    edges = _copurchase_edges(sf_dir)
    nbrs: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    tri = 0
    for u, v in edges:
        tri += len(nbrs[u] & nbrs[v])
    tri //= 3  # each triangle counted once per edge
    wedges = sum(d * (d - 1) // 2 for d in map(len, nbrs.values()))
    rows = graph_transitivity(spark, sf_dir).collect()
    if wedges == 0:
        assert rows == []
        return
    (r,) = rows
    assert r.n_nodes == len(nbrs)
    assert r.n_edges == len(edges)
    assert r.n_triangles == tri
    assert r.n_wedges == wedges
    assert abs(r.transitivity - 3 * tri / wedges) < TOL


def test_dq_accepted_values_matches_bruteforce(spark, sf_dir):
    specs = {
        "events.event_type": (
            "events",
            "event_type",
            {"click", "view", "purchase", "login"},
        ),
        "orders.o_orderstatus": ("orders", "o_orderstatus", {"O", "F"}),
        "lineitem.l_returnflag": (
            "lineitem",
            "l_returnflag",
            {"A", "N", "R"},
        ),
    }
    got = {r.check_name: r for r in dq_accepted_values(spark, sf_dir).collect()}
    assert set(got) == set(specs)
    for name, (table, col, ok) in specs.items():
        vals = [r[col] for r in _rows(sf_dir, table, [col]) if r[col] is not None]
        viol = sum(1 for v in vals if v not in ok)
        r = got[name]
        assert r.n_checked == len(vals)
        assert r.n_violations == viol
        assert r.passed == (viol == 0)


def test_dq_null_profile_matches_bruteforce(spark, sf_dir):
    audited = {
        "documents": ["doc_id", "text", "lang", "source", "n_chars"],
        "events": ["user_id", "event_type", "value", "props"],
    }
    got = {r.col_name: r for r in dq_null_profile(spark, sf_dir).collect()}
    for table, cols in audited.items():
        rows = _rows(sf_dir, table, cols)
        for c in cols:
            nn = sum(1 for r in rows if r[c] is None)
            g = got[f"{table}.{c}"]
            assert g.n_rows == len(rows)
            assert g.n_null == nn
            assert abs(g.null_frac - nn / max(len(rows), 1)) < TOL


def test_dq_row_count_anomaly_matches_bruteforce(spark, sf_dir):
    daily: dict[int, int] = defaultdict(int)
    for r in _rows(sf_dir, "events", ["ts"]):
        if r["ts"] is not None:
            daily[math.floor(r["ts"].timestamp()) // 86400] += 1
    cnts = sorted(daily.values())
    n = len(cnts)
    # integer-rank pick: smallest value whose running count reaches
    # ceil(n/2) — recompute exactly as the operator defines it
    med = cnts[math.ceil(n / 2) - 1]
    devs = sorted(abs(c - med) for c in cnts)
    mad = devs[math.ceil(n / 2) - 1]
    got = {r.day: r for r in dq_row_count_anomaly(spark, sf_dir).collect()}
    assert set(got) == set(daily)
    for day, cnt in daily.items():
        r = got[day]
        z = (cnt - med) / (1.4826 * max(mad, 1))
        assert r.n_events == cnt
        assert r.deviation == cnt - med
        assert abs(r.robust_z - z) < TOL
        assert r.is_anomaly == (abs(r.robust_z) > 3.5)


def test_dq_reconciliation_matches_bruteforce(spark, sf_dir):
    li: dict[int, int] = defaultdict(int)
    for r in _rows(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_extendedprice", "l_tax", "l_discount"],
    ):
        if None in (
            r["l_orderkey"],
            r["l_extendedprice"],
            r["l_tax"],
            r["l_discount"],
        ):
            continue
        li[r["l_orderkey"]] += (
            round(r["l_extendedprice"] * 100)
            * (100 + round(r["l_tax"] * 100))
            * (100 - round(r["l_discount"] * 100))
        )
    per_status: dict[str, list[int]] = defaultdict(list)
    for r in _rows(
        sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]
    ):
        if None in (r["o_orderkey"], r["o_orderstatus"], r["o_totalprice"]):
            continue
        if r["o_orderkey"] in li:
            diff = abs(
                li[r["o_orderkey"]] - round(r["o_totalprice"] * 100) * 10000
            )
            per_status[r["o_orderstatus"]].append(diff)
    got = {r.status: r for r in dq_reconciliation(spark, sf_dir).collect()}
    assert set(got) == set(per_status)
    for status, diffs in per_status.items():
        r = got[status]
        assert r.n_orders == len(diffs)
        assert r.n_mismatch == sum(1 for d in diffs if d > 10000)
        assert r.max_abs_diff_micro == max(diffs)


def _shingle_sets(sf_dir: str) -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    for r in _rows(sf_dir, "documents", ["doc_id", "text"]):
        if r["text"] is None:
            continue
        toks = r["text"].split(" ")
        n = max(len(toks) - 2, 1)
        sh = {" ".join(toks[i : i + 3]) for i in range(n)}
        out.setdefault(r["doc_id"], set()).update(sh)
    return out


def test_minhash_containment_matches_bruteforce(spark, sf_dir):
    sizes = {d: len(s) for d, s in _shingle_sets(sf_dir).items()}
    rows = llm_minhash_containment(spark, sf_dir).collect()
    assert rows, "LSH must produce candidates on the planted dup groups"
    for r in rows:
        assert r.size_a == sizes[r.doc_a]
        assert r.size_b == sizes[r.doc_b]
        # an LSH candidate shares >= 1 full band = >= 2 signature comps
        assert 2 <= r.k_match <= 8
        assert r.cont_num == r.k_match * (r.size_a + r.size_b)
        assert r.cont_den == (8 + r.k_match) * r.size_a
        assert abs(r.est_containment - r.cont_num / r.cont_den) < TOL
        # identical planted twins: full match -> containment estimate 1
        if r.k_match == 8 and r.size_a == r.size_b:
            assert abs(r.est_containment - 1.0) < TOL


def test_tokenizer_fertility_matches_bruteforce(spark, sf_dir):
    per_lang_docs: dict = defaultdict(int)
    per_lang_ws: dict = defaultdict(int)
    for r in _rows(sf_dir, "documents", ["lang", "text"]):
        if r["text"] is None:
            continue
        per_lang_docs[r["lang"]] += 1
        t = r["text"]
        per_lang_ws[r["lang"]] += len(t) - len(t.replace(" ", "")) + 1
    got = {r.lang: r for r in llm_tokenizer_fertility(spark, sf_dir).collect()}
    assert set(got) == set(per_lang_docs)
    for lang in per_lang_docs:
        r = got[lang]
        assert r.n_docs == per_lang_docs[lang]
        assert r.sum_ws_tokens == per_lang_ws[lang]
        assert r.bpe_ge_words and r.bpe_le_word_chars
