"""Independent reference pins for the round-10 second-wave operators.

Parity (Spark vs DuckDB) cannot see a wrong formula both engines agree
on (the agg_moments lesson) — each operator here is re-derived from the
raw parquet with a brute-force pure-Python/numpy implementation and
compared within snap tolerance.
"""

from __future__ import annotations

import itertools
import math
import re
from datetime import timezone

import pyarrow.parquet as pq

from hadoop_fixedlengthinputformat_spark.operators.timeseries import (
    ts_durbin_watson,
    ts_max_drawdown,
    ts_stochastic_osc,
)
from hadoop_fixedlengthinputformat_spark.operators.stats_extras import (
    agg_runs_test,
)
from hadoop_fixedlengthinputformat_spark.operators.analytics_extras import (
    graph_degree_stats,
    graph_triangles,
)
from hadoop_fixedlengthinputformat_spark.functions.quality_extras import (
    llm_readability,
)

TOL = 2e-4  # both sides snap to 4 decimals


def _purchase_series(sf_dir: str) -> dict[int, list[int]]:
    """Per-user cent series in the engine's total order (us, event_id, vc)."""
    rows = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    by: dict[int, list[tuple[int, int, int]]] = {}
    for r in rows:
        if (
            r["event_type"] == "purchase"
            and r["ts"] is not None
            and r["value"] is not None
            and r["user_id"] is not None
            and r["event_id"] is not None
        ):
            us = int(
                r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1_000_000
            )
            by.setdefault(r["user_id"], []).append(
                (us, r["event_id"], round(r["value"] * 100))
            )
    return {u: [t[2] for t in sorted(pts)] for u, pts in by.items()}


def test_durbin_watson_matches_bruteforce(spark, sf_dir):
    series = _purchase_series(sf_dir)
    expect: dict[int, tuple[int, float]] = {}
    for uid, vs in series.items():
        n = len(vs)
        if n < 2 or max(vs) == min(vs):
            continue
        mean = sum(vs) / n
        num = sum((vs[i] - vs[i - 1]) ** 2 for i in range(1, n))
        den = sum((v - mean) ** 2 for v in vs)
        expect[uid] = (num, num / den)
    assert len(expect) > 5
    got = {r.user_id: r for r in ts_durbin_watson(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for uid, (sdd, dw) in expect.items():
        assert got[uid].sq_diff_sum == sdd
        assert abs(got[uid].dw - dw) < TOL
        assert got[uid].n_rows == len(series[uid])


def test_stochastic_osc_matches_bruteforce(spark, sf_dir):
    series = _purchase_series(sf_dir)
    expect: dict[tuple[int, int], float] = {}
    for uid, vs in series.items():
        for t in range(13, len(vs)):
            frame = vs[t - 13 : t + 1]
            lo, hi = min(frame), max(frame)
            if hi > lo:
                expect[(uid, t)] = 100.0 * (vs[t] - lo) / (hi - lo)
    assert expect  # 8 users at sf0.001 carry >= 14 purchases
    got = ts_stochastic_osc(spark, sf_dir).collect()
    assert len(got) == len(expect)
    # re-key Spark rows back to frame indices through the sorted series
    rows = sorted(got, key=lambda r: (r.user_id, r.us, r.event_id, r.vc))
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rs in by_user.items():
        vs = series[uid]
        idx = [t for t in range(13, len(vs)) if (uid, t) in expect]
        assert len(rs) == len(idx)
        for r, t in zip(rs, idx):
            assert r.vc == vs[t]
            assert r.lo14_cents == min(vs[t - 13 : t + 1])
            assert r.hi14_cents == max(vs[t - 13 : t + 1])
            assert abs(r.pct_k - expect[(uid, t)]) < TOL


def test_max_drawdown_matches_bruteforce(spark, sf_dir):
    series = _purchase_series(sf_dir)
    got = {r.user_id: r for r in ts_max_drawdown(spark, sf_dir).collect()}
    assert set(got) == set(series)
    for uid, vs in series.items():
        # peak starts from the FIRST element, matching the engine's
        # running max (an init of 0 would silently assume non-negative
        # cents and disagree on a negative-first-purchase roll)
        peak, max_dd, max_frac = vs[0], 0, 0.0
        for v in vs:
            peak = max(peak, v)
            dd = peak - v
            max_dd = max(max_dd, dd)
            max_frac = max(max_frac, dd / max(peak, 1))
        r = got[uid]
        assert r.n_rows == len(vs)
        assert r.peak_cents == max(vs)
        assert r.max_dd_cents == max_dd
        assert abs(r.max_dd_frac - max_frac) < TOL


def test_runs_test_matches_bruteforce(spark, sf_dir):
    rows = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    by: dict[int, list[tuple[int, int, str]]] = {}
    for r in rows:
        if (
            r["ts"] is not None
            and r["user_id"] is not None
            and r["event_id"] is not None
            and r["event_type"] is not None
        ):
            us = int(
                r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1_000_000
            )
            by.setdefault(r["user_id"], []).append(
                (us, r["event_id"], r["event_type"])
            )
    expect: dict[int, tuple[int, int, int, float]] = {}
    for uid, pts in by.items():
        pts.sort()
        xs = [1 if t[2] == "purchase" else 0 for t in pts]
        n, n1 = len(xs), sum(xs)
        n2 = n - n1
        if n1 < 1 or n2 < 1 or 2.0 * n1 * n2 <= n:
            continue
        runs = 1 + sum(1 for i in range(1, n) if xs[i] != xs[i - 1])
        mu = 1 + 2.0 * n1 * n2 / n
        var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n * n * (n - 1.0))
        z = (runs - mu) / math.sqrt(var)
        expect[uid] = (n, n1, runs, z)
    assert len(expect) > 5
    got = {r.user_id: r for r in agg_runs_test(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for uid, (n, n1, runs, z) in expect.items():
        r = got[uid]
        assert (r.n_rows, r.n_pos, r.runs) == (n, n1, runs)
        assert abs(r.z - z) < TOL


def test_readability_matches_bruteforce(spark, sf_dir):
    rows = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    got = [
        (r.doc_id, r.n_words, r.n_sents, r.n_syll, r.flesch_ease, r.fk_grade)
        for r in llm_readability(spark, sf_dir).collect()
    ]
    expect = []
    for r in rows:
        t = r["text"]
        if t is None or len(t) == 0:
            continue
        words = len(t) - len(t.replace(" ", "")) + 1
        sents = len(re.findall(r"[.!?]+", t))
        syll = len(re.findall(r"[aeiouyAEIOUY]+", t))
        r1 = words / max(sents, 1)
        r2 = syll / max(words, 1)
        fre = 206.835 - 1.015 * r1 - 84.6 * r2
        fkgl = 0.39 * r1 + 11.8 * r2 - 15.59
        expect.append((r["doc_id"], words, sents, syll, fre, fkgl))
    assert len(got) == len(expect) and expect
    for g, e in zip(sorted(got), sorted(expect)):
        assert g[:4] == e[:4]
        assert abs(g[4] - e[4]) < TOL
        assert abs(g[5] - e[5]) < TOL


def _bip_edges(sf_dir):
    rows = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey"],
    ).to_pylist()
    return rows


def test_degree_stats_matches_bruteforce(spark, sf_dir):
    rows = _bip_edges(sf_dir)
    pairs = {
        (r["l_partkey"], r["l_suppkey"])
        for r in rows
        if r["l_partkey"] is not None and r["l_suppkey"] is not None
    }
    deg: dict[int, int] = {}
    for p, _s in pairs:
        deg[p] = deg.get(p, 0) + 1
    hist: dict[int, int] = {}
    for d in deg.values():
        hist[d] = hist.get(d, 0) + 1
    total = sum(hist.values())
    got = {r.degree: r for r in graph_degree_stats(spark, sf_dir).collect()}
    assert set(got) == set(hist)
    for d, n in hist.items():
        assert got[d].n_parts == n
        assert abs(got[d].share - n / total) < TOL


def test_triangles_matches_bruteforce(spark, sf_dir):
    rows = _bip_edges(sf_dir)
    by_order: dict[int, set[int]] = {}
    for r in rows:
        if r["l_orderkey"] is not None and r["l_partkey"] is not None:
            by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    support: dict[tuple[int, int], int] = {}
    for parts in by_order.values():
        for u, v in itertools.combinations(sorted(parts), 2):
            support[(u, v)] = support.get((u, v), 0) + 1
    edges = {e for e, c in support.items() if c >= 2}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = 0
    for u, v in edges:
        tri += len(adj[u] & adj[v])
    tri //= 3  # each triangle seen once per edge
    assert edges, 'support-2 edge set must be non-empty at sf0.001'
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    got = graph_triangles(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_nodes == len(adj)
    assert r.n_edges == len(edges)
    assert r.n_wedges == wedges
    assert r.n_triangles == tri
    expected_cc = 3.0 * tri / max(wedges, 1)
    assert abs(r.clustering - expected_cc) < TOL


def test_iqr_outliers_matches_bruteforce(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.operators.stats_extras import (
        agg_iqr_outliers,
    )

    rows = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    by: dict[str, list[int]] = {}
    for r in rows:
        if r["l_extendedprice"] is not None and r["l_returnflag"] is not None:
            by.setdefault(r["l_returnflag"], []).append(
                round(r["l_extendedprice"] * 100)
            )
    got = {r.flag: r for r in agg_iqr_outliers(spark, sf_dir).collect()}
    assert set(got) == set(by)
    for flag, vs in by.items():
        vs.sort()
        n = len(vs)
        # lower quartile = smallest value whose running count reaches
        # ceil(p*n) — index ceil(p*n)-1
        q1 = vs[-(-n // 4) - 1]
        q3 = vs[-(-3 * n // 4) - 1]
        iqr = q3 - q1
        n_low = sum(1 for v in vs if 2 * v < 2 * q1 - 3 * iqr)
        n_high = sum(1 for v in vs if 2 * v > 2 * q3 + 3 * iqr)
        r = got[flag]
        assert (r.n_rows, r.q1_cents, r.q3_cents) == (n, q1, q3)
        assert (r.n_low, r.n_high) == (n_low, n_high)


def test_wilcoxon_signed_rank_matches_bruteforce(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.operators.stats_extras import (
        agg_wilcoxon_signed_rank,
    )

    series = _purchase_series(sf_dir)
    expect: dict[int, tuple[int, int, float]] = {}
    for uid, vs in series.items():
        ds = [vs[i] - vs[i - 1] for i in range(1, len(vs))]
        ds = [d for d in ds if d != 0]
        n = len(ds)
        if n < 2:
            continue
        # midranks of |d|
        order = sorted(range(n), key=lambda i: abs(ds[i]))
        ranks = [0.0] * n
        i = 0
        while i < n:
            j = i
            while j < n and abs(ds[order[j]]) == abs(ds[order[i]]):
                j += 1
            mid = (i + 1 + j) / 2.0  # average of ranks i+1..j
            for t in range(i, j):
                ranks[order[t]] = mid
            i = j
        w_plus = sum(r for r, d in zip(ranks, ds) if d > 0)
        mu = n * (n + 1) / 4.0
        # tie-corrected variance
        from collections import Counter

        ties = Counter(abs(d) for d in ds)
        tsum = sum(t**3 - t for t in ties.values())
        var = n * (n + 1) * (2 * n + 1) / 24.0 - tsum / 48.0
        z = (w_plus - mu) / math.sqrt(var)
        expect[uid] = (n, round(2 * w_plus), z)
    assert len(expect) > 5
    got = {
        r.user_id: r
        for r in agg_wilcoxon_signed_rank(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for uid, (n, w2, z) in expect.items():
        r = got[uid]
        assert (r.n_pairs, r.w2) == (n, w2)
        assert abs(r.z - z) < TOL


def test_kcore_peel_matches_bruteforce(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.operators.analytics_extras import (
        graph_kcore_peel,
    )

    rows = _bip_edges(sf_dir)
    by_order: dict[int, set[int]] = {}
    for r in rows:
        if r["l_orderkey"] is not None and r["l_partkey"] is not None:
            by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    support: dict[tuple[int, int], int] = {}
    for parts in by_order.values():
        for u, v in itertools.combinations(sorted(parts), 2):
            support[(u, v)] = support.get((u, v), 0) + 1
    edges = {e for e, c in support.items() if c >= 2}
    assert edges

    def degs(es):
        d: dict[int, int] = {}
        for u, v in es:
            d[u] = d.get(u, 0) + 1
            d[v] = d.get(v, 0) + 1
        return d

    expect = []
    cur = edges
    d = degs(cur)
    expect.append((0, len(d), len(cur)))
    for rnd in range(1, 5):
        d = degs(cur)
        alive = {n for n, k in d.items() if k >= 3}
        cur = {(u, v) for u, v in cur if u in alive and v in alive}
        expect.append((rnd, len(alive), len(cur)))
    got = sorted(
        (r.round, r.n_nodes, r.n_edges)
        for r in graph_kcore_peel(spark, sf_dir).collect()
    )
    assert got == expect


def test_sma_crossover_matches_bruteforce(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.operators.timeseries import (
        ts_sma_crossover,
    )

    series = _purchase_series(sf_dir)
    expect = []
    for uid, vs in series.items():
        sides = []
        for t in range(9, len(vs)):
            s3 = sum(vs[t - 2 : t + 1])
            s10 = sum(vs[t - 9 : t + 1])
            side = (
                1 if 10 * s3 > 3 * s10 else (-1 if 10 * s3 < 3 * s10 else 0)
            )
            sides.append((t, s3, s10, side))
        for i in range(1, len(sides)):
            t, s3, s10, side = sides[i]
            prev = sides[i - 1][3]
            if side != 0 and prev != 0 and prev != side:
                expect.append(
                    (uid, vs[t], s3, s10, "golden" if side == 1 else "death")
                )
    got = sorted(
        (r.user_id, r.vc, r.s3, r.s10, r.cross_type)
        for r in ts_sma_crossover(spark, sf_dir).collect()
    )
    assert got == sorted(expect)
    assert got  # 15 crosses at sf0.001 (non-vacuous)


def test_lang_confusion_matches_bruteforce(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.functions.quality_extras import (
        llm_lang_confusion,
    )

    rows = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    cells: dict[tuple[str, str], int] = {}
    for r in rows:
        if r["lang"] is None:
            continue
        t = r["text"]
        if t is None:
            vr = None
        else:
            low = t.lower()
            vr = sum(1 for ch in low if ch in "aeiou") / max(len(t), 1)
        if vr is not None and vr < 0.20:
            p = "zh"
        elif vr is not None and vr < 0.24:
            p = "de"
        elif vr is not None and vr < 0.28:
            p = "en"
        elif vr is not None and vr < 0.32:
            p = "es"
        else:
            p = "fr"  # incl. NULL text falling through every WHEN
        cells[(r["lang"], p)] = cells.get((r["lang"], p), 0) + 1
    n_actual: dict[str, int] = {}
    n_pred: dict[str, int] = {}
    for (a, p), n in cells.items():
        n_actual[a] = n_actual.get(a, 0) + n
        n_pred[p] = n_pred.get(p, 0) + n
    got = {
        (r.actual_lang, r.predicted_lang): r
        for r in llm_lang_confusion(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for key, n in cells.items():
        r = got[key]
        assert r.n_docs == n
        assert abs(r.recall - n / n_actual[key[0]]) < TOL
        assert abs(r.precision - n / n_pred[key[1]]) < TOL


def test_common_neighbors_matches_bruteforce(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.operators.analytics_extras import (
        graph_common_neighbors,
    )

    rows = _bip_edges(sf_dir)
    by_order: dict[int, set[int]] = {}
    for r in rows:
        if r["l_orderkey"] is not None and r["l_partkey"] is not None:
            by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    support: dict[tuple[int, int], int] = {}
    for parts in by_order.values():
        for u, v in itertools.combinations(sorted(parts), 2):
            support[(u, v)] = support.get((u, v), 0) + 1
    edges = {e for e, c in support.items() if c >= 2}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    got = {
        (r.u, r.v): r for r in graph_common_neighbors(spark, sf_dir).collect()
    }
    assert set(got) == edges
    for u, v in edges:
        common = len(adj[u] & adj[v])
        du, dv = len(adj[u]), len(adj[v])
        r = got[(u, v)]
        assert (r.du, r.dv, r.common) == (du, dv, common)
        assert abs(r.jaccard - common / (du + dv - common)) < TOL


def test_islands_matches_bruteforce(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.operators.windows import (
        win_islands,
    )

    series = _purchase_series(sf_dir)
    expect = []
    for uid, vs in series.items():
        run = []
        for i, v in enumerate(vs):
            if v >= 5000:
                run.append((i + 1, v))  # rn is 1-based
            else:
                if len(run) >= 2:
                    expect.append(
                        (uid, len(run), run[0][0], run[-1][0],
                         sum(r[1] for r in run), max(r[1] for r in run))
                    )
                run = []
        if len(run) >= 2:
            expect.append(
                (uid, len(run), run[0][0], run[-1][0],
                 sum(r[1] for r in run), max(r[1] for r in run))
            )
    got = sorted(
        (r.user_id, r.n_events, r.start_rn, r.end_rn, r.island_cents,
         r.peak_cents)
        for r in win_islands(spark, sf_dir).collect()
    )
    assert got == sorted(expect)
    assert got  # 17 islands at sf0.001


def test_rolling_median_matches_bruteforce(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.operators.timeseries import (
        ts_rolling_median,
    )

    series = _purchase_series(sf_dir)
    expect = {}
    for uid, vs in series.items():
        for t in range(14, len(vs)):
            frame = sorted(vs[t - 14 : t + 1])
            expect[(uid, t)] = frame[7]  # exact 8th smallest of 15
    assert expect
    got = ts_rolling_median(spark, sf_dir).collect()
    assert len(got) == len(expect)
    by_user: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.user_id, r.us, r.event_id, r.vc)):
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rs in by_user.items():
        vs = series[uid]
        for r, t in zip(rs, range(14, len(vs))):
            assert r.vc == vs[t]
            assert r.med15 == expect[(uid, t)]


def test_dq_drift_matches_bruteforce(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.operators.relational_extras import (
        dq_drift,
    )

    rows = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    evs = [
        (
            r["event_type"],
            int(r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1e6),
            r["value"],
        )
        for r in rows
        if r["ts"] is not None and r["event_type"] is not None
    ]
    lo = min(t for _, t, _ in evs)
    hi = max(t for _, t, _ in evs)
    agg: dict[str, list[int]] = {}
    for et, t, v in evs:
        a = agg.setdefault(et, [0, 0, 0, 0, 0, 0])
        h = 0 if 2 * t <= lo + hi else 1
        a[h] += 1
        if v is not None:
            a[2 + h] += 1
            a[4 + h] += round(v * 100)
    got = {r.event_type: r for r in dq_drift(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for et, (na, nb, nva, nvb, sa, sb) in agg.items():
        r = got[et]
        assert (r.n_a, r.n_b, r.n_val_a, r.n_val_b) == (na, nb, nva, nvb)
        assert abs(r.val_rate_a - nva / max(na, 1)) < TOL
        assert abs(r.val_rate_b - nvb / max(nb, 1)) < TOL
        assert abs(r.mean_cents_a - sa / max(nva, 1)) < TOL
        assert abs(r.mean_cents_b - sb / max(nvb, 1)) < TOL
