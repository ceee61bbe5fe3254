"""Numpy/pure-Python reference pins for operators/stats_extras.py.

Parity (Spark vs DuckDB) cannot see a wrong formula both engines agree
on (the agg_moments lesson) — each statistic here is re-derived from
the raw parquet with an independent brute-force implementation and
compared within snap tolerance.
"""

from __future__ import annotations

import math
import os

import pyarrow.parquet as pq
import pytest

from hadoop_fixedlengthinputformat_spark.operators.stats_extras import (
    agg_cohen_kappa,
    agg_cohens_d,
    agg_corr_matrix,
    agg_kendall_tau,
    ts_theil_sen,
)

TOL = 2e-4  # both sides snap to 4 decimals


def test_cohen_kappa_matches_reference(spark, sf_dir):
    rows = pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()
    labels = [
        (
            1 if r["o_totalprice"] >= 150000 else 0,
            1 if r["o_orderpriority"] in ("1-URGENT", "2-HIGH") else 0,
        )
        for r in rows
        if r["o_totalprice"] is not None and r["o_orderpriority"] is not None
    ]
    n = len(labels)
    a = sum(1 for p, q in labels if p == 1 and q == 1)
    b = sum(1 for p, q in labels if p == 1 and q == 0)
    c = sum(1 for p, q in labels if p == 0 and q == 1)
    d = sum(1 for p, q in labels if p == 0 and q == 0)
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    got = agg_cohen_kappa(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_orders == n
    assert r.agree == a + d
    # the exposed exact fraction IS kappa
    assert abs(r.kappa_num / r.kappa_den - kappa) < 1e-12
    assert abs(r.kappa - kappa) < TOL


def test_kendall_tau_matches_bruteforce(spark, sf_dir):
    rows = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    orders: dict[int, list[tuple[int, int, int]]] = {}
    for r in rows:
        if (
            r["l_quantity"] is not None
            and r["l_extendedprice"] is not None
            and r["l_linenumber"] is not None
        ):
            orders.setdefault(r["l_orderkey"], []).append(
                (
                    r["l_linenumber"],
                    round(r["l_quantity"] * 100),
                    round(r["l_extendedprice"] * 100),
                )
            )
    n0 = conc = disc = tx = ty = 0
    for lines in orders.values():
        lines.sort()
        for i in range(len(lines)):
            for j in range(i + 1, len(lines)):
                if lines[i][0] >= lines[j][0]:
                    continue
                _, x1, y1 = lines[i]
                _, x2, y2 = lines[j]
                n0 += 1
                if (x1 < x2 and y1 < y2) or (x1 > x2 and y1 > y2):
                    conc += 1
                elif (x1 < x2 and y1 > y2) or (x1 > x2 and y1 < y2):
                    disc += 1
                if x1 == x2:
                    tx += 1
                if y1 == y2:
                    ty += 1
    tau_a = (conc - disc) / n0
    tau_b = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
    got = agg_kendall_tau(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_pairs, r.concordant, r.discordant) == (n0, conc, disc)
    assert (r.ties_x, r.ties_y) == (tx, ty)
    assert abs(r.tau_a - tau_a) < TOL
    assert abs(r.tau_b - tau_b) < TOL


def test_cohens_d_matches_reference(spark, sf_dir):
    import numpy as np

    rows = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    by: dict[str, list[int]] = {"F": [], "O": []}
    for r in rows:
        if r["l_extendedprice"] is not None and r["l_linestatus"] in by:
            by[r["l_linestatus"]].append(int(math.floor(r["l_extendedprice"])))
    xf = np.array(by["F"], dtype=np.float64)
    xo = np.array(by["O"], dtype=np.float64)
    nf, no = len(xf), len(xo)
    sp2 = ((nf - 1) * xf.var(ddof=1) + (no - 1) * xo.var(ddof=1)) / (
        nf + no - 2
    )
    d_ref = (xf.mean() - xo.mean()) / math.sqrt(sp2)
    g_ref = d_ref * (1 - 3 / (4 * (nf + no) - 9))
    got = agg_cohens_d(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_f, r.n_o) == (nf, no)
    assert abs(r.cohens_d - d_ref) < TOL
    assert abs(r.hedges_g - g_ref) < TOL


def test_cohens_d_past_int64_product_cliff(spark):
    """ADVICE r6 (high): the old int64 v = n*S2 - S1^2 overflowed at
    ~7e4 rows/class (Spark wrapped silently, DuckDB raised).  Run the
    full query at sf0.1 (~6e5 lineitem rows, n*S2 ~ 3e20 — far past
    the cliff) and pin against numpy: a wrap would be off by orders of
    magnitude, not TOL."""
    import numpy as np

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
        pytest.skip("sf0.1 fixture not present")
    cols = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_linestatus", "l_extendedprice"]
    ).to_pydict()
    by: dict[str, list[int]] = {"F": [], "O": []}
    for st, ep in zip(cols["l_linestatus"], cols["l_extendedprice"]):
        if ep is not None and st in by:
            by[st].append(int(math.floor(ep)))
    xf = np.array(by["F"], dtype=np.float64)
    xo = np.array(by["O"], dtype=np.float64)
    nf, no = len(xf), len(xo)
    # past the OLD cliff: n*S2 must exceed int64 max for the test to bite
    s2f = int((np.array(by["F"], dtype=np.object_) ** 2).sum())
    assert nf * s2f > 2**63 - 1, "fixture no longer exercises the cliff"
    sp2 = ((nf - 1) * xf.var(ddof=1) + (no - 1) * xo.var(ddof=1)) / (
        nf + no - 2
    )
    d_ref = (xf.mean() - xo.mean()) / math.sqrt(sp2)
    g_ref = d_ref * (1 - 3 / (4 * (nf + no) - 9))
    r = agg_cohens_d(spark, sf_dir).collect()[0]
    assert (r.n_f, r.n_o) == (nf, no)
    assert abs(r.cohens_d - d_ref) < TOL
    assert abs(r.hedges_g - g_ref) < TOL


def test_corr_matrix_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    by: dict[str, list[tuple[int, int, int]]] = {}
    for r in rows:
        if (
            r["l_quantity"] is not None
            and r["l_extendedprice"] is not None
            and r["l_discount"] is not None
            and r["l_returnflag"] is not None
        ):
            by.setdefault(r["l_returnflag"], []).append(
                (
                    int(math.floor(r["l_quantity"])),
                    int(math.floor(r["l_extendedprice"])),
                    round(r["l_discount"] * 10000),
                )
            )
    got = {
        (r.l_returnflag, r.var_x, r.var_y): r
        for r in agg_corr_matrix(spark, sf_dir).collect()
    }
    names = {0: "quantity", 1: "price", 2: "discount"}
    for flag, triples in by.items():
        if len(triples) < 2:
            continue
        m = np.array(triples, dtype=np.float64)
        # population corrcoef == sample corrcoef (the n's cancel)
        cc = np.corrcoef(m.T)
        for i, j in ((0, 1), (0, 2), (1, 2)):
            r = got[(flag, names[i], names[j])]
            assert r.n_rows == len(triples)
            assert abs(r.corr - cc[i, j]) < TOL
    assert len(got) == 3 * len([t for t in by.values() if len(t) >= 2])


def test_theil_sen_matches_bruteforce(spark, sf_dir):
    rows = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    by_user: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        if (
            r["user_id"] is not None
            and r["ts"] is not None
            and r["value"] is not None
        ):
            from datetime import timezone

            t = int(r["ts"].replace(tzinfo=timezone.utc).timestamp())
            by_user.setdefault(r["user_id"], []).append(
                (t, round(r["value"] * 100))
            )
    expect: dict[int, tuple[int, float]] = {}
    for uid, pts in by_user.items():
        slopes = [
            (y2 - y1) * 86400 / (t2 - t1)
            for i, (t1, y1) in enumerate(pts)
            for (t2, y2) in pts
            if t2 > t1
        ]
        # the generator above pairs every strict-time-ordered pair once
        # per (a, b) row pair, matching the join (duplicates included)
        if not slopes:
            continue
        slopes.sort()
        n = len(slopes)
        # lower median: smallest v with 2 * rank(v) >= n
        lower = slopes[(n - 1) // 2]
        expect[uid] = (n, lower)
    got = {r.user_id: r for r in ts_theil_sen(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for uid, (n, med) in expect.items():
        assert got[uid].n_pairs == n
        assert abs(got[uid].sen_slope - med) < TOL


def test_count_min_exact_on_collision_free_input(spark, tmp_path):
    """With far fewer keys than cells (w=2048) a CM estimate should hit
    collisions almost never; this planted case pins est == exact (all
    gates true) and exercises the linearity gate end to end."""
    import pyspark.sql.functions as F

    from hadoop_fixedlengthinputformat_spark.operators.analytics_extras import (
        agg_count_min,
    )

    rows = [(k, i) for k in range(20) for i in range(k + 1)]
    df = (
        spark.createDataFrame(rows, "l_suppkey long, i long")
        .withColumn("l_orderkey", F.col("i"))
        .drop("i")
    )
    out = str(tmp_path / "li")
    df.coalesce(1).write.parquet(out + "/lineitem.parquet")
    got = {r.l_suppkey: r for r in agg_count_min(spark, out).collect()}
    assert len(got) == 10
    # top-10 by count desc, key asc: keys 19..10 with counts 20..11
    assert set(got) == set(range(10, 20))
    for k, r in got.items():
        assert r.exact_cnt == k + 1
        assert r.est_ge_exact and r.est_within_eps and r.sketch_linear, r


def test_spearman_past_int64_guard_cliff(spark):
    """Round-8 sf1 soak finding: the old degeneracy guard
    n*sxx > sx*sx multiplied int64 power sums that grow ~4n^4 — DuckDB
    raised "Overflow in multiplication of INT64" and Spark wrapped from
    ~2.3e5 rows/group, i.e. ALREADY at sf0.1 (measured n*sxx = 2.1e21
    there).  The guard is now max(rank) > min(rank) (exact, unbounded)
    and the sums are DECIMAL(38,0)/HUGEINT.  Run the full query at
    sf0.1 and pin rho per flag against a numpy midrank Pearson."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_spearman,
    )

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
        pytest.skip("sf0.1 fixture not present")
    cols = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    ).to_pydict()
    by: dict[str, list[tuple[int, int]]] = {}
    for f, q, p in zip(
        cols["l_returnflag"], cols["l_quantity"], cols["l_extendedprice"]
    ):
        if f is not None and q is not None and p is not None:
            by.setdefault(f, []).append(
                (int(math.floor(q)), int(math.floor(p)))
            )

    def midranks_x2(vals: list[int]) -> np.ndarray:
        # x = 2*midrank = 2*min_rank + ties - 1, exact integers
        order = np.argsort(np.array(vals, dtype=np.int64), kind="stable")
        arr = np.array(vals, dtype=np.int64)[order]
        x = np.empty(len(arr), dtype=np.float64)
        i = 0
        while i < len(arr):
            j = i
            while j < len(arr) and arr[j] == arr[i]:
                j += 1
            x[i:j] = 2 * (i + 1) + (j - i) - 1
            i = j
        out = np.empty(len(arr), dtype=np.float64)
        out[order] = x
        return out

    got = {r.flag: r for r in agg_spearman(spark, sf_dir).collect()}
    cliff_hit = False
    for flag, pairs in by.items():
        qs = [q for q, _ in pairs]
        ps = [p for _, p in pairs]
        n = len(pairs)
        x = midranks_x2(qs)
        # exact object-int check that the OLD guard product overflows
        sxx_obj = sum(int(v) ** 2 for v in x.astype(np.int64).tolist())
        if n * sxx_obj > 2**63 - 1:
            cliff_hit = True
        y = midranks_x2(ps)
        rho_ref = np.corrcoef(x, y)[0, 1]
        r = got[flag]
        assert r.n_rows == n
        assert abs(r.rho - rho_ref) < TOL, (flag, r.rho, rho_ref)
    assert cliff_hit, "fixture no longer exercises the old guard cliff"


def test_mannwhitney_past_int64_tsum_cliff(spark, tmp_path):
    """Round-8 sf1 soak finding: tsum = sum(t^3 - t) over per-value tie
    counts grows ~N^3/ndist^2 — the old int64 sum wrapped (Spark) /
    raised (DuckDB) from ~2.8e7 pooled rows at the fixture's 50
    distinct quantities.  Plant TWO values with 2.2M rows each so one
    per-row t^3 term alone exceeds int64, and pin U and z against an
    exact big-int Python reference.  (agg_kruskal shares the identical
    tsum machinery — one planted fixture covers the construction.)"""
    import numpy as np
    import pyarrow as pa

    from hadoop_fixedlengthinputformat_spark.operators.pivot_stats import (
        agg_mannwhitney,
    )

    t1, t2 = 2_200_000, 2_200_000  # t^3 = 1.06e19 > int64 max per term
    a1, a2 = 1_200_000, 900_000  # class-A rows per value
    qty = np.concatenate([np.full(t1, 1.0), np.full(t2, 2.0)])
    flag = np.concatenate([
        np.where(np.arange(t1) < a1, "A", "R"),
        np.where(np.arange(t2) < a2, "A", "R"),
    ])
    out = tmp_path / "li"
    out.mkdir()
    pq.write_table(
        pa.table({"l_quantity": qty, "l_returnflag": flag}),
        str(out / "lineitem.parquet"),
    )

    # exact integer reference (python ints never overflow)
    tsum = (t1**3 - t1) + (t2**3 - t2)
    assert max(t1**3, t2**3) > 2**63 - 1, "fixture must exceed int64/term"
    na, nn = a1 + a2, t1 + t2
    nb = nn - na
    r2a = a1 * (2 * 0 + t1 + 1) + a2 * (2 * t1 + t2 + 1)
    u2 = r2a - na * (na + 1)
    var = math.sqrt(
        (na * nb / 12.0) * ((nn + 1.0) - tsum / (nn * (nn - 1.0)))
    )
    z_ref = (u2 - float(na) * nb) / (2.0 * var)

    rows = agg_mannwhitney(spark, str(out)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_a, r.n_r) == (na, nb)
    assert r.u2 == u2
    assert abs(r.z_stat - z_ref) < TOL


def test_mutual_info_matches_direct_formula(spark, sf_dir):
    """Pin agg_mutual_info against a direct float MI/U computation from
    the raw contingency table (math.log, no snapping) — parity can't
    see a wrong formula both engines agree on (CLAUDE.md rule)."""
    from collections import Counter

    from hadoop_fixedlengthinputformat_spark.operators.stats_extras import (
        agg_mutual_info,
    )

    rows = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus"],
    ).to_pylist()
    cells = Counter(
        (r["l_returnflag"], r["l_linestatus"])
        for r in rows
        if r["l_returnflag"] is not None and r["l_linestatus"] is not None
    )
    n = sum(cells.values())
    cx = Counter()
    cy = Counter()
    for (x, y), c in cells.items():
        cx[x] += c
        cy[y] += c
    mi = sum(
        (c / n) * math.log(c * n / (cx[x] * cy[y]))
        for (x, y), c in cells.items()
    )
    hx = -sum((c / n) * math.log(c / n) for c in cx.values())
    got = agg_mutual_info(spark, sf_dir).collect()
    if len(cx) < 2 or len(cy) < 2:
        assert got == []
        return
    assert len(got) == 1
    assert got[0].n_rows == n
    assert abs(got[0].mi_nats - mi) < TOL
    assert abs(got[0].theil_u - mi / hx) < TOL


def test_seasonal_hour_matches_reference(spark, sf_dir):
    """Pin ts_seasonal_hour against a direct python reimplementation
    (centered 9-row MA residuals averaged per hour bucket)."""
    from collections import defaultdict
    from datetime import timezone

    from hadoop_fixedlengthinputformat_spark.operators.timeseries import (
        ts_seasonal_hour,
    )

    rows = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    by_user: dict[int, list[tuple[int, int, int]]] = {}
    for r in rows:
        if (
            r["user_id"] is not None
            and r["ts"] is not None
            and r["value"] is not None
            and r["event_id"] is not None
        ):
            ts = r["ts"].replace(tzinfo=timezone.utc)
            us = int(ts.timestamp() * 1_000_000)
            by_user.setdefault(r["user_id"], []).append(
                (us, r["event_id"], round(r["value"] * 100))
            )
    want: dict[tuple[int, int], tuple[int, int]] = {}
    acc: dict[tuple[int, int], list[int]] = defaultdict(list)
    for uid, pts in by_user.items():
        pts.sort()
        vals = [v for _, _, v in pts]
        for i in range(4, len(pts) - 4):
            s9 = sum(vals[i - 4 : i + 5])
            r9 = 9 * vals[i] - s9
            hod = (pts[i][0] // 1_000_000) % 86400 // 3600
            acc[(uid, hod)].append(r9)
    for k, rs in acc.items():
        want[k] = (len(rs), sum(rs))
    got = {
        (r.user_id, r.hour_of_day): r
        for r in ts_seasonal_hour(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k, (n, sr) in want.items():
        assert got[k].n_frames == n
        assert abs(got[k].seasonal_cents - sr / (9 * n)) < TOL


def test_percentile_exact_matches_reference(spark, sf_dir):
    """Pin agg_percentile_exact against a direct sorted-list lower
    percentile (smallest value at running-count >= ceil(p/100 * n))."""
    from hadoop_fixedlengthinputformat_spark.operators.stats_extras import (
        agg_percentile_exact,
    )

    rows = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    ).to_pylist()
    by: dict[str, list[int]] = {}
    for r in rows:
        if r["l_extendedprice"] is not None and r["l_returnflag"] is not None:
            by.setdefault(r["l_returnflag"], []).append(
                round(r["l_extendedprice"] * 100)
            )
    got = {r.flag: r for r in agg_percentile_exact(spark, sf_dir).collect()}
    assert set(got) == set(by)
    for flag, vals in by.items():
        vals.sort()
        n = len(vals)
        r = got[flag]
        assert r.n_rows == n
        for p, col in ((50, r.p50_cents), (90, r.p90_cents), (99, r.p99_cents)):
            idx = -(-p * n // 100) - 1  # ceil(p*n/100), 1-based -> 0-based
            assert col == vals[idx], (flag, p)


def test_mad_outliers_matches_reference(spark, sf_dir):
    """Pin ts_mad_outliers against a direct lower-median / MAD / census
    computation in pure python."""
    from hadoop_fixedlengthinputformat_spark.operators.stats_extras import (
        ts_mad_outliers,
    )

    rows = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    ).to_pylist()
    by: dict[int, list[int]] = {}
    for r in rows:
        if r["user_id"] is not None and r["value"] is not None:
            by.setdefault(r["user_id"], []).append(round(r["value"] * 100))

    def lower_median(vals: list[int]) -> int:
        vals = sorted(vals)
        return vals[(len(vals) - 1) // 2]

    got = {r.user_id: r for r in ts_mad_outliers(spark, sf_dir).collect()}
    assert set(got) == set(by)
    for uid, vals in by.items():
        med = lower_median(vals)
        mad = lower_median([abs(v - med) for v in vals])
        outl = sum(1 for v in vals if abs(v - med) > 3 * mad)
        r = got[uid]
        assert (r.n_rows, r.med_cents, r.mad_cents, r.n_outliers) == (
            len(vals), med, mad, outl
        ), uid


def test_theil_sen_cap_binds_planted_fixture(spark, tmp_path):
    """ADVICE r9 #1: at driver scales no user exceeds K=256 events, so
    the recency-selection path (rrn <= K over the ts DESC, event_id
    DESC, y DESC total order) was never reference-pinned for
    ts_theil_sen — parity cannot catch a wrong selection both the Spark
    code and its generated oracle share.  Plant one user with 300
    events (cap binds for K=256 AND K=64), duplicate timestamps at the
    boundary (tiebreak decides membership), a second user under both
    caps, and null-field rows that every filter must drop; pin BOTH
    variants against an independently-written capped pure-Python
    reference."""
    import datetime as dt

    from hadoop_fixedlengthinputformat_spark.operators.stats_extras import (
        ts_theil_sen_recent,
    )

    base = dt.datetime(2024, 3, 1)
    rows = []
    # user 1: 300 events over 150 DISTINCT hourly timestamps (2 events
    # per stamp, distinct event_id/value) — K=256 cuts mid-history and,
    # with duplicated stamps, the boundary row is tiebreak-decided
    for i in range(300):
        rows.append(
            (
                1000 + i,  # event_id
                base + dt.timedelta(hours=i // 2),
                1,  # user_id
                "click",
                ((i * 37) % 997) / 100.0,
                None,
            )
        )
    # user 2: 80 events, distinct stamps — K=256 never binds, K=64 does
    for i in range(80):
        rows.append(
            (
                2000 + i,
                base + dt.timedelta(hours=3 * i),
                2,
                "view",
                ((i * 53) % 499) / 100.0,
                None,
            )
        )
    # null-field rows: each filter must drop exactly these
    rows.append((None, base, 1, "x", 1.0, None))
    rows.append((3000, None, 1, "x", 1.0, None))
    rows.append((3001, base, None, "x", 1.0, None))
    rows.append((3002, base, 1, "x", None, None))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    )
    out = str(tmp_path / "planted")
    df.coalesce(1).write.parquet(out + "/events.parquet")

    def capped_ref(k: int) -> dict[int, tuple[int, float]]:
        by_user: dict[int, list[tuple[int, int, int]]] = {}
        for eid, ts, uid, _et, val, _p in rows:
            if eid is None or ts is None or uid is None or val is None:
                continue
            t = int(ts.replace(tzinfo=dt.timezone.utc).timestamp())
            by_user.setdefault(uid, []).append((t, eid, round(val * 100)))
        expect: dict[int, tuple[int, float]] = {}
        for uid, pts in by_user.items():
            recent = sorted(pts, key=lambda r: (-r[0], -r[1], -r[2]))[:k]
            slopes = [
                (y2 - y1) * 86400 / (t2 - t1)
                for (t1, _e1, y1) in recent
                for (t2, _e2, y2) in recent
                if t2 > t1
            ]
            if not slopes:
                continue
            slopes.sort()
            med = slopes[(len(slopes) - 1) // 2]
            expect[uid] = (
                len(slopes),
                math.floor(med * 10000 + 0.5) / 10000 + 0.0,
            )
        return expect

    for fn, k in ((ts_theil_sen, 256), (ts_theil_sen_recent, 64)):
        expect = capped_ref(k)
        got = {r.user_id: r for r in fn(spark, out).collect()}
        assert set(got) == set(expect), (fn.__name__, set(got), set(expect))
        for uid, (n, med) in expect.items():
            assert got[uid].n_pairs == n, (fn.__name__, uid)
            assert abs(got[uid].sen_slope - med) < 1e-9, (fn.__name__, uid)
    # sanity: the cap actually bound — user 1 has 300 > 256 events, so
    # its K=256 pair count must be that of EXACTLY 256 kept events over
    # 128 distinct stamps (2 per stamp: 4 same-stamp pairs excluded per
    # stamp-pair... computed from the reference, not a formula)
    assert capped_ref(256)[1][0] < capped_ref(10**9)[1][0]


def test_winsorized_mean_matches_pure_python(spark, sf_dir):
    """agg_winsorized_mean vs an independently-written reference:
    thresholds by the ceil-rank rule, clamp, plain mean (parity alone
    can't catch a formula both engines share — the agg_moments rule)."""
    from hadoop_fixedlengthinputformat_spark.operators.stats_extras import (
        agg_winsorized_mean,
    )

    rows = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pylist()
    by: dict[str, list[int]] = {}
    for r in rows:
        if r["l_extendedprice"] is not None and r["l_returnflag"] is not None:
            by.setdefault(r["l_returnflag"], []).append(
                round(r["l_extendedprice"] * 100)
            )
    got = {r.flag: r for r in agg_winsorized_mean(spark, sf_dir).collect()}
    assert set(got) == set(by)
    for flag, vals in by.items():
        vals.sort()
        n = len(vals)
        # smallest value whose 1-based rank reaches ceil(p/100 * n)
        lo = vals[-(-10 * n // 100) - 1]
        hi = vals[-(-90 * n // 100) - 1]
        wmean = sum(min(max(v, lo), hi) for v in vals) / n
        r = got[flag]
        assert r.n_rows == n and r.lo_cents == lo and r.hi_cents == hi
        assert abs(r.wmean_cents - wmean) < TOL


def test_rolling_slope_matches_numpy(spark, sf_dir):
    """ts_rolling_slope vs numpy.polyfit over each full 24-frame of the
    SAME totally-ordered per-user purchase stream."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.operators.timeseries import (
        ts_rolling_slope,
    )

    rows = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    from datetime import timezone

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
    expect: dict[tuple, float] = {}
    for uid, pts in by.items():
        pts.sort()
        for t in range(23, len(pts)):
            ys = np.array([pts[i][2] for i in range(t - 23, t + 1)])
            slope = np.polyfit(np.arange(24.0), ys.astype(float), 1)[0]
            expect[(uid, pts[t][0], pts[t][1])] = slope
    got = {
        (r.user_id, r.us, r.event_id): r
        for r in ts_rolling_slope(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for key, slope in expect.items():
        assert abs(got[key].slope_cents_per_step - slope) < TOL
        # the exact integer numerator agrees with the double slope
        assert abs(got[key].slope_num / 27600.0 - slope) < 1e-6


def test_fn_geo_matches_pure_python_haversine(spark, sf_dir):
    """fn_geo vs an independently-written haversine: (a) with the SAME
    8-decimal stage snaps -> must agree to 1e-9 (validates formula,
    constants, and snap chain), (b) against the UNSNAPPED textbook
    haversine -> within 1 km (the snap chain's worst case is the
    asin derivative blow-up near antipodal pairs)."""
    from hadoop_fixedlengthinputformat_spark.functions.scalar_queries import (
        fn_geo,
    )

    def s8(x):
        return math.floor(x * 1e8 + 0.5) / 1e8

    rows = pq.read_table(f"{sf_dir}/customer.parquet").to_pylist()
    got = {r.c_custkey: r for r in fn_geo(spark, sf_dir).collect()}
    for r in rows:
        ck, nk = r["c_custkey"], r["c_nationkey"]
        if ck is None or nk is None:
            continue
        lat1 = float(ck % 120) - 60.0 + 0.25
        lon1 = float(ck % 360) - 180.0 + 0.25
        lat2 = float((nk * 7) % 120) - 60.0
        lon2 = float((nk * 13) % 360) - 180.0
        sdlat = s8(math.sin(math.radians((lat2 - lat1) / 2.0)))
        sdlon = s8(math.sin(math.radians((lon2 - lon1) / 2.0)))
        c1 = s8(math.cos(math.radians(lat1)))
        c2 = s8(math.cos(math.radians(lat2)))
        root = s8(math.sqrt(sdlat * sdlat + (c1 * c2) * (sdlon * sdlon)))
        hav = 12742.0 * s8(math.asin(min(root, 1.0)))
        hav = math.floor(hav * 10000 + 0.5) / 10000 + 0.0
        g = got[ck]
        assert abs(g.hav_km - hav) < 1e-9, (ck, g.hav_km, hav)
        # textbook unsnapped haversine sanity
        a = (
            math.sin(math.radians((lat2 - lat1) / 2)) ** 2
            + math.cos(math.radians(lat1))
            * math.cos(math.radians(lat2))
            * math.sin(math.radians((lon2 - lon1) / 2)) ** 2
        )
        ref = 12742.0 * math.asin(min(1.0, math.sqrt(a)))
        assert abs(g.hav_km - ref) < 1.0, (ck, g.hav_km, ref)
        assert g.in_bbox == (
            abs(lat2 - lat1) <= 30.0 and abs(lon2 - lon1) <= 45.0
        )
