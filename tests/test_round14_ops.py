"""Independent reference pins for the round-14 operators.

Parity (Spark vs DuckDB) cannot see a wrong formula both engines agree
on — each operator is re-derived with a brute-force pure-Python
implementation and compared exactly (the test_round11/12/13_ops
pattern)."""

from __future__ import annotations

import struct


def _py_afp64(payload: bytes) -> int | None:
    """Independent afp64: hand-rolled RIFF walk + frame energies, no
    numpy.  Frame boundaries replicate np.array_split: the first
    (n % 65) frames carry one extra sample."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    ok_fmt, data = False, None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt_code, _c, _sr, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            ok_fmt = fmt_code == 1 and bits == 16
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if not ok_fmt or data is None or len(data) < 2:
        return None
    samples = [
        struct.unpack_from("<h", data, 2 * i)[0]
        for i in range(len(data) // 2)
    ]
    if len(samples) < 65:
        return None
    ln = len(samples)
    base, extra = divmod(ln, 65)
    energies, at = [], 0
    for i in range(65):
        size = base + (1 if i < extra else 0)
        frame = samples[at : at + size]
        at += size
        energies.append(sum(x * x for x in frame))
    val = 0
    for i in range(64):
        val = (val << 1) | (1 if energies[i + 1] > energies[i] else 0)
    return val


def test_afp64_matches_independent_kernel():
    """The numpy afp64 must agree bit-for-bit with the hand-rolled
    struct-walk implementation on every fixture payload — a wrong
    frame split or a float energy would diverge here."""
    from hadoop_fixedlengthinputformat_spark.functions.multimodal import (
        afp64,
        decode_wav_pcm16,
        near_twin_wav_payload,
        wav_payload,
    )

    for i in range(100):
        p = near_twin_wav_payload(i)
        assert afp64(decode_wav_pcm16(p)) == _py_afp64(p), i
    # odd lengths exercise the uneven array_split boundary
    for ns in (65, 66, 97, 130, 301):
        p = wav_payload(7, "x", n_samples=ns)
        assert afp64(decode_wav_pcm16(p)) == _py_afp64(p), ns
    # too short / undecodable quarantine
    assert afp64(decode_wav_pcm16(wav_payload(1, "", n_samples=64))) is None
    assert afp64(None) is None


def test_near_twin_wav_hamming_bound():
    """The mm_audio_fingerprint fixture invariant: twin clips
    fingerprint within 1 bit (independent kernel), distinct bases stay
    far apart — the separation the banded join resolves."""
    from hadoop_fixedlengthinputformat_spark.functions.multimodal import (
        near_twin_wav_payload,
    )

    prints = {i: _py_afp64(near_twin_wav_payload(i)) for i in range(100)}
    assert all(v is not None for v in prints.values())
    for k in range(50):
        d = bin(prints[k] ^ prints[k + 50]).count("1")
        assert d <= 1, (k, d)
    far = [
        bin(prints[i] ^ prints[j]).count("1")
        for i in range(50)
        for j in range(i + 1, 50)
    ]
    assert min(far) > 4


def test_mm_audio_fingerprint_pairs_planted_twins(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.functions.llm_queries import (
        mm_audio_fingerprint,
    )

    rows = {
        r["doc_id"]: r
        for r in mm_audio_fingerprint(spark, sf_dir).collect()
    }
    ids = sorted(rows)
    assert ids and all(rows[i]["well_formed"] for i in ids)
    for i in ids:
        partner = min(
            (j for j in ids if j % 50 == i % 50 and j != i), default=None
        )
        assert rows[i]["partner_doc_id"] == partner, (i, rows[i])
        assert rows[i]["is_near_dup"] == (partner is not None)


def test_connected_components_ls_long_chain_log_rounds(spark):
    """The reason llm_dup_clusters_ls exists: a 64-node CHAIN (diameter
    63) must resolve to one component in O(log n) star rounds — 8 is a
    generous bound (~2*log2(64) with slack); min-label propagation
    would need 63 rounds and exhausts its 20-round cap on this graph."""
    from hadoop_fixedlengthinputformat_spark.functions.dedup import (
        connected_components_ls,
    )

    import pyspark.sql.functions as F

    chain = spark.range(63).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    stats: dict = {}
    got = connected_components_ls(chain, stats=stats).collect()
    assert {r.node for r in got} == set(range(64))
    assert all(r.cluster_id == 0 for r in got)
    assert stats["rounds"] <= 8, stats


def test_connected_components_ls_matches_min_label(spark):
    """Both CC formulations must produce identical (node, cluster_id)
    maps on a mixed graph: two blobs, a chain bridging one of them, an
    isolated pair."""
    from hadoop_fixedlengthinputformat_spark.functions.dedup import (
        connected_components,
        connected_components_ls,
    )

    pairs = [
        # blob A: 1-2-3-4 complete-ish
        (1, 2), (2, 3), (1, 3), (3, 4),
        # chain off blob A
        (4, 10), (10, 11), (11, 12),
        # blob B
        (20, 21), (21, 22), (20, 22),
        # isolated pair
        (30, 31),
    ]
    df = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    a = {
        (r.node, r.cluster_id)
        for r in connected_components(df).collect()
    }
    b = {
        (r.node, r.cluster_id)
        for r in connected_components_ls(df).collect()
    }
    assert a == b
    assert {c for _, c in b} == {1, 20, 30}


def test_dq_psi_drift_matches_bruteforce(spark, sf_dir):
    """PSI re-derived from raw parquet with pure Python + math.log —
    the same Laplace smoothing and 10-bin layout, but NOT the same
    snap/pivot machinery (a wrong bin edge, a swapped a/b, or a
    missing smoothing term diverges here)."""
    import math

    import pyarrow.parquet as pq

    from hadoop_fixedlengthinputformat_spark.operators.dq_suite import (
        dq_psi_drift,
    )

    rows = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    ).to_pylist()
    rows = [
        r
        for r in rows
        if r["ts"] is not None
        and r["event_type"] is not None
        and r["value"] is not None
    ]
    assert rows
    # integer micros, never float seconds: a row exactly at the span
    # midpoint must classify identically to the engines' 2*us <= lo+hi
    times = [int(round(r["ts"].timestamp() * 1_000_000)) for r in rows]
    lo, hi = min(times), max(times)
    per: dict = {}
    for r, t in zip(rows, times):
        half = 0 if 2 * t <= lo + hi else 1
        cents = int(round(r["value"] * 100))
        b = min(9, max(cents, 0) // 2000)
        st = per.setdefault(r["event_type"], {"n": [0, 0], "bins": {}})
        st["n"][half] += 1
        st["bins"][(half, b)] = st["bins"].get((half, b), 0) + 1
    got = {r["event_type"]: r for r in dq_psi_drift(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for et, st in per.items():
        na, nb = st["n"]
        psi = 0.0
        for k in range(10):
            pa = (st["bins"].get((0, k), 0) + 1) / (na + 10)
            pb = (st["bins"].get((1, k), 0) + 1) / (nb + 10)
            psi += (pb - pa) * math.log(pb / pa)
        g = got[et]
        assert g["n_a"] == na and g["n_b"] == nb, et
        assert abs(g["psi"] - psi) < 2e-4, (et, g["psi"], psi)
        assert g["drifted"] == (g["psi"] > 0.1), et
        assert g["psi"] >= 0  # PSI is a (pointwise) divergence


def test_llm_vocab_coverage_matches_bruteforce(spark, sf_dir):
    """Coverage curve re-derived with a Counter — a wrong cutoff order,
    an off-by-one rank, or a double-counted tie diverges here."""
    from collections import Counter

    import pyarrow.parquet as pq

    from hadoop_fixedlengthinputformat_spark.functions.tokenizer_queries import (
        llm_vocab_coverage,
    )

    rows = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).to_pylist()
    c: Counter = Counter()
    for r in rows:
        t = r["text"]
        if t:
            c.update(tok for tok in t.split(" ") if tok)
    total = sum(c.values())
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {r["k"]: r for r in llm_vocab_coverage(spark, sf_dir).collect()}
    assert set(got) == {256, 1024, 4096}
    for k, g in got.items():
        covered = sum(f for _, f in ordered[:k])
        assert g["total_tokens"] == total
        assert g["n_types"] == len(c)
        assert g["covered_tokens"] == covered, (k, g, covered)
        assert abs(g["coverage"] - covered / total) < 2e-4
    # the curve is monotone non-decreasing in K
    assert (
        got[256]["covered_tokens"]
        <= got[1024]["covered_tokens"]
        <= got[4096]["covered_tokens"]
    )
