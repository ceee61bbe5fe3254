"""LLM-pipeline operator semantics on planted fixtures (FIXTURES.md §E):
exact/near-dup detection must find planted duplicates; kNN must rank a
planted near-copy first; multimodal plumbing must keep schema + batch
shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from hadoop_fixedlengthinputformat_spark.functions import dedup, multimodal, similarity


def _docs_with_dups(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s0"),
        (2, "spark shuffles data between executors during wide transformations", "en", "s0"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s0"),  # exact dup of 1
        (4, "the quick brown fox leaps over the lazy dog near the river bank", "en", "s0"),  # near dup of 1
        (5, "completely different content about database query optimization", "en", "s0"),
    ]
    return spark.createDataFrame(base, "doc_id long, text string, lang string, source string")


def test_exact_dedup_keeps_min_id(spark):
    d = _docs_with_dups(spark)
    kept = d.groupBy("text").agg(F.min("doc_id").alias("keep_id"))
    ids = {r.keep_id for r in kept.collect()}
    assert ids == {1, 2, 4, 5}


def test_minhash_lsh_finds_planted_near_dup(spark):
    d = _docs_with_dups(spark)
    sig = dedup.minhash_signature(d, "doc_id")
    pairs = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidate_pairs(sig, "doc_id").collect()}
    assert (1, 3) in pairs  # exact dup always collides on every band
    # near-dup (1,4)/(3,4) should collide on at least one band with high prob;
    # unrelated (2,5) must not
    assert (2, 5) not in pairs


def test_simhash_identical_and_near(spark):
    d = _docs_with_dups(spark)
    sims = {r.doc_id: r.simhash for r in dedup.simhash64(d, "doc_id").collect()}
    assert sims[1] == sims[3]  # identical text -> identical simhash
    ham_near = bin(sims[1] ^ sims[4]).count("1")
    ham_far = bin(sims[1] ^ sims[5]).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard_threshold(spark):
    d = _docs_with_dups(spark)
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(d, "doc_id", threshold=0.6).collect()
    }
    assert pairs[(1, 3)] == 1.0
    assert (1, 4) in pairs  # one-token edit -> jaccard ~0.85
    assert (2, 5) not in pairs


def _embeddings(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    rows = []
    for i in range(40):
        v = rng.standard_normal(64)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist(), i % 2))
    # vec 100: near-copy of vec 1 (tiny perturbation, same label parity)
    v1 = np.array(rows[1][1])
    v = v1 + 0.01 * rng.standard_normal(64)
    rows.append((100, (v / np.linalg.norm(v)).tolist(), 1))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_knn_bruteforce_ranks_planted_copy_first(spark):
    emb = _embeddings(spark)
    probes = emb.filter(F.col("vec_id") == 1)
    top = similarity.knn_cosine_bruteforce(emb, probes, k=3).collect()
    assert top[0].neighbor_id == 100 and top[0].rnk == 1
    assert top[0].cosine > 0.99


def test_knn_ivf_matches_bruteforce_on_planted(spark):
    emb = _embeddings(spark)
    probes = emb.filter(F.col("vec_id") == 1)
    ivf = similarity.knn_cosine_ivf(emb, probes, k=3, nprobe=2).collect()
    assert ivf[0].neighbor_id == 100  # planted copy shares the probe's bucket


def test_knn_structural_gates_fail_on_malformed_results(spark):
    """ADVICE r7: the gates must go RED on fabricated/corrupt results —
    a neighbor id absent from the corpus must fail neighbors_in_corpus
    (not silently shrink n via an inner join), and a NULL cosine must
    fail cosines_exact (not pass through a NULL comparison)."""
    emb = _embeddings(spark)
    probes = emb.filter(F.col("vec_id") == 1)
    good = similarity.knn_cosine_bruteforce(emb, probes, k=3)
    gates_ok = similarity.knn_structural_gates(emb, good, probes, k=3)
    row = gates_ok.collect()[0]
    assert row.neighbors_in_corpus and row.cosines_exact
    # fabricate a neighbor id that does not exist in the corpus
    fabricated = good.withColumn(
        "neighbor_id",
        F.when(F.col("rnk") == 2, F.lit(999999)).otherwise(
            F.col("neighbor_id")
        ),
    )
    row = similarity.knn_structural_gates(
        emb, fabricated, probes, k=3
    ).collect()[0]
    assert not row.neighbors_in_corpus
    assert not row.cosines_exact  # the fabricated row's cosine can't verify
    # NULL cosine must fold to an explicit red, not a vacuous pass
    nulled = good.withColumn(
        "cosine",
        F.when(F.col("rnk") == 2, F.lit(None).cast("double")).otherwise(
            F.col("cosine")
        ),
    )
    row = similarity.knn_structural_gates(emb, nulled, probes, k=3).collect()[0]
    assert not row.cosines_exact
    assert not row.order_ok


def test_cosine_dup_pairs_finds_planted(spark):
    emb = _embeddings(spark)
    pairs = similarity.cosine_dup_pairs(emb, threshold=0.9, window=200).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 100)}


def test_multimodal_image_real_decode(spark):
    import numpy as np

    d = spark.createDataFrame(
        [(1, "abc", "en", "s0"), (2, "defg", "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    feats = multimodal.decode_image_features(multimodal.attach_media(d))
    rows = {r.doc_id: r for r in feats.collect()}
    assert feats.columns == ["doc_id", "media", "width", "height", "channels", "mean_luma"]
    assert len(rows) == 2
    # REAL decode: features must equal numpy math on the known payload
    for doc_id, text in ((1, "abc"), (2, "defg")):
        payload = multimodal.ppm_payload(doc_id, text)
        img = multimodal.decode_image(payload)
        r = rows[doc_id]
        assert (r.width, r.height, r.channels) == (
            img.shape[1], img.shape[0], 3,
        )
        assert abs(r.mean_luma - float(img.mean()) / 255.0) < 1e-12
        assert (r.width, r.height) == (8 + doc_id % 9, 8 + doc_id % 7)


def test_multimodal_quarantines_undecodable(spark):
    d = spark.createDataFrame(
        [(1, "abc", "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    bad = d.withColumn("media", F.unhex(F.lit("DEADBEEF")))
    rows = multimodal.decode_image_features(bad).collect()
    assert len(rows) == 1 and rows[0].width is None and rows[0].mean_luma is None
    # whitespace-leading pixel data must not shift the P6 data offset
    import numpy as np

    payload = b"P6\n3 2\n255\n" + bytes([0x20, 0x0A, 0x09] * 6)
    img = multimodal.decode_image(payload)
    assert img.shape == (2, 3, 3) and img[0, 0, 0] == 0x20


def test_multimodal_bmp_decode():
    import struct

    import numpy as np

    # 2x2 24-bit bottom-up BMP, rows padded to 4 bytes
    px_bgr = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)]]
    rows = b""
    for r in px_bgr:
        row = b"".join(bytes(c) for c in r)
        rows += row + b"\x00" * ((4 - len(row) % 4) % 4)
    header = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    img = multimodal.decode_image(header + rows)
    assert img.shape == (2, 2, 3)
    # bottom-up: file row 0 is image row 1; BGR -> RGB swap applied
    assert tuple(img[1, 0]) == (0, 0, 255)
    assert tuple(img[0, 0]) == (255, 0, 0)


def test_multimodal_audio_frames_real_rms(spark):
    import numpy as np

    d = spark.createDataFrame(
        [(1, "abc", "en", "s0")], "doc_id long, text string, lang string, source string"
    )
    frames = multimodal.sample_audio_frames(
        multimodal.attach_audio(d), n_frames=4
    ).collect()
    assert [f.frame_idx for f in frames] == [0, 1, 2, 3]
    # REAL RMS: recompute from the known WAV payload
    samples = multimodal.decode_wav_pcm16(
        multimodal.wav_payload(1, "abc")
    ).astype(float)
    for f, chunk in zip(frames, np.array_split(samples, 4)):
        want = float(np.sqrt(np.mean(chunk * chunk))) / 32768.0
        assert abs(f.rms - want) < 1e-12


def test_multimodal_resize_schema_and_values(spark, sf_dir):
    from hadoop_fixedlengthinputformat_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    out = multimodal.resize_images(
        multimodal.attach_media(d), out_w=224, out_h=224
    )
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.out_width == 224 and r.out_height == 224 for r in rows)
    assert all(r.out_bytes == 224 * 224 * 3 for r in rows)
    assert all(r.width > 0 and r.height > 0 for r in rows)
    assert all(0.0 <= r.out_mean_luma <= 1.0 for r in rows)


def test_knn_pq_ranks_planted_copy_first(spark):
    emb = _embeddings(spark)
    probes = emb.filter(F.col("vec_id") == 1)
    top = similarity.knn_l2_pq(emb, probes, k=3).collect()
    assert top[0].neighbor_id == 100 and top[0].rnk == 1
    assert top[0].cosine > 0.99


def test_knn_pq_recall_vs_bruteforce(spark):
    """ADC + rerank must recover most of the exact top-10 (recall@10
    >= 0.6 on random Gaussian data — candidates are 3x over-fetched)."""
    emb = _embeddings(spark)
    probes = emb.filter(F.col("vec_id").isin(1, 2, 3))
    exact = similarity.knn_cosine_bruteforce(emb, probes, k=10).collect()
    approx = similarity.knn_l2_pq(emb, probes, k=10).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.probe_id, set()).add(r.neighbor_id)
    got = {}
    for r in approx:
        got.setdefault(r.probe_id, set()).add(r.neighbor_id)
    recalls = [
        len(truth[p] & got.get(p, set())) / len(truth[p]) for p in truth
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_knn_pq_dim_agnostic(spark):
    """PQ subspace width must derive from the data (16-dim, m=4)."""
    import numpy as np

    rng = np.random.RandomState(3)
    rows = []
    for i in range(30):
        v = rng.standard_normal(16)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist(), i % 2))
    v1 = np.array(rows[1][1])
    v = v1 + 0.005 * rng.standard_normal(16)
    rows.append((100, (v / np.linalg.norm(v)).tolist(), 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    probes = emb.filter(F.col("vec_id") == 1)
    top = similarity.knn_l2_pq(emb, probes, m=4, k=3).collect()
    assert top[0].neighbor_id == 100 and top[0].cosine > 0.99


def test_kmeans_recovers_planted_clusters(spark):
    """3 well-separated planted clusters -> k=3 training must put each
    planted group in its own cluster with the right sizes, and the run
    must be deterministic across invocations."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = [np.zeros(16), np.full(16, 10.0), np.full(16, -10.0)]
    rows = []
    i = 0
    for ci, ctr in enumerate(centers):
        for _ in range(10 + ci):  # sizes 10, 11, 12
            v = ctr + 0.1 * rng.standard_normal(16)
            rows.append((i, v.tolist()))
            i += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.kmeans_train(emb, k=3, iters=3).collect()
    sizes = sorted(r.n_members for r in out)
    assert sizes == [10, 11, 12]
    again = similarity.kmeans_train(emb, k=3, iters=3).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))


def test_kmeans_empty_cluster_keeps_k_rows(spark):
    """ADVICE r7: duplicate init vectors make one cluster empty on the
    first Lloyd iteration (assignment tiebreaks to the lower cluster
    id).  The trainer must still return exactly k rows, carrying the
    emptied cluster's previous centroid with n_members=0."""
    import numpy as np

    # ALL vectors identical -> both init centroids identical -> every
    # point ties and goes to cluster 0 in every iteration; cluster 1
    # stays empty to the end and must survive via the carried centroid
    base = np.full(8, 5.0)
    rows = [(i, base.tolist()) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.kmeans_train(emb, k=2, iters=3).collect()
    assert sorted(r.cluster for r in out) == [0, 1]
    by_cluster = {r.cluster: r for r in out}
    assert by_cluster[1].n_members == 0
    # the emptied cluster keeps a real (previous) centroid, not NULL
    assert by_cluster[1].centroid is not None
    assert len(by_cluster[1].centroid) == 8


def test_knn_ivf_dim_agnostic(spark):
    """IVF centroids must derive the dimension from the data (16-dim
    here), not assume 64."""
    import numpy as np

    rng = np.random.RandomState(1)
    rows = []
    for i in range(30):
        v = rng.standard_normal(16)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist(), i % 2))
    v1 = np.array(rows[1][1])
    v = v1 + 0.01 * rng.standard_normal(16)
    rows.append((100, (v / np.linalg.norm(v)).tolist(), 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    probes = emb.filter(F.col("vec_id") == 1)
    top = similarity.knn_cosine_ivf(emb, probes, k=3, nprobe=2).collect()
    assert top[0].neighbor_id == 100 and top[0].cosine > 0.99


def test_bpe_train_matches_textbook_walkthrough(spark):
    """The classic low/lower/newest/widest corpus: merge order and
    weighted pair counts must match the hand-computed BPE walkthrough
    (deterministic tie-break: count desc, then lexicographic)."""
    from hadoop_fixedlengthinputformat_spark.functions.text import bpe_train

    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(corpus,)], "text string")
    got = [(r.left, r.right, r.pair_count) for r in bpe_train(df, n_merges=4).collect()]
    assert got == [
        ("e", "s", 9),        # newest(6) + widest(3)
        ("es", "t</w>", 9),
        ("l", "o", 7),        # low(5) + lower(2)
        ("e", "w", 6),        # newest only (lower's 'we' is w-e? no: l-o-w-e-r pairs lo,ow,we,er)
    ]


def test_bpe_train_is_deterministic_and_scales_by_vocab(spark):
    """Same corpus twice -> identical merge table; duplicate documents
    change counts proportionally but not the merge order."""
    from hadoop_fixedlengthinputformat_spark.functions.text import bpe_train

    df1 = spark.createDataFrame([("aa ab aa ab aa",)], "text string")
    df2 = spark.createDataFrame([("aa ab aa ab aa",)] * 3, "text string")
    m1 = [(r.left, r.right) for r in bpe_train(df1, n_merges=3).collect()]
    m2 = [(r.left, r.right) for r in bpe_train(df2, n_merges=3).collect()]
    assert m1 == m2 and m1[0] == ("a", "a</w>")


def test_url_dedup_merges_utm_variants(spark, sf_dir):
    """The utm-tracking variant (doc_id%4==0) and its clean twin
    (doc_id%4==1) of the same logical page must land in ONE canonical
    group (the advisor found the old single-pass `\\?&` cleanup left a
    `?&` residue that kept them apart forever — and both engines agreed,
    so parity could not see it)."""
    from hadoop_fixedlengthinputformat_spark.functions.url_queries import (
        llm_url_dedup,
    )

    rows = llm_url_dedup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert "utm_" not in r.url, r.url
        assert "?&" not in r.url and "&&" not in r.url, r.url
    # every ?id= group contains at least the utm twin AND the clean twin
    # (multiple doc_id div 4 cohorts share each path id at sf0.001)
    id_groups = [r for r in rows if "?id=" in r.url]
    assert id_groups, "synthesized query variants missing"
    assert all(r.n_docs >= 2 for r in id_groups)


def test_ann_defaults_hit_recall_on_clustered_data(spark):
    """VERDICT r7 #5: the tuned recall/cost point, pinned on a SEEDED
    planted-cluster corpus (10 Gaussian clusters, 2000 x 64, spread
    0.25 — deterministic, so immune to the unplanted-roll flakiness
    that bans recall gates in driver oracles).  Full sweep:
    tools/ann_sweep.py + plans/NOTES.md round-8 ANN table.

      ivf nprobe=3 (default): recall@10 0.972 at 30% probe fraction
      lsh bits=8 radius=3:    recall@10 0.800 at 36% probe fraction
      lsh default (radius=2): the balanced point, 0.494 at 14.5%

    On UNSTRUCTURED rolls recall ~ probe fraction for every ANN (no
    structure to exploit — information-theoretic, not a bug)."""
    import numpy as np

    rng = np.random.RandomState(42)
    n, dim, n_clusters, spread = 2000, 64, 10, 0.25
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_clusters, n)
    V = centers[labels] + spread * rng.standard_normal((n, dim))
    emb = spark.createDataFrame(
        [
            (int(i), V[i].astype(float).tolist(), int(labels[i]))
            for i in range(n)
        ],
        "vec_id long, embedding array<double>, label int",
    ).cache()

    k, n_probes = 10, 50
    probe_ids = list(range(n_probes))
    probes = emb.filter(F.col("vec_id") < n_probes)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    gt = {}
    for pid in probe_ids:
        s = Vn @ Vn[pid]
        s[pid] = -2
        gt[pid] = set(int(x) for x in np.argsort(-s)[:k])

    def recall(res):
        got = {}
        for r in res.collect():
            got.setdefault(r.probe_id, set()).add(r.neighbor_id)
        return float(
            np.mean([len(got.get(p, set()) & gt[p]) / k for p in probe_ids])
        )

    ivf = recall(similarity.knn_cosine_ivf(emb, probes, k=k, nprobe=3))
    assert ivf >= 0.9, f"ivf nprobe=3 recall {ivf}"
    lsh3 = recall(
        similarity.knn_cosine_lsh(emb, probes, k=k, bits=8, radius=3)
    )
    assert lsh3 >= 0.75, f"lsh radius=3 recall {lsh3}"
    # the cheap default still beats its probe fraction by ~3x
    lsh2 = recall(similarity.knn_cosine_lsh(emb, probes, k=k))
    assert lsh2 >= 0.4, f"lsh default recall {lsh2}"
    emb.unpersist()


def test_dhash64_matches_independent_reimplementation():
    """Pin multimodal.dhash64 bit-for-bit against a from-scratch pure
    python dHash (grayscale -> 9x8 NN downsample -> adjacent compare) —
    the parity gate only checks the planted-pair structure, not the
    hash algebra itself."""
    import numpy as np

    from hadoop_fixedlengthinputformat_spark.functions import multimodal as mm

    for seed, w, h in ((b"a", 12, 10), (b"b", 9, 8), (b"c", 40, 23)):
        img = np.frombuffer(
            mm._det_bytes(seed, w * h * 3), dtype=np.uint8
        ).reshape(h, w, 3)
        g = [
            [sum(int(c) for c in img[y][x]) / 3 for x in range(w)]
            for y in range(h)
        ]
        yi = [(y * h) // 8 for y in range(8)]
        xi = [(x * w) // 9 for x in range(9)]
        small = [[g[yy][xx] for xx in xi] for yy in yi]
        val = 0
        for row in small:
            for x in range(8):
                val = (val << 1) | (1 if row[x + 1] > row[x] else 0)
        assert mm.dhash64(img) == val
    # quarantine path: undecodable input hashes to None
    assert mm.dhash64(None) is None


def test_image_phash_plants_pair_exactly(spark):
    """The planted twin (id % 50) must be the ONLY partner each id
    finds, and the ~50 distinct payloads must produce 50 distinct
    hashes (collision-free kernel)."""
    from hadoop_fixedlengthinputformat_spark.functions.llm_queries import (
        mm_image_phash,
    )

    rows = mm_image_phash(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r.well_formed for r in rows)
    ids = {r.doc_id for r in rows}
    for r in rows:
        want = r.doc_id % 50 + (0 if r.doc_id >= 50 else 50)
        assert r.partner_doc_id == (want if want in ids else None)
