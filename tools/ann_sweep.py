#!/usr/bin/env python
"""ANN recall/cost sweep (VERDICT r7 #5).

Measures recall@10 vs probe fraction for knn_cosine_ivf (nprobe sweep)
and knn_cosine_lsh (bits/radius sweep) on two corpora:

  * the current /root/testdata/sf0.1 embeddings roll (unstructured on
    most rolls: recall is information-theoretically ~ probe fraction)
  * a seeded planted 10-cluster Gaussian corpus of the same shape
    (2000 x 64), the realistic retrieval case

Prints one markdown table per corpus; results land in plans/NOTES.md
round-8 and the chosen defaults are pinned by
tests/test_llm.py::test_ann_defaults_hit_recall_on_clustered_data.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_fixedlengthinputformat_spark.functions import similarity  # noqa: E402
from hadoop_fixedlengthinputformat_spark.tables import get_session, load_table  # noqa: E402

K = 10
N_PROBES = 50


def planted(spark, n=2000, dim=64, n_clusters=10, seed=42, spread=0.35):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_clusters, n)
    V = centers[labels] + spread * rng.standard_normal((n, dim))
    rows = [
        (int(i), V[i].astype(float).tolist(), int(labels[i]))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def truth(emb_rows, probe_ids):
    ids = np.array([r[0] for r in emb_rows])
    V = np.array([r[1] for r in emb_rows], dtype=float)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    idx = {v: i for i, v in enumerate(ids)}
    out = {}
    for pid in probe_ids:
        s = Vn @ Vn[idx[pid]]
        s[idx[pid]] = -2
        top = ids[np.argsort(-s)[:K]]
        out[pid] = set(int(x) for x in top)
    return out


def recall(res_rows, gt):
    got = {}
    for r in res_rows:
        got.setdefault(r.probe_id, set()).add(r.neighbor_id)
    return np.mean([len(got.get(p, set()) & gt[p]) / K for p in gt])


def sweep(spark, emb, name):
    emb = emb.cache()
    n = emb.count()
    rows = [(r.vec_id, r.embedding) for r in emb.select("vec_id", "embedding").collect()]
    probe_ids = [r[0] for r in rows[:N_PROBES]]
    probes = emb.filter(emb.vec_id.isin(probe_ids))
    gt = truth(rows, probe_ids)
    print(f"\n## {name} (n={n}, {N_PROBES} probes, recall@{K})\n")
    print("| op | params | probe frac | recall@10 |")
    print("|---|---|---|---|")
    for nprobe in (1, 2, 3, 5, 8):
        res = similarity.knn_cosine_ivf(emb, probes, k=K, nprobe=nprobe)
        rec = recall(res.collect(), gt)
        # probe fraction: candidate rows scanned / (n * probes)
        frac = nprobe / emb.select("label").distinct().count()
        print(f"| ivf | nprobe={nprobe} | {frac:.2f} | {rec:.3f} |")
    for bits, radius in ((8, 1), (8, 2), (8, 3), (6, 1), (6, 2), (4, 1)):
        res = similarity.knn_cosine_lsh(
            emb, probes, k=K, bits=bits, radius=radius
        )
        rec = recall(res.collect(), gt)
        from math import comb
        frac = sum(comb(bits, r) for r in range(radius + 1)) / 2**bits
        print(f"| lsh | bits={bits},r={radius} | {frac:.3f} | {rec:.3f} |")
    emb.unpersist()


def main():
    spark = get_session("ann-sweep", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    sweep(spark, emb, "sf0.1 roll (unstructured)")
    sweep(spark, planted(spark), "planted 10-cluster (spread 0.35)")


if __name__ == "__main__":
    main()
