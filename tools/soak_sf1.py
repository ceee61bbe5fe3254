#!/usr/bin/env python
"""Large-roll (sf1) family soak driver (VERDICT r9 #5, round-10).

Re-runs the throughput/accuracy soaks that the round-8/9/10 audits ran
ad-hoc, in one command, so every future round can regenerate the
NOTES.md soak tables mechanically:

  python tests/gen_testdata.py /tmp/sf1 1 --scale 1000   # once
  python tools/soak_sf1.py /tmp/sf1 [mm|ann|all]

* ``mm``  — full-corpus (500k-doc) multimodal decode throughput:
  PPM decode + luma, dHash64, PCM16 frame RMS, video frame sampling,
  nearest-neighbor resize; asserts zero quarantines on synthetic
  payloads and prints wall seconds per kernel.
* ``ann`` — ANN trio wall-time + recall@10 for 5 probes against the
  exact brute-force top-10 (brute force over 5 probes is one broadcast
  join — cheap at any corpus size).

Prints one JSON line per family.  Correctness parity at sf1 stays
`python tests/parity.py /tmp/sf1 <names>` — this tool covers the
throughput/accuracy axes parity can't see.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def soak_mm(spark, sf_dir: str) -> dict:
    from hadoop_fixedlengthinputformat_spark.functions import multimodal as mm
    from hadoop_fixedlengthinputformat_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    ).where(F.col("doc_id").isNotNull())
    res: dict = {"family": "mm", "corpus_rows": d.count()}

    def run(name, df, ok_col):
        t0 = time.perf_counter()
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(ok_col, 1).otherwise(0)).alias("ok"),
        ).collect()[0]
        res[name] = {
            "sec": round(time.perf_counter() - t0, 2),
            "rows": agg.n,
            "ok": agg.ok,
        }

    run(
        "image_decode",
        mm.decode_image_features(mm.attach_media(d)),
        F.col("width").isNotNull()
        & (F.abs(F.col("mean_luma") - 0.5) <= 0.15),
    )
    run(
        "dhash",
        mm.dhash_images(mm.attach_media(d)),
        F.col("phash").isNotNull() & (F.length("phash") == 16),
    )
    run(
        "audio_frames",
        mm.sample_audio_frames(mm.attach_audio(d), n_frames=4),
        F.col("rms").between(0.35, 0.80),
    )
    run(
        "video_frames",
        mm.sample_video_frames(mm.attach_video(d), every=2),
        F.col("width").isNotNull(),
    )
    run(
        "resize",
        mm.resize_images(mm.attach_media(d), 4, 4),
        (F.col("out_width") == 4) & (F.col("out_height") == 4),
    )
    return res


def soak_ann(spark, sf_dir: str) -> dict:
    from hadoop_fixedlengthinputformat_spark.functions import similarity as sim
    from hadoop_fixedlengthinputformat_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id").between(1, 5))
    res: dict = {"family": "ann", "corpus_rows": emb.count()}

    def topset(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r[0], set()).add(r[1])
        return out

    t0 = time.perf_counter()
    truth = topset(sim.knn_cosine_bruteforce(emb, probes, k=10))
    res["bruteforce_sec"] = round(time.perf_counter() - t0, 2)
    for name, fn in (
        ("ivf", lambda: sim.knn_cosine_ivf(emb, probes, k=10, nprobe=3)),
        ("lsh", lambda: sim.knn_cosine_lsh(emb, probes, k=10)),
        ("pq", lambda: sim.knn_l2_pq(emb, probes, k=10, rerank=30)),
    ):
        t0 = time.perf_counter()
        got = topset(fn())
        sec = round(time.perf_counter() - t0, 2)
        hits = sum(len(got.get(p, set()) & t) for p, t in truth.items())
        tot = sum(len(t) for t in truth.values())
        res[name] = {"sec": sec, "recall": round(hits / tot, 3)}
    return res


def soak_queries(spark, sf_dir: str, names: list[str]) -> dict:
    """Generic registered-query timing soak: warm once, then time one
    build+count (build included so eager localCheckpoints are paid in
    the measurement — the round-10 lesson).  Correctness at the large
    roll stays `python tests/parity.py <sf_dir> <names>`."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    res: dict = {"family": "queries", "sf_dir": sf_dir}
    for n in names:
        qs[n](spark, sf_dir).count()  # warm the scan + JIT
        t0 = time.perf_counter()
        c = qs[n](spark, sf_dir).count()
        res[n] = {"sec": round(time.perf_counter() - t0, 2), "rows": c}
    return res


def main() -> None:
    from hadoop_fixedlengthinputformat_spark.tables import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    if sf_dir.startswith("-"):
        raise SystemExit(
            f"sf_dir looks like an option, not a path: {sf_dir!r}\n"
            "usage: python tools/soak_sf1.py [SF_DIR] [mm|ann|all|q1,q2,...]"
        )
    names: list = []
    if which not in ("mm", "ann", "all"):
        # anything else = comma-separated registered query names;
        # validate against the registry UP FRONT so a typo of
        # mm/ann/all fails with a clear message, not a KeyError
        # mid-soak (ADVICE r10)
        import __spark_entry__ as entry_mod

        names = [n for n in which.split(",") if n]
        unknown = sorted(set(names) - set(entry_mod.queries()))
        if unknown:
            raise SystemExit(
                f"unknown query name(s): {', '.join(unknown)} — "
                "expected 'mm', 'ann', 'all', or a comma-separated "
                "list of registered query names (see "
                "__spark_entry__.queries())"
            )
    spark = get_session("soak-sf1", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32"
    )))
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("mm", "all"):
        print(json.dumps(soak_mm(spark, sf_dir)))
    if which in ("ann", "all"):
        print(json.dumps(soak_ann(spark, sf_dir)))
    if names:
        print(json.dumps(soak_queries(spark, sf_dir, names)))


if __name__ == "__main__":
    main()
