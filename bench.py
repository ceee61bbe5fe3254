#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §6 protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; per query 1 warm-up +
3 timed runs, median, execution forced with a noop-style write (count on
a cached-free plan would let Spark skip column decode, so we use
df.write.format("noop")).

Prints ONE JSON line:
  {"metric": "total_median_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Round-15 output contract (VERDICT r14 #2 — the r13 round-over-round
record silently vanished because the one-line JSON outgrew the
driver's 2000-char tail buffer and arrived truncated mid-JSON): the
stdout line is now CAPPED — metric/value/unit/queries/sf/cpus plus a
few scalar factors, compact separators, asserted < 1900 chars — and
every per-query diagnostic dict (normalized values, vs-baseline
ratios, the gated/strict gate dicts, probe brackets) moves to a
sidecar written next to this file (BENCH_DETAIL.json, override with
$BENCH_DETAIL_PATH) and is also echoed to stderr.  Nothing about the
timed region, the normalization, or the gate FORMULA changed — the
same numbers are computed, they just live in the sidecar.

Optional sf1 leg (VERDICT r14 #1): when $SPARK_GRAFT_SF1_DIR is set
and exists, the heavy-representative set SF1_HEADLINE additionally
runs there (1 warm-up + median of $BENCH_SF1_RUNS, default 3, same
noop-sink methodology) after the sf0.1 loop; per-query seconds land
in the sidecar's "sf1" block and only the total rides the stdout
line.  Opt-in by env — NOT auto-detected — so the driver's own
bench invocations (including the reduced-core scaling run) keep
their historical wall-clock envelope and round-over-round
comparability.

Calibration protocol (round 12, VERDICT r11 #2): the headline queries
run on two distinct machine axes and the axes drift INDEPENDENTLY on
this fleet — round 12 measured the binaryRecords (IO/page-cache) probe
at machine-factor 1.03 while the Python/CPU probe read 1.9x slow, and
the CPU-tier queries moved exactly with the latter.  Queries are
therefore normalized by the COMPUTE-axis probe (calibration_py), not
the IO probe; all four probe values are sampled at bench START and END
(box speed measurably drifts within a 10-minute run) and the median of
the combined samples is used.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

import pandas as pd  # module-level: pandas_udf type hints resolve via
# the function's globals under `from __future__ import annotations`

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_RUNS", "5"))  # median of 5: single-run
# spikes (GC, microVM CPU steal) moved round-to-round totals by ~20%
# with median-of-3; the wider window costs ~1 min total and halves the
# spread between consecutive full-bench runs on the same machine.
WARMUPS = int(os.environ.get("BENCH_WARMUP", "2"))  # Python-data-source
# queries (fixedlen scans) keep warming past one run (worker reuse +
# Arrow pipe spin-up): measured 1.56 -> 1.42 -> 1.26 -> 1.14 -> 0.81
# across 5 timed runs after a single warm-up.

# Headline set: one per cost family — scan-bound, agg-bound, shuffle-join,
# window, as-of merge, Python-UDF path, and the LLM-pipeline heavies.
HEADLINE = [
    "scan_fixedlen_wide",      # fixed-width decode throughput (the reference's job)
    "agg_groupby_hash",        # TPC-H Q1 shape
    "join_inner_hash",         # broadcast star join
    "join_sort_merge",         # shuffle join
    "join_asof",               # union+window as-of
    "win_running_sum",         # partitioned running window
    "topk_per_group",          # rank-filter pattern
    "udf_scalar_pandas",       # Arrow UDF path
    "llm_exact_dedup",
    "llm_minhash_near_dedup",  # shingle explode + LSH self-join
    "llm_knn_cosine",          # brute-force cosine top-k
    "llm_text_stats",
    "llm_quality_score",
    "tpch_q5_local_supplier",  # 6-way join composite
    "subq_scalar_select",      # decorrelated correlated subquery
    "ts_gap_fill",             # grid expansion + forward-fill window
    "llm_centroid_per_label",  # posexplode vector mean
    # round-8 additions (VERDICT r7 #6): one representative per
    # post-session-1 family, so perf regressions in the newer 200 ops
    # surface round-over-round.  Baselines = first measurement at
    # introduction (BASELINE.md protocol, round-8 table).
    "pipeline_tape_to_corpus",  # tape scan -> clean -> dedup composite
    "scan_varlen_vbs",          # RDW/BDW spanned-record reassembly
    "agg_count_min",            # mergeable sketch build + probe join
    "llm_repeated_ngrams",      # n-gram explode + digest-only shuffles
    "llm_line_dedup",           # line-level corpus dedup
    # round-9 addition (VERDICT r8 #6): the graded set had no
    # stats-family op; agg_spearman is the r8 HUGEINT-reworked
    # exact-midrank path (rank windows + map-side-combined groupBy).
    "agg_spearman",
    # round-10 addition (VERDICT r9 #7): the round-9 exact-integer-rank
    # family representative.  Baseline = first measurement (BASELINE.md).
    "agg_percentile_exact",
    # round-10 second-wave family representative: degree-oriented
    # triangle counting (support-thresholded edges, wedge equi-joins,
    # checkpointed edge list).  Baseline = first measurement (BASELINE.md).
    "graph_triangles",
    # round-11 addition (VERDICT r10 #3): the heaviest round-10
    # second-wave op at sf1.  Baseline = first measurement (BASELINE.md).
    "agg_iqr_outliers",
    # round-12 addition (VERDICT r11 #6): the round-11-family
    # representative — the heaviest r11 op at sf1 (5.7 s) and the only
    # driver-loop-iterative graded graph op (Matula–Beck peel with
    # per-round LIMIT-1 existence probes).  Baseline = first
    # measurement (BASELINE.md, round-12 table).
    "graph_kcore_converged",
    # round-13 addition (VERDICT r12 #3): the round-12-family
    # representative — the heaviest r12 op at sf1 (26 s) and the only
    # one exercising the fused shingle-explode -> signature+set-size ->
    # LSH-band pipeline under time.  Baseline = first measurement
    # (BASELINE.md, round-13 table).
    "llm_minhash_containment",
    # round-14 addition (VERDICT r13 #3): the round-13-family
    # representative — the heaviest r13 op at sf1 (15.5 s) and the
    # only one exercising the fused gates -> exact dedup -> LSH
    # near-dedup -> curriculum mix -> shard composite under time,
    # measured AFTER the r14 curriculum-stage rework (groupBy +
    # broadcast rate join).  Baseline = first measurement (BASELINE.md,
    # round-14 table).
    "pipeline_corpus_release",
]

# Machine axis each query's wall time tracks (round 12 protocol):
#   py  — Python workers on the hot path: Python Data Source scans
#         (plan shows `BatchScan ... (Python)`) and Arrow pandas-UDF
#         stages: scan_fixedlen_wide, scan_varlen_vbs,
#         pipeline_tape_to_corpus, udf_scalar_pandas.
#   cpu — JVM whole-stage-codegen / shuffle work (every other headline
#         query; parquet at sf0.1 is page-cache-resident so none of
#         them are IO-bound).
# Round-12 evidence (BENCH pre-measure, plans/NOTES.md round-12): when
# the py probe read 1.885x, the JVM tier moved with it query-for-query
# (topk_per_group landed on 1.006x of its session-1 baseline after
# dividing by the py factor, win_running_sum on 0.995x) — the pandas
# probe is measuring co-tenant CPU steal, which both tiers share.  So
# BOTH axes currently normalize by the py-probe factor; the dedicated
# JVM kernel (calibration_cpu below) is recorded from this round on so
# the two factors can split once it has cross-round history (exactly
# how calibration_py itself was introduced in round 8 and promoted
# in round 12).  The binaryRecords IO probe stays recorded (fleet IO
# drift diagnostic + the legacy machine_factor field) but normalizes
# no headline query — none is IO-bound at sf0.1.


# Per-query baseline: (seconds, axis_machine_factor at measurement),
# from BASELINE.md.  Round-12 protocol: the compute axis (py/cpu) was
# FLEET-CONSTANT across every box that recorded baselines — the
# calibration_py probe read 0.363–0.365 s on four consecutive rounds
# (r8–r11) whose IO probe spanned 0.64–1.0 — so every pre-round-12 row
# carries axis-mf 1.0 (the old per-row IO factors 0.64–0.77 measured
# page-cache drift that the compute tier never saw; they remain in
# BASELINE.md for the record).  Rows added from round 12 on record the
# axis factor actually measured alongside them.
BASELINES: dict[str, tuple[float, float]] = {
    # session-1 original 13
    "scan_fixedlen_wide": (0.68, 1.0),
    "agg_groupby_hash": (0.96, 1.0),
    "join_inner_hash": (0.51, 1.0),
    "join_sort_merge": (0.45, 1.0),
    "join_asof": (0.59, 1.0),
    "win_running_sum": (0.33, 1.0),
    "topk_per_group": (0.31, 1.0),
    "udf_scalar_pandas": (0.53, 1.0),
    "llm_exact_dedup": (0.19, 1.0),
    "llm_minhash_near_dedup": (3.03, 1.0),
    "llm_knn_cosine": (0.57, 1.0),
    "llm_text_stats": (0.16, 1.0),
    "llm_quality_score": (0.52, 1.0),
    # session-1 late additions
    "tpch_q5_local_supplier": (0.68, 1.0),
    "subq_scalar_select": (0.25, 1.0),
    "ts_gap_fill": (0.86, 1.0),
    "llm_centroid_per_label": (0.16, 1.0),
    # round-8 additions (box io-mf 0.686; compute axis nominal)
    "pipeline_tape_to_corpus": (0.66, 1.0),
    "scan_varlen_vbs": (0.51, 1.0),
    "agg_count_min": (0.91, 1.0),
    "llm_repeated_ngrams": (2.35, 1.0),
    "llm_line_dedup": (1.07, 1.0),
    # round-9 addition (box io-mf 0.714; compute axis nominal)
    "agg_spearman": (1.65, 1.0),
    # round-10 additions (box io-mf 0.663 / 0.640; compute axis nominal)
    "agg_percentile_exact": (1.40, 1.0),
    "graph_triangles": (2.46, 1.0),
    # round-11 addition (box io-mf 0.763; compute axis nominal)
    "agg_iqr_outliers": (2.108, 1.0),
    # round-12 addition — first measurement, recorded WITH the
    # compute-axis (py-probe) factor bracketing its timed runs: median
    # of 5 = 3.937 s while the probe read 1.146 (BASELINE.md round-12
    # table; the round-12 box ran the compute axis 15-90% above
    # nominal, swinging within the hour)
    "graph_kcore_converged": (3.937, 1.146),
    # round-13 addition — first measurement, probes bracketing: median
    # of 5 = 2.283 s while the compute probe read 1.536 (the box's py
    # probe swung 0.680 -> 0.439 within the run; BASELINE.md round-13
    # table)
    "llm_minhash_containment": (2.283, 1.536),
    # round-14 addition — first measurement, probes bracketing
    # (BASELINE.md round-14 table), taken on a QUIET box (loadavg 0.02
    # at start; py probe 0.404 -> 0.332, mf 1.011 — the first
    # fleet-nominal baseline since r11) with the reworked curriculum
    # stage (groupBy + broadcast rates) in place
    "pipeline_corpus_release": (1.856, 1.011),
}

assert set(HEADLINE) <= set(BASELINES), sorted(
    set(HEADLINE) - set(BASELINES)
)  # ADVICE r11: a headline query without a baseline row must fail
# loudly here, not silently inflate the 2x-gate total downstream.

# --- sf1 leg (VERDICT r14 #1) -------------------------------------------
# The sf0.1 bench is scheduling-floor-bound for most rows (12 of 29 ran
# as fast on 8 cores as 32 in PERF_r14's scaling block), so shuffle /
# multi-scan / codec claims need a leg where data cost dominates.  The
# 8 heavy representatives VERDICT r14 named, run at $SPARK_GRAFT_SF1_DIR
# when set (generate with `python tests/gen_testdata.py /tmp/sf1 1
# --scale 1000`).  Baselines: first measurement (BASELINE.md round-15
# table) with the compute-axis probe factor bracketing the runs.
# llm_ngram_jaccard (VERDICT r14's first pick) was measured and REMOVED
# from this set in round 15: the synthetic corpus draws document text
# from a ~31-token vocabulary, so at sf1 (500k docs, ~5k per
# (lang,source) block) 56% OF ALL IN-BLOCK PAIRS genuinely qualify at
# jaccard >= 0.6 — 7.17M result rows were counted in ONE block (DuckDB,
# OPTIMIZATION_r15.md), ~700M corpus-wide.  The OUTPUT is quadratic in
# SF by data construction; no exact algorithm can emit it in bench
# time (the first sf1 attempt filled the disk with 80 GB of spill).
# llm_minhash_containment represents the dedup-join family instead —
# its signatures hash word SHINGLES (sequence n-grams, a combinatorial
# space), so candidate pairs stay sparse on the same corpus and the
# r12 soak already measured it feasible at sf1.
SF1_HEADLINE = [
    "llm_minhash_containment",
    "dq_referential",
    "ts_interpolate",
    "agg_count_min",
    "llm_minhash_near_dedup",
    "tpch_q2_min_cost_supplier",
    "pipeline_corpus_release",
    "stream_custom_stateful",
]
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "")
SF1_RUNS = int(os.environ.get("BENCH_SF1_RUNS", "3"))
# First-measurement sf1 baselines (round 15, BASELINE.md round-15
# table): (seconds, compute-axis factor at measurement).  Measured at
# HEAD of the round-15 optimization wave (py probe 0.483 -> 0.386
# within the run, median factor 1.192) — i.e. AFTER this round's
# reworks, so tpch_q2 / ts_interpolate start from their optimized
# shapes; the PRE-rework sf1 numbers are recorded in
# OPTIMIZATION_r15.md (e.g. agg_spearman 21.4 s, join_asof_forward
# 367 s) and plans/r15/_sweep_sf1_before.json.
SF1_BASELINES: dict[str, tuple[float, float]] = {
    "llm_minhash_containment": (29.798, 1.192),
    "dq_referential": (1.992, 1.192),
    "ts_interpolate": (0.533, 1.192),
    "agg_count_min": (1.957, 1.192),
    "llm_minhash_near_dedup": (20.358, 1.192),
    "tpch_q2_min_cost_supplier": (0.678, 1.192),
    "pipeline_corpus_release": (7.932, 1.192),
    "stream_custom_stateful": (4.979, 1.192),
}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# --- calibration probes (one per machine axis) -------------------------
# Reference values define machine_factor 1.0 per axis; a probe / its
# reference is that axis's factor on THIS box right now.

CALIBRATION_REF_SEC = 0.43  # io axis: sc.binaryRecords raw count of the
# 66 MB sf0.1 lineitem.fixed on the session-1 machine (BASELINE.md).

CALIBRATION_PY_REF_SEC = 0.364  # py axis: the pandas-UDF sweep below.
# Reference = the fleet-constant value the probe read on every box from
# its introduction through round 11 (0.365 / 0.363 / 0.364 / 0.363 —
# BENCH_r08..r11.json); the session-1 box predates the probe and is
# assumed the same fleet-nominal speed.

# The JVM kernel probe (calibration_cpu) has NO reference yet: it was
# introduced round 12 and normalizes nothing until it has cross-round
# history (the calibration_py precedent — recorded r8, promoted r12).

CALIBRATION_SCHED_REF_SEC = 0.196  # sched axis: the 64-task no-work
# job round-trip measured round 12 (BENCH_r12.json), the only recorded
# history.  Promoted round 13 (VERDICT r12 #2): any headline row whose
# absolute median is < SCHED_GATE_MULT x this run's sched probe is
# job-floor-dominated — its wall time measures task-launch round-trips,
# not the plan (llm_text_stats graded 1.57x at 0.25 s absolute over a
# 0.196 s floor; the plan was unchanged since round 1).  Such rows
# grade on the floor-subtracted ratio (see vs_baseline_gated below)
# instead of raw: a real 2x PLAN regression still surfaces (the gate
# ratio is the plan-cost multiple beyond the floor) while sub-floor
# scheduling noise cannot breach it.

SCHED_GATE_MULT = 3.0  # VERDICT r12 #2: "no headline row whose
# absolute time is < 3x the sched floor grades raw"


def calibration(spark) -> float:
    """IO-axis probe: median wall time of the baseline raw-scan."""
    import statistics as st

    from hadoop_fixedlengthinputformat_spark.sources import fixture_gen

    path = fixture_gen.fixed_file_for(SF_DIR, "lineitem")
    rl = fixture_gen.LAYOUTS["lineitem"][0]
    sc = spark.sparkContext
    sc.binaryRecords(path, rl).count()  # warm (page cache + JVM)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        sc.binaryRecords(path, rl).count()
        samples.append(time.perf_counter() - t0)
    return round(st.median(samples), 3)


def calibration_py(spark) -> float:
    """py-axis probe: a fixed Arrow-batched pandas_udf sweep over 2M
    rows — Python workers + Arrow pipes + memory bandwidth, the axis
    Python Data Source scans and pandas-UDF queries run on."""
    import statistics as st

    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def probe(v: pd.Series) -> pd.Series:
        return v * 1.0000001 + 1.0

    df = spark.range(2_000_000).select(probe(col("id")).alias("x"))
    force(df)  # warm the Python workers
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(df)
        samples.append(time.perf_counter() - t0)
    return round(st.median(samples), 3)


def calibration_cpu(spark) -> float:
    """JVM-kernel probe (diagnostic, normalizes nothing yet): md5 +
    hex-parse + sum over 12M rows of whole-stage codegen — measured
    ~0.45-0.5 s of pure JVM ALU work on a nominal box (BENCH_r12.json:
    0.478 s at compute factor 1.085), no IO, no Python.  A lighter
    modular-arithmetic
    kernel was rejected: at 24M rows its wall time DROPPED when rows
    were quadrupled, i.e. it measured job fixed overhead, not compute.
    Recorded from round 12 so a future round can split the JVM factor
    from the Python one once cross-round history exists."""
    import statistics as st

    from pyspark.sql import functions as F

    df = spark.range(12_000_000).select(
        F.sum(
            F.conv(
                F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10
            ).cast("long")
        ).alias("s")
    )
    force(df)  # warm (codegen compile)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(df)
        samples.append(time.perf_counter() - t0)
    return round(st.median(samples), 3)


def calibration_sched(spark) -> float:
    """Scheduler probe (diagnostic, normalizes nothing yet): one
    64-task no-work job round-trip — the per-job fixed-overhead floor
    under every sub-second headline query.  No session-1 reference
    exists; each round's value is the next round's yardstick."""
    import statistics as st

    df = spark.range(0, 64, 1, 64)
    df.count()  # warm
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        df.count()
        samples.append(time.perf_counter() - t0)
    return round(st.median(samples), 3)


def probe_all(spark) -> dict[str, float]:
    return {
        "io": calibration(spark),
        "py": calibration_py(spark),
        "cpu": calibration_cpu(spark),
        "sched": calibration_sched(spark),
    }


def main() -> None:
    from hadoop_fixedlengthinputformat_spark.tables import get_session
    import __spark_entry__ as entry_mod

    spark = get_session("flif-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    m = re.search(r"sf([0-9.]+)/?$", SF_DIR)
    sf = float(m.group(1)) if m else 0.0

    # Probes bracket the timed runs: box speed drifts within a single
    # 10-minute bench (round 12 measured the py probe at 0.686 and
    # 0.481 an hour apart on one box) — the median of start+end
    # samples is the least-wrong single per-axis factor for the run.
    probes_start = probe_all(spark)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench: {name}")
        for _ in range(WARMUPS):  # warm-up (also materializes fixtures)
            force(fn(spark, SF_DIR))
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            force(fn(spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        print(f"# {name}: {timings[name]}s {samples}", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)

    # Optional sf1 leg — same methodology (noop sink, warm-up, median),
    # timed inside the probe bracket so the compute factor covers it.
    sf1_timings: dict[str, float] = {}
    if SF1_DIR and os.path.isdir(SF1_DIR):
        for name in SF1_HEADLINE:
            fn = qs[name]
            spark.sparkContext.setJobDescription(f"bench sf1: {name}")
            force(fn(spark, SF1_DIR))  # single warm-up at sf1
            samples = []
            for _ in range(SF1_RUNS):
                t0 = time.perf_counter()
                force(fn(spark, SF1_DIR))
                samples.append(time.perf_counter() - t0)
            sf1_timings[name] = round(statistics.median(samples), 3)
            print(
                f"# sf1 {name}: {sf1_timings[name]}s {samples}",
                file=sys.stderr,
            )
        spark.sparkContext.setJobDescription(None)

    probes_end = probe_all(spark)
    probes = {
        k: round(statistics.median([probes_start[k], probes_end[k]]), 3)
        for k in probes_start
    }

    machine_factor = round(probes["io"] / CALIBRATION_REF_SEC, 3)
    mf_compute = max(probes["py"] / CALIBRATION_PY_REF_SEC, 1e-9)
    total = round(sum(timings.values()), 3)
    # Compute-axis machine-factor normalization (VERDICT r11 #2): each
    # query's wall time divided by THIS run's compute factor, compared
    # against its baseline divided by the factor recorded at baseline
    # measurement.  The 2x gate evaluates on these ratios, not raw
    # seconds.
    normalized = {
        n: round(v / mf_compute, 3) for n, v in timings.items()
    }
    ratios = {
        n: round(normalized[n] / (BASELINES[n][0] / BASELINES[n][1]), 3)
        for n in timings
    }
    # Scheduling-floor gate (round 13, VERDICT r12 #2): a row whose
    # absolute median is < SCHED_GATE_MULT x this run's per-job floor
    # is measuring task-launch round-trips, not its plan.  Those rows
    # grade on the floor-subtracted ratio — the multiple of the
    # baseline that the PLAN cost beyond the floor represents — so a
    # 0.25 s query over a 0.2 s floor can't fake a 1.5x "regression",
    # while a genuine plan blow-up (floor + 2x baseline of real work)
    # still breaches.  Rows at/above the threshold grade raw.
    sched_now = probes["sched"]
    sched_norm = sched_now / mf_compute
    sched_adjusted = [
        n for n in timings if timings[n] < SCHED_GATE_MULT * sched_now
    ]
    # ADVICE r13 disposition (round 14, MEASURED): the advice offered
    # two fixes for the gate's reduced sensitivity on sub-floor
    # baselines — subtract the floor from the DENOMINATOR too, or
    # document the reduced sensitivity and accumulate sched-probe
    # history first.  The both-sides formula was implemented and
    # measured this round: on IDENTICAL code 90 minutes apart it read
    # llm_centroid_per_label 0.53 -> 2.45 and topk_per_group 1.65 ->
    # 2.24 purely from ~0.2 s of box noise on 0.16-0.31 s baselines
    # (raw medians 0.19 -> 0.41 s; a 0.16 s-plan query's noise is the
    # same magnitude as its entire baseline plan cost, so no
    # denominator choice can separate a real 2x from one scheduling
    # spike).  So the OFFICIAL gate keeps the floor-inclusive
    # denominator — documented sensitivity: a sub-floor-baseline row
    # (llm_text_stats 0.16 s vs the 0.196 s reference floor) hides a
    # plan-cost regression until it exceeds ~2x its floor-inclusive
    # baseline — and the stricter both-sides ratio is EMITTED as
    # vs_baseline_gated_strict, a diagnostic accumulating the
    # cross-round history the advice asked for before promotion.
    gated = dict(ratios)
    gated_strict = dict(ratios)
    for n in sched_adjusted:
        base_norm = BASELINES[n][0] / BASELINES[n][1]
        plan_cost = max(normalized[n] - sched_norm, 0.001)
        gated[n] = round(plan_cost / base_norm, 3)
        gated_strict[n] = round(
            plan_cost
            / max(
                base_norm - CALIBRATION_SCHED_REF_SEC,
                0.5 * CALIBRATION_SCHED_REF_SEC,
            ),
            3,
        )
    base_norm_total = sum(
        BASELINES[n][0] / BASELINES[n][1] for n in timings
    )
    norm_total = round(sum(normalized.values()), 3)

    # --- sf1 leg post-processing (same normalization protocol) ---------
    sf1_block: dict[str, object] = {}
    if sf1_timings:
        sf1_norm = {
            n: round(v / mf_compute, 3) for n, v in sf1_timings.items()
        }
        sf1_ratios = {
            n: round(
                sf1_norm[n] / (SF1_BASELINES[n][0] / SF1_BASELINES[n][1]),
                3,
            )
            for n in sf1_timings
            if n in SF1_BASELINES
        }
        sf1_block = {
            "sf1_dir": SF1_DIR,
            "runs": SF1_RUNS,
            "queries": sf1_timings,
            "total_median_sec": round(sum(sf1_timings.values()), 3),
            "normalized_queries": sf1_norm,
            "vs_baseline_normalized": sf1_ratios,
            "new_queries": sorted(
                n for n in sf1_timings if n not in SF1_BASELINES
            ),
        }

    # --- emit: capped stdout line + full-detail sidecar (VERDICT r14
    # #2; see the module docstring's round-15 output contract) ---------
    line_obj: dict[str, object] = {
        "metric": "total_median_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": CPUS,
        "machine_factor_compute": round(mf_compute, 3),
        "normalized_total_sec": norm_total,
        "baseline_normalized_total_sec": round(base_norm_total, 3),
        "vs_baseline_normalized_total": round(
            norm_total / max(base_norm_total, 1e-9), 3
        ),
    }
    if sf1_block:
        line_obj["sf1_total_median_sec"] = sf1_block["total_median_sec"]
    detail_path = os.environ.get(
        "BENCH_DETAIL_PATH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
    )
    line_obj["detail_file"] = os.path.basename(detail_path)
    detail = dict(line_obj)
    detail.update(
        {
            "calibration_sec": probes["io"],
            "calibration_py_sec": probes["py"],
            "calibration_cpu_sec": probes["cpu"],
            "calibration_sched_sec": probes["sched"],
            "calibration_probes_start": probes_start,
            "calibration_probes_end": probes_end,
            "calibration_ref_sec": CALIBRATION_REF_SEC,
            # legacy io-axis factor (>1 = slower io than session-1)
            "machine_factor": machine_factor,
            # per-query sec / axis factor (comparable across boxes)
            "normalized_queries": normalized,
            # normalized-vs-normalized per-query ratio against the
            # BASELINE.md row (raw — diagnostic since round 13)
            "vs_baseline_normalized": ratios,
            # round-13 gate dict: sub-floor rows (absolute median
            # < 3x sched probe) grade floor-subtracted, everything
            # else raw.  THE 2x GATE READS THIS, not the raw dict.
            "vs_baseline_gated": gated,
            # round-14 diagnostic (ADVICE r13): the both-sides
            # floor-subtracted ratio — recorded for cross-round
            # history, NOT the breach gate (measured to flap ~2.4x
            # on 0.2 s box noise over 0.16 s baselines; see the
            # disposition comment above)
            "vs_baseline_gated_strict": gated_strict,
            "sched_adjusted_queries": sched_adjusted,
            "calibration_sched_ref_sec": CALIBRATION_SCHED_REF_SEC,
        }
    )
    if sf1_block:
        detail["sf1"] = sf1_block
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=False)
    print("# detail: " + json.dumps(detail, separators=(",", ":")),
          file=sys.stderr)
    line = json.dumps(line_obj, separators=(",", ":"))
    # The driver's tail buffer holds 2000 chars (BENCH_r13's line
    # outgrew it and the round-over-round record silently vanished);
    # fail loudly here LONG before that can happen again.
    assert len(line) < 1900, (
        f"stdout line {len(line)} chars — move fields to the sidecar"
    )
    print(line)


if __name__ == "__main__":
    main()
