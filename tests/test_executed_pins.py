"""Executed-plan regression pins for the round-14 reworked queries.

VERDICT r14 #7: the round-14 optimizations (single-scan gap_fill /
interpolate, stack() unpivots, shared dq joins, checkpointed census
tables) were verified against FINAL ADAPTIVE plans, but only
ts_gap_fill / dq_referential had structural pytest pins — a future
edit could silently reintroduce a duplicate scan (exactly how
ts_gap_fill's "two exchanges" docstring rotted pre-r14) or the
quadratic UNBOUNDED-FOLLOWING window frame ts_interpolate shipped
with, and only a judge re-audit would notice.

This file turns tools/executed_audit.py's method into tests: run each
reworked query to completion at sf0.001 (tiny — collect() is safe
here), strip the Initial Plan section, and pin

  * a CEILING on parquet scans in the final adaptive plan (the count
    the r14 rework achieved, plans/r14/_executed_after.json — scans
    hidden inside localCheckpoint builds do not appear here, so the
    visible count is exactly the "did someone fork the subtree again"
    signal; ceilings, not equalities, so a FURTHER improvement never
    fails), and
  * for the window-rework queries, that no window frame runs to
    UNBOUNDED FOLLOWING from a non-initial lower bound — the O(rows x
    run-length) per-row re-scan shape r14 removed.  (UNBOUNDED
    PRECEDING .. UNBOUNDED FOLLOWING stays legal: Spark evaluates the
    whole-partition frame once per partition, not per row.)
"""

from __future__ import annotations

import re

import pytest

SF = "/root/testdata/sf0.001"

# query -> max "Scan parquet" nodes allowed in the FINAL adaptive plan
# (values = the counts the r14 rework landed at sf0.01,
# plans/r14/_executed_after.json; ExistingRDD scans — checkpoint reads —
# are not pinned, their count is a formulation detail).
SCAN_CEILINGS = {
    "ts_interpolate": 0,   # events scanned only inside the hourly ck build
    "ts_gap_fill": 0,      # same
    "dq_referential": 6,   # one per table role (was 12)
    "dq_audit": 6,         # dup+null share one orders agg (was 9)
    "dq_null_profile": 2,  # one stack() unpivot per audited table (was 9)
    "llm_vocab_coverage": 0,  # census ck + one stack(3) row (was 6 planned)
    "llm_pmi_bigrams": 0,  # both censuses checkpointed (was 3 visible)
    "llm_line_dedup": 1,   # digest ck + the rebuild pass (was 2 + re-canon)
    "llm_ngram_jaccard": 0,  # toks/docs checkpointed (was 4)
    "llm_minhash_jaccard_est": 0,  # signature census checkpointed (was 4)
    "agg_count_min": 3,    # sketch ck + parity cells + exact top-10 (was 14)
}

# Frames like (CURRENT ROW .. UNBOUNDED FOLLOWING): Spark's
# UnboundedFollowingWindowFunctionFrame re-scans the partition
# remainder per row — quadratic on sparse runs (the ts_interpolate r14
# bug, 17.5 -> 2.4 s at sf0.1).  Full-partition frames (unboundedpreceding,
# unboundedfollowing) are fine: evaluated once per partition.
_QUADRATIC_FRAME = re.compile(
    r"specifiedwindowframe\((?:Row|Range)Frame,\s*(?!unboundedpreceding)"
    r"[^,)]*,\s*unboundedfollowing",
    re.IGNORECASE,
)


def _final_plan(spark, name: str) -> str:
    from hadoop_fixedlengthinputformat_spark import registry

    registry.load_all()
    df = registry.QUERIES[name](spark, SF)
    df.collect()  # finalize the adaptive plan on the DF's own QE
    return (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )


def _parquet_scans(plan: str) -> int:
    return plan.count("Scan parquet")


@pytest.mark.parametrize("name", sorted(SCAN_CEILINGS))
def test_executed_scan_ceiling(spark, name):
    plan = _final_plan(spark, name)
    n = _parquet_scans(plan)
    assert n <= SCAN_CEILINGS[name], (
        f"{name}: {n} parquet scans in the final adaptive plan, ceiling "
        f"{SCAN_CEILINGS[name]} — a shared subtree was probably forked "
        f"(see plans/r14 and OPTIMIZATION_r14.md)\n{plan}"
    )


@pytest.mark.parametrize(
    "name",
    [
        "ts_interpolate",
        "ts_gap_fill",
        # round-15: the asof family shipped the same quadratic frame
        # (join_asof_forward crawled minutes at sf1's 1M events) —
        # fixed with the mirrored-sort running frame, pinned here
        "join_asof",
        "join_asof_forward",
        "join_asof_nearest",
    ],
)
def test_no_quadratic_window_frame(spark, name):
    plan = _final_plan(spark, name)
    m = _QUADRATIC_FRAME.search(plan)
    assert m is None, (
        f"{name}: window frame runs to UNBOUNDED FOLLOWING from a "
        f"non-initial bound — per-row partition re-scan, the quadratic "
        f"shape r14 removed ({m.group(0)!r})\n{plan}"
    )
