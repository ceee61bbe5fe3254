#!/usr/bin/env python
"""Executed-plan audit: run each query to completion (noop sink), then
count nodes in the FINAL adaptive plan — ReusedExchange and AQE
conversions included, unlike explain-before-execution.

    python tools/executed_audit.py <repo_root> <sf_dir> <out.json> <name...>
"""

from __future__ import annotations

import json
import re
import sys

ROOT = sys.argv[1]
sys.path.insert(0, ROOT)

NODES = (
    "Scan parquet",
    "Scan ExistingRDD",
    "Exchange",
    "ReusedExchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "Window",
    "Sort",
)


def count(plan: str) -> dict[str, int]:
    out = {}
    for n in NODES:
        if n == "Exchange":
            c = len(re.findall(r"(?<![a-zA-Z])Exchange (?:hash|range|Single|round)", plan))
        elif n == "Sort":
            c = len(re.findall(r"(?<![a-zA-Z])Sort \[", plan))
        elif n == "Window":
            c = len(re.findall(r"(?<![a-zA-Z])Window \[|RunningWindowFunction", plan))
        else:
            c = plan.count(n)
        if c:
            out[n] = c
    return out


def main() -> None:
    sf_dir, out_path = sys.argv[2], sys.argv[3]
    names = sys.argv[4:]

    # ADVICE r14: collect() below pulls each query's FULL result set to
    # the driver (the only way to finalize the adaptive plan on the
    # DF's own QueryExecution — a noop write executes a separate QE, a
    # limit changes the plan).  That is safe only on the small
    # correctness fixtures; wide-output registry queries at sf0.1+ risk
    # driver OOM in a diagnostic that only needs the plan.  Guard:
    # refuse big SF dirs unless explicitly forced.
    if "--force-big-sf" in names:
        names.remove("--force-big-sf")
    elif not re.search(r"sf0\.0\d+/?$", sf_dir):
        sys.exit(
            f"executed_audit is an sf0.001/sf0.01-only diagnostic "
            f"(collect() materializes full results on the driver); got "
            f"{sf_dir!r} — pass --force-big-sf to override"
        )

    from hadoop_fixedlengthinputformat_spark.tables import get_session
    from hadoop_fixedlengthinputformat_spark import registry

    registry.load_all()
    spark = get_session("flif-exec-audit", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    res = {}
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        df.collect()  # execute through the DF's own QueryExecution so
        # executedPlan() is the FINAL adaptive plan (the plan-pin tests'
        # pattern); a noop write would execute a separate QE
        plan = (
            df._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]  # final adaptive plan only
        )
        res[name] = count(plan)
        print(name, json.dumps(res[name]), flush=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
