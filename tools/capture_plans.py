#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries + a structural audit.

    python tools/capture_plans.py <sf_dir> <out_dir> [name...]

Writes <out_dir>/<name>.txt per query and prints a one-line-per-query
structural summary (Exchange / BroadcastExchange / SortMergeJoin /
BatchEvalPython / scan counts) to stdout, plus <out_dir>/_audit.json.
Explain-only — nothing executes except what building the DataFrame
itself runs (driver-loop ops, streaming fixtures).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODES = (
    "Exchange",
    "BroadcastExchange",
    "ReusedExchange",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "Window",
    "Scan parquet",
    "BatchScan",
    "Generate",
    "Sort",
)


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(txt: str) -> dict[str, int]:
    out = {}
    for node in NODES:
        # count operator-list entries like "(3) Exchange" / "(7) Scan parquet"
        pat = re.compile(r"^\(\d+\)\s+" + re.escape(node) + r"\b", re.M)
        n = len(pat.findall(txt))
        if node == "Exchange":
            # plain Exchange lines only (Broadcast/Reused counted separately)
            n = len(re.findall(r"^\(\d+\)\s+Exchange\b", txt, re.M))
        if n:
            out[node] = n
    return out


def main() -> None:
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2]
    only = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from hadoop_fixedlengthinputformat_spark.tables import get_session
    from hadoop_fixedlengthinputformat_spark import registry

    registry.load_all()
    spark = get_session("flif-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    names = only or list(registry.QUERIES)
    summary: dict[str, dict] = {}
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            txt = plan_text(df)
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(txt)
            summary[name] = audit(txt)
        except Exception as e:  # noqa: BLE001
            summary[name] = {"ERROR": f"{type(e).__name__}: {e}"[:200]}
        print(name, json.dumps(summary[name]), flush=True)
    with open(os.path.join(out_dir, "_audit.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
