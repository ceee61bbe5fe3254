#!/usr/bin/env python
"""One-shot wall-time sweep over the whole registry at a given SF.

Times ONE noop-forced run per query (after one warm-up) so the slow
tail of the 412-query registry is visible — the headline bench only
covers 29.  Diagnostic only; absolute numbers are single-sample and
load-sensitive, but a 10x outlier is a 10x outlier regardless.

    python tools/sweep_times.py /root/testdata/sf0.1 [out.json] [name...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_times.json"
    only = set(sys.argv[3:])

    from hadoop_fixedlengthinputformat_spark.tables import get_session
    from hadoop_fixedlengthinputformat_spark import registry

    registry.load_all()
    spark = get_session("flif-sweep", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    names = [n for n in registry.QUERIES if not only or n in only]
    for i, name in enumerate(names):
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            errs[name] = f"{type(e).__name__}: {e}"[:300]
        if (i + 1) % 25 == 0:
            print(f"# {i+1}/{len(names)}", file=sys.stderr)
            with open(out, "w") as f:
                json.dump({"times": times, "errs": errs}, f)
    with open(out, "w") as f:
        json.dump({"times": times, "errs": errs}, f, indent=1)
    for n, t in sorted(times.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{n:40s} {t:8.3f}")
    if errs:
        print("ERRORS:", list(errs))


if __name__ == "__main__":
    main()
