#!/usr/bin/env python
"""Soak registered DuckDB oracles at a large scale factor (VERDICT r10 #5).

DuckDB 1.0 re-inlines CTEs per reference, so an oracle can be green and
instant at sf0.01 yet hang for minutes at sf1 (graph_kcore_peel, round
10).  The driver only ever runs oracles at sf0.01 — this tool is how a
round proves its oracles would also survive a 100x input, family by
family, BEFORE a vintage re-enters the grading window.

    python tools/soak_oracles.py /tmp/sf1 tpch_q2_min_cost_supplier,...
    python tools/soak_oracles.py /tmp/sf1 --prefix tpch_,subq_,set_

Each oracle runs in a fresh subprocess with a wall timeout (default
180 s, $ORACLE_SOAK_TIMEOUT); a timeout prints TIMEOUT instead of
hanging the soak.  Output: one JSON line {name: {sec, rows}|TIMEOUT}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMEOUT = int(os.environ.get("ORACLE_SOAK_TIMEOUT", "180"))

# Documented-heavy oracles (VERDICT r11 #8, machine-readable since
# r13 per VERDICT r12 #4): per-name (wall cap, rationale) for oracles
# whose sf1 cost is measured, understood, and inherent — so a future
# densified roll cannot flip them into false-positive timeouts, and a
# roll that DOES cross a cap fails with the rationale attached to the
# output rather than buried in NOTES.md prose.  Caps apply only when
# they EXCEED the global timeout (an operator regression must still
# fail the soak).  Rule: no UNDOCUMENTED oracle may exceed the 180 s
# global timeout at sf1 — measuring >180 s means either fixing the
# oracle or adding a row here with the measured figure.
HEAVY_CAPS: dict[str, tuple[int, str]] = {
    "llm_simhash": (400, (
        "5e5 x 60 bit-vote conditional sums over the (doc, token) "
        "occurrence table; md5 runs once per DISTINCT token (round-12 "
        "rewrite) but the vote aggregation is inherent.  Measured "
        "71.5-176 s at sf1 (fast/1.5x-slow box, plans/NOTES.md "
        "round-12)."
    )),
    "ts_ewma": (600, (
        "Inherently sequential per-user recurrence over 15 users x "
        "67k events at sf1: a DuckDB recursive CTE rebuilds its join "
        "hash table every level, so every bit-identical SQL "
        "formulation is levels x corpus (five formulations measured, "
        "plans/NOTES.md round-12; the best - 32-step unrolled chunks "
        "- is 281 s at sf1).  The Spark applyInPandas side is the "
        "linear path."
    )),
    "llm_minhash_jaccard_est": (400, (
        "LSH pair-scoring joins the signature table onto ~4M "
        "candidate pairs at sf1 (planted dup groups densify 100x "
        "there); measured ~130-151 s - inherent to scoring every "
        "candidate, and the pair count is roll-density dependent "
        "(plans/NOTES.md round-12)."
    )),
    "llm_minhash_containment": (400, (
        "Same LSH pair-scoring family as jaccard_est plus the exact "
        "set-size census; measured ~170 s at sf1 (plans/NOTES.md "
        "round-12)."
    )),
    "llm_winnowing": (300, (
        "Window-argmin fingerprint selection materializes the full "
        "per-doc k-gram hash table before the w-window MIN scan; "
        "measured 98.5 s at sf1 (plans/NOTES.md round-12 "
        "'llm_winnowing headroom') - the k-gram count scales with "
        "corpus bytes and a denser documents roll can roughly double "
        "it, hence 3x headroom."
    )),
}

_CHILD = r"""
import json, sys, time
import duckdb
sys.path.insert(0, %(repo)r)
from hadoop_fixedlengthinputformat_spark import registry
registry.load_all()
con = duckdb.connect()
# queries past ~5 s trigger DuckDB's tty progress bar, which writes to
# stdout and shreds the JSON result line
con.execute("SET enable_progress_bar = false")
sf = %(sf)r
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    p = f"{sf}/{t}.parquet"
    import os
    if os.path.exists(p):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
t0 = time.perf_counter()
rows = len(con.execute(registry.ORACLES[%(name)r]).fetchall())
print(json.dumps({"sec": round(time.perf_counter() - t0, 2),
                  "rows": rows}))
"""


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    sf_dir = sys.argv[1]
    if sf_dir.startswith("-"):
        raise SystemExit(f"sf_dir looks like an option: {sf_dir!r}")
    sys.path.insert(0, REPO)
    from hadoop_fixedlengthinputformat_spark import registry

    registry.load_all()
    if sys.argv[2] == "--prefix":
        prefixes = tuple(sys.argv[3].split(","))
        names = [n for n in registry.ORACLES if n.startswith(prefixes)]
    else:
        names = [n for n in sys.argv[2].split(",") if n]
        unknown = sorted(set(names) - set(registry.ORACLES))
        if unknown:
            raise SystemExit(f"unknown oracle name(s): {', '.join(unknown)}")
    out: dict = {"family": "oracles", "sf_dir": sf_dir, "timeout_s": TIMEOUT}
    for name in names:
        child = _CHILD % {"repo": REPO, "sf": sf_dir, "name": name}
        heavy_cap, rationale = HEAVY_CAPS.get(name, (0, None))
        cap = max(TIMEOUT, heavy_cap)
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, "-c", child],
                capture_output=True,
                text=True,
                timeout=cap,
            )
        except subprocess.TimeoutExpired:
            # a documented-heavy oracle that STILL crosses its cap
            # fails with the measured-cost rationale attached, so the
            # soak log itself says whether this is a denser-roll cost
            # scale-up or a genuine oracle regression
            out[name] = (
                {"TIMEOUT": cap, "documented_rationale": rationale}
                if rationale
                else "TIMEOUT"
            )
            print(f"# {name}: TIMEOUT >{cap}s", file=sys.stderr)
            if rationale:
                print(f"#   documented-heavy: {rationale}", file=sys.stderr)
            continue
        if r.returncode != 0:
            out[name] = f"ERROR: {r.stderr.strip()[-300:]}"
            print(f"# {name}: ERROR", file=sys.stderr)
            continue
        # scan backwards for the result line: a stray library print to
        # stdout must not abort the whole soak
        parsed = None
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                parsed = json.loads(line)
                break
            except ValueError:
                continue
        if parsed is None:
            out[name] = f"BAD_OUTPUT: {r.stdout.strip()[-200:]}"
            print(f"# {name}: BAD_OUTPUT", file=sys.stderr)
            continue
        out[name] = parsed
        print(
            f"# {name}: {out[name]['sec']}s "
            f"(wall {round(time.perf_counter() - t0, 1)}s)",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
