"""Repo-wide static gate for the round-10 forced-broadcast rule
(plans/NOTES.md "Round-10: forced-broadcast hint policy"): every
``F.broadcast(`` call site in the engine package must appear in the
allowlist below, classified by WHY the broadcast side is provably
capped by construction.  A new call site fails this test until its
boundedness argument is written down here — tables that grow with ANY
corpus property (SF, user/vocabulary cardinality, batch size) must be
left unhinted so AQE can degrade to a shuffle join instead of an OOM.

Categories:
  1row      — subtree roots at a global one-row aggregate (scalar
              thresholds, totals)
  dim       — bounded dimension (nation 25 / region 5 rows at ANY SF)
  attrdom   — attribute-domain-bounded (|return flags| = 3,
              |line statuses| = 2, |langs|, |event types| — column
              semantics, not corpus size)
  fixed     — fixed-size artifact by construction (k centroids, 256
              buckets, 2^18-bit bloom words, m·2^nbits ADC cells,
              32,768-cap vocab, probe sets, shuffle-partition offsets,
              eval shingle set of a fixed benchmark slice)
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hadoop_fixedlengthinputformat_spark",
)

# (file relative to package, first-argument token) -> category
ALLOWED: dict[tuple[str, str], str] = {
    ("streaming/stream_queries.py", "dim"): "dim",  # 25-row nation dim
    ("operators/windows.py", "offsets"): "fixed",  # |shuffle partitions| rows
    ("operators/windows.py", "total"): "1row",
    ("operators/aggregates.py", "r"): "dim",
    ("operators/stats_extras.py", "x"): "attrdom",  # |flags| marginals
    ("operators/stats_extras.py", "y"): "attrdom",  # |statuses| marginals
    ("operators/relational_extras.py", "stats"): "1row",
    ("operators/relational_extras.py", "g"): "1row",
    ("operators/analytics_extras.py", "probes"): "fixed",  # 20 probe rows
    ("operators/analytics_extras.py", "n_total"): "1row",
    ("operators/analytics_extras.py", "linear"): "1row",
    ("operators/tpch_suite.py", "n1"): "dim",
    ("operators/tpch_suite.py", "n2"): "dim",
    ("operators/tpch_suite.py", "n"): "dim",
    ("operators/tpch_suite.py", "r"): "dim",
    ("operators/tpch_suite.py", "best"): "1row",
    ("operators/tpch_suite.py", "thr"): "1row",
    ("operators/tpch_suite.py", "avg_bal"): "1row",
    ("operators/pivot_stats.py", "med"): "attrdom",  # |classes| medians
    ("operators/joins.py", "n"): "dim",
    ("operators/joins.py", "r"): "dim",
    ("operators/tpch_composites.py", "n"): "dim",
    ("operators/tpch_composites.py", "r"): "dim",
    ("sources/encoding_queries.py", "n"): "dim",
    ("functions/retrieval_queries.py", "stats"): "1row",  # BM25 N/avgdl
    ("functions/corpus_extras.py", "n_uni"): "1row",
    ("functions/corpus_extras.py", "n_bi"): "1row",
    ("functions/corpus_extras.py", "vocab"): "1row",
    ("functions/corpus_extras.py", "voc"): "1row",
    ("functions/corpus_extras.py", "w"): "fixed",  # 256 DSIR buckets
    ("functions/quality_extras.py", "cent"): "attrdom",  # |labels|x|pos|
    ("functions/llm_queries.py", "eval_sh"): "fixed",  # fixed eval slice
    ("functions/llm_queries.py", "dim"): "1row",
    ("functions/llm_queries.py", "rates"): "attrdom",  # |langs| rows
    ("functions/llm_queries.py", "n"): "1row",
    ("functions/curation_extras.py", "enc"): "fixed",  # 32,768-cap vocab
    ("functions/curation_extras.py", "bloom"): "fixed",  # 2^12 words
    ("functions/similarity.py", "p"): "fixed",  # probe set
    ("functions/similarity.py", "p_exp"): "fixed",  # probes x multiprobe
    ("functions/similarity.py", "centroids"): "fixed",  # k rows
    # round-12 additions
    ("operators/dq_suite.py", "med"): "1row",
    ("operators/dq_suite.py", "mad"): "1row",
    ("operators/inequality.py", "deciles"): "fixed",  # 10 rows
    ("operators/timeseries.py", "lags"): "fixed",  # 6 lag rows
    ("operators/analytics_extras.py", "ecnt"): "1row",
    ("operators/analytics_extras.py", "tcnt"): "1row",
    ("functions/similarity.py", "shortlist"): "fixed",  # probes x nprobe
    ("functions/similarity.py", "codebook"): "fixed",  # m x 2^nbits
    ("functions/similarity.py", "dtable"): "fixed",  # probes x m x 2^nbits
}

_CALL = re.compile(r"F\.broadcast\(\s*([A-Za-z_][A-Za-z0-9_]*)")


def _sites():
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG).replace(os.sep, "/")
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    for m in _CALL.finditer(line):
                        yield rel, i, m.group(1)


def test_every_broadcast_hint_is_classified_as_capped():
    unknown = [
        f"{rel}:{ln} F.broadcast({tok}...)"
        for rel, ln, tok in _sites()
        if (rel, tok) not in ALLOWED
    ]
    assert not unknown, (
        "unclassified forced-broadcast hint(s) — either remove the hint "
        "(corpus-growing tables must stay unhinted so AQE can degrade "
        "to a shuffle join) or add the (file, arg) pair to ALLOWED with "
        "a written boundedness category:\n" + "\n".join(unknown)
    )


def test_allowlist_has_no_dead_entries():
    live = {(rel, tok) for rel, _ln, tok in _sites()}
    dead = sorted(k for k in ALLOWED if k not in live)
    assert not dead, f"ALLOWED entries with no call site: {dead}"
