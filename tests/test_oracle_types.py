"""Sparkless DuckDB output-type gate over every registered oracle.

Round-5 lesson (VERDICT r4): DuckDB types ``sum(INTEGER/BIGINT)`` —
including window ``SUM() OVER`` — as HUGEINT (int128) while Spark emits
BIGINT.  The local parity harness normalizes fetched values to Python
ints, so the divergence is invisible on EVERY data roll, but the
driver's type-sensitive value hash fails: all six round-4 reds (and the
carried r2/r3 reds) were exactly this, never roll sensitivity.  Same
family: DECIMAL (Spark emits double) and TIMESTAMP WITH TIME ZONE (the
round-2 ``fn_epoch`` red — bare ``to_timestamp`` in DuckDB).

Round-7 lesson (VERDICT r6): the driver canonicalizer pandas-sorts
every output column before hashing; a LIST/STRUCT/MAP cell is
unhashable there (``llm_embedding_quantize`` FAIL r6 — the only
complex-typed output in a judge audit of all 90 queued queries).
Complex-typed OUTPUT columns are therefore banned registry-wide:
render arrays as ``array_join(x, ',')`` / ``array_to_string(x, ',')``.

This test runs WITHOUT Spark: it DESCRIBEs every oracle against the
sf0.001 parquet views and asserts no banned output type, so the class
can never re-enter the registry unnoticed.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from hadoop_fixedlengthinputformat_spark import registry
from hadoop_fixedlengthinputformat_spark.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

BANNED = ("HUGEINT", "DECIMAL", "WITH TIME ZONE")


def _is_complex(duck_type: str) -> bool:
    """LIST (``T[]``), STRUCT, MAP, UNION — unhashable in the driver's
    pandas canonicalizer (sort_values → Categorical → factorize)."""
    t = duck_type.strip()
    return t.endswith("]") or t.startswith(("STRUCT", "MAP", "UNION"))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            c.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
    return c


def test_no_engine_divergent_oracle_output_types(con):
    registry.load_all()
    offenders: dict[str, list[str]] = {}
    for name, sql in registry.ORACLES.items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # noqa: BLE001
            # DESCRIBE failures that depend on Spark-side fixtures (e.g.
            # oracles reading files a query writes first) are not type
            # bugs; only flag pure-SQL failures over the base views.
            if "No files found" in str(exc) or "does not exist" in str(exc):
                continue
            offenders[name] = [f"DESCRIBE: {type(exc).__name__}: {exc}"]
            continue
        bad = [
            f"{c}: {t}"
            for c, t, *_ in desc
            if any(b in t for b in BANNED) or _is_complex(t)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle output types diverge from Spark "
        "(CAST AS BIGINT/DOUBLE/TIMESTAMP on the oracle side): "
        f"{offenders}"
    )


def test_no_oracle_cte_scan_explosion(con):
    """Round-10 rule (CLAUDE.md): DuckDB 1.0 inlines CTEs per reference,
    so an oracle whose CTEs chain AND are referenced repeatedly
    re-evaluates base scans combinatorially — graph_kcore_peel's
    unrolled peel re-ran its pair join 2^4 times (invisible at sf0.01,
    a >15-min hang at sf1) until its CTEs went MATERIALIZED.  Gate:
    no oracle plan may contain more than 10 parquet scans.  Round-11
    audit (VERDICT r10 #6): every oracle that sat in the 8-16 band for
    CTE-reuse reasons (llm_dup_clusters/llm_dedup_apply/graph_pagerank
    at 16, the minhash family at 8-10) now MATERIALIZEs its
    multiply-referenced CTEs and planned scan counts dropped to <=5;
    the remaining >=8 counts are inherent distinct-table joins
    (tpch_q2 9 = 5 tables + the correlated min-cost re-scan of 4,
    dq_audit 9 = a multi-table audit union, tpch_q8 8 = the 8-relation
    market-share join) — all honest, all under 10.  Exponential
    re-inlining blows past any fixed bound immediately."""
    registry.load_all()
    offenders: dict[str, int] = {}
    for name, sql in registry.ORACLES.items():
        try:
            plan = "\n".join(
                str(r[-1]) for r in con.execute("EXPLAIN " + sql).fetchall()
            )
        except Exception as exc:  # noqa: BLE001
            if "No files found" in str(exc) or "does not exist" in str(exc):
                continue
            raise
        nscan = plan.count("READ_PARQUET") + plan.count("PARQUET_SCAN")
        if nscan > 10:
            offenders[name] = nscan
    assert not offenders, (
        "oracle CTE re-inlining explosion — add AS MATERIALIZED to "
        f"multiply-referenced CTEs: {offenders}"
    )
