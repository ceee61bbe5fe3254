"""Runs the driver's Spark-vs-DuckDB comparison locally for every declared
query (sf0.001 for speed; tests/parity.py standalone covers sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests import parity

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()
SLOW = {  # streaming queries spin up real micro-batch runs — marked slow,
    # run with `pytest -m slow` (they stay covered by tests/parity.py too)
    "stream_sliding_window",
    "stream_session_window",
    "stream_watermark_late_drop",
    "stream_fixedlen_tail",
}


@pytest.fixture(scope="module")
def con(sf_dir):
    return parity.duck_con(sf_dir)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "sum_qty" in df.columns


def _check_parity(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        problems = parity.compare(name, df, ORACLES[name], con)
        assert not problems, "; ".join(problems)
    else:
        assert df.count() >= 0  # rows-only: runs and has a stable schema


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n not in SLOW))
def test_query_parity(spark, sf_dir, con, name):
    _check_parity(spark, sf_dir, con, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(SLOW))
def test_query_parity_slow(spark, sf_dir, con, name):
    _check_parity(spark, sf_dir, con, name)


def test_approx_distinct_tolerance(spark, sf_dir, con):
    """Boolean-gate shape (r7): exact counts match DuckDB and the
    Spark-computed 5% gates hold (the raw-sketch accuracy the gate
    encodes)."""
    row = QUERIES["agg_approx_distinct"](spark, sf_dir).collect()[0]
    exact_parts, exact_orders = con.execute(
        "SELECT count(DISTINCT l_partkey), count(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()
    assert row.exact_parts == exact_parts
    assert row.exact_orders == exact_orders
    assert row.parts_within_5pct and row.orders_within_5pct


def test_hll_mergeable_tolerance(spark, sf_dir, con):
    """Boolean-gate shape (r7): per-nation and unioned-global rows
    carry exact distincts (vs DuckDB) and green accuracy gates; the
    global -1 row proves the sketch UNION covers the whole table."""
    rows = QUERIES["agg_hll_mergeable"](spark, sf_dir).collect()
    exact = dict(
        con.execute(
            "SELECT c_nationkey, count(DISTINCT c_custkey) FROM customer"
            " GROUP BY c_nationkey"
        ).fetchall()
    )
    total = con.execute(
        "SELECT count(DISTINCT c_custkey) FROM customer"
    ).fetchone()[0]
    saw_global = False
    for r in rows:
        assert r.est_within_5pct, r
        if r.c_nationkey == -1:
            saw_global = True
            assert r.exact_distinct == total
        else:
            assert r.exact_distinct == exact[r.c_nationkey]
    assert saw_global


def test_approx_percentile_tolerance(spark, sf_dir, con):
    """agg_approx_percentile now has an exact oracle (accuracy 1e7
    degenerates GK to exact at test scale); keep the tolerance bound as
    the 100 TB-semantics check a lower accuracy must still satisfy."""
    rows = {
        r.l_returnflag: r
        for r in QUERIES["agg_approx_percentile"](spark, sf_dir).collect()
    }
    for flag, p50, p90 in con.execute(
        """SELECT l_returnflag, quantile_cont(l_quantity, 0.5),
                  quantile_cont(l_extendedprice, 0.9)
           FROM lineitem GROUP BY l_returnflag"""
    ).fetchall():
        assert abs(rows[flag].ap50 - p50) <= 0.02 * p50 + 1
        assert abs(rows[flag].ap90 - p90) <= 0.02 * p90 + 1


def test_bucketed_join_no_shuffle(spark, sf_dir):
    """join_bucketed must read pre-bucketed tables and join with ZERO
    Exchange nodes (no shuffle, no broadcast) — the co-located join is
    the point of the operator."""
    plan = (
        QUERIES["join_bucketed"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_partitioned_sink_prunes_partitions(spark, sf_dir):
    """The o_orderstatus='F' filter must appear as a PartitionFilter on
    the partitioned-parquet scan (directory pruning, not data filtering)."""
    plan = (
        QUERIES["sink_parquet_partitioned"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan[:2000]
