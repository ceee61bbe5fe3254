"""llm_shard_assign: every shard used, counts reconcile, load balanced."""

from __future__ import annotations


def test_shard_assignment_is_balanced(spark):
    from hadoop_fixedlengthinputformat_spark.functions.quality_extras import (
        llm_shard_assign,
    )

    rows = llm_shard_assign(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 16  # every shard receives docs
    assert sum(r.n_docs for r in rows) == 500
    loads = [r.sum_chars for r in rows]
    assert max(loads) / min(loads) < 1.5  # hash balance at 500 docs
