"""Z-order maintenance clustering: effect + plan tests.

The point of ``maintain_zorder`` is that after clustering on the Morton
interleave of (l_orderkey, l_partkey), every output file's min/max
envelope is tight in BOTH dimensions — so parquet footer stats prune
scans for predicates on EITHER column.  A single-key sort is tight in
one dimension and spans the full range in the other.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hadoop_fixedlengthinputformat_spark.operators.relational_extras import (
    _scale_spark,
    _z_spark,
)
from hadoop_fixedlengthinputformat_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
N_FILES = 8


def _with_zval(li):
    stats = li.agg(
        F.min("l_orderkey").alias("lo_ok"),
        F.max("l_orderkey").alias("hi_ok"),
        F.min("l_partkey").alias("lo_pk"),
        F.max("l_partkey").alias("hi_pk"),
    )
    return (
        li.crossJoin(F.broadcast(stats))
        .withColumn(
            "sa", F.expr(_scale_spark("l_orderkey", "lo_ok", "hi_ok"))
        )
        .withColumn(
            "sb", F.expr(_scale_spark("l_partkey", "lo_pk", "hi_pk"))
        )
        .withColumn("zval", F.expr(_z_spark("sa", "sb")))
        .select("l_orderkey", "l_partkey", "zval")
    )


def _file_spans(spark, path):
    """Per-file (orderkey span, partkey span) as fractions of the range."""
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("f"), "l_orderkey", "l_partkey"
    )
    spans = (
        df.groupBy("f")
        .agg(
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("ok_span"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("pk_span"),
        )
        .collect()
    )
    tot = df.agg(
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("ok"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("pk"),
    ).collect()[0]
    ok = [r.ok_span / tot.ok for r in spans]
    pk = [r.pk_span / tot.pk for r in spans]
    return sum(ok) / len(ok), sum(pk) / len(pk)


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    z = _with_zval(li)
    zpath = str(base / "z")
    (
        z.repartitionByRange(N_FILES, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(zpath)
    )
    lpath = str(base / "linear")
    (
        li.repartitionByRange(N_FILES, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    return zpath, lpath


def test_zorder_tightens_both_dimensions(spark, clustered):
    zpath, _ = clustered
    ok_frac, pk_frac = _file_spans(spark, zpath)
    # 8 range buckets over a 42-bit z split the high interleaved bits:
    # BOTH dimensions' envelopes must shrink well below the full range.
    assert ok_frac < 0.8, f"orderkey span fraction {ok_frac:.2f}"
    assert pk_frac < 0.8, f"partkey span fraction {pk_frac:.2f}"


def test_linear_sort_leaves_second_dimension_full(spark, clustered):
    zpath, lpath = clustered
    _, pk_linear = _file_spans(spark, lpath)
    _, pk_z = _file_spans(spark, zpath)
    # The single-key sort's files each span ~the whole partkey range;
    # z-order must beat it decisively on the second dimension.
    assert pk_linear > 0.9, f"expected near-full partkey span, got {pk_linear:.2f}"
    assert pk_z < pk_linear * 0.85


def test_zorder_interleave_stays_in_codegen(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    plan = _with_zval(li)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
