"""Instrumented scan — ``DataFrame.observe`` metrics (SURVEY.md §2.1 R8).

The reference exposes read progress via ``getProgress`` and Hadoop
counters (FixedLengthRecordReader.java:206-213); Spark's task metrics
already subsume that, and ``observe()`` adds the engine-level analogue a
pipeline actually wants: named aggregates accumulated DURING a pass,
collected for free when the action finishes — no second scan, no
driver-side recount.  ``tests/test_observe.py`` asserts the collected
metrics equal the oracle-checked result of a separate aggregation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession

from hadoop_fixedlengthinputformat_spark.registry import query
from hadoop_fixedlengthinputformat_spark.sources.scan_queries import read_fixed

# the most recent observation per session, keyed by id(spark) — lets the
# test fetch metrics after the driver/test harness runs its action
_LAST_OBSERVATION: dict[int, Observation] = {}


@query(
    "scan_fixedlen_observed",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE n_regionkey <> 2
    """,
)
def scan_fixedlen_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width scan with in-flight metrics: row count, distinct-ish
    key sum, and filtered-row accounting ride the SAME pass that serves
    the query (zero extra jobs at any scale — the metric aggregation is
    a map-side accumulator merged on the driver)."""
    obs = Observation("fixedlen_scan")
    df = read_fixed(spark, sf_dir, "nation", includeOffset="false")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum("n_nationkey").alias("key_sum"),
        F.max("n_regionkey").alias("max_region"),
    )
    _LAST_OBSERVATION[id(spark)] = obs
    return observed.filter(F.col("n_regionkey") != 2)
