"""scan_fixedlen_observed: the observe() metrics must describe the PRE-
filter scan (rows_seen = all records) while the returned DataFrame is
the post-filter result — proving the metrics ride the scan pass instead
of re-aggregating."""

from __future__ import annotations


def test_observe_metrics_ride_the_scan(spark):
    from hadoop_fixedlengthinputformat_spark.sources.observe_queries import (
        _LAST_OBSERVATION,
        scan_fixedlen_observed,
    )
    from hadoop_fixedlengthinputformat_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    df = scan_fixedlen_observed(spark, sf)
    returned = df.collect()

    obs = _LAST_OBSERVATION[id(spark)]
    metrics = obs.get

    nation = load_table(spark, sf, "nation")
    n_all = nation.count()
    key_sum = nation.groupBy().sum("n_nationkey").first()[0]
    n_filtered = nation.filter("n_regionkey <> 2").count()

    assert len(returned) == n_filtered
    assert metrics["rows_seen"] == n_all  # pre-filter: metrics on the scan
    assert metrics["key_sum"] == key_sum
    assert metrics["max_region"] == 4
