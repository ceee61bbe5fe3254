"""RECFM=FBA (ASA carriage control) scan/sink semantics."""

from __future__ import annotations

from hadoop_fixedlengthinputformat_spark.sources import fixture_gen
from hadoop_fixedlengthinputformat_spark.sources.asa_queries import (
    scan_fixedlen_asa,
    sink_fixedlen_asa,
)

# lines advanced before printing, per position-in-page (asa_cc cycle)
ADV = [1, 1, 1, 0, 1, 2, 1, 1, 3, 1]


def test_asa_cc_rule_cycle():
    assert [fixture_gen.asa_cc(i) for i in range(10)] == [
        "1", " ", " ", "+", " ", "0", " ", " ", "-", " ",
    ]
    # rule repeats every 10 records
    assert fixture_gen.asa_cc(1230) == "1"


def test_asa_scan_page_line_geometry(spark, sf_dir):
    """page_no / line_no must follow the print-carriage semantics
    exactly: page breaks every 10 records, '+' overprints (line does
    not advance), '0'/'-' skip lines."""
    rows = scan_fixedlen_asa(spark, sf_dir).orderBy("record_offset").collect()
    assert len(rows) > 0
    for rn, r in enumerate(rows):
        m = rn % 10
        assert r.record_offset == rn * fixture_gen.ASA_RL
        assert r.cc == fixture_gen.asa_cc(rn).rstrip()  # ' ' decodes to ''
        assert r.cc_advance == ADV[m]
        assert r.page_no == rn // 10 + 1
        assert r.line_no == sum(ADV[: m + 1])


def test_asa_sink_roundtrip(spark, sf_dir):
    """Writer renders the cc column as byte 0 of each record; re-reading
    through the FBA layout recovers both the control byte and the data
    fields."""
    rows = sink_fixedlen_asa(spark, sf_dir).orderBy("n_nationkey").collect()
    assert len(rows) > 0
    for rn, r in enumerate(rows):
        assert r.cc == fixture_gen.asa_cc(rn).rstrip()
        assert r.n_name == r.n_name.rstrip()


def test_vba_scan_geometry_and_tails(spark, sf_dir):
    """RECFM=VBA: control byte decodes from the record prefix, page/line
    geometry follows the print-carriage semantics, and the variable tail
    length round-trips."""
    from hadoop_fixedlengthinputformat_spark.sources.asa_queries import (
        scan_varlen_vba,
    )

    rows = scan_varlen_vba(spark, sf_dir).collect()
    assert len(rows) > 0
    pages = [r.page_no for r in rows]
    assert min(pages) == 1 and max(pages) == (len(rows) - 1) // 10 + 1
    # every page's line numbers follow the advance cycle
    by_page: dict[int, list] = {}
    for r in rows:
        by_page.setdefault(r.page_no, []).append(r)
    for recs in by_page.values():
        recs.sort(key=lambda r: r.line_no)
        assert recs[0].cc == "1" and recs[0].line_no == 1
        assert any(r.tail_bytes >= 0 for r in recs)
