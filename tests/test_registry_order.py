"""The driver grades the FIRST 50 registered queries each round; the
window is an explicit artifact (registry.GRADE_ORDER).  Pin its
round-4 composition so an accidental import reshuffle can't silently
waste a grading round."""

from __future__ import annotations

from hadoop_fixedlengthinputformat_spark import registry


def test_grade_order_applied_and_complete():
    registry.load_all()
    names = list(registry.QUERIES)
    assert len(names) == len(set(names))
    assert names[: len(registry.GRADE_ORDER)] == list(registry.GRADE_ORDER)


def test_round5_window_composition():
    registry.load_all()
    window = list(registry.QUERIES)[:50]
    # the six HUGEINT-class re-grades come first (VERDICT r4 #1)
    assert window[:6] == [
        "tpch_q12_priority_shipping",
        "diag_q12_join_only",
        "llm_seq_packing",
        "ts_sessionize",
        "ts_rollup_chain",
        "llm_domain_stats",
    ]
    # then the four queued names the same audit pre-empted
    assert window[6:10] == [
        "dq_audit",
        "llm_shard_assign",
        "llm_dataset_card",
        "llm_simhash",
    ]
    # first streaming grades close the window (VERDICT r4 #5)
    assert window[46:50] == [
        "stream_tumbling_window",
        "stream_stateful_count",
        "stream_dedup",
        "stream_static_join",
    ]
    # every window query has a full SQL oracle (strongest driver signal);
    # rows-only ops are deliberately kept out of the graded window
    missing = [n for n in window if n not in registry.ORACLES]
    assert not missing, f"window queries without oracle: {missing}"
    # no slot re-grades an already-green query (50 fresh signals)
    greens = {
        "proj_compute", "diag_documents_identity", "llm_token_count",
        "scan_parquet", "fn_string", "fn_date", "fn_conditional",
    }
    wasted = [n for n in window if n in greens]
    assert not wasted, f"window wastes slots on greens: {wasted}"


def test_grade_order_names_all_registered():
    registry.load_all()
    unknown = [n for n in registry.GRADE_ORDER if n not in registry.QUERIES]
    assert not unknown
