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


def test_round4_window_composition():
    registry.load_all()
    window = list(registry.QUERIES)[:50]
    # the three red/stale re-grades come first (VERDICT r3 order #1)
    assert window[:3] == [
        "proj_compute",
        "llm_seq_packing",
        "tpch_q12_priority_shipping",
    ]
    # the bisection diagnostics sit directly behind them
    diags = [n for n in window[:9] if n.startswith("diag_")]
    assert len(diags) == 5
    assert "llm_token_count" in window[:9]
    # every window query has a full SQL oracle (strongest driver signal);
    # rows-only ops are deliberately kept out of the graded window
    missing = [n for n in window if n not in registry.ORACLES]
    assert not missing, f"window queries without oracle: {missing}"


def test_grade_order_names_all_registered():
    registry.load_all()
    unknown = [n for n in registry.GRADE_ORDER if n not in registry.QUERIES]
    assert not unknown
