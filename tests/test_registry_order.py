"""The driver grades the FIRST 50 registered queries each round; the
window is an explicit artifact (registry.GRADE_ORDER).  Pin its
round-3 composition so an accidental import reshuffle can't silently
waste a grading round."""

from __future__ import annotations

from hadoop_fixedlengthinputformat_spark import registry


def test_grade_order_applied_and_complete():
    registry.load_all()
    names = list(registry.QUERIES)
    assert len(names) == len(set(names))
    assert names[: len(registry.GRADE_ORDER)] == list(registry.GRADE_ORDER)


def test_round3_window_composition():
    registry.load_all()
    window = list(registry.QUERIES)[:50]
    # re-graded fixes come first
    assert window[:3] == ["fn_math", "fn_epoch", "llm_seq_packing"]
    # the reference-soul source family is all inside the window
    source_family = [n for n in window if "fixedlen" in n]
    assert len(source_family) >= 19
    # every window query has a full SQL oracle (strongest driver signal);
    # rows-only ops are deliberately kept out of the graded window
    missing = [n for n in window if n not in registry.ORACLES]
    assert not missing, f"window queries without oracle: {missing}"


def test_grade_order_names_all_registered():
    registry.load_all()
    unknown = [n for n in registry.GRADE_ORDER if n not in registry.QUERIES]
    assert not unknown
