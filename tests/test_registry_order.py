"""The driver grades the FIRST 50 registered queries each round; the
window is an explicit artifact (registry.GRADE_ORDER).  Pin its
composition so an accidental import reshuffle can't silently waste a
grading round, and gate the SURVEY §2.3 table against the registry so
the two can never drift (VERDICT r6 #4: agg_moments was registered and
graded green but missing from the table)."""

from __future__ import annotations

import json
import os
import re

from hadoop_fixedlengthinputformat_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_grade_order_applied_and_complete():
    registry.load_all()
    names = list(registry.QUERIES)
    assert len(names) == len(set(names))
    assert names[: len(registry.GRADE_ORDER)] == list(registry.GRADE_ORDER)


def test_round8_window_composition():
    registry.load_all()
    window = list(registry.QUERIES)[:50]
    # the 54-name never-graded backlog heads the order (VERDICT r7 #1);
    # r7's fully-green window dropped out of GRADE_ORDER entirely
    assert window[:2] == ["agg_mannwhitney", "agg_ks_test"]
    assert window[49] == "mm_image_resize"
    # positions 51-54 = the r9 window head (VERDICT r7 #4): the only
    # queries left with no driver grade after this round
    assert list(registry.QUERIES)[50:54] == [
        "llm_repeated_ngrams",
        "agg_count_min",
        "stream_approx_distinct",
        "scan_fixedlen_julian",
    ]
    # every window query has a full SQL oracle (strongest driver signal)
    missing = [n for n in window if n not in registry.ORACLES]
    assert not missing, f"window queries without oracle: {missing}"


def test_no_query_is_oracle_less():
    """Since r7 EVERY registered query must carry a DuckDB oracle — the
    driver has no rows-only mode (a no_oracle row burns a grading slot
    and scores red, proven by agg_approx_distinct r1)."""
    registry.load_all()
    missing = [n for n in registry.QUERIES if n not in registry.ORACLES]
    assert not missing, f"oracle-less queries: {missing}"


def test_window_regrades_only_known_reds():
    """No slot in the 50-query window may re-grade an already-green
    query (each round's window should carry maximum fresh signal).
    Derived from the committed CORRECTNESS_r*.json artifacts rather
    than a hand-kept list."""
    registry.load_all()
    window = list(registry.QUERIES)[:50]
    graded: dict[str, bool] = {}
    for fname in sorted(os.listdir(REPO)):
        if not re.fullmatch(r"CORRECTNESS_r\d+\.json", fname):
            continue
        with open(os.path.join(REPO, fname)) as f:
            for name, v in json.load(f).items():
                ok = (
                    v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match") in (True, None)
                    and not v.get("err")
                )
                graded[name] = bool(ok)
    wasted = [n for n in window if graded.get(n) is True]
    assert not wasted, f"window wastes slots on greens: {wasted}"


def test_grade_order_names_all_registered():
    registry.load_all()
    unknown = [n for n in registry.GRADE_ORDER if n not in registry.QUERIES]
    assert not unknown


def test_survey_table_covers_registry():
    """Every registered query name must appear in SURVEY.md §2.3 as a
    backticked table token (combined rows like ```a` / `b``` count for
    both names), and the table must not name queries that don't exist."""
    registry.load_all()
    with open(os.path.join(REPO, "SURVEY.md")) as f:
        survey = f.read()
    # §2.3 spans from its heading to the next ### heading
    start = survey.index("### 2.3")
    m = re.search(r"\n### (?!2\.3)", survey[start + 1 :])
    section = survey[start : start + 1 + m.start()] if m else survey[start:]
    table_tokens = set(re.findall(r"`([a-z0-9_]+)`", section))
    missing = sorted(n for n in registry.QUERIES if n not in table_tokens)
    assert not missing, f"registry queries missing from SURVEY §2.3: {missing}"
