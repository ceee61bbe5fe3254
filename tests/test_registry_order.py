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


def test_round15_window_composition():
    registry.load_all()
    window = list(registry.QUERIES)[:50]
    # the 5 never-driver-graded r14 additions lead (VERDICT r14 #9)
    assert window[0] == "mm_audio_fingerprint"
    assert window[4] == "llm_vocab_coverage"
    # then the last 7 of the r6 tail, closing the r6 ladder
    assert window[5] == "llm_url_dedup"
    assert window[11] == "stream_static_join"
    # then the first 38 r7-vintage names (CORRECTNESS_r07.json key
    # order), led by llm_embedding_quantize, which skipped the r14
    # window for exactly this slot (stale: 15-7 >= 5)
    assert window[12] == "llm_embedding_quantize"
    assert window[49] == "agg_weighted_median"
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


def test_window_regrades_only_known_reds_or_stale_greens():
    """No slot in the 50-query window may re-grade a FRESH green (each
    round's window should carry maximum signal).  Valid slots: never
    graded, last grade red, or a STALE green — last graded >= 5 rounds
    behind the upcoming round (the VERDICT r8 #5 freshness policy:
    every op re-proves itself under the current determinism rules
    within ~4 windows).  Derived from the committed
    CORRECTNESS_r*.json artifacts rather than a hand-kept list.

    An artifact whose key set equals the CURRENT window is this
    window's own grade (the driver writes it mid-round, before the
    next rotation can exist) and does not count against the window —
    otherwise this test red-lights by design every time a window goes
    green, which burned a pytest-green bar in rounds 7 AND 8.  The
    alarm still fires whenever a NEWLY composed window wastes slots on
    fresh greens from previous windows."""
    registry.load_all()
    window = list(registry.QUERIES)[:50]
    graded: dict[str, bool] = {}
    last_round: dict[str, int] = {}
    max_round = 0
    for fname in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(os.path.join(REPO, fname)) as f:
            results = json.load(f)
        if set(results) == set(window):
            continue  # this window's own grade — not a rotation signal
        max_round = max(max_round, rnd)
        for name, v in results.items():
            ok = (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") in (True, None)
                and not v.get("err")
            )
            if last_round.get(name, -1) <= rnd:
                graded[name] = bool(ok)
                last_round[name] = rnd
    upcoming = max_round + 1
    wasted = [
        n
        for n in window
        if graded.get(n) is True and upcoming - last_round[n] < 5
    ]
    assert not wasted, f"window wastes slots on fresh greens: {wasted}"


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
