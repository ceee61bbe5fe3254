"""Property tests for the copybook translator: randomly generated
copybooks must produce layouts whose offsets tile exactly, whose spans
match the PICTURE arithmetic, and which always parse as valid engine
layouts (the translator may NEVER emit a silently-wrong offset)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from hadoop_fixedlengthinputformat_spark.sources.copybook import (
    copybook_to_layout,
)
from hadoop_fixedlengthinputformat_spark.sources.layout import parse_layout

_PIC_GEN = st.sampled_from([
    ("PIC X({n})", "string", lambda n, m: n),
    ("PIC A({n})", "string", lambda n, m: n),
    ("PIC 9({n})", "intlike", lambda n, m: n),
    ("PIC 9({n})V9({m})", "implied", lambda n, m: n + m),
    ("PIC S9({n})V9({m})", "zoned", lambda n, m: n + m),
    ("PIC S9({n})V9({m}) COMP-3", "packed", lambda n, m: (n + m + 2) // 2),
    ("PIC S9({n})V9({m}) SIGN LEADING SEPARATE", "signl",
     lambda n, m: n + m + 1),
    ("PIC S9({n}) SIGN TRAILING SEPARATE", "signt", lambda n, m: n + 1),
    ("PIC 9({n}) COMP", "bin",
     lambda n, m: 2 if n <= 4 else 4 if n <= 9 else 8),
])


@st.composite
def copybooks(draw):
    n_items = draw(st.integers(1, 8))
    lines = ["01 REC."]
    expected = []  # (name, type-ish, width, occurs)
    for i in range(n_items):
        tpl, kind, width_of = draw(_PIC_GEN)
        n = draw(st.integers(1, 9 if "COMP" in tpl else 12))
        m = draw(st.integers(1, 4))
        occurs = draw(st.sampled_from([1, 1, 1, 2, 5]))
        name = f"F-{i}"
        pic = tpl.format(n=n, m=m)
        occ = f" OCCURS {occurs} TIMES" if occurs > 1 else ""
        lines.append(f"   05 {name} {pic}{occ}.")
        expected.append((f"f_{i}", kind, width_of(n, m), occurs))
    return "\n".join(lines), expected


@settings(max_examples=60, deadline=None)
@given(copybooks())
def test_random_copybooks_tile_exactly(case):
    text, expected = case
    layout, rl = copybook_to_layout(text)
    fields = parse_layout(layout, rl)  # must validate against its own rl
    assert len(fields) == len(expected)
    offset = 0
    for f, (name, kind, width, occurs) in zip(fields, expected):
        assert f.name == name
        assert f.start == offset, (layout, rl)
        assert f.length == width
        assert f.occurs == occurs
        if kind == "intlike":
            assert f.base_type in ("int", "long")
            assert (f.base_type == "int") == (width <= 9)
        elif kind != "string" and kind != "bin":
            assert f.base_type == kind
        offset += width * occurs
    assert rl == offset  # no gaps, no overlap in the linear case


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 12), st.integers(0, 4), st.integers(1, 9))
def test_filler_reserves_bytes_without_columns(nx, nf, n9):
    text = f"""
    01 R.
       05 A PIC X({nx}).
       05 FILLER PIC X({nf if nf else 1}).
       05 B PIC 9({n9}).
    """
    layout, rl = copybook_to_layout(text)
    fields = parse_layout(layout, rl)
    assert [f.name for f in fields] == ["a", "b"]
    gap = nf if nf else 1
    assert fields[1].start == nx + gap
    assert rl == nx + gap + n9
