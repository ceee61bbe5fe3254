"""Hypothesis round-trip for the layout codec (layout.py): random field
layouts + random values must survive encode -> decode bit-exactly.

Pure pyarrow path (no SparkSession) — this is the vectorized decode the
fixedlen source runs on executors, so codec bugs caught here are source
bugs caught cheaply."""

from __future__ import annotations

import datetime

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from hadoop_fixedlengthinputformat_spark.sources.layout import (
    FieldSpec,
    decode_chunk,
    encode_rows,
)


@st.composite
def layout_with_rows(draw):
    fields: list[FieldSpec] = []
    start = 0
    for i in range(draw(st.integers(1, 6))):
        base = draw(st.sampled_from(["int", "long", "double", "string", "date"]))
        if base == "int":
            width, ftype = draw(st.integers(3, 9)), "int"
        elif base == "long":
            width, ftype = draw(st.integers(5, 16)), "long"
        elif base == "double":
            scale = draw(st.integers(1, 4))
            width, ftype = draw(st.integers(scale + 5, scale + 12)), f"double({scale})"
        elif base == "date":
            width, ftype = 10, "date"
        else:
            width, ftype = draw(st.integers(1, 20)), "string"
        fields.append(FieldSpec(f"f{i}", start, width, ftype))
        start += width
    record_length = start

    def value_for(f: FieldSpec):
        base = f.base_type
        if base in ("int", "long"):
            hi = min(10**f.length - 1, 2**31 - 1 if base == "int" else 2**62)
            return draw(st.integers(0, hi))
        if base == "double":
            # magnitude that fits width incl. '.' and scale digits
            int_digits = f.length - f.scale - 1
            hi = 10 ** max(int_digits - 1, 1) - 1
            cents = draw(st.integers(0, hi * 10**f.scale))
            return cents / 10**f.scale
        if base == "date":
            return draw(
                st.dates(datetime.date(1900, 1, 1), datetime.date(2199, 12, 31))
            )
        s = draw(
            st.text(
                alphabet=st.characters(
                    min_codepoint=33, max_codepoint=126
                ),  # printable ascii, no spaces (values are space-padded)
                max_size=f.length,
            )
        )
        return s

    rows = [
        {f.name: value_for(f) for f in fields}
        for _ in range(draw(st.integers(1, 25)))
    ]
    return fields, record_length, rows


@settings(max_examples=60, deadline=None)
@given(layout_with_rows())
def test_encode_decode_roundtrip(data):
    fields, record_length, rows = data
    payload = encode_rows(rows, fields, record_length)
    assert len(payload) == record_length * len(rows)
    schema = pa.schema([pa.field(f.name, f.arrow_type()) for f in fields])
    batch = decode_chunk(
        payload, record_length, fields, 0, False, None, schema
    )
    decoded = batch.to_pylist()
    assert len(decoded) == len(rows)
    for orig, got in zip(rows, decoded):
        for f in fields:
            o, g = orig[f.name], got[f.name]
            if f.base_type == "double":
                assert abs(o - g) < 10**-f.scale / 2, (f, o, g)
            else:
                assert o == g, (f, o, g)


@st.composite
def signsep_odo_layout_with_rows(draw):
    """Round-4 types: sign-separate numerics and ODO arrays."""
    fields: list[FieldSpec] = []
    start = 0
    # counter field first (ODO target)
    max_occ = draw(st.integers(1, 5))
    fields.append(FieldSpec("cnt", start, 1, "int"))
    start += 1
    for i in range(draw(st.integers(1, 4))):
        kind = draw(st.sampled_from(["signl", "signt"]))
        scale = draw(st.integers(0, 3))
        digits = draw(st.integers(max(scale, 1), 10))
        width = digits + 1
        fields.append(FieldSpec(f"s{i}", start, width, f"{kind}({scale})"))
        start += width
    elem_w = draw(st.integers(2, 6))
    fields.append(
        FieldSpec("vals", start, elem_w, "long", max_occ, "cnt")
    )
    start += elem_w * max_occ
    record_length = start

    rows = []
    for _ in range(draw(st.integers(1, 15))):
        row = {}
        cnt = draw(st.integers(0, max_occ))
        row["cnt"] = cnt
        for f in fields:
            if f.name.startswith("s"):
                n_digits = f.length - 1
                int_digits = n_digits - f.scale
                hi = 10 ** max(int_digits, 0) - 1
                units = draw(st.integers(-hi * 10**f.scale if hi else 0,
                                         hi * 10**f.scale if hi else 0))
                row[f.name] = units / 10**f.scale
        row["vals"] = [
            draw(st.integers(0, 10**f.length - 1))
            for f in [fields[-1].element(j) for j in range(cnt)]
        ]
        rows.append(row)
    return fields, record_length, rows


@settings(max_examples=40, deadline=None)
@given(signsep_odo_layout_with_rows())
def test_signsep_and_odo_roundtrip(data):
    """Sign-separate values (either sign position) and DEPENDING-ON
    arrays of every admissible count survive encode -> decode exactly."""
    fields, record_length, rows = data
    payload = encode_rows(rows, fields, record_length)
    assert len(payload) == record_length * len(rows)
    schema = pa.schema([pa.field(f.name, f.arrow_type()) for f in fields])
    batch = decode_chunk(
        payload, record_length, fields, 0, False, None, schema
    )
    decoded = batch.to_pylist()
    for orig, got in zip(rows, decoded):
        assert got["cnt"] == orig["cnt"]
        assert got["vals"] == orig["vals"], (orig, got)
        for f in fields:
            if f.name.startswith("s"):
                assert abs(got[f.name] - orig[f.name]) < 10**-f.scale / 2, (
                    f, orig[f.name], got[f.name],
                )
