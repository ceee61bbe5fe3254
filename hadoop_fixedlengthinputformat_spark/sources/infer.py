"""Layout inference for unknown fixed-width files.

Real-world fixed-width feeds often arrive without a copybook.  This is
the ``pandas.read_fwf(colspecs="infer")`` assist for the ``fixedlen``
source: sample the first records, find column positions that are blank
in EVERY sampled record (field gutters), split the record into fields
at those gutters, and classify each field's type from the sampled
values.  Heuristic by design — fields that abut without a gutter can't
be split (they merge into one string field), and the inferred types are
only as good as the sample — so the output is a STARTING layout spec
the user edits, not a silent guess applied to 100 TB.
"""

from __future__ import annotations

import re

import numpy as np

_INT_RE = re.compile(rb"^ *[+-]?[0-9]+ *$")
_DBL_RE = re.compile(rb"^ *[+-]?([0-9]+\.[0-9]*|\.[0-9]+) *$")
_DATE_RE = re.compile(rb"^ *[0-9]{4}-[0-9]{2}-[0-9]{2} *$")
_JUL7_RE = re.compile(rb"^ *[0-9]{7} *$")


def _looks_julian7(vals: list[bytes]) -> bool:
    """Conservative YYYYDDD sniff (width-7 only — 5-digit YYDDD is
    indistinguishable from a plain int, so it is never inferred): every
    value must parse with year 1950-2049 and a leap-aware day-of-year,
    and at least one DDD must exceed 31 (otherwise an id sequence or a
    truncated YYYYMMDD is the likelier reading)."""
    saw_big_ddd = False
    for v in vals:
        if not _JUL7_RE.match(v):
            return False
        t = v.strip()
        year, ddd = int(t[:4]), int(t[4:])
        leap = year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)
        if not (1950 <= year <= 2049 and 1 <= ddd <= 365 + leap):
            return False
        saw_big_ddd = saw_big_ddd or ddd > 31
    return saw_big_ddd


def _classify(vals: list[bytes], width: int) -> str:
    if all(_DATE_RE.match(v) for v in vals):
        return "date"
    if width == 7 and _looks_julian7(vals):
        return "julian"
    if all(_INT_RE.match(v) for v in vals):
        return "int" if width <= 9 else "long"
    if all(_DBL_RE.match(v) or _INT_RE.match(v) for v in vals):
        # mixed ints and decimals read fine as double; scale = max
        # observed fraction digits (encode-side formatting hint)
        scale = max(
            (len(v.split(b".")[1].strip()) for v in vals if b"." in v),
            default=2,
        )
        return f"double({scale})"
    return "string"


def infer_layout(
    sample: bytes, record_length: int, max_records: int = 1000
) -> str:
    """Infer a ``name:start:len:type`` layout spec from sample bytes.

    ``sample`` must be a whole-record multiple (use the reader's raw
    ``value`` mode or the first N*recordLength bytes of a file).  Field
    names are positional (``c0``, ``c1``, ...) — rename them in the
    returned spec before production use.
    """
    if record_length <= 0:
        raise ValueError("record_length must be > 0")
    usable = len(sample) - (len(sample) % record_length)
    if usable == 0:
        raise ValueError("sample holds no complete record")
    mat = np.frombuffer(sample[:usable], dtype=np.uint8).reshape(
        -1, record_length
    )[:max_records]
    # gutters: positions blank in EVERY sampled record
    blank = (mat == 0x20).all(axis=0)
    fields: list[tuple[int, int]] = []
    start = None
    for pos in range(record_length):
        if not blank[pos] and start is None:
            start = pos
        elif blank[pos] and start is not None:
            fields.append((start, pos - start))
            start = None
    if start is not None:
        fields.append((start, record_length - start))
    if not fields:
        raise ValueError("sample is entirely blank — nothing to infer")
    specs = []
    for i, (s, ln) in enumerate(fields):
        col = mat[:, s : s + ln]
        vals = [bytes(row) for row in col]
        specs.append(f"c{i}:{s}:{ln}:{_classify(vals, ln)}")
    return ",".join(specs)


def infer_layout_from_file(
    path: str, record_length: int, max_records: int = 1000
) -> str:
    """Convenience: infer from the head of a file on a reachable
    filesystem (driver-side sampling — the inference itself is a
    one-node heuristic; apply the result in a distributed read)."""
    import gzip
    import os

    opener = gzip.open if path.endswith(".gz") else open
    want = record_length * max_records
    with opener(path, "rb") as f:
        sample = f.read(want)
    if not sample and os.path.getsize(path) == 0:
        raise ValueError(f"{path!r} is empty")
    return infer_layout(sample, record_length, max_records)
