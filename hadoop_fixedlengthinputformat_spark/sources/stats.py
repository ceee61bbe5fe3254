"""Min/max stats sidecars for fixed-width part files.

Parquet can skip row groups because the footer carries per-column
min/max; a raw fixed-width file has no such thing — every selective
scan reads every byte.  The engine closes that gap with an OPTIONAL
sidecar written next to each part file (``<part>.stats.json``): per
block of ``STATS_BLOCK_RECORDS`` records, the min/max of every scalar
layout field.

Planning-time use: ``FixedLengthReader.partitions()`` maps each
byte-range partition to its record range, finds the overlapping stats
blocks, and DROPS the partition when no overlapping block can satisfy
the pushed predicates — whole byte ranges are never read, the same IO
win parquet gets from row-group pruning.  At 100 TB a selective
predicate on a roughly-sorted field (time, increasing keys) skips most
of the file; worst case (value everywhere) prunes nothing and costs one
tiny JSON read per file at planning time.

Everything is CONSERVATIVE: unknown fields, missing sidecars, array
(OCCURS) fields, NaN-containing double blocks, and unsupported
predicate shapes all fall back to "may match" — pruning can only drop
partitions proven empty of matches.  The row-level Arrow mask still
runs afterwards, so results are identical with or without sidecars.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
import os
from typing import Any

from hadoop_fixedlengthinputformat_spark.sources.layout import FieldSpec

STATS_BLOCK_RECORDS = 8192
_SUFFIX = ".stats.json"
_VERSION = 1


def sidecar_path(part_path: str) -> str:
    return part_path + _SUFFIX


def is_sidecar(path: str) -> bool:
    return path.endswith(_SUFFIX)


def _ser(v: Any) -> Any:
    if isinstance(v, (_dt.date, _dt.datetime)):
        return v.isoformat()
    return v


class StatsCollector:
    """Accumulates per-block min/max for scalar layout fields as the
    writer encodes rows (values are in hand anyway — zero extra IO)."""

    def __init__(self, fields: list[FieldSpec], block_records: int = STATS_BLOCK_RECORDS):
        self.fields = [f for f in fields if f.occurs == 1]
        self.block_records = block_records
        self.blocks: list[dict] = []
        self._cur: dict[str, list] | None = None
        self._cur_n = 0

    def _open_block(self) -> None:
        self._cur = {f.name: [None, None, False] for f in self.fields}
        self._cur_n = 0

    def _close_block(self) -> None:
        if self._cur is None or self._cur_n == 0:
            return
        self.blocks.append(
            {
                "n": self._cur_n,
                "cols": {
                    name: {"min": _ser(lo), "max": _ser(hi), "nan": nan}
                    for name, (lo, hi, nan) in self._cur.items()
                },
            }
        )
        self._cur = None

    def update(self, row: dict) -> None:
        if self._cur is None:
            self._open_block()
        for f in self.fields:
            v = row[f.name]
            slot = self._cur[f.name]
            if isinstance(v, float) and math.isnan(v):
                slot[2] = True  # NaN present: block unprunable for field
                continue
            if slot[0] is None or v < slot[0]:
                slot[0] = v
            if slot[1] is None or v > slot[1]:
                slot[1] = v
        self._cur_n += 1
        if self._cur_n >= self.block_records:
            self._close_block()

    def payload(self) -> dict:
        self._close_block()
        return {
            "version": _VERSION,
            "block_records": self.block_records,
            "blocks": self.blocks,
        }


def write_sidecar(path: str, payload: dict) -> None:
    with open(path, "w") as f:
        json.dump(payload, f)


def load_sidecar(part_path: str) -> dict | None:
    p = sidecar_path(part_path)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            payload = json.load(f)
        if payload.get("version") != _VERSION:
            return None
        return payload
    except (OSError, ValueError):
        return None


def _de(v: Any, f: FieldSpec) -> Any:
    if v is None:
        return None
    if f.base_type == "date" and isinstance(v, str):
        return _dt.date.fromisoformat(v)
    return v


def _norm_filter_value(v: Any) -> Any:
    if isinstance(v, _dt.datetime):
        return v.date()
    return v


def _block_may_match(col: dict, f: FieldSpec, flt) -> bool:
    """Conservative per-block interval test for one pushed filter."""
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, GreaterThanOrEqual, In,
        LessThan, LessThanOrEqual,
    )

    if col.get("nan"):
        return True  # NaN breaks the total order; don't prune
    lo, hi = _de(col.get("min"), f), _de(col.get("max"), f)
    if lo is None or hi is None:
        return True
    if not isinstance(
        flt, (In, EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
    ):
        return True  # IsNull/IsNotNull/string predicates: no interval test
    try:
        if isinstance(flt, In):
            vals = [_norm_filter_value(v) for v in flt.value if v is not None]
            return any(lo <= v <= hi for v in vals)
        v = _norm_filter_value(flt.value)
        if isinstance(v, float) and math.isnan(v):
            return True  # NaN predicate: leave to the row-level mask
        if isinstance(flt, EqualTo):
            return lo <= v <= hi
        if isinstance(flt, GreaterThan):
            return hi > v
        if isinstance(flt, GreaterThanOrEqual):
            return hi >= v
        if isinstance(flt, LessThan):
            return lo < v
        if isinstance(flt, LessThanOrEqual):
            return lo <= v
    except TypeError:
        return True  # incomparable types: never prune on a guess
    return True  # unsupported shape: may match


def partition_may_match(
    payload: dict,
    record_length: int,
    start: int,
    end: int,
    filters: list,
    fields_by_name: dict[str, FieldSpec],
    skip_records: int = 0,
) -> bool:
    """May the byte-range partition [start, end) contain a row matching
    ALL pushed filters?  True unless every overlapping stats block is
    proven to exclude some filter.

    ``skip_records``: sidecar blocks count DATA records only, but byte
    offsets include any skipHeaderRecords banner bytes — shift the file
    ordinals back by the header count so the right blocks are tested
    (otherwise a matching partition could be wrongly pruned, breaking
    the conservative contract)."""
    blocks = payload.get("blocks") or []
    if not blocks:
        return True
    per_block = payload.get("block_records", STATS_BLOCK_RECORDS)
    rec_lo = max(0, start // record_length - skip_records)
    rec_hi = (end + record_length - 1) // record_length - skip_records
    if rec_hi <= rec_lo:
        return True  # header-only range: no stats evidence, keep it
    testable = [
        (flt, fields_by_name[flt.attribute[0]])
        for flt in filters
        if getattr(flt, "attribute", None)
        and len(flt.attribute) == 1
        and flt.attribute[0] in fields_by_name
    ]
    if not testable:
        return True
    pos = 0
    overlapped = False
    for blk in blocks:
        blk_lo, blk_hi = pos, pos + blk["n"]
        pos = blk_hi
        if blk_hi <= rec_lo or blk_lo >= rec_hi:
            continue
        overlapped = True
        cols = blk.get("cols", {})
        if all(
            _block_may_match(cols.get(f.name, {}), f, flt)
            for flt, f in testable
        ):
            return True
    if not overlapped:
        # records beyond the sidecar's coverage (foreign/truncated stats
        # file): no evidence either way — keep the partition
        return True
    # every overlapping block excludes at least one filter
    return False
