"""COBOL copybook -> ``fixedlen`` layout translator.

Real fixed-length feeds ship with a COBOL copybook, not a hand-written
layout string; this module maps the storage-bearing subset straight to
the engine's layout syntax (``sources/layout.py``), so

    layout, record_length = copybook_to_layout(text)
    spark.read.format("fixedlen").option("recordLength", record_length)
         .option("layout", layout).load(path)

is the whole on-ramp.  Supported (the subset that determines bytes):

  * ``PIC X(n)`` / ``PIC A(n)``                      -> string, n bytes
  * ``PIC 9(n)`` DISPLAY                             -> int (n<=9) / long
  * ``PIC 9(n)V9(m)`` DISPLAY                        -> implied(m), n+m
  * ``PIC S9(n)V9(m)`` DISPLAY                       -> zoned(m), n+m
    (sign overpunch in the low-order byte)
  * ``COMP-3`` / ``PACKED-DECIMAL``                  -> packed(m),
    ceil((n+m+1)/2) bytes (digit nibbles + sign nibble)
  * ``COMP`` / ``COMP-4`` / ``BINARY``               -> bin, 2/4/8 bytes
    by digit count (1-4 / 5-9 / 10-18 — the COBOL85 binary sizing)
  * ``COMP-1`` / ``COMP-2``                          -> comp1 / comp2
  * ``OCCURS n TIMES``                               -> type[n]
  * ``OCCURS 1 TO n TIMES DEPENDING ON f``           -> type[n->f]
  * ``SIGN [IS] LEADING|TRAILING SEPARATE [CHARACTER]``
                                                     -> signl/signt(m),
    digits + 1 bytes (an explicit '+'/'-' byte before/after the run;
    SIGN TRAILING without SEPARATE is the default overpunch = zoned)
  * group items (no PIC) flatten; ``FILLER`` reserves bytes without a
    column; ``REDEFINES`` overlays storage (offset resets to the
    redefined item's start; following items start after the LARGER of
    the two, per the standard); level-88 condition names carry no
    storage (skipped here) but parse into boolean expressions over the
    decoded columns via :func:`conditions`.

Repeated ``PIC 99V99``-style digit runs (no parentheses) are accepted.
``SIGN LEADING`` without SEPARATE maps to the ``zonedl`` layout type
(overpunch in the FIRST byte's zone).  Unsupported usages (COMP-5
little-endian, national/DBCS, edited pictures, VALUE-bearing storage
tricks) raise with the offending sentence — never a silent wrong
offset.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_LEVEL_88 = 88


@dataclass
class _Item:
    level: int
    name: str
    pic: str | None
    usage: str
    occurs: int
    depends_on: str | None
    redefines: str | None
    sign_sep: str | None = None  # "L"/"T" = SIGN LEADING/TRAILING SEPARATE
    lead_over: bool = False  # SIGN LEADING without SEPARATE (overpunch first)
    sync: bool = False  # SYNCHRONIZED: align binary items, slack before
    # filled during layout:
    start: int = 0
    length: int = 0  # bytes per element
    ltype: str | None = None  # layout type string ("long", "packed(2)", ...)


def _norm_name(cobol: str) -> str:
    return cobol.strip().lower().replace("-", "_")


def _expand_pic(pic: str) -> str:
    """Expand 9(4)V9(2) -> 9999V99 (parenthesized repeat factors)."""
    return re.sub(
        r"([XA9])\((\d+)\)", lambda m: m.group(1) * int(m.group(2)), pic
    )


def _sentences(text: str) -> list[str]:
    """Copybook sentences: strip sequence columns / comments, join
    continuation lines, split on the terminating period."""
    lines = []
    for raw in text.splitlines():
        line = raw.rstrip("\n")
        # classic reference format: cols 1-6 sequence, col 7 indicator
        if len(line) > 6 and line[6] in ("*", "/"):
            continue
        if line.lstrip().startswith("*"):
            continue
        lines.append(line.strip())
    blob = " ".join(lines)
    # a COBOL separator period is followed by whitespace (or ends the
    # text) — a bare "." inside a numeric literal (88 ... VALUE 9.99)
    # is NOT a sentence boundary
    return [s.strip() for s in re.split(r"\.(?:\s+|$)", blob) if s.strip()]


# Tokens that can legally follow the level number directly — a data item
# whose "name" is one of these is a nameless implicit FILLER
# (`05 PIC X(3).` is legal COBOL and reserves storage).
_CLAUSE_KEYWORDS = frozenset(
    {
        "PIC", "PICTURE", "REDEFINES", "OCCURS", "USAGE", "SIGN", "VALUE",
        "COMP", "COMP-1", "COMP-2", "COMP-3", "COMP-4", "COMP-5",
        "COMPUTATIONAL", "COMPUTATIONAL-1", "COMPUTATIONAL-2",
        "COMPUTATIONAL-3", "COMPUTATIONAL-4", "COMPUTATIONAL-5",
        "BINARY", "PACKED-DECIMAL", "DISPLAY", "FILLER",
    }
)


def _parse_item(sentence: str) -> _Item | None:
    toks = sentence.split()
    if not toks or not toks[0].isdigit():
        return None
    level = int(toks[0])
    if level == _LEVEL_88 or level == 66:
        return None  # condition names / RENAMES carry no storage
    if len(toks) > 1 and toks[1].upper() in _CLAUSE_KEYWORDS and \
            toks[1].upper() != "FILLER":
        # nameless item (`05 PIC X(3).`): implicit FILLER; clause
        # scanning starts at the keyword itself, else the reserved bytes
        # would be dropped and every following offset silently shifted
        name = "FILLER"
        i = 1
    else:
        name = toks[1] if len(toks) > 1 else "FILLER"
        i = 2
    pic = None
    usage = "DISPLAY"
    occurs = 1
    depends_on = None
    redefines = None
    sign_sep = None
    lead_over = False
    sync = False
    up = [t.upper() for t in toks]
    while i < len(toks):
        t = up[i]
        if t == "REDEFINES" and i + 1 < len(toks):
            redefines = _norm_name(toks[i + 1])
            i += 2
        elif t in ("PIC", "PICTURE"):
            j = i + 1
            if j < len(toks) and up[j] == "IS":
                j += 1
            pic = up[j]
            i = j + 1
        elif t in ("COMP", "COMP-4", "BINARY", "COMPUTATIONAL",
                   "COMPUTATIONAL-4"):
            usage = "COMP"
            i += 1
        elif t in ("COMP-3", "COMPUTATIONAL-3", "PACKED-DECIMAL"):
            usage = "COMP-3"
            i += 1
        elif t in ("COMP-1", "COMPUTATIONAL-1"):
            usage = "COMP-1"
            i += 1
        elif t in ("COMP-2", "COMPUTATIONAL-2"):
            usage = "COMP-2"
            i += 1
        elif t in ("COMP-5", "COMPUTATIONAL-5"):
            raise ValueError(
                f"copybook: COMP-5 (native little-endian) is not supported "
                f"in: {sentence!r}"
            )
        elif t == "SIGN":
            # SIGN [IS] LEADING|TRAILING [SEPARATE [CHARACTER]]
            j = i + 1
            if j < len(toks) and up[j] == "IS":
                j += 1
            if j >= len(toks) or up[j] not in ("LEADING", "TRAILING"):
                raise ValueError(
                    f"copybook: malformed SIGN clause in: {sentence!r}"
                )
            where = up[j]
            j += 1
            separate = j < len(toks) and up[j] == "SEPARATE"
            if separate:
                j += 1
                if j < len(toks) and up[j] == "CHARACTER":
                    j += 1
                sign_sep = "L" if where == "LEADING" else "T"
            elif where == "LEADING":
                # SIGN LEADING without SEPARATE: overpunch in the FIRST
                # byte's zone (zonedl layout type)
                lead_over = True
            # SIGN TRAILING without SEPARATE = the default overpunch
            i = j
        elif t == "OCCURS":
            # OCCURS n TIMES | OCCURS lo TO n TIMES DEPENDING ON f
            j = i + 1
            lo = toks[j]
            if j + 1 < len(toks) and up[j + 1] == "TO":
                occurs = int(toks[j + 2])
                j += 3
            else:
                occurs = int(lo)
                j += 1
            if j < len(toks) and up[j] == "TIMES":
                j += 1
            if j + 2 < len(toks) and up[j] == "DEPENDING":
                k = j + 1
                if up[k] == "ON":
                    k += 1
                depends_on = _norm_name(toks[k])
                j = k + 1
            i = j
        elif t in ("SYNC", "SYNCHRONIZED"):
            # SYNC [LEFT|RIGHT]: IBM treats LEFT/RIGHT identically for
            # storage purposes (alignment is what moves bytes)
            sync = True
            i += 1
            if i < len(toks) and up[i] in ("LEFT", "RIGHT"):
                i += 1
        elif t == "USAGE":
            i += 1  # the usage keyword itself follows
        elif t == "IS":
            i += 1
        elif t == "VALUE":
            break  # VALUE clause ends the storage-relevant part
        else:
            i += 1
    return _Item(level, _norm_name(name), pic, usage, occurs, depends_on,
                 redefines, sign_sep, lead_over, sync)


def _type_of(item: _Item, sentence_hint: str) -> tuple[str, int]:
    """(layout type, bytes per element) for a PIC-bearing item."""
    pic = _expand_pic(item.pic or "")
    m = re.fullmatch(r"(S?)(9+)(?:V(9+))?", pic)
    if m:
        signed, ints, decs = m.group(1) == "S", len(m.group(2)), len(
            m.group(3) or ""
        )
        digits = ints + decs
        if item.usage == "COMP-3":
            return f"packed({decs})", (digits + 2) // 2
        if item.usage == "COMP":
            if digits > 18:
                raise ValueError(
                    f"copybook: more than 18 binary digits in: "
                    f"{sentence_hint!r}"
                )
            width = 2 if digits <= 4 else 4 if digits <= 9 else 8
            return "bin", width
        if item.usage == "DISPLAY":
            if item.sign_sep is not None:
                if not signed:
                    raise ValueError(
                        f"copybook: SIGN SEPARATE on an unsigned PICTURE "
                        f"in: {sentence_hint!r}"
                    )
                t = "signl" if item.sign_sep == "L" else "signt"
                return f"{t}({decs})", digits + 1  # + the sign byte
            if item.lead_over:
                if not signed:
                    raise ValueError(
                        f"copybook: SIGN LEADING on an unsigned PICTURE "
                        f"in: {sentence_hint!r}"
                    )
                return f"zonedl({decs})", digits
            if decs or signed:
                # zoned carries the sign overpunch; unsigned with
                # decimals is a plain implied-point DISPLAY number
                return (
                    (f"zoned({decs})" if signed else f"implied({decs})"),
                    digits,
                )
            return ("int" if digits <= 9 else "long"), digits
    if item.usage == "COMP-1":
        return "comp1", 4
    if item.usage == "COMP-2":
        return "comp2", 8
    m = re.fullmatch(r"[XA]+", pic)
    if m:
        return "string", len(pic)
    raise ValueError(
        f"copybook: unsupported PICTURE {item.pic!r} in: {sentence_hint!r}"
    )


def copybook_to_layout(text: str) -> tuple[str, int]:
    """Translate a copybook to ``(layout_spec, record_length)``.

    Offsets are assigned in declaration order; groups flatten; FILLER
    reserves bytes without emitting a field; REDEFINES overlays (the
    record advances past the larger of the overlaid regions).
    """
    items: list[tuple[_Item, str]] = []
    for sent in _sentences(text):
        it = _parse_item(sent)
        if it is not None:
            items.append((it, sent))
    if not items:
        raise ValueError("copybook: no storage-bearing items found")

    # name -> (start, span) for REDEFINES targets (groups and elementary)
    region: dict[str, tuple[int, int]] = {}
    fields: list[str] = []
    offset = 0
    record_end = 0
    # stack of open group items: (level, name, start, resume_end, sync)
    # — resume_end is the redefined target's end for a REDEFINES group
    # (None otherwise): on close, the next item resumes after the
    # LARGER of the overlaid regions, even when the redefining group is
    # the standard-legal SMALLER one.  sync propagates: SYNCHRONIZED on
    # a group synchronizes every elementary item within it (IBM rule).
    group_stack: list[tuple[int, str, int, int | None, bool]] = []

    def close_groups(level: int) -> None:
        nonlocal offset
        while group_stack and group_stack[-1][0] >= level:
            glevel, gname, gstart, resume_end, _gs = group_stack.pop()
            region[gname] = (gstart, offset - gstart)
            if resume_end is not None:
                offset = max(offset, resume_end)

    for it, sent in items:
        close_groups(it.level)
        resume_end: int | None = None
        if it.redefines is not None:
            if it.redefines not in region:
                raise ValueError(
                    f"copybook: REDEFINES target {it.redefines!r} not seen "
                    f"before: {sent!r}"
                )
            t_start, t_span = region[it.redefines]
            offset = t_start
            resume_end = t_start + t_span
        if it.pic is None and it.usage not in ("COMP-1", "COMP-2"):
            # group item: children lay out from here (COMP-1/COMP-2 are
            # elementary WITHOUT a PICTURE — their width is the usage)
            group_stack.append((
                it.level, it.name, offset, resume_end,
                it.sync or any(g[4] for g in group_stack),
            ))
            continue
        ltype, width = _type_of(it, sent)
        effective_sync = it.sync or any(g[4] for g in group_stack)
        if effective_sync:
            # SYNCHRONIZED aligns binary items to their natural boundary
            # (halfword/fullword/doubleword, record-relative per IBM:
            # the 01 record is assumed doubleword-aligned); slack bytes
            # are inserted BEFORE the item and stay unnamed.  DISPLAY /
            # COMP-3 items are unaffected (SYNC is a storage no-op).
            # Binary widths (2/4/8) are self-aligned strides, so an
            # aligned start aligns every OCCURS element too.
            align = (
                width if ltype == "bin"
                else 4 if ltype == "comp1"
                else 8 if ltype == "comp2"
                else 1
            )
            pad = (-offset) % align
            # the misalignment guard covers BOTH an elementary item
            # bearing REDEFINES and an item nested anywhere inside an
            # open REDEFINES *group* (resume_end is not None) — slack
            # inserted there would silently shift the whole overlay
            # relative to the redefined region (ADVICE r6)
            in_redefines_overlay = it.redefines is not None or any(
                g[3] is not None for g in group_stack
            )
            if pad and in_redefines_overlay:
                raise ValueError(
                    f"copybook: SYNCHRONIZED would shift REDEFINES "
                    f"overlay {it.name!r} by {pad} slack byte(s) — the "
                    f"redefined region starts misaligned: {sent!r}"
                )
            offset += pad
        span = width * it.occurs
        if it.name != "filler":
            suffix = ""
            if it.depends_on is not None:
                suffix = f"[{it.occurs}->{it.depends_on}]"
            elif it.occurs > 1:
                suffix = f"[{it.occurs}]"
            fields.append(f"{it.name}:{offset}:{width}:{ltype}{suffix}")
        region[it.name] = (offset, span)
        offset += span
        if resume_end is not None:
            # elementary REDEFINES: following items start after the
            # larger of (redefined target, this redefinition)
            offset = max(offset, resume_end)
        record_end = max(record_end, offset)
    close_groups(0)
    if not fields:
        raise ValueError("copybook: only FILLER items found")
    return ",".join(fields), record_end


@dataclass
class Condition:
    """A level-88 condition name: ``name`` is true when ``field`` takes
    one of the declared values/ranges.  ``sql`` is a boolean expression
    over the DECODED layout column, valid verbatim in Spark SQL and
    DuckDB (only =, IN, BETWEEN, OR)."""

    name: str
    field: str
    sql: str


_VALUE_TOKEN = re.compile(r"'(?:[^']|'')*'|\S+")  # '' = embedded quote


def conditions(text: str) -> list[Condition]:
    """Parse the level-88 condition names ``copybook_to_layout`` skips
    (they carry no storage) into boolean expressions over the decoded
    columns — ``88 IS-ACTIVE VALUE 'A'.`` becomes
    ``(status = 'A') AS is_active``.  Supports VALUE/VALUES [IS/ARE],
    multiple literals, and ``THRU``/``THROUGH`` ranges; a condition
    before any elementary item, or without a VALUE clause, raises (the
    module's never-silently-wrong rule)."""
    out: list[Condition] = []
    parent: str | None = None
    for sentence in _sentences(text):
        toks = _VALUE_TOKEN.findall(sentence)
        if not toks or not toks[0].isdigit():
            continue
        level = int(toks[0])
        if level != _LEVEL_88:
            item = _parse_item(sentence)
            if item is not None and item.pic is not None and \
                    item.name != "filler":
                parent = item.name
            continue
        if len(toks) < 2:
            raise ValueError(f"copybook: level-88 without a name: {sentence!r}")
        name = _norm_name(toks[1])
        if parent is None:
            raise ValueError(
                f"copybook: condition {toks[1]!r} precedes any elementary "
                "item — nothing to condition on"
            )
        i = 2
        if i < len(toks) and toks[i].upper() in ("VALUE", "VALUES"):
            i += 1
        else:
            raise ValueError(
                f"copybook: level-88 {toks[1]!r} has no VALUE clause"
            )
        if i < len(toks) and toks[i].upper() in ("IS", "ARE"):
            i += 1

        def lit(tok: str) -> str:
            if tok.startswith("'"):
                # COBOL doubles embedded quotes exactly like SQL — the
                # token body passes through verbatim
                return tok
            try:
                float(tok)
            except ValueError:
                raise ValueError(
                    f"copybook: level-88 {name!r}: {tok!r} is neither a "
                    "quoted string nor a number"
                )
            return tok

        clauses: list[str] = []
        singles: list[str] = []
        while i < len(toks):
            lo = lit(toks[i])
            i += 1
            if i + 1 < len(toks) + 1 and i < len(toks) and \
                    toks[i].upper() in ("THRU", "THROUGH"):
                if i + 1 >= len(toks):
                    raise ValueError(
                        f"copybook: level-88 {name!r}: THRU without an "
                        "upper bound"
                    )
                hi = lit(toks[i + 1])
                clauses.append(f"{parent} BETWEEN {lo} AND {hi}")
                i += 2
            else:
                singles.append(lo)
        if singles:
            if len(singles) == 1:
                clauses.append(f"{parent} = {singles[0]}")
            else:
                clauses.append(f"{parent} IN ({', '.join(singles)})")
        if not clauses:
            raise ValueError(
                f"copybook: level-88 {name!r} declares no values"
            )
        out.append(Condition(name, parent, "(" + " OR ".join(clauses) + ")"))
    return out
