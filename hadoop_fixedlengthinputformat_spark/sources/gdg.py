"""Generation Data Group (GDG) resolution for file-based scans.

z/OS catalogs version sequential datasets as ``<base>.GnnnnVvv`` —
generation number 1-9999, version 0-99 — and jobs reference them
RELATIVELY: ``BASE(0)`` is the current (highest) generation, ``BASE(-1)``
the one before, ``BASE(+1)`` a new generation being created.  Mainframe
feeds commonly land as one generation per day/run, and the reference's
fixed-length files are exactly what those generations contain
(FixedLengthInputFormat.java:38-43) — so the engine needs the naming
convention, not just the record format.

This module maps the convention onto a directory: each generation is a
file OR directory named ``<base>.GnnnnVvv`` (an optional ``.ext`` suffix
is allowed for file entries).  Within a generation the highest VERSION
is the generation — superseded ``V00`` members stay on disk but never
resolve, matching catalog semantics.  ``resolve`` answers relative
references, ``all_paths`` the whole-group concatenation (newest first,
the JCL GDG-base concatenation order), and ``next_generation_name`` the
``(+1)`` convention for writers.
"""

from __future__ import annotations

import os
import re


def _entries(directory: str, base: str) -> dict[int, tuple[int, str]]:
    """gen -> (max_version, path-of-that-version)."""
    if not os.path.isdir(directory):
        raise FileNotFoundError(f"gdg: {directory!r} is not a directory")
    pat = re.compile(
        re.escape(base) + r"\.G(\d{4})V(\d{2})(?:\..+)?$"
    )
    out: dict[int, tuple[int, str]] = {}
    for name in sorted(os.listdir(directory)):
        m = pat.fullmatch(name)
        if not m:
            continue
        gen, ver = int(m.group(1)), int(m.group(2))
        if gen == 0:
            raise ValueError(
                f"gdg: generation 0000 is not a valid catalog entry ({name})"
            )
        if gen not in out or ver > out[gen][0]:
            out[gen] = (ver, os.path.join(directory, name))
    return out


def generations(directory: str, base: str) -> list[int]:
    """Ascending generation numbers present for ``base``."""
    return sorted(_entries(directory, base))


def resolve(directory: str, base: str, rel: int = 0) -> str:
    """Path of the generation ``rel`` references (0 = current, -1 =
    previous, ...); positive values are writer-side and rejected here."""
    if rel > 0:
        raise ValueError(
            "gdg: positive relative generations name a NEW dataset — use "
            "next_generation_name for the (+1) convention"
        )
    ent = _entries(directory, base)
    gens = sorted(ent)
    idx = len(gens) - 1 + rel
    if not gens or idx < 0:
        raise ValueError(
            f"gdg: {base}({rel}) does not exist under {directory!r} "
            f"({len(gens)} generation(s) cataloged)"
        )
    return ent[gens[idx]][1]


def all_paths(directory: str, base: str) -> list[str]:
    """Every generation's resolved path, newest first (the order a JCL
    GDG-base concatenation presents members)."""
    ent = _entries(directory, base)
    return [ent[g][1] for g in sorted(ent, reverse=True)]


def next_generation_name(directory: str, base: str) -> str:
    """Name for ``base(+1)``: one past the highest cataloged generation
    (``G0001V00`` when none exist).  Generation 9999 has no successor
    here — catalog wrap/roll-off is an operations policy, not a read
    path, so it raises rather than silently reusing G0001."""
    gens = generations(directory, base) if os.path.isdir(directory) else []
    nxt = (gens[-1] if gens else 0) + 1
    if nxt > 9999:
        raise ValueError(f"gdg: {base} is at generation 9999 (no successor)")
    return f"{base}.G{nxt:04d}V00"


def expire(directory: str, base: str, limit: int) -> list[str]:
    """Apply the GDG LIMIT attribute: keep the newest ``limit``
    generations and roll the rest off (every VERSION of an expired
    generation is removed — superseded versions never outlive their
    generation).  Returns the removed paths, oldest first.  This is
    the catalog's automatic behavior on z/OS when a new generation
    exceeds the limit; here it is an explicit maintenance call the
    writer composes with next_generation_name."""
    import shutil

    if limit < 1:
        raise ValueError(f"gdg: limit must be >= 1, got {limit}")
    pat = re.compile(re.escape(base) + r"\.G(\d{4})V(\d{2})(?:\..+)?$")
    gens = generations(directory, base)
    doomed = set(gens[:-limit]) if len(gens) > limit else set()
    removed: list[str] = []
    for name in sorted(os.listdir(directory)):
        m = pat.fullmatch(name)
        if m and int(m.group(1)) in doomed:
            p = os.path.join(directory, name)
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
            removed.append(p)
    return removed
