"""Property tests for the AWS-tape chunk walk (Sparkless).

A randomized reference packer builds images byte-by-byte (random block
sizes incl. 1-byte and multi-chunk, random chunk caps, random tapemark
placement) and the production iterator must reassemble every block
exactly — from the start AND from every block-boundary resume state
(the streaming offsets), with the backspace chain intact across marks
and resumes.  This pins the walk against packing combinatorics no
hand-written case list covers (blocks ending exactly at chunk caps,
single-chunk blocks, marks between and around everything).
"""

from __future__ import annotations

import io
import struct

from hypothesis import given, settings, strategies as st

from hadoop_fixedlengthinputformat_spark.sources.awstape import (
    iter_blocks,
)


def _pack(blocks: list[bytes], caps: list[int], marks: list[bool]) -> bytes:
    """Reference packer: block i chunked at caps[i], preceded by a
    tapemark when marks[i]; closed with tapemark + end-of-tape."""
    out = bytearray()
    prev = 0
    for b, cap, mark in zip(blocks, caps, marks):
        if mark:
            out.extend(struct.pack("<HHBB", 0, prev, 0x40, 0))
            prev = 0
        view = memoryview(b)
        first = True
        while True:
            take = min(len(view), cap)
            piece = bytes(view[:take])
            view = view[take:]
            last = len(view) == 0
            flags1 = (0x80 if first else 0) | (0x20 if last else 0)
            out.extend(struct.pack("<HHBB", len(piece), prev, flags1, 0))
            out.extend(piece)
            prev = len(piece)
            first = False
            if last:
                break
    out.extend(struct.pack("<HHBB", 0, prev, 0x40, 0))
    out.extend(struct.pack("<HHBB", 0, 0, 0x40, 0))
    return bytes(out)


@st.composite
def _tapes(draw):
    n = draw(st.integers(0, 12))
    blocks = [
        draw(st.binary(min_size=1, max_size=900)) for _ in range(n)
    ]
    caps = [draw(st.integers(1, 300)) for _ in range(n)]
    marks = [draw(st.booleans()) for _ in range(n)]
    return blocks, caps, marks


@settings(max_examples=120, deadline=None)
@given(_tapes())
def test_walk_reassembles_every_block(tape):
    blocks, caps, marks = tape
    img = _pack(blocks, caps, marks)
    got = list(iter_blocks(io.BytesIO(img), "prop.aws"))
    assert [b for _, _, b, _ in got] == blocks
    # tape_file counters: one bump per requested mark before that block
    expect_tf = []
    tf = 0
    for m in marks:
        tf += 1 if m else 0
        expect_tf.append(tf)
    assert [t for t, _, _, _ in got] == expect_tf
    # offsets strictly increasing, first block after any leading mark
    offs = [o for _, o, _, _ in got]
    assert offs == sorted(set(offs))


@settings(max_examples=120, deadline=None)
@given(_tapes())
def test_every_resume_state_replays_the_suffix(tape):
    """Resuming from the state after block i must yield exactly the
    blocks after i — the streaming-offset invariant."""
    blocks, caps, marks = tape
    img = _pack(blocks, caps, marks)
    walked = list(iter_blocks(io.BytesIO(img), "prop.aws"))
    for i, (_tf, _off, _b, resume) in enumerate(walked):
        bio = io.BytesIO(img)
        bio.seek(resume[0])
        rest = list(iter_blocks(bio, "prop.aws", start=resume))
        assert [b for _, _, b, _ in rest] == blocks[i + 1 :]


@settings(max_examples=120, deadline=None)
@given(_tapes(), st.integers(0, 5000))
def test_truncation_never_yields_a_partial_block(tape, cut):
    """stop_on_partial: any byte-truncated image yields a PREFIX of the
    true block list — never a half block, never an error."""
    blocks, caps, marks = tape
    img = _pack(blocks, caps, marks)
    cut = min(cut, len(img))
    got = list(
        iter_blocks(io.BytesIO(img[:cut]), "prop.aws", stop_on_partial=True)
    )
    assert [b for _, _, b, _ in got] == blocks[: len(got)]
