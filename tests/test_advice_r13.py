"""ADVICE r13 regressions: directory-stream listing races.

A file deleted between the directory listing and the per-file stat
must NOT kill the stream — it simply isn't admitted this batch (if it
reappears, a later listing picks it up).  Both directory stream
readers (fixedlen tails growing files, varlen admits immutable whole
files) share the listing-then-stat shape and both get the skip."""

from __future__ import annotations

import os
import tempfile


def test_varlen_directory_latest_offset_skips_vanished_file(monkeypatch):
    from hadoop_fixedlengthinputformat_spark.sources import varlen

    opts = varlen._VOptions.parse({})
    with tempfile.TemporaryDirectory() as d:
        real = os.path.join(d, "part-a.rdw")
        with open(real, "wb") as f:
            f.write(b"\x00\x07\x00\x00abc")
        ghost = os.path.join(d, "part-gone.rdw")
        monkeypatch.setattr(
            varlen, "_list_files", lambda path: [real, ghost]
        )
        r = varlen.VarLenDirectoryStreamReader(opts, d)
        off = r.latestOffset()
        assert off == {"files": {real: 7}}


def test_fixedlen_directory_latest_offset_skips_vanished_file(monkeypatch):
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen

    opts = fixedlen._Options.parse(
        {"recordlength": "10", "layout": "v:0:10:long"}
    )
    with tempfile.TemporaryDirectory() as d:
        real = os.path.join(d, "part-a.fixed")
        with open(real, "wb") as f:
            f.write(b"0" * 30)
        ghost = os.path.join(d, "part-gone.fixed")
        monkeypatch.setattr(
            fixedlen, "_list_files", lambda path: [real, ghost]
        )
        r = fixedlen.FixedLenDirectoryStreamReader(opts, d)
        off = r.latestOffset()
        assert off == {"files": {real: 30}}


def test_varlen_directory_changed_size_message(monkeypatch):
    """The partitions() error must say 'changed size' (a shrunk file was
    previously reported as 'grew')."""
    import pytest

    from hadoop_fixedlengthinputformat_spark.sources import varlen

    opts = varlen._VOptions.parse({})
    r = varlen.VarLenDirectoryStreamReader(opts, "/nonexistent")
    with pytest.raises(ValueError, match="changed size"):
        r.partitions(
            {"files": {"/x/part-a.rdw": 100}},
            {"files": {"/x/part-a.rdw": 40}},
        )
