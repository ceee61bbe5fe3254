"""CLI guard for the fixture generators (VERDICT r10 #2).

Round 10 committed a 4.3 MB parquet directory literally named
``--help/`` because an option-looking token fell through to the
positional OUT_DIR slot of tests/gen_testdata.py.  These tests pin the
guard: option-like positionals are rejected with usage, --help prints
usage instead of generating data, and tools/soak_sf1.py validates
query names against the registry before touching Spark."""

from __future__ import annotations

import subprocess
import sys

import pytest

from tests.gen_testdata import parse_argv


def test_option_like_out_dir_rejected():
    with pytest.raises(SystemExit, match="unrecognized option"):
        parse_argv(["--help"])
    with pytest.raises(SystemExit, match="unrecognized option"):
        parse_argv(["--hlep", "/tmp/x"])
    with pytest.raises(SystemExit, match="unrecognized option"):
        parse_argv(["/tmp/x", "7", "--nuls"])


def test_normal_parse_still_works():
    p = parse_argv(["/tmp/x", "7", "--scale", "1000", "--nulls"])
    assert p["out"] == "/tmp/x"
    assert p["seed"] == 7
    assert p["scale"] == 1000
    assert p["nulls"] and not p["ties"]
    d = parse_argv([])
    assert d["out"] == "/tmp/alt_testdata" and d["scale"] == 10


def test_help_prints_usage_and_writes_nothing(tmp_path):
    # cwd=tmp_path so a regression that treats "--help" as an output
    # path would create the directory HERE, where the assert can see it
    # (ADVICE r11: with cwd=/root/repo the check was vacuous)
    out = subprocess.run(
        [sys.executable, "/root/repo/tests/gen_testdata.py", "--help"],
        capture_output=True,
        text=True,
        cwd=tmp_path,
    )
    combined = out.stdout + out.stderr
    assert "usage:" in combined
    assert not (tmp_path / "--help").exists()
    assert not list(tmp_path.iterdir())


def test_soak_sf1_unknown_name_rejected_sparklessly():
    out = subprocess.run(
        [sys.executable, "tools/soak_sf1.py", "/tmp/sf1", "anne"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert out.returncode != 0
    assert "unknown query name(s): anne" in (out.stdout + out.stderr)


def test_soak_sf1_option_like_dir_rejected():
    out = subprocess.run(
        [sys.executable, "tools/soak_sf1.py", "--help"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=60,
    )
    assert out.returncode != 0
    assert "usage:" in (out.stdout + out.stderr)
