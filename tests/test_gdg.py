"""gdg (generation data group) resolver: relative references, version
precedence, (+1) naming, and catalog validation."""

from __future__ import annotations

import os

import pytest

from hadoop_fixedlengthinputformat_spark.sources import gdg


def _touch(d, name, as_dir=False):
    p = os.path.join(str(d), name)
    if as_dir:
        os.makedirs(p)
    else:
        open(p, "w").close()
    return p


def test_relative_resolution_and_version_precedence(tmp_path):
    _touch(tmp_path, "A.G0001V00.fixed")
    stale = _touch(tmp_path, "A.G0002V00.fixed")
    g2 = _touch(tmp_path, "A.G0002V01.fixed")
    g3 = _touch(tmp_path, "A.G0003V00", as_dir=True)  # dir member, no ext
    assert gdg.resolve(str(tmp_path), "A", 0) == g3
    assert gdg.resolve(str(tmp_path), "A", -1) == g2  # V01 beats V00
    assert gdg.resolve(str(tmp_path), "A", -1) != stale
    assert gdg.generations(str(tmp_path), "A") == [1, 2, 3]
    assert gdg.all_paths(str(tmp_path), "A")[0] == g3  # newest first
    assert len(gdg.all_paths(str(tmp_path), "A")) == 3


def test_foreign_names_ignored_and_bases_isolated(tmp_path):
    _touch(tmp_path, "A.G0001V00.fixed")
    _touch(tmp_path, "B.G0005V00.fixed")
    _touch(tmp_path, "A.G12V0.fixed")      # malformed digits
    _touch(tmp_path, "A.G0002V00x.fixed")  # junk after version
    _touch(tmp_path, "notagdg.txt")
    assert gdg.generations(str(tmp_path), "A") == [1]
    assert gdg.generations(str(tmp_path), "B") == [5]


def test_out_of_range_and_positive_rel_raise(tmp_path):
    _touch(tmp_path, "A.G0001V00.fixed")
    with pytest.raises(ValueError, match=r"A\(-1\) does not exist"):
        gdg.resolve(str(tmp_path), "A", -1)
    with pytest.raises(ValueError, match="next_generation_name"):
        gdg.resolve(str(tmp_path), "A", 1)
    with pytest.raises(ValueError, match=r"C\(0\) does not exist"):
        gdg.resolve(str(tmp_path), "C", 0)


def test_next_generation_name(tmp_path):
    assert gdg.next_generation_name(str(tmp_path), "A") == "A.G0001V00"
    _touch(tmp_path, "A.G0007V03.fixed")
    assert gdg.next_generation_name(str(tmp_path), "A") == "A.G0008V00"
    _touch(tmp_path, "A.G9999V00.fixed")
    with pytest.raises(ValueError, match="9999"):
        gdg.next_generation_name(str(tmp_path), "A")


def test_generation_zero_rejected(tmp_path):
    _touch(tmp_path, "A.G0000V00.fixed")
    with pytest.raises(ValueError, match="0000"):
        gdg.generations(str(tmp_path), "A")


def test_missing_directory_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        gdg.generations(str(tmp_path / "nope"), "A")


def test_expire_rolls_off_oldest_and_all_versions(tmp_path):
    for n in ("A.G0001V00.fixed", "A.G0001V01.fixed", "A.G0002V00.fixed",
              "A.G0003V00.fixed", "A.G0004V00.fixed", "B.G0001V00.fixed"):
        _touch(tmp_path, n)
    removed = gdg.expire(str(tmp_path), "A", limit=2)
    # gens 1 (both versions) and 2 rolled off; other bases untouched
    assert [os.path.basename(p) for p in removed] == [
        "A.G0001V00.fixed", "A.G0001V01.fixed", "A.G0002V00.fixed",
    ]
    assert gdg.generations(str(tmp_path), "A") == [3, 4]
    assert gdg.generations(str(tmp_path), "B") == [1]
    # under the limit: nothing removed
    assert gdg.expire(str(tmp_path), "A", limit=5) == []
    with pytest.raises(ValueError, match="limit must be"):
        gdg.expire(str(tmp_path), "A", limit=0)
