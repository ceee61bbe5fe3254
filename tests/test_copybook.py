"""copybook_to_layout: COBOL PICTURE subset -> engine layout (offsets,
type mapping, groups/FILLER/REDEFINES/OCCURS[ DEPENDING ON]), and a
byte-level round trip through encode_rows + the fixedlen reader."""

from __future__ import annotations

import pytest

from hadoop_fixedlengthinputformat_spark.sources.copybook import (
    copybook_to_layout,
)
from hadoop_fixedlengthinputformat_spark.sources.layout import parse_layout


def test_basic_display_and_comp3():
    layout, rl = copybook_to_layout("""
       01  REC.
           05  K      PIC 9(10).
           05  NAME   PIC X(12).
           05  BAL    PIC S9(8)V99 COMP-3.
           05  FILLER PIC X(3).
           05  SEG    PIC A(5).
    """)
    assert layout == (
        "k:0:10:long,name:10:12:string,bal:22:6:packed(2),seg:31:5:string"
    )
    assert rl == 36
    parse_layout(layout, rl)  # must be a valid engine layout


def test_binary_sizing_and_floats():
    layout, rl = copybook_to_layout("""
       01  R.
           05  A PIC 9(4)  COMP.
           05  B PIC 9(9)  BINARY.
           05  C PIC 9(18) COMP-4.
           05  D COMP-1.
           05  E COMP-2.
    """)
    assert layout == "a:0:2:bin,b:2:4:bin,c:6:8:bin,d:14:4:comp1,e:18:8:comp2"
    assert rl == 26


def test_zoned_implied_and_unparenthesized_pics():
    layout, rl = copybook_to_layout("""
       01  R.
           05  P  PIC S9(5)V99.
           05  Q  PIC 99V99.
           05  W  PIC 999.
    """)
    assert layout == "p:0:7:zoned(2),q:7:4:implied(2),w:11:3:int"
    assert rl == 14


def test_groups_flatten_and_occurs():
    layout, rl = copybook_to_layout("""
       01  REC.
           05  HDR.
               10  K    PIC 9(3).
               10  TAG  PIC X(2).
           05  CNT      PIC 9.
           05  AMTS     PIC S9(3)V99 COMP-3 OCCURS 1 TO 4 TIMES
                        DEPENDING ON CNT.
           05  FIXED3   PIC 9(2) OCCURS 3 TIMES.
    """)
    assert layout == (
        "k:0:3:int,tag:3:2:string,cnt:5:1:int,"
        "amts:6:3:packed(2)[4->cnt],fixed3:18:2:int[3]"
    )
    assert rl == 24
    parse_layout(layout, rl)


def test_redefines_overlays_and_advances_past_larger():
    layout, rl = copybook_to_layout("""
       01  REC.
           05  A       PIC X(4).
           05  B REDEFINES A PIC 9(6).
           05  C       PIC X(2).
    """)
    # B overlays A's start and is LARGER; C follows the larger region
    assert layout == "a:0:4:string,b:0:6:int,c:6:2:string"
    assert rl == 8


def test_redefines_smaller_resumes_after_redefined_item():
    # The standard-legal direction: redefining item SMALLER than the
    # target.  C must start after A (offset 10), not after B (offset 4).
    layout, rl = copybook_to_layout("""
       01  REC.
           05  A       PIC X(10).
           05  B REDEFINES A PIC X(4).
           05  C       PIC X(2).
    """)
    assert layout == "a:0:10:string,b:0:4:string,c:10:2:string"
    assert rl == 12


def test_redefines_smaller_group_resumes_after_redefined_item():
    layout, rl = copybook_to_layout("""
       01  REC.
           05  A       PIC X(10).
           05  B REDEFINES A.
               10  B1  PIC X(2).
               10  B2  PIC 9(2).
           05  C       PIC X(3).
    """)
    assert layout == "a:0:10:string,b1:0:2:string,b2:2:2:int,c:10:3:string"
    assert rl == 13


def test_redefines_chain_resumes_after_largest():
    layout, rl = copybook_to_layout("""
       01  REC.
           05  A       PIC X(10).
           05  B REDEFINES A PIC X(4).
           05  C REDEFINES A PIC X(6).
           05  D       PIC X.
    """)
    assert layout == "a:0:10:string,b:0:4:string,c:0:6:string,d:10:1:string"
    assert rl == 11


def test_nameless_filler_reserves_bytes():
    # `05 PIC X(3).` is a legal nameless FILLER: it must reserve its
    # bytes (B at offset 5), not silently vanish as a group item.
    layout, rl = copybook_to_layout("""
       01  REC.
           05  A   PIC X(2).
           05      PIC X(3).
           05  B   PIC 9(2).
    """)
    assert layout == "a:0:2:string,b:5:2:int"
    assert rl == 7


def test_level88_and_comments_ignored():
    layout, rl = copybook_to_layout("""
      * customer status record
       01  REC.
           05  ST   PIC X.
               88  ACTIVE  VALUE 'A'.
               88  CLOSED  VALUE 'C'.
           05  K    PIC 9(4).
    """)
    assert layout == "st:0:1:string,k:1:4:int"
    assert rl == 5


def test_unsupported_constructs_raise():
    with pytest.raises(ValueError, match="COMP-5"):
        copybook_to_layout("01 R. 05 X PIC 9(4) COMP-5.")
    with pytest.raises(ValueError, match="SIGN LEADING on an unsigned"):
        copybook_to_layout("01 R. 05 X PIC 9(4) SIGN LEADING.")
    with pytest.raises(ValueError, match="PICTURE"):
        copybook_to_layout("01 R. 05 X PIC ZZ9.99.")
    with pytest.raises(ValueError, match="no storage"):
        copybook_to_layout("* nothing here")


def test_sign_leading_overpunch_zonedl(tmp_path):
    """SIGN LEADING without SEPARATE = overpunch in the FIRST byte's
    zone (zonedl layout type): copybook -> layout -> encode -> decode
    round-trips, negative zone 0xD lands on byte 0, not the last."""
    import numpy as np
    from hadoop_fixedlengthinputformat_spark.sources.layout import (
        decode_zoned_field, encode_rows,
    )

    cb = """
       01  R.
           05  A  PIC S9(4) SIGN LEADING.
           05  B  PIC S9(3)V99 SIGN IS LEADING.
    """
    layout, rl = copybook_to_layout(cb)
    assert layout == "a:0:4:zonedl(0),b:4:5:zonedl(2)"
    assert rl == 9
    fields = parse_layout(layout, rl)
    rows = [{"a": -1234, "b": 123.45}, {"a": 42, "b": -0.07}]
    blob = encode_rows(rows, fields, rl)
    mat = np.frombuffer(blob, dtype=np.uint8).reshape(-1, rl)
    # the sign zone sits on the FIRST byte of each field
    assert mat[0, 0] >> 4 == 0xD and mat[0, 3] >> 4 == 0xF  # a = -1234
    assert mat[1, 4] >> 4 == 0xD and mat[1, 8] >> 4 == 0xF  # b = -0.07
    a = decode_zoned_field(mat, fields[0], leading=True)
    b = decode_zoned_field(mat, fields[1], leading=True)
    assert a.to_pylist() == [-1234.0, 42.0]
    assert b.to_pylist() == [123.45, -0.07]


def test_round_trip_through_engine(spark, tmp_path):
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen
    from hadoop_fixedlengthinputformat_spark.sources.layout import (
        encode_rows,
    )

    layout, rl = copybook_to_layout("""
       01  REC.
           05  K    PIC 9(4).
           05  BAL  PIC S9(5)V99 COMP-3.
           05  TAG  PIC X(3).
    """)
    fields = parse_layout(layout, rl)
    rows = [
        {"k": 1, "bal": -123.45, "tag": "abc"},
        {"k": 2, "bal": 99999.99, "tag": "xy"},
    ]
    p = str(tmp_path / "cpy.fixed")
    with open(p, "wb") as f:
        f.write(encode_rows(rows, fields, rl))
    fixedlen.register(spark)
    got = {
        r.k: (r.bal, r.tag)
        for r in (
            spark.read.format("fixedlen")
            .option("recordLength", str(rl))
            .option("layout", layout)
            .option("includeOffset", "false")
            .load(p)
            .collect()
        )
    }
    assert got == {1: (-123.45, "abc"), 2: (99999.99, "xy")}


def test_copybook_option_on_fixedlen_reader(spark, tmp_path):
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen
    from hadoop_fixedlengthinputformat_spark.sources.layout import (
        encode_rows,
    )

    cb = """
       01  REC.
           05  K    PIC 9(4).
           05  TAG  PIC X(3).
    """
    layout, rl = copybook_to_layout(cb)
    p = str(tmp_path / "opt.fixed")
    with open(p, "wb") as f:
        f.write(encode_rows(
            [{"k": i, "tag": f"t{i}"} for i in range(5)],
            parse_layout(layout, rl), rl,
        ))
    fixedlen.register(spark)
    # no recordLength, no layout: both derive from the copybook
    df = (
        spark.read.format("fixedlen")
        .option("copybook", cb)
        .option("includeOffset", "false")
        .load(p)
    )
    assert sorted((r.k, r.tag) for r in df.collect()) == [
        (i, f"t{i}") for i in range(5)
    ]
    # a recordLength SMALLER than the copybook span is a contradiction
    with pytest.raises(Exception, match="smaller than the copybook"):
        (
            spark.read.format("fixedlen")
            .option("copybook", cb)
            .option("recordLength", "5")
            .load(p)
            .collect()
        )
    with pytest.raises(Exception, match="mutually exclusive"):
        (
            spark.read.format("fixedlen")
            .option("copybook", cb)
            .option("layout", layout)
            .load(p)
            .collect()
        )


def test_copybook_option_on_varlen_reader(tmp_path):
    import struct

    from hadoop_fixedlengthinputformat_spark.sources.varlen import _VOptions

    cb = """
       01  PFX.
           05  K    PIC 9(6).
           05  TAG  PIC X(4).
    """
    opts = _VOptions.parse({"copybook": cb})
    assert opts.prefix_length == 10
    assert [f.name for f in opts.fields] == ["k", "tag"]


def test_sign_separate_clause_and_decode(spark, tmp_path):
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen
    from hadoop_fixedlengthinputformat_spark.sources.layout import (
        encode_rows,
    )

    cb = """
       01  R.
           05  X  PIC S9(4)V99 SIGN LEADING SEPARATE.
           05  Y  PIC S9(3) SIGN IS TRAILING SEPARATE CHARACTER.
           05  Z  PIC S9(3) SIGN TRAILING.
    """
    layout, rl = copybook_to_layout(cb)
    assert layout == "x:0:7:signl(2),y:7:4:signt(0),z:11:3:zoned(0)"
    assert rl == 14
    fields = parse_layout(layout, rl)
    p = str(tmp_path / "ss.fixed")
    rows = [
        {"x": -1234.56, "y": 789, "z": -5},
        {"x": 0.07, "y": -1, "z": 3},
    ]
    with open(p, "wb") as f:
        f.write(encode_rows(rows, fields, rl))
    # byte-level: explicit sign characters where declared
    blob = open(p, "rb").read()
    assert blob[:7] == b"-123456" and blob[7:11] == b"789+"
    fixedlen.register(spark)
    got = sorted(
        (r.x, r.y, r.z)
        for r in (
            spark.read.format("fixedlen")
            .option("copybook", cb)
            .option("includeOffset", "false")
            .load(p)
            .collect()
        )
    )
    assert got == [(-1234.56, 789.0, -5.0), (0.07, -1.0, 3.0)]


def test_sign_separate_malformed_bytes(spark, tmp_path):
    from hadoop_fixedlengthinputformat_spark.sources import fixedlen

    p = str(tmp_path / "bad_ss.fixed")
    with open(p, "wb") as f:
        f.write(b"x12345")  # 'x' is not a sign character
    fixedlen.register(spark)
    rd = (
        spark.read.format("fixedlen")
        .option("recordLength", "6")
        .option("layout", "v:0:6:signl(0)")
        .option("includeOffset", "false")
    )
    with pytest.raises(Exception, match="sign-separate"):
        rd.load(p).collect()
    rows = (
        rd.option("mode", "permissive").load(p).collect()
    )
    assert rows[0].v is None


def test_level88_conditions_parse():
    from hadoop_fixedlengthinputformat_spark.sources.copybook import (
        conditions,
    )

    conds = {c.name: c for c in conditions("""
        01 R.
           05 STATUS PIC X.
              88 IS-ACTIVE VALUE 'A'.
              88 IS-CLOSED VALUES 'C' 'X'.
           05 AMT PIC 9(4)V99 COMP-3.
              88 SMALL VALUE 0 THRU 9.99.
              88 MIXED VALUES 1 5 THRU 7 42.
    """)}
    assert conds["is_active"].sql == "(status = 'A')"
    assert conds["is_closed"].sql == "(status IN ('C', 'X'))"
    assert conds["small"].sql == "(amt BETWEEN 0 AND 9.99)"
    # THRU range + collected singles OR-combined
    assert conds["mixed"].sql == "(amt BETWEEN 5 AND 7 OR amt IN (1, 42))"
    assert conds["is_active"].field == "status"
    assert conds["small"].field == "amt"


def test_level88_quoting_and_errors():
    import pytest

    from hadoop_fixedlengthinputformat_spark.sources.copybook import (
        conditions,
    )

    # embedded quote doubles; spaces inside literals survive
    (c,) = conditions("""
        01 R.
           05 NM PIC X(20).
              88 ODD VALUE 'O''BRIEN AND SONS'.
    """)
    assert c.sql == "(nm = 'O''BRIEN AND SONS')"
    with pytest.raises(ValueError, match="precedes any elementary"):
        conditions("01 R.\n   88 ORPHAN VALUE 1.")
    with pytest.raises(ValueError, match="no VALUE clause"):
        conditions("01 R.\n 05 A PIC 9.\n 88 BAD.")
    with pytest.raises(ValueError, match="THRU without an upper"):
        conditions("01 R.\n 05 A PIC 9.\n 88 BAD VALUE 1 THRU.")
    with pytest.raises(ValueError, match="neither a quoted string"):
        conditions("01 R.\n 05 A PIC 9.\n 88 BAD VALUE FOO.")


def test_synchronized_inserts_slack_before_binary():
    layout, rl = copybook_to_layout("""
       01  R.
           05  TAG PIC X(3).
           05  N   PIC 9(9) COMP SYNC.
    """)
    # fullword item after a 3-byte field: 1 slack byte before offset 4
    assert layout == "tag:0:3:string,n:4:4:bin"
    assert rl == 8


def test_synchronized_group_propagates_to_children():
    layout, rl = copybook_to_layout("""
       01  R.
           05  TAG PIC X(2).
           05  G SYNCHRONIZED.
               10  H PIC 9(4) COMP.
               10  W PIC 9(9) COMP.
    """)
    # group SYNC aligns every binary child: h at 2 (halfword), w at 4
    assert layout == "tag:0:2:string,h:2:2:bin,w:4:4:bin"
    assert rl == 8


def test_sync_inside_redefines_group_guards_misaligned_overlay():
    """ADVICE r6: a SYNC binary item nested inside a REDEFINES *group*
    must hit the same misalignment guard as an elementary REDEFINES
    item — slack inserted there would silently shift the overlay
    relative to the redefined region."""
    with pytest.raises(ValueError, match="SYNCHRONIZED would shift"):
        copybook_to_layout("""
           01  R.
               05  RAW PIC X(7).
               05  OV REDEFINES RAW.
                   10  PFX PIC X(3).
                   10  N   PIC 9(9) COMP SYNC.
        """)


def test_sync_inside_redefines_group_ok_when_aligned():
    layout, rl = copybook_to_layout("""
       01  R.
           05  RAW PIC X(8).
           05  OV REDEFINES RAW.
               10  PFX PIC X(4).
               10  N   PIC 9(9) COMP SYNC.
    """)
    # overlay starts at 0, n lands at 4 with zero slack — legal
    assert layout == "raw:0:8:string,pfx:0:4:string,n:4:4:bin"
    assert rl == 8
