"""COMP-3 packed decimal: round trips, sign handling, malformed nibbles."""

from __future__ import annotations

import numpy as np
import pytest

from hadoop_fixedlengthinputformat_spark.sources.layout import (
    FieldSpec,
    decode_packed_field,
    encode_packed,
)


def _mat(payload: bytes, width: int) -> np.ndarray:
    return np.frombuffer(payload, dtype=np.uint8).reshape(-1, width)


F7 = FieldSpec("amt", 0, 7, "packed(2)")


@pytest.mark.parametrize(
    "value", [0.0, 0.01, -0.01, 123.45, -9999999.99, 42.0, -0.5]
)
def test_packed_round_trip(value):
    raw = encode_packed(value, F7)
    assert len(raw) == 7
    out = decode_packed_field(_mat(raw, 7), F7).to_pylist()
    assert out == [value]


def test_packed_sign_nibbles():
    # 0xF (unsigned) must read as positive too
    raw = bytearray(encode_packed(123.45, F7))
    raw[-1] = (raw[-1] & 0xF0) | 0x0F
    assert decode_packed_field(_mat(bytes(raw), 7), F7).to_pylist() == [123.45]


def test_packed_invalid_nibble_failfast_and_permissive():
    raw = bytearray(encode_packed(1.0, F7))
    raw[0] = 0xAB  # digit nibbles > 9
    with pytest.raises(ValueError, match="invalid packed-decimal"):
        decode_packed_field(_mat(bytes(raw), 7), F7)
    out = decode_packed_field(_mat(bytes(raw), 7), F7, permissive=True)
    assert out.to_pylist() == [None]


def test_packed_overflow_rejected():
    with pytest.raises(ValueError, match="does not fit"):
        encode_packed(10**12, F7)  # 14 digits > 13 available
    with pytest.raises(ValueError, match="exceeds int64"):
        decode_packed_field(
            _mat(b"\x00" * 10, 10), FieldSpec("x", 0, 10, "packed(2)")
        )


# ---------------------------------------------------------------------------
# zoned decimal

from hadoop_fixedlengthinputformat_spark.sources.layout import (  # noqa: E402
    decode_zoned_field,
    encode_zoned,
)

Z9 = FieldSpec("amt", 0, 9, "zoned(2)")


@pytest.mark.parametrize(
    "value", [0.0, 0.01, -0.01, 123.45, -9999999.99, 42.0]
)
def test_zoned_round_trip(value):
    raw = encode_zoned(value, Z9)
    assert len(raw) == 9
    # every byte is EBCDIC-zone digit except the sign overpunch
    assert all(b >> 4 == 0xF for b in raw[:-1])
    out = decode_zoned_field(_mat(raw, 9), Z9).to_pylist()
    assert out == [value]


def test_zoned_unsigned_zone_reads_positive():
    raw = bytearray(encode_zoned(123.45, Z9))
    raw[-1] = 0xF0 | (raw[-1] & 0x0F)
    assert decode_zoned_field(_mat(bytes(raw), 9), Z9).to_pylist() == [123.45]


def test_zoned_invalid_zone_failfast_and_permissive():
    raw = bytearray(encode_zoned(1.0, Z9))
    raw[0] = 0x31  # ASCII '1': zone 0x3, not EBCDIC 0xF
    with pytest.raises(ValueError, match="invalid zoned-decimal"):
        decode_zoned_field(_mat(bytes(raw), 9), Z9)
    out = decode_zoned_field(_mat(bytes(raw), 9), Z9, permissive=True)
    assert out.to_pylist() == [None]


# ---------------------------------------------------------------------------
# implied decimal (text path)

from hadoop_fixedlengthinputformat_spark.sources.layout import (  # noqa: E402
    decode_field,
    format_value,
)

I8 = FieldSpec("amt", 0, 8, "implied(2)")


@pytest.mark.parametrize("value", [0.0, 0.01, -0.01, 123.45, 999999.99])
def test_implied_round_trip(value):
    s = format_value(value, I8)
    assert len(s) == 8 and "." not in s
    out = decode_field(_mat(s.encode(), 8), I8).to_pylist()
    assert out == [value]


def test_implied_garbage_failfast_and_permissive():
    raw = b"12x45678"
    with pytest.raises(Exception):
        decode_field(_mat(raw, 8), I8)
    out = decode_field(_mat(raw, 8), I8, permissive=True)
    assert out.to_pylist() == [None]


# ---------------------------------------------------------------------------
# big-endian binary (COMP-4)

from hadoop_fixedlengthinputformat_spark.sources.layout import (  # noqa: E402
    decode_bin_field,
    encode_bin,
)


@pytest.mark.parametrize("width", [1, 2, 4, 8])
@pytest.mark.parametrize("sign", [1, -1])
def test_bin_round_trip(width, sign):
    f = FieldSpec("k", 0, width, "bin")
    value = sign * (2 ** (8 * width - 1) - 1)  # extreme magnitudes
    raw = encode_bin(value, f)
    assert len(raw) == width
    assert decode_bin_field(_mat(raw, width), f).to_pylist() == [value]


def test_bin_rejects_bad_width_and_overflow():
    with pytest.raises(ValueError, match="width must be"):
        decode_bin_field(_mat(b"\x00" * 3, 3), FieldSpec("k", 0, 3, "bin"))
    with pytest.raises(ValueError, match="does not fit"):
        encode_bin(2**31, FieldSpec("k", 0, 4, "bin"))
