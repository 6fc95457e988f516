"""Unit round-trips + golden bytes for varint/bitpack/rle/delta.

Mirrors the reference's per-module test layer (SURVEY.md §5.1): golden byte
vectors lifted from /root/reference/src/encoding/* unit tests wherever our
layout is parquet-compatible, plus deterministic large-input roundtrips
(the reference notes its delta encodings lacked large-input coverage —
README.md:54-56 — so we hammer them here).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet2_spark.codecs import bitpack, delta, rle
from parquet2_spark.codecs.varint import (
    uleb128_decode,
    uleb128_encode,
    zigzag_decode,
    zigzag_encode,
    zigzag_leb128_decode,
    zigzag_leb128_encode,
)

RNG = np.random.default_rng(42)


# ---------------------------------------------------------------- varint
def test_uleb128_golden():
    # reference src/encoding/uleb128.rs:52-66
    assert uleb128_decode(bytes([0xE5, 0x8E, 0x26, 0xDE, 0xAD])) == (624_485, 3)
    assert uleb128_decode(bytes([0b00010000, 0b1, 0b11])) == (16, 1)


@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_uleb128_roundtrip(v):
    assert uleb128_decode(uleb128_encode(v)) == (v, len(uleb128_encode(v)))


@given(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
def test_zigzag_roundtrip(v):
    assert zigzag_decode(zigzag_encode(v)) == v
    assert zigzag_leb128_decode(zigzag_leb128_encode(v)) == (v, len(zigzag_leb128_encode(v)))


def test_zigzag_golden():
    assert [zigzag_encode(v) for v in [0, -1, 1, -2, 2]] == [0, 1, 2, 3, 4]


# ---------------------------------------------------------------- bitpack
@pytest.mark.parametrize("num_bits", [1, 2, 3, 5, 7, 8, 10, 13, 16, 20, 24, 32, 40, 57, 64])
@pytest.mark.parametrize("n", [1, 7, 8, 9, 100, 4096])
def test_bitpack_roundtrip(num_bits, n):
    hi = (1 << num_bits) - 1
    vals = RNG.integers(0, hi, size=n, endpoint=True, dtype=np.uint64)
    buf = bitpack.pack(vals, num_bits)
    assert len(buf) == (n * num_bits + 7) // 8
    out = bitpack.unpack(buf, num_bits, n)
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("num_bits", list(range(1, 65)))
def test_bitpack_c_kernel_matches_numpy(num_bits):
    """The C pack/unpack kernels must be byte-identical to the pure-numpy
    fallbacks at every width (including unaligned tails)."""
    from parquet2_spark.codecs import native

    if native.get() is None:
        pytest.skip("no C compiler on this host")
    for n in (1, 3, 8, 9, 127, 1000):
        if num_bits == 64:
            vals = RNG.integers(0, 1 << 63, n, dtype=np.uint64) * 2 + RNG.integers(
                0, 2, n, dtype=np.uint64
            )
        else:
            vals = RNG.integers(0, (1 << num_bits) - 1, n, endpoint=True, dtype=np.uint64)
        ref = bitpack._pack_numpy(vals, num_bits)
        assert native.pack_bits(vals, num_bits) == ref, (num_bits, n)
        raw = np.frombuffer(ref, dtype=np.uint8)
        np.testing.assert_array_equal(
            native.unpack_bits(raw, num_bits, n),
            bitpack._unpack_numpy(raw, num_bits, n, len(raw)),
            err_msg=f"w={num_bits} n={n}",
        )


def test_bitpack_width_zero():
    assert bitpack.pack(np.zeros(5, dtype=np.uint64), 0) == b""
    np.testing.assert_array_equal(bitpack.unpack(b"", 0, 5), np.zeros(5, dtype=np.uint64))


def test_bits_needed():
    assert [bitpack.bits_needed(v) for v in [0, 1, 2, 3, 4, 255, 256]] == [0, 1, 2, 2, 3, 8, 9]


# ---------------------------------------------------------------- hybrid RLE
def test_rle_golden_u32():
    # reference encoder.rs test_encode_u32: bit-packed-only stream
    buf = rle.encode(np.array([0, 1, 2, 1, 2, 1, 1, 0, 3], dtype=np.uint64), 2)
    assert buf == bytes([(2 << 1) | 1, 0b01_10_01_00, 0b00_01_01_10, 0b00_00_00_11])
    out = rle.decode(buf, 2, 9)
    np.testing.assert_array_equal(out, [0, 1, 2, 1, 2, 1, 1, 0, 3])


def test_rle_golden_u32_large():
    # reference encoder.rs test_encode_u32_large
    vals = np.arange(128, dtype=np.uint64) % 4
    buf = rle.encode(vals, 2)
    expected = bytes([((128 // 8) << 1) | 1]) + bytes([0b11_10_01_00] * (128 // 4))
    assert buf == expected
    np.testing.assert_array_equal(rle.decode(buf, 2, 128), vals)


def test_rle_golden_u32_other():
    # reference encoder.rs test_u32_other
    vals = np.array([3, 3, 0, 3, 2, 3, 3, 3, 3, 1, 3, 3, 3, 0, 3], dtype=np.uint64)
    buf = rle.encode(vals, 2)
    assert buf == bytes([5, 207, 254, 247, 51])
    np.testing.assert_array_equal(rle.decode(buf, 2, 15), vals)


def test_rle_golden_bool():
    # reference encoder.rs bool_basics_1 / bool_from_iter
    bools14 = rle.unpack_bitmap(bytes([0b10011101, 0b10011101]), 14)
    buf = rle.encode_bool(bools14)
    assert buf == bytes([(2 << 1) | 1, 0b10011101, 0b00011101])
    np.testing.assert_array_equal(rle.decode_bool(buf, 14), bools14)

    buf = rle.encode_bool(np.ones(8, dtype=bool))
    assert buf == bytes([(1 << 1) | 1, 0b11111111])


def test_rle_emits_true_rle_runs():
    """The reference encoder skips the RLE branch (encoder.rs:8); ours must
    emit it and beat pure bit-packing on repetitive data."""
    vals = np.repeat(np.array([7, 1, 7], dtype=np.uint64), [5000, 4000, 1000])
    buf = rle.encode(vals, 3)
    assert len(buf) < 30  # 3 RLE runs ≈ 3 * (2-3 header + 1 value) bytes
    np.testing.assert_array_equal(rle.decode(buf, 3, len(vals)), vals)


@pytest.mark.parametrize("num_bits", [1, 2, 5, 8, 12, 20, 32])
def test_rle_mixed_roundtrip(num_bits):
    hi = (1 << num_bits) - 1
    pieces = []
    for i in range(30):
        if i % 3 == 0:
            pieces.append(np.full(int(RNG.integers(1, 200)), RNG.integers(0, hi + 1), np.uint64))
        else:
            pieces.append(RNG.integers(0, hi, size=int(RNG.integers(1, 50)), endpoint=True, dtype=np.uint64))
    vals = np.concatenate(pieces)
    buf = rle.encode(vals, num_bits)
    np.testing.assert_array_equal(rle.decode(buf, num_bits, len(vals)), vals)


@given(st.lists(st.integers(0, 3), min_size=1, max_size=300))
@settings(max_examples=50, deadline=None)
def test_rle_hypothesis_2bit(xs):
    vals = np.array(xs, dtype=np.uint64)
    buf = rle.encode(vals, 2)
    np.testing.assert_array_equal(rle.decode(buf, 2, len(vals)), vals)


def test_bitmap_roundtrip():
    v = RNG.integers(0, 2, size=1001).astype(bool)
    np.testing.assert_array_equal(rle.unpack_bitmap(rle.pack_bitmap(v), 1001), v)


# ---------------------------------------------------------------- delta
def test_delta_golden_constant():
    # reference delta_bitpacked/encoder.rs constant_delta
    buf = delta.encode(np.array([1, 2, 3, 4, 5], dtype=np.int64))
    assert buf == bytes([128, 1, 1, 5, 2, 2, 0])
    np.testing.assert_array_equal(delta.decode(buf), [1, 2, 3, 4, 5])


def test_delta_golden_negative_min():
    # reference delta_bitpacked/encoder.rs negative_min_delta
    buf = delta.encode(np.array([1, 2, 3, 4, 5, 1], dtype=np.int64))
    expected = bytes([128, 1, 1, 6, 2, 7, 3, 0b01101101, 0b00001011]) + bytes(128 * 3 // 8 - 2)
    assert buf == expected
    np.testing.assert_array_equal(delta.decode(buf), [1, 2, 3, 4, 5, 1])


@pytest.mark.parametrize(
    "vals",
    [
        np.array([], dtype=np.int64),
        np.array([42], dtype=np.int64),
        np.array([-(1 << 62), 1 << 62], dtype=np.int64),
        np.arange(100000, dtype=np.int64) * 1000 + 1_700_000_000_000_000,  # timestamps
        RNG.integers(-(1 << 40), 1 << 40, size=12345).astype(np.int64),
        np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max, 0, -1], dtype=np.int64),
    ],
    ids=["empty", "single", "extremes", "ts-monotone", "random", "minmax"],
)
def test_delta_roundtrip(vals):
    np.testing.assert_array_equal(delta.decode(delta.encode(vals)), vals)


@given(st.lists(st.integers(-(1 << 63), (1 << 63) - 1), max_size=400))
@settings(max_examples=50, deadline=None)
def test_delta_hypothesis(xs):
    vals = np.array(xs, dtype=np.int64)
    np.testing.assert_array_equal(delta.decode(delta.encode(vals)), vals)


@given(
    num_bits=st.integers(min_value=1, max_value=64),
    n=st.integers(min_value=1, max_value=700),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=120, deadline=None)
def test_bitpack_roundtrip_hypothesis(num_bits, n, seed):
    """Arbitrary (width, count) pairs through whichever kernel is active
    (C when a compiler exists, numpy otherwise) — exercises the unaligned
    buffer-tail paths the parametrized matrix can miss."""
    rng = np.random.default_rng(seed)
    if num_bits == 64:
        vals = rng.integers(0, 1 << 63, n, dtype=np.uint64) * 2 + rng.integers(
            0, 2, n, dtype=np.uint64
        )
    else:
        vals = rng.integers(0, (1 << num_bits) - 1, n, endpoint=True, dtype=np.uint64)
    buf = bitpack.pack(vals, num_bits)
    assert len(buf) == (n * num_bits + 7) // 8
    np.testing.assert_array_equal(bitpack.unpack(buf, num_bits, n), vals)
