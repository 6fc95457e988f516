"""K-bit LSB-first bit-packing: C kernel with a numpy fallback.

Parquet-compatible layout (same math as the reference's const-generic pack
kernels, /root/reference/src/encoding/bitpacked/{encode,decode}.rs and
pack.rs/unpack.rs): value i occupies bits [i*num_bits, (i+1)*num_bits) of the
output, least-significant-bit first within each byte.

The reference monomorphizes per-width Rust kernels; here ONE generic C
kernel (unaligned 8-byte window + shift per value, codecs/_native.c)
covers all widths, with a numpy bit-matrix transform as the
compiler-less fallback. Both paths are byte-identical (asserted in
tests); the C unpack is the decode hot path's floor-setter — the numpy
unpackbits route materializes an n*num_bits byte matrix, ~8× the
payload traffic.
"""

from __future__ import annotations

import numpy as np

from . import native


def bits_needed(max_value: int) -> int:
    """Smallest width that can hold ``max_value`` (0 → 0 bits).

    Mirrors the reference's ``get_bit_width`` (src/read/levels.rs:3-5).
    """
    return int(max_value).bit_length()


def pack(values: np.ndarray, num_bits: int) -> bytes:
    """Pack unsigned ints (< 2**num_bits) into ceil(n*num_bits/8) bytes."""
    n = len(values)
    if n == 0 or num_bits == 0:
        return b""
    if num_bits > 64:
        raise ValueError(f"num_bits {num_bits} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if num_bits < 64:
        # low-bits extraction, matching the numpy path's semantics (the C
        # kernel ORs whole words, so stray high bits would corrupt
        # neighbors)
        v = v & np.uint64((1 << num_bits) - 1)
    out = native.pack_bits(v, num_bits)
    if out is not None:
        return out
    return _pack_numpy(v, num_bits)


def _pack_numpy(v: np.ndarray, num_bits: int) -> bytes:
    n = len(v)
    bits = np.empty((n, num_bits), dtype=np.uint8)
    for b in range(num_bits):
        bits[:, b] = (v >> np.uint64(b)).astype(np.uint8) & 1
    packed = np.packbits(bits.ravel(), bitorder="little")
    return packed[: (n * num_bits + 7) // 8].tobytes()


def unpack(buf: bytes | memoryview | np.ndarray, num_bits: int, n: int) -> np.ndarray:
    """Unpack ``n`` values of width ``num_bits`` from ``buf`` → uint64 array.

    Tolerates a truncated final byte group (zero-extended), like the
    reference decoder's bounds-checked remainder path.
    """
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if num_bits == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    need_bytes = (n * num_bits + 7) // 8
    if len(raw) < need_bytes:
        raise ValueError(f"buffer too small: {len(raw)} < {need_bytes}")
    out = native.unpack_bits(raw, num_bits, n)
    if out is not None:
        return out
    return _unpack_numpy(raw, num_bits, n, need_bytes)


def _unpack_numpy(raw: np.ndarray, num_bits: int, n: int, need_bytes: int) -> np.ndarray:
    bits = np.unpackbits(raw[:need_bytes], count=n * num_bits, bitorder="little")
    bits = bits.reshape(n, num_bits)
    out = np.zeros(n, dtype=np.uint64)
    for b in range(num_bits):
        out |= bits[:, b].astype(np.uint64) << np.uint64(b)
    return out
