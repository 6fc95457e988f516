"""Hybrid RLE / bit-packing and 1-bit bitmaps, vectorized with numpy.

Parquet-compatible stream layout (reference:
/root/reference/src/encoding/hybrid_rle/{mod,encoder,decoder,bitmap}.rs):

- bit-packed run: ULEB128 header ``(num_groups << 1) | 1`` where each group
  is 8 values, followed by ``ceil(values*num_bits/8)`` packed bytes;
- RLE run: ULEB128 header ``count << 1``, followed by the repeated value in
  ``ceil(num_bits/8)`` little-endian bytes.

The reference's *encoder* only ever emits the bit-packed branch (a noted
gap, encoder.rs:8); the SURVEY calls out that we SHOULD implement the true
RLE branch to win on repetitive columns — done here: runs of length
>= RLE_THRESHOLD become RLE runs, everything between them is bit-packed.
On inputs with no long runs the output is byte-identical to the
reference's (see golden tests lifted from encoder.rs:100-167).
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .varint import uleb128_decode, uleb128_encode

# A run must be at least this long to be worth an RLE run (header ~2-10
# bytes vs num_bits*len packed bits). 16 also guarantees that after
# stealing <8 values for bit-pack group alignment a useful run remains.
RLE_THRESHOLD = 16


def _emit_bitpacked(parts: list[bytes], values: np.ndarray, num_bits: int) -> None:
    n = len(values)
    if n == 0:
        return
    num_groups = (n + 7) // 8
    parts.append(uleb128_encode((num_groups << 1) | 1))
    parts.append(bitpack.pack(values, num_bits))


def _emit_rle(parts: list[bytes], value: int, count: int, num_bits: int) -> None:
    if count == 0:
        return
    parts.append(uleb128_encode(count << 1))
    width_bytes = max(1, (num_bits + 7) // 8)
    parts.append(int(value).to_bytes(width_bytes, "little"))


def encode(values: np.ndarray, num_bits: int) -> bytes:
    """Hybrid-RLE encode unsigned ints of width ``num_bits``."""
    n = len(values)
    if n == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    parts: list[bytes] = []

    # Run detection, fully vectorized; only *long* runs are visited in
    # Python (≤ n/RLE_THRESHOLD iterations).
    change = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [n])))
    long_runs = np.flatnonzero(lengths >= RLE_THRESHOLD)

    cur = 0  # start of the pending bit-packed span
    for ri in long_runs:
        s = int(starts[ri])
        ln = int(lengths[ri])
        # Steal a few values from the run head so the pending bit-packed
        # span covers a multiple of 8 values (groups must be exact except
        # at end-of-stream).
        steal = (-(s - cur)) % 8
        _emit_bitpacked(parts, v[cur : s + steal], num_bits)
        _emit_rle(parts, int(v[s]), ln - steal, num_bits)
        cur = s + ln
    _emit_bitpacked(parts, v[cur:], num_bits)
    return b"".join(parts)


def decode(buf: bytes | memoryview, num_bits: int, n: int) -> np.ndarray:
    """Decode ``n`` values from a hybrid-RLE stream → uint64 array.

    Handles both run kinds (reference decoder.rs:26-64), including streams
    produced by encoders that pad the final bit-packed group.
    """
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if num_bits == 0:
        return np.zeros(n, dtype=np.uint64)
    buf = memoryview(buf)
    width_bytes = max(1, (num_bits + 7) // 8)
    out: list[np.ndarray] = []
    got = 0
    pos = 0
    total_bytes = len(buf)
    while got < n:
        if pos >= total_bytes:
            raise ValueError(f"truncated hybrid-RLE stream: {got}/{n} values")
        header, pos = uleb128_decode(buf, pos)
        if header & 1:  # bit-packed run
            num_groups = header >> 1
            count = min(num_groups * 8, n - got)
            nbytes = min((num_groups * 8 * num_bits + 7) // 8, total_bytes - pos)
            vals = bitpack.unpack(buf[pos : pos + nbytes], num_bits, count)
            pos += nbytes
            out.append(vals)
            got += count
        else:  # RLE run
            count = header >> 1
            value = int.from_bytes(buf[pos : pos + width_bytes], "little")
            pos += width_bytes
            count = min(count, n - got)
            out.append(np.full(count, value, dtype=np.uint64))
            got += count
    return out[0] if len(out) == 1 else np.concatenate(out)


def encode_bool(values: np.ndarray) -> bytes:
    """Booleans as a single bit-packed (1-bit) hybrid-RLE run.

    Byte-identical to the reference's ``encode_bool``
    (encoder.rs bool tests: header ``(groups<<1)|1`` + LSB-first bitmap).
    """
    v = np.ascontiguousarray(values, dtype=bool)
    parts: list[bytes] = []
    _emit_bitpacked(parts, v.astype(np.uint64), 1)
    return b"".join(parts)


def decode_bool(buf: bytes | memoryview, n: int) -> np.ndarray:
    return decode(buf, 1, n).astype(bool)


def pack_bitmap(values: np.ndarray) -> bytes:
    """Raw LSB-first bitmap (reference bitmap.rs:14-102), no header."""
    return np.packbits(np.ascontiguousarray(values, dtype=bool), bitorder="little").tobytes()


def unpack_bitmap(buf: bytes | memoryview, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n, bitorder="little").astype(
        bool
    )


def encode_for(values: np.ndarray) -> bytes:
    """Frame-of-reference + hybrid-RLE/bit-pack for integer columns:
    ``[zigzag-uleb min][u8 width][uleb n][hybrid-RLE of v - min]``.

    The "int range small → bit-pack" selector target (SURVEY §4): unlike
    delta it needs no sortedness, and repeated values become RLE runs.
    """
    from .varint import uleb128_encode, zigzag_leb128_encode

    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return zigzag_leb128_encode(0) + bytes([0]) + uleb128_encode(0)
    lo = int(v.min())
    span = int(v.max()) - lo
    width = span.bit_length()
    # modular uint64 shift so extreme min/max pairs can't overflow
    shifted = v.astype(np.uint64) - np.uint64(lo & ((1 << 64) - 1))
    return (
        zigzag_leb128_encode(lo)
        + bytes([width])
        + uleb128_encode(n)
        + encode(shifted, width)
    )


def decode_for(buf: bytes | memoryview) -> np.ndarray:
    from .varint import uleb128_decode, zigzag_leb128_decode

    buf = memoryview(buf)
    lo, pos = zigzag_leb128_decode(buf, 0)
    width = buf[pos]
    n, pos = uleb128_decode(buf, pos + 1)
    vals = decode(buf[pos:], width, n)
    return (vals + np.uint64(lo & ((1 << 64) - 1))).astype(np.int64)
