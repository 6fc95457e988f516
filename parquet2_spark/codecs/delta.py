"""DELTA_BINARY_PACKED — frame-of-reference + bit-pack over deltas.

Parquet-compatible layout (reference:
/root/reference/src/encoding/delta_bitpacked/{encoder,decoder}.rs):

  header  = ULEB128(block_size=128) ULEB128(miniblocks_per_block=1)
            ULEB128(total_count) zigzag-ULEB128(first_value)
  block   = zigzag-ULEB128(min_delta) [bitwidth: 1 byte]
            bit-packed (delta - min_delta) padded to a full block
            (128 * bitwidth / 8 bytes, zero-padded — the reference pads
            too, see encoder.rs negative_min_delta test)

This is exactly the reference's math re-done in numpy: ``d = np.diff(v)``,
``d -= d.min()`` per block, bit-pack. Same-width blocks are packed in one
batched numpy call (128*w bits is always a whole number of bytes, so rows
concatenate cleanly).
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .varint import (
    uleb128_decode,
    uleb128_encode,
    zigzag_leb128_decode,
    zigzag_leb128_encode,
)

BLOCK_SIZE = 128
MINIBLOCKS = 1


def encode(values: np.ndarray) -> bytes:
    """Encode an int64 array. Empty input → count-0 header."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    parts = [
        uleb128_encode(BLOCK_SIZE),
        uleb128_encode(MINIBLOCKS),
        uleb128_encode(n),
        zigzag_leb128_encode(int(v[0]) if n else 0),
    ]
    if n <= 1:
        return b"".join(parts)

    # int64 wraparound is fine: decode cumsums in the same modular arithmetic.
    with np.errstate(over="ignore"):
        deltas = v[1:].astype(np.int64) - v[:-1].astype(np.int64)
    nd = len(deltas)
    nblocks = (nd + BLOCK_SIZE - 1) // BLOCK_SIZE
    starts = np.arange(nblocks) * BLOCK_SIZE
    mins = np.minimum.reduceat(deltas, starts)
    maxs = np.maximum.reduceat(deltas, starts)
    # width from the zigzag/unsigned span max-min (uint64 to dodge overflow)
    spans = maxs.astype(np.uint64) - mins.astype(np.uint64)
    widths = np.array([int(s).bit_length() for s in spans], dtype=np.int64)

    # frame-of-reference shift, zero-padded to nblocks*BLOCK_SIZE
    padded = np.zeros(nblocks * BLOCK_SIZE, dtype=np.uint64)
    with np.errstate(over="ignore"):
        padded[:nd] = deltas.astype(np.uint64) - np.repeat(
            mins.astype(np.uint64), np.diff(np.concatenate((starts, [nd])))
        )

    # batch-pack all blocks sharing a width in one numpy call
    packed_by_block: list[bytes] = [b""] * nblocks
    blocks2d = padded.reshape(nblocks, BLOCK_SIZE)
    for w in np.unique(widths):
        w = int(w)
        idx = np.flatnonzero(widths == w)
        if w == 0:
            continue
        flat = blocks2d[idx].ravel()
        raw = bitpack.pack(flat, w)
        per = BLOCK_SIZE * w // 8
        for j, bi in enumerate(idx):
            packed_by_block[int(bi)] = raw[j * per : (j + 1) * per]

    for bi in range(nblocks):
        parts.append(zigzag_leb128_encode(int(mins[bi])))
        parts.append(bytes([int(widths[bi])]))
        parts.append(packed_by_block[bi])
    return b"".join(parts)


def decode(buf: bytes | memoryview) -> np.ndarray:
    """Decode a DELTA_BINARY_PACKED stream → int64 array."""
    return decode_consumed(buf)[0]


def decode_consumed(buf: bytes | memoryview) -> tuple[np.ndarray, int]:
    """Decode and also return the stream end offset (the stream is
    self-delimiting, which lets callers append payloads after it)."""
    buf = memoryview(buf)
    block_size, pos = uleb128_decode(buf, 0)
    miniblocks, pos = uleb128_decode(buf, pos)
    if miniblocks != 1:
        raise ValueError(f"unsupported miniblock count {miniblocks}")
    n, pos = uleb128_decode(buf, pos)
    first, pos = zigzag_leb128_decode(buf, pos)
    if n == 0:
        return np.zeros(0, dtype=np.int64), pos
    if n == 1:
        return np.array([first], dtype=np.int64), pos

    nd = n - 1
    nblocks = (nd + block_size - 1) // block_size
    # metadata pass first, then one bitpack.unpack per RUN of same-width
    # blocks: each block's packed section is byte-aligned
    # (block_size*width/8 whole bytes), so concatenated sections unpack as
    # one value stream — per-block unpack overhead dominated lens-heavy
    # chunk decode (5k calls → ~hundreds)
    metas = []  # (min_delta, width, start, nbytes)
    for _ in range(nblocks):
        min_delta, pos = zigzag_leb128_decode(buf, pos)
        width = buf[pos]
        pos += 1
        nbytes = block_size * width // 8
        metas.append((min_delta, width, pos, nbytes))
        pos += nbytes
    deltas = np.empty(nblocks * block_size, dtype=np.int64)
    mask64 = (1 << 64) - 1
    with np.errstate(over="ignore"):
        i = 0
        while i < nblocks:
            w = metas[i][1]
            j = i + 1
            while j < nblocks and metas[j][1] == w:
                j += 1
            cnt = j - i
            if w == 0:
                vals = np.zeros(cnt * block_size, dtype=np.uint64)
            elif cnt == 1:
                m = metas[i]
                vals = bitpack.unpack(buf[m[2] : m[2] + m[3]], w, block_size)
            else:
                joined = b"".join(bytes(buf[m[2] : m[2] + m[3]]) for m in metas[i:j])
                vals = bitpack.unpack(joined, w, cnt * block_size)
            md = np.repeat(
                np.array([m[0] & mask64 for m in metas[i:j]], dtype=np.uint64), block_size
            )
            deltas[i * block_size : j * block_size] = (vals + md).astype(np.int64)
            i = j

    out = np.empty(n, dtype=np.int64)
    out[0] = first
    with np.errstate(over="ignore"):
        out[1:] = first + np.cumsum(deltas[:nd], dtype=np.int64)
    return out, pos
