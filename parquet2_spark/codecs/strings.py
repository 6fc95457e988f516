"""String/byte-array encodings: DELTA_LENGTH_BYTE_ARRAY and
DELTA_BYTE_ARRAY (incremental / front coding).

Reference parity: E11-E14 (SURVEY §2.A):
- delta-length (src/encoding/delta_length_byte_array/encoder.rs:7-19):
  DELTA_BINARY_PACKED over the lengths, then the raw concatenated bytes —
  identical semantics here (our plain.encode_binary already *is* this
  layout; kept as an alias for codec parity).
- delta-byte-array (src/encoding/delta_byte_array/encoder.rs:6-33):
  per item, length of the shared prefix with the previous item
  (delta-packed) + the remaining suffix (delta-length encoded). Strong on
  sorted URL runs (front coding).

Prefix computation is vectorized by comparing a clamped (n, PREFIX_CAP)
byte matrix of row i against row i-1 — prefixes longer than PREFIX_CAP are
truncated, which only costs compression, never correctness.
"""

from __future__ import annotations

import numpy as np

from . import delta, plain
from .barray import BinArray

PREFIX_CAP = 64

# E11/E12 — delta-length is exactly our plain binary layout.
encode_delta_length = plain.encode_binary
decode_delta_length = plain.decode_binary


def _prefix_lengths(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Common-prefix length of each value with its predecessor (first = 0),
    capped at PREFIX_CAP bytes. Fully vectorized."""
    n = len(offsets) - 1
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    lens = np.diff(offsets)
    # (n, CAP) matrix of the first CAP bytes of each value, zero-padded —
    # gather indices clamped into the buffer, then masked by length.
    col = np.arange(PREFIX_CAP, dtype=np.int64)
    idx = offsets[:-1, None] + col[None, :]
    np.clip(idx, 0, max(0, len(data) - 1), out=idx)
    mat = data[idx] if len(data) else np.zeros((n, PREFIX_CAP), dtype=np.uint8)
    valid = col[None, :] < lens[:, None]
    mat = np.where(valid, mat, 0)

    eq = (mat[1:] == mat[:-1]) & valid[1:] & valid[:-1]
    # prefix length = leading run of equal bytes
    pl = np.zeros(n, dtype=np.int64)
    pl[1:] = np.where(eq.all(axis=1), PREFIX_CAP, eq.argmin(axis=1))
    pl[1:] = np.minimum(pl[1:], np.minimum(lens[1:], lens[:-1]))
    return pl


def encode_delta_byte_array(arr: BinArray) -> bytes:
    offsets, data_b = arr
    data = np.frombuffer(data_b, dtype=np.uint8)
    pl = _prefix_lengths(offsets, data)
    lens = np.diff(offsets)
    suf_lens = lens - pl
    # gather suffix bytes: for value i, bytes [offsets[i]+pl[i], offsets[i+1])
    total = int(suf_lens.sum())
    starts = offsets[:-1] + pl
    pos0 = np.zeros(len(suf_lens) + 1, dtype=np.int64)
    np.cumsum(suf_lens, out=pos0[1:])
    # single-repeat gather: repeat(starts)+within == arange + repeat(starts-pos0)
    take = np.arange(total) + np.repeat(starts - pos0[:-1], suf_lens)
    suffixes = data[take].tobytes() if total else b""
    return delta.encode(pl) + delta.encode(suf_lens) + suffixes


def decode_delta_byte_array(buf: bytes | memoryview) -> BinArray:
    """Sequential-by-construction reconstruction (each value needs its
    predecessor). Loop is per *value*, but prefix bytes are copied with
    slice ops; selector only picks this codec when it wins on size.
    """
    buf = memoryview(buf)
    pl, pos = delta.decode_consumed(buf)
    suf_lens, pos2 = delta.decode_consumed(buf[pos:])
    sdata = bytes(buf[pos + pos2 :])
    n = len(pl)
    if len(suf_lens) != n:
        raise ValueError("prefix/suffix count mismatch")
    out_lens = pl + suf_lens
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_lens, out=offsets[1:])
    from . import native

    fast = native.front_decode(pl, suf_lens, sdata, int(offsets[-1]))
    if fast is not None:
        return offsets, fast
    out = bytearray(int(offsets[-1]))
    spos = 0
    prev_start = 0
    for i in range(n):
        start = int(offsets[i])
        p = int(pl[i])
        s = int(suf_lens[i])
        if p:
            out[start : start + p] = out[prev_start : prev_start + p]
        if s:
            out[start + p : start + p + s] = sdata[spos : spos + s]
            spos += s
        prev_start = start
    return offsets, bytes(out)
