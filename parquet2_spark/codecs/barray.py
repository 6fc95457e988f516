"""Arrow-style byte-array column representation used by all binary codecs.

A binary/string column of n values is ``(offsets, data)``:

- ``offsets``: int64 array of n+1 monotonically non-decreasing positions
- ``data``:    one contiguous ``bytes`` buffer

This mirrors how the reference's consumers hand PLAIN byte arrays to Arrow
(offsets + values buffers; reference plain layout spec:
/root/reference/src/encoding/plain_byte_array.rs — we keep the buffers
split instead of interleaving [len][bytes] records, because the split form
is what Arrow/pandas already hold and it decodes with pure vectorized ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BinArray = tuple[np.ndarray, bytes]


def from_pylist(values: list[bytes]) -> BinArray:
    lengths = np.fromiter((len(v) for v in values), dtype=np.int64, count=len(values))
    offsets = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return offsets, b"".join(values)


def to_pylist(arr: BinArray) -> list[bytes]:
    offsets, data = arr
    return [bytes(data[offsets[i] : offsets[i + 1]]) for i in range(len(offsets) - 1)]


def from_arrow(arr: pa.Array) -> BinArray:
    """Zero-copy-ish conversion from a pyarrow binary/string array.

    Nulls must already be stripped (codecs see non-null values only;
    validity travels in the blob's def-level section).
    """
    if arr.null_count:
        raise ValueError("strip nulls before encoding values")
    if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.binary())
    elif pa.types.is_string(arr.type):
        arr = arr.cast(pa.binary())
    elif not pa.types.is_binary(arr.type):
        raise TypeError(f"not a binary-like arrow array: {arr.type}")
    buffers = arr.buffers()
    off = np.frombuffer(buffers[1], dtype=np.int32, count=len(arr) + 1 + arr.offset)[
        arr.offset :
    ].astype(np.int64)
    data_buf = buffers[2] if buffers[2] is not None else b""
    data = bytes(data_buf)[off[0] : off[-1]] if len(arr) else b""
    return off - off[0], data


def to_arrow(arr: BinArray, as_string: bool = False) -> pa.Array:
    offsets, data = arr
    n = len(offsets) - 1
    if offsets[-1] > np.iinfo(np.int32).max:
        out = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n, [None, pa.py_buffer(offsets.astype(np.int64)), pa.py_buffer(data)]
        )
        return out.cast(pa.large_string()) if as_string else out
    out = pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offsets.astype(np.int32)), pa.py_buffer(data)]
    )
    return out.cast(pa.string()) if as_string else out


def lengths(arr: BinArray) -> np.ndarray:
    return np.diff(arr[0])


def equal(a: BinArray, b: BinArray) -> bool:
    return np.array_equal(a[0], b[0]) and a[1] == b[1]
