"""PLAIN encoding: little-endian fixed-width natives; split-buffer byte arrays.

Reference parity: E1-E3 (SURVEY §2.A). Natives are the LE concat the
reference specifies (src/parquet_bridge.rs:293-300 / src/deserialize/
native.rs:15-26 — ``np.frombuffer`` is the numpy spelling of
``ChunksExact<size_of<T>>``). Byte arrays use the Arrow split-buffer form
(delta-encoded lengths stream + raw concatenated bytes) rather than the
interleaved ``[u32 len][bytes]`` records, because interleaved records
cannot be *decoded* without a sequential scan — the split form is
vectorizable both ways and is what the reference's consumers build anyway.
"""

from __future__ import annotations

import numpy as np

from . import delta
from .barray import BinArray


def encode_native(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values).tobytes()


def decode_native(buf: bytes | memoryview, dtype: np.dtype) -> np.ndarray:
    return np.frombuffer(buf, dtype=dtype)


def encode_binary(arr: BinArray) -> bytes:
    """[delta-packed lengths][raw bytes] — self-delimiting."""
    offsets, data = arr
    lens = np.diff(offsets)
    return delta.encode(lens) + data


def decode_binary(buf: bytes | memoryview) -> BinArray:
    return decode_binary_consumed(buf)[0]


def decode_binary_consumed(buf: bytes | memoryview) -> tuple[BinArray, int]:
    lens, pos = delta.decode_consumed(memoryview(buf))
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    end = pos + int(offsets[-1])
    return (offsets, bytes(memoryview(buf)[pos:end])), end


def encode_byte_stream_split(values: np.ndarray) -> bytes:
    """BYTE_STREAM_SPLIT: transpose the byte planes of fixed-width values
    so same-significance bytes are contiguous (floats compress far better
    under a block codec). The reference lists this encoding as *not
    implemented* (README.md:35-39) — implemented here from the public
    parquet-format spec."""
    v = np.ascontiguousarray(values)
    width = v.dtype.itemsize
    return v.view(np.uint8).reshape(-1, width).T.tobytes()


def decode_byte_stream_split(buf: bytes | memoryview, dtype: np.dtype, n: int) -> np.ndarray:
    width = np.dtype(dtype).itemsize
    planes = np.frombuffer(buf, dtype=np.uint8, count=n * width).reshape(width, n)
    return np.ascontiguousarray(planes.T).reshape(-1).view(dtype)[:n]
