"""RLE_DICTIONARY: symbol table stored once per chunk + hybrid-RLE codes.

Reference parity: E15/E16 (SURVEY §2.A) — dict values live in a ``DictPage``
(PLAIN), data pages are ``[bitwidth: u8][hybrid-RLE indices]``
(src/write/page.rs:173-198, src/deserialize/utils.rs:13-27). Here the
"dict page" and "data page" are one self-delimiting blob:

    [uleb ndv][dict payload (plain)][bitwidth u8][uleb n][hybrid-RLE codes]

Factorization uses ``pyarrow.Array.dictionary_encode`` (first-appearance
order, deterministic) for binary; ``np.unique`` for natives.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import bitpack, plain, rle
from .barray import BinArray, from_arrow, to_arrow
from .varint import uleb128_decode, uleb128_encode


def _encode_codes(codes: np.ndarray, ndv: int) -> bytes:
    width = max(1, bitpack.bits_needed(max(0, ndv - 1)))
    return bytes([width]) + uleb128_encode(len(codes)) + rle.encode(codes, width)


def _decode_codes(buf: memoryview, pos: int) -> np.ndarray:
    width = buf[pos]
    n, pos = uleb128_decode(buf, pos + 1)
    return rle.decode(buf[pos:], width, n).astype(np.int64)


def encode_binary(arr: BinArray) -> bytes:
    pa_arr = to_arrow(arr)
    dict_arr = pa_arr.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    dict_vals = from_arrow(dict_arr.dictionary)
    ndv = len(dict_arr.dictionary)
    return uleb128_encode(ndv) + plain.encode_binary(dict_vals) + _encode_codes(codes, ndv)


def decode_binary(buf: bytes | memoryview) -> BinArray:
    buf = memoryview(buf)
    ndv, pos = uleb128_decode(buf, 0)
    dict_vals, consumed = plain.decode_binary_consumed(buf[pos:])
    if len(dict_vals[0]) - 1 != ndv:
        raise ValueError(f"dict length mismatch: {len(dict_vals[0]) - 1} != {ndv}")
    codes = _decode_codes(buf, pos + consumed)
    dict_arr = to_arrow(dict_vals)
    out = dict_arr.take(pa.array(codes, type=pa.int64()))
    return from_arrow(out)


def encode_native(values: np.ndarray) -> bytes:
    uniq, codes = np.unique(values, return_inverse=True)
    ndv = len(uniq)
    dict_payload = plain.encode_native(uniq)
    return (
        uleb128_encode(ndv)
        + uleb128_encode(len(dict_payload))
        + dict_payload
        + _encode_codes(codes.astype(np.uint64), ndv)
    )


def decode_native(buf: bytes | memoryview, dtype: np.dtype) -> np.ndarray:
    buf = memoryview(buf)
    ndv, pos = uleb128_decode(buf, 0)
    dict_len, pos = uleb128_decode(buf, pos)
    uniq = plain.decode_native(buf[pos : pos + dict_len], dtype)
    if len(uniq) != ndv:
        raise ValueError(f"dict length mismatch: {len(uniq)} != {ndv}")
    codes = _decode_codes(buf, pos + dict_len)
    return uniq[codes]
