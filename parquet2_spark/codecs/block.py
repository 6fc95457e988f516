"""Block compression codecs (orthogonal to encodings), via pyarrow.

Reference parity: src/compression.rs:28-287 dispatches over
Snappy/Gzip/Brotli/LZ4/Zstd backends; pyarrow bundles the same C
implementations, so we dispatch to ``pyarrow.Codec`` instead of
reimplementing block compressors. Raw (decompressed) size always travels
in our blob header, mirroring the reference's
``CompressedDataPage::uncompressed_page_size``.
"""

from __future__ import annotations

import gzip as _gzip

import pyarrow as pa

# id ↔ name, stable across versions (stored in blob headers)
CODEC_IDS = {0: None, 1: "snappy", 2: "gzip", 3: "brotli", 4: "lz4", 5: "zstd"}
CODEC_NAMES = {v: k for k, v in CODEC_IDS.items()}


def available(name: str) -> bool:
    if name is None:
        return True
    try:
        return pa.Codec.is_available(name)
    except Exception:
        return False


def compress(data: bytes, name: str | None, level: int | None = None) -> bytes:
    """One codec per column chunk, like the reference enforces
    (src/write/column_chunk.rs:108-121)."""
    if name is None:
        return data
    if not available(name):
        if name == "gzip":
            # stdlib fallback must emit the SAME wire format the stored id
            # promises — gzip framing, not zlib, so a pyarrow-gzip reader
            # on another machine can decompress it (mtime=0: deterministic)
            return _gzip.compress(data, compresslevel=6, mtime=0)
        raise ValueError(f"codec {name} unavailable")
    if level is not None:
        try:
            if not pa.Codec.supports_compression_level(name):
                level = None  # e.g. lz4-frame/snappy take no level
        except Exception:
            pass
    codec = pa.Codec(name) if level is None else pa.Codec(name, compression_level=level)
    return codec.compress(data, asbytes=True)


def decompress(data: bytes, name: str | None, raw_size: int) -> bytes:
    if name is None:
        return bytes(data)
    if not available(name):
        if name == "gzip":
            return _gzip.decompress(bytes(data))
        raise ValueError(f"codec {name} unavailable")
    if name == "lz4":
        # interop: this engine writes lz4 FRAME, but hadoop-ecosystem
        # writers emit their own framing ([be32 raw_len][be32 comp_len]
        # [raw-lz4 block])* — auto-detect exactly like the reference
        # (src/compression.rs:231-287 try_decompress_hadoop fallback)
        try:
            return pa.Codec(name).decompress(
                bytes(data), decompressed_size=raw_size, asbytes=True
            )
        except Exception:
            out = _decompress_lz4_hadoop(bytes(data), raw_size)
            if out is None:
                raise
            return out
    return pa.Codec(name).decompress(bytes(data), decompressed_size=raw_size, asbytes=True)


def _decompress_lz4_hadoop(data: bytes, raw_size: int) -> bytes | None:
    """Hadoop LZ4 framing: repeated [be32 uncompressed_len][be32
    compressed_len][lz4 raw block]. Returns None when the buffer does not
    parse as that layout (caller re-raises the frame-format error)."""
    import struct

    try:
        raw = pa.Codec("lz4_raw")
    except Exception:
        return None
    out = []
    pos, total = 0, 0
    while pos < len(data):
        if pos + 8 > len(data):
            return None
        u_len, c_len = struct.unpack_from(">II", data, pos)
        pos += 8
        if c_len > len(data) - pos or u_len > raw_size - total:
            return None
        try:
            block = raw.decompress(
                data[pos : pos + c_len], decompressed_size=u_len, asbytes=True
            )
        except Exception:
            return None
        out.append(block)
        total += u_len
        pos += c_len
    if total != raw_size:
        return None
    return b"".join(out)
