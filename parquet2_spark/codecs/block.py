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
    return pa.Codec(name).decompress(bytes(data), decompressed_size=raw_size, asbytes=True)
