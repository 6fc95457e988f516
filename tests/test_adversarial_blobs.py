"""Adversarial inputs: truncated/corrupt blobs must fail loudly, never
hang or return a silently-wrong full-length array (verify-skill probes)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet2_spark import blob
from parquet2_spark.functions import selector as sel

CASES = {
    "plain_str": (lambda: pa.array([f"value-{i}" for i in range(500)]), sel.PLAIN),
    "dict": (lambda: pa.array(["en", "de", "fr"] * 200), sel.DICT),
    "rle_for": (lambda: pa.array(np.arange(1000) // 50), sel.RLE_FOR),
    "delta": (lambda: pa.array(np.cumsum(np.arange(1000))), sel.DELTA),
    "front": (
        lambda: pa.array(sorted(f"https://h{i//7}.com/p{i}" for i in range(500))),
        sel.DELTA_BYTE_ARRAY,
    ),
    "fsst": (lambda: pa.array([f"the quick brown fox {i} jumps" for i in range(400)]), sel.FSST),
    "bitmap": (lambda: pa.array([i % 3 == 0 for i in range(1000)]), sel.BITMAP),
    "bss": (
        lambda: pa.array(np.random.default_rng(1).standard_normal(500), type=pa.float64()),
        sel.BSS,
    ),
    "nulls": (
        lambda: pa.array([None if i % 5 == 0 else f"t{i}" for i in range(500)]),
        sel.PLAIN,
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("frac", [0.2, 0.5, 0.9, 0.98])
def test_truncated_page_fails_loudly(name, frac):
    make, codec = CASES[name]
    arr = make()
    page, _ = blob.encode_page(arr, codec=codec)
    cut = max(3, int(len(page) * frac))
    try:
        out, _ = blob.decode_page(page[:cut])
    except Exception:
        return  # clean failure is the contract
    # a return is only acceptable if it's visibly wrong (short), never a
    # full-length lookalike of the original
    assert not (len(out) == len(arr) and out.equals(arr)), (name, frac)


def test_truncated_chunk_fails_loudly():
    arr = pa.array([f"doc body text number {i} with words" for i in range(2000)])
    pages = [arr.slice(i, 500) for i in range(0, 2000, 500)]
    payload, meta = blob.encode_chunk(pages, codec=sel.FSST)
    for frac in (0.1, 0.4, 0.7, 0.95):
        cut = max(3, int(len(payload) * frac))
        with pytest.raises(Exception):
            got = blob.decode_chunk(payload[:cut])
            # reaching here means no exception — only tolerable when the
            # result is visibly short
            assert len(got) < len(arr)


def test_garbage_header_rejected():
    for junk in (b"", b"\x00", b"\xff" * 16, b"PAR1" + b"\x00" * 64):
        with pytest.raises(Exception):
            blob.decode_page(junk)


class TestAdversarialNested:
    """Corrupted nested payloads must raise cleanly, never hang or return
    garbage-typed arrays."""

    def _payload(self):
        import pyarrow as pa

        arr = pa.array(
            [{"a": i, "b": f"s{i}"} for i in range(200)],
            type=pa.struct([("a", pa.int64()), ("b", pa.string())]),
        )
        payload, _ = blob.encode_chunk([arr])
        return bytes(payload)

    def test_truncations_raise(self):
        payload = self._payload()
        for cut in (5, len(payload) // 4, len(payload) // 2, len(payload) - 3):
            with pytest.raises(Exception):
                blob.decode_chunk(payload[:cut])

    def test_bad_nested_tag_raises(self):
        import pyarrow as pa

        arr = pa.array([[1, 2]], type=pa.list_(pa.int64()))
        page, _ = blob.encode_page(arr)
        page = bytearray(page)
        # find the payload start: header is [code, codec, outer][n][nulls][raw][plen]
        # corrupt the first payload byte (the nested tag)
        # payload is the tail; tag byte = first byte after the last uleb
        # (locate by re-encoding an empty prefix: simplest robust approach,
        # flip every trailing byte position once and require no silent success)
        ok_silent = 0
        for i in range(3, len(page)):
            mut = bytes(page[:i]) + bytes([page[i] ^ 0x5A]) + bytes(page[i + 1:])
            try:
                out, _ = blob.decode_page(mut)
                # a decode that "succeeds" must at least keep row count
                if len(out) != 1:
                    ok_silent += 1
            except Exception:
                pass
        assert ok_silent == 0

    def test_unknown_field_filter_raises(self):
        payload = self._payload()
        with pytest.raises(KeyError):
            blob.decode_chunk(payload, field_filter={"zzz"})


class TestForgedLengthGuards:
    """A corrupt *length field* must fail a cheap bounds check BEFORE any
    allocation is attempted (≙ reference max_page_size guard,
    read/page/reader.rs:197-199) — not OOM the executor."""

    def _page(self):
        page, _ = blob.encode_page(pa.array([f"value-{i}" for i in range(100)]))
        return bytearray(page)

    def test_forged_row_count_rejected(self):
        from parquet2_spark.codecs.varint import uleb128_decode, uleb128_encode

        page = self._page()
        # splice a 2^60 row count in place of the real n
        _, p_after = uleb128_decode(memoryview(bytes(page)), 3)
        forged = bytes(page[:3]) + uleb128_encode(1 << 60) + bytes(page[p_after:])
        with pytest.raises(ValueError, match="row count"):
            blob.decode_page(forged)

    def test_forged_payload_length_rejected(self):
        from parquet2_spark.codecs.varint import uleb128_decode, uleb128_encode

        page = self._page()
        mv = memoryview(bytes(page))
        n, p = uleb128_decode(mv, 3)
        nulls, p = uleb128_decode(mv, p)
        raw, p = uleb128_decode(mv, p)
        plen, p_payload = uleb128_decode(mv, p)
        forged = bytes(page[:p]) + uleb128_encode(1 << 62) + bytes(page[p_payload:])
        with pytest.raises(ValueError, match="length"):
            blob.decode_page(forged)

    def test_forged_raw_size_rejected(self):
        from parquet2_spark.codecs.varint import uleb128_decode, uleb128_encode

        page = self._page()
        mv = memoryview(bytes(page))
        n, p = uleb128_decode(mv, 3)
        nulls, p2 = uleb128_decode(mv, p)
        raw, p3 = uleb128_decode(mv, p2)
        forged = bytes(page[:p2]) + uleb128_encode(1 << 62) + bytes(page[p3:])
        with pytest.raises(ValueError, match="raw size|length"):
            blob.decode_page(forged)

    def test_forged_chunk_page_length_rejected(self):
        from parquet2_spark.codecs.varint import uleb128_decode, uleb128_encode

        payload, _ = blob.encode_chunk([pa.array(np.arange(100, dtype=np.int64))])
        mv = memoryview(payload)
        aux_len, pos = uleb128_decode(mv, 5)
        pos += aux_len
        n_pages, pos = uleb128_decode(mv, pos)
        _n_rows, pos = uleb128_decode(mv, pos)
        ln, p_after = uleb128_decode(mv, pos)  # first page length
        forged = bytes(payload[:pos]) + uleb128_encode(1 << 61) + bytes(payload[p_after:])
        with pytest.raises(ValueError, match="length|exceeds"):
            list(blob.iter_chunk_pages(forged))
        with pytest.raises(ValueError, match="length|exceeds"):
            blob.decode_chunk_rows(forged, 0, 10)

    def test_forged_fsst_table_length_rejected(self):
        from parquet2_spark.codecs.varint import uleb128_decode, uleb128_encode

        payload, meta = blob.encode_chunk(
            [pa.array([f"the quick brown fox {i} jumps over" for i in range(500)])],
            codec=sel.FSST,
        )
        mv = memoryview(payload)
        aux_len, pos = uleb128_decode(mv, 5)
        forged = bytes(payload[:5]) + uleb128_encode(1 << 61) + bytes(payload[pos:])
        with pytest.raises(ValueError, match="length|exceeds"):
            list(blob.iter_chunk_pages(forged))
