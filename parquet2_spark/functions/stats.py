"""Per-batch column statistics and partial→final reduction.

Reference parity: per-page min/max/null_count (src/statistics/*.rs,
consumer-side computation shown in tests/it/write/primitive.rs:52-63) and
the page→chunk ``reduce`` (src/write/statistics.rs:28-103: min-of-mins,
max-of-maxes, sum null_counts, drop distinct_count). We add the inputs the
codec auto-selector needs: run count, distinct count, sortedness, byte
sizes — one vectorized pass per Arrow batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class BatchStats:
    n: int
    null_count: int
    min: Any = None  # typed min over non-null values (bytes for binary)
    max: Any = None
    ndv: int = 0  # distinct over non-nulls (exact per batch)
    run_count: int = 0  # value-change count + 1 over non-nulls
    sorted_frac: float = 1.0  # fraction of non-decreasing adjacent pairs
    raw_bytes: int = 0  # in-memory value bytes (offsets excluded)

    @property
    def nonnull(self) -> int:
        return self.n - self.null_count


def compute(arr: pa.Array, full: bool = True, vals: pa.Array | None = None) -> BatchStats:
    """Per-batch stats. ``full=False`` skips the hash-heavy passes (ndv,
    run count, sortedness) and keeps only what chunk metadata needs
    (n/nulls/min/max/bytes) — pages beyond the selector's probe page use
    the light path to stay memory-bandwidth-friendly.

    ``vals``: the caller's already-materialized ``arr.drop_null()`` —
    drop_null COPIES the batch (a gather), so callers that need the
    non-null values anyway (encode_page does) must not pay it twice."""
    n = len(arr)
    null_count = arr.null_count
    st = BatchStats(n=n, null_count=null_count)
    if vals is None:
        vals = arr.drop_null() if null_count else arr
    m = len(vals)
    if m == 0:
        return st

    if pa.types.is_list(vals.type) or pa.types.is_large_list(vals.type):
        # list columns: sizes only (ordering/ndv undefined for the selector)
        st.raw_bytes = int(vals.values.nbytes) + 4 * m
        st.ndv = m
        st.run_count = m
        return st
    t = vals.type
    if pa.types.is_decimal(t):
        # decimal: exact typed min/max (feeds the conservative float zone
        # map in _stat_cols); the nested codec recurses, so no ndv/runs
        mm = pc.min_max(vals)
        st.min, st.max = mm["min"].as_py(), mm["max"].as_py()
        st.raw_bytes = 16 * m
        st.ndv = m
        st.run_count = m
        return st
    if pa.types.is_struct(t) or pa.types.is_map(t) or pa.types.is_fixed_size_binary(t):
        # containers: sizes only — min/max ordering is undefined, and the
        # nested codec recurses so the selector never ranks these directly
        st.raw_bytes = int(vals.nbytes)
        st.ndv = m
        st.run_count = m
        return st

    if full:
        st.ndv = len(pc.unique(vals))
    mm = pc.min_max(vals)
    st.min, st.max = mm["min"].as_py(), mm["max"].as_py()
    if pa.types.is_floating(vals.type) and st.min is not None:
        # pc.min_max SKIPS NaN, but Spark orders NaN above every double —
        # a NaN-bearing page must not be pruned by an upper-open range
        # (x >= lo matches NaN rows). Widen max to +inf when any NaN is
        # present; an all-NaN page (min_max returns inverted +inf/-inf)
        # stores [+inf, +inf]: only ≤-bounded predicates prune it, and NaN
        # rows never satisfy those, so pruning stays sound.
        if st.min > st.max:  # all-NaN
            st.min, st.max = float("inf"), float("inf")
        elif pc.any(pc.is_nan(vals)).as_py():
            st.max = float("inf")

    if pa.types.is_binary(vals.type) or pa.types.is_string(vals.type) or pa.types.is_large_string(vals.type):
        st.raw_bytes = int(pc.sum(pc.binary_length(vals)).as_py() or 0)
        if isinstance(st.min, str):
            st.min, st.max = st.min.encode(), st.max.encode()
        if full:
            # run/sortedness over dictionary codes (order not needed for
            # run counting)
            codes = vals.dictionary_encode().indices.to_numpy(zero_copy_only=False)
            changes = int((codes[1:] != codes[:-1]).sum()) if m > 1 else 0
            st.run_count = changes + 1
        st.sorted_frac = 1.0  # byte-order sortedness not tracked for binary
    elif pa.types.is_boolean(vals.type):
        st.raw_bytes = m
        v = vals.to_numpy(zero_copy_only=False)
        st.run_count = int((v[1:] != v[:-1]).sum()) + 1 if m > 1 else 1
    else:
        st.raw_bytes = m * (arr.type.bit_width // 8 if arr.type.bit_width >= 8 else 1)
        if full and m > 1:
            v = vals.to_numpy(zero_copy_only=False)
            if np.issubdtype(v.dtype, np.datetime64):
                v = v.astype("datetime64[us]").astype(np.int64)
            st.run_count = int((v[1:] != v[:-1]).sum()) + 1
            st.sorted_frac = float((v[1:] >= v[:-1]).mean())
        else:
            st.run_count = 1
    return st


@dataclass
class ChunkStats:
    """Page stats reduced to chunk level (reference write/statistics.rs:
    reduce drops distinct_count; we keep a *max-of-ndv* hint instead)."""

    n: int = 0
    null_count: int = 0
    min: Any = None
    max: Any = None
    ndv_hint: int = 0
    raw_bytes: int = 0
    n_pages: int = 0
    page_stats: list[BatchStats] = field(default_factory=list)


def reduce(pages: list[BatchStats], keep_pages: bool = True) -> ChunkStats:
    out = ChunkStats()
    for ps in pages:
        out.n += ps.n
        out.null_count += ps.null_count
        out.raw_bytes += ps.raw_bytes
        out.n_pages += 1
        out.ndv_hint = max(out.ndv_hint, ps.ndv)
        if ps.min is not None and (out.min is None or ps.min < out.min):
            out.min = ps.min
        if ps.max is not None and (out.max is None or ps.max > out.max):
            out.max = ps.max
    if keep_pages:
        out.page_stats = list(pages)
    return out
