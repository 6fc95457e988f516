"""Codec round-trips as Spark queries: every batch goes encode→decode
through the page blob layer inside a vectorized Arrow UDF.

These are the engine's correctness probes against the DuckDB oracle: the
query output *is* the decoded data, so any codec bug breaks the value
hash. One entry per codec family (SURVEY §2.A parity).
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

from .. import blob
from ..functions.selector import SelectorConfig


def roundtrip(
    df: DataFrame,
    codecs: dict[str, int] | None = None,
    cfg: SelectorConfig | None = None,
) -> DataFrame:
    """Return ``df`` with every column passed through encode_page →
    decode_page (forced codec per column, or auto-selected)."""
    codecs = codecs or {}
    cfg = cfg or SelectorConfig()
    names = df.columns

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # codec choice is memoized per column per TASK (r6): the first
        # batch runs the full stats+sample auto-selection, later batches
        # reuse its pick — the chunk-level one-codec discipline the
        # reference enforces (src/write/column_chunk.rs:108-121), and
        # the decoded VALUES are identical whichever codec encodes them
        # (encode_page's CONSTANT guard still falls back per page).
        # Measured: the per-batch selection (full ndv stats + up to 4
        # sample encodes + outer compress each) was ~40% of rt_auto_*.
        chosen: dict[str, int] = {}
        for rb in batches:
            cols = []
            for name in names:
                arr = rb.column(rb.schema.get_field_index(name))
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                codec = codecs.get(name, chosen.get(name))
                if codec is None and len(arr) > arr.null_count:
                    # select on the first batch that has non-null values
                    # (an all-null probe would pin PLAIN for the task)
                    codec = chosen[name] = blob.select_codec(arr, cfg)
                page, _meta = blob.encode_page(arr, cfg, codec=codec)
                out, _ = blob.decode_page(page)
                cols.append(out.cast(arr.type))
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return df.mapInArrow(run, df.schema)
