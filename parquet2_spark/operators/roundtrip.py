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
        for rb in batches:
            cols = []
            for name in names:
                arr = rb.column(rb.schema.get_field_index(name))
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                page, _meta = blob.encode_page(arr, cfg, codec=codecs.get(name))
                out, _ = blob.decode_page(page)
                cols.append(out.cast(arr.type))
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return df.mapInArrow(run, df.schema)
