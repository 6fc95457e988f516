"""Stateful streaming exact-dedup: ``applyInPandasWithState``.

A training-data ingest stream must drop documents it has already seen —
across micro-batches and across restarts. Grouping by content digest and
keeping one bit of state per digest ("already emitted") in Spark's state
store gives exactly that: the first arrival of a text wins, every later
arrival (same batch or any later batch) is suppressed, and the state
survives restarts via the checkpoint.

This is the custom-stateful-operator surface the reference cannot express
(it has no streaming at all — SURVEY §2.G); Spark's state store plays the
role a bespoke dedup service would otherwise.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    stream_df: DataFrame,
    output_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
):
    """Start a streaming query writing first-seen rows to parquet.

    Within a micro-batch the lowest ``id_col`` per digest wins
    (deterministic); across batches the state store suppresses re-arrivals.
    Returns the StreamingQuery.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_fields = [f for f in stream_df.schema.fields]
    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
    out_cols = [f.name for f in out_fields]

    keyed = stream_df.withColumn("_digest", F.md5(F.col(text_col).cast("binary")))

    def emit_first(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain; this digest already emitted
                pass
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            state.update((1,))
            yield batch.sort_values(id_col).head(1)[out_cols]

    deduped = keyed.groupBy("_digest").applyInPandasWithState(
        emit_first,
        outputStructType=out_schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
