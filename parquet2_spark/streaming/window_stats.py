"""Watermarked windowed aggregation over an event stream.

The per-window stats the encode pipeline logs (rows, bytes, value
min/max) computed on a live stream: tumbling event-time windows with a
watermark so late events are merged while the window is open and dropped
once it finalizes — Structured Streaming's contract, no custom state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_stats(
    stream_df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window stats frame (streaming or batch: same expression).

    Append-mode compatible: with the watermark set, a window emits once
    the watermark passes its end, late-but-within-watermark events are
    included, later ones dropped.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_rows",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def start_windowed_stats(
    stream_df: DataFrame,
    output_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
):
    """Write finalized windows to parquet (append mode)."""
    agg = windowed_stats(stream_df, **kwargs)
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
