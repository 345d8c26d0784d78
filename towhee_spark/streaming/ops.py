"""Streaming analogues of the engine's window/session operators.

Towhee has no streaming runtime (a pipeline invocation is one bounded row
set); the engine's tables-in-motion story is Structured Streaming:
``readStream → transform → writeStream`` with event-time watermarks.  The
same functions work on batch DataFrames (Spark's unified semantics), which
is how the tests validate them against the batch operators.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Late-data bound; required before stateful event-time aggs in streams."""
    return df.withWatermark(ts, delay) if df.isStreaming else df


def stream_time_window_agg(
    df: DataFrame,
    aggs: Mapping[str, Column],
    key: str = "conv_id",
    ts: str = "ts",
    size: str = "10 minutes",
    step: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding/tumbling event-time window aggregation (streaming-safe).

    Equivalent of the batch ``time_window`` node's fast path: Spark's
    F.window is step-aligned and emits only non-empty groups, matching
    Towhee's buffer on gap-free ordered streams (pipeline.py parity tests
    cover the exact-gap semantics on the batch path)."""
    src = with_watermark(df, ts, watermark)
    win = F.window(F.col(ts), size, step or size)
    return (
        src.groupBy(F.col(key), win.alias("win"))
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            key,
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *aggs.keys(),
        )
    )


def stream_sessionize(
    df: DataFrame,
    aggs: Mapping[str, Column],
    key: str = "conv_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based session aggregation via F.session_window — the streaming
    dual of towhee_spark.temporal.sessionize (which labels individual rows
    in batch; here sessions close when the watermark passes ts+gap)."""
    src = with_watermark(df, ts, watermark)
    win = F.session_window(F.col(ts), gap)
    return (
        src.groupBy(F.col(key), win.alias("sess"))
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            key,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            *aggs.keys(),
        )
    )
