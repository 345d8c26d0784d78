"""Structured Streaming surface of the engine."""

from towhee_spark.streaming.ops import (
    stream_sessionize,
    stream_time_window_agg,
    with_watermark,
)

__all__ = ["stream_time_window_agg", "stream_sessionize", "with_watermark"]
