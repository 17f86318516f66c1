"""Structured Streaming variants of the batch operators."""

from tempo_spark.streaming.asof import (
    reduce_asof_candidates,
    streaming_asof,
    streaming_asof_candidates,
)
from tempo_spark.streaming.dedup import streaming_exact_dedup
from tempo_spark.streaming.interpolate import streaming_interpolate
from tempo_spark.streaming.lsh import streaming_lsh_dedup
from tempo_spark.streaming.resample import (
    streaming_bars,
    streaming_grouped_stats,
    streaming_resample,
)
from tempo_spark.streaming.sessionize import streaming_sessionize
from tempo_spark.streaming.tsdf import StreamingTSDF

__all__ = [
    "StreamingTSDF",
    "reduce_asof_candidates",
    "streaming_asof",
    "streaming_asof_candidates",
    "streaming_bars",
    "streaming_exact_dedup",
    "streaming_grouped_stats",
    "streaming_interpolate",
    "streaming_lsh_dedup",
    "streaming_resample",
    "streaming_sessionize",
]
