"""Structured Streaming variants of the tumbling-window operators.

The batch ``resample``/``withGroupedStats`` already build on ``F.window`` —
the exact primitive Structured Streaming uses — so the streaming variants
are the same plan plus a watermark for state eviction / late-data handling.
(The reference has no streaming support; it is explicitly roadmap,
reference: docs/about/future-roadmap.rst:24-27.)
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tempo_spark.functions.freq import parse_freq


def streaming_resample(
    sdf: DataFrame,
    ts_col: str,
    series_ids: Sequence[str],
    freq: str,
    agg: str = "mean",
    metric_cols: Optional[Sequence[str]] = None,
    watermark: str = "10 minutes",
    observe: Optional[str] = None,
) -> DataFrame:
    """Streaming tumbling-window downsample. Returns an unstarted streaming
    DataFrame: ``.writeStream`` it with any sink/trigger.

    Watermark bounds the state store: buckets older than ``watermark`` are
    finalized and evicted, which is what makes this run indefinitely on an
    unbounded stream. Late-data hazard (MEASURED Spark 4.1, pinned in
    tests/test_streaming.py): a row behind the watermark is NOT dropped —
    the window aggregation ADMITS it and its already-closed bucket
    materializes as a fresh stale row in append output (a sink keyed on
    bucket start silently takes a late partial bar). Pass ``observe=`` (an
    observation name) and read
    :func:`tempo_spark.streaming.metrics.late_row_stats` off the running
    query to detect exactly that (``late_batches``/``max_lateness_sec``)."""
    if observe:
        from tempo_spark.streaming.metrics import observe_input

        sdf = observe_input(sdf, ts_col, observe)
    f = parse_freq(freq)
    if metric_cols is None:
        from pyspark.sql.types import NumericType

        structural = {ts_col, *series_ids}
        metric_cols = [
            fld.name
            for fld in sdf.schema.fields
            if fld.name not in structural and isinstance(fld.dataType, NumericType)
        ]
    agg_fn = {"mean": F.mean, "min": F.min, "max": F.max, "sum": F.sum, "count": F.count}[agg]
    out = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(*series_ids, F.window(F.col(ts_col), f.window_duration).alias("__win"))
        .agg(*[agg_fn(F.col(c)).alias(c) for c in metric_cols])
        .withColumn(ts_col, F.col("__win.start"))
        .drop("__win")
        .select(*series_ids, ts_col, *metric_cols)
    )
    return out


def streaming_bars(
    sdf: DataFrame,
    ts_col: str,
    series_ids: Sequence[str],
    freq: str,
    metric_cols: Sequence[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming OHLC bars: the same single-aggregation plan as the batch
    ``calc_bars`` (struct-ordered min/max for open/close) under a watermark.
    Emits one finalized bar per (series, bucket) once the watermark passes."""
    f = parse_freq(freq)
    packed = F.struct(
        F.col(ts_col).alias("__ts"), *[F.col(c).alias(c) for c in metric_cols]
    )
    aggs = [F.min(packed).alias("__first"), F.max(packed).alias("__last")]
    for c in metric_cols:
        aggs += [F.min(F.col(c)).alias(f"low_{c}"), F.max(F.col(c)).alias(f"high_{c}")]
    agged = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(*series_ids, F.window(F.col(ts_col), f.window_duration).alias("__win"))
        .agg(*aggs)
    )
    out_cols = []
    for c in metric_cols:
        out_cols += [
            F.col("__first").getField(c).alias(f"open_{c}"),
            F.col(f"low_{c}"),
            F.col(f"high_{c}"),
            F.col("__last").getField(c).alias(f"close_{c}"),
        ]
    return agged.select(
        *series_ids, F.col("__win.start").alias(ts_col), *out_cols
    )


def streaming_grouped_stats(
    sdf: DataFrame,
    ts_col: str,
    series_ids: Sequence[str],
    freq: str,
    metric_cols: Sequence[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-bucket mean/count/min/max/sum/stddev."""
    f = parse_freq(freq)
    aggs = []
    for c in metric_cols:
        col = F.col(c)
        aggs += [
            F.mean(col).alias(f"mean_{c}"),
            F.count(col).alias(f"count_{c}"),
            F.min(col).alias(f"min_{c}"),
            F.max(col).alias(f"max_{c}"),
            F.sum(col).alias(f"sum_{c}"),
            F.stddev(col).alias(f"stddev_{c}"),
        ]
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(*series_ids, F.window(F.col(ts_col), f.window_duration).alias("__win"))
        .agg(*aggs)
        .withColumn(ts_col, F.col("__win.start"))
        .drop("__win")
    )
