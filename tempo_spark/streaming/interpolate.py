"""Streaming interpolation — watermark-driven gap-filled grid emission.

The batch ``interpolate`` resamples each series to a fixed-frequency grid
and fills the empty buckets (zero/null/ffill/linear). No composition of
built-in streaming operators can express this: the windowed aggregation
that builds the grid is itself stateful, and synthesizing rows for EMPTY
buckets between observations needs the previous bucket's finalized value —
a second stateful stage, which Structured Streaming cannot chain after a
windowed aggregation. So this is a custom ``applyInPandasWithState``
operator (the same justification as the single-query streaming as-of).

Semantics (append mode):

- incoming rows accumulate per ``(series, bucket)`` as ``(sum, count)`` —
  bounded state: only buckets not yet passed by the watermark are pending;
- a bucket FINALIZES when the watermark passes its end; it emits with the
  aggregated value (``agg="mean"`` or ``"sum"``) and
  ``is_interpolated=false``;
- when a bucket finalizes and the series has a previously-finalized bucket,
  the empty grid buckets BETWEEN them emit with ``is_interpolated=true``
  and the fill value per ``method`` (``zero`` / ``null`` / ``ffill`` /
  ``linear``). Interior-gap semantics match the batch operator: trailing
  gaps after the last observation are never synthesized.

State per series is O(pending buckets) + one (bucket, value) pair retained
for gap filling — the retained pair makes total state O(number of series),
the same bound as any per-series streaming aggregation.

Reference context: interpolation is batch-only in the reference
(python/tempo/interpol.py); streaming appears on its roadmap only.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tempo_spark.functions.freq import parse_freq

_METHODS = ("zero", "null", "ffill", "linear")


def streaming_interpolate(
    df: DataFrame,
    ts_col: str,
    series_ids: Sequence[str],
    freq: str = "1 hour",
    metric_col: str = "value",
    agg: str = "mean",
    method: str = "linear",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit the gap-filled fixed-frequency grid of ``metric_col`` as an
    append-mode stream. Output columns: ``*series_ids, bucket_ts,
    <metric_col> (double), is_interpolated (boolean)``."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, got {method!r}")
    if agg not in ("mean", "sum"):
        raise ValueError(f"agg must be 'mean' or 'sum', got {agg!r}")

    freq_us = int(parse_freq(freq).seconds * 1_000_000)
    sids = list(series_ids)

    # event time crosses the Arrow boundary as session-timezone-NAIVE wall
    # clock, while GroupState watermarks are true UTC epoch — compare them
    # directly and every bucket boundary shifts by the session offset. So
    # the kernel works exclusively in unix_micros (computed JVM-side, true
    # epoch regardless of session timezone) and the bucket timestamp is
    # reconstructed JVM-side after the stateful operator.
    src = df.withWatermark(ts_col, watermark).select(
        *sids,
        F.col(ts_col).alias("__ts"),
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
        F.col(metric_col).cast("double").alias("__v"),
    )
    key_fields = [src.schema[c] for c in sids]
    out_schema = StructType(
        list(key_fields)
        + [
            StructField("bucket_us", LongType()),
            StructField(metric_col, DoubleType()),
            StructField("is_interpolated", BooleanType()),
        ]
    )
    # pending buckets (parallel arrays) + the last finalized (bucket, value)
    state_schema = StructType(
        [
            StructField("buckets", ArrayType(LongType())),
            StructField("sums", ArrayType(DoubleType())),
            StructField("counts", ArrayType(LongType())),
            StructField("last_bucket", LongType()),
            StructField("last_value", DoubleType()),
        ]
    )
    key_names = [f.name for f in key_fields]
    is_mean = agg == "mean"

    def fill_value(prev_v, next_v, prev_b, next_b, g):
        if method == "zero":
            return 0.0
        if method == "null":
            return None
        if method == "ffill":
            return prev_v
        # linear in grid position; all operands are float64 and the op
        # order (sub, sub, div, mul, add) is fixed so an external engine
        # replays it bit-identically
        return prev_v + (next_v - prev_v) * ((g - prev_b) / (next_b - prev_b))

    def fn(key, pdfs, state: GroupState):
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            b_list, s_list, c_list, last_b, last_v = state.get
            pending = {b: [s, c] for b, s, c in zip(b_list, s_list, c_list)}
        else:
            pending, last_b, last_v = {}, None, None

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = pdf["__ts_us"].tolist()
                vals = pdf["__v"].tolist()
                for t_us, v in zip(ts_us, vals):
                    if v is None or v != v:  # null/NaN rows don't contribute
                        continue
                    b = t_us - t_us % freq_us
                    acc = pending.get(b)
                    if acc is None:
                        pending[b] = [v, 1]
                    else:
                        acc[0] += v
                        acc[1] += 1
        else:
            for _ in pdfs:
                pass

        emit = []
        for b in sorted(pending):
            if b + freq_us > wm_us:
                break
            s, c = pending.pop(b)
            v = s / c if is_mean else s
            if last_b is not None:
                g = last_b + freq_us
                while g < b:
                    emit.append((g, fill_value(last_v, v, float(last_b), float(b), float(g)), True))
                    g += freq_us
            emit.append((b, v, False))
            last_b, last_v = b, v

        if pending or last_b is not None:
            bs = sorted(pending)
            state.update(
                (
                    bs,
                    [pending[b][0] for b in bs],
                    [int(pending[b][1]) for b in bs],
                    last_b,
                    last_v,
                )
            )
            if bs:
                # wake once the watermark passes the earliest pending
                # bucket's end (must exceed the current watermark)
                timeout_ms = (bs[0] + freq_us) // 1000 + 1
                state.setTimeoutTimestamp(
                    max(timeout_ms, state.getCurrentWatermarkMs() + 1)
                )
            # no pending buckets: nothing will ever emit without new data,
            # so no timeout — the retained (last_bucket, last_value) pair
            # waits for the next observation (O(series) total state)
        else:
            state.remove()

        if emit:
            rows = []
            for b, v, interp in emit:
                row = dict(zip(key_names, key))
                row["bucket_us"] = b
                row[metric_col] = v
                row["is_interpolated"] = interp
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    out = src.groupBy(*sids).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        *sids,
        F.timestamp_micros(F.col("bucket_us")).alias("bucket_ts"),
        metric_col,
        "is_interpolated",
    )
