"""Stateful streaming sessionization — the streaming analog of
``extractStateIntervals`` (the reference has no streaming support at all;
its roadmap lists it, reference: docs/about/future-roadmap.rst:24-27).

Groups a stream of events into activity sessions per series: a session
closes when no event arrives within ``gap_seconds`` of the last one.
Implemented with ``applyInPandasWithState`` (Arrow-batched per-group state),
event-time timeouts, and a watermark bounding the state store — the
canonical Structured Streaming custom-stateful-operator shape.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def streaming_sessionize(
    sdf: DataFrame,
    ts_col: str,
    series_ids: Sequence[str],
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Returns a streaming DataFrame of closed sessions:
    ``(*series_ids, session_start, session_end, n_events)``.

    Sessions are emitted when closed by a later event (gap exceeded) or by
    event-time timeout once the watermark passes ``last_event + gap``.
    State per series is three scalars — O(1) memory per active series.
    """
    key_fields = [sdf.schema[c] for c in series_ids]
    out_schema = StructType(
        list(key_fields)
        + [
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(sessions):
            if not sessions:
                return None
            rows = []
            for start_us, last_us, n in sessions:
                row = dict(zip([f.name for f in key_fields], key))
                row["session_start"] = pd.Timestamp(start_us, unit="us")
                row["session_end"] = pd.Timestamp(last_us, unit="us")
                row["n_events"] = n
                rows.append(row)
            return pd.DataFrame(rows)

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            out = emit([(start_us, last_us, n)])
            if out is not None:
                yield out
            return

        ts_values = []
        for pdf in pdfs:
            ts_values.extend(
                int(t.value // 1000) for t in pd.to_datetime(pdf[ts_col])
            )
        ts_values.sort()

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0

        closed = []
        for t in ts_values:
            if last_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us <= gap_us:
                last_us = max(last_us, t)
                n += 1
            else:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = t, t, 1

        if last_us is not None:
            state.update((start_us, last_us, n))
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        out = emit(closed)
        if out is not None:
            yield out

    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(*series_ids)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
