"""Stateful streaming sessionization — the streaming analog of
``extractStateIntervals`` (the reference has no streaming support at all;
its roadmap lists it, reference: docs/about/future-roadmap.rst:24-27).

Groups a stream of events into activity sessions per series: a session
closes when no event arrives within ``gap_seconds`` of the last one.
Implemented with ``applyInPandasWithState`` (Arrow-batched per-group state),
event-time timeouts, and a watermark bounding the state store — the
canonical Structured Streaming custom-stateful-operator shape.

Out-of-order events (any event newer than the watermark) are handled by
keeping the OPEN sessions of each series as a set of disjoint intervals:
an event within ``gap`` of an interval boundary extends it (possibly
bridging two intervals into one); an event more than ``gap`` away opens
its own interval. An interval is emitted only once the watermark passes
``last_event + gap`` — from then on no admissible event can attach to
either boundary, so the session is final. State per series is
O(open intervals), which the watermark bounds to
``ceil(watermark_delay / gap) + 1``.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType


def streaming_sessionize(
    sdf: DataFrame,
    ts_col: str,
    series_ids: Sequence[str],
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    observe: Optional[str] = None,
) -> DataFrame:
    """Returns a streaming DataFrame of closed sessions:
    ``(*series_ids, session_start, session_end, n_events)``.

    A session is emitted when the watermark passes ``session_end + gap``
    (by a data batch or by event-time timeout) — never earlier, so late
    events allowed by the watermark can still extend a session backward
    or forward, or merge two provisional sessions into one. Events behind
    the watermark are dropped silently (by design); ``observe=`` attaches
    the arrival counter read back via
    :func:`tempo_spark.streaming.metrics.late_row_stats`.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    if observe:
        from tempo_spark.streaming.metrics import observe_input

        sdf = observe_input(sdf, ts_col, observe)
    key_fields = [sdf.schema[c] for c in series_ids]
    # the kernel works exclusively in unix_micros computed JVM-side and
    # the output timestamps are reconstructed JVM-side: event time crosses
    # the Arrow boundary as session-timezone-NAIVE wall clock while
    # GroupState watermarks are true UTC epoch, so comparing them directly
    # shifts every session boundary by the session offset (the same fix as
    # streaming asof/interpolate — regression-tested under a non-UTC tz)
    out_schema = StructType(
        list(key_fields)
        + [
            StructField("__start_us", LongType()),
            StructField("__end_us", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("starts", ArrayType(LongType())),
            StructField("lasts", ArrayType(LongType())),
            StructField("ns", ArrayType(LongType())),
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
                row["__start_us"] = start_us
                row["__end_us"] = last_us
                row["n_events"] = n
                rows.append(row)
            return pd.DataFrame(rows)

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        if state.exists:
            starts, lasts, ns = state.get
            sessions = sorted(zip(starts, lasts, ns))
        else:
            sessions = []

        if not state.hasTimedOut:
            ts_values = []
            for pdf in pdfs:
                ts_values.extend(int(v) for v in pdf["__ts_us"])
            # Sweep-merge open intervals with the new events: each event is a
            # unit interval; anything within `gap` of the previous interval's
            # end coalesces into it. This both extends session starts backward
            # for late events and bridges two provisional sessions.
            items = sessions + [(t, t, 1) for t in ts_values]
            items.sort()
            sessions = []
            for s, l, n in items:
                if sessions and s - sessions[-1][1] <= gap_us:
                    ps, pl, pn = sessions[-1]
                    sessions[-1] = (ps, max(pl, l), pn + n)
                else:
                    sessions.append((s, l, n))

        # Final once the watermark passes last + gap: no event >= watermark
        # can be within `gap` of either boundary anymore.
        closed = [x for x in sessions if x[1] + gap_us < wm_us]
        open_ = [x for x in sessions if x[1] + gap_us >= wm_us]

        if open_:
            state.update(
                (
                    [s for s, _, _ in open_],
                    [l for _, l, _ in open_],
                    [n for _, _, n in open_],
                )
            )
            close_ms = min(l for _, l, _ in open_) // 1000 + gap_seconds * 1000
            # Spark requires the timeout to be strictly beyond the watermark.
            state.setTimeoutTimestamp(max(close_ms, wm_ms + 1))
        elif state.exists:
            state.remove()

        out = emit(closed)
        if out is not None:
            yield out

    import pyspark.sql.functions as F

    staged = sdf.withWatermark(ts_col, watermark).select(
        *series_ids,
        F.col(ts_col).alias("__ts"),
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
    )
    raw = staged.groupBy(*series_ids).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return raw.select(
        *series_ids,
        F.timestamp_micros(F.col("__start_us")).alias("session_start"),
        F.timestamp_micros(F.col("__end_us")).alias("session_end"),
        F.col("n_events"),
    )
