"""Gap-based sessionization (batch) — group each series' events into
activity sessions: a session ends when the next event arrives ``gap``
or more seconds after the previous one.

The reference has no batch sessionization (its ``extractStateIntervals``
sessionizes on metric *values*, reference: python/tempo/tsdf.py:1497-1616;
streaming sessionization is roadmap-only, docs/about/future-roadmap.rst:24-27).
This is the batch analog of ``tempo_spark.streaming.sessionize``.

Two physical strategies, both ONE shuffle on series_ids:

- ``TimestampType``/``timestamp_ntz`` ts: native ``session_window`` groupBy —
  the same primitive Structured Streaming session windows use, so batch and
  streaming plans share semantics. Spark merges sessions whose windows
  overlap OR touch: ``next_ts - prev_ts <= gap`` (verified empirically —
  an event exactly ``gap`` after the previous one joins its session).
- numeric (epoch double/long, e.g. nanos) ts: gaps-and-islands — ``lag`` diff
  → running sum of session breaks → groupBy. Same ``<=`` semantics.
  NB the gap is compared in the ts column's OWN units here — for an
  epoch-nanos long column pass ``gap_seconds`` in nanoseconds (the
  function cannot know a numeric column's unit).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(tsdf, gap_seconds: float) -> DataFrame:
    """Returns ``(*series_ids, session_start, session_end, n_events)`` with
    one row per session. ``session_end`` is the last event's ts (not
    ``last + gap``)."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    ts, series = tsdf.ts_col, tsdf.series_ids
    dtype = dict(tsdf.df.dtypes)[ts]

    if dtype.startswith("timestamp"):
        # fractional gaps as whole milliseconds (session_window takes an
        # interval string); sub-ms gaps need the numeric-ts path
        millis = int(round(gap_seconds * 1000))
        out = (
            tsdf.df.groupBy(*[F.col(c) for c in series],
                            F.session_window(F.col(ts), f"{millis} milliseconds"))
            .agg(
                F.min(ts).alias("session_start"),
                F.max(ts).alias("session_end"),
                F.count("*").alias("n_events"),
            )
            .drop("session_window")
        )
        return out.select(*series, "session_start", "session_end", "n_events")

    w = Window.partitionBy(*series).orderBy(ts)
    brk = F.when(
        F.col(ts) - F.lag(F.col(ts)).over(w) <= F.lit(gap_seconds), 0
    ).otherwise(1)
    run = Window.partitionBy(*series).orderBy(ts).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        tsdf.df.withColumn("__sid", F.sum(brk).over(run))
        .groupBy(*series, "__sid")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("__sid")
        .select(*series, "session_start", "session_end", "n_events")
    )
