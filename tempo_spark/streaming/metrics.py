"""Late-data observability for the streaming operators.

The watermark bounds every stateful operator's state store, and what
happens to a row that arrives BEHIND it is silent either way: the
pandas-kernel ops (as-of/sessionize/interpolate) drop it at their own
cutoff; the windowed aggregations admit it and emit a stale window (see
below). A production pipeline needs to SEE what the watermark is
costing, or a mis-sized delay ships a quietly truncated — or quietly
stale-barred — dataset.

Measured on Spark 4.1 (r12, pinned in tests/test_streaming.py): the
hazard is worse than a silent drop. A windowed aggregation ADMITS a row
behind the watermark — the watermark drives state eviction and append
emission, not input filtering — so a straggler whose window already
closed materializes a FRESH partial window row in the output (a sink
keyed on window-start silently takes a stale bar), and the engine's
``stateOperators[*].numRowsDroppedByWatermark`` stays 0 for both the
windowed-aggregation ops and the ``applyInPandasWithState`` kernels
(the tempo kernels enforce their own watermark cutoffs internally; the
counter is populated only for stream-stream joins / dropDuplicates). So
the reliable signals here are observation-derived:

- :func:`observe_input` attaches a ``Dataset.observe`` node on the input
  side — a zero-cost passthrough reporting, per micro-batch, the arrival
  count and the event-time span in **epoch microseconds** (tz-free: the
  JSON rendering of observed timestamps is session-tz-dependent, the r4
  streaming-kernel bug class);
- :func:`late_row_stats` folds a query's progress history into arrival
  totals, Spark's (join/dedup-only) drop counter, and the
  observation-vs-watermark lateness signals: ``late_batches`` (batches
  whose oldest arrival was behind the watermark then in effect) and
  ``max_lateness_sec`` (how far behind — the number that tells you what
  watermark delay would have kept the data).

The streaming operators accept ``observe: str | None`` to attach the
node without breaking their one-expression composition."""

from __future__ import annotations

import datetime as _dt
import json
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_OBSERVATION = "tempo_input"


def observe_input(
    sdf: DataFrame, ts_col: str, name: str = DEFAULT_OBSERVATION
) -> DataFrame:
    """Attach an ``observe`` node counting arriving rows + event-time
    span (epoch micros). Call BEFORE the stateful operator so late rows
    are counted as arrived, not as surviving."""
    us = F.unix_micros(F.col(ts_col))
    return sdf.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.min(us).alias("min_event_us"),
        F.max(us).alias("max_event_us"),
    )


def _progress_dicts(query_or_progress) -> list:
    """Normalize a StreamingQuery / progress object / dict / list of
    either into a list of plain progress dicts."""
    src = query_or_progress
    if hasattr(src, "recentProgress"):
        src = src.recentProgress
    if isinstance(src, dict) or not hasattr(src, "__iter__"):
        src = [src]
    out = []
    for p in src:
        if p is None:
            continue
        if isinstance(p, dict):
            out.append(p)
        elif hasattr(p, "json"):
            j = p.json() if callable(p.json) else p.json
            out.append(json.loads(j))
        else:
            out.append(json.loads(str(p)))
    return out


def _watermark_us(p: dict) -> Optional[int]:
    wm = (p.get("eventTime") or {}).get("watermark")
    if not wm:
        return None
    try:
        d = _dt.datetime.fromisoformat(wm.replace("Z", "+00:00"))
    except ValueError:
        return None
    us = int(d.timestamp() * 1_000_000)
    return us if us > 0 else None  # epoch-0 = "no watermark yet"


def late_row_stats(
    query_or_progress, observation: Optional[str] = DEFAULT_OBSERVATION
) -> dict:
    """Summarize a query's progress history:

    - ``input_rows`` / ``min_event_us`` / ``max_event_us``: totals from
      the :func:`observe_input` observation (``input_rows`` None if no
      batch carried an observation with that name);
    - ``late_batches``: batches whose oldest OBSERVED arrival was behind
      the watermark in effect during that batch — for the pandas-kernel
      ops (as-of/sessionize/interpolate, which enforce their own
      cutoffs) that row was dropped; for the windowed aggregations it
      was ADMITTED and emitted a stale window row (see module
      docstring) — either way the batch needs attention;
    - ``max_lateness_sec``: the worst (watermark − arrival) gap seen —
      size the watermark delay up by this much to have kept that data;
    - ``dropped_by_watermark_metric``: Σ Spark's own counter (populated
      for stream-stream joins / dropDuplicates only — 0 for window aggs
      and the pandas kernels on 4.1, see module docstring);
    - ``watermark``: the last reported event-time watermark (ISO, UTC);
    - ``batches``: progress entries inspected.

    Pass the StreamingQuery itself (uses ``recentProgress``), one
    progress dict, or a list of either."""
    stats = {
        "input_rows": None,
        "min_event_us": None,
        "max_event_us": None,
        "late_batches": 0,
        "max_lateness_sec": 0.0,
        "dropped_by_watermark_metric": 0,
        "watermark": None,
        "batches": 0,
    }
    for p in _progress_dicts(query_or_progress):
        stats["batches"] += 1
        obs = (p.get("observedMetrics") or {}).get(observation)
        if obs is not None and hasattr(obs, "asDict"):
            obs = obs.asDict()  # recentProgress nests pyspark Rows
        wm_us = _watermark_us(p)
        if obs:
            stats["input_rows"] = (stats["input_rows"] or 0) + (
                obs.get("rows") or 0
            )
            mn, mx = obs.get("min_event_us"), obs.get("max_event_us")
            if mn is not None:
                stats["min_event_us"] = (
                    mn if stats["min_event_us"] is None
                    else min(stats["min_event_us"], mn)
                )
                if wm_us is not None and mn < wm_us:
                    stats["late_batches"] += 1
                    stats["max_lateness_sec"] = max(
                        stats["max_lateness_sec"], (wm_us - mn) / 1e6
                    )
            if mx is not None:
                stats["max_event_us"] = (
                    mx if stats["max_event_us"] is None
                    else max(stats["max_event_us"], mx)
                )
        for so in p.get("stateOperators") or []:
            if hasattr(so, "asDict"):
                so = so.asDict()
            stats["dropped_by_watermark_metric"] += int(
                so.get("numRowsDroppedByWatermark") or 0
            )
        wm = (p.get("eventTime") or {}).get("watermark")
        if wm:
            stats["watermark"] = wm
    return stats
