"""Streaming as-of join — bounded-lateness stream×stream as-of.

The reference lists streaming as-of joins as future roadmap only
(reference: docs/about/future-roadmap.rst:24-27). This implements the
practical bounded version: each left event is joined to the latest right
event within ``[left.ts - lookback, left.ts]`` for the same series, using
Structured Streaming's native **stream-stream interval join** — watermarks
bound both buffers, so state is O(rate × lookback) per series and the job
runs indefinitely.

Semantics note: the interval join emits ALL right rows in the lookback
band; the per-left "latest right" reduction is applied with a keyed
aggregation (max_by over the right timestamp) — in streaming this requires
``update``/``complete`` output for the final dedup stage, or a
``foreachBatch`` that applies the reduction per micro-batch. Both paths are
provided: ``streaming_asof_candidates`` (pure append, all candidates) and
``reduce_asof_candidates`` (batch-side reduction for foreachBatch).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def streaming_asof_candidates(
    left: DataFrame,
    right: DataFrame,
    series_ids: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_seconds: int = 3600,
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    right_prefix: str = "right",
) -> DataFrame:
    """Append-mode stream-stream join: every (left row, right row) pair with
    ``left.ts - lookback <= right.ts <= left.ts`` in the same series.

    Spark plans this as a watermarked interval join: right state is evicted
    once older than ``right_watermark + lookback``; left rows emit as soon
    as eligible rights are known-complete."""
    r = right
    for c in right.columns:
        if c not in series_ids:
            r = r.withColumnRenamed(c, f"{right_prefix}_{c}")
    r_ts = f"{right_prefix}_{right_ts}"

    lw = left.withWatermark(left_ts, left_watermark)
    rw = r.withWatermark(r_ts, right_watermark)

    cond = F.lit(True)
    for c in series_ids:
        cond = cond & (lw[c] == rw[c])
    cond = cond & (
        rw[r_ts].between(
            lw[left_ts] - F.expr(f"interval {lookback_seconds} seconds"),
            lw[left_ts],
        )
    )
    joined = lw.join(rw, on=cond, how="leftOuter")
    keep = [lw[c].alias(c) for c in left.columns] + [
        rw[c].alias(c) for c in r.columns if c not in series_ids
    ]
    return joined.select(*keep)


def reduce_asof_candidates(
    candidates: DataFrame,
    series_ids: Sequence[str],
    left_ts: str = "ts",
    right_ts_prefixed: str = "right_ts",
    left_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per left row, keep the candidate with the greatest right timestamp —
    apply inside ``foreachBatch`` (or on any static candidates frame)."""
    right_cols = [c for c in candidates.columns if c.startswith(right_ts_prefixed.split("_")[0] + "_")]
    group_cols = list(series_ids) + [left_ts] + [
        c for c in (left_cols or []) if c not in series_ids and c != left_ts
    ]
    packed = F.max(
        F.when(
            F.col(right_ts_prefixed).isNotNull(),
            F.struct(F.col(right_ts_prefixed).alias("__ts"), *[F.col(c).alias(c) for c in right_cols]),
        )
    ).alias("__best")
    reduced = candidates.groupBy(*group_cols).agg(packed)
    return reduced.select(
        *group_cols, *[F.col("__best").getField(c).alias(c) for c in right_cols]
    )
