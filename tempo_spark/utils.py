"""Display + planning utilities (reference: python/tempo/utils.py)."""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tempo_spark.functions.freq import parse_freq

logger = logging.getLogger(__name__)


def get_display_df(tsdf, k: int = 5) -> DataFrame:
    """Latest k rows per series, series-then-time(-then-sequence) ordered
    (reference: python/tempo/utils.py:169-175)."""
    order = [*tsdf.series_ids, tsdf.ts_col]
    if getattr(tsdf, "sequence_col", None):
        order.append(tsdf.sequence_col)
    return tsdf.latest(k).df.orderBy(*order)


def _notebook_renderer():
    """Environment sniffing for :func:`display` (reference:
    python/tempo/utils.py:18,36-50,216-237 — ``DB_HOME`` marks a
    Databricks runtime whose IPython user namespace carries the native
    rich ``display``; a ZMQ IPython shell can render HTML). Evaluated
    LAZILY per call — the reference binds at import time, which freezes
    the wrong renderer when tempo imports before the notebook kernel."""
    import os

    try:
        from IPython import get_ipython  # type: ignore

        ip = get_ipython()
    except ImportError:
        return None, False
    if ip is None:
        return None, False
    if "DB_HOME" in os.environ and "display" in ip.user_ns:
        return ip.user_ns["display"], True
    return None, ip.__class__.__name__ == "ZMQInteractiveShell"


def display(df, n: int = 20) -> None:
    """Polymorphic display (reference: python/tempo/utils.py:139-237):
    a TSDF shows its latest-5-per-series frame via :func:`get_display_df`;
    on Databricks the native rich ``display`` renders it, in a Jupyter
    kernel an HTML ``pre`` style is injected before ``show`` (the
    reference's ``display_html``), anywhere else plain ``show``."""
    import pandas as pd

    if isinstance(df, pd.DataFrame):
        # reference display_html prints the pandas head
        # (python/tempo/utils.py:152-155)
        print(df.head())
        return
    is_tsdf = hasattr(df, "df") and hasattr(df, "latest")
    frame = get_display_df(df) if is_tsdf else getattr(df, "df", df)
    native, html_capable = _notebook_renderer()
    if native is not None:
        native(frame)
        return
    if html_capable:
        try:
            from IPython.core.display import HTML  # type: ignore
            from IPython.display import display as ipydisplay  # type: ignore

            ipydisplay(HTML("<style>pre { white-space: pre !important; }</style>"))
        except ImportError:
            pass
    frame.show(n, truncate=False)


def calculate_time_horizon(
    df: DataFrame,
    ts_col: str,
    freq: str,
    partition_cols: Sequence[str],
    warn_threshold_rows: int = 1_000_000,
) -> dict:
    """Estimate per-series resampled row counts for a frequency — min / max /
    p25 / p50 / p75 / total — and warn when the projected grid is huge
    (reference: python/tempo/utils.py:53-136).

    One aggregation job; call explicitly (never implicitly from operators,
    unlike the reference's eager ``perform_checks`` path).
    """
    f = parse_freq(freq)
    # bucket COUNT, not raw span/interval: both endpoints floor to the
    # resample grid first (reference: python/tempo/utils.py:80-99 rounds
    # min/max epoch to the interval before differencing), so the estimate
    # equals the number of grid buckets resample would actually emit —
    # pinned by the recorded horizon metrics golden. Grid in MICROSECONDS
    # (parse_freq supports sub-millisecond frequencies; a ms grid would
    # divide by zero at '500 microseconds' and silently mis-grid
    # non-integral-ms widths), floored via pmod (`%` truncates toward
    # zero and misbuckets pre-1970 epochs — the tsdf.py block lesson)
    interval_us = round(f.seconds * 1_000_000)
    if interval_us < 1:
        raise ValueError(f"frequency {freq!r} is below 1 microsecond")
    mx = F.unix_micros(F.max(F.col(ts_col)))
    mn = F.unix_micros(F.min(F.col(ts_col)))
    bucket = lambda c: c - F.pmod(c, F.lit(interval_us))  # noqa: E731
    spans = df.groupBy(*partition_cols).agg(
        (((bucket(mx) - bucket(mn)) / F.lit(interval_us)) + 1)
        .alias("__n_buckets")
    )
    stats = spans.agg(
        F.min("__n_buckets").alias("min"),
        F.max("__n_buckets").alias("max"),
        F.percentile_approx("__n_buckets", 0.25).alias("p25"),
        F.percentile_approx("__n_buckets", 0.5).alias("p50"),
        F.percentile_approx("__n_buckets", 0.75).alias("p75"),
        F.sum("__n_buckets").alias("total"),
        F.count("*").alias("num_series"),
    ).collect()[0]
    result = {k: (float(stats[k]) if stats[k] is not None else None) for k in
              ("min", "max", "p25", "p50", "p75", "total", "num_series")}
    if result["total"] and result["total"] > warn_threshold_rows:
        logger.warning(
            "resample at %s projects ~%.0f output rows across %.0f series — "
            "consider a coarser frequency", freq, result["total"], result["num_series"]
        )
    return result
