"""Running drawdown and per-series winsorization.

``with_drawdown``: the risk-monitoring staple — running peak (cumulative
max) per series and the drop from it, absolute and fractional. Pure
window expressions over the 1e-6 value grid: ONE shuffle, O(n), exact
(peak and peak−value are grid arithmetic; the fraction is one fixed
IEEE division), so every output replays on an external engine.

``winsorize``: clip each series' values to its own [lower, upper]
exact interpolated percentiles (Spark ``percentile`` == DuckDB
``quantile_cont`` — the repo's established cross-engine pair over exact
integer inputs). Shape: one per-series aggregation + a broadcast
join-back on eqNullSafe-renamed keys (NULL series keys are real series
— the repo convention), zero extra shuffles on the data side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from tempo_spark.functions.grid import grid6


def with_drawdown(
    tsdf, value_col: str, out: str = "drawdown", out_pct: str = "drawdown_pct"
) -> DataFrame:
    """df + running ``peak``, ``out`` = peak − value, ``out_pct`` =
    (peak − value)/peak (NULL when peak == 0 — ANSI-safe). NULL values
    keep the carried peak but get NULL drawdowns."""
    if value_col not in tsdf.df.columns:
        raise ValueError(f"value_col {value_col!r} not in DataFrame")
    clash = sorted(
        c for c in tsdf.df.columns if c in ("peak", out, out_pct)
    )
    if clash:
        raise ValueError(f"reserved output columns present: {clash}")
    df = tsdf.df
    keys = list(tsdf.series_ids)
    series = [F.col(c) for c in keys] if keys else [F.lit(0)]
    order = [tsdf._exact_micros_order()]
    if getattr(tsdf, "sequence_col", None):
        order.append(F.col(tsdf.sequence_col))
    w = (
        Window.partitionBy(*series)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    yq = grid6(value_col)
    peak = F.max(yq).over(w)
    dd = peak - yq
    pct = F.when(peak != 0, dd / peak)
    return (
        df.withColumn("peak", peak)
        .withColumn(out, dd)
        .withColumn(out_pct, pct)
    )


def winsorize(
    tsdf,
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    out: str | None = None,
) -> DataFrame:
    """df + ``out`` (default ``{value_col}_wz``): values clipped to the
    series' own exact interpolated [lower, upper] percentiles; NULL
    values stay NULL; the raw column is untouched."""
    if value_col not in tsdf.df.columns:
        raise ValueError(f"value_col {value_col!r} not in DataFrame")
    if not (0.0 <= lower <= upper <= 1.0):
        raise ValueError(
            f"need 0 <= lower <= upper <= 1, got ({lower}, {upper})"
        )
    out = out or f"{value_col}_wz"
    if out in tsdf.df.columns or out in ("__wz_lo", "__wz_hi"):
        raise ValueError(f"output column {out!r} already exists")
    clash = sorted(c for c in tsdf.df.columns if c.startswith("__wz_"))
    if clash:
        raise ValueError(f"reserved staging columns present: {clash}")
    df = tsdf.df
    keys = list(tsdf.series_ids)
    vd = F.col(value_col).cast("double")
    # NaN behaves like NULL (the r9 "NaN > everything" class): excluded
    # from the percentile fit (Spark sorts NaN above every real value, so
    # one NaN would drag the upper bound to NaN and disable clipping) and
    # NaN inputs emit NULL instead of a fabricated clipped value
    v = F.when(vd.isNotNull() & ~F.isnan(vd), vd)
    if not keys:
        # global percentiles via a windowless aggregate broadcast back
        bounds = df.agg(
            F.percentile(v, F.lit(float(lower))).alias("__wz_lo"),
            F.percentile(v, F.lit(float(upper))).alias("__wz_hi"),
        )
        joined = df.crossJoin(F.broadcast(bounds))
    else:
        bounds = df.groupBy(*keys).agg(
            F.percentile(v, F.lit(float(lower))).alias("__wz_lo"),
            F.percentile(v, F.lit(float(upper))).alias("__wz_hi"),
        )
        renamed = bounds.select(
            *[F.col(k).alias(f"__wz_k{i}") for i, k in enumerate(keys)],
            "__wz_lo", "__wz_hi",
        )
        cond = [
            F.col(k).eqNullSafe(F.col(f"__wz_k{i}"))
            for i, k in enumerate(keys)
        ]
        joined = df.join(F.broadcast(renamed), cond, "left").drop(
            *[f"__wz_k{i}" for i in range(len(keys))]
        )
    clipped = F.when(
        v.isNotNull(),
        F.least(F.greatest(v, F.col("__wz_lo")), F.col("__wz_hi")),
    )
    return joined.withColumn(out, clipped).drop("__wz_lo", "__wz_hi")
