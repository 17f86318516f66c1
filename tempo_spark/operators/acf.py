"""Per-series autocorrelation function (ACF) at observation lags.

The standard diagnostic for seasonality/persistence in a series (Box &
Jenkins): ``acf(L) = corr(x_t, x_{t+L})`` over the pairs where both
observations exist, lag measured in OBSERVATIONS in series order (the
usual regular-sampling convention; resample first for time-lag
semantics).

Spark shape: all requested lags ride ONE window pass (one ``lead`` per
lag over the same hash(series) window), explode to (lag, x, y) pairs,
then a single groupBy (series, lag) that the window's exchange already
satisfies — one shuffle total, any number of lags.

Determinism contract (the repo's withRangeCorr idiom): inputs are
quantized to the 1e-6 grid, all sufficient statistics (n, Σx, Σy, Σxy,
Σx², Σy²) accumulate as EXACT decimals (order-independent), and the
Pearson formula is then a FIXED IEEE expression over those sums — so the
result is bit-replayable by an external engine. Zero-variance or
single-pair groups yield NULL (never a divide-by-zero)."""

from __future__ import annotations

from typing import Sequence, Union

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from tempo_spark.operators.lttb import _exact_micros


def autocorr(
    tsdf, value_col: str, lags: Union[int, Sequence[int]] = 10
) -> DataFrame:
    """(series…, lag, n_pairs, acf) — one row per series per lag.

    ``lags``: an int K means lags 1..K; or an explicit sequence of
    positive lags. ``n_pairs`` is the number of complete (x_t, x_{t+L})
    pairs; ``acf`` is NULL when fewer than 2 pairs exist or either leg
    has zero variance.
    """
    if isinstance(lags, int):
        if lags < 1:
            raise ValueError(f"lags must be >= 1, got {lags}")
        lag_list = list(range(1, lags + 1))
    else:
        lag_list = [int(x) for x in lags]
        if not lag_list or any(x < 1 for x in lag_list):
            raise ValueError(f"lags must be positive, got {lags}")
        if len(set(lag_list)) != len(lag_list):
            raise ValueError(f"duplicate lags: {lags}")
    if value_col not in tsdf.df.columns:
        raise ValueError(f"value_col {value_col!r} not in DataFrame")

    df = tsdf.df
    keys = list(tsdf.series_ids)
    if not keys:
        df = df.withColumn("__ac_g", F.lit(0))
        keys = ["__ac_g"]
    order = [_exact_micros(tsdf)]
    if getattr(tsdf, "sequence_col", None):
        order.append(F.col(tsdf.sequence_col))
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order)

    xq = F.floor(F.col(value_col).cast("double") * 1e6 + F.lit(0.5)) / F.lit(
        1e6
    )
    staged = df.withColumn("__ac_x", xq)
    for lag in lag_list:
        staged = staged.withColumn(
            f"__ac_y_{lag}", F.lead(F.col("__ac_x"), lag).over(w)
        )
    pairs_arr = F.array(
        *[
            F.struct(
                F.lit(lag).alias("lag"),
                F.col(f"__ac_y_{lag}").alias("y"),
            )
            for lag in lag_list
        ]
    )
    ex = (
        staged.select(*keys, F.col("__ac_x").alias("x"),
                      F.explode(pairs_arr).alias("p"))
        .select(*keys, F.col("p.lag").alias("lag"), "x", F.col("p.y").alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    # (18,6) operands: the product type is (37,12) — under the 38-digit
    # cap in BOTH Spark and DuckDB, so no precision-capping rounding can
    # sneak in (Spark silently rescales a 41-digit product type)
    xd = F.col("x").cast("decimal(18,6)")
    yd = F.col("y").cast("decimal(18,6)")
    agg = ex.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(xd).alias("__sx"),
        F.sum(yd).alias("__sy"),
        F.sum(xd * yd).alias("__sxy"),
        F.sum(xd * xd).alias("__sxx"),
        F.sum(yd * yd).alias("__syy"),
    )
    # fixed-order Pearson over the exact sums (decimal→double per term)
    n = F.col("n_pairs").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    acf = F.when(
        (F.col("n_pairs") >= 2) & (vx > 0) & (vy > 0),
        (n * sxy - sx * sy) / F.sqrt(vx * vy),
    )
    out = agg.select(
        *[c for c in keys if c != "__ac_g"], "lag", "n_pairs",
        acf.alias("acf"),
    )
    return out


def cross_corr(
    tsdf,
    x_col: str,
    y_col: str,
    max_lag: int = 10,
    lags: Sequence[int] = None,
) -> DataFrame:
    """Per-series cross-correlation function (CCF): ``ccf(L) =
    corr(x_t, y_{t+L})`` — the lead-lag diagnostic between two metrics
    (positive L: x leads y; negative L: y leads x; L=0 is the plain
    Pearson correlation). ``lags`` overrides the default −max_lag..max_lag
    sweep. Same shape and exactness contract as :func:`autocorr` — every
    lag rides one window pass, one shuffle total, exact decimal
    sufficient sums, fixed-IEEE Pearson, NULL on degenerate groups.

    Returns (series…, lag, n_pairs, ccf)."""
    if lags is None:
        if max_lag < 0:
            raise ValueError(f"max_lag must be >= 0, got {max_lag}")
        lag_list = list(range(-max_lag, max_lag + 1))
    else:
        lag_list = [int(x) for x in lags]
        if not lag_list:
            raise ValueError("lags must be non-empty")
        if len(set(lag_list)) != len(lag_list):
            raise ValueError(f"duplicate lags: {lags}")
    for c in (x_col, y_col):
        if c not in tsdf.df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")

    df = tsdf.df
    keys = list(tsdf.series_ids)
    if not keys:
        df = df.withColumn("__ac_g", F.lit(0))
        keys = ["__ac_g"]
    order = [_exact_micros(tsdf)]
    if getattr(tsdf, "sequence_col", None):
        order.append(F.col(tsdf.sequence_col))
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order)

    def _grid(c):
        return F.floor(F.col(c).cast("double") * 1e6 + F.lit(0.5)) / F.lit(1e6)

    staged = df.withColumn("__ac_x", _grid(x_col)).withColumn(
        "__ac_yb", _grid(y_col)
    )
    for lag in lag_list:
        shifted = (
            F.lead(F.col("__ac_yb"), lag).over(w)
            if lag >= 0
            else F.lag(F.col("__ac_yb"), -lag).over(w)
        )
        staged = staged.withColumn(f"__ac_y_{'m' if lag < 0 else ''}{abs(lag)}", shifted)
    pairs_arr = F.array(
        *[
            F.struct(
                F.lit(lag).alias("lag"),
                F.col(f"__ac_y_{'m' if lag < 0 else ''}{abs(lag)}").alias("y"),
            )
            for lag in lag_list
        ]
    )
    ex = (
        staged.select(*keys, F.col("__ac_x").alias("x"),
                      F.explode(pairs_arr).alias("p"))
        .select(*keys, F.col("p.lag").alias("lag"), "x", F.col("p.y").alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    xd = F.col("x").cast("decimal(18,6)")
    yd = F.col("y").cast("decimal(18,6)")
    agg = ex.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(xd).alias("__sx"),
        F.sum(yd).alias("__sy"),
        F.sum(xd * yd).alias("__sxy"),
        F.sum(xd * xd).alias("__sxx"),
        F.sum(yd * yd).alias("__syy"),
    )
    n = F.col("n_pairs").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    ccf = F.when(
        (F.col("n_pairs") >= 2) & (vx > 0) & (vy > 0),
        (n * sxy - sx * sy) / F.sqrt(vx * vy),
    )
    return agg.select(
        *[c for c in keys if c != "__ac_g"], "lag", "n_pairs",
        ccf.alias("ccf"),
    )
