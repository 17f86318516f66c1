"""Classical seasonal decomposition (trend + seasonal + residual).

The textbook moving-average decomposition (Brockwell & Davis; the
algorithm behind ``statsmodels.seasonal_decompose``): for a series with
period ``p``,

- **trend** = centered moving average over one full period (odd ``p``:
  plain mean of the ``p`` surrounding observations; even ``p``: the
  classic 2×p MA — full window of ``p+1`` with half weight on the two
  endpoints), NULL at the edges where the window is incomplete;
- **seasonal** = per-phase mean of the detrended values (phase = row
  position mod ``p``), centered so the seasonal components of one period
  sum to ~0 (each phase weighted equally, as in statsmodels);
- **resid** = value − trend − seasonal (additive model), or
  value / (trend · seasonal) with ratio detrending and mean-1 seasonal
  indexes (multiplicative model — the statsmodels variant; zero/NULL
  trend rows get NULL components).

Spark shape: row-frame windows + two aggregations, all clustered by the
series key (the phase groupBy reuses the window exchange; the per-series
centering frame is series-sized and broadcast back). Lags are
OBSERVATION-based — resample first for calendar periods.

Determinism contract (the ACF idiom): values quantize to the 1e-6 grid;
window/bucket sums accumulate as exact decimals; every division is a
fixed IEEE op over those exact sums — so trend/seasonal/resid replay
bit-for-bit on an external engine. Null values pass through with NULL
trend contribution handling: a window containing any NULL value yields
NULL trend for that row (the statsmodels behavior), and NULL detrended
rows are excluded from the phase means."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from tempo_spark.functions.grid import grid6


def seasonal_strength(
    tsdf, value_col: str, period: int, model: str = "additive",
    trend_method: str = "ma",
) -> DataFrame:
    """Per-series STL-style strength features (Hyndman & Athanasopoulos,
    "Measuring strength of trend and seasonality"):

        F_T = max(0, 1 − Var(resid) / Var(trend + resid))
        F_S = max(0, 1 − Var(resid) / Var(seasonal + resid))

    over the rows where all three components exist. ADDITIVE
    decompositions only: the formula mixes component scales for a
    multiplicative model (ratio-scale remainder vs unit-scale trend
    would report trend_strength ≈ 1 for any wandering-level series) —
    log-transform the series and decompose additively instead. Returns
    (series…, n_components, trend_strength, seasonal_strength) — values
    in [0, 1]; NULL when fewer than 2 component rows or a zero
    denominator variance.

    Shape: one :func:`seasonal_decompose` pass + ONE aggregation on the
    same series clustering. Exactness: each variance input re-quantizes
    to the 1e-6 grid and sums as exact decimals; the strengths are fixed
    IEEE expressions over those sums. NOTE the decomposition components
    themselves replay cross-engine at the 1e-6 GRID (not bit-exact —
    component ulps amplify to ~1e-13 relative through the variance
    cancellation), so external comparisons should harden-round the
    strengths (the gate applies _HR6 on both sides)."""
    if model != "additive":
        raise ValueError(
            "seasonal_strength is defined on ADDITIVE decompositions "
            "(Hyndman F_T/F_S); log-transform the series for a "
            f"multiplicative analysis — got model={model!r}"
        )
    sd = seasonal_decompose(tsdf, value_col, period, model, trend_method)
    keys = list(tsdf.series_ids)
    ok = (
        F.col("trend").isNotNull()
        & F.col("seasonal").isNotNull()
        & F.col("resid").isNotNull()
    )
    r = F.when(ok, grid6(F.col("resid")))
    tr = F.when(ok, grid6(F.col("trend") + F.col("resid")))
    sr = F.when(ok, grid6(F.col("seasonal") + F.col("resid")))

    def _suf(c, nm):
        d = c.cast("decimal(18,6)")
        return [
            F.sum(d).alias(f"__ss_s{nm}"),
            F.sum(d * d).alias(f"__ss_q{nm}"),
        ]

    agg = (sd.groupBy(*keys) if keys else sd.groupBy()).agg(
        F.count(r).alias("n_components"),
        *_suf(r, "r"), *_suf(tr, "t"), *_suf(sr, "s"),
    )
    n = F.col("n_components").cast("double")

    def _var(nm):
        s = F.col(f"__ss_s{nm}").cast("double")
        q = F.col(f"__ss_q{nm}").cast("double")
        return n * q - s * s  # n²·Var — the ratio cancels the scale

    def _strength(den_nm):
        den = _var(den_nm)
        return F.when(
            (F.col("n_components") >= 2) & (den > 0),
            F.greatest(F.lit(0.0), F.lit(1.0) - _var("r") / den),
        )

    return agg.select(
        *keys,
        "n_components",
        _strength("t").alias("trend_strength"),
        _strength("s").alias("seasonal_strength"),
    )



def seasonal_decompose(
    tsdf, value_col: str, period: int, model: str = "additive",
    trend_method: str = "ma",
) -> DataFrame:
    """df + (trend, seasonal, resid) columns; see module docstring.

    ``trend_method="median"`` (robust mode, STL-spirited): the trend is
    the exact running MEDIAN over the same full-width window instead of
    the moving average — a single outlier tick then perturbs at most the
    windows it enters by one rank instead of dragging every mean, so
    spikes land in ``resid`` where they belong. Even periods use the
    plain median of the ``period+1``-row window (odd count → exact
    middle element; the 2×P half-weighting is a mean-specific
    correction). Same NULL-poisoning and edge rules as the MA trend."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if model not in ("additive", "multiplicative"):
        raise ValueError(
            f"model must be 'additive' or 'multiplicative', got {model!r}"
        )
    if trend_method not in ("ma", "median"):
        raise ValueError(
            f"trend_method must be 'ma' or 'median', got {trend_method!r}"
        )
    mult = model == "multiplicative"
    if value_col not in tsdf.df.columns:
        raise ValueError(f"value_col {value_col!r} not in DataFrame")
    clash = sorted(
        c for c in tsdf.df.columns
        if c in ("trend", "seasonal", "resid") or c.startswith("__sd_")
    )
    if clash:
        raise ValueError(f"reserved output/staging columns present: {clash}")

    df = tsdf.df
    keys = list(tsdf.series_ids)
    if not keys:
        df = df.withColumn("__sd_g", F.lit(0))
        keys = ["__sd_g"]
    series = [F.col(c) for c in keys]
    order = [tsdf._exact_micros_order()]
    if getattr(tsdf, "sequence_col", None):
        order.append(F.col(tsdf.sequence_col))
    w = Window.partitionBy(*series).orderBy(*order)

    yq = F.floor(F.col(value_col).cast("double") * 1e6 + F.lit(0.5)) / F.lit(1e6)
    ydec = F.col("__sd_y").cast("decimal(18,6)")
    staged = df.withColumn("__sd_y", yq).withColumn(
        "__sd_pos", F.row_number().over(w)
    )

    half = period // 2
    if trend_method == "median":
        frame = w.rowsBetween(-half, half)
        need = period if period % 2 == 1 else period + 1
        tcnt = F.count("__sd_y").over(frame)
        rows_in = F.count(F.lit(1)).over(frame)
        # median/percentile are not frame-capable window aggregates in
        # Spark; `need` is always ODD and the guard pins exactly `need`
        # non-null values in frame, so the exact median is the middle
        # element of the sorted frame values (deterministic, replayable)
        sorted_win = F.array_sort(F.collect_list("__sd_y").over(frame))
        trend = F.when(
            (rows_in == need) & (tcnt == need),
            F.element_at(sorted_win, (need + 1) // 2),
        )
    elif period % 2 == 1:
        frame = w.rowsBetween(-half, half)
        need = period
        # NULL-poisoning: any null y in the frame nulls the trend (count
        # counts non-null rows, so a full-width frame with a null misses)
        tsum = F.sum(ydec).over(frame)
        tcnt = F.count("__sd_y").over(frame)
        rows_in = F.count(F.lit(1)).over(frame)
        trend = F.when(
            (rows_in == need) & (tcnt == need),
            tsum.cast("double") / F.lit(float(period)),
        )
    else:
        # 2×p MA: full window [-p/2, p/2], endpoints at half weight —
        # exact form: (sum − (first + last)/2) / p over p+1 rows
        frame = w.rowsBetween(-half, half)
        need = period + 1
        tsum = F.sum(ydec).over(frame)
        tcnt = F.count("__sd_y").over(frame)
        rows_in = F.count(F.lit(1)).over(frame)
        lo = F.lag(ydec, half).over(w)
        hi = F.lead(ydec, half).over(w)
        trend = F.when(
            (rows_in == need) & (tcnt == need),
            (
                (tsum - lo - hi).cast("double")
                + (lo + hi).cast("double") / F.lit(2.0)
            )
            / F.lit(float(period)),
        )
    staged = staged.withColumn("trend", trend).withColumn(
        "__sd_ph", F.pmod(F.col("__sd_pos") - 1, F.lit(period))
    )
    # detrended on the 1e-6 grid so the phase means are exact-decimal sums
    if mult:
        # ratio detrending. The ratio is unbounded as trend -> 0: past
        # ~1e12 the 1e-6 grid's floor(x*1e6) overflows a long and the
        # decimal(18,6) phase-sum cast overflows too — under ANSI either
        # ABORTS the job. A near-zero trend means the multiplicative
        # model is wrong for the series anyway; such rows yield NULL
        # components instead of exploding (|ratio| < 1e12 keeps every
        # downstream op in range).
        ratio = F.col("__sd_y") / F.col("trend")
        det_raw = F.when(
            (F.col("trend") != 0) & (F.abs(ratio) < F.lit(1e12)), ratio
        )
    else:
        det_raw = F.col("__sd_y") - F.col("trend")
    det = F.floor(det_raw * 1e6 + F.lit(0.5)) / F.lit(1e6)
    staged = staged.withColumn("__sd_det", det)

    pm = staged.groupBy(*keys, "__sd_ph").agg(
        F.sum(F.col("__sd_det").cast("decimal(18,6)")).alias("__sd_ds"),
        F.count("__sd_det").alias("__sd_dn"),
    )
    # phase mean on the grid (hardened), so the centering sum is exact too
    pmq = F.when(
        F.col("__sd_dn") > 0,
        F.floor(
            (F.col("__sd_ds").cast("double") / F.col("__sd_dn")) * 1e6
            + F.lit(0.5)
        )
        / F.lit(1e6),
    )
    pm = pm.withColumn("__sd_pm", pmq)
    # guard the division: a series too short for ANY trend has zero
    # non-null phase means (ANSI: count 0 would throw)
    center = pm.groupBy(*keys).agg(
        F.when(
            F.count("__sd_pm") > 0,
            F.sum(F.col("__sd_pm").cast("decimal(18,6)")).cast("double")
            / F.count("__sd_pm"),
        ).alias("__sd_c")
    )
    if mult:
        # multiplicative indexes normalize to mean 1 (divide by the mean
        # of the phase means; a zero mean index cannot be normalized)
        seas_val = F.when(
            F.col("__sd_pm").isNotNull() & (F.col("__sd_c") != 0),
            F.col("__sd_pm") / F.col("__sd_c"),
        )
    else:
        seas_val = F.when(
            F.col("__sd_pm").isNotNull(),
            F.col("__sd_pm") - F.col("__sd_c"),
        )
    # eqNullSafe join-backs on renamed keys (the __qid idiom): plain
    # name-based equi-joins would drop NULL-keyed series — they get a
    # trend (windows treat NULL as a partition) but no seasonal/resid.
    center_r = center.select(
        *[F.col(k).alias(f"__sd_k{i}") for i, k in enumerate(keys)], "__sd_c"
    )
    center_cond = [
        F.col(k).eqNullSafe(F.col(f"__sd_k{i}")) for i, k in enumerate(keys)
    ]
    seasonal = (
        pm.join(F.broadcast(center_r), center_cond)
        .select(*keys, "__sd_ph", seas_val.alias("seasonal"))
    )
    seasonal_r = seasonal.select(
        *[F.col(k).alias(f"__sd_k{i}") for i, k in enumerate(keys)],
        F.col("__sd_ph").alias("__sd_phr"),
        "seasonal",
    )
    seas_cond = [
        F.col(k).eqNullSafe(F.col(f"__sd_k{i}")) for i, k in enumerate(keys)
    ] + [F.col("__sd_ph") == F.col("__sd_phr")]
    out = staged.join(seasonal_r, seas_cond, "left").drop(
        "__sd_phr", *[f"__sd_k{i}" for i in range(len(keys))]
    )
    if mult:
        resid_val = F.when(
            F.col("__sd_y").isNotNull()
            & F.col("trend").isNotNull()
            & F.col("seasonal").isNotNull()
            & (F.col("trend") * F.col("seasonal") != 0),
            F.col("__sd_y") / (F.col("trend") * F.col("seasonal")),
        )
    else:
        resid_val = F.when(
            F.col("__sd_y").isNotNull()
            & F.col("trend").isNotNull()
            & F.col("seasonal").isNotNull(),
            (F.col("__sd_y") - F.col("trend")) - F.col("seasonal"),
        )
    out = out.withColumn("resid", resid_val)
    return out.drop("__sd_y", "__sd_pos", "__sd_ph", "__sd_det", "__sd_g")


def seasonal_anomalies(
    tsdf, value_col: str, period: int, z: float = 3.0,
    model: str = "additive", trend_method: str = "ma",
    out_flag: str = "is_anomaly", out_z: str = "resid_z",
) -> DataFrame:
    """Seasonal-residual anomaly detection (the STL-residual ESD recipe):
    decompose, then flag rows whose residual deviates more than ``z``
    sample standard deviations from the series' own residual mean —
    spikes that survive trend AND seasonality removal, so a regular
    daily peak never flags while a genuine outlier tick does. Use
    ``trend_method="median"`` when outliers are large enough to drag
    the MA trend itself.

    Adds to :func:`seasonal_decompose`'s output:

    - ``out_z``: (resid − mean)/σ over the 1e-6-quantized residuals
      (NULL where resid is NULL, n < 2, or σ = 0);
    - ``out_flag``: |resid − mean| > z·σ (NULL where resid is NULL or
      n < 2; on a FLAT residual — σ = 0 — any nonzero deviation flags).

    Determinism: the residuals replay on the 1e-6 grid (module
    contract), the per-series mean/σ come from exact decimal sums of
    those quantized residuals, and the flag is one IEEE comparison —
    both sides of the gate evaluate identical doubles. One extra
    series-sized window over the decomposition's existing clustering —
    no new shuffle."""
    if z <= 0:
        raise ValueError(f"z must be > 0, got {z}")
    clash = sorted(
        c for c in tsdf.df.columns
        if c in (out_flag, out_z) or c.startswith("__sa_")
    )
    if clash:
        raise ValueError(f"reserved output columns present: {clash}")
    dec = seasonal_decompose(tsdf, value_col, period, model, trend_method)
    keys = list(tsdf.series_ids)
    wser = Window.partitionBy(*[F.col(c) for c in keys])
    rq = grid6("resid")
    staged = dec.withColumn("__sa_rq", rq)
    rdec = F.col("__sa_rq").cast("decimal(18,6)")
    cnt = F.count("__sa_rq").over(wser)
    s = F.sum(rdec).over(wser).cast("double")
    q = F.sum(rdec * rdec).over(wser).cast("double")
    cntd = cnt.cast("double")
    mean = s / cntd
    var = (cntd * q - s * s) / (cntd * (cntd - F.lit(1.0)))
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    ok = F.col("__sa_rq").isNotNull() & (cnt >= 2)
    zscore = F.when(ok & (sd > 0), (F.col("__sa_rq") - mean) / sd)
    flag = F.when(
        ok, F.abs(F.col("__sa_rq") - mean) > F.lit(float(z)) * sd
    )
    return (
        staged.withColumn(out_z, zscore)
        .withColumn(out_flag, flag)
        .drop("__sa_rq")
    )
