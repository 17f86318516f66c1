"""Per-series discrete Fourier transform (reference:
python/tempo/tsdf.py:1386-1495).

This is one of the two places where a Python kernel is genuinely required —
an FFT is an iterative whole-series algorithm no DataFrame expression
covers. Runs as ``applyInPandas`` (Arrow-batched, one group per series) with
numpy's FFT; each series must fit in one executor's memory, which holds for
time-series workloads where a single series is ≪ total data.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

_DUMMY = "__tempo_dummy_group"


def fourier_transform(tsdf, timestep: float, value_col: str):
    from tempo_spark.tsdf import TSDF

    ts, series, seq = tsdf.ts_col, list(tsdf.series_ids), tsdf.sequence_col

    df = tsdf.df
    group_cols = series
    if not group_cols:
        df = df.withColumn(_DUMMY, F.lit(0))
        group_cols = [_DUMMY]

    schema = StructType(
        [f for f in df.schema.fields]
        + [
            StructField("freq", DoubleType()),
            StructField("ft_real", DoubleType()),
            StructField("ft_imag", DoubleType()),
        ]
    )
    out_cols = [f.name for f in schema.fields]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(by=[ts] + ([seq] if seq else [])).reset_index(drop=True)
        y = pdf[value_col].astype(float).to_numpy()
        n = len(y)
        transformed = np.fft.fft(y)
        pdf["freq"] = np.fft.fftfreq(n, d=timestep)
        pdf["ft_real"] = transformed.real
        pdf["ft_imag"] = transformed.imag
        return pdf[out_cols]

    result = df.groupBy(*group_cols).applyInPandas(kernel, schema=schema)
    if not series:
        result = result.drop(_DUMMY)
    return TSDF(result, ts_col=ts, series_ids=series, sequence_col=seq, validate=False)


def spectral_filter(
    tsdf,
    value_col: str,
    timestep: float,
    low_cutoff_hz: float = None,
    high_cutoff_hz: float = None,
    out: str = None,
):
    """Per-series FFT band-pass denoising: zero every frequency bin
    outside [``low_cutoff_hz``, ``high_cutoff_hz``] (inclusive; give
    only ``high`` for a LOW-pass, only ``low`` for a HIGH-pass) and
    inverse-transform — the classic spectral smoother/detrender. The DC
    bin (0 Hz) is kept unless ``low_cutoff_hz > 0`` excludes it.

    Returns the TSDF with ``out`` (default ``{value_col}_filtered``)
    added: the real part of the iFFT (the imaginary residue of a real
    input's round-trip is numerical noise, discarded).

    Same Python-kernel domain as :func:`fourier_transform` (the ONE
    sanctioned per-row escape: whole-series FFT) — Arrow-batched, one
    group per series; a series must fit an executor. Deliberately NOT
    value-gated: the FFT→mask→iFFT round-trip's float error vs a naive
    DFT replay is ~1e-11 per element with no exact-sum formulation (the
    r4 fourier-boundary lesson) — parity is pinned by pytest against
    numpy instead (GATEMAP exclusion note)."""
    from tempo_spark.tsdf import TSDF

    if low_cutoff_hz is None and high_cutoff_hz is None:
        raise ValueError("give low_cutoff_hz and/or high_cutoff_hz")
    if (
        low_cutoff_hz is not None
        and high_cutoff_hz is not None
        and low_cutoff_hz > high_cutoff_hz
    ):
        raise ValueError(
            f"low_cutoff_hz {low_cutoff_hz} > high_cutoff_hz {high_cutoff_hz}"
        )
    if timestep <= 0:
        raise ValueError(f"timestep must be positive, got {timestep}")
    if value_col not in tsdf.df.columns:
        raise ValueError(f"value_col {value_col!r} not in DataFrame")
    if out is None:
        out = f"{value_col}_filtered"
    if out in tsdf.df.columns:
        raise ValueError(f"output column {out!r} already present")
    ts, series, seq = tsdf.ts_col, list(tsdf.series_ids), tsdf.sequence_col
    df = tsdf.df
    group_cols = series
    if not group_cols:
        df = df.withColumn(_DUMMY, F.lit(0))
        group_cols = [_DUMMY]
    schema = StructType(
        [f for f in df.schema.fields] + [StructField(out, DoubleType())]
    )
    out_cols = [f.name for f in schema.fields]
    lo = low_cutoff_hz
    hi = high_cutoff_hz

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            by=[ts] + ([seq] if seq else [])
        ).reset_index(drop=True)
        y = pdf[value_col].astype(float).to_numpy()
        # NaN/None would poison the whole spectrum: fill with the series
        # mean (zero-energy contribution), restore NULL on output
        mask_bad = ~np.isfinite(y)
        yy = y.copy()
        if mask_bad.any():
            good = yy[~mask_bad]
            yy[mask_bad] = good.mean() if len(good) else 0.0
        spec = np.fft.fft(yy)
        freqs = np.abs(np.fft.fftfreq(len(yy), d=timestep))
        keep = np.ones(len(yy), dtype=bool)
        if lo is not None:
            keep &= freqs >= lo
        if hi is not None:
            keep &= freqs <= hi
        spec[~keep] = 0.0
        filt = np.fft.ifft(spec).real
        filt[mask_bad] = np.nan
        pdf[out] = filt
        return pdf[out_cols]

    result = df.groupBy(*group_cols).applyInPandas(kernel, schema=schema)
    if not series:
        result = result.drop(_DUMMY)
    # Arrow renders the restored NaN as NaN; normalize to NULL (grid
    # convention: NaN is not a value)
    result = result.withColumn(
        out, F.when(F.isnan(F.col(out)), F.lit(None)).otherwise(F.col(out))
    )
    return TSDF(result, ts_col=ts, series_ids=series, sequence_col=seq, validate=False)
