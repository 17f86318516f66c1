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
