from tempo_spark.operators.asof import asof_join
from tempo_spark.operators.interpolation import interpolate
from tempo_spark.operators.resample import calc_bars, resample
from tempo_spark.operators.state import extract_state_intervals
from tempo_spark.operators.fourier import fourier_transform
from tempo_spark.operators.sessions import sessionize

__all__ = [
    "asof_join",
    "interpolate",
    "resample",
    "calc_bars",
    "extract_state_intervals",
    "fourier_transform",
    "sessionize",
]
