"""tempo_spark — a PySpark-native time-series analytics engine.

Capability parity target: databrickslabs/tempo (see SURVEY.md), re-expressed
Spark-first, plus large-scale data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) under ``tempo_spark.pipeline``.
"""

from tempo_spark.tsdf import TSDF, ResampledTSDF
from tempo_spark.intervals import IntervalsDF

__version__ = "0.1.0"
__all__ = ["TSDF", "ResampledTSDF", "IntervalsDF"]
