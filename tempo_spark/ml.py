"""Chronological cross-validation for time-series models.

``TimeSeriesCrossValidator`` extends ``pyspark.ml.tuning.CrossValidator``
with expanding-window chronological folds (reference:
python/tempo/ml.py:16-122): rows are ranked into k+1 chronological splits
per series via ``ntile``; fold i trains on splits 1..i+1 and tests on split
i+2. An optional ``gap`` drops the last ``gap`` rows of each training fold
to prevent leakage across the boundary.
"""

from __future__ import annotations

from typing import List, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

try:  # pyspark.ml requires numpy at import; guard for minimal installs
    from pyspark.ml.tuning import CrossValidator
    from pyspark.ml.param import Param, Params, TypeConverters

    _ML_AVAILABLE = True
except ImportError:  # pragma: no cover
    CrossValidator = object  # type: ignore
    _ML_AVAILABLE = False

_SPLIT = "__tempo_split"


def chronological_folds(
    df: DataFrame,
    n_folds: int,
    ts_col: str,
    series_ids: list[str] | None = None,
    gap: int = 0,
    max_train_splits: int | None = None,
) -> List[Tuple[DataFrame, DataFrame]]:
    """Expanding-window (train, test) fold pairs. Pure function usable
    without pyspark.ml.

    ``max_train_splits`` bounds the training window to the last m
    chronological splits (the sklearn ``TimeSeriesSplit(max_train_size=)``
    rolling-origin form): fold i trains on splits
    ``max(1, i+2−m)..i+1`` instead of ``1..i+1`` — the shape for models
    that should forget stale regimes, and for bounding training cost on
    long histories. ``None`` (default) keeps the expanding window (the
    reference semantics)."""
    if max_train_splits is not None and max_train_splits < 1:
        raise ValueError(
            f"max_train_splits must be >= 1, got {max_train_splits}"
        )
    series_ids = series_ids or []
    w = Window.partitionBy(*series_ids).orderBy(F.col(ts_col))
    ranked = df.withColumn(_SPLIT, F.ntile(n_folds + 1).over(w))
    folds = []
    for i in range(n_folds):
        cond = F.col(_SPLIT) <= i + 1
        if max_train_splits is not None:
            cond = cond & (F.col(_SPLIT) >= max(1, i + 2 - max_train_splits))
        train = ranked.where(cond)
        test = ranked.where(F.col(_SPLIT) == i + 2)
        if gap > 0:
            wd = Window.partitionBy(*series_ids).orderBy(F.col(ts_col).desc())
            train = (
                train.withColumn("__rn_desc", F.row_number().over(wd))
                .where(F.col("__rn_desc") > gap)
                .drop("__rn_desc")
            )
        folds.append((train.drop(_SPLIT), test.drop(_SPLIT)))
    return folds


if _ML_AVAILABLE:

    class TimeSeriesCrossValidator(CrossValidator):
        timeSeriesCol: Param = Param(
            Params._dummy(), "timeSeriesCol", "timestamp column",
            typeConverter=TypeConverters.toString,
        )
        seriesIdCols: Param = Param(
            Params._dummy(), "seriesIdCols", "series id columns",
            typeConverter=TypeConverters.toListString,
        )
        gap: Param = Param(
            Params._dummy(), "gap", "rows trimmed from train tail",
            typeConverter=TypeConverters.toInt,
        )
        maxTrainSplits: Param = Param(
            Params._dummy(), "maxTrainSplits",
            "sliding-window size in splits (0 = expanding)",
            typeConverter=TypeConverters.toInt,
        )

        def __init__(
            self,
            timeSeriesCol: str = "event_ts",
            seriesIdCols: list[str] | None = None,
            gap: int = 0,
            maxTrainSplits: int = 0,
            **other_kwargs,
        ) -> None:
            super().__init__(**other_kwargs)
            self._setDefault(
                timeSeriesCol="event_ts", seriesIdCols=[], gap=0,
                maxTrainSplits=0,
            )
            if maxTrainSplits < 0:
                raise ValueError(
                    "maxTrainSplits must be >= 0 (0 = expanding), got "
                    f"{maxTrainSplits}"
                )
            self._set(
                timeSeriesCol=timeSeriesCol, seriesIdCols=seriesIdCols or [],
                gap=gap, maxTrainSplits=maxTrainSplits,
            )

        def getTimeSeriesCol(self) -> str:
            return self.getOrDefault(self.timeSeriesCol)

        def getSeriesIdCols(self) -> list[str]:
            return self.getOrDefault(self.seriesIdCols)

        def getGap(self) -> int:
            return self.getOrDefault(self.gap)

        def setTimeSeriesCol(self, value: str) -> "TimeSeriesCrossValidator":
            return self._set(timeSeriesCol=value)

        def setSeriesIdCols(self, value: list[str]) -> "TimeSeriesCrossValidator":
            return self._set(seriesIdCols=value)

        def setGap(self, value: int) -> "TimeSeriesCrossValidator":
            return self._set(gap=value)

        def getMaxTrainSplits(self) -> int:
            return self.getOrDefault(self.maxTrainSplits)

        def setMaxTrainSplits(self, value: int) -> "TimeSeriesCrossValidator":
            if value < 0:
                raise ValueError(
                    f"maxTrainSplits must be >= 0 (0 = expanding), got {value}"
                )
            return self._set(maxTrainSplits=value)

        def _kFold(self, dataset: DataFrame) -> List[Tuple[DataFrame, DataFrame]]:
            mts = self.getOrDefault(self.maxTrainSplits)
            return chronological_folds(
                dataset,
                self.getOrDefault(self.numFolds),
                self.getTimeSeriesCol(),
                self.getSeriesIdCols(),
                self.getGap(),
                max_train_splits=mts if mts > 0 else None,
            )
