"""Single-changepoint detection per series (binary segmentation step).

The classic offline changepoint primitive (Scott & Knott / binary
segmentation, the building block of PELT-style detectors): for every
split position k the between-segment sum of squares

    score(k) = k·(n−k)/n · (mean_left − mean_right)²

is the likelihood-ratio statistic for a mean shift at k under fixed
variance; the best split is its argmax. Recursing on the two halves
gives multi-changepoint segmentation — this operator returns the one
optimal split per series (the recursion step), which is also the usual
"did this series shift, and where?" monitoring question.

Spark shape: ONE shuffle on the series keys — exact decimal prefix sums
over the 1e-6 value grid (order-independent, engine-replayable), n and
the total from the same window pass, score as a FIXED IEEE expression
over those sums, argmax by (score DESC, ts ASC). O(n) per series — no
per-split re-aggregation.

Determinism contract (the ACF idiom): rows order by exact epoch micros
(+ sequence col, + a value-grid content hash so ties are total over
distinct rows); NULL values are EXCLUDED from the statistic (their rows
can't anchor a split); a series with fewer than 2 usable rows emits
nothing. ``score`` replays bit-for-bit on an external engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def changepoint(tsdf, value_col: str) -> DataFrame:
    """(series…, split_ts, n_left, n, mean_left, mean_right, score) —
    one row per series holding the best mean-shift split; ``split_ts``
    is the LAST timestamp of the left segment. See module docstring."""
    if value_col not in tsdf.df.columns:
        raise ValueError(f"value_col {value_col!r} not in DataFrame")
    clash = sorted(c for c in tsdf.df.columns if c.startswith("__cp_"))
    if clash:
        raise ValueError(f"reserved staging columns present: {clash}")

    df = tsdf.df
    keys = list(tsdf.series_ids)
    if not keys:
        df = df.withColumn("__cp_g", F.lit(0))
        keys = ["__cp_g"]
    series = [F.col(c) for c in keys]
    yq = F.floor(F.col(value_col).cast("double") * 1e6 + F.lit(0.5)) / F.lit(1e6)
    base = df.withColumn("__cp_y", yq).where(F.col("__cp_y").isNotNull())

    order = [tsdf._exact_micros_order()]
    if getattr(tsdf, "sequence_col", None):
        order.append(F.col(tsdf.sequence_col))
    order.append(F.xxhash64(F.col("__cp_y")))
    w = Window.partitionBy(*series).orderBy(*order)
    wall = Window.partitionBy(*series)

    ydec = F.col("__cp_y").cast("decimal(18,6)")
    staged = base.select(
        *keys,
        F.col(tsdf.ts_col),
        F.row_number().over(w).alias("__cp_k"),
        F.sum(ydec).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__cp_s"),
        F.sum(ydec).over(wall).alias("__cp_tot"),
        F.count(F.lit(1)).over(wall).alias("__cp_n"),
    )
    k = F.col("__cp_k").cast("double")
    n = F.col("__cp_n").cast("double")
    nr = (F.col("__cp_n") - F.col("__cp_k")).cast("double")
    sl = F.col("__cp_s").cast("double")
    sr = (F.col("__cp_tot") - F.col("__cp_s")).cast("double")
    ml = sl / k
    mr = sr / nr
    d = ml - mr
    score = (k * nr / n) * (d * d)
    scored = staged.where(F.col("__cp_k") < F.col("__cp_n")).select(
        *keys,
        F.col(tsdf.ts_col).alias("split_ts"),
        F.col("__cp_k").alias("n_left"),
        F.col("__cp_n").alias("n"),
        ml.alias("mean_left"),
        mr.alias("mean_right"),
        score.alias("score"),
    )
    pick = Window.partitionBy(*series).orderBy(
        F.col("score").desc_nulls_last(), F.col("split_ts").asc(),
        F.col("n_left").asc(),
    )
    return (
        scored.withColumn("__cp_r", F.row_number().over(pick))
        .where(F.col("__cp_r") == 1)
        .drop("__cp_r", "__cp_g")
    )
