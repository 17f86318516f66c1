"""Extract state intervals — sessionize consecutive rows whose metrics
satisfy a comparison against the previous row into [start_ts, end_ts]
intervals (reference: python/tempo/tsdf.py:1497-1616).

Plan shape: one shuffle on series_ids → lag columns → running sum session
id → groupBy aggregation (map-side combine). Fully JVM-native.
"""

from __future__ import annotations

import operator
from typing import Callable, Union

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_OPERATORS: dict[str, Callable[[Column, Column], Column]] = {
    "=": operator.eq,
    "!=": operator.ne,
    "<": operator.lt,
    "<=": operator.le,
    ">": operator.gt,
    ">=": operator.ge,
    "<=>": lambda a, b: a.eqNullSafe(b),
}


def extract_state_intervals(
    tsdf,
    metric_cols: list[str],
    state_definition: Union[str, Callable[[Column, Column], Column]] = "=",
) -> DataFrame:
    if not metric_cols:
        raise ValueError("extractStateIntervals requires at least one metric column")
    if callable(state_definition):
        compare = state_definition
    elif state_definition in _OPERATORS:
        compare = _OPERATORS[state_definition]
    else:
        raise ValueError(
            f"state_definition must be one of {sorted(_OPERATORS)} or a callable, "
            f"got {state_definition!r}"
        )

    ts, series = tsdf.ts_col, tsdf.series_ids
    w = tsdf.base_window()

    df = tsdf.df.withColumn("__prev_ts", F.lag(F.col(ts)).over(w))
    compares = []
    for c in metric_cols:
        prev = F.lag(F.col(c)).over(w)
        compares.append(compare(F.col(c), prev))
    # State change when ANY metric comparison is False. A NULL metric mid-
    # series yields a null compare, which (like the reference's identical
    # array_contains construction) does NOT increment the state id — nulls
    # neither attest nor break a state; use <=> to treat them as values.
    # The first row per
    # series (null __prev_ts, null compares) is dropped before numbering —
    # it can never attest that a state held (reference tsdf.py:1590-1592).
    # Materialize the compare result BEFORE dropping the first row — the
    # lag() must see the unfiltered frame or every series shifts by one.
    state_change = F.array_contains(F.array(*compares), False)
    df = df.withColumn("__state_change", state_change).where(
        F.col("__prev_ts").isNotNull()
    )
    order_cols = [F.col(ts)] + (
        [F.col(tsdf.sequence_col)] if tsdf.sequence_col else []
    )
    df = df.withColumn(
        "__state_id",
        F.sum(F.col("__state_change").cast("int")).over(
            Window.partitionBy(*series)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # Drop the state-change rows themselves: they belong to the NEW state's
    # numbering but their __prev_ts points into the OLD state, so keeping
    # them would pull start_ts back before the state actually held
    # (reference tsdf.py:1600-1604).
    out = (
        df.where(~F.col("__state_change"))
        .groupBy(*series, "__state_id")
        .agg(
            F.min("__prev_ts").alias("start_ts"),
            F.max(F.col(ts)).alias("end_ts"),
        )
        .drop("__state_id")
        .select("start_ts", "end_ts", *series)
    )
    return out
