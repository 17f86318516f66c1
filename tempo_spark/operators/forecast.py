"""Baseline forecasts per series (the Hyndman-Athanasopoulos naive
family — the benchmarks every real forecasting model must beat):

- ``last`` (naive): ŷ(T+h) = y_T;
- ``drift``: ŷ(T+h) = y_T + h·(y_T − y_1)/(n−1) — the line through the
  first and last observations extended h steps;
- ``seasonal`` (seasonal naive): ŷ(T+h) = the value one full cycle back,
  y at position n − m + ((h−1) mod m) + 1 of the last m observations.

Spark shape: ONE aggregation per series (min_by/max_by for the
endpoints, a sorted-slice for the seasonal tail) then an
``explode(sequence(1, horizon))`` fan-out — zero Python, zero extra
shuffles, horizon rows per series. Emitted timestamps step by ``freq``
from the last observation.

Determinism contract: values quantize to the 1e-6 grid; drift is one
fixed IEEE expression over grid endpoints; seasonal indexes are integer
arithmetic — every forecast replays exactly on an external engine. NULL
values are EXCLUDED (forecasts anchor on observed data); a series whose
usable rows can't support the method (n < 2 for drift, n < period for
seasonal) yields NULL ``yhat`` rows (the spine is still emitted, so
downstream joins stay aligned)."""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tempo_spark.functions.freq import parse_freq
from tempo_spark.functions.grid import grid6


def forecast_naive(
    tsdf,
    value_col: str,
    horizon: int,
    freq: str,
    method: str = "last",
    period: Optional[int] = None,
) -> DataFrame:
    """(series…, h, ts, yhat) — ``horizon`` future rows per series; see
    module docstring. ``freq`` uses the resample frequency grammar."""
    if method not in ("last", "drift", "seasonal"):
        raise ValueError(
            f"method must be 'last', 'drift' or 'seasonal', got {method!r}"
        )
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    if method == "seasonal":
        if period is None or period < 1:
            raise ValueError("seasonal method needs period >= 1")
    elif period is not None:
        raise ValueError(f"period only applies to method='seasonal'")
    if value_col not in tsdf.df.columns:
        raise ValueError(f"value_col {value_col!r} not in DataFrame")
    clash = sorted(
        c for c in tsdf.df.columns
        if c in ("h", "yhat") or c.startswith("__fc_")
    )
    if clash:
        raise ValueError(f"reserved output/staging columns present: {clash}")
    f = parse_freq(freq)
    # exact integer micros per step (f.seconds is a float — 1µs would
    # round-trip fine but integers keep the emitted grid exact)
    unit_micros = {
        "microsecond": 1,
        "millisecond": 1_000,
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
    }
    step_micros = f.period * unit_micros[f.unit]

    df = tsdf.df
    keys = list(tsdf.series_ids)
    if not keys:
        df = df.withColumn("__fc_g", F.lit(0))
        keys = ["__fc_g"]
    yq = grid6(value_col)
    micros = tsdf._exact_micros_order()
    base = df.select(
        *keys, micros.alias("__fc_us"), yq.alias("__fc_y")
    ).where(F.col("__fc_y").isNotNull())

    ord_struct = F.struct(F.col("__fc_us").alias("us"), F.col("__fc_y").alias("y"))
    aggs = [
        F.count(F.lit(1)).alias("__fc_n"),
        F.max(ord_struct).alias("__fc_last"),
        F.min(ord_struct).alias("__fc_first"),
    ]
    if method == "seasonal":
        # last `period` values only — a whole-series collect_list would
        # put O(series length) in one agg buffer (r11 review); a
        # descending row_number bounds the collected set to `period`
        # rows, and the window shares the aggregation's clustering
        from pyspark.sql import Window

        wdesc = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(
            F.col("__fc_us").desc()
        )
        base = base.withColumn("__fc_rd", F.row_number().over(wdesc))
        aggs.append(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("__fc_rd") <= int(period), ord_struct)
                )
            ).alias("__fc_tail")
        )
    per = base.groupBy(*keys).agg(*aggs)

    h = F.col("h")
    last_us = F.col("__fc_last.us")
    last_y = F.col("__fc_last.y")
    if method == "last":
        yhat = last_y
    elif method == "drift":
        n = F.col("__fc_n")
        slope = F.when(
            n >= 2,
            (last_y - F.col("__fc_first.y")) / (n - 1).cast("double"),
        )
        yhat = last_y + h.cast("double") * slope
    else:
        tail = F.col("__fc_tail")
        m = int(period)
        # only a FULL cycle forecasts; shorter history -> NULL
        yhat = F.when(
            F.size(tail) >= m,
            F.element_at(
                tail, (F.pmod(h - 1, F.lit(m)) + 1).cast("int")
            ).getField("y"),
        )
    out = (
        per.select(
            *keys, "__fc_n", "__fc_last", "__fc_first",
            *(["__fc_tail"] if method == "seasonal" else []),
            F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("h"),
        )
        .select(
            *[c for c in keys if c != "__fc_g"],
            "h",
            F.timestamp_micros(
                last_us + h.cast("long") * F.lit(int(step_micros))
            ).alias(tsdf.ts_col),
            yhat.alias("yhat"),
        )
    )
    return out
