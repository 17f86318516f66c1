"""LTTB display downsampling (Largest-Triangle-Three-Buckets).

Steinarsson 2013 ("Downsampling Time Series for Visual Representation",
the Grafana/Plotly standard): reduce each series to ``n_out`` visually
representative points — keep the first and last observation, split the
interior into ``n_out − 2`` equal-count buckets, and from each bucket
keep the point forming the largest triangle with its neighbor buckets.

This is the **parallel** LTTB variant: both triangle anchors are the
neighboring buckets' AVERAGE points (the sequential original anchors the
left side on the previously *selected* point, a chain that cannot be
expressed without a per-series sequential scan; the average-anchor
variant is the standard parallelization and visually indistinguishable —
the anchor only weights which in-bucket extremum wins).

Spark shape: ONE shuffle on the series ids — every step (row-number,
per-series count/min, bucket aggregation, neighbor lag/lead, in-bucket
arg-max) is a window or aggregation clustered by the series key, and the
bucket-stats join is co-partitioned on the same key. No Python, no
collect; output rows are the ORIGINAL rows (selection never rewrites).

Determinism contract: bucket sums use exact decimal arithmetic (x = µs
offset from the series' first observation, integral; y hardened-rounded
to the 1e-6 grid), so the sums are order-independent; the area is then a
FIXED IEEE expression over those exact sums, making the per-bucket
arg-max replayable bit-for-bit by an external engine. Ties break by
earliest timestamp; NULL metric rows never win a bucket.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from tempo_spark.functions.timestamps import ts_to_double


def _exact_micros(tsdf) -> F.Column:
    dt = tsdf.df.schema[tsdf.ts_col].dataType.typeName()
    if dt in ("timestamp", "timestamp_ntz", "date"):
        return F.unix_micros(F.col(tsdf.ts_col).cast("timestamp"))
    return (
        ts_to_double(F.col(tsdf.ts_col), tsdf.df.schema[tsdf.ts_col].dataType)
        * F.lit(1_000_000.0)
    ).cast("long")


def downsample_lttb(tsdf, n_out: int, value_col: str) -> DataFrame:
    """Per-series LTTB reduction to at most ``n_out`` rows (original rows,
    all columns preserved). Series with ``<= n_out`` rows pass through
    untouched; ``n_out == 2`` keeps only the endpoints."""
    if n_out < 2:
        raise ValueError(f"n_out must be >= 2, got {n_out}")
    if value_col not in tsdf.df.columns:
        raise ValueError(f"value_col {value_col!r} not in DataFrame")
    reserved = {
        "__lt_pos", "__lt_n", "__lt_x", "__lt_y", "__lt_b", "__lt_area",
        "__lt_rn", "__lt_x0", "__lt_y0",
    } & set(tsdf.df.columns)
    if reserved:
        raise ValueError(f"reserved staging columns present: {sorted(reserved)}")

    df = tsdf.df
    keys = list(tsdf.series_ids)
    if not keys:
        # single global series: stage a constant key so the windows and
        # the bucket-stats joins have a partition/join column
        df = df.withColumn("__lt_g", F.lit(0))
        keys = ["__lt_g"]
    series = [F.col(c) for c in keys]
    order = [_exact_micros(tsdf)]
    if getattr(tsdf, "sequence_col", None):
        order.append(F.col(tsdf.sequence_col))
    w = Window.partitionBy(*series).orderBy(*order)
    wall = Window.partitionBy(*series)

    # y on the 1e-6 grid (hardened rounding — the cross-engine idiom) so
    # bucket sums can be EXACT decimals; x = µs offset from the series'
    # first observation (small integral values, decimal headroom)
    yq = F.floor(F.col(value_col).cast("double") * 1e6 + F.lit(0.5)) / F.lit(1e6)
    base = (
        df.withColumn("__lt_pos", F.row_number().over(w))
        .withColumn("__lt_n", F.count(F.lit(1)).over(wall))
        .withColumn(
            "__lt_x", _exact_micros(tsdf) - F.min(_exact_micros(tsdf)).over(wall)
        )
        .withColumn("__lt_y", yq)
    )

    passthrough = base.where(F.col("__lt_n") <= F.lit(n_out))
    big = base.where(F.col("__lt_n") > F.lit(n_out))
    endpoints = big.where(
        (F.col("__lt_pos") == 1) | (F.col("__lt_pos") == F.col("__lt_n"))
    )
    if n_out == 2:
        selected = passthrough.unionByName(endpoints)
        return selected.drop(
            "__lt_pos", "__lt_n", "__lt_x", "__lt_y", "__lt_g"
        )

    # interior rows: bucket j = (pos-2)(n_out-2) div (N-2) in [0, n_out-3]
    # (INTEGER division — a double divide + floor can misfloor at exact
    # integer quotients)
    interior = big.where(
        (F.col("__lt_pos") > 1) & (F.col("__lt_pos") < F.col("__lt_n"))
    ).withColumn(
        "__lt_b",
        F.expr(
            f"cast((cast(__lt_pos as bigint) - 2) * {n_out - 2} "
            f"div (cast(__lt_n as bigint) - 2) as int)"
        ),
    )
    # exact per-bucket sums: decimal(38,0) µs offsets, decimal(38,6) y
    stats = interior.groupBy(*keys, "__lt_b").agg(
        F.count(F.lit(1)).alias("__lt_na"),
        F.sum(F.col("__lt_x").cast("decimal(38,0)")).alias("__lt_sx"),
        F.sum(F.col("__lt_y").cast("decimal(32,6)")).alias("__lt_sy"),
    )
    wb = Window.partitionBy(*series).orderBy("__lt_b")
    # neighbor anchors as doubles with a FIXED op order: avg = dec→double / n
    ax = F.col("__lt_sx").cast("double") / F.col("__lt_na")
    ay = F.col("__lt_sy").cast("double") / F.col("__lt_na")
    stats = (
        stats.withColumn("__lt_pax", F.lag(ax).over(wb))
        .withColumn("__lt_pay", F.lag(ay).over(wb))
        .withColumn("__lt_nax", F.lead(ax).over(wb))
        .withColumn("__lt_nay", F.lead(ay).over(wb))
        .select(*keys, "__lt_b", "__lt_pax", "__lt_pay",
                "__lt_nax", "__lt_nay")
    )
    # endpoint anchors for the first/last interior bucket
    firsts = big.where(F.col("__lt_pos") == 1).select(
        *keys,
        F.col("__lt_x").cast("double").alias("__lt_fx"),
        F.col("__lt_y").alias("__lt_fy"),
    )
    lasts = big.where(F.col("__lt_pos") == F.col("__lt_n")).select(
        *keys,
        F.col("__lt_x").cast("double").alias("__lt_lx"),
        F.col("__lt_y").alias("__lt_ly"),
    )
    stats = stats.join(firsts, keys).join(lasts, keys)
    stats = stats.select(
        *keys,
        "__lt_b",
        F.coalesce("__lt_pax", "__lt_fx").alias("__lt_pax"),
        F.coalesce("__lt_pay", "__lt_fy").alias("__lt_pay"),
        F.coalesce("__lt_nax", "__lt_lx").alias("__lt_nax"),
        F.coalesce("__lt_nay", "__lt_ly").alias("__lt_nay"),
    )
    scored = interior.join(stats, [*keys, "__lt_b"])
    # triangle area ×2 (fixed IEEE order; the |…| is rank-invariant):
    # |(pax − nax)(y − pay) − (pax − x)(nay − pay)|
    area = F.abs(
        (F.col("__lt_pax") - F.col("__lt_nax"))
        * (F.col("__lt_y") - F.col("__lt_pay"))
        - (F.col("__lt_pax") - F.col("__lt_x").cast("double"))
        * (F.col("__lt_nay") - F.col("__lt_pay"))
    )
    wsel = Window.partitionBy(*series, F.col("__lt_b")).orderBy(
        area.desc_nulls_last(), *order
    )
    chosen = (
        scored.withColumn("__lt_rn", F.row_number().over(wsel))
        .where(F.col("__lt_rn") == 1)
        .drop("__lt_rn", "__lt_b", "__lt_pax", "__lt_pay", "__lt_nax",
              "__lt_nay")
    )
    out = passthrough.unionByName(endpoints).unionByName(chosen)
    return out.drop("__lt_pos", "__lt_n", "__lt_x", "__lt_y", "__lt_g")
