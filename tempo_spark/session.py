"""Session configuration for large-scale time-series workloads.

``recommended_confs`` documents — and ``configure`` applies — the Spark
settings this engine is designed around. None are required for
correctness; they are the 100 TB-cluster defaults a deployment should
start from.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: conf -> (value, why)
RECOMMENDED_CONFS: dict[str, tuple[str, str]] = {
    "spark.sql.adaptive.enabled": (
        "true",
        "AQE re-plans joins/shuffles from runtime stats; required for the "
        "skew-join and dynamic-coalesce behaviors the operators rely on",
    ),
    "spark.sql.adaptive.coalescePartitions.enabled": (
        "true",
        "collapses the many near-empty post-shuffle partitions produced by "
        "per-series windows on skewed series populations",
    ),
    "spark.sql.adaptive.skewJoin.enabled": (
        "true",
        "splits skewed join partitions (as-of range-join path, interval "
        "segment joins) at runtime",
    ),
    "spark.sql.session.timeZone": (
        "UTC",
        "time-bucketing (window/date_trunc) must be timezone-stable across "
        "the cluster",
    ),
    "spark.sql.shuffle.partitions": (
        "auto",
        "with AQE, start high (2-3× total cores); AQE coalesces down. On a "
        "1000-executor cluster: 2000-4000",
    ),
    "spark.sql.files.maxPartitionBytes": (
        "268435456",
        "256 MiB scan splits: window-heavy plans are CPU-bound per row, so "
        "fewer, larger splits reduce scheduling overhead at 100 TB",
    ),
    "spark.sql.parquet.aggregatePushdown": (
        "true",
        "min/max/count-only resamples can be answered from parquet footers",
    ),
    "spark.sql.execution.arrow.maxRecordsPerBatch": (
        "10000",
        "bounds Arrow batch memory for the two pandas kernels (FFT, "
        "multimodal decode) on wide rows",
    ),
}


def configure(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply the runtime-settable recommended confs to an existing session."""
    for key, (value, _why) in RECOMMENDED_CONFS.items():
        if value == "auto":
            continue
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # static conf on this deployment — must be set at launch
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark
