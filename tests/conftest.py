from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("tempo_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="session")
def trades(spark):
    """F1 fixture shape: symbol, event_ts, trade_pr."""
    rows = [
        ("S1", ts("2020-08-01 00:00:10"), 349.21),
        ("S1", ts("2020-08-01 00:01:12"), 351.32),
        ("S1", ts("2020-09-01 00:02:10"), 361.10),
        ("S1", ts("2020-09-01 00:19:12"), 362.10),
        ("S2", ts("2020-08-01 00:01:10"), 743.01),
        ("S2", ts("2020-08-01 00:01:24"), 751.92),
        ("S2", ts("2020-09-01 00:02:10"), 761.10),
        ("S2", ts("2020-09-01 00:20:42"), 762.33),
    ]
    return spark.createDataFrame(rows, "symbol string, event_ts timestamp, trade_pr double")


@pytest.fixture(scope="session")
def quotes(spark):
    """F2 fixture shape: symbol, event_ts, bid_pr, ask_pr (with nulls)."""
    rows = [
        ("S1", ts("2020-08-01 00:00:01"), 345.11, 351.12),
        ("S1", ts("2020-08-01 00:01:05"), 348.10, 353.13),
        ("S1", ts("2020-09-01 00:02:01"), 358.93, 365.12),
        ("S1", ts("2020-09-01 00:15:00"), None, 365.31),
        ("S2", ts("2020-08-01 00:01:01"), 740.10, 745.02),
        ("S2", ts("2020-09-01 00:01:32"), 757.76, 763.21),
        ("S2", ts("2020-09-01 00:20:02"), 758.00, None),
    ]
    return spark.createDataFrame(
        rows, "symbol string, event_ts timestamp, bid_pr double, ask_pr double"
    )
