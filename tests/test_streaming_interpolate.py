"""Streaming interpolation (applyInPandasWithState gap-filled grid)."""

import datetime as dt
import shutil
import tempfile

import pytest

from tempo_spark.streaming.interpolate import streaming_interpolate


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def gap_dir(spark):
    d = tempfile.mkdtemp(prefix="tempo_interp_stream_")
    rows = [
        # series A: observed buckets 00:00 (mean 2.0) and 00:03 (6.0) with
        # two empty grid buckets between; 00:04 observed so 00:03 finalizes
        ("A", ts("2020-01-01 00:00:10"), 1.0),
        ("A", ts("2020-01-01 00:00:40"), 3.0),
        ("A", ts("2020-01-01 00:03:30"), 6.0),
        ("A", ts("2020-01-01 00:04:30"), 8.0),
        # series B: single observation — nothing to interpolate
        ("B", ts("2020-01-01 00:00:20"), 10.0),
        ("B", ts("2020-01-01 00:04:50"), 0.0),
    ]
    spark.createDataFrame(rows, "k string, event_ts timestamp, v double").write.mode(
        "overwrite"
    ).parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, out, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


class TestStreamingInterpolate:
    def test_linear_gap_fill(self, spark, gap_dir):
        sdf = spark.readStream.schema("k string, event_ts timestamp, v double").parquet(gap_dir)
        out = streaming_interpolate(
            sdf, "event_ts", ["k"], freq="1 minute", metric_col="v",
            method="linear", watermark="0 seconds",
        )
        assert out.isStreaming
        table = _run(spark, out, "interp_stream_linear")
        rows = {(r.k, str(r.bucket_ts)): (r.v, r.is_interpolated) for r in table.collect()}
        # final watermark = max event time (00:04:50) → buckets ending
        # <= 00:04:50 finalize: A 00:00-00:03, B 00:00; A 00:04 / B 00:04
        # buckets end at 00:05 > wm, so they stay pending
        assert rows[("A", "2020-01-01 00:00:00")] == (pytest.approx(2.0), False)
        assert rows[("A", "2020-01-01 00:03:00")] == (pytest.approx(6.0), False)
        # linear interior gaps: 2.0 → 6.0 across 3 steps
        assert rows[("A", "2020-01-01 00:01:00")] == (pytest.approx(10.0 / 3), True)
        assert rows[("A", "2020-01-01 00:02:00")] == (pytest.approx(14.0 / 3), True)
        assert rows[("B", "2020-01-01 00:00:00")] == (pytest.approx(10.0), False)
        # no trailing synthesis past the last finalized bucket
        assert ("A", "2020-01-01 00:04:00") not in rows
        assert len([k for k in rows if k[0] == "B"]) == 1

    @pytest.mark.parametrize(
        "method,expected",
        [("zero", 0.0), ("null", None), ("ffill", 2.0)],
    )
    def test_fill_methods(self, spark, gap_dir, method, expected):
        sdf = spark.readStream.schema("k string, event_ts timestamp, v double").parquet(gap_dir)
        out = streaming_interpolate(
            sdf, "event_ts", ["k"], freq="1 minute", metric_col="v",
            method=method, watermark="0 seconds",
        )
        table = _run(spark, out, f"interp_stream_{method}")
        rows = {(r.k, str(r.bucket_ts)): r.v for r in table.collect()}
        got = rows[("A", "2020-01-01 00:01:00")]
        if expected is None:
            assert got is None
        else:
            assert got == pytest.approx(expected)

    def test_non_utc_session_timezone(self, spark, gap_dir):
        """Event time crosses Arrow as session-tz-naive wall clock while
        GroupState watermarks are UTC epoch; the kernel must work in
        unix_micros or every bucket boundary shifts by the session offset
        (review finding, round 4)."""
        prev = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            sdf = spark.readStream.schema(
                "k string, event_ts timestamp, v double"
            ).parquet(gap_dir)
            out = streaming_interpolate(
                sdf, "event_ts", ["k"], freq="1 minute", metric_col="v",
                method="linear", watermark="0 seconds",
            )
            table = _run(spark, out, "interp_stream_tz")
            rows = {
                (r.k, str(r.bucket_ts)): (r.v, r.is_interpolated)
                for r in table.collect()
            }
            assert rows[("A", "2020-01-01 00:00:00")] == (pytest.approx(2.0), False)
            assert rows[("A", "2020-01-01 00:01:00")] == (pytest.approx(10.0 / 3), True)
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)

    def test_sum_agg(self, spark, gap_dir):
        sdf = spark.readStream.schema("k string, event_ts timestamp, v double").parquet(gap_dir)
        out = streaming_interpolate(
            sdf, "event_ts", ["k"], freq="1 minute", metric_col="v",
            agg="sum", method="ffill", watermark="0 seconds",
        )
        table = _run(spark, out, "interp_stream_sum")
        rows = {(r.k, str(r.bucket_ts)): r.v for r in table.collect()}
        assert rows[("A", "2020-01-01 00:00:00")] == pytest.approx(4.0)  # 1+3
        assert rows[("A", "2020-01-01 00:01:00")] == pytest.approx(4.0)  # ffill

    def test_bad_method_raises(self, spark, gap_dir):
        sdf = spark.readStream.schema("k string, event_ts timestamp, v double").parquet(gap_dir)
        with pytest.raises(ValueError, match="method"):
            streaming_interpolate(sdf, "event_ts", ["k"], method="cubic")
