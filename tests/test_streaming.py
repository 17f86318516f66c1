import datetime as dt
import shutil
import tempfile

import pytest

from tempo_spark.streaming.resample import streaming_grouped_stats, streaming_resample


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="tempo_stream_")
    rows = [
        ("A", ts("2020-01-01 00:00:10"), 1.0),
        ("A", ts("2020-01-01 00:00:40"), 3.0),
        ("A", ts("2020-01-01 00:01:10"), 5.0),
        ("B", ts("2020-01-01 00:00:20"), 10.0),
    ]
    spark.createDataFrame(rows, "k string, event_ts timestamp, v double").write.mode(
        "overwrite"
    ).parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def run_stream_to_memory(spark, streaming_df, name):
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")  # append would wait for the watermark to pass
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


class TestStreamingResample:
    def test_resample_stream(self, spark, stream_dir):
        schema = "k string, event_ts timestamp, v double"
        sdf = spark.readStream.schema(schema).parquet(stream_dir)
        out = streaming_resample(sdf, "event_ts", ["k"], "1 minute", "mean")
        assert out.isStreaming
        table = run_stream_to_memory(spark, out, "resampled_stream")
        rows = {(r.k, str(r.event_ts)): r.v for r in table.collect()}
        assert rows[("A", "2020-01-01 00:00:00")] == pytest.approx(2.0)
        assert rows[("A", "2020-01-01 00:01:00")] == pytest.approx(5.0)
        assert rows[("B", "2020-01-01 00:00:00")] == pytest.approx(10.0)

    def test_grouped_stats_stream(self, spark, stream_dir):
        schema = "k string, event_ts timestamp, v double"
        sdf = spark.readStream.schema(schema).parquet(stream_dir)
        out = streaming_grouped_stats(sdf, "event_ts", ["k"], "1 minute", ["v"])
        table = run_stream_to_memory(spark, out, "grouped_stream")
        rows = {(r.k, str(r.event_ts)): r for r in table.collect()}
        r = rows[("A", "2020-01-01 00:00:00")]
        assert r.count_v == 2 and r.max_v == 3.0


class TestStreamingTSDFWrapper:
    """StreamingTSDF is pure metadata over the free functions — same plans,
    TSDF-shaped API. One end-to-end memory-sink run (resample) plus
    plan-level contract checks for the rest (schema identical to the free
    function, still streaming) keep this suite fast."""

    def _st(self, spark, stream_dir):
        from tempo_spark.streaming import StreamingTSDF

        schema = "k string, event_ts timestamp, v double"
        sdf = spark.readStream.schema(schema).parquet(stream_dir)
        return StreamingTSDF(sdf, ts_col="event_ts", series_ids=["k"])

    def test_resample_end_to_end(self, spark, stream_dir):
        out = self._st(spark, stream_dir).resample("1 minute", "mean")
        assert out.df.isStreaming and out.ts_col == "event_ts" and out.series_ids == ["k"]
        table = run_stream_to_memory(spark, out.df, "wrapper_resample")
        rows = {(r.k, str(r.event_ts)): r.v for r in table.collect()}
        assert rows[("A", "2020-01-01 00:00:00")] == pytest.approx(2.0)
        assert rows[("B", "2020-01-01 00:00:00")] == pytest.approx(10.0)

    def test_plans_match_free_functions(self, spark, stream_dir):
        from tempo_spark.streaming import (
            streaming_bars,
            streaming_grouped_stats,
            streaming_interpolate,
            streaming_resample,
            streaming_sessionize,
        )

        st = self._st(spark, stream_dir)
        sdf = st.df
        cases = [
            (st.resample("1 minute", "max").df,
             streaming_resample(sdf, "event_ts", ["k"], "1 minute", "max")),
            (st.grouped_stats("1 minute", ["v"]).df,
             streaming_grouped_stats(sdf, "event_ts", ["k"], "1 minute", ["v"])),
            (st.calc_bars("1 minute", ["v"]).df,
             streaming_bars(sdf, "event_ts", ["k"], "1 minute", ["v"])),
            (st.interpolate("1 minute", "v").df,
             streaming_interpolate(sdf, "event_ts", ["k"], "1 minute", "v")),
            (st.sessionize(60),
             streaming_sessionize(sdf, "event_ts", ["k"], 60)),
        ]
        for got, want in cases:
            assert got.isStreaming
            assert got.schema == want.schema

    def test_interpolate_retargets_ts_col(self, spark, stream_dir):
        out = self._st(spark, stream_dir).interpolate("1 minute", "v")
        assert out.ts_col == "bucket_ts" and "bucket_ts" in out.df.columns

    def test_asof_join_wrapper(self, spark, stream_dir):
        st = self._st(spark, stream_dir)
        joined = st.asofJoin(st, right_prefix="r")
        assert joined.df.isStreaming
        assert "r_v" in joined.df.columns and joined.ts_col == "event_ts"
        from tempo_spark.streaming import StreamingTSDF

        other = StreamingTSDF(st.df, ts_col="event_ts", series_ids=[])
        with pytest.raises(ValueError):
            st.asofJoin(other)

    def test_watermark_metadata(self, spark, stream_dir):
        st = self._st(spark, stream_dir).withWatermark("42 seconds")
        assert st.watermark == "42 seconds"
        # forwarded into the operator's withWatermark call
        plan = st.resample("1 minute").df._jdf.queryExecution().analyzed().toString()
        assert "42 seconds" in plan

    def test_rejects_batch_frame(self, spark):
        from tempo_spark.streaming import StreamingTSDF

        batch = spark.range(3).withColumnRenamed("id", "v")
        with pytest.raises(ValueError):
            StreamingTSDF(batch, ts_col="v")
