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


class TestLateDataMetrics:
    def test_observed_arrivals_and_watermark_drops(self, spark, tmp_path):
        """r12 (VERDICT #9): late-data observability. Single-file
        micro-batches: batch 1 advances the watermark past a straggler
        delivered in batch 2. MEASURED Spark 4.1 semantics (pinned
        here): the window aggregation ADMITS the late row — the stale
        window materializes as a fresh append row (the watermark drives
        state eviction/emission, not input dropping), and
        numRowsDroppedByWatermark stays 0. A sink keyed on window-start
        would silently take a late partial bar — late_row_stats'
        late_batches/max_lateness_sec is the signal that says it
        happened and how much watermark delay would have covered it."""
        import os
        import time as _t

        from tempo_spark.streaming.metrics import late_row_stats
        from tempo_spark.streaming.resample import streaming_resample

        schema = "k string, event_ts timestamp, v double"
        d = tmp_path / "late_src"
        d.mkdir()
        f1 = str(d / "b1.parquet")
        f2 = str(d / "b2.parquet")
        f3 = str(d / "b3.parquet")
        spark.createDataFrame(
            [("A", ts("2020-01-01 01:00:00"), 1.0),
             ("A", ts("2020-01-01 01:00:30"), 3.0)],
            schema,
        ).coalesce(1).write.parquet(f1)
        # one straggler far behind (01:00:00 − 5 min watermark = 00:55)
        # and one fresh row that must survive
        spark.createDataFrame(
            [("A", ts("2020-01-01 00:30:00"), 99.0),
             ("A", ts("2020-01-01 01:01:10"), 7.0)],
            schema,
        ).coalesce(1).write.parquet(f2)
        # a late sentinel batch so the final watermark (01:15) closes the
        # 01:00/01:01 windows in append mode
        spark.createDataFrame(
            [("A", ts("2020-01-01 01:20:00"), 5.0)], schema,
        ).coalesce(1).write.parquet(f3)
        # file source orders batches by modification time
        now = _t.time()
        for root, base in ((f1, now - 120), (f2, now - 60), (f3, now)):
            for fn in os.listdir(root):
                os.utime(os.path.join(root, fn), (base, base))

        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(d) + "/*")
        )
        out = streaming_resample(
            sdf, "event_ts", ["k"], "1 minute", "sum",
            watermark="5 minutes", observe="late_test",
        )
        q = (
            out.writeStream.format("memory")
            .queryName("late_metrics_stream")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            stats = late_row_stats(q, "late_test")
        finally:
            q.stop()
        assert stats["input_rows"] == 5  # every arrival counted
        assert stats["late_batches"] == 1  # the straggler's batch
        # straggler 00:30:00 vs watermark 00:55:30 -> 1530 s late
        assert stats["max_lateness_sec"] == pytest.approx(1530.0)
        assert stats["batches"] >= 2
        assert stats["watermark"] is not None
        rows = {
            str(r.event_ts): r.v
            for r in spark.table("late_metrics_stream").collect()
        }
        assert rows.get("2020-01-01 01:00:00") == pytest.approx(4.0)
        assert rows.get("2020-01-01 01:01:00") == pytest.approx(7.0)
        # the measured hazard: the straggler's behind-the-watermark
        # window DOES materialize (admitted, then immediately emitted) —
        # exactly what late_batches flags
        assert rows.get("2020-01-01 00:30:00") == pytest.approx(99.0)

    def test_sessionize_and_asof_accept_observe(self, spark, tmp_path):
        """observe= plumbs through the stateful kernels without changing
        their plans' output schema."""
        from tempo_spark.streaming.asof import streaming_asof
        from tempo_spark.streaming.sessionize import streaming_sessionize

        schema = "k string, ts timestamp, v double"
        d = tmp_path / "obs_src"
        spark.createDataFrame(
            [("A", ts("2020-01-01 00:00:10"), 1.0),
             ("A", ts("2020-01-01 02:00:00"), 2.0)],
            schema,
        ).write.parquet(str(d))
        sdf = spark.readStream.schema(schema).parquet(str(d))
        sess = streaming_sessionize(
            sdf, "ts", ["k"], gap_seconds=60, observe="sess_obs"
        )
        q = (
            sess.writeStream.format("memory").queryName("sess_obs_q")
            .outputMode("append").trigger(availableNow=True).start()
        )
        try:
            q.awaitTermination(120)
            from tempo_spark.streaming.metrics import late_row_stats

            st = late_row_stats(q, "sess_obs")
        finally:
            q.stop()
        assert st["input_rows"] == 2 and st["late_batches"] == 0
        aso = streaming_asof(
            sdf, spark.readStream.schema(schema).parquet(str(d))
            .withColumnRenamed("v", "q"),
            ["k"], observe="asof_obs",
        )
        assert aso.isStreaming  # plan builds with the observation attached
