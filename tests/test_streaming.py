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
