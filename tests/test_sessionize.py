import datetime as dt
import shutil
import tempfile

import pytest

from tempo_spark.streaming.sessionize import streaming_sessionize


def ts(s):
    return dt.datetime.fromisoformat(s)


class TestStreamingSessionize:
    def test_sessions_closed_by_gap(self, spark):
        d = tempfile.mkdtemp(prefix="tempo_sess_")
        try:
            rows = [
                # user A: two bursts separated by > 30 min
                ("A", ts("2020-01-01 00:00:00")),
                ("A", ts("2020-01-01 00:05:00")),
                ("A", ts("2020-01-01 00:10:00")),
                ("A", ts("2020-01-01 02:00:00")),   # new session
                ("A", ts("2020-01-01 02:01:00")),
                # user B: single burst
                ("B", ts("2020-01-01 01:00:00")),
                ("B", ts("2020-01-01 01:02:00")),
                # late "far future" event pushes the watermark forward so
                # earlier sessions time out and emit
                ("C", ts("2020-01-02 00:00:00")),
            ]
            spark.createDataFrame(rows, "k string, event_ts timestamp").write.mode(
                "overwrite"
            ).parquet(d)
            sdf = spark.readStream.schema("k string, event_ts timestamp").parquet(d)
            sessions = streaming_sessionize(
                sdf, "event_ts", ["k"], gap_seconds=1800, watermark="0 seconds"
            )
            q = (
                sessions.writeStream.format("memory")
                .queryName("sessions_out")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            out = {
                (r.k, str(r.session_start)): r
                for r in spark.table("sessions_out").collect()
            }
            # A's first burst was closed by the 02:00 event within the batch
            a1 = out[("A", "2020-01-01 00:00:00")]
            assert str(a1.session_end) == "2020-01-01 00:10:00"
            assert a1.n_events == 3
        finally:
            shutil.rmtree(d, ignore_errors=True)
