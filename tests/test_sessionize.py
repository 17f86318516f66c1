import datetime as dt
import shutil
import tempfile

import pytest

from tempo_spark.streaming.sessionize import streaming_sessionize


def ts(s):
    return dt.datetime.fromisoformat(s)


class TestStreamingSessionize:
    def test_non_utc_session_timezone(self, spark):
        """r8: the kernel now works in JVM-computed unix_micros — under a
        non-UTC session tz the old pd.to_datetime path compared naive wall
        clock against the UTC watermark, shifting every close boundary by
        the session offset (the round-4 asof/interpolate bug class)."""
        prev = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        d = tempfile.mkdtemp(prefix="tempo_sess_tz_")
        try:
            rows = [
                ("A", ts("2020-01-01 00:00:00")),
                ("A", ts("2020-01-01 00:10:00")),
                ("C", ts("2020-01-02 00:00:00")),  # watermark pusher
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
                .queryName("sessions_tz_out")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            out = {
                (r.k, str(r.session_start)): r
                for r in spark.table("sessions_tz_out").collect()
            }
            a = out[("A", "2020-01-01 00:00:00")]
            assert str(a.session_end) == "2020-01-01 00:10:00"
            assert a.n_events == 2
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)
            shutil.rmtree(d, ignore_errors=True)

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
            # A's first burst closes once the watermark (pushed to
            # 2020-01-02 by C's event) passes 00:10 + gap
            a1 = out[("A", "2020-01-01 00:00:00")]
            assert str(a1.session_end) == "2020-01-01 00:10:00"
            assert a1.n_events == 3
            a2 = out[("A", "2020-01-01 02:00:00")]
            assert str(a2.session_end) == "2020-01-01 02:01:00"
            assert a2.n_events == 2
            b = out[("B", "2020-01-01 01:00:00")]
            assert b.n_events == 2
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_out_of_order_events_extend_or_split(self, spark):
        """A late event within `gap` BEFORE the open session's start must
        extend the session backward; one more than `gap` before it must open
        its own session (ADVICE r1: the old code absorbed both into the
        current session without moving session_start)."""
        d = tempfile.mkdtemp(prefix="tempo_sess_ooo_")
        try:
            schema = "k string, event_ts timestamp"
            # file 1 (first micro-batch): the "current" session
            spark.createDataFrame(
                [
                    ("D", ts("2020-01-01 01:00:00")),
                    ("D", ts("2020-01-01 01:10:00")),
                ],
                schema,
            ).coalesce(1).write.mode("overwrite").parquet(d)
            import time

            time.sleep(1.1)  # file-source batches order by mod time
            # file 2 (second micro-batch): two late events — one within gap
            # of 01:00 (extends backward), one > gap before that (own
            # session) — plus a far-future row to advance the watermark.
            spark.createDataFrame(
                [
                    ("D", ts("2020-01-01 00:55:00")),
                    ("D", ts("2020-01-01 00:10:00")),
                    ("E", ts("2020-01-02 00:00:00")),
                ],
                schema,
            ).coalesce(1).write.mode("append").parquet(d)
            sdf = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(d)
            )
            sessions = streaming_sessionize(
                sdf, "event_ts", ["k"], gap_seconds=1800, watermark="4 hours"
            )
            q = (
                sessions.writeStream.format("memory")
                .queryName("sessions_ooo")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            got = {
                (r.k, str(r.session_start), str(r.session_end), r.n_events)
                for r in spark.table("sessions_ooo").collect()
            }
            assert ("D", "2020-01-01 00:55:00", "2020-01-01 01:10:00", 3) in got
            assert ("D", "2020-01-01 00:10:00", "2020-01-01 00:10:00", 1) in got
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestBatchSessionize:
    def _rows(self):
        base = dt.datetime(2024, 1, 1)
        secs = {"A": (0, 10, 20, 50, 120, 121), "B": (5, 200)}
        return [
            (k, base + dt.timedelta(seconds=s))
            for k, ss in secs.items()
            for s in ss
        ]

    def test_timestamp_path(self, spark):
        from tempo_spark import TSDF

        df = spark.createDataFrame(self._rows(), "k string, ts timestamp")
        out = TSDF(df, ts_col="ts", series_ids=["k"]).sessionize(30)
        got = {
            (r.k, r.session_start.second + r.session_start.minute * 60): (
                r.session_end.second + r.session_end.minute * 60,
                r.n_events,
            )
            for r in out.collect()
        }
        # event exactly gap (30 s) after the previous one joins the session
        assert got == {
            ("A", 0): (50, 4),
            ("A", 120): (121, 2),
            ("B", 5): (5, 1),
            ("B", 200): (200, 1),
        }

    def test_numeric_path_matches_timestamp_path(self, spark):
        import pyspark.sql.functions as F

        from tempo_spark import TSDF

        df = spark.createDataFrame(self._rows(), "k string, ts timestamp")
        t_out = TSDF(df, ts_col="ts", series_ids=["k"]).sessionize(30)
        n_df = df.withColumn("tsd", F.col("ts").cast("double")).drop("ts")
        n_out = TSDF(n_df, ts_col="tsd", series_ids=["k"]).sessionize(30)
        t_set = {
            (r.k, r.session_start.timestamp(), r.session_end.timestamp(), r.n_events)
            for r in t_out.collect()
        }
        n_set = {
            (r.k, r.session_start, r.session_end, r.n_events)
            for r in n_out.collect()
        }
        assert t_set == n_set

    def test_one_shuffle(self, spark):
        from tempo_spark import TSDF
        from tempo_spark.plans.inspect import count_exchanges

        df = spark.createDataFrame(self._rows(), "k string, ts timestamp")
        assert count_exchanges(TSDF(df, ts_col="ts", series_ids=["k"]).sessionize(30)) == 1
        ndf = df.withColumn("tsd", df.ts.cast("double")).drop("ts")
        assert count_exchanges(TSDF(ndf, ts_col="tsd", series_ids=["k"]).sessionize(30)) == 1

    def test_bad_gap_raises(self, spark):
        from tempo_spark import TSDF

        df = spark.createDataFrame(self._rows(), "k string, ts timestamp")
        with pytest.raises(ValueError):
            TSDF(df, ts_col="ts", series_ids=["k"]).sessionize(0)
