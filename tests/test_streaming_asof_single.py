"""Single-query streaming as-of (applyInPandasWithState)."""

import datetime as dt
import glob
import time

from tempo_spark.streaming.asof import streaming_asof


def ts(s):
    return dt.datetime.fromisoformat(s)


class TestStreamingAsofSingleQuery:
    def test_append_mode_end_to_end(self, spark, tmp_path):
        """One query, no foreachBatch: each left row emits once, with its
        latest in-lookback right row, when the watermark passes it."""
        ld = str(tmp_path / "left")
        rd = str(tmp_path / "right")
        ck = str(tmp_path / "ck")

        left_rows = [
            ("A", ts("2020-01-01 00:10:00"), 1.0),
            ("A", ts("2020-01-01 00:30:00"), 2.0),
            ("B", ts("2020-01-01 00:20:00"), 3.0),
        ]
        right_rows = [
            ("A", ts("2020-01-01 00:05:00"), 10.0),
            ("A", ts("2020-01-01 00:09:00"), 11.0),   # latest for left@00:10
            ("A", ts("2020-01-01 00:25:00"), 12.0),   # latest for left@00:30
            ("B", ts("2020-01-01 00:01:00"), 20.0),
        ]
        spark.createDataFrame(
            left_rows, "k string, ts timestamp, v double"
        ).write.mode("overwrite").parquet(ld)
        spark.createDataFrame(
            right_rows, "k string, ts timestamp, q double"
        ).write.mode("overwrite").parquet(rd)

        left = spark.readStream.schema("k string, ts timestamp, v double").parquet(ld)
        right = spark.readStream.schema("k string, ts timestamp, q double").parquet(rd)
        out = streaming_asof(
            left, right, ["k"],
            lookback_seconds=3600, watermark="0 seconds",
        )
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("asof_single_query")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            # batch 1 processes everything with watermark 0 -> nothing
            # final yet; then push the watermark on BOTH sources with
            # far-future rows so every real left event becomes eligible
            time.sleep(8)
            spark.createDataFrame(
                [("Z", ts("2020-01-02 00:00:00"), 0.0)],
                "k string, ts timestamp, v double",
            ).write.mode("append").parquet(ld)
            spark.createDataFrame(
                [("Z", ts("2020-01-02 00:00:00"), 0.0)],
                "k string, ts timestamp, q double",
            ).write.mode("append").parquet(rd)

            deadline = time.time() + 90
            got = {}
            while time.time() < deadline:
                rows = spark.table("asof_single_query").collect()
                got = {(r.k, str(r.ts)): (r.right_q, str(r.right_ts)) for r in rows}
                if len(got) >= 3:
                    break
                time.sleep(2)
            assert got[("A", "2020-01-01 00:10:00")] == (11.0, "2020-01-01 00:09:00")
            assert got[("A", "2020-01-01 00:30:00")] == (12.0, "2020-01-01 00:25:00")
            assert got[("B", "2020-01-01 00:20:00")] == (20.0, "2020-01-01 00:01:00")
        finally:
            q.stop()

    def test_idle_rights_only_state_evicted(self, spark, tmp_path):
        """A series that only ever received right rows must not leak a
        state-store entry forever (ADVICE r1): once the watermark passes
        newest_right + lookback, its timeout fires, the prune empties the
        buffer, and the key is removed."""
        ld = str(tmp_path / "l3")
        rd = str(tmp_path / "r3")
        ck = str(tmp_path / "ck3")
        spark.createDataFrame(
            [("L", ts("2020-01-01 00:00:00"), 1.0)],
            "k string, ts timestamp, v double",
        ).write.mode("overwrite").parquet(ld)
        # series X: rights only, never any left
        spark.createDataFrame(
            [("X", ts("2020-01-01 00:00:00"), 9.0)],
            "k string, ts timestamp, q double",
        ).write.mode("overwrite").parquet(rd)
        left = spark.readStream.schema("k string, ts timestamp, v double").parquet(ld)
        right = spark.readStream.schema("k string, ts timestamp, q double").parquet(rd)
        out = streaming_asof(left, right, ["k"], lookback_seconds=60, watermark="0 seconds")
        q = (
            out.writeStream.format("memory")
            .queryName("asof_state_evict")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            time.sleep(8)
            # push the watermark far past X's newest right + lookback
            for d, schema in ((ld, "k string, ts timestamp, v double"),
                              (rd, "k string, ts timestamp, q double")):
                spark.createDataFrame(
                    [("Z", ts("2020-01-02 00:00:00"), 0.0)], schema
                ).write.mode("append").parquet(d)
            deadline = time.time() + 90
            n_state = None
            while time.time() < deadline:
                p = q.lastProgress
                if p and p.get("stateOperators"):
                    n_state = p["stateOperators"][0]["numRowsTotal"]
                    # X evicted; only Z's rights-only entry may remain
                    if n_state is not None and n_state <= 1:
                        break
                time.sleep(2)
            assert n_state is not None and n_state <= 1, (
                f"rights-only state entry never evicted (numRowsTotal={n_state})"
            )
        finally:
            q.stop()

    def test_no_match_emits_nulls(self, spark, tmp_path):
        ld = str(tmp_path / "l2")
        rd = str(tmp_path / "r2")
        ck = str(tmp_path / "ck2")
        spark.createDataFrame(
            [("A", ts("2020-01-01 06:00:00"), 1.0)],
            "k string, ts timestamp, v double",
        ).write.mode("overwrite").parquet(ld)
        # only a right far OUTSIDE the lookback band
        spark.createDataFrame(
            [("A", ts("2020-01-01 00:00:00"), 9.0)],
            "k string, ts timestamp, q double",
        ).write.mode("overwrite").parquet(rd)
        left = spark.readStream.schema("k string, ts timestamp, v double").parquet(ld)
        right = spark.readStream.schema("k string, ts timestamp, q double").parquet(rd)
        out = streaming_asof(left, right, ["k"], lookback_seconds=3600, watermark="0 seconds")
        q = (
            out.writeStream.format("memory")
            .queryName("asof_single_query_nulls")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            time.sleep(8)
            for d, schema in ((ld, "k string, ts timestamp, v double"),
                              (rd, "k string, ts timestamp, q double")):
                spark.createDataFrame(
                    [("Z", ts("2020-01-02 00:00:00"), 0.0)], schema
                ).write.mode("append").parquet(d)
            deadline = time.time() + 90
            rows = []
            while time.time() < deadline:
                rows = spark.table("asof_single_query_nulls").collect()
                if rows:
                    break
                time.sleep(2)
            assert rows, "left row never emitted"
            r = [x for x in rows if x.k == "A"][0]
            assert r.right_ts is None and r.right_q is None
        finally:
            q.stop()
