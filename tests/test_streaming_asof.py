import datetime as dt
import shutil
import tempfile

import pytest

from tempo_spark.streaming.asof import (
    reduce_asof_candidates,
    streaming_asof_candidates,
)


def ts(s):
    return dt.datetime.fromisoformat(s)


class TestStreamingAsof:
    @pytest.fixture(scope="class")
    def dirs(self, spark):
        ld, rd = tempfile.mkdtemp(prefix="asof_l_"), tempfile.mkdtemp(prefix="asof_r_")
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
        spark.createDataFrame(left_rows, "k string, ts timestamp, v double").write.mode(
            "overwrite").parquet(ld)
        spark.createDataFrame(right_rows, "k string, ts timestamp, q double").write.mode(
            "overwrite").parquet(rd)
        yield ld, rd
        shutil.rmtree(ld, ignore_errors=True)
        shutil.rmtree(rd, ignore_errors=True)

    def test_candidates_and_reduction(self, spark, dirs):
        ld, rd = dirs
        left = spark.readStream.schema("k string, ts timestamp, v double").parquet(ld)
        right = spark.readStream.schema("k string, ts timestamp, q double").parquet(rd)
        cands = streaming_asof_candidates(
            left, right, ["k"], lookback_seconds=3600,
            left_watermark="0 seconds", right_watermark="0 seconds",
        )
        assert cands.isStreaming

        batches = []

        def sink(batch_df, batch_id):
            reduced = reduce_asof_candidates(
                batch_df, ["k"], left_ts="ts", right_ts_prefixed="right_ts",
                left_cols=["v"],
            )
            batches.extend(reduced.collect())

        q = cands.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
        q.awaitTermination(180)

        got = {(r.k, str(r.ts)): (r.right_ts, r.right_q) for r in batches}
        assert got[("A", "2020-01-01 00:10:00")][1] == 11.0
        assert got[("A", "2020-01-01 00:30:00")][1] == 12.0
        assert got[("B", "2020-01-01 00:20:00")][1] == 20.0

    def test_matches_batch_asof(self, spark, dirs):
        """The streaming candidates + reduction equal the batch asofJoin
        (within the lookback window)."""
        from tempo_spark import TSDF

        ld, rd = dirs
        left_b = spark.read.parquet(ld)
        right_b = spark.read.parquet(rd)
        batch = TSDF(left_b, ts_col="ts", series_ids=["k"]).asofJoin(
            TSDF(right_b, ts_col="ts", series_ids=["k"]),
            right_prefix="right",
            tolerance=3600,
        ).df
        expected = {
            (r.k, str(r.ts)): (r.right_q) for r in batch.collect()
        }

        # the same plan runs on static frames (watermark is a no-op in batch)
        cands = streaming_asof_candidates(
            left_b, right_b, ["k"], lookback_seconds=3600,
            left_watermark="0 seconds", right_watermark="0 seconds",
        )
        reduced = reduce_asof_candidates(
            cands, ["k"], left_ts="ts", right_ts_prefixed="right_ts", left_cols=["v"]
        )
        got = {(r.k, str(r.ts)): r.right_q for r in reduced.collect()}
        assert got == expected


