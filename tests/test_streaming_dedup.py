"""Streaming exact dedup (dropDuplicatesWithinWatermark-backed)."""

import datetime as dt
import time

import pytest

from tempo_spark.streaming.dedup import streaming_exact_dedup


def ts(s):
    return dt.datetime.fromisoformat(s)


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


class TestStreamingExactDedup:
    def test_drops_in_horizon_dups(self, spark, tmp_path):
        d = str(tmp_path / "docs")
        rows = [
            (1, ts("2020-01-01 00:00:00"), "alpha beta gamma"),
            (2, ts("2020-01-01 00:01:00"), "delta epsilon"),
            (3, ts("2020-01-01 00:02:00"), "alpha beta gamma"),  # dup of 1
            (4, ts("2020-01-01 00:03:00"), None),
            (5, ts("2020-01-01 00:04:00"), None),  # null text dedups as a group
        ]
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        ).write.mode("overwrite").parquet(d)
        sdf = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
        out = streaming_exact_dedup(sdf, "text", "ts", watermark="1 hour")
        assert out.isStreaming
        assert out.columns == ["doc_id", "ts", "text"]
        got = _run(spark, out, "sed_basic").collect()
        texts = [r.text for r in got]
        assert sorted(t for t in texts if t is not None) == [
            "alpha beta gamma",
            "delta epsilon",
        ]
        assert texts.count(None) == 1
        assert len(got) == 3

    def test_no_python_workers(self, spark, tmp_path):
        from tempo_spark.plans.inspect import count_python_evals

        d = str(tmp_path / "docs")
        spark.createDataFrame(
            [(1, ts("2020-01-01 00:00:00"), "x")],
            "doc_id long, ts timestamp, text string",
        ).write.mode("overwrite").parquet(d)
        batch = spark.read.parquet(d)
        # same expression tree evaluated on the batch plan: pure JVM
        import pyspark.sql.functions as F

        digest = F.coalesce(F.md5(F.col("text")), F.lit("__null_text__"))
        assert count_python_evals(batch.withColumn("__digest", digest)) == 0

    def test_state_survives_batches(self, spark, tmp_path):
        d = str(tmp_path / "docs")
        ck = str(tmp_path / "ck")
        spark.createDataFrame(
            [(1, ts("2020-01-01 00:00:00"), "same text")],
            "doc_id long, ts timestamp, text string",
        ).write.mode("overwrite").parquet(d)
        sdf = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
        out = streaming_exact_dedup(sdf, "text", "ts", watermark="1 hour")
        q = (
            out.writeStream.format("memory")
            .queryName("sed_batches")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            time.sleep(6)
            spark.createDataFrame(
                [
                    (2, ts("2020-01-01 00:05:00"), "same text"),  # cross-batch dup
                    (3, ts("2020-01-01 00:06:00"), "fresh text"),
                ],
                "doc_id long, ts timestamp, text string",
            ).write.mode("append").parquet(d)
            deadline = time.time() + 60
            ids = set()
            while time.time() < deadline:
                ids = {r.doc_id for r in spark.table("sed_batches").collect()}
                if 3 in ids:
                    break
                time.sleep(2)
            assert ids == {1, 3}  # doc 2 dropped against batch-1 state
        finally:
            q.stop()

    def test_keep_digest(self, spark, tmp_path):
        d = str(tmp_path / "docs")
        spark.createDataFrame(
            [(1, ts("2020-01-01 00:00:00"), "x")],
            "doc_id long, ts timestamp, text string",
        ).write.mode("overwrite").parquet(d)
        sdf = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
        out = streaming_exact_dedup(sdf, "text", "ts", keep_digest=True)
        got = _run(spark, out, "sed_digest").collect()
        import hashlib

        assert got[0].asDict()["__digest"] == hashlib.md5(b"x").hexdigest()
