"""Streaming MinHash-LSH near-duplicate detection."""

import datetime as dt
import shutil
import tempfile

import pytest

from tempo_spark.streaming.lsh import streaming_lsh_dedup


def ts(s):
    return dt.datetime.fromisoformat(s)


DOC = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)
NEAR = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late evening sun"
)
OTHER = (
    "completely different text about distributed query engines shuffling "
    "partitioned columnar data across a large cluster of machines"
)


@pytest.fixture(scope="module")
def doc_dir(spark):
    d = tempfile.mkdtemp(prefix="tempo_lsh_stream_")
    rows = [
        (1, ts("2020-01-01 00:00:10"), DOC),
        (2, ts("2020-01-01 00:05:00"), OTHER),
        (3, ts("2020-01-01 00:10:00"), NEAR),   # near-dup of doc 1
        (4, ts("2020-01-01 00:15:00"), DOC),    # exact dup of doc 1
    ]
    spark.createDataFrame(rows, "doc_id long, ts timestamp, text string").write.mode(
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


class TestStreamingLshDedup:
    def test_flags_near_and_exact_dups(self, spark, doc_dir):
        sdf = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(
            doc_dir
        )
        out = streaming_lsh_dedup(
            sdf, "doc_id", "text", "ts",
            threshold=0.5, watermark="0 seconds",
        )
        assert out.isStreaming
        table = _run(spark, out, "lsh_stream")
        rows = table.collect()
        # consumers reduce the per-bucket rows to best-match-per-doc
        best = {}
        for r in rows:
            cur = best.get(r.doc_id)
            if cur is None or r.est_jaccard > cur[1]:
                best[r.doc_id] = (r.dup_of, r.est_jaccard, str(r.dup_ts))
        # doc 4 is an exact copy of doc 1: every minhash matches
        assert best[4][0] == 1 and best[4][1] == 1.0
        assert best[4][2] == "2020-01-01 00:00:10"
        # doc 3 is a near-dup of doc 1 (one word differs)
        assert best[3][0] == 1 and best[3][1] >= 0.5
        # docs 1 and 2 have no earlier match
        assert 1 not in best and 2 not in best
        # dup_of always points backward in event time
        for r in rows:
            assert r.dup_ts < r.ts

    def test_md5_32_family_string_band_keys(self, spark, doc_dir):
        """r10: hash_family='md5_32' keeps RAW comma-joined signature
        slices as (string) band bucket keys — the cross-engine value-check
        device — and must flag the same dups as the xxhash64 default."""
        sdf = spark.readStream.schema(
            "doc_id long, ts timestamp, text string"
        ).parquet(doc_dir)
        out = streaming_lsh_dedup(
            sdf, "doc_id", "text", "ts",
            threshold=0.5, watermark="0 seconds", hash_family="md5_32",
        )
        table = _run(spark, out, "lsh_stream_md5")
        best = {}
        for r in table.collect():
            cur = best.get(r.doc_id)
            if cur is None or r.est_jaccard > cur[1]:
                best[r.doc_id] = (r.dup_of, r.est_jaccard)
        assert best[4][0] == 1 and best[4][1] == 1.0
        assert best[3][0] == 1 and best[3][1] >= 0.5
        assert 1 not in best and 2 not in best

    def test_multi_batch_state_and_late_arrival(self, spark, tmp_path):
        """State persists across micro-batches, and a LATE-arriving document
        with the earliest event time is never flagged (dup_of only points
        backward in event time) while still joining the retained set."""
        import time

        d = str(tmp_path / "docs")
        ck = str(tmp_path / "ck")
        spark.createDataFrame(
            [(1, ts("2020-01-01 00:10:00"), DOC), (2, ts("2020-01-01 00:20:00"), OTHER)],
            "doc_id long, ts timestamp, text string",
        ).write.mode("overwrite").parquet(d)
        sdf = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
        out = streaming_lsh_dedup(
            sdf, "doc_id", "text", "ts", threshold=0.5, watermark="0 seconds"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("lsh_stream_batches")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            time.sleep(6)
            # batch 2: doc 3 duplicates doc 1; doc 0 is the same text but
            # with the EARLIEST event time, arriving late
            spark.createDataFrame(
                [(3, ts("2020-01-01 00:30:00"), DOC), (0, ts("2020-01-01 00:01:00"), DOC)],
                "doc_id long, ts timestamp, text string",
            ).write.mode("append").parquet(d)
            deadline = time.time() + 60
            flagged = {}
            while time.time() < deadline:
                rows = spark.table("lsh_stream_batches").collect()
                flagged = {r.doc_id: r.dup_of for r in rows}
                if 3 in flagged:
                    break
                time.sleep(2)
            assert flagged.get(3) == 1      # cross-batch match via state
            assert 0 not in flagged         # nothing earlier than doc 0
            assert 1 not in flagged and 2 not in flagged
        finally:
            q.stop()

    def test_unrelated_text_not_flagged(self, spark, doc_dir):
        sdf = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(
            doc_dir
        )
        out = streaming_lsh_dedup(
            sdf, "doc_id", "text", "ts",
            threshold=0.9, watermark="0 seconds",
        )
        table = _run(spark, out, "lsh_stream_strict")
        flagged = {r.doc_id for r in table.collect()}
        # at threshold 0.9 only the exact copy survives
        assert flagged == {4}
