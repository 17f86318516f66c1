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
