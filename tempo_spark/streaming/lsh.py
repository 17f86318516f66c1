"""Streaming MinHash-LSH near-duplicate detection.

Batch near-dedup compares all pairs within an LSH band bucket. The
streaming variant answers the online question a continuously-ingesting
corpus asks instead: *is this incoming document a near-duplicate of
anything already seen?* Each arriving document is checked against the
retained documents sharing one of its band buckets and flagged with its
best prior match.

Architecture (one stateful stage — Spark cannot chain a second):

- MinHash signatures and band bucket keys are computed JVM-side with the
  same native expressions as the batch pipeline
  (``tempo_spark.pipeline.dedup.with_minhash`` / ``band_key_array``) —
  stateless, codegen-friendly, identical plan shape;
- the stream is exploded to one row per (band_id, band_hash) bucket and
  grouped by bucket → ``applyInPandasWithState`` retains per bucket the
  (ts, id, signature) of previously-seen documents;
- similarity is the standard streaming estimate: the fraction of matching
  MinHash components (E[match fraction] = Jaccard). Exact shingle-set
  verification would mean retaining full shingle sets in state — the
  batch ``jaccard_verify`` exists for offline confirmation;
- state is bounded two ways: ``retention_seconds`` evicts documents older
  than ``watermark - retention`` (timeout-driven, so idle buckets clean
  themselves up), and ``max_bucket_docs`` hard-caps degenerate buckets
  (a bucket that collects everything means the banding parameters are
  wrong for the corpus — capped, oldest evicted first).

Ordering semantics: a document is only flagged against retained documents
with a strictly smaller (ts, id) — so "dup_of" always points backward in
event time regardless of arrival order, and re-processed batches cannot
flip match direction. A document colliding with a prior document in k of
its bands emits up to k match rows (one per bucket); downstream consumers
take the max-similarity row per id (a second aggregation cannot be
chained in-stream).

The reference has no streaming surface (roadmap only); this extends the
LLM-pipeline operators to continuous ingestion.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tempo_spark.pipeline.dedup import band_key_array, with_minhash


def streaming_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    ts_col: str = "ts",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    use_words: bool = True,
    threshold: float = 0.7,
    watermark: str = "10 minutes",
    retention_seconds: int = 86_400,
    max_bucket_docs: int = 10_000,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Flag each arriving document against previously-seen near-duplicates.

    Emits one row per (document, colliding band bucket) where the best
    prior match in that bucket reaches ``threshold`` estimated Jaccard:
    ``(id, ts, band_id, dup_of, dup_ts, est_jaccard)``. ``id`` must be a
    64-bit integer column (state-store schema); ``ts`` a timestamp.

    ``hash_family="md5_32"`` (the cross-engine value-check family, see
    ``pipeline.dedup.md5_32``) keeps the RAW comma-joined signature slice
    as the band bucket key (a string — collision-free bucket equality,
    exactly like the batch md5_32 path) so an external engine can replay
    bucket membership, signatures, and the match-fraction estimate
    bit-identically. Production keeps xxhash64 long keys (smaller state
    rows).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    sigs = with_minhash(
        df.withWatermark(ts_col, watermark),
        text_col,
        "__sig",
        num_hashes,
        shingle_k,
        use_words,
        hash_family=hash_family,
    )
    # posexplode_OUTER + null filter: a plain posexplode implies a pushed
    # size>0 filter with the full minhash chain alias-substituted into it
    # (see pipeline/dedup.minhash_lsh_candidates) — per micro-batch here
    banded = sigs.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(ts_col).alias("__ts"),
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
        F.col("__sig"),
        F.posexplode_outer(
            band_key_array("__sig", bands, hash_family)
        ).alias("band_id", "band_hash"),
    ).where(F.col("band_hash").isNotNull())

    key_is_str = hash_family == "md5_32"
    band_hash_type = StringType() if key_is_str else LongType()
    out_schema = StructType(
        [
            StructField("band_id", IntegerType()),
            StructField("band_hash", band_hash_type),
            StructField("id", LongType()),
            StructField("ts_us", LongType()),
            StructField("dup_of", LongType()),
            StructField("dup_ts_us", LongType()),
            StructField("est_jaccard", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ts_us", ArrayType(LongType())),
            StructField("ids", ArrayType(LongType())),
            StructField("sigs", ArrayType(ArrayType(LongType()))),
        ]
    )
    retention_us = int(retention_seconds * 1_000_000)
    nh = float(num_hashes)

    def fn(key, pdfs, state: GroupState):
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            ts_l, ids_l, sigs_l = (list(x) for x in state.get)
            docs = list(zip(ts_l, ids_l, sigs_l))
        else:
            docs = []

        emit = []
        if not state.hasTimedOut:
            incoming = []
            for pdf in pdfs:
                for t_us, i, s in zip(
                    pdf["__ts_us"].tolist(),
                    pdf["__id"].tolist(),
                    pdf["__sig"].tolist(),
                ):
                    incoming.append((t_us, i, [int(x) for x in s]))
            # event-time order inside the batch so intra-batch dups chain
            # forward exactly like cross-batch ones
            incoming.sort(key=lambda d: (d[0], d[1]))
            for t_us, i, s in incoming:
                best = None
                for pt, pi, ps in docs:
                    if (pt, pi) >= (t_us, i):
                        continue  # only match strictly-earlier documents
                    est = sum(a == b for a, b in zip(s, ps)) / nh
                    if est >= threshold and (best is None or est > best[2]):
                        best = (pi, pt, est)
                if best is not None:
                    emit.append(
                        {
                            "band_id": int(key[0]),
                            "band_hash": key[1] if key_is_str else int(key[1]),
                            "id": i,
                            "ts_us": t_us,
                            "dup_of": best[0],
                            "dup_ts_us": best[1],
                            "est_jaccard": best[2],
                        }
                    )
                docs.append((t_us, i, s))
        else:
            for _ in pdfs:
                pass

        # retention eviction + degenerate-bucket cap (oldest first)
        keep_from = wm_us - retention_us
        docs = [d for d in docs if d[0] >= keep_from]
        if len(docs) > max_bucket_docs:
            docs.sort(key=lambda d: (d[0], d[1]))
            docs = docs[-max_bucket_docs:]

        if docs:
            state.update(
                (
                    [d[0] for d in docs],
                    [d[1] for d in docs],
                    [d[2] for d in docs],
                )
            )
            # wake when the watermark lets the oldest retained doc expire,
            # so idle buckets eventually empty and drop their state entry
            timeout_ms = (min(d[0] for d in docs) + retention_us) // 1000 + 1
            state.setTimeoutTimestamp(
                max(timeout_ms, state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.remove()
        if emit:
            yield pd.DataFrame(emit, columns=[f.name for f in out_schema.fields])

    out = banded.groupBy("band_id", "band_hash").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        F.col("id").alias(id_col),
        F.timestamp_micros(F.col("ts_us")).alias(ts_col),
        "band_id",
        "dup_of",
        F.timestamp_micros(F.col("dup_ts_us")).alias("dup_ts"),
        "est_jaccard",
    )
