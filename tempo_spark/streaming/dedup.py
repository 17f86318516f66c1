"""Streaming exact deduplication.

The online form of ``pipeline.dedup.exact_dedup``: drop documents whose
exact content was already seen. An infinite stream cannot be globally
deduplicated with bounded state, so the production contract is split:

- **in-stream**: ``streaming_exact_dedup`` drops re-arrivals inside the
  watermark horizon with Spark's built-in ``dropDuplicatesWithinWatermark``
  state store — fully JVM-side (no Python workers; this module deliberately
  adds NO custom stateful kernel), state bounded by the watermark delay,
  keyed on a 128-bit content digest rather than the document text so the
  state store holds 32-byte keys, not documents;
- **offline**: a periodic ``dedup_against_corpus`` compaction removes
  duplicates that straddle watermark horizons ("today's shard vs the
  100 TB corpus"), broadcast-pruned so the corpus never shuffles.

Semantics vs batch ``exact_dedup``: the FIRST arrival inside a horizon
wins (arrival order, not the batch operator's min-id winner — a stream
cannot know a smaller id arrives later), and "identical content" is
``pipeline.dedup.content_digest`` — the SAME expression the batch
operators use (null text dedups as a group via its sentinel), so batch
and stream can never drift.

The reference has no streaming surface (roadmap only); this extends the
LLM-pipeline operators to continuous ingestion.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def streaming_exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    keep_digest: bool = False,
) -> DataFrame:
    """Drop rows whose exact ``text_col`` content already arrived within
    the watermark horizon. Emits the input schema (plus ``__digest`` when
    ``keep_digest`` — e.g. to feed the offline compaction without
    re-hashing). First arrival wins; later duplicates are dropped until
    the watermark passes their predecessor's event time plus the delay,
    after which a re-occurrence is treated as new content (hand the
    long-horizon guarantee to ``dedup_against_corpus``).
    """
    from tempo_spark.pipeline.dedup import content_digest

    out = (
        df.withColumn("__digest", content_digest(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__digest"])
    )
    return out if keep_digest else out.drop("__digest")
