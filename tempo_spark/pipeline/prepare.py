"""One-call training-corpus preparation.

``prepare_corpus`` composes the individual pipeline operators — quality
signals → filters → dedup → split → packing → shard assignment — into the
standard preparation recipe, in the order a production pipeline runs them
(cheap per-row filters FIRST so the expensive dedup stages see fewer
rows). It adds no logic of its own: every stage is one of the documented
operators with its own scale story, and every knob is optional, so the
call reads as the pipeline's table of contents:

    prepared = prepare_corpus(
        docs,
        min_quality=0.3,
        max_dup_2gram_frac=0.3,
        near_dedup_threshold=0.8,
        pack_tokens=4096,
        n_shards=1024,
    )

Returns the surviving rows annotated with ``n_tokens``, ``quality_score``,
``dup_2gram_frac``, ``split`` (and ``pack_id``/``shard_id`` when
requested) — ready for ``sampling.write_training_shards`` or a plain
partitioned write.
"""

from __future__ import annotations

from typing import Mapping

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def prepare_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_quality: float | None = None,
    max_dup_2gram_frac: float | None = None,
    exact_dedup: bool = True,
    near_dedup_threshold: float | None = None,
    splits: Mapping[str, float] | None = None,
    pack_tokens: int | None = None,
    n_shards: int | None = None,
    salt: str = "prep",
) -> DataFrame:
    """Standard corpus preparation in one call; see the module docstring.

    Stage order and cost shape:

    1. per-row signals + filters (token count, quality, dup-2gram) —
       shuffle-free, prunes before anything expensive runs;
    2. ``exact_dedup`` — one digest shuffle, min-id winner;
    3. ``near_dedup_threshold`` — MinHash/LSH pairs (word 3-grams) →
       connected components → canonical min-id survivor;
    4. ``with_split(splits)`` — per-row hash assignment;
    5. ``pack_tokens`` — sequence packing per split group (window cumsum);
    6. ``n_shards`` — shuffle-shard assignment for export.
    """
    from tempo_spark.pipeline import dedup as d
    from tempo_spark.pipeline.components import near_dedup
    from tempo_spark.pipeline.sampling import assign_packs, with_shard, with_split
    from tempo_spark.pipeline.text import (
        with_quality_score,
        with_repetition_metrics,
        with_token_count,
    )

    out = with_token_count(df, text_col)
    out = with_quality_score(out, text_col)
    out = with_repetition_metrics(out, text_col, n=2)
    if min_quality is not None:
        out = out.where(F.col("quality_score") >= min_quality)
    if max_dup_2gram_frac is not None:
        out = out.where(F.col("dup_2gram_frac") <= max_dup_2gram_frac)
    if exact_dedup:
        out = d.exact_dedup(out, id_col, text_col).drop("dup_count")
    if near_dedup_threshold is not None:
        pairs = d.minhash_dedup(
            out, id_col, text_col,
            threshold=near_dedup_threshold, shingle_k=3, use_words=True,
        )
        out = near_dedup(out, pairs, id_col)
    out = with_split(out, id_col, weights=splits, salt=f"{salt}:split")
    if pack_tokens is not None:
        out = assign_packs(
            out, "n_tokens", pack_tokens, ["split"], id_col, salt=f"{salt}:pack"
        )
    if n_shards is not None:
        out = with_shard(out, id_col, n_shards, salt=f"{salt}:shard")
    return out
