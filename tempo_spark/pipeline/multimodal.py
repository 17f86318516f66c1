"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side architecture is real and tested — schemas, Arrow-batched
``mapInPandas`` UDF signatures, partition sizing — while the actual media
decode is STUBBED (the container has no image/audio codecs): pass
``fake=True`` for a deterministic fake decoder (hash-derived dimensions),
or get ``NotImplementedError`` pointing at the integration seam.

Scale notes: media rows are large; the helpers repartition by byte budget
(``target_partition_bytes``) before the Python stage so one Arrow batch
never blows executor memory, and metadata-only transforms stay JVM-side.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: canonical multimodal schema fragment
MEDIA_META_DDL = (
    "media_type string, mime string, width int, height int, "
    "duration_ms long, sample_rate int"
)


def with_media_meta_placeholder(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach an empty typed metadata struct for a binary content column."""
    return df.withColumn(
        "media_meta",
        F.expr(
            "named_struct('media_type', CAST(NULL AS string), 'mime', CAST(NULL AS string), "
            "'width', CAST(NULL AS int), 'height', CAST(NULL AS int), "
            "'duration_ms', CAST(NULL AS long), 'sample_rate', CAST(NULL AS int))"
        ),
    )


def repartition_by_bytes(
    df: DataFrame,
    size_col: Optional[str] = None,
    total_bytes: Optional[int] = None,
    target_partition_bytes: int = 128 << 20,
) -> DataFrame:
    """Spread large binary rows so each partition holds ~target bytes.

    Pass ``total_bytes`` when the caller already knows the corpus size
    (stays fully lazy), or ``size_col`` (a per-row byte count, e.g.
    ``F.length(content)`` materialized as a column) to measure it here —
    that path runs ONE eager sum over the column, which parquet statistics
    usually answer without reading data pages."""
    if total_bytes is None:
        if size_col is None:
            raise ValueError("pass total_bytes or size_col")
        total_bytes = df.agg(F.sum(F.col(size_col).cast("long"))).first()[0]
        if total_bytes is None:
            # an all-null size column would silently collapse a large
            # binary corpus into ONE partition — surface the bad column
            raise ValueError(
                f"size_col {size_col!r} summed to NULL (no non-null sizes); "
                "fix the column or pass total_bytes explicitly"
            )
    n = max(1, int(total_bytes / target_partition_bytes))
    return df.repartition(n)


def decode_images(
    df: DataFrame,
    content_col: str = "content",
    fake: bool = False,
    batch_size: int = 64,
) -> DataFrame:
    """Decode image bytes → (width, height, n_channels) via Arrow-batched
    ``mapInPandas``.

    With ``fake=True`` dimensions derive deterministically from the content
    digest (so the full pipeline — schema, batching, downstream joins — is
    exercised end-to-end without codecs)."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["width int", "height int", "n_channels int"]
    )

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            def dims(b) -> tuple[int, int]:
                if b is None:
                    return (0, 0)
                h = hashlib.md5(bytes(b)).digest()
                return (64 + h[0] % 1024, 64 + h[1] % 1024)

            wh = pdf[content_col].map(dims)
            pdf = pdf.copy()
            pdf["width"] = [x[0] for x in wh]
            pdf["height"] = [x[1] for x in wh]
            pdf["n_channels"] = 3
            yield pdf

    def real_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image codecs are not available in this environment; integrate a "
            "decoder (e.g. PIL) here, or pass fake=True for the deterministic stub"
        )

    kernel = fake_decode if fake else real_decode
    return df.mapInPandas(kernel, schema=out_schema)


def resize_images(
    df: DataFrame,
    width_col: str = "width",
    height_col: str = "height",
    max_dim: int = 256,
    content_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Aspect-preserving resize so the larger dimension is ≤ ``max_dim``:
    appends (resized_width, resized_height) [and, with a real codec, would
    rewrite the pixel payload]. The fake path computes the target geometry
    with pure integer arithmetic — deterministic and engine-replicable —
    and passes the binary payload through untouched."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["resized_width int", "resized_height int"]
    )

    def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def geom(w, h):
            if w is None or h is None or w <= 0 or h <= 0:
                return (0, 0)
            if max(w, h) <= max_dim:
                return (w, h)
            if w >= h:
                return (max_dim, (h * max_dim) // w)
            return ((w * max_dim) // h, max_dim)

        for pdf in batches:
            pdf = pdf.copy()
            g = [geom(w, h) for w, h in zip(pdf[width_col], pdf[height_col])]
            pdf["resized_width"] = [x[0] for x in g]
            pdf["resized_height"] = [x[1] for x in g]
            yield pdf

    def real_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image codecs are not available in this environment; integrate a "
            "resampler (e.g. PIL.Image.resize) here, or pass fake=True for "
            "the geometry-only deterministic stub"
        )

    return df.mapInPandas(fake_resize if fake else real_resize, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    content_col: str = "content",
    every_n_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    """Explode each video row into sampled frame rows (frame_idx, frame_ts_ms,
    frame binary). Fake path synthesizes a deterministic frame count from the
    content length."""
    id_cols = [f.name for f in df.schema.fields]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["frame_idx int", "frame_ts_ms long", "frame binary"]
    )

    def fake_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # stub-only kernel: the row explosion is fine here because frame
        # counts are tiny and fake; a REAL codec path must decode per-row via
        # the codec's own batch API, not per-row pandas iteration
        for pdf in batches:
            rows = []
            col_lists = {c: pdf[c].tolist() for c in id_cols}
            for ridx, content in enumerate(pdf[content_col].tolist()):
                n_frames = 1 + (len(content) % 5 if content is not None else 0)
                for i in range(n_frames):
                    row = {c: col_lists[c][ridx] for c in id_cols}
                    row["frame_idx"] = i
                    row["frame_ts_ms"] = i * every_n_ms
                    row["frame"] = bytes(content[:16]) if content is not None else None
                    rows.append(row)
            yield pd.DataFrame(rows, columns=id_cols + ["frame_idx", "frame_ts_ms", "frame"])

    def real_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video codecs are not available in this environment; integrate "
            "ffmpeg/pyav here, or pass fake=True for the deterministic stub"
        )

    return df.mapInPandas(fake_frames if fake else real_frames, schema=out_schema)


def extract_audio_features(
    df: DataFrame,
    content_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Per-row audio feature extraction (duration, rms placeholder)."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["duration_ms long", "rms double"]
    )

    def fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            lens = pdf[content_col].map(lambda b: len(b) if b is not None else 0)
            pdf["duration_ms"] = (lens * 2).astype("int64")
            pdf["rms"] = (lens % 97).astype("float64") / 97.0
            yield pdf

    def real_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "audio codecs are not available in this environment; integrate "
            "soundfile/librosa here, or pass fake=True for the deterministic stub"
        )

    return df.mapInPandas(fake_features if fake else real_features, schema=out_schema)
