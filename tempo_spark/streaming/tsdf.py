"""StreamingTSDF — the TSDF metadata contract over an unbounded stream.

The streaming operators in this package are free functions with differing
signatures (each documents its own state/watermark story); this wrapper
unifies them behind the batch ``TSDF`` idiom — ``(df, ts_col, series_ids)``
plus a session-scoped watermark — so a pipeline written against ``TSDF``
ports to streams by swapping the constructor:

    st = StreamingTSDF(readStream_df, ts_col="event_ts", series_ids=["k"])
    st.withWatermark("5 minutes").resample("1 minute", "mean").df.writeStream…

Methods returning frames that still satisfy the (ts, series) contract give
back a ``StreamingTSDF`` (resample/bars/grouped_stats/interpolate/asofJoin/
exact_dedup); shape-changing results (sessionize's intervals, lsh_dedup's
match pairs) return the plain streaming ``DataFrame``. Purely stateless
per-row operators (``pipeline.text``, ``with_split``, ``sample_by_weight``)
need no wrapper support — apply them to ``.df`` directly; the
stream-composition contract test pins that they run unchanged on streams.

The wrapper itself is pure metadata: nothing here starts a query, adds
state, or changes any operator's plan — each method forwards to the
corresponding free function with this frame's ``ts_col``/``series_ids``/
``watermark`` filled in.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame


class StreamingTSDF:
    def __init__(
        self,
        df: DataFrame,
        ts_col: str = "ts",
        series_ids: Optional[Sequence[str]] = None,
        watermark: str = "10 minutes",
    ):
        if not df.isStreaming:
            raise ValueError(
                "StreamingTSDF requires a streaming DataFrame (readStream); "
                "wrap batch frames in TSDF instead"
            )
        for c in [ts_col, *(series_ids or [])]:
            if c not in df.columns:
                raise ValueError(f"column {c!r} not in DataFrame columns {df.columns}")
        self.df = df
        self.ts_col = ts_col
        self.series_ids: list[str] = list(series_ids or [])
        self.watermark = watermark

    # ------------------------------------------------------------- plumbing

    def _with(
        self,
        df: DataFrame,
        ts_col: Optional[str] = None,
        series_ids: Optional[Sequence[str]] = None,
    ) -> "StreamingTSDF":
        return StreamingTSDF(
            df,
            ts_col or self.ts_col,
            self.series_ids if series_ids is None else list(series_ids),
            self.watermark,
        )

    def withWatermark(self, delay: str) -> "StreamingTSDF":
        """Set the watermark DELAY forwarded to every downstream operator
        (metadata only — the operators each call ``df.withWatermark``
        themselves, so nothing is applied until an operator runs)."""
        out = StreamingTSDF(self.df, self.ts_col, self.series_ids, delay)
        return out

    # ------------------------------------------------------------ operators

    def resample(
        self,
        freq: str,
        agg: str = "mean",
        metric_cols: Optional[Sequence[str]] = None,
    ) -> "StreamingTSDF":
        from tempo_spark.streaming.resample import streaming_resample

        return self._with(
            streaming_resample(
                self.df, self.ts_col, self.series_ids, freq, agg, metric_cols,
                watermark=self.watermark,
            )
        )

    def grouped_stats(
        self, freq: str, metric_cols: Sequence[str]
    ) -> "StreamingTSDF":
        from tempo_spark.streaming.resample import streaming_grouped_stats

        return self._with(
            streaming_grouped_stats(
                self.df, self.ts_col, self.series_ids, freq, metric_cols,
                watermark=self.watermark,
            )
        )

    def calc_bars(self, freq: str, metric_cols: Sequence[str]) -> "StreamingTSDF":
        from tempo_spark.streaming.resample import streaming_bars

        return self._with(
            streaming_bars(
                self.df, self.ts_col, self.series_ids, freq, metric_cols,
                watermark=self.watermark,
            )
        )

    def interpolate(
        self,
        freq: str,
        metric_col: str = "value",
        agg: str = "mean",
        method: str = "linear",
    ) -> "StreamingTSDF":
        from tempo_spark.streaming.interpolate import streaming_interpolate

        return self._with(
            streaming_interpolate(
                self.df, self.ts_col, self.series_ids, freq, metric_col,
                agg, method, watermark=self.watermark,
            ),
            ts_col="bucket_ts",
        )

    def asofJoin(
        self,
        right: Union["StreamingTSDF", DataFrame],
        right_ts: Optional[str] = None,
        lookback_seconds: int = 3600,
        right_prefix: str = "right",
    ) -> "StreamingTSDF":
        """Stream-stream as-of (single-query append mode; see
        ``streaming_asof``). ``right`` may be another ``StreamingTSDF``
        (series ids must match; its own watermark setting is ignored —
        one query has one watermark policy, the left's) or a raw streaming
        DataFrame plus ``right_ts``."""
        from tempo_spark.streaming.asof import streaming_asof

        if isinstance(right, StreamingTSDF):
            if right.series_ids != self.series_ids:
                raise ValueError(
                    f"as-of join requires matching series ids; "
                    f"left={self.series_ids} right={right.series_ids}"
                )
            rdf, rts = right.df, right.ts_col
        else:
            rdf, rts = right, right_ts or self.ts_col
        return self._with(
            streaming_asof(
                self.df, rdf, self.series_ids,
                left_ts=self.ts_col, right_ts=rts,
                lookback_seconds=lookback_seconds,
                watermark=self.watermark, right_prefix=right_prefix,
            )
        )

    def sessionize(self, gap_seconds: int = 1800) -> DataFrame:
        """Closed sessions ``(*series_ids, session_start, session_end,
        n_events)`` — interval-shaped, so it returns the raw stream (feed
        it to ``IntervalsDF`` after landing if you need interval algebra)."""
        from tempo_spark.streaming.sessionize import streaming_sessionize

        return streaming_sessionize(
            self.df, self.ts_col, self.series_ids, gap_seconds,
            watermark=self.watermark,
        )

    def exact_dedup(
        self, text_col: str = "text", keep_digest: bool = False
    ) -> "StreamingTSDF":
        from tempo_spark.streaming.dedup import streaming_exact_dedup

        return self._with(
            streaming_exact_dedup(
                self.df, text_col, self.ts_col,
                watermark=self.watermark, keep_digest=keep_digest,
            )
        )

    def lsh_dedup(self, id_col: str, text_col: str = "text", **kwargs) -> DataFrame:
        """Online near-dup match pairs ``(id, ts, band_id, dup_of, dup_ts,
        est_jaccard)`` — pair-shaped, so it returns the raw stream.
        ``kwargs`` forward to ``streaming_lsh_dedup`` (num_hashes, bands,
        shingle_k, threshold, retention_seconds, max_bucket_docs, …)."""
        from tempo_spark.streaming.lsh import streaming_lsh_dedup

        return streaming_lsh_dedup(
            self.df, id_col, text_col, self.ts_col,
            watermark=self.watermark, **kwargs,
        )
