"""Streaming as-of join — bounded-lateness stream×stream as-of.

The reference lists streaming as-of joins as future roadmap only
(reference: docs/about/future-roadmap.rst:24-27). This implements the
practical bounded version: each left event is joined to the latest right
event within ``[left.ts - lookback, left.ts]`` for the same series, using
Structured Streaming's native **stream-stream interval join** — watermarks
bound both buffers, so state is O(rate × lookback) per series and the job
runs indefinitely.

Three paths are provided:

- ``streaming_asof_candidates``: pure append interval join, ALL right rows
  in the lookback band per left row;
- ``reduce_asof_candidates``: per-left latest-right reduction to apply
  inside ``foreachBatch`` (or on static frames);
- ``streaming_asof``: single-query append-mode as-of via a custom
  ``applyInPandasWithState`` operator (Spark cannot chain a time-interval
  join with another stateful operator, so the one-query form needs custom
  state).
"""

from __future__ import annotations

import bisect
from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def streaming_asof_candidates(
    left: DataFrame,
    right: DataFrame,
    series_ids: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_seconds: int = 3600,
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    right_prefix: str = "right",
) -> DataFrame:
    """Append-mode stream-stream join: every (left row, right row) pair with
    ``left.ts - lookback <= right.ts <= left.ts`` in the same series.

    Spark plans this as a watermarked interval join: right state is evicted
    once older than ``right_watermark + lookback``; left rows emit as soon
    as eligible rights are known-complete."""
    r = right
    for c in right.columns:
        if c not in series_ids:
            r = r.withColumnRenamed(c, f"{right_prefix}_{c}")
    r_ts = f"{right_prefix}_{right_ts}"

    lw = left.withWatermark(left_ts, left_watermark)
    rw = r.withWatermark(r_ts, right_watermark)

    cond = F.lit(True)
    for c in series_ids:
        cond = cond & (lw[c] == rw[c])
    cond = cond & (
        rw[r_ts].between(
            lw[left_ts] - F.expr(f"interval {lookback_seconds} seconds"),
            lw[left_ts],
        )
    )
    joined = lw.join(rw, on=cond, how="leftOuter")
    keep = [lw[c].alias(c) for c in left.columns] + [
        rw[c].alias(c) for c in r.columns if c not in series_ids
    ]
    return joined.select(*keep)


def streaming_asof(
    left: DataFrame,
    right: DataFrame,
    series_ids: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_seconds: int = 3600,
    watermark: str = "10 minutes",
    right_prefix: str = "right",
    observe: Optional[str] = None,
) -> DataFrame:
    """End-to-end streaming as-of in ONE query (no foreachBatch), append
    output: each left row emits exactly once — with the latest right row in
    ``[left.ts - lookback, left.ts]`` — when the watermark passes its event
    time.

    Spark cannot chain a stream-stream *time-interval* join with another
    stateful operator (the interval join's outputs arrive "late" at a
    downstream aggregation and are dropped — verified on 4.1; the SS guide
    lists the combination as unsupported), so this is a custom stateful
    operator instead: pad + union the two streams, group by series, and run
    ``applyInPandasWithState`` with event-time timeouts.

    State per series is bounded: right rows newer than
    ``watermark - lookback`` plus left rows still ahead of the watermark —
    O(rate × (lookback + watermark delay)), the same bound the interval
    join's buffers have.

    Watermark boundary: a left row emits once ``left.ts <= watermark`` —
    the same convention as Spark's append-mode windows (which close at
    ``window.end <= watermark``). A right row arriving LATER with event
    time exactly equal to the watermark is admitted by Spark but can no
    longer match an already-emitted left row at that boundary; holding
    lefts one tick longer instead would strand rows at the final watermark
    forever on bounded replays.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    if observe:
        # arrival counter on the LEFT (event) stream — the side whose
        # watermark-dropped rows silently shrink the output; read back
        # via tempo_spark.streaming.metrics.late_row_stats
        from tempo_spark.streaming.metrics import observe_input

        left = observe_input(left, left_ts, observe)
    l_vals = [c for c in left.columns if c not in series_ids and c != left_ts]
    r_vals = [c for c in right.columns if c not in series_ids and c != right_ts]
    out_r_ts = f"{right_prefix}_{right_ts}"
    out_r_vals = [f"{right_prefix}_{c}" for c in r_vals]
    collisions = ({out_r_ts, *out_r_vals} & {left_ts, *l_vals}) | (
        {out_r_ts, *out_r_vals} & set(series_ids)
    )
    if collisions:
        raise ValueError(
            f"right_prefix {right_prefix!r} leaves colliding output columns: "
            f"{sorted(collisions)}"
        )

    # event time crosses the Arrow boundary as session-timezone-NAIVE wall
    # clock, while GroupState watermarks are true UTC epoch — so the kernel
    # works exclusively in unix_micros computed JVM-side (true epoch in any
    # session timezone) and the output timestamps are reconstructed
    # JVM-side after the stateful operator.
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    l_pad = lw.select(
        *series_ids,
        F.col(left_ts).alias("__ts"),
        F.unix_micros(F.col(left_ts)).alias("__ts_us"),
        F.lit(1).alias("__rec"),
        *[F.col(c) for c in l_vals],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in r_vals],
    )
    r_pad = rw.select(
        *series_ids,
        F.col(right_ts).alias("__ts"),
        F.unix_micros(F.col(right_ts)).alias("__ts_us"),
        F.lit(-1).alias("__rec"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_vals],
        *[F.col(c).alias(f"__r_{c}") for c in r_vals],
    )
    unioned = l_pad.unionByName(r_pad)

    key_fields = [unioned.schema[c] for c in series_ids]
    l_val_fields = [left.schema[c] for c in l_vals]
    r_val_fields = [right.schema[c] for c in r_vals]
    out_schema = StructType(
        list(key_fields)
        + [StructField("__lts_us", LongType())]
        + list(l_val_fields)
        + [StructField("__rts_us", LongType())]
        + [StructField(f"{right_prefix}_{f.name}", f.dataType) for f in r_val_fields]
    )
    # state: pending left rows (ts_us + values) and the right-row buffer
    left_struct = StructType(
        [StructField("ts_us", LongType())] + list(l_val_fields)
    )
    right_struct = StructType(
        [StructField("ts_us", LongType())] + list(r_val_fields)
    )
    state_schema = StructType(
        [
            StructField("lefts", ArrayType(left_struct)),
            StructField("rights", ArrayType(right_struct)),
        ]
    )
    lookback_us = int(lookback_seconds * 1_000_000)
    key_names = [f.name for f in key_fields]

    def fn(key, pdfs, state: GroupState):
        wm_us = state.getCurrentWatermarkMs() * 1000
        lefts, rights = ([], []) if not state.exists else tuple(
            [list(x) for x in state.get]
        )
        if not state.hasTimedOut:
            for pdf in pdfs:
                # .tolist() yields native Python scalars — numpy scalars
                # break the state store's pickle round-trip
                ts_us = pdf["__ts_us"].tolist()
                lcols = [pdf[c].tolist() for c in l_vals]
                rcols = [pdf[f"__r_{c}"].tolist() for c in r_vals]
                for i, rec in enumerate(pdf["__rec"].tolist()):
                    if rec == 1:
                        lefts.append(tuple([ts_us[i]] + [col[i] for col in lcols]))
                    else:
                        rights.append(tuple([ts_us[i]] + [col[i] for col in rcols]))
        else:
            # timeout invocations receive no data; drain the iterator anyway
            for _ in pdfs:
                pass

        rights.sort(key=lambda r: r[0])
        rts = [r[0] for r in rights]
        emit, pending = [], []
        for lrow in sorted(lefts, key=lambda r: r[0]):
            lt = lrow[0]
            if lt > wm_us:
                pending.append(lrow)
                continue
            # last right with ts <= lt, if within the lookback band —
            # bisect keeps a hot series O(lefts·log rights) per batch
            # instead of O(lefts·rights)
            j = bisect.bisect_right(rts, lt) - 1
            best = (
                rights[j]
                if j >= 0 and rights[j][0] >= lt - lookback_us
                else None
            )
            row = dict(zip(key_names, key))
            row["__lts_us"] = lt
            for j, c in enumerate(l_vals):
                row[c] = lrow[1 + j]
            row["__rts_us"] = best[0] if best is not None else None
            for j, c in enumerate(out_r_vals):
                row[c] = best[1 + j] if best is not None else None
            emit.append(row)

        # prune rights no pending-or-future left can reach
        keep_from = wm_us - lookback_us
        rights = [r for r in rights if r[0] >= keep_from]

        if pending or rights:
            state.update((pending, rights))
            if pending:
                # fire again once the watermark passes the oldest pending left
                timeout_ms = min(r[0] for r in pending) // 1000 + 1
            else:
                # rights-only state: fire once the watermark passes
                # newest_right + lookback — by then the prune empties the
                # buffer and the key is removed, so idle series don't leak
                # state-store entries forever
                timeout_ms = (
                    max(r[0] for r in rights) + lookback_us
                ) // 1000 + 1
            state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()
        if emit:
            yield pd.DataFrame(emit, columns=[f.name for f in out_schema.fields])

    out = unioned.groupBy(*series_ids).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        *series_ids,
        F.timestamp_micros(F.col("__lts_us")).alias(left_ts),
        *l_vals,
        F.timestamp_micros(F.col("__rts_us")).alias(out_r_ts),
        *out_r_vals,
    )


def reduce_asof_candidates(
    candidates: DataFrame,
    series_ids: Sequence[str],
    left_ts: str = "ts",
    right_ts_prefixed: str = "right_ts",
    left_cols: Sequence[str] | None = None,
    right_prefix: str | None = None,
) -> DataFrame:
    """Per left row, keep the candidate with the greatest right timestamp —
    apply inside ``foreachBatch`` (or on any static candidates frame).

    ``right_prefix`` names the prefix marking right-side columns
    explicitly; when omitted it falls back to everything before the first
    underscore of ``right_ts_prefixed`` (ambiguous if a LEFT column shares
    that prefix — pass it explicitly then)."""
    prefix = (
        right_prefix if right_prefix is not None
        else right_ts_prefixed.split("_")[0]
    ) + "_"
    left_set = set(left_cols or [])
    right_cols = [
        c for c in candidates.columns
        if c.startswith(prefix) and c not in left_set
    ]
    group_cols = list(series_ids) + [left_ts] + [
        c for c in (left_cols or []) if c not in series_ids and c != left_ts
    ]
    packed = F.max(
        F.when(
            F.col(right_ts_prefixed).isNotNull(),
            F.struct(F.col(right_ts_prefixed).alias("__ts"), *[F.col(c).alias(c) for c in right_cols]),
        )
    ).alias("__best")
    reduced = candidates.groupBy(*group_cols).agg(packed)
    return reduced.select(
        *group_cols, *[F.col("__best").getField(c).alias(c) for c in right_cols]
    )
