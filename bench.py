"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query set mirrors BASELINE.md B1–B8 plus the pipeline operators. Each query
is forced with a cheap count() action; timings are the MIN of 3 runs —
ambient load on this shared host moves identical-code totals by ±30%
between runs (measured 15.7 s … 23.4 s), and the minimum is the standard
noise-rejecting estimator of true query cost (same rationale as timeit).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from tempo_spark import TSDF


def _single_asof(spark, sf_dir):
    # BASELINE-comparable single as-of (the gate entry now union-tags
    # single ∪ asofJoinMany, which would double b1's work)
    ev = entry_mod._read(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("p_value"))
    )
    left = TSDF(clicks, ts_col="ts", series_ids=["user_id"])
    right = TSDF(purchases, ts_col="ts", series_ids=["user_id"])
    return left.asofJoin(right, left_prefix="left", right_prefix="right").df


def _skew_asof(spark, sf_dir):
    ev = entry_mod._read(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("p_value"))
    )
    left = TSDF(clicks, ts_col="ts", series_ids=["user_id"])
    right = TSDF(purchases, ts_col="ts", series_ids=["user_id"])
    return left.asofJoin(
        right, left_prefix="left", right_prefix="right", tsPartitionVal=7 * 86400
    ).df


def _text_analysis(spark, sf_dir):
    # production quality-score path, matching the BASELINE B12 shape (the
    # gate entry now union-tags quality ∪ md5_32 n-gram contamination,
    # which deliberately multiplies its work for oracle replay)
    from tempo_spark.pipeline.text import with_quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_quality_score(docs, "text").select("doc_id", "quality_score")


def _contamination(spark, sf_dir):
    # production xxhash64 contamination path (benchmark = first 20 docs)
    from tempo_spark.pipeline.dedup import ngram_contamination

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_contamination(
        docs.where(F.col("doc_id") >= 20), docs.where(F.col("doc_id") < 20), n=5
    )


def _corpus_neardedup(spark, sf_dir):
    # production xxhash64 incremental near-dup path: 10% "new shard" vs the
    # other 90% "existing corpus" (the gate tag replays md5_32 instead)
    from tempo_spark.pipeline.dedup import near_dedup_against_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return near_dedup_against_corpus(
        docs.where(F.col("doc_id") % 10 == 0),
        docs.where(F.col("doc_id") % 10 != 0),
        "doc_id", "text",
        num_hashes=16, bands=4, shingle_k=3, threshold=0.5, use_words=True,
        mode="pairs",
    )


def _tfidf(spark, sf_dir):
    from tempo_spark.pipeline.text import tfidf_keywords

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_keywords(docs, "doc_id", "text", k=5)


def _minhash_dedup(spark, sf_dir):
    # production xxhash64 hash family (the oracle-gated entry uses the
    # engine-neutral md5_32 family, which trades speed for replayability)
    from tempo_spark.pipeline.dedup import minhash_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_dedup(
        docs, "doc_id", "text",
        num_hashes=16, bands=4, shingle_k=3, threshold=0.5, use_words=True,
    )


def _simhash_dedup(spark, sf_dir):
    from tempo_spark.pipeline.dedup import simhash_near_dups, with_simhash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_dups(
        with_simhash(docs, "text", id_col="doc_id"), "doc_id", max_hamming=6
    )


def _ivf_kmeans_topk(spark, sf_dir):
    # production init="kmeans" quantizer (the oracle-gated entry uses the
    # deterministic init="first" path, which skips the MLlib fit this
    # bench is meant to measure)
    from tempo_spark.pipeline.similarity import IVFIndex

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = IVFIndex.build(emb, n_centroids=8, seed=42)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return idx.topk(queries, k=5, nprobe=2)


def _pq_ann(spark, sf_dir):
    # the full faiss IVFx,PQm plan single-shot: coarse quantizer fit
    # (driver Lloyd), PQ codebook training (driver Lloyd per subspace),
    # corpus encode (Arrow matmul kernel past the literal budget), then
    # ADC top-k over the probed cells (JVM O(m) fold per code)
    from tempo_spark.pipeline.similarity import IVFIndex, PQCodec, ivf_pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = IVFIndex.build(emb, n_centroids=16, seed=42, init_mode="local")
    codec = PQCodec.train(emb, m=8, ksub=64, seed=42)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    codes = codec.encode(idx.assigned, vec_col="__vec")
    return ivf_pq_topk(idx, codec, queries, codes_df=codes, k=5, nprobe=4)


def _force(df):
    # count() lets Catalyst prune unreferenced computed columns — for a
    # window-only frame the whole Window node vanishes and the "measured"
    # query is just the scan (the r10 scale_probe lesson, found applying
    # to bench in r11). Checksum-aggregate every column so the measured
    # plan IS the operator's plan. Applied to SELF-BASELINED rows only:
    # v0-comparable rows keep the historical .count() protocol, which was
    # symmetric (the v0 capture pruned identically) — see BASELINE.md.
    return df.agg(
        F.sum(F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(1 << 30)))
    )


def _range_corr(spark, sf_dir):
    # production prefix strategy (O(n) sufficient-sum differences)
    de = entry_mod._dedup_events(spark, sf_dir).select("user_id", "ts", "cents")
    de = de.withColumn("y", F.expr("cents % 1000"))
    t = TSDF(de, ts_col="ts", series_ids=["user_id"])
    return _force(t.withRangeCorr("cents", "y", rangeBackWindowSecs=1000).df)


def _paragraph_dedup(spark, sf_dir):
    # word-grain keep-first dedup (single-line docs; production xxhash64)
    from tempo_spark.pipeline.dedup import dedup_paragraphs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup_paragraphs(docs.select("doc_id", "text"), "doc_id", sep=" ")


def _mix(spark, sf_dir):
    from tempo_spark.pipeline.sampling import mix_by_group
    from tempo_spark.pipeline.text import with_token_count

    docs = with_token_count(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return mix_by_group(
        docs, "doc_id", "lang",
        {"en": 0.5, "de": 0.25, "es": 0.125, "fr": 0.125},
        token_col="n_tokens",
    )


def _bloom_dedup_shards(spark, sf_dir):
    # the AMORTIZED bloom path — build_content_bloom once (cached), then
    # three daily shards probe the same filter; the alternative the probe
    # measured (scale_probe --corpus) pays the corpus-digest build per
    # shard. Timed region = one build + three probes.
    from functools import reduce

    from tempo_spark.pipeline.dedup import build_content_bloom, dedup_against_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    bits = 1 << 20
    bloom = build_content_bloom(corpus, "text", bloom_bits=bits).cache()
    shards = [
        docs.where((F.col("doc_id") % 4 == 0) & ((F.col("doc_id") / 4).cast("long") % 3 == i))
        for i in range(3)
    ]
    outs = [
        dedup_against_corpus(
            s, corpus, "text", strategy="bloom", bloom_bits=bits, bloom_df=bloom
        ).select("doc_id")
        for s in shards
    ]
    return reduce(lambda a, b: a.unionByName(b), outs)


def _semantic_dedup(spark, sf_dir):
    # production SemDeDup path: MLlib k-means quantizer + cell-scoped
    # cosine + far-from-centroid survivor (the gate's semantic tag replays
    # the deterministic init="first" quantizer instead)
    from tempo_spark.pipeline.similarity import semantic_dedup

    from tempo_spark.pipeline.similarity import IVFIndex

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # cells sized ~100 rows (the SemDeDup regime: k grows with the corpus
    # so within-cell compares stay bounded); driver-local seeded Lloyd fit
    # — the faiss coarse-quantizer recipe (MLlib launches several jobs per
    # iteration: ~5 s of pure scheduling for a 2k-row fit)
    idx = IVFIndex.build(
        emb, n_centroids=64, seed=42, init_mode="local"
    )
    return semantic_dedup(
        emb, threshold=0.35, index=idx, keep="far_centroid"
    ).select("vec_id")


def _span_dedup(spark, sf_dir):
    # production xxhash64 span dedup (the gate's dedup_exact span tag
    # replays md5_32 string grams instead)
    from tempo_spark.pipeline.dedup import remove_duplicate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return remove_duplicate_spans(
        docs.select("doc_id", "text").where(F.col("text").isNotNull()),
        "doc_id", "text", n=6, out_removed="nrm",
    ).select("doc_id", "nrm")


def _normalize_stats(spark, sf_dir):
    # corpus hygiene pass: normalize every doc, then the one-agg per-source
    # health report (exact distinct digests = the expensive part)
    from tempo_spark.pipeline.text import corpus_stats, normalize_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus_stats(normalize_text(docs, "text"), ["source"])


def _prepare_corpus(spark, sf_dir):
    # the one-call production recipe end-to-end (composition gated by the
    # fingerprint 'recipe' tag; this row measures it): normalize ->
    # signals -> quality/repetition filters -> exact dedup -> MinHash/LSH
    # near dedup -> canonical survivor -> source mixture -> split -> pack
    # -> shard, production xxhash64 family throughout. The bench loop
    # clears the cache before every rep, so the recorded min-of-3 is the
    # honest SINGLE-SHOT shape (~12 s); sessions that keep the recipe's
    # persist_intermediate caches re-run warm at ~5 s
    from tempo_spark.pipeline.prepare import prepare_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    return prepare_corpus(
        docs.select("doc_id", "text", "lang"),
        normalize=True,
        min_quality=0.2,
        max_dup_2gram_frac=0.5,
        exact_dedup=True,
        near_dedup_threshold=0.8,
        mix_group_col="lang",
        mix_shares={"en": 0.5, "de": 0.25, "es": 0.125, "fr": 0.125},
        pack_tokens=2048,
        n_shards=64,
    ).select("doc_id", "split", "pack_id", "shard_id")


def _paragraph_filter(spark, sf_dir):
    # CCNet paragraph-grain pass over synthetic multi-paragraph docs
    # (corpus texts concatenated per doc_id%500 group): per-paragraph
    # language ID, majority, mixed-language fraction, foreign removal
    from tempo_spark.pipeline.text import (
        remove_foreign_paragraphs,
        with_paragraph_langs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grouped = (
        docs.where(F.length(F.trim(F.col("text"))) > 0)
        .groupBy((F.col("doc_id") % 500).alias("g"))
        .agg(F.concat_ws("\n", F.collect_list("text")).alias("text"))
    )
    return remove_foreign_paragraphs(
        with_paragraph_langs(grouped), out="clean",
        langs_col="para_langs", majority_col="majority_lang",
    ).select("g", "majority_lang", "foreign_para_frac", F.length("clean"))


def _dsir_select(spark, sf_dir):
    # full DSIR chain on the production hash: fit target (one source slice)
    # + raw, ratio, score every doc, Gumbel top-500 resample
    from tempo_spark.pipeline.dsir import (
        dsir_logratio,
        fit_hashed_counts,
        sample_by_importance,
        with_importance_weight,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    target = docs.where(F.col("source").isin("src0", "src1"))
    ratio = dsir_logratio(
        fit_hashed_counts(target), fit_hashed_counts(docs)
    )
    scored = with_importance_weight(docs, ratio, "doc_id")
    return sample_by_importance(scored, "doc_id", "dsir_logweight", k=500)


def _range_stats(spark, sf_dir):
    # single-strategy production path (the gate entry union-tags BOTH the
    # sliding and prefix+block strategies, doubling its work on purpose)
    import pyspark.sql.functions as F

    de = entry_mod._dedup_events(spark, sf_dir).select("user_id", "ts", "cents")
    t = TSDF(de, ts_col="ts", series_ids=["user_id"])
    return t.withRangeStats(colsToSummarize=["cents"], rangeBackWindowSecs=1000).df


def _interpolate_linear(spark, sf_dir):
    # single-method linear interpolation, matching the BASELINE B5 shape
    # (the entry module's interpolate query now union-tags all five methods)
    de = entry_mod._dedup_events(spark, sf_dir).select("user_id", "ts", "cents")
    t = TSDF(de, ts_col="ts", series_ids=["user_id"])
    return t.resample("30 minutes", "mean").interpolate("linear").df


def _ohlc_single(spark, sf_dir):
    # single-grain calc_bars, matching the BASELINE B6 shape (the entry
    # module's ohlc query now union-tags single ∪ multi-grain rollup)
    de = entry_mod._dedup_events(spark, sf_dir).select("user_id", "ts", "value")
    t = TSDF(de, ts_col="ts", series_ids=["user_id"])
    return t.calc_bars("1 hour").df


def _bm25(spark, sf_dir):
    # ad-hoc BM25 retrieval: 20 whole-document queries against the corpus
    # (query vocab broadcast prunes the token shuffle; the corpus is never
    # reshuffled). Self-baselined — no v0 counterpart.
    from tempo_spark.pipeline.search import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = docs.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return bm25_topk(docs, queries, k=10)


def _rollup(spark, sf_dir):
    # multi-grain rollup over events: one raw shuffle to 15-minute
    # partials, 1h/1d re-aggregated from those. Self-baselined.
    de = entry_mod._dedup_events(spark, sf_dir).select("user_id", "ts", "cents")
    t = TSDF(de, ts_col="ts", series_ids=["user_id"])
    return t.resample_rollup(
        ["15 minutes", "1 hour", "1 day"], {"cents": "mean"}
    )


def _latest_slices(spark, sf_dir):
    # pinned to the single latest(3) shape — the entry union-tags the
    # get_display_df frame as a gate device (r10 'display' tag), which
    # would double the measured work (the b6 single-grain convention)
    import pyspark.sql.functions as F

    de = entry_mod._dedup_events(spark, sf_dir).select("user_id", "ts", "value")
    t = TSDF(de, ts_col="ts", series_ids=["user_id"])
    return t.latest(3).df.select("user_id", "ts", "value")


def _ann_topk(spark, sf_dir):
    # pinned to the pure brute-force cosine shape — the entry now also
    # runs the rrf gate tag (a second scorer + fusion)
    import pyspark.sql.functions as F

    from tempo_spark.pipeline.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=5)


def _ts_analytics(spark, sf_dir):
    # r10 time-series analytics extras in one pass: period-24 classical
    # seasonal decomposition + ACF at lags 1..5 over the deduped events.
    # Self-baselined.
    de = entry_mod._dedup_events(spark, sf_dir).select("user_id", "ts", "value")
    t = TSDF(de, ts_col="ts", series_ids=["user_id"])
    sd = t.seasonal_decompose("value", 24).select(
        "user_id", "ts", "trend", "seasonal", "resid"
    )
    ac = t.autocorr("value", 5).select(
        "user_id", F.col("lag").cast("long").alias("lag_or_null"),
        F.col("acf").alias("x"),
    )
    return _force(sd.select(
        "user_id", F.lit(None).cast("long").alias("lag_or_null"),
        F.col("resid").alias("x"),
    ).unionByName(ac))


def _analytics2(spark, sf_dir):
    # r11 analytics extras in one pass: 2-round changepoint segmentation,
    # running drawdown, per-series winsorize, 3-pair correlation matrix.
    # Self-baselined.
    de = entry_mod._dedup_events(spark, sf_dir).select(
        "user_id", "ts", "value", "cents"
    )
    t = TSDF(de, ts_col="ts", series_ids=["user_id"])
    cps = t.changepoints("value", rounds=2).select(
        "user_id", F.col("score").alias("x")
    )
    dd = t.withDrawdown("value").df.select(
        "user_id", F.col("drawdown").alias("x")
    )
    wz = t.winsorize("value").df.select(
        "user_id", F.col("value_wz").alias("x")
    )
    pc = t.pairwiseCorr(["value", "cents"]).select(
        "user_id", F.col("corr").alias("x")
    )
    from functools import reduce

    return _force(reduce(lambda a, b: a.unionByName(b), [cps, dd, wz, pc]))


def _analytics3(spark, sf_dir):
    # r12 analytics extras in one pass: hourly-bar ATR + stochastic +
    # Williams %R + OBV, MACD via the O(rows) prefix EMA, Holt-Winters +
    # damped-Holt forecasts, seasonal-residual anomalies. Self-baselined.
    de = entry_mod._dedup_events(spark, sf_dir).select(
        "user_id", "ts", "value", "cents"
    )
    t = TSDF(de, ts_col="ts", series_ids=["user_id"])
    bars = t.calc_bars("1 hour")
    bv = TSDF(
        bars.df.withColumn(
            "vol_c", F.expr("((close_cents % 97) + 97) % 97 + 1")
        ),
        ts_col="ts", series_ids=["user_id"],
    )
    ind = (
        bv.withATR("high_cents", "low_cents", "close_cents", window=5)
        .withStochastic("high_cents", "low_cents", "close_cents", 5, 3)
        .withWilliamsR("high_cents", "low_cents", "close_cents", window=5)
        .withOBV("close_cents", "vol_c")
        .df.select(
            "user_id",
            (F.coalesce(F.col("atr"), F.lit(0.0))
             + F.coalesce(F.col("stoch_d"), F.lit(0.0))
             + F.coalesce(F.col("williams_r"), F.lit(0.0))
             + F.col("obv")).alias("x"),
        )
    )
    macd = t.withMACD("value", ema_strategy="prefix").df.select(
        "user_id", F.col("macd_hist").alias("x")
    )
    hw = t.forecast_ets(
        "value", 12, "1 minute", method="hw_add", alpha=0.3, beta=0.1,
        gamma=0.1, period=24,
    ).select("user_id", F.col("yhat").alias("x"))
    damp = t.forecast_ets(
        "value", 12, "1 minute", method="holt", alpha=0.4, beta=0.2,
        phi=0.9,
    ).select("user_id", F.col("yhat").alias("x"))
    san = t.seasonal_anomalies("value", 24).select(
        "user_id", F.col("resid_z").alias("x")
    )
    from functools import reduce

    return _force(
        reduce(lambda a, b: a.unionByName(b), [ind, macd, hw, damp, san])
    )


def _bpe(spark, sf_dir):
    # learned BPE end-to-end (r10): vocab groupBy + 256-merge driver train,
    # then the Arrow count engine over the corpus (production config —
    # past REPLACE_CHAIN_MAX the replace chain stops being the right
    # plan). Self-baselined.
    from tempo_spark.pipeline.bpe import train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = train_bpe(docs, "text", num_merges=256)
    return model.token_count(docs, "text", engine="arrow").select(
        "doc_id", "n_bpe_tokens"
    )


BENCH_QUERIES = {
    "b1_asof_join": _single_asof,
    "b2_asof_skew": _skew_asof,
    "b3_range_stats": _range_stats,
    "b4_resample_fill": entry_mod.q_upsample_zero_fill,
    "b5_interpolate_linear": _interpolate_linear,
    "b6_ohlc_bars": _ohlc_single,
    "b7_make_disjoint": entry_mod.q_make_disjoint,
    "b8_latest_slices": _latest_slices,
    "b9_vwap": entry_mod.q_vwap,
    "b10_minhash_dedup": _minhash_dedup,
    "b11_ann_topk": _ann_topk,
    "b12_text_analysis": _text_analysis,
    "b17_contamination": _contamination,
    "b13_simhash_dedup": _simhash_dedup,
    "b14_ngram_jaccard": entry_mod.q_ngram_jaccard,
    "b15_ivf_ann_topk": _ivf_kmeans_topk,
    "b16_composite_funnel": entry_mod.q_composite_funnel,
    "b18_corpus_neardedup": _corpus_neardedup,
    "b19_tfidf": _tfidf,
    "b20_range_corr": _range_corr,
    "b21_paragraph_dedup": _paragraph_dedup,
    "b22_mix": _mix,
    "b23_bloom_dedup_shards": _bloom_dedup_shards,
    "b24_span_dedup": _span_dedup,
    "b25_semantic_dedup": _semantic_dedup,
    "b26_normalize_stats": _normalize_stats,
    "b27_dsir_select": _dsir_select,
    "b28_paragraph_filter": _paragraph_filter,
    "b29_prepare_corpus": _prepare_corpus,
    "b30_pq_ann": _pq_ann,
    "b31_bm25": _bm25,
    "b32_rollup": _rollup,
    "b33_bpe": _bpe,
    "b34_ts_analytics": _ts_analytics,
    "b35_analytics2": _analytics2,
    "b36_analytics3": _analytics3,
}

RUNS = 3


def _cpu_ticks() -> tuple[int, int]:
    """(total_ticks, steal_ticks) from the aggregate /proc/stat cpu line.

    Hypervisor steal is the one contamination signal the bench's own
    local[32] load cannot produce (loadavg mid-run reflects the bench
    itself), so per-row steal deltas are what distinguish "this row is
    slow" from "the host was robbed while this row ran" — the r12 driver
    capture was inflated exactly this way and undiagnosable without it.
    """
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError, IndexError):
        return 0, 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = -1.0

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tempo_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Load guard: a busy host inflates timings 1.5-2x (BENCH_r06 ran at
    # loadavg 7 and three UNCHANGED queries drifted to 1.7-1.9x their
    # baselines). Wait for the load to settle below MAX_LOAD before
    # timing (bounded by LOAD_WAIT seconds), and record what happened so a
    # degraded capture is self-describing instead of a mystery regression.
    # r13 hardening: the r12 driver capture passed this guard on the 1-min
    # average (1.75) while the 5-min average was 6.84 and steal hit
    # mid-run — gate on BOTH averages, since a recently-busy host predicts
    # mid-run contention that the 1-min snapshot hides.
    max_load = float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "2.0"))
    load_wait = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "300"))
    waited = 0.0
    while max(os.getloadavg()[:2]) > max_load and waited < load_wait:
        time.sleep(15)
        waited += 15
    load_guard = (
        "clean" if max(os.getloadavg()[:2]) <= max_load
        else f"degraded: loadavg {max(os.getloadavg()[:2]):.1f} > {max_load} "
             f"after {int(waited)}s wait"
    )

    # Untimed generic JVM warmup: the FIRST timed query otherwise absorbs
    # codegen/JIT/classloading cost — b1 (first in dict order, unchanged
    # code) measured 0.84-1.16 s in-bench vs a 0.60 s warmed standalone
    # floor (8-rep decay probe, round 11). One small shuffle + window +
    # join + parquet scan warms the common paths without touching any
    # query-specific cache.
    # through the adaptive reader — a direct parquet read would die at
    # schema inference on the rounds-1-2 TIMESTAMP(NANOS) events layout
    warm = entry_mod._read(spark, sf_dir, "events").limit(50_000)
    warm_agg = warm.groupBy("user_id").count()
    warm_agg.join(warm_agg.withColumnRenamed("count", "c2"), "user_id").count()

    # Per-row steal re-check: if the hypervisor stole more than MAX_STEAL
    # of this row's cpu time, every sample in the window is suspect — re-run
    # the whole sample loop (bounded) and keep the min over ALL samples.
    # Min-of-N stays the estimator (same count() action, same queries);
    # clean rows take exactly the historical 3 samples.
    max_steal = float(os.environ.get("SPARK_GRAFT_MAX_STEAL", "0.03"))
    max_retries = int(os.environ.get("SPARK_GRAFT_STEAL_RETRIES", "2"))

    load_start = os.getloadavg()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    row_steal: dict[str, float] = {}
    row_load: dict[str, float] = {}
    row_retries: dict[str, int] = {}
    for name, fn in BENCH_QUERIES.items():
        samples: list[float] = []
        attempt_samples: list[float] = []
        steal_frac = 0.0
        for attempt in range(1 + max_retries):
            attempt_samples = []
            tick0, steal0 = _cpu_ticks()
            for _ in range(RUNS):
                spark.catalog.clearCache()  # operators may persist shared frames
                t0 = time.monotonic()
                fn(spark, sf_dir).count()
                attempt_samples.append(time.monotonic() - t0)
            tick1, steal1 = _cpu_ticks()
            samples.extend(attempt_samples)
            steal_frac = (steal1 - steal0) / max(1, tick1 - tick0)
            row_retries[name] = attempt
            if steal_frac <= max_steal:
                break
        samples.sort()
        attempt_samples.sort()
        timings[name] = round(samples[0], 3)
        # median over the LAST attempt's window (a fixed-size sample, so the
        # median/min spread stays interpretable the same way as before)
        medians[name] = round(attempt_samples[len(attempt_samples) // 2], 3)
        row_steal[name] = round(steal_frac, 4)
        row_load[name] = round(os.getloadavg()[0], 2)

    total = round(sum(timings.values()), 3)
    # loadavg + min/median spread let a reader discount a loaded-host
    # capture without re-running: a healthy capture has 1-min load ≈ the
    # bench's own parallelism and median/min ratios near 1; the r4 driver
    # artifact (30.7 s vs a clean 17 s replay) was only diagnosable by a
    # full re-run because these fields were missing
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "load_guard": load_guard,
                "load_wait_sec": int(waited),
                "queries_steal": row_steal,
                "queries_loadavg": row_load,
                "queries_steal_retries": row_retries,
                "steal_guard_max": max_steal,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
