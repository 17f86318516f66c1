"""DSIR importance-resampling tests: model equality vs an exact Python
replica, hash-family parity, edge cases, Gumbel top-k determinism, and
plan-shape (broadcast ratio join, no extra shuffles)."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F
import pytest

from tempo_spark.pipeline.dsir import (
    dsir_logratio,
    fit_hashed_counts,
    sample_by_importance,
    with_importance_weight,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "quantum flux capacitor array"),
    (3, "the dog sat on the log"),
    (4, ""),
    (5, None),
    (6, "the the the"),
    (7, "THE Cat SAT"),  # case-folding
]
TARGET_IDS = {1, 3}
M = 64


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _grams(text, ngrams=(1, 2)):
    toks = text.lower().strip().split() if text and text.strip() else []
    out = []
    if 1 in ngrams:
        out += toks
    if 2 in ngrams:
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return out


def _model_weights(ngrams=(1, 2), alpha=1.0, agg="sum"):
    def counts(texts):
        c: dict[int, int] = {}
        for t in texts:
            for g in _grams(t, ngrams):
                b = _md5_32(g) % M
                c[b] = c.get(b, 0) + 1
        return c

    ct = counts([t for i, t in DOCS if i in TARGET_IDS])
    cr = counts([t for _, t in DOCS])
    tt, tr = sum(ct.values()), sum(cr.values())

    def lr(b):
        return math.log((ct.get(b, 0) + alpha) / (tt + alpha * M)) - math.log(
            (cr.get(b, 0) + alpha) / (tr + alpha * M)
        )

    exp = {}
    for did, txt in DOCS:
        gs = _grams(txt, ngrams)
        if not gs:
            exp[did] = None
        else:
            s = sum(lr(_md5_32(g) % M) for g in gs)
            exp[did] = s / len(gs) if agg == "mean" else s
    return exp


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _scored(docs_df, ngrams=(1, 2), agg="sum", hash_family="md5_32"):
    target = docs_df.where(F.col("doc_id").isin(list(TARGET_IDS)))
    t = fit_hashed_counts(target, buckets=M, ngrams=ngrams, hash_family=hash_family)
    r = fit_hashed_counts(docs_df, buckets=M, ngrams=ngrams, hash_family=hash_family)
    return with_importance_weight(
        docs_df,
        dsir_logratio(t, r),
        "doc_id",
        ngrams=ngrams,
        hash_family=hash_family,
        agg=agg,
    )


@pytest.mark.parametrize("ngrams,agg", [((1, 2), "sum"), ((1,), "sum"), ((2,), "sum"), ((1, 2), "mean")])
def test_weights_match_python_model(docs_df, ngrams, agg):
    got = {
        row["doc_id"]: row["dsir_logweight"]
        for row in _scored(docs_df, ngrams=ngrams, agg=agg).collect()
    }
    exp = _model_weights(ngrams=ngrams, agg=agg)
    assert set(got) == set(exp)
    for k in exp:
        if exp[k] is None:
            assert got[k] is None
        else:
            assert got[k] == pytest.approx(exp[k], abs=1e-9)


def test_xxhash64_family_runs_and_preserves_nulls(docs_df):
    got = {
        row["doc_id"]: row["dsir_logweight"]
        for row in _scored(docs_df, hash_family="xxhash64").collect()
    }
    assert got[4] is None and got[5] is None
    assert all(v is not None for k, v in got.items() if k not in (4, 5))


def test_target_docs_score_higher_than_offdomain(docs_df):
    got = {
        row["doc_id"]: row["dsir_logweight"]
        for row in _scored(docs_df).collect()
    }
    # in-domain (target) docs must out-score the off-domain doc 2
    assert got[1] > got[2] and got[3] > got[2]


def test_bucket_mismatch_raises_lazily(spark, docs_df):
    t = fit_hashed_counts(docs_df, buckets=32, hash_family="md5_32")
    r = fit_hashed_counts(docs_df, buckets=64, hash_family="md5_32")
    ratio = dsir_logratio(t, r)  # plan builds fine
    with pytest.raises(Exception, match="bucket counts differ"):
        ratio.collect()


def test_sample_by_importance_deterministic_topk(docs_df):
    scored = _scored(docs_df)
    s1 = sample_by_importance(scored, "doc_id", "dsir_logweight", k=3)
    s2 = sample_by_importance(scored, "doc_id", "dsir_logweight", k=3)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in s2.collect())
    assert ids1 == ids2 and len(ids1) == 3
    # null-weight rows (4, 5) never sample
    assert not ({4, 5} & set(ids1))
    # a different salt is an independent re-draw but still k rows
    s3 = sample_by_importance(scored, "doc_id", "dsir_logweight", k=3, salt="other")
    assert len(s3.collect()) == 3


def test_sample_low_temperature_is_argmax(docs_df):
    scored = _scored(docs_df)
    s = sample_by_importance(
        scored, "doc_id", "dsir_logweight", k=2, temperature=1e-9
    )
    got = {r["doc_id"] for r in s.collect()}
    w = {
        r["doc_id"]: r["dsir_logweight"]
        for r in scored.where("dsir_logweight is not null").collect()
    }
    top2 = set(sorted(w, key=w.get, reverse=True)[:2])
    assert got == top2


def test_fit_output_bounded_and_self_describing(docs_df):
    t = fit_hashed_counts(docs_df, buckets=M, hash_family="md5_32")
    rows = t.collect()
    assert 0 < len(rows) <= M
    assert all(r["__m"] == M for r in rows)
    assert all(0 <= r["__b"] < M for r in rows)


def test_scoring_plan_broadcasts_ratio(docs_df):
    scored = _scored(docs_df)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_scoring_persists_ratio_single_fit_execution(docs_df):
    """with_importance_weight references ratio_df twice (meta + bucket
    join); persist_model=True (default) caches the ≤m-row table so the
    fit chain executes once — both references read InMemoryTableScan
    (assert AFTER collect(), the round-4 AQE lesson)."""
    scored = _scored(docs_df)
    scored.collect()
    # the adaptive toString prints broadcast-stage subtrees in separate
    # sections — match both cache-read projections on the FULL string:
    # the meta reference reads (__lr0, __m), the bucket join (__b, __lr)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan [__lr0" in plan
    assert "InMemoryTableScan [__b" in plan
    # opt-out leaves the lineage uncached (clear first — the cache manager
    # matches by canonicalized plan, so part 1's persist would be found)
    docs_df.sparkSession.catalog.clearCache()
    target = docs_df.where(F.col("doc_id").isin(list(TARGET_IDS)))
    ratio = dsir_logratio(
        fit_hashed_counts(target, buckets=M, hash_family="md5_32"),
        fit_hashed_counts(docs_df, buckets=M, hash_family="md5_32"),
    )
    raw = with_importance_weight(
        docs_df, ratio, "doc_id", hash_family="md5_32", persist_model=False
    )
    raw.collect()
    p2 = raw._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in p2.split("== Initial Plan ==")[0]
    assert not ratio.is_cached


def test_param_validation(docs_df):
    with pytest.raises(ValueError, match="ngrams"):
        fit_hashed_counts(docs_df, ngrams=(3,))
    with pytest.raises(ValueError, match="buckets"):
        fit_hashed_counts(docs_df, buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        dsir_logratio(
            fit_hashed_counts(docs_df), fit_hashed_counts(docs_df), alpha=0
        )
    with pytest.raises(ValueError, match="already present"):
        with_importance_weight(
            docs_df.withColumn("dsir_logweight", F.lit(1.0)),
            dsir_logratio(fit_hashed_counts(docs_df), fit_hashed_counts(docs_df)),
            "doc_id",
        )
    with pytest.raises(ValueError, match="k must be positive"):
        sample_by_importance(docs_df, "doc_id", "doc_id", k=0)


def test_model_parquet_round_trip(docs_df, tmp_path, spark):
    """The shard-amortized path the module docstring promises: fit tables
    persisted to parquet, reloaded, and reused for scoring — weights and
    sampled ids identical to the in-memory chain, and the reloaded model
    is self-describing (a mismatched-bucket pair still fails lazily)."""
    target = docs_df.where(F.col("doc_id").isin(list(TARGET_IDS)))
    t = fit_hashed_counts(target, buckets=M, hash_family="md5_32")
    r = fit_hashed_counts(docs_df, buckets=M, hash_family="md5_32")
    t.write.parquet(str(tmp_path / "t"))
    r.write.parquet(str(tmp_path / "r"))
    t2 = spark.read.parquet(str(tmp_path / "t"))
    r2 = spark.read.parquet(str(tmp_path / "r"))

    # ratio table itself round-trips too (daily shards rescore against a
    # persisted ratio, not the raw fits)
    dsir_logratio(t2, r2).write.parquet(str(tmp_path / "ratio"))
    ratio2 = spark.read.parquet(str(tmp_path / "ratio"))

    mem = {
        row["doc_id"]: row["dsir_logweight"]
        for row in _scored(docs_df).collect()
    }
    for ratio in (dsir_logratio(t2, r2), ratio2):
        got = {
            row["doc_id"]: row["dsir_logweight"]
            for row in with_importance_weight(
                docs_df, ratio, "doc_id", hash_family="md5_32"
            ).collect()
        }
        assert set(got) == set(mem)
        for k in mem:
            if mem[k] is None:
                assert got[k] is None
            else:
                assert got[k] == pytest.approx(mem[k], abs=1e-12)

    # self-describing safety survives the round trip: a model fit with a
    # different bucket count refuses to pair
    bad = fit_hashed_counts(docs_df, buckets=M * 2, hash_family="md5_32")
    bad.write.parquet(str(tmp_path / "bad"))
    bad2 = spark.read.parquet(str(tmp_path / "bad"))
    with pytest.raises(Exception, match="bucket counts differ"):
        dsir_logratio(t2, bad2).collect()


def test_logratio_single_fit_evaluation(docs_df):
    """dsir_logratio computes corpus totals via a window over the joined
    fits — each fit lineage appears ONCE in the plan (the agg+crossJoin
    formulation ran every fit twice, i.e. four corpus scans per ratio)."""
    target = docs_df.where(F.col("doc_id").isin(list(TARGET_IDS)))
    t = fit_hashed_counts(target, buckets=M, hash_family="md5_32")
    r = fit_hashed_counts(docs_df, buckets=M, hash_family="md5_32")
    ratio = dsir_logratio(t, r)
    ratio.collect()  # materialize so AQE finalizes (round-4 lesson)
    plan = ratio._jdf.queryExecution().executedPlan().toString()
    # the adaptive toString repeats the tree (Final + Initial) — keep the
    # final section only
    plan = plan.split("== Initial Plan ==")[0]
    # one scan per fit: the docs lineage feeds the target fit and the raw
    # fit once each -> exactly 2 ExistingRDD scans in the whole plan
    assert plan.count("Scan ExistingRDD") == 2


class TestCorpusDivergence:
    def _model(self, texts_a, texts_b, buckets=64, alpha=1.0):
        import hashlib
        import math

        def bucket_counts(texts):
            from collections import Counter

            c = Counter()
            for t in texts:
                toks = t.lower().split()
                grams = toks + [
                    f"{a} {b}" for a, b in zip(toks, toks[1:])
                ]
                for g in grams:
                    h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                    c[h % buckets] += 1
            return c

        ca, cb = bucket_counts(texts_a), bucket_counts(texts_b)
        Ta, Tb = sum(ca.values()), sum(cb.values())
        kl_ab = kl_ba = js = 0.0
        for bkt in range(buckets):
            pa = (ca.get(bkt, 0) + alpha) / (Ta + alpha * buckets)
            pb = (cb.get(bkt, 0) + alpha) / (Tb + alpha * buckets)
            m = (pa + pb) / 2
            kl_ab += pa * math.log(pa / pb)
            kl_ba += pb * math.log(pb / pa)
            js += pa / 2 * math.log(pa / m) + pb / 2 * math.log(pb / m)
        return kl_ab, kl_ba, js

    def test_matches_model_and_properties(self, spark):
        import math

        from tempo_spark.pipeline.dsir import corpus_divergence, fit_hashed_counts

        texts_a = ["the cat sat on the mat", "dogs and cats", "the mat"]
        texts_b = ["quantum flux capacitor", "warp drive engaged", "the cat"]
        da = spark.createDataFrame([(t,) for t in texts_a], "text string")
        db = spark.createDataFrame([(t,) for t in texts_b], "text string")
        fa = fit_hashed_counts(da, buckets=64, hash_family="md5_32")
        fb = fit_hashed_counts(db, buckets=64, hash_family="md5_32")
        row = corpus_divergence(fa, fb).head()
        kl_ab, kl_ba, js = self._model(texts_a, texts_b)
        assert abs(row.kl_ab - kl_ab) < 1e-9
        assert abs(row.kl_ba - kl_ba) < 1e-9
        assert abs(row.js - js) < 1e-9
        assert 0 < row.js < math.log(2) + 1e-12
        # self-divergence is exactly zero
        same = corpus_divergence(fa, fa).head()
        assert abs(same.kl_ab) < 1e-12 and abs(same.js) < 1e-12

    def test_bucket_mismatch_raises(self, spark):
        import pytest

        from tempo_spark.pipeline.dsir import corpus_divergence, fit_hashed_counts

        d = spark.createDataFrame([("a b c",)], "text string")
        fa = fit_hashed_counts(d, buckets=64)
        fb = fit_hashed_counts(d, buckets=128)
        with pytest.raises(Exception, match="bucket-count mismatch"):
            corpus_divergence(fa, fb).collect()


class TestCorpusDivergenceRobustness:
    def test_empty_side_is_uniform_not_crash(self, spark):
        from tempo_spark.pipeline.dsir import corpus_divergence, fit_hashed_counts

        d = spark.createDataFrame([("a b c",)], "text string")
        empty = spark.createDataFrame([(None,)], "text string")
        fa = fit_hashed_counts(d, buckets=64)
        fe = fit_hashed_counts(empty, buckets=64)
        row = corpus_divergence(fa, fe).head()
        assert row.kl_ab is not None and row.js is not None and row.js > 0

    def test_both_empty_raises_clearly(self, spark):
        import pytest

        from tempo_spark.pipeline.dsir import corpus_divergence, fit_hashed_counts

        empty = spark.createDataFrame([(None,)], "text string")
        fe = fit_hashed_counts(empty, buckets=64)
        with pytest.raises(Exception, match="both fits empty|mismatch"):
            corpus_divergence(fe, fe).collect()

    def test_appended_model_equals_merged(self, spark):
        from tempo_spark.pipeline.dsir import corpus_divergence, fit_hashed_counts

        a1 = spark.createDataFrame([("the cat sat",)], "text string")
        a2 = spark.createDataFrame([("dogs and cats",)], "text string")
        both = a1.unionAll(a2)
        b = spark.createDataFrame([("quantum flux",)], "text string")
        fb = fit_hashed_counts(b, buckets=64, hash_family="md5_32")
        merged = corpus_divergence(
            fit_hashed_counts(both, buckets=64, hash_family="md5_32"), fb
        ).head()
        appended = corpus_divergence(
            fit_hashed_counts(a1, buckets=64, hash_family="md5_32").unionAll(
                fit_hashed_counts(a2, buckets=64, hash_family="md5_32")
            ),
            fb,
        ).head()
        assert abs(merged.js - appended.js) < 1e-12
        assert abs(merged.kl_ab - appended.kl_ab) < 1e-12
