"""Property-based tests: random inputs, algebraic invariants.

These cover the two algorithmically-hard operators — make_disjoint and the
as-of join — by checking invariants against brute-force Python models on
randomized inputs (the reference relies on hand-written goldens only;
SURVEY.md §5 notes the gap)."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tempo_spark import IntervalsDF, TSDF

BASE = dt.datetime(2020, 1, 1)


def minutes(m):
    return BASE + dt.timedelta(minutes=m)


interval_strategy = st.lists(
    st.tuples(
        st.integers(0, 30),          # start minute
        st.integers(1, 10),          # duration
        st.one_of(st.none(), st.integers(0, 5)),   # metric_1
        st.one_of(st.none(), st.integers(0, 5)),   # metric_2
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(interval_strategy)
def test_make_disjoint_invariants(spark, ivals):
    rows = [
        (minutes(s), minutes(s + d), "k", m1, m2) for (s, d, m1, m2) in ivals
    ]
    df = spark.createDataFrame(
        rows,
        "start_ts timestamp, end_ts timestamp, series_1 string, metric_1 int, metric_2 int",
    )
    out = (
        IntervalsDF(df, "start_ts", "end_ts", ["series_1"])
        .make_disjoint()
        .df.collect()
    )
    segs = sorted((r.start_ts, r.end_ts, r.metric_1, r.metric_2) for r in out)

    # 1. disjoint & ordered
    for (s1, e1, *_), (s2, e2, *_) in zip(segs, segs[1:]):
        assert e1 <= s2, f"overlap: {s1}-{e1} vs {s2}-{e2}"
    # 2. positive length
    assert all(s < e for s, e, *_ in segs)
    # 3. coverage: union of outputs == union of inputs (as point sets)
    def covered(point_sets, t):
        return any(s <= t < e for s, e in point_sets)

    in_spans = [(minutes(s), minutes(s + d)) for (s, d, *_i) in ivals]
    out_spans = [(s, e) for s, e, *_ in segs]
    probe_points = sorted({minutes(m) for m in range(0, 45)})
    for t in probe_points:
        assert covered(in_spans, t) == covered(out_spans, t), f"coverage differs at {t}"
    # 4. merge rule (reference kernel precedence, pinned by
    # tests/goldens/interval_kernel_tests.json): each output point's metric
    # equals the non-null metric of the (start asc, end desc)-first
    # covering input interval
    for s, e, m1, m2 in segs:
        mid = s  # segment start is inside the segment
        for mi, value in ((2, m1), (3, m2)):
            covering = [
                (minutes(st_), minutes(st_ + d), row[mi])
                for row, (st_, d, *_x) in zip(ivals, [(i[0], i[1]) for i in ivals])
                for st_, d in [(row[0], row[1])]
                if minutes(row[0]) <= mid < minutes(row[0] + row[1])
                and row[mi] is not None
            ]
            if covering:
                # ties on identical (start, end) boundaries are broken by
                # the larger value (struct max ordering) — deterministic,
                # where the reference's pandas kernel depends on input
                # row order
                expected = max(
                    covering,
                    key=lambda c: (-c[0].timestamp(), c[1].timestamp(), c[2]),
                )[2]
                assert value == expected, (
                    f"metric_{mi-1} at {mid}: got {value}, expected {expected}"
                )
            else:
                assert value is None


asof_strategy = st.tuples(
    st.lists(st.integers(0, 100), min_size=1, max_size=12, unique=True),  # left ts
    st.lists(st.integers(0, 100), min_size=0, max_size=12, unique=True),  # right ts
)


@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(asof_strategy)
def test_asof_join_matches_bruteforce(spark, data):
    left_ts, right_ts = data
    left = spark.createDataFrame(
        [("k", minutes(m), float(m)) for m in left_ts],
        "sym string, event_ts timestamp, v double",
    )
    right = spark.createDataFrame(
        [("k", minutes(m), float(m) * 10) for m in right_ts],
        "sym string, event_ts timestamp, q double",
    ) if right_ts else spark.createDataFrame([], "sym string, event_ts timestamp, q double")

    lt = TSDF(left, ts_col="event_ts", series_ids=["sym"])
    rt = TSDF(right, ts_col="event_ts", series_ids=["sym"])
    out = lt.asofJoin(rt, left_prefix="l").df.collect()

    got = {r.l_event_ts: r.right_q for r in out}
    assert len(got) == len(left_ts)
    for m in left_ts:
        eligible = [r for r in right_ts if r <= m]
        expected = max(eligible) * 10.0 if eligible else None
        assert got[minutes(m)] == expected, f"left={m}: {got[minutes(m)]} != {expected}"


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 100)),
        min_size=2, max_size=15, unique_by=lambda t: t[0],
    )
)
def test_interpolation_linear_matches_model(spark, points):
    """Linear interpolation on a 1-minute grid equals the closed-form line
    between neighboring known buckets."""
    rows = [("k", minutes(m), float(v)) for m, v in points]
    df = spark.createDataFrame(rows, "sym string, event_ts timestamp, v double")
    t = TSDF(df, ts_col="event_ts", series_ids=["sym"])
    out = t.interpolate("linear", freq="1 minute", func="mean").df.collect()

    known = sorted((m, float(v)) for m, v in points)
    lo, hi = known[0][0], known[-1][0]
    got = {r.event_ts: r.v for r in out}
    assert set(got) == {minutes(m) for m in range(lo, hi + 1)}
    for m in range(lo, hi + 1):
        prevs = [(km, kv) for km, kv in known if km <= m]
        nexts = [(km, kv) for km, kv in known if km >= m]
        if any(km == m for km, _ in known):
            expected = dict(known)[m]
        else:
            pm, pv = prevs[-1]
            nm, nv = nexts[0]
            expected = pv + (nv - pv) * (m - pm) / (nm - pm)
        assert got[minutes(m)] == pytest.approx(expected), f"minute {m}"


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(asof_strategy)
def test_skew_asof_matches_default_with_covering_bracket(spark, data):
    """With a bracket larger than the data span (plus 50% overlap), the
    time-partitioned as-of path must equal the default union-window path."""
    left_ts, right_ts = data
    left = spark.createDataFrame(
        [("k", minutes(m), float(m)) for m in left_ts],
        "sym string, event_ts timestamp, v double",
    )
    right = spark.createDataFrame(
        [("k", minutes(m), float(m) * 10) for m in right_ts],
        "sym string, event_ts timestamp, q double",
    ) if right_ts else spark.createDataFrame([], "sym string, event_ts timestamp, q double")

    lt = TSDF(left, ts_col="event_ts", series_ids=["sym"])
    rt = TSDF(right, ts_col="event_ts", series_ids=["sym"])
    default = {
        (r.l_event_ts, r.right_q)
        for r in lt.asofJoin(rt, left_prefix="l").df.collect()
    }
    skew = {
        (r.l_event_ts, r.right_q)
        for r in lt.asofJoin(
            rt, left_prefix="l", tsPartitionVal=14 * 86400, fraction=0.9
        ).df.collect()
    }
    assert skew == default


range_stats_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),                                   # series id
        st.integers(0, 2000),                                # ts offset sec
        st.one_of(st.none(), st.integers(-1000, 1000)),      # value (or null)
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(range_stats_strategy, st.integers(1, 900))
def test_range_stats_prefix_matches_sliding(spark, rows, back_secs):
    """strategy='prefix' (growing-frame differences) must agree with the
    reference-exact sliding strategy on arbitrary data, frames, nulls, and
    duplicate timestamps — to 6 decimals."""
    import math

    data = [(uid, minutes(0) + dt.timedelta(seconds=s),
             float(v) / 7 if v is not None else None)
            for uid, s, v in rows]
    df = spark.createDataFrame(data, "uid long, ts timestamp, v double")
    t = TSDF(df, ts_col="ts", series_ids=["uid"])

    def canon(frame):
        cols = sorted(frame.columns)
        out = []
        for r in frame.select(*cols).collect():
            out.append(tuple(
                ("NaN" if math.isnan(x) else round(x, 6))
                if isinstance(x, float) else x
                for x in r
            ))
        return sorted(out, key=str)

    sliding = canon(t.withRangeStats(rangeBackWindowSecs=back_secs).df)
    prefix = canon(
        t.withRangeStats(rangeBackWindowSecs=back_secs, strategy="prefix").df
    )
    assert sliding == prefix
    # block-decomposed min/max (skew-safe O(n) path) must be exact too
    block = canon(
        t.withRangeStats(
            rangeBackWindowSecs=back_secs,
            strategy="prefix",
            minmax_strategy="block",
        ).df
    )
    assert sliding == block


def test_block_minmax_pre_1970_epochs(spark):
    """Negative epoch microseconds: block ids use pmod-floor division
    (plain `div` truncates toward zero and misbuckets pre-1970 rows)."""
    rows = [
        ("k", dt.datetime(1969, 12, 31, 23, 58, s), float(v))
        for s, v in [(0, 5.0), (30, 1.0), (50, 9.0)]
    ] + [("k", dt.datetime(1970, 1, 1, 0, 0, 20), 3.0)]
    df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
    t = TSDF(df, ts_col="ts", series_ids=["sym"])
    sliding = sorted(
        (r.ts, r.min_v, r.max_v)
        for r in t.withRangeStats(
            colsToSummarize=["v"], rangeBackWindowSecs=60, stats=("min", "max")
        ).df.toDF("sym", "ts", "v", "min_v", "max_v").collect()
    )
    block = sorted(
        (r.ts, r.min_v, r.max_v)
        for r in t.withRangeStats(
            colsToSummarize=["v"], rangeBackWindowSecs=60,
            strategy="prefix", stats=("min", "max"), minmax_strategy="block",
        ).df.toDF("sym", "ts", "v", "min_v", "max_v").collect()
    )
    assert sliding == block


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet="ab xyz0", max_size=12)),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
def test_split_matches_python_md5_model(spark, keys):
    """with_split(md5_32) against a pure-Python md5 model on arbitrary
    (including null/empty/whitespace) string keys."""
    import hashlib

    from tempo_spark.pipeline.sampling import SPLIT_BUCKETS, with_split

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    w = {"train": 0.6, "val": 0.2, "test": 0.2}
    got = {r.k: r.split for r in with_split(df, "k", weights=w, hash_family="md5_32").collect()}

    def model(k):
        s = "split:" + (k if k is not None else "\x00null")
        b = int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % SPLIT_BUCKETS
        if b < int(round(0.6 * SPLIT_BUCKETS)):
            return "train"
        if b < int(round(0.8 * SPLIT_BUCKETS)):
            return "val"
        return "test"

    assert got == {k: model(k) for k in keys}


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=10),
    st.integers(1, 4),
)
def test_repetition_metrics_match_python_model(spark, texts, n):
    import math

    from tempo_spark.pipeline.text import with_repetition_metrics

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = {
        r.doc_id: (r[f"n_{n}grams"], r[f"n_{n}grams_distinct"], r[f"dup_{n}gram_frac"])
        for r in with_repetition_metrics(df, n=n).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split()
        grams = [" ".join(toks[j : j + n]) for j in range(max(len(toks) - n + 1, 0))]
        frac = 1 - len(set(grams)) / len(grams) if grams else 0.0
        assert out[i] == (len(grams), len(set(grams)), math.floor(frac * 1e6 + 0.5) / 1e6)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.text(alphabet="abc ", min_size=0, max_size=40), min_size=2, max_size=10),
    st.integers(1, 4),
)
def test_incremental_near_dedup_equals_batch_cross_pairs(spark, texts, split_at):
    """near_dedup_against_corpus on (shard, corpus) must emit exactly the
    cross-boundary pairs of a full minhash_dedup over the union — the
    incremental formulation is a plan optimization, never a semantic one."""
    from tempo_spark.pipeline.dedup import minhash_dedup, near_dedup_against_corpus

    split_at = min(split_at, len(texts) - 1)
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    corpus = df.where(f"doc_id < {split_at}")
    shard = df.where(f"doc_id >= {split_at}")
    kw = dict(num_hashes=8, bands=4, shingle_k=2, threshold=0.3, use_words=True)
    inc = {
        (r.doc_id, r.corpus_id, r.jaccard)
        for r in near_dedup_against_corpus(
            shard, corpus, "doc_id", mode="pairs", **kw
        ).collect()
    }
    full = minhash_dedup(df, "doc_id", "text", **kw).collect()
    cross = {
        (r.id_b, r.id_a, r.jaccard)
        for r in full
        if r.id_a < split_at <= r.id_b
    }
    assert inc == cross


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=8),
    st.integers(1, 3),
)
def test_ngram_char_fracs_match_python_model(spark, texts, n):
    import math
    from collections import Counter

    from tempo_spark.pipeline.text import with_ngram_char_fracs

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = {
        r.doc_id: (r[f"top_{n}gram_char_frac"], r[f"dup_{n}gram_char_frac"])
        for r in with_ngram_char_fracs(df, "doc_id", n=n).collect()
    }
    h = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    for i, t in enumerate(texts):
        toks = t.split()
        grams = [" ".join(toks[j : j + n]) for j in range(max(len(toks) - n + 1, 0))]
        if not grams:
            assert out[i] == (0.0, 0.0)
            continue
        c = Counter(grams)
        top = max(c.items(), key=lambda kv: (kv[1], kv[1] * len(kv[0])))
        want = (
            h(top[1] * len(top[0]) / len(t)),
            h(sum(cnt * len(g) for g, cnt in c.items() if cnt > 1) / len(t)),
        )
        assert out[i] == want, (i, t)


# --------------------------------------------------------- round-5 operators


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(interval_strategy, interval_strategy, st.integers(60, 600))
def test_join_intervals_binned_matches_plain_and_model(spark, livals, rivals, bin_secs):
    """Binned overlap join == plain overlap join == python brute force,
    for random interval sets and random bin widths."""
    schema = "start_ts timestamp, end_ts timestamp, series_1 string, metric_1 int, metric_2 int"
    ldf = spark.createDataFrame(
        [(minutes(s), minutes(s + d), "k", m1, m2) for (s, d, m1, m2) in livals], schema
    )
    rdf = spark.createDataFrame(
        [(minutes(s), minutes(s + d), "k", m1, m2) for (s, d, m1, m2) in rivals], schema
    )
    left = IntervalsDF(ldf, "start_ts", "end_ts", ["series_1"])
    right = IntervalsDF(rdf, "start_ts", "end_ts", ["series_1"])
    key = lambda r: tuple(str(v) for v in r)
    plain = sorted(map(key, left.join_intervals(right).df.collect()))
    binned = sorted(
        map(key, left.join_intervals(right, bin_seconds=float(bin_secs)).df.collect())
    )
    assert plain == binned
    # python model: count overlapping pairs
    model = sum(
        1
        for (ls, ld, *_a) in livals
        for (rs, rd, *_b) in rivals
        if ls < rs + rd and ls + ld > rs
    )
    assert len(plain) == model


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 40), st.integers(0, 5)),
        min_size=1, max_size=12,
    ),
    st.integers(10, 400),
)
def test_asof_binned_range_join_matches_union_window(spark, data, bin_secs):
    """range_join_bin_seconds == union-window (skipNulls=False framing) on
    random left/right timelines and random bin widths."""
    lrows = [("k", minutes(s), float(v)) for (s, _d, v) in data]
    rrows = [("k", minutes(s + d), float(v * 10)) for (s, d, v) in data]
    left = TSDF(
        spark.createDataFrame(lrows, "k string, ts timestamp, v double"),
        ts_col="ts", series_ids=["k"],
    )
    right = TSDF(
        spark.createDataFrame(rrows, "k string, ts timestamp, q double")
        .groupBy("k", "ts").agg(__import__("pyspark.sql.functions", fromlist=["max"]).max("q").alias("q")),
        ts_col="ts", series_ids=["k"],
    )
    key = lambda r: (str(r.l_ts), r.l_v, None if r.right_ts is None else str(r.right_ts), r.right_q)
    plain = sorted(map(key, left.asofJoin(right, left_prefix="l", skipNulls=False).df.collect()))
    binned = sorted(map(key, left.asofJoin(
        right, left_prefix="l", sql_join_opt=True,
        range_join_bin_seconds=float(bin_secs),
    ).df.collect()))
    assert plain == binned


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1, max_size=6).map(" ".join),
    st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=6).map(" ".join), min_size=1, max_size=6),
)
def test_dedup_paragraphs_model_and_idempotent(spark, first, rest):
    """dedup_paragraphs (word granularity) == python keep-first model, and
    running it twice changes nothing (idempotence)."""
    texts = [first] + rest
    rows = [(i, t) for i, t in enumerate(texts) if t]
    if not rows:
        return
    from tempo_spark.pipeline.dedup import dedup_paragraphs

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in dedup_paragraphs(df, "doc_id", sep=" ").collect()}
    # python model
    seen = set()
    for i, t in rows:
        kept = []
        for w in t.split(" "):
            if w not in seen:
                seen.add(w)
                kept.append(w)
        assert out[i] == " ".join(kept), (i, t)
    # idempotence
    again = spark.createDataFrame([(i, out[i]) for i, _ in rows], "doc_id long, text string")
    out2 = {r.doc_id: r.text for r in dedup_paragraphs(again, "doc_id", sep=" ").collect()}
    assert out2 == out


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(1, 50)), min_size=3, max_size=40),
)
def test_mix_rates_waterfill_invariants(spark, rows):
    """mix_rates: bottleneck group rate == 1, all rates in (0, 1], and
    rate_g * avail_g proportional to the target shares."""
    from tempo_spark.pipeline.sampling import mix_rates

    df = spark.createDataFrame(
        [(i, g, n) for i, (g, n) in enumerate(rows)],
        "doc_id long, src string, n_tokens int",
    )
    shares = {"a": 0.5, "b": 0.3, "c": 0.2}
    present = {g for g, _ in rows}
    got = {r.src: r.mix_rate for r in mix_rates(df, "src", shares, token_col="n_tokens").collect()}
    assert set(got) == present
    assert all(0 < v <= 1.0 for v in got.values())
    assert any(v == 1.0 for v in got.values())  # the bottleneck keeps everything
    avail = {g: sum(n for gg, n in rows if gg == g) for g in present}
    bottleneck = min(avail[x] / shares[x] for x in present)
    for g in present:
        if got[g] < 1.0:
            # every downsampled group's expected output mass hits the
            # target share exactly (the bottleneck group may undershoot)
            assert got[g] * avail[g] == pytest.approx(
                shares[g] * bottleneck, rel=1e-9
            )


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(interval_strategy, interval_strategy)
def test_coverage_algebra_pointwise_model(spark, aivals, bivals):
    """subtract/intersect against the pointwise set model: a minute t is
    covered by (A - B) iff covered by A and not B; by (A ∩ B) iff both.
    Outputs must also be disjoint."""
    schema = "start_ts timestamp, end_ts timestamp, series_1 string, metric_1 int, metric_2 int"
    mk = lambda ivals: IntervalsDF(
        spark.createDataFrame(
            [(minutes(s), minutes(s + d), "k", m1, m2) for (s, d, m1, m2) in ivals],
            schema,
        ),
        "start_ts", "end_ts", ["series_1"],
    )
    A, B = mk(aivals), mk(bivals)

    def spans(out):
        rows = sorted((r.start_ts, r.end_ts) for r in out.df.collect())
        for (s1, e1), (s2, e2) in zip(rows, rows[1:]):
            assert e1 <= s2, "overlapping output"
        return rows

    sub = spans(A.subtract_intervals(B))
    inter = spans(A.intersect_intervals(B))

    def covered(ivals, t):
        return any(s <= t < s + d for (s, d, *_x) in ivals)

    def covered_out(rows, t):
        tt = minutes(t)
        return any(s <= tt < e for s, e in rows)

    for t in range(0, 45):
        in_a, in_b = covered(aivals, t), covered(bivals, t)
        assert covered_out(sub, t) == (in_a and not in_b), t
        assert covered_out(inter, t) == (in_a and in_b), t


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 100), min_size=1, max_size=10, unique=True),
    st.lists(st.integers(0, 100), min_size=0, max_size=10, unique=True),
    st.lists(st.integers(0, 100), min_size=0, max_size=10, unique=True),
    st.booleans(),
)
def test_asof_join_many_matches_chained(spark, left_ts, r1_ts, r2_ts, exact):
    """asofJoinMany == the chain of single asofJoins, for random timelines
    and both exact-match modes."""
    mk = lambda ts_list, col: spark.createDataFrame(
        [("k", minutes(m), float(m)) for m in ts_list], f"sym string, event_ts timestamp, {col} double"
    ) if ts_list else spark.createDataFrame([], f"sym string, event_ts timestamp, {col} double")
    lt = TSDF(mk(left_ts, "v"), ts_col="event_ts", series_ids=["sym"])
    r1 = TSDF(mk(r1_ts, "q"), ts_col="event_ts", series_ids=["sym"])
    r2 = TSDF(mk(r2_ts, "s"), ts_col="event_ts", series_ids=["sym"])
    many = lt.asofJoinMany({"a": r1, "b": r2}, allowExactMatches=exact).df
    chained = (
        lt.asofJoin(r1, right_prefix="a", allowExactMatches=exact)
        .asofJoin(r2, right_prefix="b", allowExactMatches=exact)
        .df
    )
    key = lambda r: (str(r.event_ts), r.v,
                     None if r.a_event_ts is None else str(r.a_event_ts), r.a_q,
                     None if r.b_event_ts is None else str(r.b_event_ts), r.b_s)
    assert sorted(map(key, many.collect())) == sorted(map(key, chained.collect()))


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-5, 5)),  # id (null sorts first)
            st.integers(0, 6),                         # position
            st.integers(0, 3),                         # gram-key bucket
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(1, 3),
)
def test_first_occurrence_encoded_matches_model(spark, rows, min_count):
    """The decimal-encoded winner aggregate (r8) == a brute-force python
    model of lexicographic (id, pos) min with null-id-first ordering, for
    random multisets including negative and NULL ids."""
    from tempo_spark.pipeline.dedup import _first_occurrence

    df = spark.createDataFrame(
        [(k, i, p) for (i, p, k) in rows], "gk int, the_id long, __pos int"
    )
    winners, is_winner = _first_occurrence(df, "gk", "the_id", min_count)
    nskey = lambda t: (t[0], t[1] is not None, t[1] or 0, t[2])
    flagged = sorted(
        (
            (r["gk"], r["the_id"], r["__pos"])
            for r in df.join(winners, "gk").where(~is_winner).collect()
        ),
        key=nskey,
    )
    # model: per gram key with >= min_count occurrences, every occurrence
    # except the (null-first id, pos)-lexicographic minimum is flagged
    from collections import defaultdict

    occ = defaultdict(list)
    for i, p, k in rows:
        occ[k].append((i, p))
    expect = []
    for k, vals in occ.items():
        if len(vals) < min_count:
            continue
        w = min(vals, key=lambda t: (t[0] is not None, t[0] or 0, t[1]))
        expect.extend((k, i, p) for (i, p) in vals if (i, p) != w)
    assert flagged == sorted(expect, key=nskey)


@settings(deadline=None, max_examples=60)
@given(
    st.lists(
        st.lists(
            st.floats(-100, 100, allow_nan=False, allow_infinity=False),
            min_size=3, max_size=3,
        ),
        min_size=1, max_size=40,
    ),
    st.integers(1, 6),
    st.integers(0, 2**31 - 1),
)
def test_local_lloyd_invariants(vecs, k, seed):
    """r9 k-means++ _local_lloyd over random fit sets: returns exactly k
    finite centers whenever the sample is big enough (including
    duplicate-heavy sets where the zero-mass fallback engages), raises
    cleanly otherwise, and is deterministic given (sample order, seed).
    Pure python+numpy — no Spark session needed."""
    import math

    import pytest as _pytest

    from tempo_spark.pipeline.similarity import _local_lloyd

    if len(vecs) < k:
        with _pytest.raises(ValueError, match="usable rows < k"):
            _local_lloyd(vecs, k, seed, 3)
        return
    a = _local_lloyd(vecs, k, seed, 3)
    b = _local_lloyd(vecs, k, seed, 3)
    assert a == b
    assert len(a) == k
    assert all(len(c) == 3 and all(math.isfinite(x) for x in c) for c in a)
    # every center lies inside the sample's bounding box (means of members
    # or an original seed point — never extrapolated)
    for d in range(3):
        lo = min(v[d] for v in vecs)
        hi = max(v[d] for v in vecs)
        assert all(lo - 1e-9 <= c[d] <= hi + 1e-9 for c in a)


# ------------------------------------------------------ r9-cont additions

@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 40), min_size=1, max_size=25),
    st.integers(1, 200),
)
def test_take_token_budget_greedy_invariants(spark, tok_counts, budget):
    """The kept set is a PREFIX of the hash order: monotone in budget,
    exact greedy semantics vs a python replay, and decomposition-
    granularity invariant."""
    import hashlib

    from tempo_spark.pipeline.sampling import take_token_budget

    rows = [(i, " ".join(f"w{j}" for j in range(c)) if c else None)
            for i, c in enumerate(tok_counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r.doc_id
        for r in take_token_budget(
            df, budget, id_col="doc_id", hash_family="md5_32",
            n_buckets_bits=3,
        ).collect()
    )

    def md5h(i):
        return int(hashlib.md5(f"budget:{i}".encode()).hexdigest()[:8], 16)

    order = sorted(range(len(tok_counts)), key=lambda i: (md5h(i), i))
    want, cum = [], 0
    for i in order:
        if cum < budget:
            want.append(i)
        cum += tok_counts[i]
    assert kept == sorted(want)
    # monotone: doubling the budget keeps a superset
    kept2 = sorted(
        r.doc_id
        for r in take_token_budget(
            df, budget * 2, id_col="doc_id", hash_family="md5_32"
        ).collect()
    )
    assert set(kept) <= set(kept2)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1, max_size=20,
    )
)
def test_pagerank_exact_scale_model_parity(spark, edges):
    """Random small multigraphs: the integer fixpoint equals a python
    replay exactly, and total scaled mass never exceeds S."""
    from collections import Counter

    from tempo_spark.pipeline.graph import pagerank

    edf = spark.createDataFrame(edges, "src long, dst long")
    S = 10**10
    got = {
        r.id: r.rank_scaled
        for r in pagerank(edf, iters=6, exact_scale=S).collect()
    }
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    deg = Counter(u for u, _ in edges)
    r = {v: S // n for v in nodes}
    base = (S * 3) // (20 * n)
    for _ in range(6):
        dm = sum(r[v] for v in nodes if deg[v] == 0)
        inc = {v: 0 for v in nodes}
        for u, v in edges:
            inc[v] += r[u] // deg[u]
        r = {v: base + (17 * (inc[v] + dm // n)) // 20 for v in nodes}
    assert got == r
    assert sum(got.values()) <= S


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 120), st.integers(1, 90)),
        min_size=1, max_size=12,
    ),
    st.sampled_from(["10 minutes", "30 minutes", "1 hour"]),
)
def test_coverage_by_bucket_matches_minute_model(spark, ivals, freq):
    """Random overlapping minute-grain intervals: per-bucket coverage
    equals a brute-force minute-marking model."""
    from tempo_spark import IntervalsDF

    rows = [
        ("A", minutes(s), minutes(s + d), 1.0) for s, d in ivals
    ]
    idf = IntervalsDF(
        spark.createDataFrame(
            rows, "sym string, start_ts timestamp, end_ts timestamp, v double"
        ),
        "start_ts", "end_ts", ["sym"],
    )
    got = {
        r.bucket_ts: r.covered_micros
        for r in idf.coverage_by_bucket(freq).collect()
    }
    gmin = {"10 minutes": 10, "30 minutes": 30, "1 hour": 60}[freq]
    covered = set()
    for s, d in ivals:
        covered.update(range(s, s + d))
    want = {}
    for m in covered:
        b = (m // gmin) * gmin
        want[minutes(b)] = want.get(minutes(b), 0) + 60_000_000
    assert got == want
