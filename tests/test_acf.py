"""Autocorrelation function (operators/acf.py)."""

import datetime as dt
import math

import pytest

from tempo_spark import TSDF


def _mk(spark, vals, sym="a"):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (sym, base + dt.timedelta(seconds=i), None if v is None else float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "sym string, ts timestamp, v double")


def _py_acf(vals, lag):
    pairs = [
        (vals[i], vals[i + lag])
        for i in range(len(vals) - lag)
        if vals[i] is not None and vals[i + lag] is not None
    ]
    n = len(pairs)
    if n < 2:
        return None
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    return (n * sxy - sx * sy) / math.sqrt(vx * vy)


class TestAutocorr:
    def test_periodic_signal_peaks_at_period(self, spark):
        import random

        rng = random.Random(3)
        vals = [
            math.sin(2 * math.pi * i / 8) * 10 + rng.uniform(-0.5, 0.5)
            for i in range(200)
        ]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        got = {r.lag: r.acf for r in t.autocorr("v", 10).collect()}
        assert got[8] > 0.9          # period-8 signal
        assert got[4] < -0.9         # anti-phase at half period
        for lag in got:
            want = _py_acf([math.floor(v * 1e6 + 0.5) / 1e6 for v in vals], lag)
            # model uses the same quantized grid; exact-sum formula ~1e-12
            assert abs(got[lag] - want) < 1e-9

    def test_null_and_short_series(self, spark):
        vals = [1.0, None, 3.0, 4.0]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        rows = {r.lag: (r.n_pairs, r.acf) for r in t.autocorr("v", 3).collect()}
        # lag1 pairs: (3,4) only (nulls drop) -> n=1 -> NULL acf
        assert rows[1][0] == 1 and rows[1][1] is None
        # lag2 pairs: (1,3) -> n=1
        assert rows[2][0] == 1
        # constant series: zero variance -> NULL
        tc = TSDF(_mk(spark, [5.0] * 10, sym="c"), ts_col="ts", series_ids=["sym"])
        assert all(r.acf is None for r in tc.autocorr("v", 2).collect())

    def test_validations_and_plan(self, spark):
        from tempo_spark.plans.inspect import count_exchanges

        t = TSDF(_mk(spark, [1.0, 2.0, 3.0]), ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="lags"):
            t.autocorr("v", 0)
        with pytest.raises(ValueError, match="duplicate"):
            t.autocorr("v", [1, 1])
        with pytest.raises(ValueError, match="value_col"):
            t.autocorr("nope", 2)
        # one shuffle: groupBy(series, lag) reuses the window's exchange
        assert count_exchanges(t.autocorr("v", [1, 2, 5])) == 1

    def test_global_series(self, spark):
        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(base + dt.timedelta(seconds=i), float(i % 3)) for i in range(30)],
            "ts timestamp, v double",
        )
        t = TSDF(df, ts_col="ts", series_ids=[])
        got = {r.lag: r.acf for r in t.autocorr("v", 3).collect()}
        assert got[3] > 0.99 and sorted(got) == [1, 2, 3]


class TestCrossCorr:
    def test_shifted_signal_peaks_at_shift(self, spark):
        import random

        rng = random.Random(4)
        base_sig = [rng.uniform(-10, 10) for _ in range(120)]
        # y is x delayed by 3 observations (x leads y by 3)
        x = base_sig
        y = [0.0, 0.0, 0.0] + base_sig[:-3]
        base = dt.datetime(2024, 1, 1)
        rows = [
            ("a", base + dt.timedelta(seconds=i), x[i], y[i])
            for i in range(120)
        ]
        df = spark.createDataFrame(
            rows, "sym string, ts timestamp, x double, y double"
        )
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        got = {r.lag: r.ccf for r in t.crossCorr("x", "y", max_lag=5).collect()}
        assert sorted(got) == list(range(-5, 6))
        assert got[3] > 0.99                     # x leads y by 3
        assert all(abs(got[L]) < 0.5 for L in got if L != 3)

    def test_symmetry_with_autocorr(self, spark):
        """ccf(x, x, L) must equal acf(L) for positive L."""
        vals = [math.sin(i / 3.0) * 5 for i in range(60)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        acf = {r.lag: r.acf for r in t.autocorr("v", 4).collect()}
        ccf = {
            r.lag: r.ccf
            for r in t.crossCorr("v", "v", lags=[1, 2, 3, 4]).collect()
        }
        assert acf == ccf

    def test_validations(self, spark):
        t = TSDF(_mk(spark, [1.0, 2.0]), ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="max_lag"):
            t.crossCorr("v", "v", max_lag=-1)
        with pytest.raises(ValueError, match="duplicate"):
            t.crossCorr("v", "v", lags=[0, 0])
        with pytest.raises(ValueError, match="column"):
            t.crossCorr("v", "nope")


class TestLagStrategies:
    def test_join_strategy_matches_window(self, spark, monkeypatch):
        """Past LAG_WINDOW_MAX the pairs come from a position self-join —
        results must equal the window form exactly."""
        import random

        from tempo_spark.operators import acf as acf_mod

        rng = random.Random(6)
        vals = [rng.uniform(-5, 5) if rng.random() > 0.05 else None
                for _ in range(150)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        win = {(r.lag): (r.n_pairs, r.acf) for r in t.autocorr("v", 8).collect()}
        monkeypatch.setattr(acf_mod, "LAG_WINDOW_MAX", 0)
        jn = {(r.lag): (r.n_pairs, r.acf) for r in t.autocorr("v", 8).collect()}
        assert win == jn
        # ccf with negative lags through the join path too
        monkeypatch.undo()
        wcc = {r.lag: (r.n_pairs, r.ccf)
               for r in t.crossCorr("v", "v", max_lag=4).collect()}
        monkeypatch.setattr(acf_mod, "LAG_WINDOW_MAX", 0)
        jcc = {r.lag: (r.n_pairs, r.ccf)
               for r in t.crossCorr("v", "v", max_lag=4).collect()}
        assert wcc == jcc


def _py_pacf(acf_by_lag, K):
    """Durbin-Levinson over ACF values, left-to-right inner sums from 0.0
    (mirrors the operator's fold order exactly)."""
    r = acf_by_lag
    if r.get(1) is None:
        return [None] * K
    phi = [r[1]]
    out = [r[1]]
    for k in range(2, K + 1):
        if any(r.get(j) is None for j in range(1, k + 1)) or any(
            p is None for p in phi
        ):
            out.append(None)
            phi = [None] * k
            continue
        s = 0.0
        for j in range(1, k):
            s = s + phi[j - 1] * r[k - j]
        num = r[k] - s
        s = 0.0
        for j in range(1, k):
            s = s + phi[j - 1] * r[j]
        den = 1.0 - s
        kk = num / den if den != 0 else None
        if kk is None:
            out.append(None)
            phi = [None] * k
            continue
        phi = [phi[j - 1] - kk * phi[k - j - 1] for j in range(1, k)] + [kk]
        out.append(kk)
    return out


class TestPacf:
    def test_matches_durbin_levinson_bitexact(self, spark):
        import random

        rng = random.Random(7)
        x1 = x2 = 0.0
        vals = []
        for _ in range(300):
            x = 0.6 * x1 - 0.3 * x2 + rng.uniform(-1, 1)
            vals.append(x)
            x2, x1 = x1, x
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        acf = {r.lag: r.acf for r in t.autocorr("v", 6).collect()}
        got = {r.lag: r.pacf for r in t.pacf("v", 6).collect()}
        want = _py_pacf(acf, 6)
        for k in range(1, 7):
            assert got[k] == want[k - 1]  # bit-exact, fixed IEEE order
        # AR(2) signature: |pacf| large at 1-2, small after
        assert abs(got[1]) > 0.3 and abs(got[2]) > 0.15
        assert all(abs(got[k]) < 0.15 for k in (3, 4, 5, 6))

    def test_lag1_equals_acf1_and_single_lag(self, spark):
        vals = [float(i % 5) for i in range(40)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        acf1 = {r.lag: r.acf for r in t.autocorr("v", 1).collect()}[1]
        got = {r.lag: r.pacf for r in t.pacf("v", 1).collect()}
        assert list(got) == [1] and got[1] == acf1

    def test_null_acf_propagates(self, spark):
        # constant series: zero variance => every acf NULL => every pacf NULL
        t = TSDF(_mk(spark, [2.0] * 30), ts_col="ts", series_ids=["sym"])
        got = {r.lag: r.pacf for r in t.pacf("v", 4).collect()}
        assert got == {1: None, 2: None, 3: None, 4: None}
        # series shorter than the lag sweep: missing high lags => NULL there
        t2 = TSDF(_mk(spark, [1.0, 3.0, 2.0, 5.0]), ts_col="ts", series_ids=["sym"])
        got2 = {r.lag: r.pacf for r in t2.pacf("v", 6).collect()}
        assert len(got2) == 6 and got2[5] is None and got2[6] is None

    def test_no_series_empty_acf_emits_no_rows(self, spark):
        """A no-keys TSDF whose autocorr output is EMPTY must not
        fabricate all-NULL pacf rows (the global groupBy emits one row
        even over empty input — r11 review)."""
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), 1.0)], "ts timestamp, v double"
        )
        t = TSDF(df, ts_col="ts", series_ids=[])
        assert t.autocorr("v", 4).count() == 0  # 1 row: no complete pairs
        assert t.pacf("v", 4).count() == 0
        # and the healthy no-keys path still works
        df2 = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 0, 0, i), float(i % 3)) for i in range(12)],
            "ts timestamp, v double",
        )
        t2 = TSDF(df2, ts_col="ts", series_ids=[])
        assert t2.pacf("v", 3).count() == 3

    def test_validations_and_multiseries(self, spark):
        t = TSDF(_mk(spark, [1.0, 2.0]), ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="int"):
            t.pacf("v", [1, 2])
        with pytest.raises(ValueError, match="lags"):
            t.pacf("v", 0)
        import random

        rng = random.Random(3)
        rows = []
        base = dt.datetime(2024, 1, 1)
        series_vals = {}
        for sym in ("a", "b", None):
            vals = [rng.uniform(-2, 2) for _ in range(80)]
            series_vals[sym] = vals
            rows += [
                (sym, base + dt.timedelta(seconds=i), v)
                for i, v in enumerate(vals)
            ]
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t3 = TSDF(df, ts_col="ts", series_ids=["sym"])
        acf = {}
        for r in t3.autocorr("v", 3).collect():
            acf.setdefault(r.sym, {})[r.lag] = r.acf
        got = {}
        for r in t3.pacf("v", 3).collect():
            got.setdefault(r.sym, {})[r.lag] = r.pacf
        assert set(got) == {"a", "b", None}  # NULL series is a real series
        for sym in got:
            want = _py_pacf(acf[sym], 3)
            assert [got[sym][k] for k in (1, 2, 3)] == want


class TestStrategyParam:
    def test_pinned_strategies_match_and_validate(self, spark):
        import random

        rng = random.Random(11)
        vals = [rng.uniform(-3, 3) for _ in range(120)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        w = {r.lag: (r.n_pairs, r.acf)
             for r in t.autocorr("v", 6, strategy="window").collect()}
        j = {r.lag: (r.n_pairs, r.acf)
             for r in t.autocorr("v", 6, strategy="join").collect()}
        a = {r.lag: (r.n_pairs, r.acf)
             for r in t.autocorr("v", 6).collect()}
        assert w == j == a
        wc = {r.lag: r.ccf
              for r in t.crossCorr("v", "v", max_lag=2, strategy="join").collect()}
        ac = {r.lag: r.ccf for r in t.crossCorr("v", "v", max_lag=2).collect()}
        assert wc == ac
        with pytest.raises(ValueError, match="strategy"):
            t.autocorr("v", 3, strategy="hash")


class TestPairwiseCorr:
    def test_matches_per_pair_model_and_ccf_lag0(self, spark):
        import random

        rng = random.Random(13)
        base = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(150):
            a = rng.uniform(-2, 2)
            rows.append(
                ("s", base + dt.timedelta(seconds=i), a,
                 2 * a + rng.uniform(-0.1, 0.1),          # strongly +corr
                 None if i % 7 == 0 else rng.uniform(0, 1))  # noisy + nulls
            )
        df = spark.createDataFrame(
            rows, "sym string, ts timestamp, a double, b double, c double"
        )
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        got = {
            (r.x_col, r.y_col): (r.n_pairs, r.corr)
            for r in t.pairwiseCorr(["a", "b", "c"]).collect()
        }
        assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
        assert got[("a", "b")][0] == 150 and got[("a", "b")][1] > 0.99
        assert got[("a", "c")][0] == 128  # nulls excluded pairwise
        # module twin reference + pairwiseCorr(a, b) == crossCorr at lag 0
        from tempo_spark.operators.acf import pairwise_corr

        direct = {
            (r.x_col, r.y_col): (r.n_pairs, r.corr)
            for r in pairwise_corr(t, ["a", "b", "c"]).collect()
        }
        assert direct == got
        cc0 = {
            r.lag: (r.n_pairs, r.ccf)
            for r in t.crossCorr("a", "b", max_lag=0).collect()
        }[0]
        assert got[("a", "b")] == cc0

    def test_validations_and_null_series(self, spark):
        base = dt.datetime(2024, 1, 1)
        rows = [
            (sym, base + dt.timedelta(seconds=i), float(i), float(i * i))
            for sym in ("x", None)
            for i in range(10)
        ]
        df = spark.createDataFrame(
            rows, "sym string, ts timestamp, a double, b double"
        )
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        got = {r.sym: r.corr for r in t.pairwiseCorr(["a", "b"]).collect()}
        assert set(got) == {"x", None} and got["x"] == got[None]
        with pytest.raises(ValueError, match="metric_cols"):
            t.pairwiseCorr(["a"])
        with pytest.raises(ValueError, match="duplicate"):
            t.pairwiseCorr(["a", "a"])
        with pytest.raises(ValueError, match="column"):
            t.pairwiseCorr(["a", "zz"])
        # constant leg -> NULL corr, never divide-by-zero
        tc = TSDF(
            df.withColumn("b", F_lit_onehalf()), ts_col="ts", series_ids=["sym"]
        )
        assert all(
            r.corr is None for r in tc.pairwiseCorr(["a", "b"]).collect()
        )


def F_lit_onehalf():
    import pyspark.sql.functions as F

    return F.lit(0.5)


class TestSqlBuildQuoting:
    """r12 one-parse plan build: series/metric/output names with SQL
    metacharacters must round-trip through the quoted fragments and
    produce the same values as plain names (both _lagged_corr's window
    path and pairwise_corr render SQL text now)."""

    def test_quoted_names_match_plain(self, spark):
        import pyspark.sql.functions as F

        df = _mk(spark, [1, 4, 2, 8, 5, 7, None, 3, 6, 9])
        df = df.withColumn("w", F.col("v") * 2 + 1)
        t_plain = TSDF(df, ts_col="ts", series_ids=["sym"])
        odd = (
            df.withColumnRenamed("sym", "key col")
            .withColumnRenamed("v", "va`l")
            .withColumnRenamed("w", "w's")
        )
        t_odd = TSDF(odd, ts_col="ts", series_ids=["key col"])

        a = t_plain.autocorr("v", 3).orderBy("lag").collect()
        b = t_odd.autocorr("va`l", 3).orderBy("lag").collect()
        assert [(r.lag, r.n_pairs, r.acf) for r in a] == [
            (r.lag, r.n_pairs, r.acf) for r in b
        ]

        ca = t_plain.crossCorr("v", "w", 2).orderBy("lag").collect()
        cb = t_odd.crossCorr("va`l", "w's", 2).orderBy("lag").collect()
        assert [(r.lag, r.n_pairs, r.ccf) for r in ca] == [
            (r.lag, r.n_pairs, r.ccf) for r in cb
        ]

        pa = t_plain.pairwiseCorr(["v", "w"]).collect()
        pb = t_odd.pairwiseCorr(["va`l", "w's"]).collect()
        assert [(r.n_pairs, r.corr) for r in pa] == [
            (r.n_pairs, r.corr) for r in pb
        ]
        # the name-carrying literals survive quoting/escaping
        assert (pb[0].x_col, pb[0].y_col) == ("va`l", "w's")
