"""Baseline forecasts (operators/forecast.py)."""

import datetime as dt

import pytest

from tempo_spark import TSDF


def _mk(spark, vals, sym="a"):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (sym, base + dt.timedelta(minutes=i), None if v is None else float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "sym string, ts timestamp, v double")


class TestForecastNaive:
    def test_last_drift_seasonal(self, spark):
        vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        base = dt.datetime(2024, 1, 1)
        last_ts = base + dt.timedelta(minutes=7)

        fl = {r.h: (r.ts, r.yhat)
              for r in t.forecast_naive("v", 3, "1 minute").collect()}
        assert fl[1] == (last_ts + dt.timedelta(minutes=1), 8.0)
        assert fl[3] == (last_ts + dt.timedelta(minutes=3), 8.0)

        fd = {r.h: r.yhat
              for r in t.forecast_naive("v", 3, "1 minute", method="drift").collect()}
        # slope = (8-1)/7 = 1 exactly
        assert fd == {1: 9.0, 2: 10.0, 3: 11.0}

        fs = {r.h: r.yhat
              for r in t.forecast_naive(
                  "v", 5, "1 minute", method="seasonal", period=4
              ).collect()}
        # last cycle = [5,6,7,8]; h=1..5 -> 5,6,7,8,5
        assert fs == {1: 5.0, 2: 6.0, 3: 7.0, 4: 8.0, 5: 5.0}

    def test_nulls_short_series_and_validations(self, spark):
        vals = [None, 4.0]  # one usable row
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        fl = t.forecast_naive("v", 2, "30 seconds").collect()
        assert all(r.yhat == 4.0 for r in fl)  # anchors on observed rows
        # drift needs n >= 2 usable: NULL yhat but spine emitted
        fd = t.forecast_naive("v", 2, "30 seconds", method="drift").collect()
        assert len(fd) == 2 and all(r.yhat is None for r in fd)
        # seasonal needs a full cycle
        fs = t.forecast_naive(
            "v", 2, "30 seconds", method="seasonal", period=4
        ).collect()
        assert len(fs) == 2 and all(r.yhat is None for r in fs)
        with pytest.raises(ValueError, match="method"):
            t.forecast_naive("v", 2, "1 minute", method="ets")
        with pytest.raises(ValueError, match="horizon"):
            t.forecast_naive("v", 0, "1 minute")
        with pytest.raises(ValueError, match="period"):
            t.forecast_naive("v", 2, "1 minute", method="seasonal")
        with pytest.raises(ValueError, match="period"):
            t.forecast_naive("v", 2, "1 minute", method="last", period=3)
        with pytest.raises(ValueError, match="value_col"):
            t.forecast_naive("zz", 2, "1 minute")

    def test_multiseries_null_key_and_no_keys(self, spark):
        base = dt.datetime(2024, 1, 1)
        rows = [
            (sym, base + dt.timedelta(minutes=i), float(i + 1))
            for sym in ("a", None)
            for i in range(5)
        ]
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        got = {}
        for r in t.forecast_naive("v", 2, "1 minute", method="drift").collect():
            got.setdefault(r.sym, {})[r.h] = r.yhat
        assert set(got) == {"a", None} and got["a"] == got[None]
        assert got["a"][2] == 7.0  # 5 + 2*(5-1)/4
        tg = TSDF(df.drop("sym"), ts_col="ts", series_ids=[])
        out = tg.forecast_naive("v", 3, "1 minute")
        assert out.count() == 3 and "sym" not in out.columns
        # module twin
        from tempo_spark.operators.forecast import forecast_naive

        assert forecast_naive(tg, "v", 3, "1 minute").count() == 3


def _ets_model(vals, horizon, method, alpha, beta=None, gamma=None,
               period=None):
    """Textbook ETS recursion in plain python over the full tail."""
    y = [float(v) for v in vals]
    if method == "ses":
        l = y[0]
        for v in y[1:]:
            l = alpha * v + (1 - alpha) * l
        return [l] * horizon
    if method == "holt":
        l, b = y[0], y[1] - y[0]
        for v in y[1:]:
            l_new = alpha * v + (1 - alpha) * (l + b)
            b = beta * (l_new - l) + (1 - beta) * b
            l = l_new
        return [l + h * b for h in range(1, horizon + 1)]
    m = period
    l = sum(y[:m]) / m
    b = sum(y[m + i] - y[i] for i in range(m)) / (m * m)
    s = [y[i] - l for i in range(m)]
    for t in range(m, len(y)):
        slot = t % m
        l_new = alpha * (y[t] - s[slot]) + (1 - alpha) * (l + b)
        b_new = beta * (l_new - l) + (1 - beta) * b
        s[slot] = gamma * (y[t] - l - b) + (1 - gamma) * s[slot]
        l, b = l_new, b_new
    W = len(y)
    return [
        l + h * b + s[(W + h - 1) % m] for h in range(1, horizon + 1)
    ]


class TestForecastETS:
    def test_ses_holt_hw_match_python_model(self, spark):
        # irregular but deterministic values; fit_window == series length
        vals = [3.0, 1.5, 4.25, 2.0, 5.5, 3.75, 6.0, 2.25,
                7.5, 4.0, 8.25, 5.0, 9.0, 6.5, 10.25, 7.0]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        for method, kw in (
            ("ses", dict(alpha=0.4)),
            ("holt", dict(alpha=0.5, beta=0.2)),
            ("hw_add", dict(alpha=0.3, beta=0.1, gamma=0.2, period=4)),
        ):
            got = {
                r.h: r.yhat
                for r in t.forecast_ets(
                    "v", 5, "1 minute", method=method,
                    fit_window=len(vals), **kw
                ).collect()
            }
            want = _ets_model(vals, 5, method, **kw)
            for h in range(1, 6):
                assert got[h] == pytest.approx(want[h - 1], rel=1e-9), (
                    method, h)

    def test_truncation_uses_exactly_last_w(self, spark):
        # a huge head value outside the window must not affect the fit
        vals = [1e6] + [2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        got = {r.h: r.yhat
               for r in t.forecast_ets(
                   "v", 2, "1 minute", alpha=0.5, fit_window=8
               ).collect()}
        want = _ets_model(vals[1:], 2, "ses", alpha=0.5)
        assert got[1] == pytest.approx(want[0], rel=1e-12)

    def test_short_series_null_yhat_spine_emitted(self, spark):
        vals = [None, 4.0, 5.0]  # 2 usable < fit_window=4
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        out = t.forecast_ets("v", 3, "1 minute", alpha=0.5, fit_window=4)
        rows = out.collect()
        assert len(rows) == 3 and all(r.yhat is None for r in rows)
        # ts spine still steps from the last observation
        last = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=2)
        assert sorted(r.ts for r in rows) == [
            last + dt.timedelta(minutes=h) for h in (1, 2, 3)
        ]

    def test_nulls_excluded_from_tail(self, spark):
        vals = [1.0, None, 2.0, 3.0, None, 4.0]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        got = t.forecast_ets(
            "v", 1, "1 minute", alpha=0.5, fit_window=4
        ).collect()[0].yhat
        want = _ets_model([1.0, 2.0, 3.0, 4.0], 1, "ses", alpha=0.5)[0]
        assert got == pytest.approx(want, rel=1e-12)

    def test_validations(self, spark):
        t = TSDF(_mk(spark, [1.0, 2.0, 3.0]), ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="method"):
            t.forecast_ets("v", 2, "1 minute", method="wilder")
        with pytest.raises(ValueError, match="alpha"):
            t.forecast_ets("v", 2, "1 minute", alpha=0.0)
        with pytest.raises(ValueError, match="only alpha"):
            t.forecast_ets("v", 2, "1 minute", method="ses", beta=0.1)
        with pytest.raises(ValueError, match="beta"):
            t.forecast_ets("v", 2, "1 minute", method="holt")
        with pytest.raises(ValueError, match="alpha and beta only"):
            t.forecast_ets("v", 2, "1 minute", method="holt",
                           beta=0.1, period=4)
        with pytest.raises(ValueError, match="gamma"):
            t.forecast_ets("v", 2, "1 minute", method="hw_add",
                           beta=0.1, period=4)
        with pytest.raises(ValueError, match="period"):
            t.forecast_ets("v", 2, "1 minute", method="hw_add",
                           beta=0.1, gamma=0.1)
        with pytest.raises(ValueError, match="fit_window"):
            t.forecast_ets("v", 2, "1 minute", method="hw_add",
                           beta=0.1, gamma=0.1, period=4, fit_window=6)
        with pytest.raises(ValueError, match="value_col"):
            t.forecast_ets("zz", 2, "1 minute")
        td = TSDF(
            _mk(spark, [1.0]).withColumnRenamed("v", "yhat"),
            ts_col="ts", series_ids=["sym"],
        )
        with pytest.raises(ValueError, match="reserved"):
            td.forecast_ets("yhat", 2, "1 minute")

    def test_multiseries_and_no_keys(self, spark):
        base = dt.datetime(2024, 1, 1)
        rows = [
            (sym, base + dt.timedelta(minutes=i), float(i + 1) * mult)
            for sym, mult in (("a", 1.0), ("b", 3.0), (None, 1.0))
            for i in range(6)
        ]
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        got = {}
        for r in t.forecast_ets(
            "v", 2, "1 minute", method="holt", alpha=0.5, beta=0.3,
            fit_window=6,
        ).collect():
            got.setdefault(r.sym, {})[r.h] = r.yhat
        assert set(got) == {"a", "b", None}
        wa = _ets_model([1, 2, 3, 4, 5, 6], 2, "holt", alpha=0.5, beta=0.3)
        assert got["a"][1] == pytest.approx(wa[0], rel=1e-9)
        assert got[None][1] == got["a"][1]
        assert got["b"][2] == pytest.approx(3 * wa[1], rel=1e-9)
        tg = TSDF(df.drop("sym"), ts_col="ts", series_ids=[])
        out = tg.forecast_ets("v", 3, "1 minute", fit_window=4)
        assert out.count() == 3 and "sym" not in out.columns


class TestDampedHolt:
    def test_damped_vs_undamped_model(self, spark):
        vals = [10.0 + 0.5 * i + (i % 3) for i in range(40)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        und = {
            r.h: r.yhat
            for r in t.forecast_ets(
                "v", 6, "1 minute", method="holt", alpha=0.4, beta=0.2
            ).collect()
        }
        # recover the fitted states from the undamped line: yhat_h = L + h·B
        B = und[2] - und[1]
        L = und[1] - B
        phi = 0.8
        damped = {
            r.h: r.yhat
            for r in t.forecast_ets(
                "v", 6, "1 minute", method="holt", alpha=0.4, beta=0.2,
                phi=phi,
            ).collect()
        }
        acc, p = 0.0, 1.0
        for h in range(1, 7):
            p *= phi
            acc += p
            assert damped[h] == pytest.approx(L + acc * B, rel=1e-12)
        # damping shrinks the long-horizon trend contribution
        assert abs(damped[6] - L) < abs(und[6] - L)

    def test_phi_validation(self, spark):
        t = TSDF(_mk(spark, [1.0, 2.0, 3.0]), ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="phi.*holt"):
            t.forecast_ets("v", 3, "1 minute", method="ses", phi=0.9)
        with pytest.raises(ValueError, match="phi must be"):
            t.forecast_ets(
                "v", 3, "1 minute", method="holt", alpha=0.3, beta=0.1,
                phi=1.5,
            )
