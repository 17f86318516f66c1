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
