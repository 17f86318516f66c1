"""Classical seasonal decomposition (operators/seasonal.py)."""

import datetime as dt
import math

import pytest

from tempo_spark import TSDF


def _mk(spark, vals, sym="a"):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (sym, base + dt.timedelta(hours=i), None if v is None else float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "sym string, ts timestamp, v double")


def _py_decompose(vals, period):
    """statsmodels-style classical additive decomposition on the same
    1e-6 grid."""

    def q(v):
        return None if v is None else math.floor(v * 1e6 + 0.5) / 1e6

    y = [q(v) for v in vals]
    n = len(y)
    half = period // 2
    trend = [None] * n
    for i in range(n):
        if i - half < 0 or i + half >= n:
            continue
        win = y[i - half: i + half + 1]
        if any(v is None for v in win):
            continue
        if period % 2 == 1:
            trend[i] = sum(win) / period
        else:
            trend[i] = (sum(win) - (win[0] + win[-1]) / 2) / period
    det = [
        q(y[i] - trend[i]) if y[i] is not None and trend[i] is not None else None
        for i in range(n)
    ]
    pm = {}
    for i, d in enumerate(det):
        if d is not None:
            pm.setdefault(i % period, []).append(d)
    pmq = {ph: q(sum(v) / len(v)) for ph, v in pm.items()}
    c = sum(pmq.values()) / len(pmq) if pmq else None
    seasonal = [pmq.get(i % period) - c if i % period in pmq else None for i in range(n)]
    resid = [
        (y[i] - trend[i]) - seasonal[i]
        if y[i] is not None and trend[i] is not None and seasonal[i] is not None
        else None
        for i in range(n)
    ]
    return trend, seasonal, resid


class TestSeasonalDecompose:
    @pytest.mark.parametrize("period", [4, 7])
    def test_matches_python_model(self, spark, period):
        import random

        rng = random.Random(9)
        vals = [
            0.05 * i + 10 * math.sin(2 * math.pi * i / period)
            + rng.uniform(-0.3, 0.3)
            for i in range(90)
        ]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        base = dt.datetime(2024, 1, 1)
        got = {
            int((r.ts - base).total_seconds() // 3600): (r.trend, r.seasonal, r.resid)
            for r in t.seasonal_decompose("v", period).collect()
        }
        trend, seasonal, resid = _py_decompose(vals, period)
        for i in range(90):
            gt, gs, gr = got[i]
            for g, w in ((gt, trend[i]), (gs, seasonal[i]), (gr, resid[i])):
                if w is None:
                    assert g is None
                else:
                    assert abs(g - w) < 1e-8

    def test_recomposition_identity(self, spark):
        vals = [float((i % 6) * 3 + i // 6) for i in range(60)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        rows = t.seasonal_decompose("v", 6).collect()
        for r in rows:
            if r.trend is not None and r.seasonal is not None:
                # additive identity holds exactly (resid defined as the gap)
                assert abs((r.trend + r.seasonal + r.resid) - r.v) < 1e-6

    def test_null_poisoning_and_validations(self, spark):
        vals = [1.0, 2.0, None, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        base = dt.datetime(2024, 1, 1)
        got = {
            int((r.ts - base).total_seconds() // 3600): r.trend
            for r in t.seasonal_decompose("v", 3).collect()
        }
        # any null in the centered window nulls the trend (statsmodels)
        assert got[1] is None and got[2] is None and got[3] is None
        assert got[5] is not None
        with pytest.raises(ValueError, match="period"):
            t.seasonal_decompose("v", 1)
        with pytest.raises(ValueError, match="value_col"):
            t.seasonal_decompose("nope", 4)
        bad = _mk(spark, [1.0]).withColumnRenamed("v", "trend")
        with pytest.raises(ValueError, match="reserved"):
            TSDF(bad, ts_col="ts", series_ids=["sym"]).seasonal_decompose(
                "trend", 4
            )
        # staging-prefix collisions rejected too (r10 review: a user
        # __sd_* column was silently overwritten and dropped)
        import pyspark.sql.functions as F

        bad2 = _mk(spark, [1.0]).withColumn("__sd_y", F.lit(1))
        with pytest.raises(ValueError, match="reserved"):
            TSDF(bad2, ts_col="ts", series_ids=["sym"]).seasonal_decompose(
                "v", 4
            )

    def test_multiplicative_model(self, spark):
        """Multiplicative: y = trend · seasonal · resid, mean-1 seasonal
        indexes, zero-trend rows yield NULL components."""
        period = 4
        factors = [1.5, 0.5, 1.2, 0.8]
        vals = [
            (10.0 + 0.5 * i) * factors[i % period] for i in range(80)
        ]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        rows = t.seasonal_decompose("v", period, model="multiplicative").collect()
        base = dt.datetime(2024, 1, 1)
        seas = {}
        for r in rows:
            i = int((r.ts - base).total_seconds() // 3600)
            if r.seasonal is not None:
                seas[i % period] = r.seasonal
            if r.trend is not None and r.seasonal is not None:
                # multiplicative identity holds to grid precision
                assert abs(r.trend * r.seasonal * r.resid - r.v) < 1e-2
                assert abs(r.resid - 1.0) < 0.05  # clean signal
        # seasonal indexes recover the planted factors up to normalization
        mean_idx = sum(seas.values()) / len(seas)
        assert abs(mean_idx - 1.0) < 0.02
        for ph, f in enumerate(factors):
            assert abs(seas[ph] / mean_idx - f / (sum(factors) / 4)) < 0.05
        with pytest.raises(ValueError, match="model"):
            t.seasonal_decompose("v", 4, model="loess")

    def test_robust_median_trend(self, spark):
        """trend_method='median': exact running median replaces the MA —
        outlier spikes land in resid, neighbors' trends barely move."""
        import statistics

        period = 4
        vals = [10.0 + (i % period) * 2 + 0.1 * i for i in range(60)]
        vals[30] += 500.0  # one massive spike
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        out = t.seasonal_decompose("v", period, trend_method="median")
        base = dt.datetime(2024, 1, 1)
        got = {
            int((r.ts - base).total_seconds() // 3600): (r.trend, r.seasonal, r.resid)
            for r in out.collect()
        }

        def q(v):
            return math.floor(v * 1e6 + 0.5) / 1e6

        y = [q(v) for v in vals]
        half = period // 2
        need = period + 1  # even period: plain median over p+1 rows
        for i in range(60):
            gt = got[i][0]
            if i - half < 0 or i + half >= 60:
                assert gt is None
                continue
            want = statistics.median(y[i - half: i + half + 1])
            assert abs(gt - want) < 1e-9
        # the spiked row's resid carries (almost all of) the spike
        assert got[30][2] is not None and got[30][2] > 400
        # neighbors' trend robust: within the clean slope band, not +100s
        for i in (28, 29, 31, 32):
            assert got[i][0] < 30
        # identity still holds wherever components exist
        for i in range(60):
            tr, se, re = got[i]
            if tr is not None and se is not None:
                assert abs((tr + se + re) - y[i]) < 1e-6
        with pytest.raises(ValueError, match="trend_method"):
            t.seasonal_decompose("v", 4, trend_method="loess")

    def test_robust_median_odd_period_null_poisoning(self, spark):
        import statistics

        vals = [1.0, 5.0, 2.0, None, 8.0, 3.0, 9.0, 4.0, 7.0, 6.0]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        out = t.seasonal_decompose("v", 3, trend_method="median")
        base = dt.datetime(2024, 1, 1)
        got = {
            int((r.ts - base).total_seconds() // 3600): r.trend
            for r in out.collect()
        }
        # windows touching the null are poisoned, like the MA trend
        assert got[0] is None and got[2] is None and got[3] is None
        assert got[4] is None and got[9] is None
        assert got[1] == statistics.median([1.0, 5.0, 2.0])
        assert got[6] == statistics.median([3.0, 9.0, 4.0])

    def test_null_series_key_gets_components(self, spark):
        """A NULL-keyed series is a real series (eqNullSafe join-backs):
        it must get seasonal/resid wherever an identical non-null-keyed
        series does (r10 ADVICE: name-based equi-joins dropped it)."""
        vals = [float((i % 4) * 2 + i * 0.1) for i in range(24)]
        base = dt.datetime(2024, 1, 1)
        rows = [
            (sym, base + dt.timedelta(hours=i), v)
            for sym in ("a", None)
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        out = t.seasonal_decompose("v", 4).collect()
        by_key = {}
        for r in out:
            by_key.setdefault(r.sym, {})[r.ts] = (r.trend, r.seasonal, r.resid)
        assert set(by_key) == {"a", None}
        assert by_key["a"] == by_key[None]
        assert any(v[1] is not None for v in by_key[None].values())

    def test_short_series_all_null_components(self, spark):
        t = TSDF(_mk(spark, [1.0, 2.0]), ts_col="ts", series_ids=["sym"])
        rows = t.seasonal_decompose("v", 4).collect()
        assert len(rows) == 2
        assert all(r.trend is None and r.resid is None for r in rows)


class TestSeasonalAnomalies:
    def test_planted_spikes_flag_seasonal_peaks_dont(self, spark):
        import random

        rng = random.Random(5)
        period = 6
        vals = [
            10.0 * math.sin(2 * math.pi * i / period) + 0.05 * i
            + rng.uniform(-0.2, 0.2)
            for i in range(120)
        ]
        vals[40] += 25.0  # planted spikes, well past 3 sigma of the noise
        vals[77] -= 25.0
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        rows = (
            t.seasonal_anomalies("v", period, z=3.0)
            .orderBy("ts").collect()
        )
        flagged = {i for i, r in enumerate(rows) if r.is_anomaly}
        assert 40 in flagged and 77 in flagged
        # the regular seasonal peaks themselves must NOT flag
        assert len(flagged) <= 6
        # zscore sign matches spike direction
        assert rows[40].resid_z > 3 and rows[77].resid_z < -3
        # edge rows (NULL trend) have NULL flag
        assert rows[0].is_anomaly is None

    def test_matches_hand_model(self, spark):
        vals = [float((i % 4) * 2 + i * 0.1) for i in range(40)]
        vals[20] += 9.0
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        out = t.seasonal_anomalies("v", 4, z=2.5).orderBy("ts").collect()
        dec = {r.ts: r.resid
               for r in t.seasonal_decompose("v", 4).collect()}

        def q(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        rq = [q(v) for v in dec.values() if v is not None]
        n = len(rq)
        mean = sum(rq) / n
        var = (n * sum(x * x for x in rq) - sum(rq) ** 2) / (n * (n - 1))
        sd = math.sqrt(max(var, 0.0))
        for r in out:
            resid = dec[r.ts]
            if resid is None:
                assert r.is_anomaly is None and r.resid_z is None
            else:
                assert r.is_anomaly == (abs(q(resid) - mean) > 2.5 * sd)
                assert r.resid_z == pytest.approx(
                    (q(resid) - mean) / sd, rel=1e-6
                )

    def test_validations_and_reserved(self, spark):
        t = TSDF(_mk(spark, [1.0] * 20), ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="z must"):
            t.seasonal_anomalies("v", 4, z=0.0)
        out = t.seasonal_anomalies("v", 4)
        with pytest.raises(ValueError, match="reserved"):
            TSDF(out, ts_col="ts", series_ids=["sym"]).seasonal_anomalies(
                "v", 4
            )
        # flat residual: sigma = 0, nothing deviates -> no flags
        rows = out.collect()
        assert all(r.is_anomaly is not True for r in rows)

    def test_no_series_keys_global(self, spark):
        vals = [float((i % 3)) for i in range(30)]
        vals[15] += 50.0
        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(base + dt.timedelta(hours=i), v) for i, v in enumerate(vals)],
            "ts timestamp, v double",
        )
        t = TSDF(df, ts_col="ts", series_ids=[])
        rows = t.seasonal_anomalies("v", 3, z=3.0).orderBy("ts").collect()
        assert rows[15].is_anomaly is True

    def test_sql_build_quoted_outputs_and_keys(self, spark):
        # r12 one-parse plan build: output/series names with SQL
        # metacharacters must round-trip through the quoted fragments
        # and produce the same values as plain names.
        vals = [float(i % 4) for i in range(24)]
        vals[10] += 30.0
        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                ("s", base + dt.timedelta(hours=i), v)
                for i, v in enumerate(vals)
            ],
            "`key col` string, ts timestamp, v double",
        )
        t = TSDF(df, ts_col="ts", series_ids=["key col"])
        odd = t.seasonal_anomalies(
            "v", 4, out_flag="an`om", out_z="z score"
        ).orderBy("ts").collect()
        plain = t.seasonal_anomalies("v", 4).orderBy("ts").collect()
        assert [r["an`om"] for r in odd] == [r.is_anomaly for r in plain]
        assert [r["z score"] for r in odd] == [r.resid_z for r in plain]
        assert plain[10].is_anomaly is True
