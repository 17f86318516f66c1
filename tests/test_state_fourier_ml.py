import datetime as dt

import pytest

from tempo_spark import TSDF


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def states(spark):
    rows = [
        ("A", ts("2020-01-01 00:00:00"), 1.0),
        ("A", ts("2020-01-01 00:01:00"), 1.0),
        ("A", ts("2020-01-01 00:02:00"), 1.0),
        ("A", ts("2020-01-01 00:03:00"), 2.0),  # state change
        ("A", ts("2020-01-01 00:04:00"), 2.0),
        ("A", ts("2020-01-01 00:05:00"), 1.0),  # state change
        ("B", ts("2020-01-01 00:00:30"), 5.0),
        ("B", ts("2020-01-01 00:01:30"), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, event_ts timestamp, v double")
    return TSDF(df, ts_col="event_ts", series_ids=["k"])


class TestStateIntervals:
    def test_equality_states(self, states):
        out = states.extractStateIntervals("v").collect()
        ivals = sorted((r.k, str(r.start_ts), str(r.end_ts)) for r in out)
        # intervals cover only spans where the state actually HELD between
        # two rows; the trailing 00:05 singleton state emits nothing
        # (reference ExtractStateIntervalsTest semantics)
        assert ivals == [
            ("A", "2020-01-01 00:00:00", "2020-01-01 00:02:00"),
            ("A", "2020-01-01 00:03:00", "2020-01-01 00:04:00"),
            ("B", "2020-01-01 00:00:30", "2020-01-01 00:01:30"),
        ]

    def test_increasing_states(self, spark):
        rows = [
            ("A", ts("2020-01-01 00:00:00"), 1.0),
            ("A", ts("2020-01-01 00:01:00"), 2.0),
            ("A", ts("2020-01-01 00:02:00"), 3.0),
            ("A", ts("2020-01-01 00:03:00"), 1.0),  # drop breaks the run
            ("A", ts("2020-01-01 00:04:00"), 5.0),
        ]
        t = TSDF(
            spark.createDataFrame(rows, "k string, event_ts timestamp, v double"),
            series_ids=["k"],
        )
        out = t.extractStateIntervals("v", state_definition=">=").collect()
        ivals = sorted((str(r.start_ts), str(r.end_ts)) for r in out)
        # the comparison-failed row is excluded from its new run's span, so
        # the second interval starts where the new state first HELD (the row
        # before the first passing comparison) — reference contract
        assert ivals == [
            ("2020-01-01 00:00:00", "2020-01-01 00:02:00"),
            ("2020-01-01 00:03:00", "2020-01-01 00:04:00"),
        ]

    def test_reference_golden_eq(self, spark):
        # golden input/output from the reference's
        # ExtractStateIntervalsTest.test_eq_0
        # (python/tests/unit_test_data/tsdf_tests.json)
        rows = [
            ("2020-08-01 00:00:09", 4.1),
            ("2020-08-01 00:00:10", 4.1),
            ("2020-08-01 00:00:11", 5.0),
            ("2020-08-01 00:01:12", 10.7),
            ("2020-08-01 00:01:13", 10.7),
            ("2020-08-01 00:01:14", 10.7),
            ("2020-08-01 00:01:15", 42.3),
            ("2020-08-01 00:01:16", 37.6),
            ("2020-08-01 00:01:17", 61.5),
            ("2020-09-01 00:01:12", 28.9),
            ("2020-09-01 00:19:12", 0.1),
        ]
        df = spark.createDataFrame(
            [("v1", ts(t0), v) for t0, v in rows],
            "k string, event_ts timestamp, v double",
        )
        t = TSDF(df, ts_col="event_ts", series_ids=["k"])
        out = t.extractStateIntervals("v").collect()
        ivals = sorted((str(r.start_ts), str(r.end_ts)) for r in out)
        assert ivals == [
            ("2020-08-01 00:00:09", "2020-08-01 00:00:10"),
            ("2020-08-01 00:01:12", "2020-08-01 00:01:14"),
        ]

    def test_callable_definition(self, states):
        import pyspark.sql.functions as F

        out = states.extractStateIntervals(
            "v", state_definition=lambda cur, prev: F.abs(cur - prev) < F.lit(0.5)
        ).collect()
        assert len(out) == 3

    def test_bad_operator(self, states):
        with pytest.raises(ValueError):
            states.extractStateIntervals("v", state_definition="~")

    def test_null_safe_eq(self, spark):
        rows = [
            ("A", ts("2020-01-01 00:00:00"), 1.0),
            ("A", ts("2020-01-01 00:01:00"), None),
            ("A", ts("2020-01-01 00:02:00"), None),
        ]
        t = TSDF(
            spark.createDataFrame(rows, "k string, event_ts timestamp, v double"),
            series_ids=["k"],
        )
        out = t.extractStateIntervals("v", state_definition="<=>").collect()
        # null <=> null is True → one run over the null rows; 1.0 vs null
        # breaks, so the null-state interval starts at the first null row
        ivals = sorted((str(r.start_ts), str(r.end_ts)) for r in out)
        assert ivals == [("2020-01-01 00:01:00", "2020-01-01 00:02:00")]


class TestFourier:
    def test_fft_roundtrip(self, spark):
        import math

        n = 16
        rows = [
            ("A", i, math.sin(2 * math.pi * 2 * i / n)) for i in range(n)
        ]
        t = TSDF(
            spark.createDataFrame(rows, "k string, time long, val double"),
            ts_col="time",
            series_ids=["k"],
        )
        out = t.fourier_transform(1.0, "val").df.collect()
        assert len(out) == n
        # energy concentrated at freq = ±2/16
        mags = {r.freq: (r.ft_real ** 2 + r.ft_imag ** 2) ** 0.5 for r in out}
        peak = max(mags, key=mags.get)
        assert abs(abs(peak) - 2 / 16) < 1e-9

    def test_no_series(self, spark):
        rows = [(i, float(i)) for i in range(8)]
        t = TSDF(spark.createDataFrame(rows, "time long, val double"), ts_col="time")
        out = t.fourier_transform(1.0, "val").df
        assert out.count() == 8
        assert "freq" in out.columns and "__tempo_dummy_group" not in out.columns


class TestChronologicalFolds:
    def test_folds(self, spark):
        from tempo_spark.ml import chronological_folds

        rows = [("A", ts(f"2020-01-01 00:0{i}:00"), float(i)) for i in range(10)]
        df = spark.createDataFrame(rows, "k string, event_ts timestamp, v double")
        folds = chronological_folds(df, n_folds=4, ts_col="event_ts", series_ids=["k"])
        assert len(folds) == 4
        for train, test in folds:
            max_train = max(r.event_ts for r in train.collect())
            min_test = min(r.event_ts for r in test.collect())
            assert max_train < min_test  # strictly chronological

    def test_gap(self, spark):
        from tempo_spark.ml import chronological_folds

        rows = [("A", ts(f"2020-01-01 00:0{i}:00"), float(i)) for i in range(10)]
        df = spark.createDataFrame(rows, "k string, event_ts timestamp, v double")
        folds = chronological_folds(df, 2, "event_ts", ["k"], gap=1)
        (train0, _), (train1, _) = folds
        no_gap = chronological_folds(df, 2, "event_ts", ["k"], gap=0)
        assert train0.count() == no_gap[0][0].count() - 1
        assert train1.count() == no_gap[1][0].count() - 1


class TestWrite:
    def test_write_parquet_table(self, spark, trades):
        t = TSDF(trades, ts_col="event_ts", series_ids=["symbol"])
        t.write(spark, "trades_out")
        assert spark.table("trades_out").count() == trades.count()
        cols = spark.table("trades_out").columns
        assert "event_dt" in cols and "event_time" in cols
        spark.sql("DROP TABLE trades_out")


class TestSpectralFilter:
    """r12: FFT band-pass denoiser (pytest-only by design — the
    FFT->mask->iFFT round-trip has no exact-sum oracle formulation)."""

    def test_lowpass_recovers_planted_sine(self, spark):
        import datetime as dt
        import math
        import random

        from tempo_spark import TSDF

        random.seed(4)
        base = dt.datetime(2024, 1, 1)
        n = 256
        rows = []
        clean = []
        for i in range(n):
            s = 10.0 * math.sin(2 * math.pi * i / 64)  # 1/64 Hz at dt=1s
            noise = 3.0 * math.sin(2 * math.pi * i * 0.3) + random.gauss(0, 0.3)
            clean.append(s)
            rows.append(("a", base + dt.timedelta(seconds=i), s + noise))
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        out = (
            t.spectral_filter("v", timestep=1.0, high_cutoff_hz=0.05)
            .df.orderBy("ts").collect()
        )
        got = [r.v_filtered for r in out]
        # numpy reference
        import numpy as np

        y = np.array([r.v for r in out])
        spec = np.fft.fft(y)
        freqs = np.abs(np.fft.fftfreq(n, d=1.0))
        spec[freqs > 0.05] = 0
        want = np.fft.ifft(spec).real
        assert got == pytest.approx(list(want), abs=1e-9)
        # the denoised signal tracks the planted sine far better than raw
        err_f = sum((g - c) ** 2 for g, c in zip(got, clean)) / n
        err_r = sum((r.v - c) ** 2 for r, c in zip(out, clean)) / n
        assert err_f < err_r / 5

    def test_nulls_and_validation(self, spark):
        import datetime as dt

        from tempo_spark import TSDF

        base = dt.datetime(2024, 1, 1)
        rows = [("a", base + dt.timedelta(seconds=i),
                 None if i == 3 else float(i % 5)) for i in range(16)]
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        out = t.spectral_filter("v", 1.0, high_cutoff_hz=0.1).df.collect()
        byts = sorted(out, key=lambda r: r.ts)
        assert byts[3].v_filtered is None  # NULL restored, not smeared
        assert all(r.v_filtered is not None for i, r in enumerate(byts) if i != 3)
        with pytest.raises(ValueError, match="low_cutoff_hz and/or"):
            t.spectral_filter("v", 1.0)
        with pytest.raises(ValueError, match="timestep"):
            t.spectral_filter("v", 0.0, high_cutoff_hz=0.1)
        with pytest.raises(ValueError, match="already present"):
            t.spectral_filter("v", 1.0, high_cutoff_hz=0.1, out="v")
