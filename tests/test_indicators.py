"""Technical indicators (operators/indicators.py) + seasonal strength."""

import datetime as dt
import math
import statistics

import pytest

from tempo_spark import TSDF


def _mk(spark, vals, sym="a"):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (sym, base + dt.timedelta(minutes=i), None if v is None else float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "sym string, ts timestamp, v double")


class TestRSI:
    def test_matches_hand_model(self, spark):
        import random

        rng = random.Random(9)
        vals = [50.0]
        for _ in range(60):
            vals.append(vals[-1] + rng.uniform(-2, 2))
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        got = [
            r.rsi for r in t.withRSI("v", window=14).df.orderBy("ts").collect()
        ]

        def q(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        yq = [q(v) for v in vals]
        diffs = [None] + [
            round((yq[i] - yq[i - 1]) * 1e6) / 1e6 for i in range(1, len(yq))
        ]
        for i, g in enumerate(got):
            win = [d for d in diffs[max(0, i - 13): i + 1] if d is not None]
            if i < 14:
                assert g is None
                continue
            gains = sum(d for d in win if d > 0)
            losses = sum(-d for d in win if d < 0)
            want = 100.0 * gains / (gains + losses)
            assert abs(g - want) < 1e-6

    def test_flat_and_monotone(self, spark):
        t = TSDF(_mk(spark, [5.0] * 20), ts_col="ts", series_ids=["sym"])
        assert all(
            r.rsi is None for r in t.withRSI("v", 5).df.collect()
        )  # flat: sum G+L == 0
        tu = TSDF(
            _mk(spark, [float(i) for i in range(20)]),
            ts_col="ts", series_ids=["sym"],
        )
        rows = tu.withRSI("v", 5).df.orderBy("ts").collect()
        assert all(r.rsi == 100.0 for r in rows[5:])  # all gains
        with pytest.raises(ValueError, match="window"):
            tu.withRSI("v", 0)


class TestBollinger:
    def test_matches_hand_model_and_guards(self, spark):
        import random

        rng = random.Random(4)
        vals = [10 + rng.uniform(-1, 1) for _ in range(40)]
        vals[7] = None
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        rows = t.withBollinger("v", window=10, k=2.0).df.orderBy("ts").collect()

        def q(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        for i, r in enumerate(rows):
            win = vals[max(0, i - 9): i + 1]
            if i < 9 or any(v is None for v in win):
                assert r.bb_mid is None and r.bb_up is None
                continue
            wq = [q(v) for v in win]
            mean = sum(wq) / 10
            sd = statistics.stdev(wq)
            assert abs(r.bb_mid - mean) < 1e-9
            assert abs(r.bb_up - (mean + 2 * sd)) < 1e-7
            assert abs(r.bb_dn - (mean - 2 * sd)) < 1e-7
        with pytest.raises(ValueError, match="reserved"):
            t.withBollinger("v", 10).withBollinger("v", 10)


class TestMACD:
    def test_composition_of_ema(self, spark):
        vals = [float(i % 7) * 3 + i * 0.1 for i in range(80)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        out = t.withMACD("v", fast=4, slow=10, signal=3).df
        got = out.orderBy("ts").collect()
        assert all(r.macd_hist == r.macd - r.macd_signal for r in got)
        # macd == ema(span=4) − ema(span=10) at the same truncation depth
        # (default ema_window = 4·slow), bit-for-bit
        ef = {r.ts: r["ema_v"]
              for r in t.EMA("v", window=40, span=4.0).df.collect()}
        es = {r.ts: r["ema_v"]
              for r in t.EMA("v", window=40, span=10.0).df.collect()}
        for r in got:
            assert r.macd == ef[r.ts] - es[r.ts]
        with pytest.raises(ValueError, match="fast"):
            t.withMACD("v", fast=10, slow=5)
        with pytest.raises(ValueError, match="reserved"):
            TSDF(out, ts_col="ts", series_ids=["sym"]).withMACD(
                "v", fast=4, slow=10
            )


class TestSeasonalStrength:
    def test_strong_signal_vs_noise(self, spark):
        import random

        rng = random.Random(17)
        period = 6
        strong = [
            10 * math.sin(2 * math.pi * i / period) + 0.02 * i
            + rng.uniform(-0.05, 0.05)
            for i in range(120)
        ]
        noise = [rng.uniform(-5, 5) for _ in range(120)]
        base = dt.datetime(2024, 1, 1)
        rows = [
            ("strong", base + dt.timedelta(minutes=i), v)
            for i, v in enumerate(strong)
        ] + [
            ("noise", base + dt.timedelta(minutes=i), v)
            for i, v in enumerate(noise)
        ]
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        got = {r.sym: r for r in t.seasonal_strength("v", period).collect()}
        assert got["strong"].seasonal_strength > 0.95
        assert got["noise"].seasonal_strength < 0.5
        assert 0.0 <= got["noise"].trend_strength <= 1.0
        assert got["strong"].n_components > 100

    def test_matches_hand_model(self, spark):
        vals = [float((i % 4) * 2 + i * 0.05) for i in range(60)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        sd = {r.ts: (r.trend, r.seasonal, r.resid)
              for r in t.seasonal_decompose("v", 4).collect()}
        comp = [
            v for v in sd.values()
            if all(x is not None for x in v)
        ]

        def q(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        r = [q(c[2]) for c in comp]
        tr = [q(c[0] + c[2]) for c in comp]
        sr = [q(c[1] + c[2]) for c in comp]

        def var(xs):
            n = len(xs)
            return n * sum(x * x for x in xs) - sum(xs) ** 2

        want_t = max(0.0, 1.0 - var(r) / var(tr))
        want_s = max(0.0, 1.0 - var(r) / var(sr))
        got = t.seasonal_strength("v", 4).collect()[0]
        assert abs(got.trend_strength - want_t) < 1e-9
        assert abs(got.seasonal_strength - want_s) < 1e-9

    def test_short_series_null(self, spark):
        t = TSDF(_mk(spark, [1.0, 2.0, 3.0]), ts_col="ts", series_ids=["sym"])
        r = t.seasonal_strength("v", 4).collect()[0]
        assert r.n_components == 0
        assert r.trend_strength is None and r.seasonal_strength is None


class TestModuleTwins:
    def test_module_functions_match_methods(self, spark):
        from tempo_spark.operators.indicators import (
            with_bollinger,
            with_macd,
            with_rsi,
        )

        vals = [float(i % 9) + i * 0.2 for i in range(40)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        a = [r.rsi for r in with_rsi(t, "v", 5).orderBy("ts").collect()]
        b = [r.rsi for r in t.withRSI("v", 5).df.orderBy("ts").collect()]
        assert a == b
        c = [r.bb_up for r in with_bollinger(t, "v", 5).orderBy("ts").collect()]
        d = [r.bb_up for r in t.withBollinger("v", 5).df.orderBy("ts").collect()]
        assert c == d
        e = with_macd(t, "v", fast=3, slow=6, signal=2)
        assert {"macd", "macd_signal", "macd_hist"} <= set(e.columns)


class TestReviewRegressionsR11b:
    def test_macd_guards_and_window_param(self, spark):
        import pyspark.sql.functions as F

        vals = [float(i % 5) + i * 0.1 for i in range(50)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        # a pre-existing ema_{value_col} user column must be REJECTED,
        # not silently consumed as staging
        with_user_ema = TSDF(
            t.EMA("v").df, ts_col="ts", series_ids=["sym"]
        )
        with pytest.raises(ValueError, match="reserved"):
            with_user_ema.withMACD("v")
        with pytest.raises(ValueError, match="reserved"):
            TSDF(
                t.df.withColumn("__ti_fast", F.lit(1.0)),
                ts_col="ts", series_ids=["sym"],
            ).withMACD("v")
        # deeper truncation moves the slow line: default 4*slow vs a
        # shallow window=10 must differ (the ~10%-mass bias)
        deep = {r.ts: r.macd for r in t.withMACD("v", fast=4, slow=10).df.collect()}
        shallow = {
            r.ts: r.macd
            for r in t.withMACD("v", fast=4, slow=10, ema_window=10).df.collect()
        }
        assert any(deep[k] != shallow[k] for k in deep)
        with pytest.raises(ValueError, match="ema_window"):
            t.withMACD("v", ema_window=0)

    def test_seasonal_strength_rejects_multiplicative(self, spark):
        t = TSDF(_mk(spark, [1.0] * 30), ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="ADDITIVE"):
            t.seasonal_strength("v", 4, model="multiplicative")


def _mk_ohlc(spark, bars, sym="a"):
    """bars = list of (h, l, c) tuples (None allowed per field)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            sym, base + dt.timedelta(hours=i),
            None if h is None else float(h),
            None if l is None else float(l),
            None if c is None else float(c),
        )
        for i, (h, l, c) in enumerate(bars)
    ]
    return spark.createDataFrame(
        rows, "sym string, ts timestamp, h double, l double, c double"
    )


def _q(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


class TestATR:
    def test_matches_hand_model(self, spark):
        import random

        rng = random.Random(12)
        bars, c = [], 100.0
        for _ in range(40):
            c += rng.uniform(-3, 3)
            h = c + rng.uniform(0, 2)
            l = c - rng.uniform(0, 2)
            bars.append((h, l, c))
        t = TSDF(_mk_ohlc(spark, bars), ts_col="ts", series_ids=["sym"])
        got = [
            r.atr
            for r in t.withATR("h", "l", "c", window=5).df
            .orderBy("ts").collect()
        ]
        trs = []
        for i, (h, l, c_) in enumerate(bars):
            hq, lq, cq = _q(h), _q(l), _q(c_)
            if i == 0:
                trs.append(hq - lq)
            else:
                pc = _q(bars[i - 1][2])
                trs.append(max(hq - lq, abs(hq - pc), abs(lq - pc)))
        for i, g in enumerate(got):
            if i < 4:
                assert g is None
                continue
            want = sum(trs[i - 4: i + 1]) / 5
            assert g == pytest.approx(want, abs=1e-9)

    def test_null_bar_and_null_prev_close(self, spark):
        bars = [(10, 8, 9), (None, 7, 8), (11, 9, 10), (12, 10, 11),
                (13, 11, None), (14, 12, 13)]
        t = TSDF(_mk_ohlc(spark, bars), ts_col="ts", series_ids=["sym"])
        rows = t.withATR("h", "l", "c", window=2).df.orderBy("ts").collect()
        # bar 1 has NULL high -> NULL TR -> windows covering it are NULL
        assert rows[1].atr is None and rows[2].atr is None
        # bar 3: TR = max(12-10, |12-10|, |10-10|) = 2; bar 2's TR uses
        # prev close 8 -> max(2, 3, 1) = 3 -> ATR = 2.5
        assert rows[3].atr == pytest.approx(2.5)
        # bar 5 follows a NULL close -> falls back to h - l = 2;
        # bar 4 TR = max(2, |13-11|, |11-11|) = 2 -> ATR = 2.0
        assert rows[5].atr == pytest.approx(2.0)
        with pytest.raises(ValueError, match="window"):
            t.withATR("h", "l", "c", window=0)
        with pytest.raises(ValueError, match="column"):
            t.withATR("zz", "l", "c")
        with pytest.raises(ValueError, match="reserved"):
            TSDF(
                t.withATR("h", "l", "c").df, ts_col="ts", series_ids=["sym"]
            ).withATR("h", "l", "c")


class TestStochastic:
    def test_matches_hand_model(self, spark):
        import random

        rng = random.Random(7)
        bars, c = [], 50.0
        for _ in range(30):
            c += rng.uniform(-2, 2)
            bars.append((c + rng.uniform(0, 1), c - rng.uniform(0, 1), c))
        t = TSDF(_mk_ohlc(spark, bars), ts_col="ts", series_ids=["sym"])
        rows = (
            t.withStochastic("h", "l", "c", k_window=5, d_window=3).df
            .orderBy("ts").collect()
        )
        ks = []
        for i, (h, l, c_) in enumerate(bars):
            if i < 4:
                ks.append(None)
                continue
            win = bars[i - 4: i + 1]
            hh = max(_q(b[0]) for b in win)
            ll = min(_q(b[1]) for b in win)
            ks.append(
                _q((100.0 * (_q(c_) - ll)) / (hh - ll)) if hh > ll else None
            )
        for i, r in enumerate(rows):
            if ks[i] is None:
                assert r.stoch_k is None
            else:
                assert r.stoch_k == pytest.approx(ks[i], abs=1e-9)
            dwin = ks[max(0, i - 2): i + 1]
            if i < 2 or any(k is None for k in dwin):
                assert r.stoch_d is None
            else:
                assert r.stoch_d == pytest.approx(sum(dwin) / 3, abs=1e-9)

    def test_flat_window_and_guards(self, spark):
        bars = [(5, 5, 5)] * 8
        t = TSDF(_mk_ohlc(spark, bars), ts_col="ts", series_ids=["sym"])
        rows = t.withStochastic("h", "l", "c", 3, 2).df.collect()
        assert all(r.stoch_k is None and r.stoch_d is None for r in rows)
        with pytest.raises(ValueError, match="k_window"):
            t.withStochastic("h", "l", "c", k_window=0)
        with pytest.raises(ValueError, match="d_window"):
            t.withStochastic("h", "l", "c", d_window=0)
        with pytest.raises(ValueError, match="reserved"):
            TSDF(
                t.withStochastic("h", "l", "c").df,
                ts_col="ts", series_ids=["sym"],
            ).withStochastic("h", "l", "c")

    def test_composes_with_calc_bars(self, spark):
        import random

        rng = random.Random(3)
        base = dt.datetime(2024, 1, 1)
        rows = [
            ("a", base + dt.timedelta(minutes=7 * i), 50 + rng.uniform(-9, 9))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        bars = TSDF(df, ts_col="ts", series_ids=["sym"]).calc_bars("1 hour")
        ind = TSDF(bars.df, ts_col="ts", series_ids=["sym"]).withATR(
            "high_v", "low_v", "close_v", window=4
        ).withStochastic("high_v", "low_v", "close_v", 4, 2)
        out = ind.df.orderBy("ts").collect()
        assert any(r.atr is not None for r in out)
        assert any(r.stoch_d is not None for r in out)
        ks = [r.stoch_k for r in out if r.stoch_k is not None]
        assert all(0.0 <= k <= 100.0 for k in ks)


class TestEMAPrefixStrategy:
    """r12: O(rows) prefix EMA (TSDF._ema_prefix) vs the sliding sum."""

    def _parity(self, spark, vals, window, **ema_kw):
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        sl = {r.ts: r["ema_v"]
              for r in t.EMA("v", window=window, **ema_kw).df.collect()}
        pr = {
            r.ts: r["ema_v"]
            for r in t.EMA(
                "v", window=window, strategy="prefix", **ema_kw
            ).df.collect()
        }
        assert sl.keys() == pr.keys()
        for k in sl:
            a, b = sl[k], pr[k]
            assert b == pytest.approx(a, rel=1e-9, abs=1e-9), (k, a, b)

    def test_parity_deep_window_with_nulls(self, spark):
        vals = [
            None if i % 37 == 5 else math.sin(i / 3.0) * 40 + i * 0.01
            for i in range(400)
        ]
        # deep MACD-class truncation, default alpha, and span param
        self._parity(spark, vals, 104, span=26.0)
        self._parity(spark, vals, 104, exp_factor=0.2)
        self._parity(spark, vals, 30)

    def test_parity_short_series_and_w1(self, spark):
        self._parity(spark, [5.0, None, 7.0], 104, span=26.0)
        self._parity(spark, [3.0, 1.0, 4.0, 1.0, 5.0], 1, exp_factor=0.5)

    def test_multi_series_one_exchange(self, spark):
        from tempo_spark.plans.inspect import count_exchanges

        rows = []
        base = dt.datetime(2024, 1, 1)
        for sym in ("a", "b", "c"):
            for i in range(150):
                rows.append(
                    (sym, base + dt.timedelta(minutes=i), float(i % 11))
                )
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        out = t.EMA("v", window=104, span=26.0, strategy="prefix").df
        # the phase-block windows cluster by (series, block) which the
        # series hash partitioning already satisfies: ONE shuffle
        assert count_exchanges(out) == 1
        sl = t.EMA("v", window=104, span=26.0).df.collect()
        pr = {(r.sym, r.ts): r["ema_v"] for r in out.collect()}
        for r in sl:
            assert pr[(r.sym, r.ts)] == pytest.approx(
                r["ema_v"], rel=1e-9, abs=1e-9
            )

    def test_overflow_guard_and_bad_strategy(self, spark):
        t = TSDF(_mk(spark, [1.0, 2.0]), ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="overflow the double rescaling"):
            t.EMA("v", window=5000, exp_factor=0.9, strategy="prefix")
        with pytest.raises(ValueError, match="strategy"):
            t.EMA("v", strategy="nope")
        with pytest.raises(ValueError, match="__emp_"):
            TSDF(
                t.df.withColumn("__emp_t0", t.df.v),
                ts_col="ts", series_ids=["sym"],
            ).EMA("v", strategy="prefix")

    def test_macd_prefix_matches_sliding(self, spark):
        vals = [float(i % 7) * 3 + i * 0.1 for i in range(300)]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        sl = t.withMACD("v").df.collect()
        pr = {
            r.ts: r
            for r in t.withMACD("v", ema_strategy="prefix").df.collect()
        }
        for r in sl:
            for c in ("macd", "macd_signal", "macd_hist"):
                assert pr[r.ts][c] == pytest.approx(
                    r[c], rel=1e-9, abs=1e-9
                )


def _ema_prefix_old(tsdf, colName, window, alpha):
    """The pre-r12 Column-chain form of TSDF._ema_prefix, VERBATIM (from
    commit 2541c5f~1) — the bit-identity reference for the parsed-SQL
    rewrite. Kept in the test so a construction regression in the rewrite
    is caught as a value diff, not a tolerance miss."""
    import math

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    r = 1.0 - alpha
    out_col = f"ema_{colName}"
    if r <= 0.0:
        return tsdf.df.withColumn(
            out_col, F.coalesce(F.col(colName).cast("double"), F.lit(0.0))
        )
    cap = int(200.0 / -math.log10(r)) if r < 1.0 else 1 << 30
    B = max(2 * window, 128)
    B += B % 2
    assert B <= cap
    half = B // 2
    series = [F.col(c) for c in tsdf.series_ids]
    staged = tsdf.df.withColumn(
        "__emp_tb", F.xxhash64(F.struct(*[F.col(c) for c in tsdf.df.columns]))
    )
    order = [F.col(tsdf.ts_col)]
    if tsdf.sequence_col:
        order.append(F.col(tsdf.sequence_col))
    order.append(F.col("__emp_tb"))
    w = Window.partitionBy(*series).orderBy(*order)
    grow = w.rowsBetween(Window.unboundedPreceding, 0)
    yd = F.col(colName).cast("double")
    staged = staged.withColumn(
        "__emp_t0", F.row_number().over(w) - F.lit(1)
    ).withColumn(
        "__emp_nan", F.when(F.isnan(yd), F.lit(1)).otherwise(F.lit(0))
    )
    staged = staged.withColumn("__emp_nc", F.sum("__emp_nan").over(grow))
    for ph, shift in (("0", 0), ("1", half)):
        staged = (
            staged.withColumn(f"__emp_off{ph}", F.expr(f"(__emp_t0 + {shift}) % {B}"))
            .withColumn(f"__emp_blk{ph}", F.expr(f"(__emp_t0 + {shift}) div {B}"))
            .withColumn(
                f"__emp_z{ph}",
                F.coalesce(F.nanvl(yd, F.lit(0.0)), F.lit(0.0))
                * F.pow(F.lit(1.0 / r), F.col(f"__emp_off{ph}")),
            )
        )
        wp = (
            Window.partitionBy(*series, F.col(f"__emp_blk{ph}"))
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        staged = staged.withColumn(
            f"__emp_p{ph}", F.sum(F.col(f"__emp_z{ph}")).over(wp)
        )

    def leg(ph):
        off = F.col(f"__emp_off{ph}")
        p = F.col(f"__emp_p{ph}")
        sub = F.when(
            off >= window, F.coalesce(F.lag(p, window).over(w), F.lit(0.0))
        ).otherwise(F.lit(0.0))
        return F.pow(F.lit(r), off) * (p - sub) * F.lit(alpha)

    nan_in_frame = (
        F.col("__emp_nc")
        - F.coalesce(F.lag(F.col("__emp_nc"), window).over(w), F.lit(0))
    ) > 0
    ema = F.when(nan_in_frame, F.lit(float("nan"))).otherwise(
        F.when(F.col("__emp_off0") >= window - 1, leg("0")).otherwise(leg("1"))
    )
    return staged.withColumn(out_col, ema).drop(
        *[c for c in staged.columns if c.startswith("__emp_")]
    )


class TestEmaPrefixRewrite:
    """The parsed-SQL _ema_prefix (r12 rewrite) must be BIT-IDENTICAL to
    the old Column-chain form on the delicate inputs: duplicate
    timestamps, NaN, NULL, alpha edges, sequence_col, multi-series."""

    @staticmethod
    def _cells(df, value_col):
        # bitwise-comparable rendering: NaN -> 'nan' marker, floats kept
        # exact via repr (shortest round-trip)
        out = []
        for r in df.collect():
            v = r[value_col]
            # repr-render everything: NaN keys/values compare as 'nan'
            # (tuple equality on raw floats would fail NaN == NaN), and
            # repr of a float is its exact shortest round-trip
            key = repr(tuple(r[c] for c in df.columns if c != value_col))
            out.append((key, repr(v)))
        return sorted(out)

    def _pin(self, spark, tsdf, col, window, alpha):
        new = tsdf._ema_prefix(col, window, alpha).df
        old = _ema_prefix_old(tsdf, col, window, alpha)
        assert new.columns == old.columns
        assert self._cells(new, f"ema_{col}") == self._cells(old, f"ema_{col}")

    def test_battery_bit_identical(self, spark):
        import random

        rng = random.Random(13)
        base = dt.datetime(2024, 1, 1)
        rows = []
        for sym in ("a", "b"):
            seq = 0
            for i in range(300):
                v = rng.uniform(-50, 50)
                if i % 23 == 7:
                    v = None
                elif i % 31 == 11:
                    v = float("nan")
                # duplicate timestamps every 5th row (two rows same ts)
                ts = base + dt.timedelta(minutes=i - (i % 5 == 0))
                rows.append((sym, ts, None if v is None else float(v)))
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        for window, alpha in ((104, 2.0 / 27.0), (30, 0.2), (1, 0.5),
                              (50, 0.9), (104, 1e-6)):
            self._pin(spark, t, "v", window, alpha)

    def test_alpha_one_shortcut_and_sequence_col(self, spark):
        base = dt.datetime(2024, 1, 1)
        rows = [
            ("a", base, i, float(i) if i % 3 else None) for i in range(40)
        ]
        df = spark.createDataFrame(rows, "sym string, ts timestamp, seq int, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"], sequence_col="seq")
        self._pin(spark, t, "v", 10, 1.0)   # alpha == 1 shortcut
        self._pin(spark, t, "v", 10, 0.3)   # all rows same ts: seq+tiebreak order

    def test_existing_out_col_replaced_in_place(self, spark):
        # calling twice: sliding's withColumn REPLACES ema_v; prefix must
        # match (same name, same position, no duplicate-column failure)
        t = TSDF(_mk(spark, [1.0, 2.0, 3.0, 4.0]), ts_col="ts", series_ids=["sym"])
        once = t.EMA("v", window=2, exp_factor=0.5, strategy="prefix")
        twice = once.EMA("v", window=3, exp_factor=0.25, strategy="prefix")
        assert twice.df.columns == once.df.columns
        direct = t.EMA("v", window=3, exp_factor=0.25, strategy="prefix").df
        got = {r.ts: r["ema_v"] for r in twice.df.collect()}
        want = {r.ts: r["ema_v"] for r in direct.collect()}
        assert got == want


class TestWilliamsR:
    def test_model_and_relation_to_stoch(self, spark):
        import random

        random.seed(3)
        base = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(60):
            c = random.uniform(10, 90)
            rows.append(
                ("a", base + dt.timedelta(hours=i),
                 c + random.uniform(0, 5), c - random.uniform(0, 5), c)
            )
        df = spark.createDataFrame(
            rows, "sym string, ts timestamp, hi double, lo double, cl double"
        )
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        out = {
            r.ts: r
            for r in t.withWilliamsR("hi", "lo", "cl", window=5)
            .withStochastic("hi", "lo", "cl", 5, 3).df.collect()
        }
        n_checked = 0
        for r in out.values():
            if r.williams_r is not None and r.stoch_k is not None:
                # %R == %K − 100 at the same window (unquantized %R vs
                # quantized %K: 1e-6 grid tolerance)
                assert r.williams_r == pytest.approx(
                    r.stoch_k - 100.0, abs=2e-6
                )
                assert -100.0 <= r.williams_r <= 0.0
                n_checked += 1
        assert n_checked > 40

    def test_guards(self, spark):
        base = dt.datetime(2024, 1, 1)
        rows = [("a", base + dt.timedelta(hours=i), 5.0, 5.0, 5.0)
                for i in range(6)]
        df = spark.createDataFrame(
            rows, "sym string, ts timestamp, hi double, lo double, cl double"
        )
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        got = t.withWilliamsR("hi", "lo", "cl", window=3).df.collect()
        assert all(r.williams_r is None for r in got)  # flat window
        with pytest.raises(ValueError, match="window"):
            t.withWilliamsR("hi", "lo", "cl", window=0)


class TestOBV:
    def test_model_with_nulls(self, spark):
        base = dt.datetime(2024, 1, 1)
        closes = [10.0, 12.0, 11.0, 11.0, None, 13.0, 9.0]
        vols = [100.0, 50.0, 30.0, 20.0, 10.0, 40.0, None]
        rows = [
            ("a", base + dt.timedelta(hours=i), c, v)
            for i, (c, v) in enumerate(zip(closes, vols))
        ]
        df = spark.createDataFrame(
            rows, "sym string, ts timestamp, cl double, vol double"
        )
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        got = [r.obv for r in t.withOBV("cl", "vol").df.orderBy("ts").collect()]
        # contributions: 0 (first), +50 (12>10), -30 (11<12), 0 (flat),
        # 0 (null close), 0 (prev null), 0 (null vol)
        assert got == [0.0, 50.0, 20.0, 20.0, 20.0, 20.0, 20.0]

    def test_reserved_guard(self, spark):
        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("a", base, 1.0, 1.0, 2.0)],
            "sym string, ts timestamp, cl double, vol double, obv double",
        )
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="reserved"):
            t.withOBV("cl", "vol")


class TestCusum:
    def test_matches_recursion_model(self, spark):
        import random

        random.seed(11)
        vals = [random.gauss(10.0, 1.0) for _ in range(80)]
        vals[50:] = [v + 4.0 for v in vals[50:]]  # planted mean shift
        vals[20] = None
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        got = (
            t.withCusum("v", target=10.0, k=0.5, h=5.0)
            .df.orderBy("ts").collect()
        )

        def q6(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        cp = cn = 0.0
        for i, r in enumerate(got):
            d = 0.0 if vals[i] is None else q6(vals[i]) - 10.0 - 0.5
            dn = 0.0 if vals[i] is None else 10.0 - q6(vals[i]) - 0.5
            cp = max(0.0, cp + d)
            cn = max(0.0, cn + dn)
            assert r.cusum_pos == pytest.approx(cp, abs=1e-9)
            assert r.cusum_neg == pytest.approx(cn, abs=1e-9)
            assert r.cusum_flag == (cp > 5.0 or cn > 5.0)
        # the planted +4 shift must flag well before the series ends
        assert any(r.cusum_flag for r in got[52:60])
        assert not any(r.cusum_flag for r in got[:20])

    def test_derived_target_and_guards(self, spark):
        vals = [5.0, 5.0, 5.0, 9.0, 9.0, 9.0]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        out = t.withCusum("v").df.orderBy("ts").collect()
        # target = series mean (7.0): positive chart climbs on the tail
        assert out[-1].cusum_pos == pytest.approx(6.0)
        assert out[-1].cusum_neg == 0.0
        assert "cusum_flag" not in out[0].asDict()
        with pytest.raises(ValueError, match="k must"):
            t.withCusum("v", k=-1)
        with pytest.raises(ValueError, match="h must"):
            t.withCusum("v", h=0)


class TestEMAPrefixReviewRegressions:
    """r12 review findings on _ema_prefix, pinned."""

    def test_nan_frames_match_sliding(self, spark):
        vals = [float(i % 7) + 1 for i in range(120)]
        vals[40] = float("nan")
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        sl = {r.ts: r["ema_v"]
              for r in t.EMA("v", window=10, span=5.0).df.collect()}
        pr = {r.ts: r["ema_v"]
              for r in t.EMA("v", window=10, span=5.0,
                             strategy="prefix").df.collect()}
        n_nan = 0
        for k in sl:
            a, b = sl[k], pr[k]
            if math.isnan(a):
                assert math.isnan(b), (k, a, b)  # NaN frames identical
                n_nan += 1
            else:
                assert not math.isnan(b), (k, a, b)  # and ONLY those
                assert b == pytest.approx(a, rel=1e-9, abs=1e-9)
        assert n_nan == 10  # exactly the frames containing row 40

    def test_duplicate_ts_no_amplification(self, spark):
        # duplicate timestamps: both strategies tie-break arbitrarily,
        # but prefix must stay internally consistent — weights sum < 1
        # so |ema| <= max|y| always; the pre-fix misalignment amplified
        # by r^-j (values far beyond max|y|)
        base = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(300):
            ts = base + dt.timedelta(minutes=i // 3)  # 3 rows per ts
            rows.append(("a", ts, float((i * 37) % 100)))
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        got = t.EMA("v", window=104, span=26.0, strategy="prefix").df.collect()
        assert all(abs(r["ema_v"]) <= 100.0 + 1e-6 for r in got)
        # identical values on tied timestamps -> order-invariant: exact
        # parity with sliding
        rows2 = [("a", base + dt.timedelta(minutes=i // 3), float(i // 3))
                 for i in range(300)]
        df2 = spark.createDataFrame(rows2, "sym string, ts timestamp, v double")
        t2 = TSDF(df2, ts_col="ts", series_ids=["sym"])
        sl = sorted(r["ema_v"] for r in t2.EMA("v", window=50, span=12.0).df.collect())
        pr = sorted(r["ema_v"] for r in t2.EMA(
            "v", window=50, span=12.0, strategy="prefix").df.collect())
        for a, b in zip(sl, pr):
            assert b == pytest.approx(a, rel=1e-9, abs=1e-9)

    def test_alpha_out_of_range_raises(self, spark):
        t = TSDF(_mk(spark, [1.0, 2.0]), ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="exp_factor in \\(0, 1\\]"):
            t.EMA("v", window=10, exp_factor=1.5, strategy="prefix")
        # sliding stays reference-permissive
        t.EMA("v", window=10, exp_factor=1.5).df.collect()


class TestRollingQuantileHampel:
    def test_rolling_median_matches_python(self, spark):
        import random
        import statistics

        random.seed(5)
        vals = [random.uniform(0, 100) for _ in range(60)]
        vals[17] = None
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        got = [
            r["v_q0_5"]
            for r in t.withRollingQuantile("v", 5).df.orderBy("ts").collect()
        ]

        def q6(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        for i, g in enumerate(got):
            if i < 4:
                assert g is None
                continue
            win = [q6(v) for v in vals[i - 4 : i + 1] if v is not None]
            if len(win) < 5:
                assert g is None  # min_periods defaults to window
            else:
                assert g == pytest.approx(statistics.median(win), abs=1e-9)

    def test_quantile_interpolation_and_min_periods(self, spark):
        vals = [10.0, 20.0, 30.0, 40.0]
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        got = [
            r.p25
            for r in t.withRollingQuantile(
                "v", 4, 0.25, out="p25", min_periods=2
            ).df.orderBy("ts").collect()
        ]
        # numpy 'linear': n=2 -> 10+0.25*10; n=3 -> h=0.5 -> 15; n=4 ->
        # h=0.75 -> 17.5
        assert got[0] is None
        assert got[1] == pytest.approx(12.5)
        assert got[2] == pytest.approx(15.0)
        assert got[3] == pytest.approx(17.5)
        with pytest.raises(ValueError, match="q must"):
            t.withRollingQuantile("v", 4, 1.5)
        with pytest.raises(ValueError, match="min_periods"):
            t.withRollingQuantile("v", 4, 0.5, min_periods=9)

    def test_hampel_flags_planted_spikes(self, spark):
        import random
        import statistics

        random.seed(9)
        vals = [50.0 + random.uniform(-1, 1) for _ in range(80)]
        vals[30] = 500.0  # spike
        vals[55] = -400.0
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        got = (
            t.withHampel("v", window=7, k=3.0, out_filtered="v_clean")
            .df.orderBy("ts").collect()
        )
        assert got[30].is_outlier is True
        assert got[55].is_outlier is True
        flagged = [i for i, r in enumerate(got) if r.is_outlier]
        assert len(flagged) <= 6  # spikes + at most a few boundary rows
        # filtered column replaces the spike with the window median
        win = sorted(
            math.floor(v * 1e6 + 0.5) / 1e6 for v in vals[24:31]
        )
        assert got[30].v_clean == pytest.approx(statistics.median(win), abs=1e-9)
        assert got[10].v_clean == pytest.approx(
            math.floor(vals[10] * 1e6 + 0.5) / 1e6, abs=1e-9
        )
        # python-model parity of the flag rule on every full window
        for i in range(6, 80):
            w7 = [math.floor(v * 1e6 + 0.5) / 1e6 for v in vals[i - 6 : i + 1]]
            med = statistics.median(sorted(w7))
            mad = statistics.median(sorted(abs(x - med) for x in w7))
            want = abs(w7[-1] - med) > 3.0 * 1.4826 * mad
            assert got[i].is_outlier == want, i

    def test_hampel_zero_mad_and_nulls(self, spark):
        vals = [5.0] * 10 + [9.0] + [5.0] * 5
        vals[3] = None
        t = TSDF(_mk(spark, vals), ts_col="ts", series_ids=["sym"])
        got = t.withHampel("v", window=5).df.orderBy("ts").collect()
        # windows containing the NULL never flag
        assert all(
            r.is_outlier is None for r in got[:8]
        )  # head: not full / null-contaminated
        assert got[10].is_outlier is True  # 9.0 vs zero-MAD window of 5s
        assert got[9].is_outlier is False


class TestRollingQuantileHampelReviewR12:
    def test_guards(self, spark):
        t = TSDF(_mk(spark, [1.0, 2.0, 3.0]), ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="value_col"):
            t.withRollingQuantile("nope", 3)
        with pytest.raises(ValueError, match="value_col"):
            t.withHampel("nope")
        with pytest.raises(ValueError, match="must differ"):
            t.withHampel("v", out_flag="x", out_filtered="x")
        with pytest.raises(ValueError, match="QUANTILE_CASE_MAX"):
            t.withRollingQuantile("v", 200, 0.5, min_periods=1)
