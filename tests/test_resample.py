import datetime as dt

import pytest

from tempo_spark import TSDF


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def metrics(spark):
    rows = [
        ("A", ts("2020-01-01 00:00:10"), 1.0, 10.0),
        ("A", ts("2020-01-01 00:00:40"), 2.0, 20.0),
        ("A", ts("2020-01-01 00:01:05"), 3.0, 30.0),
        # gap: no data in 00:02 bucket
        ("A", ts("2020-01-01 00:03:20"), 4.0, 40.0),
        ("B", ts("2020-01-01 00:00:05"), 10.0, 100.0),
        ("B", ts("2020-01-01 00:02:10"), 12.0, None),
    ]
    df = spark.createDataFrame(
        rows, "k string, event_ts timestamp, v double, w double"
    )
    return TSDF(df, ts_col="event_ts", series_ids=["k"])


class TestResample:
    def test_mean(self, metrics):
        out = metrics.resample("1 minute", "mean").df
        rows = {(r.k, str(r.event_ts)): r for r in out.collect()}
        assert rows[("A", "2020-01-01 00:00:00")].v == pytest.approx(1.5)
        assert rows[("A", "2020-01-01 00:01:00")].v == pytest.approx(3.0)
        assert ("A", "2020-01-01 00:02:00") not in rows  # empty bucket absent
        assert rows[("B", "2020-01-01 00:02:00")].w is None  # null stays null

    def test_min_max(self, metrics):
        mn = metrics.resample("1 minute", "min").df.collect()
        mx = metrics.resample("1 minute", "max").df.collect()
        mnr = {(r.k, str(r.event_ts)): r.v for r in mn}
        mxr = {(r.k, str(r.event_ts)): r.v for r in mx}
        assert mnr[("A", "2020-01-01 00:00:00")] == 1.0
        assert mxr[("A", "2020-01-01 00:00:00")] == 2.0

    def test_floor_ceil(self, metrics):
        fl = metrics.resample("1 minute", "floor").df
        ce = metrics.resample("1 minute", "ceil").df
        flr = {(r.k, str(r.event_ts)): (r.v, r.w) for r in fl.collect()}
        cer = {(r.k, str(r.event_ts)): (r.v, r.w) for r in ce.collect()}
        # floor takes the EARLIEST row's values, ceil the LATEST's
        assert flr[("A", "2020-01-01 00:00:00")] == (1.0, 10.0)
        assert cer[("A", "2020-01-01 00:00:00")] == (2.0, 20.0)

    def test_prefix(self, metrics):
        out = metrics.resample("1 minute", "mean", prefix="mean").df
        assert "mean_v" in out.columns and "mean_w" in out.columns

    def test_fill(self, metrics):
        out = metrics.resample("1 minute", "mean", fill=True).df
        rows = {(r.k, str(r.event_ts)): r for r in out.collect()}
        # A spans 00:00–00:03 → 4 buckets; B spans 00:00–00:02 → 3 buckets
        assert len([k for k in rows if k[0] == "A"]) == 4
        assert len([k for k in rows if k[0] == "B"]) == 3
        # synthesized bucket zero-filled
        assert rows[("A", "2020-01-01 00:02:00")].v == 0.0

    def test_bad_func(self, metrics):
        with pytest.raises(ValueError, match="func"):
            metrics.resample("1 minute", "mode")

    def test_millis(self, spark):
        rows = [
            ("A", ts("2020-01-01 00:00:10.000"), 1.0),
            ("A", ts("2020-01-01 00:00:10.330"), 2.0),
            ("A", ts("2020-01-01 00:00:10.600"), 3.0),
        ]
        t = TSDF(
            spark.createDataFrame(rows, "k string, event_ts timestamp, v double"),
            series_ids=["k"],
        )
        out = t.resample("500 ms", "mean").df.collect()
        vals = {str(r.event_ts): r.v for r in out}
        assert vals["2020-01-01 00:00:10"] == pytest.approx(1.5)
        assert vals["2020-01-01 00:00:10.500000"] == pytest.approx(3.0)


class TestBars:
    def test_ohlc(self, metrics):
        out = metrics.calc_bars("1 minute").df
        rows = {(r.k, str(r.event_ts)): r for r in out.collect()}
        r = rows[("A", "2020-01-01 00:00:00")]
        assert (r.open_v, r.low_v, r.high_v, r.close_v) == (1.0, 1.0, 2.0, 2.0)
        assert (r.open_w, r.low_w, r.high_w, r.close_w) == (10.0, 10.0, 20.0, 20.0)

    def test_ohlc_single_row_bucket(self, metrics):
        out = metrics.calc_bars("1 minute").df
        rows = {(r.k, str(r.event_ts)): r for r in out.collect()}
        r = rows[("A", "2020-01-01 00:03:00")]
        assert (r.open_v, r.low_v, r.high_v, r.close_v) == (4.0, 4.0, 4.0, 4.0)


class TestFreqParse:
    def test_parse(self):
        from tempo_spark.functions.freq import parse_freq

        assert parse_freq("30 seconds").seconds == 30
        assert parse_freq("sec").seconds == 1
        assert parse_freq("5 min").seconds == 300
        assert parse_freq("1 hr").seconds == 3600
        assert parse_freq("day").seconds == 86400
        assert parse_freq("30s").seconds == 30
        assert parse_freq("500 ms").seconds == 0.5
        with pytest.raises(ValueError):
            parse_freq("fortnight")
        with pytest.raises(ValueError):
            parse_freq("-5 sec")


class TestInterpolation:
    def test_zero_fill(self, metrics):
        out = metrics.resample("1 minute", "mean").interpolate("zero").df
        rows = {(r.k, str(r.event_ts)): r for r in out.collect()}
        assert rows[("A", "2020-01-01 00:02:00")].v == 0.0
        assert rows[("B", "2020-01-01 00:01:00")].v == 0.0
        # B's null w at 00:02 also zero-filled
        assert rows[("B", "2020-01-01 00:02:00")].w == 0.0

    def test_null_fill(self, metrics):
        out = metrics.resample("1 minute", "mean").interpolate(
            "null", show_interpolated=True
        ).df
        rows = {(r.k, str(r.event_ts)): r for r in out.collect()}
        r = rows[("A", "2020-01-01 00:02:00")]
        assert r.v is None and r.is_ts_interpolated and r.is_interpolated_v

    def test_ffill(self, metrics):
        out = metrics.resample("1 minute", "mean").interpolate("ffill").df
        rows = {(r.k, str(r.event_ts)): r for r in out.collect()}
        assert rows[("A", "2020-01-01 00:02:00")].v == pytest.approx(3.0)

    def test_bfill(self, metrics):
        out = metrics.resample("1 minute", "mean").interpolate("bfill").df
        rows = {(r.k, str(r.event_ts)): r for r in out.collect()}
        assert rows[("A", "2020-01-01 00:02:00")].v == pytest.approx(4.0)

    def test_linear(self, metrics):
        out = metrics.resample("1 minute", "mean").interpolate(
            "linear", show_interpolated=True
        ).df
        rows = {(r.k, str(r.event_ts)): r for r in out.collect()}
        # A: bucket means at 00:01 → 3.0, 00:03 → 4.0; 00:02 is midway → 3.5
        r = rows[("A", "2020-01-01 00:02:00")]
        assert r.v == pytest.approx(3.5)
        assert r.is_ts_interpolated and r.is_interpolated_v
        # edges stay null-free: original buckets untouched
        assert rows[("A", "2020-01-01 00:01:00")].v == pytest.approx(3.0)

    def test_linear_edge_stays_null(self, spark):
        rows = [
            ("A", ts("2020-01-01 00:00:30"), None),
            ("A", ts("2020-01-01 00:01:30"), 2.0),
        ]
        t = TSDF(
            spark.createDataFrame(rows, "k string, event_ts timestamp, v double"),
            series_ids=["k"],
        )
        out = t.interpolate("linear", freq="1 minute", func="mean", show_interpolated=True).df
        r = {str(r.event_ts): r for r in out.collect()}
        # leading null has no prev value → stays null
        assert r["2020-01-01 00:00:00"].v is None

    def test_direct_interpolate_from_raw(self, metrics):
        out = metrics.interpolate("ffill", freq="1 minute", func="mean").df
        rows = {(r.k, str(r.event_ts)): r for r in out.collect()}
        assert rows[("A", "2020-01-01 00:02:00")].v == pytest.approx(3.0)

    def test_linear_requires_numeric(self, spark):
        rows = [("A", ts("2020-01-01 00:00:30"), "x")]
        df = spark.createDataFrame(rows, "k string, event_ts timestamp, s string")
        t = TSDF(df, series_ids=["k"])
        with pytest.raises(ValueError, match="numeric"):
            from tempo_spark.operators.interpolation import interpolate

            interpolate(t, "1 minute", "floor", "linear", target_cols=["s"])


class TestResampleSequenceTiebreak:
    def test_floor_uses_sequence(self, spark):
        rows = [
            ("A", ts("2020-01-01 00:00:10"), 2, 200.0),
            ("A", ts("2020-01-01 00:00:10"), 1, 100.0),  # same ts, lower seq
        ]
        t = TSDF(
            spark.createDataFrame(
                rows, "k string, event_ts timestamp, seq long, v double"
            ),
            series_ids=["k"],
            sequence_col="seq",
        )
        fl = t.resample("1 minute", "floor").df.collect()
        ce = t.resample("1 minute", "ceil").df.collect()
        assert fl[0].v == 100.0  # lowest (ts, seq) wins for floor
        assert ce[0].v == 200.0


class TestResampleExtraFuncs:
    def test_sum_count_median(self, spark):
        import datetime as dt

        from tempo_spark import TSDF

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("A", base + dt.timedelta(seconds=s), float(v))
            for s, v in [(0, 1.0), (10, 2.0), (20, 6.0), (70, 4.0)]
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, m double")
        t = TSDF(df, ts_col="ts", series_ids=["k"])
        got_sum = {r.ts.minute: r.m for r in t.resample("1 minute", "sum").df.collect()}
        assert got_sum == {0: 9.0, 1: 4.0}
        got_cnt = {r.ts.minute: r.m for r in t.resample("1 minute", "count").df.collect()}
        assert got_cnt == {0: 3, 1: 1}
        got_med = {r.ts.minute: r.m for r in t.resample("1 minute", "median").df.collect()}
        assert got_med == {0: 2.0, 1: 4.0}

    def test_bad_func_still_raises(self, spark):
        import datetime as dt

        import pytest as _pytest

        from tempo_spark import TSDF

        df = spark.createDataFrame(
            [("A", dt.datetime(2024, 1, 1), 1.0)], "k string, ts timestamp, m double"
        )
        with _pytest.raises(ValueError):
            TSDF(df, ts_col="ts", series_ids=["k"]).resample("1 minute", "mode")


class TestPerColumnFuncs:
    def _tsdf(self, spark):
        import datetime as dt

        t0 = dt.datetime(2020, 1, 1)
        rows = [
            ("A", t0 + dt.timedelta(seconds=10), 10.0, 100.0),
            ("A", t0 + dt.timedelta(seconds=40), 20.0, 300.0),
            ("A", t0 + dt.timedelta(seconds=70), 30.0, 50.0),
        ]
        from tempo_spark import TSDF

        return TSDF(
            spark.createDataFrame(rows, "k string, ts timestamp, price double, vol double"),
            ts_col="ts",
            series_ids=["k"],
        )

    def test_dict_func_single_shuffle(self, spark):
        from tempo_spark.plans.inspect import count_exchanges

        t = self._tsdf(spark)
        out = t.resample("1 minute", {"price": "mean", "vol": "sum"})
        assert count_exchanges(out.df) == 1
        rows = {str(r.ts): (r.price, r.vol) for r in out.df.collect()}
        assert rows["2020-01-01 00:00:00"] == (15.0, 400.0)
        assert rows["2020-01-01 00:01:00"] == (30.0, 50.0)

    def test_fill_plan_shape(self, spark):
        # fill=True plans TWO exchanges (the (series, bucket) agg's — its
        # first shuffle carries map-side-COMBINED partials — then the
        # per-series fill window's). An automatic pre-partition collapsing
        # them to one was tried and REVERTED: same-session A/Bs measured
        # it slower on every shape (negative-result note in resample());
        # the explicit one-exchange chain is TSDF.repartitioned()
        from tempo_spark.plans.inspect import count_exchanges

        t = self._tsdf(spark)
        out = t.resample("1 minute", "mean", fill=True)
        assert count_exchanges(out.df) == 2
        assert count_exchanges(t.calc_bars("1 minute", fill=True).df) == 2
        # opt-in collapse via the existing explicit idiom
        assert count_exchanges(
            t.repartitioned().resample("1 minute", "mean", fill=True).df
        ) == 1
        # one-call interpolate == the chained form, values identical
        one_call = t.interpolate("linear", freq="1 minute", func="mean")
        assert count_exchanges(one_call.df) == 2
        chained = t.resample("1 minute", "mean").interpolate("linear")
        assert sorted(map(tuple, one_call.df.collect())) == sorted(
            map(tuple, chained.df.collect())
        )

    def test_dict_func_validation(self, spark):
        t = self._tsdf(spark)
        with pytest.raises(ValueError):
            t.resample("1 minute", {})
        with pytest.raises(ValueError):
            t.resample("1 minute", {"price": "floor"})
        with pytest.raises(ValueError):
            t.resample("1 minute", {"nope": "mean"})
        with pytest.raises(ValueError):
            t.resample("1 minute", {"price": "mean"}, metricCols=["vol"])

    def test_dict_then_interpolate_needs_explicit_func(self, spark):
        t = self._tsdf(spark)
        res = t.resample("1 minute", {"price": "mean"})
        with pytest.raises(ValueError, match="per-column"):
            res.interpolate("linear")
        # explicit scalar func unblocks the chain
        out = res.interpolate("linear", func="mean").df
        assert out.count() >= 2


class TestThirdReviewFixes:
    def test_dict_func_rejects_structural_keys(self, spark):
        import datetime as dt

        from tempo_spark import TSDF

        df = spark.createDataFrame(
            [("A", dt.datetime(2020, 1, 1), 1.0)], "k string, ts timestamp, v double"
        )
        t = TSDF(df, ts_col="ts", series_ids=["k"])
        for bad in ({"ts": "count"}, {"k": "count"}):
            with pytest.raises(ValueError, match="structural"):
                t.resample("1 minute", bad)


class TestResampleRollup:
    """Multi-grain rollup: one raw shuffle, partials re-aggregated upward."""

    def _tsdf(self, spark):
        import datetime as dt
        import random

        from tempo_spark import TSDF

        random.seed(3)
        base = dt.datetime(2024, 1, 1)
        rows = []
        for s in ("A", "B"):
            for i in range(200):
                rows.append(
                    (
                        s,
                        base + dt.timedelta(seconds=random.randint(0, 7200)),
                        random.randint(-500, 500),
                        random.random() * 10,
                    )
                )
        # some null metrics so count/mean null-handling is exercised
        rows.append(("A", base + dt.timedelta(seconds=9000), None, None))
        df = spark.createDataFrame(
            rows, "sym string, ts timestamp, cents long, value double"
        )
        return TSDF(df, ts_col="ts", series_ids=["sym"])

    def _collect_map(self, df, val_cols):
        return {
            (r.grain if "grain" in df.columns else None, r.sym, r.ts): tuple(
                r[c] for c in val_cols
            )
            for r in df.collect()
        }

    def test_rollup_matches_per_grain_resample(self, spark):
        t = self._tsdf(spark)
        grains = ["5 minutes", "15 minutes", "1 hour"]
        roll = t.resample_rollup(grains, {"cents": "sum", "value": "mean"})
        got = {
            (r.grain, r.sym, r.ts): (r.cents, r.value)
            for r in roll.collect()
        }
        n_per_grain = {}
        for g in grains:
            direct = t.resample(g, {"cents": "sum", "value": "mean"}).df
            for r in direct.collect():
                want_c, want_v = r.cents, r.value
                gc, gv = got[(g, r.sym, r.ts)]
                assert gc == want_c, (g, r.sym, r.ts)
                if want_v is None:
                    assert gv is None
                else:
                    # integral partial sums are exact; double mean differs
                    # from direct avg only in summation association
                    assert abs(gv - want_v) < 1e-9, (g, r.sym, r.ts)
                n_per_grain[g] = n_per_grain.get(g, 0) + 1
        # row counts match exactly per grain
        from collections import Counter

        roll_counts = Counter(k[0] for k in got)
        assert dict(roll_counts) == n_per_grain

    def test_rollup_scalar_funcs_exact(self, spark):
        t = self._tsdf(spark)
        grains = ["10 minutes", "1 hour"]
        for func in ("sum", "count", "min", "max"):
            roll = t.resample_rollup(grains, func, metricCols=["cents"])
            got = {(r.grain, r.sym, r.ts): r.cents for r in roll.collect()}
            for g in grains:
                for r in t.resample(g, func, metricCols=["cents"]).df.collect():
                    assert got[(g, r.sym, r.ts)] == r.cents, (func, g)

    def test_rollup_floor_ceil_whole_row(self, spark):
        t = self._tsdf(spark)
        grains = ["10 minutes", "1 hour"]
        for func in ("floor", "ceil"):
            roll = t.resample_rollup(grains, func)
            got = {
                (r.grain, r.sym, r.ts): (r.cents, r.value)
                for r in roll.collect()
            }
            for g in grains:
                for r in t.resample(g, func).df.collect():
                    assert got[(g, r.sym, r.ts)] == (r.cents, r.value), (func, g)

    def test_rollup_two_exchanges(self, spark):
        from tempo_spark.plans.inspect import count_exchanges

        t = self._tsdf(spark)
        roll = t.resample_rollup(["5 minutes", "1 hour"], "sum")
        assert count_exchanges(roll) == 2

    def test_rollup_validations(self, spark):
        t = self._tsdf(spark)
        with pytest.raises(ValueError, match=">= 2 grains"):
            t.resample_rollup(["5 minutes"], "sum")
        with pytest.raises(TypeError, match="sequence"):
            t.resample_rollup("5 minutes", "sum")
        with pytest.raises(ValueError, match="integer multiple"):
            t.resample_rollup(["7 minutes", "10 minutes"], "sum")
        with pytest.raises(ValueError, match="duplicate"):
            t.resample_rollup(["5 minutes", "300 seconds"], "sum")
        with pytest.raises(ValueError, match="median"):
            t.resample_rollup(["5 minutes", "10 minutes"], "median")
        with pytest.raises(ValueError, match="median"):
            t.resample_rollup(["5 minutes", "10 minutes"], {"cents": "median"})
        with pytest.raises(ValueError, match="not both"):
            t.resample_rollup(
                ["5 minutes", "10 minutes"], {"cents": "sum"}, metricCols=["cents"]
            )
        with pytest.raises(ValueError, match="structural"):
            t.resample_rollup(["5 minutes", "10 minutes"], {"sym": "count"})
        with pytest.raises(ValueError, match="collides"):
            t.resample_rollup(["5 minutes", "10 minutes"], "sum", grain_col="sym")

    def test_rollup_all_null_bucket_mean_is_null(self, spark):
        import datetime as dt

        from tempo_spark import TSDF

        df = spark.createDataFrame(
            [
                ("A", dt.datetime(2024, 1, 1, 0, 0, 1), None),
                ("A", dt.datetime(2024, 1, 1, 0, 0, 2), None),
                ("A", dt.datetime(2024, 1, 1, 1, 0, 1), 4.0),
            ],
            "sym string, ts timestamp, v double",
        )
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        rows = {
            (r.grain, r.ts): r.v
            for r in t.resample_rollup(["5 minutes", "1 hour"], "mean").collect()
        }
        assert rows[("1 hour", dt.datetime(2024, 1, 1, 0, 0))] is None
        assert rows[("1 hour", dt.datetime(2024, 1, 1, 1, 0))] == 4.0


class TestCalcBarsRollup:
    def test_matches_per_grain_calc_bars(self, spark):
        import datetime as dt
        import random

        from tempo_spark import TSDF

        random.seed(9)
        base = dt.datetime(2024, 1, 1)
        rows = [
            (
                s,
                base + dt.timedelta(seconds=random.randint(0, 7200)),
                random.random() * 100,
            )
            for s in ("A", "B")
            for _ in range(300)
        ]
        df = spark.createDataFrame(rows, "sym string, ts timestamp, px double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        grains = ["10 minutes", "1 hour"]
        roll = t.calc_bars_rollup(grains)
        got = {
            (r.grain, r.sym, r.ts): (r.open_px, r.low_px, r.high_px, r.close_px)
            for r in roll.collect()
        }
        n = 0
        for g in grains:
            for r in t.calc_bars(g).df.collect():
                assert got[(g, r.sym, r.ts)] == (
                    r.open_px, r.low_px, r.high_px, r.close_px
                ), (g, r.sym, r.ts)
                n += 1
        assert n == len(got)

    def test_validations(self, spark):
        import datetime as dt

        import pytest

        from tempo_spark import TSDF

        df = spark.createDataFrame(
            [("A", dt.datetime(2024, 1, 1), 1.0)],
            "sym string, ts timestamp, px double",
        )
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="integer multiple"):
            t.calc_bars_rollup(["7 minutes", "10 minutes"])
        with pytest.raises(ValueError, match="output column"):
            t.calc_bars_rollup(["5 minutes", "10 minutes"], grain_col="open_px")


class TestAnchoredResample:
    """r12: pandas-style origin/closed/label anchoring."""

    def _mk(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 9, 30)
        rows = [
            ("a", base + dt.timedelta(minutes=m), float(m)) for m in range(120)
        ]
        return spark.createDataFrame(rows, "sym string, ts timestamp, v double")

    def test_origin_anchors_session_grid(self, spark):
        import datetime as dt

        from tempo_spark import TSDF

        t = TSDF(self._mk(spark), ts_col="ts", series_ids=["sym"])
        out = t.resample(
            "1 hour", "count", origin="2024-01-01 09:30:00"
        ).df.orderBy("ts").collect()
        # grid phases at :30 — two full 60-row buckets
        assert [str(r.ts) for r in out] == [
            "2024-01-01 09:30:00", "2024-01-01 10:30:00",
        ]
        assert [r.v for r in out] == [60, 60]
        # default epoch anchor splits 09:30-11:30 across three :00 buckets
        dflt = t.resample("1 hour", "count").df.orderBy("ts").collect()
        assert [r.v for r in dflt] == [30, 60, 30]

    def test_closed_right_and_label_right(self, spark):
        import datetime as dt

        from tempo_spark import TSDF

        base = dt.datetime(2024, 1, 1)
        rows = [("a", base + dt.timedelta(minutes=m), 1.0) for m in (0, 30, 60)]
        df = spark.createDataFrame(rows, "sym string, ts timestamp, v double")
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        # left-closed: 00:00 and 00:30 in bucket 00:00; 01:00 in 01:00
        lc = {str(r.ts): r.v for r in t.resample("1 hour", "count").df.collect()}
        assert lc == {"2024-01-01 00:00:00": 2, "2024-01-01 01:00:00": 1}
        # right-closed: 00:00 belongs to the PRECEDING bucket (23:00-00:00]
        rc = {str(r.ts): r.v
              for r in t.resample("1 hour", "count", closed="right").df.collect()}
        assert rc == {
            "2023-12-31 23:00:00": 1,  # the 00:00 row
            "2024-01-01 00:00:00": 2,  # 00:30 and 01:00
        }
        # label=right shifts emitted ts to the bucket END
        rl = {str(r.ts): r.v
              for r in t.resample("1 hour", "count", closed="right",
                                  label="right").df.collect()}
        assert rl == {
            "2024-01-01 00:00:00": 1,
            "2024-01-01 01:00:00": 2,
        }

    def test_validation(self, spark):
        from tempo_spark import TSDF

        t = TSDF(self._mk(spark), ts_col="ts", series_ids=["sym"])
        import pytest as _pt

        with _pt.raises(ValueError, match="closed"):
            t.resample("1 hour", "mean", closed="both")
        with _pt.raises(ValueError, match="origin must be"):
            t.resample("1 hour", "mean", origin=123)
