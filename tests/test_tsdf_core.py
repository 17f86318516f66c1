import datetime as dt

import pytest

from tempo_spark import TSDF


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tsdf(trades):
    return TSDF(trades, ts_col="event_ts", series_ids=["symbol"])


class TestConstruction:
    def test_basic(self, tsdf):
        assert tsdf.ts_col == "event_ts"
        assert tsdf.series_ids == ["symbol"]
        assert tsdf.metric_cols == ["trade_pr"]

    def test_missing_ts_col(self, trades):
        with pytest.raises(ValueError, match="ts_col"):
            TSDF(trades, ts_col="nope")

    def test_string_ts_rejected(self, spark):
        df = spark.createDataFrame([("a", "2020-01-01 00:00:00")], "k string, t string")
        with pytest.raises(ValueError, match="string"):
            TSDF(df, ts_col="t")

    def test_partition_cols_alias(self, trades):
        t = TSDF(trades, ts_col="event_ts", partition_cols=["symbol"])
        assert t.series_ids == ["symbol"]

    def test_from_string_ts(self, spark):
        # the reference's string_timestamp construction idiom, ported 1:1
        df = spark.createDataFrame(
            [("a", "2020-09-01 14:30:00", 1.0), ("a", "2020-09-01 15:00:00", 2.0)],
            "k string, string_timestamp string, v double",
        )
        t = TSDF.fromStringTs(df, "string_timestamp", series_ids=["k"])
        assert dict(t.df.dtypes)["string_timestamp"] == "timestamp"
        rows = t.latest(1).df.collect()
        assert len(rows) == 1 and rows[0].v == 2.0

    def test_from_string_ts_nanos(self, spark):
        df = spark.createDataFrame(
            [("a", "2020-01-01 00:00:00.123456789")], "k string, t string"
        )
        t = TSDF.fromStringTs(df, "t", series_ids=["k"], nanos=True)
        assert dict(t.df.dtypes)["t"] == "double"
        [row] = t.df.collect()
        # sub-microsecond digits survive (to_timestamp would truncate)
        assert abs(row.t - 1577836800.123456789) < 1e-9

    def test_from_string_ts_passthrough(self, trades):
        t = TSDF.fromStringTs(trades, "event_ts", series_ids=["symbol"])
        assert dict(t.df.dtypes)["event_ts"] == "timestamp"

    def test_constructor_parse_string_ts_opt_in(self, spark):
        # reference constructor sugar (python/tempo/tsdf.py:70), opt-in:
        # TSDF(df, ts, parse_string_ts=True) == TSDF.fromStringTs(df, ts)
        df = spark.createDataFrame(
            [("a", "2020-09-01 14:30:00", 1.0)],
            "k string, ts string, v double",
        )
        t = TSDF(df, ts_col="ts", series_ids=["k"], parse_string_ts=True)
        assert dict(t.df.dtypes)["ts"] == "timestamp"
        # default stays strict, and the error names the opt-in
        with pytest.raises(ValueError, match="parse_string_ts"):
            TSDF(df, ts_col="ts", series_ids=["k"])
        # time-like columns pass through unchanged under the flag
        t2 = TSDF(t.df, ts_col="ts", series_ids=["k"], parse_string_ts=True)
        assert dict(t2.df.dtypes)["ts"] == "timestamp"

    def test_show_k_validation(self, tsdf, capsys):
        with pytest.raises(ValueError, match="cannot be greater"):
            tsdf.show(n=3, k=5)
        tsdf.show(n=10, k=1)  # k most-recent per series
        out = capsys.readouterr().out
        assert "362.1" in out and "349.21" not in out


class TestSlicing:
    def test_at(self, tsdf):
        out = tsdf.at("2020-08-01 00:00:10").df.collect()
        assert len(out) == 1 and out[0].trade_pr == 349.21

    def test_before_after(self, tsdf):
        assert tsdf.before("2020-08-01 00:01:10").df.count() == 1
        assert tsdf.atOrBefore("2020-08-01 00:01:10").df.count() == 2
        assert tsdf.after("2020-09-01 00:02:10").df.count() == 2
        assert tsdf.atOrAfter("2020-09-01 00:02:10").df.count() == 4

    def test_between(self, tsdf):
        assert tsdf.between("2020-08-01 00:01:10", "2020-09-01 00:02:10").df.count() == 5
        assert (
            tsdf.between("2020-08-01 00:01:10", "2020-09-01 00:02:10", inclusive=False)
            .df.count()
            == 2
        )


class TestTopK:
    def test_earliest_latest(self, tsdf):
        earliest = {(r.symbol, r.trade_pr) for r in tsdf.earliest(1).df.collect()}
        assert earliest == {("S1", 349.21), ("S2", 743.01)}
        latest = {(r.symbol, r.trade_pr) for r in tsdf.latest(1).df.collect()}
        assert latest == {("S1", 362.10), ("S2", 762.33)}

    def test_latest_n(self, tsdf):
        out = tsdf.latest(2).df
        assert out.count() == 4

    def test_prior_subsequent(self, tsdf):
        prior = {(r.symbol, r.trade_pr) for r in tsdf.priorTo("2020-09-01 00:02:10").df.collect()}
        assert prior == {("S1", 361.10), ("S2", 761.10)}
        sub = {(r.symbol, r.trade_pr) for r in tsdf.subsequentTo("2020-08-02 00:00:00").df.collect()}
        assert sub == {("S1", 361.10), ("S2", 761.10)}


class TestSelect:
    def test_select_keeps_structural(self, tsdf):
        out = tsdf.select("trade_pr")
        assert set(out.df.columns) == {"event_ts", "symbol", "trade_pr"}


class TestStats:
    def test_range_stats(self, tsdf):
        out = tsdf.withRangeStats(rangeBackWindowSecs=120).df
        cols = set(out.columns)
        for stat in ("mean", "count", "min", "max", "sum", "stddev", "zscore"):
            assert f"{stat}_trade_pr" in cols
        rows = {(r.symbol, str(r.event_ts)): r for r in out.collect()}
        r = rows[("S1", "2020-08-01 00:01:12")]
        assert r.count_trade_pr == 2
        assert r.mean_trade_pr == pytest.approx((349.21 + 351.32) / 2)
        # first row per series: only itself in the window
        r0 = rows[("S1", "2020-08-01 00:00:10")]
        assert r0.count_trade_pr == 1 and r0.stddev_trade_pr is None

    def test_grouped_stats(self, tsdf):
        out = tsdf.withGroupedStats(freq="1 minute").df
        rows = {(r.symbol, str(r.event_ts)): r for r in out.collect()}
        r = rows[("S2", "2020-08-01 00:01:00")]
        assert r.count_trade_pr == 2
        assert r.mean_trade_pr == pytest.approx((743.01 + 751.92) / 2)

    def test_ema(self, tsdf):
        out = tsdf.EMA("trade_pr", window=2, exp_factor=0.5).df
        rows = {(r.symbol, str(r.event_ts)): r for r in out.collect()}
        # second row of S1: 0.5*351.32 + 0.25*349.21
        assert rows[("S1", "2020-08-01 00:01:12")]["ema_trade_pr"] == pytest.approx(
            0.5 * 351.32 + 0.25 * 349.21
        )

    def test_lookback_features(self, tsdf):
        out = tsdf.withLookbackFeatures(["trade_pr"], 2).df
        rows = out.collect()
        # with exactSize=True only rows with a full 2-row lookback remain
        assert all(len(r.features) == 2 for r in rows)
        assert len(rows) == 4

    def test_vwap(self, spark):
        import datetime as dt

        rows = [
            ("S1", dt.datetime(2020, 8, 1, 0, 0, 10), 100.0, 10.0),
            ("S1", dt.datetime(2020, 8, 1, 0, 0, 50), 102.0, 30.0),
            ("S1", dt.datetime(2020, 8, 1, 0, 1, 10), 104.0, 10.0),
        ]
        df = spark.createDataFrame(rows, "symbol string, event_ts timestamp, price double, volume double")
        t = TSDF(df, ts_col="event_ts", series_ids=["symbol"])
        out = t.vwap(frequency="m", volume_col="volume", price_col="price").df.collect()
        by_ts = {str(r.event_ts): r for r in out}
        assert by_ts["2020-08-01 00:00:00"].vwap == pytest.approx(
            (100.0 * 10 + 102.0 * 30) / 40
        )
        assert by_ts["2020-08-01 00:01:00"].vwap == pytest.approx(104.0)


class TestDescribe:
    def test_describe(self, tsdf):
        out = tsdf.describe()
        rows = {r.summary: r for r in out.collect()}
        assert "unique_time_series_count" in rows
        assert "min_ts" in rows and "max_ts" in rows
        # reference parity: per-column null percentage row
        assert float(rows["missing_vals_pct"].trade_pr) == 0.0


class TestTimestampNTZ:
    def test_ops_on_ntz(self, spark):
        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [("A", "2020-01-01 00:00:10", 1.0), ("A", "2020-01-01 00:02:40", 2.0)],
            "k string, ts string, v double",
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        t = TSDF(df, ts_col="ts", series_ids=["k"])
        assert t.latest(1).df.collect()[0].v == 2.0
        res = t.resample("1 minute", "mean").df.collect()
        assert len(res) == 2
        stats = t.withRangeStats(rangeBackWindowSecs=300).df.collect()
        assert {r.count_v for r in stats} == {1, 2}


class TestPassthroughs:
    def test_union(self, tsdf):
        u = tsdf.union(tsdf)
        assert u.df.count() == 2 * tsdf.df.count()
        ub = tsdf.unionByName(tsdf)
        assert ub.df.count() == 2 * tsdf.df.count()

    def test_drop_structural_raises(self, tsdf):
        with pytest.raises(ValueError, match="structural"):
            tsdf.drop("event_ts")

    def test_drop_metric(self, tsdf):
        assert "trade_pr" not in tsdf.drop("trade_pr").df.columns


class TestMultiSeriesIds:
    @pytest.fixture(scope="class")
    def multi(self, spark):
        rows = [
            ("X", "p1", ts("2020-01-01 00:00:10"), 1.0),
            ("X", "p1", ts("2020-01-01 00:01:10"), 2.0),
            ("X", "p2", ts("2020-01-01 00:00:20"), 3.0),
            ("Y", "p1", ts("2020-01-01 00:00:30"), 4.0),
            ("Y", "p1", ts("2020-01-01 00:02:30"), 5.0),
        ]
        df = spark.createDataFrame(
            rows, "a string, b string, event_ts timestamp, v double"
        )
        return TSDF(df, ts_col="event_ts", series_ids=["a", "b"])

    def test_latest_per_composite_series(self, multi):
        out = {(r.a, r.b): r.v for r in multi.latest(1).df.collect()}
        assert out == {("X", "p1"): 2.0, ("X", "p2"): 3.0, ("Y", "p1"): 5.0}

    def test_asof_two_ids(self, multi, spark):
        quotes = spark.createDataFrame(
            [("X", "p1", ts("2020-01-01 00:00:05"), 10.0),
             ("Y", "p1", ts("2020-01-01 00:01:00"), 20.0)],
            "a string, b string, event_ts timestamp, q double",
        )
        right = TSDF(quotes, ts_col="event_ts", series_ids=["a", "b"])
        out = multi.asofJoin(right, left_prefix="l").df.collect()
        got = {(r.a, r.b, str(r.l_event_ts)): r.right_q for r in out}
        assert got[("X", "p1", "2020-01-01 00:00:10")] == 10.0
        assert got[("X", "p2", "2020-01-01 00:00:20")] is None  # no X/p2 quote
        assert got[("Y", "p1", "2020-01-01 00:02:30")] == 20.0

    def test_resample_interpolate_two_ids(self, multi):
        out = multi.resample("1 minute", "mean").interpolate("ffill").df
        rows = {(r.a, r.b, str(r.event_ts)): r.v for r in out.collect()}
        # Y/p1 has a gap at 00:01 → forward-filled from 00:00
        assert rows[("Y", "p1", "2020-01-01 00:01:00")] == pytest.approx(4.0)

    def test_disjoint_two_series_ids(self, spark):
        from tempo_spark import IntervalsDF

        rows = [
            (ts("2020-01-01 00:00:00"), ts("2020-01-01 00:02:00"), "X", "p1", 1),
            (ts("2020-01-01 00:01:00"), ts("2020-01-01 00:03:00"), "X", "p1", 2),
            (ts("2020-01-01 00:01:00"), ts("2020-01-01 00:03:00"), "X", "p2", 9),
        ]
        df = spark.createDataFrame(
            rows, "start_ts timestamp, end_ts timestamp, s1 string, s2 string, m int"
        )
        out = IntervalsDF(df, "start_ts", "end_ts", ["s1", "s2"]).make_disjoint().df
        segs = sorted((r.s1, r.s2, str(r.start_ts), str(r.end_ts), r.m) for r in out.collect())
        # reference partial-overlap semantics (kernel goldens, round 7):
        # the EARLIER-starting interval's value wins the overlap segment,
        # and the cut at its end is kept; p2 isolated by the second id
        assert segs == [
            ("X", "p1", "2020-01-01 00:00:00", "2020-01-01 00:01:00", 1),
            ("X", "p1", "2020-01-01 00:01:00", "2020-01-01 00:02:00", 1),
            ("X", "p1", "2020-01-01 00:02:00", "2020-01-01 00:03:00", 2),
            ("X", "p2", "2020-01-01 00:01:00", "2020-01-01 00:03:00", 9),
        ]


class TestMetadataSetters:
    def test_setters(self, trades):
        t = TSDF(trades, ts_col="event_ts", series_ids=["symbol"])
        t2 = t.withPartitionCols([])
        assert t2.series_ids == [] and t2.ts_col == "event_ts"
        t3 = t.withTsCol("event_ts")
        assert t3.series_ids == ["symbol"]
        with pytest.raises(ValueError):
            t.withTsCol("nope")

    def test_describe_granularity(self, tsdf):
        out = {r.summary: r for r in tsdf.describe().collect()}
        assert "granularity" in out
        # describe() omits ts columns, so ts-derived rows land on the first
        # value column; trades have second-level timestamps
        row = out["granularity"]
        values = [v for v in row[1:] if v is not None]
        assert values == ["second"]
        min_row = [v for v in out["min_ts"][1:] if v is not None]
        assert min_row and min_row[0].startswith("2020-08-01")

    def test_describe_ts_only_frame(self, spark):
        """No describe-able columns besides the timestamp must not raise
        (ADVICE r1: value_cols[0] IndexError) — the ts-derived rows still
        come back."""
        import datetime as dt

        from tempo_spark import TSDF

        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 0, 0, 5),), (dt.datetime(2024, 1, 1, 0, 0, 9),)],
            "ts timestamp",
        )
        out = {r.summary: r for r in TSDF(df, ts_col="ts", series_ids=[]).describe().collect()}
        assert out["granularity"].ts == "second"
        assert out["min_ts"].ts.startswith("2024-01-01")
        assert out["unique_time_series_count"].ts == "1"


class TestGranularityHistogram:
    def test_mixed_granularities(self, spark):
        import datetime as dt

        import pyspark.sql.functions as F

        from tempo_spark import TSDF

        rows = [
            # series A: second-level
            ("A", dt.datetime(2024, 1, 1, 0, 0, 7)),
            ("A", dt.datetime(2024, 1, 1, 0, 1, 0)),
            # series B: minute-level
            ("B", dt.datetime(2024, 1, 1, 0, 5, 0)),
            ("B", dt.datetime(2024, 1, 1, 1, 6, 0)),
            # series C: day-level
            ("C", dt.datetime(2024, 1, 2)),
            ("C", dt.datetime(2024, 1, 3)),
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp")
        out = TSDF(df, ts_col="ts", series_ids=["k"]).granularity_histogram()
        got = {r.granularity: r.n_series for r in out.collect()}
        assert got == {"second": 1, "minute": 1, "day": 1}

    def test_no_series_ids_single_global_series(self, spark):
        import datetime as dt

        from tempo_spark import TSDF

        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 0, 0, 1),)], "ts timestamp"
        )
        out = TSDF(df, ts_col="ts", series_ids=[]).granularity_histogram()
        assert [(r.granularity, r.n_series) for r in out.collect()] == [("second", 1)]

    def test_negative_epoch_timestamps(self, spark):
        """Pre-1970 timestamps give negative % remainders; classification
        must still see second-level offsets (ADVICE r1: > 0 misclassified
        them as coarser)."""
        import datetime as dt

        from tempo_spark import TSDF

        rows = [
            ("N", dt.datetime(1960, 1, 1, 0, 0, 7)),
            ("N", dt.datetime(1960, 1, 1, 0, 0, 30)),
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp")
        out = TSDF(df, ts_col="ts", series_ids=["k"]).granularity_histogram()
        assert [(r.granularity, r.n_series) for r in out.collect()] == [("second", 1)]


class TestRangeStatsPercentiles:
    def test_rolling_percentiles(self, spark):
        import datetime as dt

        from tempo_spark import TSDF

        base = dt.datetime(2024, 1, 1)
        rows = [("A", base + dt.timedelta(seconds=s), float(v))
                for s, v in [(0, 10.0), (5, 20.0), (10, 30.0), (15, 40.0)]]
        df = spark.createDataFrame(rows, "k string, ts timestamp, m double")
        t = TSDF(df, ts_col="ts", series_ids=["k"])
        out = t.withRangeStats(
            colsToSummarize=["m"], rangeBackWindowSecs=10, percentiles=[0.5]
        ).df
        got = {r.ts.second: r.p50_m for r in out.collect()}
        # trailing 10s inclusive windows: [10]=10, [10,20]=15, [10,20,30]=20,
        # [20,30,40]=30
        assert got == {0: 10.0, 5: 15.0, 10: 20.0, 15: 30.0}


class TestRangeStatsPrefixStrategy:
    """strategy='prefix' must agree with the sliding default to 6 decimals,
    including constant frames (stddev 0 → null zscore), all-null frames,
    and single-row series. The payoff is O(n) vs O(n × frame_rows): a
    measured 7× at 8M rows / 600-row frames (scripts/scale_probe.py)."""

    def test_prefix_matches_sliding(self, spark):
        import math
        import random

        import pyspark.sql.functions as F

        from tempo_spark import TSDF

        random.seed(7)
        rows = []
        for uid in range(3):
            for i in range(120):
                rows.append(
                    (uid, 1_700_000_000 + i * random.randint(1, 400),
                     float(random.randint(0, 10000)) / 7)
                )
        rows += [(10, 1_700_000_000 + i * 100, 42.0) for i in range(40)]  # constant
        rows.append((11, 1_700_000_000, 5.0))                             # singleton
        rows += [(12, 1_700_000_000 + i * 100, None if i % 3 else 1.5)
                 for i in range(30)]                                      # nulls
        df = spark.createDataFrame(rows, "uid long, tsec long, v double").select(
            "uid", F.timestamp_seconds("tsec").alias("ts"), "v"
        )
        t = TSDF(df, ts_col="ts", series_ids=["uid"])

        def canon(frame):
            cols = sorted(frame.columns)
            out = []
            for r in frame.select(*cols).collect():
                out.append(tuple(
                    ("NaN" if math.isnan(v) else round(v, 6))
                    if isinstance(v, float) else v
                    for v in r
                ))
            return sorted(out, key=str)

        sliding = canon(t.withRangeStats(rangeBackWindowSecs=600).df)
        prefix = canon(t.withRangeStats(rangeBackWindowSecs=600, strategy="prefix").df)
        assert sliding == prefix

    def test_stats_selector_drops_sliding_frames(self, spark):
        import datetime as dt

        from tempo_spark import TSDF

        base = dt.datetime(2024, 1, 1)
        rows = [("A", base + dt.timedelta(seconds=s), float(s)) for s in range(10)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, m double")
        t = TSDF(df, ts_col="ts", series_ids=["k"])
        out = t.withRangeStats(
            rangeBackWindowSecs=5, strategy="prefix",
            stats=("mean", "count", "sum", "stddev", "zscore"),
        ).df
        assert "min_m" not in out.columns and "max_m" not in out.columns
        # no sliding frame left in the plan — only growing frames
        from tempo_spark.plans.inspect import formatted_plan

        plan = formatted_plan(out)
        assert "unboundedpreceding" in plan.lower()
        got = {r.ts.second: (r.sum_m, r.count_m) for r in out.collect()}
        assert got[9] == (sum(range(4, 10)), 6)  # trailing 5s inclusive

    def test_prefix_single_shuffle(self, spark):
        import datetime as dt

        from tempo_spark import TSDF
        from tempo_spark.plans.inspect import count_exchanges

        base = dt.datetime(2024, 1, 1)
        rows = [("A", base + dt.timedelta(seconds=s), float(s)) for s in range(10)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, m double")
        t = TSDF(df, ts_col="ts", series_ids=["k"])
        assert count_exchanges(
            t.withRangeStats(rangeBackWindowSecs=5, strategy="prefix").df
        ) == 1


class TestTwap:
    def test_twap_holds_last_to_bucket_end(self, spark):
        import datetime as dt

        from tempo_spark import TSDF

        base = dt.datetime(2024, 1, 1)
        rows = [
            # bucket 0: price 10 for 30s, price 20 for 30s -> twap 15
            ("A", base, 10.0),
            ("A", base + dt.timedelta(seconds=30), 20.0),
            # bucket 1: single obs at :30 holding 30s -> twap 40
            ("A", base + dt.timedelta(seconds=90), 40.0),
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, price double")
        t = TSDF(df, ts_col="ts", series_ids=["k"])
        got = {r.ts.minute: r.twap for r in t.twap("1 minute", "price").df.collect()}
        assert got == {0: 15.0, 1: 40.0}

    def test_twap_ties_first_gets_zero_weight(self, spark):
        import datetime as dt

        from tempo_spark import TSDF

        base = dt.datetime(2024, 1, 1)
        # two ties: the first is superseded instantly (weight 0), the last
        # holds to bucket end -> twap equals the last price
        rows = [
            ("A", base + dt.timedelta(seconds=60), 10.0),
            ("A", base + dt.timedelta(seconds=60), 30.0),
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, price double")
        t = TSDF(df, ts_col="ts", series_ids=["k"])
        rowz = t.twap("1 minute", "price").df.collect()
        assert len(rowz) == 1 and rowz[0].twap == 30.0


class TestDescribeReferenceLayout:
    """Golden test of describe(reference_layout=True) against the
    reference's output shape (python/tempo/tsdf.py:622-700), hand-ported
    for a 4-row fixture."""

    def test_golden(self, spark):
        rows = [
            ("A", ts("2020-01-01 00:00:00"), 1.0),
            ("A", ts("2020-01-01 00:01:30"), 3.0),
            ("B", ts("2020-01-01 01:00:00"), None),
            ("B", ts("2020-01-02 00:00:00"), 5.0),
        ]
        t = TSDF(
            spark.createDataFrame(rows, "k string, event_ts timestamp, v double"),
            ts_col="event_ts",
            series_ids=["k"],
        )
        out = t.describe(reference_layout=True)
        # reference column order: summary, 4 global cols, then the
        # described columns (string series col, metric, ts_dbl companion)
        assert out.columns == [
            "summary", "unique_time_series_count", "min_ts", "max_ts",
            "granularity", "k", "v", "event_ts_dbl",
        ]
        collected = out.collect()
        # global row leads, exactly once
        assert collected[0].summary == "global"
        g = collected[0]
        assert g.unique_time_series_count == "2"
        assert g.min_ts == "2020-01-01 00:00:00"
        assert g.max_ts == "2020-01-02 00:00:00"
        assert g.granularity == "seconds"  # 00:01:30 trips the %60 test
        assert g.k == " " and g.v == " "  # stat cells blank in the global row
        by_summary = {r.summary: r for r in collected}
        # spark describe rows + the reference's missing_vals_pct row
        for s in ("count", "mean", "stddev", "min", "max", "missing_vals_pct"):
            assert s in by_summary, s
        stat = by_summary["count"]
        assert stat.unique_time_series_count == " "  # global cells blank in stat rows
        assert stat.v == "3"
        assert float(by_summary["missing_vals_pct"].v) == 25.0
        assert float(by_summary["missing_vals_pct"].k) == 0.0

    def test_granularity_scale(self, spark):
        def gran(stamps):
            t = TSDF(
                spark.createDataFrame(
                    [("A", ts(s), 1.0) for s in stamps],
                    "k string, event_ts timestamp, v double",
                ),
                ts_col="event_ts",
                series_ids=["k"],
            )
            return t.describe(reference_layout=True).collect()[0].granularity

        assert gran(["2020-01-01 00:00:00.123"]) == "millis"
        assert gran(["2020-01-01 00:00:05"]) == "seconds"
        assert gran(["2020-01-01 00:05:00"]) == "minutes"
        assert gran(["2020-01-01 05:00:00"]) == "hours"
        assert gran(["2020-01-02 00:00:00"]) == "days"

    def test_lazy_no_jobs_at_build(self, spark):
        from tempo_spark.plans.inspect import count_exchanges  # noqa: F401 (import parity)

        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup() or [])
        t = TSDF(
            spark.createDataFrame(
                [("A", ts("2020-01-01 00:00:00"), 1.0)],
                "k string, event_ts timestamp, v double",
            ),
            ts_col="event_ts",
            series_ids=["k"],
        )
        t.describe(reference_layout=True)  # plan only — reference runs 3 jobs here
        after = len(tracker.getJobIdsForGroup() or [])
        assert after == before


class TestRangeCorr:
    def _tsdf(self, spark, rows):
        return TSDF(
            spark.createDataFrame(rows, "k string, event_ts timestamp, x long, y long"),
            ts_col="event_ts",
            series_ids=["k"],
        )

    def _rows(self):
        import random

        rng = random.Random(7)
        rows = []
        for k in ("A", "B"):
            t = dt.datetime(2020, 1, 1)
            for i in range(60):
                t += dt.timedelta(seconds=rng.randint(5, 40))
                x = rng.randint(-50, 50)
                y = 3 * x + rng.randint(-20, 20)
                if rng.random() < 0.1:
                    x = None
                if rng.random() < 0.1:
                    y = None
                rows.append((k, t, x, y))
        return rows

    def test_prefix_matches_sliding(self, spark):
        t = self._tsdf(spark, self._rows())
        cols = ["corr_x_y", "covar_samp_x_y", "covar_pop_x_y", "count_x_y"]

        def grab(strategy):
            out = t.withRangeCorr("x", "y", rangeBackWindowSecs=120, strategy=strategy).df
            return {
                (r.k, str(r.event_ts)): tuple(
                    None if r[c] is None else round(r[c], 6) for c in cols
                )
                for r in out.collect()
            }

        assert grab("prefix") == grab("sliding")

    def test_correlated_series_and_constant_guard(self, spark):
        base = dt.datetime(2020, 1, 1)
        rows = [
            ("A", base + dt.timedelta(seconds=i * 10), i, 2 * i + 1) for i in range(20)
        ] + [
            ("C", base + dt.timedelta(seconds=i * 10), 5, i) for i in range(10)
        ]
        t = self._tsdf(spark, rows)
        out = t.withRangeCorr("x", "y", rangeBackWindowSecs=10_000).df
        last_a = [r for r in out.collect() if r.k == "A"][-1]
        assert last_a.corr_x_y == pytest.approx(1.0)
        assert last_a.count_x_y == 20
        # constant x -> zero variance -> null corr (not NaN) on BOTH paths
        for strategy in ("prefix", "sliding"):
            o = t.withRangeCorr("x", "y", strategy=strategy).df
            cs = [r.corr_x_y for r in o.collect() if r.k == "C"]
            assert all(c is None for c in cs)

    def test_one_shuffle_and_stats_subset(self, spark):
        from tempo_spark.plans.inspect import count_exchanges

        t = self._tsdf(spark, self._rows())
        out = t.withRangeCorr("x", "y", stats=["corr"])
        assert count_exchanges(out.df) == 1
        assert "corr_x_y" in out.df.columns and "covar_pop_x_y" not in out.df.columns
        with pytest.raises(ValueError):
            t.withRangeCorr("x", "y", stats=["wat"])
        with pytest.raises(ValueError):
            t.withRangeCorr("x", "y", strategy="wat")


class TestEmaDecayParams:
    def test_span_halflife_com_map_to_alpha(self, tsdf):
        import math

        # span=9 -> alpha 0.2 == the default exp_factor: identical output
        base = {(r.symbol, str(r.event_ts)): r.ema_trade_pr
                for r in tsdf.EMA("trade_pr").df.collect()}
        spanned = {(r.symbol, str(r.event_ts)): r.ema_trade_pr
                   for r in tsdf.EMA("trade_pr", span=9).df.collect()}
        assert base == spanned
        # com=4 -> alpha 0.2 as well
        commed = {(r.symbol, str(r.event_ts)): r.ema_trade_pr
                  for r in tsdf.EMA("trade_pr", com=4).df.collect()}
        assert base == commed
        # halflife: alpha = 1 - exp(ln(.5)/h); h chosen so alpha == 0.2
        h = math.log(0.5) / math.log(0.8)
        halved = {(r.symbol, str(r.event_ts)): r.ema_trade_pr
                  for r in tsdf.EMA("trade_pr", halflife=h).df.collect()}
        for k in base:
            assert halved[k] == pytest.approx(base[k], rel=1e-12)

    def test_validation(self, tsdf):
        with pytest.raises(ValueError):
            tsdf.EMA("trade_pr", span=9, com=4)
        with pytest.raises(ValueError):
            tsdf.EMA("trade_pr", span=0.5)
        with pytest.raises(ValueError):
            tsdf.EMA("trade_pr", halflife=0)
        with pytest.raises(ValueError):
            tsdf.EMA("trade_pr", com=-1)


class TestEmaLargeWindow:
    def test_window_200_matches_pandas_ewm(self, spark):
        """The finite-lag EMA at window=200 converges to pandas
        ewm(adjust=True) once ≥200 lags exist: truncation error is
        (1-α)^200·max|x| ≈ 1e-19 at α=0.2, and the adjust normalizer is
        within (1-α)^(t+1) of 1/α. Also pins the parsed-SQL weight-array
        formulation (one expr, not 200 lag Columns) on a real series."""
        import pandas as pd
        import pyspark.sql.functions as F

        n = 300
        rows = [
            ("A", f"2020-01-01 {i // 3600:02d}:{(i // 60) % 60:02d}:{i % 60:02d}",
             float((i * 37) % 97) / 7.0)
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "symbol string, ts string, x double")
        t = TSDF(
            df.withColumn("ts", F.col("ts").cast("timestamp")),
            ts_col="ts", series_ids=["symbol"],
        )
        got = {
            str(r.ts): r.ema_x
            for r in t.EMA("x", window=200, exp_factor=0.2).df.collect()
        }
        pdf = pd.Series([float((i * 37) % 97) / 7.0 for i in range(n)])
        expected = pdf.ewm(alpha=0.2, adjust=True).mean()
        for i, (ts, _) in enumerate(sorted((k, v) for k, v in got.items())):
            if i >= 220:  # rows with a full 200-lag history
                assert got[ts] == pytest.approx(expected.iloc[i], rel=1e-9)

    def test_equals_naive_lag_sum(self, tsdf):
        """Bit-parity with the r1-r5 Column-loop formulation (same IEEE
        term order) on the standard fixture."""
        import pyspark.sql.functions as F

        w = tsdf.base_window()
        naive_terms = [
            F.coalesce(F.lag(F.col("trade_pr"), i).over(w), F.lit(0.0))
            * F.lit(0.2 * 0.8 ** i)
            for i in range(12)
        ]
        from functools import reduce

        naive = tsdf.df.withColumn(
            "ema_naive", reduce(lambda a, b: a + b, naive_terms)
        )
        got = {
            (r.symbol, str(r.event_ts)): r.ema_trade_pr
            for r in tsdf.EMA("trade_pr", window=12).df.collect()
        }
        exp = {
            (r.symbol, str(r.event_ts)): r.ema_naive for r in naive.collect()
        }
        assert got == exp  # exact equality, not approx

    def test_guards(self, tsdf):
        import pyspark.sql.functions as F

        with pytest.raises(ValueError, match="window"):
            tsdf.EMA("trade_pr", window=0)
        with pytest.raises(ValueError, match="window"):
            tsdf.EMA("trade_pr", window=100_000)
        clash = TSDF(
            tsdf.df.withColumn("__ema_arr", F.lit(1)),
            ts_col=tsdf.ts_col, series_ids=list(tsdf.series_ids),
        )
        with pytest.raises(ValueError, match="__ema_arr"):
            clash.EMA("trade_pr")


class TestEmaConflictingParams:
    def test_explicit_alpha_plus_decay_param_raises(self, tsdf):
        with pytest.raises(ValueError, match="at most one"):
            tsdf.EMA("trade_pr", exp_factor=0.5, span=9)
        # default alpha still 0.2 when nothing is given
        a = {(r.symbol, str(r.event_ts)): r.ema_trade_pr for r in tsdf.EMA("trade_pr").df.collect()}
        b = {(r.symbol, str(r.event_ts)): r.ema_trade_pr for r in tsdf.EMA("trade_pr", exp_factor=0.2).df.collect()}
        assert a == b


class TestGroupedStatsPercentiles:
    def test_percentiles(self, spark):
        rows = [("A", ts(f"2020-01-01 00:00:{s:02d}"), float(v))
                for s, v in [(1, 10), (2, 20), (3, 30), (4, 40)]]
        t = TSDF(
            spark.createDataFrame(rows, "k string, event_ts timestamp, v double"),
            ts_col="event_ts", series_ids=["k"],
        )
        out = t.withGroupedStats(freq="1 minute", percentiles=[0.5, 0.95]).df.collect()
        assert len(out) == 1
        r = out[0]
        assert r.p50_v == pytest.approx(25.0)   # interpolated median of 10..40
        assert r.p95_v == pytest.approx(38.5)
        assert r.mean_v == pytest.approx(25.0) and r.count_v == 4


class TestFillForwardBackward:
    def _t(self, spark):
        rows = [
            ("A", ts("2020-01-01 00:00:01"), None, 10.0),
            ("A", ts("2020-01-01 00:00:02"), 2.0, None),
            ("A", ts("2020-01-01 00:00:03"), None, None),
            ("A", ts("2020-01-01 00:00:04"), 4.0, 40.0),
            ("B", ts("2020-01-01 00:00:01"), None, None),
        ]
        return TSDF(
            spark.createDataFrame(rows, "k string, event_ts timestamp, x double, y double"),
            ts_col="event_ts", series_ids=["k"],
        )

    def test_ffill(self, spark):
        out = {(r.k, str(r.event_ts)): (r.x, r.y)
               for r in self._t(spark).fillForward().df.collect()}
        assert out[("A", "2020-01-01 00:00:01")] == (None, 10.0)   # nothing earlier
        assert out[("A", "2020-01-01 00:00:03")] == (2.0, 10.0)
        assert out[("A", "2020-01-01 00:00:04")] == (4.0, 40.0)
        assert out[("B", "2020-01-01 00:00:01")] == (None, None)   # series isolated

    def test_bfill_and_subset(self, spark):
        out = {(r.k, str(r.event_ts)): (r.x, r.y)
               for r in self._t(spark).fillBackward(cols=["x"]).df.collect()}
        assert out[("A", "2020-01-01 00:00:01")] == (2.0, 10.0)  # x from next; y untouched
        assert out[("A", "2020-01-01 00:00:03")] == (4.0, None)

    def test_one_shuffle_and_grid_unchanged(self, spark):
        from tempo_spark.plans.inspect import count_exchanges

        t = self._t(spark)
        out = t.fillForward()
        assert count_exchanges(out.df) == 1
        assert out.df.count() == t.df.count()


class TestDeduplicated:
    def test_keep_max_by_sequence_then_values(self, spark):
        rows = [
            ("A", ts("2020-01-01 00:00:01"), 1, 10.0),
            ("A", ts("2020-01-01 00:00:01"), 3, 5.0),    # highest seq wins
            ("A", ts("2020-01-01 00:00:01"), 2, 99.0),
            ("A", ts("2020-01-01 00:00:02"), 1, 7.0),
        ]
        t = TSDF(
            spark.createDataFrame(rows, "k string, event_ts timestamp, seq int, v double"),
            ts_col="event_ts", series_ids=["k"], sequence_col="seq",
        )
        out = {str(r.event_ts): (r.seq, r.v) for r in t.deduplicated().df.collect()}
        assert out["2020-01-01 00:00:01"] == (3, 5.0)
        assert out["2020-01-01 00:00:02"] == (1, 7.0)
        low = {str(r.event_ts): (r.seq, r.v) for r in t.deduplicated("min").df.collect()}
        assert low["2020-01-01 00:00:01"] == (1, 10.0)

    def test_no_sequence_rowwise_not_columnwise(self, spark):
        rows = [
            ("A", ts("2020-01-01 00:00:01"), 1.0, 100.0),
            ("A", ts("2020-01-01 00:00:01"), 2.0, 50.0),
        ]
        t = TSDF(
            spark.createDataFrame(rows, "k string, event_ts timestamp, x double, y double"),
            ts_col="event_ts", series_ids=["k"],
        )
        got = t.deduplicated().df.collect()
        assert len(got) == 1
        # struct ordering keeps a REAL row (2.0, 50.0), never a stitched
        # per-column max (2.0, 100.0)
        assert (got[0].x, got[0].y) == (2.0, 50.0)

    def test_one_shuffle_and_validation(self, spark):
        from tempo_spark.plans.inspect import count_exchanges

        t = TSDF(
            spark.createDataFrame(
                [("A", ts("2020-01-01 00:00:01"), 1.0)],
                "k string, event_ts timestamp, v double",
            ),
            ts_col="event_ts", series_ids=["k"],
        )
        assert count_exchanges(t.deduplicated().df) == 1
        assert t.deduplicated().df.columns == t.df.columns
        with pytest.raises(ValueError):
            t.deduplicated("first")


class TestDiffPctChange:
    def _t(self, spark):
        rows = [
            ("a", ts("2024-01-01 00:00:01"), 10.0),
            ("a", ts("2024-01-01 00:00:02"), 12.0),
            ("a", ts("2024-01-01 00:00:03"), 0.0),
            ("a", ts("2024-01-01 00:00:04"), 6.0),
            ("b", ts("2024-01-01 00:00:01"), 5.0),
        ]
        return TSDF(
            spark.createDataFrame(rows, "k string, event_ts timestamp, v double"),
            ts_col="event_ts", series_ids=["k"],
        )

    def test_diff(self, spark):
        out = self._t(spark).withDiff("v").df.orderBy("k", "event_ts").collect()
        assert [r.diff_v for r in out] == [None, 2.0, -12.0, 6.0, None]

    def test_diff_forward(self, spark):
        out = self._t(spark).withDiff("v", periods=-1).df.orderBy("k", "event_ts").collect()
        assert [r.diff_v for r in out] == [-2.0, 12.0, -6.0, None, None]

    def test_pct_change_zero_base_null(self, spark):
        out = self._t(spark).withPctChange("v").df.orderBy("k", "event_ts").collect()
        got = [r.pct_change_v for r in out]
        assert got[0] is None and got[1] == 0.2 and got[2] == -1.0
        assert got[3] is None  # base 0.0 -> undefined, not Infinity
        assert got[4] is None  # series b first row

    def test_rejections_and_plan(self, spark):
        from tempo_spark.plans.inspect import count_exchanges

        t = self._t(spark)
        with pytest.raises(ValueError):
            t.withDiff("v", periods=0)
        with pytest.raises(ValueError):
            t.withPctChange("v", periods=0)
        # diff + pct chained share ONE shuffle (same base window)
        assert count_exchanges(t.withDiff("v").withPctChange("v").df) == 1


class TestAnomalyFlags:
    def _t(self, spark, vals, sym="a"):
        rows = [
            (sym, ts("2024-01-01 00:00:01") + dt.timedelta(seconds=i), float(v))
            for i, v in enumerate(vals)
        ]
        return TSDF(
            spark.createDataFrame(rows, "k string, event_ts timestamp, v double"),
            ts_col="event_ts", series_ids=["k"],
        )

    def test_spike_after_flat_baseline_flags(self, spark):
        t = self._t(spark, [10, 10, 10, 10, 10, 100, 10, 10])
        out = t.withAnomalyFlags("v", rangeBackWindowSecs=10, z=3.0).df.orderBy("event_ts").collect()
        flags = [r.is_anomaly_v for r in out]
        # rows 0-2: fewer than min_points=3 trailing -> no verdict
        assert flags[:3] == [None, None, None]
        assert flags[3] is False and flags[4] is False
        assert flags[5] is True  # zero-variance baseline, zscore undefined
        assert out[5].zscore_v is None
        assert flags[6] is False  # 100 in the trailing window inflates sigma
        assert out[6].zscore_v is not None

    def test_matches_python_model(self, spark):
        import statistics

        vals = [3, 7, 5, 9, 4, 30, 6, 5, 8, 2, 7, 40, 6]
        back, zt, mp = 5, 2.0, 3
        t = self._t(spark, vals)
        out = t.withAnomalyFlags("v", rangeBackWindowSecs=back, z=zt, min_points=mp)
        got = [(r.zscore_v, r.is_anomaly_v) for r in out.df.orderBy("event_ts").collect()]
        for i, v in enumerate(vals):
            lo = max(0, i - back)
            window = [float(x) for x in vals[lo:i]]
            if len(window) < mp:
                assert got[i] == (None, None), i
                continue
            m = statistics.fmean(window)
            sd = statistics.stdev(window)
            z_, fl = got[i]
            assert fl == (abs(v - m) > zt * sd), i
            if sd > 0:
                assert abs(z_ - (v - m) / sd) < 1e-9, i
            else:
                assert z_ is None, i

    def test_series_isolated_and_plan(self, spark):
        from tempo_spark.plans.inspect import count_exchanges

        ta = self._t(spark, [10, 10, 10, 10, 100], sym="a")
        tb = self._t(spark, [50, 50, 50, 50, 50], sym="b")
        t = TSDF(ta.df.union(tb.df), ts_col="event_ts", series_ids=["k"])
        res = t.withAnomalyFlags("v", rangeBackWindowSecs=100, min_points=3)
        assert count_exchanges(res.df) == 1
        got = {(r.k, r.event_ts): r.is_anomaly_v for r in res.df.collect()}
        assert got[("a", ts("2024-01-01 00:00:05"))] is True
        assert got[("b", ts("2024-01-01 00:00:05"))] is False

    def test_prefix_strategy_parity(self, spark):
        # integer-valued metrics -> exact double sums on both paths. The
        # prefix strategy works on first-value-SHIFTED values (r8), so
        # s^2/n rounds differently at the last ulp — flags and the
        # zero-variance branch (flat baseline then spike: flag True,
        # zscore NULL) must match exactly; zscores to ~1e-9 relative.
        vals = [10, 10, 10, 10, 100, 3, 7, 5, 9, 4, 30, 6, 5, 8, 2, 7, 40]
        for back, mp in ((5, 3), (10, 2), (3, 2)):
            t = self._t(spark, vals)
            a = t.withAnomalyFlags(
                "v", rangeBackWindowSecs=back, z=2.0, min_points=mp
            ).df.orderBy("event_ts").collect()
            b = t.withAnomalyFlags(
                "v", rangeBackWindowSecs=back, z=2.0, min_points=mp,
                strategy="prefix",
            ).df.orderBy("event_ts").collect()
            assert [r.is_anomaly_v for r in a] == [
                r.is_anomaly_v for r in b
            ], back
            for ra, rb in zip(a, b):
                if ra.zscore_v is None:
                    assert rb.zscore_v is None, back
                else:
                    assert abs(ra.zscore_v - rb.zscore_v) <= 1e-9 * max(
                        1.0, abs(ra.zscore_v)
                    ), back

    def test_prefix_large_offset_tiny_variance(self, spark):
        # regression (r8): genuine-but-tiny RELATIVE variance at a large
        # baseline offset (var/mean^2 << 1e-12). The old magnitude clamp
        # sent these to the zero-variance branch (zscore NULL, flag on any
        # deviation); the first-value shift computes the variance exactly
        # — zscores defined and matching the exact python model.
        import statistics

        deltas = [0.0, 0.5, 0.25, 0.75, 0.5, 100.0, 0.25, 0.5, 0.75, 0.0]
        vals = [1e9 + d for d in deltas]  # 0.25-grain offsets stay exact
        back, zt, mp = 5, 2.0, 3
        t = self._t(spark, vals)
        out = t.withAnomalyFlags(
            "v", rangeBackWindowSecs=back, z=zt, min_points=mp,
            strategy="prefix",
        ).df.orderBy("event_ts").collect()
        for i, d in enumerate(deltas):
            lo = max(0, i - back)
            window = deltas[lo:i]
            if len(window) < mp:
                assert out[i].zscore_v is None and out[i].is_anomaly_v is None
                continue
            m = statistics.fmean(window)
            sd = statistics.stdev(window)
            assert out[i].is_anomaly_v == (abs(d - m) > zt * sd), i
            if sd > 0:
                assert out[i].zscore_v is not None, i  # old clamp: NULL
                assert abs(out[i].zscore_v - (d - m) / sd) < 1e-6, i

    def test_prefix_strategy_plan(self, spark):
        import re

        from tempo_spark.plans.inspect import count_exchanges

        t = self._t(spark, [1, 2, 3, 4, 5])
        out = t.withAnomalyFlags("v", rangeBackWindowSecs=3, strategy="prefix")
        # still one shuffle, and no sliding range frame left in the plan:
        # a sliding frame prints as specifiedwindowframe(RangeFrame,
        # -<back>, ...) — a NEGATIVE LITERAL lower bound — while the
        # prefix strategy's growing frames are unboundedpreceding$()
        sliding_frame = re.compile(r"RangeFrame, -\d")
        assert count_exchanges(out.df) == 1
        plan = out.df._jdf.queryExecution().executedPlan().toString()
        assert not sliding_frame.search(plan)
        # positive control: the sliding strategy DOES match the pattern
        sl = t.withAnomalyFlags("v", rangeBackWindowSecs=3)
        assert sliding_frame.search(
            sl.df._jdf.queryExecution().executedPlan().toString()
        )

    def test_prefix_x0_deterministic_on_duplicated_earliest_ts(self, spark):
        """r9 ADVICE: the prefix shift x0 is min(struct(ts, x)) — when the
        series' earliest timestamp is duplicated with differing values the
        pick no longer depends on shuffle order, so zscores are
        bit-identical across different input partitionings."""
        t0 = ts("2024-01-01 00:00:01")
        rows = [
            ("a", t0, 100.0),  # duplicated earliest ts, differing values
            ("a", t0, -100.0),
            ("a", t0 + dt.timedelta(seconds=1), 3.0),
            ("a", t0 + dt.timedelta(seconds=2), 5.0),
            ("a", t0 + dt.timedelta(seconds=3), 50.0),
        ]
        df = spark.createDataFrame(
            rows, "k string, event_ts timestamp, v double"
        )
        outs = []
        for shuffled in (df.repartition(1), df.repartition(7, "v")):
            out = (
                TSDF(shuffled, ts_col="event_ts", series_ids=["k"])
                .withAnomalyFlags(
                    "v", rangeBackWindowSecs=10, strategy="prefix"
                )
                .df.orderBy("event_ts", "v")
                .collect()
            )
            outs.append([(r.v, r.zscore_v, r.is_anomaly_v) for r in out])
        assert outs[0] == outs[1]  # bit-identical, not approx

    def test_rejections(self, spark):
        t = self._t(spark, [1, 2, 3])
        with pytest.raises(ValueError):
            t.withAnomalyFlags("v", rangeBackWindowSecs=10, min_points=1)
        with pytest.raises(ValueError):
            t.withAnomalyFlags("v", rangeBackWindowSecs=10, strategy="median")
        staged = TSDF(
            t.df.withColumn("__tempo_an_n", t.df.v),
            ts_col="event_ts", series_ids=["k"],
        )
        with pytest.raises(ValueError):
            staged.withAnomalyFlags("v", rangeBackWindowSecs=10)
        # r8: __tempo_an_x/_x0 are prefix staging but dropped by BOTH
        # strategies — the sliding path must raise too, not silently
        # delete a same-named user column
        staged_x = TSDF(
            t.df.withColumn("__tempo_an_x", t.df.v),
            ts_col="event_ts", series_ids=["k"],
        )
        with pytest.raises(ValueError, match="__tempo_an_x"):
            staged_x.withAnomalyFlags("v", rangeBackWindowSecs=10)
