"""Golden-fixture tests (reference test-strategy pattern, SURVEY.md §5).

Each case: build inputs from JSON spec → run the operator → compare to the
expected JSON rows order-insensitively."""

import pytest

from tests.golden_utils import (
    assert_matches_golden,
    build_df,
    build_tsdf,
    load_cases,
)


class TestAsofGoldens:
    cases = load_cases("asof_tests")

    def test_basic(self, spark):
        c = self.cases["basic"]
        left = build_tsdf(spark, c["inputs"]["left"])
        right = build_tsdf(spark, c["inputs"]["right"])
        out = left.asofJoin(right, left_prefix="left", right_prefix="right").df
        assert_matches_golden(out, c["expected"], spark)

    def test_skip_nulls_false(self, spark):
        c = self.cases["skip_nulls_false"]
        left = build_tsdf(spark, c["inputs"]["left"])
        right = build_tsdf(spark, c["inputs"]["right"])
        out = left.asofJoin(
            right, left_prefix="left", right_prefix="right", skipNulls=False
        ).df
        assert_matches_golden(out, c["expected"], spark)

    @pytest.mark.parametrize("tol_key", ["None", "0", "5.5", "7", "10"])
    def test_ref_tolerance_sweep(self, spark, tol_key):
        """Reference's RECORDED tolerance answers (reference:
        python/tests/as_of_join_tests.py:126-146) — pins the inclusive
        exactly-at-tolerance boundary (age 7 kept at tolerance=7, age 0
        kept at tolerance=0) and full-null rows past the band."""
        c = self.cases["ref_tolerance_sweep"]
        left = build_tsdf(spark, c["inputs"]["left"])
        right = build_tsdf(spark, c["inputs"]["right"])
        tol = None if tol_key == "None" else float(tol_key)
        out = left.asofJoin(
            right, left_prefix="left", right_prefix="right", tolerance=tol
        ).df
        assert_matches_golden(out, c["expected_by_tolerance"][tol_key], spark)

    @pytest.mark.parametrize("mode", ["skip_nulls", "skip_nulls_disabled"])
    def test_ref_skip_nulls(self, spark, mode):
        """Reference's RECORDED skipNulls pair (reference:
        python/tests/as_of_join_tests.py:36-63) — with skipNulls=True a
        null bid_pr is looked PAST to the previous non-null (345.11 carried
        two rows forward); =False takes the latest row verbatim."""
        c = self.cases["ref_skip_nulls"]
        left = build_tsdf(spark, c["inputs"]["left"])
        right = build_tsdf(spark, c["inputs"]["right"])
        out = left.asofJoin(
            right, left_prefix="left", right_prefix="right",
            skipNulls=(mode == "skip_nulls"),
        ).df
        assert_matches_golden(out, c["expected_by_mode"][mode], spark)

    def test_ref_sequence_number_sort(self, spark):
        """Reference's RECORDED sequence-col tie-break (reference:
        python/tests/as_of_join_tests.py:65-77) — at equal timestamps the
        HIGHEST seq_nb row wins, and a right row at exactly the left ts
        matches (inclusive backward join)."""
        c = self.cases["ref_sequence_number_sort"]
        left = build_tsdf(spark, c["inputs"]["left"])
        right = build_tsdf(spark, c["inputs"]["right"])
        out = left.asofJoin(right, right_prefix="right").df
        assert_matches_golden(out, c["expected"], spark)

    def test_ref_partitioned(self, spark):
        """Reference's RECORDED skew ts-partition answers (reference:
        python/tests/as_of_join_tests.py:79-106) — tsPartitionVal=10 with
        fraction=0.1 overlap must reproduce the plain as-of exactly."""
        c = self.cases["ref_partitioned"]
        left = build_tsdf(spark, c["inputs"]["left"])
        right = build_tsdf(spark, c["inputs"]["right"])
        out = left.asofJoin(
            right, left_prefix="left", right_prefix="right",
            tsPartitionVal=10, fraction=0.1,
        ).df
        assert_matches_golden(out, c["expected"], spark)

    def test_ref_nanos(self, spark):
        """Reference's RECORDED nanosecond as-of (reference:
        python/tests/as_of_join_tests.py:108-124) — string ts with nano
        digits parse to DOUBLE epoch seconds (unix seconds + fraction,
        bit-identical arithmetic) and the join runs on the numeric ts."""
        from tempo_spark import TSDF
        from tests.golden_utils import build_df

        c = self.cases["ref_nanos"]
        sides = {}
        for k in ("left", "right"):
            spec = c["inputs"][k]
            meta = spec["tsdf"]
            sides[k] = TSDF.fromStringTs(
                build_df(spark, spec), ts_col=meta["ts_col"],
                series_ids=meta["series_ids"], nanos=True,
            )
        out = sides["left"].asofJoin(
            sides["right"], left_prefix="left", right_prefix="right"
        ).df
        assert_matches_golden(out, c["expected"], spark)


class TestResampleGoldens:
    cases = load_cases("resample_tests")

    def test_floor_with_secondary_metric(self, spark):
        c = self.cases["floor_with_secondary_metric"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.resample("1 minute", "floor").df
        assert_matches_golden(out, c["expected"], spark)

    def test_millis_bucketing(self, spark):
        c = self.cases["millis_bucketing"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.resample("500 ms", "mean").df
        assert_matches_golden(out, c["expected"], spark)

    @pytest.mark.parametrize(
        "name", ["floor", "mean", "min", "min_with_prefix", "min_with_fill",
                 "max", "ceil"]
    )
    def test_ref_unit_aggregates(self, spark, name):
        """Reference's RECORDED '1 DAY' aggregate answers (reference:
        python/tests/resample_tests.py test_aggregate_*) — pins the STRING
        'date' column as a first-class metric (min/max/floor/ceil over
        strings), the prefix_ naming, and fill=True's zero-for-numeric /
        null-for-string densification across a month-long gap."""
        c = self.cases["ref_unit_aggregates"]["cases"][name]
        t = build_tsdf(spark, c["inputs"]["data"])
        kwargs = dict(c["kwargs"])
        kwargs["metricCols"] = kwargs.pop("metric_cols", None) or [
            # reference default metricCols = every non-series/ts column,
            # INCLUDING the string 'date' col (python/tests/resample_tests.py
            # TODO note); this engine's default is numeric-only, so the
            # parity call passes them explicitly
            col for col in t.df.columns
            if col != t.ts_col and col not in t.series_ids
        ]
        out = t.resample("1 DAY", c["func"], **kwargs).df
        assert_matches_golden(out, c["expected"], spark)


class TestInterpolGoldens:
    cases = load_cases("interpol_tests")

    def test_linear_interior_gap(self, spark):
        c = self.cases["linear_interior_gap"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.interpolate("linear", freq="1 minute", func="mean").df
        assert_matches_golden(out, c["expected"], spark)

    def test_ffill_trailing(self, spark):
        c = self.cases["ffill_trailing"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.interpolate("ffill", freq="1 minute", func="mean").df
        assert_matches_golden(out, c["expected"], spark)

    @pytest.mark.parametrize("method", ["zero", "null", "bfill", "ffill", "linear"])
    def test_ref_fill_methods(self, spark, method):
        """Reference's RECORDED fill answers with interpolation flags
        (reference: python/tests/interpol_tests.py:136-311) — pins
        trailing-null bfill (nulls after the last non-null stay null),
        leading-null ffill, linear edge nulls, and the
        is_ts_interpolated / is_interpolated_<col> flag contract."""
        c = self.cases["ref_fill_methods"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.interpolate(
            method,
            freq="30 seconds",
            func="mean",
            target_cols=["value_a", "value_b"],
            show_interpolated=True,
        ).df
        assert_matches_golden(out, c["expected_by_method"][method], spark)

    def test_ref_freq_abbreviations(self, spark):
        """'30 sec' must parse identically to '30 seconds' (reference:
        python/tests/interpol_tests.py test_different_freq_abbreviations,
        recorded answers)."""
        c = self.cases["ref_freq_abbreviations"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.interpolate(
            "linear", freq="30 sec", func="mean",
            target_cols=["value_a", "value_b"], show_interpolated=True,
        ).df
        assert_matches_golden(out, c["expected"], spark)

    @pytest.mark.parametrize("method", ["ffill", "bfill", "null"])
    def test_ref_non_numeric_fills(self, spark, method):
        """Reference's RECORDED non-numeric fills (reference:
        python/tests/interpol_tests.py:441-490) — ffill/bfill/null carry
        string/boolean/date/timestamp/ntz/decimal columns through the
        resample('ceil') + densify + fill pipeline unchanged in type."""
        c = self.cases["ref_non_numeric"]
        t = build_tsdf(spark, c["inputs"]["data"])
        targets = [
            col for col in t.df.columns
            if col != t.ts_col and col not in t.series_ids
        ]
        out = t.interpolate(
            method, freq="30 seconds", func="ceil", target_cols=targets
        ).df
        assert_matches_golden(out, c["expected_by_method"][method], spark)

    @pytest.mark.parametrize("method", ["linear", "zero"])
    def test_ref_non_numeric_rejects(self, spark, method):
        """linear/zero on non-numeric target cols must raise (reference:
        python/tests/interpol_tests.py:492-530)."""
        c = self.cases["ref_non_numeric"]
        t = build_tsdf(spark, c["inputs"]["data"])
        with pytest.raises(ValueError):
            t.interpolate(
                method, freq="30 seconds", func="ceil",
                target_cols=c["error_target_cols"],
            )

    def test_ref_integration_default_tsdf_params(self, spark):
        """TSDF-level defaulting: target_cols defaults to the numeric metric
        columns (reference: InterpolationIntegrationTest, recorded)."""
        c = self.cases["ref_integration"]["cases"]["default_tsdf_params"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.interpolate("linear", freq="30 seconds", func="mean").df
        assert_matches_golden(out, c["expected"], spark)

    def test_ref_integration_custom_params(self, spark):
        """Renamed ts col + explicit target/partition params (reference:
        InterpolationIntegrationTest, recorded)."""
        from tempo_spark import TSDF

        c = self.cases["ref_integration"]["cases"]["custom_params"]
        spec = c["inputs"]["data"]
        base = build_tsdf(spark, spec)
        renamed = TSDF(
            base.df.withColumnRenamed("event_ts", "other_ts_col"),
            ts_col="other_ts_col", series_ids=["partition_a", "partition_b"],
        )
        out = renamed.interpolate(
            "linear", freq="30 seconds", func="mean",
            ts_col="other_ts_col",
            partition_cols=["partition_a", "partition_b"],
            target_cols=["value_a"], show_interpolated=True,
        ).df
        assert_matches_golden(out, c["expected"], spark)

    def test_ref_integration_on_sampled_data(self, spark):
        """resample(...).interpolate(...) chaining (reference:
        InterpolationIntegrationTest, recorded)."""
        c = self.cases["ref_integration"]["cases"]["on_sampled_data"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = (
            t.resample("30 seconds", "mean")
            .interpolate("linear", target_cols=["value_a"], show_interpolated=True)
            .df
        )
        assert_matches_golden(out, c["expected"], spark)

    def test_ref_integration_defaults_with_resampled_df(self, spark):
        """Resampled-frame defaulting: freq/func remembered, ffill over all
        metric cols (reference: InterpolationIntegrationTest, recorded)."""
        c = self.cases["ref_integration"]["cases"]["defaults_with_resampled_df"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.resample("30 seconds", "mean").interpolate("ffill").df
        assert_matches_golden(out, c["expected"], spark)


class TestIntervalsGoldens:
    """make_disjoint against the reference's RECORDED interval answers
    (reference: python/tests/intervals_tests.py:183-414 and
    python/tests/unit_test_data/intervals_tests.json) — incl. the exact
    issue-268 values the reference added a regression for."""

    cases = load_cases("intervals_tests")

    @pytest.mark.parametrize(
        "name",
        [
            "issue_268",
            "basic",
            "already_disjoint",
            "equal_intervals",
            "same_start",
            "same_end",
            "multiple_series",
            "single_metric",
            "subset",
        ],
    )
    def test_make_disjoint_ref(self, spark, name):
        from tests.golden_utils import build_df
        from tempo_spark import IntervalsDF

        c = self.cases[name]
        spec = c["inputs"]["data"]
        idf = IntervalsDF(build_df(spark, spec), **spec["idf"])
        out = idf.make_disjoint().df
        assert_matches_golden(out, c["expected"], spark)

    def test_from_stacked_metric_names_ref(self, spark):
        """Reference's RECORDED pivot (reference:
        python/tests/intervals_tests.py:227-247) — explicit metric_names
        skip the eager distinct pass."""
        import pyspark.sql.functions as F

        from tests.golden_utils import build_df
        from tempo_spark import IntervalsDF

        c = self.cases["from_stacked_metric_names"]
        df = build_df(spark, c["inputs"]["data"])
        df = df.withColumn("start_ts", F.to_timestamp("start_ts")).withColumn(
            "end_ts", F.to_timestamp("end_ts")
        )
        idf = IntervalsDF.fromStackedMetrics(
            df, "start_ts", "end_ts", ["series_1"],
            "metric_name", "metric_value", ["metric_1", "metric_2"],
        )
        assert_matches_golden(idf.df, c["expected"], spark)

    def test_to_df_stack_ref(self, spark):
        """Reference's RECORDED unpivot (reference:
        python/tests/intervals_tests.py:392-402)."""
        from tests.golden_utils import build_df
        from tempo_spark import IntervalsDF

        c = self.cases["to_df_stack"]
        spec = c["inputs"]["data"]
        idf = IntervalsDF(build_df(spark, spec), **spec["idf"])
        assert_matches_golden(idf.toDF(stack=True), c["expected"], spark)


def _dec_cols(df, spec_schema: str, spark, dec="decimal(5,2)"):
    """Reference comparison idiom (reference: python/tests/tsdf_tests.py:
    960-971): float stat columns compare at decimal(5,2)."""
    import pyspark.sql.functions as F

    casts = []
    for field in spec_schema.split(","):
        name, typ = field.strip().split(" ")[:2]
        if typ in ("float", "double"):
            casts.append(F.col(name).cast(dec).alias(name))
        else:
            casts.append(F.col(name))
    return df.select(*casts)


class TestTsdfGoldens:
    """Reference's RECORDED answers for range/group stats, the resample
    trio, the extractStateIntervals operator sweep, and the string-ts
    slice family (reference: python/tests/tsdf_tests.py via
    unit_test_data/tsdf_tests.json)."""

    cases = load_cases("tsdf_tests")

    def test_range_stats_ref(self, spark):
        c = self.cases["range_stats"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.withRangeStats(rangeBackWindowSecs=1200).df
        exp = c["expected"]
        out = _dec_cols(out.select(
            *[f.strip().split(" ")[0] for f in exp["schema"].split(",")]
        ), exp["schema"], spark)
        from tests.golden_utils import build_df

        expected = _dec_cols(build_df(spark, exp), exp["schema"], spark)
        a = sorted(map(str, out.collect()))
        e = sorted(map(str, expected.collect()))
        assert a == e

    def test_group_stats_ref(self, spark):
        import pyspark.sql.functions as F

        c = self.cases["group_stats"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.withGroupedStats(freq="1 min").df
        exp = c["expected"]
        names = [f.strip().split(" ")[0] for f in exp["schema"].split(",")]

        def norm(df):
            # the reference's recorded schema stores the integer-metric
            # stats as int while the engine emits double (its equality
            # helper coerces); compare everything numeric as double
            cols = [
                F.col(n).cast("double").alias(n)
                if n.endswith("_index") else F.col(n)
                for n in names
            ]
            return _dec_cols(df.select(*cols), exp["schema"], spark)

        from tests.golden_utils import build_df

        a = sorted(map(str, norm(out).collect()))
        e = sorted(map(str, norm(build_df(spark, exp)).collect()))
        assert a == e

    def test_resample_floor_ref(self, spark):
        import pyspark.sql.functions as F

        c = self.cases["resample"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.resample(
            freq="min", func="floor", prefix="floor",
            metricCols=["trade_pr", "date", "trade_pr_2"],
        ).df
        assert_matches_golden(out, c["expected_floor"], spark)

    def test_resample_5min_mean_ref(self, spark):
        import pyspark.sql.functions as F

        c = self.cases["resample"]
        # ANSI deviation: the reference averages the STRING date column
        # (non-ANSI Spark nulls it); ANSI mode refuses the implicit cast,
        # so the cast is explicit here — the recorded nulls still match
        t = build_tsdf(spark, c["inputs"]["data"])
        t = t.withColumn("date", F.col("date").try_cast("double"))
        out = t.resample(freq="5 minutes", func="mean").df.withColumn(
            "trade_pr", F.round(F.col("trade_pr"), 2)
        )
        assert_matches_golden(out, c["expected_5min_mean"], spark)

    def test_calc_bars_ref(self, spark):
        c = self.cases["resample"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.calc_bars(freq="min", metricCols=["trade_pr", "trade_pr_2"]).df
        assert_matches_golden(out, c["expected_bars"], spark)

    def test_resample_millis_ref(self, spark):
        import pyspark.sql.functions as F

        c = self.cases["resample_millis"]
        t = build_tsdf(spark, c["inputs"]["data"])
        t = t.withColumn("date", F.col("date").try_cast("double"))
        out = t.resample(freq="ms", func="mean").df.withColumn(
            "trade_pr", F.round(F.col("trade_pr"), 2)
        )
        assert_matches_golden(out, c["expected"], spark)

    def test_upsample_ref(self, spark):
        import pyspark.sql.functions as F

        c = self.cases["upsample"]
        t = build_tsdf(spark, c["inputs"]["data"])
        t = t.withColumn("date", F.col("date").try_cast("double"))
        out = t.resample(freq="5 minutes", func="mean", fill=True).df.withColumn(
            "trade_pr", F.round(F.col("trade_pr"), 2)
        )
        out = out.where(
            F.col("event_ts").cast("string").isin(
                [s for s in c["filter_ts"]]
            )
        )
        assert_matches_golden(out, c["expected_30m_filtered"], spark)

    @pytest.mark.parametrize(
        "name",
        [
            "eq_0", "eq_1", "ne_0", "ne_1", "gt_0", "gt_1", "lt_0", "lt_1",
            "gte_0", "gte_1", "lte_0", "lte_1",
            "null_safe_eq_0", "null_safe_eq_1", "adjacent_intervals",
        ],
    )
    def test_state_intervals_ref(self, spark, name):
        c = self.cases["state_intervals"]["cases"][name]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.extractStateIntervals(
            "metric_1", "metric_2", "metric_3", state_definition=c["op"]
        )
        assert_matches_golden(out, c["expected"], spark)

    @pytest.mark.parametrize(
        "name",
        [
            "fourier",
            "fourier_no_sequence_col_empty_partition_cols",
            "fourier_valid_sequence_col_empty_partition_cols",
            "fourier_valid_sequence_col_valid_partition_cols",
        ],
    )
    def test_fourier_ref(self, spark, name):
        """Reference's RECORDED FFT outputs (reference:
        python/tests/tsdf_tests.py:894-946) — incl. the sequence-col and
        empty-series variants; compared at 6 decimals (the recorded values
        carry the reference's own float formatting)."""
        from tests.golden_utils import build_df

        c = self.cases["fourier"][name]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.fourier_transform(1, "val").df
        exp = build_df(spark, c["expected"])
        cols = sorted(exp.columns)
        # this engine PASSES THROUGH non-series extra columns (the
        # reference drops them when they aren't partition cols) — a
        # deliberate superset; compare on the recorded columns
        assert set(cols) <= set(out.columns)
        out = out.select(*cols)

        def norm(df):
            return sorted(
                tuple(
                    round(v, 6) + 0.0 if isinstance(v, float) else v
                    for v in (r[c2] for c2 in cols)
                )
                for r in df.collect()
            )

        assert norm(out) == norm(exp)

    @pytest.mark.parametrize(
        "name",
        [
            "at", "before", "atOrBefore", "after", "atOrAfter",
            "between", "between_exclusive", "earliest", "latest",
            "priorTo", "subsequentTo",
        ],
    )
    def test_slices_ref(self, spark, name):
        c = self.cases["slices"]["cases"][name]
        t = build_tsdf(spark, c["inputs"]["data"])
        args = list(c["args"])
        if name == "between_exclusive":
            out = t.between(args[0], args[1], inclusive=False)
        elif name in ("earliest", "latest"):
            out = getattr(t, c["method"])(n=args[0])
        else:
            out = getattr(t, c["method"])(*args)
        assert_matches_golden(out.df, c["expected"], spark)

    @pytest.mark.parametrize(
        "name",
        [
            "at", "before", "atOrBefore", "after", "atOrAfter",
            "between", "between_exclusive", "earliest", "latest",
            "priorTo", "subsequentTo",
        ],
    )
    def test_slices_string_ts_construction_ref(self, spark, name):
        """The reference's *_string_timestamp variants (reference:
        python/tests/tsdf_tests.py:546-878) drive the CONSTRUCTOR's
        string-timestamp parse (their eager head(1) auto-parse; here the
        opt-in lazy ``parse_string_ts=True``) — same fixtures, same
        answers as the pre-converted slice family."""
        from tempo_spark import TSDF

        c = self.cases["slices"]["cases"][name]
        spec = c["inputs"]["data"]
        raw = build_df(
            spark, {k: v for k, v in spec.items() if k != "ts_convert"}
        )
        t = TSDF(raw, parse_string_ts=True, **spec["tsdf"])
        args = list(c["args"])
        if name == "between_exclusive":
            out = t.between(args[0], args[1], inclusive=False)
        elif name in ("earliest", "latest"):
            out = getattr(t, c["method"])(n=args[0])
        else:
            out = getattr(t, c["method"])(*args)
        assert_matches_golden(out.df, c["expected"], spark)

    @pytest.mark.parametrize(
        "name",
        [
            "at", "before", "atOrBefore", "after", "atOrAfter",
            "between", "between_exclusive", "earliest", "latest",
            "priorTo", "subsequentTo",
        ],
    )
    def test_slices_double_ts_ref(self, spark, name):
        """The reference's *_numeric_timestamp variants (reference:
        python/tests/tsdf_tests.py:557-878 via __tsdf_with_double_tscol):
        ts_col cast to epoch-seconds double, slice targets as doubles —
        same fixtures, recorded answers double-cast the same way."""
        import calendar
        import time as _time

        import pyspark.sql.functions as F

        from tempo_spark import TSDF

        def to_dbl(ts: str) -> float:
            # the reference's isoparse(ts).timestamp() under the UTC test
            # session (conftest pins it) = UTC epoch seconds
            return float(
                calendar.timegm(_time.strptime(ts, "%Y-%m-%d %H:%M:%S"))
            )

        c = self.cases["slices"]["cases"][name]
        t = build_tsdf(spark, c["inputs"]["data"])
        tsc = t.ts_col
        td = TSDF(
            t.df.withColumn(tsc, F.col(tsc).cast("double")),
            ts_col=tsc,
            series_ids=t.series_ids,
        )
        args = list(c["args"])
        if name in ("earliest", "latest"):
            out = getattr(td, c["method"])(n=args[0])
        elif name == "between_exclusive":
            out = td.between(to_dbl(args[0]), to_dbl(args[1]), inclusive=False)
        else:
            out = getattr(td, c["method"])(*[to_dbl(a) for a in args])
        expected = build_df(spark, c["expected"]).withColumn(
            tsc, F.col(tsc).cast("double")
        )
        a = sorted(map(str, out.df.collect()))
        e = sorted(map(str, expected.collect()))
        assert a == e


class TestAnalyticsGoldens:
    cases = load_cases("analytics_tests")

    def test_state_intervals_eq(self, spark):
        c = self.cases["state_intervals_eq"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.extractStateIntervals("v", state_definition="=")
        assert_matches_golden(out, c["expected"], spark)

    def test_vwap_minute(self, spark):
        c = self.cases["vwap_minute"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.vwap(frequency="m", volume_col="volume", price_col="price").df
        assert_matches_golden(out, c["expected"], spark)

    def test_ema_three_rows(self, spark):
        # e=0.5, window=3: ema_t = 0.5*v_t + 0.25*v_{t-1} + 0.125*v_{t-2}
        c = self.cases["ema_three_rows"]
        t = build_tsdf(spark, c["inputs"]["data"])
        out = t.EMA("v", window=3, exp_factor=0.5).df
        assert_matches_golden(out, c["expected"], spark)
