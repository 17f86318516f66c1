"""Golden-fixture tests (reference test-strategy pattern, SURVEY.md §5).

Each case: build inputs from JSON spec → run the operator → compare to the
expected JSON rows order-insensitively."""

import pytest

from tests.golden_utils import assert_matches_golden, build_tsdf, load_cases


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
