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
