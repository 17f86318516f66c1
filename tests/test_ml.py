

class TestSlidingWindowFolds:
    """r12: max_train_splits (sklearn TimeSeriesSplit max_train_size)."""

    def test_sliding_vs_expanding(self, spark):
        import datetime as dt

        from tempo_spark.ml import chronological_folds

        base = dt.datetime(2024, 1, 1)
        rows = [("a", base + dt.timedelta(hours=i)) for i in range(60)]
        df = spark.createDataFrame(rows, "sym string, ts timestamp")
        exp = chronological_folds(df, 5, "ts", ["sym"])
        sld = chronological_folds(df, 5, "ts", ["sym"], max_train_splits=2)
        # 60 rows into 6 splits of 10: expanding trains 10,20,30,40,50;
        # sliding-2 trains 10,20,20,20,20
        assert [t.count() for t, _ in exp] == [10, 20, 30, 40, 50]
        assert [t.count() for t, _ in sld] == [10, 20, 20, 20, 20]
        # same tests both ways
        assert [v.count() for _, v in exp] == [10] * 5
        assert [v.count() for _, v in sld] == [10] * 5
        # sliding trains end at the same boundary as expanding
        for (te, _), (ts_, _) in zip(exp, sld):
            assert (
                te.agg({"ts": "max"}).collect()[0][0]
                == ts_.agg({"ts": "max"}).collect()[0][0]
            )
        import pytest as _pt

        with _pt.raises(ValueError, match="max_train_splits"):
            chronological_folds(df, 5, "ts", ["sym"], max_train_splits=0)

    def test_cv_param_plumbs(self, spark):
        from tempo_spark.ml import TimeSeriesCrossValidator

        cv = TimeSeriesCrossValidator(
            timeSeriesCol="ts", seriesIdCols=["sym"], maxTrainSplits=3
        )
        assert cv.getMaxTrainSplits() == 3
        assert cv.setMaxTrainSplits(2).getMaxTrainSplits() == 2
