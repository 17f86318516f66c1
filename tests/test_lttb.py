"""LTTB display downsampling (operators/lttb.py)."""

import datetime as dt

import pytest
import pyspark.sql.functions as F

from tempo_spark import TSDF


def ts(s):
    return dt.datetime.fromisoformat(s)


def _series(spark, rows, series_col=True):
    if series_col:
        return spark.createDataFrame(rows, "sym string, ts timestamp, v double")
    return spark.createDataFrame(rows, "ts timestamp, v double")


def _python_lttb(points, n_out):
    """Reference model: parallel LTTB with bucket-average anchors and
    endpoint anchors for the edge buckets; ties by earliest ts."""
    pts = sorted(points)
    n = len(pts)
    if n <= n_out:
        return pts
    if n_out == 2:
        return [pts[0], pts[-1]]
    x0 = pts[0][0]
    # exact micro-grid y like the operator (floor(y*1e6+0.5)/1e6)
    import math

    def q(y):
        return math.floor(y * 1e6 + 0.5) / 1e6

    interior = [(i, pts[i][0] - x0, q(pts[i][1])) for i in range(1, n - 1)]
    nb = n_out - 2
    buckets = {}
    for idx, (i, x, y) in enumerate(interior):
        b = (idx * nb) // (n - 2)
        buckets.setdefault(b, []).append((i, float(x), y))
    avgs = {
        b: (sum(x for _, x, _ in v) / len(v), sum(y for _, _, y in v) / len(v))
        for b, v in buckets.items()
    }
    first = (0.0, q(pts[0][1]))
    last = (float(pts[-1][0] - x0), q(pts[-1][1]))
    keep = [pts[0], pts[-1]]
    for b in sorted(buckets):
        pax, pay = avgs.get(b - 1, first)
        nax, nay = avgs.get(b + 1, last)
        best = None
        for i, x, y in buckets[b]:
            area = abs((pax - nax) * (y - pay) - (pax - x) * (nay - pay))
            if best is None or area > best[0]:
                best = (area, i)
        keep.append(pts[best[1]])
    return sorted(keep)


class TestLttb:
    def test_small_series_pass_through(self, spark):
        rows = [("a", ts(f"2024-01-01 00:00:0{i}"), float(i)) for i in range(5)]
        t = TSDF(_series(spark, rows), ts_col="ts", series_ids=["sym"])
        out = t.downsample_lttb(10, "v")
        assert out.count() == 5
        assert sorted(out.columns) == ["sym", "ts", "v"]

    def test_matches_python_model(self, spark):
        import random

        rng = random.Random(5)
        base = dt.datetime(2024, 1, 1)
        pts = []
        x = 0
        for _ in range(200):
            x += rng.randint(1, 90)
            pts.append((x, rng.uniform(-50, 50)))
        rows = [
            ("a", base + dt.timedelta(seconds=x), y) for x, y in pts
        ]
        t = TSDF(_series(spark, rows), ts_col="ts", series_ids=["sym"])
        got = sorted(
            (int((r.ts - base).total_seconds()), r.v)
            for r in t.downsample_lttb(20, "v").collect()
        )
        want = _python_lttb([(x * 1_000_000, y) for x, y in pts], 20)
        want = sorted((x // 1_000_000, y) for x, y in want)
        assert [g[0] for g in got] == [w[0] for w in want]
        assert got == want
        assert len(got) == 20

    def test_endpoints_always_kept_and_peaks_survive(self, spark):
        base = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(100):
            v = 1.0
            if i == 37:
                v = 500.0  # spike must survive
            rows.append(("a", base + dt.timedelta(seconds=i), v))
        t = TSDF(_series(spark, rows), ts_col="ts", series_ids=["sym"])
        kept = {r.ts for r in t.downsample_lttb(12, "v").collect()}
        assert base in kept and base + dt.timedelta(seconds=99) in kept
        assert base + dt.timedelta(seconds=37) in kept
        assert len(kept) == 12

    def test_global_series_and_n2(self, spark):
        base = dt.datetime(2024, 1, 1)
        rows = [(base + dt.timedelta(seconds=i), float(i % 7)) for i in range(50)]
        t = TSDF(_series(spark, rows, series_col=False), ts_col="ts", series_ids=[])
        out = t.downsample_lttb(8, "v")
        assert out.count() == 8
        assert sorted(out.columns) == ["ts", "v"]
        two = t.downsample_lttb(2, "v").collect()
        assert sorted(r.ts for r in two) == [rows[0][0], rows[-1][0]]

    def test_null_values_never_win(self, spark):
        base = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(40):
            v = None if 10 <= i < 20 else float(i % 3)
            rows.append(("a", base + dt.timedelta(seconds=i), v))
        t = TSDF(_series(spark, rows), ts_col="ts", series_ids=["sym"])
        out = t.downsample_lttb(6, "v").collect()
        assert len(out) == 6
        # interior picks avoid the all-null stretch unless a bucket is
        # entirely null (then the earliest row in the bucket is taken)
        for r in out:
            if r.v is None:
                # only acceptable if its bucket had no non-null candidate
                assert 10 <= (r.ts - base).total_seconds() < 20

    def test_all_null_neighbor_bucket_does_not_poison(self, spark):
        """r10 review: an all-NULL neighbor bucket must fall back to the
        endpoint anchor (like an absent neighbor), not NULL-poison the
        adjacent buckets' areas — a spike next to a NULL run survives."""
        base = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(20):
            if 6 <= i < 12:
                v = None                      # one interior bucket all-NULL
            elif i == 15:
                v = 100.0                     # spike in the next bucket
            else:
                v = float(i % 3)
            rows.append(("a", base + dt.timedelta(seconds=i), v))
        t = TSDF(_series(spark, rows), ts_col="ts", series_ids=["sym"])
        kept = {int((r.ts - base).total_seconds()) for r in
                t.downsample_lttb(5, "v").collect()}
        assert 15 in kept

    def test_reserved_prefix_guard(self, spark):
        rows = [("a", ts("2024-01-01 00:00:01"), 1.0)]
        df = _series(spark, rows).withColumn("__lt_g", F.lit(9))
        t = TSDF(df, ts_col="ts", series_ids=["sym"])
        with pytest.raises(ValueError, match="reserved"):
            t.downsample_lttb(5, "v")
        with pytest.raises(ValueError, match="reserved"):
            t.downsample_minmax(5, "v")

    def test_validations_and_plan(self, spark):
        from tempo_spark.plans.inspect import count_exchanges

        base = dt.datetime(2024, 1, 1)
        rows = [("a", base + dt.timedelta(seconds=i), float(i)) for i in range(30)]
        t = TSDF(_series(spark, rows), ts_col="ts", series_ids=["sym"])
        # one identical hash(series) exchange per union branch — ReuseExchange
        # collapses them to one physical shuffle (windows-only, no joins)
        assert count_exchanges(t.downsample_lttb(5, "v")) == 3
        with pytest.raises(ValueError, match="n_out"):
            t.downsample_lttb(1, "v")
        with pytest.raises(ValueError, match="value_col"):
            t.downsample_lttb(5, "nope")
        df2 = _series(spark, rows).withColumn("__lt_pos", F.lit(1))
        with pytest.raises(ValueError, match="reserved"):
            TSDF(df2, ts_col="ts", series_ids=["sym"]).downsample_lttb(5, "v")


class TestMinMax:
    def test_envelope_preserved(self, spark):
        base = dt.datetime(2024, 1, 1)
        rows = []
        for i in range(100):
            v = float(i % 5)
            if i == 23:
                v = 900.0
            if i == 71:
                v = -900.0
            rows.append(("a", base + dt.timedelta(seconds=i), v))
        t = TSDF(_series(spark, rows), ts_col="ts", series_ids=["sym"])
        out = t.downsample_minmax(10, "v").collect()
        vals = {r.v for r in out}
        assert 900.0 in vals and -900.0 in vals
        assert len(out) <= 20
        # every bucket contributes its exact min and max
        import math

        buckets = {}
        for i, (_, _, v) in enumerate(rows):
            buckets.setdefault((i * 10) // 100, []).append(v)
        kept_ts = {int((r.ts - base).total_seconds()) for r in out}
        for b, vs in buckets.items():
            lo, hi = min(vs), max(vs)
            got = [rows[i][2] for i in range(100) if (i * 10) // 100 == b and i in kept_ts]
            assert lo in got and hi in got

    def test_single_row_buckets_and_ties(self, spark):
        base = dt.datetime(2024, 1, 1)
        # constant series: min == max row -> exactly one row per bucket
        rows = [("a", base + dt.timedelta(seconds=i), 7.0) for i in range(20)]
        t = TSDF(_series(spark, rows), ts_col="ts", series_ids=["sym"])
        out = t.downsample_minmax(4, "v").collect()
        assert len(out) == 4  # earliest row per bucket, selected once
        with pytest.raises(ValueError, match="n_buckets"):
            t.downsample_minmax(0, "v")
