"""Plan inspection helpers.

The reference picks its as-of strategy by regexing ``EXPLAIN COST`` output
for ``sizeInBytes`` (reference: python/tempo/tsdf.py:702-750). These helpers
expose the same signal through the public API, plus convenience checks used
in perf tests (pushed filters, codegen coverage, exchange count).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame


def plan_size_bytes(df: DataFrame) -> Optional[float]:
    """Catalyst's estimated sizeInBytes for a DataFrame's optimized plan.
    Returns None when no estimate is available."""
    import uuid

    spark = df.sparkSession
    # unique per call: a fixed name races when two threads probe the same
    # session concurrently (each would size — or drop — the other's view)
    name = f"__tempo_plan_probe_{uuid.uuid4().hex}"
    df.createOrReplaceTempView(name)
    try:
        rows = spark.sql(f"EXPLAIN COST SELECT * FROM {name}").head(1)
        if not rows:
            return None
        text = rows[0][0]
        m = re.search(r"sizeInBytes=([0-9.]+)\s*(B|KiB|MiB|GiB|TiB|PiB|EiB)", text)
        if not m:
            return None
        mult = {"B": 1, "KiB": 2**10, "MiB": 2**20, "GiB": 2**30, "TiB": 2**40,
                "PiB": 2**50, "EiB": 2**60}
        size = float(m.group(1)) * mult[m.group(2)]
        if size >= 2**60:  # Spark's Long.Max-ish sentinel for "unknown"
            return None
        return size
    finally:
        spark.catalog.dropTempView(name)


#: memoized plan-size estimates keyed by semanticHash — same
#: index-statistic contract as the asof count / auto-bin caches: a stale
#: entry can only pick a suboptimal join strategy, never a wrong answer.
_PLAN_SIZE_CACHE: dict = {}
_PLAN_SIZE_CACHE_MAX = 256


def plan_size_bytes_cached(df: DataFrame) -> Optional[float]:
    """Memoized :func:`plan_size_bytes` (the probe runs EXPLAIN COST —
    cheap but not free; strategy picks repeat over the same inputs)."""
    try:
        key = df.semanticHash()
    except Exception:  # pragma: no cover - plans a hash can't reach
        key = None
    if key is not None and key in _PLAN_SIZE_CACHE:
        return _PLAN_SIZE_CACHE[key]
    size = plan_size_bytes(df)
    if key is not None:
        if len(_PLAN_SIZE_CACHE) >= _PLAN_SIZE_CACHE_MAX:
            _PLAN_SIZE_CACHE.pop(next(iter(_PLAN_SIZE_CACHE)))
        _PLAN_SIZE_CACHE[key] = size
    return size


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan — the main
    scale lever to watch when composing operators."""
    plan = formatted_plan(df)
    return len(re.findall(r"Arguments: hashpartitioning", plan))


#: memoized series-clustering probe results keyed by (semanticHash, keys) —
#: a plan-CHOICE statistic only: a stale or collided entry picks a slower
#: plan, never wrong results. Bounded for long-lived drivers. NOTE: the
#: round-7 automatic exchange-collapse experiments that consumed this were
#: REVERTED after same-session A/Bs measured them slower (map-side-combined
#: partial shuffles beat one raw-row repartition on every tested shape —
#: see the negative-result notes in operators/resample.py and
#: intervals.make_disjoint). The probe stays for plan tooling/tests.
_CLUSTERED_CACHE: dict = {}
_CLUSTERED_CACHE_MAX = 512


def is_series_clustered(df: DataFrame, series: list) -> bool:
    """True when ``df``'s physical plan already PROVIDES hash clustering
    compatible with grouping by ``series``: a ``groupBy(series)`` probe
    plan compiles with zero exchanges. Detects bucketed scans and frames
    whose topmost shuffle was keyed by a series subset (a prior
    aggregation/window on these keys). A bare upstream
    ``df.repartition(series)`` node reads as NOT clustered (the probe
    counts the repartition's own exchange). Compiles one explain (no jobs
    run); memoized like the make_disjoint auto-bin probe."""
    import pyspark.sql.functions as F

    key = (df.semanticHash(), tuple(series))
    if key not in _CLUSTERED_CACHE:
        if len(_CLUSTERED_CACHE) >= _CLUSTERED_CACHE_MAX:
            _CLUSTERED_CACHE.clear()
        probe = df.groupBy(*[F.col(c) for c in series]).agg(
            F.count(F.lit(1))
        )
        _CLUSTERED_CACHE[key] = count_exchanges(probe) == 0
    return _CLUSTERED_CACHE[key]


def count_python_evals(df: DataFrame) -> int:
    """Number of Python-worker operators (row/Arrow UDF eval, pandas
    group-map / map-iter) in the physical plan. The repo invariant is ZERO
    for every operator except FFT, multimodal decode, and the custom
    stateful streaming kernels — everything else must stay JVM-side."""
    plan = formatted_plan(df)
    # match only the details-section headers ("(4) FlatMapGroupsInPandas");
    # the tree section repeats each node name with the number trailing
    return len(
        re.findall(
            r"^\(\d+\) (?:BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas"
            r"|MapInPandas|FlatMapGroupsInPandasWithState)",
            plan,
            re.MULTILINE,
        )
    )


def has_pushed_filters(df: DataFrame) -> bool:
    return "PushedFilters: [" in formatted_plan(df) and "PushedFilters: []" not in formatted_plan(df)
