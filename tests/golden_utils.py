"""JSON golden-fixture harness, modeled on the reference's test strategy
(reference: python/tests/base.py:19-211,306-355): each test module has a
JSON file of named cases; a case holds input DataFrame specs (DDL schema +
row literals + optional ts conversion + TSDF kwargs) and the expected
output. Fixtures here are authored for this engine, not copied.

Spec format:
{
  "case_name": {
    "inputs": {"left": {"schema": "...", "rows": [[...]], "ts_convert": ["c"],
                         "tsdf": {"ts_col": "...", "series_ids": [...]}}},
    "expected": {"schema": "...", "rows": [[...]], "ts_convert": ["c"]}
  }
}
"""

from __future__ import annotations

import datetime as dt
import json
from pathlib import Path

GOLDEN_DIR = Path(__file__).parent / "goldens"


def load_cases(name: str) -> dict:
    with open(GOLDEN_DIR / f"{name}.json") as f:
        return json.load(f)


def build_df(spark, spec: dict):
    import pyspark.sql.functions as F

    rows = [tuple(r) for r in spec["rows"]]
    df = spark.createDataFrame(rows, spec["schema"])
    # the four conversions mirror the reference loader's
    # (reference: python/tests/base.py:140-190): to_timestamp /
    # to_timestamp_ntz / to_date / cast("decimal") (= decimal(10,0))
    for c in spec.get("ts_convert", []):
        df = df.withColumn(c, F.to_timestamp(F.col(c)))
    for c in spec.get("ts_convert_ntz", []):
        df = df.withColumn(c, F.to_timestamp_ntz(F.col(c)))
    for c in spec.get("date_convert", []):
        df = df.withColumn(c, F.to_date(F.col(c)))
    for c in spec.get("decimal_convert", []):
        df = df.withColumn(c, F.col(c).cast("decimal"))
    return df


def build_tsdf(spark, spec: dict):
    from tempo_spark import TSDF

    return TSDF(build_df(spark, spec), **spec.get("tsdf", {}))


def assert_matches_golden(actual_df, expected_spec: dict, spark, sort_by=None):
    expected = build_df(spark, expected_spec)
    a_cols = sorted(actual_df.columns)
    e_cols = sorted(expected.columns)
    assert a_cols == e_cols, f"schema mismatch: {a_cols} vs {e_cols}"

    def normalize(rows, cols):
        out = []
        for r in rows:
            vals = []
            for c in cols:
                v = r[c]
                if isinstance(v, float):
                    v = round(v, 9)
                if isinstance(v, dt.datetime):
                    v = v.isoformat()
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=lambda t: tuple(str(x) for x in t))

    a = normalize(actual_df.collect(), a_cols)
    e = normalize(expected.collect(), e_cols)
    assert a == e, f"rows differ:\nactual  : {a}\nexpected: {e}"
