"""Port the reference's RECORDED golden answers into tests/goldens/ as data.

The reference pins operator semantics with JSON goldens
(reference: python/tests/unit_test_data/*.json, loaded by
python/tests/base.py:19-211). This script resolves their ``$ref`` pointers
and re-emits the edge cases the round-5 verdict called out — the as-of
tolerance sweep [None, 0, 5.5, 7, 10] incl. the exactly-at-tolerance
boundary, the five interpolation fill methods with interpolation flags
(trailing-null bfill, leading-null ffill), and the issue-268 interval
values plus the make_disjoint shape family — in this repo's golden spec
format (tests/golden_utils.py). Expected rows are the REFERENCE'S recorded
answers, not re-derivations.

Run from the repo root:  python scripts/port_goldens.py
"""

from __future__ import annotations

import json
from pathlib import Path

REF = Path("/root/reference/python/tests/unit_test_data")
OUT = Path(__file__).resolve().parent.parent / "tests" / "goldens"


def resolve(node, root):
    """Resolve JSON-pointer ``$ref``s recursively (the reference's loader
    does the same, python/tests/base.py)."""
    if isinstance(node, dict):
        if set(node) == {"$ref"}:
            target = root
            for part in node["$ref"].lstrip("#/").split("/"):
                target = target[part]
            return resolve(target, root)
        return {k: resolve(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [resolve(v, root) for v in node]
    return node


def load(name: str) -> dict:
    with open(REF / f"{name}.json") as f:
        raw = json.load(f)
    return resolve(raw, raw)


def df_spec(ref_spec: dict, tsdf_key: str = "tsdf") -> dict:
    """Reference {tsdf:{ts_col,partition_cols}, df:{schema,ts_convert,data}}
    -> this repo's {schema, rows, ts_convert, tsdf:{ts_col, series_ids}}."""
    df = ref_spec["df"]
    out = {
        "schema": df["schema"],
        "rows": df["data"],
    }
    for key in ("ts_convert", "ts_convert_ntz", "date_convert", "decimal_convert"):
        if df.get(key):
            out[key] = df[key]
    meta = ref_spec.get(tsdf_key)
    if meta and tsdf_key == "tsdf":
        out["tsdf"] = {
            "ts_col": meta["ts_col"],
            "series_ids": meta.get("partition_cols", []),
        }
        if meta.get("sequence_col"):
            out["tsdf"]["sequence_col"] = meta["sequence_col"]
    elif meta and tsdf_key == "idf":
        out["idf"] = {
            "start_ts": meta["start_ts"],
            "end_ts": meta["end_ts"],
            "series_ids": meta.get("series_ids", []),
        }
    return out


def main() -> None:
    # ---- as-of tolerance sweep (reference: python/tests/as_of_join_tests.py:126-146)
    asof = load("as_of_join_tests")["AsOfJoinTest"]["test_asof_join_tolerance"]
    tol_case = {
        "_source": "reference python/tests/unit_test_data/as_of_join_tests.json "
        "test_asof_join_tolerance (recorded answers; tolerance is INCLUSIVE "
        "at exactly-tolerance age: age 7 kept at tolerance=7, age 0 at 0)",
        "inputs": {
            "left": df_spec(asof["left"]),
            "right": df_spec(asof["right"]),
        },
        "expected_by_tolerance": {
            str(t): df_spec(asof[f"expected_tolerance_{t}"])
            for t in ["None", 0, 5.5, 7, 10]
        },
    }

    goldens = json.load(open(OUT / "asof_tests.json"))
    goldens["ref_tolerance_sweep"] = tol_case

    # ---- skip-nulls pair, sequence-number tie-break, skew ts-partition,
    # nanos double-ts (reference: python/tests/as_of_join_tests.py:36-124;
    # recorded answers, not re-derivations)
    asof_all = load("as_of_join_tests")["AsOfJoinTest"]
    sk = asof_all["test_asof_join_skip_nulls_disabled"]
    goldens["ref_skip_nulls"] = {
        "_source": "reference as_of_join_tests.json "
        "test_asof_join_skip_nulls_disabled (recorded answers for BOTH "
        "skipNulls=True and =False; call: asofJoin(left_prefix='left', "
        "right_prefix='right'))",
        "inputs": {"left": df_spec(sk["left"]), "right": df_spec(sk["right"])},
        "expected_by_mode": {
            "skip_nulls": df_spec(sk["expected_skip_nulls"]),
            "skip_nulls_disabled": df_spec(sk["expected_skip_nulls_disabled"]),
        },
    }
    sq = asof_all["test_sequence_number_sort"]
    goldens["ref_sequence_number_sort"] = {
        "_source": "reference as_of_join_tests.json test_sequence_number_sort "
        "(recorded; right carries sequence_col=seq_nb breaking same-ts ties; "
        "call: asofJoin(right_prefix='right'), left unprefixed)",
        "inputs": {"left": df_spec(sq["left"]), "right": df_spec(sq["right"])},
        "expected": df_spec(sq["expected"]),
    }
    pt = asof_all["test_partitioned_asof_join"]
    goldens["ref_partitioned"] = {
        "_source": "reference as_of_join_tests.json test_partitioned_asof_join "
        "(recorded; call: asofJoin(left_prefix='left', right_prefix='right', "
        "tsPartitionVal=10, fraction=0.1) — skew path must equal plain as-of)",
        "inputs": {"left": df_spec(pt["left"]), "right": df_spec(pt["right"])},
        "expected": df_spec(pt["expected"]),
    }
    nn = asof_all["test_asof_join_nanos"]
    goldens["ref_nanos"] = {
        "_source": "reference as_of_join_tests.json test_asof_join_nanos "
        "(recorded; string ts w/ nanosecond digits parse to DOUBLE epoch "
        "seconds = unix_timestamp + fraction; call: fromStringTs(nanos=True) "
        "then asofJoin(left_prefix='left', right_prefix='right'))",
        "inputs": {"left": df_spec(nn["left"]), "right": df_spec(nn["right"])},
        "expected": df_spec(nn["expected"]),
    }
    with open(OUT / "asof_tests.json", "w") as f:
        json.dump(goldens, f, indent=1)

    # ---- interpolation fill methods w/ flags (reference: python/tests/interpol_tests.py:136-311)
    interp = load("interpol_tests")["InterpolationUnitTest"]
    methods = {
        "zero": "test_zero_fill_interpolation",
        "null": "test_null_fill_interpolation",
        "bfill": "test_back_fill_interpolation",
        "ffill": "test_forward_fill_interpolation",
        "linear": "test_linear_fill_interpolation",
    }
    any_case = interp[methods["zero"]]
    fill_case = {
        "_source": "reference python/tests/unit_test_data/interpol_tests.json "
        "InterpolationUnitTest (recorded answers; freq='30 seconds', "
        "func='mean', show_interpolated=True; pins trailing-null bfill, "
        "leading-null ffill, linear edge nulls)",
        "inputs": {"data": df_spec(any_case["simple_init"])},
        "expected_by_method": {
            m: df_spec(interp[t]["expected"]) for m, t in methods.items()
        },
    }
    goldens = json.load(open(OUT / "interpol_tests.json"))
    goldens["ref_fill_methods"] = fill_case

    # ---- freq abbreviations (reference: python/tests/interpol_tests.py:
    # test_different_freq_abbreviations — '30 sec' must equal '30 seconds')
    ab = interp["test_different_freq_abbreviations"]
    goldens["ref_freq_abbreviations"] = {
        "_source": "reference interpol_tests.json "
        "test_different_freq_abbreviations (recorded; call: interpolate("
        "freq='30 sec', func='mean', method='linear', target_cols="
        "['value_a','value_b'], show_interpolated=True))",
        "inputs": {"data": df_spec(ab["simple_init"])},
        "expected": df_spec(ab["expected"]),
    }

    # ---- non-numeric fills: ffill/bfill/null run on string/boolean/date/
    # timestamp/decimal columns; linear/zero raise (reference:
    # python/tests/interpol_tests.py:441-530, recorded answers)
    nn_methods = {
        "ffill": "test_non_numeric_forward_fill",
        "bfill": "test_non_numeric_back_fill",
        "null": "test_non_numeric_null_fill",
    }
    goldens["ref_non_numeric"] = {
        "_source": "reference interpol_tests.json InterpolationUnitTest "
        "non-numeric family (recorded; call: interpolate(freq='30 seconds', "
        "func='ceil', method=m, target_cols=<all non-partition cols>); "
        "linear/zero on ['string_col','timestamp_col'] must raise ValueError)",
        "inputs": {"data": df_spec(interp[nn_methods["ffill"]]["non_numeric_init"])},
        "expected_by_method": {
            m: df_spec(interp[t]["expected"]) for m, t in nn_methods.items()
        },
        "error_methods": ["linear", "zero"],
        "error_target_cols": ["string_col", "timestamp_col"],
    }

    # ---- integration: TSDF-level defaulting + resample chaining (reference:
    # python/tests/interpol_tests.py InterpolationIntegrationTest)
    ii = load("interpol_tests")["InterpolationIntegrationTest"]
    integration = {
        "default_tsdf_params": (
            "test_interpolation_using_default_tsdf_params",
            "interpolate(freq='30 seconds', func='mean', method='linear') — "
            "target_cols defaults to all numeric metric columns",
        ),
        "custom_params": (
            "test_interpolation_using_custom_params",
            "ts renamed to other_ts_col; interpolate(target_cols=['value_a'], "
            "freq='30 seconds', func='mean', method='linear', "
            "show_interpolated=True)",
        ),
        "on_sampled_data": (
            "test_interpolation_on_sampled_data",
            "resample('30 seconds','mean').interpolate(method='linear', "
            "target_cols=['value_a'], show_interpolated=True)",
        ),
        "defaults_with_resampled_df": (
            "test_defaults_with_resampled_df",
            "resample('30 seconds','mean').interpolate(method='ffill')",
        ),
    }
    cases_ii = {}
    for name, (t, call) in integration.items():
        c = ii[t]
        cases_ii[name] = {
            "_call": call,
            "inputs": {"data": df_spec(c["simple_init"])},
            "expected": df_spec(c["expected"]),
        }
    goldens["ref_integration"] = {
        "_source": "reference interpol_tests.json InterpolationIntegrationTest "
        "(recorded answers)",
        "cases": cases_ii,
    }
    with open(OUT / "interpol_tests.json", "w") as f:
        json.dump(goldens, f, indent=1)

    # ---- resample unit aggregates at '1 DAY' incl. string metric col,
    # prefix and fill variants (reference: python/tests/resample_tests.py:
    # test_aggregate_* — recorded answers; 'date' string col IS a metric)
    ru = load("resample_tests")["ResampleUnitTests"]
    agg_cases = {
        "floor": ("test_aggregate_floor", "floor", {}),
        "mean": (
            "test_aggregate_average", "mean",
            {"metric_cols": ["trade_pr", "trade_pr_2"]},
        ),
        "min": ("test_aggregate_min", "min", {}),
        "min_with_prefix": ("test_aggregate_min_with_prefix", "min", {"prefix": "min"}),
        "min_with_fill": ("test_aggregate_min_with_fill", "min", {"fill": True}),
        "max": ("test_aggregate_max", "max", {}),
        "ceil": ("test_aggregate_ceiling", "ceil", {}),
    }
    goldens = json.load(open(OUT / "resample_tests.json"))
    unit_cases = {}
    for name, (t, func, kwargs) in agg_cases.items():
        c = ru[t]
        unit_cases[name] = {
            "func": func,
            "kwargs": kwargs,
            "inputs": {"data": df_spec(c["init"])},
            "expected": df_spec(c["expected"]),
        }
    goldens["ref_unit_aggregates"] = {
        "_source": "reference resample_tests.json ResampleUnitTests "
        "(recorded; resample(freq='1 DAY', func=...) — default metric_cols "
        "include the STRING 'date' column; fill=True zero-fills numerics and "
        "null-fills the string)",
        "cases": unit_cases,
    }
    with open(OUT / "resample_tests.json", "w") as f:
        json.dump(goldens, f, indent=1)

    # ---- make_disjoint family (reference: python/tests/intervals_tests.py:183-414)
    iv = load("intervals_tests")["IntervalsDFTests"]
    wanted = {
        "issue_268": "test_make_disjoint_issue_268",
        "basic": "test_make_disjoint",
        "already_disjoint": "test_make_disjoint_contains_interval_already_disjoint",
        "equal_intervals": "test_make_disjoint_contains_intervals_equal",
        "same_start": "test_make_disjoint_intervals_same_start",
        "same_end": "test_make_disjoint_intervals_same_end",
        "multiple_series": "test_make_disjoint_multiple_series",
        "single_metric": "test_make_disjoint_single_metric",
        "subset": "test_make_disjoint_interval_is_subset",
    }
    cases = {
        "_source": "reference python/tests/unit_test_data/intervals_tests.json "
        "IntervalsDFTests (recorded answers)",
    }
    for name, t in wanted.items():
        c = iv[t]
        cases[name] = {
            "inputs": {"data": df_spec(c["init"], tsdf_key="idf")},
            "expected": df_spec(c["expected"], tsdf_key="idf"),
        }
    # recorded stacked<->wide conversions (reference:
    # python/tests/intervals_tests.py:227-247,392-402)
    for name, t in {
        "from_stacked_metric_names": "test_fromStackedMetrics_metric_names",
        "to_df_stack": "test_toDF_stack",
    }.items():
        c = iv[t]
        exp = df_spec(c["expected"], tsdf_key="idf")
        # the reference test converts the expected ts columns in CODE
        # (to_timestamp withColumns); record that as spec data
        exp.setdefault("ts_convert", ["start_ts", "end_ts"])
        cases[name] = {
            "inputs": {"data": df_spec(c["init"], tsdf_key="idf")},
            "expected": exp,
        }
    with open(OUT / "intervals_tests.json", "w") as f:
        json.dump(cases, f, indent=1)

    # ---- tsdf_tests.json: range/group stats, resample trio, state-interval
    # sweep, string-ts slice family (reference: python/tests/tsdf_tests.py)
    tsdf = load("tsdf_tests")
    cases: dict = {
        "_source": "reference python/tests/unit_test_data/tsdf_tests.json "
        "(recorded answers)",
    }
    rs = tsdf["RangeStatsTest"]
    cases["range_stats"] = {
        "_call": "withRangeStats(rangeBackWindowSecs=1200), compare at decimal(5,2)",
        "inputs": {"data": df_spec(rs["test_range_stats"]["init"])},
        "expected": df_spec(rs["test_range_stats"]["expected"]),
    }
    cases["group_stats"] = {
        "_call": "withGroupedStats(freq='1 min'), compare at decimal(5,2)",
        "inputs": {"data": df_spec(rs["test_group_stats"]["init"])},
        "expected": df_spec(rs["test_group_stats"]["expected"]),
    }
    res = tsdf["ResampleTest"]
    cases["resample"] = {
        "_call": "resample(freq='min', func='floor', prefix='floor'); "
        "resample('5 minutes', 'mean') rounded 2; calc_bars('min', "
        "[trade_pr, trade_pr_2])",
        "inputs": {"data": df_spec(res["test_resample"]["input"])},
        "expected_floor": df_spec(res["test_resample"]["expected"]),
        "expected_5min_mean": df_spec(res["test_resample"]["expected30m"]),
        "expected_bars": df_spec(res["test_resample"]["expectedbars"]),
    }
    cases["resample_millis"] = {
        "_call": "resample(freq='ms', func='mean') rounded 2",
        "inputs": {"data": df_spec(res["test_resample_millis"]["init"])},
        "expected": df_spec(res["test_resample_millis"]["expectedms"]),
    }
    cases["upsample"] = {
        "_call": "resample('5 minutes', 'mean', fill=True) rounded 2, "
        "filtered to the four recorded grid points",
        "inputs": {"data": df_spec(res["test_upsample"]["input"])},
        "expected_30m_filtered": df_spec(res["test_upsample"]["expected30m"]),
        "filter_ts": [
            "2020-08-01 00:00:00", "2020-08-01 00:05:00",
            "2020-09-01 00:00:00", "2020-09-01 00:15:00",
        ],
    }
    st = tsdf["ExtractStateIntervalsTest"]
    state_ops = {
        "eq_0": "=", "eq_1": "=", "ne_0": "!=", "ne_1": "!=",
        "gt_0": ">", "gt_1": ">", "lt_0": "<", "lt_1": "<",
        "gte_0": ">=", "gte_1": ">=", "lte_0": "<=", "lte_1": "<=",
        "null_safe_eq_0": "<=>", "null_safe_eq_1": "<=>",
        "adjacent_intervals": "=",
    }
    cases["state_intervals"] = {
        "_call": "extractStateIntervals('metric_1','metric_2','metric_3', "
        "state_definition=op)",
        "cases": {
            name: {
                "op": op,
                "inputs": {"data": df_spec(st[f"test_{name}"]["input"])},
                "expected": df_spec(st[f"test_{name}"]["expected"]),
            }
            for name, op in state_ops.items()
        },
    }
    base = tsdf["TSDFBaseTests"]
    slice_calls = {
        "at": ("at", ["2020-09-01 00:02:10"]),
        "before": ("before", ["2020-09-01 00:02:10"]),
        "atOrBefore": ("atOrBefore", ["2020-09-01 00:02:10"]),
        "after": ("after", ["2020-09-01 00:02:10"]),
        "atOrAfter": ("atOrAfter", ["2020-09-01 00:02:10"]),
        "between": ("between", ["2020-08-01 00:01:10", "2020-09-01 00:18:00"]),
        "between_exclusive": (
            "between", ["2020-08-01 00:01:10", "2020-09-01 00:18:00", False]
        ),
        "earliest": ("earliest", [3]),
        "latest": ("latest", [3]),
        "priorTo": ("priorTo", ["2020-09-01 00:02:00"]),
        "subsequentTo": ("subsequentTo", ["2020-09-01 00:02:00"]),
    }
    ref_names = {
        "between_exclusive": "test_between_exclusive_string_timestamp",
    }
    cases["slices"] = {"cases": {}}
    for name, (method, args) in slice_calls.items():
        t = base[ref_names.get(name, f"test_{name}_string_timestamp")]
        cases["slices"]["cases"][name] = {
            "method": method,
            "args": args,
            "inputs": {"data": df_spec(t["init"])},
            "expected": df_spec(t["expected"]),
        }
    # fourier: four recorded cases incl. sequence-col and empty-series
    # variants (reference: python/tests/tsdf_tests.py:894-946). The
    # reference stores 'time' as long; drop its ts_convert so the port
    # keeps the numeric ts (the operator orders by it either way).
    ft = tsdf["FourierTransformTest"]
    fcases = {}
    for name in [
        "test_fourier_transform",
        "test_fourier_transform_no_sequence_col_empty_partition_cols",
        "test_fourier_transform_valid_sequence_col_empty_partition_cols",
        "test_fourier_transform_valid_sequence_col_valid_partition_cols",
    ]:
        c = ft[name]
        ispec, espec = df_spec(c["init"]), df_spec(c["expected"])
        for spec in (ispec, espec):
            spec.pop("ts_convert", None)
        key = name.replace("test_fourier_transform", "fourier").strip("_") or "fourier"
        fcases[key] = {"inputs": {"data": ispec}, "expected": espec}
    cases["fourier"] = fcases

    with open(OUT / "tsdf_tests.json", "w") as f:
        json.dump(cases, f, indent=1)

    print("wrote", OUT / "asof_tests.json")
    print("wrote", OUT / "interpol_tests.json")
    print("wrote", OUT / "intervals_tests.json")
    print("wrote", OUT / "tsdf_tests.json")


if __name__ == "__main__":
    main()
