"""Probe the reference's pandas interval kernels (read-only import) to RECORD
their outputs across the resolve_overlap branch matrix. Outputs only — used
to author tests/goldens/interval_kernel_tests.json."""
import sys
import json
import types
import pandas as pd

# the reference package imports scipy/ipython at package import; stub the
# modules we never call so the pure-pandas interval kernels can load
for mod in ("scipy", "scipy.fft", "IPython", "IPython.display",
            "IPython.core", "IPython.core.display",
            "IPython.core.getipython"):
    sys.modules.setdefault(mod, types.ModuleType(mod))
for attr in ("fft", "fftfreq"):
    setattr(sys.modules["scipy.fft"], attr, lambda *a, **k: None)
sys.modules["IPython"].get_ipython = lambda: None
sys.modules["IPython.display"].display = lambda *a, **k: None
sys.modules["IPython.core.display"].HTML = lambda *a, **k: None
sys.modules["IPython.core.getipython"].get_ipython = lambda: None

sys.path.insert(0, "/root/reference/python")
from tempo.intervals import (  # noqa: E402
    resolve_overlap,
    make_disjoint_wrap,
    identify_interval_overlaps,
)


def run_resolve(a, b, metrics=("metric_1", "metric_2")):
    sa, sb = pd.Series(a), pd.Series(b)
    try:
        res = resolve_overlap(
            interval=sa, other=sb,
            interval_start_ts="start", interval_end_ts="end",
            series_ids=[], metric_columns=list(metrics),
        )
        return [dict(r) for r in res]
    except Exception as e:
        return f"{type(e).__name__}: {e}"


CASES = {
    "equivalent_metrics": (
        {"start": "2022-01-02", "end": "2022-01-03", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-01", "end": "2022-01-04", "metric_1": 5, "metric_2": 10},
    ),
    "contained": (
        {"start": "2022-01-02", "end": "2022-01-03", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-01", "end": "2022-01-04", "metric_1": 6, "metric_2": 11},
    ),
    "shared_start_ends_before": (
        {"start": "2022-01-01", "end": "2022-01-03", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-01", "end": "2022-01-04", "metric_1": 6, "metric_2": 11},
    ),
    "shared_start_ends_after": (
        {"start": "2022-01-01", "end": "2022-01-04", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-01", "end": "2022-01-03", "metric_1": 6, "metric_2": 11},
    ),
    "shared_end_starts_before": (
        {"start": "2022-01-01", "end": "2022-01-04", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-02", "end": "2022-01-04", "metric_1": 6, "metric_2": 11},
    ),
    "shared_end_starts_after": (
        {"start": "2022-01-02", "end": "2022-01-04", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-01", "end": "2022-01-04", "metric_1": 6, "metric_2": 11},
    ),
    "identical_boundaries": (
        {"start": "2022-01-01", "end": "2022-01-03", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-01", "end": "2022-01-03", "metric_1": 6, "metric_2": 11},
    ),
    "partial_interval_first": (
        {"start": "2022-01-01", "end": "2022-01-03", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-02", "end": "2022-01-04", "metric_1": 6, "metric_2": 11},
    ),
    "partial_other_first": (
        {"start": "2022-01-02", "end": "2022-01-04", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-01", "end": "2022-01-03", "metric_1": 6, "metric_2": 11},
    ),
    "no_overlap": (
        {"start": "2022-01-01", "end": "2022-01-02", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-03", "end": "2022-01-04", "metric_1": 6, "metric_2": 11},
    ),
    # extra branch probes (derived, not from reference tests)
    "touching_boundaries": (
        {"start": "2022-01-01", "end": "2022-01-02", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-02", "end": "2022-01-03", "metric_1": 6, "metric_2": 11},
    ),
    "touching_equal_metrics": (
        {"start": "2022-01-01", "end": "2022-01-02", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-02", "end": "2022-01-03", "metric_1": 5, "metric_2": 10},
    ),
    "contained_equal_metrics": (
        {"start": "2022-01-02", "end": "2022-01-03", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-01", "end": "2022-01-04", "metric_1": 5, "metric_2": 10},
    ),
    "null_metric_in_interval": (
        {"start": "2022-01-01", "end": "2022-01-03", "metric_1": None, "metric_2": 10},
        {"start": "2022-01-02", "end": "2022-01-04", "metric_1": 6, "metric_2": 11},
    ),
    "null_metric_in_other": (
        {"start": "2022-01-01", "end": "2022-01-03", "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-02", "end": "2022-01-04", "metric_1": None, "metric_2": 11},
    ),
    "nan_ts": (
        {"start": "2022-01-01", "end": None, "metric_1": 5, "metric_2": 10},
        {"start": "2022-01-02", "end": "2022-01-03", "metric_1": 6, "metric_2": 11},
    ),
}

out = {}
for name, (a, b) in CASES.items():
    out[name] = {"ab": run_resolve(a, b), "ba": run_resolve(b, a)}

print(json.dumps(out, indent=1, default=str))

# ---- make_disjoint_wrap (the applyInPandas kernel) on the same pairs,
# both row orders, single series
print("==== make_disjoint_wrap ====")
md = {}
for name, (a, b) in CASES.items():
    if name == "nan_ts":
        continue
    for order, rows in (("ab", [a, b]), ("ba", [b, a])):
        df = pd.DataFrame(rows)
        df["id"] = 1
        try:
            fn = make_disjoint_wrap("start", "end", ["id"], ["metric_1", "metric_2"])
            res = fn(df)
            md[f"{name}:{order}"] = res.to_dict("records")
        except Exception as e:
            md[f"{name}:{order}"] = f"{type(e).__name__}: {e}"
print(json.dumps(md, indent=1, default=str))

# ---- identify_interval_overlaps recorded conventions
print("==== identify_interval_overlaps ====")
df = pd.DataFrame({
    "start": ["2023-01-01T00:00:01", "2023-01-01T00:00:04", "2023-01-01T00:00:07"],
    "end": ["2023-01-01T00:00:05", "2023-01-01T00:00:08", "2023-01-01T00:00:10"],
})
row = pd.Series({"start": "2023-01-01T00:00:03", "end": "2023-01-01T00:00:06"})
print(identify_interval_overlaps(df, row, "start", "end").to_dict("records"))
# touch: row end == df start
row2 = pd.Series({"start": "2023-01-01T00:00:00", "end": "2023-01-01T00:00:01"})
print("touch:", identify_interval_overlaps(df, row2, "start", "end").to_dict("records"))
