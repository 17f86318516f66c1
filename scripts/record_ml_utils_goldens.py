"""Record the reference's ml + utils golden families.

- ml/kfolds: run the reference's TimeSeriesCrossValidator._kFold
  (reference: python/tempo/ml.py:66-122) on its own trades.csv fixture
  (reference: python/tests/unit_test_data/trades.csv, 100 rows, 4 symbols)
  and record the exact per-fold train/test memberships for gap=0 (their
  recorded test) and gap=2 (exercises the trim).
- utils/horizon: the expected resample-horizon metrics are copied verbatim
  from the reference's recorded warning message
  (python/tests/utils_tests.py:24-49) — no execution needed.
- utils/display: the get_display_df expected frames are copied from
  python/tests/unit_test_data/utils_tests.json.

Outputs tests/goldens/ml_utils_tests.json. OUTPUTS/FIXTURES only are taken
from the reference; the harness and format are this repo's own.
"""
import csv
import json
import sys
import types
from pathlib import Path

import importlib.machinery

for mod in ("scipy", "scipy.fft", "IPython", "IPython.display",
            "IPython.core", "IPython.core.display",
            "IPython.core.getipython"):
    if mod not in sys.modules:
        stub = types.ModuleType(mod)
        # pyspark.testing probes importlib.util.find_spec("scipy"), which
        # raises on a stub with __spec__ None — give it a real ModuleSpec
        stub.__spec__ = importlib.machinery.ModuleSpec(mod, None)
        sys.modules[mod] = stub
for attr in ("fft", "fftfreq"):
    setattr(sys.modules["scipy.fft"], attr, lambda *a, **k: None)
sys.modules["IPython"].get_ipython = lambda: None
sys.modules["IPython.display"].display = lambda *a, **k: None
sys.modules["IPython.core.display"].HTML = lambda *a, **k: None
sys.modules["IPython.core.getipython"].get_ipython = lambda: None

sys.path.insert(0, "/root/reference/python")

REF_DATA = Path("/root/reference/python/tests/unit_test_data")
OUT = Path(__file__).resolve().parent.parent / "tests" / "goldens" \
    / "ml_utils_tests.json"


def main():
    from pyspark.sql import SparkSession

    from tempo.ml import TimeSeriesCrossValidator as RefTSCV

    with open(REF_DATA / "trades.csv") as f:
        trades = [
            (r["symbol"], r["event_ts"], float(r["trade_pr"]))
            for r in csv.DictReader(f)
        ]

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        trades, "symbol string, event_ts string, trade_pr double"
    ).withColumn("event_ts", F.to_timestamp("event_ts"))

    def membership(frame):
        return sorted(
            (r.symbol, r.event_ts.strftime("%Y-%m-%d %H:%M:%S"))
            for r in frame.select("symbol", "event_ts").collect()
        )

    kfolds = {}
    for gap in (0, 2):
        tscv = RefTSCV(
            timeSeriesCol="event_ts", seriesIdCols=["symbol"], gap=gap
        )
        folds = tscv._kFold(df)
        kfolds[f"gap{gap}"] = [
            {"train": membership(tr), "test": membership(te)}
            for tr, te in folds
        ]

    ref_utils = json.load(open(REF_DATA / "utils_tests.json"))
    u = ref_utils["UtilsTest"]
    shared_init = ref_utils["__SharedData"]["init"]

    goldens = {
        "_source": ("reference ml/utils fixtures: trades.csv kfold "
                    "memberships recorded from tempo.ml._kFold; horizon "
                    "metrics from the recorded warning message "
                    "(python/tests/utils_tests.py:24-49); display frames "
                    "from unit_test_data/utils_tests.json"),
        "kfolds": {
            "trades_rows": [list(t) for t in trades],
            "n_folds": 3,
            "folds": kfolds,
        },
        "time_horizon": {
            "init": u["test_calculate_time_horizon"]["init"],
            "freq": "30 seconds",
            # verbatim from the reference's recorded warning message
            "expected": {
                "earliest": "2020-01-01 00:00:10",
                "latest": "2020-01-01 00:05:31",
                "num_series": 3,
                "min": 7.0,
                "max": 12.0,
                "p25": 7.0,
                "p50": 12.0,
                "p75": 12.0,
                "total": 31.0,
            },
        },
        "get_display_df": {
            "init": shared_init,
            "expected": u["test_get_display_df"]["expected"],
            "k": 2,
        },
        "get_display_df_sequence_col": {
            "init": u["test_get_display_df_sequence_col"]["init"],
            "expected": u["test_get_display_df_sequence_col"]["expected"],
            "k": 2,
        },
    }
    with open(OUT, "w") as f:
        json.dump(goldens, f, indent=1)
    print("wrote", OUT)
    spark.stop()


if __name__ == "__main__":
    main()
