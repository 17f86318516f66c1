"""Capture .explain("formatted") for every declared gate query and every
bench query into plans/<tag>/<name>_<suffix>.txt.

Usage:
    python scripts/capture_plans.py r12 before [name ...]

Plan capture is lazy (no jobs run except operators that are eager by
contract — changepoints, IVF/PQ fits, BPE training), so this is cheap and
can run alongside other work. The judge reads these files to check plan
claims (Exchange counts, join strategies, PushedFilters) against the code.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("TZ", "UTC")
import time

time.tzset()

from pyspark.sql import SparkSession


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tempo_spark-plans")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    import bench

    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    jobs: dict[str, object] = {}
    for name, fn in entry_mod.queries().items():
        jobs[name] = fn
    for name, fn in bench.BENCH_QUERIES.items():
        jobs[name] = fn

    for name, fn in jobs.items():
        if only and name not in only:
            continue
        path = out_dir / f"{name}_{suffix}.txt"
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record, keep capturing
            plan = f"CAPTURE ERROR: {type(e).__name__}: {e}"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
