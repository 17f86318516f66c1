"""Per-query profile: split plan-BUILD time (driver py4j) from EXECUTION
time for each bench query, min-of-N fresh plans, one JSON line per query.

Usage:
    python scripts/bench_profile.py [reps] [name ...]

Uses the same session config as bench.py so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("TZ", "UTC")
time.tzset()

from pyspark.sql import SparkSession


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tempo_spark-bench-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod  # noqa: F401  (bench imports it)
    import bench

    # same untimed warmup as bench.py
    import pyspark.sql.functions as F  # noqa: F401

    warm = entry_mod._read(spark, sf_dir, "events").limit(50_000)
    warm_agg = warm.groupBy("user_id").count()
    warm_agg.join(warm_agg.withColumnRenamed("count", "c2"), "user_id").count()

    for name, fn in bench.BENCH_QUERIES.items():
        if only and name not in only:
            continue
        builds, execs = [], []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            t1 = time.monotonic()
            df.count()
            t2 = time.monotonic()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        print(
            json.dumps(
                {
                    "query": name,
                    "build_min": round(min(builds), 3),
                    "exec_min": round(min(execs), 3),
                    "total_min": round(min(b + e for b, e in zip(builds, execs)), 3),
                    "builds": [round(x, 3) for x in builds],
                    "execs": [round(x, 3) for x in execs],
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
