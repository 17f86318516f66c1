"""Job-level timeline for one bench query: run it with the Spark event log
on, then print each job's submission/completion and the DRIVER GAP before
it (time since the previous job completed — plan build, py4j, collect,
driver-side algorithms). Gaps are where guide §2.6 thread-overlap or §7.3
driver-work fixes pay; job spans are executor work.

Usage:
    python scripts/job_timeline.py <bench_row> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("TZ", "UTC")
time.tzset()

from pyspark.sql import SparkSession


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    evdir = tempfile.mkdtemp(prefix="tempo_evlog_")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tempo_spark-job-timeline")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    import bench

    warm = entry_mod._read(spark, sf_dir, "events").limit(50_000)
    warm_agg = warm.groupBy("user_id").count()
    warm_agg.join(warm_agg.withColumnRenamed("count", "c2"), "user_id").count()

    fn = bench.BENCH_QUERIES[name]
    marks = []
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        df.count()
        t2 = time.time()
        marks.append((t0, t1, t2))
        print(
            f"rep: build={t1 - t0:.3f}s exec={t2 - t1:.3f}s total={t2 - t0:.3f}s",
            flush=True,
        )
    spark.stop()

    # event-log v2 writes a DIRECTORY per app containing events_* files
    logs = sorted(
        (p for p in Path(evdir).rglob("*") if p.is_file() and "events" in p.name),
        key=lambda p: p.stat().st_mtime,
    ) or sorted(
        (p for p in Path(evdir).glob("*") if p.is_file()),
        key=lambda p: p.stat().st_mtime,
    )
    events = []
    with open(logs[-1]) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e.get("Event") == "SparkListenerJobStart":
                props = e.get("Properties") or {}
                stages = e.get("Stage Infos") or []
                snames = " | ".join(
                    sorted({s.get("Stage Name", "")[:38] for s in stages})
                )[:120]
                events.append(
                    {
                        "job": e["Job ID"],
                        "sub": e["Submission Time"] / 1000.0,
                        "desc": (
                            props.get(
                                "spark.job.description",
                                props.get("callSite.short", ""),
                            )[:60]
                            + " :: "
                            + snames
                        ),
                        "end": None,
                    }
                )
            elif e.get("Event") == "SparkListenerJobEnd":
                for ev in events:
                    if ev["job"] == e["Job ID"]:
                        ev["end"] = e["Completion Time"] / 1000.0

    t0 = marks[-1][0]
    build_end = marks[-1][1]
    run = [ev for ev in events if ev["sub"] >= t0 - 0.001 and ev["end"]]
    run.sort(key=lambda ev: ev["sub"])
    prev_end = t0
    print(f"\n--- last rep timeline ({name}); build ends at {build_end - t0:.3f}s ---")
    for ev in run:
        gap = ev["sub"] - prev_end
        print(
            f"job {ev['job']:>4}  +{ev['sub'] - t0:7.3f}s  gap={gap:6.3f}s  "
            f"span={ev['end'] - ev['sub']:6.3f}s  {ev['desc']}"
        )
        prev_end = max(prev_end, ev["end"])
    print(f"tail gap to action end: {marks[-1][2] - prev_end:.3f}s")


if __name__ == "__main__":
    main()
