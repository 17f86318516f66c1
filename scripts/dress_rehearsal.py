"""100× dress rehearsal: run the real pipeline at 50–100M rows on THIS box.

Every SCALE.md claim below 8M rows is probe-backed; this script converts
the 100-TB design story from extrapolation into evidence by actually
driving the production surfaces at the largest scale the 32-core /
128-GiB box holds:

- ``gen``      — synthesize a documents corpus (default 50M docs) with
                 planted exact duplicates (~5%), planted near-duplicates
                 (~5%, one appended word ⇒ 3-gram Jaccard ≈ 0.96), and
                 ~5% junk (punct-heavy) docs the quality filter should
                 drop. Pure spark.range expressions — no driver data.
- ``prepare``  — ``prepare_corpus(staging_dir=, resume=)`` end-to-end
                 (normalize → signals/quality filter → exact dedup →
                 MinHash/LSH near dedup → mix → split → pack → shard),
                 recording per-stage wall (manifest mtimes), staged
                 bytes, total shuffle read/write (Spark REST API), peak
                 JVM RSS, and a final content digest.
- ``core``     — asofJoin / resample(fill) / make_disjoint at 100M event
                 rows (the TSDF core), checksum-forced.
- ``all``      — orchestrates the VERDICT-r11 experiment: single-shot
                 run (digest D1), a second run KILLED (SIGKILL) right
                 after stage N's manifest commits, ``resume=True`` to
                 completion (digest D2), assert D1 == D2, then ``core``.
                 Reports land in ``<workdir>/report_*.json``.

Usage:
    python scripts/dress_rehearsal.py all --docs 50000000 --events 100000000
    python scripts/dress_rehearsal.py all --smoke      # 200k-doc validation

The session uses local[24] (not 32) so a foreground test run stays
responsive while this grinds in the background; shuffle spill goes under
the workdir so `du` sees everything and cleanup is one rm."""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

UI_PORT = 4090
MIX_SHARES = {"en": 0.5, "de": 0.25, "es": 0.125, "fr": 0.125}
SPLITS = {"train": 0.98, "val": 0.01, "test": 0.01}


def _session(workdir: str, cpus: int = 24) -> SparkSession:
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.driver.memory", "64g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", f"{workdir}/sparktmp")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _shuffle_totals(spark) -> dict:
    """Total shuffle read/write bytes + input bytes across all completed
    stages, via the live UI REST API (the only public surface that
    exposes per-stage shuffle volume)."""
    try:
        app_id = spark.sparkContext.applicationId
        url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages"
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
        return {
            "shuffle_read_gb": round(
                sum(s.get("shuffleReadBytes", 0) for s in stages) / 2**30, 2
            ),
            "shuffle_write_gb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in stages) / 2**30, 2
            ),
            "input_gb": round(
                sum(s.get("inputBytes", 0) for s in stages) / 2**30, 2
            ),
            "n_stages": len(stages),
        }
    except Exception as exc:  # UI off / port clash: report, don't die
        return {"shuffle_probe_error": str(exc)}


class RssSampler:
    """Background max-RSS sampler over every java process on the box
    (local mode = one driver JVM; anything else java here is ours too)."""

    def __init__(self, interval: float = 5.0):
        self.max_rss_gb = 0.0
        self._stop = threading.Event()
        self._t = threading.Thread(
            target=self._run, args=(interval,), daemon=True
        )

    def _run(self, interval):
        while not self._stop.is_set():
            total = 0
            for pid in os.listdir("/proc"):
                if not pid.isdigit():
                    continue
                try:
                    with open(f"/proc/{pid}/cmdline", "rb") as f:
                        if b"java" not in f.read(200):
                            continue
                    with open(f"/proc/{pid}/status") as f:
                        for line in f:
                            if line.startswith("VmRSS:"):
                                total += int(line.split()[1])  # kB
                                break
                except OSError:
                    continue
            self.max_rss_gb = max(self.max_rss_gb, total / 2**20)
            self._stop.wait(interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=10)


def gen(spark, workdir: str, n_docs: int) -> dict:
    """Synthesize the corpus (see module docstring for the planted mix)."""
    out_path = f"{workdir}/corpus"
    t0 = time.monotonic()
    # content key: doc_id%20==7 copies the previous doc verbatim (exact
    # dup), ==13 copies it plus one appended word (near dup)
    base_key = F.when(
        F.col("id") % 20 == 7, F.col("id") - 1
    ).when(F.col("id") % 20 == 13, F.col("id") - 1).otherwise(F.col("id"))
    word = (
        lambda i: F.substring(
            F.md5(
                F.pmod(
                    F.xxhash64(F.col("__k") * 31 + i), F.lit(50_000)
                ).cast("string")
            ),
            1, 6,
        )
    )
    # every 5th word an English stopword so quality/lang signals engage
    stop = F.array(*[F.lit(w) for w in
                     ("the", "and", "of", "to", "in", "is", "that", "for")])
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(24)),
            lambda i: F.when(
                i % 5 == 2,
                F.element_at(
                    stop,
                    (F.pmod(F.xxhash64(F.col("__k") + i), F.lit(8)) + 1)
                    .cast("int"),
                ),
            ).otherwise(word(i)),
        ),
        " ",
    )
    near_tail = F.when(
        F.col("id") % 20 == 13,
        F.concat(F.lit(" "), F.substring(F.md5(F.col("id").cast("string")), 1, 6)),
    ).otherwise(F.lit(""))
    junk = F.lit(",,,;;;!!!??? ... ::: ,,,")  # punct-heavy: quality ~0.13
    text = F.when(F.col("id") % 20 == 4, junk).otherwise(
        F.concat(body, near_tail)
    )
    langs = F.array(*[F.lit(x) for x in ("en", "en", "de", "es", "fr")])
    docs = (
        spark.range(n_docs)
        .withColumn("__k", base_key)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.element_at(
                langs, (F.col("id") % 5 + 1).cast("int")
            ).alias("lang"),
        )
    )
    docs.write.mode("overwrite").parquet(out_path)
    dt = time.monotonic() - t0
    size_gb = sum(
        f.stat().st_size for f in Path(out_path).rglob("*")
    ) / 2**30
    return {
        "n_docs": n_docs, "gen_sec": round(dt, 1),
        "corpus_gb": round(size_gb, 2),
    }


def prepare(spark, workdir: str, resume: bool) -> dict:
    """The production composition over the generated corpus; returns the
    per-stage/wall/shuffle/memory/digest report."""
    from tempo_spark.pipeline.prepare import prepare_corpus

    staging = f"{workdir}/staging"
    docs = spark.read.parquet(f"{workdir}/corpus")
    start_wall = time.time()
    t0 = time.monotonic()
    with RssSampler() as rss:
        out = prepare_corpus(
            docs,
            normalize=True,
            min_quality=0.3,
            max_dup_2gram_frac=0.9,
            exact_dedup=True,
            near_dedup_threshold=0.8,
            mix_group_col="lang",
            mix_shares=MIX_SHARES,
            splits=SPLITS,
            pack_tokens=2048,
            n_shards=256,
            staging_dir=staging,
            resume=resume,
        )
        # bit_xor of full-row hashes: order-insensitive exact content
        # digest with no driver-side collection and no ANSI overflow
        forced = out.select(
            F.xxhash64(*[F.col(c) for c in out.columns]).alias("__h")
        ).agg(
            F.count("*").alias("n"), F.expr("bit_xor(__h)").alias("dig")
        ).collect()[0]
    wall = time.monotonic() - t0
    stages = {}
    for d in sorted(Path(staging).iterdir()):
        mf = d / "_tempo_manifest.json"
        if d.is_dir() and mf.exists():
            stages[d.name] = {
                "done_at": round(mf.stat().st_mtime, 1),
                "gb": round(
                    sum(f.stat().st_size for f in d.rglob("*")) / 2**30, 2
                ),
            }
    # manifest mtimes -> per-stage wall; a manifest older than this run's
    # start was inherited from the killed run = the stage was SKIPPED
    prev = start_wall
    for name in sorted(stages):
        at = stages[name].pop("done_at")
        if at < start_wall:
            stages[name]["skipped"] = True
        else:
            stages[name]["stage_sec"] = round(at - prev, 1)
            prev = at
    return {
        "resume": resume,
        "wall_sec": round(wall, 1),
        "rows_out": forced["n"],
        "digest": int(forced["dig"]),
        "stages": stages,
        "peak_java_rss_gb": round(rss.max_rss_gb, 1),
        **_shuffle_totals(spark),
        "loadavg1": round(os.getloadavg()[0], 1),
    }


def core(spark, n_events: int, n_series: int = 10_000) -> dict:
    """TSDF core at scale: as-of join, resample(fill), make_disjoint."""
    from scripts.scale_probe import synth_events

    from tempo_spark import IntervalsDF, TSDF

    out: dict = {"n_events": n_events, "n_series": n_series}

    def force(df):
        return df.agg(
            F.count("*").alias("n"),
            F.max(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()[0]["n"]

    with RssSampler() as rss:
        t0 = time.monotonic()
        left = TSDF(
            synth_events(spark, n_events, n_series),
            ts_col="ts", series_ids=["user_id"],
        )
        right = TSDF(
            synth_events(spark, n_events // 4, n_series).select(
                "user_id", "ts", F.col("value").alias("q")
            ),
            ts_col="ts", series_ids=["user_id"],
        )
        n = force(left.asofJoin(right).df)
        out["asof_join"] = {
            "sec": round(time.monotonic() - t0, 1), "rows": n,
        }

        t0 = time.monotonic()
        res = TSDF(
            synth_events(spark, n_events, n_series),
            ts_col="ts", series_ids=["user_id"],
        ).resample("1 minute", "mean", fill=True)
        n = force(res.df)
        out["resample_fill"] = {
            "sec": round(time.monotonic() - t0, 1), "rows": n,
        }

        t0 = time.monotonic()
        ev = synth_events(spark, n_events // 4, n_series)
        iv = ev.select(
            "user_id",
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 90 SECONDS")).alias("end_ts"),
            F.col("value").alias("m1"),
        )
        idf = IntervalsDF(iv, start_ts="start_ts", end_ts="end_ts",
                          series_ids=["user_id"])
        n = force(idf.make_disjoint().df)
        out["make_disjoint"] = {
            "sec": round(time.monotonic() - t0, 1), "rows": n,
            "input_rows": n_events // 4,
        }
    out["peak_java_rss_gb"] = round(rss.max_rss_gb, 1)
    out.update(_shuffle_totals(spark))
    out["loadavg1"] = round(os.getloadavg()[0], 1)
    return out


def _write_report(workdir: str, name: str, payload: dict) -> None:
    p = Path(workdir) / f"report_{name}.json"
    p.write_text(json.dumps(payload, indent=1))
    print(f"== {name}: {json.dumps(payload)}", flush=True)


def orchestrate(args) -> None:
    """The full VERDICT experiment. Child legs run as subprocesses so the
    kill leg dies mid-pipeline exactly like a preempted cluster driver."""
    wd = args.workdir
    me = str(Path(__file__).resolve())

    def leg(cmd, **kw):
        return subprocess.Popen(
            [sys.executable, me, *cmd, "--workdir", wd,
             "--docs", str(args.docs), "--events", str(args.events)],
            **kw,
        )

    print(f"[all] workdir={wd} docs={args.docs} events={args.events}",
          flush=True)
    t_all = time.monotonic()
    assert leg(["gen"]).wait() == 0, "gen failed"

    # leg 1: single-shot (fresh staging) -> digest D1
    shutil.rmtree(f"{wd}/staging", ignore_errors=True)
    assert leg(["prepare"]).wait() == 0, "single-shot prepare failed"
    d1 = json.loads((Path(wd) / "report_prepare.json").read_text())

    # leg 2: fresh staging, SIGKILL after the signals manifest commits —
    # mid-pipeline, so the resume leg must SKIP two committed stages and
    # recompute the expensive near-dedup from the staged parquet
    shutil.rmtree(f"{wd}/staging", ignore_errors=True)
    p = leg(["prepare"])
    kill_after = f"{wd}/staging/01_signals/_tempo_manifest.json"
    killed_at = None
    while p.poll() is None:
        if Path(kill_after).exists():
            time.sleep(2)  # let the manifest write fully flush
            p.send_signal(signal.SIGKILL)
            killed_at = "01_signals"
            break
        time.sleep(1)
    p.wait()
    if killed_at is None:
        raise SystemExit(
            "kill leg finished before the target manifest appeared"
        )
    print(f"[all] killed single-shot leg after {killed_at}", flush=True)

    # leg 3: resume to completion -> digest D2
    assert leg(["prepare", "--resume"]).wait() == 0, "resume failed"
    d2 = json.loads((Path(wd) / "report_prepare_resume.json").read_text())

    match = (d1["digest"] == d2["digest"]
             and d1["rows_out"] == d2["rows_out"])
    summary = {
        "docs": args.docs,
        "single_shot": d1,
        "killed_after": killed_at,
        "resumed": d2,
        "resume_equals_single_shot": match,
        "total_orchestration_sec": round(time.monotonic() - t_all, 1),
    }
    _write_report(wd, "rehearsal", summary)
    if not match:
        raise SystemExit("DIGEST MISMATCH: resume != single-shot")

    assert leg(["core"]).wait() == 0, "core failed"
    print(f"[all] DONE in {round(time.monotonic() - t_all, 1)}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["gen", "prepare", "core", "all"])
    ap.add_argument("--docs", type=int, default=50_000_000)
    ap.add_argument("--events", type=int, default=100_000_000)
    ap.add_argument("--workdir", default="/root/repo/.rehearsal")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="200k docs / 2M events quick validation")
    ap.add_argument("--cpus", type=int, default=24)
    args = ap.parse_args()
    if args.smoke:
        args.docs, args.events = 200_000, 2_000_000
    Path(args.workdir).mkdir(parents=True, exist_ok=True)

    if args.mode == "all":
        orchestrate(args)
        return
    spark = _session(args.workdir, args.cpus)
    if args.mode == "gen":
        _write_report(args.workdir, "gen", gen(spark, args.workdir, args.docs))
    elif args.mode == "prepare":
        rep = prepare(spark, args.workdir, args.resume)
        _write_report(
            args.workdir,
            "prepare_resume" if args.resume else "prepare",
            rep,
        )
    elif args.mode == "core":
        _write_report(args.workdir, "core", core(spark, args.events))
    spark.stop()


if __name__ == "__main__":
    main()
