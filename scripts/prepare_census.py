"""Per-stage py4j-trip + wall census of the prepare_corpus recipe (b29),
replicating its stage order with marks between stages.

Usage: python scripts/prepare_census.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("TZ", "UTC")
time.tzset()

from pyspark.sql import SparkSession
import pyspark.sql.functions as F

TRIPS = [0]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("prepare-census")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from py4j.clientserver import ClientServer  # noqa: F401
    import py4j.java_gateway as jg

    orig = jg.GatewayClient.send_command

    def counted(self, *a, **k):
        TRIPS[0] += 1
        return orig(self, *a, **k)

    jg.GatewayClient.send_command = counted

    from tempo_spark.pipeline import dedup as d
    from tempo_spark.pipeline.components import near_dedup
    from tempo_spark.pipeline.sampling import (
        assign_packs, mix_by_group, with_shard, with_split,
    )
    from tempo_spark.pipeline.text import (
        normalize_text, with_quality_score, with_repetition_metrics,
        with_token_count,
    )

    for rep in range(reps):
        spark.catalog.clearCache()
        marks = []

        def mark(name):
            marks.append((name, time.monotonic(), TRIPS[0]))

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
            F.col("text").isNotNull()
        ).select("doc_id", "text", "lang")
        mark("read")
        out = normalize_text(docs, "text")
        mark("normalize")
        out = out.persist()
        out = with_token_count(out, "text")
        out = with_quality_score(out, "text")
        out = with_repetition_metrics(out, "text", n=2)
        mark("signals")
        out = out.persist()
        out = out.where(F.col("quality_score") >= 0.2)
        out = out.where(F.col("dup_2gram_frac") <= 0.5)
        mark("filters")
        out = d.exact_dedup(out, "doc_id", "text").drop("dup_count")
        mark("exact_dedup")
        pairs = d.minhash_dedup(
            out, "doc_id", "text", threshold=0.8, shingle_k=3, use_words=True
        )
        mark("minhash_plan")
        out = near_dedup(out, pairs, "doc_id")
        mark("near_dedup_EAGER_CC")
        out = out.persist()
        out = mix_by_group(
            out, "doc_id", "lang",
            {"en": 0.5, "de": 0.25, "es": 0.125, "fr": 0.125},
            token_col="n_tokens", salt="prep:mix",
        )
        mark("mix")
        out = with_split(out, "doc_id", weights=None, salt="prep:split")
        mark("split")
        out = assign_packs(out, "n_tokens", 2048, ["split"], "doc_id", salt="prep:pack")
        mark("pack")
        out = with_shard(out, "doc_id", 64, salt="prep:shard")
        out = out.select("doc_id", "split", "pack_id", "shard_id")
        mark("shard")
        out.count()
        mark("exec_count")

        print(f"--- rep {rep} ---", flush=True)
        prev_t, prev_c = None, None
        for name, t, c in marks:
            if prev_t is not None:
                print(f"{name:22s} wall={t - prev_t:7.3f}s trips={c - prev_c}")
            prev_t, prev_c = t, c
    spark.stop()


if __name__ == "__main__":
    main()
