"""Generate a deterministic sf1 dataset (10x sf0.1) for the core-scaling
validation runs (SCALE.md "sf1 core-scaling" section).

The driver only ships sf0.001/0.01/0.1; at sf0.1 the bench rows are
driver/plan-build-bound, so 8-vs-32-core ratios say nothing about executor
scaling (round-12 verdict). This script synthesizes an sf1-shaped input the
same way the shipped SFs are evidently built — word-soup documents sampled
from the same tiny vocabulary with the same length/lang/source mix and the
same planted exact-duplicate rate, Gaussian embeddings around the per-label
centroids fitted from sf0.1, events replicated 10x with shifted ids — so
the top bench rows can be re-run at a scale where executors, not the
driver, are the bottleneck.

Determinism: fixed seed, pure-Python RNG, no wall-clock anywhere. Output
goes OUTSIDE the repo (testdata is driver-owned): /root/testdata/sf1 by
default. TPC-H side tables are symlinked from sf0.1 (unused by the probed
rows).

Usage:
    python scripts/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import collections
import os
import random
import statistics
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SCALE = 10


def gen_documents(out_dir: str, rng: random.Random) -> None:
    d = pq.read_table(f"{SRC}/documents.parquet")
    texts = d.column("text").to_pylist()
    langs = d.column("lang").to_pylist()
    vocab = sorted(set(w for t in texts for w in t.split()))
    lengths = [len(t.split()) for t in texts]
    lang_counts = collections.Counter(langs)
    lang_pool = [l for l, c in sorted(lang_counts.items()) for _ in range(c)]
    n = len(texts) * SCALE
    n_dup_pairs = 8 * SCALE  # sf0.1 has 8 exact-dup pairs per 5000 docs

    out_texts: list[str] = []
    for i in range(n):
        k = lengths[rng.randrange(len(lengths))]
        out_texts.append(" ".join(rng.choice(vocab) for _ in range(k)))
    # plant exact-dup pairs at the sf0.1 rate (randomly chosen victims)
    for _ in range(n_dup_pairs):
        a = rng.randrange(n)
        b = rng.randrange(n)
        out_texts[b] = out_texts[a]

    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(
                [lang_pool[rng.randrange(len(lang_pool))] for _ in range(n)],
                pa.string(),
            ),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in out_texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/documents.parquet")
    print(f"documents: {n} rows, vocab {len(vocab)}, "
          f"median words {statistics.median(lengths)}")


def gen_embeddings(out_dir: str, rng: random.Random) -> None:
    e = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = e.column("embedding").to_pylist()
    labels = e.column("label").to_pylist()
    dim = len(vecs[0])
    by_label: dict[int, list[list[float]]] = collections.defaultdict(list)
    for v, l in zip(vecs, labels):
        by_label[l].append(v)
    stats = {}
    for l, vs in by_label.items():
        mean = [sum(v[j] for v in vs) / len(vs) for j in range(dim)]
        var = [
            sum((v[j] - mean[j]) ** 2 for v in vs) / max(1, len(vs) - 1)
            for j in range(dim)
        ]
        stats[l] = (mean, [s ** 0.5 for s in var])
    label_pool = sorted(labels)
    n = len(vecs) * SCALE
    out_vecs = []
    out_labels = []
    for _ in range(n):
        l = label_pool[rng.randrange(len(label_pool))]
        mean, sd = stats[l]
        out_vecs.append(
            [float(mean[j] + sd[j] * rng.gauss(0.0, 1.0)) for j in range(dim)]
        )
        out_labels.append(l)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(out_vecs, pa.list_(pa.float32())),
            "label": pa.array(out_labels, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet")
    print(f"embeddings: {n} rows x {dim} dims, {len(stats)} labels")


def gen_events(out_dir: str) -> None:
    ev = pq.read_table(f"{SRC}/events.parquet")
    n = ev.num_rows
    parts = []
    import pyarrow.compute as pc

    for r in range(SCALE):
        parts.append(
            pa.table(
                {
                    "event_id": pc.add(ev.column("event_id"), r * 10_000_000),
                    "ts": ev.column("ts"),
                    "user_id": pc.add(ev.column("user_id"), r * 1_000_000),
                    "event_type": ev.column("event_type"),
                    "value": ev.column("value"),
                    "props": ev.column("props"),
                }
            )
        )
    tbl = pa.concat_tables(parts)
    pq.write_table(tbl, f"{out_dir}/events.parquet")
    print(f"events: {tbl.num_rows} rows ({SCALE}x replicated, shifted ids)")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(20260818)
    gen_documents(out_dir, rng)
    gen_embeddings(out_dir, rng)
    gen_events(out_dir)
    for t in ("customer", "lineitem", "nation", "orders", "part",
              "region", "supplier"):
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    print(f"done: {out_dir}")


if __name__ == "__main__":
    main()
