"""Connected components over near-duplicate pairs → canonical selection.

A dedup pipeline doesn't stop at pairs: near-dup relations form clusters
(a≈b, b≈c ⇒ {a,b,c}), and one canonical document per cluster is kept.
This implements distributed connected components via iterative label
propagation (a.k.a. "hash-to-min"): every node's label = min(own, labels of
neighbors), repeated until fixpoint. Converges in O(diameter) rounds —
near-dup clusters are shallow (dup chains are short), so 3-5 rounds cover
real corpora; the loop detects convergence and stops early.

Each round is two shuffles (join + groupBy min) with map-side combine —
at 100 TB the edge set (near-dup pairs) is orders of magnitude smaller
than the corpus, so rounds are cheap relative to pair generation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    pairs: DataFrame,
    max_iter: int = 10,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Label each node reachable through pair edges with its component's
    minimum id. Returns (id, component).

    ``pairs`` must have two id columns; undirectedness is handled here.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        # propagate: candidate label for dst = src's current label
        prop = (
            edges.join(labels, edges["src"] == labels["id"])
            .select(F.col("dst").alias("id"), F.col("component"))
        )
        new_labels = (
            labels.select("id", "component")
            .union(prop)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # convergence check: any label changed this round?
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def near_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    keep: str = "min",
    max_iter: int = 20,
) -> DataFrame:
    """Drop all but one canonical row per near-duplicate cluster.

    ``pairs`` is any (id_a, id_b) near-dup relation (from minhash_dedup,
    simhash_near_dups, ngram_jaccard_pairs, or embedding_near_dups). The
    canonical representative is the min (or max) id of the connected
    component. Rows not in any pair are kept untouched.

    ``max_iter`` bounds the label-propagation rounds; propagation moves the
    min id ONE hop per round, so it must be ≥ the largest cluster's
    diameter or far-end members keep non-minimal labels (boilerplate-heavy
    corpora can chain near-dups — raise it when cluster diameters grow)."""
    comps = connected_components(pairs, max_iter=max_iter)
    agg = F.min("id") if keep == "min" else F.max("id")
    canonical = comps.groupBy("component").agg(agg.alias("__keep"))
    losers = (
        comps.join(canonical, "component")
        .where(F.col("id") != F.col("__keep"))
        .select(F.col("id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")
