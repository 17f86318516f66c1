"""Link-graph centrality for corpus curation: PageRank.

Common Crawl-scale pipelines weight/filter pages by host- or page-level
centrality of the hyperlink graph (the harmonic/PageRank ranks published
with each CC crawl); a training-data engine needs the same primitive for
link-informed quality weighting, seed-set expansion, and spam demotion.

Spark-first shape: one (src → rank/out_degree) broadcast-free join + a
map-side-combined ``groupBy(dst)`` per iteration, the rank frame
checkpointed per round exactly like
:func:`tempo_spark.pipeline.components.connected_components` (the
sanctioned iterative class — lineage must not grow with iterations).
Edges are never modified or re-shuffled beyond the per-iteration
contribution aggregation; persist the degree-annotated edge frame once.

No reference counterpart (the reference engine has no graph operators);
semantics follow Page et al. 1999 with uniform teleport and dangling-mass
redistribution, so ranks sum to ~1.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    exact_scale: Optional[int] = None,
    weight_col: Optional[str] = None,
    seeds: Optional[DataFrame] = None,
    seed_id_col: str = "id",
) -> DataFrame:
    """Rank nodes of a directed graph by PageRank. Returns (id, rank).

    ``r'(v) = (1-d)/N + d·(Σ_{u→v} r(u)/deg(u) + dangling/N)`` where
    ``dangling`` is the total rank of nodes with no out-edges (their mass
    teleports uniformly — ranks stay a distribution). Parallel edges each
    carry a contribution (multigraph semantics); pre-``distinct()`` the
    edge frame for simple-graph semantics. Null src/dst rows are dropped.

    ``seeds=`` switches to PERSONALIZED PageRank (seed-set expansion —
    "rank everything by proximity to this trusted set", the curation
    recipe for growing a quality whitelist from a hand-picked core):
    teleport AND dangling mass go only to the seed nodes (uniformly),
    never the whole graph, so rank decays with distance from the seeds
    and unreachable nodes converge to 0. ``seeds`` is a (small,
    broadcastable) frame of node ids; ids absent from the graph are
    ignored, an empty intersection raises. Float path only (incompatible
    with ``exact_scale``).

    ``weight_col=`` distributes each node's outgoing mass proportionally
    to the edge weight (host link counts, trust scores) instead of
    uniformly: contribution = r(u)·w/Σ_u w. Rows with a null or
    non-positive weight are dropped (a zero-weight edge is no edge).
    Incompatible with ``exact_scale`` (float weights have no exact
    integer division) — pass integer-ish weights via parallel edges
    instead if bit-reproducibility matters.

    ``exact_scale=S`` switches every rank to a scaled long with integer
    floor division (damping must be exactly rational, e.g. 0.85 = 17/20):
    bit-reproducible on any engine and any partitioning — float
    aggregation order varies run-to-run, so the float path's last ulps
    are not stable; the integer path is, at a quantization error of
    ~iters/S. Use it for cross-engine validation and regression-pinned
    production runs; ranks come back as ``rank_scaled`` longs.

    PageRank is inherently iterative-materializing: N and the per-round
    rank frames are computed eagerly (the connected_components class);
    each round's frame is ``localCheckpoint``-ed so lineage stays O(1).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if exact_scale is not None and exact_scale < 1:
        raise ValueError(
            f"exact_scale must be >= 1, got {exact_scale} (all-integer "
            "ranks at scale 0 would be uniformly zero)"
        )
    if seeds is not None and exact_scale is not None:
        raise ValueError(
            "seeds (personalized PageRank) is float-path only — "
            "incompatible with exact_scale"
        )
    if weight_col is not None and exact_scale is not None:
        raise ValueError(
            "weight_col is incompatible with exact_scale (float weights "
            "have no exact integer division) — encode weights as parallel "
            "edges for the reproducible path"
        )
    wcols = [F.col(weight_col).cast("double").alias("__w")] if weight_col else []
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), *wcols
    ).where(F.col("__src").isNotNull() & F.col("__dst").isNotNull())
    if weight_col is not None:
        # NaN > 0 is TRUE in Spark's ordering — one NaN weight would
        # poison __deg and spread NaN through every rank
        e = e.where(
            F.col("__w").isNotNull()
            & ~F.isnan(F.col("__w"))
            & (F.col("__w") > 0)
        )
    nodes = (
        e.select(F.col("__src").alias("id"))
        .unionByName(e.select(F.col("__dst").alias("id")))
        .distinct()
    )
    deg = e.groupBy("__src").agg(
        (F.sum("__w") if weight_col else F.count(F.lit(1))).alias("__deg")
    )
    # degree-annotated edges: built once, reused every iteration
    e_deg = e.join(deg, "__src").persist()
    nodes = nodes.persist()
    n = nodes.count()
    if n == 0:
        e_deg.unpersist()
        nodes.unpersist()
        exact = exact_scale is not None
        return nodes.withColumn(
            "rank_scaled" if exact else "rank",
            F.lit(None).cast("long" if exact else "double"),
        )
    # nodes with no out-edge: their whole rank teleports each round
    dangling_ids = nodes.join(
        deg.select(F.col("__src").alias("id")), "id", "left_anti"
    ).persist()

    if seeds is not None:
        seed_flag = F.broadcast(
            seeds.select(F.col(seed_id_col).alias("id"))
            .distinct()
            .withColumn("__is_seed", F.lit(1))
        )
        nodes_f = nodes.join(seed_flag, "id", "left").persist()
        n_seeds = nodes_f.where(F.col("__is_seed").isNotNull()).count()
        if n_seeds == 0:
            nodes_f.unpersist()
            e_deg.unpersist()
            nodes.unpersist()
            dangling_ids.unpersist()
            raise ValueError(
                "none of the seed ids appear in the graph's node set"
            )
        is_seed = F.col("__is_seed").isNotNull()
    else:
        nodes_f, n_seeds, is_seed = nodes, n, F.lit(True)

    if exact_scale is not None:
        frac = Fraction(str(damping))
        p, q = frac.numerator, frac.denominator
        S = int(exact_scale)
        ranks = nodes.select(
            "id", F.lit(S // n).cast("long").alias("__r")
        )
        for _ in range(iters):
            dang = dangling_ids.join(ranks, "id").agg(
                F.coalesce(F.sum("__r"), F.lit(0)).alias("__dm")
            )
            contribs = (
                e_deg.join(
                    ranks.select(
                        F.col("id").alias("__src"), F.col("__r")
                    ),
                    "__src",
                )
                .select(
                    F.col("__dst").alias("id"),
                    F.expr("__r div __deg").alias("__c"),
                )
                .groupBy("id")
                .agg(F.sum("__c").alias("__in"))
            )
            base = F.lit((S * (q - p)) // (q * n)).cast("long")
            ranks = (
                nodes.join(contribs, "id", "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "id",
                    (
                        base
                        + F.expr(
                            f"({p} * (coalesce(__in, 0)"
                            f" + (__dm div {n}))) div {q}"
                        )
                    ).cast("long").alias("__r"),
                )
                .localCheckpoint(eager=True)
            )
        out = ranks.select("id", F.col("__r").alias("rank_scaled"))
    else:
        ranks = nodes_f.select(
            "id",
            F.when(is_seed, F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("__r"),
        )
        for _ in range(iters):
            dang = dangling_ids.join(ranks, "id").agg(
                F.coalesce(F.sum("__r"), F.lit(0.0)).alias("__dm")
            )
            contribs = (
                e_deg.join(
                    ranks.select(
                        F.col("id").alias("__src"), F.col("__r")
                    ),
                    "__src",
                )
                .select(
                    F.col("__dst").alias("id"),
                    (
                        F.col("__r") * F.col("__w") / F.col("__deg")
                        if weight_col
                        else F.col("__r") / F.col("__deg")
                    ).alias("__c"),
                )
                .groupBy("id")
                .agg(F.sum("__c").alias("__in"))
            )
            ranks = (
                nodes_f.join(contribs, "id", "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "id",
                    (
                        F.when(
                            is_seed, F.lit((1.0 - damping) / n_seeds)
                        ).otherwise(F.lit(0.0))
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("__in"), F.lit(0.0))
                            + F.when(
                                is_seed,
                                F.col("__dm") / F.lit(float(n_seeds)),
                            ).otherwise(F.lit(0.0))
                        )
                    ).alias("__r"),
                )
                .localCheckpoint(eager=True)
            )
        out = ranks.select("id", F.col("__r").alias("rank"))
    e_deg.unpersist()
    nodes.unpersist()
    dangling_ids.unpersist()
    if seeds is not None:
        nodes_f.unpersist()
    return out
