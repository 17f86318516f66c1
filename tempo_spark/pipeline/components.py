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

Scale-critical loop hygiene (an unpersisted iterative loop is quadratic):

- the edge set is persisted once — every round joins against it, and
  without pinning each round would rescan and re-shuffle the raw pairs;
- each round's labels are **checkpointed** (``localCheckpoint``, or a
  reliable ``checkpoint()`` when the session has a checkpoint dir), so
  round k's plan reads round k-1's materialized partitions instead of
  re-executing the whole accumulated lineage — O(k) total work, not O(k²);
- the convergence test is **folded into the label aggregation** (an
  ``own``-tagged union lets ``min(CASE WHEN own …)`` recover the previous
  label inside the same groupBy), then read back as a cheap ``max()`` over
  the just-checkpointed frame — no driver-side recomputation of the round.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    max_iter: int = 10,
    id_a: str = "id_a",
    id_b: str = "id_b",
    algorithm: str = "pointer",
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Label each node reachable through pair edges with its component's
    minimum id. Returns (id, component).

    ``pairs`` must have two id columns; undirectedness is handled here.

    ``algorithm``:

    - ``"pointer"`` (default): each round propagates min labels one hop and
      then SHORTCUTS every label through its own label
      (``component := component[component]``, the classic pointer-jumping
      step), roughly halving remaining chain depth per round — fixpoint in
      O(log diameter) rounds. The safe default: boilerplate-heavy corpora
      chain near-dups into long paths, and ``max_iter=10`` already covers
      diameters ~2¹⁰.
    - ``"label"``: plain one-hop min-label propagation — one join less per
      round, rounds = diameter. Fine when clusters are known-shallow.

    ``driver_threshold``: a dedup pair graph is tiny relative to its corpus
    (edges exist only between near-duplicates), and each distributed round
    costs several fixed-latency shuffle stages — measured ~1.5 s/round on a
    700-edge graph, pure scheduling. At or below this many (directed,
    deduped) edges the graph collects to the driver and a union-find labels
    it in one pass — same min-id labels, same null semantics. The ceiling
    is set by the round-trip costs, not memory: pulling rows plus
    re-creating the label frame as a local relation both run through
    row-at-a-time pickling (~100-200k rows/s), so past a few hundred
    thousand edges the distributed loop wins again. The decision and the
    edge pull are ONE bounded ``take(threshold+1)``: a small graph's take
    IS the union-find input, and a huge graph's take short-circuits after
    about one reduce partition instead of counting every edge; 0 forces
    the distributed loop.

    The loop stops as soon as a round changes nothing. Each round
    materializes the label frame via ``localCheckpoint`` — executor-local
    blocks that truncate lineage, so losing an executor loses its blocks
    and fails the job (rerun from the persisted edges). On real clusters
    call ``spark.sparkContext.setCheckpointDir(...)`` first: rounds then
    write durable ``checkpoint()`` snapshots (each round's files are
    deleted here as soon as the next round materializes, so the directory
    holds at most two snapshots)."""
    if algorithm not in ("pointer", "label"):
        raise ValueError(f"algorithm must be 'pointer' or 'label', got {algorithm!r}")
    spark = pairs.sparkSession
    reliable = spark.sparkContext.getCheckpointDir() is not None
    # ONE scan of the (possibly expensive) pairs lineage: both edge
    # directions explode from the same row — a union of two projections
    # would execute the upstream subtree twice inside the job that fills
    # this persist (measured 2× a costly pair generator, e.g. the
    # cell-scoped cosine self-join feeding semantic_dedup)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ONE bounded take() decides the driver-vs-distributed branch AND, when
    # the graph is small, already IS the edge list the union-find needs —
    # the r12 form paid a full count() (probe) plus a collect() (data) for
    # the same rows. take() runs executeTake: on a driver-sized graph it
    # scans everything (exactly what collect did); on a huge graph it
    # short-circuits after ~one reduce partition instead of aggregating
    # billions of distinct edges only to learn "too big".
    taken = edges.take(driver_threshold + 1)
    if len(taken) <= driver_threshold:
        try:
            return _driver_components(spark, taken, edges.schema["src"].dataType)
        finally:
            edges.unpersist()
    # materialize the cache NOW in its own job: the first round's job
    # otherwise references edges through two branches (labels init + the
    # propagate join) and computes the still-unfilled cache in both
    edges.count()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    prev_ckpt = None
    try:
        for _ in range(max_iter):
            # propagate: candidate label for dst = src's current label
            prop = (
                edges.join(labels, edges["src"] == labels["id"])
                .select(F.col("dst").alias("id"), F.col("component"))
            )
            # own=true marks the node's previous label so one groupBy yields
            # BOTH the new min-label and whether it changed this round
            new_labels = (
                labels.select("id", "component", F.lit(True).alias("__own"))
                .union(prop.select("id", "component", F.lit(False).alias("__own")))
                .groupBy("id")
                .agg(
                    F.min("component").alias("component"),
                    F.min(F.when(F.col("__own"), F.col("component"))).alias("__old"),
                )
            )
            if algorithm == "pointer":
                # shortcut: component := component[component]. Every
                # component value is itself a node id, so the self-join is
                # total; min-labels only ever decrease, so following the
                # pointer stays within the component and roughly halves the
                # remaining chain depth
                hop = new_labels.select(
                    F.col("id").alias("__cid"), F.col("component").alias("__cc")
                )
                new_labels = (
                    new_labels.join(hop, new_labels["component"] == hop["__cid"])
                    .select("id", F.col("__cc").alias("component"), "__old")
                )
            new_labels = new_labels.select(
                "id",
                "component",
                (F.col("component") != F.col("__old")).alias("__changed"),
            )
            # materialize THIS round; later rounds (and the convergence agg)
            # read the snapshot, never the accumulated lineage
            if reliable:
                before = _list_checkpoint_rdd_dirs(spark)
                new_labels = new_labels.checkpoint(eager=True)
                # reliable checkpoint files are NOT auto-cleaned (the
                # ContextCleaner only does so under
                # spark.cleaner.referenceTracking.cleanCheckpoints=true,
                # default false) — delete round k-1's snapshot now that
                # round k has materialized and nothing reads it anymore
                new_dirs = _list_checkpoint_rdd_dirs(spark) - before
                if prev_ckpt:
                    _delete_paths(spark, prev_ckpt)
                prev_ckpt = new_dirs
            else:
                # localCheckpoint blocks are released by the ContextCleaner
                # once the old `labels` reference is dropped below
                new_labels = new_labels.localCheckpoint(eager=True)
            changed = new_labels.agg(F.max("__changed")).first()[0]
            labels = new_labels.drop("__changed")
            if not changed:
                break
    finally:
        edges.unpersist()
    return labels


def _driver_components(spark, edge_rows, id_type) -> DataFrame:
    """Union-find over an already-taken edge-row list — the small-graph
    fast path. The rows carry BOTH directions of every pair, so the src
    column alone enumerates every node. Null semantics mirror the
    distributed loop's joins exactly: a null node never PROPAGATES
    (src = null joins nothing) but still RECEIVES the min label of its
    non-null neighbors (it is an ordinary groupBy key on the dst side);
    with no non-null neighbor it labels itself null."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while x != root:  # path compression
            nxt = parent[x]
            parent[x] = root
            x = nxt
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    nodes = set()
    null_neighbors = set()  # non-null sources of edges INTO the null node
    for r in edge_rows:
        s, d = r["src"], r["dst"]
        nodes.add(s)
        if s is None or d is None:
            if d is None and s is not None:
                null_neighbors.add(s)
            continue
        union(s, d)
    comp_min: dict = {}
    for v in nodes:
        if v is None:
            continue
        root = find(v)
        cur = comp_min.get(root)
        comp_min[root] = v if cur is None or v < cur else cur
    rows = [(v, comp_min[find(v)]) for v in nodes if v is not None]
    if None in nodes:
        received = [comp_min[find(s)] for s in null_neighbors]
        rows.append((None, min(received) if received else None))
    out_schema = StructType(
        [StructField("id", id_type), StructField("component", id_type)]
    )
    return spark.createDataFrame(rows, out_schema)


def _list_checkpoint_rdd_dirs(spark) -> set:
    """Paths of rdd-* snapshot dirs under the session checkpoint dir."""
    try:
        jvm = spark.sparkContext._jvm
        base = jvm.org.apache.hadoop.fs.Path(spark.sparkContext.getCheckpointDir())
        fs = base.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return {
            str(st.getPath())
            for st in fs.listStatus(base)
            if st.getPath().getName().startswith("rdd-")
        }
    except Exception:
        return set()


def _delete_paths(spark, paths) -> None:
    """Best-effort recursive delete — cleanup must never fail the job."""
    try:
        jvm = spark.sparkContext._jvm
        for p in paths:
            path = jvm.org.apache.hadoop.fs.Path(p)
            fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
            fs.delete(path, True)
    except Exception:
        pass


def near_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    keep: str = "min",
    max_iter: int = 20,
    priority_col: Optional[str] = None,
    broadcast_labels: bool = True,
) -> DataFrame:
    """Drop all but one canonical row per near-duplicate cluster.

    ``pairs`` is any (id_a, id_b) near-dup relation (from minhash_dedup,
    simhash_near_dups, ngram_jaccard_pairs, or embedding_near_dups). The
    canonical representative is the min (or max) id of the connected
    component. Rows not in any pair are kept untouched.

    ``priority_col=`` keeps the BEST row instead of an arbitrary-id one:
    the cluster survivor is the row with the highest value of that
    ``df`` column (a quality score, a length, a recency stamp), ties
    broken by ascending id; null priorities lose to any non-null. The
    priority lookup broadcasts the component labels (pair-graph-sized —
    tiny relative to the corpus) into one ``df`` scan, and the
    per-component argmax windows over that same small frame, so the
    corpus is never shuffled. ``keep`` is ignored when a priority is
    given. On a pathologically high-duplication corpus the label frame
    is pair-graph-sized and can exceed the driver/broadcast limit —
    pass ``broadcast_labels=False`` to shuffle-join it instead (AQE
    still broadcasts it when its measured size allows).

    ``max_iter`` bounds the propagation rounds. The default pointer-jumping
    algorithm converges in O(log diameter) rounds, so 20 covers any
    realistic cluster (diameter ~2²⁰); the loop early-exits at fixpoint."""
    comps = connected_components(pairs, max_iter=max_iter)
    if priority_col is not None:
        if priority_col not in df.columns:
            raise ValueError(f"priority_col {priority_col!r} not in DataFrame")
        from pyspark.sql import Window

        # one row per id BEFORE the window: df may carry duplicate rows
        # per id (the dirty state a dedup pipeline exists for) and
        # duplicate window rows would hand the winner id an rn=2 row —
        # putting the WINNER in losers and deleting the whole cluster
        prio = F.col(priority_col)
        if dict(df.dtypes).get(priority_col) in ("float", "double"):
            # NaN sorts above every real value AND survives desc_nulls_last
            # (it is not null) — a NaN-quality row would silently win the
            # cluster; demote NaN to null so it loses like null does
            prio = F.when(~F.isnan(prio), prio)
        comps_side = F.broadcast(comps) if broadcast_labels else comps
        labeled = (
            df.select(F.col(id_col).alias("id"), prio.alias("__prio"))
            .join(comps_side, "id")
            .groupBy("id", "component")
            .agg(F.max("__prio").alias("__prio"))
        )
        w = Window.partitionBy("component").orderBy(
            F.col("__prio").desc_nulls_last(), F.col("id").asc()
        )
        losers = (
            labeled.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") > 1)
            .select(F.col("id").alias(id_col))
        )
        return df.join(losers, id_col, "left_anti")
    agg = F.min("id") if keep == "min" else F.max("id")
    canonical = comps.groupBy("component").agg(agg.alias("__keep"))
    losers = (
        comps.join(canonical, "component")
        .where(F.col("id") != F.col("__keep"))
        .select(F.col("id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")
