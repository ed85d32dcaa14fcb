"""Iterative graph operators: connected components for dedup clustering.

The near-dup operators (``operators/dedup.py``) emit *pairs*; a curation
pipeline needs *clusters*: every document labeled with one canonical
representative so a single keep-decision covers the whole duplicate set.
That is connected components over the pair graph.

Spark-first design: min-label propagation expressed as DataFrame joins.
Each round is one shuffle join (neighbor messages) plus one min
aggregation (partial+final hash agg, so the map side combines before the
shuffle). Labels only ever decrease, so the round count equals the graph
diameter; near-dup graphs are unions of small dense clusters (diameter a
few hops), so convergence is fast. Lineage is truncated every round with
``localCheckpoint`` — without it the plan doubles per round and the
optimizer re-derives the whole history each time. On a real cluster,
prefer ``spark.sparkContext.setCheckpointDir`` + reliable ``checkpoint``
if executor loss mid-loop must be survivable.

Driver involvement per round is a single scalar ``count`` (the
convergence test) — no per-row driver work, no ``collect`` of data.

The reference has no graph operator (its dedup surface is host-engine
work, SURVEY.md §2.2); this is a north-star LLM-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "connected_components_star",
    "canonicalize",
    "pagerank",
]


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free the block-manager storage behind a ``localCheckpoint``-ed
    frame that will never be read again. Spark keeps each checkpointed
    RDD's blocks until the JVM-side reference is garbage-collected —
    non-deterministic from Python, so an iterative loop would hold up
    to max_iter rounds' edge/label sets in storage simultaneously on a
    large graph. Best-effort: reaches the checkpointed RDD through the
    analyzed LogicalRDD (internal accessor); if the plan shape ever
    changes, the blocks simply wait for GC as before. NEVER call this
    on a frame that may still be read — a localCheckpoint truncates
    lineage, so unpersisted blocks cannot be recomputed."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_out: str = "node",
    comp_out: str = "component",
    max_iter: int = 30,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum node
    id reachable from it (its component id).

    Only nodes that appear in ``edges`` are returned — for dedup that is
    exactly the documents belonging to a non-trivial duplicate cluster;
    isolated documents are their own component by definition.

    Raises ``RuntimeError`` if ``max_iter`` rounds do not converge (the
    result would be silently wrong otherwise). ``max_iter`` bounds the
    graph diameter, not the node count.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            msgs = sym.join(labels, sym["v"] == labels["node"]).select(
                sym["u"].alias("node"), labels["label"]
            )
            new_labels = (
                labels.unionByName(msgs)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=True)
            )
            # labels are monotonically non-increasing, so any strict
            # decrease means another round is needed; limit(1) stops the
            # scan at the first witness
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), on="node")
                .where(F.col("n.label") < F.col("o.label"))
                .limit(1)
                .count()
            )
            # the changed-count above was this round's last read of the
            # OLD labels — release its checkpoint blocks now, or the
            # loop accumulates one label set per round in storage
            _release_local_checkpoint(labels)
            labels = new_labels
            if changed == 0:
                return labels.select(
                    F.col("node").alias(id_out), F.col("label").alias(comp_out)
                )
    finally:
        sym.unpersist()
    raise RuntimeError(
        f"connected_components: no convergence in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_out: str = "node",
    comp_out: str = "component",
    max_iter: int = 25,
) -> DataFrame:
    """:func:`connected_components` by alternating large-star /
    small-star contraction (Kiveris et al., "Connected Components in
    MapReduce and Beyond") — same output contract, but round count is
    O(log^2 n) in the NODE count instead of the graph DIAMETER.

    Min-label propagation is the right default for near-dup clusters
    (dense, a few hops wide); this is the scale-safe variant for graphs
    that can be long and thin — citation/link chains, session stitching,
    entity-resolution paths — where diameter-many rounds would be the
    bottleneck. A 10k-hop chain converges in ~15 rounds here.

    Each round is two phases; per phase one min-aggregate on the
    adjacency and one co-partitioned equi-join on the same key (the agg
    and the join share the node-key shuffle under AQE). Edges only move
    toward component minima and the edge set shrinks monotonically
    toward stars. Lineage is truncated per round with localCheckpoint,
    convergence is decided by an edge-set fixpoint (counts + an
    except-empty witness — both cheap because the fixpoint set is
    star-shaped and small). Raises RuntimeError if ``max_iter`` rounds
    do not converge, like the propagation variant.
    """
    e0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi")
        )
        .distinct()
    )
    cur = e0.localCheckpoint(eager=True)
    for _ in range(max_iter):
        # large-star: for every node u, attach each LARGER neighbor
        # to m = min(N(u) ∪ {u})
        adj = cur.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
            cur.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        mins = adj.groupBy("u").agg(F.min("v").alias("_mn")).select(
            "u", F.least("_mn", F.col("u")).alias("m")
        )
        large = (
            adj.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
            .where(F.col("lo") != F.col("hi"))
            .distinct()
        )
        # small-star: group canonical (hi, lo) edges by hi, connect
        # every smaller neighbor (and hi itself) to the minimum
        sm = large.groupBy("hi").agg(F.min("lo").alias("m"))
        j = large.join(sm, "hi")
        small = (
            j.select(F.col("m").alias("lo"), F.col("hi"))
            .unionByName(
                j.where(F.col("lo") != F.col("m")).select(
                    F.col("m").alias("lo"), F.col("lo").alias("hi")
                )
            )
            .where(F.col("lo") != F.col("hi"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # fixpoint: same canonical edge set as last round
        converged = small.count() == cur.count() and (
            small.exceptAll(cur).limit(1).count() == 0
        )
        # that comparison was the last read of the previous round's
        # edge set either way — release it so the loop holds at most
        # two rounds' checkpoints (small + cur) at any moment instead
        # of max_iter of them
        _release_local_checkpoint(cur)
        if converged:
            labels = small.select(
                F.col("hi").alias(id_out), F.col("lo").alias(comp_out)
            ).unionByName(
                small.select(F.col("lo").alias(id_out),
                             F.col("lo").alias(comp_out)).distinct()
            )
            return labels
        cur = small
    raise RuntimeError(
        f"connected_components_star: no convergence in {max_iter} rounds"
    )


def canonicalize(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 30,
    method: str = "star",
) -> DataFrame:
    """The dedup *apply* step: near-dup pairs -> duplicate clusters -> one
    kept representative per cluster (max ``weight_col``, ties to the
    smallest id — "keep the longest member", the common corpus-dedup rule).

    ``method``: ``"star"`` (large/small-star contraction, O(log^2 n)
    rounds, diameter-independent — the DEFAULT, decided by measurement:
    on dense star-shaped clusters at 1k/10k/50k clusters star ran
    0.66-0.91x of propagation's wall time, and on chains ≥50 hops
    propagation cannot converge inside max_iter at all while star
    finishes in ~6-8 s; ``scripts/measure_components_crossover.py``
    reproduces the table) or ``"propagation"`` (min-label, rounds =
    cluster diameter — same labels, kept for graphs known to be dense
    where its per-round plan is simpler to reason about). Both label a
    component by its minimum member id, so results are identical
    wherever both converge.

    Output: one row per input doc — ``(id, component_id, canonical_id,
    kept)`` with ``kept`` 1 iff the doc is its cluster's representative;
    docs in no pair keep themselves.

    Scale shape: clustering and representative election run on the
    *clustered docs only* (bounded by the duplicate-pair set, tiny next to
    the corpus by near-dup contract); the full corpus is touched twice by
    **broadcast** left joins of those small maps — the corpus itself never
    shuffles. Representative election is one ``max_by`` hash aggregate
    (partial+final), not a window over the corpus.
    """
    if method not in ("propagation", "star"):
        raise ValueError(f"canonicalize: unknown method {method!r}")
    cc = connected_components if method == "propagation" \
        else connected_components_star
    comps = cc(
        edges, src=src, dst=dst, id_out=id_col, comp_out="component_id",
        max_iter=max_iter,
    )
    members = comps.join(docs.select(id_col, weight_col), id_col)
    # lexicographic max over (weight, -id) = max weight, ties -> min id
    reps = members.groupBy("component_id").agg(
        F.expr(f"max_by({id_col}, struct({weight_col}, -{id_col}))").alias(
            "canonical_id"
        )
    )
    return (
        docs.select(id_col)
        .join(F.broadcast(comps), on=id_col, how="left")
        .join(F.broadcast(reps), on="component_id", how="left")
        .select(
            F.col(id_col),
            F.coalesce("component_id", F.col(id_col)).alias("component_id"),
            F.coalesce("canonical_id", F.col(id_col)).alias("canonical_id"),
        )
        .withColumn(
            "kept", (F.col("canonical_id") == F.col(id_col)).cast("bigint")
        )
    )


PAGERANK_SCALE = 1_000_000_000_000  # rank unit: 1e-12 of total mass


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed graph, **integer-exact**.

    Ranks are represented as BIGINT multiples of 1e-12 of the total mass
    and every step uses integer division, so two engines running the same
    unrolled plan produce bit-identical ranks — no float summation-order
    hazards (the reason this is oracle-checkable where textbook float
    PageRank is not). The recurrence (simplified PageRank: dangling mass
    is not redistributed, the common formulation for fixed-iteration
    analytics):

        pr_0(v)   = SCALE div N
        base      = ((SCALE div N) * (100 - d)) div 100
        pr_k+1(v) = base + sum_{u->v} (pr_k(u) * d) div (outdeg(u) * 100)

    Scale shape: the iteration body is one shuffle join of the rank table
    with the (edge, outdeg) table on ``src`` plus one partial+final hash
    aggregate on ``dst`` — the Pregel message pattern as plain DataFrame
    ops. ``edges ⋈ outdeg`` is computed once and reused across rounds
    (same subplan → Spark exchange reuse); ranks are node-table-sized, so
    each round shuffles O(E) messages and O(V) ranks, never the input
    relations that derived the edges. Unrolled (fixed ``iterations``), so
    the whole computation is ONE Catalyst plan — AQE sizes every exchange.

    The reference has no graph surface (SURVEY.md §2.2 — host-engine
    work); this is a north-star analytics addition (link-quality signals
    for corpus curation).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    deg = e.groupBy("u").agg(F.count("*").cast("long").alias("outdeg"))
    # (u, v, outdeg) — the per-round message fabric. persist(): every
    # round references this subtree, and without a cache the unrolled
    # plan re-derives it from the base relations each time (the static
    # plan showed one full scan+join chain PER round). The CacheManager
    # keys on the analyzed plan, so repeated pagerank() calls over the
    # same edges share one materialization; first action computes it,
    # every later round reads the cached columnar batches.
    ed = e.join(deg, "u").persist()
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    n1 = nodes.agg(F.count("*").cast("long").alias("n_nodes"))
    d = int(damping_pct)
    pr = (
        nodes.crossJoin(F.broadcast(n1))
        .select(
            "node",
            "n_nodes",
            F.expr(f"CAST({PAGERANK_SCALE} AS BIGINT) div n_nodes").alias("pr"),
        )
    )
    base = F.expr(
        f"((CAST({PAGERANK_SCALE} AS BIGINT) div n_nodes) * {100 - d}) div 100"
    )
    for _ in range(iterations):
        msgs = (
            ed.join(pr.select(F.col("node").alias("u"), "pr"), "u")
            .select(
                F.col("v").alias("node"),
                F.expr(f"(pr * {d}) div (outdeg * 100)").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").cast("long").alias("in_mass"))
        )
        pr = (
            pr.select("node", "n_nodes")
            .join(msgs, "node", "left")
            .select(
                "node",
                "n_nodes",
                (base + F.coalesce(F.col("in_mass"), F.lit(0)))
                .cast("long")
                .alias("pr"),
            )
        )
    return pr.select("node", "pr")
