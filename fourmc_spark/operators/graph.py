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

__all__ = ["connected_components"]


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
