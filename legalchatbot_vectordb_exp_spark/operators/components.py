"""Connected components over candidate-pair edges — the "keep one per
duplicate group" step that completes near-dup dedup (SURVEY.md §2.9
E2: MinHash candidates → components → representative).

Algorithm: iterative min-label propagation.  Each node starts labeled
with itself; every round, each node adopts the minimum label in its
neighborhood; converged when no label changes.  Rounds = graph
diameter (dup clusters are near-cliques → 2-3 rounds in practice).

Scale notes: each round is one shuffle (groupBy node).  The driver
loop only checks a scalar convergence count per round — no data ever
reaches the driver.  For adversarially long chain graphs the
large-star/small-star variant halves diameter per round; dup clusters
don't need it.  Labels are checkpointed via localCheckpoint to cut the
growing lineage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """edges(src, dst) → (node, component) with component = min node id
    reachable.  Nodes = all endpoints; isolated nodes don't appear in
    edges and so keep label = self implicitly (callers union them)."""
    # materialize the (usually expensive) edge lineage once — every
    # propagation round joins against adj, and without this each round
    # would re-run candidate generation upstream
    edges = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).localCheckpoint(eager=True)

    # size the iteration's parallelism to the EDGE set, not the session
    # default: after LSH banding the edge list is orders smaller than
    # the corpus, and running ~10 tiny jobs at 32 shuffle partitions
    # each is pure scheduling overhead.  ~1M edges per partition, capped
    # at the session's configured parallelism for genuinely big graphs.
    sess_parts = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    parts = max(1, min(sess_parts, edges.count() // 1_000_000 + 1))
    edges = edges.repartition(parts)

    nodes = (
        edges.select(F.col("s").alias("node"))
        .unionByName(edges.select(F.col("d").alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("component", F.col("node"))

    # undirected adjacency, plus self-loops so a node retains its label
    adj = (
        edges.select(F.col("s").alias("a"), F.col("d").alias("b"))
        .unionByName(edges.select(F.col("d").alias("a"), F.col("s").alias("b")))
        .unionByName(nodes.select(F.col("node").alias("a"), F.col("node").alias("b")))
        .distinct()
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # each node adopts min(label of neighbors ∪ self)
        new_labels = (
            adj.join(labels, adj.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("component"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
