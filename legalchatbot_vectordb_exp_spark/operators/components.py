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

# below this many edges the graph is solved by a single-task union-find
# (one job) instead of the iterative multi-job propagation loop — after
# LSH banding the duplicate graph is almost always orders of magnitude
# smaller than the corpus, and ~10 tiny shuffle jobs cost more in
# scheduling than the whole graph costs in memory.  2M edges ≈ tens of
# MB in one task; the iterative path takes over beyond that.
LOCAL_CC_MAX_EDGES = 2_000_000


def _local_components(edges: DataFrame) -> DataFrame:
    """Single-task union-find (executor-side, min-id representative)."""
    node_type = edges.schema[0].dataType.simpleString()

    def run(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        pdfs = list(batches)
        for pdf in pdfs:
            for s, d in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                parent.setdefault(s, s)
                parent.setdefault(d, d)
                rs, rd = find(s), find(d)
                if rs != rd:
                    # attach the larger root under the smaller so the
                    # final root of every tree is the component min
                    if rd < rs:
                        rs, rd = rd, rs
                    parent[rd] = rs
        nodes = list(parent)
        yield pd.DataFrame(
            {"node": nodes, "component": [find(n) for n in nodes]}
        )

    return edges.repartition(1).mapInPandas(
        run, schema=f"node {node_type}, component {node_type}"
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    strategy: str = "auto",
) -> DataFrame:
    """edges(src, dst) → (node, component) with component = min node id
    reachable.  Nodes = all endpoints; isolated nodes don't appear in
    edges and so keep label = self implicitly (callers union them).

    ``strategy`` is ``auto`` (choose from the edge count — the same
    stats-driven planning as operators/topk), ``local`` (single
    union-find task) or ``iterative`` (shuffle-per-round propagation
    loop for graphs beyond single-task memory)."""
    # materialize the (usually expensive) edge lineage once — every
    # propagation round joins against adj, and without this each round
    # would re-run candidate generation upstream
    edges = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).localCheckpoint(eager=True)

    n_edges = edges.count()
    if strategy == "local" or (
        strategy == "auto" and n_edges <= LOCAL_CC_MAX_EDGES
    ):
        return _local_components(edges)

    # size the iteration's parallelism to the EDGE set, not the session
    # default: after LSH banding the edge list is orders smaller than
    # the corpus, and running ~10 tiny jobs at 32 shuffle partitions
    # each is pure scheduling overhead.  ~1M edges per partition, capped
    # at the session's configured parallelism for genuinely big graphs.
    sess_parts = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    parts = max(1, min(sess_parts, n_edges // 1_000_000 + 1))
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

    changed = -1
    for _ in range(max_iter):
        # each node adopts min(label of neighbors ∪ self).  The node's
        # previous label rides along in the same aggregate via its
        # self-loop row (a == b), so convergence detection is a scan of
        # this round's output — no join against the old labels and no
        # extra shuffle.  The count() is also the action that
        # materializes the (lazy) localCheckpoint: one job per round.
        new_labels = (
            adj.join(labels, adj.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(
                F.min("component").alias("component"),
                F.min(
                    F.when(F.col("a") == F.col("b"), F.col("component"))
                ).alias("prev"),
            )
        ).localCheckpoint(eager=False)
        changed = new_labels.filter(
            F.col("component") != F.col("prev")
        ).count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    if changed != 0:
        # labels are provably wrong for components whose diameter
        # exceeds max_iter — refuse to return them silently
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} "
            f"rounds ({changed} labels still changing); raise max_iter "
            "or use strategy='local' for chain-shaped graphs"
        )
    return labels
