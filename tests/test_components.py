"""Connected components: both physical strategies (single-task
union-find and iterative min-label propagation) must agree with a
reference union-find on the same graph, including the adversarial
chain graph that maximizes propagation rounds."""

from __future__ import annotations

import pytest

from legalchatbot_vectordb_exp_spark.operators.components import (
    connected_components,
)


def _reference_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            if rd < rs:
                rs, rd = rd, rs
            parent[rd] = rs
    return {n: find(n) for n in parent}


GRAPHS = {
    # two cliques + a bridge-free singleton pair
    "cliques": [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21)],
    # chain graph: diameter = n, worst case for label propagation
    "chain": [(i, i + 1) for i in range(30)],
    # chain given in descending order (labels must flow uphill)
    "chain_desc": [(i + 1, i) for i in range(30, 0, -1)],
    # star + duplicate edges both directions
    "star": [(5, 1), (5, 2), (5, 3), (1, 5), (2, 5), (3, 3)],
}


@pytest.mark.parametrize("strategy", ["local", "iterative"])
@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_components_strategies_match_reference(spark, strategy, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df, strategy=strategy, max_iter=50)
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == _reference_components(edges), (strategy, name)


def test_auto_strategy_small_graph(spark):
    df = spark.createDataFrame(GRAPHS["cliques"], "doc_a long, doc_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _reference_components(GRAPHS["cliques"])


def test_iterative_raises_on_non_convergence(spark):
    """A chain graph of diameter > max_iter must raise, not silently
    return wrong labels (ADVICE r01)."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(chain, max_iter=2, strategy="iterative")
    # and with enough rounds the same graph converges to one component
    ok = connected_components(chain, max_iter=20, strategy="iterative")
    assert {r.component for r in ok.collect()} == {0}
