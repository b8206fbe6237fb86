"""HNSW layer hierarchy over the E13 NN-descent graph (round-16
verdict item 4): hash-geometric layer assignment, per-layer kNN edge
lists, scanned top-layer entry + greedy descent + layer-0 beam walk.
Oracle parity is pinned here at the smoke SF and by the registered
queries at sf0.01; the recall contract vs the IVF-seeded walk's floor
is the ``ann_hnsw_recall`` guard itself."""

from __future__ import annotations

import hashlib
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from legalchatbot_vectordb_exp_spark.io_tables import load_table  # noqa: E402
from legalchatbot_vectordb_exp_spark.queries_ann import (  # noqa: E402
    GRAPH_SEARCH_RECALL_FLOOR,
    HNSW_DESCENT_BEAM,
    HNSW_LEVEL_CAP,
    HNSW_RECALL_FLOOR,
    KNN_K,
    KNN_SEARCH_TOPK,
    N_BATCH_QUERIES,
    _hnsw_level_expr,
    knn_graph_build,
    q_ann_hnsw_recall,
    q_ann_hnsw_search,
)
from legalchatbot_vectordb_exp_spark.registry import ORACLES  # noqa: E402
from tests.oracle_harness import compare, duckdb_conn  # noqa: E402

SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)


def _py_level(vec_id: int) -> int:
    h = int(hashlib.md5(str(vec_id).encode()).hexdigest()[:8], 16)
    for lvl in range(HNSW_LEVEL_CAP, 0, -1):
        if h % (4**lvl) == 0:
            return lvl
    return 0


def test_level_assignment_matches_hash_and_geometric_shape(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id")
    got = {
        r["vec_id"]: r["level"]
        for r in emb.select(
            "vec_id", _hnsw_level_expr().alias("level")
        ).collect()
    }
    # exact per-node agreement with the python md5 derivation
    for vid, lvl in got.items():
        assert lvl == _py_level(vid), (vid, lvl)
    # geometric shape: each level ≥ l holds a shrinking fraction
    n = len(got)
    at_least = [
        sum(1 for v in got.values() if v >= l)
        for l in range(HNSW_LEVEL_CAP + 1)
    ]
    assert at_least[0] == n
    for l in range(1, HNSW_LEVEL_CAP + 1):
        assert at_least[l] <= at_least[l - 1]
    # level >= 1 is ~n/4 (wide tolerance: 50 ids at the smoke SF)
    assert 0.05 * n <= at_least[1] <= 0.6 * n, at_least


def test_hnsw_search_shape_and_recall_guard(spark):
    out = q_ann_hnsw_search(spark, SF_DIR).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == N_BATCH_QUERIES + 1  # vec_id 0..N inclusive
    for rows in by_q.values():
        assert len(rows) == KNN_SEARCH_TOPK
        scores = sorted((r["score"] for r in rows), reverse=True)
        assert scores == [r["score"] for r in sorted(
            rows, key=lambda r: (-r["score"], r["vec_id"])
        )]
    guard = q_ann_hnsw_recall(spark, SF_DIR).collect()[0]
    assert guard["hnsw_recall_ok"], guard
    assert HNSW_RECALL_FLOOR == GRAPH_SEARCH_RECALL_FLOOR  # equal budget


def test_hnsw_oracle_parity(spark):
    con = duckdb_conn(SF_DIR)
    for name in ("ann_hnsw_search", "ann_hnsw_recall"):
        df = (
            q_ann_hnsw_search(spark, SF_DIR)
            if name == "ann_hnsw_search"
            else q_ann_hnsw_recall(spark, SF_DIR)
        )
        compare(df, con, ORACLES[name], name)


def test_constants_sane():
    assert 1 <= HNSW_LEVEL_CAP <= 4
    assert HNSW_DESCENT_BEAM >= 1
    assert KNN_K >= KNN_SEARCH_TOPK


def test_upper_layer_edges_stay_in_layer(spark):
    """Rebuild layer-1's edge list the way _hnsw_beam does and pin the
    two structural invariants: both endpoints level >= 1, and <= k
    edges per src (the layer is a kNN graph, not a bare filter residue)."""
    from legalchatbot_vectordb_exp_spark.queries_ann import (
        _knn_scored_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    graph = knn_graph_build(spark, SF_DIR).select("src", "dst")
    levels = emb.select("vec_id", _hnsw_level_expr().alias("level"))
    lv = levels.filter(F.col("level") >= 1)
    two_hop = (
        graph.alias("x")
        .join(graph.alias("y"), F.col("x.dst") == F.col("y.src"))
        .select(F.col("x.src").alias("src"), F.col("y.dst").alias("dst"))
    )
    lpairs = (
        graph.select("src", "dst")
        .union(two_hop)
        .join(lv.select(F.col("vec_id").alias("src")), "src")
        .join(lv.select(F.col("vec_id").alias("dst")), "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    edges = _knn_scored_topk(lpairs, emb).select("src", "dst")
    level_of = {
        r["vec_id"]: r["level"] for r in levels.collect()
    }
    rows = edges.collect()
    assert rows, "layer-1 edge list is empty"
    deg = {}
    for r in rows:
        assert level_of[r["src"]] >= 1
        assert level_of[r["dst"]] >= 1
        deg[r["src"]] = deg.get(r["src"], 0) + 1
    assert max(deg.values()) <= KNN_K
