"""Round-18 experiment harness: HNSW descent-seeding variants vs the
IVF-seeded walk's recall, Spark-side only (no oracle) — used to pick
the variant worth implementing with full DuckDB parity.

Knobs: entry level, descent beam, hops per layer, RNG-style
diversified upper-layer edges (Malkov select-neighbors heuristic,
non-sequential relational form: prune candidate v of src u when a
higher-ranked candidate w has score(w, v) > score(u, v); refill to k
with the nearest pruned).  Layer-0 budget stays B=8 x 3 hops — the
equal-budget contract ann_hnsw_recall pins.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from legalchatbot_vectordb_exp_spark.functions.vector import dot  # noqa: E402
from legalchatbot_vectordb_exp_spark.io_tables import load_table  # noqa: E402
from legalchatbot_vectordb_exp_spark.queries_ann import (  # noqa: E402
    KNN_K,
    KNN_SEARCH_BEAM,
    KNN_SEARCH_HOPS,
    KNN_SEARCH_TOPK,
    N_BATCH_QUERIES,
    _hnsw_level_expr,
    knn_graph_build,
)
from legalchatbot_vectordb_exp_spark.session import get_spark  # noqa: E402


def diversified_edges(lpairs, emb, k, cand_width):
    """RNG-style pruning: rank u's candidates by score; candidate v
    survives unless some higher-ranked w has score(w, v) > score(u, v).
    Refill to k with the nearest pruned (survivors first)."""
    ev = lambda a: emb.select(  # noqa: E731
        F.col("vec_id").alias(a), F.col("embedding").alias(f"_e_{a}")
    )
    scored = (
        lpairs.join(F.broadcast(ev("src")), "src")
        .join(F.broadcast(ev("dst")), "dst")
        .withColumn("s_uv", dot("_e_src", "_e_dst"))
    )
    w_src = Window.partitionBy("src").orderBy(
        F.desc("s_uv"), F.col("dst").asc()
    )
    cand = (
        scored.withColumn("rn", F.row_number().over(w_src))
        .filter(F.col("rn") <= cand_width)
        .select("src", "dst", "s_uv", "rn")
        .localCheckpoint()
    )
    # pair every candidate v with each higher-ranked candidate w of
    # the same src; prune v if score(w, v) > score(u, v)
    pruned = (
        cand.alias("v")
        .join(
            cand.alias("w"),
            (F.col("v.src") == F.col("w.src"))
            & (F.col("w.rn") < F.col("v.rn")),
        )
        .join(
            F.broadcast(ev("dst").withColumnRenamed("dst", "_v")),
            F.col("v.dst") == F.col("_v"),
        )
        .join(
            F.broadcast(
                ev("dst")
                .withColumnRenamed("dst", "_w")
                .withColumnRenamed("_e_dst", "_e_w")
            ),
            F.col("w.dst") == F.col("_w"),
        )
        .withColumn("s_wv", dot("_e_w", "_e_dst"))
        .filter(F.col("s_wv") > F.col("v.s_uv"))
        .select(
            F.col("v.src").alias("src"), F.col("v.dst").alias("dst")
        )
        .distinct()
    )
    flagged = cand.join(pruned, ["src", "dst"], "left_anti").withColumn(
        "keep", F.lit(1)
    )
    dropped = cand.join(pruned, ["src", "dst"], "left_semi").withColumn(
        "keep", F.lit(0)
    )
    allc = flagged.unionByName(dropped)
    w_fill = Window.partitionBy("src").orderBy(
        F.desc("keep"), F.col("rn").asc()
    )
    return (
        allc.withColumn("fr", F.row_number().over(w_fill))
        .filter(F.col("fr") <= k)
        .select("src", "dst")
    )


def hnsw_recall(
    spark,
    sf_dir,
    *,
    entry_level=3,
    descent_beam=12,
    upper_hops=2,
    diversify=False,
    cand_width=20,
    level_cap=3,
):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    graph = knn_graph_build(spark, sf_dir).select("src", "dst")
    levels = emb.select("vec_id", _hnsw_level_expr().alias("level"))
    qdf = emb.filter(F.col("vec_id") <= N_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    entry = levels.orderBy(F.desc("level"), F.col("vec_id").asc()).limit(
        1
    ).collect()[0]["vec_id"]
    topset = (
        levels.filter(F.col("level") >= entry_level)
        .select("vec_id")
        .union(spark.createDataFrame([(int(entry),)], "vec_id long"))
        .distinct()
    )
    nodes = emb.select(
        F.col("vec_id").alias("node"), F.col("embedding").alias("nv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("node").asc()
    )
    beam = (
        qdf.join(
            F.broadcast(
                nodes.join(
                    topset.select(F.col("vec_id").alias("node")), "node"
                )
            )
        )
        .withColumn("score", dot("nv", "qv"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= descent_beam)
        .select("query_id", "node", "score")
    )

    def hop(beam, edges, width):
        expanded = beam.select("query_id", "node").union(
            F.broadcast(beam.alias("p"))
            .join(edges.alias("ed"), F.col("ed.src") == F.col("p.node"))
            .select(
                F.col("p.query_id").alias("query_id"),
                F.col("ed.dst").alias("node"),
            )
        ).distinct()
        return (
            expanded.join(F.broadcast(nodes), "node")
            .join(F.broadcast(qdf), "query_id")
            .withColumn("score", dot("nv", "qv"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= width)
            .select("query_id", "node", "score")
        )

    from legalchatbot_vectordb_exp_spark.queries_ann import (
        _knn_scored_topk,
    )

    for lvl in range(min(entry_level, level_cap) - 1, 0, -1):
        lv = levels.filter(F.col("level") >= lvl)
        two_hop = (
            graph.alias("x")
            .join(graph.alias("y"), F.col("x.dst") == F.col("y.src"))
            .select(
                F.col("x.src").alias("src"), F.col("y.dst").alias("dst")
            )
        )
        lpairs = (
            graph.select("src", "dst")
            .union(two_hop)
            .join(lv.select(F.col("vec_id").alias("src")), "src")
            .join(lv.select(F.col("vec_id").alias("dst")), "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        if diversify:
            edges_l = diversified_edges(
                lpairs, emb, KNN_K, cand_width
            ).localCheckpoint()
        else:
            edges_l = (
                _knn_scored_topk(lpairs, emb)
                .select("src", "dst")
                .localCheckpoint()
            )
        for _ in range(upper_hops):
            beam = hop(beam, edges_l, descent_beam).localCheckpoint()
    for _ in range(KNN_SEARCH_HOPS):
        beam = hop(beam, graph, KNN_SEARCH_BEAM).localCheckpoint()
    approx = (
        beam.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_SEARCH_TOPK)
        .select("query_id", "node")
    )
    exact = (
        qdf.join(F.broadcast(nodes))
        .withColumn("score", dot("nv", "qv"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_SEARCH_TOPK)
        .select("query_id", "node")
    )
    return approx.join(exact, ["query_id", "node"]).count()


def main():
    sfs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    spark = get_spark(app_name="exp-hnsw", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    variants = [
        ("V0 current", dict()),
        ("V1 diversify", dict(diversify=True)),
        ("V2 beam24 hops3", dict(descent_beam=24, upper_hops=3)),
        ("V3 div+beam24h3", dict(
            diversify=True, descent_beam=24, upper_hops=3)),
        ("V4 entry2", dict(entry_level=2)),
        ("V5 entry2+div", dict(entry_level=2, diversify=True)),
    ]
    for sf in sfs:
        for name, kw in variants:
            t0 = time.perf_counter()
            r = hnsw_recall(spark, sf, **kw)
            print(
                f"{sf.rsplit('/',1)[-1]} {name}: recall {r}/45 "
                f"({time.perf_counter()-t0:.1f}s)",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
