"""IVF-partitioned vector collection: layout, partition pruning in the
scan plan, and probe-search recall vs exact search."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.operators.topk import topk_search
from legalchatbot_vectordb_exp_spark.sources.collection import VectorCollection


def build(spark, sf_smoke, tmp_path, n_clusters=8):
    emb = load_table(spark, sf_smoke, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("vector"),
    )
    c = VectorCollection(spark, str(tmp_path), "ivf_demo")
    c.create_ivf(emb, dim=64, n_clusters=n_clusters)
    return c, emb


def test_ivf_layout_partitions_on_disk(spark, sf_smoke, tmp_path):
    c, _ = build(spark, sf_smoke, tmp_path)
    parts = [d for d in os.listdir(c.path) if d.startswith("cluster_id=")]
    assert len(parts) >= 2  # data actually spread over clusters
    props = c.properties
    assert props["layout"] == "ivf" and len(props["centroids"]) == 8
    # every row landed in exactly one cluster; nothing lost
    assert c.read().count() == 500


def test_ivf_probe_prunes_partitions(spark, sf_smoke, tmp_path):
    c, emb = build(spark, sf_smoke, tmp_path)
    qvec = [float(x) for x in emb.filter(F.col("id") == "42").head()[1]]
    pruned = c.read().filter(F.col("cluster_id").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan
    # the probe scan reads only the probed clusters
    total = c.read().count()
    probed = pruned.count()
    assert 0 < probed < total


def test_ivf_search_contains_self_and_approximates_exact(
    spark, sf_smoke, tmp_path
):
    c, emb = build(spark, sf_smoke, tmp_path)
    qvec = [float(x) for x in emb.filter(F.col("id") == "42").head()[1]]

    ivf_top = c.search_ivf(qvec, k=5, nprobe=3).collect()
    ids_ivf = [r.id for r in ivf_top]
    assert ids_ivf[0] == "42"  # self is always in its own probed cell

    exact_top = topk_search(
        c.read(), ivf_top and qvec, k=5, vec_col="vector", id_col="id"
    ).collect()
    ids_exact = [r.id for r in exact_top]
    overlap = len(set(ids_ivf) & set(ids_exact))
    # the test embeddings are RANDOM unit vectors — no cluster
    # structure, IVF's worst case — so expected recall is only
    # ~nprobe/nlist; assert the guaranteed part (self) plus sanity
    assert overlap >= 1, (ids_ivf, ids_exact)


def test_ivf_full_probe_equals_exact(spark, sf_smoke, tmp_path):
    """nprobe = n_clusters degenerates to exact search — same results."""
    c, emb = build(spark, sf_smoke, tmp_path, n_clusters=4)
    qvec = [float(x) for x in emb.filter(F.col("id") == "7").head()[1]]
    ivf_all = c.search_ivf(qvec, k=5, nprobe=4).select(
        "id", F.round("score", 6).alias("score")
    ).collect()
    # search_ivf re-normalizes the query (reference behavior); do the
    # same here so scores agree beyond float noise
    import math

    qn = math.sqrt(sum(x * x for x in qvec))
    exact = topk_search(
        c.read(), [x / qn for x in qvec], k=5, vec_col="vector", id_col="id"
    ).select("id", F.round("score", 6).alias("score")).collect()
    assert sorted(map(tuple, ivf_all)) == sorted(map(tuple, exact))


def test_ivf_upsert_rewrites_only_affected_partitions(
    spark, sf_smoke, tmp_path
):
    c, emb = build(spark, sf_smoke, tmp_path)
    before = c.read()
    n_before = before.count()

    # pick an existing row and re-aim its vector at a *different*
    # centroid's vector (forces a cluster move), plus one brand-new id
    props = c.properties
    old_row = before.filter(F.col("id") == "42").head()
    old_cell = old_row["cluster_id"]
    target_cell, target_vec = next(
        (cid, v) for cid, v in props["centroids"] if cid != old_cell
    )
    new_rows = spark.createDataFrame(
        [("42", [float(x) for x in target_vec]),
         ("new-1", [float(x) for x in target_vec])],
        "id string, vector array<double>",
    )

    # mtimes of partitions that should NOT be touched
    untouched = {
        d: os.path.getmtime(os.path.join(c.path, d))
        for d in os.listdir(c.path)
        if d.startswith("cluster_id=")
        and d not in (f"cluster_id={old_cell}", f"cluster_id={target_cell}")
    }
    assert untouched  # test is vacuous if every partition is affected

    c.upsert_ivf(new_rows)
    after = c.read()

    assert after.count() == n_before + 1  # one update + one insert
    moved = after.filter(F.col("id") == "42").collect()
    assert len(moved) == 1  # no stale copy left in the old cell
    assert moved[0]["cluster_id"] == target_cell
    got_new = after.filter(F.col("id") == "new-1").collect()
    assert len(got_new) == 1 and got_new[0]["cluster_id"] == target_cell

    for d, mtime in untouched.items():
        assert os.path.getmtime(os.path.join(c.path, d)) == mtime, (
            f"partition {d} was rewritten but should not have been"
        )


def test_ivf_kmeans_refinement_improves_recall(spark, tmp_path):
    """Lloyd refinement at fixed nprobe: on a corpus with real cluster
    structure, refined centroids beat the deterministic seed sample.
    (The sf fixtures are random unit vectors — IVF's worst case — so
    this test builds a clustered corpus.)"""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(8, 16)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = []
    for i in range(400):
        p = centers[i % 8] + 0.15 * rng.randn(16)
        pts.append(p / np.linalg.norm(p))
    pts = np.array(pts)
    df = spark.createDataFrame(
        [(f"{i:04d}", [float(x) for x in pts[i]]) for i in range(400)],
        "id string, vector array<double>",
    )

    def recall(name, kmeans_iters):
        c = VectorCollection(spark, str(tmp_path), name)
        c.create_ivf(
            df, dim=16, n_clusters=8, kmeans_iters=kmeans_iters
        )
        hit = tot = 0
        for qi in range(0, 400, 80):
            q = pts[qi]
            exact = set(np.argsort(-(pts @ q))[:5])
            got = c.search_ivf([float(x) for x in q], k=5, nprobe=1)
            hit += len({int(r.id) for r in got.collect()} & exact)
            tot += 5
        return hit / tot

    seed = recall("ivf_seed", 0)
    refined = recall("ivf_refined", 2)
    assert refined > seed, (seed, refined)
    assert refined >= 0.9, refined


def test_ivf_compaction_merges_small_files(spark, sf_smoke, tmp_path):
    """Repeated partition-scoped upserts fragment cells into small
    files; compact_ivf rewrites fragmented cells in place without
    changing the row set or breaking partition pruning."""
    c, emb = build(spark, sf_smoke, tmp_path)
    props = c.properties
    target_cell, target_vec = props["centroids"][0]
    # 4 upserts into the same cell → the cell holds several files
    for i in range(4):
        rows = spark.createDataFrame(
            [(f"frag-{i}-{j}", [float(x) for x in target_vec])
             for j in range(3)],
            "id string, vector array<double>",
        )
        c.upsert_ivf(rows)
    before_rows = sorted(r["id"] for r in c.read().collect())

    stats = c.compact_ivf(min_files=2)
    assert stats["cells_compacted"] >= 1
    assert stats["files_after"] < stats["files_before"]

    after = c.read()
    assert sorted(r["id"] for r in after.collect()) == before_rows
    # pruning still works on the compacted layout
    pruned = after.filter(F.col("cluster_id") == target_cell)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() > 0
