"""Round-19 experiment: does the HNSW hierarchy actually beat the
IVF-seeded walk on CLUSTERED data?

SCALE.md §18b asserted it from theory ("on clustered real-world data
the hierarchy's long-range edges carry the descent between clusters")
after sf0.1's i.i.d. vectors rewarded seed diversity over hierarchy
(18 vs 21 of 45).  This harness measures the claim instead of carrying
it: it synthesizes a corpus with the SAME shape as a real sf tier
(n rows, dim 64, unit-norm float32) but drawn from a mixture of K
Gaussians, then runs the two PRODUCTION recall queries —
``ann_graph_search_recall`` (IVF-seeded walk) and ``ann_hnsw_recall``
(hierarchical descent) — on it at their pinned equal layer-0 budget
(3 hops x B=8).  Both consume the same staged NN-descent graph, so
the only difference is the seeding strategy under test.

Tightness sweep: cluster sigma controls how separated the mixture is
(sigma >= ~1 degenerates to i.i.d.).  Results land in SCALE.md §19.

Usage: python exp_hnsw_clustered.py [base_sf_dir] [sigma ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from legalchatbot_vectordb_exp_spark.queries import QUERIES  # noqa: E402
from legalchatbot_vectordb_exp_spark.session import get_spark  # noqa: E402

N_CLUSTERS = 32
SEED = 20260816


def make_clustered_dir(base_sf_dir: str, sigma: float, root: str) -> str:
    """A synthetic sf_dir whose embeddings table matches the base
    tier's shape (rows, dim, dtype, unit norm) but is a mixture of
    ``N_CLUSTERS`` Gaussians at the given ``sigma``.  Cluster
    assignment is ``vec_id % K`` so the 9-query batch (vec_id <= 8)
    spans 9 DIFFERENT clusters — the hierarchy's claimed win is
    inter-cluster navigation, so every query must require it."""
    base = pq.read_table(os.path.join(base_sf_dir, "embeddings.parquet"))
    n = base.num_rows
    dim = len(base.column("embedding")[0])
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((N_CLUSTERS, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cluster = np.arange(n) % N_CLUSTERS
    pts = centers[cluster] + sigma * rng.standard_normal((n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    out_dir = os.path.join(root, f"clustered_s{sigma:g}")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [row for row in pts.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(cluster.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    return out_dir


def recall_pair(spark, sf_dir: str) -> dict:
    out = {}
    for key, q in (
        ("ivf_walk", "ann_graph_search_recall"),
        ("hnsw", "ann_hnsw_recall"),
    ):
        t0 = time.perf_counter()
        row = QUERIES[q](spark, sf_dir).collect()[0]
        out[key] = {
            "hits": row["total_hits"],
            "of": row["n_queries"] * 5,
            "sec": round(time.perf_counter() - t0, 1),
        }
    return out


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sigmas = [float(x) for x in sys.argv[2:]] or [0.1, 0.2, 0.4]
    root = os.environ.get("SPARK_GRAFT_EXP_TMP", "/tmp/exp_hnsw_clustered")
    spark = get_spark(
        app_name="exp-hnsw-clustered",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sigma in sigmas:
        sf_dir = make_clustered_dir(base, sigma, root)
        res = recall_pair(spark, sf_dir)
        print(
            json.dumps(
                {"sigma": sigma, "base": base, **res}, sort_keys=True
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
