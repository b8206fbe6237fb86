"""Approximate-nearest-neighbor query family (extension E3 —
SURVEY.md §2.9): the scale paths for similarity search when the exact
broadcast top-k (queries_core ``topk_*``) stops fitting.

Two classic sub-quadratic structures, both expressed as plain
DataFrame plans so Catalyst handles pushdown/broadcast:

* **random-hyperplane LSH** — bucket = sign bits of dot products with
  a fixed set of hyperplanes; near vectors collide with high
  probability; candidate generation is an equi-join on the bucket key.
  Hyperplanes here are 8 deterministic corpus vectors (vec_id 0..7) so
  the oracle can reproduce them; in production they'd be seeded
  gaussians broadcast to executors.

* **IVF (inverted-file) pruning** — assign every vector to its nearest
  centroid; a query probes only the closest ``nprobe`` centroids.  On
  disk the assignment is the partition key, so probing is *partition
  pruning* on the parquet scan: the 100 TB case reads only
  nprobe/nlist of the data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from legalchatbot_vectordb_exp_spark.functions.vector import dot
from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.registry import register, sql_dot

N_PLANES = 8
IVF_MOD = 64  # centroids = vec_id % 64 == 0 (deterministic pseudo-kmeans)
NPROBE = 2


_BUCKET_CTE = f"""
    WITH planes AS (
      SELECT vec_id AS plane_id, embedding AS pv
      FROM embeddings WHERE vec_id < {N_PLANES}
    ),
    sig AS (
      SELECT e.vec_id,
             sum(CASE WHEN {sql_dot('e.embedding', 'p.pv')} > 0
                 THEN CAST(pow(2, p.plane_id) AS BIGINT)
                 ELSE 0 END)::BIGINT AS bucket
      FROM embeddings e CROSS JOIN planes p
      GROUP BY e.vec_id
    )
"""


def _spark_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    planes = emb.filter(F.col("vec_id") < N_PLANES).select(
        F.col("vec_id").alias("plane_id"), F.col("embedding").alias("pv")
    )
    return (
        emb.select("vec_id", "embedding")
        .join(F.broadcast(planes), how="cross")
        .withColumn(
            "bit",
            F.when(
                dot("embedding", "pv") > 0,
                F.pow(F.lit(2.0), F.col("plane_id").cast("double")).cast(
                    "bigint"
                ),
            ).otherwise(F.lit(0)),
        )
        .groupBy("vec_id")
        .agg(F.sum("bit").alias("bucket"))
    )


@register(
    "ann_lsh_buckets",
    sql=_BUCKET_CTE + "SELECT vec_id, bucket FROM sig",
)
def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucket id per vector: 8 sign bits from broadcast
    dot products, folded by one partial-aggregated groupBy."""
    return _spark_buckets(spark, sf_dir).select("vec_id", "bucket")


@register(
    "ann_lsh_pairs",
    sql=_BUCKET_CTE
    + f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({sql_dot('ea.embedding', 'eb.embedding')}, 6) AS cos
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    JOIN embeddings ea ON ea.vec_id = a.vec_id
    JOIN embeddings eb ON eb.vec_id = b.vec_id
    """,
)
def q_ann_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs (same bucket) with exact cosine verification
    — the sub-quadratic near-dup/similarity-join surface: shuffle is on
    the bucket key, pair count bounded by bucket occupancy."""
    buckets = _spark_buckets(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    withv = buckets.join(emb, "vec_id")
    a = withv.select(
        F.col("vec_id").alias("id_a"), "bucket", F.col("embedding").alias("va")
    )
    b = withv.select(
        F.col("vec_id").alias("id_b"), "bucket", F.col("embedding").alias("vb")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(dot("va", "vb"), 6).alias("cos"))
    )


@register(
    "ann_ivf_topk",
    sql=f"""
    WITH centroids AS (
      SELECT vec_id AS cid, embedding AS cv
      FROM embeddings WHERE vec_id % {IVF_MOD} = 0
    ),
    assign AS (
      SELECT e.vec_id, e.embedding,
             arg_max(c.cid, {sql_dot('e.embedding', 'c.cv')}
                            + 1e-12 * (-c.cid)) AS cluster_id
      FROM embeddings e CROSS JOIN centroids c
      GROUP BY e.vec_id, e.embedding
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
    probe AS (
      SELECT c.cid
      FROM centroids c, q
      ORDER BY {sql_dot('q.qv', 'c.cv')} DESC, c.cid ASC
      LIMIT {NPROBE}
    )
    SELECT a.vec_id, round({sql_dot('a.embedding', 'q.qv')}, 6) AS score
    FROM assign a, probe p, q
    WHERE a.cluster_id = p.cid
    ORDER BY {sql_dot('a.embedding', 'q.qv')} DESC, a.vec_id ASC
    LIMIT 5
    """,
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: assign vectors to nearest deterministic centroid,
    probe the query's top-2 centroids, exact top-5 within the probed
    cells.  The cluster assignment is the partition key at scale —
    probing becomes parquet partition pruning."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = emb.filter(F.col("vec_id") % IVF_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    # nearest centroid per vector; tiny deterministic penalty breaks
    # exact-dot ties toward the smaller cid (mirrors the oracle arg_max)
    scored = (
        emb.join(F.broadcast(centroids), how="cross")
        .withColumn(
            "cscore",
            dot("embedding", "cv") + 1e-12 * (-F.col("cid").cast("double")),
        )
    )
    # argmax as max_by aggregation: partial-aggregates map-side (the
    # shuffle carries one row per vector, not one per vector×centroid,
    # and there is no window sort)
    assign = (
        scored.groupBy("vec_id")
        .agg(
            F.max_by("cid", "cscore").alias("cluster_id"),
            F.first("embedding").alias("embedding"),
        )
    )

    qvec = emb.filter(F.col("vec_id") == 1).select("embedding").head()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])

    probe = (
        centroids.withColumn("qs", dot("cv", qlit))
        .orderBy(F.desc("qs"), F.col("cid").asc())
        .limit(NPROBE)
        .select("cid")
    )
    return (
        assign.join(
            F.broadcast(probe), assign.cluster_id == probe.cid
        )
        .withColumn("score", dot("embedding", qlit))
        .orderBy(F.desc("score"), F.col("vec_id").asc())
        .limit(5)
        .select("vec_id", F.round("score", 6).alias("score"))
    )
