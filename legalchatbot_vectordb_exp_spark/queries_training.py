"""Training-set preparation operators: deterministic splits,
concat-and-chunk sequence packing, and benchmark decontamination —
the last mile between a curated corpus and a tokenizer.

Scale notes:

* ``hash_split`` is a scan-stage projection (md5 bucket → label);
* ``sequence_packing`` windows WITHIN a hash shard: the corpus-wide
  running token offset that makes packing inherently sequential is
  broken into ``N_PACK_SHARDS`` independent offsets, so the window
  sort is per-shard (embarrassingly parallel, bounded partition size)
  instead of a single global sort — the standard concat-and-chunk
  used by LLM data pipelines, sharded;
* ``decontamination`` equi-joins train×benchmark on the shingle key
  (never a cross join); the benchmark side is small by construction
  and broadcast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from legalchatbot_vectordb_exp_spark.functions.text import word_shingles, words
from legalchatbot_vectordb_exp_spark.functions.vector import dot
from legalchatbot_vectordb_exp_spark.io_tables import load_table, spread
from legalchatbot_vectordb_exp_spark.registry import register, sql_dot, sql_words

SEQ_LEN = 512  # tokens per packed training sequence
N_PACK_SHARDS = 16
# Global sequence id = shard * SEQ_ID_STRIDE + seq-within-shard, so the
# stride IS the per-shard sequence budget: a shard may hold at most
# SEQ_ID_STRIDE sequences (= SEQ_ID_STRIDE * SEQ_LEN ≈ 5e8 tokens at
# 512) before its ids would collide with the next shard's range.
# Sizing rule at scale: N_PACK_SHARDS * SEQ_ID_STRIDE * SEQ_LEN must
# exceed the corpus token count — raise N_PACK_SHARDS (preferred: it
# also bounds the per-shard window) or SEQ_ID_STRIDE together.
SEQ_ID_STRIDE = 1_000_000

# deterministic pseudo-benchmark subset: ~1 doc in 47
BENCH_MOD = 47
CONTAM_NGRAM = 3  # shingle width for the overlap check
CONTAM_MIN_SHARED = 2  # shared shingles to flag contamination


@register(
    "hash_split",
    sql="""
    SELECT doc_id,
           CASE
             WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                  < 3865470566 THEN 'train'        -- floor(0.90 * 2^32)
             WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                  < 4080218931 THEN 'val'          -- floor(0.95 * 2^32)
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by md5 bucket — stable
    under corpus growth (a document's split never changes when other
    documents are added, unlike row_number() % k).  Scan-stage only."""
    docs = load_table(spark, sf_dir, "documents")
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    split = (
        F.when(hv < int(0.90 * 2**32), "train")
        .when(hv < int(0.95 * 2**32), "val")
        .otherwise("test")
    )
    return docs.select("doc_id", split.alias("split"))


@register(
    "sequence_packing",
    sql=f"""
    WITH toks AS (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
               % {N_PACK_SHARDS} AS shard,
             len({sql_words('text')})::BIGINT AS n_toks
      FROM documents
      WHERE len({sql_words('text')}) > 0
    ),
    off AS (
      SELECT doc_id, shard, n_toks,
             -- ::BIGINT: DuckDB sum(BIGINT) returns HUGEINT, which the
             -- driver's pandas fetch coerces to float64 (3 -> 3.0) and
             -- hash-diverges from Spark's int.  Cast before it propagates
             -- into first_seq/last_seq.
             (sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING))::BIGINT - n_toks
               AS tok_start
      FROM toks
    )
    SELECT doc_id, shard,
           shard * {SEQ_ID_STRIDE} + tok_start // {SEQ_LEN} AS first_seq,
           shard * {SEQ_ID_STRIDE} + (tok_start + n_toks - 1) // {SEQ_LEN}
             AS last_seq,
           n_toks
    FROM off
    """,
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: within each hash shard,
    documents are concatenated in doc_id order and cut into fixed
    {SEQ_LEN}-token sequences; each document reports the first and
    last sequence it lands in (straddling the cut is allowed — the
    standard LLM packing that wastes zero tokens to padding).

    The running token offset — the inherently sequential part of
    packing — is a window cum-sum PARTITIONED BY the shard, so there
    is no global sort: {N_PACK_SHARDS} independent, bounded windows
    (at 100 TB, raise the shard count so each shard's token stream
    stays executor-sized).

    NOTE: DuckDB ``hash()`` ≠ Spark ``xxhash64`` — the shard id must
    be portable, so it derives from md5 hex (bit-identical in both
    engines) rather than either engine's native hash.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    n_toks = F.size(words("text")).cast("bigint")
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(N_PACK_SHARDS),
    )
    toks = docs.select(
        "doc_id", shard.alias("shard"), n_toks.alias("n_toks")
    ).filter(F.col("n_toks") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = toks.withColumn(
        "tok_start", F.sum("n_toks").over(w) - F.col("n_toks")
    )
    return off.select(
        "doc_id",
        "shard",
        (
            F.col("shard") * SEQ_ID_STRIDE
            + F.floor(F.col("tok_start") / SEQ_LEN)
        ).alias("first_seq"),
        (
            F.col("shard") * SEQ_ID_STRIDE
            + F.floor((F.col("tok_start") + F.col("n_toks") - 1) / SEQ_LEN)
        ).alias("last_seq"),
        "n_toks",
    )


SHUFFLE_SEED = 20260814  # epoch seed: change per epoch for a fresh permutation
N_SHUFFLE_SHARDS = 32


@register(
    "training_shuffle",
    sql=f"""
    WITH keyed AS (
      SELECT doc_id,
             md5('{SHUFFLE_SEED}:' || doc_id::VARCHAR) AS skey
      FROM documents
    )
    SELECT doc_id,
           ('0x' || substr(skey, 1, 8))::BIGINT % {N_SHUFFLE_SHARDS}
             AS shard,
           row_number() OVER (
             PARTITION BY ('0x' || substr(skey, 1, 8))::BIGINT
                          % {N_SHUFFLE_SHARDS}
             ORDER BY skey, doc_id) AS pos_in_shard
    FROM keyed
    """,
)
def q_training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-seeded global shuffle — the reshuffle every training run
    performs before sharding the corpus to data loaders.  Keying by
    ``md5(seed || doc_id)`` gives a deterministic pseudorandom
    permutation that is reproducible across engines and re-runs, and
    independent across epochs (bump {SHUFFLE_SEED}).

    Scale shape: NO global sort.  The hash key is also the shard
    assignment, and the position is a row_number WITHIN each of the
    {N_SHUFFLE_SHARDS} hash shards — bounded, embarrassingly parallel
    windows (same sharding idiom as ``sequence_packing``).  A reader
    streams shard files in pos order; because the shard itself is
    hash-derived, the concatenation of shards IS the permutation.  At
    100 TB raise the shard count so each window stays executor-sized;
    writing ``partitionBy(shard)`` makes the epoch layout one
    partitioned parquet write."""
    docs = load_table(spark, sf_dir, "documents")
    skey = F.md5(
        F.concat(F.lit(f"{SHUFFLE_SEED}:"), F.col("doc_id").cast("string"))
    )
    keyed = docs.select("doc_id", skey.alias("skey"))
    shard = F.pmod(
        F.conv(F.substring("skey", 1, 8), 16, 10).cast("bigint"),
        F.lit(N_SHUFFLE_SHARDS),
    )
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return (
        keyed.withColumn("shard", shard)
        .withColumn("pos_in_shard", F.row_number().over(w))
        .select("doc_id", "shard", "pos_in_shard")
    )


_SH = (
    f"list_distinct(list_transform("
    f"generate_series(0, greatest(len({sql_words('text')}) - {CONTAM_NGRAM},"
    f" 0)), i -> array_to_string("
    f"({sql_words('text')})[i + 1 : i + {CONTAM_NGRAM}], ' ')))"
)


@register(
    "decontamination",
    sql=f"""
    WITH bench AS (
      SELECT doc_id AS bench_id, unnest({_SH}) AS shingle
      FROM documents WHERE doc_id % {BENCH_MOD} = 0
    ),
    train AS (
      SELECT doc_id AS train_id, unnest({_SH}) AS shingle
      FROM documents WHERE doc_id % {BENCH_MOD} <> 0
    )
    SELECT t.train_id, b.bench_id, count(*)::BIGINT AS n_shared
    FROM train t JOIN bench b USING (shingle)
    GROUP BY 1, 2
    HAVING count(*) >= {CONTAM_MIN_SHARED}
    """,
)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents sharing ≥2
    distinct 3-gram shingles with any benchmark document (here a
    deterministic 1-in-47 pseudo-benchmark subset of the corpus; a
    production pass uses the real eval suites and wider 8–13-gram
    windows — same plan shape, different constants).

    The benchmark shingle set is small by construction (eval suites
    are thousands of documents, not billions) and is **broadcast**;
    the training side streams through the scan and the only shuffle
    is the (train_id, bench_id) count aggregation — at 100 TB this is
    the same shape as a bloom-filter-style contamination pass."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = lambda side: side.select(  # noqa: E731
        "doc_id",
        F.explode(word_shingles("text", CONTAM_NGRAM)).alias("shingle"),
    )
    bench = sh(docs.filter(F.col("doc_id") % BENCH_MOD == 0)).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    train = sh(docs.filter(F.col("doc_id") % BENCH_MOD != 0)).select(
        F.col("doc_id").alias("train_id"), "shingle"
    )
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= CONTAM_MIN_SHARED)
    )


NEG_K = 4  # negatives drawn per anchor

@register(
    "negative_sampling",
    sql=f"""
    WITH par AS (SELECT count(*) AS n FROM embeddings)
    SELECT e.vec_id,
           t.j AS neg_slot,
           (e.vec_id + 1 +
            ('0x' || substr(md5(e.vec_id::VARCHAR || '~' || t.j), 1, 8))
              ::BIGINT % (par.n - 1)) % par.n AS neg_id
    FROM embeddings e, par,
         unnest(generate_series(0, {NEG_K - 1})) AS t(j)
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive
    training: anchor i draws negative ``(i + 1 + (md5(i‖j) mod n−1))
    mod n`` — uniform over the other n−1 ids with NO rejection loop
    (the ``+1 … mod n−1`` shift makes self-selection impossible by
    construction, so the row count is exactly n·k on both engines).

    Scale shape: pure scan-stage arithmetic — the only cluster-wide
    value is the corpus count n (a parquet-footer metadata read /
    scalar subquery); no shuffle, no join.  Contiguous ids are the
    curated-training-shard layout (``training_shuffle`` emits exactly
    that); for sparse id spaces the same hash indexes into a
    zipWithIndex-style dense rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()  # parquet-footer count job
    if n < 2:
        raise ValueError(
            f"negative_sampling needs >=2 embeddings to draw a negative "
            f"distinct from the anchor; corpus has {n}"
        )
    hv = lambda j: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(
                    F.col("vec_id").cast("string"), F.lit(f"~{j}")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    slots = F.array(
        *[
            ((F.col("vec_id") + 1 + hv(j) % (n - 1)) % n).alias(f"n{j}")
            for j in range(NEG_K)
        ]
    )
    return emb.select(
        "vec_id", F.posexplode(slots).alias("neg_slot", "neg_id")
    ).select(
        "vec_id", F.col("neg_slot").cast("bigint").alias("neg_slot"), "neg_id"
    )


HARD_NEG_ANCHORS = 8  # anchors mined per pass
HARD_NEG_K = 3  # hard negatives kept per anchor

@register(
    "hard_negatives",
    sql=f"""
    WITH anchors AS (
      SELECT vec_id AS anchor_id, embedding AS av, label AS al
      FROM embeddings WHERE vec_id < {HARD_NEG_ANCHORS}
    ),
    scored AS (
      SELECT a.anchor_id, e.vec_id AS neg_id,
             {{dot}} AS sc
      FROM anchors a JOIN embeddings e
        ON e.label <> a.al AND e.vec_id <> a.anchor_id
    ),
    ranked AS (
      SELECT anchor_id, neg_id, sc,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY sc DESC, neg_id ASC) AS rnk
      FROM scored
    )
    SELECT anchor_id, neg_id, round(sc, 6) AS cos, rnk
    FROM ranked WHERE rnk <= {HARD_NEG_K}
    """.format(dot=sql_dot("e.embedding", "a.av")),
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-k most-similar corpus vectors with a DIFFERENT label — the
    negatives that actually move a contrastive loss, vs the uniform
    draws of ``negative_sampling``.

    Scale shape: the anchor frame broadcasts (mining batches are
    bounded); the corpus streams once through the scoring join and the
    per-anchor window ranks ≤ anchors × corpus scored rows partitioned
    by anchor — the same broadcast+window shape as the batch top-k
    operator (`operators/topk.py`), with the label inequality applied
    BEFORE ranking so excluded candidates never enter the heap.  At
    IVF scale the corpus side would first prune to the anchors' probed
    cells (`ann_ivf_topk_batch`)."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < HARD_NEG_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("av"),
        F.col("label").alias("al"),
    )
    scored = emb.join(
        F.broadcast(anchors),
        (F.col("label") != F.col("al"))
        & (F.col("vec_id") != F.col("anchor_id")),
    ).select(
        "anchor_id",
        F.col("vec_id").alias("neg_id"),
        dot("embedding", "av").alias("sc"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("sc"), F.asc("neg_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= HARD_NEG_K)
        .select(
            "anchor_id",
            "neg_id",
            F.round("sc", 6).alias("cos"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )
