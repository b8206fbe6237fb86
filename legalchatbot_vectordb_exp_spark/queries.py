"""Query registry: every implemented operator exposed as a named query
plus (where SQL-expressible) a DuckDB oracle twin.

Cross-engine determinism rules (see FIXTURES.md "Oracle notes"):

* float vector math is promoted to DOUBLE and folded in identical
  element order on both engines (IEEE doubles → bitwise-equal scores);
* displayed floats are ``round(x, 6)`` on both sides;
* money aggregates are summed as DECIMAL (exact), then cast back to
  DOUBLE and rounded — double summation order differs across engines
  and partitions, decimal summation does not;
* every ranked result carries a deterministic tie-break key;
* portable hashing uses md5/sha2 hex strings (identical on both).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.functions.vector import dot
from legalchatbot_vectordb_exp_spark.functions.text import paragraph_chunks
from legalchatbot_vectordb_exp_spark.operators.topk import (
    topk_search,
    topk_search_batch,
)
from legalchatbot_vectordb_exp_spark.operators.context import assemble_context
from legalchatbot_vectordb_exp_spark.operators.evaluate import (
    with_recall_mrr,
)

from legalchatbot_vectordb_exp_spark.registry import (
    ORACLES,
    QUERIES,
    register,
    sql_dot as _sql_dot,
    sql_norm as _sql_norm,
    sql_py_strip as _sql_py_strip,
)

# ------------------------------------------------------------ vector queries


@register(
    "topk_cosine",
    sql=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           round({_sql_dot('e.embedding', 'q.qv')}, 6) AS score
    FROM embeddings e, q
    ORDER BY {_sql_dot('e.embedding', 'q.qv')} DESC, e.vec_id ASC
    LIMIT 5
    """,
)
def q_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: single-query exact top-k cosine (unit vectors → dot).

    Plan: narrow codegen'd dot-product scan → TakeOrderedAndProject
    (per-partition heap, no shuffle) — the reference's
    ``Database.search`` (``Qdrant/VectorDB/Database.py:22-28``).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    out = topk_search(emb, qvec, k=5, metric="dot")
    return out.select("vec_id", "label", F.round("score", 6).alias("score"))


@register(
    "topk_batch",
    sql=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, e.vec_id,
             {_sql_dot('e.embedding', 'q.qv')} AS s
      FROM embeddings e CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, vec_id, s,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, round(s, 6) AS score, rank::BIGINT AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def q_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch top-k: broadcast query frame × corpus → per-query window
    rank (one shuffle on query_id; AQE-coalesced)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = topk_search_batch(emb.select("vec_id", "embedding"), queries, k=5)
    return out.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("bigint").alias("rank"),
    )


@register(
    "vector_normalize",
    sql=f"""
    WITH n AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> x / (CASE WHEN {_sql_norm('embedding')} = 0 THEN 1.0
                         ELSE {_sql_norm('embedding')} END)) AS nv
      FROM embeddings
    )
    SELECT vec_id,
           round({_sql_norm('nv')}, 6) AS unit_norm,
           round(nv[1], 6) AS first_component
    FROM n
    """,
)
def q_vector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization with the reference's zero-norm guard
    (``Qdrant/main.py:15-18``).

    Computed in a narrow bit-exact NumPy kernel (column-sequential
    ssq fold → sqrt → guarded divide → refold), ~5× over the
    interpreted HOF chain; rounding stays Spark-side so the oracle
    comparison exercises the exact same round() as every other query.
    The expression form remains the composable API
    (functions.vector.l2_normalize)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.array(list(pdf["embedding"]), dtype=np.float64)
            ssq = np.zeros(len(pdf))
            for j in range(E.shape[1]):  # sequential across dims
                ssq = ssq + E[:, j] * E[:, j]
            norm = np.sqrt(ssq)
            div = np.where(norm == 0.0, 1.0, norm)
            nv = E / div[:, None]
            ssq2 = np.zeros(len(pdf))
            for j in range(nv.shape[1]):
                ssq2 = ssq2 + nv[:, j] * nv[:, j]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "unit_norm_raw": np.sqrt(ssq2),
                    "first_raw": nv[:, 0],
                }
            )

    raw = emb.mapInPandas(
        kernel, schema="vec_id long, unit_norm_raw double, first_raw double"
    )
    return raw.select(
        "vec_id",
        F.round("unit_norm_raw", 6).alias("unit_norm"),
        F.round("first_raw", 6).alias("first_component"),
    )


# ------------------------------------------------------------- text chunking


@register(
    "doc_chunks",
    sql=f"""
    WITH parts AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, ' '),
                                        p -> {_sql_py_strip('p')}),
                         p -> p <> '') AS ps
      FROM documents
    ),
    exploded AS (
      SELECT doc_id, i - 1 AS chunk_index, ps[i] AS chunk_text
      FROM parts, unnest(generate_series(1, len(ps))) AS u(i)
    )
    SELECT doc_id, chunk_index::BIGINT AS chunk_index, chunk_text
    FROM exploded WHERE length(chunk_text) >= 6
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking row-generator: split → trim → drop empty → posexplode →
    min-length filter (``Qdrant/main.py:36-46``; delimiter parameterized,
    the corpus has no newlines so a space delimiter exercises it)."""
    docs = load_table(spark, sf_dir, "documents")
    out = paragraph_chunks(
        docs.select("doc_id", "text"), delimiter=" ", min_len=6
    )
    return out.select(
        "doc_id",
        F.col("chunk_index").cast("bigint").alias("chunk_index"),
        "chunk_text",
    )


@register(
    "chunk_format",
    sql="""
    SELECT doc_id,
           '[Page ' || doc_id || ' | Chunk ' || (n_chars % 10)
             || ']' || chr(10) || text AS block
    FROM documents
    """,
)
def q_chunk_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Formatted-text sink projection (``Qdrant/main.py:48-52``):
    ``[Page p | Chunk i]\\n<text>`` blocks."""
    docs = load_table(spark, sf_dir, "documents")
    block = F.concat(
        F.lit("[Page "),
        F.col("doc_id"),
        F.lit(" | Chunk "),
        F.col("n_chars") % 10,
        F.lit("]\n"),
        F.col("text"),
    )
    return docs.select("doc_id", block.alias("block"))


# ---------------------------------------------------------------- evaluation

_EVAL_CTE = """
    WITH scored AS (
      SELECT event_id,
             list_distinct(regexp_extract_all(props, '[0-9]+')) AS gold,
             regexp_extract_all(
               concat(user_id::VARCHAR, ' ', floor(value)::BIGINT::VARCHAR,
                      ' ', (event_id % 50)::VARCHAR), '[0-9]+') AS pred
      FROM events
    ),
    m AS (
      SELECT event_id, gold, pred[1:3] AS topk,
             CASE WHEN len(gold) = 0 THEN 0.0
                  ELSE len(list_intersect(gold, pred[1:3]))::DOUBLE
                       / len(gold)::DOUBLE END AS recall_at_k,
             coalesce(1.0 / list_min(list_filter(
                 list_transform(pred[1:3],
                   (p, i) -> CASE WHEN list_contains(gold, p)
                             THEN i ELSE NULL END),
                 x -> x IS NOT NULL))::DOUBLE, 0.0) AS mrr_at_k
      FROM scored
    )
"""


@register(
    "eval_recall_mrr",
    sql=_EVAL_CTE
    + """
    SELECT event_id, round(recall_at_k, 6) AS recall_at_k,
           round(mrr_at_k, 6) AS mrr_at_k
    FROM m
    """,
)
def q_eval_recall_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k / MRR@k per row (``Qdrant/llm.py:143-163``), k=3, over
    digit runs extracted from the events table's JSON props (gold) and
    a derived prediction string (pred)."""
    ev = load_table(spark, sf_dir, "events")
    pred_text = F.concat_ws(
        " ",
        F.col("user_id").cast("string"),
        F.floor("value").cast("bigint").cast("string"),
        (F.col("event_id") % 50).cast("string"),
    )
    df = ev.select(
        "event_id",
        F.col("props").alias("answers"),
        pred_text.alias("predicted_law"),
    )
    out = with_recall_mrr(df, k=3)
    return out.select(
        "event_id",
        F.round("recall_at_k", 6).alias("recall_at_k"),
        F.round("mrr_at_k", 6).alias("mrr_at_k"),
    )


@register(
    "eval_means",
    sql=_EVAL_CTE
    + """
    SELECT round(avg(recall_at_k), 6) AS avg_recall,
           round(avg(mrr_at_k), 6) AS avg_mrr,
           count(*) AS n
    FROM m
    """,
)
def q_eval_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-frame metric means (``Qdrant/llm.py:161-162``)."""
    ev = load_table(spark, sf_dir, "events")
    pred_text = F.concat_ws(
        " ",
        F.col("user_id").cast("string"),
        F.floor("value").cast("bigint").cast("string"),
        (F.col("event_id") % 50).cast("string"),
    )
    df = ev.select(
        "event_id",
        F.col("props").alias("answers"),
        pred_text.alias("predicted_law"),
    )
    scored = with_recall_mrr(df, k=3)
    return scored.agg(
        F.round(F.avg("recall_at_k"), 6).alias("avg_recall"),
        F.round(F.avg("mrr_at_k"), 6).alias("avg_mrr"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------- context assembly


@register(
    "context_assembly",
    sql=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, e.vec_id,
             {_sql_dot('e.embedding', 'q.qv')} AS score
      FROM embeddings e CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS rank
      FROM scored
    ),
    hits AS (
      SELECT r.query_id, r.score, r.vec_id, d.text,
             d.doc_id AS page, (d.n_chars % 7) AS chunk_index
      FROM ranked r JOIN documents d ON d.doc_id = r.vec_id
      WHERE r.rank <= 5
    ),
    stripped AS (
      SELECT *, {_sql_py_strip('text')} AS txt
      FROM hits WHERE {_sql_py_strip('text')} <> ''
    ),
    run AS (
      SELECT *,
             sum(length(txt)) OVER w AS running,
             sum(length(txt)) OVER w - length(txt) AS prev
      FROM stripped
      WINDOW w AS (PARTITION BY query_id ORDER BY score DESC, vec_id ASC
                   ROWS UNBOUNDED PRECEDING)
    ),
    kept AS (
      SELECT query_id, score, vec_id,
             '[Page ' || page || ' | Chunk ' || chunk_index || ']'
               || chr(10)
               || CASE WHEN running <= 600 THEN txt
                       ELSE substring(txt, 1, 600 - prev::INT) END AS tagged
      FROM run WHERE prev < 600
    )
    SELECT query_id,
           string_agg(tagged, chr(10) || chr(10) || '---' || chr(10) || chr(10)
                      ORDER BY score DESC, vec_id ASC) AS context
    FROM kept GROUP BY query_id
    """,
)
def q_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval + char-budget context assembly
    (``Qdrant/llm.py:16-34``): batch top-5 → join chunk text → window
    cumulative-sum budget (600 chars) with boundary truncation →
    ordered concat per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ranked = topk_search_batch(emb.select("vec_id", "embedding"), queries, k=5)
    hits = ranked.join(docs, ranked.vec_id == docs.doc_id).select(
        "query_id",
        "score",
        "vec_id",
        "text",
        F.col("doc_id").alias("page"),
        (F.col("n_chars") % 7).alias("chunk_index"),
    )
    return assemble_context(
        hits,
        budget=600,
        id_col="vec_id",
        page_col="page",
        chunk_col="chunk_index",
    )


# ------------------------------------------------------------- deduplication


@register(
    "dedup_exact",
    sql="""
    SELECT sha256(text) AS content_hash, count(*) AS n,
           min(doc_id) AS keep_id
    FROM documents GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy (extension E1; at scale this is
    a single hash-aggregate with map-side partial aggregation)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keep_id"))
    )


# --------------------------------------------------------------- TPC-H style


@register(
    "pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(l_quantity::DECIMAL(18,4)), 2) AS DOUBLE)
             AS sum_qty,
           CAST(round(sum(l_extendedprice::DECIMAL(18,4)), 2) AS DOUBLE)
             AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: partial-aggregated scan with the
    filter pushed to parquet.  Money sums go through DECIMAL so the
    result is independent of partition-level addition order."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c, s: F.col(c).cast(f"decimal(18,{s})")  # noqa: E731
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity", 4)), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice", 4)), 2).cast("double").alias(
                "sum_base_price"
            ),
            F.round(F.sum(disc), 2).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# extension query families register on import (after core definitions)
from legalchatbot_vectordb_exp_spark import (  # noqa: E402,F401
    queries_dedup,
    queries_ann,
    queries_text,
    queries_tpch,
    queries_events,
    queries_pipeline,
    queries_misc,
    queries_analytics,
    queries_functions,
    queries_roundtrip,
    queries_udtf,
    queries_curation,
    queries_training,
    queries_rag,
    queries_scale,
    queries_sparse,
)
