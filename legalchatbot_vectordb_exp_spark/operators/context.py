"""Char-budget RAG context assembly.

Reproduces ``qdrant_retrieve_context``'s accumulation loop
(``Qdrant/llm.py:22-34`` in the reference) as a window plan:

reference semantics, walked in score order per query:
  1. strip the hit text; skip empty (consumes no budget, no index)
  2. remaining = budget - running_total; if the text overflows,
     truncate to exactly ``remaining`` chars
  3. tag the part ``[Page p | Chunk i]\\n<text>``
  4. stop once the running total reaches the budget (the truncated
     boundary row IS included)
  5. join kept parts with ``\\n\\n---\\n\\n``

Spark shape: cumulative ``sum(length) OVER (ORDER BY score DESC)``
per query → keep rows whose *previous* running total is under budget
→ truncate the boundary row → ordered ``concat_ws`` aggregation.
One shuffle on query_id; everything else is codegen'd expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

SEPARATOR = "\n\n---\n\n"


def assemble_context(
    hits: DataFrame,
    budget: int = 4000,
    query_id_col: str = "query_id",
    score_col: str = "score",
    text_col: str = "text",
    page_col: str = "page",
    chunk_col: str = "chunk_index",
    id_col: str | None = None,
    out_col: str = "context",
) -> DataFrame:
    """hits(query_id, score, text, page, chunk_index) → (query_id, context).

    ``id_col`` (optional) breaks score ties deterministically.
    """
    from legalchatbot_vectordb_exp_spark.functions.text import py_strip

    order = [F.desc(score_col)]
    if id_col:
        order.append(F.col(id_col).asc())

    # Python-strip, not trim(): the reference skips hits that are empty
    # after str.strip(), which includes Unicode whitespace like \xa0
    stripped = hits.withColumn("_txt", py_strip(F.col(text_col))).filter(
        F.col("_txt") != ""
    )

    w = (
        Window.partitionBy(query_id_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_run = stripped.withColumn(
        "_running", F.sum(F.length("_txt")).over(w)
    ).withColumn("_prev", F.col("_running") - F.length("_txt"))

    kept = with_run.filter(F.col("_prev") < budget).withColumn(
        "_part_txt",
        F.when(F.col("_running") <= budget, F.col("_txt")).otherwise(
            F.expr(f"substring(_txt, 1, {int(budget)} - _prev)")
        ),
    )
    tagged = kept.withColumn(
        "_tagged",
        F.format_string(
            "[Page %s | Chunk %s]\n%s",
            F.col(page_col),
            F.col(chunk_col),
            F.col("_part_txt"),
        ),
    )

    # ordered aggregation: sort collected (order-key, tagged) structs,
    # then join — deterministic without relying on collect_list order
    key_cols = [(-F.col(score_col)).alias("neg_score")]
    if id_col:
        key_cols.append(F.col(id_col).alias("tie"))
    sort_key = F.struct(*key_cols, F.col("_tagged").alias("tagged"))
    return (
        tagged.groupBy(query_id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(sort_key)),
                    lambda s: s["tagged"],
                ),
                SEPARATOR,
            ).alias(out_col)
        )
    )
