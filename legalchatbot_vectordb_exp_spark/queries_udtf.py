"""Python UDTF surface (Spark 4): a user-defined *table* function
registered into the SQL catalog and invoked with LATERAL — the 1→N
row-generation API a Spark user reaches for when explode-style
expressions can't express the generator.

The reference has no UDTF (its row generation, paragraph split #8, is
covered by posexplode in ``doc_chunks``); this module exercises the
registration surface itself with semantics the DuckDB oracle can
replicate relationally.  Evaluation is Arrow-batched
(``spark.sql.execution.pythonUDTF.arrow.enabled`` → the plan node is
``ArrowEvalPythonUDTF``, not the row-pickling ``BatchEvalPythonUDTF``);
the expression twin (``functions/text.py`` ``word_shingles``) remains
the hot-path form.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from legalchatbot_vectordb_exp_spark.io_tables import load_table
from legalchatbot_vectordb_exp_spark.registry import register, sql_words


@register(
    "udtf_shingle_freq",
    sql=f"""
    WITH w AS (
      SELECT {sql_words('text')} AS ws FROM documents
    ),
    sh AS (
      SELECT array_to_string(ws[i + 1 : i + 3], ' ') AS shingle
      FROM w, unnest(generate_series(0, len(ws) - 3)) AS t(i)
    )
    SELECT shingle, count(*) AS n
    FROM sh GROUP BY shingle HAVING count(*) >= 5
    """,
)
def q_udtf_shingle_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus 3-shingle frequencies (≥20) where shingle generation runs
    through a registered Python UDTF + LATERAL join.  The split mirrors
    the engine's ``words()`` exactly (ASCII ``\\s+``, empties dropped)
    so the relational DuckDB twin hash-matches."""
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="shingle string")
    class ShingleUDTF:
        def eval(self, text, n: int):
            import re

            ws = [
                w
                for w in re.split(r"\s+", text or "", flags=re.ASCII)
                if w
            ]
            for i in range(len(ws) - n + 1):
                yield (" ".join(ws[i : i + n]),)

    spark.udtf.register("doc_shingles", ShingleUDTF)
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT s.shingle, count(*) AS n
        FROM udtf_docs, LATERAL doc_shingles(text, 3) s
        GROUP BY s.shingle HAVING count(*) >= 5
        """
    )
