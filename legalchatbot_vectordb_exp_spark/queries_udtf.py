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


@register(
    "udaf_grouped_median",
    sql="""
    SELECT event_type,
           round(median(value), 6) AS med,
           round(median(abs(value
             - (SELECT median(value) FROM events e2
                WHERE e2.event_type = e.event_type))), 6) AS mad
    FROM events e GROUP BY event_type
    """,
)
def q_udaf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined AGGREGATE surface (the UDTF twin): median and
    median-absolute-deviation per group via a GROUPED_AGG
    ``pandas_udf`` — a Python aggregate the engine registers and
    invokes like any built-in, Arrow-batched per group (never
    row-at-a-time).  Both stats are order-insensitive (NumPy sorts
    internally), and the even-count midpoint ``(a+b)/2`` is the same
    IEEE op DuckDB's ``median`` interpolation performs — exact
    cross-engine agreement without fold pinning.

    Scale note: a grouped-agg pandas UDF materializes each GROUP in
    memory on one executor (no partial aggregation) — correct for
    bounded-cardinality groups like these; an unbounded-group metric
    belongs in a built-in or an algebraic two-stage form instead.
    That trade-off is the documented cost of the UDAF escape hatch."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    # module-level ``from __future__ import annotations`` stringifies
    # hints, which the pandas_udf signature inspector rejects — attach
    # real annotation objects instead
    def _median(v):
        return float(np.median(v.to_numpy(dtype=np.float64)))

    def _mad(v):
        a = v.to_numpy(dtype=np.float64)
        return float(np.median(np.abs(a - np.median(a))))

    _median.__annotations__ = {"v": pd.Series, "return": float}
    _mad.__annotations__ = {"v": pd.Series, "return": float}
    py_median = pandas_udf(_median, "double")
    py_mad = pandas_udf(_mad, "double")

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(py_median("value"), 6).alias("med"),
        F.round(py_mad("value"), 6).alias("mad"),
    )
