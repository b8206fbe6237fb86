"""Corpus-curation operators beyond dedup: normalization, boilerplate
detection, intra-document repetition scoring, and per-source
temperature rebalancing (the operations a large-scale training-data
pipeline runs between raw ingest and tokenization).

Scale notes (designed for 100 TB, verified on the sf tables):

* ``text_normalize`` and ``repetition_score`` are pure scan-stage
  projections (regexp / array expressions, whole-stage codegen) — no
  shuffle at any scale;
* ``boilerplate_shingles`` shuffles once on the shingle key with
  map-side partial aggregation (same shape as the dedup hot-set cap);
* ``temperature_sample`` is a scan-stage *filter*: the per-source keep
  thresholds derive from a 20-row aggregate (metadata-scale driver
  fold, exact IEEE arithmetic on both engines) and are broadcast back,
  so the corpus itself never shuffles and never sorts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from legalchatbot_vectordb_exp_spark.functions.text import (
    ASCII_WS,
    WS_SPLIT,
    word_shingles,
    words,
)
from legalchatbot_vectordb_exp_spark.io_tables import load_table, spread
from legalchatbot_vectordb_exp_spark.registry import register, sql_words

# boilerplate = a 3-word shingle shared by many docs across several
# sources (navigation chrome / license headers / template text)
BOILERPLATE_MIN_DOCS = 5
BOILERPLATE_MIN_SOURCES = 3

# temperature rebalance: weight source s by n_s^alpha (alpha<1 flattens
# the source distribution); keep ~TARGET_FRACTION of the corpus
TEMP_ALPHA = 0.5
TARGET_FRACTION = 0.5


@register(
    "text_normalize",
    sql=rf"""
    SELECT doc_id,
           regexp_replace(
             trim(regexp_replace(lower(text),
               '[^a-z0-9{ASCII_WS}]', ' ', 'g')),
             '{WS_SPLIT}', ' ', 'g') AS norm_text,
           len(list_filter(regexp_split_to_array(
             trim(regexp_replace(lower(text),
               '[^a-z0-9{ASCII_WS}]', ' ', 'g')),
             '{WS_SPLIT}'), w -> w <> ''))::BIGINT AS n_tokens_norm
    FROM documents
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization: lowercase → strip non-alphanumeric
    → collapse whitespace → trim.  One regexp chain per row inside
    whole-stage codegen; the normalized token count rides the same
    projection.  (Spark ``regexp_replace`` is global by default; the
    DuckDB oracle needs the explicit ``'g'`` flag.)"""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.col("text")), rf"[^a-z0-9{ASCII_WS}]", " "
            ),
            WS_SPLIT,
            " ",
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.size(words(norm)).cast("bigint").alias("n_tokens_norm"),
    )


@register(
    "boilerplate_shingles",
    sql=f"""
    WITH sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               generate_series(0, greatest(len({sql_words('text')}) - 3, 0)),
               i -> array_to_string(({sql_words('text')})[i + 1 : i + 3],
                                    ' ')))) AS shingle
      FROM documents
    )
    SELECT shingle,
           count(DISTINCT doc_id)::BIGINT AS n_docs,
           count(DISTINCT source)::BIGINT AS n_sources
    FROM sh
    GROUP BY shingle
    HAVING count(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
       AND count(DISTINCT source) >= {BOILERPLATE_MIN_SOURCES}
    """,
)
def q_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detector: 3-word shingles appearing in ≥5 documents
    across ≥3 sources — template/navigation text that dedup's hot-set
    cap drops and a curation pipeline strips from every document.

    One shuffle on the shingle key; the two DISTINCT aggregates are
    partial-aggregated map-side (each doc contributes a shingle at most
    once by construction — ``word_shingles`` is distinct-per-doc — so
    the map-side combine is exact, not an estimate)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id",
        "source",
        F.explode(word_shingles("text", 3)).alias("shingle"),
    )
    return (
        sh.groupBy("shingle")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
        .filter(
            (F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
            & (F.col("n_sources") >= BOILERPLATE_MIN_SOURCES)
        )
    )


@register(
    "repetition_score",
    sql=f"""
    WITH w AS (
      SELECT doc_id,
             list_transform({sql_words('text')}, x -> lower(x)) AS ws
      FROM documents
    )
    SELECT doc_id,
           len(ws)::BIGINT AS n_tokens,
           round(1.0 - len(list_distinct(ws))::DOUBLE
                 / greatest(len(ws), 1)::DOUBLE, 6) AS dup_token_ratio,
           round(1.0 - len(list_distinct(list_transform(
                   generate_series(0, greatest(len(ws) - 2, 0)),
                   i -> array_to_string(ws[i + 1 : i + 2], ' '))))::DOUBLE
                 / greatest(len(ws) - 1, 1)::DOUBLE, 6)
             AS dup_bigram_ratio
    FROM w
    """,
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: fraction of duplicate tokens and
    duplicate word-bigrams (high values ⇒ degenerate/spammy text that
    inter-document dedup cannot catch).  Pure array expressions over
    the un-exploded token array — a narrow scan-stage projection with
    no shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.transform(words("text"), F.lower)
    n = F.size(ws)
    bigrams = word_shingles(F.lower(F.col("text")), 2)
    staged = docs.select(
        "doc_id", ws.alias("ws"), n.alias("n"), bigrams.alias("bg")
    )
    return staged.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(
            1.0
            - F.size(F.array_distinct("ws")).cast("double")
            / F.greatest(F.col("n"), F.lit(1)).cast("double"),
            6,
        ).alias("dup_token_ratio"),
        F.round(
            1.0
            - F.size("bg").cast("double")
            / F.greatest(F.col("n") - 1, F.lit(1)).cast("double"),
            6,
        ).alias("dup_bigram_ratio"),
    )


def _temp_thresholds_sql() -> str:
    """Per-source integer keep-thresholds, computed with a pinned fold
    order (sources sorted) so Spark's driver-side fold and DuckDB's
    list_reduce produce bit-identical doubles."""
    return f"""
    counts AS (
      SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source
    ),
    tot AS (
      SELECT sum(n)::DOUBLE AS total,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(sqrt(n::DOUBLE) ORDER BY source)),
               (acc, x) -> acc + x) AS z
      FROM counts
    ),
    rates AS (
      SELECT c.source,
             floor(least(
               {TARGET_FRACTION} * t.total
                 * sqrt(c.n::DOUBLE) / t.z / c.n::DOUBLE,
               1.0) * 4294967296.0)::BIGINT AS keep_below
      FROM counts c, tot t
    )
    """


@register(
    "temperature_sample",
    sql="WITH "
    + _temp_thresholds_sql()
    + """
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
          < r.keep_below
    """,
)
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature rebalance (keep-rate ∝ n_s^(α−1), α=0.5):
    flattens the source distribution toward uniform while targeting
    ~50% of the corpus, with deterministic md5-hash selection.

    Scale shape: a tiny per-source count aggregate (|sources| rows) is
    pulled to the driver — metadata-scale, like the IVF centroids —
    where the normalizer Z is folded in *sorted source order* so the
    double arithmetic is bit-identical to the oracle's ordered
    ``list_reduce``.  The integer thresholds broadcast back and the
    sample is a scan-stage ``hash < threshold`` filter: no corpus
    shuffle, no sort, exact same rows selected on any cluster size."""
    docs = load_table(spark, sf_dir, "documents")
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    import math

    total = float(sum(counts.values()))
    z = 0.0
    for src in sorted(counts):  # pinned fold order (matches ORDER BY)
        # sqrt (alpha = 0.5), NOT pow(n, 0.5): sqrt is correctly
        # rounded per IEEE-754 on every platform, pow is not — a 1-ulp
        # pow divergence could flip a floor()'d threshold and a
        # boundary-hash document with it.  The oracle uses sqrt() too.
        z += math.sqrt(counts[src])
    rates = [
        (
            src,
            int(
                math.floor(
                    min(
                        TARGET_FRACTION
                        * total
                        * math.sqrt(counts[src])
                        / z
                        / float(counts[src]),
                        1.0,
                    )
                    * 4294967296.0
                )
            ),
        )
        for src in sorted(counts)
    ]
    rates_df = spark.createDataFrame(rates, ["source", "keep_below"])
    hv = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return (
        docs.join(F.broadcast(rates_df), "source")
        .filter(hv < F.col("keep_below"))
        .select("doc_id", "source")
    )
